"""Batch sink parity tests (reference O24/O28)."""

from __future__ import annotations

import glob
import os
import tempfile

from pyspark.sql import functions as F

from live_market_data_orderflow_analysis_big_data_project__spark.sources.sinks import (
    export_csv,
    write_partitioned_parquet,
)
from live_market_data_orderflow_analysis_big_data_project__spark.sources.tables import (
    load_table,
)

SF0001 = "/root/testdata/sf0.001"


def test_partitioned_parquet_roundtrip(spark):
    e = load_table(spark, SF0001, "events")
    out = os.path.join(tempfile.mkdtemp(prefix="sink_pq_"), "ticks")
    write_partitioned_parquet(e, out, ts_col="ts")
    # hive layout: date=YYYY-MM-DD dirs -> partition pruning at read time
    assert glob.glob(os.path.join(out, "date=*")), "expected hive-style dirs"
    back = spark.read.parquet(out)
    assert back.count() == e.count()
    # the date filter must reach the scan as a partition filter (pruning)
    import contextlib
    import io

    one_day = back.filter(F.col("date") == "2024-01-05")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        one_day.explain()
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "2024-01-05" in plan


def test_csv_export_single_file(spark):
    e = load_table(spark, SF0001, "events").select("event_id", "event_type")
    out = os.path.join(tempfile.mkdtemp(prefix="sink_csv_"), "export")
    export_csv(e, out)
    files = glob.glob(os.path.join(out, "part-*.csv"))
    assert len(files) == 1, "coalesce(1) must produce exactly one csv part"
    with open(files[0]) as fh:
        header = fh.readline().strip()
    assert header == "event_id,event_type"
