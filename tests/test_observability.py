"""observe/Observation metrics (functions/observability.py): batch
metrics via Observation, streaming metrics via QueryProgress — no
second scan in either case."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from live_market_data_orderflow_analysis_big_data_project__spark.functions.observability import (
    observe_quality,
)
from live_market_data_orderflow_analysis_big_data_project__spark.sources.tables import (
    load_table,
)

SF0001 = "/root/testdata/sf0.001"


def test_batch_observation_metrics(spark):
    e = load_table(spark, SF0001, "events")
    observed, obs = observe_quality(
        e, "q", numeric_col="value", required_cols=("user_id", "props")
    )
    n_out = observed.filter(F.col("event_type") == "purchase").count()
    got = obs.get
    assert got["n_rows"] == e.count()  # metrics see pre-filter flow
    assert got["n_null_user_id"] == 0 and got["n_null_props"] == 0
    assert got["min_value"] <= got["max_value"]
    assert n_out > 0


def test_streaming_observed_metrics(spark):
    from live_market_data_orderflow_analysis_big_data_project__spark.streaming.core import (
        stream_events,
    )

    sdf = stream_events(spark, SF0001)
    observed, obs = observe_quality(sdf, "sq", required_cols=("event_id",))
    assert obs is None  # streaming: metrics ride the progress events
    q = (
        observed.writeStream.format("noop")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows_seen = 0
    for p in q.recentProgress:
        om = json.loads(p.json).get("observedMetrics", {})
        if "sq" in om:
            rows_seen += om["sq"]["n_rows"]
            assert om["sq"]["n_null_event_id"] == 0
    n_src = load_table(spark, SF0001, "events").count()
    assert rows_seen == n_src
