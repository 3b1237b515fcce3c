"""Batch sinks — reference parity for the at-rest outputs.

- ``write_partitioned_parquet``: hive-style date-partitioned parquet, the
  batch twin of the reference's streaming sink layout
  (reference tick_to_hdfs.py:62-71: ``partitionBy("date")`` under
  ``/trading/ticks``), so readers get partition pruning for free.
- ``export_csv``: coalesced CSV export (reference README.md:402:
  ``coalesce(1).write.csv(header=True)``) for handing a result to
  spreadsheet-land.  ``max_records_per_file`` guards the small-file /
  giant-file extremes at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = ("date",),
    ts_col: str | None = None,
    mode: str = "append",
    max_records_per_file: int = 5_000_000,
) -> None:
    """Write hive-partitioned parquet; derives a ``date`` partition column
    from ``ts_col`` when asked for and absent (tick_to_hdfs.py:50-51).

    At 100 TB: the partition column bounds each output dir, and
    ``maxRecordsPerFile`` bounds file sizes without a coalesce that would
    serialize the write.
    """
    if ts_col is not None and "date" in partition_cols and "date" not in df.columns:
        df = df.withColumn("date", F.to_date(F.col(ts_col)))
    (
        df.write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def export_csv(
    df: DataFrame, path: str, coalesce: int = 1, mode: str = "overwrite"
) -> None:
    """Coalesced CSV export (reference README.md:402).

    ``coalesce(1)`` funnels through one task — correct for a
    human-consumable export, wrong for bulk output; pass a larger
    ``coalesce`` (or 0 to skip coalescing) for data-sized exports.
    """
    if coalesce:
        df = df.coalesce(coalesce)
    df.write.mode(mode).option("header", True).csv(path)
