"""Bucketed tables: co-located joins without a shuffle.

At 100 TB the dominant cost of a fact-fact equi-join is shuffling both
sides.  Writing both tables bucketed by the join key (same bucket count)
pre-partitions them at rest; Spark's bucketing-aware scan then feeds a
sort-merge join with NO Exchange on either side — the shuffle is paid
once at write time and amortized over every subsequent join.

(The reference partitions its parquet by date only, tick_to_hdfs.py:67;
bucketing is the engine's extension for join-heavy workloads.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: tuple[str, ...],
    num_buckets: int = 32,
    path: str | None = None,
    sort_cols: tuple[str, ...] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) table.

    ``sort_cols`` additionally sorts within buckets so the merge join
    skips its sort too.  ``path`` makes it external (outside the
    warehouse dir).
    """
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (the bucket spec rides in the catalog; the
    scan reports one partition per bucket and planners skip the
    exchange)."""
    return spark.table(table)
