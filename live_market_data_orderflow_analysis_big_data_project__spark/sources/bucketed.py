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

import logging

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_LOG = logging.getLogger(__name__)
_ORDERING_FLAG = "spark.sql.legacy.bucketedTableScan.outputOrdering"


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: tuple[str, ...],
    num_buckets: int = 32,
    path: str | None = None,
    sort_cols: tuple[str, ...] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) table with
    exactly ONE file per bucket.

    ``sort_cols`` additionally sorts within buckets so the merge join
    skips its sort too — but Spark only honors a bucketed table's sort
    order at read time when every bucket holds AT MOST ONE file (a
    bucketBy write emits one file per (input-task, bucket), and a
    multi-file bucket is only per-file sorted, so the scan drops its
    outputOrdering and the SMJ re-sorts both sides — the 16x probe
    measured that re-sort as the whole join-side residual).  The
    ``repartition(num_buckets, bucket_cols)`` below uses the same
    ``pmod(murmur3(cols), n)`` as the bucket-id function, so each write
    task owns exactly one bucket and emits exactly one file: the sortBy
    guarantee survives to the scan and the merge join reads pre-sorted
    runs with no Sort node.

    The repartition is a shuffle — that IS the "shuffle paid once at
    write time" this layout amortizes.  At 100 TB, pick ``num_buckets``
    so one-file-per-bucket lands files at 100 MB - 1 GB (docs/TUNING.md);
    the same count must be used on both join sides.

    ``path`` makes the table external (outside the warehouse dir).
    """
    exact = df.repartition(num_buckets, *[F.col(c) for c in bucket_cols])
    w = exact.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (the bucket spec rides in the catalog; the
    scan reports one partition per bucket and planners skip the
    exchange).

    Also enables ``spark.sql.legacy.bucketedTableScan.outputOrdering``:
    since Spark 3.0 the bucketed scan reports NO sort order by default
    (SPARK-28595), so even a ``sortBy`` table re-sorts under a merge
    join.  With the flag on, the scan reports the sortBy order exactly
    when every selected bucket holds at most one file — which
    ``write_bucketed`` guarantees — and the SMJ's Sort disappears on
    both sides.  Multi-file buckets (e.g. appended data) degrade safely
    back to a re-sort, never to wrong answers.

    NOTE the conf set below is session-scoped BY DESIGN, not restorable
    around this call: the plan that needs the ordering is built LAZILY,
    long after this function returns, so a set/restore here would be a
    no-op for the join that matters.  The flag is safe to leave on for
    the session's lifetime — it only influences bucketed-table scans,
    and Spark applies the ordering only when every selected bucket holds
    at most one file (anything else degrades to a re-sort, never a
    wrong answer).  Callers wanting the posture up front can set it in
    their session builder alongside session.py's ENGINE_CONFS.

    The session-wide change is LOGGED the first time this call
    actually flips the conf, so the altered planning of later bucketed
    scans is visible to callers rather than silent.
    """
    if spark.conf.get(_ORDERING_FLAG, "false") != "true":
        _LOG.info(
            "read_bucketed: enabling %s for this session — bucketed "
            "sortBy tables now report their sort order to the planner "
            "(single-file buckets only; multi-file buckets still "
            "re-sort)",
            _ORDERING_FLAG,
        )
        spark.conf.set(_ORDERING_FLAG, "true")
    return spark.table(table)
