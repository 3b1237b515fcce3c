"""Sweep-line peak concurrency over intervals.

"How many intervals were active at once, and when did the peak
happen?" — capacity planning over sessions, connections, or open
orders.  The classic answer is the sweep line: each CLOSED interval
[lo, hi] becomes a +1 event at lo and a −1 event at hi, a running sum
over the time-ordered events is the live concurrency, and its maximum
is the peak.

Determinism: endpoints are exact microsecond timestamps; within one
timestamp, starts sort before ends (delta DESC) so touching closed
intervals count as concurrent, and a user-supplied id column breaks
the remaining ties — the event order is TOTAL, making the running sum
(and hence peak and first-peak time) bit-identical across engines.
Peak time is the FIRST instant the peak is reached (min over a
domain-bounded count of peak hits).

At 100 TB: endpoints double the interval frame (a narrow union), one
shuffle to the partition keys, and the per-key window sort is the
only n log n term — the partition key (day here, symbol × day at
deployment) bounds partition width.  Output is one row per key.  No
joins, no pair materialization: concurrency via self-join
(interval × interval overlap) would be quadratic; the sweep is
linear in endpoints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["peak_concurrency"]


def peak_concurrency(
    intervals: DataFrame,
    keys: list[str],
    lo_col: str,
    hi_col: str,
    id_col: str,
) -> DataFrame:
    """Per-key peak simultaneous CLOSED intervals.

    Output: the keys, ``n_intervals``, ``peak`` (max simultaneous),
    ``peak_ts`` (canonical string of the first instant the peak is
    live).
    """
    # both endpoint branches read the interval frame — cut the lineage
    # once so the upstream interval aggregation isn't recomputed per
    # union branch (q111/s15 idiom)
    intervals = intervals.localCheckpoint(eager=True)
    ends = intervals.select(
        *keys,
        F.col(lo_col).alias("_t"),
        F.lit(1).alias("_delta"),
        F.col(id_col).alias("_id"),
    ).unionByName(
        intervals.select(
            *keys,
            F.col(hi_col).alias("_t"),
            F.lit(-1).alias("_delta"),
            F.col(id_col).alias("_id"),
        )
    )
    w = Window.partitionBy(*keys).orderBy(
        F.col("_t"), F.col("_delta").desc(), F.col("_id")
    )
    run = ends.withColumn(
        "_live",
        F.sum("_delta").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    # first-peak time via the q153 idiom: per-key window max, then a
    # conditional min — portable to any SQL engine, unlike min_by over
    # a composite ordering struct.
    run = run.withColumn(
        "_peak", F.max("_live").over(Window.partitionBy(*keys))
    )
    return run.groupBy(*keys).agg(
        (F.count(F.lit(1)) / 2).cast("long").alias("n_intervals"),
        F.max("_live").alias("peak"),
        F.date_format(
            F.min(F.when(F.col("_live") == F.col("_peak"), F.col("_t"))),
            "yyyy-MM-dd HH:mm:ss.SSSSSS",
        ).alias("peak_ts"),
    )
