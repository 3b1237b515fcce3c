"""Interval coalescing — the measure of a union of overlapping spans.

"How long was the user actually active?" cannot be answered by summing
session spans when sessions overlap (multi-device, per-type windows):
the union must be coalesced into maximal connected episodes first.
This is the overlap-tolerant generalization of gaps-and-islands
(operators/retention.py works on a discrete day grid; here spans are
real microsecond intervals that can nest and interleave).

The classic sorted-sweep does it in ONE window pass: order a key's
intervals by (lo, hi, tiebreak); an interval starts a NEW episode iff
its lo lies strictly past the running max(hi) of everything before it
(closed intervals touching at one instant are connected); the running
count of such breaks is the episode id.  Within an episode the union
is exactly [min lo, max hi] — the chain of pairwise-overlapping spans
is connected — so covered time is a plain aggregate.

All arithmetic is exact int64 microseconds; the event order is total,
so episode ids — and everything derived — are engine-exact.

At 100 TB: one shuffle to the key, a per-key sort bounded by that
key's interval count, two map-side-combinable aggregations.  No
self-join (the naive overlap pairing is quadratic in concurrency —
the same cliff operators/sweepline.py avoids).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["coalesce_intervals"]


def coalesce_intervals(
    intervals: DataFrame,
    keys: list[str],
    lo_col: str,
    hi_col: str,
    id_col: str,
) -> DataFrame:
    """Per-key union of CLOSED [lo, hi] intervals.

    Output per key: ``n_intervals``, ``n_episodes`` (maximal connected
    groups), ``covered_us`` (measure of the union), ``sum_span_us``
    (Σ individual spans), ``overlap_us`` = sum_span − covered
    (double-counted time; 0 iff no two intervals overlap).
    """
    base = intervals.select(
        *keys,
        F.unix_micros(F.col(lo_col)).alias("_lo"),
        F.unix_micros(F.col(hi_col)).alias("_hi"),
        F.col(id_col).alias("_id"),
    )
    order = Window.partitionBy(*keys).orderBy("_lo", "_hi", "_id")
    prev_max_hi = F.max("_hi").over(
        order.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = base.withColumn(
        "_new",
        F.when(
            prev_max_hi.isNull() | (F.col("_lo") > prev_max_hi), 1
        ).otherwise(0),
    ).withColumn(
        "_ep",
        F.sum("_new").over(
            order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    episodes = flagged.groupBy(*keys, "_ep").agg(
        F.count(F.lit(1)).alias("_n"),
        (F.max("_hi") - F.min("_lo")).alias("_covered"),
        F.sum(F.col("_hi") - F.col("_lo")).alias("_span"),
    )
    return episodes.groupBy(*keys).agg(
        F.sum("_n").alias("n_intervals"),
        F.count(F.lit(1)).alias("n_episodes"),
        F.sum("_covered").alias("covered_us"),
        F.sum("_span").alias("sum_span_us"),
        (F.sum("_span") - F.sum("_covered")).alias("overlap_us"),
    )
