"""Streaming drift-monitor stages: windowed keyed SUMS and the daily
CUSUM series read.

The monitor family's split (s14/s15/s19/s20/s23, the s17 production
pattern): the STREAM owns the data-sized reduction — here a per-(key ×
event-time bucket) SUM, state per open (key, bucket) is ONE int64 —
and the analysis read runs as a domain-bounded batch view over the
emitted closed-bucket table.  This module adds the family's
change-point member: Page's one-sided CUSUM over the emitted daily
series, judged against a robust (median/MAD) baseline fitted on the
pre-split reference days.

Why CUSUM next to PSI (s20) and top-k overlap (s23): PSI answers "did
the distribution move", top-k drift answers "did the heavy hitters
change" — CUSUM answers "did the LEVEL shift, and when", accumulating
small persistent deviations that per-day threshold rules (q152/q192)
never see.  q166 is the batch tick-level fold; this is its
day-granular streaming twin, and the fold itself reuses the
``clamped_balance`` reflection identity (the Lindley recursion closed
form) as a plain window pass — no recursion, no UDF, no driver loop.

Exactness: day totals, medians, MADs, deviations and the running CUSUM
statistic are all int64; the alarm compares ints (S > h_mult·MAD).  No
ROUND anywhere.  Types with no pre-split reference rows surface with
NULL baseline/statistic columns (the q167 new-segment rule — never
silently dropped).

At 100 TB: the stream stage shuffles (key, bucket) partial sums —
map-side combinable, |keys × open buckets| state; the read runs on the
|keys × days| emitted frame: two selection windows (median, MAD) and
one ordered window pass (the Lindley identity), all domain-bounded.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .quantsketch import _BUCKET_FMT, _STEP_SECONDS
from .robust import _lower_median

__all__ = ["keyed_sum_windowed", "cusum_daily_series"]


def keyed_sum_windowed(
    df: DataFrame,
    groups: Sequence[str],
    ts_col: str,
    value_col: Column,
    bucket: str = "day",
    watermark: str = "0 seconds",
) -> DataFrame:
    """(groups…, bucket, total) — the SUM sibling of
    ``value_histogram_windowed``: works on batch and streaming frames
    alike; on a stream, append mode emits each bucket's exact total
    once its window closes.  NULL values carry no amount and are
    excluded (and on a stream therefore never advance the watermark —
    the s20 splice-scoping rule: Catalyst pushes this filter below
    EventTimeWatermark regardless of call order)."""
    src = df.withWatermark(ts_col, watermark) if df.isStreaming else df
    step = _STEP_SECONDS[bucket]
    v = value_col.cast("long").alias("_v")
    return (
        src.select(*groups, ts_col, v)
        .where(F.col("_v").isNotNull())
        .groupBy(
            *groups,
            F.window(F.col(ts_col), f"{step} seconds").alias("_w"),
        )
        .agg(F.sum("_v").cast("long").alias("total"))
        .select(
            *groups,
            F.date_format("_w.start", _BUCKET_FMT[bucket]).alias(bucket),
            "total",
        )
    )


def cusum_daily_series(
    daily: DataFrame,
    groups: Sequence[str],
    day_col: str,
    value_col: str,
    split: str,
    h_mult: int = 5,
) -> DataFrame:
    """Per (group, post-``split`` day): the one-sided CUSUM statistic
    of the daily series against the group's pre-split robust baseline.

    Baseline (reference days, ``day < split``): ``med_ref`` = exact
    lower median of the day totals, ``mad_ref`` = exact lower median
    of |total − med_ref| — rank selection with day tie-break (the
    q152/q192 idiom).  Monitored days (``day >= split``): slack-
    adjusted deviation ``dev = total − med_ref − mad_ref`` (the q166
    rule — only above-noise excess accumulates), and the zero-clamped
    running sum via the Lindley reflection identity

        S_i = prefix_i − min(0, min_{k<=i} prefix_k)

    as ONE window pass per group ordered by day (``clamped_balance``'s
    closed form, emitted as a SERIES rather than folded to one row).
    ``is_alarm`` = S > h_mult·mad_ref, exact ints.  Groups with no
    reference days emit NULL baseline columns and NULL statistic."""
    glist = list(groups)
    ref = daily.where(F.col(day_col) < split).select(
        *glist,
        F.col(day_col).alias("_d"),
        F.col(value_col).cast("long").alias("_x"),
    )
    med = _lower_median(ref, glist, "_x", "_d").withColumnRenamed(
        "med__x", "med_ref"
    )
    dev = ref.join(F.broadcast(med), glist).withColumn(
        "_dev", F.abs(F.col("_x") - F.col("med_ref"))
    )
    mad = _lower_median(dev, glist, "_dev", "_d").withColumnRenamed(
        "med__dev", "mad_ref"
    )
    base = med.join(mad, glist)

    cur = daily.where(F.col(day_col) >= split).select(
        *glist,
        F.col(day_col).alias("day"),
        F.col(value_col).cast("long").alias("x"),
    )
    w = (
        Window.partitionBy(*glist)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        cur.join(F.broadcast(base), glist, "left")
        .withColumn(
            "dev", F.col("x") - F.col("med_ref") - F.col("mad_ref")
        )
        .withColumn("_prefix", F.sum("dev").over(w))
        .withColumn(
            "cusum",
            F.col("_prefix")
            - F.least(F.min("_prefix").over(w), F.lit(0)),
        )
        .withColumn(
            "is_alarm",
            F.when(
                F.col("mad_ref").isNotNull(),
                F.col("cusum") > F.lit(int(h_mult)) * F.col("mad_ref"),
            ),
        )
    )
    return out.select(
        *glist,
        "day",
        F.col("x").alias("day_total"),
        "med_ref",
        "mad_ref",
        "dev",
        "cusum",
        "is_alarm",
    )
