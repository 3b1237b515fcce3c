"""Time-bucket gap-filling with LOCF and linear interpolation — the
hypertable ``time_bucket_gapfill`` / ``locf()`` / ``interpolate()``
capability class, expressed as pure DataFrame ops.

The engine's time-series surface (candles q06/q48, sliding q46,
sessions q47, as-of q25) aggregates the buckets that EXIST; nothing
yet emits the buckets that don't.  Downstream consumers of a rollup
(charting, anomaly baselines, join-by-bucket feature frames) need a
DENSE time axis: a bucket with no rows must appear with count 0 and a
principled value — last-observation-carried-forward for step signals
(book state, config), linear interpolation for flow-ish signals.
That dense-grid semantic is exactly TimescaleDB's
``time_bucket_gapfill(...)`` with ``locf(sum(x))`` /
``interpolate(sum(x))``; the reference's candle rollup
(candle_to_hdfs.py:40-63) simply drops empty windows — a gap in its
output is indistinguishable from a feed outage.

Shape (one pass + one bounded fan-out; no Python, no driver loop):

1. aggregate actuals per (keys, bucket)            — ONE data shuffle;
2. global [lo, hi] bucket bounds: a 1-row scalar aggregate broadcast
   into the plan (the q140 zorder bounds pattern) — never a per-key
   re-scan;
3. dense grid = distinct keys x ``sequence(lo, hi, step)`` explode —
   fan-out is keys x buckets, the OUTPUT size, independent of input
   row count;
4. left join actuals onto the grid on (keys, bucket) — co-partitioned
   with shuffle 1's keys;
5. LOCF + interpolation via two mirrored windows per key
   (``last(..., ignorenulls)`` looking back, ``first(..., ignorenulls)``
   looking forward) — both share ONE exchange on keys.

At 100 TB: the only full-data shuffle is the bucket aggregation; the
grid, join and windows are sized by keys x time-span (the DENSE OUTPUT
a gapfill query is asking for), not by input rows.  A per-key window
partition holds span/step rows — bounded by the queried time range,
so a decade of hourly buckets is ~88k rows per key regardless of
ingest volume.  Keys are the grid's partitioning; a skewed key cannot
exist (every key has exactly the same number of grid rows).

Hash-exactness: bucket sums are decimal-backed (functions/hashstable);
interpolation is ``prev + ((next - prev) * (dx / span))`` with every
operand bit-identical on both engines and the parenthesization fixed,
so the three IEEE ops are correctly-rounded on identical inputs —
deterministic, no rounding needed (the avg_exact argument).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "gapfill_time_bucket",
    "gapfill_from_buckets",
    "bucket_sums_windowed",
]

_STEP_SECONDS = {"hour": 3600, "day": 86400, "minute": 60}


def bucket_sums_windowed(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    agg_value: Column,
    count_value: Column,
    bucket: str = "hour",
    watermark: str = "0 seconds",
) -> DataFrame:
    """The bucket-aggregation stage as an event-time window — works on
    BATCH and STREAMING frames alike (the s14 sketch-rollup shape): a
    stream maintains the (keys, bucket) sums incrementally, append
    mode emits each bucket exactly once when its window closes, and
    the gap-fill runs as a batch view over the emitted table
    (``gapfill_from_buckets``).  State per open (key, window) is one
    sum + one count — watermark-bounded like any windowed agg."""
    src = df.withWatermark(ts_col, watermark) if df.isStreaming else df
    step = _STEP_SECONDS[bucket]
    return (
        src.groupBy(
            *list(keys),
            F.window(F.col(ts_col), f"{step} seconds").alias("_w"),
        )
        .agg(agg_value.alias("actual_sum"), count_value.alias("n_rows"))
        .select(
            *list(keys),
            F.col("_w.start").alias("bucket_ts"),
            "actual_sum",
            "n_rows",
        )
    )


def gapfill_time_bucket(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    agg_value: Column,
    count_value: Column,
    bucket: str = "hour",
) -> DataFrame:
    """Dense per-key time grid with LOCF and linear interpolation.

    Returns one row per (key, bucket) over the GLOBAL [min, max]
    observed bucket range (the TimescaleDB semantic: the fill window
    is the query's time range, shared by all series so the grids
    align for join-by-bucket consumers):

    - ``bucket_ts``   the bucket timestamp;
    - ``n_rows``      rows aggregated into the bucket (0 for a gap);
    - ``actual_sum``  ``agg_value`` where the bucket has rows, else NULL;
    - ``locf_sum``    last non-NULL ``actual_sum`` at or before the
      bucket (NULL before the key's first observation);
    - ``interp_sum``  ``actual_sum`` where present, else the linear
      interpolation between the key's neighbouring observations
      (NULL outside [first, last] observation — extrapolation is a
      policy choice, not a default);
    - ``is_gap``      TRUE where the bucket had no rows.

    ``agg_value``/``count_value`` are aggregate Columns (pass
    decimal-backed sums from functions.hashstable for hash-stable
    output).  ``bucket`` is one of minute/hour/day.
    """
    actual = (
        df.withColumn("bucket_ts", F.date_trunc(bucket, F.col(ts_col)))
        .groupBy(*list(keys), "bucket_ts")
        .agg(agg_value.alias("actual_sum"), count_value.alias("n_rows"))
    )
    return gapfill_from_buckets(actual, keys, bucket)


def gapfill_from_buckets(
    actual: DataFrame, keys: Sequence[str], bucket: str = "hour"
) -> DataFrame:
    """The grid/LOCF/interpolation stages over an ALREADY-bucketed
    frame (columns: keys…, ``bucket_ts``, ``actual_sum``,
    ``n_rows``) — shared by the batch path above and the streaming
    twin, whose bucket sums arrive from a windowed streaming agg
    (``bucket_sums_windowed``)."""
    step = _STEP_SECONDS[bucket]
    klist = list(keys)

    bounds = actual.agg(
        F.min("bucket_ts").alias("_lo"), F.max("bucket_ts").alias("_hi")
    )
    grid = (
        actual.select(*klist)
        .distinct()
        .crossJoin(F.broadcast(bounds))  # 1-row scalar bounds, broadcast
        .select(
            *klist,
            F.explode(
                F.sequence("_lo", "_hi", F.expr(f"interval {step} seconds"))
            ).alias("bucket_ts"),
        )
    )

    full = grid.join(actual, klist + ["bucket_ts"], "left")

    back = (
        Window.partitionBy(*klist)
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    fwd = (
        Window.partitionBy(*klist)
        .orderBy("bucket_ts")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    observed_ts = F.when(F.col("actual_sum").isNotNull(), F.col("bucket_ts"))
    idx = F.unix_timestamp("bucket_ts")
    prev_val = F.last("actual_sum", ignorenulls=True).over(back)
    next_val = F.first("actual_sum", ignorenulls=True).over(fwd)
    prev_idx = F.unix_timestamp(F.last(observed_ts, ignorenulls=True).over(back))
    next_idx = F.unix_timestamp(F.first(observed_ts, ignorenulls=True).over(fwd))

    # prev + ((next - prev) * (dx / span)): parenthesization is the
    # hash contract — the oracle twin must spell the IDENTICAL tree.
    frac = (idx - prev_idx).cast("double") / (next_idx - prev_idx).cast("double")
    interp = (
        F.when(F.col("actual_sum").isNotNull(), F.col("actual_sum"))
        .when(
            prev_val.isNotNull() & next_val.isNotNull(),
            prev_val + ((next_val - prev_val) * frac),
        )
        .otherwise(F.lit(None).cast("double"))
    )

    return full.select(
        *klist,
        "bucket_ts",
        F.coalesce("n_rows", F.lit(0)).alias("n_rows"),
        "actual_sum",
        prev_val.alias("locf_sum"),
        interp.alias("interp_sum"),
        F.col("actual_sum").isNull().alias("is_gap"),
    )
