"""Time-weighted average (TWAP) over irregular ticks.

A plain AVG over ticks answers "average of the OBSERVATIONS"; markets
need "average of the PROCESS" — each observation held (LOCF) until the
next one, weighted by how long it was the standing value.  This is the
reference engine's candle/VWAP family extended to irregular spacing:
the canonical time-weighted aggregate behind TWAP execution benchmarks
and time-in-state dashboards.

Exactness: weights are exact integer MICROSECONDS from ``unix_micros``
(`lead` over a (ts, id)-total-ordered window — the id tie-break makes
coincident ticks deterministic: all but the last get zero weight), and
values are exact integer cents, so Σ(cents·µs) and Σµs are exact int64
sums and the TWAP is ONE IEEE division of bit-identical operands — the
hashstable.py convention, no rounding.  The last tick of each day is
held to midnight; the pre-first-tick span has no standing value and is
excluded (TWAP over [first_tick, day_end]).

Overflow: per-row cents·µs ≤ |cents|·86,400·10^6 — int64-safe for
|value| up to ~10^6 cents per day-bucket; the per-group sum is bounded
by the same product because the durations partition the day.

At 100 TB: one shuffle to (keys, day) — the window sort and the
aggregation share that single exchange (same key), no joins, no
Python.  Per-partition width is a day's ticks for one key, the natural
bound; hot keys are AQE skew territory, not a plan defect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["time_weighted_avg"]


def time_weighted_avg(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    cents_col,
    id_col: str,
) -> DataFrame:
    """Per (keys…, day) TWAP of an integer-cents value.

    ``cents_col`` is a Column of exact int64 cents (see
    operators/robust.py::cents).  Output: the keys, ``day`` (string),
    ``n_ticks``, ``sum_dur_us`` (exact, == day_end − first_tick),
    ``sum_wt_cents_us`` (exact Σ value·duration), and ``twap_cents``
    (one exact-int IEEE division).
    """
    d = F.to_date(ts_col).alias("_d")
    base = df.select(
        *keys, F.col(ts_col).alias("_ts"), d, F.col(id_col).alias("_id"),
        cents_col.alias("_cents"),
    )
    w = Window.partitionBy(*keys, "_d").orderBy("_ts", "_id")
    day_end = F.date_add(F.col("_d"), 1).cast("timestamp")
    dur = F.unix_micros(
        F.coalesce(F.lead("_ts").over(w), day_end)
    ) - F.unix_micros(F.col("_ts"))
    weighted = base.withColumn("_dur_us", dur)
    out = weighted.groupBy(*keys, "_d").agg(
        F.count(F.lit(1)).alias("n_ticks"),
        F.sum("_dur_us").alias("sum_dur_us"),
        F.sum(F.col("_cents") * F.col("_dur_us")).alias("sum_wt_cents_us"),
    )
    return out.select(
        *keys,
        F.date_format("_d", "yyyy-MM-dd").alias("day"),
        "n_ticks",
        "sum_dur_us",
        "sum_wt_cents_us",
        (
            F.col("sum_wt_cents_us").cast("double")
            / F.col("sum_dur_us").cast("double")
        ).alias("twap_cents"),
    )
