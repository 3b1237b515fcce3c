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

__all__ = ["time_weighted_avg", "vwap_realized_vol"]


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


def vwap_realized_vol(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    cents_col,
    qty_col,
    id_col: str,
) -> DataFrame:
    """Per (keys…, day) VWAP and realized volatility — the execution-
    benchmark pair next to ``time_weighted_avg``'s TWAP: VWAP answers
    "what did the flow actually pay per unit", realized vol answers
    "how rough was the path it paid it on" (sqrt of the sum of squared
    log returns over the day's tick sequence — the standard RV
    estimator from high-frequency econometrics).

    Exactness: ``cents_col`` and ``qty_col`` are exact int64, so
    Σ(cents·qty) and Σqty are exact int64 sums and ``vwap_cents`` is
    ONE IEEE division of bit-identical operands — hashes with NO
    ROUND.  Log returns are ln of one IEEE division of exact ints
    over the (ts, id)-total-ordered tick sequence; ln is NOT
    correctly rounded and the float Σr² is partial-order dependent,
    so ``rv4`` is ROUND(…, 4) on BOTH sides — the q118/q185 ln rule,
    sweep-covered.  Non-positive prices raise (ln domain: Spark would
    yield NULL where DuckDB errors — fail loudly instead of
    diverging).

    Overflow: per-row cents·qty ≤ |cents|·max_qty; the per-(key, day)
    sum must stay under 2^63 — a day-bucket bound of ~10^12 cents·qty
    per key, orders of magnitude above any real book (rescale to
    coarser units past it).

    At 100 TB: one shuffle to (keys, day) shared by the lag window
    and the aggregation (the time_weighted_avg plan shape); no joins,
    no Python.  Output: keys…, ``day``, ``n_ticks``, ``sum_qty``,
    ``sum_qty_cents`` (exact anchors), ``vwap_cents``, ``n_returns``,
    ``rv4``.
    """
    d = F.to_date(ts_col).alias("_d")
    base = df.select(
        *keys,
        F.col(ts_col).alias("_ts"),
        d,
        F.col(id_col).alias("_id"),
        cents_col.alias("_c"),
        qty_col.alias("_q"),
    )
    w = Window.partitionBy(*keys, "_d").orderBy("_ts", "_id")
    safe_c = F.expr(
        "CASE WHEN _c <= 0 THEN CAST(raise_error('vwap_realized_vol: "
        "non-positive price - ln domain diverges across engines "
        "(Spark NULL vs DuckDB error)') AS BIGINT) ELSE _c END"
    )
    prev = F.lag(safe_c).over(w)
    r = F.when(
        prev.isNotNull(),
        F.log(safe_c.cast("double") / prev.cast("double")),
    )
    g = (
        base.withColumn("_r", r)
        .groupBy(*keys, "_d")
        .agg(
            F.count(F.lit(1)).alias("n_ticks"),
            F.sum("_q").alias("sum_qty"),
            F.sum(F.col("_c") * F.col("_q")).alias("sum_qty_cents"),
            F.count("_r").alias("n_returns"),
            F.sum(F.col("_r") * F.col("_r")).alias("_ss"),
        )
    )
    return g.select(
        *keys,
        F.date_format("_d", "yyyy-MM-dd").alias("day"),
        "n_ticks",
        "sum_qty",
        "sum_qty_cents",
        (
            F.col("sum_qty_cents").cast("double")
            / F.col("sum_qty").cast("double")
        ).alias("vwap_cents"),
        "n_returns",
        F.when(
            F.col("n_returns") > 0, F.round(F.sqrt(F.col("_ss")), 4)
        ).alias("rv4"),
    )
