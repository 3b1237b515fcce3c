"""Clamped running balance — a non-associative scan in pure windows.

``S_i = max(0, S_{i-1} + x_i)`` (an account that cannot go negative,
inventory that cannot be oversold, a token bucket) is NOT a window
aggregate: the clamp makes the fold non-associative, so engines
without recursion express it only via per-row iteration (recursive
CTE, UDF loop).  But the clamp-at-zero fold has a closed form — the
reflection identity of the Lindley recursion (queueing theory's
waiting-time process):

    S_i = prefix_i − min(0, min_{k≤i} prefix_k)

(the balance is the raw prefix sum lifted by the worst drawdown so
far).  Both terms are plain windowed aggregates over one per-key
(ts, id)-ordered sort, so the whole scan is ONE window pass, exact
int64 throughout, engine-portable — no recursion, no Python, no
driver loop.

The clamp fires at step i iff the raw prefix dips strictly below the
previous floor: ``prefix_i < min(0, min_{k<i} prefix_k)`` — also a
window expression (the shifted running min), so "how often was the
account pinned at zero" ships with the balance.

At 100 TB: one shuffle to the key, per-partition width = one key's
event count; the aggregate output is one row per key.  Same n log n
selection class as q152/q156/q161.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["clamped_balance"]


def clamped_balance(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    amount_col: Column,
    id_col: str,
    alarm_threshold: Column | None = None,
) -> DataFrame:
    """Per-key zero-clamped running balance of signed int64 amounts.

    Output per key: ``n_events``, ``final_balance`` (the fold's end
    state), ``peak_balance`` (max clamped balance ever held),
    ``n_clamped`` (steps where the zero floor engaged).

    ``alarm_threshold`` (optional, an int64 Column constant per key)
    turns the fold into a one-sided CUSUM monitor (Page's test: the
    clamped sum of deviations IS the CUSUM statistic): the output
    gains ``n_alarms`` — steps where the running statistic exceeded
    the threshold.
    """
    cols = [
        F.col(key_col).alias("_k"),
        F.col(ts_col).alias("_ts"),
        F.col(id_col).alias("_id"),
        amount_col.cast("long").alias("_x"),
    ]
    if alarm_threshold is not None:
        cols.append(alarm_threshold.cast("long").alias("_h"))
    base = df.select(*cols)
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_prev = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    r = (
        base.withColumn("_prefix", F.sum("_x").over(w))
        .withColumn("_floor", F.least(F.min("_prefix").over(w), F.lit(0)))
        .withColumn(
            "_prev_floor",
            F.least(
                F.coalesce(F.min("_prefix").over(w_prev), F.lit(0)),
                F.lit(0),
            ),
        )
    )
    bal = F.col("_prefix") - F.col("_floor")
    clamped = F.when(F.col("_prefix") < F.col("_prev_floor"), 1).otherwise(0)
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        (F.sum("_x") - F.least(F.min("_prefix"), F.lit(0))).alias(
            "final_balance"
        ),
        F.max(bal).alias("peak_balance"),
        F.sum(clamped).cast("long").alias("n_clamped"),
    ]
    if alarm_threshold is not None:
        aggs.append(
            F.sum(F.when(bal > F.col("_h"), 1).otherwise(0))
            .cast("long")
            .alias("n_alarms")
        )
    return r.groupBy(F.col("_k").alias(key_col)).agg(*aggs)
