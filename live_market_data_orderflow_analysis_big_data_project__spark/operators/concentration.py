"""Concentration / inequality metrics per group — Gini, HHI,
top-decile share.

"How concentrated is the flow?" — whether a market's volume, a
corpus's token mass, or a feature's traffic is dominated by few
actors — is answered by three standard metrics over the per-actor
totals:

- **Gini** via the sorted-rank identity
  ``G = (2·Σ rank·x − (n+1)·Σx) / (n·Σx)`` — rank ties among equal
  values cannot change the sum (swapping equal x across ranks is a
  no-op), so a total (x, id) ordering makes it engine-exact;
- **HHI** (Herfindahl) ``Σx² / (Σx)²`` — both terms exact int64,
  one multiply + one divide in IEEE;
- **top-decile share**: the ``ceil(n/10)`` largest actors' exact
  integer mass over the total — pure rank selection, no percentile
  interpolation.

Every aggregate is an exact int64 sum; each metric is a fixed
parenthesization of IEEE ops over those exact operands
(hashstable.py) — no ROUND, no float accumulation.

At 100 TB: one shuffle builds the (group, actor) totals
(map-side-combinable), one per-group window ranks them (partition
width = actors per group), and the metric aggregate emits one row
per group.  Overflow: Σ rank·x ≤ n·Σx — int64-safe while
n·total_cents < 2^63 (~10^12 actors × 10^6 cents); past that, lift
the two products to DECIMAL(38,0).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["concentration_metrics"]


def concentration_metrics(
    df: DataFrame,
    keys: list[str],
    actor_col: str,
    value_cents: Column,
) -> DataFrame:
    """Per-key concentration of an integer-cents value over actors.

    Output: the keys, ``n_actors``, ``total_cents``, ``gini``,
    ``hhi``, ``top_decile_share`` (share held by the ceil(n/10)
    largest actors; ties broken by actor id so the cut is total).
    """
    spend = df.groupBy(*keys, F.col(actor_col).alias("_actor")).agg(
        F.sum(value_cents).alias("_x")
    )
    asc = Window.partitionBy(*keys).orderBy("_x", "_actor")
    desc = Window.partitionBy(*keys).orderBy(
        F.col("_x").desc(), F.col("_actor").desc()
    )
    ranked = spend.withColumn(
        "_r", F.row_number().over(asc)
    ).withColumn("_rd", F.row_number().over(desc))
    # the top-decile cut needs n alongside each rank: a per-key window
    # count on the (group, actor) frame — domain-sized, not data-sized.
    ranked = ranked.withColumn(
        "_n", F.count(F.lit(1)).over(Window.partitionBy(*keys))
    )
    m = ranked.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_actors"),
        F.sum("_x").alias("total_cents"),
        F.sum(F.col("_r") * F.col("_x")).alias("_rx"),
        F.sum(F.col("_x") * F.col("_x")).alias("_xx"),
        # _rd <= ceil(n/10)  ⇔  _rd·10 <= n+9 — integer, no division
        F.sum(
            F.when(
                F.col("_rd") * F.lit(10) <= F.col("_n") + F.lit(9),
                F.col("_x"),
            ).otherwise(F.lit(0))
        ).alias("_top_cents"),
    )
    nd = F.col("n_actors").cast("double")
    bd = F.col("total_cents").cast("double")
    return (
        m.select(
            *keys,
            "n_actors",
            "total_cents",
            (
                (
                    F.lit(2.0) * F.col("_rx").cast("double")
                    - (nd + F.lit(1.0)) * bd
                )
                / (nd * bd)
            ).alias("gini"),
            (F.col("_xx").cast("double") / (bd * bd)).alias("hhi"),
            (F.col("_top_cents").cast("double") / bd).alias(
                "top_decile_share"
            ),
        )
    )
