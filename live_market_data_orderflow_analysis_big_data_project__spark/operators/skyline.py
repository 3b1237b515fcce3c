"""2-D skyline (Pareto frontier) per group, window-based.

"Best price for the quantity" questions — which offers are not beaten
on BOTH axes by any other — are the skyline operator of the classic
literature (Börzsönyi et al.'s SKYLINE OF clause; nothing in Spark or
ANSI SQL ships it).  A point p dominates q when p is no worse on both
criteria and strictly better on at least one; the skyline is the
un-dominated set.

For TWO criteria the naive dominance self-join (quadratic in group
size) collapses to sorted-prefix arithmetic: sort by (price ASC,
qty DESC) — a point survives iff

- no strictly-cheaper point has qty >= its own:
  ``max(qty) RANGE [unbounded, price-1] < qty``  (dominator needs
  only price strictly less + qty greater-OR-EQUAL), and
- it has the max qty among its exact-price peers (a same-price point
  dominates only with strictly more qty; equal (price, qty)
  duplicates never dominate each other and all survive).

Both conditions are ONE window pass each over the same per-group
sort, exact integer comparisons throughout — engine-exact and linear
(n log n) where the self-join is quadratic.

At 100 TB: one shuffle to the group key; the RANGE frame and the
per-(group, price) max share the sorted partition.  Group size bounds
the sort, the frontier output is typically tiny, and the groupBy that
collapses duplicate frontier points is map-side-combinable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["skyline_2d"]


def skyline_2d(
    df: DataFrame,
    keys: list[str],
    min_col: Column,
    max_col: Column,
) -> DataFrame:
    """Per-key Pareto frontier: minimize ``min_col``, maximize
    ``max_col`` (both exact integers).

    Output one row per distinct frontier point: the keys, ``min_val``,
    ``max_val``, ``n_rows`` (multiplicity of the point).
    """
    base = df.select(
        *keys, min_col.alias("_mn"), max_col.alias("_mx")
    )
    lower = (
        Window.partitionBy(*keys)
        .orderBy("_mn")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    peers = Window.partitionBy(*keys, "_mn")
    flagged = base.withColumn(
        "_best_lt", F.max("_mx").over(lower)
    ).withColumn("_best_eq", F.max("_mx").over(peers))
    survivors = flagged.where(
        (F.col("_best_lt").isNull() | (F.col("_mx") > F.col("_best_lt")))
        & (F.col("_mx") == F.col("_best_eq"))
    )
    return survivors.groupBy(*keys, "_mn", "_mx").agg(
        F.count(F.lit(1)).alias("n_rows")
    ).select(
        *keys,
        F.col("_mn").alias("min_val"),
        F.col("_mx").alias("max_val"),
        "n_rows",
    )
