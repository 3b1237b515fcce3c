"""Market-basket co-occurrence: support / confidence / lift.

The association-rule view of an event stream: a basket is a key tuple
(here: user × day), items are the categorical values seen in it, and
each item pair gets the classic Apriori-style measures — how often
the pair co-occurs (support), how predictive one side is of the other
(confidence), and how far above independence the pair sits (lift).
Only pairs are mined (the k=2 Apriori level): pair statistics are the
decision layer for "users who X also Y" dashboards, and higher levels
explode combinatorially for little analytic value on low-cardinality
item domains.

Exactness: every count is an exact integer over DISTINCT basket
membership (duplicate events in a basket count once), and each
measure is a fixed parenthesization of IEEE ops over exact operands —
support = pair/baskets and confidence = pair/item are single
divisions; lift = (pair·baskets)/(item_a·item_b) is two exact-int
double products and one division.  No rounding (hashstable.py).

At 100 TB: membership dedup is one (basket, item) shuffle; the pair
builder self-joins ON THE BASKET KEY, so fan-out per basket is
bounded by items-per-basket² (≤ |item domain|², small by
construction), never corpus²; item supports and the basket count are
domain-bounded aggregates broadcast back into the pair frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["cooccurrence_lift"]


def cooccurrence_lift(
    df: DataFrame, basket_cols: list[str], item_col: str
) -> DataFrame:
    """Pairwise co-occurrence measures over distinct basket membership.

    Output per unordered item pair (``item_a < item_b``): ``item_a``,
    ``item_b``, ``n_pair``, ``n_a``, ``n_b``, ``n_baskets``,
    ``support`` = n_pair/n_baskets, ``conf_a_to_b`` = n_pair/n_a,
    ``conf_b_to_a`` = n_pair/n_b, ``lift`` =
    (n_pair·n_baskets)/(n_a·n_b).
    """
    # the membership frame feeds FOUR consumers (pair sides, item
    # supports, basket count); without a lineage cut Spark recomputes
    # the distinct per consumer (measured: 8 parquet scans / 16
    # exchanges -> 2 scans after).  It is domain-bounded
    # (baskets × items-per-basket), so the q111/s15 localCheckpoint
    # idiom is cheaper than any recompute — and unlike persist() it is
    # query-scoped (no CacheManager lifetime to release; bench-safe).
    member = (
        df.select(*basket_cols, F.col(item_col).alias("_item"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # one-row frame, broadcast-crossed in (the zorder scalar idiom) —
    # NOT a driver-side .count(), which would cost a second job per run
    # and break the build-lazily contract.
    nb_frame = (
        member.select(*basket_cols)
        .distinct()
        .agg(F.count(F.lit(1)).alias("n_baskets"))
    )
    item_n = member.groupBy("_item").agg(F.count(F.lit(1)).alias("_n"))

    a = member.select(*basket_cols, F.col("_item").alias("item_a"))
    b = member.select(*basket_cols, F.col("_item").alias("item_b"))
    pairs = (
        a.join(b, basket_cols)
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_pair"))
    )
    na = item_n.select(
        F.col("_item").alias("item_a"), F.col("_n").alias("n_a")
    )
    nb = item_n.select(
        F.col("_item").alias("item_b"), F.col("_n").alias("n_b")
    )
    out = (
        pairs.join(F.broadcast(na), "item_a")
        .join(F.broadcast(nb), "item_b")
        .crossJoin(F.broadcast(nb_frame))
    )
    pd_, nad, nbd = (
        F.col("n_pair").cast("double"),
        F.col("n_a").cast("double"),
        F.col("n_b").cast("double"),
    )
    nbk = F.col("n_baskets").cast("double")
    return out.select(
        "item_a",
        "item_b",
        "n_pair",
        "n_a",
        "n_b",
        "n_baskets",
        (pd_ / nbk).alias("support"),
        (pd_ / nad).alias("conf_a_to_b"),
        (pd_ / nbd).alias("conf_b_to_a"),
        ((pd_ * nbk) / (nad * nbd)).alias("lift"),
    )
