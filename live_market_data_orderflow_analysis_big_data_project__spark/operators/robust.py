"""Robust (median/MAD) outlier statistics in exact integer arithmetic.

Mean/stddev anomaly gates (the z-score shape, q82's grouped-map demo)
are themselves skewed by the outliers they hunt; the robust estimator
pair — median and MAD (median absolute deviation) — has a 50%
breakdown point and is the standard data-quality screen for value
columns (price spikes, sensor glitches, corrupt token counts) before a
corpus or feed is trusted.

Exactness strategy: values are fixed to integer cents through a
DECIMAL(18,2) cast (exact for 2-decimal fixture money/value columns),
and the median is the LOWER median selected by explicit rank
arithmetic — ``row_number = (n + 1) div 2`` over a totally-ordered
(cents, id) sort — NOT an engine ``median()``/``quantile()`` call,
whose interpolation conventions differ between engines.  The outlier
gate is the integer 3-MAD rule (|x - med| > 3 * MAD): every compared
quantity is a BIGINT, so the result is bit-identical anywhere.  The
one IEEE division (outlier_rate) divides exact integers.

Shape: two selection passes (median of values, then median of
deviations), each ONE window over a per-group sort, with the 1-row-
per-group medians broadcast back — never a self-join of data against
data.  At 100 TB the per-group sort is the cost of EXACT selection;
group counts bound each partition, a too-hot group pre-splits like
q125's shards, and when exactness isn't required the approximate path
is q99b's GK sketch — this operator is the exact twin that certifies
it.  No Python, no driver state, no global sort.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "cents",
    "mad_outlier_stats",
    "seasonal_outliers",
    "weighted_quantile_stats",
]


def cents(col: Column | str) -> Column:
    """Exact integer cents of a 2-decimal double column.

    DECIMAL(18,2) absorbs the double's representation error (the
    nearest 2-decimal value IS the intended one for fixture money
    columns); * 100 and the BIGINT cast are then exact.  Oracle twin:
    ``CAST(CAST(x AS DECIMAL(18,2)) * 100 AS BIGINT)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (c.cast("decimal(18,2)") * 100).cast("long")


def _lower_median(df: DataFrame, groups: Sequence[str], value: str, tiebreak: str):
    """1 row per group: the lower median of ``value`` (explicit rank
    arithmetic; totally ordered by (value, tiebreak))."""
    g = Window.partitionBy(*groups)
    rn = F.row_number().over(g.orderBy(value, tiebreak))
    n = F.count(F.lit(1)).over(g)
    return (
        df.withColumn("_rn", rn)
        .withColumn("_n", n)
        .where(F.col("_rn") == F.expr("(_n + 1) div 2"))
        .select(*groups, F.col(value).alias(f"med_{value}"))
    )


def mad_outlier_stats(
    df: DataFrame,
    groups: Sequence[str],
    value_col: str,
    id_col: str,
    k: int = 3,
) -> DataFrame:
    """Per-group robust stats + integer k-MAD outlier counts.

    Output per group: ``n_rows``, ``med_cents`` (lower median of the
    cents-fixed value), ``mad_cents`` (lower median of |x - med|),
    ``n_outliers`` (|x - med| > k * MAD), ``outlier_rate``.
    """
    glist = list(groups)
    c = df.select(
        *glist, F.col(id_col).alias("_id"), cents(value_col).alias("_cents")
    )
    med = _lower_median(c, glist, "_cents", "_id").withColumnRenamed(
        "med__cents", "med_cents"
    )
    dev = c.join(F.broadcast(med), glist).withColumn(
        "_dev", F.abs(F.col("_cents") - F.col("med_cents"))
    )
    mad = _lower_median(dev, glist, "_dev", "_id").withColumnRenamed(
        "med__dev", "mad_cents"
    )
    flagged = dev.join(F.broadcast(mad), glist)
    return flagged.groupBy(*glist).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.max("med_cents").alias("med_cents"),
        F.max("mad_cents").alias("mad_cents"),
        F.sum(
            F.when(
                F.col("_dev") > F.lit(int(k)) * F.col("mad_cents"), 1
            ).otherwise(0)
        ).alias("n_outliers"),
        (
            F.sum(
                F.when(
                    F.col("_dev") > F.lit(int(k)) * F.col("mad_cents"), 1
                ).otherwise(0)
            ).cast("double")
            / F.count(F.lit(1))
        ).alias("outlier_rate"),
    )


def weighted_quantile_stats(
    df: DataFrame,
    keys: Sequence[str],
    value_col: Column | str,
    weight_col: Column | str,
    id_col: Column | str,
    quantiles: Sequence[tuple[str, int, int]] = (
        ("wmedian_cents", 1, 2),
        ("wp90_cents", 9, 10),
    ),
) -> DataFrame:
    """Exact WEIGHTED quantiles per group, all-integer selection.

    The weighted generalization of the lower median: the chosen value
    for quantile num/den is the first (in the total (cents, id)
    order) whose running cumulative weight satisfies
    ``den·cum >= num·W`` (W = the group's total weight) — cross-
    multiplied so the comparison stays in exact int64, no division.
    Because the cumulative sum is nondecreasing along the sort, the
    satisfying rows form a suffix and ``min(cents WHERE satisfied)``
    IS the first one — a conditional aggregate, no second window.

    Weights must be nonnegative integers (quantities, token counts,
    repeat multiplicities); a zero-weight row never shifts a quantile
    but remains a valid tie-break carrier.  Output per group: the
    keys, ``n_rows``, ``total_weight``, one int64 cents column per
    requested quantile.

    Same scale shape as mad_outlier_stats: ONE window over the
    per-group (cents, id) sort — the n log n cost of exactness —
    plus a map-side-combinable aggregate; no joins, no Python.
    """
    c = df.select(
        *keys,
        cents(value_col).alias("_cents"),
        F.col(weight_col).cast("long").alias("_w")
        if isinstance(weight_col, str)
        else weight_col.cast("long").alias("_w"),
        (F.col(id_col) if isinstance(id_col, str) else id_col).alias(
            "_id"
        ),
    )
    ordered = Window.partitionBy(*keys).orderBy("_cents", "_id")
    whole = Window.partitionBy(*keys)
    r = c.withColumn(
        "_cum",
        F.sum("_w").over(
            ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).withColumn("_W", F.sum("_w").over(whole))
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.max("_W").alias("total_weight"),
    ]
    for alias, num, den in quantiles:
        aggs.append(
            F.min(
                F.when(
                    F.col("_cum") * F.lit(int(den))
                    >= F.col("_W") * F.lit(int(num)),
                    F.col("_cents"),
                )
            ).alias(alias)
        )
    return r.groupBy(*keys).agg(*aggs)


def seasonal_outliers(
    df: DataFrame,
    groups: Sequence[str],
    season_col: str,
    value_col: str,
    id_col: str,
    k: int = 3,
) -> DataFrame:
    """Per-ROW robust outlier flags against the row's SEASONAL
    baseline — the seasonal twin of ``mad_outlier_stats``: a Monday is
    judged against other Mondays, so weekly rhythm (quiet Sundays,
    busy Mondays) stops masquerading as anomaly and a genuinely odd
    Monday stops hiding inside the all-days spread.

    ``value_col`` is an EXACT int64 series (already cents-fixed —
    unlike ``mad_outlier_stats`` this does not re-fix, because the
    typical input is an aggregated daily-totals frame); median and
    MAD are lower medians by explicit rank selection, totally ordered
    by (value, ``id_col``) — the module's engine-identical selection
    discipline, no ``median()``/``quantile()`` calls.

    Output: one row per input row — groups…, ``season_col``,
    ``id_col``, ``x`` (the value), ``med_x``/``mad_x`` (the seasonal
    baseline), ``dev_x`` (= |x − med|), ``is_outlier``
    (dev > k·MAD).  All exact ints + a boolean: fully hash-gateable.

    At 100 TB: two selection windows keyed by (groups, season) over
    the input frame plus two broadcast joins of the |groups × seasons|
    baseline — when the input is a daily-totals frame the whole
    computation is DOMAIN-bounded (keys × days), with the one
    corpus-sized shuffle paid upstream by the totals groupBy.
    """
    glist = [*groups, season_col]
    c = df.select(
        *glist, F.col(id_col).alias("_id"), F.col(value_col).alias("_x")
    )
    med = _lower_median(c, glist, "_x", "_id").withColumnRenamed(
        "med__x", "med_x"
    )
    dev = c.join(F.broadcast(med), glist).withColumn(
        "_dev", F.abs(F.col("_x") - F.col("med_x"))
    )
    mad = _lower_median(dev, glist, "_dev", "_id").withColumnRenamed(
        "med__dev", "mad_x"
    )
    return (
        dev.join(F.broadcast(mad), glist)
        .select(
            *glist,
            F.col("_id").alias(id_col),
            F.col("_x").alias("x"),
            "med_x",
            "mad_x",
            F.col("_dev").alias("dev_x"),
            (F.col("_dev") > F.lit(int(k)) * F.col("mad_x")).alias(
                "is_outlier"
            ),
        )
    )
