"""Training-label QA: per-item majority vote + chance-corrected
inter-rater agreement — the label-aggregation stage of a preference /
annotation pipeline (RLHF ratings, eval judgments, crowd labels).

A 100 TB training-data system does not just store labels, it has to
DECIDE one label per item and MEASURE whether raters agree more than
chance before trusting the decision: per item the majority label with
a deterministic tie-break and its vote share; corpus-wide the pairwise
observed agreement P_o (the fraction of same-item rating pairs that
concur — the variable-raters-per-item generalization Fleiss' fixed-n
formula doesn't allow), the chance agreement P_e = Σ_c p_c² from the
marginal label shares, and kappa = (P_o − P_e) / (1 − P_e) (the
standard chance-corrected agreement family — Cohen/Fleiss/Scott shape,
all public).

Everything is exact-integer algebra until the final kappa step:
concordant pairs per item are Σ_c n_ic(n_ic−1) and total pairs
n_i(n_i−1) — counting arithmetic on the (item, label) cell frame,
never a rating×rating pair join.  kappa itself is evaluated as
(C/P − Q/N²) / (1 − Q/N²) with Q = Σ_c N_c², in a FIXED IEEE
parenthesization the oracle replays verbatim (the q154 pairwise-corr
discipline) + ROUND-4: the all-int64 rational form C·N²−P·Q carries
N³-scale terms that overflow int64 at million-rating corpora (the
16x probe caught exactly that), while here the only integer product
is N·N, loudly raise_error-guarded to N ≤ 3·10⁹ (the q176 pattern).

100 TB posture: one (item, rater) window pass for latest-wins rating
dedup, one (item, label) count shuffle; the item report is
item-frame-sized and the summary terms are label-domain-sized
aggregates — nothing pairwise is ever materialized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def label_agreement(
    df: DataFrame,
    item_col: str | Column,
    rater_col: str = "user_id",
    label_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Label-aggregation report: one ``kind='item'`` row per item plus
    one ``kind='summary'`` row.

    Item rows: ``n_raters`` (after latest-wins dedup — a rater's final
    answer per item is the rating with the greatest (ts, id)),
    ``n_pairs`` = n(n−1) ordered rating pairs, ``n_concordant`` =
    Σ_c n_c(n_c−1) of them agreeing, the majority label with the
    (count desc, label asc) tie-break, its integer ppm share, and the
    unanimity flag.

    Summary row: the same columns totalled (``majority_label`` = the
    corpus modal label), plus ``kappa4`` — pairwise observed agreement
    chance-corrected by the marginal label distribution, ROUND-4.
    NULL when undefined (no multi-rater item, or a single-label
    corpus where 1 − P_e = 0).
    """
    item = F.col(item_col) if isinstance(item_col, str) else item_col
    base = df.where(
        F.col(rater_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        item.alias("item_id"),
        F.col(rater_col).alias("rater"),
        F.col(label_col).alias("label"),
        F.col(ts_col).alias("_ts"),
        F.col(id_col).alias("_id"),
    )
    last_w = Window.partitionBy("item_id", "rater").orderBy(
        F.desc("_ts"), F.desc("_id")
    )
    ratings = (
        base.withColumn("_rk", F.row_number().over(last_w))
        .where(F.col("_rk") == 1)
        .select("item_id", "rater", "label")
    )
    cells = ratings.groupBy("item_id", "label").agg(
        F.count("*").alias("n_c")
    )
    items = cells.groupBy("item_id").agg(
        F.sum("n_c").alias("n_raters"),
        F.sum(F.col("n_c") * (F.col("n_c") - 1)).alias("n_concordant"),
        F.min(F.struct((-F.col("n_c")).alias("neg"), "label")).alias(
            "_maj"
        ),
    )
    item_rows = items.select(
        "item_id",
        "n_raters",
        "n_concordant",
        (-F.col("_maj.neg")).alias("_maj_n"),
        F.col("_maj.label").alias("majority_label"),
    ).select(
        F.lit("item").alias("kind"),
        F.col("item_id").cast("long").alias("item_id"),
        F.col("n_raters").cast("long").alias("n_raters"),
        (F.col("n_raters") * (F.col("n_raters") - 1))
        .cast("long")
        .alias("n_pairs"),
        F.col("n_concordant").cast("long").alias("n_concordant"),
        "majority_label",
        F.expr(
            "CAST((_maj_n * 1000000) div n_raters AS BIGINT)"
        ).alias("majority_share_ppm"),
        (F.col("_maj_n") == F.col("n_raters")).alias("is_unanimous"),
        F.lit(None).cast("double").alias("kappa4"),
    )
    marg = cells.groupBy("label").agg(F.sum("n_c").alias("n_l"))
    summary = (
        items.agg(
            F.sum("n_raters").alias("n"),
            F.sum(F.col("n_raters") * (F.col("n_raters") - 1)).alias(
                "p"
            ),
            F.sum("n_concordant").alias("c"),
        )
        .crossJoin(
            marg.agg(
                F.sum(F.col("n_l") * F.col("n_l")).alias("q"),
                F.min(
                    F.struct((-F.col("n_l")).alias("neg"), "label")
                ).alias("_gmaj"),
            )
        )
        .select(
            "n",
            "p",
            "c",
            "q",
            (-F.col("_gmaj.neg")).alias("_gmaj_n"),
            F.col("_gmaj.label").alias("majority_label"),
        )
        .select(
            F.lit("summary").alias("kind"),
            F.lit(None).cast("long").alias("item_id"),
            F.col("n").cast("long").alias("n_raters"),
            F.col("p").cast("long").alias("n_pairs"),
            F.col("c").cast("long").alias("n_concordant"),
            "majority_label",
            F.expr("CAST((_gmaj_n * 1000000) div n AS BIGINT)").alias(
                "majority_share_ppm"
            ),
            F.lit(None).cast("boolean").alias("is_unanimous"),
            _kappa4().alias("kappa4"),
        )
    )
    return item_rows.unionByName(summary)


def _kappa4() -> Column:
    """kappa = (P_o − P_e) / (1 − P_e) with P_o = C/P and
    P_e = Q/N², in a FIXED IEEE parenthesization replayed verbatim by
    the oracle (the q154 pairwise-corr discipline: identical doubles
    on both engines because the ops and their order are identical) —
    the all-int64 rational form C·N²−P·Q overflows at N ≈ 10⁶-scale
    corpora (its terms are N³-scale), while here the only integer
    product is N·N, loudly guarded to N ≤ 3·10⁹."""
    n, p, c, q = F.col("n"), F.col("p"), F.col("c"), F.col("q")
    n2 = F.when(
        n > F.lit(3_000_000_000),
        F.expr(
            "CAST(raise_error('label_agreement: N > 3e9 - N*N exceeds "
            "int64; compute P_e from pre-divided shares at this corpus "
            "size (operator docstring)') AS BIGINT)"
        ),
    ).otherwise(n * n)
    pe = q / n2
    return F.when(
        (p > 0) & (n * n != q),
        F.round((c / p - pe) / (F.lit(1.0) - pe), 4),
    )
