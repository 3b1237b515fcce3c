"""Deterministic weighted (PPS) sampling — systematic
probability-proportional-to-size selection in exact integer
arithmetic, no RNG state anywhere.

The sampling family so far is uniform or quota-based: q107 keeps a
hash-fraction of rows, q112 exact per-stratum QUOTAS, q114 disjoint
splits, q122 per-source Bernoulli reweighting.  None selects rows
with probability proportional to a SIZE column — the estimator shape
behind "sample shards for eval proportional to token count",
"audit suppliers proportional to spend": PPS keeps the big mass
in the sample, so Horvitz-Thompson totals (value/weight sums) have
far lower variance than uniform sampling of skewed populations.

Method (systematic PPS, the textbook survey-sampling design): order
the stratum deterministically by a content-hash key, prefix-sum the
integer weights into intervals [S_prev, S) on a circle of
circumference W (the stratum's total weight), and drop n equispaced
tickets t_j = j*W/n.  A row is selected once per ticket inside its
interval; rows with weight > W/n can draw several tickets
(``n_tickets`` > 1 — the "certainty units" of PPS, which an unbiased
estimator must keep as multiplicity, not clamp).  Exactly n tickets
per stratum, always.

Everything is INTEGER: tickets below S count = ceil(n*S/W) =
(n*S + W - 1) div W, so selection is
  tickets(n*S_end) - tickets(n*S_start) > 0
— two bigint divisions per row, bit-identical in any engine (the
hash-gate argument: no IEEE division anywhere).  Deterministic given
(data, key, n): rerun-stable across engines, partitionings, and
cluster sizes, the q107/q114 reproducibility contract.  Overflow
bound: n * W must stay under 2^63 — e.g. a 10^12-token stratum
samples up to ~9 million tickets; shard the stratum first if you
need more.

At 100 TB: the prefix sum is a window per STRATUM (lang/source/
shard), the same partitioned-window shape as q108's shard packing
and q125's epoch shuffle — no global sort, no driver state; stratum
size bounds the window sort, and a too-hot stratum is pre-split by a
hash sub-key exactly like q125's shards (sample n per sub-shard,
n_tickets stays proportional).  Zero joins, zero Python: one window
over one scan.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pps_sample", "weighted_sample_race"]


def pps_sample(
    df: DataFrame,
    strata_cols: Sequence[str],
    weight_col: str,
    n: int,
    key_col: str | Column,
    tiebreak_col: str | Column,
) -> DataFrame:
    """Systematic PPS sample of exactly ``n`` tickets per stratum.

    Returns the selected rows (all input columns) plus ``n_tickets``
    (selection multiplicity, >= 1).  ``key_col`` orders the stratum
    deterministically (use a content hash for a reproducible "random"
    order); ``tiebreak_col`` must make the order total — equal keys
    (duplicate texts) would otherwise leave prefix sums
    engine-dependent.  Rows with NULL or non-positive weight carry no
    sampling mass and are excluded before the circle is built.
    """
    w = F.col(weight_col)
    base = df.where(w.isNotNull() & (w > 0))
    order = Window.partitionBy(*strata_cols).orderBy(
        key_col if isinstance(key_col, Column) else F.col(key_col),
        tiebreak_col if isinstance(tiebreak_col, Column) else F.col(tiebreak_col),
    )
    stratum = Window.partitionBy(*strata_cols)
    s_end = F.sum(w).over(order.rowsBetween(Window.unboundedPreceding, 0))
    out = base.select(
        "*",
        (F.lit(n).cast("bigint") * s_end).alias("_ns_end"),
        (F.lit(n).cast("bigint") * (s_end - w)).alias("_ns_start"),
        F.sum(w).over(stratum).alias("_w_tot"),
    )
    # tickets strictly below S: ceil(n*S / W) == (n*S + W - 1) div W
    tickets = (
        F.expr("(_ns_end + _w_tot - 1) div _w_tot")
        - F.expr("(_ns_start + _w_tot - 1) div _w_tot")
    ).alias("n_tickets")
    return (
        out.select("*", tickets)
        .where(F.col("n_tickets") > 0)
        .drop("_ns_end", "_ns_start", "_w_tot")
    )


def weighted_sample_race(
    df: DataFrame,
    strata_cols: Sequence[str],
    weight_col: str,
    n: int,
    id_col: str,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement — the
    Efraimidis–Spirakis A-ES law, realized exactly in integers.

    A-ES ranks items by u_i^(1/w_i) (u_i uniform) and keeps the top
    n — successive draws proportional to weight, the weighted
    reservoir law.  The exponent is a transcendental-float trap for
    cross-engine hash parity, so this operator uses the
    DISTRIBUTIONALLY IDENTICAL race form: give item i exactly w_i
    integer tickets, hash each ticket (md5(id:t) — fixed-width hex,
    so string order IS numeric order), and rank items by their
    MINIMUM ticket hash.  min of w iid uniforms ~ 1 - (1-U)^(1/w)
    beats a rival's minimum with probability w_i/(w_i+w_j) — exactly
    A-ES's u^(1/w) race at every successive selection — and under
    the hash-as-random model the whole sample is a pure function of
    the data: rerun-stable across engines, partitionings and cluster
    sizes (the q107/q147 reproducibility contract), hash-gateable
    because both engines compute the identical md5 strings.

    Output: the selected rows' ``strata_cols``, ``id_col``, the
    weight, and ``rank`` (1..n by ascending min-ticket).  Rows with
    NULL/non-positive weight carry no mass and are excluded.

    Scale shape: the ticket explode is O(sum of weights) rows but
    lives entirely map-side — the min() is algebraic, so the shuffle
    carries ONE row per item (partial min per partition), and the
    top-n per stratum is the q45 rank-window over the item frame.
    Integer weights are the intended regime (chunk counts, shard
    counts, doc multiplicities); for unbounded weights switch the
    key to the float A-ES exponent at deployment and keep this exact
    twin as the gated configuration.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    w = F.col(weight_col)
    base = df.where(w.isNotNull() & (w > 0))
    tickets = base.select(
        *strata_cols,
        id_col,
        w.cast("long").alias("weight"),
        # LONG sequence bounds: with an int bound, a weight past 2^31-1
        # would wrap silently under ANSI-off and sequence() would
        # descend from 1 — wrong tickets with no error (the
        # collocation_lift silent-wrap divergence class).  With long
        # bounds an oversized weight hits Spark's sequence-length cap
        # and fails LOUDLY instead; weights that large mean the ticket
        # race is the wrong realization anyway (module docstring: switch
        # to the float A-ES exponent at deployment).
        F.explode(
            F.sequence(F.lit(1).cast("long"), w.cast("long"))
        ).alias("_t"),
    )
    key = F.md5(
        F.concat_ws(
            ":", F.col(id_col).cast("string"), F.col("_t").cast("string")
        ).cast("binary")
    )
    best = (
        tickets.withColumn("_tk", key)
        .groupBy(*strata_cols, id_col, "weight")
        .agg(F.min("_tk").alias("_k"))
    )
    rank = F.row_number().over(
        Window.partitionBy(*strata_cols).orderBy("_k", id_col)
    )
    return (
        best.withColumn("rank", rank.cast("long"))
        .where(F.col("rank") <= n)
        .drop("_k")
    )
