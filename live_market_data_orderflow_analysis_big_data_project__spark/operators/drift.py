"""Population-stability (PSI) drift between two dataset snapshots.

Before a new ingest is allowed to join a training corpus — or a new
week of market data is trusted against a model fit on the last one —
the standard check is distribution drift per segment: bin the
REFERENCE snapshot into equal-mass deciles, count both snapshots into
those fixed bins, and score Σ (p−q)·ln(p/q) (the population stability
index; > 0.2 conventionally flags a shift).

Determinism strategy:

- decile EDGES are exact rank selections over the reference (the
  cross-multiplied ``rn·n_bins >= n·k`` rule — q161's machinery, no
  interpolation), so the bin boundaries are exact integers;
- bin assignment is ``Σ (x >= edge_k)`` — integer comparisons, no
  arrays, no search;
- bin shares are Laplace-smoothed ``(n_bin + 1)/(N + n_bins)`` so an
  empty bin cannot produce an infinite contribution — exact-integer
  IEEE divisions;
- only ``ln`` is transcendental: libm implementations may differ in
  the last ulp, so the per-bin contribution is ROUND(·, 4) — the
  hashstable.py rule: rounding is reserved for exactly this case.

At 100 TB: edges come from one per-key window over the reference
(the exact-selection n log n term); binning is a narrow expression
over both scans after a broadcast of the (keys × n_bins−1)-row edge
frame; the count aggregates collapse map-side.  Output is
keys × n_bins rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["psi_drift", "psi_from_histograms", "topk_drift"]


def topk_drift(
    hist: DataFrame,
    keys: list[str],
    period_col: str,
    item_col: str,
    n_col: str,
    split: str,
    k: int,
) -> DataFrame:
    """Top-k RANKING drift per (keys…, period) from a pre-counted
    (keys…, period, item, n) rollup — the monitor family's ranking
    member next to ``psi_from_histograms``'s distribution member: PSI
    answers "did the value distribution move", this answers "did the
    heavy hitters change" (a day whose per-bin shares look stable can
    still have swapped its top accounts — and vice versa).

    Reference = per key the top-k items by TOTAL count over periods
    before ``split``; current = per (key, period >= split) the top-k
    by that period's count; ties break (count desc, item asc) — the
    q143 total-order rule.  Output per (key, period): ``n_ref_k`` /
    ``n_cur_k`` (actual list sizes — a thin key may have fewer than k
    items, surfaced not padded), ``n_common``, ``jaccard_ppm`` (exact
    integer ppm of |∩|/|∪| — the q176 integer-argument rule: no float
    ratio in the gate), ``ref_top1`` / ``cur_top1`` and null-safe
    ``top1_same``.  Keys with NO pre-split history surface with
    n_ref_k = 0 and NULL ref_top1 (never dropped — the q167 new-
    segment rule).

    Scale shape: ``hist`` is the domain-bounded rollup a windowed
    streaming count agg emits (the data-sized pass already happened
    upstream); ref/cur top-k are rank windows over it, and every
    join afterwards is on (keys × k)-sized frames.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    per, item = F.col(period_col), F.col(item_col)
    ref_rk = F.row_number().over(
        Window.partitionBy(*keys).orderBy(F.desc("n_ref"), item)
    )
    ref_k = (
        hist.where(per < split)
        .groupBy(*keys, item_col)
        .agg(F.sum(n_col).cast("long").alias("n_ref"))
        .withColumn("_rk", ref_rk)
        .where(F.col("_rk") <= k)
        .select(*keys, item_col, F.col("_rk").alias("_ref_rk"))
    )
    cur_rk = F.row_number().over(
        Window.partitionBy(*keys, period_col).orderBy(
            F.desc(n_col), item
        )
    )
    cur_k = (
        hist.where(per >= split)
        .withColumn("_rk", cur_rk)
        .where(F.col("_rk") <= k)
        .select(*keys, period_col, item_col, F.col("_rk").alias("_cur_rk"))
    )
    cur_stats = cur_k.groupBy(*keys, period_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_cur_k"),
        F.min_by(item_col, "_cur_rk").alias("cur_top1"),
    )
    ref_stats = ref_k.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_ref_k"),
        F.min_by(item_col, "_ref_rk").alias("ref_top1"),
    )
    common = (
        cur_k.join(ref_k.select(*keys, item_col), [*keys, item_col])
        .groupBy(*keys, period_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    out = (
        cur_stats.join(F.broadcast(ref_stats), keys, "left")
        .join(common, [*keys, period_col], "left")
        .select(
            *keys,
            period_col,
            F.coalesce("n_ref_k", F.lit(0)).cast("long").alias("n_ref_k"),
            "n_cur_k",
            F.coalesce("n_common", F.lit(0)).cast("long").alias("n_common"),
            "ref_top1",
            "cur_top1",
        )
    )
    return out.select(
        *keys,
        period_col,
        "n_ref_k",
        "n_cur_k",
        "n_common",
        F.expr(
            "CAST(n_common * 1000000 DIV "
            "(n_ref_k + n_cur_k - n_common) AS BIGINT)"
        ).alias("jaccard_ppm"),
        "ref_top1",
        "cur_top1",
        F.expr("ref_top1 IS NOT DISTINCT FROM cur_top1").alias(
            "top1_same"
        ),
    )


def psi_from_histograms(
    ref: DataFrame,
    cur: DataFrame,
    keys: list[str],
    period_col: str,
    bin_col: str,
    n_col: str = "n",
) -> DataFrame:
    """PSI per (keys…, period, bin) from PRE-BINNED histograms — the
    monitoring read over a streamed rollup (s20's batch view), where
    ``psi_drift`` above bins raw rows itself.

    ``ref`` is (keys…, bin, n): the reference distribution per key.
    ``cur`` is (keys…, period, bin, n): one histogram per period (e.g.
    per closed day, as emitted by a windowed streaming count agg).
    For each (key, period) the bin DOMAIN is the union of the
    reference's bins and that period's bins — a bin present on either
    side scores; Laplace smoothing ``(n + 1)/(N + n_bins)`` keeps the
    other side finite (same rule as ``psi_drift``, with n_bins the
    per-(key, period) domain size so shares still sum to 1).

    Output: keys, period, bin, ``n_ref``/``n_cur`` (exact ints),
    ``n_bins``, ``p_ref``/``p_cur`` (exact-int IEEE divisions),
    ``psi_contrib`` (ROUND 4 — ln is the one transcendental; per-bin
    rounding keeps the gate order-independent, the q167 rule).
    Σ psi_contrib over a (key, period) is its PSI.

    Scale shape: both inputs are domain-bounded (keys × bins[× days])
    rollups, orders of magnitude below the rows they summarize; the
    domain union, grid joins and totals are all on those frames.  The
    raw-data pass happened upstream (the stream's one windowed count
    shuffle).
    """
    r = ref.select(*keys, F.col(bin_col).alias("_bin"),
                   F.col(n_col).alias("n_ref"))
    c = cur.select(*keys, F.col(period_col).alias("_per"),
                   F.col(bin_col).alias("_bin"),
                   F.col(n_col).alias("n_cur"))
    periods = c.select(*keys, "_per").distinct()
    # (key, period, bin) grid = ref bins replicated to every period
    # UNION that period's own bins — both frames domain-sized
    grid = (
        periods.join(r.select(*keys, "_bin"), keys)
        .unionByName(c.select(*keys, "_per", "_bin"))
        .distinct()
    )
    cells = (
        grid.join(r, [*keys, "_bin"], "left")
        .join(c, [*keys, "_per", "_bin"], "left")
        .select(
            *keys,
            "_per",
            "_bin",
            F.coalesce("n_ref", F.lit(0)).cast("long").alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).cast("long").alias("n_cur"),
        )
    )
    tot = Window.partitionBy(*keys, "_per")
    n_bins = F.count(F.lit(1)).over(tot)
    p = (F.col("n_ref") + F.lit(1)).cast("double") / (
        F.sum("n_ref").over(tot) + n_bins
    ).cast("double")
    q = (F.col("n_cur") + F.lit(1)).cast("double") / (
        F.sum("n_cur").over(tot) + n_bins
    ).cast("double")
    shared = cells.select(
        *keys,
        F.col("_per").alias(period_col),
        F.col("_bin").alias(bin_col),
        "n_ref",
        "n_cur",
        n_bins.cast("long").alias("n_bins"),
        p.alias("p_ref"),
        q.alias("p_cur"),
    )
    return shared.withColumn(
        "psi_contrib",
        F.round(
            (F.col("p_ref") - F.col("p_cur"))
            * F.log(F.col("p_ref") / F.col("p_cur")),
            4,
        ),
    )


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    keys: list[str],
    value_cents: Column,
    n_bins: int = 10,
) -> DataFrame:
    """PSI per (keys…, bin) between ``ref`` and ``cur`` snapshots.

    Output: the keys, ``bin`` (0-based, reference deciles),
    ``n_ref``, ``n_cur``, ``p_ref``/``p_cur`` (smoothed shares,
    exact-int divisions), ``psi_contrib`` (ROUND 4 — the one
    transcendental).  Σ psi_contrib per key is the PSI.  Keys present
    only in ``cur`` (new segments) get ONE extra row with bin/p/psi
    NULL and ``n_ref = 0`` — surfaced, never silently dropped.
    """
    r = ref.select(*keys, value_cents.alias("_x"))
    c = cur.select(*keys, value_cents.alias("_x"))

    w = Window.partitionBy(*keys).orderBy("_x")
    ranked = r.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_n", F.count(F.lit(1)).over(Window.partitionBy(*keys))
    )
    edge_aggs = [
        F.min(
            F.when(
                F.col("_rn") * F.lit(n_bins) >= F.col("_n") * F.lit(k),
                F.col("_x"),
            )
        ).alias(f"_e{k}")
        for k in range(1, n_bins)
    ]
    # the edge frame (keys x n_bins-1 scalars) feeds both binning
    # passes AND the grid — checkpoint the tiny frame so the reference
    # rank window runs once, not three times
    edges = ranked.groupBy(*keys).agg(*edge_aggs).localCheckpoint(
        eager=True
    )

    def binned(df: DataFrame, out: str) -> DataFrame:
        j = df.join(F.broadcast(edges), keys)
        b = sum(
            (F.col("_x") >= F.col(f"_e{k}")).cast("int")
            for k in range(1, n_bins)
        )
        return (
            j.withColumn("_bin", b.cast("long"))
            .groupBy(*keys, "_bin")
            .agg(F.count(F.lit(1)).alias(out))
        )

    grid = edges.select(*keys).crossJoin(
        F.broadcast(
            ref.sparkSession.range(n_bins).select(
                F.col("id").alias("_bin")
            )
        )
    )
    counts = (
        grid.join(binned(r, "n_ref"), [*keys, "_bin"], "left")
        .join(binned(c, "n_cur"), [*keys, "_bin"], "left")
        .select(
            *keys,
            F.col("_bin").alias("bin"),
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
    )
    tot = Window.partitionBy(*keys)
    p = (F.col("n_ref") + F.lit(1)).cast("double") / (
        F.sum("n_ref").over(tot) + F.lit(n_bins)
    ).cast("double")
    q = (F.col("n_cur") + F.lit(1)).cast("double") / (
        F.sum("n_cur").over(tot) + F.lit(n_bins)
    ).cast("double")
    shared = counts.withColumn("p_ref", p).withColumn("p_cur", q)
    scored = shared.select(
        *keys,
        "bin",
        "n_ref",
        "n_cur",
        "p_ref",
        "p_cur",
        F.round(
            (F.col("p_ref") - F.col("p_cur"))
            * F.log(F.col("p_ref") / F.col("p_cur")),
            4,
        ).alias("psi_contrib"),
    )
    # Brand-new segments — keys in cur with NO reference rows — have no
    # decile edges to bin against, but they are arguably the strongest
    # drift signal and must never vanish silently: emit ONE row per new
    # key with bin/p/psi NULL and the segment's full cur count, so a
    # `psi_contrib IS NULL` (or `n_ref = 0 AND bin IS NULL`) predicate
    # surfaces them.  The anti-join is against the (keys)-sized edge
    # frame — broadcast, no extra pass over ref.
    new_keys = (
        c.join(F.broadcast(edges.select(*keys)), keys, "left_anti")
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_cur"))
        .select(
            *keys,
            F.lit(None).cast("long").alias("bin"),
            F.lit(0).cast("long").alias("n_ref"),
            F.col("n_cur"),
            F.lit(None).cast("double").alias("p_ref"),
            F.lit(None).cast("double").alias("p_cur"),
            F.lit(None).cast("double").alias("psi_contrib"),
        )
    )
    return scored.unionByName(new_keys)
