"""Mergeable fixed-bin histogram rollups (sparse map representation) —
the distribution/quantile counterpart to the HLL rollup
(operators/sketches.py).

The 100 TB pattern: percentile monitoring ("p99 latency per service per
day", "token-count distribution per source per shard") without
re-scanning rows per question.  Maintain one SPARSE histogram per
(group x time-bucket) — a ``map<bin_index, count>`` holding only
occupied bins — then any bucket range is answered by merging maps
(elementwise count sum) and reading quantiles off the cumulative bin
counts.  Incremental ingest re-histograms only the touched bucket,
exactly the q137 / hll_rollup maintenance shape.

Unlike the HLL sketch, every number here is an EXACT integer count:
merges are associative/commutative integer sums, so rollup-merge ==
any-other-bucketing-merge == single-pass histogram holds as exact
equality at EVERY cardinality — there is no coupon/dense regime split
and the audit flags are deterministic at any scale.  The approximation
is confined to the quantile READ: a quantile is located within its bin,
so the error bound is one bin width (``(hi-lo)/n_bins``), a constant
chosen at write time, independent of data size.

At 100 TB: the rollup aggregation is one map-side-combinable shuffle on
(group, bucket, bin) — partial counts combine inside map tasks, the
shuffle carries at most |occupied bins| rows per (group, bucket, task),
never data rows.  The rollup table is bounded by
|groups| x |buckets| x n_bins, independent of row count; the sparse map
means empty bins cost nothing (heavy-tailed value columns occupy few
bins under an equal-width grid — pick `lo/hi` from
``rank_tile_map``-style quantile edges when that matters).

Generalizes the reference's whole-buffer plotly histograms
(data_plotter.py:97-117 recompute the full-buffer distribution on every
dashboard refresh) to a re-aggregable, incrementally-maintained form.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hist_rollup",
    "hist_merge",
    "hist_quantiles",
    "hist_rollup_report",
]


def _cols(cols: Sequence[str | Column]):
    return [F.col(c) if isinstance(c, str) else c for c in cols]


def _col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def bin_index(
    value: Column, lo: float, hi: float, n_bins: int
) -> Column:
    """Equal-width bin index in [0, n_bins-1]; values at/below ``lo``
    clamp to bin 0 and at/above ``hi`` to the last bin (closed grid —
    out-of-range values are counted at the edges, never dropped, so
    total count is always preserved; widen [lo, hi) when edge mass
    matters)."""
    w = (hi - lo) / n_bins
    raw = F.floor((value.cast("double") - F.lit(lo)) / F.lit(w))
    return F.least(
        F.greatest(raw, F.lit(0)), F.lit(n_bins - 1)
    ).cast("int")


def hist_rollup(
    df: DataFrame,
    group_cols: Sequence[str],
    bucket_col: str | Column,
    value_col: str | Column,
    lo: float,
    hi: float,
    n_bins: int = 64,
) -> DataFrame:
    """The persistable rollup: one sparse histogram
    (``hist`` map<int, bigint>, occupied bins only) per
    (group x bucket), plus the grid params as columns so a reader can
    verify it merges compatible grids only."""
    b = _col(bucket_col)
    # NULL and NaN values are EXCLUDED, matching SQL aggregate
    # semantics (count/percentile skip NULLs; NaN is not a measurable
    # value).  Without the NULL filter a NULL bin index would reach
    # map_from_entries as a NULL map key and crash the job; without
    # the NaN filter, Spark's NaN ordering makes NaN survive
    # greatest() while least() returns the upper clamp — NaN rows
    # would silently count in the TOP bin, skewing high quantiles.
    # "Total count preserved" therefore means all non-NULL non-NaN
    # rows; count the excluded separately if they matter.
    _v = _col(value_col)
    binned = df.where(
        _v.isNotNull() & ~F.isnan(_v.cast("double"))
    ).select(
        *_cols(group_cols),
        b,
        bin_index(_col(value_col), lo, hi, n_bins).alias("_bin"),
    )
    # (group, bucket, bin) counts shuffle map-side-combined; the map
    # pack is a narrow second agg on the same keys minus _bin.
    counts = binned.groupBy(*binned.columns).agg(F.count("*").alias("_n"))
    return (
        counts.groupBy(*_cols(group_cols), counts.columns[len(group_cols)])
        .agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("_bin", "_n")))
            ).alias("hist")
        )
        .withColumns(
            {
                "hist_lo": F.lit(float(lo)),
                "hist_hi": F.lit(float(hi)),
                "hist_bins": F.lit(n_bins),
            }
        )
    )


def hist_merge(rollup: DataFrame, group_cols: Sequence[str]) -> DataFrame:
    """Merge each group's bucket histograms into one sparse map —
    explode to (bin, count), sum per bin, repack.  Exact integer sums:
    merging is lossless under ANY bucketing of the same rows.  Grid
    params must match across merged rows (asserted via the grid
    columns riding along min==max)."""
    keys = list(group_cols)
    exploded = rollup.select(
        *_cols(keys),
        "hist_lo",
        "hist_hi",
        "hist_bins",
        F.explode("hist").alias("_bin", "_n"),
    )
    summed = exploded.groupBy(*_cols(keys), F.col("_bin")).agg(
        F.sum("_n").alias("_n"),
        F.min("hist_lo").alias("_lo_mn"),
        F.max("hist_lo").alias("_lo_mx"),
        F.min("hist_hi").alias("_hi_mn"),
        F.max("hist_hi").alias("_hi_mx"),
        F.min("hist_bins").alias("_nb_mn"),
        F.max("hist_bins").alias("_nb_mx"),
    )
    return (
        summed.groupBy(*_cols(keys))
        .agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("_bin", "_n")))
            ).alias("hist"),
            F.min("_lo_mn").alias("hist_lo"),
            F.max("_hi_mx").alias("hist_hi"),
            F.min("_nb_mn").alias("hist_bins"),
            # mixed-grid merges are a caller bug — surface, don't blend
            (
                (F.min("_lo_mn") == F.max("_lo_mx"))
                & (F.min("_hi_mn") == F.max("_hi_mx"))
                & (F.min("_nb_mn") == F.max("_nb_mx"))
            ).alias("grid_consistent"),
        )
    )


def hist_quantiles(
    merged: DataFrame,
    group_cols: Sequence[str],
    qs: Sequence[float],
) -> DataFrame:
    """Read quantiles off a merged histogram: for each q, the UPPER
    EDGE of the first bin whose cumulative count reaches
    ``ceil(q * total)`` — the bin that contains the DISCRETE quantile
    (the order statistic at that rank), so for in-grid values
    ``x_disc < q_hist <= x_disc + bin_width``: error bounded by one
    bin width by construction.  (The band is stated against the
    discrete quantile, not the interpolating percentile — the latter
    can sit a value-gap below the rank's order statistic, a data-
    not grid-property.)  Values clamped to the edge bins read back as
    the grid edges.  Output: one row per group with ``q_<q>`` columns
    (dots stripped), plus ``total_count``.

    Pure expression read: the maps are already per-group single rows,
    so this is sort + running-fold over at most n_bins array elements —
    no shuffle beyond the input's."""
    keys = list(group_cols)
    entries = F.sort_array(F.map_entries("hist"))
    total = F.aggregate(
        entries,
        F.lit(0).cast("bigint"),
        lambda acc, e: acc + e["value"],
    )
    width = (F.col("hist_hi") - F.col("hist_lo")) / F.col(
        "hist_bins"
    ).cast("double")

    def q_col(q: float) -> Column:
        target = F.ceil(F.lit(float(q)) * F.col("total_count").cast("double"))
        # running cumulative fold: pick the smallest bin index whose
        # cumsum >= target (struct fold keeps (cum, found_bin))
        folded = F.aggregate(
            entries,
            F.struct(
                F.lit(0).cast("bigint").alias("cum"),
                F.lit(None).cast("int").alias("bin"),
            ),
            lambda acc, e: F.struct(
                (acc["cum"] + e["value"]).alias("cum"),
                F.when(
                    acc["bin"].isNull()
                    & ((acc["cum"] + e["value"]) >= target),
                    e["key"],
                )
                .otherwise(acc["bin"])
                .alias("bin"),
            ),
        )
        return (
            F.col("hist_lo")
            + (folded["bin"] + F.lit(1)).cast("double") * width
        ).alias(f"q_{str(q).replace('.', '')}")

    with_total = merged.withColumn("total_count", total)
    return with_total.select(
        *_cols(keys), "total_count", *[q_col(q) for q in qs]
    )


def hist_rollup_report(
    df: DataFrame,
    group_cols: Sequence[str],
    bucket_col: str | Column,
    value_col: str | Column,
    lo: float,
    hi: float,
    n_bins: int = 64,
    q: float = 0.5,
    n_shards: int = 8,
) -> DataFrame:
    """Self-auditing rollup summary per group (the q141/hll_rollup_report
    shape, but every flag is DETERMINISTIC at any scale):

    - ``rollup_eq_shard``: caller bucketing and an unrelated hash-shard
      bucketing merge to the SAME histogram (exact map equality —
      integer sums are bucketing-invariant);
    - ``rollup_eq_direct``: merged rollup equals the single-pass
      histogram (merge losslessness, exact map equality);
    - ``q_in_band``: the histogram q-quantile sits within one bin width
      above the exact quantile (the read-path error bound).

    The exact column stats ride along to ground the audit; production
    callers use the rollup alone.
    """
    keys = list(group_cols)
    value = _col(value_col)
    # mirror hist_rollup's NULL/NaN exclusion so the exact anchors
    # (n_rows, the discrete quantile) describe the SAME row set the
    # rollup counted — otherwise count_preserved false-flags on NaN.
    df = df.where(value.isNotNull() & ~F.isnan(value.cast("double")))
    rollup = hist_rollup(df, keys, _col(bucket_col), value, lo, hi, n_bins)
    merged = hist_merge(rollup, keys)
    shard = F.pmod(F.xxhash64(value), F.lit(n_shards)).alias("_shard")
    sharded = hist_merge(
        hist_rollup(df, keys, shard, value, lo, hi, n_bins), keys
    )
    direct = hist_merge(
        hist_rollup(df, keys, F.lit(0).alias("_all"), value, lo, hi, n_bins),
        keys,
    )
    quant = hist_quantiles(merged, keys, [q])
    qcol = f"q_{str(q).replace('.', '')}"
    # The band theorem is about the DISCRETE quantile (the order
    # statistic at rank ceil(q*n) — what the histogram locates to a
    # bin); the interpolating percentile can sit a whole value-gap
    # below it, which is data- not grid-bounded.  Exact disc quantile
    # via sorted collect_list — audit-frame-only (buffers the group,
    # like any exact percentile; production reads use the rollup).
    vals = F.sort_array(F.collect_list(value))
    exact = df.groupBy(*_cols(keys)).agg(
        F.count(value).alias("n_rows"),
        F.element_at(
            vals,
            F.ceil(F.lit(float(q)) * F.size(vals)).cast("int"),
        )
        .cast("double")
        .alias("_q_exact"),
    )
    width = (hi - lo) / n_bins
    out = (
        exact.join(
            merged.select(*keys, F.col("hist").alias("_h_roll"), "grid_consistent"),
            keys,
        )
        .join(sharded.select(*keys, F.col("hist").alias("_h_shard")), keys)
        .join(direct.select(*keys, F.col("hist").alias("_h_direct")), keys)
        .join(quant.select(*keys, "total_count", qcol), keys)
    )
    # MapType is not comparable in Spark — equality goes through the
    # canonical sorted entry-array form (bins are unique keys, so the
    # sorted arrays are equal iff the maps are).
    def entries(c: str) -> Column:
        return F.sort_array(F.map_entries(c))

    return out.select(
        *keys,
        "n_rows",
        (F.col("total_count") == F.col("n_rows")).alias("count_preserved"),
        (entries("_h_roll") == entries("_h_shard")).alias("rollup_eq_shard"),
        (entries("_h_roll") == entries("_h_direct")).alias("rollup_eq_direct"),
        (
            # clamp the truth into the grid first: values at/past the
            # edges were counted in the edge bins by construction
            (
                F.col(qcol)
                >= F.least(
                    F.greatest(F.col("_q_exact"), F.lit(float(lo))),
                    F.lit(float(hi)),
                )
            )
            & (
                F.col(qcol)
                <= F.least(
                    F.greatest(F.col("_q_exact"), F.lit(float(lo))),
                    F.lit(float(hi)),
                )
                + F.lit(float(width))
            )
        ).alias("q_in_band"),
        "grid_consistent",
    )
