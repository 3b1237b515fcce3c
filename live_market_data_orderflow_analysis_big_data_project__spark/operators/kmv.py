"""Mergeable KMV ("k minimum values" / bottom-k theta) distinct
sketches in pure Spark expressions — the set-operation family HLL
cannot provide.

Why a second distinct sketch next to operators/sketches.py (HLL): HLL
register state supports lossless UNION only.  Intersection comes from
inclusion-exclusion (q144) and inherits the union terms' errors, and
set DIFFERENCE (|A \\ B| — "users who checked out but never refunded",
"docs in this crawl absent from the last one") has no HLL formulation
at all.  A KMV sketch keeps the k smallest *hash values* of the set —
a uniform coordinated sample of the value space — so any boolean
combination of sketched sets is estimable by counting sample members
that satisfy the predicate under the merged threshold (theta), the
construction behind Apache DataSketches' theta sketch A-NOT-B.

Representation: ``array<bigint>`` of the k smallest DISTINCT
``xxhash64(value, seed)`` values in SIGNED ascending order.  Signed
order IS unsigned order here: two's-complement u(h) = h + 2^63 is
monotone, so no unsigned gymnastics are needed anywhere — Spark's
``array_sort`` / ``array_union`` / ``slice`` compose the whole
algebra, no UDF, no JVM helper, wholly inside codegen.

Estimation (standard KMV):
- unsaturated sketch (size < k): the sketch holds EVERY distinct hash
  — the estimate is ``size`` exactly (the coupon-exact analog of the
  HLL module's sparse regime, and what makes fixture gates
  hash-comparable to exact SQL);
- saturated: est = (k-1) / u_k with u_k = (kth value + 2^63 + 1) /
  2^64, RSE ~ 1/sqrt(k-2).
- set ops on sketches A, B: M = k smallest of A ∪ B (pure expression
  ``slice(array_sort(array_union(A,B)), 1, k)``).  Every member of M
  is a coordinated uniform sample of A ∪ B, so |A ∩ B| ≈
  (|M ∩ A ∩ B| / |M|) · est(M), |A \\ B| ≈ (|M \\ B| / |M|) · est(M)
  (M ⊆ A ∪ B, so an M-value not in B is in A only).  When M is
  unsaturated it IS the exact union hash set and every set-op count
  is exact — the short-circuit keeps those integers bit-exact
  (no ratio-times-total round trip through IEEE division).

Mergeability: union of sketches = k smallest of the concatenation —
associative, commutative, idempotent; N-way merge is the same
explode -> distinct -> bottom-k used to build (``kmv_merge``), so a
per-(group x bucket) rollup re-aggregates to any coarser grain
losslessly w.r.t. the sketch definition (``tests/test_kmv.py`` proves
bucketed-merge == direct-build on the fixtures).

At 100 TB: build is one map-side-combinable distinct on (group, hash)
plus one bounded bottom-k per group; the sketch is k * 8 bytes (k=4096
-> 32 kB) stored in a parquet array column; every pairwise set-op
reads the |labels|-row sketch frame only — the corpus is scanned
exactly once, ever, per sketch build.  NULL values are excluded, the
COUNT(DISTINCT) convention.  Hash collisions: deterministic (fixed
seed), probability ~ n^2 / 2^65 — negligible, and fixture-pinned by
the 3-sf gates.

Generalizes the reference's whole-buffer ``nunique`` refresh
(data_plotter.py:64-87) the same way sketches.py does, adding the
intersection/difference questions the dashboard's per-symbol buffers
could never answer without a full self-join.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "kmv_sketch",
    "kmv_merge",
    "kmv_union_pair",
    "kmv_estimate",
    "kmv_setop_estimates",
]

DEFAULT_K = 4096  # RSE ~ 1/sqrt(k-2) ~ 1.6%, 32 kB per sketch
_SEED = 42
_TWO63 = 2.0**63
_TWO64 = 2.0**64


def _cols(cols: Sequence[str | Column]):
    return [F.col(c) if isinstance(c, str) else c for c in cols]


def _col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def _bottom_k(hash_rows: DataFrame, k: int) -> DataFrame:
    """(groups..., _h) hash rows -> one sorted bottom-k array of
    distinct hashes per group.  The distinct is map-side combinable
    (the shuffle carries one row per distinct hash per map task); the
    window sort is per-group over distinct hashes and spills;
    survivors are <= k per group before the collect, so driver and
    executor state stay bounded by k."""
    names = [c for c in hash_rows.columns if c != "_h"]
    w = Window.partitionBy(*names).orderBy(F.col("_h").asc())
    return (
        hash_rows.distinct()
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .groupBy(*names)
        .agg(F.sort_array(F.collect_list("_h")).alias("kmv"))
    )


def kmv_sketch(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str | Column,
    k: int = DEFAULT_K,
    seed: int = _SEED,
) -> DataFrame:
    """One KMV sketch (column ``kmv``) per group: the k smallest
    distinct ``xxhash64(value, seed)``.

    Build = groupBy(group, hash) distinct (map-side combinable: the
    shuffle carries one row per distinct hash per map task, not per
    input row) + bottom-k window.  Coordinated across calls by the
    fixed seed, so sketches built by different jobs/shards compose.
    """
    v = _col(value_col)
    base = df.where(v.isNotNull()).select(
        *_cols(group_cols), F.xxhash64(v, F.lit(seed)).alias("_h")
    )
    return _bottom_k(base, k)


def kmv_merge(
    sketches: DataFrame,
    group_cols: Sequence[str],
    k: int = DEFAULT_K,
    sketch_col: str = "kmv",
) -> DataFrame:
    """N-way lossless merge: rollup rows (e.g. per (group x day)) to
    one sketch per group.  explode -> distinct -> bottom-k — the same
    shape as the build, input size |rows| * k, never the corpus."""
    base = sketches.select(*_cols(group_cols), F.explode(sketch_col).alias("_h"))
    return _bottom_k(base, k)


def kmv_union_pair(a: Column, b: Column, k: int = DEFAULT_K) -> Column:
    """Binary merge as a pure expression (for pair joins):
    k smallest of A ∪ B."""
    return F.slice(F.array_sort(F.array_union(a, b)), 1, k)


def kmv_estimate(sketch: Column, k: int = DEFAULT_K) -> Column:
    """Distinct-count estimate (double): exact ``size`` while
    unsaturated, (k-1)/u_k once full."""
    size = F.size(sketch)
    u_k = (F.element_at(sketch, k).cast("double") + F.lit(_TWO63 + 1.0)) / F.lit(
        _TWO64
    )
    return F.when(size < k, size.cast("double")).otherwise(F.lit(float(k - 1)) / u_k)


def kmv_setop_estimates(
    df: DataFrame,
    label_col: str | Column,
    value_col: str | Column,
    k: int = DEFAULT_K,
    seed: int = _SEED,
) -> DataFrame:
    """Pairwise |A|, |B|, |A∪B|, |A∩B|, |A\\B|, |B\\A|, Jaccard between
    labeled value sets — one row per unordered label pair, computed
    from the |labels|-row sketch frame alone (the hll_overlap_estimates
    shape, plus the difference columns HLL cannot derive).

    ``exact_regime`` is TRUE when the merged pair sketch is
    unsaturated — every output on that row is then the exact
    COUNT(DISTINCT) answer (integer-valued doubles; Jaccard is the
    same two-integer IEEE division an exact engine performs).
    """
    label = _col(label_col)
    sk = kmv_sketch(df, [label.alias("label")], value_col, k, seed)
    a = sk.select(F.col("label").alias("label_a"), F.col("kmv").alias("_a"))
    b = sk.select(F.col("label").alias("label_b"), F.col("kmv").alias("_b"))
    # |labels|^2 pair frame over kB-scale array rows — broadcast
    # non-equi join of tiny frames; the corpus was scanned once, above.
    pairs = a.join(F.broadcast(b), F.col("label_a") < F.col("label_b"))

    m = kmv_union_pair(F.col("_a"), F.col("_b"), k)
    pairs = pairs.select("label_a", "label_b", "_a", "_b", m.alias("_m"))

    ns = F.size("_m").cast("double")
    saturated = F.size("_m") >= k
    est_u = kmv_estimate(F.col("_m"), k)
    # M ⊆ A ∪ B: members absent from B are A-only and vice versa.
    k_a_only = F.size(F.array_except("_m", "_b")).cast("double")
    k_b_only = F.size(F.array_except("_m", "_a")).cast("double")
    k_inter = ns - k_a_only - k_b_only

    def scaled(cnt: Column) -> Column:
        # unsaturated M is the exact union hash set: report the raw
        # count (bit-exact integer double), never cnt/ns*est_u whose
        # IEEE round trip can perturb the integer.
        return F.when(~saturated, cnt).otherwise(cnt / ns * est_u)

    n_union = est_u
    n_inter = scaled(k_inter)
    return pairs.select(
        "label_a",
        "label_b",
        kmv_estimate(F.col("_a"), k).alias("n_a"),
        kmv_estimate(F.col("_b"), k).alias("n_b"),
        n_union.alias("n_union"),
        n_inter.alias("n_intersect"),
        scaled(k_a_only).alias("n_a_not_b"),
        scaled(k_b_only).alias("n_b_not_a"),
        F.when(n_union > 0, n_inter / n_union)
        .otherwise(F.lit(0.0))
        .alias("jaccard"),
        (~saturated).alias("exact_regime"),
    )
