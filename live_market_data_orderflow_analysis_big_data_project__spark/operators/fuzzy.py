"""Blocked fuzzy string matching (entity resolution / typo-tolerant
join) via the FastSS deletion neighborhood — edit-distance pairs
WITHOUT an all-pairs comparison.

The missing match primitive next to the token/hash/embedding near-dup
family (q91*, q103, q121): those operators match DOCUMENTS by set or
vector similarity; entity resolution matches short STRINGS (names,
IDs, SKUs) by edit distance, where a single typo must still link two
records.  A naive formulation is a quadratic cross join with
``levenshtein`` — the plan that cannot exist at 100 TB.

Algorithm (FastSS, Bocek et al. 2007, public): for tau=1, index every
distinct string s under the key set {s} ∪ {s with one char deleted}.
Completeness is a pigeonhole fact, not a heuristic:

- substitution at position i:  delete_i(a) == delete_i(b);
- insertion/deletion:          the shorter string IS a deletion
                               variant of the longer one;
- equal strings:               collide on s itself.

So every pair with ed <= 1 shares an index key — the candidate join is
LOSSLESS, and a final builtin ``levenshtein(a, b) <= tau`` verify
removes the false positives the neighborhood admits (e.g. adjacent
transposition: ed 2, shares keys).  The same structure generalizes to
tau=2 with double deletions (|s|^2/2 keys per string — the documented
cost of raising the radius); for larger tau or long strings, q-gram
prefix filtering (Ed-Join) is the right family instead: deletion keys
grow with |s|, which is why this operator targets the short-string
entity domain (names/IDs/codes), where |s| is a bounded constant.

Spark-first shape: pure expressions end to end — the variant set is a
SQL ``transform`` over ``sequence(1, length(s))`` (one array per
string, deduped by ``array_union`` with the string itself), exploded
and self-joined on the variant key.  One explode (fan-out = |s|+1, a
domain constant), one shuffle join on variant, one distinct, one
verify filter in codegen.  No UDF, no driver loop.

At 100 TB: candidates are bounded by true neighbor structure (a
variant key bucket holds only strings within ed<=2 of each other),
not by global gram frequency — the df-skew failure mode of plain
q-gram blocking (every "Customer#" gram joining everything) cannot
occur, because a deletion variant retains all but one character of
the full string.  Degenerate domains (millions of equal-length
near-identical strings, e.g. sequential IDs) bound each bucket by the
per-variant collision count, which is <= alphabet size per deleted
position.  The distinct-string frame this runs on is corpus-deduped
first (|distinct strings| << |rows| for entity domains); map matched
pairs back to rows by joining on the string.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["deletion_variants", "fuzzy_pairs"]


def deletion_variants(col: str) -> Column:
    """{s} ∪ {s minus one char}: the tau=1 FastSS key set, deduped."""
    return F.expr(
        f"array_union(array({col}), transform(sequence(1, length({col})),"
        f" i -> concat(substr({col}, 1, i - 1), substr({col}, i + 1))))"
    )


def fuzzy_pairs(
    df: DataFrame,
    string_col: str,
    tau: int = 1,
    max_bucket: int | None = None,
) -> DataFrame:
    """All unordered distinct-string pairs with ``levenshtein <= tau``
    as (name_a, name_b, dist).  tau=1 is the supported radius (see
    module docstring for why the neighborhood is complete there).

    ``max_bucket`` is the scale knob: variant keys shared by more than
    ``max_bucket`` distinct strings are suppressed before the candidate
    join (the q124 df-suppression idiom).  Candidate volume — the term
    that grows super-linearly on id-dense domains, the 16x-probe
    finding — is then hard-bounded by ``max_bucket`` per key.  The cap
    is RECALL-LOSSY only for a pair whose EVERY shared key is hot: for
    a substitution pair that is one specific deletion position shared
    by > max_bucket strings; equal-length near-identical id domains hit
    this first, natural name domains effectively never.  Default None
    = exact (the hash-gated configuration); the hot-key frame is tiny
    (keys with > cap collisions), so suppression is one count agg +
    a broadcast anti-join, never a corpus shuffle.
    """
    if tau != 1:
        raise NotImplementedError(
            "deletion-neighborhood blocking is implemented for tau=1; "
            "use double deletions or Ed-Join prefix filtering for tau>=2"
        )
    # r16 plan shape: ONE shuffle instead of a variant-keyed self-join.
    # The original a.join(b, "v") formulation planned the whole
    # distinct+explode keys subtree TWICE (stream + build side of the
    # join — 2 scans, 2 distinct exchanges) and needed a pair-level
    # distinct on the join output.  Grouping by the variant key and
    # expanding ordered pairs inside each bucket with a HOF gives the
    # identical candidate set — a bucket holds exactly the strings the
    # self-join would have matched on that key — from a single subtree
    # and a single exchange.  Bucket width stays domain-bounded (module
    # docstring) and ``max_bucket`` now suppresses hot keys as a plain
    # size filter on the built bucket instead of a count + broadcast
    # anti-join pre-pass (same key-suppression semantics, one pass).
    # Measured on the sf0.1 gate query (q146): 16 Exchanges -> 5,
    # 5 parquet scans -> 2.
    buckets = (
        df.select(F.col(string_col).alias("s"))
        .distinct()
        .select(F.explode(deletion_variants("s")).alias("v"), "s")
        .groupBy("v")
        .agg(F.array_sort(F.collect_list("s")).alias("_ss"))
    )
    if max_bucket is not None:
        buckets = buckets.where(F.size("_ss") <= max_bucket)
    # ordered pairs (i < j) from the sorted bucket: name_a < name_b by
    # construction, so no orientation filter and no least/greatest.
    cand = buckets.select(
        F.explode(
            F.expr(
                "flatten(transform(_ss, (x, i) -> "
                "transform(slice(_ss, i + 2, size(_ss)), "
                "y -> struct(x AS name_a, y AS name_b))))"
            )
        ).alias("_p")
    ).select("_p.name_a", "_p.name_b")
    # banded verify (Spark 3.5+ 3-arg levenshtein): with a threshold the
    # DP is banded and early-terminating — O(len·tau) instead of
    # O(len²) per pair, and it returns -1 past the threshold, so
    # ``>= 0`` is exactly ``distance <= tau`` and the returned value IS
    # the distance for every kept pair.  On id-dense domains the
    # candidate stream is the dominant row count (sf0.1 gate: ~1M
    # candidates -> 262k verified), so the verify is the hottest
    # scalar expression in the plan.  Verify BEFORE the pair-level
    # dedup: the banded check is cheaper than deduplicating the
    # unverified candidates.
    dist = F.levenshtein("name_a", "name_b", tau)
    return (
        cand.where(dist >= 0)
        .distinct()
        .select(
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b", tau).alias("dist"),
        )
    )
