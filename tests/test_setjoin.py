"""Prefix-filtered set-similarity join (operators/setjoin.py): the
prefix filter must be LOSSLESS — results equal the naive all-pairs
token-set Jaccard join exactly (Bayardo et al.'s bound), including at
threshold boundaries (exact rational arithmetic, no float epsilon)."""

from __future__ import annotations

from itertools import combinations

import pytest
from pyspark.sql import functions as F

from live_market_data_orderflow_analysis_big_data_project__spark.operators.setjoin import (  # noqa: E501
    setsim_join,
    token_sets,
)

DOCS = [
    (1, "alpha beta gamma delta"),
    (2, "alpha beta gamma epsilon"),          # j(1,2) = 3/5
    (3, "alpha beta gamma delta"),            # j(1,3) = 1 exact dup
    (4, "zeta eta theta"),                    # disjoint from 1-3
    (5, "zeta eta theta iota kappa"),         # j(4,5) = 3/5
    (6, "alpha zeta unique1 unique2"),        # low sim to all
    (7, "the the the alpha"),                 # repeated tokens dedupe
]


def _naive(rows, t_num, t_den):
    sets = {d: set(t.lower().split()) for d, t in rows}
    out = {}
    for a, b in combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if inter * t_den >= t_num * union:
            out[(a, b)] = (len(sets[a]), len(sets[b]), inter)
    return out


@pytest.mark.parametrize("t_num,t_den", [(3, 5), (1, 2), (1, 1), (7, 10)])
def test_equals_naive_all_pairs(spark, t_num, t_den):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): (r.n_a, r.n_b, r.n_inter)
        for r in setsim_join(df, t_num, t_den).collect()
    }
    assert got == _naive(DOCS, t_num, t_den), (t_num, t_den)


def test_boundary_pair_is_exact_not_float(spark):
    # j = 3/5 exactly: must be INCLUDED at t=3/5 (>=), excluded at 61/100
    df = spark.createDataFrame(DOCS[:2], "doc_id long, text string")
    at = setsim_join(df, 3, 5).collect()
    above = setsim_join(df, 61, 100).collect()
    assert [(r.doc_a, r.doc_b) for r in at] == [(1, 2)]
    assert above == []


def test_token_sets_dedupe(spark):
    df = spark.createDataFrame([DOCS[6]], "doc_id long, text string")
    toks = {r.tok for r in token_sets(df).collect()}
    assert toks == {"the", "alpha"}


def test_jaccard_value_is_two_integer_division(spark):
    df = spark.createDataFrame(DOCS[:2], "doc_id long, text string")
    r = setsim_join(df, 1, 2).collect()[0]
    assert r.jaccard == 3 / 5


def test_no_python_in_plan(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = (
        setsim_join(df, 3, 5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_prefix_length_boundary_pair_survives(spark):
    """The losslessness theorem's TIGHT case: a boundary pair (j == t
    exactly) whose shared tokens are globally FREQUENT sorts them to
    the tail of the rarest-first order, so the pair meets only at the
    LAST prefix position — the ``+ 1`` in ``L - ceil(t*L) + 1``.  A
    threshold/formula change that shortens either prefix by one token
    loses this pair; pinning it here makes that an immediate named
    failure, not a driver oracle diff."""
    # A = {u, f1..f4} (u rare), B = {f1..f4}; j(A,B) = 4/5 = t.
    # A's prefix len = 5 - ceil(4/5*5) + 1 = 2 -> {u, rarest f};
    # B's prefix len = 4 - ceil(4/5*4) + 1 = 1 -> {rarest f}.
    # One fewer token on either side and the prefixes are disjoint.
    docs = [
        (1, "u f1 f2 f3 f4"),
        (2, "f1 f2 f3 f4"),
    ] + [
        # fillers raise every f's global df above u's without pairing
        (10 + i, f"f{i + 1}") for i in range(4)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b)
        for r in setsim_join(df, 4, 5).collect()
    }
    assert (1, 2) in got, (
        "boundary pair at j == t lost — the prefix length "
        "L - ceil(t*L) + 1 is no longer lossless"
    )
    # and the full result still equals naive all-pairs on this corpus
    assert got == set(_naive(docs, 4, 5))


def test_prefix_boundary_across_lengths(spark):
    """Sweep the tight construction across set sizes L and thresholds:
    B ⊂ A with |B| = ceil(t*|A|) scaled so j(A,B) >= t exactly at the
    minimum intersection — the engine must equal naive all-pairs at
    every (L, t), exercising the integer prefix arithmetic at each
    boundary length."""
    for t_num, t_den in [(1, 2), (2, 3), (7, 10), (4, 5)]:
        docs = []
        fillers = []
        did = 0
        for la in (3, 5, 8, 13):
            shared = [f"s{la}_{j}" for j in range(la)]
            # subset doc sizes from la down: j = lb/la crosses t
            for lb in range(1, la + 1):
                did += 10
                docs.append((did, " ".join(shared[:lb])))
            docs.append((did + 1, " ".join([f"u{la}"] + shared[:la - 1])))
            fillers += [(5000 + did + j, shared[j]) for j in range(la)]
        corpus = docs + fillers
        df = spark.createDataFrame(corpus, "doc_id long, text string")
        got = {
            (r.doc_a, r.doc_b): (r.n_a, r.n_b, r.n_inter)
            for r in setsim_join(df, t_num, t_den).collect()
        }
        assert got == _naive(corpus, t_num, t_den), (t_num, t_den)


def test_max_bucket_cap(spark):
    """The verify-traffic circuit breaker: a cap above the largest
    prefix bucket is the identity (the hash-gated configuration is
    reachable with the knob set); a cap of 0 suppresses every prefix
    posting and the join returns nothing."""
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    exact = {
        (r.doc_a, r.doc_b)
        for r in setsim_join(df, 3, 5).collect()
    }
    capped = {
        (r.doc_a, r.doc_b)
        for r in setsim_join(df, 3, 5, max_bucket=len(DOCS)).collect()
    }
    assert capped == exact
    assert setsim_join(df, 3, 5, max_bucket=0).collect() == []


def test_shingle_mode_equals_naive_shingle_jaccard(spark):
    # the q174 configuration: elements are 3-shingles, not tokens
    docs = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),  # high sim
        (3, "a completely different sentence with other words"),
        (4, "the quick brown fox jumps over the lazy dog"),  # exact dup
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    def sh(text):
        toks = text.lower().split()
        return {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}

    want = {}
    sets = {d: sh(t) for d, t in docs}
    for a in sorted(sets):
        for b in sorted(sets):
            if a < b:
                inter = len(sets[a] & sets[b])
                union = len(sets[a] | sets[b])
                if inter * 2 >= 1 * union:  # t = 1/2
                    want[(a, b)] = inter
    got = {
        (r.doc_a, r.doc_b): r.n_inter
        for r in setsim_join(df, 1, 2, ngram=3).collect()
    }
    assert got == want
    assert (1, 4) in got  # the exact dup survives
    assert (1, 2) in got  # the near dup survives
