"""Property-based tests (hypothesis): operator output vs pure-Python
reference models on randomized inputs.

The oracle gate checks fixed fixtures; these check the algebra itself —
arbitrary texts (unicode, empty, shorter-than-k) through the same
formulas a reviewer would write by hand.  Alphabets avoid the few
codepoints where JVM and Python simple case-mapping diverge (e.g.
U+0130), which would test the host libc, not the operator.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F  # noqa: F401  (parity with peers)

from live_market_data_orderflow_analysis_big_data_project__spark.operators.llmops import (
    jaccard_pairs,
    rolling_fingerprint,
    rolling_fingerprint_fast,
)

ALPHABET = "abcdefgh XY12,.éüñΩ"
K, BASE, MOD = 8, 31, 1_000_000_007


def _ref_fingerprint(text: str | None):
    if text is None:
        return (0, None, None, 0)
    t = text.lower()
    if len(t) < K:
        return (0, None, None, 0)
    hs = [
        sum(ord(t[i + j]) * BASE ** (K - 1 - j) for j in range(K)) % MOD
        for i in range(len(t) - K + 1)
    ]
    return (len(hs), min(hs), max(hs), len(set(hs)))


@settings(max_examples=5, deadline=None)
@given(st.lists(st.text(alphabet=ALPHABET, max_size=30), min_size=1, max_size=6))
def test_rolling_fingerprint_matches_reference_model(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    expected = {i: _ref_fingerprint(t) for i, t in enumerate(texts)}
    cols = ("n_grams", "fp_min", "fp_max", "n_distinct")
    for impl in (rolling_fingerprint, rolling_fingerprint_fast):
        got = {
            r["doc_id"]: tuple(r[c] for c in cols)
            for r in impl(df).collect()
        }
        assert got == expected


def _ref_jaccard_pairs(texts, threshold):
    toksets = {
        i: {w for w in re.split(r"\W+", t.lower(), flags=re.UNICODE) if w}
        for i, t in enumerate(texts)
    }
    out = {}
    ids = sorted(toksets)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = toksets[ids[ai]], toksets[ids[bi]]
            if not a and not b:
                continue
            inter = len(a & b)
            union = len(a) + len(b) - inter
            if union and inter / union >= threshold:
                out[(ids[ai], ids[bi])] = inter / union
    return out


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab cd,ef.gh", min_size=1, max_size=25),
        min_size=2,
        max_size=6,
    )
)
def test_jaccard_pairs_matches_reference_model(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_pairs(df, threshold=0.3).collect()
    }
    assert got == _ref_jaccard_pairs(texts, 0.3)
