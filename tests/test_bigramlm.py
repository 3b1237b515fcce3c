"""operators/pipeline.py::bigram_nll_score — interpolated bigram LM.

The staged gate (q185) proves hash parity with the SQL oracle at two
sfs; these pin the model against a pure-Python twin (counts, the
λ=3/4 interpolation, the exact parenthesization), the <2-token
exclusion, the word-salad direction the unigram score cannot see, and
plan purity.
"""

from __future__ import annotations

import math
import re

import pytest

from live_market_data_orderflow_analysis_big_data_project__spark.operators.pipeline import (  # noqa: E501
    bigram_nll_score,
)


def _toks(t):
    return [w for w in re.split(r"\W+", t.lower()) if w]


def _model(texts):
    toks = {i: _toks(t) for i, t in texts}
    uni, c12, c1, n_tot = {}, {}, {}, 0
    for ts in toks.values():
        for w in ts:
            uni[w] = uni.get(w, 0) + 1
            n_tot += 1
        for a, b in zip(ts, ts[1:]):
            c12[(a, b)] = c12.get((a, b), 0) + 1
            c1[a] = c1.get(a, 0) + 1
    out = {}
    for i, ts in toks.items():
        if len(ts) < 2:
            continue
        nll = [
            -math.log(
                (3 * c12[(a, b)]) / (4 * c1[a]) + uni[b] / (4 * n_tot)
            )
            for a, b in zip(ts, ts[1:])
        ]
        out[i] = (len(nll), round(sum(nll) / len(nll), 4))
    return out


def _run(spark, texts):
    df = spark.createDataFrame(list(texts), "doc_id long, text string")
    return {
        r.doc_id: (r.n_bigrams, r.avg_nll)
        for r in bigram_nll_score(df).collect()
    }


def test_matches_python_model(spark):
    texts = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat on the cat"),
        (3, "a b a b a b c"),
        (4, "solo"),
        (5, ""),
        (6, "THE CAT! sat?? on... the MAT"),
    ]
    got = _run(spark, texts)
    want = _model(texts)
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0], k
        assert got[k][1] == pytest.approx(want[k][1], abs=2e-4), k


def test_short_docs_excluded(spark):
    got = _run(spark, [(1, "one"), (2, ""), (3, "two words")])
    assert set(got) == {3}


def test_word_salad_scores_higher_than_fluent(spark):
    """The capability claim: shuffled tokens with the SAME unigram
    profile must score strictly worse under the bigram model — the
    direction q118 cannot express."""
    fluent = "the quick fox jumps over the lazy dog " * 10
    salad = " ".join(reversed(fluent.split()))
    # corpus: many fluent docs anchor the LM + one salad doc
    texts = [(i, fluent) for i in range(8)] + [(99, salad)]
    got = _run(spark, texts)
    assert got[99][1] > got[0][1]


def test_no_python_in_plan(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "b c d")], "doc_id long, text string"
    )
    plan = (
        bigram_nll_score(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
