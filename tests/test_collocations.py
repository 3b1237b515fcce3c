"""Collocation lift (operators/collocations.py): bigram counts against
literal Python, integer lift arithmetic, and the monotonicity contract
(lift_ppm ranks exactly like PMI)."""

from __future__ import annotations

import math
import re

from live_market_data_orderflow_analysis_big_data_project__spark.operators.collocations import (  # noqa: E501
    bigram_counts,
    collocation_lift,
)

DOCS = [
    (1, "new york new york city"),
    (2, "new york is a city"),
    (3, "a new car in the city"),
    (4, "york new"),  # reversed order is a DIFFERENT bigram
]


def _py_bigrams(rows):
    out = {}
    for _, text in rows:
        toks = [t for t in re.split(r"\W+", text.lower()) if t]
        for a, b in zip(toks, toks[1:]):
            out[(a, b)] = out.get((a, b), 0) + 1
    return out


def test_bigram_counts_match_python(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        (r.tok_a, r.tok_b): r.n_ab for r in bigram_counts(df).collect()
    }
    assert got == _py_bigrams(DOCS)
    assert got[("new", "york")] == 3 and got[("york", "new")] == 2


def test_lift_is_exact_integer_formula(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = collocation_lift(df, min_count=1).collect()
    bg = _py_bigrams(DOCS)
    n = sum(bg.values())
    left = {}
    right = {}
    for (a, b), c in bg.items():
        left[a] = left.get(a, 0) + c
        right[b] = right.get(b, 0) + c
    for r in rows:
        want = (bg[(r.tok_a, r.tok_b)] * n * 1_000_000) // (
            left[r.tok_a] * right[r.tok_b]
        )
        assert r.lift_ppm == want, (r.tok_a, r.tok_b)
        assert r.n_a == left[r.tok_a] and r.n_b == right[r.tok_b]


def test_lift_ranks_like_pmi(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = collocation_lift(df, min_count=1).collect()
    # PMI = ln(lift); ln is monotone, so sorting by lift_ppm == by PMI
    by_lift = sorted(rows, key=lambda r: (-r.lift_ppm, r.tok_a, r.tok_b))
    by_pmi = sorted(
        rows,
        key=lambda r: (
            -math.log((r.n_ab * sum(_py_bigrams(DOCS).values()))
                      / (r.n_a * r.n_b)),
            r.tok_a,
            r.tok_b,
        ),
    )
    assert [(r.tok_a, r.tok_b) for r in by_lift] == [
        (r.tok_a, r.tok_b) for r in by_pmi
    ]


def test_min_count_filters(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = collocation_lift(df, min_count=3).collect()
    assert {(r.tok_a, r.tok_b) for r in rows} == {("new", "york")}
