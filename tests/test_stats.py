"""pairwise_corr semantics on hand fixtures (operators/stats.py)."""

from __future__ import annotations

import math

from live_market_data_orderflow_analysis_big_data_project__spark.operators.stats import (
    pairwise_corr,
)


def _long(spark, rows):
    return spark.createDataFrame(rows, "k string, b long, x long")


def _pairs(spark, rows):
    return {
        (r["key_a"], r["key_b"]): r
        for r in pairwise_corr(_long(spark, rows), "k", "b", "x").collect()
    }


def test_perfectly_correlated_pair_is_one(spark):
    rows = [("a", 1, 10), ("a", 2, 20), ("a", 3, 30),
            ("b", 1, 100), ("b", 2, 200), ("b", 3, 300)]
    r = _pairs(spark, rows)[("a", "b")]
    assert r["corr"] == 1.0
    assert r["n_buckets"] == 3
    assert r["sum_a"] == 60 and r["sum_b"] == 600
    assert r["mean_a"] == 20.0 and r["mean_b"] == 200.0


def test_anti_correlated_pair_is_minus_one(spark):
    rows = [("a", 1, 1), ("a", 2, 2), ("b", 1, 5), ("b", 2, 3)]
    assert _pairs(spark, rows)[("a", "b")]["corr"] == -1.0


def test_constant_series_yields_null_not_nan(spark):
    rows = [("a", 1, 7), ("a", 2, 7), ("b", 1, 1), ("b", 2, 9)]
    assert _pairs(spark, rows)[("a", "b")]["corr"] is None


def test_alignment_is_inner_join_on_shared_buckets(spark):
    # bucket 3 exists only for "a", bucket 0 only for "b": both dropped.
    rows = [("a", 1, 1), ("a", 2, 2), ("a", 3, 99),
            ("b", 0, 42), ("b", 1, 1), ("b", 2, 2)]
    r = _pairs(spark, rows)[("a", "b")]
    assert r["n_buckets"] == 2
    assert r["sum_a"] == 3 and r["sum_b"] == 3
    assert r["corr"] == 1.0


def test_each_unordered_pair_emitted_once(spark):
    rows = [(k, b, (b + 1) * (i + 1))
            for i, k in enumerate("abc") for b in (1, 2, 3)]
    got = _pairs(spark, rows)
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}


def test_matches_math_corrcoef_formula(spark):
    xs = [3, 1, 4, 1, 5]
    ys = [9, 2, 6, 5, 3]
    rows = [("a", i, x) for i, x in enumerate(xs)] + [
        ("b", i, y) for i, y in enumerate(ys)
    ]
    n = len(xs)
    num = n * sum(x * y for x, y in zip(xs, ys)) - sum(xs) * sum(ys)
    varx = n * sum(x * x for x in xs) - sum(xs) ** 2
    vary = n * sum(y * y for y in ys) - sum(ys) ** 2
    expect = num / math.sqrt(varx * vary)
    got = _pairs(spark, rows)[("a", "b")]["corr"]
    assert abs(got - expect) < 1e-12
