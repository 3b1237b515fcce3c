"""peak_concurrency semantics on hand fixtures (operators/sweepline.py)."""

from __future__ import annotations

from datetime import datetime

from live_market_data_orderflow_analysis_big_data_project__spark.operators.sweepline import (  # noqa: E501
    peak_concurrency,
)


def _t(h, m=0, s=0):
    return datetime(2024, 1, 1, h, m, s)


def _run(spark, rows):
    df = spark.createDataFrame(
        rows, "g string, lo timestamp, hi timestamp, id long"
    )
    out = peak_concurrency(df, ["g"], "lo", "hi", "id")
    return {r["g"]: r for r in out.collect()}


def test_nested_and_disjoint_intervals(spark):
    rows = [("a", _t(1), _t(10), 1),   # outer
            ("a", _t(2), _t(3), 2),    # nested -> peak 2
            ("a", _t(4), _t(5), 3),    # nested again (still 2)
            ("a", _t(11), _t(12), 4)]  # disjoint
    r = _run(spark, rows)["a"]
    assert r["peak"] == 2
    assert r["n_intervals"] == 4
    assert r["peak_ts"] == "2024-01-01 02:00:00.000000"  # FIRST peak


def test_touching_closed_intervals_are_concurrent(spark):
    # one ends exactly where the next starts: closed intervals overlap
    # at the shared instant -> peak 2, at the touch point.
    rows = [("a", _t(1), _t(2), 1), ("a", _t(2), _t(3), 2)]
    r = _run(spark, rows)["a"]
    assert r["peak"] == 2
    assert r["peak_ts"] == "2024-01-01 02:00:00.000000"


def test_no_overlap_peak_is_one(spark):
    rows = [("a", _t(1), _t(2), 1), ("a", _t(3), _t(4), 2)]
    r = _run(spark, rows)["a"]
    assert r["peak"] == 1
    assert r["peak_ts"] == "2024-01-01 01:00:00.000000"


def test_keys_are_independent(spark):
    rows = [("a", _t(1), _t(5), 1), ("a", _t(2), _t(6), 2),
            ("b", _t(1), _t(2), 3)]
    got = _run(spark, rows)
    assert got["a"]["peak"] == 2
    assert got["b"]["peak"] == 1


def test_triple_overlap_counts_three(spark):
    rows = [("a", _t(1), _t(9), 1), ("a", _t(2), _t(8), 2),
            ("a", _t(3), _t(7), 3)]
    r = _run(spark, rows)["a"]
    assert r["peak"] == 3
    assert r["peak_ts"] == "2024-01-01 03:00:00.000000"
