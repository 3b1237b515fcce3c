"""coalesce_intervals semantics on hand fixtures
(operators/coalesce_intervals.py)."""

from __future__ import annotations

from datetime import datetime

from live_market_data_orderflow_analysis_big_data_project__spark.operators.coalesce_intervals import (  # noqa: E501
    coalesce_intervals,
)

US_H = 3600 * 1_000_000


def _t(h, m=0):
    return datetime(2024, 1, 1, h, m)


def _run(spark, rows):
    df = spark.createDataFrame(
        rows, "g string, lo timestamp, hi timestamp, id long"
    )
    out = coalesce_intervals(df, ["g"], "lo", "hi", "id")
    return {r["g"]: r for r in out.collect()}


def test_overlapping_chain_is_one_episode(spark):
    # [1,3] + [2,5] + [4,6]: pairwise-chained -> union [1,6]
    rows = [("a", _t(1), _t(3), 1), ("a", _t(2), _t(5), 2),
            ("a", _t(4), _t(6), 3)]
    r = _run(spark, rows)["a"]
    assert r["n_episodes"] == 1
    assert r["covered_us"] == 5 * US_H
    assert r["sum_span_us"] == (2 + 3 + 2) * US_H
    assert r["overlap_us"] == 2 * US_H


def test_disjoint_intervals_separate_episodes(spark):
    rows = [("a", _t(1), _t(2), 1), ("a", _t(3), _t(4), 2)]
    r = _run(spark, rows)["a"]
    assert r["n_episodes"] == 2
    assert r["covered_us"] == 2 * US_H
    assert r["overlap_us"] == 0


def test_touching_closed_intervals_connect(spark):
    rows = [("a", _t(1), _t(2), 1), ("a", _t(2), _t(3), 2)]
    r = _run(spark, rows)["a"]
    assert r["n_episodes"] == 1
    assert r["covered_us"] == 2 * US_H


def test_nested_interval_adds_overlap_not_coverage(spark):
    rows = [("a", _t(1), _t(10), 1), ("a", _t(3), _t(4), 2)]
    r = _run(spark, rows)["a"]
    assert r["n_episodes"] == 1
    assert r["covered_us"] == 9 * US_H
    assert r["overlap_us"] == 1 * US_H


def test_nested_then_extend_episode_uses_running_max(spark):
    # [1,10], [2,3] (nested), [4,12]: the naive "previous hi" would
    # split at [4,12] (4 > 3); the running MAX hi (10) keeps it joined.
    rows = [("a", _t(1), _t(10), 1), ("a", _t(2), _t(3), 2),
            ("a", _t(4), _t(12), 3)]
    r = _run(spark, rows)["a"]
    assert r["n_episodes"] == 1
    assert r["covered_us"] == 11 * US_H


def test_keys_independent_and_zero_length_ok(spark):
    rows = [("a", _t(1), _t(1), 1), ("b", _t(1), _t(2), 2)]
    got = _run(spark, rows)
    assert got["a"]["covered_us"] == 0 and got["a"]["n_episodes"] == 1
    assert got["b"]["covered_us"] == US_H
