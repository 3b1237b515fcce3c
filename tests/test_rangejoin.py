"""range_join_binned semantics + physical-plan shape
(operators/rangejoin.py)."""

from __future__ import annotations

from datetime import datetime

from live_market_data_orderflow_analysis_big_data_project__spark.operators.rangejoin import (  # noqa: E501
    range_count_binned,
    range_join_binned,
)


def _t(h, m=0, s=0, us=0):
    return datetime(2024, 1, 1, h, m, s, us)


def _frames(spark, points, intervals):
    p = spark.createDataFrame(points, "p_ts timestamp, p_id long")
    iv = spark.createDataFrame(intervals, "iv_id long, lo timestamp, hi timestamp")
    return p, iv


def _match(spark, points, intervals, bin_seconds=3600):
    p, iv = _frames(spark, points, intervals)
    out = range_join_binned(p, iv, "p_ts", "lo", "hi", bin_seconds)
    return {(r["iv_id"], r["p_id"]) for r in out.collect()}


def test_closed_interval_bounds(spark):
    pts = [(_t(9, 59, 59), 1), (_t(10), 2), (_t(12), 3), (_t(12, 0, 0, 1), 4)]
    ivs = [(1, _t(10), _t(12))]
    assert _match(spark, pts, ivs) == {(1, 2), (1, 3)}


def test_interval_spanning_many_bins_meets_each_point_once(spark):
    # 5-hour interval, points in distinct hours; tiny bins force fan-out.
    pts = [(_t(h, 30), h) for h in range(8, 15)]
    ivs = [(1, _t(9), _t(13, 59))]
    got = _match(spark, pts, ivs, bin_seconds=600)
    assert got == {(1, h) for h in range(9, 14)}


def test_zero_length_interval_matches_exact_timestamp(spark):
    pts = [(_t(10, 0, 0, 5), 1), (_t(10, 0, 0, 6), 2)]
    ivs = [(1, _t(10, 0, 0, 5), _t(10, 0, 0, 5))]
    assert _match(spark, pts, ivs) == {(1, 1)}


def test_overlapping_intervals_each_match(spark):
    pts = [(_t(10, 30), 1)]
    ivs = [(1, _t(10), _t(11)), (2, _t(10, 15), _t(10, 45)), (3, _t(11), _t(12))]
    assert _match(spark, pts, ivs) == {(1, 1), (2, 1)}


def test_no_duplicate_pairs_vs_naive_join(spark):
    # Property on a small random-ish grid: binned == naive BETWEEN join.
    pts = [(_t(h, m), h * 100 + m) for h in range(6) for m in (0, 17, 43)]
    ivs = [(i, _t(i), _t(i + 2, 30)) for i in range(3)]
    p, iv = _frames(spark, pts, ivs)
    naive = {
        (r["iv_id"], r["p_id"])
        for r in p.crossJoin(iv)
        .where((p.p_ts >= iv.lo) & (p.p_ts <= iv.hi))
        .collect()
    }
    got = _match(spark, pts, ivs, bin_seconds=1800)
    assert got == naive
    # exactly-once: collect with duplicates preserved
    p2, iv2 = _frames(spark, pts, ivs)
    rows = range_join_binned(p2, iv2, "p_ts", "lo", "hi", 1800).collect()
    assert len(rows) == len(naive)


def _counts(spark, points, intervals, bin_seconds):
    p, iv = _frames(spark, points, intervals)
    out = range_count_binned(p.select("p_ts"), iv, "p_ts", "lo", "hi",
                             bin_seconds)
    return {r["iv_id"]: r["n_in_range"] for r in out.collect()}


def test_count_variant_equals_pair_join_counts(spark):
    pts = [(_t(h, m, s), h * 10000 + m * 100 + s)
           for h in range(8) for m in (0, 9, 31, 59) for s in (0, 30)]
    ivs = [(1, _t(0, 30), _t(5, 45)),     # many interior bins
           (2, _t(2, 9), _t(2, 31)),      # single-bin interval
           (3, _t(3), _t(4)),             # exact bin-edge endpoints
           (4, _t(23), _t(23, 59))]       # empty interval
    for bin_s in (600, 3600, 7200):
        pairs = _match(spark, pts, ivs, bin_s)
        expect = {i: sum(1 for (j, _) in pairs if j == i)
                  for i in (1, 2, 3, 4)}
        assert _counts(spark, pts, ivs, bin_s) == expect


def test_count_variant_zero_for_empty_interval(spark):
    pts = [(_t(1), 1)]
    ivs = [(1, _t(5), _t(6))]
    assert _counts(spark, pts, ivs, 3600) == {1: 0}


def test_plan_is_equi_join_not_cartesian(spark):
    pts = [(_t(h), h) for h in range(6)]
    ivs = [(1, _t(1), _t(3))]
    p, iv = _frames(spark, pts, ivs)
    out = range_join_binned(p, iv, "p_ts", "lo", "hi", 3600)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_duplicate_interval_rows_raise_not_double_count(spark):
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkRuntimeError

    pts = [(_t(2), 1)]
    ivs = [(1, _t(1), _t(3)), (1, _t(1), _t(3))]  # exact duplicate row
    p, iv = _frames(spark, pts, ivs)
    out = range_count_binned(p, iv, "p_ts", "lo", "hi", 3600)
    with pytest.raises((Py4JJavaError, PySparkRuntimeError, Exception)) as e:
        out.collect()
    assert "duplicate interval rows" in str(e.value)


def test_null_carrying_interval_rows_keep_their_counts(spark):
    # a NULL in a CARRIED column must not zero the count (the old
    # name-list re-attach join dropped NULL keys silently)
    pts = [(_t(2), 1), (_t(2, 30), 2)]
    p = spark.createDataFrame(pts, "p_ts timestamp, p_id long")
    iv = spark.createDataFrame(
        [(None, _t(1), _t(3)), (7, _t(5), _t(6))],
        "iv_id long, lo timestamp, hi timestamp",
    )
    out = range_count_binned(p, iv, "p_ts", "lo", "hi", 3600)
    got = {r["iv_id"]: r["n_in_range"] for r in out.collect()}
    assert got == {None: 2, 7: 0}


def test_caller_columns_shadowing_guard_names_still_work(spark):
    # r9 ADVICE: the duplicate-interval guard's internal helper names
    # must not collide with caller columns — an intervals frame already
    # carrying `_n_dup` / `_rj_dup`-style names gets a fresh prefix.
    pts = [(_t(2), 1)]
    p = spark.createDataFrame(pts, "p_ts timestamp, p_id long")
    iv = spark.createDataFrame(
        [(1, 9, 9, _t(1), _t(3))],
        "iv_id long, _n_dup long, _rj_dup long, lo timestamp, hi timestamp",
    )
    out = range_count_binned(p, iv, "p_ts", "lo", "hi", 3600)
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["iv_id"] == 1 and r["n_in_range"] == 1
    assert r["_n_dup"] == 9 and r["_rj_dup"] == 9  # carried untouched


def test_null_bound_interval_matches_nothing(spark):
    pts = [(_t(2), 1)]
    p = spark.createDataFrame(pts, "p_ts timestamp, p_id long")
    iv = spark.createDataFrame(
        [(1, None, _t(3))], "iv_id long, lo timestamp, hi timestamp"
    )
    out = range_count_binned(p, iv, "p_ts", "lo", "hi", 3600)
    assert {r["iv_id"]: r["n_in_range"] for r in out.collect()} == {1: 0}
