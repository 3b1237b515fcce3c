"""Interval x interval overlap join (operators/overlapjoin.py) against
the brute-force non-equi join, including bin-boundary cases, touching
intervals, multi-bin spans, and NULL bounds."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from live_market_data_orderflow_analysis_big_data_project__spark.operators.overlapjoin import (  # noqa: E501
    interval_overlap_binned,
)


def _t(h, m=0, s=0):
    return datetime.datetime(2024, 1, 1, h, m, s)


def _ivs(spark, rows):
    return spark.createDataFrame(rows, "id long, lo timestamp, hi timestamp")


LEFT = [
    (1, _t(0), _t(3)),        # spans 4 hour-bins
    (2, _t(5), _t(5, 30)),    # inside one bin
    (3, _t(10), _t(10)),      # degenerate point interval
]
RIGHT = [
    (11, _t(2), _t(6)),       # overlaps 1 (1h) and 2 (30min)
    (12, _t(3), _t(4)),       # touches 1 exactly at t=3
    (13, _t(7), _t(8)),       # overlaps nothing
    (14, _t(9), _t(11)),      # covers the point interval 3
]


def _brute(left, right):
    out = {}
    for li, llo, lhi in left:
        for ri, rlo, rhi in right:
            if llo <= rhi and rlo <= lhi:
                us = (min(lhi, rhi) - max(llo, rlo)) // datetime.timedelta(
                    microseconds=1
                )
                out[(li, ri)] = us
    return out


def test_matches_brute_force(spark):
    for bin_s in (3600, 1800, 7200, 86400):
        got = {
            (r.l_id, r.r_id): r.overlap_us
            for r in interval_overlap_binned(
                _ivs(spark, LEFT), _ivs(spark, RIGHT), bin_seconds=bin_s
            ).collect()
        }
        assert got == _brute(LEFT, RIGHT), bin_s


def test_each_pair_emitted_exactly_once(spark):
    # wide x wide: both intervals span many shared bins — the
    # first-shared-bin predicate must still emit ONE row
    left = [(1, _t(0), _t(12))]
    right = [(21, _t(1), _t(11))]
    rows = interval_overlap_binned(
        _ivs(spark, left), _ivs(spark, right), bin_seconds=3600
    ).collect()
    assert len(rows) == 1
    assert rows[0].overlap_us == 10 * 3600 * 1_000_000


def test_null_bounds_match_nothing(spark):
    left = [(1, None, _t(3))]
    rows = interval_overlap_binned(
        _ivs(spark, left), _ivs(spark, RIGHT), bin_seconds=3600
    ).collect()
    assert rows == []


def test_plan_is_equi_join(spark):
    out = interval_overlap_binned(
        _ivs(spark, LEFT), _ivs(spark, RIGHT), bin_seconds=3600
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q177_overlap_predicate_binds_on_the_fixture(spark):
    """The staged q177 gate's discriminating term is the overlap
    predicate: the emitted pairs must be a strict (and large) subset
    of the span x window cross product — cross-day and out-of-span
    hours are excluded.  Pinned so a fixture regeneration cannot
    degenerate the gate into a cross join."""
    from conftest import SF001

    from live_market_data_orderflow_analysis_big_data_project__spark.queries.ablock import (  # noqa: E501
        q177_interval_overlap,
    )
    from live_market_data_orderflow_analysis_big_data_project__spark.sources.tables import (  # noqa: E501
        load_table,
    )

    ev = load_table(spark, SF001, "events")
    n_spans = ev.select("user_id", F.to_date("ts")).distinct().count()
    n_windows = ev.select(
        "event_type", F.date_trunc("hour", F.col("ts"))
    ).distinct().count()
    n_pairs = q177_interval_overlap(spark, SF001).count()
    assert 0 < n_pairs < 0.2 * n_spans * n_windows, (
        n_pairs, n_spans, n_windows
    )
