"""operators/attribution.py — last/first-touch conversion attribution.

The staged gate (q184) proves parity with the naive inequality-join
oracle at two sfs; these pin the window-rewrite semantics on hand
fixtures: strictly-before exclusion, inclusive lookback floor,
same-microsecond tie-breaks, the unattributed bucket, partitioning
invariance, fixture binding, and plan purity.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from live_market_data_orderflow_analysis_big_data_project__spark.operators.attribution import (  # noqa: E501
    touch_attribution,
)

from conftest import SF0001, SF001

T0 = dt.datetime(2024, 1, 10, 12, 0, 0)


def _ev(spark, rows):
    # rows: (user, id, type, seconds-offset [, micros-offset])
    data = [
        (
            u,
            i,
            ty,
            T0 + dt.timedelta(seconds=s, microseconds=(r[4] if len(r) > 4 else 0)),
        )
        for r in rows
        for (u, i, ty, s) in [r[:4]]
    ]
    return spark.createDataFrame(
        data, "user_id long, event_id long, event_type string, ts timestamp"
    )


def _run(spark, rows, lookback_s=3600):
    out = touch_attribution(
        _ev(spark, rows),
        "user_id",
        "ts",
        "event_type",
        "event_id",
        ("view", "click"),
        "purchase",
        lookback_s,
    )
    return {
        r.conv_id: (
            r.last_channel,
            r.last_gap_s,
            r.first_channel,
            r.first_gap_s,
        )
        for r in out.collect()
    }


def test_last_and_first_touch_basic(spark):
    rows = [
        (1, 10, "view", 0),
        (1, 11, "click", 100),
        (1, 12, "purchase", 200),
    ]
    got = _run(spark, rows)
    assert got == {12: ("click", 100, "view", 200)}


def test_same_instant_touch_not_credited(spark):
    # touch at the conversion's exact microsecond: strictly-before rule
    rows = [(1, 10, "view", 50), (1, 12, "purchase", 50)]
    assert _run(spark, rows) == {12: (None, None, None, None)}


def test_lookback_floor_inclusive(spark):
    # touch exactly lookback seconds earlier IS inside the window;
    # one microsecond older is not
    rows = [(1, 10, "view", 0), (1, 12, "purchase", 3600)]
    assert _run(spark, rows) == {12: ("view", 3600, "view", 3600)}
    rows2 = [
        (2, 20, "view", 0),
        (2, 22, "purchase", 3600, 1),  # +1 us past the floor
    ]
    assert _run(spark, rows2) == {22: (None, None, None, None)}


def test_same_microsecond_touches_tiebreak_by_id(spark):
    # two touches at the identical microsecond: max id wins last-touch,
    # min id wins first-touch (the total-order rule)
    rows = [
        (1, 10, "view", 100),
        (1, 11, "click", 100),
        (1, 12, "purchase", 200),
    ]
    assert _run(spark, rows) == {12: ("click", 100, "view", 100)}


def test_touches_after_conversion_ignored(spark):
    rows = [(1, 10, "view", 300), (1, 12, "purchase", 200)]
    assert _run(spark, rows) == {12: (None, None, None, None)}


def test_other_users_never_credit(spark):
    rows = [(1, 10, "view", 0), (2, 12, "purchase", 100)]
    assert _run(spark, rows) == {12: (None, None, None, None)}


def test_multiple_conversions_each_attributed(spark):
    rows = [
        (1, 10, "view", 0),
        (1, 12, "purchase", 100),
        (1, 13, "click", 200),
        (1, 14, "purchase", 300),
    ]
    got = _run(spark, rows)
    assert got[12] == ("view", 100, "view", 100)
    # the window spans BOTH prior touches for the second conversion
    assert got[14] == ("click", 100, "view", 300)


def test_partitioning_invariance(spark):
    rows = [(u, u * 100 + j, ty, u * 7 + j * 13)
            for u in range(1, 6)
            for j, ty in enumerate(("view", "click", "purchase", "view",
                                    "purchase"))]
    df = _ev(spark, rows)
    args = ("user_id", "ts", "event_type", "event_id",
            ("view", "click"), "purchase", 60)
    a = {tuple(r) for r in touch_attribution(df.repartition(1), *args).collect()}
    b = {tuple(r) for r in
         touch_attribution(df.repartition(9, "event_id"), *args).collect()}
    assert a == b


def test_fixture_binding(spark):
    """The q172/q182 binding discipline: at BOTH gate sfs the 72 h
    lookback must yield attributed AND unattributed conversions, and
    both touch channels must win somewhere — otherwise the gate
    degenerates (all-'none' or all-attributed tests nothing)."""
    from live_market_data_orderflow_analysis_big_data_project__spark.queries.ablock import (  # noqa: E501
        q184_attribution,
    )

    for sf in (SF0001, SF001):
        rows = q184_attribution(spark, sf).collect()
        last = {r.last_channel for r in rows}
        assert {"view", "click", "none"} <= last, (sf, last)


def test_no_python_in_plan(spark):
    rows = [(1, 10, "view", 0), (1, 12, "purchase", 100)]
    plan = (
        touch_attribution(
            _ev(spark, rows), "user_id", "ts", "event_type", "event_id",
            ("view", "click"), "purchase", 3600,
        )._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
