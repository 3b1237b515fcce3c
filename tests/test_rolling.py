"""rolling_active_users semantics on hand fixtures
(operators/rolling.py)."""

from __future__ import annotations

from datetime import datetime

from live_market_data_orderflow_analysis_big_data_project__spark.operators.rolling import (  # noqa: E501
    rolling_active_users,
)


def _run(spark, rows, window_days=7):
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = rolling_active_users(df, "user_id", "ts", window_days)
    return {r["day"]: r for r in out.collect()}


def _d(day, h=10):
    return datetime(2024, 1, day, h)


def test_wau_counts_trailing_window_distinct(spark):
    # user 1 active days 1 and 5; user 2 active day 5 only.
    rows = [(1, _d(1)), (1, _d(5)), (2, _d(5))]
    got = _run(spark, rows)
    assert got["2024-01-01"]["dau"] == 1 and got["2024-01-01"]["wau"] == 1
    # day 5 window [day-6, day] covers day 1: users {1, 2}
    assert got["2024-01-05"]["dau"] == 2 and got["2024-01-05"]["wau"] == 2
    assert got["2024-01-05"]["stickiness"] == 1.0


def test_user_counted_once_despite_multiple_active_days_in_window(spark):
    rows = [(1, _d(1)), (1, _d(2)), (1, _d(3))]
    got = _run(spark, rows)
    assert got["2024-01-03"]["wau"] == 1
    assert got["2024-01-03"]["dau"] == 1


def test_window_expires_after_w_days(spark):
    rows = [(1, _d(1)), (2, _d(9))]
    got = _run(spark, rows, window_days=7)
    # day 9's trailing window is days 3..9: user 1 (day 1) is gone
    assert got["2024-01-09"]["wau"] == 1


def test_gap_days_emit_no_row_but_windows_span_them(spark):
    rows = [(1, _d(1)), (2, _d(4))]
    got = _run(spark, rows)
    assert set(got) == {"2024-01-01", "2024-01-04"}
    assert got["2024-01-04"]["wau"] == 2  # window spans the gap


def test_intraday_duplicates_collapse(spark):
    rows = [(1, _d(2, 8)), (1, _d(2, 9)), (1, _d(2, 20))]
    got = _run(spark, rows)
    assert got["2024-01-02"]["dau"] == 1 and got["2024-01-02"]["wau"] == 1
