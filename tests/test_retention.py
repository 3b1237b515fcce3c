"""retention_cohorts + activity_streaks semantics on hand fixtures."""

from __future__ import annotations

from datetime import datetime

from live_market_data_orderflow_analysis_big_data_project__spark.operators.retention import (
    activity_streaks,
    retention_cohorts,
)


def _ev(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts timestamp")


def _d(day, h=12):
    return datetime(2024, 1, day, h)


def test_retention_triangle(spark):
    # cohort 01-01: users 1,2.  user 1 returns day 2 and 4; user 2 never.
    # cohort 01-03: user 3, returns day 4.
    rows = [
        (1, _d(1)), (2, _d(1)), (1, _d(2)), (1, _d(4)),
        (3, _d(3)), (3, _d(4)),
    ]
    out = {
        (r["cohort_day"], r["age"]): r
        for r in retention_cohorts(_ev(spark, rows), "user_id", "ts").collect()
    }
    assert out[("2024-01-01", 0)]["n_active"] == 2
    assert out[("2024-01-01", 0)]["retention_rate"] == 1.0
    assert out[("2024-01-01", 1)]["n_active"] == 1
    assert out[("2024-01-01", 1)]["cohort_size"] == 2
    assert out[("2024-01-01", 1)]["retention_rate"] == 0.5
    assert out[("2024-01-01", 3)]["n_active"] == 1
    assert out[("2024-01-03", 1)]["n_active"] == 1
    assert ("2024-01-01", 2) not in out  # nobody active -> no row


def test_retention_multiple_events_one_day_count_once(spark):
    rows = [(1, _d(1, 8)), (1, _d(1, 9)), (1, _d(2))]
    out = retention_cohorts(_ev(spark, rows), "user_id", "ts").collect()
    assert {(r["age"], r["n_active"]) for r in out} == {(0, 1), (1, 1)}


def test_streaks_islands_and_longest(spark):
    # user 1: days 1-3 (streak 3), day 5 (streak 1) -> longest 3 @ 01-01
    # user 2: days 2-3 and 6-7 -> two streaks of 2, tie -> earliest start
    rows = [
        (1, _d(1)), (1, _d(2)), (1, _d(3)), (1, _d(5)),
        (2, _d(2)), (2, _d(3)), (2, _d(6)), (2, _d(7)),
    ]
    out = {
        r["user_id"]: r
        for r in activity_streaks(_ev(spark, rows), "user_id", "ts").collect()
    }
    assert out[1]["n_active_days"] == 4
    assert out[1]["n_streaks"] == 2
    assert out[1]["longest_streak"] == 3
    assert out[1]["longest_start"] == "2024-01-01"
    assert out[2]["longest_streak"] == 2
    assert out[2]["longest_start"] == "2024-01-02"  # earliest-first tie-break


def test_streaks_duplicate_days_collapse(spark):
    rows = [(1, _d(1, 8)), (1, _d(1, 20)), (1, _d(2))]
    out = activity_streaks(_ev(spark, rows), "user_id", "ts").collect()
    assert out[0]["n_active_days"] == 2 and out[0]["longest_streak"] == 2
