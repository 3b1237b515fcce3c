"""time_weighted_avg semantics on hand fixtures (operators/twap.py)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from live_market_data_orderflow_analysis_big_data_project__spark.operators.twap import (
    time_weighted_avg,
)

US_H = 3600 * 1_000_000


def _run(spark, rows):
    df = spark.createDataFrame(
        rows, "k string, ts timestamp, id long, cents long"
    )
    out = time_weighted_avg(df, ["k"], "ts", F.col("cents"), "id")
    return {(r["k"], r["day"]): r for r in out.collect()}


def test_equal_spacing_weights_held_values(spark):
    # 100 cents held 20:00-22:00 (2h), 300 cents held 22:00-24:00 (2h).
    rows = [("a", datetime(2024, 1, 1, 20), 1, 100),
            ("a", datetime(2024, 1, 1, 22), 2, 300)]
    r = _run(spark, rows)[("a", "2024-01-01")]
    assert r["twap_cents"] == 200.0
    assert r["sum_dur_us"] == 4 * US_H
    assert r["n_ticks"] == 2


def test_unequal_spacing_is_duration_weighted_not_tick_avg(spark):
    # 100 held 23h (01:00->24:00 after a later tick), arrangement:
    # 0 cents 00:00-01:00, 2400 cents 01:00-24:00.
    rows = [("a", datetime(2024, 1, 1, 0), 1, 0),
            ("a", datetime(2024, 1, 1, 1), 2, 2400)]
    r = _run(spark, rows)[("a", "2024-01-01")]
    assert r["twap_cents"] == 2300.0  # (0*1 + 2400*23)/24
    assert r["sum_dur_us"] == 24 * US_H


def test_single_tick_held_to_midnight(spark):
    rows = [("a", datetime(2024, 1, 1, 18), 1, 555)]
    r = _run(spark, rows)[("a", "2024-01-01")]
    assert r["twap_cents"] == 555.0
    assert r["sum_dur_us"] == 6 * US_H  # 18:00 -> midnight


def test_coincident_ticks_last_id_wins(spark):
    # Two ticks at the same microsecond: id order gives the first a
    # zero duration — only the id=2 value stands.
    t = datetime(2024, 1, 1, 12)
    rows = [("a", t, 1, 100), ("a", t, 2, 900)]
    r = _run(spark, rows)[("a", "2024-01-01")]
    assert r["twap_cents"] == 900.0
    assert r["n_ticks"] == 2
    assert r["sum_dur_us"] == 12 * US_H


def test_days_and_keys_are_independent(spark):
    rows = [("a", datetime(2024, 1, 1, 12), 1, 100),
            ("a", datetime(2024, 1, 2, 6), 2, 200),
            ("b", datetime(2024, 1, 1, 0), 3, 700)]
    got = _run(spark, rows)
    assert got[("a", "2024-01-01")]["twap_cents"] == 100.0
    assert got[("a", "2024-01-02")]["twap_cents"] == 200.0
    assert got[("b", "2024-01-01")]["twap_cents"] == 700.0
    assert got[("b", "2024-01-01")]["sum_dur_us"] == 24 * US_H
