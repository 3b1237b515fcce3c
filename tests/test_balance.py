"""clamped_balance vs the literal fold (operators/balance.py)."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from live_market_data_orderflow_analysis_big_data_project__spark.operators.balance import (  # noqa: E501
    clamped_balance,
)


def _fold(amounts):
    s, peak, clamps = 0, 0, 0
    for x in amounts:
        if s + x < 0:
            clamps += 1
            s = 0
        else:
            s += x
        peak = max(peak, s)
    return s, peak, clamps


def _run(spark, per_key_amounts):
    rows, t0 = [], datetime(2024, 1, 1)
    for k, amounts in per_key_amounts.items():
        for i, x in enumerate(amounts):
            rows.append((k, t0 + timedelta(minutes=i), i, x))
    df = spark.createDataFrame(rows, "k string, ts timestamp, id long, x long")
    out = clamped_balance(df, "k", "ts", F.col("x"), "id")
    return {r["k"]: r for r in out.collect()}


def test_matches_literal_fold_on_adversarial_sequences(spark):
    cases = {
        "deep_dip": [5, -20, 3, 4],          # clamp mid-way
        "never_clamps": [5, -3, 10, -2],
        "all_negative": [-1, -1, -1],        # clamps every step
        "first_event_negative": [-7, 9],
        "zero_touch": [5, -5, -1, 2],        # hits 0 without clamp, then clamps
        "recovery": [10, -30, 50, -10],
    }
    got = _run(spark, cases)
    for k, amounts in cases.items():
        final, peak, clamps = _fold(amounts)
        r = got[k]
        assert r["final_balance"] == final, (k, r)
        assert r["peak_balance"] == peak, (k, r)
        assert r["n_clamped"] == clamps, (k, r)
        assert r["n_events"] == len(amounts)


def test_matches_literal_fold_on_pseudorandom_walk(spark):
    amounts = [((i * 2654435761) % 2001) - 1000 for i in range(500)]
    got = _run(spark, {"w": amounts})["w"]
    final, peak, clamps = _fold(amounts)
    assert (got["final_balance"], got["peak_balance"], got["n_clamped"]) == (
        final, peak, clamps,
    )


def test_keys_independent(spark):
    got = _run(spark, {"a": [-5], "b": [5]})
    assert got["a"]["final_balance"] == 0 and got["a"]["n_clamped"] == 1
    assert got["b"]["final_balance"] == 5 and got["b"]["n_clamped"] == 0


def test_alarm_threshold_counts_cusum_exceedances(spark):
    from datetime import datetime, timedelta

    rows = []
    t0 = datetime(2024, 1, 1)
    # amounts: climb to 5 (alarm at >3 on steps 4,5), clamp, climb to 4
    for i, x in enumerate([1, 1, 1, 1, 1, -99, 4]):
        rows.append(("k", t0 + timedelta(minutes=i), i, x, 3))
    df = spark.createDataFrame(
        rows, "k string, ts timestamp, id long, x long, h long"
    )
    r = clamped_balance(
        df, "k", "ts", F.col("x"), "id", alarm_threshold=F.col("h")
    ).collect()[0]
    # balances: 1,2,3,4,5,0,4 -> bal>3 at steps 4,5 and the final 4
    assert r["n_alarms"] == 3
    assert r["n_clamped"] == 1
    assert r["final_balance"] == 4


def test_alarm_threshold_absent_keeps_schema(spark):
    from datetime import datetime

    df = spark.createDataFrame(
        [("k", datetime(2024, 1, 1), 1, 5)],
        "k string, ts timestamp, id long, x long",
    )
    out = clamped_balance(df, "k", "ts", F.col("x"), "id")
    assert "n_alarms" not in out.columns
