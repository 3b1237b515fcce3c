"""psi_drift semantics on hand fixtures (operators/drift.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from live_market_data_orderflow_analysis_big_data_project__spark.operators.drift import (
    psi_drift,
)


def _frame(spark, rows):
    return spark.createDataFrame(rows, "g string, x long")


def _run(spark, ref_rows, cur_rows, n_bins=4):
    out = psi_drift(
        _frame(spark, ref_rows),
        _frame(spark, cur_rows),
        ["g"],
        F.col("x"),
        n_bins=n_bins,
    )
    return {(r["g"], r["bin"]): r for r in out.collect()}


def test_identical_snapshots_drift_near_zero(spark):
    rows = [("a", v) for v in range(1, 101)]
    got = _run(spark, rows, rows)
    assert len(got) == 4
    # lower-rank edges at 25/50/75 -> half-open bins sized 24/25/25/26
    assert [got[("a", b)]["n_ref"] for b in range(4)] == [24, 25, 25, 26]
    for r in got.values():
        assert r["n_ref"] == r["n_cur"]
        assert r["psi_contrib"] == 0.0   # p == q exactly -> ln(1) == 0


def test_mass_shift_detected_in_the_shifted_bins(spark):
    ref = [("a", v) for v in range(1, 101)]
    cur = [("a", v) for v in range(76, 176)]  # mass moved to the top bin
    got = _run(spark, ref, cur)
    top = got[("a", 3)]
    assert top["n_cur"] > top["n_ref"]
    assert top["psi_contrib"] > 0.1
    assert got[("a", 0)]["n_cur"] == 0       # emptied bin still a row


def test_edges_are_reference_quartiles(spark):
    # ref 1..8: quartile edges 2,4,6 (rank rule rn*4 >= n*k) ->
    # bins [1,2),[2,4),[4,6),[6,..] sized 1,2,2,3 for values 1..8.
    ref = [("a", v) for v in range(1, 9)]
    got = _run(spark, ref, ref)
    assert [got[("a", b)]["n_ref"] for b in range(4)] == [1, 2, 2, 3]


def test_smoothed_shares_sum_to_one(spark):
    ref = [("a", v) for v in range(1, 21)]
    cur = [("a", v) for v in range(1, 11)]
    got = _run(spark, ref, cur)
    assert abs(sum(r["p_ref"] for r in got.values()) - 1.0) < 1e-12
    assert abs(sum(r["p_cur"] for r in got.values()) - 1.0) < 1e-12


def test_psi_contrib_matches_formula(spark):
    ref = [("a", v) for v in range(1, 101)]
    cur = [("a", v) for v in range(1, 51)]
    got = _run(spark, ref, cur)
    for r in got.values():
        expect = round(
            (r["p_ref"] - r["p_cur"]) * math.log(r["p_ref"] / r["p_cur"]), 4
        )
        assert abs(r["psi_contrib"] - expect) <= 1e-4


def test_groups_independent(spark):
    ref = [("a", v) for v in range(1, 41)] + [("b", v) for v in range(1, 41)]
    cur = [("a", v) for v in range(1, 41)] + [("b", v + 100) for v in range(1, 41)]
    got = _run(spark, ref, cur)
    assert all(got[("a", b)]["psi_contrib"] == 0.0 for b in range(4))
    assert sum(got[("b", b)]["psi_contrib"] for b in range(4)) > 0.5


def test_new_segment_surfaced_not_dropped(spark):
    """A key present only in cur — the strongest drift signal — must
    produce a row (bin/p/psi NULL, n_ref 0, full cur count), never
    vanish silently (ADVICE r8)."""
    ref = [("a", v) for v in range(1, 101)]
    cur = [("a", v) for v in range(1, 101)] + [("NEW", v) for v in range(7)]
    got = _run(spark, ref, cur)
    new_rows = {k: r for k, r in got.items() if k[0] == "NEW"}
    assert list(new_rows) == [("NEW", None)]
    r = new_rows[("NEW", None)]
    assert r["n_ref"] == 0 and r["n_cur"] == 7
    assert r["p_ref"] is None and r["p_cur"] is None
    assert r["psi_contrib"] is None
    # the established segment's rows are untouched by the new arm
    assert sum(1 for k in got if k[0] == "a") == 4
