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


# ---------------------------------------------------------------------------
# psi_from_histograms — the streamed-rollup PSI read (staged gate s20)
# ---------------------------------------------------------------------------

def _hist_frames(spark, ref_rows, cur_rows):
    r = spark.createDataFrame(ref_rows, "g string, bin long, n long")
    c = spark.createDataFrame(
        cur_rows, "g string, day string, bin long, n long"
    )
    return r, c


def _run_hist(spark, ref_rows, cur_rows):
    from live_market_data_orderflow_analysis_big_data_project__spark.operators.drift import (  # noqa: E501
        psi_from_histograms,
    )

    r, c = _hist_frames(spark, ref_rows, cur_rows)
    out = psi_from_histograms(r, c, ["g"], "day", "bin", "n")
    return {(x["g"], x["day"], x["bin"]): x for x in out.collect()}


def test_hist_psi_identical_distributions_near_zero(spark):
    ref = [("a", b, 25) for b in range(4)]
    cur = [("a", "d1", b, 50) for b in range(4)]
    got = _run_hist(spark, ref, cur)
    assert len(got) == 4
    for x in got.values():
        assert x.n_bins == 4
        # equal shares -> p == q exactly -> contribution exactly 0
        assert x.psi_contrib == 0.0


def test_hist_psi_domain_is_union_of_ref_and_day_bins(spark):
    # bin 9 exists only in the reference, bin 7 only on day d1 — BOTH
    # must appear in d1's domain (n_bins = 3) and score; a bin on
    # neither side must not.
    ref = [("a", 1, 10), ("a", 9, 10)]
    cur = [("a", "d1", 1, 5), ("a", "d1", 7, 5)]
    got = _run_hist(spark, ref, cur)
    assert set(got) == {("a", "d1", 1), ("a", "d1", 7), ("a", "d1", 9)}
    for x in got.values():
        assert x.n_bins == 3
    assert got[("a", "d1", 7)].n_ref == 0
    assert got[("a", "d1", 9)].n_cur == 0
    # one-sided bins are exactly where drift lives: both contribute > 0
    assert got[("a", "d1", 7)].psi_contrib > 0
    assert got[("a", "d1", 9)].psi_contrib > 0


def test_hist_psi_matches_python_model(spark):
    ref = [("a", 0, 30), ("a", 1, 10), ("a", 2, 5)]
    cur = [
        ("a", "d1", 0, 2),
        ("a", "d1", 1, 20),
        ("a", "d2", 0, 30),
        ("a", "d2", 1, 10),
        ("a", "d2", 2, 5),
    ]
    got = _run_hist(spark, ref, cur)

    refc = {b: n for _, b, n in ref}
    for day in ("d1", "d2"):
        dayc = {b: n for g, d, b, n in cur if d == day}
        bins = sorted(set(refc) | set(dayc))
        t_ref = sum(refc.values())
        t_cur = sum(dayc.values())
        for b in bins:
            p = (refc.get(b, 0) + 1) / (t_ref + len(bins))
            q = (dayc.get(b, 0) + 1) / (t_cur + len(bins))
            x = got[("a", day, b)]
            assert x.n_ref == refc.get(b, 0) and x.n_cur == dayc.get(b, 0)
            assert x.p_ref == p and x.p_cur == q
            assert x.psi_contrib == round((p - q) * math.log(p / q), 4)


def test_hist_psi_per_day_domains_are_independent(spark):
    # a bin private to d1 must not enter d2's domain
    ref = [("a", 0, 10)]
    cur = [("a", "d1", 5, 10), ("a", "d2", 0, 10)]
    got = _run_hist(spark, ref, cur)
    assert got[("a", "d1", 5)].n_bins == 2
    assert got[("a", "d2", 0)].n_bins == 1
    assert ("a", "d2", 5) not in got


def test_s20_split_and_closure_bind(spark):
    """The s19 closure lesson applied to s20: at the gate sf the
    reference (pre-split closed days) and the monitored side (post-
    split closed days) are both non-empty, and the open final day is
    withheld by the stream — the splice and the split are both
    load-bearing."""
    from conftest import SF0001

    from live_market_data_orderflow_analysis_big_data_project__spark.queries.sblock import (  # noqa: E501
        _S20_SPLIT,
        s20_psi_drift_stream,
    )
    from live_market_data_orderflow_analysis_big_data_project__spark.sources.tables import (  # noqa: E501
        load_table,
    )

    rows = s20_psi_drift_stream(spark, SF0001).collect()
    days = {r.day for r in rows}
    assert days and min(days) >= _S20_SPLIT
    assert any(r.n_ref > 0 for r in rows)
    last_day = (
        load_table(spark, SF0001, "events")
        .agg(F.date_format(F.max(F.date_trunc("day", "ts")),
                           "yyyy-MM-dd").alias("d"))
        .collect()[0]
        .d
    )
    assert last_day not in days  # the open day is withheld


# --- top-k ranking drift (staged gate s23) ----------------------------------


def test_topk_drift_hand_model(spark):
    """Hand-computed drift: ref (periods < split) top-2 of key A is
    {u1, u2} (u1 first on total 5 vs 3); day d2's top-2 is {u2, u3}
    -> n_common 1, union 3, jaccard 333333 ppm, top1 changed.  Key B
    appears ONLY post-split -> surfaced with n_ref_k 0, NULL
    ref_top1, top1_same false (null-safe)."""
    from live_market_data_orderflow_analysis_big_data_project__spark.operators.drift import (  # noqa: E501
        topk_drift,
    )

    rows = [
        # key, day, item, n
        ("A", "d1", 1, 5),
        ("A", "d1", 2, 3),
        ("A", "d1", 3, 1),
        ("A", "d2", 2, 4),   # post-split day
        ("A", "d2", 3, 2),
        ("A", "d2", 1, 1),
        ("B", "d2", 9, 7),   # no pre-split history
    ]
    hist = spark.createDataFrame(
        rows, "k string, day string, item long, n long"
    )
    got = {
        (r.k, r.day): (
            r.n_ref_k, r.n_cur_k, r.n_common, r.jaccard_ppm,
            r.ref_top1, r.cur_top1, r.top1_same,
        )
        for r in topk_drift(hist, ["k"], "day", "item", "n", "d2", 2)
        .collect()
    }
    assert got[("A", "d2")] == (2, 2, 1, 333333, 1, 2, False)
    # B holds a single item post-split: the top-2 list under-fills to
    # 1 (surfaced, not padded), jaccard 0/1, NULL ref side
    assert got[("B", "d2")] == (0, 1, 0, 0, None, 9, False)
    assert set(got) == {("A", "d2"), ("B", "d2")}


def test_topk_drift_tiebreak_and_identical_ranking(spark):
    """Equal counts break on item asc (the q143 rule); a day whose
    top-k equals the reference scores jaccard 1e6 and top1_same."""
    from live_market_data_orderflow_analysis_big_data_project__spark.operators.drift import (  # noqa: E501
        topk_drift,
    )

    rows = [
        ("A", "d1", 7, 2),
        ("A", "d1", 4, 2),  # ties 7 on count: item 4 ranks first
        ("A", "d2", 7, 2),
        ("A", "d2", 4, 2),
    ]
    hist = spark.createDataFrame(
        rows, "k string, day string, item long, n long"
    )
    out = topk_drift(hist, ["k"], "day", "item", "n", "d2", 2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.ref_top1, r.cur_top1, r.top1_same) == (4, 4, True)
    assert (r.n_common, r.jaccard_ppm) == (2, 1_000_000)


def test_s23_gate_binding(spark):
    """At both gate sfs the drift signal BINDS in both directions:
    some day shares at least one heavy hitter with the reference and
    some day loses at least one — the gate exercises overlap and
    divergence simultaneously (the q172 binding discipline)."""
    from conftest import SF0001, SF001

    from live_market_data_orderflow_analysis_big_data_project__spark.queries.sblock import (  # noqa: E501
        _S23_K,
        s23_topk_drift_stream,
    )

    for sf in (SF0001, SF001):
        rows = s23_topk_drift_stream(spark, sf).collect()
        assert rows, sf
        assert all(r.n_cur_k <= _S23_K for r in rows), sf
        assert any(r.n_common > 0 for r in rows), sf
        assert any(r.n_common < min(r.n_ref_k, r.n_cur_k) or
                   r.n_common == 0 for r in rows), sf
        assert {r.top1_same for r in rows} == {True, False}, sf
