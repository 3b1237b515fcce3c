"""transition_matrix semantics on hand fixtures (operators/markov.py)."""

from __future__ import annotations

from datetime import datetime

from live_market_data_orderflow_analysis_big_data_project__spark.operators.markov import (  # noqa: E501
    transition_matrix,
)


def _run(spark, rows):
    df = spark.createDataFrame(rows, "k long, ts timestamp, s string, id long")
    out = transition_matrix(df, "k", "ts", "s", "id")
    return {(r["from_state"], r["to_state"]): r for r in out.collect()}


def _t(m):
    return datetime(2024, 1, 1, 0, m)


def test_counts_and_probabilities(spark):
    # user 1: a->b->a->b ; user 2: a->b
    rows = [(1, _t(0), "a", 1), (1, _t(1), "b", 2), (1, _t(2), "a", 3),
            (1, _t(3), "b", 4), (2, _t(0), "a", 5), (2, _t(1), "b", 6)]
    got = _run(spark, rows)
    assert got[("a", "b")]["n_transitions"] == 3
    assert got[("a", "b")]["from_total"] == 3
    assert got[("a", "b")]["prob"] == 1.0
    assert got[("b", "a")]["n_transitions"] == 1
    assert set(got) == {("a", "b"), ("b", "a")}


def test_first_event_per_key_contributes_no_transition(spark):
    rows = [(1, _t(0), "a", 1), (2, _t(0), "b", 2)]
    assert _run(spark, rows) == {}


def test_transitions_never_cross_keys(spark):
    # interleaved in time across users: no a->b exists within a key.
    rows = [(1, _t(0), "a", 1), (2, _t(1), "b", 2), (1, _t(2), "a", 3)]
    got = _run(spark, rows)
    assert set(got) == {("a", "a")}


def test_coincident_timestamps_break_ties_by_id(spark):
    t = _t(5)
    rows = [(1, t, "x", 2), (1, t, "y", 1), (1, _t(6), "z", 3)]
    got = _run(spark, rows)  # order by id: y -> x -> z
    assert set(got) == {("y", "x"), ("x", "z")}


def test_probs_sum_to_one_per_source(spark):
    rows = [(1, _t(i), s, i) for i, s in enumerate("abacabcab")]
    got = _run(spark, rows)
    by_src = {}
    for (f, _), r in got.items():
        by_src.setdefault(f, 0.0)
        by_src[f] += r["prob"]
    for total in by_src.values():
        assert abs(total - 1.0) < 1e-12
