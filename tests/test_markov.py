"""transition_matrix + streaming twin semantics (operators/markov.py)."""

from __future__ import annotations

import tempfile
from datetime import datetime

from pyspark.sql import functions as F

from live_market_data_orderflow_analysis_big_data_project__spark.operators.markov import (  # noqa: E501
    transition_counts_to_matrix,
    transition_increments,
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


def test_streaming_increments_count_cross_batch_transitions(spark):
    """The per-key last-event state makes a transition whose endpoints
    straddle a micro-batch boundary count exactly once: one-batch and
    three-batch drains sum to identical counts, equal to the batch
    transition_matrix."""
    from live_market_data_orderflow_analysis_big_data_project__spark.streaming.core import (  # noqa: E501
        run_to_memory,
        stream_events_dir,
    )

    # user 1 alternates a/b across minutes; user 2 emits one event per
    # minute — EVERY user-2 transition crosses a batch boundary under
    # maxFilesPerTrigger=1 (minute == file).
    rows = []
    eid = 0
    for m in range(3):
        for s, st in ((0, "a"), (30, "b")):
            eid += 1
            rows.append((1, datetime(2024, 1, 1, 0, m, s), st, eid))
        eid += 1
        rows.append((2, datetime(2024, 1, 1, 0, m, 15), "xyz"[m], eid))
    schema = "user_id long, ts timestamp, event_type string, event_id long"
    df = spark.createDataFrame(rows, schema)
    tmp = tempfile.mkdtemp(prefix="trans_batches_")
    for m in range(3):
        df.filter(F.minute("ts") == m).coalesce(1).write.mode(
            "append"
        ).parquet(tmp)

    def drained_counts(max_files):
        sdf = stream_events_dir(
            spark, tmp, df.schema, max_files_per_trigger=max_files
        )
        inc = run_to_memory(
            transition_increments(sdf),
            f"t_trans_{max_files}",
            output_mode="update",
        )
        return {
            (r["from_state"], r["to_state"]): r["n"]
            for r in inc.groupBy("from_state", "to_state")
            .agg(F.sum("n").alias("n"))
            .collect()
        }

    batch = {
        (r["from_state"], r["to_state"]): r["n_transitions"]
        for r in transition_matrix(
            df, "user_id", "ts", "event_type", "event_id"
        ).collect()
    }
    one, three = drained_counts(None), drained_counts(1)
    assert one == batch
    assert three == batch
    assert batch[("x", "y")] == 1 and batch[("y", "z")] == 1  # cross-batch


def test_counts_to_matrix_normalizes_any_count_frame(spark):
    tr = spark.createDataFrame(
        [("a", "b", 3), ("a", "c", 1)],
        "from_state string, to_state string, n_transitions long",
    )
    got = {
        (r["from_state"], r["to_state"]): r
        for r in transition_counts_to_matrix(tr).collect()
    }
    assert got[("a", "b")]["prob"] == 0.75
    assert got[("a", "c")]["from_total"] == 4


def test_probs_sum_to_one_per_source(spark):
    rows = [(1, _t(i), s, i) for i, s in enumerate("abacabcab")]
    got = _run(spark, rows)
    by_src = {}
    for (f, _), r in got.items():
        by_src.setdefault(f, 0.0)
        by_src[f] += r["prob"]
    for total in by_src.values():
        assert abs(total - 1.0) < 1e-12
