"""First-order transition matrix over per-key event sequences.

The Markov view of an event stream: for each key (user, session,
symbol), order its events in time and count state→state transitions;
normalize per source state into an empirical transition probability.
This is the reference engine's aggressor-side/order-flow sequencing
question (which side follows which) asked of any categorical column.

Exactness: transitions and row totals are exact integers; each
probability is ONE IEEE division of bit-identical exact operands
(hashstable.py convention — no rounding).  The ordering inside a key
is total — (ts, id) — so coincident timestamps cannot make the lag
nondeterministic.

At 100 TB: one shuffle to (key) for the lag window — per-partition
width is one key's event count — then a map-side-combinable count agg
whose output is DOMAIN-bounded (|states|²), with the per-source
totals derived from the counts themselves (broadcast join; no second
pass over data).  Self-transitions of a key's FIRST event don't
exist: the lag is NULL there and the row is dropped before counting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "transition_matrix",
    "transition_counts_to_matrix",
    "transition_increments",
]


def transition_counts_to_matrix(tr: DataFrame) -> DataFrame:
    """Normalize a ``(from_state, to_state, n_transitions)`` count
    frame into the probability matrix — shared by the batch path and
    the streaming twin (which sums per-batch increments into the same
    count shape first)."""
    # tr feeds the totals AND the final join; it is |states|²-bounded,
    # so cut the lineage instead of recomputing the upstream lag
    # window (batch path) per consumer
    tr = tr.localCheckpoint(eager=True)
    tot = tr.groupBy("from_state").agg(
        F.sum("n_transitions").alias("from_total")
    )
    return tr.join(F.broadcast(tot), "from_state").select(
        "from_state",
        "to_state",
        "n_transitions",
        "from_total",
        (
            F.col("n_transitions").cast("double")
            / F.col("from_total").cast("double")
        ).alias("prob"),
    )


def transition_matrix(
    df: DataFrame, key_col: str, ts_col: str, state_col: str, id_col: str
) -> DataFrame:
    """Per-(from_state, to_state) transition counts and probabilities.

    Output: ``from_state``, ``to_state``, ``n_transitions``,
    ``from_total`` (Σ over to_state), ``prob`` = n / from_total.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    seq = df.select(
        F.lag(state_col).over(w).alias("from_state"),
        F.col(state_col).alias("to_state"),
    ).where(F.col("from_state").isNotNull())
    tr = seq.groupBy("from_state", "to_state").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    return transition_counts_to_matrix(tr)


def transition_increments(df: DataFrame) -> DataFrame:
    """Streaming transition counting via ``applyInPandasWithState``.

    Per user key, state is the LAST seen event — (sort key, state
    label), constant size per key — so transitions ACROSS micro-batch
    boundaries are counted exactly once: each batch sorts its rows by
    (ts, event_id), prepends the stored last state, emits the pair
    increments, and stores the new last event.  Summing the emitted
    increments therefore reproduces the batch ``transition_matrix``
    counts exactly — the stream==batch property the gate hashes.

    Assumes per-key time-ordered arrival ACROSS batches (each user's
    later events in later-or-equal batches) — true of the engine's
    file-replay source and any per-key-ordered ingest (Kafka key
    partitioning); within a batch, order is reconstructed by the
    sort.  Input columns: ``user_id``, ``ts``, ``event_type``,
    ``event_id``.  Output (update mode): per-batch ``(from_state,
    to_state, n)`` increments.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "from_state string, to_state string, n long"
    state_schema = "last_ts_us long, last_id long, last_state string"

    def update(key, pdf_iter, state: GroupState):
        batches = [p for p in pdf_iter if len(p)]
        if not batches:
            return
        rows = pd.concat(batches).sort_values(["ts", "event_id"])
        seq = rows["event_type"].tolist()
        if state.exists:
            seq = [state.get[2]] + seq
        counts: dict[tuple[str, str], int] = {}
        for a, b in zip(seq, seq[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + 1
        last = rows.iloc[-1]
        state.update(
            (
                int(last["ts"].value) // 1000,
                int(last["event_id"]),
                str(last["event_type"]),
            )
        )
        if counts:
            yield pd.DataFrame(
                [
                    {"from_state": a, "to_state": b, "n": n}
                    for (a, b), n in counts.items()
                ]
            )

    return (
        df.select("user_id", "ts", "event_type", "event_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            out_schema,
            state_schema,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
