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

__all__ = ["transition_matrix"]


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
