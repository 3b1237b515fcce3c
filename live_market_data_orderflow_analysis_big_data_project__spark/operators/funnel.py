"""Sequential-pattern funnel (MATCH_RECOGNIZE class) over event logs.

Stage semantics: a user reaches stage i+1 at the EARLIEST event of that
stage's type strictly AFTER their stage-i timestamp (cascaded mins).
Two physically different formulations compute the identical result —
``bounded=`` selects between them (documented in docs/TUNING.md):

- ``bounded=True`` — ONE shuffle: per-user events collected sorted,
  then a pure-expression ``aggregate`` fold cascades the stage
  timestamps.  O(1) fold state, no joins, no Python — but executor
  memory per user is that user's full event list, so it assumes
  bounded-entity histories (the usual funnel case).
- ``bounded=False`` — the cascade-join twin: one keyed min-aggregate
  per stage, each joined back into the next stage's scan.  More
  shuffles (one per stage) but O(1) memory per user — the scale-safe
  path for unbounded histories (bots, firehose entities).  The
  per-stage survivor frames shrink monotonically, so the stage joins
  are broadcastable as the funnel narrows.

Equivalence: with events sorted ascending, "first qualifying event in
order" IS "min ts among qualifying events", and the strict ``>`` makes
both sides tie-insensitive — property-pinned in tests/test_funnel.py
and hash-gated by q77 (fold) and q77b (cascade) against the SAME
cascaded-min oracle SQL.

(Reference parity: the class of ordered-sequence analytics its
consumer scripts approximate with per-batch pandas passes; neither
formulation exists there — SURVEY.md §2.4.)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["funnel_stages", "funnel_state_stream"]


def _fold_expr(
    stages: Sequence[str],
    ts_col: str,
    type_col: str,
    max_gap_s: int | None = None,
) -> str:
    """n-stage cascade as one ``aggregate`` fold over sorted events."""
    n = len(stages)
    init = ", ".join(f"CAST(NULL AS TIMESTAMP) AS t{i}" for i in
                     range(1, n + 1))
    fields = []
    for i, s in enumerate(stages, start=1):
        lit = s.replace("'", "''")
        if i == 1:
            cond = f"acc.t1 IS NULL AND e.{type_col} = '{lit}'"
        else:
            cond = (
                f"acc.t{i - 1} IS NOT NULL AND acc.t{i} IS NULL "
                f"AND e.{type_col} = '{lit}' AND e.{ts_col} > acc.t{i - 1}"
            )
            if max_gap_s is not None:
                cond += (
                    f" AND e.{ts_col} <= acc.t{i - 1} + "
                    f"INTERVAL '{int(max_gap_s)}' SECOND"
                )
        fields.append(f"CASE WHEN {cond} THEN e.{ts_col} "
                      f"ELSE acc.t{i} END AS t{i}")
    return (
        f"aggregate(evs, struct({init}), "
        f"(acc, e) -> struct({', '.join(fields)}))"
    )


def funnel_stages(
    events: DataFrame,
    stages: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    bounded: bool = True,
    max_gap_s: int | None = None,
) -> DataFrame:
    """Per-user funnel timestamps: one row per user having ANY stage
    event, columns ``t1 .. tn`` (NULL from the first unreached stage
    on).  ``bounded`` picks the fold vs cascade-join formulation — same
    result, different scale envelope (module docstring).

    ``max_gap_s``: conversion-window constraint (the MATCH_RECOGNIZE
    ``WITHIN`` clause) — stage i+1 must land within ``max_gap_s``
    seconds of stage i's timestamp or it does not count (and later
    events of that stage are even further out, so the user stalls
    there).  ``None`` = unconstrained.  Both formulations honor it
    identically: the fold adds the bound to its CASE condition; the
    cascade adds it to the per-stage join filter."""
    if not stages:
        raise ValueError("stages must be non-empty")
    base = events.filter(F.col(type_col).isin(list(stages)))
    if bounded:
        per_user = base.groupBy(user_col).agg(
            F.sort_array(
                F.collect_list(F.struct(ts_col, type_col))
            ).alias("evs")
        )
        st = per_user.withColumn(
            "st", F.expr(_fold_expr(stages, ts_col, type_col, max_gap_s))
        )
        return st.select(
            user_col,
            *[F.col(f"st.t{i}").alias(f"t{i}")
              for i in range(1, len(stages) + 1)],
        )
    users = base.select(user_col).distinct()
    prev: DataFrame | None = None
    stage_frames: list[DataFrame] = []
    for i, s in enumerate(stages, start=1):
        ev = base.filter(F.col(type_col) == s)
        if prev is not None:
            ev = ev.join(prev, user_col).filter(
                F.col(ts_col) > F.col(f"t{i - 1}")
            )
            if max_gap_s is not None:
                ev = ev.filter(
                    F.col(ts_col)
                    <= F.expr(
                        f"t{i - 1} + INTERVAL '{int(max_gap_s)}' SECOND"
                    )
                )
        cur = ev.groupBy(user_col).agg(F.min(ts_col).alias(f"t{i}"))
        stage_frames.append(cur)
        prev = cur
    out = users
    for cur in stage_frames:
        out = out.join(cur, user_col, "left")
    return out


def funnel_state_stream(
    sdf: DataFrame,
    stages: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_gap_s: int | None = None,
) -> DataFrame:
    """Streaming funnel via ``applyInPandasWithState`` — the stateful
    twin of the ``bounded=True`` fold (the s16 pattern applied to the
    MATCH_RECOGNIZE class): per user the state is the cascade's
    partial ``(t1 .. tn)`` vector (constant size per key, NOT the
    event history), each micro-batch sorts its rows by
    ``(ts, event_type)`` — the fold's struct sort order — and
    continues the cascade from the stored state, emitting the user's
    CURRENT stage vector (update mode).

    Because the cascade is a single forward pass and stage timestamps
    only ever FILL (never change once set), the final emission per
    user equals the batch fold over the whole history exactly — given
    the engine's per-key time-ordered arrival across batches (the
    file-replay / keyed-ingest assumption documented on
    ``transition_increments``).  Selecting each user's most-advanced
    emission (max stage; ties are identical rows) therefore
    reproduces ``funnel_stages`` bit-for-bit — a stream==batch
    equality gate, no window-closure restriction.

    Output (update mode): ``user_col`` (the input column's own type —
    string keys work exactly like the batch fold's), ``t1_us .. tn_us``
    int64 microseconds (-1 = stage not reached; the sentinel stays
    internal — convert with ``timestamp_micros`` + a NULL guard
    downstream).
    """
    import pandas as pd  # noqa: F401  (worker-side dependency)
    from pyspark.sql.streaming.state import GroupStateTimeout

    n = len(stages)
    if n == 0:
        raise ValueError("stages must be non-empty")
    stage_list = list(stages)
    gap_us = None if max_gap_s is None else int(max_gap_s) * 1_000_000
    key_ddl = sdf.schema[user_col].dataType.simpleString()
    out_schema = f"{user_col} {key_ddl}, " + ", ".join(
        f"t{i}_us long" for i in range(1, n + 1)
    )
    out_cols = [user_col] + [f"t{i}_us" for i in range(1, n + 1)]
    state_schema = ", ".join(f"t{i}_us long" for i in range(1, n + 1))

    def update(key, pdf_iter, state):
        import pandas as pd

        batches = [p for p in pdf_iter if len(p)]
        if not batches:
            return
        t = list(state.get) if state.exists else [-1] * n
        rows = pd.concat(batches).sort_values([ts_col, type_col])
        for ts_val, etype in zip(rows[ts_col], rows[type_col]):
            ts_us = int(pd.Timestamp(ts_val).value) // 1000
            # evaluate every stage's CASE against the PRE-event state
            # (the fold's struct semantics), then apply
            hit = None
            for i in range(n):
                if t[i] != -1 or etype != stage_list[i]:
                    continue
                if i == 0:
                    hit = i
                    break
                if t[i - 1] == -1 or ts_us <= t[i - 1]:
                    continue
                if gap_us is not None and ts_us > t[i - 1] + gap_us:
                    continue
                hit = i
                break
            if hit is not None:
                t[hit] = ts_us
        state.update(tuple(t))
        yield pd.DataFrame([[key[0], *t]], columns=out_cols)

    filtered = sdf.filter(F.col(type_col).isin(stage_list)).select(
        user_col, ts_col, type_col
    )
    return filtered.groupBy(user_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
