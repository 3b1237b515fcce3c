"""streaming/core.py::asof_quote_enrich — streaming as-of enrichment.

The staged gate (s22) proves hash parity streaming-vs-SQL at three sfs;
these pin the semantics the gate's single-batch replay cannot reach:
cross-batch arrival disorder (quote arriving AFTER its trade), the
strictly-before rule and the (us, event_id) tie-break, the NULL bucket,
batch-count invariance, and the fixture-binding discipline.
"""

from __future__ import annotations

import datetime as dt
import os
import tempfile

from pyspark.sql import functions as F

from live_market_data_orderflow_analysis_big_data_project__spark.streaming.core import (  # noqa: E501
    asof_quote_enrich,
    run_to_memory,
    stream_events_dir,
)

from conftest import SF0001, SF001

SCHEMA = (
    "user_id long, event_id long, ts timestamp, "
    "event_type string, cents long"
)


def _t(h, m, s=0, us=0):
    return dt.datetime(2024, 1, 1, h, m, s, us)


def _write_batches(spark, parts):
    """One parquet file per batch with strictly increasing mtimes so
    the file source replays them as separate micro-batches in order
    (the file source orders by modification time)."""
    tmp = tempfile.mkdtemp(prefix="s22_t_")
    base = 1_700_000_000
    for i, part in enumerate(parts):
        before = set(os.listdir(tmp))
        spark.createDataFrame(part, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(tmp)
        for name in set(os.listdir(tmp)) - before:
            os.utime(
                os.path.join(tmp, name), (base + i * 100, base + i * 100)
            )
    return tmp


def _run(spark, path, watermark="0 seconds", max_files=None):
    sdf = stream_events_dir(
        spark, path, SCHEMA, max_files_per_trigger=max_files
    ).withWatermark("ts", watermark)
    out = run_to_memory(
        asof_quote_enrich(sdf, "view", "purchase"), "t_s22"
    )
    return {
        r.event_id: (r.quote_event_id, r.quote_cents, r.gap_us)
        for r in out.collect()
    }


def test_strictly_before_and_id_tiebreak_and_null_bucket(spark):
    rows = [
        (1, 10, _t(9, 0), "view", 100),
        (1, 11, _t(9, 0), "view", 101),   # same us as 10: higher id wins
        (1, 20, _t(9, 30), "purchase", 500),
        (1, 12, _t(9, 30), "view", 102),  # AT the trade us: excluded
        (2, 30, _t(10, 0), "purchase", 600),  # user 2 has no quotes
        (9, 99, _t(12, 0), "view", 1),    # advances the watermark
    ]
    got = _run(spark, _write_batches(spark, [rows]))
    # latest strictly-before quote with the event_id tie-break
    assert got[20] == (11, 101, 30 * 60 * 1_000_000)
    # unquoted trade surfaces with the NULL bucket, never drops
    assert got[30] == (None, None, None)
    assert set(got) == {20, 30}


def test_cross_batch_quote_after_trade(spark):
    """The arrival-order case the staging sketch budgeted for: the
    trade arrives in batch 1, its best quote only in batch 2 (event
    time BEFORE the trade, inside the watermark delay).  The trade is
    held in state until the watermark passes it, so the late-arriving
    quote must still win."""
    b1 = [(1, 20, _t(12, 10), "purchase", 500)]
    b2 = [(1, 10, _t(12, 0), "view", 100)]
    b3 = [(9, 99, _t(15, 0), "view", 1)]  # advances the watermark
    path = _write_batches(spark, [b1, b2, b3])
    got = _run(spark, path, watermark="30 minutes", max_files=1)
    assert got == {20: (10, 100, 10 * 60 * 1_000_000)}


def test_batch_count_invariance(spark):
    """Same rows, one trigger vs one file per trigger: identical
    output (exactly-once per trade, enrichment batching-independent
    when delivery respects the watermark)."""
    b1 = [
        (1, 10, _t(9, 0), "view", 100),
        (1, 20, _t(9, 30), "purchase", 500),
    ]
    b2 = [
        (1, 13, _t(9, 40), "view", 103),
        (1, 21, _t(9, 50), "purchase", 510),
        (2, 30, _t(9, 55), "purchase", 600),
    ]
    b3 = [(9, 99, _t(12, 0), "view", 1)]
    parts = [b1, b2, b3]
    one = _run(spark, _write_batches(spark, parts), max_files=None)
    per = _run(spark, _write_batches(spark, parts), max_files=1)
    assert one == per
    assert one == {
        20: (10, 100, 30 * 60 * 1_000_000),
        21: (13, 103, 10 * 60 * 1_000_000),
        30: (None, None, None),
    }


def test_last_ms_trade_emits(spark):
    """The timeout-edge regression pinned: a trade in the very last
    millisecond below the final watermark must still flush (timeout
    armed AT its ms, not ms+1 — Spark fires strictly-less-than)."""
    rows = [
        (1, 10, _t(9, 0), "view", 100),
        (1, 20, _t(9, 59, 59, 999_000), "purchase", 500),
        (1, 98, _t(10, 0), "view", 1),  # max ts, 1 ms later
    ]
    got = _run(spark, _write_batches(spark, [rows]))
    assert 20 in got


def test_gate_binding(spark):
    """Fixture binding at both gate sfs: the enriched AND the NULL
    buckets are both non-empty, so the gate exercises the quote
    lookup and the no-prior-quote surface simultaneously."""
    from live_market_data_orderflow_analysis_big_data_project__spark.queries.sblock import (  # noqa: E501
        s22_asof_enrich_stream,
    )

    for sf in (SF0001, SF001):
        out = s22_asof_enrich_stream(spark, sf)
        n_null = out.where(F.col("quote_event_id").isNull()).count()
        n_hit = out.where(F.col("quote_event_id").isNotNull()).count()
        assert n_null > 0 and n_hit > 0, (sf, n_null, n_hit)


# --- randomized batch-split property (hypothesis) ---------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_ROW = st.tuples(
    st.integers(min_value=1, max_value=3),          # user
    st.sampled_from(["view", "purchase"]),           # side
    st.integers(min_value=0, max_value=500),         # minute offset
    st.integers(min_value=1, max_value=999),         # cents
)


@given(
    rows=st.lists(_ROW, min_size=5, max_size=22),
    cuts=st.lists(
        st.integers(min_value=1, max_value=21),
        min_size=0,
        max_size=2,
        unique=True,
    ),
)
@settings(max_examples=5, deadline=None)
def test_property_replay_equals_python_asof_model(spark, rows, cuts):
    """Any event set, delivered as any ts-contiguous batch sequence
    (1-3 micro-batches), must drain to exactly the python as-of
    model: emitted = trades strictly below the final whole-ms
    watermark, each enriched with the latest strictly-before quote
    ((us, event_id) order), NULL bucket for unquoted trades —
    exactly-once, batching-invariant."""
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    tagged = [
        (u, eid + 1, base + dt.timedelta(minutes=m), side, cents)
        for eid, (u, side, m, cents) in enumerate(rows)
    ]
    ordered = sorted(tagged, key=lambda r: (r[2], r[1]))
    bounds = sorted({c for c in cuts if c < len(ordered)})
    parts, lo = [], 0
    for c in bounds:
        parts.append(ordered[lo:c])
        lo = c
    parts.append(ordered[lo:])
    parts = [p for p in parts if p]

    # python model: final watermark = floor(max_us/1000)*1000 over all
    # (epoch math is tz-free — naive .timestamp() would read host tz)
    epoch = dt.datetime(1970, 1, 1)
    us = {
        eid: int((ts - epoch).total_seconds() * 1_000_000)
        for _, eid, ts, _, _ in tagged
    }
    w_us = (max(us.values()) // 1000) * 1000
    by_user_quotes = {}
    for u, eid, ts, side, cents in tagged:
        if side == "view":
            by_user_quotes.setdefault(u, []).append((us[eid], eid, cents))
    want = {}
    for u, eid, ts, side, cents in tagged:
        if side != "purchase" or us[eid] >= w_us:
            continue
        prior = sorted(
            q for q in by_user_quotes.get(u, []) if q[0] < us[eid]
        )
        if prior:
            q_us, q_id, q_c = prior[-1]
            want[eid] = (q_id, q_c, us[eid] - q_us)
        else:
            want[eid] = (None, None, None)

    path = _write_batches(
        spark,
        [[(u, eid, ts, side, cents) for u, eid, ts, side, cents in p]
         for p in parts],
    )
    got = _run(spark, path, max_files=1)
    assert got == want
