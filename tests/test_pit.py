"""operators/pit.py — point-in-time enrichment (feature-store join).

The staged gate (s21) proves hash parity streaming-vs-SQL at two sfs;
these pin the dimension's grid totality, the PREV-day (never same-day)
attribute semantics, the tier boundaries, and the PIT join's
exactly-one-version match.
"""

from __future__ import annotations

import datetime as dt

from live_market_data_orderflow_analysis_big_data_project__spark.operators.pit import (  # noqa: E501
    daily_tier_dim,
    pit_join,
)


def _ev(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts timestamp")


def _t(day, h=12):
    return dt.datetime(2024, 1, day, h, 0, 0)


def test_dim_covers_full_entity_by_day_grid(spark):
    # user 1 active days 1 and 3; user 2 active day 2 only — the dim
    # must still hold EVERY (user, day) in the global [1, 3] span
    rows = [(1, _t(1)), (1, _t(3)), (2, _t(2))]
    dim = daily_tier_dim(_ev(spark, rows), "user_id", "ts").collect()
    got = {(r.user_id, r.valid_from.day) for r in dim}
    assert got == {(u, d) for u in (1, 2) for d in (1, 2, 3)}
    # intervals are exactly one day wide
    assert all(
        (r.valid_to - r.valid_from) == dt.timedelta(days=1) for r in dim
    )


def test_prev_cnt_is_previous_day_never_same_day(spark):
    # user 1: 3 events on day 1, 1 on day 2 -> day 2's version carries
    # prev_cnt=3; day 1's carries 0 (no day-0 in span)
    rows = [(1, _t(1, 9)), (1, _t(1, 10)), (1, _t(1, 11)), (1, _t(2))]
    dim = {
        r.valid_from.day: r
        for r in daily_tier_dim(
            _ev(spark, rows), "user_id", "ts"
        ).collect()
    }
    assert dim[1].prev_cnt == 0 and dim[1].tier == "idle"
    assert dim[2].prev_cnt == 3 and dim[2].tier == "active"


def test_tier_boundaries(spark):
    # counts 1, 2, 3, 5, 6 on day 1 for users 1..5 -> day-2 tiers
    rows = []
    for u, n in ((1, 1), (2, 2), (3, 3), (4, 5), (5, 6)):
        rows += [(u, _t(1, 1 + i)) for i in range(n)]
    rows.append((1, _t(2)))  # extend span to day 2
    dim = {
        (r.user_id, r.valid_from.day): r.tier
        for r in daily_tier_dim(
            _ev(spark, rows), "user_id", "ts"
        ).collect()
    }
    assert dim[(1, 2)] == "light"
    assert dim[(2, 2)] == "light"
    assert dim[(3, 2)] == "active"
    assert dim[(4, 2)] == "active"
    assert dim[(5, 2)] == "heavy"


def test_pit_join_matches_exactly_one_version_per_event(spark):
    rows = [(1, _t(1)), (1, _t(2, 0)), (1, _t(2, 23)), (2, _t(1))]
    ev = _ev(spark, rows)
    dim = daily_tier_dim(ev, "user_id", "ts")
    out = pit_join(ev, dim, "user_id", "ts")
    # inner join, total dim -> row count preserved exactly
    assert out.count() == len(rows)
    # midnight boundary: an event AT 00:00 of day 2 belongs to day 2
    # (valid_from inclusive, valid_to exclusive)
    hit = (
        out.where("ts = timestamp'2024-01-02 00:00:00'")
        .select("valid_from")
        .collect()
    )
    assert len(hit) == 1 and hit[0].valid_from.day == 2


def test_pit_enrich_stream_spans_micro_batches(spark):
    """s21's core property under PROGRESSIVE delivery: the
    stream-static PIT join is STATELESS, so enrichment is batch-count
    INVARIANT (all files in one trigger == one file per trigger) and
    equal to the batch join — an event arriving in a later
    micro-batch still hits exactly its own day's dimension version,
    never a newer one."""
    import tempfile

    from live_market_data_orderflow_analysis_big_data_project__spark.streaming.core import (  # noqa: E501
        run_to_memory,
        stream_events_dir,
    )

    schema = "event_id long, user_id long, ts timestamp"
    # user 1 active on days 1..3 (counts 2, 1, 1), user 2 on day 2 —
    # split so day boundaries cross micro-batch boundaries
    b1 = [(1, 1, _t(1, 9)), (2, 1, _t(1, 15))]
    b2 = [(3, 1, _t(2, 10)), (4, 2, _t(2, 11))]
    b3 = [(5, 1, _t(3, 12))]
    rows = b1 + b2 + b3
    tmp = tempfile.mkdtemp(prefix="s21_batches_")
    for part in (b1, b2, b3):
        spark.createDataFrame(part, schema).coalesce(1).write.mode(
            "append"
        ).parquet(tmp)

    batch = spark.createDataFrame(rows, schema)
    dim = daily_tier_dim(batch, "user_id", "ts").localCheckpoint(
        eager=True
    )
    want = {
        (r.event_id, r.valid_from.day, r.prev_cnt, r.tier)
        for r in pit_join(batch, dim, "user_id", "ts")
        .select("event_id", "valid_from", "prev_cnt", "tier")
        .collect()
    }
    assert len(want) == len(rows)
    # day-2 events must carry day-1 profiles (prev_cnt 2 for user 1,
    # 0/idle for user 2), day-3 events day-2 profiles
    assert (3, 2, 2, "light") in want
    assert (4, 2, 0, "idle") in want
    assert (5, 3, 1, "light") in want

    for max_files in (None, 1):
        sdf = stream_events_dir(
            spark, tmp, schema, max_files_per_trigger=max_files
        )
        out = run_to_memory(
            pit_join(sdf, dim, "user_id", "ts").select(
                "event_id",
                "valid_from",
                "prev_cnt",
                "tier",
            ),
            f"t_s21_{max_files}",
        )
        got = {
            (r.event_id, r.valid_from.day, r.prev_cnt, r.tier)
            for r in out.collect()
        }
        assert got == want, max_files
