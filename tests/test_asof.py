"""Unit tests for operators/asof.py (both strategies).

Covers the round-1 advisories: duplicate left rows must survive the
broadcast strategy's re-aggregation, and right_cols colliding with left
column names must be rejected up front.
"""

from __future__ import annotations

import datetime as dt

import pytest

from live_market_data_orderflow_analysis_big_data_project__spark.operators.asof import (
    asof_join,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, "A", _ts("2024-01-01 00:05:00"), 10.0),
            (2, "A", _ts("2024-01-01 00:10:00"), 11.0),
            (3, "A", _ts("2024-01-01 00:10:00"), 11.0),  # duplicate tick
            (4, "B", _ts("2024-01-01 00:01:00"), 20.0),  # before any right row
            (5, "C", _ts("2024-01-01 00:30:00"), 30.0),  # key with no right rows
        ],
        "event_id long, k string, ts timestamp, v double",
    )
    right = spark.createDataFrame(
        [
            ("A", _ts("2024-01-01 00:04:00"), 100.0),
            ("A", _ts("2024-01-01 00:10:00"), 200.0),  # exactly at left ts
            ("B", _ts("2024-01-01 00:02:00"), 300.0),
        ],
        "k string, rts timestamp, quote double",
    )
    return left, right


EXPECTED = {
    1: 100.0,  # latest right at/before 00:05 is 00:04
    2: 200.0,  # right row AT the left timestamp matches (<= semantics)
    3: 200.0,  # duplicate left row keeps its own output row
    4: None,  # no right row yet
    5: None,  # key never seen on the right
}


@pytest.mark.parametrize("strategy", ["union", "broadcast"])
def test_asof_semantics(frames, strategy):
    left, right = frames
    out = asof_join(
        left, right, on="k", left_ts="ts", right_ts="rts", strategy=strategy
    )
    rows = out.collect()
    assert len(rows) == 5, "every left row (including duplicates) must survive"
    assert {r["event_id"]: r["quote"] for r in rows} == EXPECTED


@pytest.mark.parametrize("strategy", ["union", "broadcast"])
def test_asof_tolerance(frames, strategy):
    left, right = frames
    out = asof_join(
        left,
        right,
        on="k",
        left_ts="ts",
        right_ts="rts",
        strategy=strategy,
        tolerance="2 minutes",
    )
    got = {r["event_id"]: r["quote"] for r in out.collect()}
    # event 1 at 00:05: latest right 00:04 is within 2 min -> kept;
    # event 4 at 00:01: no prior right row -> null either way.
    assert got[1] == 100.0
    assert got[2] == 200.0
    assert got[4] is None


FORWARD_EXPECTED = {
    1: 200.0,  # earliest right at/after 00:05 is 00:10
    2: 200.0,  # right row AT the left timestamp matches (>= semantics)
    3: 200.0,
    4: 300.0,  # 00:01 -> next right at 00:02
    5: None,   # key C never seen on the right
}


@pytest.mark.parametrize("strategy", ["union", "broadcast"])
def test_asof_forward_direction(frames, strategy):
    left, right = frames
    out = asof_join(
        left, right, on="k", left_ts="ts", right_ts="rts",
        strategy=strategy, direction="forward",
    )
    assert {r["event_id"]: r["quote"] for r in out.collect()} == FORWARD_EXPECTED


@pytest.mark.parametrize("strategy", ["union", "broadcast"])
def test_asof_forward_tolerance(frames, strategy):
    left, right = frames
    out = asof_join(
        left, right, on="k", left_ts="ts", right_ts="rts",
        strategy=strategy, direction="forward", tolerance="2 minutes",
    )
    got = {r["event_id"]: r["quote"] for r in out.collect()}
    # event 1 at 00:05: next right is 00:10, farther than 2 min -> null
    assert got[1] is None
    assert got[2] == 200.0  # exact-timestamp match always inside tolerance
    assert got[4] == 300.0  # 00:01 -> 00:02 is 1 min away


def test_asof_rejects_bad_args(frames):
    left, right = frames
    with pytest.raises(ValueError, match="strategy"):
        asof_join(left, right, on="k", left_ts="ts", right_ts="rts",
                  strategy="broadcst")
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, on="k", left_ts="ts", right_ts="rts",
                  direction="nearest")


def test_asof_rejects_column_collision(frames):
    left, right = frames
    clashing = right.withColumnRenamed("quote", "v")  # collides with left.v
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, clashing, on="k", left_ts="ts", right_ts="rts")


def test_asof_duplicate_left_rows_broadcast(frames):
    """Round-1 bug: broadcast strategy collapsed identical left rows."""
    left, right = frames
    doubled = left.unionByName(left)  # every left row twice
    out = asof_join(
        doubled, right, on="k", left_ts="ts", right_ts="rts", strategy="broadcast"
    )
    assert out.count() == 10


try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False


if HAVE_HYP:

    @settings(
        max_examples=15,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        lefts=st.lists(
            st.tuples(
                st.sampled_from(["A", "B", "C"]),
                st.integers(min_value=0, max_value=120),
            ),
            min_size=1,
            max_size=12,
        ),
        rights=st.lists(
            st.tuples(
                st.sampled_from(["A", "B"]),
                st.integers(min_value=0, max_value=120),
            ),
            max_size=8,
            unique_by=lambda t: t,  # unique (key, ts) -> deterministic match
        ),
    )
    def test_asof_strategies_equivalent(spark, lefts, rights):
        """The union+window and broadcast strategies must agree on any
        input where the right side is unique per (key, ts)."""
        left = spark.createDataFrame(
            [
                (i, k, _ts(f"2024-01-01 00:{m:02d}:00"))
                for i, (k, m) in enumerate((k, m % 60) for k, m in lefts)
            ],
            "event_id long, k string, ts timestamp",
        )
        # dedupe per (key, minute-of-hour) AFTER the modulo so the right
        # side is genuinely unique per (k, rts) — a deterministic match
        uniq = {(k, m % 60): float(m) for k, m in rights}
        right = spark.createDataFrame(
            [
                (k, _ts(f"2024-01-01 00:{mm:02d}:30"), q)
                for (k, mm), q in sorted(uniq.items())
            ],
            "k string, rts timestamp, quote double",
        ) if uniq else spark.createDataFrame(
            [], "k string, rts timestamp, quote double"
        )
        a = asof_join(left, right, on="k", left_ts="ts", right_ts="rts",
                      strategy="union")
        b = asof_join(left, right, on="k", left_ts="ts", right_ts="rts",
                      strategy="broadcast")
        ra = sorted(map(tuple, a.collect()))
        rb = sorted(map(tuple, b.collect()))
        assert ra == rb
