"""OHLC candle invariants (FIXTURES.md candle invariants + SURVEY.md 5.2.4)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from live_market_data_orderflow_analysis_big_data_project__spark.operators.candles import (
    ohlc_candles,
)

try:
    from hypothesis import given, settings, strategies as st

    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False


def tick_frame(spark, ticks):
    """ticks: list of (offset_seconds, instrument, price, qty, side)."""
    base = datetime(2024, 1, 1, 9, 15, 0)
    rows = [
        (base + timedelta(seconds=o), i, float(p), int(q), s)
        for (o, i, p, q, s) in ticks
    ]
    return spark.createDataFrame(
        rows, "event_time timestamp, instrument string, ltp double, ltq long, side string"
    )


def test_single_candle_values(spark):
    df = tick_frame(
        spark,
        [
            (1, "A", 100.0, 5, "buy"),
            (10, "A", 103.0, 2, "sell"),
            (30, "A", 99.0, 1, "buy"),
            (59, "A", 101.0, 4, "sell"),
        ],
    )
    c = ohlc_candles(df).collect()
    assert len(c) == 1
    r = c[0]
    assert r.open == 100.0 and r.close == 101.0
    assert r.high == 103.0 and r.low == 99.0
    assert r.buy_volume == 6 and r.sell_volume == 6
    assert r.total_volume == 12 and r.delta == 0
    assert (r.window_end - r.window_start) == timedelta(minutes=1)


def test_open_close_deterministic_not_row_order(spark):
    # same ticks, reversed row order -> identical open/close (min_by/max_by
    # on event_time; the reference's first/last is row-order dependent,
    # data_processor.py:148,151)
    ticks = [(1, "A", 10.0, 1, "buy"), (50, "A", 20.0, 1, "buy")]
    a = ohlc_candles(tick_frame(spark, ticks)).collect()[0]
    b = ohlc_candles(tick_frame(spark, list(reversed(ticks)))).collect()[0]
    assert (a.open, a.close) == (10.0, 20.0) == (b.open, b.close)


def test_multiple_windows_and_instruments(spark):
    df = tick_frame(
        spark,
        [
            (1, "A", 1.0, 1, "buy"),
            (61, "A", 2.0, 1, "buy"),
            (1, "B", 3.0, 1, "sell"),
        ],
    )
    c = ohlc_candles(df)
    assert c.count() == 3
    rows = {(r.instrument, r.window_start.minute): r for r in c.collect()}
    assert rows[("A", 15)].open == 1.0 and rows[("A", 16)].open == 2.0


if HAVE_HYP:

    @settings(max_examples=15, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(0, 59),
                st.floats(1.0, 1000.0, allow_nan=False),
                st.integers(1, 100),
                st.sampled_from(["buy", "sell"]),
            ),
            min_size=1,
            max_size=30,
        )
    )
    def test_candle_invariants(spark, ticks):
        df = tick_frame(spark, [(o, "X", p, q, s) for (o, p, q, s) in ticks])
        r = ohlc_candles(df).collect()[0]
        assert r.low <= min(r.open, r.close)
        assert r.high >= max(r.open, r.close)
        assert r.total_volume == r.buy_volume + r.sell_volume
        assert r.delta == r.buy_volume - r.sell_volume


def test_rollup_ohlc_composes(spark):
    from live_market_data_orderflow_analysis_big_data_project__spark.operators.candles import (
        rollup_ohlc,
    )

    rows = [
        # (window_start, instrument, open, high, low, close, vol)
        ("2024-01-01 09:00:00", "A", 10.0, 12.0, 9.0, 11.0, 5),
        ("2024-01-01 09:30:00", "A", 11.0, 15.0, 11.0, 14.0, 3),
        ("2024-01-01 10:15:00", "A", 14.0, 14.0, 13.0, 13.5, 2),
        ("2024-01-01 09:10:00", "B", 100.0, 101.0, 99.0, 100.5, 7),
    ]
    candles = spark.createDataFrame(
        rows,
        "window_start string, instrument string, open double, high double,"
        " low double, close double, total_volume long",
    ).withColumn("window_start", F.col("window_start").cast("timestamp"))
    out = rollup_ohlc(
        candles, window="1 hour", sum_cols=("total_volume",)
    ).collect()
    got = {
        (str(r["window_start"]), r["instrument"]): (
            r["open"], r["high"], r["low"], r["close"], r["total_volume"]
        )
        for r in out
    }
    assert got == {
        # hour 09: open of earliest minute, high/low across, close of latest
        ("2024-01-01 09:00:00", "A"): (10.0, 15.0, 9.0, 14.0, 8),
        ("2024-01-01 10:00:00", "A"): (14.0, 14.0, 13.0, 13.5, 2),
        ("2024-01-01 09:00:00", "B"): (100.0, 101.0, 99.0, 100.5, 7),
    }


if HAVE_HYP:

    @settings(max_examples=10, deadline=None)
    @given(
        st.dictionaries(
            st.integers(0, 3 * 3600 - 1),  # unique second offsets, ~3 hours
            st.tuples(
                st.floats(1.0, 1000.0, allow_nan=False),
                st.integers(1, 100),
                st.sampled_from(["buy", "sell"]),
            ),
            min_size=1,
            max_size=60,
        )
    )
    def test_rollup_equals_direct(spark, tick_map):
        """Rollup associativity: minute candles rolled to hourly must equal
        hourly candles computed directly from the ticks (the q48 oracle
        property, here over arbitrary generated ticks)."""
        from live_market_data_orderflow_analysis_big_data_project__spark.operators.candles import (
            rollup_ohlc,
        )

        ticks = [(o, "X", p, q, s) for o, (p, q, s) in tick_map.items()]
        df = tick_frame(spark, ticks)
        direct = ohlc_candles(df, window="1 hour")
        rolled = rollup_ohlc(
            ohlc_candles(df, window="1 minute"),
            sum_cols=("buy_volume", "sell_volume", "total_volume"),
        ).withColumn("delta", F.col("buy_volume") - F.col("sell_volume"))
        cols = [
            "window_start", "instrument", "open", "high", "low", "close",
            "buy_volume", "sell_volume", "total_volume", "delta",
        ]
        d = sorted(tuple(r[c] for c in cols) for r in direct.select(cols).collect())
        g = sorted(tuple(r[c] for c in cols) for r in rolled.select(cols).collect())
        assert d == g
