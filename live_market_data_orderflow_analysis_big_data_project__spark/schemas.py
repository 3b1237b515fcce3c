"""Schemas: the reference's Upstox tick feed (verbatim semantics) and the
derived candle schema.

Tick schema mirrors reference data_processor.py:20-63 — a 5-level nested
struct with a MapType feed keyed by instrument id and an array-of-struct
order-book ladder.  Quantities arrive stringly-typed (ltq/ltt are strings,
reference data_processor.py:30-31) and are cast downstream.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# --- raw tick (Upstox "full" feed) --------------------------------------
LTPC = StructType(
    [
        StructField("ltp", DoubleType()),   # last traded price
        StructField("ltt", StringType()),   # last trade time, epoch-millis *string*
        StructField("ltq", StringType()),   # last traded qty, *string*
        StructField("cp", DoubleType()),    # close price
    ]
)

BID_ASK_QUOTE = StructType(
    [
        StructField("bidQ", StringType()),
        StructField("bidP", DoubleType()),
        StructField("askQ", StringType()),
        StructField("askP", DoubleType()),
    ]
)

OHLC_ENTRY = StructType(
    [
        StructField("interval", StringType()),
        StructField("open", DoubleType()),
        StructField("high", DoubleType()),
        StructField("low", DoubleType()),
        StructField("close", DoubleType()),
        StructField("vol", StringType()),
        StructField("ts", StringType()),
    ]
)

MARKET_FF = StructType(
    [
        StructField("ltpc", LTPC),
        StructField(
            "marketLevel",
            StructType([StructField("bidAskQuote", ArrayType(BID_ASK_QUOTE))]),
        ),
        StructField("optionGreeks", StructType([])),  # empty struct, kept for parity
        StructField("marketOHLC", StructType([StructField("ohlc", ArrayType(OHLC_ENTRY))])),
        StructField("atp", DoubleType()),
        StructField("vtt", StringType()),
        StructField("tbq", DoubleType()),  # total buy quote qty
        StructField("tsq", DoubleType()),  # total sell quote qty
    ]
)

FULL_FEED = StructType(
    [
        StructField(
            "fullFeed",
            StructType(
                [
                    StructField("requestMode", StringType()),
                    StructField("marketFF", MARKET_FF),
                ]
            ),
        )
    ]
)

TICK_SCHEMA = StructType(
    [
        StructField("type", StringType()),
        StructField("currentTs", StringType()),
        StructField("feeds", MapType(StringType(), FULL_FEED)),
    ]
)

# --- flattened tick (post-parse working schema) ---------------------------
FLAT_TICK_SCHEMA = StructType(
    [
        StructField("instrument", StringType()),
        StructField("event_time", TimestampType()),
        StructField("ltp", DoubleType()),
        StructField("ltq", LongType()),
        StructField("best_bid", DoubleType()),
        StructField("best_ask", DoubleType()),
        StructField("tbq", DoubleType()),
        StructField("tsq", DoubleType()),
    ]
)

# --- candle (aggregate output; reference candle_to_hdfs.py:11-25) --------
CANDLE_SCHEMA = StructType(
    [
        StructField("window_start", TimestampType()),
        StructField("window_end", TimestampType()),
        StructField("instrument", StringType()),
        StructField("open", DoubleType()),
        StructField("high", DoubleType()),
        StructField("low", DoubleType()),
        StructField("close", DoubleType()),
        StructField("buy_volume", LongType()),
        StructField("sell_volume", LongType()),
        StructField("total_volume", LongType()),
        StructField("delta", LongType()),
        StructField("tbq", DoubleType()),
        StructField("tsq", DoubleType()),
    ]
)
