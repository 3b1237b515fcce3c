"""Flagship query: the reference's order-flow candle pipeline, batch twin.

Treats the ``events`` fixture as a tick stream (SURVEY.md section 7.2 M0:
ts -> event_time, user_id -> instrument, value -> price), classifies each
event buy/sell with the reference's abs-distance aggressor rule
(reference data_processor.py:136-139), and aggregates 1-minute OHLC candles
with buy/sell volume and order-flow delta using deterministic
min_by/max_by open/close (fixing reference data_processor.py:148,151).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.candles import ohlc_candles
from .operators.ticks import aggressor_side
from .sources.tables import load_table


def events_as_ticks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events fixture -> flat tick frame (instrument/event_time/ltp/ltq/side)."""
    e = load_table(spark, sf_dir, "events")
    # Synthetic book: a fixed reference bid/ask band around the value scale,
    # standing in for best_bid/best_ask (events carry no ladder).
    ticks = e.select(
        F.col("user_id").cast("string").alias("instrument"),
        F.col("ts").alias("event_time"),
        F.col("value").alias("ltp"),
        F.lit(1).cast("long").alias("ltq"),
        F.lit(50.0).alias("best_bid"),
        F.lit(150.0).alias("best_ask"),
    )
    return ticks.withColumn(
        "side", aggressor_side(F.col("ltp"), F.col("best_bid"), F.col("best_ask"))
    )


def flagship_candles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ticks = events_as_ticks(spark, sf_dir)
    return ohlc_candles(
        ticks,
        ts_col="event_time",
        key_col="instrument",
        price_col="ltp",
        qty_col="ltq",
        window="1 minute",
    )
