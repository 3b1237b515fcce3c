"""OHLC candle aggregation — one builder for batch AND streaming.

Generalizes the reference's flagship aggregation
(reference data_processor.py:142-165): tumbling event-time window +
per-instrument grouped agg producing open/high/low/close, buy/sell volume,
total volume and order-flow delta.

Determinism fix (SURVEY.md section 4.1): the reference uses ``first``/
``last`` for open/close (data_processor.py:148,151), which are
shuffle-order-dependent.  We use ``min_by``/``max_by`` keyed on the event
time, which is deterministic and — unlike first/last — identical in batch
and streaming.

Scale note: the groupBy keys are (window, instrument), so state and shuffle
partition by instrument; at 100 TB (millions of instruments) this hash-
partitions evenly and AQE handles per-instrument skew.  No global sort is
ever introduced (the reference's streaming orderBy, candle_to_hdfs.py:53,
is unsupported by Spark and dropped; sort at read time instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ohlc_candles(
    df: DataFrame,
    ts_col: str = "event_time",
    key_col: str = "instrument",
    price_col: str = "ltp",
    qty_col: str = "ltq",
    window: str = "1 minute",
    watermark: str | None = None,
    extra_last: tuple[str, ...] = (),
) -> DataFrame:
    """Aggregate ticks into per-(window, key) OHLC candles.

    If ``watermark`` is given and ``df`` is streaming, applies
    ``withWatermark`` first (reference data_processor.py:142 uses 5
    minutes).  ``extra_last`` columns are carried through as
    max_by(col, ts) (the reference carries tbq/tsq via last(),
    data_processor.py:156-157).
    """
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    ts = F.col(ts_col)
    price = F.col(price_col)
    aggs = [
        F.min_by(price, ts).alias("open"),
        F.max(price).alias("high"),
        F.min(price).alias("low"),
        F.max_by(price, ts).alias("close"),
        F.sum(F.when(F.col("side") == "buy", F.col(qty_col)).otherwise(0))
        .cast("long")
        .alias("buy_volume"),
        F.sum(F.when(F.col("side") == "sell", F.col(qty_col)).otherwise(0))
        .cast("long")
        .alias("sell_volume"),
        F.sum(F.col(qty_col)).cast("long").alias("total_volume"),
    ]
    aggs.extend(F.max_by(F.col(c), ts).alias(c) for c in extra_last)
    out = (
        df.groupBy(F.window(ts, window).alias("w"), F.col(key_col).alias("instrument"))
        .agg(*aggs)
        .withColumn("delta", F.col("buy_volume") - F.col("sell_volume"))
    )
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "instrument",
        "open",
        "high",
        "low",
        "close",
        "buy_volume",
        "sell_volume",
        "total_volume",
        "delta",
        *extra_last,
    )


def rollup_ohlc(
    candles: DataFrame,
    ts_col: str = "window_start",
    key_col: str = "instrument",
    window: str = "1 hour",
    sum_cols: tuple[str, ...] = ("buy_volume", "sell_volume", "total_volume"),
) -> DataFrame:
    """Roll fine candles up to a coarser resolution WITHOUT rescanning raw
    ticks — the continuous-aggregate / hypertable-rollup pattern.

    OHLC composes associatively: the hour's open is the open of its
    earliest minute (min_by keyed on the sub-window start, which is unique
    per group — fully deterministic), high/low are max/min, volumes sum.
    At 100 TB this is the point: 1-min candles are ~3 orders of magnitude
    smaller than ticks, so daily/hourly resolutions cost a scan of candles,
    not ticks, and each level partitions by the same (window, key) scheme.
    q48's oracle asserts the associativity: rolled-up == computed-direct.
    """
    ts = F.col(ts_col)
    aggs = [
        F.min_by("open", ts).alias("open"),
        F.max("high").alias("high"),
        F.min("low").alias("low"),
        F.max_by("close", ts).alias("close"),
    ]
    aggs += [F.sum(c).cast("long").alias(c) for c in sum_cols]
    out = candles.groupBy(F.window(ts, window).alias("w"), F.col(key_col)).agg(
        *aggs
    )
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        key_col,
        "open",
        "high",
        "low",
        "close",
        *sum_cols,
    )
