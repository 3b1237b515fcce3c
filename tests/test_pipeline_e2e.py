"""End-to-end reference-topology test: the whole data_processor.py job
(reference data_processor.py:65-183) as ONE streaming query on this
engine — wire-format JSON tick messages (Kafka stand-in: file text
source), schema-directed parse, order-book best bid/ask, aggressor
classification, watermarked 1-minute OHLC candles, memory sink — with
hand-computed expected candles."""

from __future__ import annotations

import os
import tempfile

from test_ticks import tick_json

from live_market_data_orderflow_analysis_big_data_project__spark.operators.candles import (
    ohlc_candles,
)
from live_market_data_orderflow_analysis_big_data_project__spark.operators.ticks import (
    best_bid_ask,
    classify_aggressor,
    parse_ticks,
)
from live_market_data_orderflow_analysis_big_data_project__spark.streaming.core import (
    run_to_memory,
)

BASE_MS = 1_700_000_040_000  # minute-aligned epoch millis


def _msg(offset_s: float, ltp: float, ltq: str) -> str:
    return tick_json(ltp=ltp, ltq=ltq, ltt=str(BASE_MS + int(offset_s * 1000)))


def test_full_pipeline_streaming(spark):
    # quotes fixed at bid 99.0 / ask 101.0 (tick_json default):
    # side = buy iff |ltp-101| <= |ltp-99|.
    messages = [
        _msg(1, 100.0, "5"),    # min 0: buy  (tie -> buy)
        _msg(30, 99.2, "4"),    # min 0: sell (1.8 > 0.2)
        _msg(50, 102.0, "2"),   # min 0: buy
        _msg(70, 103.0, "3"),   # min 1: buy
        _msg(600, 100.0, "1"),  # min 10 sentinel: advances watermark
    ]
    src = tempfile.mkdtemp(prefix="e2e_ticks_")
    with open(os.path.join(src, "ticks.jsonl"), "w") as fh:
        fh.write("\n".join(messages))

    raw = spark.readStream.text(src)  # Kafka stand-in: one message per row
    ticks = classify_aggressor(best_bid_ask(parse_ticks(raw)))
    candles = ohlc_candles(
        ticks, window="1 minute", watermark="5 minutes", extra_last=("tbq", "tsq")
    )
    out = {r["window_start"].second * 0 + r["window_start"].minute: r
           for r in run_to_memory(candles, "e2e_candles").collect()}

    # minute-0 candle (window closed by the sentinel's watermark)
    m0 = out[14]  # BASE_MS minute-of-hour is 14 (1_700_000_040 s)
    assert m0["open"] == 100.0 and m0["close"] == 102.0
    assert m0["high"] == 102.0 and m0["low"] == 99.2
    assert m0["buy_volume"] == 7 and m0["sell_volume"] == 4
    assert m0["total_volume"] == 11 and m0["delta"] == 3
    assert m0["tbq"] == 10.0 and m0["tsq"] == 20.0  # carried max_by(ts)

    # minute-1 candle
    m1 = out[15]
    assert m1["open"] == m1["close"] == 103.0
    assert m1["buy_volume"] == 3 and m1["sell_volume"] == 0

    # the sentinel's own window (minute 10) is inside the watermark delay
    # and correctly withheld in append mode
    assert 24 not in out and len(out) == 2


def test_candle_json_serialization_roundtrip(spark):
    """O22/O23 parity: candles pack into the Kafka wire shape
    (key + to_json(struct(*))) and from_json inverts it losslessly —
    the exact producer/consumer pair the reference runs between
    data_processor.py:175 and candle_to_hdfs.py:46."""
    import datetime as dt

    from pyspark.sql import functions as F

    from live_market_data_orderflow_analysis_big_data_project__spark.schemas import (
        CANDLE_SCHEMA,
    )
    from live_market_data_orderflow_analysis_big_data_project__spark.streaming.core import (
        serialize_json,
    )

    candle = (
        dt.datetime(2024, 1, 1, 9, 15), dt.datetime(2024, 1, 1, 9, 16),
        "NSE_EQ|TEST", 100.0, 102.0, 99.2, 101.5, 7, 4, 11, 3, 10.0, 20.0,
    )
    df = spark.createDataFrame([candle], CANDLE_SCHEMA)
    wire = serialize_json(df, key_col="instrument")
    assert wire.columns == ["key", "value"]
    row = wire.first()
    assert row["key"] == "NSE_EQ|TEST"
    back = (
        spark.createDataFrame([(row["value"],)], "value string")
        .select(F.from_json("value", CANDLE_SCHEMA).alias("c"))
        .select("c.*")
        .first()
    )
    assert tuple(back) == candle
