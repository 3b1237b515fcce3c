"""Tick parse/classify unit tests, including the reference's edge cases
(FIXTURES.md Part B): empty bidAskQuote ladder, null ltq/ltp/ltt, aggressor
tie -> buy."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from live_market_data_orderflow_analysis_big_data_project__spark.operators.ticks import (
    best_bid_ask,
    classify_aggressor,
    parse_ticks,
)


def tick_json(instrument="NSE_EQ|TEST", ltp=100.0, ltq="5", ltt="1700000000500",
              quotes=None, tbq=10.0, tsq=20.0):
    quotes = quotes if quotes is not None else [
        {"bidQ": "10", "bidP": 99.0, "askQ": "12", "askP": 101.0},
        {"bidQ": "11", "bidP": 98.5, "askQ": "13", "askP": 101.5},
    ]
    return json.dumps(
        {
            "type": "live_feed",
            "currentTs": "1700000000600",
            "feeds": {
                instrument: {
                    "fullFeed": {
                        "requestMode": "full_d30",
                        "marketFF": {
                            "ltpc": {"ltp": ltp, "ltt": ltt, "ltq": ltq, "cp": 95.0},
                            "marketLevel": {"bidAskQuote": quotes},
                            "optionGreeks": {},
                            "marketOHLC": {"ohlc": []},
                            "atp": 99.9,
                            "vtt": "1000",
                            "tbq": tbq,
                            "tsq": tsq,
                        },
                    }
                }
            },
        }
    )


def _parse(spark, payloads):
    raw = spark.createDataFrame([(p,) for p in payloads], ["value"])
    return parse_ticks(raw)


def test_parse_happy_path(spark):
    rows = _parse(spark, [tick_json()]).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.instrument == "NSE_EQ|TEST"
    assert r.ltp == 100.0 and r.ltq == 5
    # epoch-millis string 1700000000500 -> sub-second precision preserved
    assert r.event_time.microsecond == 500000
    assert r.tbq == 10.0 and r.tsq == 20.0


def test_parse_null_guards(spark):
    payloads = [
        tick_json(ltq=None),  # null qty -> filtered (data_processor.py:115)
        tick_json(ltt=None),
        tick_json(),
    ]
    assert _parse(spark, payloads).count() == 1


def test_best_bid_ask_and_classification(spark):
    df = best_bid_ask(_parse(spark, [tick_json(ltp=100.9)]))
    r = classify_aggressor(df).collect()[0]
    assert r.best_bid == 99.0 and r.best_ask == 101.0
    # closer to ask -> buy
    assert r.side == "buy" and r.buy_volume == 5 and r.sell_volume == 0
    assert r.delta == 5


def test_classification_tie_goes_to_buy(spark):
    # ltp exactly mid: |ltp-ask| == |ltp-bid| -> buy (data_processor.py:136)
    df = best_bid_ask(_parse(spark, [tick_json(ltp=100.0)]))
    r = classify_aggressor(df).collect()[0]
    assert r.side == "buy"


def test_empty_ladder_yields_null_side_not_sentinel_buy(spark):
    # Reference defect: empty ladder -> +/-1.797e308 sentinels -> always buy
    # (data_processor.py:128-134).  Engine: NULL side, zero volumes.
    df = best_bid_ask(_parse(spark, [tick_json(quotes=[])]))
    r = classify_aggressor(df).collect()[0]
    assert r.best_bid is None and r.best_ask is None
    assert r.side is None
    assert r.buy_volume == 0 and r.sell_volume == 0 and r.delta == 0


def test_sell_classification(spark):
    df = best_bid_ask(_parse(spark, [tick_json(ltp=99.1)]))
    r = classify_aggressor(df).collect()[0]
    assert r.side == "sell" and r.sell_volume == 5 and r.buy_volume == 0


def test_parse_quarantine_reasons(spark):
    from live_market_data_orderflow_analysis_big_data_project__spark.operators.ticks import (
        parse_ticks,
        parse_ticks_with_quarantine,
    )

    good_json = (
        '{"feeds": {"NSE_EQ|X": {"fullFeed": {"marketFF": {"ltpc": '
        '{"ltp": 101.5, "ltt": "1700000000000", "ltq": "7"}}}}}}'
    )
    missing_json = (
        '{"feeds": {"NSE_EQ|Y": {"fullFeed": {"marketFF": {"ltpc": '
        '{"ltp": 99.0}}}}}}'
    )
    raw = spark.createDataFrame(
        [
            (good_json,),
            ("{not valid json",),
            ('{"feeds": {}}',),
            (missing_json,),
            (None,),  # Kafka tombstone: NULL payload must not vanish
        ],
        "value string",
    )
    ticks, dead = parse_ticks_with_quarantine(raw)
    t = ticks.collect()
    assert len(t) == 1 and t[0]["instrument"] == "NSE_EQ|X"
    assert t[0]["ltq"] == 7 and t[0]["ltp"] == 101.5
    reasons = sorted(r["reason"] for r in dead.collect())
    assert reasons == [
        "malformed_json", "missing_fields", "no_feeds", "null_payload",
    ]
    # the dead-letter payload is verbatim, so the queue is replayable
    assert {r["json_str"] for r in dead.collect()} == {
        "{not valid json", '{"feeds": {}}', missing_json, None,
    }
    # good path agrees with the plain parser
    assert [tuple(r) for r in ticks.collect()] == [
        tuple(r) for r in parse_ticks(raw).collect()
    ]


def test_parse_quarantine_streaming(spark):
    import tempfile

    from live_market_data_orderflow_analysis_big_data_project__spark.operators.ticks import (
        parse_ticks_with_quarantine,
    )
    from live_market_data_orderflow_analysis_big_data_project__spark.streaming.core import (
        run_to_memory,
    )

    tmp = tempfile.mkdtemp(prefix="quarantine_")
    spark.createDataFrame(
        [("{broken",), ('{"feeds": {}}',)], "value string"
    ).write.mode("overwrite").parquet(tmp)
    sraw = spark.readStream.schema("value string").parquet(tmp)
    _ticks, dead = parse_ticks_with_quarantine(sraw)
    out = run_to_memory(dead, "t_quarantine")
    assert sorted(r["reason"] for r in out.collect()) == [
        "malformed_json", "no_feeds",
    ]
