"""Tick parsing + aggressor-side classification.

Re-expresses the reference's streaming parse/classify path
(reference data_processor.py:81-140) as pure DataFrame -> DataFrame
functions built from built-in expressions only (no Python UDFs), so one
code path serves batch and Structured Streaming alike.

Fixes two reference defects (SURVEY.md section 4.1):

1. **Empty-ladder sentinel leakage** — the reference folds best bid/ask with
   +/-1.797e308 seeds (data_processor.py:128-134), so an empty
   ``bidAskQuote`` classifies every tick as a buy.  We use
   ``array_max``/``array_min`` (null on empty/null ladders) and classify
   such ticks as NULL-side with zero buy/sell volume.
2. **Stringly-typed casts** — ltq string->long, ltt epoch-millis
   string->timestamp via ``timestamp_millis`` (keeps sub-second precision;
   the reference's two paths disagree on this, data_processor.py:114 vs
   tick_to_hdfs.py:50).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schemas import TICK_SCHEMA


def parse_ticks(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """Kafka-shaped frame (binary/string `value`) -> flat tick frame.

    Mirrors reference data_processor.py:71-115: cast payload to string,
    schema-directed ``from_json``, explode the instrument-keyed feed map,
    project nested paths, cast stringly-typed numerics, null-guard filter.
    Works identically on batch frames and streaming frames.
    """
    parsed = raw.select(
        F.from_json(F.col(value_col).cast("string"), TICK_SCHEMA).alias("data")
    )
    exploded = parsed.select(
        F.explode("data.feeds").alias("instrument", "feed")
    )
    mff = "feed.fullFeed.marketFF"
    flat = exploded.select(
        F.col("instrument"),
        F.col(f"{mff}.ltpc.ltp").alias("ltp"),
        F.col(f"{mff}.ltpc.ltq").cast("long").alias("ltq"),
        F.timestamp_millis(F.col(f"{mff}.ltpc.ltt").cast("long")).alias("event_time"),
        F.col(f"{mff}.marketLevel.bidAskQuote").alias("bidAskQuote"),
        F.col(f"{mff}.tbq").alias("tbq"),
        F.col(f"{mff}.tsq").alias("tsq"),
    )
    return flat.filter(
        F.col("ltp").isNotNull()
        & F.col("ltq").isNotNull()
        & F.col("event_time").isNotNull()
    )


def best_bid_ask(df: DataFrame, quote_col: str = "bidAskQuote") -> DataFrame:
    """Derive best_bid/best_ask from the order-book ladder.

    ``array_max``/``array_min`` replace the reference's sentinel-seeded
    folds (data_processor.py:128-134); empty or null ladders yield NULL
    (not +/-MAX_DOUBLE).
    """
    q = F.col(quote_col)
    return df.withColumn("best_bid", F.array_max(q.getField("bidP"))).withColumn(
        "best_ask", F.array_min(q.getField("askP"))
    )


def aggressor_side(
    price: Column, best_bid: Column, best_ask: Column
) -> Column:
    """'buy' | 'sell' | NULL aggressor classification.

    Reference rule (data_processor.py:136-139): buy iff
    ``abs(ltp - best_ask) <= abs(ltp - best_bid)`` (ties -> buy).
    NULL book (empty ladder) -> NULL side instead of the reference's
    always-buy sentinel behavior.
    """
    return (
        F.when(best_bid.isNull() | best_ask.isNull(), F.lit(None).cast("string"))
        .when(F.abs(price - best_ask) <= F.abs(price - best_bid), F.lit("buy"))
        .otherwise(F.lit("sell"))
    )


def classify_aggressor(
    df: DataFrame,
    price: str = "ltp",
    qty: str = "ltq",
    best_bid: str = "best_bid",
    best_ask: str = "best_ask",
) -> DataFrame:
    """Add side / buy_volume / sell_volume / delta columns.

    ``delta = buy_volume - sell_volume`` (reference data_processor.py:140).
    """
    side = aggressor_side(F.col(price), F.col(best_bid), F.col(best_ask))
    df = df.withColumn("side", side)
    df = df.withColumn(
        "buy_volume",
        F.when(F.col("side") == "buy", F.col(qty)).otherwise(F.lit(0)).cast("long"),
    ).withColumn(
        "sell_volume",
        F.when(F.col("side") == "sell", F.col(qty)).otherwise(F.lit(0)).cast("long"),
    )
    return df.withColumn("delta", F.col("buy_volume") - F.col("sell_volume"))


def parse_ticks_with_quarantine(
    raw: DataFrame, value_col: str = "value"
) -> tuple[DataFrame, DataFrame]:
    """Like :func:`parse_ticks`, but routes unusable input to a dead-letter
    frame instead of silently dropping it.

    The reference's ``from_json`` nulls malformed payloads and the
    null-guard filter (data_processor.py:115) then discards them without a
    trace — at production scale that's silent data loss with no way to
    replay.  Returns ``(ticks, dead_letters)`` where dead_letters carries
    the verbatim payload plus a reason:

    - ``null_payload``: the payload itself is NULL (e.g. a Kafka tombstone)
    - ``malformed_json``: payload didn't parse against the tick schema
    - ``no_feeds``: valid JSON but an empty/missing instrument feed map
    - ``missing_fields``: a feed without ltp/ltq/ltt after flattening

    Both frames share one lineage (filters over the same parse), work
    identically in batch and streaming, and the dead-letter side plugs
    straight into a partitioned parquet sink as a replayable dead-letter
    queue.
    """
    # PERMISSIVE from_json yields an all-null struct for malformed input
    # (not a null struct), so malformed-ness must be captured explicitly:
    # a _corrupt_record field in the parse schema receives the raw payload
    # exactly when parsing failed.
    from pyspark.sql.types import StringType, StructField, StructType

    quarantine_schema = StructType(
        list(TICK_SCHEMA.fields) + [StructField("_corrupt_record", StringType())]
    )
    tagged = raw.select(F.col(value_col).cast("string").alias("json_str")).withColumn(
        "data",
        F.from_json(
            "json_str",
            quarantine_schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
        ),
    )
    bad = F.col("data").isNull() | F.col("data._corrupt_record").isNotNull()
    # NULL payloads (Kafka tombstones) are unusable too, but they are not
    # malformed JSON — give them their own reason so the dead-letter queue
    # keeps the no-silent-drops promise for every input row.
    null_payload = tagged.filter(F.col("json_str").isNull()).select(
        "json_str", F.lit("null_payload").alias("reason")
    )
    malformed = tagged.filter(F.col("json_str").isNotNull() & bad).select(
        "json_str", F.lit("malformed_json").alias("reason")
    )
    has_data = tagged.filter(F.col("json_str").isNotNull() & ~bad)
    n_feeds = F.coalesce(F.size(F.map_keys(F.col("data.feeds"))), F.lit(0))
    no_feeds = has_data.filter(n_feeds == 0).select(
        "json_str", F.lit("no_feeds").alias("reason")
    )
    exploded = has_data.filter(n_feeds > 0).select(
        "json_str", F.explode("data.feeds").alias("instrument", "feed")
    )
    mff = "feed.fullFeed.marketFF"
    flat = exploded.select(
        "json_str",
        F.col("instrument"),
        F.col(f"{mff}.ltpc.ltp").alias("ltp"),
        F.col(f"{mff}.ltpc.ltq").cast("long").alias("ltq"),
        F.timestamp_millis(F.col(f"{mff}.ltpc.ltt").cast("long")).alias(
            "event_time"
        ),
        F.col(f"{mff}.marketLevel.bidAskQuote").alias("bidAskQuote"),
        F.col(f"{mff}.tbq").alias("tbq"),
        F.col(f"{mff}.tsq").alias("tsq"),
    )
    complete = (
        F.col("ltp").isNotNull()
        & F.col("ltq").isNotNull()
        & F.col("event_time").isNotNull()
    )
    missing = flat.filter(~complete).select(
        "json_str", F.lit("missing_fields").alias("reason")
    )
    ticks = flat.filter(complete).drop("json_str")
    dead = (
        null_payload.unionByName(malformed)
        .unionByName(no_feeds)
        .unionByName(missing)
    )
    return ticks, dead
