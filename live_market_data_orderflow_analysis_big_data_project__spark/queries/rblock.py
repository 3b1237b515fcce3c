"""R-block — reference-surface parity queries (SURVEY.md section 2.3).

Batch twins of the reference streaming pipeline: scan/project/filter/CASE
classification/casts/tumbling OHLC/grouped aggs/explode/HOFs/top-k/global
stats, each generalizing the cited reference operator (O-numbers from
SURVEY.md section 2.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import avg_exact, dsum, fmt_date, fmt_minute, fmt_ts, round4
from ..sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- q01: Parquet scan + column pruning (O5, O27) -------------------------
def q01_scan_project(spark, sf):
    return _t(spark, sf, "lineitem").select(
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        "l_quantity",
        "l_extendedprice",
    )


Q01_SQL = """
SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
       l_quantity, l_extendedprice
FROM lineitem
"""


# --- q02: conjunctive predicates + null guards (O10) ----------------------
def q02_filter_predicates(spark, sf):
    e = _t(spark, sf, "events")
    return e.filter(
        F.col("value").isNotNull()
        & F.col("user_id").isNotNull()
        & (F.col("event_type") == "purchase")
        & (F.col("value") > 100.0)
    ).select("event_id", "user_id", "event_type", "value")


Q02_SQL = """
SELECT event_id, user_id, event_type, value
FROM events
WHERE value IS NOT NULL AND user_id IS NOT NULL
  AND event_type = 'purchase' AND value > 100.0
"""


# --- q03: CASE WHEN aggressor classification (O13, O30) -------------------
# Twin of the reference rule (data_processor.py:136-139): buy iff
# |value - ask_ref| <= |value - bid_ref| with ties -> buy.
def q03_case_classification(spark, sf):
    e = _t(spark, sf, "events")
    side = F.when(
        F.abs(e.value - 150.0) <= F.abs(e.value - 50.0), F.lit("buy")
    ).otherwise(F.lit("sell"))
    out = e.withColumn("side", side)
    return out.select(
        "event_id",
        "side",
        F.when(F.col("side") == "buy", F.col("value")).otherwise(F.lit(0.0)).alias("buy_value"),
        F.when(F.col("side") == "sell", F.col("value")).otherwise(F.lit(0.0)).alias("sell_value"),
    )


Q03_SQL = """
WITH c AS (
  SELECT event_id, value,
         CASE WHEN abs(value - 150.0) <= abs(value - 50.0)
              THEN 'buy' ELSE 'sell' END AS side
  FROM events
)
SELECT event_id, side,
       CASE WHEN side = 'buy' THEN value ELSE 0.0 END AS buy_value,
       CASE WHEN side = 'sell' THEN value ELSE 0.0 END AS sell_value
FROM c
"""


# --- q04: arithmetic projection (O14) --------------------------------------
# Money arithmetic runs in DECIMAL end-to-end: products of 2-decimal inputs
# sit exactly on ROUND(x,4) half-way boundaries, where Spark (HALF_UP on the
# decimal string) and DuckDB (half-to-even on the scaled double) disagree.
# Exact decimal math + decimal ROUND is identical in both engines.
def q04_arithmetic_projection(spark, sf):
    li = _t(spark, sf, "lineitem")
    ep = li.l_extendedprice.cast("decimal(12,4)")
    dc = li.l_discount.cast("decimal(12,4)")
    tx = li.l_tax.cast("decimal(12,4)")
    rev = ep * (F.lit(1).cast("decimal(12,4)") - dc)
    return li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        F.round(rev, 4).cast("double").alias("revenue"),
        F.round(rev * (F.lit(1).cast("decimal(12,4)") + tx), 4)
        .cast("double")
        .alias("charge"),
        (dc - tx).cast("double").alias("disc_minus_tax"),
    )


Q04_SQL = """
WITH d AS (
  SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
         CAST(l_extendedprice AS DECIMAL(12,4)) AS ep,
         CAST(l_discount AS DECIMAL(12,4)) AS dc,
         CAST(l_tax AS DECIMAL(12,4)) AS tx
  FROM lineitem
)
SELECT l_orderkey, l_linenumber,
       CAST(ROUND(ep * (1 - dc), 4) AS DOUBLE) AS revenue,
       CAST(ROUND(ep * (1 - dc) * (1 + tx), 4) AS DOUBLE) AS charge,
       CAST(dc - tx AS DOUBLE) AS disc_minus_tax
FROM d
"""


# --- q05: casts string<->numeric<->timestamp (O3, O8) ----------------------
def q05_casts(spark, sf):
    e = _t(spark, sf, "events")
    return e.select(
        "event_id",
        F.col("event_id").cast("string").alias("event_id_str"),
        F.floor(e.value).cast("long").alias("value_floor"),
        F.col("value").cast("string").cast("double").alias("value_roundtrip"),
        F.unix_timestamp(e.ts).alias("epoch_s"),
    )


Q05_SQL = """
SELECT event_id,
       CAST(event_id AS VARCHAR) AS event_id_str,
       CAST(floor(value) AS BIGINT) AS value_floor,
       CAST(CAST(value AS VARCHAR) AS DOUBLE) AS value_roundtrip,
       CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s
FROM events
"""


# --- q06: tumbling 1-minute OHLC candles (O16, O17, O21) -------------------
def q06_tumbling_ohlc(spark, sf):
    e = _t(spark, sf, "events")
    ts, v = F.col("ts"), F.col("value")
    return (
        e.groupBy(F.window(ts, "1 minute").alias("w"), "user_id")
        .agg(
            F.min_by(v, ts).alias("open"),
            F.max(v).alias("high"),
            F.min(v).alias("low"),
            F.max_by(v, ts).alias("close"),
            F.count("*").alias("n_events"),
            dsum(v, "sum_value"),
        )
        .select(
            fmt_minute(F.col("w.start"), "window_start"),
            "user_id",
            "open",
            "high",
            "low",
            "close",
            "n_events",
            "sum_value",
        )
    )


Q06_SQL = """
SELECT strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M') AS window_start,
       user_id,
       arg_min(value, ts) AS open,
       max(value) AS high,
       min(value) AS low,
       arg_max(value, ts) AS close,
       count(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
"""


# --- q07: deterministic first/last via min_by/max_by (O18 fix) -------------
def q07_first_last_deterministic(spark, sf):
    e = _t(spark, sf, "events")
    ts, v = F.col("ts"), F.col("value")
    return e.groupBy("user_id").agg(
        F.min_by(v, ts).alias("open_value"),
        F.max_by(v, ts).alias("close_value"),
        fmt_ts(F.min(ts), "first_ts"),
        fmt_ts(F.max(ts), "last_ts"),
    )


Q07_SQL = """
SELECT user_id,
       arg_min(value, ts) AS open_value,
       arg_max(value, ts) AS close_value,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS first_ts,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS last_ts
FROM events
GROUP BY user_id
"""


# --- q08: grouped sums + post-agg expressions (O17, O19, O20) --------------
def q08_group_sums(spark, sf):
    e = _t(spark, sf, "events")
    v = F.col("value")
    return (
        e.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            dsum(v, "sum_value"),
            F.min(v).alias("min_value"),
            F.max(v).alias("max_value"),
            avg_exact(v, "avg_value"),
        )
        .withColumn("span", F.col("max_value") - F.col("min_value"))
    )


Q08_SQL = """
SELECT event_type,
       count(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value,
       min(value) AS min_value,
       max(value) AS max_value,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / COUNT(value) AS avg_value,
       max(value) - min(value) AS span
FROM events
GROUP BY event_type
"""


# --- q09: JSON map parse + explode (O6, O7) --------------------------------
def q09_explode_map(spark, sf):
    e = _t(spark, sf, "events")
    m = F.from_json(F.col("props"), "map<string,bigint>")
    return e.select("event_id", F.explode(m).alias("prop_key", "prop_val"))


# json_transform-to-MAP rather than '$.' || key path concatenation: path
# strings break on keys containing '.', quotes, or brackets, while the MAP
# conversion (like Spark's from_json map<string,bigint>) is charset-proof.
Q09_SQL = """
WITH x AS (
  SELECT event_id,
         unnest(map_entries(json_transform(props, '"MAP(VARCHAR, BIGINT)"'))) AS me
  FROM events
)
SELECT event_id, me.key AS prop_key, me.value AS prop_val FROM x
"""


# --- q10: higher-order transform over embeddings (O11) ---------------------
# The transformed array is serialized to a comma-joined decimal string so the
# driver's canonicalizer (pandas sort -> md5) sees a scalar cell, not a numpy
# array (round-1 gate failure: "unhashable type: numpy.ndarray").  Decimal
# fixed-scale stringification is format-identical in Spark and DuckDB.
def q10_array_transform(spark, sf):
    emb = _t(spark, sf, "embeddings")
    scaled = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * 10.0, 4)
        .cast("decimal(18,4)")
        .cast("string"),
    )
    return emb.select("vec_id", F.array_join(scaled, ",").alias("scaled"))


Q10_SQL = """
SELECT vec_id,
       array_to_string(
         list_transform(
           embedding,
           x -> CAST(CAST(ROUND(CAST(x AS DOUBLE) * 10.0, 4) AS DECIMAL(18,4))
                     AS VARCHAR)),
         ',') AS scaled
FROM embeddings
"""


# --- q11: array max/min (idiomatic twin of the reference fold, O12) --------
def q11_array_minmax(spark, sf):
    emb = _t(spark, sf, "embeddings")
    return emb.select(
        "vec_id",
        F.array_max("embedding").cast("double").alias("emb_max"),
        F.array_min("embedding").cast("double").alias("emb_min"),
    )


Q11_SQL = """
SELECT vec_id,
       CAST(list_max(embedding) AS DOUBLE) AS emb_max,
       CAST(list_min(embedding) AS DOUBLE) AS emb_min
FROM embeddings
"""


# --- q14: to_date partition-column derivation + per-day agg (O9, O24) ------
def q14_date_partition_agg(spark, sf):
    e = _t(spark, sf, "events")
    return (
        e.groupBy(fmt_date(F.col("ts"), "day"))
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


Q14_SQL = """
SELECT strftime(ts, '%Y-%m-%d') AS day,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1
"""


# --- q15: top-k with total-order tie-break (O26 fixed in batch) -------------
def q15_sort_limit_topk(spark, sf):
    e = _t(spark, sf, "events")
    return (
        e.orderBy(F.col("value").desc(), F.col("event_id").asc())
        .limit(25)
        .select("event_id", "user_id", "value")
    )


Q15_SQL = """
SELECT event_id, user_id, value
FROM events
ORDER BY value DESC, event_id ASC
LIMIT 25
"""


# --- q16: buffer-wide global stats + guarded ratio (O29) --------------------
def q16_global_stats(spark, sf):
    e = _t(spark, sf, "events")
    v = F.col("value")
    buy = F.when(F.col("event_type") == "purchase", v).otherwise(F.lit(0.0))
    sell = F.when(F.col("event_type") == "click", v).otherwise(F.lit(0.0))
    agg = e.agg(
        F.max(v).alias("max_value"),
        F.min(v).alias("min_value"),
        F.count("*").alias("n"),
        dsum(buy, "sum_buy"),
        dsum(sell, "sum_sell"),
    )
    return agg.withColumn(
        "buy_sell_ratio",
        F.when(
            F.col("sum_sell") != 0.0, F.col("sum_buy") / F.col("sum_sell")
        ).otherwise(F.lit(None).cast("double")),
    )


Q16_SQL = """
WITH a AS (
  SELECT max(value) AS max_value, min(value) AS min_value, count(*) AS n,
         CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END
                       AS DECIMAL(28,6))) AS DOUBLE) AS sum_buy,
         CAST(SUM(CAST(CASE WHEN event_type = 'click' THEN value ELSE 0.0 END
                       AS DECIMAL(28,6))) AS DOUBLE) AS sum_sell
  FROM events
)
SELECT max_value, min_value, n, sum_buy, sum_sell,
       CASE WHEN sum_sell != 0.0 THEN sum_buy / sum_sell
            ELSE NULL END AS buy_sell_ratio
FROM a
"""


QUERIES = {
    "q01_scan_project": q01_scan_project,
    "q02_filter_predicates": q02_filter_predicates,
    "q03_case_classification": q03_case_classification,
    "q04_arithmetic_projection": q04_arithmetic_projection,
    "q05_casts": q05_casts,
    "q06_tumbling_ohlc": q06_tumbling_ohlc,
    "q07_first_last_deterministic": q07_first_last_deterministic,
    "q08_group_sums": q08_group_sums,
    "q09_explode_map": q09_explode_map,
    "q10_array_transform": q10_array_transform,
    "q11_array_minmax": q11_array_minmax,
    "q14_date_partition_agg": q14_date_partition_agg,
    "q15_sort_limit_topk": q15_sort_limit_topk,
    "q16_global_stats": q16_global_stats,
}

ORACLE = {
    "q01_scan_project": Q01_SQL,
    "q02_filter_predicates": Q02_SQL,
    "q03_case_classification": Q03_SQL,
    "q04_arithmetic_projection": Q04_SQL,
    "q05_casts": Q05_SQL,
    "q06_tumbling_ohlc": Q06_SQL,
    "q07_first_last_deterministic": Q07_SQL,
    "q08_group_sums": Q08_SQL,
    "q09_explode_map": Q09_SQL,
    "q10_array_transform": Q10_SQL,
    "q11_array_minmax": Q11_SQL,
    "q14_date_partition_agg": Q14_SQL,
    "q15_sort_limit_topk": Q15_SQL,
    "q16_global_stats": Q16_SQL,
}
