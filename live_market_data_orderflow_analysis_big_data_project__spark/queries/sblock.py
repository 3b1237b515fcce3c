"""S-block — streaming queries s01-s13 (SURVEY.md section 2.3).

Each entry REALLY runs Structured Streaming: a file-source replay of the
events fixture through the micro-batch engine (offset log, watermark
state, stateful operators, checkpointed sinks), drained with an
AvailableNow trigger into a memory/parquet sink, and returned as the
collected batch DataFrame.

Every entry is HASH-GATED against a DuckDB oracle (round 5; previously
rows-only).  What makes the drained output SQL-expressible: the fixture
is ONE parquet file, so the file source delivers exactly one data
micro-batch, and AvailableNow then runs the final no-data batch that
commits the watermark at ``max(ts) - delay`` and flushes every window
closed under it.  The deterministic final output is therefore

  - unwindowed/append operators (sinks, dedup, joins): the full batch
    result (all inputs were in state together);
  - watermarked window aggs in append mode: the batch windows with
    ``window_end <= max(ts) - delay`` (the still-open tail is withheld);
  - update-mode stateful ops: the final state per key == the batch agg.

The oracles below encode exactly that closure rule.  Progressive
multi-batch semantics (what emits WHEN, what is dropped mid-stream) are
not SQL-expressible and stay pinned by tests/test_streaming.py with
hand-computed expectations (SURVEY.md section 5.2.3).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.candles import ohlc_candles
from ..operators.ticks import aggressor_side
from ..sources.tables import load_table
from ..streaming.core import (
    dedup_within_watermark,
    foreach_batch_sink,
    parquet_sink,
    run_to_memory,
    running_vwap,
    session_counts,
    sliding_counts,
    stream_events,
    stream_events_dir,
)
from ..operators.warehouse import scd2_merge
from ..operators.sketches import hll_rollup_windowed
from ..operators.topk import (
    topk_counts_to_rollup,
    topk_merge,
    topk_read,
    topk_rollup_windowed,
)
from .ablock import _K, _M, Q143_SQL  # s15's cut/read knobs + oracle base


def _fmt(col: str, alias: str) -> F.Column:
    return F.date_format(col, "yyyy-MM-dd HH:mm").alias(alias)


# --- s01: streaming twin of q06 — watermarked tumbling OHLC candles ---------
# Reference flagship: watermark (data_processor.py:142) + 1-minute window
# + stateful agg (:144-157), deterministic min_by/max_by open/close.
def s01_tumbling_candles(spark, sf):
    ticks = stream_events(spark, sf).select(
        F.col("user_id").cast("string").alias("instrument"),
        F.col("ts").alias("event_time"),
        F.col("value").alias("ltp"),
        F.lit(1).cast("long").alias("ltq"),
    )
    ticks = ticks.withColumn(
        "side", aggressor_side(F.col("ltp"), F.lit(50.0), F.lit(150.0))
    )
    candles = ohlc_candles(
        ticks,
        ts_col="event_time",
        key_col="instrument",
        price_col="ltp",
        qty_col="ltq",
        window="1 minute",
        watermark="5 minutes",
    )
    out = run_to_memory(candles, "s01_candles", n_state_partitions=8)
    return out.select(
        _fmt("window_start", "window_start"),
        "instrument",
        "open",
        "high",
        "low",
        "close",
        "buy_volume",
        "sell_volume",
        "total_volume",
        "delta",
    )


# --- s02: sliding window aggregation ----------------------------------------
def s02_sliding_window(spark, sf):
    s = sliding_counts(stream_events(spark, sf))
    return run_to_memory(s, "s02_sliding", n_state_partitions=8)


# --- s03: session windows per user ------------------------------------------
def s03_session_window(spark, sf):
    s = session_counts(stream_events(spark, sf), gap="5 minutes")
    return run_to_memory(s, "s03_session", n_state_partitions=8)


# --- s04: late data beyond the watermark is dropped -------------------------
# Two checkpointed AvailableNow runs over a growing source directory: run 1
# commits a watermark from the recent data; run 2 (restart from the same
# checkpoint) sees only much-older rows, which the recovered watermark
# filters out (stateOperators.numRowsDroppedByWatermark).  NOTE: within a
# single run Spark only *guarantees* no data under the delay is dropped —
# rows later than the watermark "may or may not" be aggregated; the
# committed-watermark restart is the deterministic formulation.
def s04_late_data_drop(spark, sf):
    e = load_table(spark, sf, "events")
    recent = e.filter(F.col("ts") >= F.lit("2024-01-10").cast("timestamp"))
    late = e.filter(F.col("ts") < F.lit("2024-01-05").cast("timestamp"))
    base = tempfile.mkdtemp(prefix="s04_")
    src = os.path.join(base, "src")
    ckpt = os.path.join(base, "ckpt")
    out_dir = os.path.join(base, "out")

    def run_once():
        from ..streaming.core import state_partitions

        # src holds re-materialized (already ts-normalized) frames.
        sdf = spark.readStream.schema(recent.schema).parquet(src)
        agg = (
            sdf.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 day").alias("w"))
            .agg(F.count("*").alias("n"))
            .select(F.date_format("w.start", "yyyy-MM-dd").alias("day"), "n")
        )
        with state_partitions(spark, 8):
            q = (
                agg.writeStream.format("parquet")
                .option("path", out_dir)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(300)
        return sum(
            (so.get("numRowsDroppedByWatermark") or 0)
            for p in q.recentProgress
            for so in (p.get("stateOperators") or [])
        )

    recent.coalesce(1).write.mode("append").parquet(src)
    run_once()
    late.coalesce(1).write.mode("append").parquet(src)
    n_dropped = run_once()
    emitted = spark.read.parquet(out_dir)
    return emitted.agg(
        F.sum("n").alias("n_rows_emitted"),
        F.count("*").alias("n_days_emitted"),
    ).select(
        "n_rows_emitted",
        "n_days_emitted",
        # numRowsDroppedByWatermark fires after map-side partial agg: it
        # counts dropped *window partials* (4 late day-windows), while all
        # n_late_input raw rows are excluded from the emitted output.
        F.lit(n_dropped).alias("n_late_windows_dropped"),
        F.lit(late.count()).alias("n_late_input"),
    )


# --- s05: stream ⋈ static dimension join ------------------------------------
def s05_stream_static_join(spark, sf):
    s = stream_events(spark, sf).withWatermark("ts", "10 minutes")
    dim = load_table(spark, sf, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = s.join(F.broadcast(dim), "user_id", "inner")
    agg = (
        joined.groupBy(F.window("ts", "1 day").alias("w"), "c_mktsegment")
        .agg(F.count("*").alias("n"))
        .select(F.date_format("w.start", "yyyy-MM-dd").alias("day"), "c_mktsegment", "n")
    )
    return run_to_memory(agg, "s05_stream_static", n_state_partitions=8)


# --- s06: stream-stream join with event-time interval bounds ----------------
# Both sides watermarked; the interval condition bounds join state so it
# can be evicted (the requirement for unbounded-input joins).
def s06_stream_stream_join(spark, sf):
    base = stream_events(spark, sf)
    buys = (
        base.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("buy_id"),
            F.col("user_id"),
            F.col("ts").alias("buy_ts"),
        )
        .withWatermark("buy_ts", "10 minutes")
    )
    clicks = (
        stream_events(spark, sf)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("click_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "10 minutes")
    )
    joined = buys.join(
        clicks,
        (F.col("user_id") == F.col("click_user"))
        & (F.col("click_ts") >= F.col("buy_ts") - F.expr("INTERVAL 5 MINUTES"))
        & (F.col("click_ts") <= F.col("buy_ts")),
        "inner",
    ).select("buy_id", "click_id", "user_id")
    return run_to_memory(joined, "s06_ss_join", n_state_partitions=8)


# --- s07: streaming dedup within the watermark ------------------------------
# The source is unioned with itself so every event arrives twice; the
# dedup state (bounded by the watermark) must drop the second copy.
def s07_stream_dedup(spark, sf):
    doubled = stream_events(spark, sf).unionByName(stream_events(spark, sf))
    deduped = dedup_within_watermark(doubled, keys=("event_id",), watermark="10 minutes")
    out = run_to_memory(
        deduped.select("event_id", "user_id", "event_type"),
        "s07_dedup",
        n_state_partitions=8,
    )
    return out.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.countDistinct("event_id").alias("n_distinct"),
    )


# --- s08: custom per-key state — running VWAP via applyInPandasWithState ----
def s08_stateful_custom(spark, sf):
    vwap = running_vwap(stream_events(spark, sf))
    out = run_to_memory(
        vwap, "s08_vwap", output_mode="update", n_state_partitions=8
    )
    # One output row per key per micro-batch: keep each user's final state.
    # The 4-dp VWAP is derived from the integer tick sum with integer
    # half-up rounding (ticks are cents, so the denominator is 100 * n):
    # ROUND(double, 4) is NOT portable across engines at half boundaries,
    # integer DIV is.
    return (
        out.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("sum_pv_ticks", "n_events").alias("sum_pv_ticks"),
        )
        .withColumn(
            "vwap",
            F.expr(
                "CAST((sum_pv_ticks * 20000 + 100 * n_events) "
                "DIV (200 * n_events) AS DOUBLE) / 10000"
            ),
        )
        .drop("sum_pv_ticks")
    )


# --- s09: checkpointed, date-partitioned parquet sink -----------------------
# Reference tick_to_hdfs.py:62-71: partitionBy("date"), checkpoint,
# trigger.  AvailableNow drains and terminates (the reference's 10-second
# processingTime cadence is the `processing_time` argument); exactly-once
# via checkpoint + _spark_metadata (restart test in tests/test_streaming.py).
def s09_sinks(spark, sf):
    tmp = tempfile.mkdtemp(prefix="s09_")
    out_dir, ckpt = os.path.join(tmp, "data"), os.path.join(tmp, "ckpt")
    ticks = stream_events(spark, sf).withColumn("date", F.to_date("ts"))
    q = parquet_sink(ticks, out_dir, ckpt, partition_by=("date",))
    q.awaitTermination(300)
    back = spark.read.parquet(out_dir)
    return (
        back.groupBy("date")
        .agg(F.count("*").alias("n"), F.countDistinct("event_id").alias("n_distinct"))
        .select(F.date_format("date", "yyyy-MM-dd").alias("day"), "n", "n_distinct")
    )


# --- s10: source zoo — rate source + file (json) source ---------------------
def s10_sources(spark, sf):
    # rate-micro-batch source: deterministic rowsPerBatch per trigger with
    # no wall-clock pacing (the plain `rate` source needs real seconds to
    # elapse before rows exist; this variant emits batch 0 immediately).
    rate = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", 200)
        .load()
    )
    qname = "s10_rate"
    q = (
        rate.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .trigger(processingTime="100 milliseconds")
        .start()
    )
    import time

    deadline = time.time() + 15
    while time.time() < deadline and spark.table(qname).count() == 0:
        time.sleep(0.1)
    q.stop()
    rate_rows = spark.table(qname).count()

    # file source, json format (schema-directed, reference O4 parity).
    # A bounded deterministic slice: this is a source-format smoke, not a
    # throughput test (s01/s09 stream the full fixture).
    tmp = tempfile.mkdtemp(prefix="s10_json_")
    src = (
        load_table(spark, sf, "events")
        .filter(F.col("event_id") <= 5000)
        .select("event_id", "user_id", "event_type")
    )
    src.coalesce(1).write.mode("overwrite").json(tmp)
    jstream = spark.readStream.schema(src.schema).json(tmp)
    jrows = run_to_memory(jstream, "s10_json").count()

    rate_ok = "true" if rate_rows > 0 else "false"
    json_ok = "true" if jrows == src.count() else "false"
    return spark.sql(
        f"SELECT * FROM VALUES ('rate', {rate_ok}), ('file_json', {json_ok})"
        " AS t(source, ok)"
    )


# --- s11: custom Python streaming data source (Spark 4 DataSource API) ------
# sources/pydatasource.py's stream reader: offsets advance rowsPerBatch
# per poll (the queue-consumer availability protocol), partitions()
# covers each committed range exactly, rows generate executor-side.  The
# tape is the same closed form as batch q130, so this STREAMING entry is
# hash-gated against the same SQL range() oracle — the batch and
# streaming paths of the custom source must agree to the last bit.
def s11_python_stream_source(spark, sf):
    from ..sources.pydatasource import register
    from ..streaming.core import run_paced_to_memory

    register(spark)
    sdf = (
        spark.readStream.format("tick_synth")
        .option("maxTicks", 5000)
        .option("rowsPerBatch", 1000)
        .option("numPartitions", 4)
        .load()
    )
    out = run_paced_to_memory(sdf, "s11_ticks", expected_rows=5000)
    return out.groupBy("instrument").agg(
        F.count("*").alias("n_ticks"),
        F.sum("qty").alias("total_qty"),
        F.min("price").alias("min_price"),
        F.max("price").alias("max_price"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
    )


# --- s12: streaming incremental dedup (stream-static ANTI join) -------------
# The streaming twin of q137's index-and-merge pattern: the incoming
# event stream is (1) LEFT ANTI joined per micro-batch against the
# static "already-ingested" index — events with event_id below the
# derived split, the re-delivery/backfill situation — and (2) deduped
# WITHIN the stream by event_id under the watermark (the self-union
# plants in-stream duplicates, as s07 does).  left_anti is the one
# stream-static join type no other s-entry exercises.
#
# Scale posture: the anti-join is stateless per micro-batch; Spark
# broadcasts the index when it fits (here) and shuffle-joins otherwise —
# at 100 TB the index side lives bucketed by the key
# (sources/bucketed.py) so each micro-batch shuffles only itself, the
# same O(batch)-not-O(corpus) economics as q137.  The dedup state holds
# only keys inside the watermark delay.
def s12_incremental_dedup(spark, sf):
    ev = load_table(spark, sf, "events")
    splits = ev.agg(
        F.expr("(max(event_id) * 4) div 5").alias("__split")
    )
    index = (
        ev.crossJoin(F.broadcast(splits))
        .filter(F.col("event_id") < F.col("__split"))
        .select("event_id")
    )
    doubled = stream_events(spark, sf).unionByName(stream_events(spark, sf))
    fresh = doubled.join(index, "event_id", "left_anti")
    deduped = dedup_within_watermark(
        fresh, keys=("event_id",), watermark="10 minutes"
    )
    out = run_to_memory(
        deduped.select("event_id", "event_type"),
        "s12_incr_dedup",
        n_state_partitions=8,
    )
    return out.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.countDistinct("event_id").alias("n_distinct"),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"),
    )


# --- s13: streaming SCD2 upsert apply (foreachBatch merge) ------------------
# The streaming twin of q76, the way a warehouse actually consumes it:
# update batches arrive as a stream and each micro-batch is MERGE-applied
# against the static dimension inside ``foreachBatch`` (the Structured
# Streaming upsert idiom — stream-side MERGE is not expressible as a
# plain streaming plan), appending the version-history delta (closed-out
# old row + new current row per matched key) to the history table.  The
# update feed has exactly one row per key (a per-customer order
# aggregate), so keys never straddle micro-batches and the drained
# history equals the batch merge restricted to matched keys — hash-exact
# regardless of batch order or count.  The sink is the checkpointed
# batch_id=N overwrite pattern (streaming/core.py kafka wire capture):
# a restarted query re-runs the SAME batch ids against the same dirs,
# so replay is idempotent — effectively-once history, no dup versions
# (tests/test_warehouse.py::test_s13_restart_is_idempotent).
# 100 TB: per batch one broadcast semi-join prunes the dim to the
# batch's keys, then q76's one-join-plus-explode merge; the dim is never
# shuffled.
def s13_scd2_stream_apply(spark, sf, base: str | None = None):
    cust = load_table(spark, sf, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.col("c_acctbal").cast("decimal(28,6)").alias("acctbal"),
    )
    upd = (
        load_table(spark, sf, "orders")
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.max("o_orderdate").alias("eff_date"),
            F.sum(F.col("o_totalprice").cast("decimal(28,6)")).alias(
                "spend"
            ),
        )
    )
    if base is None:
        # FIXED per-(entry, sf) path, not mkdtemp: repeated bench/gate/
        # probe runs REPLACE the previous copy instead of accumulating
        # unbounded dirs under /tmp.  The dir is RESET per invocation —
        # a reused checkpoint would mark all input processed and drain
        # instantly, making every re-measurement a no-op (the first
        # fixed-path bench recorded s13 at 0.5 s vs its real ~2.8 s);
        # restart-with-checkpoint idempotency is still covered
        # explicitly via an external `base`
        # (tests/test_warehouse.py::test_s13_restart_is_idempotent).
        # Keyed by the sf dir name because the update batch's CONTENT
        # differs per scale factor.  Same one-harness-at-a-time caveat
        # as pblock's _roundtrip_path.
        base = os.path.join(
            tempfile.gettempdir(),
            "spark_graft_roundtrip",
            "s13_scd2_" + os.path.basename(os.path.normpath(sf)),
        )
        shutil.rmtree(base, ignore_errors=True)
        os.makedirs(base, exist_ok=True)
    updpath = os.path.join(base, "updates")
    outpath = os.path.join(base, "history")
    if not os.path.exists(updpath):
        upd.repartition(4).write.parquet(updpath)
    sdf = stream_events_dir(
        spark,
        updpath,
        spark.read.parquet(updpath).schema,
        max_files_per_trigger=1,
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return  # AvailableNow's final no-data batch
        dim_b = cust.join(
            F.broadcast(batch_df.select("c_custkey")), "c_custkey", "semi"
        )
        delta = scd2_merge(
            dim_b,
            batch_df,
            "c_custkey",
            {"acctbal": F.col("acctbal") + F.col("spend")},
            "eff_date",
        )
        delta.select(
            "c_custkey",
            "c_mktsegment",
            F.col("acctbal").cast("double").alias("acctbal"),
            "valid_from",
            "valid_to",
            "is_current",
        ).write.mode("overwrite").parquet(
            os.path.join(outpath, f"batch_id={batch_id}")
        )

    q = foreach_batch_sink(sdf, apply_batch, os.path.join(base, "ckpt"))
    if not q.awaitTermination(300):
        # still RUNNING on timeout: reading outpath now would race the
        # in-flight batch writes, and the orphan query would contaminate
        # every later entry — stop it and fail loudly (bench.py's
        # warm-up learned the same lesson).
        q.stop()
        raise RuntimeError("s13 availableNow drain timed out after 300s")
    return spark.read.parquet(outpath).drop("batch_id")


S13_SQL = """
WITH upd AS (
  SELECT o_custkey AS c_custkey, max(o_orderdate) AS eff,
         SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS spend
  FROM orders GROUP BY 1
), j AS (
  SELECT c.c_custkey, c.c_mktsegment,
         CAST(c.c_acctbal AS DECIMAL(28,6)) AS acctbal, u.eff, u.spend
  FROM customer c JOIN upd u USING (c_custkey)
)
SELECT c_custkey, c_mktsegment,
       CAST(acctbal + spend AS DOUBLE) AS acctbal,
       strftime(eff, '%Y-%m-%d') AS valid_from,
       '9999-12-31' AS valid_to, 1 AS is_current
FROM j
UNION ALL
SELECT c_custkey, c_mktsegment, CAST(acctbal AS DOUBLE) AS acctbal,
       '1992-01-01' AS valid_from, strftime(eff, '%Y-%m-%d') AS valid_to,
       0 AS is_current
FROM j
"""

# --------------------------------------------------------------------------
# Round-10 promotions (docs/ROTATION_r10.md), moved verbatim from
# queries/staging.py: s14 streaming windowed HLL rollup and s15 the
# streaming-maintained top-k rollup (batch entries moved to ablock.py).
# --------------------------------------------------------------------------

def s14_hll_windowed_stream(spark, sf):
    from ..streaming.core import run_to_memory, stream_events

    sdf = stream_events(spark, sf).select("event_type", "ts", "user_id")
    rollup = run_to_memory(
        hll_rollup_windowed(sdf, ["event_type"], "ts", "user_id", lgk=14),
        "s14_hll_windowed",
        n_state_partitions=8,
    )
    return rollup.select(
        "event_type",
        "bucket_start",
        F.hll_sketch_estimate("hll_sketch").alias("n_users"),
    )


# Append mode emits a day's sketch when the watermark passes the window
# END; the final no-data batch advances the watermark to max(ts), which
# is inside the last day — so exactly the closed days are present and
# the oracle excludes the final day.
S14_SQL = """
SELECT event_type,
       date_trunc('day', ts) AS bucket_start,
       count(DISTINCT user_id) AS n_users
FROM events
WHERE date_trunc('day', ts) < (SELECT date_trunc('day', max(ts)) FROM events)
GROUP BY 1, 2
"""

def s15_topk_windowed_stream(spark, sf):
    """Streaming-maintained top-k rollup (operators/topk.py): the
    stream keeps EXACT per-(type x day x user) counts (a standard
    windowed streaming aggregate, state bounded by open windows) and
    append mode emits each closed day's counts once; the lossy top-m
    cut + certified merge/read then run as a batch view over the
    emitted table — q143's pipeline with the count stage streamed.
    Oracle: Q143's SQL restricted to closed days (the s14 watermark
    argument: the final no-data batch advances the watermark into the
    last day, so exactly the earlier days' windows have flushed)."""
    from ..streaming.core import run_to_memory, stream_events

    sdf = stream_events(spark, sf).select("event_type", "ts", "user_id")
    counts = run_to_memory(
        topk_rollup_windowed(sdf, ["event_type"], "ts", "user_id"),
        "s15_topk_windowed",
        n_state_partitions=8,
    )
    # topk_merge self-joins the rollup; Spark's self-join attribute
    # dedup fails with INTERNAL_ERROR on a MemorySink view leaf, so
    # cut lineage on the (tiny: groups x days x items) emitted table.
    counts = counts.localCheckpoint(eager=True)
    rollup = topk_counts_to_rollup(counts, ["event_type"], "bucket_start", m=_M)
    merged = topk_merge(rollup, ["event_type"])
    return topk_read(merged, ["event_type"], k=_K).select(
        "event_type", "item", "est", "upper", "rank", "certified"
    )


# Q143's lossy-rollup twin verbatim, restricted to closed day windows
# (built by replacement so the two stay coupled; the assert pins it).
S15_SQL = Q143_SQL.replace(
    "FROM events GROUP BY 1, 2, 3",
    """FROM events
  WHERE date_trunc('day', ts)
        < (SELECT date_trunc('day', max(ts)) FROM events)
  GROUP BY 1, 2, 3""",
)
assert "WHERE date_trunc" in S15_SQL


def s18_funnel_stream(spark, sf):
    """Streaming funnel twin of q77 (operators/funnel.py
    funnel_state_stream): per-user stage-vector state updated per
    micro-batch; each user's most-advanced emission (max stage; ties
    are identical rows) equals the batch fold exactly, so the oracle
    is Q77's SQL VERBATIM — stream==batch equality, no window-closure
    restriction (the s16 pattern for the MATCH_RECOGNIZE class)."""
    from pyspark.sql import Window

    from ..operators.funnel import funnel_state_stream
    from ..streaming.core import run_to_memory, stream_events

    sdf = stream_events(spark, sf).select("user_id", "ts", "event_type")
    em = run_to_memory(
        funnel_state_stream(sdf, ("view", "click", "purchase")),
        "s18_funnel",
        output_mode="update",
        n_state_partitions=8,
    )
    # tiny per-user emission table; cut lineage before the window
    # (the s15/s16 MemorySink self-reference lesson)
    em = em.localCheckpoint(eager=True).dropDuplicates()
    ts_cols = [
        F.when(
            F.col(f"t{i}_us") >= 0, F.timestamp_micros(F.col(f"t{i}_us"))
        ).alias(f"t{i}")
        for i in (1, 2, 3)
    ]
    full = em.select("user_id", *ts_cols)
    stage = (
        F.col("t1").isNotNull().cast("int")
        + F.col("t2").isNotNull().cast("int")
        + F.col("t3").isNotNull().cast("int")
    )
    latest = (
        full.withColumn("stage", stage)
        .withColumn(
            "_rk",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(F.desc("stage"))
            ),
        )
        .where(F.col("_rk") == 1)
    )
    return latest.select(
        "user_id",
        "stage",
        F.date_format("t1", "yyyy-MM-dd HH:mm:ss").alias("view_ts"),
        F.date_format("t2", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.date_format("t3", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
    )


# stream==batch equality: the oracle is q77's cascaded-min SQL verbatim
from .eblock import Q77_SQL as S18_SQL  # noqa: E402


# --------------------------------------------------------------------------
# Round-12 promotion (docs/ROTATION_r12.md), moved verbatim from
# queries/staging.py: s19 streaming quantile rollup — the batch twin
# q180 lives in ablock.py; the oracle is built by ablock's _q180_sql
# so the two stay coupled (the S17/Q150 splice pattern).
# --------------------------------------------------------------------------

from .ablock import _CENTS, _Q180_K, _Q180_QS, _q180_sql  # noqa: E402


def s19_quantile_stream(spark, sf):
    """Streaming twin of q180 — the streaming sketch family's
    quantile member (s14 HLL distincts, s15 top-k, s19 quantiles):
    the stream maintains the per-(type x day) VALUE HISTOGRAM
    (windowed count agg — the data-sized reduction; state per open
    (type, day, cents) is one count), append emits each day's
    histogram once when it closes, and the mergeable summary +
    p50/p90 read + exactness audit run as a batch view over the
    emitted table (the s17 production split).  Oracle: Q180
    restricted to closed days (watermark 0 + the final no-data batch
    advance to max(ts) — the s14/s17 closure argument)."""
    from ..operators.quantsketch import (
        quantile_report,
        spaced_summary,
        value_histogram_windowed,
    )

    sdf = stream_events(spark, sf).select("event_type", "ts", "value")
    sdf = sdf.where(F.col("value").isNotNull()).select(
        "event_type", "ts", F.expr(_CENTS).alias("cents")
    )
    hist = run_to_memory(
        value_histogram_windowed(
            sdf, ["event_type"], "ts", "cents", bucket="day"
        ),
        "s19_quanthist",
        n_state_partitions=8,
    )
    hist = hist.localCheckpoint(eager=True)  # the s15 lineage cut
    summ = spaced_summary(hist, ["event_type"], "day", "cents", _Q180_K)
    return quantile_report(
        hist, summ, ["event_type"], "day", "cents", _Q180_K, _Q180_QS
    )


# Q180's twin restricted to closed day windows (built by the same
# splice discipline as S17; the assert pins the splice point).  The
# splice's max(ts) is scoped to `value IS NOT NULL` because the STREAM
# filters NULL values BEFORE the watermark attaches (unlike s17, whose
# NULL rows ride through to the windowed sum) — so only non-null-value
# rows advance the watermark, and a fixture whose globally-latest
# events all carry NULL value would close fewer days than an unscoped
# max(ts) claims (the r11 ADVICE finding).
S19_SQL = _q180_sql(
    where_extra="""
    AND date_trunc('day', ts)
        < (SELECT date_trunc('day', max(ts)) FROM events
           WHERE value IS NOT NULL)"""
)
assert "AND date_trunc('day', ts)" in S19_SQL


# --------------------------------------------------------------------------
# Round-13 promotion (docs/ROTATION_r13.md), moved verbatim from
# queries/staging.py: s20 streaming PSI drift monitor — q167's
# monitoring loop with the data-sized histogram stage streamed (the
# s17/s19 production split).
# --------------------------------------------------------------------------

_S20_SPLIT = "2024-01-16"
_S20_BIN_CENTS = 500


def s20_psi_drift_stream(spark, sf):
    """Streaming PSI drift monitor — q167's monitoring loop with the
    data-sized stage streamed (the s17/s19 production split): the
    stream maintains per-(type × day) BINNED value histograms
    (windowed count agg over cents div 500; state per open
    (type, day, bin) is one count), append emits closed days, and the
    PSI read vs the pre-{split} reference runs as a batch view
    (operators/drift.py psi_from_histograms, per-bin ROUND-4
    contributions — the q167 order-independence rule).  The bin
    expression guards negative cents with raise_error (Spark div
    truncates, DuckDB // floors — they agree only on non-negatives).
    SPLICE SCOPING (corrected r13, the s22 lesson measured in this
    very plan): the bin-NULL filter is written inside the windowed
    operator AFTER withWatermark, but Catalyst's
    PushPredicateThroughNonJoin moves it BELOW the EventTimeWatermark
    node — verified in the optimized logical plan — so only
    non-null-value rows advance the watermark and the closed-day
    splice must scope its max(ts) to ``value IS NOT NULL`` (same
    class as s19; the two differ only in where the filter is written,
    not in watermark behavior).  At day granularity the scoped and
    unscoped forms diverge only when the corpus's final day carries
    exclusively NULL values — a fixture accident away from a silent
    gate mismatch, hence the explicit scoping."""
    from ..operators.drift import psi_from_histograms
    from ..operators.quantsketch import value_histogram_windowed

    bin_expr = (
        f"CASE WHEN {_CENTS} < 0 THEN CAST(raise_error('s20: negative "
        "cents - floor/truncate division diverges across engines') "
        f"AS BIGINT) ELSE {_CENTS} div {_S20_BIN_CENTS} END"
    )
    sdf = stream_events(spark, sf).select(
        "event_type", "ts", F.expr(bin_expr).alias("bin")
    )
    hist = run_to_memory(
        value_histogram_windowed(
            sdf, ["event_type"], "ts", "bin", bucket="day"
        ),
        "s20_psihist",
        n_state_partitions=8,
    )
    hist = hist.localCheckpoint(eager=True)  # the s15 lineage cut
    ref = (
        hist.where(F.col("day") < _S20_SPLIT)
        .groupBy("event_type", "bin")
        .agg(F.sum("n").cast("long").alias("n"))
    )
    cur = hist.where(F.col("day") >= _S20_SPLIT)
    return psi_from_histograms(
        ref, cur, ["event_type"], "day", "bin", "n"
    )


S20_SQL = f"""
WITH h AS MATERIALIZED (
  SELECT event_type,
         strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         {_CENTS} // {_S20_BIN_CENTS} AS bin,
         CAST(count(*) AS BIGINT) AS n
  FROM events
  WHERE value IS NOT NULL
    AND date_trunc('day', ts)
        < (SELECT date_trunc('day', max(ts)) FROM events
           WHERE value IS NOT NULL)
  GROUP BY 1, 2, 3
), ref AS (
  SELECT event_type, bin, CAST(sum(n) AS BIGINT) AS n_ref0
  FROM h WHERE day < '{_S20_SPLIT}' GROUP BY 1, 2
), cur AS (
  SELECT event_type, day, bin, n FROM h WHERE day >= '{_S20_SPLIT}'
), days AS (
  SELECT DISTINCT event_type, day FROM cur
), grid AS (
  SELECT d.event_type, d.day, r.bin
  FROM days d JOIN ref r ON d.event_type = r.event_type
  UNION
  SELECT event_type, day, bin FROM cur
), cells AS (
  SELECT g.event_type, g.day, g.bin,
         CAST(COALESCE(r.n_ref0, 0) AS BIGINT) AS n_ref,
         CAST(COALESCE(c.n, 0) AS BIGINT) AS n_cur
  FROM grid g
  LEFT JOIN ref r ON g.event_type = r.event_type AND g.bin = r.bin
  LEFT JOIN cur c ON g.event_type = c.event_type AND g.day = c.day
                 AND g.bin = c.bin
), tot AS (
  SELECT event_type, day,
         CAST(count(*) AS BIGINT) AS n_bins,
         CAST(sum(n_ref) AS BIGINT) AS t_ref,
         CAST(sum(n_cur) AS BIGINT) AS t_cur
  FROM cells GROUP BY 1, 2
)
SELECT c.event_type, c.day, c.bin, c.n_ref, c.n_cur, t.n_bins,
       CAST(c.n_ref + 1 AS DOUBLE) / CAST(t.t_ref + t.n_bins AS DOUBLE)
         AS p_ref,
       CAST(c.n_cur + 1 AS DOUBLE) / CAST(t.t_cur + t.n_bins AS DOUBLE)
         AS p_cur,
       ROUND((CAST(c.n_ref + 1 AS DOUBLE)
                / CAST(t.t_ref + t.n_bins AS DOUBLE)
              - CAST(c.n_cur + 1 AS DOUBLE)
                / CAST(t.t_cur + t.n_bins AS DOUBLE))
             * ln((CAST(c.n_ref + 1 AS DOUBLE)
                     / CAST(t.t_ref + t.n_bins AS DOUBLE))
                  / (CAST(c.n_cur + 1 AS DOUBLE)
                       / CAST(t.t_cur + t.n_bins AS DOUBLE))), 4)
         AS psi_contrib
FROM cells c JOIN tot t ON c.event_type = t.event_type AND c.day = t.day
"""


# --------------------------------------------------------------------------
# Round-14 promotion (docs/ROTATION_r14.md), moved verbatim from
# queries/staging.py: s21 streaming point-in-time enrichment — the
# STATELESS stream-static interval join (no watermark, no state store,
# no splice), the third point on the s19/s20 splice spectrum.
# --------------------------------------------------------------------------

def s21_pit_enrich_stream(spark, sf):
    """Streaming point-in-time enrichment (operators/pit.py): each
    streamed event joins the user-profile dimension version valid AT
    ITS TIMESTAMP — key equality + valid_from <= ts < valid_to, the
    feature-store lookup that prevents feature time-travel (an s05-
    style key-only join would enrich Jan-3 events with Jan-20
    profiles).  The dimension is daily_tier_dim's (user × day) grid
    of PREV-day activity counts/tiers, built batch-side (the nightly
    feature job) and localCheckpoint-cut; the stream side is
    STATELESS (stream-static inner join, no watermark, no state
    store), so append emits every enriched event and the oracle is
    the plain batch join — no closed-day splice at all, the
    documented third point on the s19/s20 splice spectrum."""
    from ..operators.pit import daily_tier_dim, pit_join
    from ..streaming.core import run_to_memory, stream_events

    ev = load_table(spark, sf, "events")
    dim = daily_tier_dim(ev, "user_id", "ts").localCheckpoint(eager=True)
    s = stream_events(spark, sf)
    joined = pit_join(s, dim, "user_id", "ts")
    out = joined.select(
        "event_id",
        "user_id",
        "event_type",
        F.date_format(F.col("valid_from"), "yyyy-MM-dd").alias("day"),
        "prev_cnt",
        "tier",
    )
    return run_to_memory(out, "s21_pit", n_state_partitions=8)


def _s21_sql() -> str:
    from ..operators.pit import TIER_CASE

    return f"""
WITH daily AS MATERIALIZED (
  SELECT user_id, date_trunc('day', ts) AS d,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
), b AS (
  SELECT min(d) AS d0, max(d) AS d1 FROM daily
), grid AS (
  SELECT u.user_id, b.d0 + g * INTERVAL 1 DAY AS valid_from
  FROM (SELECT DISTINCT user_id FROM daily) u, b,
       unnest(range(0, datediff('day', b.d0, b.d1) + 1)) AS s(g)
), dim AS (
  SELECT g.user_id, g.valid_from,
         g.valid_from + INTERVAL 1 DAY AS valid_to,
         CAST(COALESCE(p.cnt, 0) AS BIGINT) AS prev_cnt
  FROM grid g LEFT JOIN daily p
    ON p.user_id = g.user_id AND p.d + INTERVAL 1 DAY = g.valid_from
)
SELECT e.event_id, e.user_id, e.event_type,
       strftime(dim.valid_from, '%Y-%m-%d') AS day, dim.prev_cnt,
       {TIER_CASE} AS tier
FROM events e JOIN dim ON dim.user_id = e.user_id
  AND e.ts >= dim.valid_from AND e.ts < dim.valid_to
"""


S21_SQL = _s21_sql()


# --------------------------------------------------------------------------
# Round-15 promotion (docs/ROTATION_r15.md), moved verbatim from
# queries/staging.py: s22 streaming as-of enrichment (the batch
# asof_join/q25 capability as applyInPandasWithState with event-time
# timeouts — the fourth point on the streaming-state spectrum), s23
# streaming top-k ranking drift, s24 streaming CUSUM level-shift
# drift, s25 streaming rolling distinct actives (q168's production
# split).  The batch q-members of the cohort (q193-q196) move to
# ablock.py.  Evidence class per entry: docs/ROTATION_r15.md.
# --------------------------------------------------------------------------

def s22_asof_enrich_stream(spark, sf):
    """Streaming as-of enrichment (streaming/core.py
    asof_quote_enrich): every purchase is emitted exactly once
    carrying the latest view of the same user STRICTLY before it —
    the batch asof_join/q25 capability as a custom stateful operator
    (applyInPandasWithState keyed by user, EventTimeTimeout), the
    fourth point on the streaming-state spectrum after s08 (running
    scalar state), s19/s20 (windowed aggs) and s21 (stateless
    stream-static).  Trades are held in state until the watermark
    passes their event time (only then is the quote set at-or-before
    them closed) and flush via event-time timeout — under the
    single-file replay EVERY emission rides the final no-data batch's
    timeout path, so the gate exercises the timeout machinery by
    construction.  SPLICE SCOPING (measured, not assumed): the
    watermark is attached before the side/value filters in code, but
    Catalyst's PushPredicateThroughNonJoin moves deterministic
    predicates that don't reference the event-time column BELOW the
    EventTimeWatermark node — so filtered rows never advance the
    watermark REGARDLESS of call order, and the splice must be the
    max(ts) OVER THE FILTERED SET (the s19 class; the unscoped form
    was exactly one row generous at sf0.1 — the globally-latest
    view/purchase row itself), truncated to Spark's whole-ms
    watermark granularity.  Only a filter evaluated INSIDE a stateful
    operator (s20's agg-side NULL handling) escapes that pushdown.
    Unquoted trades surface with NULL quote columns (never dropped);
    quote choice is strictly-before with the (us, event_id) tie-break
    — the q184 contract.  Both the enriched and the NULL bucket BIND
    at every fixture sf (pinned by test)."""
    from ..streaming.core import (
        asof_quote_enrich,
        run_to_memory,
        stream_events,
    )

    sdf = stream_events(spark, sf).withWatermark("ts", "0 seconds")
    sdf = sdf.where(
        F.col("event_type").isin("view", "purchase")
        & F.col("value").isNotNull()
    ).select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.expr(_CENTS).alias("cents"),
    )
    return run_to_memory(
        asof_quote_enrich(sdf, "view", "purchase"),
        "s22_asof",
        n_state_partitions=8,
    )


S22_SQL = f"""
WITH base AS MATERIALIZED (
  SELECT user_id, event_id, epoch_us(ts) AS us, event_type,
         {_CENTS} AS c
  FROM events
  WHERE event_type IN ('view', 'purchase') AND value IS NOT NULL
), wm AS MATERIALIZED (
  -- the final watermark: max event time over the FILTERED set —
  -- Catalyst pushes the deterministic side/value filter below the
  -- EventTimeWatermark node, so only view/purchase non-null-value
  -- rows advance the watermark (see the query docstring); truncated
  -- to whole ms (Spark tracks event-time stats in milliseconds)
  SELECT (max(us) // 1000) * 1000 AS w_us FROM base
), tr AS (
  SELECT user_id, event_id, us, c FROM base, wm
  WHERE event_type = 'purchase' AND us < wm.w_us
), qt AS (
  SELECT user_id, event_id, us, c FROM base WHERE event_type = 'view'
), last_q AS (
  SELECT tid, qid, qus, qc FROM (
    SELECT t.event_id AS tid, q.event_id AS qid, q.us AS qus,
           q.c AS qc,
           row_number() OVER (PARTITION BY t.event_id
                              ORDER BY q.us DESC, q.event_id DESC)
             AS rk
    FROM tr t JOIN qt q ON q.user_id = t.user_id AND q.us < t.us
  ) WHERE rk = 1
)
SELECT t.user_id, t.event_id, CAST(t.us AS BIGINT) AS t_us,
       t.c AS trade_cents,
       l.qid AS quote_event_id, l.qc AS quote_cents,
       CAST(t.us - l.qus AS BIGINT) AS gap_us
FROM tr t LEFT JOIN last_q l ON l.tid = t.event_id
"""


_S23_SPLIT = "2024-01-16"
_S23_K = 5


def s23_topk_drift_stream(spark, sf):
    """Streaming top-k RANKING drift monitor (operators/drift.py
    topk_drift) — the monitor family's ranking member, completing the
    s14 (distincts) / s15 (top-k emit) / s19 (quantiles) / s20
    (distribution PSI) spectrum: per (type × closed day), the day's
    top-5 users by event count compared against the pre-split
    reference top-5 — PSI answers "did the distribution move", this
    answers "did the heavy hitters change".  The stream owns the
    data-sized stage (the per-(type, day, user) windowed count agg,
    append emits closed days); the ranking/overlap read runs as a
    domain-bounded batch view.  Exact gate: counts, integer-ppm
    Jaccard (the q176 integer-argument rule), null-safe top1_same
    boolean.  Splice scoped to ``user_id IS NOT NULL`` — the
    operator's NULL-item filter sits below EventTimeWatermark after
    Catalyst's pushdown (the s20/s22 lesson; vacuous on this fixture
    where user_id is never NULL, scoped anyway so a fixture accident
    cannot silently diverge the gate)."""
    from ..operators.drift import topk_drift
    from ..operators.quantsketch import value_histogram_windowed
    from ..streaming.core import run_to_memory, stream_events

    sdf = stream_events(spark, sf).select(
        "event_type", "ts", F.col("user_id").alias("item")
    )
    hist = run_to_memory(
        value_histogram_windowed(
            sdf, ["event_type"], "ts", "item", bucket="day"
        ),
        "s23_topkhist",
        n_state_partitions=8,
    )
    hist = hist.localCheckpoint(eager=True)  # the s15 lineage cut
    return topk_drift(
        hist, ["event_type"], "day", "item", "n", _S23_SPLIT, _S23_K
    )


S23_SQL = f"""
WITH h AS MATERIALIZED (
  SELECT event_type,
         strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         user_id AS item, CAST(count(*) AS BIGINT) AS n
  FROM events
  WHERE user_id IS NOT NULL
    AND date_trunc('day', ts)
        < (SELECT date_trunc('day', max(ts)) FROM events
           WHERE user_id IS NOT NULL)
  GROUP BY 1, 2, 3
), reft AS (
  SELECT event_type, item, CAST(sum(n) AS BIGINT) AS n_ref
  FROM h WHERE day < '{_S23_SPLIT}' GROUP BY 1, 2
), refk AS MATERIALIZED (
  SELECT event_type, item, rk FROM (
    SELECT event_type, item,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY n_ref DESC, item) AS rk
    FROM reft
  ) WHERE rk <= {_S23_K}
), curk AS MATERIALIZED (
  SELECT event_type, day, item, rk FROM (
    SELECT event_type, day, item,
           row_number() OVER (PARTITION BY event_type, day
                              ORDER BY n DESC, item) AS rk
    FROM h WHERE day >= '{_S23_SPLIT}'
  ) WHERE rk <= {_S23_K}
), curstats AS (
  SELECT event_type, day, CAST(count(*) AS BIGINT) AS n_cur_k,
         arg_min(item, rk) AS cur_top1
  FROM curk GROUP BY 1, 2
), refstats AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_ref_k,
         arg_min(item, rk) AS ref_top1
  FROM refk GROUP BY 1
), com AS (
  SELECT c.event_type, c.day, CAST(count(*) AS BIGINT) AS n_common
  FROM curk c JOIN refk r ON r.event_type = c.event_type
                         AND r.item = c.item
  GROUP BY 1, 2
)
SELECT cs.event_type, cs.day,
       CAST(COALESCE(rs.n_ref_k, 0) AS BIGINT) AS n_ref_k,
       cs.n_cur_k,
       CAST(COALESCE(m.n_common, 0) AS BIGINT) AS n_common,
       CAST(COALESCE(m.n_common, 0) * 1000000
            // (COALESCE(rs.n_ref_k, 0) + cs.n_cur_k
                - COALESCE(m.n_common, 0)) AS BIGINT) AS jaccard_ppm,
       rs.ref_top1, cs.cur_top1,
       (rs.ref_top1 IS NOT DISTINCT FROM cs.cur_top1) AS top1_same
FROM curstats cs
LEFT JOIN refstats rs ON rs.event_type = cs.event_type
LEFT JOIN com m ON m.event_type = cs.event_type AND m.day = cs.day
"""


_S24_SPLIT = "2024-01-16"
# alarm threshold h = 3 x MAD: in MAD units (MAD ~ 0.674 sigma for a
# normal) this is ~2 sigma — the fixture-binding choice (h=5 never
# fires at sf0.001; 3 fires 1/12/5 alarms at the three sfs while
# leaving the majority un-alarmed, both directions pinned by test)
_S24_H = 3


def s24_cusum_stream(spark, sf):
    """Streaming CUSUM drift monitor (operators/monitor.py) — the
    monitor family's change-point member (s20 PSI answers "did the
    distribution move", s23 top-k answers "did the heavy hitters
    change", this answers "did the LEVEL shift, and when"): the stream
    owns the per-(type × day) cents TOTALS (keyed_sum_windowed — state
    per open (type, day) is ONE int64, append emits closed days), and
    the read fits the robust median/MAD baseline on pre-split days and
    runs Page's one-sided CUSUM over the monitored days via the
    clamped_balance Lindley reflection identity as ONE window pass
    (cusum_daily_series).  Exact int64 end to end, alarm = S >
    3·MAD (both alarm directions bind at every fixture sf) — no
    ROUND anywhere.  Splice scoped to ``value IS NOT
    NULL`` (the operator's amount-NULL filter lands below
    EventTimeWatermark after Catalyst's pushdown — the s20/s22
    lesson)."""
    from ..operators.monitor import cusum_daily_series, keyed_sum_windowed
    from ..operators.robust import cents
    from ..streaming.core import run_to_memory, stream_events

    sdf = stream_events(spark, sf)
    daily = run_to_memory(
        keyed_sum_windowed(
            sdf, ["event_type"], "ts", cents("value"), bucket="day"
        ),
        "s24_daily",
        n_state_partitions=8,
    )
    daily = daily.localCheckpoint(eager=True)  # the s15 lineage cut
    return cusum_daily_series(
        daily, ["event_type"], "day", "total", _S24_SPLIT, h_mult=_S24_H
    )


S24_SQL = f"""
WITH d AS MATERIALIZED (
  SELECT event_type,
         strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         CAST(sum({_CENTS}) AS BIGINT) AS total
  FROM events
  WHERE value IS NOT NULL
    AND date_trunc('day', ts)
        < (SELECT date_trunc('day', max(ts)) FROM events
           WHERE value IS NOT NULL)
  GROUP BY 1, 2
), ref AS (
  SELECT * FROM d WHERE day < '{_S24_SPLIT}'
), med AS (
  SELECT event_type, total AS med_ref FROM (
    SELECT event_type, total, day,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY total, day) AS rn,
           count(*) OVER (PARTITION BY event_type) AS n
    FROM ref) WHERE rn = (n + 1) // 2
), dev0 AS (
  SELECT r.event_type, r.day, abs(r.total - m.med_ref) AS dv
  FROM ref r JOIN med m USING (event_type)
), mad AS (
  SELECT event_type, dv AS mad_ref FROM (
    SELECT event_type, dv, day,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY dv, day) AS rn,
           count(*) OVER (PARTITION BY event_type) AS n
    FROM dev0) WHERE rn = (n + 1) // 2
), base AS (
  SELECT m.event_type, m.med_ref, a.mad_ref
  FROM med m JOIN mad a USING (event_type)
), series AS MATERIALIZED (
  SELECT c.event_type, c.day, c.total AS x, b.med_ref, b.mad_ref,
         c.total - b.med_ref - b.mad_ref AS dev
  FROM d c LEFT JOIN base b USING (event_type)
  WHERE c.day >= '{_S24_SPLIT}'
), fold AS (
  SELECT event_type, day, x, med_ref, mad_ref, dev,
         CAST(sum(dev) OVER w AS BIGINT) AS prefix
  FROM series
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS UNBOUNDED PRECEDING)
), fold2 AS (
  SELECT event_type, day, x, med_ref, mad_ref, dev, prefix,
         CAST(least(min(prefix) OVER w2, 0) AS BIGINT) AS floor_
  FROM fold
  WINDOW w2 AS (PARTITION BY event_type ORDER BY day
                ROWS UNBOUNDED PRECEDING)
)
SELECT event_type, day, CAST(x AS BIGINT) AS day_total,
       med_ref, mad_ref, CAST(dev AS BIGINT) AS dev,
       CAST(prefix - floor_ AS BIGINT) AS cusum,
       CASE WHEN mad_ref IS NOT NULL
            THEN (prefix - floor_) > {_S24_H} * mad_ref END AS is_alarm
FROM fold2
"""


_S25_WINDOW_DAYS = 7


def s25_rolling_active_stream(spark, sf):
    """Streaming rolling distinct actives (operators/rolling.py
    rolling_active_from_pairs) — q168's production split: the stream
    owns the (user × day) DISTINCT as a windowed count agg
    (value_histogram_windowed with the user as the value — each
    (user, closed day) pair emits exactly once), and the batch read
    runs the contribution-explode DAU/WAU/stickiness over the emitted
    pair frame — COUNT(DISTINCT) over a sliding frame stays illegal
    on streams too, so the same rewrite carries.  Splice scoped to
    ``user_id IS NOT NULL`` (the histogram stage's NULL-value filter
    lands below EventTimeWatermark after Catalyst's pushdown — the
    s20/s22 lesson; vacuous on this fixture, scoped anyway)."""
    from ..operators.quantsketch import value_histogram_windowed
    from ..operators.rolling import rolling_active_from_pairs
    from ..streaming.core import run_to_memory, stream_events

    sdf = stream_events(spark, sf).select("ts", "user_id")
    pairs = run_to_memory(
        value_histogram_windowed(
            sdf, [], "ts", "user_id", bucket="day"
        ),
        "s25_active",
        n_state_partitions=8,
    )
    pairs = pairs.localCheckpoint(eager=True)  # the s15 lineage cut
    active = pairs.select("user_id", F.to_date("day").alias("_day"))
    return rolling_active_from_pairs(
        active, "user_id", "_day", _S25_WINDOW_DAYS
    )


S25_SQL = f"""
WITH active AS MATERIALIZED (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
  WHERE user_id IS NOT NULL
    AND date_trunc('day', ts)
        < (SELECT date_trunc('day', max(ts)) FROM events
           WHERE user_id IS NOT NULL)
), days AS (
  SELECT DISTINCT d FROM active
), wau AS (
  SELECT dy.d, CAST(count(DISTINCT a.user_id) AS BIGINT) AS wau
  FROM days dy JOIN active a
    ON a.d BETWEEN dy.d - {_S25_WINDOW_DAYS - 1} AND dy.d
  GROUP BY 1
), dau AS (
  SELECT d, CAST(count(*) AS BIGINT) AS dau FROM active GROUP BY 1
)
SELECT strftime(dau.d, '%Y-%m-%d') AS day, dau.dau, wau.wau,
       CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE) AS stickiness
FROM dau JOIN wau ON dau.d = wau.d
"""


QUERIES = {
    "s01_tumbling_candles": s01_tumbling_candles,
    "s02_sliding_window": s02_sliding_window,
    "s03_session_window": s03_session_window,
    "s04_late_data_drop": s04_late_data_drop,
    "s05_stream_static_join": s05_stream_static_join,
    "s06_stream_stream_join": s06_stream_stream_join,
    "s07_stream_dedup": s07_stream_dedup,
    "s08_stateful_custom": s08_stateful_custom,
    "s09_sinks": s09_sinks,
    "s10_sources": s10_sources,
    "s11_python_stream_source": s11_python_stream_source,
    "s12_incremental_dedup": s12_incremental_dedup,
    "s13_scd2_stream_apply": s13_scd2_stream_apply,
    "s14_hll_windowed_stream": s14_hll_windowed_stream,
    "s15_topk_windowed_stream": s15_topk_windowed_stream,
    "s18_funnel_stream": s18_funnel_stream,
    "s19_quantile_stream": s19_quantile_stream,
    "s20_psi_drift_stream": s20_psi_drift_stream,
    "s21_pit_enrich_stream": s21_pit_enrich_stream,
    "s22_asof_enrich_stream": s22_asof_enrich_stream,
    "s23_topk_drift_stream": s23_topk_drift_stream,
    "s24_cusum_stream": s24_cusum_stream,
    "s25_rolling_active_stream": s25_rolling_active_stream,
}

# DuckDB twins of the drained streaming output (see module docstring for
# why the final output is deterministic and SQL-expressible).  Numeric
# conventions per SURVEY section 2.3: integer aggregates CAST to BIGINT
# (DuckDB SUM is HUGEINT, which pandas floats), floats ROUND(...,4) when
# accumulated incrementally on the Spark side.  Window flooring uses
# integer epoch_ms — CAST(epoch(ts) AS BIGINT) ROUNDS in DuckDB and
# shifts boundary events into the wrong pane.

# s01: 1-minute OHLC candles; append emits windows closed by the final
# watermark (max ts - 5 min).  Side rule inlined from
# operators/ticks.py::aggressor_side with the constant 50/150 book.
S01_SQL = """
WITH t AS (
  SELECT date_trunc('minute', ts) AS wstart,
         CAST(user_id AS VARCHAR) AS instrument,
         ts, value,
         CASE WHEN abs(value - 150.0) <= abs(value - 50.0)
              THEN 'buy' ELSE 'sell' END AS side
  FROM events
), wm AS (SELECT max(ts) - INTERVAL 5 MINUTE AS w FROM events)
SELECT strftime(wstart, '%Y-%m-%d %H:%M') AS window_start,
       instrument,
       arg_min(value, ts) AS open,
       max(value) AS high,
       min(value) AS low,
       arg_max(value, ts) AS close,
       CAST(SUM(CASE WHEN side = 'buy' THEN 1 ELSE 0 END) AS BIGINT)
         AS buy_volume,
       CAST(SUM(CASE WHEN side = 'sell' THEN 1 ELSE 0 END) AS BIGINT)
         AS sell_volume,
       CAST(count(*) AS BIGINT) AS total_volume,
       CAST(SUM(CASE WHEN side = 'buy' THEN 1 ELSE 0 END)
            - SUM(CASE WHEN side = 'sell' THEN 1 ELSE 0 END) AS BIGINT)
         AS delta
FROM t, wm
WHERE wstart + INTERVAL 1 MINUTE <= wm.w
GROUP BY 1, 2
"""

# s02: each event lands in two 10-min/5-min panes; watermark closure as
# in s01 (delay 10 min).
S02_SQL = """
WITH panes AS (
  SELECT make_timestamp((epoch_ms(ts) // 300000) * 300000 * 1000) AS wstart,
         event_type FROM events
  UNION ALL
  SELECT make_timestamp((epoch_ms(ts) // 300000) * 300000 * 1000)
           - INTERVAL 5 MINUTE,
         event_type FROM events
), wm AS (SELECT max(ts) - INTERVAL 10 MINUTE AS w FROM events)
SELECT strftime(wstart, '%Y-%m-%d %H:%M') AS window_start,
       strftime(wstart + INTERVAL 10 MINUTE, '%Y-%m-%d %H:%M') AS window_end,
       event_type, count(*) AS n
FROM panes, wm
WHERE wstart + INTERVAL 10 MINUTE <= wm.w
GROUP BY 1, 2, 3
"""

# s03: gaps-and-islands sessionization.  A new session starts when the
# gap to the previous event is >= 5 min (Spark session windows are
# half-open: an event exactly at last_ts + gap opens a NEW session);
# session_end = last_ts + gap; sessions close when end <= watermark.
S03_SQL = """
WITH o AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                   OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                      >= INTERVAL 5 MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM events
), s AS (
  SELECT user_id, ts,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
), wm AS (SELECT max(ts) - INTERVAL 10 MINUTE AS w FROM events)
SELECT strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts) + INTERVAL 5 MINUTE, '%Y-%m-%d %H:%M:%S')
         AS session_end,
       user_id, count(*) AS n_events
FROM s, wm
GROUP BY user_id, sid, wm.w
HAVING max(ts) + INTERVAL 5 MINUTE <= wm.w
"""

# s04: run 1 drains `recent` and emits its day-windows closed under the
# committed watermark (max recent ts - 1h); run 2's late rows are all
# dropped by the recovered watermark.  Dropped-partials = distinct late
# day-windows (the late slice is one coalesced file -> one map-side
# partial per day-window reaches the state store).
S04_SQL = """
WITH recent AS (SELECT * FROM events WHERE ts >= TIMESTAMP '2024-01-10'),
     late AS (SELECT * FROM events WHERE ts < TIMESTAMP '2024-01-05'),
     wm AS (SELECT max(ts) - INTERVAL 1 HOUR AS w FROM recent),
     emitted AS (
       SELECT date_trunc('day', ts) AS d, count(*) AS n FROM recent, wm
       WHERE date_trunc('day', ts) + INTERVAL 1 DAY <= wm.w GROUP BY 1
     )
SELECT CAST(COALESCE(sum(n), 0) AS BIGINT) AS n_rows_emitted,
       CAST(count(*) AS BIGINT) AS n_days_emitted,
       (SELECT count(DISTINCT date_trunc('day', ts)) FROM late)
         AS n_late_windows_dropped,
       (SELECT count(*) FROM late) AS n_late_input
FROM emitted
"""

# s05: stream x broadcast dim join into day-window counts; closure rule
# as in s01 (delay 10 min).
S05_SQL = """
WITH wm AS (SELECT max(ts) - INTERVAL 10 MINUTE AS w FROM events)
SELECT strftime(date_trunc('day', e.ts), '%Y-%m-%d') AS day,
       c.c_mktsegment,
       count(*) AS n
FROM events e JOIN customer c ON e.user_id = c.c_custkey, wm
WHERE date_trunc('day', e.ts) + INTERVAL 1 DAY <= wm.w
GROUP BY 1, 2
"""

# s06: interval-bounded stream-stream inner join.  Single-batch drain
# means no state was evicted before any match arrived, so the emitted
# set is the full relational join.
S06_SQL = """
SELECT b.event_id AS buy_id, c.event_id AS click_id, b.user_id
FROM events b JOIN events c
  ON b.user_id = c.user_id
 AND c.ts >= b.ts - INTERVAL 5 MINUTE
 AND c.ts <= b.ts
WHERE b.event_type = 'purchase' AND c.event_type = 'click'
"""

# s07: the self-unioned stream deduped by event_id collapses back to the
# original table (both copies share the single micro-batch, so dedup
# state always sees the duplicate).
S07_SQL = """
SELECT event_type, count(*) AS n, count(DISTINCT event_id) AS n_distinct
FROM events GROUP BY event_type
"""

# s08: the final applyInPandasWithState VWAP state after a full drain is
# the batch VWAP (qty == 1 per tick).  The operator accumulates integer
# cents (streaming/core.py::running_vwap), so the twin sums
# round(value*100) as BIGINT and applies the SAME integer half-up
# 4-dp rounding — float sums and ROUND(double) both diverge across
# engines (pairwise vs streaming summation; half-boundary semantics).
S08_SQL = """
SELECT user_id,
       count(*) AS n_events,
       CAST((sum(CAST(round(value * 100) AS BIGINT)) * 20000
             + 100 * count(*))
            // (200 * count(*)) AS DOUBLE) / 10000 AS vwap
FROM events GROUP BY user_id
"""

# s09: exactly-once partitioned parquet sink: reading the sink back
# reproduces the source per-day counts bit-for-bit.
S09_SQL = """
SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
       count(*) AS n,
       count(DISTINCT event_id) AS n_distinct
FROM events GROUP BY 1
"""

# s10: source-zoo success flags — constants when both sources deliver.
S10_SQL = """
SELECT * FROM (VALUES ('rate', true), ('file_json', true)) AS t(source, ok)
"""

# s11's deterministic synthetic tape shares batch q130's closed-form
# oracle.  The import runs at module-import time; that is safe because
# the dependency is strictly one-way (eblock never imports sblock) — if
# sblock semantics ever need to flow into eblock, move this into an
# oracle-lookup-time resolver instead of importing eblock from there.
from .eblock import Q130_SQL as _S11_ORACLE_SQL  # noqa: E402

# s12: the anti-join drops every already-indexed event (event_id <
# split); the self-unioned duplicates collapse under the in-stream
# dedup (single micro-batch, state always sees the twin), so the
# drained output is the plain per-type summary of the new-id band.
S12_SQL = """
WITH s AS (SELECT (max(event_id) * 4) // 5 AS split FROM events)
SELECT event_type, count(*) AS n,
       count(DISTINCT event_id) AS n_distinct,
       min(event_id) AS min_id, max(event_id) AS max_id
FROM events, s WHERE event_id >= split
GROUP BY event_type
"""

ORACLE = {
    "s01_tumbling_candles": S01_SQL,
    "s02_sliding_window": S02_SQL,
    "s03_session_window": S03_SQL,
    "s04_late_data_drop": S04_SQL,
    "s05_stream_static_join": S05_SQL,
    "s06_stream_stream_join": S06_SQL,
    "s07_stream_dedup": S07_SQL,
    "s08_stateful_custom": S08_SQL,
    "s09_sinks": S09_SQL,
    "s10_sources": S10_SQL,
    "s11_python_stream_source": _S11_ORACLE_SQL,
    "s12_incremental_dedup": S12_SQL,
    "s13_scd2_stream_apply": S13_SQL,
    "s14_hll_windowed_stream": S14_SQL,
    "s15_topk_windowed_stream": S15_SQL,
    "s18_funnel_stream": S18_SQL,
    "s19_quantile_stream": S19_SQL,
    "s20_psi_drift_stream": S20_SQL,
    "s21_pit_enrich_stream": S21_SQL,
    "s22_asof_enrich_stream": S22_SQL,
    "s23_topk_drift_stream": S23_SQL,
    "s24_cusum_stream": S24_SQL,
    "s25_rolling_active_stream": S25_SQL,
}
