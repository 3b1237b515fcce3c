"""Custom Python data source (sources/pydatasource.py): planner
integration, partitioned parallel reads, closed-form determinism."""

from __future__ import annotations

from datetime import datetime

from live_market_data_orderflow_analysis_big_data_project__spark.sources.pydatasource import (
    BASE_TS,
    N_INSTRUMENTS,
    PRICE_MULT,
    register,
)


def _load(spark, n, parts):
    register(spark)
    return (
        spark.read.format("tick_synth")
        .option("n", n)
        .option("numPartitions", parts)
        .load()
    )


def test_row_count_and_uniqueness(spark):
    df = _load(spark, 100, 7)
    assert df.count() == 100
    assert df.select("tick_id").distinct().count() == 100


def test_reads_are_partitioned(spark):
    df = _load(spark, 100, 7)
    assert df.rdd.getNumPartitions() == 7
    # Uneven split: ceil(100/7)=15 per slice -> last slice short, none empty.
    sizes = df.rdd.glom().map(len).collect()
    assert sum(sizes) == 100 and all(s > 0 for s in sizes)


def test_closed_form_values(spark):
    rows = {r.tick_id: r for r in _load(spark, 50, 3).collect()}
    for i in (0, 7, 49):
        r = rows[i]
        assert r.instrument == f"INS{i % N_INSTRUMENTS}"
        assert r.price == 100.0 + ((i * PRICE_MULT) % 1000) / 100.0
        assert r.qty == i % 50 + 1
        assert isinstance(r.ts, datetime)
        assert (r.ts - BASE_TS).total_seconds() == i


def test_deterministic_across_reads(spark):
    a = sorted(map(tuple, _load(spark, 200, 4).collect()))
    b = sorted(map(tuple, _load(spark, 200, 8).collect()))
    assert a == b  # partition count must not change content


def test_stream_reader_multi_batch_exactly_once(spark):
    register(spark)
    sdf = (
        spark.readStream.format("tick_synth")
        .option("maxTicks", 3000)
        .option("rowsPerBatch", 1000)
        .option("numPartitions", 4)
        .load()
    )
    from live_market_data_orderflow_analysis_big_data_project__spark.streaming.core import (
        run_paced_to_memory,
    )

    out = run_paced_to_memory(sdf, "t_stream_src", expected_rows=3000)
    ids = [r.tick_id for r in out.select("tick_id").collect()]
    # Exactly-once across micro-batches: every tick once, none lost or
    # duplicated at the batch boundaries (offsets cover [0, n) exactly).
    assert len(ids) == 3000 and len(set(ids)) == 3000
    assert min(ids) == 0 and max(ids) == 2999


def test_stream_matches_batch(spark):
    register(spark)
    batch = (
        spark.read.format("tick_synth")
        .option("n", 2000)
        .option("numPartitions", 4)
        .load()
    )
    sdf = (
        spark.readStream.format("tick_synth")
        .option("maxTicks", 2000)
        .option("rowsPerBatch", 700)
        .option("numPartitions", 3)
        .load()
    )
    from live_market_data_orderflow_analysis_big_data_project__spark.streaming.core import (
        run_paced_to_memory,
    )

    stream = run_paced_to_memory(sdf, "t_stream_parity", expected_rows=2000)
    assert sorted(map(tuple, stream.collect())) == sorted(
        map(tuple, batch.collect())
    )


def test_stream_checkpoint_restart_exactly_once(spark, tmp_path):
    """Kill the paced stream mid-tape, restart from the checkpoint, and
    verify the parquet sink holds every tick exactly once — the offset
    log + partitions-cover-[start,end) contract under restart.

    Note the reader instance is rebuilt on restart, so its paced
    availability counter restarts from 0; the engine resumes from the
    COMMITTED offset and simply waits out polls until availability
    passes it — no rows lost, none duplicated.
    """
    import time

    register(spark)
    out_dir, ckpt = str(tmp_path / "data"), str(tmp_path / "ckpt")

    def start():
        sdf = (
            spark.readStream.format("tick_synth")
            .option("maxTicks", 3000)
            .option("rowsPerBatch", 500)
            .option("numPartitions", 3)
            .load()
        )
        return (
            sdf.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(processingTime="0 seconds")
            .start()
        )

    q = start()
    deadline = time.time() + 60
    while time.time() < deadline:
        try:
            if spark.read.parquet(out_dir).count() >= 1000:
                break
        except Exception:
            pass  # sink dir not created yet
        time.sleep(0.2)
    q.stop()  # mid-tape kill
    q.awaitTermination(30)
    n_mid = spark.read.parquet(out_dir).count()
    assert 500 <= n_mid < 3000, f"expected a mid-tape stop, got {n_mid}"

    q2 = start()
    deadline = time.time() + 90
    while time.time() < deadline:
        if spark.read.parquet(out_dir).count() >= 3000:
            break
        time.sleep(0.2)
    q2.stop()
    q2.awaitTermination(30)

    back = spark.read.parquet(out_dir)
    ids = [r.tick_id for r in back.select("tick_id").collect()]
    assert len(ids) == 3000, f"got {len(ids)} rows"
    assert len(set(ids)) == 3000
    assert min(ids) == 0 and max(ids) == 2999
