"""Streaming incremental banded-LSH ingest (the s26 staged entry):
multi-batch delivery parity (per-batch fingerprinting cannot change
the pair set), and the gate-fixture pair-class bindings the oracle
hash alone doesn't separate."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from live_market_data_orderflow_analysis_big_data_project__spark.operators.incdedup import (  # noqa: E501
    banded_pairs_from_fps,
    simhash_incremental_pairs,
)
from live_market_data_orderflow_analysis_big_data_project__spark.operators.llmops import (  # noqa: E501
    simhash_fingerprints_long,
)
from live_market_data_orderflow_analysis_big_data_project__spark.queries.staging import (  # noqa: E501
    s26_incremental_lsh_stream,
)
from live_market_data_orderflow_analysis_big_data_project__spark.streaming.core import (  # noqa: E501
    foreach_batch_sink,
    stream_events_dir,
    write_replay_files,
)

from conftest import SF0001, SF001


def test_multibatch_delivery_matches_single_batch(spark):
    """The batch-invariance claim behind s26's no-splice oracle:
    fingerprinting each micro-batch independently and unioning the
    stores gives the SAME pair set as fingerprinting the whole shard
    at once — delivered here as 3 genuine micro-batches
    (maxFilesPerTrigger=1 over mtime-ordered replay files)."""
    docs = spark.read.parquet(f"{SF0001}/documents.parquet").select(
        "doc_id", "text"
    )
    split = docs.agg(
        F.expr("(max(doc_id) * 4) div 5").alias("s")
    ).collect()[0].s
    index_docs = docs.where(F.col("doc_id") < split)
    shard_docs = docs.where(F.col("doc_id") >= split)
    index_fps = simhash_fingerprints_long(index_docs).localCheckpoint(
        eager=True
    )

    # batch reference: the whole shard fingerprinted at once
    want = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in banded_pairs_from_fps(
            index_fps,
            simhash_fingerprints_long(shard_docs),
        ).collect()
    }
    # and the raw-text operator agrees (the q149 path)
    assert want == {
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_incremental_pairs(
            index_fps, shard_docs
        ).collect()
    }

    # streamed: 3 ordered micro-batches through the s26 store pattern
    parts = [
        shard_docs.where(F.col("doc_id") % 3 == i) for i in range(3)
    ]
    glob = write_replay_files(parts)
    sdf = stream_events_dir(
        spark,
        glob,
        shard_docs.schema,
        max_files_per_trigger=1,
    )
    base = tempfile.mkdtemp(prefix="t_s26_")
    store = os.path.join(base, "fps")
    batch_ids = []

    def fp_batch(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        batch_ids.append(batch_id)
        simhash_fingerprints_long(batch_df).write.mode(
            "overwrite"
        ).parquet(os.path.join(store, f"batch_id={batch_id}"))

    q = foreach_batch_sink(sdf, fp_batch, os.path.join(base, "ckpt"))
    assert q.awaitTermination(300), "drain timed out"
    assert len(batch_ids) == 3, batch_ids  # genuinely sequential
    shard_fps = spark.read.parquet(store).drop("batch_id")
    got = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in banded_pairs_from_fps(index_fps, shard_fps).collect()
    }
    assert got == want


def test_gate_emits_both_pair_classes(spark):
    """At both gate sfs the drained pair set contains (shard x index)
    AND (shard x shard) members — the two classes the incremental
    contract must cover (a vacuous class would gate nothing)."""
    for sf in (SF0001, SF001):
        docs = spark.read.parquet(f"{sf}/documents.parquet").where(
            F.col("doc_id") < 1000
        )
        split = docs.agg(
            F.expr("(max(doc_id) * 4) div 5").alias("s")
        ).collect()[0].s
        rows = s26_incremental_lsh_stream(spark, sf).collect()
        cross = [r for r in rows if r.doc_a < split <= r.doc_b]
        within = [r for r in rows if r.doc_a >= split]
        assert cross, sf
        assert within, sf
        # old x old pairs must NOT be emitted (the incremental point)
        assert not [r for r in rows if r.doc_b < split], sf
