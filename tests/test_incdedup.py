"""operators/incdedup.py — incremental SimHash near-dup.

The staged gate (q149) hash-checks against the full-corpus per-bit
SQL oracle at two sfs; these pin the structural claims: the
incremental result EQUALS the batch operator's full pair set
restricted to shard-involving pairs (the index-and-merge contract),
no (old x old) pair is ever emitted, and the band frame is
candidate-compatible with the batch operator's banding.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from live_market_data_orderflow_analysis_big_data_project__spark.operators.incdedup import (
    simhash_band_frame,
    simhash_incremental_pairs,
)
from live_market_data_orderflow_analysis_big_data_project__spark.operators.llmops import (
    simhash_fingerprints_long,
    simhash_near_dup_pairs,
)

from conftest import SF0001

_SPLIT = 399  # (499 * 4) div 5 for the 500-doc sf0.001 fixture


def _docs(spark):
    return spark.read.parquet(f"{SF0001}/documents.parquet").select(
        "doc_id", "text"
    )


def test_incremental_equals_restricted_global(spark):
    docs = _docs(spark)
    index_fps = simhash_fingerprints_long(docs.filter(F.col("doc_id") < _SPLIT))
    inc = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_incremental_pairs(
            index_fps, docs.filter(F.col("doc_id") >= _SPLIT), max_hamming=2
        ).collect()
    }
    full = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_near_dup_pairs(docs, max_hamming=2).collect()
    }
    want = {(a, b, h) for (a, b, h) in full if b >= _SPLIT}
    assert inc == want
    assert len(inc) > 0  # the fixture genuinely exercises the path
    # and the restriction is real: some old x old pairs were excluded
    assert len(want) < len(full)


def test_no_old_old_pairs(spark):
    docs = _docs(spark)
    index_fps = simhash_fingerprints_long(docs.filter(F.col("doc_id") < _SPLIT))
    out = simhash_incremental_pairs(
        index_fps, docs.filter(F.col("doc_id") >= _SPLIT)
    )
    assert out.filter(F.col("doc_b") < _SPLIT).count() == 0


def test_band_frame_shape(spark):
    fps = simhash_fingerprints_long(_docs(spark).limit(50))
    bands = simhash_band_frame(fps, n_bits=32, n_bands=4)
    rows = bands.groupBy("doc").agg(
        F.count("*").alias("n"),
        F.countDistinct("band").alias("nb"),
        F.max("bkey").alias("mx"),
        F.min("bkey").alias("mn"),
    ).collect()
    assert all(r.n == 4 and r.nb == 4 for r in rows)
    assert all(0 <= r.mn and r.mx <= 255 for r in rows)  # 8-bit band keys
