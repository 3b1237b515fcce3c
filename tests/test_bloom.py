"""Expression-level bloom filter (operators/bloom.py + q106b).

The operator's contract is exactness-through-approximation: the bloom
pass may ADMIT extra rows (false positives) but may never DROP a match
(false negatives), and the confirm join erases the difference — so the
bloom-prefiltered join must be row-identical to the exact join at ANY
bloom sizing, including deliberately undersized bitmaps where false
positives are guaranteed.  Plus the two properties that make it the
scale path: the pre-pass actually prunes (selectivity), and the whole
probe is JVM expressions (no Python in the plan).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from live_market_data_orderflow_analysis_big_data_project__spark.operators.bloom import (
    bloom_build,
    bloom_might_contain,
    bloom_prefilter_join,
)
from live_market_data_orderflow_analysis_big_data_project__spark.operators.llmops import (
    shingles_col,
)
from live_market_data_orderflow_analysis_big_data_project__spark.operators.pipeline import (
    decontaminate,
    decontaminate_bloom,
)
from live_market_data_orderflow_analysis_big_data_project__spark.sources.tables import (
    load_table,
)

from live_market_data_orderflow_analysis_big_data_project__spark.queries.pblock import (
    _EVAL_SOURCE,
)

from conftest import SF001


def _split(spark):
    # the SAME split q106/q106b gate on (pblock._EVAL_SOURCE) — an ad-hoc
    # source label here once made the eval set EMPTY and every assertion
    # below vacuous (0 rows == 0 rows); _nonempty guards that regression
    d = load_table(spark, SF001, "documents")
    corpus = d.filter(F.col("source") != _EVAL_SOURCE)
    eval_set = d.filter(F.col("source") == _EVAL_SOURCE)
    return corpus, eval_set


def _nonempty(df):
    n = df.count()
    assert n > 0
    return n


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_no_false_negatives_every_inserted_key_passes(spark):
    keys = spark.range(0, 500).select(
        F.concat(F.lit("k"), F.col("id")).alias("key")
    )
    # deliberately tiny bitmap: heavy collisions, still zero false negatives
    bloom = bloom_build(keys, "key", m_bits=256, k=3)
    admitted = (
        keys.crossJoin(F.broadcast(bloom))
        .where(bloom_might_contain(F.col("key"), F.col("bloom_bits"), 256, 3))
        .count()
    )
    assert admitted == 500


def test_prefilter_join_equals_exact_join_even_undersized(spark):
    big = spark.range(0, 2000).select(
        F.concat(F.lit("v"), F.col("id")).alias("key"), F.col("id").alias("payload")
    )
    small = spark.range(0, 100).select(
        F.concat(F.lit("v"), (F.col("id") * 20)).alias("key")
    )
    exact = big.join(small, "key")
    for m_bits, k in ((1 << 20, 5), (512, 2)):  # well-sized and FP-riddled
        got = bloom_prefilter_join(big, small, "key", m_bits=m_bits, k=k)
        assert _rows(got) == _rows(exact), (m_bits, k)


def test_undersized_bitmap_really_produces_false_positives(spark):
    """Guards the previous test's meaning: at (512, 2) the pre-pass
    admits non-matches, so the equivalence above genuinely exercises
    the confirm join's FP removal."""
    big = spark.range(0, 2000).select(
        F.concat(F.lit("v"), F.col("id")).alias("key")
    )
    small = spark.range(0, 100).select(
        F.concat(F.lit("v"), (F.col("id") * 20)).alias("key")
    )
    bloom = bloom_build(small.distinct(), "key", m_bits=512, k=2)
    admitted = (
        big.crossJoin(F.broadcast(bloom))
        .where(bloom_might_contain(F.col("key"), F.col("bloom_bits"), 512, 2))
        .count()
    )
    assert admitted > 100  # every true match plus a real FP population


def test_q106b_equals_q106_and_prunes(spark):
    corpus, eval_set = _split(spark)
    _nonempty(eval_set)
    exact = decontaminate(corpus, eval_set, n=5)
    assert _nonempty(exact) > 0  # contaminated docs exist: non-vacuous
    bloomed = decontaminate_bloom(corpus, eval_set, n=5)
    assert _rows(bloomed) == _rows(exact)

    # selectivity: the pre-pass admits a small fraction of the corpus
    # shingle stream (matches + ~fp_rate of the rest)
    corpus_sh = corpus.select(
        "doc_id", F.explode(shingles_col("text", 5)).alias("shingle")
    )
    eval_sh = eval_set.select(
        F.explode(shingles_col("text", 5)).alias("shingle")
    ).distinct()
    bloom = bloom_build(eval_sh, "shingle")
    total = corpus_sh.count()
    admitted = (
        corpus_sh.crossJoin(F.broadcast(bloom))
        .where(
            bloom_might_contain(F.col("shingle"), F.col("bloom_bits"))
        )
        .count()
    )
    true_matches = corpus_sh.join(F.broadcast(eval_sh), "shingle").count()
    assert true_matches <= admitted < 0.5 * total


def test_probe_is_pure_expressions_no_python(spark):
    corpus, eval_set = _split(spark)
    plan = decontaminate_bloom(corpus, eval_set, n=5)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row bitmap ride-in


def test_outer_join_rejected(spark):
    big = spark.range(3).select(F.col("id").cast("string").alias("key"))
    with pytest.raises(ValueError):
        bloom_prefilter_join(big, big, "key", how="left")
