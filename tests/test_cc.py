"""Large-star/small-star connected components (operators/cc.py):
hand-model correctness, parity with q111's min-label propagation, the
O(log d) adversarial-chain claim, and the loud non-convergence bound.

The staged q197 gate (tests/test_next_rotation.py) checks the full
fixture edge frame against q111's recursive-CTE oracle; these tests
pin what the gate cannot — the round-count advantage and the
convergence contract."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F  # noqa: F401

from live_market_data_orderflow_analysis_big_data_project__spark.operators.cc import (  # noqa: E501
    cc_bigstar,
)
from live_market_data_orderflow_analysis_big_data_project__spark.operators.pipeline import (  # noqa: E501
    dedup_clusters,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "doc_a long, doc_b long")


def _labels(df):
    return {(r.doc_id, r.cluster_id) for r in df.collect()}


def test_hand_components(spark):
    # chain + triangle + pair + duplicate/reversed/self edges tolerated
    pairs = (
        [(i, i + 1) for i in range(5)]
        + [(200, 201), (201, 202), (202, 200)]
        + [(300, 301), (301, 300), (300, 301), (7, 7)]
    )
    got = _labels(cc_bigstar(_edges(spark, pairs)))
    want = (
        {(i, 0) for i in range(6)}
        | {(200, 200), (201, 200), (202, 200)}
        | {(300, 300), (301, 300)}
        | {(7, 7)}  # self-loop: the node exists, alone
    )
    assert got == want


def test_adversarial_chain_converges_in_log_rounds(spark):
    """The reason this operator exists: a diameter-100 path (chained
    template spam) needs ~100 min-label rounds — dedup_clusters'
    default max_iters=15 returns a PARTIAL labeling on it — while
    alternating star rounds finish within 8."""
    chain = [(i, i + 1) for i in range(100)]
    got = _labels(cc_bigstar(_edges(spark, chain), max_rounds=8))
    assert got == {(i, 0) for i in range(101)}
    # the contrast that motivates the operator: min-label propagation
    # at its default budget has NOT converged on this graph
    partial = _labels(dedup_clusters(_edges(spark, chain)))
    assert partial != got


def test_parity_with_min_label_on_random_graphs(spark):
    rng = random.Random(11)
    for seed in range(3):
        rng.seed(seed * 997 + 11)
        pairs = [
            (rng.randrange(300), rng.randrange(300)) for _ in range(120)
        ]
        pairs = [(a, b) for a, b in pairs if a != b]
        e = _edges(spark, pairs)
        assert _labels(cc_bigstar(e)) == _labels(dedup_clusters(e)), seed


def test_nonconvergence_raises_loudly(spark):
    chain = [(i, i + 1) for i in range(100)]
    with pytest.raises(ValueError, match="fixpoint"):
        cc_bigstar(_edges(spark, chain), max_rounds=1)
