"""skew_report (operators/skew.py): exact integer diagnostics vs a
literal Python model on synthetic distributions — incl. the hot-key
shape salted_join exists for, and the uniform shape where the factor
must come out ~1."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from live_market_data_orderflow_analysis_big_data_project__spark.operators.skew import (  # noqa: E501
    skew_report,
)


def _model(keys):
    buckets: dict = {}
    for k in keys:
        buckets[k] = buckets.get(k, 0) + 1
    sizes = sorted(buckets.values())
    n_rows, n_keys = len(keys), len(sizes)
    max_b = sizes[-1]
    rank = math.ceil(99 * n_keys / 100)
    p99 = sizes[rank - 1]
    return {
        "n_rows": n_rows,
        "n_keys": n_keys,
        "max_bucket": max_b,
        "p99_bucket": p99,
        "top1_share_ppm": max_b * 1_000_000 // n_rows,
        "skew_factor": (max_b * n_keys + n_rows - 1) // n_rows,
    }


def _run(spark, keys):
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    r = skew_report(df, "k").collect()
    assert len(r) == 1
    return r[0]


def test_hot_key_distribution(spark):
    # 90% of rows on one key over 101 keys — the salted_join case
    keys = [0] * 900 + list(range(1, 101))
    r = _run(spark, keys)
    m = _model(keys)
    for f, want in m.items():
        assert r[f] == want, f
    assert r.skew_factor == 91  # ~x-mean ratio: 900 / (1000/101)
    assert r.p99_bucket == 1


def test_uniform_distribution_factor_is_one(spark):
    keys = [i % 50 for i in range(1000)]
    r = _run(spark, keys)
    m = _model(keys)
    for f, want in m.items():
        assert r[f] == want, f
    assert r.skew_factor == 1


def test_null_keys_count_as_a_key(spark):
    df = spark.createDataFrame(
        [(None,), (None,), (1,), (2,)], "k long"
    )
    r = skew_report(df, "k").collect()[0]
    assert r.n_keys == 3 and r.max_bucket == 2


def test_single_key_degenerate(spark):
    keys = [7] * 20
    r = _run(spark, keys)
    m = _model(keys)
    for f, want in m.items():
        assert r[f] == want, f
    assert r.top1_share_ppm == 1_000_000


def test_label_and_multi_column_keys(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "b")], "k long, g string"
    )
    r = skew_report(df, ["k", "g"], label="pair").collect()[0]
    assert r.keyset == "pair" and r.n_keys == 2 and r.max_bucket == 2
