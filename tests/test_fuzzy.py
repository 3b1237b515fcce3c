"""operators/fuzzy.py — FastSS deletion-neighborhood fuzzy matching.

The staged gate (q146) proves row-level parity with the naive
quadratic oracle at two sfs; these tests pin the algebra itself:
completeness vs a reference DP levenshtein over an adversarial
synthetic set (substitution, insertion, deletion, duplicate, and the
transposition FALSE POSITIVE the verify must remove), variant-set
shape, and the no-Python-in-plan claim.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from live_market_data_orderflow_analysis_big_data_project__spark.operators.fuzzy import (
    deletion_variants,
    fuzzy_pairs,
)

from conftest import SF001


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


WORDS = [
    "kitten",       # base
    "sitten",       # substitution        -> ed 1
    "kittn",        # deletion            -> ed 1
    "kittens",      # insertion           -> ed 1
    "ktiten",       # transposition       -> ed 2: candidate, verified OUT
    "kitten",       # exact duplicate     -> collapsed by distinct
    "mitten",       # substitution        -> ed 1
    "banana",       # unrelated
    "bananas",      # insertion on the unrelated stem
    "a",            # degenerate short string
    "b",            # ed 1 from "a" (substitution on len-1)
]


def test_matches_reference_dp_exactly(spark):
    df = spark.createDataFrame([(w,) for w in WORDS], "s string")
    got = {
        (r.name_a, r.name_b, r.dist)
        for r in fuzzy_pairs(df, "s", tau=1).collect()
    }
    uniq = sorted(set(WORDS))
    want = {
        (a, b, _lev(a, b))
        for i, a in enumerate(uniq)
        for b in uniq[i + 1 :]
        if _lev(a, b) <= 1
    }
    assert got == want
    # the adversarial cases actually occurred: transposition excluded,
    # indel + substitution + len-1 pairs present
    names = {(a, b) for a, b, _ in got}
    assert ("kitten", "ktiten") not in names
    assert ("kitten", "kittens") in names and ("kitten", "kittn") in names
    assert ("a", "b") in names


def test_variant_set_shape(spark):
    row = (
        spark.createDataFrame([("abc",)], "s string")
        .select(deletion_variants("s").alias("v"))
        .collect()[0]
    )
    assert row.v == ["abc", "bc", "ac", "ab"]
    # dedup: "aa" has one distinct deletion, not two
    row = (
        spark.createDataFrame([("aa",)], "s string")
        .select(deletion_variants("s").alias("v"))
        .collect()[0]
    )
    assert row.v == ["aa", "a"]


def test_candidate_buckets_are_neighbor_bounded(spark):
    # The anti-df-skew claim: a variant key holds only strings within
    # ed<=2 of each other (a bucket member is one deletion from the
    # key), so on 1500 sequential customer IDs the largest bucket is a
    # few dozen (measured 29: same-position digit collisions plus
    # shifted-alignment ones), NOT the 1500-string buckets plain
    # q-gram blocking produces from the shared "Customer#" grams.
    cust = spark.read.parquet(f"{SF001}/customer.parquet").select(
        F.col("c_name").alias("s")
    )
    keys = cust.distinct().select(
        "s", F.explode(deletion_variants("s")).alias("v")
    )
    mx = keys.groupBy("v").count().agg(F.max("count")).collect()[0][0]
    assert mx <= 64, mx


def test_no_python_in_plan(spark):
    df = spark.read.parquet(f"{SF001}/customer.parquet").select(
        F.col("c_name").alias("s")
    )
    plan = (
        fuzzy_pairs(df, "s")._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_max_bucket_none_is_exact_and_cap_suppresses_hot_keys(spark):
    df = spark.createDataFrame([(w,) for w in WORDS], "s string")
    exact = {
        (r["name_a"], r["name_b"])
        for r in fuzzy_pairs(df, "s", max_bucket=None).collect()
    }
    # a generous cap changes nothing on a natural-name-shaped domain
    capped_hi = {
        (r["name_a"], r["name_b"])
        for r in fuzzy_pairs(df, "s", max_bucket=64).collect()
    }
    assert capped_hi == exact
    # an adversarial id-dense domain: equal-length strings differing in
    # the LAST char all share the "delete last char" variant key, so a
    # cap below the bucket size suppresses exactly that key; the pairs
    # survive only if another shared key remains (here: none for
    # non-adjacent ids, so the pair set shrinks — the documented lossy
    # mode), and the result is always a SUBSET of exact.
    ids = [(f"id{i:04d}",) for i in range(50)]
    dfi = spark.createDataFrame(ids, "s string")
    full = {
        (r["name_a"], r["name_b"])
        for r in fuzzy_pairs(dfi, "s", max_bucket=None).collect()
    }
    lossy = {
        (r["name_a"], r["name_b"])
        for r in fuzzy_pairs(dfi, "s", max_bucket=8).collect()
    }
    assert lossy <= full
