"""concentration_metrics semantics (operators/concentration.py)."""

from __future__ import annotations

from live_market_data_orderflow_analysis_big_data_project__spark.operators.concentration import (  # noqa: E501
    concentration_metrics,
)

from pyspark.sql import functions as F


def _run(spark, rows):
    df = spark.createDataFrame(rows, "g string, actor long, cents long")
    out = concentration_metrics(df, ["g"], "actor", F.col("cents"))
    return {r["g"]: r for r in out.collect()}


def test_perfect_equality_gini_zero(spark):
    rows = [("a", i, 100) for i in range(10)]
    r = _run(spark, rows)["a"]
    assert abs(r["gini"]) < 1e-15
    assert r["hhi"] == 0.1                   # 10 equal actors -> 1/10
    assert r["top_decile_share"] == 0.1      # ceil(10/10)=1 actor


def test_total_monopoly_high_gini_hhi_one(spark):
    rows = [("a", 1, 1000)] + [("a", i, 0) for i in range(2, 11)]
    r = _run(spark, rows)["a"]
    assert r["hhi"] == 1.0
    assert r["gini"] == 0.9                  # (n-1)/n for one-holder
    assert r["top_decile_share"] == 1.0


def test_gini_matches_closed_form(spark):
    xs = [1, 2, 3, 4, 10]
    rows = [("a", i, x) for i, x in enumerate(xs)]
    n, b = len(xs), sum(xs)
    rx = sum((i + 1) * x for i, x in enumerate(sorted(xs)))
    expect = (2.0 * rx - (n + 1.0) * b) / (n * b)
    assert abs(_run(spark, rows)["a"]["gini"] - expect) < 1e-15


def test_actor_totals_aggregated_before_ranking(spark):
    # actor 1 split over two rows must count as ONE actor of 200.
    rows = [("a", 1, 150), ("a", 1, 50), ("a", 2, 200)]
    r = _run(spark, rows)["a"]
    assert r["n_actors"] == 2
    assert r["total_cents"] == 400
    assert abs(r["gini"]) < 1e-15            # two equal actors
    assert r["hhi"] == 0.5


def test_top_decile_is_ceil_and_tie_broken(spark):
    # n=11 -> ceil(11/10)=2 top actors (by value desc, id desc on ties)
    rows = [("a", i, 10) for i in range(9)] + [("a", 100, 50), ("a", 101, 50)]
    r = _run(spark, rows)["a"]
    assert r["top_decile_share"] == 100 / 190
