"""operators/sampling.py — deterministic systematic PPS sampling.

The staged gate (q147) proves row-level parity with the SQL oracle at
two sfs; these pin the design invariants: exact ticket totals,
certainty-unit multiplicity, partitioning invariance (the
reproducibility contract), mass exclusion, and plan purity.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from live_market_data_orderflow_analysis_big_data_project__spark.operators.sampling import (
    pps_sample,
)

from conftest import SF001


def _docs(spark):
    return spark.read.parquet(f"{SF001}/documents.parquet").select(
        "doc_id",
        "lang",
        "n_chars",
        F.md5(F.col("text").cast("binary")).alias("k"),
    )


def test_exact_ticket_total_per_stratum(spark):
    out = pps_sample(_docs(spark), ["lang"], "n_chars", 20, "k", "doc_id")
    rows = out.groupBy("lang").agg(F.sum("n_tickets").alias("t")).collect()
    assert len(rows) == 5 and all(r.t == 20 for r in rows)


def test_certainty_unit_gets_multiplicity(spark):
    # One row holds ~2/3 of the stratum mass: with n=6 tickets and
    # stride W/6 it MUST draw >= 3 tickets (unbiased PPS keeps
    # multiplicity; clamping would bias Horvitz-Thompson totals).
    rows = [("s", i, 10) for i in range(10)] + [("s", 99, 200)]
    df = spark.createDataFrame(rows, "g string, id long, w long")
    out = pps_sample(df, ["g"], "w", 6, F.col("id"), F.col("id")).collect()
    got = {r.id: r.n_tickets for r in out}
    assert sum(got.values()) == 6
    assert got[99] >= 3


def test_partitioning_invariance(spark):
    base = _docs(spark)
    a = pps_sample(base, ["lang"], "n_chars", 20, "k", "doc_id")
    b = pps_sample(
        base.repartition(7, "doc_id"), ["lang"], "n_chars", 20, "k", "doc_id"
    )
    ra = sorted((r.doc_id, r.n_tickets) for r in a.collect())
    rb = sorted((r.doc_id, r.n_tickets) for r in b.collect())
    assert ra == rb


def test_nonpositive_and_null_weights_carry_no_mass(spark):
    rows = [("s", 1, 5), ("s", 2, 0), ("s", 3, None), ("s", 4, 5)]
    df = spark.createDataFrame(rows, "g string, id long, w long")
    out = pps_sample(df, ["g"], "w", 2, F.col("id"), F.col("id")).collect()
    ids = {r.id for r in out}
    assert 2 not in ids and 3 not in ids
    assert sum(r.n_tickets for r in out) == 2


def test_no_python_in_plan(spark):
    plan = (
        pps_sample(_docs(spark), ["lang"], "n_chars", 20, "k", "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# ---------------------------------------------------------------------------
# weighted_sample_race — the A-ES law in exact integers (staged gate q181)
# ---------------------------------------------------------------------------

def _race_model(rows, n):
    """Pure-Python reimplementation: per stratum, rank items by the
    minimum md5(id:t) over t = 1..w and keep the top n."""
    import hashlib
    from collections import defaultdict

    best = defaultdict(list)
    for g, i, w in rows:
        if w is None or w <= 0:
            continue
        mk = min(
            hashlib.md5(f"{i}:{t}".encode()).hexdigest()
            for t in range(1, w + 1)
        )
        best[g].append((mk, i, w))
    out = {}
    for g, items in best.items():
        for rank, (mk, i, w) in enumerate(sorted(items), start=1):
            if rank <= n:
                out[(g, i)] = (w, rank)
    return out


def test_race_equals_python_model(spark):
    from live_market_data_orderflow_analysis_big_data_project__spark.operators.sampling import (  # noqa: E501
        weighted_sample_race,
    )

    rows = [("a", i, (i * 7) % 5 + 1) for i in range(40)] + [
        ("b", 100 + i, 1 + (i % 3) * 10) for i in range(25)
    ]
    df = spark.createDataFrame(rows, "g string, id long, w long")
    got = {
        (r.g, r.id): (r.weight, r.rank)
        for r in weighted_sample_race(df, ["g"], "w", 7, "id").collect()
    }
    assert got == _race_model(rows, 7)


def test_race_exactly_n_per_stratum_when_enough_items(spark):
    from live_market_data_orderflow_analysis_big_data_project__spark.operators.sampling import (  # noqa: E501
        weighted_sample_race,
    )

    rows = [("g1", i, 3) for i in range(20)] + [("g2", 50, 5)]
    df = spark.createDataFrame(rows, "g string, id long, w long")
    out = weighted_sample_race(df, ["g"], "w", 4, "id")
    counts = {r.g: r.c for r in
              out.groupBy("g").agg(F.count("*").alias("c")).collect()}
    # g1 has 20 candidates -> exactly 4; g2 has one -> all of it
    assert counts == {"g1": 4, "g2": 1}
    ranks = [r.rank for r in out.where(F.col("g") == "g1").collect()]
    assert sorted(ranks) == [1, 2, 3, 4]


def test_race_partitioning_invariance(spark):
    from live_market_data_orderflow_analysis_big_data_project__spark.operators.sampling import (  # noqa: E501
        weighted_sample_race,
    )

    rows = [("s", i, i % 6 + 1) for i in range(60)]
    df = spark.createDataFrame(rows, "g string, id long, w long")
    a = set(
        (r.g, r.id, r.rank)
        for r in weighted_sample_race(
            df.repartition(1), ["g"], "w", 9, "id"
        ).collect()
    )
    b = set(
        (r.g, r.id, r.rank)
        for r in weighted_sample_race(
            df.repartition(13, "id"), ["g"], "w", 9, "id"
        ).collect()
    )
    assert a == b


def test_race_weight_monotonicity_in_aggregate(spark):
    """The law's direction, not its exact probabilities: over many
    strata, items with weight 9 must be selected far more often than
    weight-1 items (9x the tickets -> ~9x the win rate at n=1)."""
    from live_market_data_orderflow_analysis_big_data_project__spark.operators.sampling import (  # noqa: E501
        weighted_sample_race,
    )

    rows = []
    for s in range(200):
        rows.append((f"s{s}", s * 10, 9))       # one heavy item
        rows += [(f"s{s}", s * 10 + j, 1) for j in range(1, 10)]
    df = spark.createDataFrame(rows, "g string, id long, w long")
    out = weighted_sample_race(df, ["g"], "w", 1, "id")
    heavy_wins = out.where(F.col("weight") == 9).count()
    # E[heavy wins] = 200 * 9/18 = 100; binomial sd ~ 7.  > 60 is a
    # > 5-sigma floor — fails only if the law is wrong, not by luck.
    assert heavy_wins > 60, heavy_wins


def test_race_oversized_weight_fails_loudly(spark):
    """The r11 ADVICE divergence class: an int sequence bound would
    WRAP a weight past 2^31-1 under ANSI-off and descend from 1 —
    wrong tickets with no error.  With long bounds the oversized
    weight must hit Spark's sequence-length cap and fail LOUDLY."""
    import pytest

    from live_market_data_orderflow_analysis_big_data_project__spark.operators.sampling import (  # noqa: E501
        weighted_sample_race,
    )

    df = spark.createDataFrame(
        [("s", 1, 2**31 + 10)], "g string, id long, w long"
    )
    with pytest.raises(Exception, match="(?i)array|sequence|exceed"):
        weighted_sample_race(df, ["g"], "w", 1, "id").collect()


def test_race_no_python_in_plan(spark):
    from live_market_data_orderflow_analysis_big_data_project__spark.operators.sampling import (  # noqa: E501
        weighted_sample_race,
    )

    df = spark.createDataFrame(
        [("s", 1, 2), ("s", 2, 3)], "g string, id long, w long"
    )
    plan = (
        weighted_sample_race(df, ["g"], "w", 1, "id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
