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
