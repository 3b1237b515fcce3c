"""functions/pandasudfs.py lower_median_cents — the grouped-agg pandas
UDF surface (staged gate q179): Series -> scalar inside
``groupBy().agg()``, the one Python-UDF matrix cell q80-q84 leave
uncovered.  The gate proves SQL parity; these pin the semantics and
that the API cell is actually exercised."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF0001

# NB: functions/pandasudfs imports live INSIDE the tests — pandas_udf
# parses its DDL type at decoration time, which needs an active
# session (the q81 in-function-import convention).


def test_lower_median_semantics(spark):
    from live_market_data_orderflow_analysis_big_data_project__spark.functions.pandasudfs import (  # noqa: E501
        lower_median_cents,
    )

    rows = (
        [("a", v) for v in (4, 1, 3, 2)]      # even n: LOWER median = 2
        + [("b", 5)]                          # singleton
        + [("c", v) for v in (9, 7, 7)]       # duplicates: 7
    )
    df = spark.createDataFrame(rows, "g string, cents long")
    got = {
        r.g: r.med
        for r in df.groupBy("g")
        .agg(lower_median_cents("cents").alias("med"))
        .collect()
    }
    assert got == {"a": 2, "b": 5, "c": 7}


def test_plan_is_grouped_agg_in_pandas(spark):
    """The matrix cell itself: the plan must aggregate THROUGH the
    Arrow grouped-agg operator (ArrowAggregatePython — Spark 4's
    name for AggregateInPandas), not a JVM aggregate — otherwise the
    entry stops proving the API."""
    from live_market_data_orderflow_analysis_big_data_project__spark.functions.pandasudfs import (  # noqa: E501
        lower_median_cents,
    )

    df = spark.createDataFrame([("a", 1), ("a", 2)], "g string, cents long")
    plan = (
        df.groupBy("g")
        .agg(lower_median_cents("cents").alias("med"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowAggregatePython" in plan


def test_lower_choice_binds_on_the_fixture(spark):
    """The (n+1)//2 LOWER-median convention is load-bearing at the
    gate sf: at least one user group has even n with distinct middle
    values, so an upper/interpolated median would hash-diverge."""
    ev = (
        spark.read.parquet(f"{SF0001}/events.parquet")
        .where(F.col("value").isNotNull())
        .select(
            "user_id",
            F.expr(
                "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"
            ).alias("cents"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("cents")
    ranked = ev.select(
        "user_id",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("user_id")).alias("n"),
        "cents",
    ).where(F.col("n") % 2 == 0)
    lo = ranked.where(F.col("rn") == F.expr("n div 2")).select(
        "user_id", F.col("cents").alias("lo")
    )
    hi = ranked.where(F.col("rn") == F.expr("n div 2 + 1")).select(
        "user_id", F.col("cents").alias("hi")
    )
    n_diff = lo.join(hi, "user_id").where(F.col("lo") != F.col("hi")).count()
    assert n_diff > 0
