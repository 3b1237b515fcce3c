"""mad_outlier_stats: lower-median selection, MAD, integer k-MAD gate."""

from __future__ import annotations

from live_market_data_orderflow_analysis_big_data_project__spark.operators.robust import (
    cents,
    mad_outlier_stats,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "g string, id long, v double")


def _stats(spark, rows, k=3):
    out = mad_outlier_stats(_df(spark, rows), ["g"], "v", "id", k=k)
    return {r["g"]: r for r in out.collect()}


def test_lower_median_even_count(spark):
    # sorted cents: 100 200 300 400 -> lower median = row (n+1) div 2 = 2nd
    rows = [("a", i, v) for i, v in enumerate([1.0, 2.0, 3.0, 4.0])]
    assert _stats(spark, rows)["a"]["med_cents"] == 200


def test_median_odd_count_and_mad(spark):
    # values 1..5 -> med 300; devs 200 100 0 100 200 -> mad 100
    rows = [("a", i, float(v)) for i, v in enumerate([1, 2, 3, 4, 5])]
    r = _stats(spark, rows)["a"]
    assert r["med_cents"] == 300 and r["mad_cents"] == 100


def test_outlier_gate_is_strict_k_mad(spark):
    # med=300, mad=100 -> threshold dev > 300; value 10.0 has dev 700
    rows = [("a", i, float(v)) for i, v in enumerate([1, 2, 3, 4, 5])]
    rows.append(("a", 99, 10.0))
    r = _stats(spark, rows)["a"]
    # med shifts to lower-median of 6 values (3rd of sorted) = 300
    assert r["med_cents"] == 300
    assert r["n_outliers"] == 1
    assert r["outlier_rate"] == 1 / 6


def test_groups_are_independent(spark):
    rows = [("a", 1, 1.0), ("a", 2, 2.0), ("b", 1, 100.0), ("b", 2, 200.0)]
    s = _stats(spark, rows)
    assert s["a"]["med_cents"] == 100 and s["b"]["med_cents"] == 10000


def test_cents_fixes_two_decimal_doubles_exactly(spark):
    df = spark.createDataFrame([(185.22,), (0.01,), (499.99,)], "v double")
    got = [r[0] for r in df.select(cents("v")).collect()]
    assert got == [18522, 1, 49999]


def test_constant_group_mad_zero_no_outliers(spark):
    rows = [("a", i, 5.0) for i in range(4)]
    r = _stats(spark, rows)["a"]
    assert r["mad_cents"] == 0 and r["n_outliers"] == 0
