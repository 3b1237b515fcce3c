"""mad_outlier_stats: lower-median selection, MAD, integer k-MAD gate."""

from __future__ import annotations

from live_market_data_orderflow_analysis_big_data_project__spark.operators.robust import (
    cents,
    mad_outlier_stats,
    seasonal_outliers,
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


# --- weighted_quantile_stats ------------------------------------------------

def test_weighted_median_follows_weight_mass(spark):
    from live_market_data_orderflow_analysis_big_data_project__spark.operators.robust import (  # noqa: E501
        weighted_quantile_stats,
    )

    # values 1.00/2.00/3.00 with weights 1/1/10: half the mass (6 of 12)
    # is reached only at 3.00.
    df = spark.createDataFrame(
        [("g", 1.00, 1, 1), ("g", 2.00, 1, 2), ("g", 3.00, 10, 3)],
        "g string, v double, w long, id long",
    )
    r = weighted_quantile_stats(df, ["g"], "v", "w", "id").collect()[0]
    assert r["total_weight"] == 12
    assert r["wmedian_cents"] == 300
    assert r["wp90_cents"] == 300


def test_weighted_median_exact_boundary_lower_selection(spark):
    from live_market_data_orderflow_analysis_big_data_project__spark.operators.robust import (  # noqa: E501
        weighted_quantile_stats,
    )

    # weights 1/1: cum*2 >= W at the FIRST row (2*1 >= 2) -> lower value.
    df = spark.createDataFrame(
        [("g", 5.00, 1, 1), ("g", 9.00, 1, 2)],
        "g string, v double, w long, id long",
    )
    r = weighted_quantile_stats(df, ["g"], "v", "w", "id").collect()[0]
    assert r["wmedian_cents"] == 500
    assert r["wp90_cents"] == 900


def test_zero_weight_rows_never_shift_quantiles(spark):
    from live_market_data_orderflow_analysis_big_data_project__spark.operators.robust import (  # noqa: E501
        weighted_quantile_stats,
    )

    base = [("g", 1.00, 1, 1), ("g", 2.00, 1, 2)]
    with_zero = base + [("g", 0.50, 0, 3), ("g", 9.00, 0, 4)]
    out = {}
    for tag, rows in (("base", base), ("zero", with_zero)):
        df = spark.createDataFrame(
            rows, "g string, v double, w long, id long"
        )
        out[tag] = weighted_quantile_stats(
            df, ["g"], "v", "w", "id"
        ).collect()[0]
    assert out["base"]["wmedian_cents"] == out["zero"]["wmedian_cents"]
    assert out["base"]["wp90_cents"] == out["zero"]["wp90_cents"]
    assert out["zero"]["n_rows"] == 4 and out["zero"]["total_weight"] == 2


def test_weighted_quantiles_equal_weights_match_unweighted_median(spark):
    from live_market_data_orderflow_analysis_big_data_project__spark.operators.robust import (  # noqa: E501
        mad_outlier_stats,
        weighted_quantile_stats,
    )

    rows = [("g", float(v), 1, i) for i, v in enumerate([7, 1, 5, 3, 9])]
    df = spark.createDataFrame(rows, "g string, v double, w long, id long")
    wq = weighted_quantile_stats(df, ["g"], "v", "w", "id").collect()[0]
    mad = mad_outlier_stats(df, ["g"], "v", "id").collect()[0]
    assert wq["wmedian_cents"] == mad["med_cents"] == 500


def _sdf(spark, rows):
    # rows: (g, season, id, x) with x already an exact int64
    return spark.createDataFrame(
        rows, "g string, season long, id long, x long"
    )


def test_seasonal_outliers_matches_hand_model(spark):
    # season 0: {10, 12, 14, 100} -> med 12 (lower), devs {2,0,2,88},
    # MAD = 2 (lower of {0,2,2,88}) -> only 100 flags at k=3
    rows = [("g", 0, i, x) for i, x in enumerate([10, 12, 14, 100])]
    out = {
        r.id: r
        for r in seasonal_outliers(
            _sdf(spark, rows), ["g"], "season", "x", "id", 3
        ).collect()
    }
    assert out[3].med_x == 12 and out[3].mad_x == 2
    assert out[3].dev_x == 88 and out[3].is_outlier is True
    assert [out[i].is_outlier for i in range(3)] == [False] * 3


def test_seasonality_unmasks_and_excuses(spark):
    # Mondays (season 1) run ~100, Sundays (season 0) run ~10.
    # A 100 on a SUNDAY is seasonal-anomalous even though 100 is
    # globally common; a 100 on a Monday is seasonal-normal.
    rows = (
        [("g", 1, i, 100 + (i % 3)) for i in range(6)]     # Mondays
        + [("g", 0, 10 + i, 10 + (i % 3)) for i in range(6)]  # Sundays
        + [("g", 0, 99, 100)]                              # odd Sunday
    )
    out = {
        r.id: r
        for r in seasonal_outliers(
            _sdf(spark, rows), ["g"], "season", "x", "id", 3
        ).collect()
    }
    assert out[99].is_outlier is True        # unmasked by seasonality
    assert all(not out[i].is_outlier for i in range(6))  # excused
    # sanity: the whole frame comes back, one row per input
    assert len(out) == len(rows)


def test_seasonal_groups_and_seasons_are_independent(spark):
    rows = [
        ("a", 0, 1, 10), ("a", 0, 2, 12), ("a", 0, 3, 14),
        ("a", 1, 4, 1000), ("a", 1, 5, 1002), ("a", 1, 6, 1004),
        ("b", 0, 7, 5), ("b", 0, 8, 6), ("b", 0, 9, 7),
    ]
    out = seasonal_outliers(
        _sdf(spark, rows), ["g"], "season", "x", "id", 3
    ).collect()
    meds = {(r.g, r.season): r.med_x for r in out}
    assert meds == {("a", 0): 12, ("a", 1): 1002, ("b", 0): 6}
    assert not any(r.is_outlier for r in out)


def test_q192_fixture_binding(spark):
    """Binding discipline at BOTH gate sfs: the seasonal screen must
    flag SOME days and pass others (a gate whose boolean column is
    constant degenerates to the integer columns alone)."""
    from conftest import SF0001, SF001

    from live_market_data_orderflow_analysis_big_data_project__spark.queries.ablock import (  # noqa: E501
        q192_seasonal_outliers,
    )

    for sf in (SF0001, SF001):
        flags = [
            r.is_outlier for r in q192_seasonal_outliers(spark, sf).collect()
        ]
        assert any(flags) and not all(flags), (sf, sum(flags), len(flags))
