"""profile_columns semantics on hand fixtures (operators/profile.py)."""

from __future__ import annotations

import pytest

from live_market_data_orderflow_analysis_big_data_project__spark.operators.profile import (  # noqa: E501
    profile_columns,
)

SCHEMA = "i long, m double, s string, t timestamp"
ROWS = [
    (10, 1.25, "b", None),
    (2, None, "a", None),
    (None, 3.50, "ab", None),
    (2, 0.05, None, None),
]


def _prof(spark, specs, **kw):
    df = spark.createDataFrame(ROWS, SCHEMA)
    return {
        r["col_name"]: r for r in profile_columns(df, specs, **kw).collect()
    }


def test_int_profile_counts_nulls_distinct_and_sum(spark):
    r = _prof(spark, [("i", "int")])["i"]
    assert r["n_rows"] == 4
    assert r["n_null"] == 1
    assert r["n_distinct"] == 2          # {10, 2} — nulls excluded
    assert r["min_str"] == "2" and r["max_str"] == "10"  # numeric, not lexicographic
    assert r["sum_anchor"] == 14


def test_cents_profile_audits_exact_money(spark):
    r = _prof(spark, [("m", "cents")])["m"]
    assert r["n_null"] == 1
    assert r["n_distinct"] == 3
    assert r["min_str"] == "5" and r["max_str"] == "350"
    assert r["sum_anchor"] == 125 + 350 + 5


def test_str_profile_binary_minmax_no_sum(spark):
    r = _prof(spark, [("s", "str")])["s"]
    assert r["n_null"] == 1
    assert r["min_str"] == "a" and r["max_str"] == "b"  # 'ab' < 'b'
    assert r["sum_anchor"] is None


def test_all_null_column_yields_null_minmax(spark):
    r = _prof(spark, [("t", "ts")])["t"]
    assert r["n_null"] == 4
    assert r["n_distinct"] == 0
    assert r["min_str"] is None and r["max_str"] is None


def test_one_row_per_spec_in_one_pass(spark):
    got = _prof(
        spark, [("i", "int"), ("m", "cents"), ("s", "str"), ("t", "ts")]
    )
    assert set(got) == {"i", "m", "s", "t"}


def test_approx_distinct_flag_runs(spark):
    r = _prof(spark, [("i", "int")], exact_distinct=False)["i"]
    assert r["n_distinct"] >= 1  # HLL estimate, not asserted exact


def test_unknown_kind_rejected(spark):
    with pytest.raises(ValueError):
        _prof(spark, [("i", "float")])


def test_empty_input_yields_one_zero_row_per_spec(spark):
    """The docstring contract (r16 ADVICE): an EMPTY frame still emits
    one row per declared column — n_rows/n_null/n_distinct = 0,
    min/max/sum NULL — matching the approx path and the pre-r16
    keyless-agg behavior; a downstream audit filtering this profile
    must never silently see nothing for an empty drop."""
    df = spark.createDataFrame([], SCHEMA)
    specs = [("i", "int"), ("m", "cents"), ("s", "str"), ("t", "ts")]
    rows = {
        r["col_name"]: r for r in profile_columns(df, specs).collect()
    }
    assert set(rows) == {"i", "m", "s", "t"}
    for r in rows.values():
        assert (r["n_rows"], r["n_null"], r["n_distinct"]) == (0, 0, 0)
        assert r["min_str"] is None and r["max_str"] is None
        assert r["sum_anchor"] is None
