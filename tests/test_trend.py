"""operators/stats.py::group_trend — grouped OLS in exact moments.

The staged gate (q186) proves hash parity with the SQL oracle at two
sfs; these pin the regression algebra against numpy lstsq, the exact
rational form against Fraction arithmetic, degenerate inputs, the
int64 headroom guard, and plan purity.
"""

from __future__ import annotations

from fractions import Fraction

import pytest
from pyspark.sql import functions as F  # noqa: F401

from live_market_data_orderflow_analysis_big_data_project__spark.operators.stats import (  # noqa: E501
    group_trend,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "g string, x long, y long")


def _frac_fit(pts):
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    den = n * sxx - sx * sx
    if den == 0:
        return None, None
    return (
        Fraction(n * sxy - sx * sy, den),
        Fraction(sy * sxx - sx * sxy, den),
    )


def test_matches_fraction_arithmetic_exactly(spark):
    pts = {"a": [(0, 10), (1, 13), (2, 17), (5, 30)],
           "b": [(0, -5), (3, -5), (6, 40), (7, -2)]}
    rows = [(g, x, y) for g, xs in pts.items() for x, y in xs]
    out = {r.g: r for r in group_trend(_df(spark, rows), "g", "x", "y").collect()}
    for g, xs in pts.items():
        slope, intercept = _frac_fit(xs)
        # the engine emits ONE IEEE division of the exact integer
        # numerator/denominator — float(Fraction) is the same rounding
        assert out[g].slope == pytest.approx(float(slope), abs=0, rel=0)
        assert out[g].intercept == float(intercept)
        assert out[g].n == len(xs)
        assert out[g].sum_x == sum(x for x, _ in xs)
        assert out[g].sum_y == sum(y for _, y in xs)


def test_matches_numpy_lstsq(spark):
    import numpy as np

    xs = [(i, 7 * i + 3 + (i * i) % 5) for i in range(20)]
    out = group_trend(_df(spark, [("g", x, y) for x, y in xs]),
                      "g", "x", "y").collect()[0]
    a = np.vstack([[x for x, _ in xs], np.ones(len(xs))]).T
    slope, intercept = np.linalg.lstsq(
        a, np.array([y for _, y in xs], dtype=float), rcond=None
    )[0]
    assert out.slope == pytest.approx(slope, rel=1e-12)
    assert out.intercept == pytest.approx(intercept, rel=1e-12)


def test_degenerate_single_x_is_null(spark):
    rows = [("g", 5, 10), ("g", 5, 20)]
    out = group_trend(_df(spark, rows), "g", "x", "y").collect()[0]
    assert out.slope is None and out.intercept is None
    assert out.n == 2 and out.sum_y == 30


def test_null_rows_carry_no_moment(spark):
    rows = [("g", 0, 10), ("g", 1, None), ("g", None, 30), ("g", 2, 20)]
    out = group_trend(_df(spark, rows), "g", "x", "y").collect()[0]
    assert out.n == 2 and out.sum_x == 2 and out.sum_y == 30


def test_single_zero_point_does_not_divide_by_zero(spark):
    """Regression (hypothesis-found): the headroom guard's overflow-free
    check divides by abs(sum_x); on the single-point group (0, 0) an
    AND-guarded division still threw DIVIDE_BY_ZERO under ANSI —
    conjuncts are not conditionally evaluated, CASE branches are."""
    out = group_trend(_df(spark, [("g", 0, 0)]), "g", "x", "y").collect()
    assert out[0].slope is None and out[0].n == 1


def test_headroom_guard_fails_loudly(spark):
    # values sized so the MOMENT SUMS stay inside int64 (no ANSI
    # overflow upstream of the guard) while the conservative A*B
    # product bound trips: sxx ~ 2^61 > MAX div sum_x (~2^32)
    rows = [("g", 2**30, 2**30), ("g", 2**30 + 1, 2**30 - 1)]
    with pytest.raises(Exception, match="group_trend"):
        group_trend(_df(spark, rows), "g", "x", "y").collect()


def test_no_python_in_plan(spark):
    rows = [("g", 0, 1), ("g", 1, 2)]
    plan = (
        group_trend(_df(spark, rows), "g", "x", "y")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan
    assert "Exchange" in plan  # one keyed moment shuffle, nothing more
