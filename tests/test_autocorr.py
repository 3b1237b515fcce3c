"""operators/stats.py::autocorr_lags — exact-moment serial correlation.

The staged gate (q187) proves hash parity with the SQL oracle at two
sfs; these pin the statistic against numpy, the index-aligned (not
row-aligned) pairing semantics, degenerate inputs, and the exact
integer anchors.
"""

from __future__ import annotations

import math

import pytest

from live_market_data_orderflow_analysis_big_data_project__spark.operators.stats import (  # noqa: E501
    autocorr_lags,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k string, i long, x long")


def _np_corr(pairs):
    import numpy as np

    a = np.array([p[0] for p in pairs], dtype=float)
    b = np.array([p[1] for p in pairs], dtype=float)
    return float(np.corrcoef(a, b)[0, 1])


def test_matches_numpy_on_dense_series(spark):
    xs = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8]
    rows = [("g", i, x) for i, x in enumerate(xs)]
    out = {
        r.lag: r
        for r in autocorr_lags(_df(spark, rows), "k", "i", "x").collect()
    }
    for lag in (1, 2, 3):
        pairs = [(xs[t], xs[t + lag]) for t in range(len(xs) - lag)]
        r = out[lag]
        assert r.n_pairs == len(pairs)
        assert r.sum_x == sum(p[0] for p in pairs)
        assert r.sum_y == sum(p[1] for p in pairs)
        assert r.corr == pytest.approx(_np_corr(pairs), rel=1e-12)


def test_pairs_align_by_index_not_row_order(spark):
    # idx 2 is MISSING: lag-1 must pair only (0,1) and (3,4) — a
    # row-ordered lead() would wrongly pair (1,3)
    rows = [("g", 0, 10), ("g", 1, 20), ("g", 3, 30), ("g", 4, 40)]
    out = {
        r.lag: r
        for r in autocorr_lags(
            _df(spark, rows), "k", "i", "x", (1,)
        ).collect()
    }
    assert out[1].n_pairs == 2
    assert out[1].sum_x == 10 + 30
    assert out[1].sum_y == 20 + 40


def test_constant_series_yields_null_corr(spark):
    rows = [("g", i, 7) for i in range(6)]
    out = autocorr_lags(_df(spark, rows), "k", "i", "x", (1,)).collect()
    assert out[0].n_pairs == 5
    assert out[0].corr is None


def test_perfect_positive_and_negative(spark):
    inc = [("up", i, 10 * i) for i in range(8)]
    alt = [("alt", i, 100 if i % 2 == 0 else -100) for i in range(8)]
    out = {
        (r.k, r.lag): r
        for r in autocorr_lags(
            _df(spark, inc + alt), "k", "i", "x", (1, 2)
        ).collect()
    }
    assert out[("up", 1)].corr == pytest.approx(1.0)
    assert out[("alt", 1)].corr == pytest.approx(-1.0)
    assert out[("alt", 2)].corr == pytest.approx(1.0)


def test_short_series_drops_out_of_range_lags(spark):
    rows = [("g", 0, 1), ("g", 1, 2)]
    out = autocorr_lags(_df(spark, rows), "k", "i", "x", (1, 2, 3))
    got = {r.lag for r in out.collect()}
    assert got == {1}  # lags 2 and 3 have no pairs -> no row


def test_bad_lags_raise():
    with pytest.raises(ValueError):
        autocorr_lags(None, "k", "i", "x", ())
    with pytest.raises(ValueError):
        autocorr_lags(None, "k", "i", "x", (0,))
    with pytest.raises(ValueError, match="distinct"):
        # a duplicated lag would silently double the moments
        autocorr_lags(None, "k", "i", "x", (1, 1))


def test_corr_is_one_fixed_float_expression(spark):
    # bit-identical reconstruction from the exact anchors: the engine
    # must compute EXACTLY num/sqrt(varx*vary) over exact int64 moments
    xs = [17, 3, 94, 21, 5, 88, 41, 2, 60]
    rows = [("g", i, x) for i, x in enumerate(xs)]
    r = {
        row.lag: row
        for row in autocorr_lags(
            _df(spark, rows), "k", "i", "x", (1,)
        ).collect()
    }[1]
    pairs = [(xs[t], xs[t + 1]) for t in range(len(xs) - 1)]
    n = float(len(pairs))
    sx = float(sum(p[0] for p in pairs))
    sy = float(sum(p[1] for p in pairs))
    sxy = float(sum(p[0] * p[1] for p in pairs))
    sxx = float(sum(p[0] * p[0] for p in pairs))
    syy = float(sum(p[1] * p[1] for p in pairs))
    expect = (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    assert r.corr == expect  # exact equality, not approx
