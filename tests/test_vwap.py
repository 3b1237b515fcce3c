"""operators/twap.py::vwap_realized_vol — VWAP + realized volatility.

The staged gate (q189) proves hash parity at two sfs; these pin the
VWAP division against Fraction arithmetic, the RV estimator against
python math over the same total order, the tick-order tie-break, the
single-tick degenerate day, and the ln-domain guard.
"""

from __future__ import annotations

import datetime as dt
import math
from fractions import Fraction

import pytest
from pyspark.sql import functions as F

from live_market_data_orderflow_analysis_big_data_project__spark.operators.twap import (  # noqa: E501
    vwap_realized_vol,
)


def _df(spark, rows):
    # rows: (id, ts, cents, qty)
    return spark.createDataFrame(
        rows, "id long, ts timestamp, c long, q long"
    ).withColumn("k", F.lit("X"))


def _run(spark, rows):
    return vwap_realized_vol(
        _df(spark, rows), ["k"], "ts", F.col("c"), F.col("q"), "id"
    ).collect()


def _t(m, s=0):
    return dt.datetime(2024, 1, 5, 10, m, s)


def test_vwap_matches_fraction(spark):
    rows = [
        (1, _t(0), 10000, 3),
        (2, _t(1), 10100, 2),
        (3, _t(2), 9900, 5),
    ]
    out = _run(spark, rows)
    assert len(out) == 1
    r = out[0]
    num = sum(c * q for _, _, c, q in rows)
    den = sum(q for _, _, _, q in rows)
    assert r.n_ticks == 3
    assert r.sum_qty == den
    assert r.sum_qty_cents == num
    assert r.vwap_cents == float(Fraction(num, den))
    assert r.day == "2024-01-05"


def test_rv_matches_python_math(spark):
    cents = [10000, 10100, 9950, 10200, 10150]
    rows = [(i, _t(i), c, 1) for i, c in enumerate(cents)]
    r = _run(spark, rows)[0]
    ss = sum(
        math.log(cents[i] / cents[i - 1]) ** 2
        for i in range(1, len(cents))
    )
    assert r.n_returns == len(cents) - 1
    assert r.rv4 == pytest.approx(round(math.sqrt(ss), 4), abs=1e-9)


def test_coincident_ticks_break_on_id(spark):
    # two ticks at the SAME ts: return sequence must follow id order
    rows = [(2, _t(0), 20000, 1), (1, _t(0), 10000, 1), (3, _t(1), 15000, 1)]
    r = _run(spark, rows)[0]
    seq = [10000, 20000, 15000]  # id order at equal ts
    ss = sum(
        math.log(seq[i] / seq[i - 1]) ** 2 for i in range(1, len(seq))
    )
    assert r.rv4 == pytest.approx(round(math.sqrt(ss), 4), abs=1e-9)


def test_single_tick_day_has_null_rv(spark):
    r = _run(spark, [(1, _t(0), 10000, 4)])[0]
    assert r.n_ticks == 1 and r.n_returns == 0
    assert r.rv4 is None
    assert r.vwap_cents == 10000.0


def test_days_partition_the_return_sequence(spark):
    # last tick of day 1 -> first tick of day 2 must NOT be a return
    rows = [
        (1, dt.datetime(2024, 1, 5, 23, 59), 10000, 1),
        (2, dt.datetime(2024, 1, 6, 0, 1), 99000, 1),
    ]
    out = {r.day: r for r in _run(spark, rows)}
    assert out["2024-01-05"].n_returns == 0
    assert out["2024-01-06"].n_returns == 0


def test_non_positive_price_raises(spark):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    rows = [(1, _t(0), 0, 1), (2, _t(1), 100, 1)]
    with pytest.raises((SparkRuntimeException, Py4JJavaError)):
        _run(spark, rows)
