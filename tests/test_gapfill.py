"""gapfill_time_bucket: dense grid, LOCF, interpolation edge cases."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from live_market_data_orderflow_analysis_big_data_project__spark.functions.hashstable import (
    dsum,
)
from live_market_data_orderflow_analysis_big_data_project__spark.operators.gapfill import (
    gapfill_time_bucket,
)


def _fill(spark, rows, bucket="hour"):
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = gapfill_time_bucket(
        df, ["k"], "ts", dsum("v"), F.count(F.lit(1)), bucket=bucket
    )
    return {
        (r["k"], r["bucket_ts"].isoformat()): r
        for r in out.collect()
    }


def _ts(h, m=0):
    return datetime(2024, 1, 1, h, m)


def test_grid_is_dense_over_global_bounds(spark):
    # key a observed at hours 0 and 3; key b only at hour 1 — both
    # keys still get all four grid rows (global bounds, aligned grids)
    rows = [
        ("a", _ts(0, 10), 1.0),
        ("a", _ts(3, 20), 7.0),
        ("b", _ts(1, 5), 2.0),
    ]
    out = _fill(spark, rows)
    assert len(out) == 8  # 2 keys x 4 hourly buckets
    gaps = [k for k, r in out.items() if r["is_gap"]]
    assert len(gaps) == 5


def test_locf_carries_last_observation_forward(spark):
    rows = [("a", _ts(0), 1.0), ("a", _ts(3), 7.0)]
    out = _fill(spark, rows)
    assert out[("a", "2024-01-01T01:00:00")]["locf_sum"] == 1.0
    assert out[("a", "2024-01-01T02:00:00")]["locf_sum"] == 1.0
    assert out[("a", "2024-01-01T03:00:00")]["locf_sum"] == 7.0


def test_interpolation_is_linear_between_neighbours(spark):
    rows = [("a", _ts(0), 1.0), ("a", _ts(3), 7.0)]
    out = _fill(spark, rows)
    assert out[("a", "2024-01-01T01:00:00")]["interp_sum"] == 3.0
    assert out[("a", "2024-01-01T02:00:00")]["interp_sum"] == 5.0
    # observed buckets pass through untouched
    assert out[("a", "2024-01-01T00:00:00")]["interp_sum"] == 1.0
    assert out[("a", "2024-01-01T03:00:00")]["interp_sum"] == 7.0


def test_no_extrapolation_outside_observed_range(spark):
    # key b observed only at hour 1 within global bounds [0, 3]
    rows = [
        ("a", _ts(0), 1.0),
        ("a", _ts(3), 7.0),
        ("b", _ts(1), 2.0),
    ]
    out = _fill(spark, rows)
    lead = out[("b", "2024-01-01T00:00:00")]
    assert lead["locf_sum"] is None and lead["interp_sum"] is None
    trail = out[("b", "2024-01-01T03:00:00")]
    assert trail["locf_sum"] == 2.0  # LOCF extends to the right...
    assert trail["interp_sum"] is None  # ...interpolation does not


def test_counts_and_sums_aggregate_within_bucket(spark):
    rows = [("a", _ts(0, 1), 1.5), ("a", _ts(0, 2), 2.5), ("a", _ts(1), 1.0)]
    out = _fill(spark, rows)
    r0 = out[("a", "2024-01-01T00:00:00")]
    assert r0["n_rows"] == 2 and r0["actual_sum"] == 4.0
    assert not r0["is_gap"]


def test_single_observation_key_grid(spark):
    rows = [("a", _ts(2), 5.0)]
    out = _fill(spark, rows)
    assert len(out) == 1  # global bounds collapse to one bucket
    r = out[("a", "2024-01-01T02:00:00")]
    assert r["interp_sum"] == 5.0 and r["locf_sum"] == 5.0


def test_day_bucket_step(spark):
    rows = [
        ("a", datetime(2024, 1, 1, 5), 1.0),
        ("a", datetime(2024, 1, 4, 9), 4.0),
    ]
    out = _fill(spark, rows, bucket="day")
    assert len(out) == 4
    assert out[("a", "2024-01-02T00:00:00")]["interp_sum"] == 2.0
    assert out[("a", "2024-01-03T00:00:00")]["interp_sum"] == 3.0


def test_bucket_sums_windowed_batch_twin_matches_date_trunc(spark):
    """bucket_sums_windowed (the s17 streaming stage) on a BATCH frame
    equals the date_trunc groupBy that gapfill_time_bucket uses — the
    coupling that lets the stream own the bucket stage while q150 and
    s17 share gapfill_from_buckets."""
    from datetime import datetime

    from pyspark.sql import functions as F

    from live_market_data_orderflow_analysis_big_data_project__spark.functions.hashstable import (  # noqa: E501
        dsum,
    )
    from live_market_data_orderflow_analysis_big_data_project__spark.operators.gapfill import (  # noqa: E501
        bucket_sums_windowed,
    )

    rows = [
        ("a", datetime(2024, 1, 1, h, m), float(h * 10 + m))
        for h in (0, 1, 3)
        for m in (5, 40)
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    win = {
        (r["k"], r["bucket_ts"]): (r["actual_sum"], r["n_rows"])
        for r in bucket_sums_windowed(
            df, ["k"], "ts", dsum("value"), F.count(F.lit(1))
        ).collect()
    }
    trunc = {
        (r["k"], r["bucket_ts"]): (r["actual_sum"], r["n_rows"])
        for r in df.groupBy(
            "k", F.date_trunc("hour", "ts").alias("bucket_ts")
        )
        .agg(dsum("value").alias("actual_sum"),
             F.count(F.lit(1)).alias("n_rows"))
        .collect()
    }
    assert win == trunc and len(win) == 3  # hours 0, 1, 3 for one key
