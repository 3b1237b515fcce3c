"""Mergeable sparse histogram rollups (operators/histogram.py).

The determinism contrast with the HLL rollup (test_sketches.py): every
histogram number is an exact integer count, so bucketing-invariance and
merge-losslessness hold as EXACT equality at any cardinality — no
coupon/dense regime split.  The only approximation is the quantile
read, bounded by one bin width chosen at write time.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from live_market_data_orderflow_analysis_big_data_project__spark.operators.histogram import (
    hist_merge,
    hist_quantiles,
    hist_rollup,
    hist_rollup_report,
)
from live_market_data_orderflow_analysis_big_data_project__spark.sources.tables import (
    load_table,
)

from conftest import SF001

LO, HI, BINS = 0.0, 500.0, 50  # events.value grid; bin width 10


def _events(spark):
    return load_table(spark, SF001, "events").select(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        "value",
    )


def test_report_all_flags_true(spark):
    rows = hist_rollup_report(
        _events(spark), ["event_type"], "day", "value",
        LO, HI, BINS, q=0.9,
    ).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.count_preserved and r.grid_consistent
        assert r.rollup_eq_shard and r.rollup_eq_direct
        assert r.q_in_band


def test_rollup_parquet_roundtrip_and_incremental_append(spark, tmp_path):
    """The rollup is a real parquet table; appending ONLY a new day's
    histogram rows reproduces the from-scratch merge exactly (integer
    counts — exact map equality, not estimate-identical)."""
    ev = _events(spark)
    days = sorted(r.day for r in ev.select("day").distinct().collect())
    tail = days[-1]
    path = os.path.join(str(tmp_path), "hist_rollup")
    hist_rollup(
        ev.where(F.col("day") != tail), ["event_type"], "day", "value",
        LO, HI, BINS,
    ).write.mode("overwrite").parquet(path)
    hist_rollup(
        ev.where(F.col("day") == tail), ["event_type"], "day", "value",
        LO, HI, BINS,
    ).write.mode("append").parquet(path)

    def canon(df):
        return {
            r.event_type: sorted(r.hist.items())
            for r in hist_merge(df, ["event_type"]).collect()
        }

    assert canon(spark.read.parquet(path)) == canon(
        hist_rollup(ev, ["event_type"], "day", "value", LO, HI, BINS)
    )


def test_quantile_read_within_one_bin_width(spark):
    """Histogram quantiles vs the exact DISCRETE quantile (order
    statistic at rank ceil(q*n) — the band theorem's subject; the
    interpolating percentile can legitimately sit a value-gap lower),
    at several q, for every group: hist_q in [disc_q, disc_q + width]
    after clamping the truth into the grid."""
    ev = _events(spark)
    merged = hist_merge(
        hist_rollup(ev, ["event_type"], "day", "value", LO, HI, BINS),
        ["event_type"],
    )
    qs = [0.1, 0.5, 0.9, 0.99]
    got = {
        r.event_type: r.asDict()
        for r in hist_quantiles(merged, ["event_type"], qs).collect()
    }
    import math

    vals = {}
    for r in ev.collect():
        vals.setdefault(r.event_type, []).append(r.value)
    width = (HI - LO) / BINS
    for et, row in got.items():
        xs = sorted(vals[et])
        for q in qs:
            key = str(q).replace(".", "")
            hq = row[f"q_{key}"]
            disc = xs[math.ceil(q * len(xs)) - 1]
            clamped = min(max(disc, LO), HI)
            assert clamped <= hq <= clamped + width, (et, q, hq, disc)


def test_out_of_range_values_clamp_to_edge_bins(spark):
    """Values outside [lo, hi) land in the edge bins — total count is
    preserved (never silently dropped)."""
    df = spark.createDataFrame(
        [("g", -5.0), ("g", 0.0), ("g", 250.0), ("g", 999.0), ("g", 500.0)],
        "g string, v double",
    )
    merged = hist_merge(
        hist_rollup(df, ["g"], F.lit(0).alias("b"), "v", 0.0, 500.0, 50),
        ["g"],
    )
    r = merged.collect()[0]
    hist = dict(r.hist)
    assert sum(hist.values()) == 5
    assert hist[0] == 2  # -5.0 clamped + 0.0
    assert hist[25] == 1  # 250.0
    assert hist[49] == 2  # 999.0 clamped + 500.0 (== hi -> last bin)


def test_plan_is_partial_agg_no_global_sort(spark):
    """Scale claims pinned in the physical plan: the (group, bucket,
    bin) count aggregation is map-side combinable (partial_count before
    the exchange) and nothing range-partitions (no global sort)."""
    ev = _events(spark)
    merged = hist_merge(
        hist_rollup(ev, ["event_type"], "day", "value", LO, HI, BINS),
        ["event_type"],
    )
    plan = merged._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan
    assert "rangepartitioning" not in plan.lower()


def test_null_values_excluded_not_crashing(spark):
    """NULL values are excluded (SQL aggregate semantics) — without
    the operator's filter a NULL bin index becomes a NULL map key and
    the job dies in map_from_entries."""
    df = spark.createDataFrame(
        [("g", 10.0), ("g", None), ("g", 20.0)], "g string, v double"
    )
    merged = hist_merge(
        hist_rollup(df, ["g"], F.lit(0).alias("b"), "v", 0.0, 100.0, 10),
        ["g"],
    )
    r = merged.collect()[0]
    assert sum(dict(r.hist).values()) == 2  # the two non-null rows


def test_mixed_grid_merge_is_surfaced(spark):
    """Merging rollups built on different grids is a caller bug: the
    merge flags it (grid_consistent=false) instead of silently
    blending incompatible bin indices."""
    df = spark.range(0, 100).select(
        F.lit("g").alias("g"), F.col("id").cast("double").alias("v")
    )
    a = hist_rollup(df, ["g"], F.lit(0).alias("b"), "v", 0.0, 100.0, 10)
    b = hist_rollup(df, ["g"], F.lit(1).alias("b"), "v", 0.0, 200.0, 10)
    r = hist_merge(a.unionByName(b), ["g"]).collect()[0]
    assert r.grid_consistent is False
    ok = hist_merge(a, ["g"]).collect()[0]
    assert ok.grid_consistent is True


def test_nan_values_excluded_like_nulls(spark):
    """NaN must not be silently counted in the TOP bin (Spark's NaN
    ordering survives greatest(); least() then returns the upper
    clamp — ADVICE r8): it is excluded like NULL, and the audit
    anchors describe the same row set."""
    from live_market_data_orderflow_analysis_big_data_project__spark.operators.histogram import (  # noqa: E501
        hist_rollup, hist_rollup_report,
    )

    rows = [("g", 1, 5.0), ("g", 1, float("nan")), ("g", 2, 95.0),
            ("g", 2, None)]
    df = spark.createDataFrame(rows, "g string, b int, v double")
    m = hist_rollup(df, ["g"], "b", "v", lo=0.0, hi=100.0, n_bins=10)
    hist = {k: v for r in m.collect() for k, v in r["hist"].items()}
    assert sum(hist.values()) == 2          # NaN and NULL both excluded
    assert hist.get(9, 0) == 1              # 95 in the top bin, not NaN
    rep = hist_rollup_report(
        df, ["g"], "b", "v", lo=0.0, hi=100.0, n_bins=10
    ).collect()[0]
    assert rep["n_rows"] == 2 and rep["count_preserved"]
