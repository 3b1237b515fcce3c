"""operators/quantsketch.py — mergeable rank-spaced quantile summaries.

The staged gate (q180/s19) proves full row parity with the SQL oracle
at two sfs; these pin the design invariants: bounded summary size,
weight conservation, the merge-read error THEOREM against brute force,
degenerate exactness (n_b <= k), fixture binding (the compaction
actually compresses at every gate sf), and the stream-side closure
term.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from live_market_data_orderflow_analysis_big_data_project__spark.operators.quantsketch import (  # noqa: E501
    quantile_report,
    spaced_summary,
    value_histogram,
)

from conftest import SF0001, SF001

GB = ["g"]


def _frame(spark, rows):
    return spark.createDataFrame(rows, "g string, b string, v long")


def _pipeline(spark, rows, k, qs):
    df = _frame(spark, rows)
    hist = value_histogram(df, GB, "b", "v")
    summ = spaced_summary(hist, GB, "b", "v", k)
    rep = quantile_report(hist, summ, GB, "b", "v", k, qs)
    return hist, summ, rep


def _model(rows, k, qs):
    """Pure-Python twin: per-bucket kept ranks ceil(i*n_b/k), weights
    as rank gaps, merged cumulative-weight read, exact rank read."""
    from collections import defaultdict

    by_bucket = defaultdict(list)
    for g, b, v in rows:
        by_bucket[(g, b)].append(v)
    summary = defaultdict(lambda: defaultdict(int))  # g -> value -> w
    per_group = defaultdict(list)
    bound = defaultdict(int)
    for (g, b), vs in by_bucket.items():
        vs.sort()
        n_b = len(vs)
        per_group[g] += vs
        bound[g] += math.ceil(n_b / k) - 1
        prev = 0
        for i in range(1, k + 1):
            r = math.ceil(i * n_b / k)
            if r > prev:
                summary[g][vs[r - 1]] += r - prev
                prev = r
    out = {}
    for g, vs in per_group.items():
        vs.sort()
        n = len(vs)
        row = {"n_rows": n, "err_bound": bound[g]}
        for name, (num, den) in qs.items():
            t = -(-num * n // den)
            row[f"exact_{name}"] = vs[t - 1]
            cw = 0
            for v in sorted(summary[g]):
                cw += summary[g][v]
                if cw >= t:
                    row[f"est_{name}"] = v
                    break
            est = row[f"est_{name}"]
            cnt_lt = sum(1 for x in vs if x < est)
            cnt_le = sum(1 for x in vs if x <= est)
            row[f"err_{name}"] = max(0, cnt_lt + 1 - t, t - cnt_le)
        out[g] = row
    return out


def _hand_rows():
    # deterministic pseudo-data: two groups, 4 buckets, skewed values
    rows = []
    for g, mul in (("a", 7), ("c", 13)):
        for b in range(4):
            for i in range(11 + 3 * b):
                rows.append((g, f"d{b}", (i * mul + b * 5) % 97))
    return rows


def test_summary_size_and_weight_conservation(spark):
    rows = _hand_rows()
    hist, summ, _ = _pipeline(spark, rows, 4, {})
    per_bucket = {
        (r.g, r.b): (r.c, r.w)
        for r in summ.groupBy("g", "b")
        .agg(F.count("*").alias("c"), F.sum("weight").alias("w"))
        .collect()
    }
    from collections import Counter

    true_n = Counter((g, b) for g, b, _ in rows)
    for key, (c, w) in per_bucket.items():
        assert c <= 4, key                      # at most k rows kept
        assert w == true_n[key], key            # weights sum to n_b
    assert set(per_bucket) == set(true_n)


def test_report_equals_python_model(spark):
    qs = {"p50": (1, 2), "p90": (9, 10), "p25": (1, 4)}
    rows = _hand_rows()
    _, _, rep = _pipeline(spark, rows, 4, qs)
    model = _model(rows, 4, qs)
    for r in rep.collect():
        m = model[r.g]
        assert r.n_rows == m["n_rows"], r.g
        assert r.err_bound == m["err_bound"], r.g
        for name in qs:
            assert r[f"est_{name}"] == m[f"est_{name}"], (r.g, name)
            assert r[f"exact_{name}"] == m[f"exact_{name}"], (r.g, name)
            assert r[f"err_{name}"] == m[f"err_{name}"], (r.g, name)
            assert r[f"err_{name}"] <= r.err_bound, (r.g, name)
            assert r[f"{name}_ok"] is True, (r.g, name)


def test_small_buckets_are_exact(spark):
    # n_b <= k: every value kept, est == exact, bound == 0
    rows = [("g", f"d{b}", v) for b in range(3) for v in (b, b + 10, b + 20)]
    _, summ, rep = _pipeline(spark, rows, 8, {"p50": (1, 2)})
    assert summ.count() == len(rows)
    r = rep.collect()[0]
    assert r.err_bound == 0 and r.est_p50 == r.exact_p50 and r.err_p50 == 0


def test_compaction_binds_on_the_fixtures(spark):
    """The q172/q173 binding discipline: at BOTH gate sfs the k=4
    summary must actually compress (n_summary < n_rows) and the merge
    bound must be a real tolerance (err_bound > 0) — otherwise the
    driver gate degenerates to comparing exact quantiles."""
    from live_market_data_orderflow_analysis_big_data_project__spark.queries.ablock import (  # noqa: E501
        q180_quantile_rollup,
    )

    for sf in (SF0001, SF001):
        for r in q180_quantile_rollup(spark, sf).collect():
            assert r.n_summary < r.n_rows, (sf, r.g if hasattr(r, "g") else r)
            assert r.err_bound > 0, sf


def test_stream_closure_term_binds(spark):
    """s19's oracle restricts to CLOSED days — pin that the
    restriction excludes at least one day's rows at the gate sf (the
    stream genuinely holds the open day back, so the WHERE clause is
    load-bearing, not vacuous)."""
    from live_market_data_orderflow_analysis_big_data_project__spark.queries.ablock import (  # noqa: E501
        q180_quantile_rollup,
    )
    from live_market_data_orderflow_analysis_big_data_project__spark.queries.sblock import (  # noqa: E501
        s19_quantile_stream,
    )

    batch = {
        r.event_type: r.n_rows
        for r in q180_quantile_rollup(spark, SF0001).collect()
    }
    stream = {
        r.event_type: r.n_rows
        for r in s19_quantile_stream(spark, SF0001).collect()
    }
    assert set(stream) == set(batch)
    assert sum(stream.values()) < sum(batch.values())


def test_headroom_guards_fail_loudly(spark):
    """The r11 ADVICE asymmetry: past the documented cum*k / num*n_rows
    int64 headroom Spark would WRAP silently while the DuckDB oracle
    errors loudly.  Both products are now raise_error-guarded (the
    collocation_lift pattern) — pin that an over-headroom bucket fails
    with the named error, not a wrong number."""
    import pytest

    huge = spark.createDataFrame(
        [("g", "b", 1, 2**62)], "g string, b string, v long, n long"
    )
    with pytest.raises(Exception, match="spaced_summary"):
        spaced_summary(huge, GB, "b", "v", 4).collect()
    summ = spark.createDataFrame(
        [("g", "b", 1, 2**62)], "g string, b string, v long, weight long"
    )
    with pytest.raises(Exception, match="quantile_report"):
        quantile_report(
            huge, summ, GB, "b", "v", 4, {"p90": (9, 10)}
        ).collect()


def test_no_python_in_plan(spark):
    rows = _hand_rows()
    _, _, rep = _pipeline(spark, rows, 4, {"p50": (1, 2)})
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
