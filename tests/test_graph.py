"""operators/graph.py — triangle counting (degree-ordered orientation)
and integer-quantized fixed-iteration PageRank.

The staged gates (q170/q171) prove parity with the naive-triple-join /
unrolled-iteration DuckDB twins at two sfs; these tests pin the algebra
on hand graphs: known triangle structures, orientation exactness vs a
brute-force enumeration, and PageRank vs a literal Python loop running
the SAME integer arithmetic."""

from __future__ import annotations

from itertools import combinations

from live_market_data_orderflow_analysis_big_data_project__spark.operators.graph import (  # noqa: E501
    cooccurrence_edges,
    pagerank_quantized,
    triangle_counts,
)


def _edges_df(spark, pairs):
    rows = [(min(a, b), max(a, b)) for a, b in pairs]
    return spark.createDataFrame(sorted(set(rows)), "src long, dst long")


def _tri(spark, pairs):
    out = triangle_counts(_edges_df(spark, pairs)).collect()
    return {r["node"]: r["n_triangles"] for r in out}


def _brute_tri(pairs):
    es = {tuple(sorted(p)) for p in pairs}
    nodes = sorted({n for e in es for n in e})
    votes = {n: 0 for n in nodes}
    for u, v, w in combinations(nodes, 3):
        if ((u, v) in es) and ((u, w) in es) and ((v, w) in es):
            votes[u] += 1
            votes[v] += 1
            votes[w] += 1
    return votes


def test_single_triangle(spark):
    assert _tri(spark, [(1, 2), (2, 3), (1, 3)]) == {1: 1, 2: 1, 3: 1}


def test_triangle_free_nodes_report_zero(spark):
    got = _tri(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 0}


def test_k4_every_node_in_three_triangles(spark):
    k4 = list(combinations([1, 2, 3, 4], 2))
    assert _tri(spark, k4) == {1: 3, 2: 3, 3: 3, 4: 3}


def test_hub_graph_matches_brute_force(spark):
    # a hub (node 0) plus a cycle — the shape whose naive wedge stage
    # explodes on the hub; the oriented count must still be exact
    cyc = [(i, i + 1) for i in range(1, 9)] + [(9, 1)]
    hub = [(0, i) for i in range(1, 10)]
    pairs = cyc + hub
    assert _tri(spark, pairs) == _brute_tri(pairs)


def test_cooccurrence_edges_deterministic_and_undirected(spark):
    rows = [
        ("a", 1, 10, 100),
        ("a", 2, 20, 101),
        ("a", 1, 30, 102),   # revisits: edge (1,2) deduped
        ("a", 1, 40, 103),   # self-transition: dropped
        ("b", 3, 10, 104),
        ("b", 1, 20, 105),
    ]
    df = spark.createDataFrame(
        rows, "event_type string, user_id long, ts long, event_id long"
    )
    got = {
        (r["src"], r["dst"])
        for r in cooccurrence_edges(
            df, "event_type", "ts", "user_id", "event_id"
        ).collect()
    }
    assert got == {(1, 2), (1, 3)}


def _pr_python(pairs, k=3, scale=1_000_000):
    """Literal loop with the operator's exact integer arithmetic."""
    es = {tuple(sorted(p)) for p in pairs}
    adj: dict[int, list[int]] = {}
    for u, v in es:
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)
    deg = {n: len(ns) for n, ns in adj.items()}
    pr = {n: scale for n in adj}
    base = 15 * scale // 100
    for _ in range(k):
        s = {n: 0 for n in adj}
        for n, ns in adj.items():
            c = pr[n] // deg[n]
            for m in ns:
                s[m] += c
        pr = {n: 85 * s[n] // 100 + base for n in adj}
    return pr, deg


def test_pagerank_matches_literal_integer_loop(spark):
    pairs = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (2, 5), (5, 6)]
    want, deg = _pr_python(pairs)
    got = {
        r["node"]: (r["pr_micro"], r["deg"])
        for r in pagerank_quantized(_edges_df(spark, pairs)).collect()
    }
    assert got == {n: (want[n], deg[n]) for n in want}


def test_pagerank_hub_outranks_leaves(spark):
    hub = [(0, i) for i in range(1, 8)]
    got = {
        r["node"]: r["pr_micro"]
        for r in pagerank_quantized(_edges_df(spark, hub)).collect()
    }
    assert got[0] > max(v for n, v in got.items() if n != 0)


# --- property tests: random graphs vs the pure-Python formulations ---------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_edge = st.tuples(
    st.integers(min_value=0, max_value=11),
    st.integers(min_value=0, max_value=11),
).filter(lambda p: p[0] != p[1])


@settings(max_examples=5, deadline=None)
@given(st.lists(_edge, min_size=1, max_size=30))
def test_property_triangles_match_brute_force(spark, pairs):
    """Degree-ordered orientation == brute-force triple enumeration on
    random small graphs — the tie-breaking in the rank order (equal
    degrees fall back to node id) is exactly what a fixed fixture
    can't stress."""
    assert _tri(spark, pairs) == _brute_tri(pairs)


@settings(max_examples=5, deadline=None)
@given(st.lists(_edge, min_size=1, max_size=30))
def test_property_pagerank_matches_literal_loop(spark, pairs):
    want, deg = _pr_python(pairs)
    got = {
        r["node"]: (r["pr_micro"], r["deg"])
        for r in pagerank_quantized(_edges_df(spark, pairs)).collect()
    }
    assert got == {n: (want[n], deg[n]) for n in want}
