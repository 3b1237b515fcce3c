"""Bucketed co-located join: the fact-fact join must plan WITHOUT a
shuffle (no Exchange on either join input)."""

from __future__ import annotations

import os
import tempfile

import pytest

from live_market_data_orderflow_analysis_big_data_project__spark.sources.bucketed import (
    read_bucketed,
    write_bucketed,
)
from live_market_data_orderflow_analysis_big_data_project__spark.sources.tables import (
    load_table,
)

SF0001 = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    base = tempfile.mkdtemp(prefix="bucketed_")
    orders = load_table(spark, SF0001, "orders")
    lineitem = load_table(spark, SF0001, "lineitem")
    write_bucketed(
        orders, "orders_b", ("o_orderkey",), 8,
        path=os.path.join(base, "orders"), sort_cols=("o_orderkey",),
    )
    write_bucketed(
        lineitem, "lineitem_b", ("l_orderkey",), 8,
        path=os.path.join(base, "lineitem"), sort_cols=("l_orderkey",),
    )
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    ot, lt = bucketed_tables
    o, li = read_bucketed(spark, ot), read_bucketed(spark, lt)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(o, li.l_orderkey == o.o_orderkey).select(
            "l_orderkey", "l_quantity", "o_totalprice"
        )
        root = _physical_root(joined)
        names = [n.getClass().getSimpleName() for n in _walk(root)]
        assert any(n.startswith("SortMergeJoin") for n in names), names
        shuffles = [n for n in _walk(root) if _is_shuffle(n)]
        assert not shuffles, (
            "bucketed join still shuffles: "
            f"{[s.getClass().getSimpleName() for s in shuffles]}\n"
            f"{root.toString()}"
        )
        # and it is actually correct
        li0 = load_table(spark, SF0001, "lineitem")
        o0 = load_table(spark, SF0001, "orders")
        expected = li0.join(o0, li0.l_orderkey == o0.o_orderkey).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _physical_root(df):
    """Final physical plan root, unwrapping the AQE wrapper if present."""
    p = df._jdf.queryExecution().executedPlan()
    if p.getClass().getSimpleName().startswith("AdaptiveSparkPlan"):
        p = p.executedPlan()
    return p


def _walk(node):
    yield node
    ch = node.children()
    for i in range(ch.length()):
        yield from _walk(ch.apply(i))


def _is_shuffle(node) -> bool:
    # ShuffleExchangeExec pre-AQE; ShuffleQueryStageExec is how a shuffle
    # appears in an AQE-finalized plan.  ReusedExchangeExec wraps ANY
    # reused exchange — including a reused BROADCAST, which is legitimate
    # under an SMJ subtree — so inspect the reused child's type instead of
    # counting every reuse as a shuffle.
    name = node.getClass().getSimpleName()
    if "ShuffleExchange" in name or "ShuffleQueryStage" in name:
        return True
    if "ReusedExchange" in name:
        child = node.child()
        return _is_shuffle(child)
    return False


def _sorts_below(node):
    """SortExec nodes in the subtree (a pre-sorted bucketed SMJ has
    none).  Exact match — a prefix test would also catch e.g. a
    SortAggregateExec under the subtree, which is not a join-side
    re-sort."""
    return [
        n for n in _walk(node)
        if n.getClass().getSimpleName() == "SortExec"
    ]


def test_q132_gate_query_join_is_exchange_free(spark):
    """The q132 gate query's fact-fact join must not shuffle: no shuffle
    node anywhere BELOW the SortMergeJoin (the final groupBy above it may
    shuffle).  Walks the plan tree rather than counting substrings in the
    plan string, which AQE reprints / partial-final agg splits can skew."""
    from live_market_data_orderflow_analysis_big_data_project__spark.queries.eblock import (
        q132_bucketed_join,
    )

    df = q132_bucketed_join(spark, SF0001)
    root = _physical_root(df)
    smjs = [
        n for n in _walk(root)
        if n.getClass().getSimpleName().startswith("SortMergeJoin")
    ]
    assert smjs, f"no SortMergeJoin in plan:\n{root.toString()}"
    for smj in smjs:
        shuffles = [n for n in _walk(smj) if _is_shuffle(n)]
        assert not shuffles, (
            "bucketed SMJ has a shuffle below it: "
            f"{[s.getClass().getSimpleName() for s in shuffles]}\n"
            f"{smj.toString()}"
        )
        # one-file-per-bucket write => scan keeps the sortBy ordering =>
        # the merge join reads pre-sorted runs with NO Sort node
        sorts = _sorts_below(smj)
        assert not sorts, (
            "bucketed SMJ re-sorts despite sorted single-file buckets: "
            f"{[s.getClass().getSimpleName() for s in sorts]}\n"
            f"{smj.toString()}"
        )
