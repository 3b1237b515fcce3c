"""Physical-plan regression tests: lock in the plan SHAPES the engine is
designed around, so a refactor that silently degrades them fails here
rather than at 100 TB.

These complement tools/plan_audit.py (which sweeps every query for
red-flags); here each assertion pins one deliberate planning decision to
the query that carries it.
"""

from __future__ import annotations

import contextlib
import io

import re

import pytest

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _n_ops(plan: str, op: str) -> int:
    """Count physical operators by their '(N) OpName' detail headers
    (each operator appears twice in formatted output: tree + detail)."""
    return len(re.findall(rf"^\(\d+\) {op}\b", plan, flags=re.M))


@pytest.fixture(scope="module")
def queries():
    import __spark_entry__ as ent

    return ent.queries()


def test_q26_facts_never_broadcast(spark, queries):
    """The scale-probe finding (docs/SCALING.md): fact joins must stay
    sort-merge even when size estimates undercount — broadcasting a fact
    side OOMs the driver at production scale."""
    plan = _plan(queries["q26_multiway_join"](spark, SF))
    assert _n_ops(plan, "SortMergeJoin") == 2, plan
    # exactly the two dims (nation, region) may broadcast
    assert _n_ops(plan, "BroadcastHashJoin") == 2, plan


def test_q20_fact_join_is_sort_merge(spark, queries):
    plan = _plan(queries["q20_join_inner"](spark, SF))
    assert "SortMergeJoin" in plan, plan
    assert "BroadcastHashJoin" not in plan, plan


def test_q21_dim_is_broadcast(spark, queries):
    """part is a dimension: the fact side must NOT shuffle for the join."""
    plan = _plan(queries["q21_join_broadcast"](spark, SF))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_q15_topk_is_take_ordered(spark, queries):
    """orderBy().limit(n) must compile to TakeOrderedAndProject
    (per-partition top-k + driver merge of n rows), never a global Sort."""
    plan = _plan(queries["q15_sort_limit_topk"](spark, SF))
    assert "TakeOrderedAndProject" in plan, plan


def test_q01_scan_prunes_and_pushes(spark, queries):
    """Projection must reach the parquet scan as a pruned ReadSchema."""
    plan = _plan(queries["q01_scan_project"](spark, SF))
    assert "ReadSchema" in plan
    # q01 projects 4 columns; the scan must not read lineitem's full 16
    # (4 type colons + the 'ReadSchema:' label colon = 5)
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert read_schema.count(":") <= 5, read_schema


def test_q02_filter_pushdown(spark, queries):
    plan = _plan(queries["q02_filter_predicates"](spark, SF))
    assert "PushedFilters: [" in plan
    assert "IsNotNull" in plan


def test_q24_band_dim_is_local_relation(spark, queries):
    """The VALUES band dim must stay a JVM LocalRelation — a Python-RDD
    scan here drags Python worker startup into the broadcast build
    (measured 11s -> 0.8s, queries/eblock.py)."""
    plan = _plan(queries["q24_join_range_theta"](spark, SF))
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "applySchemaToPythonRDD" not in plan, plan


def test_q92_topk_probe_is_broadcast(spark, queries):
    """The 1-row probe must broadcast; the scan side stays distributed."""
    plan = _plan(queries["q92_cosine_topk"](spark, SF))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "TakeOrderedAndProject" in plan, plan
