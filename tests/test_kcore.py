"""k-core peeling (operators/kcore.py) against a literal Python
peeling on hand graphs, plus the cascade case that distinguishes
iterated peeling from a one-shot degree filter."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from live_market_data_orderflow_analysis_big_data_project__spark.operators.kcore import (  # noqa: E501
    kcore_peel,
)


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in pairs], "src long, dst long"
    ).distinct()


def _py_peel(pairs, k, rounds):
    edges = {tuple(sorted(p)) for p in pairs}
    for _ in range(rounds):
        deg = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        edges = {(a, b) for a, b in edges if a in keep and b in keep}
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    return deg


# K4 plus a pendant chain hanging off it: the chain peels one link per
# round (the CASCADE a one-shot filter misses), K4 survives any k<=3
CHAIN = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6),
         (6, 7)]


@pytest.mark.parametrize("k,rounds", [(2, 1), (2, 2), (2, 3), (3, 3)])
def test_matches_literal_python_peeling(spark, k, rounds):
    got = {
        r.node: (r.in_core, r.core_deg)
        for r in kcore_peel(_edges(spark, CHAIN), k=k, rounds=rounds).collect()
    }
    want = _py_peel(CHAIN, k, rounds)
    for node in {n for e in CHAIN for n in e}:
        assert got[node] == (node in want, want.get(node, 0)), (k, rounds)


def test_cascade_needs_iteration(spark):
    # after ONE round of k=2 the chain end 7 is gone but 6 survives
    # (deg 2 before the peel); the fixpoint (round 3) removes 5,6,7
    one = {r.node: r.in_core for r in
           kcore_peel(_edges(spark, CHAIN), k=2, rounds=1).collect()}
    fix = {r.node: r.in_core for r in
           kcore_peel(_edges(spark, CHAIN), k=2, rounds=3).collect()}
    assert one[6] and not fix[6]
    assert fix == {1: True, 2: True, 3: True, 4: True,
                   5: False, 6: False, 7: False}
    # fixpoint stability: one more round changes nothing
    more = {r.node: (r.in_core, r.core_deg) for r in
            kcore_peel(_edges(spark, CHAIN), k=2, rounds=4).collect()}
    fix_full = {r.node: (r.in_core, r.core_deg) for r in
                kcore_peel(_edges(spark, CHAIN), k=2, rounds=3).collect()}
    assert more == fix_full


def test_original_degree_reported_for_peeled_nodes(spark):
    rows = {r.node: r.deg for r in
            kcore_peel(_edges(spark, CHAIN), k=2, rounds=3).collect()}
    assert rows[7] == 1 and rows[5] == 2 and rows[1] == 3


def test_q175_fixpoint_reached_and_k_binds_on_the_fixture(spark):
    """The staged q175 gate runs 6 fixed rounds at k=3 over the daily
    interaction graph: (a) the fixed rounds must REACH the fixpoint
    (one more round changes nothing) so in_core is true k-core
    membership, and (b) k=3 must BIND (some nodes peeled).  Pinned at
    both test sfs so a fixture regeneration cannot silently break
    either property."""
    from conftest import SF0001, SF001

    from live_market_data_orderflow_analysis_big_data_project__spark.operators.graph import (  # noqa: E501
        cooccurrence_edges,
    )
    from live_market_data_orderflow_analysis_big_data_project__spark.queries.ablock import (  # noqa: E501
        _Q175_DAY,
        _Q175_K,
        _Q175_ROUNDS,
    )
    from live_market_data_orderflow_analysis_big_data_project__spark.sources.tables import (  # noqa: E501
        load_table,
    )

    for sf in (SF0001, SF001):
        ev = load_table(spark, sf, "events").filter(
            F.to_date("ts") == F.lit(_Q175_DAY)
        )
        edges = cooccurrence_edges(
            ev, "event_type", "ts", "user_id", "event_id"
        )
        at = {
            r.node: (r.in_core, r.core_deg)
            for r in kcore_peel(
                edges, k=_Q175_K, rounds=_Q175_ROUNDS
            ).collect()
        }
        plus_one = {
            r.node: (r.in_core, r.core_deg)
            for r in kcore_peel(
                edges, k=_Q175_K, rounds=_Q175_ROUNDS + 1
            ).collect()
        }
        assert at == plus_one, sf  # fixpoint reached within the rounds
        assert any(not v[0] for v in at.values()), sf  # k binds: peeled
