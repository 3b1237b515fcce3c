"""k-core peeling over an undirected edge set — the graph-density
primitive next to triangle counts (operators/graph.py): the k-core is
the maximal subgraph where every node has degree >= k, computed by
repeatedly deleting under-degree nodes (Matula-Beck peeling; the
distributed formulation is the standard Pregel-style iterate).

Hash-gating an iterate-to-fixpoint algorithm needs the q171 trick: run
a FIXED number of peeling rounds (every quantity integer, every round
a pure function of the last), so the DuckDB oracle can unroll the same
rounds as chained CTEs and compare bit-for-bit.  On a fixture where
the fixed rounds REACH the fixpoint (pinned by a test asserting one
more round changes nothing), the output IS the true k-core — the gate
proves the peeling mechanics exact, and the fixpoint test proves the
round count sufficient at gate scale.  At deployment, loop until a
round deletes nothing (the driver holds no data — one count per round)
with localCheckpoint per round, the q111/q171 lineage idiom.

Per round: one degree aggregation + one semi-join edge filter — two
bounded shuffles, both equi-joins on node keys (bucket the edge table
by src at deployment).  No wedge/pair explosion anywhere: cost is
O(m) per round, rounds bounded by the degeneracy ordering depth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .graph import _degrees

__all__ = ["kcore_peel"]


def kcore_peel(
    edges: DataFrame,
    k: int = 2,
    rounds: int = 3,
    checkpoint: bool = True,
) -> DataFrame:
    """``rounds`` peeling rounds toward the k-core of the undirected
    ``(src, dst)`` edge set (``src < dst`` deduped —
    `cooccurrence_edges`' contract).

    Output, for EVERY node of the input graph: ``deg`` (original
    degree), ``in_core`` (survived all rounds), and ``core_deg`` (the
    node's degree within the surviving subgraph; 0 for peeled nodes).
    When the fixture reaches fixpoint within ``rounds`` (asserted in
    tests), ``in_core`` marks exactly the k-core membership."""
    deg0 = _degrees(edges)
    if checkpoint:
        deg0 = deg0.localCheckpoint(eager=False)
    cur = edges
    for _ in range(int(rounds)):
        deg = _degrees(cur)
        keep = deg.where(F.col("deg") >= F.lit(int(k))).select("node")
        cur = cur.join(
            keep.withColumnRenamed("node", "src"), "src", "left_semi"
        ).join(keep.withColumnRenamed("node", "dst"), "dst", "left_semi")
        if checkpoint:
            cur = cur.localCheckpoint(eager=False)
    final_deg = _degrees(cur).withColumnRenamed("deg", "core_deg")
    # survivors after the LAST filter are nodes with an incident edge in
    # cur PLUS isolated survivors — but a node with degree < k was
    # dropped and one with degree >= k keeps its edges, so survivors
    # always have core_deg >= 1 when k >= 1; nodes absent from cur are
    # peeled (for k >= 2 an isolated node can never survive round 1).
    return (
        deg0.join(final_deg, "node", "left")
        .select(
            "node",
            "deg",
            F.col("core_deg").isNotNull().alias("in_core"),
            F.coalesce("core_deg", F.lit(0)).cast("long").alias("core_deg"),
        )
    )
