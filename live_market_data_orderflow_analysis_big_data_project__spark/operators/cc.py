"""Connected components by alternating large-star / small-star — the
O(log d)-round successor to ``pipeline.dedup_clusters``'s min-label
propagation.

Why a second CC operator: min-label propagation (q111) moves a
component's minimum label ONE hop per round, so it converges in
diameter-many rounds.  Near-dup components are usually tiny, but
chained template spam makes the diameter data-dependent at corpus
scale — a 10 000-doc drift chain would need 10 000 rounds.  The
large-star/small-star algorithm (Kiveris et al., "Connected Components
in MapReduce and Beyond", SoCC 2014 — public) contracts DISTANCE TO
THE MINIMUM instead of moving labels hop by hop: each large-star round
re-points every node's larger neighbors at its local minimum, roughly
halving min-distances, and the alternating small-star round compacts
the resulting parent chains.  Convergence is O(log^2 n) worst case and
~log(diameter) in practice, INDEPENDENT of how long the dup chains
are.

Both operators emit the identical contract — (id, cluster_id) with
cluster_id = the component's minimum id over the nodes that appear in
``edges`` — so the two are gate-checked against the SAME recursive-CTE
oracle (q111's), and the adversarial-chain equivalence is pinned by
test (tests/test_cc.py): on a path graph the label-propagation form
needs diameter rounds while this converges in ~log.

100 TB posture: every round is two self-groupings of the edge frame
keyed by node id (one per star phase) — distributed, never all-pairs;
``localCheckpoint`` cuts lineage per round (the q111/q171/q183
iterative discipline).  The edge frame SHRINKS round over round (stars
dedupe transitively-implied edges), so later rounds are cheaper than
earlier ones.  The convergence probe (count + set-difference against
the previous round) is one extra keyed anti-join on the already-
checkpointed oriented edge frame — the same cost class as a star
round itself, run only when the counts match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(sym: DataFrame) -> DataFrame:
    """One large-star round over the SYMMETRIC neighbor frame
    (u, nbr): for each node u, connect every strictly-larger neighbor
    to m(u) = min({u} ∪ N(u)).  Emitted edges are (big, small) with
    big > small by construction (v > u >= m)."""
    nbrs = sym.groupBy("u").agg(
        F.min("nbr").alias("mn"), F.collect_set("nbr").alias("ns")
    )
    mn = F.least(F.col("u"), F.col("mn"))
    return (
        nbrs.select("u", mn.alias("m"), F.explode("ns").alias("v"))
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("big"), F.col("m").alias("small"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """One small-star round over ORIENTED edges (big, small): for each
    node u (as ``big``), connect u and all its smaller neighbors to
    m = min of those neighbors.  Output stays (big, small)-oriented."""
    nbrs = edges.groupBy("big").agg(
        F.min("small").alias("m"), F.collect_set("small").alias("ns")
    )
    re_pointed = nbrs.select(
        "big", "m", F.explode("ns").alias("v")
    ).where(F.col("v") != F.col("m")).select(
        F.col("v").alias("big"), F.col("m").alias("small")
    )
    self_edge = nbrs.select(
        F.col("big"), F.col("m").alias("small")
    )
    return re_pointed.unionByName(self_edge).distinct()


def cc_bigstar(
    edges: DataFrame,
    max_rounds: int = 20,
    id_col: str = "doc_id",
) -> DataFrame:
    """Connected components over a pair graph: (id_col, cluster_id)
    with cluster_id = min node id in the component, for every node
    appearing in ``edges`` (columns doc_a, doc_b; self-loops and
    duplicates tolerated).

    Alternates large-star / small-star until the oriented edge set is
    a fixpoint (then it IS the star forest: every non-minimum node
    points directly at its component minimum).  The fixpoint check
    compares consecutive rounds exactly (count, then a set difference
    only when counts match) — no probabilistic hashing in the
    termination path of a hash-gated operator.  A graph that has not
    converged after ``max_rounds`` raises loudly rather than returning
    a partially-contracted labeling (the fuzzy.py circuit-breaker
    convention).  Measured convergence on path graphs (the worst
    diameter per node count): 8 rounds at diameter 100, 11 at 1 000,
    15 at 10 000 — ~1.3·log2(d) — so the default 20 covers diameters
    past 10^5; converged runs exit at their actual round count, so a
    generous cap costs nothing.

    Reference shape: Kiveris et al. 2014 (two-phase algorithm);
    equivalent output contract to pipeline.dedup_clusters (q111) —
    parity on the same edge frame is gate- and property-pinned.

    ``collect_set`` buffers one neighbor LIST per node per round; the
    large-star bound is a node's CURRENT degree.  Extreme hubs are
    exactly the nodes large-star contracts first (their neighbors
    re-point to the min and leave), and small-star inputs are already
    star-shaped, so buffers shrink with the rounds.  For adversarial
    first-round hubs (a fingerprint shared by millions of docs) feed
    star edges (hub = the group min) rather than pair-exploded groups
    — the q111 edge-construction convention this operator shares.
    """
    raw = edges.select(
        F.col("doc_a").cast("long").alias("a"),
        F.col("doc_b").cast("long").alias("b"),
    )
    e0 = (
        raw.where(F.col("a") != F.col("b"))
        .select(
            F.greatest("a", "b").alias("big"),
            F.least("a", "b").alias("small"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    # node set from the PRE-filter frame: a node appearing only in a
    # self-loop still exists (alone, labeled itself) — the
    # dedup_clusters contract this operator must match exactly
    nodes = (
        raw.select(F.col("a").alias("n"))
        .unionByName(raw.select(F.col("b").alias("n")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    cur = e0
    converged = False
    for _ in range(max_rounds):
        sym = cur.select(
            F.col("big").alias("u"), F.col("small").alias("nbr")
        ).unionByName(
            cur.select(F.col("small").alias("u"), F.col("big").alias("nbr"))
        )
        nxt = _small_star(_large_star(sym)).localCheckpoint(eager=True)
        if nxt.count() == cur.count():
            if nxt.exceptAll(cur).count() == 0:
                converged = True
                cur = nxt
                break
        cur = nxt
    if not converged:
        raise ValueError(
            f"cc_bigstar: no fixpoint within max_rounds={max_rounds} "
            "rounds - raise max_rounds (each round is ~log-halving, so "
            "this graph is pathological) rather than trusting a "
            "partially-contracted labeling"
        )

    return (
        nodes.join(
            cur.select(
                F.col("big").alias("n"), F.col("small").alias("cluster")
            ),
            "n",
            "left",
        )
        .select(
            F.col("n").alias(id_col),
            F.coalesce("cluster", "n").alias("cluster_id"),
        )
    )
