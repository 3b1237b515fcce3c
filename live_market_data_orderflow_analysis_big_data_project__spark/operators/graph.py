"""Graph analytics over FK/interaction-derived edge sets: triangle
counting (degree-ordered orientation) and fixed-iteration PageRank
made hash-stable by integer quantization.

The engine already walks one graph algorithm — q111/q119's connected
components (operators/pipeline.py dedup_clusters, Pregel-style
min-label loop).  This module adds the two other canonical graph
capabilities an analytics engine is asked for, both expressed as
pure DataFrame plans:

- **Triangle counting** — the clustering/cohesion primitive.  The
  naive formulation is the canonical-triple 3-way self-join
  (u < v < w), whose wedge stage explodes as sum(deg^2) on hub nodes
  — the graph twin of the all-pairs join.  The standard fix (public:
  Chiba–Nishizeki / Schank's forward algorithm; the MapReduce
  adaptation is Suri–Vassilvitskii's "Counting Triangles and the
  Curse of the Last Reducer", WWW'11) orients every edge from the
  lower-(degree, id) endpoint to the higher: every node's
  out-degree is then bounded by O(sqrt(m)), wedge volume drops from
  sum(deg^2) to O(m^1.5) worst case (graph arboricity in practice),
  and each triangle is generated EXACTLY ONCE at its minimum-rank
  apex — no post-dedup.  All exact integers; the DuckDB oracle is
  the naive triple join, so a hash pass proves the orientation
  rewrite loses and invents nothing.

- **PageRank, k fixed iterations** — float PageRank is never
  hash-gateable: each node sums its neighbors' IEEE contributions in
  partition order.  The repo's determinism rule (exact integers
  wherever a sum crosses a shuffle — functions/hashstable.py) applies
  directly: ranks are carried as int64 micro-units (SCALE = 1e6 per
  node), a contribution is ``pr div out_deg`` (exact integer
  division), the neighbor sum is an INTEGER sum (order-independent),
  and damping is the rational ``(85*s) div 100 + (15*SCALE) div
  100``.  The oracle unrolls the same k iterations with the same
  integer arithmetic, so every rank is bit-identical.  Quantization
  truncates < 1 micro-unit per division — bounded, documented, and
  identical on both engines; at deployment raise SCALE rather than
  switching to floats.

Edge derivation (`cooccurrence_edges`): the fixtures carry no edge
table, so edges are derived deterministically from the event stream —
consecutive distinct users within each event_type's (ts, id)-total-
ordered tape are linked, deduped to an undirected (src < dst) edge
set.  One lag window per type + one distinct; linear in events.

At 100 TB: the edge build is one keyed window (partition by the
stream key); triangle counting is two self-joins on an edge table
hash-partitioned by source (bucket it by ``src`` at deployment and
the wedge join co-locates); PageRank's per-iteration cost is one
shuffle of (dst, contribution) pairs + one integer agg — k fixed
iterations = k bounded shuffles, no driver-side loop state beyond
the lineage (localCheckpoint per iteration, the q111 idiom).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "cooccurrence_edges",
    "triangle_counts",
    "pagerank_quantized",
]

PR_SCALE = 1_000_000  # int64 micro-units of rank mass per node


def cooccurrence_edges(
    df: DataFrame,
    stream_col: str,
    ts_col: str,
    node_col: str,
    id_col: str,
) -> DataFrame:
    """Undirected (src < dst) distinct edge set linking consecutive
    distinct nodes within each stream's (ts, id)-total-ordered tape.
    Deterministic: the order is total (id tie-break), so the edge set
    is a pure function of the rows."""
    w = Window.partitionBy(stream_col).orderBy(ts_col, id_col)
    e = df.select(
        F.col(node_col).alias("_b"),
        F.lag(node_col).over(w).alias("_a"),
    ).where(F.col("_a").isNotNull() & (F.col("_a") != F.col("_b")))
    return e.select(
        F.least("_a", "_b").alias("src"),
        F.greatest("_a", "_b").alias("dst"),
    ).distinct()


def _degrees(edges: DataFrame) -> DataFrame:
    """(node, deg) over an undirected src<dst edge set."""
    return (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )


def triangle_counts(edges: DataFrame, checkpoint: bool = True) -> DataFrame:
    """Per-node triangle participation counts over an undirected,
    deduplicated ``(src, dst)`` edge set (``src < dst``, no
    self-loops — `cooccurrence_edges`' contract).

    Degree-ordered orientation: rank(x) = (deg(x), x); each edge is
    oriented from the lower rank to the higher, so wedges are
    enumerated only at their minimum-rank apex and each triangle is
    produced exactly once.  Output: (node, n_triangles) for every
    node of the graph, 0 for triangle-free nodes — each triangle
    credits all three corners.

    Scale: out-degree under this orientation is bounded by
    O(sqrt(2m)) regardless of hub size (a node ranked above k others
    of >= its degree needs deg >= k), so the wedge join's fan-out is
    m * max_out, not sum(deg^2) — the hub-node explosion of the
    naive triple join cannot occur.  Both self-joins are equi-joins
    on node keys (bucket the oriented edge table by ``lo`` at
    deployment to co-locate).

    ``deg`` feeds three consumers and ``oriented`` feeds three
    (wedge a/c sides + the closing-edge probe): without a lineage
    cut each consumer re-expands the whole edge-tape derivation and
    the plan carries ~100+ exchanges (shuffle reuse hides the cost
    at fixture scale, but plan size alone bloats compile and AQE
    work at real scale).  ``checkpoint=True`` (default) cuts both —
    the q111/pagerank idiom; the frames are graph-sized (nodes /
    oriented edges), far under the corpus the tape derives from.

    r17 (the q171 edge-cut shape, VERDICT r16 item 4): ``edges``
    itself is ALSO cut — it feeds two consumers (the degree agg and
    the orientation join), so uncut the whole upstream edge-tape
    derivation (events scan + lag window + distinct for q170) was
    computed twice per run."""
    if checkpoint:
        edges = edges.localCheckpoint(eager=False)
    deg = _degrees(edges)
    if checkpoint:
        deg = deg.localCheckpoint(eager=False)
    # orient: lo = lower (deg, node), hi = higher
    d_src = deg.select(
        F.col("node").alias("src"), F.col("deg").alias("_dsrc")
    )
    d_dst = deg.select(
        F.col("node").alias("dst"), F.col("deg").alias("_ddst")
    )
    j = edges.join(d_src, "src").join(d_dst, "dst")
    src_first = (F.col("_dsrc") < F.col("_ddst")) | (
        (F.col("_dsrc") == F.col("_ddst")) & (F.col("src") < F.col("dst"))
    )
    oriented = j.select(
        F.when(src_first, F.col("src")).otherwise(F.col("dst")).alias("lo"),
        F.when(src_first, F.col("dst")).otherwise(F.col("src")).alias("hi"),
        F.when(src_first, F.col("_dsrc")).otherwise(F.col("_ddst")).alias(
            "_dlo"
        ),
        F.when(src_first, F.col("_ddst")).otherwise(F.col("_dsrc")).alias(
            "_dhi"
        ),
    )
    if checkpoint:
        oriented = oriented.localCheckpoint(eager=False)
    a = oriented.select(
        F.col("lo").alias("apex"),
        F.col("hi").alias("b"),
        F.col("_dhi").alias("_db"),
    )
    c = oriented.select(
        F.col("lo").alias("apex"),
        F.col("hi").alias("c"),
        F.col("_dhi").alias("_dc"),
    )
    # wedge (apex, b, c) with rank(b) < rank(c) — each unordered pair
    # of apex out-neighbors exactly once
    wedges = a.join(c, "apex").where(
        (F.col("_db") < F.col("_dc"))
        | ((F.col("_db") == F.col("_dc")) & (F.col("b") < F.col("c")))
    )
    closing = oriented.select(
        F.col("lo").alias("b"), F.col("hi").alias("c")
    )
    tri = wedges.join(closing, ["b", "c"]).select("apex", "b", "c")
    # r17 (guide §2.4): each triangle credits its three corners via ONE
    # explode instead of a three-way unionAll of tri — the union planned
    # the whole wedge+closing join subtree three times (3x the exchanges
    # and 3x the join work for an identical node multiset).
    votes = (
        tri.select(F.explode(F.array("apex", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return (
        deg.join(votes, "node", "left")
        .select(
            "node",
            "deg",
            F.coalesce("n_triangles", F.lit(0))
            .cast("long")
            .alias("n_triangles"),
        )
    )


def pagerank_quantized(
    edges: DataFrame,
    k: int = 3,
    scale: int = PR_SCALE,
    checkpoint: bool = True,
) -> DataFrame:
    """k fixed PageRank iterations over the UNDIRECTED edge set (each
    edge walks both ways), damping 0.85, ranks as exact int64
    micro-units so the result is engine- and partition-order-exact.

    Per node: ``pr_micro`` after k iterations (init = ``scale``,
    total mass ~= n_nodes * scale, shrinking by < 1 micro-unit per
    division — truncation is deliberate and mirrored in the oracle)
    and ``deg``.  Every node has deg >= 1 by construction (nodes ARE
    edge endpoints), so there is no dangling-mass term.

    The driver loop holds no data — k bounded shuffle rounds; each
    iteration's frame is localCheckpointed (the q111 lineage-cut
    idiom) so plan depth stays constant."""
    # r16: cut lineage on the edge set once — deg (two union legs), the
    # directed expansion (two more), the per-iteration adj joins and
    # the final deg join otherwise EACH re-derived the caller's edge
    # subtree (for q171: events scan + lag window + distinct, planned
    # 4+ times per iteration); pr's per-iteration checkpoint alone
    # never cut that part.  adj is iteration-invariant, so it gets its
    # own cut and the k contribution rounds become pure
    # (cached adj) x (checkpointed pr) joins.
    edges = edges.localCheckpoint(eager=True)
    deg = _degrees(edges)
    # directed both ways: (node -> nbr)
    out = edges.select(
        F.col("src").alias("node"), F.col("dst").alias("nbr")
    ).unionAll(
        edges.select(F.col("dst").alias("node"), F.col("src").alias("nbr"))
    )
    adj = out.join(deg, "node").localCheckpoint(eager=True)  # (node, nbr, deg)
    pr = deg.select("node", F.lit(int(scale)).cast("long").alias("pr"))
    base = F.lit(15 * int(scale) // 100).cast("long")
    for _ in range(int(k)):
        contrib = (
            adj.join(pr, "node")
            .select(
                F.col("nbr").alias("node"),
                F.expr("pr div deg").cast("long").alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").alias("_s"))
        )
        pr = deg.join(contrib, "node", "left").select(
            "node",
            (
                F.expr("85 * coalesce(_s, 0L) div 100") + base
            ).cast("long").alias("pr"),
        )
        if checkpoint:
            pr = pr.localCheckpoint(eager=False)
    return deg.join(pr, "node").select(
        "node", "deg", F.col("pr").alias("pr_micro")
    )
