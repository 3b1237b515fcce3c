"""Integer-quantized Lloyd's k-means — fixed iterations, deterministic
seeding, exact int64 arithmetic end to end (the iterative-clustering
capability slot, hash-gateable where float k-means never is).

Float k-means is partition-order-dependent twice over: the centroid
mean accumulates IEEE sums in merge order, and ties in distance break
by arrival.  This operator applies the q171 integer-quantization rule
to clustering:

- vectors quantize ONCE to int64 grid points v = floor(x · 10^4) + 10^4
  (floor, not round — IEEE floor of the same double is bit-identical on
  every engine, while round-half cases differ between Spark's HALF_UP
  and DuckDB's half-to-even; the +10^4 shift makes every coordinate
  non-negative so later integer division has no floor-vs-truncate
  ambiguity).  The |x| <= 1 input contract is ENFORCED per-row with a
  raise_error guard (the collocation_lift pattern);
- seeds are the k vectors with the smallest md5(vec_id) (content-hash
  order, vec_id tie-break — the q112/q181 reproducibility contract),
  taken with sort+limit (TakeOrderedAndProject, never a global window);
- each iteration assigns by exact int64 squared L2 (argmin with
  cluster-id tie-break) and recomputes centroids as per-dimension
  integer floor-means (sum div count of non-negative ints — exact and
  engine-identical); an emptied cluster keeps its previous centroid
  (deterministic carry, schema never shrinks);
- ITERATIONS is a fixed knob (the q171/q175 bounded-iteration class),
  each round lineage-cut with localCheckpoint.

Scale shape: the vector frame is scanned once per iteration; the
assign step is a BROADCAST of k centroid rows (k rows, never a
shuffle of the data side) + one zip_with/aggregate HOF per row, all
JVM-side; the update is one (cluster, dim) sum shuffle — map-side
combinable, k·d rows out.  Total: iters bounded shuffles of k·d rows
plus iters broadcast scans, the same shape as distributed MLlib
k-means but with exact integer state.  Headroom: d · (2·10^4)^2 =
2.6e10 per distance and n · 2·10^4 per centroid sum — both orders of
magnitude inside int64 at any corpus size under ~4e14 vectors.

(Reference parity: no clustering machinery exists in the reference —
SURVEY.md §2.4.  This is the LLM-pipeline cluster step SemDeDup-style
curation needs before q121's within-cluster pruning.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["quantize_vectors", "kmeans_quantized"]

_SCALE = 10_000
_SHIFT = 10_000


def quantize_vectors(
    df: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """(id, qv) with qv = array<long> of floor(x·10^4) + 10^4.

    Coordinates must satisfy |x| <= 1 (unit-normalized embeddings);
    violations raise loudly instead of silently folding distant points
    onto the grid boundary.  NULL vectors are excluded (they carry no
    position)."""
    q = F.transform(
        F.col(vec_col),
        lambda x: F.when(
            F.abs(x.cast("double")) > F.lit(1.0),
            F.expr(
                "CAST(raise_error('kmeans_quantized: |coordinate| > 1"
                " - normalize vectors before clustering (module "
                "docstring)') AS BIGINT)"
            ),
        ).otherwise(
            F.floor(x.cast("double") * F.lit(float(_SCALE))).cast("long")
            + F.lit(_SHIFT)
        ),
    )
    return df.where(F.col(vec_col).isNotNull()).select(
        id_col, q.alias("qv")
    )


def kmeans_quantized(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    iters: int,
) -> DataFrame:
    """Fixed-iteration integer k-means; returns the final assignment
    ``(id, cluster, d2)`` — cluster in 0..k-1 (seed hash order), d2
    the exact int64 squared distance to the final centroid.

    ``iters`` full (assign, update) rounds run, then one final assign
    against the last centroids.  Deterministic given (data, k, iters):
    rerun-stable across engines, partitionings and cluster sizes."""
    if k < 1 or iters < 0:
        raise ValueError("k must be >= 1 and iters >= 0")
    vecs = quantize_vectors(df, id_col, vec_col).localCheckpoint(
        eager=True
    )
    seeds = (
        vecs.select(
            id_col,
            "qv",
            F.md5(F.col(id_col).cast("string").cast("binary")).alias("_h"),
        )
        .orderBy("_h", id_col)
        .limit(k)
    )
    cent = seeds.select(
        (
            F.row_number().over(Window.orderBy("_h", id_col)) - 1
        ).cast("long").alias("cluster"),
        F.col("qv").alias("cv"),
    ).localCheckpoint(eager=True)

    d2 = F.aggregate(
        F.zip_with("qv", "cv", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )

    def assign(c: DataFrame) -> DataFrame:
        rk = F.row_number().over(
            Window.partitionBy(id_col).orderBy("d2", "cluster")
        )
        return (
            vecs.crossJoin(F.broadcast(c))
            .select(id_col, "qv", "cluster", d2.alias("d2"))
            .withColumn("_rk", rk)
            .where(F.col("_rk") == 1)
            .drop("_rk")
        )

    for _ in range(iters):
        a = assign(cent)
        upd = (
            a.select("cluster", F.posexplode("qv").alias("dim", "v"))
            .groupBy("cluster", "dim")
            .agg(F.expr("sum(v) div count(1)").alias("nv"))
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("dim", "nv"))
                    ),
                    lambda s: s.getField("nv"),
                ).alias("ncv")
            )
        )
        # emptied clusters keep their previous centroid (deterministic
        # carry; the output schema never shrinks below k)
        cent = (
            cent.join(upd, "cluster", "left")
            .select(
                "cluster",
                F.coalesce("ncv", "cv").alias("cv"),
            )
            .localCheckpoint(eager=True)  # the q171 per-iteration cut
        )

    return assign(cent).select(
        id_col, "cluster", "d2"
    )
