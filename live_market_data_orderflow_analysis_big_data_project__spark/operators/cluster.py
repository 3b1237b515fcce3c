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

__all__ = [
    "quantize_vectors",
    "kmeans_quantized",
    "pq_adc_topk",
    "ivf_pq_topk",
]

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


def _d2() -> F.Column:
    # built lazily — higher-order functions need an active session,
    # so a module-level Column would break import-before-SparkSession
    return F.aggregate(
        F.zip_with("qv", "cv", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _assign(vecs: DataFrame, cent: DataFrame, id_col: str) -> DataFrame:
    """Argmin assignment of a quantized frame against a centroid frame
    (broadcast of k rows; exact int64 d2; cluster-id tie-break)."""
    rk = F.row_number().over(
        Window.partitionBy(id_col).orderBy("d2", "cluster")
    )
    return (
        vecs.crossJoin(F.broadcast(cent))
        .select(id_col, "qv", "cluster", _d2().alias("d2"))
        .withColumn("_rk", rk)
        .where(F.col("_rk") == 1)
        .drop("_rk")
    )


def _fit_centroids(
    vecs: DataFrame, id_col: str, k: int, iters: int
) -> DataFrame:
    """Lloyd loop over an (id, qv) quantized frame; returns the final
    ``(cluster, cv)`` centroid frame.  Caller localCheckpoints the
    input (it is scanned once per iteration)."""
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
    # the seed LIMIT under-fills silently when the frame holds fewer
    # than k vectors — fail loudly like the operator's other guards
    # (the checkpointed frame is k rows, so the count is free)
    n_seeds = cent.count()
    if n_seeds < k:
        raise ValueError(
            f"_fit_centroids: only {n_seeds} distinct vectors for "
            f"k={k} seeds - k is bounded by the vector count"
        )

    for _ in range(iters):
        a = _assign(vecs, cent, id_col)
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
    return cent


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
    cent = _fit_centroids(vecs, id_col, k, iters)
    return _assign(vecs, cent, id_col).select(id_col, "cluster", "d2")


def pq_adc_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    m: int = 4,
    k: int = 4,
    iters: int = 2,
    n_queries: int = 3,
    topk: int = 10,
) -> DataFrame:
    """Product-quantization ADC search (Jégou et al. 2011): compress
    each vector to ``m`` subspace codes via per-subspace integer
    k-means, then answer top-k by Asymmetric Distance Computation —
    the classic memory-bound ANN rung between q116's scalar int8
    quantization and the IVF/LSH bucketing paths, here fully
    HASH-GATEABLE because codebooks, codes, and ADC sums are exact
    int64 end to end (the kmeans_quantized discipline per subspace).

    Queries are the ``n_queries`` dataset vectors with the smallest
    md5(id) (the q112/q181 content-hash reproducibility contract).
    For each query, every vector's ADC distance is the sum over
    subspaces of the exact d2 between the query's sub-vector and the
    centroid the vector's code names — m table lookups per vector,
    never a d-dimensional scan.  Output per query: ``query_id``,
    ``rank`` (ADC distance asc, id tie-break), ``id_col``, ``adc_d2``.

    At 100 TB: codebooks are m·k rows (broadcast); encoding is m
    bounded Lloyd loops over the vector frame (each the
    kmeans_quantized shape — broadcast assign + (cluster, dim) update
    shuffle); the search joins the CODES frame (m ints per vector,
    the whole point of PQ) against an n_queries·m·k-row broadcast
    table and aggregates m rows per (query, vector) — map-side
    combinable, no full-vector traffic at query time.  The dimension
    guard is folded into every slice bound so the optimizer can never
    prune it.
    """
    if dim % m != 0:
        raise ValueError(f"m={m} must divide dim={dim}")
    if n_queries < 1 or topk < 1:
        raise ValueError("n_queries and topk must be >= 1")
    sub_d = dim // m
    vecs = quantize_vectors(df, id_col, vec_col).localCheckpoint(
        eager=True
    )
    queries = (
        vecs.select(
            F.col(id_col).alias("query_id"),
            "qv",
            F.md5(F.col(id_col).cast("string").cast("binary")).alias("_h"),
        )
        .orderBy("_h", "query_id")
        .limit(n_queries)
        .drop("_h")
        .localCheckpoint(eager=True)
    )
    # LIMIT under-fills silently when fewer than n_queries vectors
    # exist — fail loudly like the dim/param guards (the checkpointed
    # frame is n_queries rows, so the count is free)
    n_q = queries.count()
    if n_q < n_queries:
        raise ValueError(
            f"pq_adc_topk: only {n_q} vectors available for "
            f"n_queries={n_queries}"
        )

    def sub_slice(s: int) -> F.Column:
        # the dim contract rides in the slice LENGTH argument — a
        # wrong-width vector raises instead of silently mis-slicing
        return F.expr(
            f"slice(qv, {s * sub_d + 1}, "
            f"CASE WHEN size(qv) <> {dim} THEN "
            f"CAST(raise_error('pq_adc_topk: vector dimension <> {dim}"
            " - pass the actual dim (operator docstring)') AS INT) "
            f"ELSE {sub_d} END)"
        )

    # The m sub-chains are independent (disjoint coordinate slices,
    # separate codebooks) but each contains BLOCKING actions (eager
    # lineage cuts, the seed under-fill count) — run them as
    # concurrent Spark jobs from a thread pool instead of serially.
    # Spark job submission is thread-safe; results are identical
    # because nothing crosses subspaces until the union below (the
    # hash gate proves it).  Measured on the r14 tree: 5.9 s -> ~2.5 s
    # at sf0.1.  At cluster scale the same structure overlaps the m
    # corpus scans instead of serializing them.
    def _fit_sub(s: int):
        sub = vecs.select(
            id_col, sub_slice(s).alias("qv")
        ).localCheckpoint(eager=True)
        return sub, _fit_centroids(sub, id_col, k, iters)

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=m) as pool:
        fitted = list(pool.map(_fit_sub, range(m)))

    codes_parts, table_parts = [], []
    for s, (sub, cent_s) in enumerate(fitted):
        codes_parts.append(
            _assign(sub, cent_s, id_col).select(
                id_col,
                F.lit(s).cast("long").alias("sub"),
                F.col("cluster").alias("code"),
            )
        )
        table_parts.append(
            queries.select("query_id", sub_slice(s).alias("qv"))
            .crossJoin(F.broadcast(cent_s))
            .select(
                "query_id",
                F.lit(s).cast("long").alias("sub"),
                F.col("cluster").alias("code"),
                _d2().alias("d2"),
            )
        )
    codes = codes_parts[0]
    for p in codes_parts[1:]:
        codes = codes.unionByName(p)
    table = table_parts[0]
    for p in table_parts[1:]:
        table = table.unionByName(p)
    scores = (
        codes.join(F.broadcast(table), ["sub", "code"])
        .groupBy("query_id", id_col)
        .agg(F.sum("d2").alias("adc_d2"))
    )
    rk = F.row_number().over(
        Window.partitionBy("query_id").orderBy("adc_d2", id_col)
    )
    return (
        scores.withColumn("rank", rk.cast("long"))
        .where(F.col("rank") <= topk)
        .select("query_id", "rank", id_col, "adc_d2")
    )


def ivf_pq_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    coarse_k: int = 4,
    coarse_iters: int = 2,
    m: int = 4,
    k: int = 4,
    iters: int = 2,
    nprobe: int = 2,
    n_queries: int = 3,
    topk: int = 10,
) -> DataFrame:
    """IVF-PQ search — the composition of the engine's two exact ANN
    rungs (the production FAISS index shape): a COARSE integer k-means
    partitions the corpus into ``coarse_k`` inverted lists, each query
    probes only its ``nprobe`` nearest lists, and candidates inside
    the probed lists are ranked by the PQ Asymmetric Distance over
    ``m`` per-subspace integer codebooks (flat-PQ codes over the raw
    vectors, not residuals — the variant whose codebooks are shared
    across lists, which is what keeps the oracle replayable).  Unlike
    q92b's float-KMeans IVF this is FULLY hash-gateable: coarse chain,
    probe selection, codes, and ADC sums are exact int64 end to end
    with total-order tie-breaks everywhere (d2 then cluster/id).

    Queries are the ``n_queries`` dataset vectors with the smallest
    md5(id) (the q112/q181 contract).  Output per query: ``query_id``,
    ``rank`` (ADC asc, id tie-break), ``id_col``, ``bucket`` (the
    candidate's inverted list), ``adc_d2``.  A query scores ONLY
    vectors whose coarse list it probes — the recall/scan trade the
    nprobe knob buys; at these fixture knobs the restriction BINDS
    (probed-bucket candidates < corpus, pinned by test).

    At 100 TB: coarse fit is ``coarse_iters`` broadcast-assign +
    (cluster, dim) update shuffles (the kmeans_quantized shape); PQ
    encode is m of the same over sub-vectors; the SEARCH touches the
    codes frame (m ints per vector) filtered by an
    n_queries·nprobe-row broadcast of probed lists, then an
    n_queries·m·k-row broadcast ADC table — per-query work is
    proportional to the probed lists' population, never the corpus,
    which is the entire point of IVF.
    """
    if dim % m != 0:
        raise ValueError(f"m={m} must divide dim={dim}")
    if min(n_queries, topk, nprobe, coarse_k, coarse_iters) < 1:
        raise ValueError(
            "n_queries, topk, nprobe, coarse_k, coarse_iters must be >= 1"
        )
    if nprobe > coarse_k:
        raise ValueError(f"nprobe={nprobe} exceeds coarse_k={coarse_k}")
    sub_d = dim // m
    vecs = quantize_vectors(df, id_col, vec_col).localCheckpoint(
        eager=True
    )
    queries = (
        vecs.select(
            F.col(id_col).alias("query_id"),
            "qv",
            F.md5(F.col(id_col).cast("string").cast("binary")).alias("_h"),
        )
        .orderBy("_h", "query_id")
        .limit(n_queries)
        .drop("_h")
        .localCheckpoint(eager=True)
    )
    n_q = queries.count()
    if n_q < n_queries:
        raise ValueError(
            f"ivf_pq_topk: only {n_q} vectors available for "
            f"n_queries={n_queries}"
        )

    # ---- coarse quantizer: corpus -> inverted lists --------------------
    cent_c = _fit_centroids(vecs, id_col, coarse_k, coarse_iters)
    buckets = _assign(vecs, cent_c, id_col).select(
        id_col, F.col("cluster").alias("bucket")
    )
    probe_rk = F.row_number().over(
        Window.partitionBy("query_id").orderBy("d2", "cluster")
    )
    probed = (
        queries.crossJoin(F.broadcast(cent_c))
        .select("query_id", "cluster", _d2().alias("d2"))
        .withColumn("_rk", probe_rk)
        .where(F.col("_rk") <= nprobe)
        .select("query_id", F.col("cluster").alias("bucket"))
        .localCheckpoint(eager=True)  # n_queries * nprobe rows
    )

    def sub_slice(s: int) -> F.Column:
        # the dim contract rides in the slice LENGTH argument — a
        # wrong-width vector raises instead of silently mis-slicing
        return F.expr(
            f"slice(qv, {s * sub_d + 1}, "
            f"CASE WHEN size(qv) <> {dim} THEN "
            f"CAST(raise_error('ivf_pq_topk: vector dimension <> {dim}"
            " - pass the actual dim (operator docstring)') AS INT) "
            f"ELSE {sub_d} END)"
        )

    # ---- PQ codebooks + codes (shared across lists) --------------------
    # The m sub-chains are independent (disjoint coordinate slices,
    # separate codebooks) but each contains BLOCKING actions (eager
    # lineage cuts, the seed under-fill count) — run them as
    # concurrent Spark jobs from a thread pool instead of serially.
    # Spark job submission is thread-safe; results are identical
    # because nothing crosses subspaces until the union below (the
    # hash gate proves it — the pq_adc_topk change, applied here too).
    # At cluster scale the same structure overlaps the m corpus scans
    # instead of serializing them.
    def _fit_sub(s: int):
        sub = vecs.select(
            id_col, sub_slice(s).alias("qv")
        ).localCheckpoint(eager=True)
        return sub, _fit_centroids(sub, id_col, k, iters)

    from concurrent.futures import FIRST_EXCEPTION, ThreadPoolExecutor, wait

    # submit + wait(FIRST_EXCEPTION) instead of pool.map so a failing
    # sub-chain (e.g. the seed under-fill ValueError) surfaces as soon
    # as it happens, not in submission order after healthy siblings
    # run to completion; queued-but-unstarted siblings are cancelled
    # (the r14 ADVICE).  A sibling whose Spark job is already IN
    # FLIGHT still finishes its current action — Python threads cannot
    # be interrupted — but no further round of its Lloyd chain starts
    # once the failure propagates from here.  pq_adc_topk keeps the
    # plain pool.map until q191 re-enters the driver window (r18) —
    # editing its closure now would orphan its standing r14 evidence
    # (tools/stale_check.py's contract).
    with ThreadPoolExecutor(max_workers=m) as pool:
        futs = [pool.submit(_fit_sub, s) for s in range(m)]
        done, _ = wait(futs, return_when=FIRST_EXCEPTION)
        failed = next(
            (f for f in done if f.exception() is not None), None
        )
        if failed is not None:
            for f in futs:
                f.cancel()
            raise failed.exception()
        fitted = [f.result() for f in futs]

    codes_parts, table_parts = [], []
    for s, (sub, cent_s) in enumerate(fitted):
        codes_parts.append(
            _assign(sub, cent_s, id_col).select(
                id_col,
                F.lit(s).cast("long").alias("sub"),
                F.col("cluster").alias("code"),
            )
        )
        table_parts.append(
            queries.select("query_id", sub_slice(s).alias("qv"))
            .crossJoin(F.broadcast(cent_s))
            .select(
                "query_id",
                F.lit(s).cast("long").alias("sub"),
                F.col("cluster").alias("code"),
                _d2().alias("d2"),
            )
        )
    codes = codes_parts[0]
    for p in codes_parts[1:]:
        codes = codes.unionByName(p)
    table = table_parts[0]
    for p in table_parts[1:]:
        table = table.unionByName(p)

    # ---- ADC restricted to probed lists ---------------------------------
    cand = codes.join(buckets, id_col).join(
        F.broadcast(probed), "bucket"
    )
    scores = (
        cand.join(F.broadcast(table), ["query_id", "sub", "code"])
        .groupBy("query_id", id_col, "bucket")
        .agg(F.sum("d2").alias("adc_d2"))
    )
    rk = F.row_number().over(
        Window.partitionBy("query_id").orderBy("adc_d2", id_col)
    )
    return (
        scores.withColumn("rank", rk.cast("long"))
        .where(F.col("rank") <= topk)
        .select("query_id", "rank", id_col, "bucket", "adc_d2")
    )
