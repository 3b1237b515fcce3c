"""Hyperplane bit-LSH (sign-random-projection) top-k — the BINARY
quantization rung of the ANN family, fully hash-gated.

The engine's ANN spectrum so far: q116 int8 scalar quantization
(8 bits/coordinate), q191 product quantization (m codes/vector),
q92b/q93b/q136 bucketed approximate paths, q193 IVF-PQ.  This operator
adds the remaining classic rung — Charikar's sign-random-projection
sketch (SimHash for real vectors): each vector compresses to B sign
bits (one per hyperplane), candidate generation runs on the B-bit
signatures alone (Hamming distance via XOR + popcount — one bigint per
vector regardless of B <= 63, ~10x fewer bytes than the raw
float64[64]), and the final ranking re-scores only the top-C Hamming
candidates with exact int64 squared distance on the quantized grid.

Determinism end to end (every stage engine-replayable):

- hyperplanes are pseudo-random +-1 weight rows derived from
  ``md5('h{h}:d{d}')`` (first hex digit < 8 -> +1 else -1) — a
  deterministic constant both engines can recompute (the md5 of the
  same ASCII string is identical everywhere; pinned cross-engine by
  test against DuckDB's md5());
- coordinates quantize on the q183 grid (``quantize_vectors``: floor
  to int64, +10^4 shift, |x| <= 1 raise_error-enforced).  Sign bits
  need the UNSHIFTED dot, so bit_h tests
  ``sum_d w(h,d) * qv_d  >=  SHIFT * sum_d w(h,d)`` — the shift term
  is an exact per-hyperplane integer constant;
- signatures pack little-endian into one BIGINT (bit h at weight 2^h);
  Hamming = ``bit_count(sig_a XOR sig_b)`` — exact on both engines;
- top-C candidates per query by (hamming, vec_id) total order; final
  top-k by (exact d2, vec_id).  Queries are the ``n_queries``
  smallest-md5(id) vectors (the q112/q181/q191 content-hash contract).

Approximation surface: ONLY the top-C Hamming cut (like q191's ADC or
q193's nprobe, the pipeline is deterministic and oracle-replayable;
"approximate" refers to recall vs exact brute force, which is a
measured per-corpus fact, not part of the gate).

At 100 TB: the signature stage is one narrow projection (B aggregate
HOFs per row, JVM codegen, no shuffle, no explode); candidate
generation scans (n_queries x n) SIGNATURE rows — bigints, not
vectors — through one per-query top-C window (skinny shuffle); only
n_queries x C rows ever touch full vectors again (broadcast join).
The scale extension when n_queries grows is Hamming-band bucketing
(the q91b/q91d band trick on signature bytes), which changes candidate
generation only — the rerank contract stays.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .cluster import _SHIFT, quantize_vectors

__all__ = ["hyperplane_weights", "bit_lsh_topk", "signature_udf"]


def hyperplane_weights(n_planes: int, dim: int) -> list[list[int]]:
    """The deterministic +-1 hyperplane matrix, row h = plane h.

    w(h, d) = +1 iff the first hex digit of md5('h{h}:d{d}') is < 8
    (i.e. the top bit of the first nibble is 0 — an unbiased coin on
    uniformly-distributed hex).  Both engines can replay this: DuckDB
    ``md5('h0:d1')`` equals Python ``hashlib.md5(b'h0:d1')`` equals
    Spark ``md5(CAST('h0:d1' AS BINARY))`` (pinned by test)."""
    return [
        [
            1
            if int(
                hashlib.md5(f"h{h}:d{d}".encode()).hexdigest()[0], 16
            )
            < 8
            else -1
            for d in range(dim)
        ]
        for h in range(n_planes)
    ]


def signature_udf(weights: list[list[int]], dim: int):
    """The vectorized Arrow signature kernel (guide §4.2) for a fixed
    hyperplane matrix: one packed little-endian sign-bit BIGINT per
    quantized vector (bit h set iff ``sum_d w(h,d)·qv_d >= SHIFT ·
    sum_d w(h,d)``).

    r16 moved the signature off the former pure-expression form, which
    ran n_planes interpreted zip_with/aggregate folds per row (48 x 128
    lambda evaluations per vector; the signature pass dominated the
    operator's build).  EXACTNESS IS UNCONDITIONAL: every term is int64
    (quantized grid coordinates x ±1 weights), and integer addition is
    associative — there is no summation-order caveat as with float
    kernels — so the packed signatures are identical by arithmetic,
    AND pinned by test (tests/test_bitlsh.py kernel-vs-fold equality,
    the q121 discipline).  |dot| <= dim * 2e4 keeps the matmul far
    inside int64.  The dim contract lives in the kernel (raises
    per-batch before any signature is emitted); a NULL vector
    propagates to a NULL signature — the expression fold's behavior
    (r16 ADVICE: ``qv.map(len)`` crashed on NULL with an opaque
    TypeError).  Exposed at module level so the equality test exercises
    THE kernel the operator runs, not a copy."""
    from pyspark.sql.types import LongType

    @F.pandas_udf(LongType())
    def _sig(qv: pd.Series) -> pd.Series:
        import numpy as np

        sub = qv[qv.notna()]
        if len(sub):
            lens = sub.map(len).to_numpy()
            if (lens != dim).any():
                raise ValueError(
                    f"bit_lsh_topk: vector dimension <> {dim} - pass "
                    "the actual dim (operator docstring)"
                )
        W = np.array(weights, dtype=np.int64)          # (planes, dim)
        th = np.array(
            [_SHIFT * sum(r) for r in weights], dtype=np.int64
        )
        shifts = np.arange(len(weights), dtype=np.int64)
        if len(sub) == len(qv):                        # no NULLs: fast path
            if len(qv) == 0:
                return pd.Series([], dtype="int64")
            V = np.stack(qv.to_numpy()).astype(np.int64)
            bits = (V @ W.T >= th).astype(np.int64)
            return pd.Series((bits << shifts).sum(axis=1))
        out = pd.Series([None] * len(qv), dtype="object")
        if len(sub):
            V = np.stack(sub.to_numpy()).astype(np.int64)
            bits = (V @ W.T >= th).astype(np.int64)
            out[sub.index] = (bits << shifts).sum(axis=1)
        return out

    return _sig


def bit_lsh_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_planes: int,
    n_candidates: int,
    n_queries: int,
    topk: int,
) -> DataFrame:
    """Per query: ``(query_id, rank, vec_id, hamming, d2)`` — the
    top-``topk`` of the top-``n_candidates`` Hamming candidates,
    reranked by exact int64 squared distance.

    Contract guards (all loud): n_planes in [1, 63] (the signature
    must fit a BIGINT with room for the sign bit), topk <=
    n_candidates (a rerank that can emit un-reranked rows is a lie),
    dim enforced per-row by the signature expression, n_queries
    under-fill checked after the LIMIT."""
    if not 1 <= n_planes <= 63:
        raise ValueError("bit_lsh_topk: n_planes must be in [1, 63]")
    if topk > n_candidates:
        raise ValueError(
            f"bit_lsh_topk: topk={topk} > n_candidates={n_candidates}"
        )
    weights = hyperplane_weights(n_planes, dim)

    vecs = quantize_vectors(df, id_col, vec_col).localCheckpoint(
        eager=True
    )

    _sig = signature_udf(weights, dim)

    sigs = vecs.select(
        id_col, "qv", _sig("qv").alias("sig")
    ).localCheckpoint(eager=True)

    queries = (
        sigs.select(
            F.col(id_col).alias("query_id"),
            F.col("qv").alias("q_qv"),
            F.col("sig").alias("q_sig"),
            F.md5(F.col(id_col).cast("string").cast("binary")).alias(
                "_h"
            ),
        )
        .orderBy("_h", "query_id")
        .limit(n_queries)
        .drop("_h")
        .localCheckpoint(eager=True)
    )
    n_q = queries.count()
    if n_q < n_queries:
        raise ValueError(
            f"bit_lsh_topk: only {n_q} vectors available for "
            f"n_queries={n_queries}"
        )
    # a non-binding Hamming cut would silently turn the approximate
    # path into a brute-force exact rerank of the whole corpus — fail
    # loudly instead, mirroring the n_queries under-fill guard (the
    # count is free: `sigs` is already checkpointed).  Callers that
    # WANT the exact answer should use the exact kNN operator.
    n_corpus = sigs.count()
    if n_candidates >= n_corpus:
        raise ValueError(
            f"bit_lsh_topk: n_candidates={n_candidates} >= corpus size "
            f"{n_corpus} - the Hamming cut would be vacuous (a "
            "brute-force rerank in disguise); lower n_candidates or "
            "use the exact kNN path"
        )

    # candidate generation on SIGNATURES only: broadcast the
    # n_queries-row frame (sans vectors) against the (id, sig) frame
    ham = F.expr("bit_count(q_sig ^ sig)").cast("long")
    cand_rk = F.row_number().over(
        Window.partitionBy("query_id").orderBy("hamming", id_col)
    )
    cands = (
        sigs.drop("qv")
        .crossJoin(F.broadcast(queries.select("query_id", "q_sig")))
        .select("query_id", id_col, ham.alias("hamming"))
        .withColumn("_rk", cand_rk)
        .where(F.col("_rk") <= n_candidates)
        .drop("_rk")
    )

    # exact rerank of the n_queries x n_candidates survivors only
    d2 = F.aggregate(
        F.zip_with("qv", "q_qv", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    rk = F.row_number().over(
        Window.partitionBy("query_id").orderBy("d2", id_col)
    )
    return (
        cands.join(sigs.select(id_col, "qv"), id_col)
        .join(F.broadcast(queries.select("query_id", "q_qv")), "query_id")
        .select("query_id", id_col, "hamming", d2.alias("d2"))
        .withColumn("rank", rk.cast("long"))
        .where(F.col("rank") <= topk)
        .select("query_id", "rank", id_col, "hamming", "d2")
    )
