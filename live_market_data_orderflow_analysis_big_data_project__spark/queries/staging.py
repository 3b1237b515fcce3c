"""Next-rotation staging: gate entries authored and oracle-verified
BEFORE they enter the driver window.

The round-8 lesson encoded as process: a new ``queries()`` entry only
holds evidence if it is inside the 50-slot driver window, and window
slots are contended (rotation freshness vs new surface).  So new
entries are staged here — same (spark, sf_dir) -> DataFrame contract,
same oracle-SQL twins, exercised by tests/test_next_rotation.py with
the EXACT driver compare (check_oracle's normalize + hash) on every
pytest run — and promoted into queries()/oracle_sql() when a window
slot opens.  Promotion is a dict move, not new code.

The round-12 rotation (docs/ROTATION_r12.md) promoted all 5 entries
staged at r11 close (q179 grouped-agg pandas UDF, q180 rank-spaced
quantile rollup, q181 weighted ticket-race sample, q182 NEAR/k
proximity retrieval -> ablock.py; s19 streaming quantile rollup ->
sblock.py).  The round-13 rotation (docs/ROTATION_r13.md) promoted
the 5 entries staged for it at r12 close (q183 integer-quantized
k-means, q184 multi-touch attribution, q185 interpolated-bigram LM
fluency, q186 grouped OLS trend -> ablock.py; s20 streaming PSI
drift monitor -> sblock.py).

Staged during round 12 AHEAD of schedule for the r14 window (earlier
staging = more rounds of standing pytest evidence before promotion):

- q187: lag-k autocorrelation (operators/stats.py ``autocorr_lags``)
  — per-type serial correlation of the daily cents series at lags
  1/2/3 over a densified 0-filled day grid; exact int64 moments +
  the pairwise_corr fixed IEEE parenthesization, NO ROUND.
- q188: cluster-safe split (operators/pipeline.py
  ``cluster_safe_split``) — leakage-free train/val/test assignment:
  q111's near-dup clusters inherit the cluster REP's content-hash
  split atomically; singletons degrade to exact q114 semantics.
- q189: daily VWAP + realized volatility (operators/twap.py
  ``vwap_realized_vol``) — exact-anchor Σ(cents·qty)/Σqty with one
  IEEE division, plus the standard RV estimator
  sqrt(Σ ln(p_t/p_{t-1})²) ROUND-4 both sides (the q118/q185 ln
  rule, sweep-covered).
- q190: BPE tokenizer training (operators/bpe.py ``bpe_merges``) —
  learn k=3 merge rules via the word-frequency factorization
  (corpus-sized work = ONE token count; the merge loop runs on the
  vocab frame); the q111/q171/q183 bounded driver-loop class;
  merge semantics = engine-native single-pass replace, pinned
  identical Spark-vs-DuckDB by test.
- s21: streaming point-in-time enrichment (operators/pit.py) —
  stream-static interval join (key + valid_from <= ts < valid_to)
  against the prev-day user-tier dimension; STATELESS, so no splice
  at all — the third point on the s19/s20 splice spectrum.
- q191: product-quantization ADC top-k (operators/cluster.py
  ``pq_adc_topk``) — m=4 per-subspace integer-k-means codes + exact
  int64 asymmetric distances; the memory-bound ANN rung, fully
  hash-gated against an oracle that unrolls all four Lloyd chains
  (the q183 pattern × m).
- q192: seasonal day-of-week outlier screen (operators/robust.py
  ``seasonal_outliers``) — per-day flags vs the day's own-weekday
  median/MAD baseline within its type; exact lower-median selection,
  ints + boolean, the seasonal twin of q152.

Staged during round 13 for the r15 window (docs/ROTATION_r14.md
carries the r14 plan; these wait one extra round by design):

- q193: IVF-PQ top-k (operators/cluster.py ``ivf_pq_topk``) — the
  composition of the integer coarse quantizer (q183 machinery) with
  PQ ADC (q191 machinery) into the production FAISS index shape;
  FULLY hash-gated (unlike q92b's float IVF) against an oracle that
  unrolls the coarse chain AND all m sub-chains; nprobe restriction
  BINDS at every sf (pinned by test); 16x probe 1.04x.
- s22: streaming as-of enrichment (streaming/core.py
  ``asof_quote_enrich``) — trade <- latest quote strictly before it,
  per key, as applyInPandasWithState with EventTimeTimeout: trades
  held until the watermark passes them, flushed by timeout (armed AT
  the pending trade's ms — Spark fires strictly-below, the last-ms
  edge is test-pinned).  Splice scoped to the filtered set because
  Catalyst pushes deterministic non-event-time predicates BELOW
  EventTimeWatermark (measured at sf0.1 — see the entry docstring);
  cross-batch quote-after-trade arrival pinned by behavioral test.
- q194: batched BPE training (operators/bpe.py ``bpe_merges_batched``)
  — q190's production shortcut: greedy SYMBOL-DISJOINT top-m pairs
  per round in one m-row collect (k/m driver round-trips), replaces
  commuting by disjointness, top-8m candidate circuit breaker;
  oracle replays the greedy selection; batched == sequential is NOT
  claimed (per-corpus fact, documented).
- s23: streaming top-k ranking drift (operators/drift.py
  ``topk_drift``) — the monitor family's ranking member (s14/s15/
  s19/s20 spectrum complete): per (type × closed day) top-5 users vs
  the pre-split reference top-5, exact counts + integer-ppm Jaccard
  + null-safe top1_same; the stream owns the (type, day, user)
  windowed count agg, the read is domain-bounded; splice scoped to
  ``user_id IS NOT NULL`` (the s20/s22 pushdown lesson, vacuous on
  this fixture, scoped anyway).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sources.tables import load_table

_CENTS = "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"

# q190's oracle shares the q94-q96/q185 tokenizer pinned in ablock.py
from .ablock import _Q185_TOKS  # noqa: E402


_Q187_LAGS = (1, 2, 3)


def q187_autocorr(spark, sf):
    """Per-type autocorrelation of the daily cents series at lags
    1/2/3 (operators/stats.py autocorr_lags): is today's flow
    predicted by yesterday's?  The series is densified first — a
    type × full-day-span grid 0-fills silent days (a gap is a real
    zero in a flow series, not a missing observation), so lag-k pairs
    every day against the day truly k back.  Exact int64 moments +
    the pairwise_corr fixed IEEE parenthesization: corr hashes with
    NO ROUND.  The grid crossJoin is a 1-row broadcast bounds frame
    (the gapfill idiom, PLAN_AUDIT-whitelisted)."""
    from ..operators.stats import autocorr_lags

    ev = load_table(spark, sf, "events").where(F.col("value").isNotNull())
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("_d")
    ).agg(F.sum(F.expr(_CENTS)).alias("x"))
    bounds = daily.agg(F.min("_d").alias("_d0"), F.max("_d").alias("_d1"))
    # both crossJoins broadcast the SAME 1-row bounds frame (the
    # gapfill idiom); everything downstream equi-joins on (type, idx)
    grid = (
        daily.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    F.datediff(F.col("_d1"), F.col("_d0")).cast("long"),
                )
            ).alias("idx"),
        )
    )
    daily_idx = daily.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.datediff(F.col("_d"), F.col("_d0")).cast("long").alias("idx"),
        "x",
    )
    dense = grid.join(daily_idx, ["event_type", "idx"], "left").select(
        "event_type",
        "idx",
        F.coalesce(F.col("x"), F.lit(0)).cast("long").alias("x"),
    )
    return autocorr_lags(dense, "event_type", "idx", "x", _Q187_LAGS)


Q187_SQL = f"""
WITH daily AS MATERIALIZED (
  SELECT event_type, date_trunc('day', ts) AS d,
         CAST(sum({_CENTS}) AS BIGINT) AS x
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
), b AS (
  SELECT min(d) AS d0, max(d) AS d1 FROM daily
), grid AS (
  SELECT t.event_type, CAST(g AS BIGINT) AS idx
  FROM (SELECT DISTINCT event_type FROM daily) t, b,
       unnest(range(0, datediff('day', b.d0, b.d1) + 1)) AS s(g)
), dense AS MATERIALIZED (
  SELECT g.event_type, g.idx,
         CAST(COALESCE(daily.x, 0) AS BIGINT) AS x
  FROM grid g
  LEFT JOIN b ON true
  LEFT JOIN daily ON daily.event_type = g.event_type
                 AND daily.d = b.d0 + g.idx * INTERVAL 1 DAY
), lags AS (
  SELECT CAST(l AS BIGINT) AS lag
  FROM (VALUES ({_Q187_LAGS[0]}), ({_Q187_LAGS[1]}),
               ({_Q187_LAGS[2]})) v(l)
), pairs AS (
  SELECT a.event_type, l.lag, a.x AS xa, c.x AS xb
  FROM dense a
  CROSS JOIN lags l
  JOIN dense c ON c.event_type = a.event_type
              AND c.idx = a.idx + l.lag
), m AS (
  SELECT event_type, lag,
         CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(xa) AS BIGINT) AS sum_x,
         CAST(sum(xb) AS BIGINT) AS sum_y,
         CAST(sum(xa * xb) AS BIGINT) AS sxy,
         CAST(sum(xa * xa) AS BIGINT) AS sxx,
         CAST(sum(xb * xb) AS BIGINT) AS syy
  FROM pairs GROUP BY 1, 2
)
SELECT event_type, lag, n_pairs, sum_x, sum_y,
       CASE WHEN (CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sum_x AS DOUBLE) * CAST(sum_x AS DOUBLE)) > 0
             AND (CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
                  - CAST(sum_y AS DOUBLE) * CAST(sum_y AS DOUBLE)) > 0
            THEN (CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sum_x AS DOUBLE) * CAST(sum_y AS DOUBLE))
                 / sqrt((CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sum_x AS DOUBLE) * CAST(sum_x AS DOUBLE))
                        * (CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sum_y AS DOUBLE)
                             * CAST(sum_y AS DOUBLE)))
       END AS corr
FROM m
"""


def q188_cluster_split(spark, sf):
    """Leakage-free train/val/test split (operators/pipeline.py
    cluster_safe_split): q114's content-hash split assigns each doc
    independently, so a near-dup pair can straddle train and val and
    the eval measures memorization.  Here q111's dedup clusters
    (exact-dup star edges + verified Jaccard near-dup pairs,
    min-label components) are assigned ATOMICALLY: the split key is
    the md5 of the cluster representative's text, members inherit it,
    singletons degrade to exact q114 semantics.  Fully hash-gated —
    the oracle recomputes components with Q111's recursive CTE and
    re-derives the same rep-hash CASE."""
    from ..operators.pipeline import cluster_safe_split
    from .pblock import q111_dedup_clusters

    d = load_table(spark, sf, "documents").select("doc_id", "text")
    clusters = q111_dedup_clusters(spark, sf)
    return cluster_safe_split(d, clusters)


def _q188_sql() -> str:
    from .pblock import Q111_SQL

    return f"""
WITH comp AS MATERIALIZED ({Q111_SQL}),
full_docs AS (
  SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
)
SELECT f.doc_id, f.cluster_id,
       substring(md5(r.text), 1, 2) AS split_key,
       CASE WHEN substring(md5(r.text), 1, 2) < '0a' THEN 'val'
            WHEN substring(md5(r.text), 1, 2) < '14' THEN 'test'
            ELSE 'train' END AS split
FROM full_docs f JOIN documents r ON r.doc_id = f.cluster_id
"""


Q188_SQL = _q188_sql()


_Q189_QTY = "(event_id % 7) + 1"


def q189_vwap_vol(spark, sf):
    """Daily per-type VWAP + realized volatility
    (operators/twap.py vwap_realized_vol) — the execution-benchmark
    pair next to q156's TWAP: Σ(cents·qty)/Σqty exact-anchored with
    one IEEE division (NO ROUND), and the standard high-frequency RV
    estimator sqrt(Σ ln(p_t/p_{t-1})²) over the (ts, event_id)-
    total-ordered tick sequence, ROUND-4 on both sides (the q118/q185
    ln rule, sweep-covered).  Lot sizes are the deterministic fixture
    synth (event_id % 7) + 1 — the q110 contact_text pattern: the
    events table has no qty column, so one is derived identically on
    both sides.  Ticks with non-positive value are dropped as invalid
    (a zero price is indicative, not tradable — the operator's ln
    domain guard rightly raises on it; sf0.1 carries 6 such rows)."""
    from ..operators.robust import cents
    from ..operators.twap import vwap_realized_vol

    ev = load_table(spark, sf, "events").where(F.col("value") > 0)
    return vwap_realized_vol(
        ev,
        ["event_type"],
        "ts",
        cents("value"),
        F.expr(_Q189_QTY).cast("long"),
        "event_id",
    )


Q189_SQL = f"""
WITH t AS (
  SELECT event_type, date_trunc('day', ts) AS d, ts, event_id,
         {_CENTS} AS c, CAST({_Q189_QTY} AS BIGINT) AS q
  FROM events WHERE value > 0
), r AS (
  SELECT event_type, d, c, q,
         lag(c) OVER (PARTITION BY event_type, d
                      ORDER BY ts, event_id) AS pc
  FROM t
), rr AS (
  SELECT event_type, d, c, q,
         CASE WHEN pc IS NOT NULL
              THEN ln(CAST(c AS DOUBLE) / CAST(pc AS DOUBLE)) END AS lr
  FROM r
)
SELECT event_type, strftime(d, '%Y-%m-%d') AS day,
       CAST(count(*) AS BIGINT) AS n_ticks,
       CAST(sum(q) AS BIGINT) AS sum_qty,
       CAST(sum(c * q) AS BIGINT) AS sum_qty_cents,
       CAST(sum(c * q) AS DOUBLE) / CAST(sum(q) AS DOUBLE) AS vwap_cents,
       CAST(count(lr) AS BIGINT) AS n_returns,
       CASE WHEN count(lr) > 0
            THEN ROUND(sqrt(sum(lr * lr)), 4) END AS rv4
FROM rr GROUP BY 1, 2
"""


def s21_pit_enrich_stream(spark, sf):
    """Streaming point-in-time enrichment (operators/pit.py): each
    streamed event joins the user-profile dimension version valid AT
    ITS TIMESTAMP — key equality + valid_from <= ts < valid_to, the
    feature-store lookup that prevents feature time-travel (an s05-
    style key-only join would enrich Jan-3 events with Jan-20
    profiles).  The dimension is daily_tier_dim's (user × day) grid
    of PREV-day activity counts/tiers, built batch-side (the nightly
    feature job) and localCheckpoint-cut; the stream side is
    STATELESS (stream-static inner join, no watermark, no state
    store), so append emits every enriched event and the oracle is
    the plain batch join — no closed-day splice at all, the
    documented third point on the s19/s20 splice spectrum."""
    from ..operators.pit import daily_tier_dim, pit_join
    from ..streaming.core import run_to_memory, stream_events

    ev = load_table(spark, sf, "events")
    dim = daily_tier_dim(ev, "user_id", "ts").localCheckpoint(eager=True)
    s = stream_events(spark, sf)
    joined = pit_join(s, dim, "user_id", "ts")
    out = joined.select(
        "event_id",
        "user_id",
        "event_type",
        F.date_format(F.col("valid_from"), "yyyy-MM-dd").alias("day"),
        "prev_cnt",
        "tier",
    )
    return run_to_memory(out, "s21_pit", n_state_partitions=8)


def _s21_sql() -> str:
    from ..operators.pit import TIER_CASE

    return f"""
WITH daily AS MATERIALIZED (
  SELECT user_id, date_trunc('day', ts) AS d,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
), b AS (
  SELECT min(d) AS d0, max(d) AS d1 FROM daily
), grid AS (
  SELECT u.user_id, b.d0 + g * INTERVAL 1 DAY AS valid_from
  FROM (SELECT DISTINCT user_id FROM daily) u, b,
       unnest(range(0, datediff('day', b.d0, b.d1) + 1)) AS s(g)
), dim AS (
  SELECT g.user_id, g.valid_from,
         g.valid_from + INTERVAL 1 DAY AS valid_to,
         CAST(COALESCE(p.cnt, 0) AS BIGINT) AS prev_cnt
  FROM grid g LEFT JOIN daily p
    ON p.user_id = g.user_id AND p.d + INTERVAL 1 DAY = g.valid_from
)
SELECT e.event_id, e.user_id, e.event_type,
       strftime(dim.valid_from, '%Y-%m-%d') AS day, dim.prev_cnt,
       {TIER_CASE} AS tier
FROM events e JOIN dim ON dim.user_id = e.user_id
  AND e.ts >= dim.valid_from AND e.ts < dim.valid_to
"""


S21_SQL = _s21_sql()


_Q190_MERGES = 3
_Q190_TOP = 20


def q190_bpe_merges(spark, sf):
    """BPE tokenizer training (operators/bpe.py bpe_merges): learn 3
    byte-pair merge rules over the documents corpus and report them
    plus the top-20 final vocabulary symbols — the subword-vocab step
    of every LLM pipeline, distributed via the standard word-
    frequency factorization (corpus-sized work = ONE token count; the
    merge loop runs on the vocab frame).  The q111/q171/q183 bounded
    driver-loop class: k=3 iterations, 1-row argmax collect each,
    lineage cuts per round.  Merge semantics are the engine-native
    single-pass replace (pinned identical Spark vs DuckDB, run-
    overlap corner included); all counts exact int64 — hash-gated
    against the oracle's unrolled per-iteration CTEs."""
    from ..operators.bpe import bpe_merges

    docs = load_table(spark, sf, "documents").select("text")
    return bpe_merges(docs, _Q190_MERGES, _Q190_TOP)


def _q190_sql(k: int = _Q190_MERGES, top: int = _Q190_TOP) -> str:
    duck_syms = "list_filter(string_split(sym, '|'), x -> x <> '')"
    parts = [f"""
WITH w0 AS MATERIALIZED (
  SELECT CAST(count(*) AS BIGINT) AS cnt,
         '|' || array_to_string(regexp_extract_all(w, '.'), '|') || '|'
           AS sym
  FROM (SELECT unnest({_Q185_TOKS}) AS w FROM documents)
  GROUP BY w
)"""]
    for i in range(1, k + 1):
        parts.append(f""", t{i} AS MATERIALIZED (
  SELECT sym, cnt, unnest(arr) AS tok, generate_subscripts(arr, 1) AS pos
  FROM (SELECT sym, cnt, {duck_syms} AS arr FROM w{i - 1})
), p{i} AS (
  SELECT x.tok AS l, y.tok AS r, CAST(sum(x.cnt) AS BIGINT) AS freq
  FROM t{i} x JOIN t{i} y ON x.sym = y.sym AND y.pos = x.pos + 1
  GROUP BY 1, 2
), b{i} AS MATERIALIZED (
  SELECT l, r, freq FROM p{i} ORDER BY freq DESC, l, r LIMIT 1
), w{i} AS MATERIALIZED (
  SELECT p.cnt,
         replace(p.sym, '|' || b.l || '|' || b.r || '|',
                 '|' || b.l || b.r || '|') AS sym
  FROM w{i - 1} p, b{i} b
)""")
    merge_rows = "\nUNION ALL\n".join(
        f"SELECT 'merge' AS kind, CAST({i} AS BIGINT) AS rank, "
        f"l || ' ' || r AS token, freq FROM b{i}"
        for i in range(1, k + 1)
    )
    parts.append(f""", fin AS MATERIALIZED (
  SELECT cnt, unnest({duck_syms}) AS token FROM w{k}
), vocab AS (
  SELECT token, CAST(sum(cnt) AS BIGINT) AS freq FROM fin GROUP BY 1
), topv AS (
  SELECT token, freq,
         row_number() OVER (ORDER BY freq DESC, token) AS rk
  FROM vocab
)
{merge_rows}
UNION ALL
SELECT 'symbol' AS kind, CAST(rk AS BIGINT) AS rank, token, freq
FROM topv WHERE rk <= {top}""")
    return "".join(parts)


Q190_SQL = _q190_sql()


_Q191_DIM = 64
_Q191_M = 4
_Q191_K = 4
_Q191_ITERS = 2
_Q191_NQ = 3
_Q191_TOPK = 10


def q191_pq_topk(spark, sf):
    """Product-quantization ADC top-k (operators/cluster.py
    pq_adc_topk): each embedding compressed to m=4 subspace codes via
    per-subspace integer k-means (k=4, 2 Lloyd iterations), queries =
    the 3 smallest-md5(vec_id) vectors, distances answered by exact
    int64 Asymmetric Distance Computation over the m-lookup code
    frame — the classic memory-bound ANN rung (Jégou et al. 2011)
    between q116's int8 scalar quantization and the q92b/q93b
    bucketing paths, and unlike those it is FULLY hash-gated: the
    oracle unrolls all four per-subspace Lloyd chains as MATERIALIZED
    CTEs (the q183 pattern × m) and replays the ADC join."""
    from ..operators.cluster import pq_adc_topk

    emb = load_table(spark, sf, "embeddings")
    return pq_adc_topk(
        emb,
        "vec_id",
        "embedding",
        _Q191_DIM,
        _Q191_M,
        _Q191_K,
        _Q191_ITERS,
        _Q191_NQ,
        _Q191_TOPK,
    )


def _q191_sql() -> str:
    k, iters, m = _Q191_K, _Q191_ITERS, _Q191_M
    sub_d = _Q191_DIM // m
    parts = [f"""
WITH qfull AS MATERIALIZED (
  SELECT vec_id, dim,
         CAST(floor(CAST(val AS DOUBLE) * 10000) AS BIGINT) + 10000 AS v
  FROM (SELECT vec_id, unnest(embedding) AS val,
               generate_subscripts(embedding, 1) - 1 AS dim
        FROM embeddings WHERE embedding IS NOT NULL)
), ordv AS MATERIALIZED (
  SELECT vec_id,
         row_number() OVER (
           ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
  FROM (SELECT DISTINCT vec_id FROM qfull)
), seeds AS MATERIALIZED (
  SELECT vec_id, CAST(rn - 1 AS BIGINT) AS cluster FROM ordv
  WHERE rn <= {k}
), qrs AS MATERIALIZED (
  SELECT vec_id AS query_id FROM ordv WHERE rn <= {_Q191_NQ}
)"""]
    for s in range(m):
        lo, hi = s * sub_d, (s + 1) * sub_d
        parts.append(f""", q_s{s} AS MATERIALIZED (
  SELECT vec_id, dim - {lo} AS dim, v FROM qfull
  WHERE dim >= {lo} AND dim < {hi}
), c0_s{s} AS MATERIALIZED (
  SELECT s.cluster, q.dim, q.v FROM seeds s JOIN q_s{s} q USING (vec_id)
)""")
        for i in range(1, iters + 1):
            parts.append(f""", d{i}_s{s} AS MATERIALIZED (
  SELECT q.vec_id, c.cluster,
         CAST(SUM((q.v - c.v) * (q.v - c.v)) AS BIGINT) AS d2
  FROM q_s{s} q JOIN c{i - 1}_s{s} c ON q.dim = c.dim GROUP BY 1, 2
), a{i}_s{s} AS MATERIALIZED (
  SELECT vec_id, cluster FROM (
    SELECT vec_id, cluster,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY d2, cluster) AS rk
    FROM d{i}_s{s}
  ) WHERE rk = 1
), u{i}_s{s} AS MATERIALIZED (
  SELECT a.cluster, q.dim, CAST(sum(q.v) // count(*) AS BIGINT) AS v
  FROM a{i}_s{s} a JOIN q_s{s} q USING (vec_id) GROUP BY 1, 2
), c{i}_s{s} AS MATERIALIZED (
  SELECT c.cluster, c.dim, COALESCE(u.v, c.v) AS v
  FROM c{i - 1}_s{s} c
  LEFT JOIN u{i}_s{s} u ON c.cluster = u.cluster AND c.dim = u.dim
)""")
        parts.append(f""", fd_s{s} AS MATERIALIZED (
  SELECT q.vec_id, c.cluster,
         CAST(SUM((q.v - c.v) * (q.v - c.v)) AS BIGINT) AS d2
  FROM q_s{s} q JOIN c{iters}_s{s} c ON q.dim = c.dim GROUP BY 1, 2
), code_s{s} AS MATERIALIZED (
  SELECT vec_id, cluster FROM (
    SELECT vec_id, cluster,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY d2, cluster) AS rk
    FROM fd_s{s}
  ) WHERE rk = 1
), tab_s{s} AS MATERIALIZED (
  SELECT r.query_id, c.cluster,
         CAST(SUM((q.v - c.v) * (q.v - c.v)) AS BIGINT) AS d2
  FROM qrs r
  JOIN q_s{s} q ON q.vec_id = r.query_id
  JOIN c{iters}_s{s} c ON q.dim = c.dim
  GROUP BY 1, 2
)""")
    codes_union = "\n  UNION ALL\n".join(
        f"  SELECT vec_id, CAST({s} AS BIGINT) AS sub, cluster"
        f" FROM code_s{s}"
        for s in range(m)
    )
    tab_union = "\n  UNION ALL\n".join(
        f"  SELECT query_id, CAST({s} AS BIGINT) AS sub, cluster, d2"
        f" FROM tab_s{s}"
        for s in range(m)
    )
    parts.append(f""", codes AS (
{codes_union}
), tab AS (
{tab_union}
), scores AS (
  SELECT t.query_id, c.vec_id, CAST(SUM(t.d2) AS BIGINT) AS adc_d2
  FROM codes c JOIN tab t ON t.sub = c.sub AND t.cluster = c.cluster
  GROUP BY 1, 2
)
SELECT query_id, CAST(rk AS BIGINT) AS rank, vec_id, adc_d2 FROM (
  SELECT query_id, vec_id, adc_d2,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY adc_d2, vec_id) AS rk
  FROM scores
) WHERE rk <= {_Q191_TOPK}""")
    return "".join(parts)


Q191_SQL = _q191_sql()


_Q192_K = 3


def q192_seasonal_outliers(spark, sf):
    """Seasonal (day-of-week) robust outlier screen
    (operators/robust.py seasonal_outliers): each day's cents total
    is judged against the MEDIAN/MAD of ITS OWN WEEKDAY within its
    type — weekly rhythm stops masquerading as anomaly and a
    genuinely odd Monday stops hiding inside the all-days spread (the
    seasonal twin of q152's per-type screen).  Lower medians by
    explicit rank selection, |x−med| deviations, dev > 3·MAD flags —
    exact ints + a boolean, fully hash-gated.  Weekday convention:
    Spark dayofweek()−1 == DuckDB dayofweek() (0 = Sunday), pinned
    in the oracle.  The flag BINDS at every fixture sf (24-40 of 150
    day rows flagged)."""
    from ..operators.robust import seasonal_outliers

    ev = load_table(spark, sf, "events").where(F.col("value").isNotNull())
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("_d")
    ).agg(F.sum(F.expr(_CENTS)).alias("x"))
    daily = daily.select(
        "event_type",
        (F.dayofweek(F.col("_d")) - 1).cast("long").alias("dow"),
        F.date_format("_d", "yyyy-MM-dd").alias("day"),
        F.col("x").cast("long").alias("x"),
    )
    out = seasonal_outliers(
        daily, ["event_type"], "dow", "x", "day", _Q192_K
    )
    return out.select(
        "event_type",
        "day",
        "dow",
        F.col("x").alias("x_cents"),
        F.col("med_x").alias("med_cents"),
        F.col("mad_x").alias("mad_cents"),
        F.col("dev_x").alias("dev_cents"),
        "is_outlier",
    )


Q192_SQL = f"""
WITH d AS (
  SELECT event_type, date_trunc('day', ts) AS dday,
         CAST(sum({_CENTS}) AS BIGINT) AS x
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
), dd AS (
  SELECT event_type,
         CAST(dayofweek(dday) AS BIGINT) AS dow,
         strftime(dday, '%Y-%m-%d') AS day, x
  FROM d
), med AS (
  SELECT event_type, dow, x AS med_x FROM (
    SELECT event_type, dow, x, day,
           row_number() OVER (PARTITION BY event_type, dow
                              ORDER BY x, day) AS rn,
           count(*) OVER (PARTITION BY event_type, dow) AS n
    FROM dd) WHERE rn = (n + 1) // 2
), dev AS (
  SELECT dd.event_type, dd.day, dd.dow, dd.x, m.med_x,
         abs(dd.x - m.med_x) AS dv
  FROM dd JOIN med m USING (event_type, dow)
), mad AS (
  SELECT event_type, dow, dv AS mad_x FROM (
    SELECT event_type, dow, dv, day,
           row_number() OVER (PARTITION BY event_type, dow
                              ORDER BY dv, day) AS rn,
           count(*) OVER (PARTITION BY event_type, dow) AS n
    FROM dev) WHERE rn = (n + 1) // 2
)
SELECT v.event_type, v.day, v.dow, v.x AS x_cents,
       v.med_x AS med_cents, m.mad_x AS mad_cents,
       v.dv AS dev_cents,
       v.dv > {_Q192_K} * m.mad_x AS is_outlier
FROM dev v JOIN mad m USING (event_type, dow)
"""


_Q193_DIM = 64
_Q193_CK = 4       # coarse inverted lists
_Q193_CI = 2       # coarse Lloyd iterations
_Q193_M = 4        # PQ subspaces
_Q193_K = 4        # PQ codebook size per subspace
_Q193_ITERS = 2    # PQ Lloyd iterations
_Q193_NPROBE = 2
_Q193_NQ = 3
_Q193_TOPK = 10


def q193_ivfpq_topk(spark, sf):
    """IVF-PQ top-k (operators/cluster.py ivf_pq_topk): the
    composition of the engine's two exact ANN rungs into the
    production FAISS index shape — an integer-k-means coarse
    quantizer (4 inverted lists, 2 Lloyd iterations) restricts each
    query to its nprobe=2 nearest lists, and PQ ADC (m=4 subspace
    codebooks shared across lists) ranks the candidates inside them.
    Unlike q92b's float-KMeans IVF this is FULLY hash-gated: the
    oracle unrolls the coarse chain AND all four per-subspace Lloyd
    chains as MATERIALIZED CTEs (the q183/q191 pattern), replays the
    probe selection, and re-runs the list-restricted ADC join.  The
    restriction BINDS at every fixture sf (probed-list candidates <
    corpus — pinned by test)."""
    from ..operators.cluster import ivf_pq_topk

    emb = load_table(spark, sf, "embeddings")
    return ivf_pq_topk(
        emb,
        "vec_id",
        "embedding",
        _Q193_DIM,
        _Q193_CK,
        _Q193_CI,
        _Q193_M,
        _Q193_K,
        _Q193_ITERS,
        _Q193_NPROBE,
        _Q193_NQ,
        _Q193_TOPK,
    )


def _q193_sql() -> str:
    ck, ci = _Q193_CK, _Q193_CI
    k, iters, m = _Q193_K, _Q193_ITERS, _Q193_M
    sub_d = _Q193_DIM // m
    parts = [f"""
WITH qfull AS MATERIALIZED (
  SELECT vec_id, dim,
         CAST(floor(CAST(val AS DOUBLE) * 10000) AS BIGINT) + 10000 AS v
  FROM (SELECT vec_id, unnest(embedding) AS val,
               generate_subscripts(embedding, 1) - 1 AS dim
        FROM embeddings WHERE embedding IS NOT NULL)
), ordv AS MATERIALIZED (
  SELECT vec_id,
         row_number() OVER (
           ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
  FROM (SELECT DISTINCT vec_id FROM qfull)
), seeds_c AS MATERIALIZED (
  SELECT vec_id, CAST(rn - 1 AS BIGINT) AS cluster FROM ordv
  WHERE rn <= {ck}
), seeds_p AS MATERIALIZED (
  SELECT vec_id, CAST(rn - 1 AS BIGINT) AS cluster FROM ordv
  WHERE rn <= {k}
), qrs AS MATERIALIZED (
  SELECT vec_id AS query_id FROM ordv WHERE rn <= {_Q193_NQ}
), cc0 AS MATERIALIZED (
  SELECT s.cluster, q.dim, q.v FROM seeds_c s JOIN qfull q USING (vec_id)
)"""]
    # coarse Lloyd chain over the FULL vectors
    for i in range(1, ci + 1):
        parts.append(f""", cd{i} AS MATERIALIZED (
  SELECT q.vec_id, c.cluster,
         CAST(SUM((q.v - c.v) * (q.v - c.v)) AS BIGINT) AS d2
  FROM qfull q JOIN cc{i - 1} c ON q.dim = c.dim GROUP BY 1, 2
), ca{i} AS MATERIALIZED (
  SELECT vec_id, cluster FROM (
    SELECT vec_id, cluster,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY d2, cluster) AS rk
    FROM cd{i}
  ) WHERE rk = 1
), cu{i} AS MATERIALIZED (
  SELECT a.cluster, q.dim, CAST(sum(q.v) // count(*) AS BIGINT) AS v
  FROM ca{i} a JOIN qfull q USING (vec_id) GROUP BY 1, 2
), cc{i} AS MATERIALIZED (
  SELECT c.cluster, c.dim, COALESCE(u.v, c.v) AS v
  FROM cc{i - 1} c
  LEFT JOIN cu{i} u ON c.cluster = u.cluster AND c.dim = u.dim
)""")
    parts.append(f""", bfd AS MATERIALIZED (
  SELECT q.vec_id, c.cluster,
         CAST(SUM((q.v - c.v) * (q.v - c.v)) AS BIGINT) AS d2
  FROM qfull q JOIN cc{ci} c ON q.dim = c.dim GROUP BY 1, 2
), bkt AS MATERIALIZED (
  SELECT vec_id, cluster AS bucket FROM (
    SELECT vec_id, cluster,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY d2, cluster) AS rk
    FROM bfd
  ) WHERE rk = 1
), probed AS MATERIALIZED (
  SELECT query_id, cluster AS bucket FROM (
    SELECT r.query_id, c.cluster,
           row_number() OVER (
             PARTITION BY r.query_id
             ORDER BY SUM((q.v - c.v) * (q.v - c.v)), c.cluster) AS rk
    FROM qrs r
    JOIN qfull q ON q.vec_id = r.query_id
    JOIN cc{ci} c ON q.dim = c.dim
    GROUP BY r.query_id, c.cluster
  ) WHERE rk <= {_Q193_NPROBE}
)""")
    # PQ sub-chains (the q191 pattern, seeds_p)
    for s in range(m):
        lo, hi = s * sub_d, (s + 1) * sub_d
        parts.append(f""", q_s{s} AS MATERIALIZED (
  SELECT vec_id, dim - {lo} AS dim, v FROM qfull
  WHERE dim >= {lo} AND dim < {hi}
), c0_s{s} AS MATERIALIZED (
  SELECT s.cluster, q.dim, q.v
  FROM seeds_p s JOIN q_s{s} q USING (vec_id)
)""")
        for i in range(1, iters + 1):
            parts.append(f""", d{i}_s{s} AS MATERIALIZED (
  SELECT q.vec_id, c.cluster,
         CAST(SUM((q.v - c.v) * (q.v - c.v)) AS BIGINT) AS d2
  FROM q_s{s} q JOIN c{i - 1}_s{s} c ON q.dim = c.dim GROUP BY 1, 2
), a{i}_s{s} AS MATERIALIZED (
  SELECT vec_id, cluster FROM (
    SELECT vec_id, cluster,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY d2, cluster) AS rk
    FROM d{i}_s{s}
  ) WHERE rk = 1
), u{i}_s{s} AS MATERIALIZED (
  SELECT a.cluster, q.dim, CAST(sum(q.v) // count(*) AS BIGINT) AS v
  FROM a{i}_s{s} a JOIN q_s{s} q USING (vec_id) GROUP BY 1, 2
), c{i}_s{s} AS MATERIALIZED (
  SELECT c.cluster, c.dim, COALESCE(u.v, c.v) AS v
  FROM c{i - 1}_s{s} c
  LEFT JOIN u{i}_s{s} u ON c.cluster = u.cluster AND c.dim = u.dim
)""")
        parts.append(f""", fd_s{s} AS MATERIALIZED (
  SELECT q.vec_id, c.cluster,
         CAST(SUM((q.v - c.v) * (q.v - c.v)) AS BIGINT) AS d2
  FROM q_s{s} q JOIN c{iters}_s{s} c ON q.dim = c.dim GROUP BY 1, 2
), code_s{s} AS MATERIALIZED (
  SELECT vec_id, cluster FROM (
    SELECT vec_id, cluster,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY d2, cluster) AS rk
    FROM fd_s{s}
  ) WHERE rk = 1
), tab_s{s} AS MATERIALIZED (
  SELECT r.query_id, c.cluster,
         CAST(SUM((q.v - c.v) * (q.v - c.v)) AS BIGINT) AS d2
  FROM qrs r
  JOIN q_s{s} q ON q.vec_id = r.query_id
  JOIN c{iters}_s{s} c ON q.dim = c.dim
  GROUP BY 1, 2
)""")
    codes_union = "\n  UNION ALL\n".join(
        f"  SELECT vec_id, CAST({s} AS BIGINT) AS sub, cluster"
        f" FROM code_s{s}"
        for s in range(m)
    )
    tab_union = "\n  UNION ALL\n".join(
        f"  SELECT query_id, CAST({s} AS BIGINT) AS sub, cluster, d2"
        f" FROM tab_s{s}"
        for s in range(m)
    )
    parts.append(f""", codes AS (
{codes_union}
), tab AS (
{tab_union}
), scores AS (
  SELECT t.query_id, c.vec_id, b.bucket,
         CAST(SUM(t.d2) AS BIGINT) AS adc_d2
  FROM codes c
  JOIN bkt b ON b.vec_id = c.vec_id
  JOIN probed p ON p.bucket = b.bucket
  JOIN tab t ON t.query_id = p.query_id
            AND t.sub = c.sub AND t.cluster = c.cluster
  GROUP BY 1, 2, 3
)
SELECT query_id, CAST(rk AS BIGINT) AS rank, vec_id, bucket, adc_d2
FROM (
  SELECT query_id, vec_id, bucket, adc_d2,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY adc_d2, vec_id) AS rk
  FROM scores
) WHERE rk <= {_Q193_TOPK}""")
    return "".join(parts)


Q193_SQL = _q193_sql()


def s22_asof_enrich_stream(spark, sf):
    """Streaming as-of enrichment (streaming/core.py
    asof_quote_enrich): every purchase is emitted exactly once
    carrying the latest view of the same user STRICTLY before it —
    the batch asof_join/q25 capability as a custom stateful operator
    (applyInPandasWithState keyed by user, EventTimeTimeout), the
    fourth point on the streaming-state spectrum after s08 (running
    scalar state), s19/s20 (windowed aggs) and s21 (stateless
    stream-static).  Trades are held in state until the watermark
    passes their event time (only then is the quote set at-or-before
    them closed) and flush via event-time timeout — under the
    single-file replay EVERY emission rides the final no-data batch's
    timeout path, so the gate exercises the timeout machinery by
    construction.  SPLICE SCOPING (measured, not assumed): the
    watermark is attached before the side/value filters in code, but
    Catalyst's PushPredicateThroughNonJoin moves deterministic
    predicates that don't reference the event-time column BELOW the
    EventTimeWatermark node — so filtered rows never advance the
    watermark REGARDLESS of call order, and the splice must be the
    max(ts) OVER THE FILTERED SET (the s19 class; the unscoped form
    was exactly one row generous at sf0.1 — the globally-latest
    view/purchase row itself), truncated to Spark's whole-ms
    watermark granularity.  Only a filter evaluated INSIDE a stateful
    operator (s20's agg-side NULL handling) escapes that pushdown.
    Unquoted trades surface with NULL quote columns (never dropped);
    quote choice is strictly-before with the (us, event_id) tie-break
    — the q184 contract.  Both the enriched and the NULL bucket BIND
    at every fixture sf (pinned by test)."""
    from ..streaming.core import (
        asof_quote_enrich,
        run_to_memory,
        stream_events,
    )

    sdf = stream_events(spark, sf).withWatermark("ts", "0 seconds")
    sdf = sdf.where(
        F.col("event_type").isin("view", "purchase")
        & F.col("value").isNotNull()
    ).select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.expr(_CENTS).alias("cents"),
    )
    return run_to_memory(
        asof_quote_enrich(sdf, "view", "purchase"),
        "s22_asof",
        n_state_partitions=8,
    )


S22_SQL = f"""
WITH base AS MATERIALIZED (
  SELECT user_id, event_id, epoch_us(ts) AS us, event_type,
         {_CENTS} AS c
  FROM events
  WHERE event_type IN ('view', 'purchase') AND value IS NOT NULL
), wm AS MATERIALIZED (
  -- the final watermark: max event time over the FILTERED set —
  -- Catalyst pushes the deterministic side/value filter below the
  -- EventTimeWatermark node, so only view/purchase non-null-value
  -- rows advance the watermark (see the query docstring); truncated
  -- to whole ms (Spark tracks event-time stats in milliseconds)
  SELECT (max(us) // 1000) * 1000 AS w_us FROM base
), tr AS (
  SELECT user_id, event_id, us, c FROM base, wm
  WHERE event_type = 'purchase' AND us < wm.w_us
), qt AS (
  SELECT user_id, event_id, us, c FROM base WHERE event_type = 'view'
), last_q AS (
  SELECT tid, qid, qus, qc FROM (
    SELECT t.event_id AS tid, q.event_id AS qid, q.us AS qus,
           q.c AS qc,
           row_number() OVER (PARTITION BY t.event_id
                              ORDER BY q.us DESC, q.event_id DESC)
             AS rk
    FROM tr t JOIN qt q ON q.user_id = t.user_id AND q.us < t.us
  ) WHERE rk = 1
)
SELECT t.user_id, t.event_id, CAST(t.us AS BIGINT) AS t_us,
       t.c AS trade_cents,
       l.qid AS quote_event_id, l.qc AS quote_cents,
       CAST(t.us - l.qus AS BIGINT) AS gap_us
FROM tr t LEFT JOIN last_q l ON l.tid = t.event_id
"""


_Q194_ROUNDS = 2
_Q194_M = 2
_Q194_TOP = 20


def q194_bpe_batched(spark, sf):
    """Batched BPE training (operators/bpe.py bpe_merges_batched) —
    q190's production scale shortcut: each round learns the top m=2
    SYMBOL-DISJOINT pairs (greedy in (freq desc, l, r) rank order —
    on natural text the raw top-m always shares a symbol, measured)
    in ONE m-row collect, applying both replaces in rank order in a
    single vocab pass — collect count k/m, the shortcut real
    tokenizer runs (30k+ merges) need.  Batched == sequential is NOT
    claimed (a merged symbol's new pairs can out-rank the batch tail
    — observed at both gate sfs, documented in the operator); the
    batched semantics are deterministic and fully hash-gated: the
    oracle replays the greedy selection (top-1, then top-1 among
    symbol-disjoint survivors) and the same replace chain per round
    as MATERIALIZED CTEs."""
    from ..operators.bpe import bpe_merges_batched

    docs = load_table(spark, sf, "documents").select("text")
    return bpe_merges_batched(docs, _Q194_ROUNDS, _Q194_M, _Q194_TOP)


def _q194_sql(rounds: int = _Q194_ROUNDS, top: int = _Q194_TOP) -> str:
    duck_syms = "list_filter(string_split(sym, '|'), x -> x <> '')"
    parts = [f"""
WITH w0 AS MATERIALIZED (
  SELECT CAST(count(*) AS BIGINT) AS cnt,
         '|' || array_to_string(regexp_extract_all(w, '.'), '|') || '|'
           AS sym
  FROM (SELECT unnest({_Q185_TOKS}) AS w FROM documents)
  GROUP BY w
)"""]
    for i in range(1, rounds + 1):
        parts.append(f""", t{i} AS MATERIALIZED (
  SELECT sym, cnt, unnest(arr) AS tok, generate_subscripts(arr, 1) AS pos
  FROM (SELECT sym, cnt, {duck_syms} AS arr FROM w{i - 1})
), p{i} AS MATERIALIZED (
  SELECT x.tok AS l, y.tok AS r, CAST(sum(x.cnt) AS BIGINT) AS freq
  FROM t{i} x JOIN t{i} y ON x.sym = y.sym AND y.pos = x.pos + 1
  GROUP BY 1, 2
), b{i}a AS MATERIALIZED (
  SELECT l, r, freq FROM p{i} ORDER BY freq DESC, l, r LIMIT 1
), b{i}b AS MATERIALIZED (
  -- greedy rank-order selection: the best pair symbol-disjoint from
  -- the round's first pick (the operator's batch rule)
  SELECT p.l, p.r, p.freq FROM p{i} p, b{i}a a
  WHERE p.l <> a.l AND p.l <> a.r AND p.r <> a.l AND p.r <> a.r
  ORDER BY p.freq DESC, p.l, p.r LIMIT 1
), w{i} AS MATERIALIZED (
  SELECT p.cnt,
         replace(replace(p.sym,
                 '|' || a.l || '|' || a.r || '|',
                 '|' || a.l || a.r || '|'),
                 '|' || b.l || '|' || b.r || '|',
                 '|' || b.l || b.r || '|') AS sym
  FROM w{i - 1} p, b{i}a a, b{i}b b
)""")
    merge_rows = "\nUNION ALL\n".join(
        f"SELECT 'merge' AS kind, CAST({(i - 1) * 2 + 1} AS BIGINT) "
        f"AS rank, l || ' ' || r AS token, freq FROM b{i}a\n"
        "UNION ALL\n"
        f"SELECT 'merge' AS kind, CAST({(i - 1) * 2 + 2} AS BIGINT) "
        f"AS rank, l || ' ' || r AS token, freq FROM b{i}b"
        for i in range(1, rounds + 1)
    )
    parts.append(f""", fin AS MATERIALIZED (
  SELECT cnt, unnest({duck_syms}) AS token FROM w{rounds}
), vocab AS (
  SELECT token, CAST(sum(cnt) AS BIGINT) AS freq FROM fin GROUP BY 1
), topv AS (
  SELECT token, freq,
         row_number() OVER (ORDER BY freq DESC, token) AS rk
  FROM vocab
)
{merge_rows}
UNION ALL
SELECT 'symbol' AS kind, CAST(rk AS BIGINT) AS rank, token, freq
FROM topv WHERE rk <= {top}""")
    return "".join(parts)


Q194_SQL = _q194_sql()


_S23_SPLIT = "2024-01-16"
_S23_K = 5


def s23_topk_drift_stream(spark, sf):
    """Streaming top-k RANKING drift monitor (operators/drift.py
    topk_drift) — the monitor family's ranking member, completing the
    s14 (distincts) / s15 (top-k emit) / s19 (quantiles) / s20
    (distribution PSI) spectrum: per (type × closed day), the day's
    top-5 users by event count compared against the pre-split
    reference top-5 — PSI answers "did the distribution move", this
    answers "did the heavy hitters change".  The stream owns the
    data-sized stage (the per-(type, day, user) windowed count agg,
    append emits closed days); the ranking/overlap read runs as a
    domain-bounded batch view.  Exact gate: counts, integer-ppm
    Jaccard (the q176 integer-argument rule), null-safe top1_same
    boolean.  Splice scoped to ``user_id IS NOT NULL`` — the
    operator's NULL-item filter sits below EventTimeWatermark after
    Catalyst's pushdown (the s20/s22 lesson; vacuous on this fixture
    where user_id is never NULL, scoped anyway so a fixture accident
    cannot silently diverge the gate)."""
    from ..operators.drift import topk_drift
    from ..operators.quantsketch import value_histogram_windowed
    from ..streaming.core import run_to_memory, stream_events

    sdf = stream_events(spark, sf).select(
        "event_type", "ts", F.col("user_id").alias("item")
    )
    hist = run_to_memory(
        value_histogram_windowed(
            sdf, ["event_type"], "ts", "item", bucket="day"
        ),
        "s23_topkhist",
        n_state_partitions=8,
    )
    hist = hist.localCheckpoint(eager=True)  # the s15 lineage cut
    return topk_drift(
        hist, ["event_type"], "day", "item", "n", _S23_SPLIT, _S23_K
    )


S23_SQL = f"""
WITH h AS MATERIALIZED (
  SELECT event_type,
         strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         user_id AS item, CAST(count(*) AS BIGINT) AS n
  FROM events
  WHERE user_id IS NOT NULL
    AND date_trunc('day', ts)
        < (SELECT date_trunc('day', max(ts)) FROM events
           WHERE user_id IS NOT NULL)
  GROUP BY 1, 2, 3
), reft AS (
  SELECT event_type, item, CAST(sum(n) AS BIGINT) AS n_ref
  FROM h WHERE day < '{_S23_SPLIT}' GROUP BY 1, 2
), refk AS MATERIALIZED (
  SELECT event_type, item, rk FROM (
    SELECT event_type, item,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY n_ref DESC, item) AS rk
    FROM reft
  ) WHERE rk <= {_S23_K}
), curk AS MATERIALIZED (
  SELECT event_type, day, item, rk FROM (
    SELECT event_type, day, item,
           row_number() OVER (PARTITION BY event_type, day
                              ORDER BY n DESC, item) AS rk
    FROM h WHERE day >= '{_S23_SPLIT}'
  ) WHERE rk <= {_S23_K}
), curstats AS (
  SELECT event_type, day, CAST(count(*) AS BIGINT) AS n_cur_k,
         arg_min(item, rk) AS cur_top1
  FROM curk GROUP BY 1, 2
), refstats AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_ref_k,
         arg_min(item, rk) AS ref_top1
  FROM refk GROUP BY 1
), com AS (
  SELECT c.event_type, c.day, CAST(count(*) AS BIGINT) AS n_common
  FROM curk c JOIN refk r ON r.event_type = c.event_type
                         AND r.item = c.item
  GROUP BY 1, 2
)
SELECT cs.event_type, cs.day,
       CAST(COALESCE(rs.n_ref_k, 0) AS BIGINT) AS n_ref_k,
       cs.n_cur_k,
       CAST(COALESCE(m.n_common, 0) AS BIGINT) AS n_common,
       CAST(COALESCE(m.n_common, 0) * 1000000
            // (COALESCE(rs.n_ref_k, 0) + cs.n_cur_k
                - COALESCE(m.n_common, 0)) AS BIGINT) AS jaccard_ppm,
       rs.ref_top1, cs.cur_top1,
       (rs.ref_top1 IS NOT DISTINCT FROM cs.cur_top1) AS top1_same
FROM curstats cs
LEFT JOIN refstats rs ON rs.event_type = cs.event_type
LEFT JOIN com m ON m.event_type = cs.event_type AND m.day = cs.day
"""


STAGED_QUERIES = {
    "q187_autocorr": q187_autocorr,
    "q188_cluster_split": q188_cluster_split,
    "q189_vwap_vol": q189_vwap_vol,
    "s21_pit_enrich_stream": s21_pit_enrich_stream,
    "q190_bpe_merges": q190_bpe_merges,
    "q191_pq_topk": q191_pq_topk,
    "q192_seasonal_outliers": q192_seasonal_outliers,
    "q193_ivfpq_topk": q193_ivfpq_topk,
    "s22_asof_enrich_stream": s22_asof_enrich_stream,
    "q194_bpe_batched": q194_bpe_batched,
    "s23_topk_drift_stream": s23_topk_drift_stream,
}

STAGED_ORACLE = {
    "q187_autocorr": Q187_SQL,
    "q188_cluster_split": Q188_SQL,
    "q189_vwap_vol": Q189_SQL,
    "s21_pit_enrich_stream": S21_SQL,
    "q190_bpe_merges": Q190_SQL,
    "q191_pq_topk": Q191_SQL,
    "q192_seasonal_outliers": Q192_SQL,
    "q193_ivfpq_topk": Q193_SQL,
    "s22_asof_enrich_stream": S22_SQL,
    "q194_bpe_batched": Q194_SQL,
    "s23_topk_drift_stream": S23_SQL,
}
