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

The round-13 rotation (docs/ROTATION_r13.md) promoted q183-q186 + s20;
the round-14 rotation (docs/ROTATION_r14.md) promoted the 7 entries
staged at r12 close (q187 lag-k autocorrelation, q188 cluster-safe
split, q189 VWAP + realized vol, q190 BPE training, q191 PQ-ADC
top-k, q192 seasonal outliers -> ablock.py; s21 streaming PIT
enrichment -> sblock.py).

Staged during round 13 for the r15 window (each pre-verified at 2 sfs
per pytest + a hand sf0.1 hash-pass, 16x-probed where batch,
plan/determinism/dtype-audited — two standing rounds of evidence by
promotion day):

- q193: IVF-PQ top-k (operators/cluster.py ``ivf_pq_topk``) — the
  composition of the integer coarse quantizer (q183 machinery) with
  PQ ADC (q191 machinery) into the production FAISS index shape;
  FULLY hash-gated (unlike q92b's float IVF) against an oracle that
  unrolls the coarse chain AND all m sub-chains; nprobe restriction
  BINDS at every sf (pinned by test); 16x probe 1.5x after the r14
  concurrent-subspace change (absolute 1x floor dropped ~11 -> 8.6 s).
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

Staged during round 14 to fill the r15 window exactly (42 age-rule
re-entries + 8 promotions — docs/ROTATION_r15.md):

- q195: hyperplane bit-LSH top-k (operators/bitlsh.py
  ``bit_lsh_topk``) — the BINARY quantization ANN rung (Charikar
  sign-random-projection): B=48 deterministic md5-derived +-1
  hyperplanes, signatures packed into ONE BIGINT, candidates by
  Hamming (XOR + popcount) over signatures alone, exact-int64 d2
  rerank of the top-C=200; fully hash-gated (the oracle replays
  weights, bits, Hamming cut and rerank); measured recall@10 vs
  exact 0.93/0.83/0.57 across the three sfs (uniform-sphere fixture
  — sign-LSH's adversarial case), floors pinned by test.
- q196: char-entropy quality screen (operators/textstats.py
  ``char_entropy_stats``) — the model-free boilerplate filter rung
  under q101/q118/q185: exact char-histogram stats + Shannon entropy
  (factored ln form, ROUND-4) + an exact-integer top-share-ppm flag
  (never a rounded-double boolean — the q123 lesson).
- s24: streaming CUSUM drift (operators/monitor.py
  ``keyed_sum_windowed`` + ``cusum_daily_series``) — the monitor
  family's change-point member (level shifts, next to s20's PSI and
  s23's ranking): the stream owns per-(type × closed day) cents
  TOTALS (state = one int64 per open pair), the read fits a
  median/MAD baseline on pre-split days and runs Page's CUSUM via
  the clamped_balance Lindley identity as one window pass; all-int
  gate, splice scoped to ``value IS NOT NULL``.
- s25: streaming rolling distinct actives (operators/rolling.py
  ``rolling_active_from_pairs``) — q168's production split: the
  stream owns the (user × closed day) distinct (windowed count agg),
  the batch read runs the contribution-explode DAU/WAU/stickiness;
  splice scoped to ``user_id IS NOT NULL``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sources.tables import load_table

_CENTS = "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"

# q194's oracle shares the q94-q96/q185 tokenizer pinned in ablock.py
from .ablock import _Q185_TOKS  # noqa: E402

# q195's oracle replays the SAME deterministic hyperplane matrix the
# operator embeds (md5-derived +-1 rows — one Python constant, both
# engines; the in-engine md5 derivation itself is pinned by test)
from ..operators.bitlsh import hyperplane_weights  # noqa: E402


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
    # the b{i}a/b{i}b CTE pair and the (i-1)*2+k rank arithmetic
    # hard-code exactly TWO greedy picks per round - fail at import
    # if the operator knob diverges, not at gate time (r13 ADVICE)
    assert _Q194_M == 2, 'q194 oracle hard-codes m=2 greedy picks'
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


_Q195_DIM = 64
# B=48 planes / C=200 candidates: tuned on the fixtures (uniform-
# sphere embeddings — the ADVERSARIAL case for any sign-LSH, the same
# regime that sets q92b's 0.65 IVF floor).  B=16/C=40 measured
# recall@10 of 0.17-0.3; 48/200 lands 0.83 (sf0.01) / 0.57 (sf0.1),
# floors pinned by tests/test_bitlsh.py.  The cut still BINDS at
# every sf (C < corpus).
_Q195_B = 48
_Q195_C = 200
_Q195_NQ = 3
_Q195_K = 10


def q195_bitlsh_topk(spark, sf):
    """Hyperplane bit-LSH top-k (operators/bitlsh.py bit_lsh_topk):
    the BINARY quantization ANN rung — B=48 deterministic +-1
    hyperplanes (md5-derived, engine-replayable), one BIGINT signature
    per vector, candidate generation by exact Hamming distance over
    signatures alone (XOR + popcount — ~10x fewer bytes than the raw
    vectors), exact-int64 d2 rerank of the top-C=200 candidates,
    final top-k=10 by (d2, vec_id).  Unlike q92b/q93b's rows-only
    bucketing paths this is FULLY hash-gated: weights, sign bits,
    Hamming cut and rerank are all deterministic and the oracle
    replays each stage.  Queries = the 3 smallest-md5(id) vectors
    (the q112/q181/q191 contract)."""
    from ..operators.bitlsh import bit_lsh_topk

    emb = load_table(spark, sf, "embeddings")
    return bit_lsh_topk(
        emb,
        "vec_id",
        "embedding",
        _Q195_DIM,
        _Q195_B,
        _Q195_C,
        _Q195_NQ,
        _Q195_K,
    )


def _q195_sql() -> str:
    weights = hyperplane_weights(_Q195_B, _Q195_DIM)
    wrows = ", ".join(
        f"({h}, {d}, {w})"
        for h, row in enumerate(weights)
        for d, w in enumerate(row)
    )
    return f"""
WITH qfull AS MATERIALIZED (
  SELECT vec_id, dim,
         CAST(floor(CAST(val AS DOUBLE) * 10000) AS BIGINT) + 10000 AS v
  FROM (SELECT vec_id, unnest(embedding) AS val,
               generate_subscripts(embedding, 1) - 1 AS dim
        FROM embeddings WHERE embedding IS NOT NULL)
), w(h, dim, wt) AS (VALUES {wrows}),
wh AS (SELECT h, CAST(sum(wt) AS BIGINT) AS wsum FROM w GROUP BY 1),
dots AS (
  SELECT q.vec_id, w.h, CAST(SUM(w.wt * q.v) AS BIGINT) AS dot
  FROM qfull q JOIN w ON w.dim = q.dim GROUP BY 1, 2
), sig AS MATERIALIZED (
  -- bit h set iff the UNSHIFTED dot >= 0: dot - SHIFT * sum(w) >= 0
  SELECT d.vec_id,
         CAST(SUM(CASE WHEN d.dot - 10000 * wh.wsum >= 0
                       THEN CAST(1 AS BIGINT) << d.h
                       ELSE 0 END) AS BIGINT) AS sig
  FROM dots d JOIN wh USING (h) GROUP BY 1
), ordv AS MATERIALIZED (
  SELECT vec_id,
         row_number() OVER (
           ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
  FROM (SELECT DISTINCT vec_id FROM qfull)
), qrs AS MATERIALIZED (
  SELECT o.vec_id AS query_id, s.sig AS q_sig
  FROM ordv o JOIN sig s ON s.vec_id = o.vec_id
  WHERE o.rn <= {_Q195_NQ}
), ham AS (
  SELECT r.query_id, s.vec_id,
         CAST(bit_count(xor(r.q_sig, s.sig)) AS BIGINT) AS hamming
  FROM qrs r, sig s
), cand AS MATERIALIZED (
  SELECT query_id, vec_id, hamming FROM (
    SELECT query_id, vec_id, hamming,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY hamming, vec_id) AS rk
    FROM ham
  ) WHERE rk <= {_Q195_C}
), scored AS (
  SELECT c.query_id, c.vec_id, c.hamming,
         CAST(SUM((a.v - b.v) * (a.v - b.v)) AS BIGINT) AS d2
  FROM cand c
  JOIN qfull a ON a.vec_id = c.vec_id
  JOIN qfull b ON b.vec_id = c.query_id AND b.dim = a.dim
  GROUP BY 1, 2, 3
)
SELECT query_id, CAST(rk AS BIGINT) AS rank, vec_id, hamming, d2 FROM (
  SELECT query_id, vec_id, hamming, d2,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY d2, vec_id) AS rk
  FROM scored
) WHERE rk <= {_Q195_K}"""


Q195_SQL = _q195_sql()


_Q196_PPM_THRESHOLD = 200_000


def q196_char_entropy(spark, sf):
    """Char-entropy quality screen (operators/textstats.py
    char_entropy_stats): per doc, exact char-histogram stats (n_chars,
    n_distinct, top char with (count desc, char) tie-break, integer
    top-share ppm) + the Shannon entropy of the char distribution in
    the factored form H = ln(n) - (SUM c ln c)/n (every ln argument an
    exact integer; ROUND-4 both sides — the q118/q185 ln rule,
    sweep-eligible on promotion).  The low-quality FLAG compares exact
    integers only (top_share_ppm > {thr}) and BINDS both directions at
    every fixture sf (1/1/9 of 500/500/5000 docs flagged)."""
    from ..operators.textstats import char_entropy_stats

    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    return char_entropy_stats(
        docs, "doc_id", "text", _Q196_PPM_THRESHOLD
    )


Q196_SQL = f"""
WITH c AS MATERIALIZED (
  -- the SAME explicit exclusion class as the operator (Java's '.'
  -- excludes five line terminators, RE2's only LF — chr() builds
  -- the literal class so neither engine's escape syntax is parsed)
  SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT doc_id,
               unnest(regexp_extract_all(text,
                 '[^' || chr(10) || chr(13) || chr(133)
                      || chr(8232) || chr(8233) || ']')) AS ch
        FROM documents)
  GROUP BY 1, 2
), tops AS (
  SELECT doc_id, ch AS top_char, c AS top_cnt FROM (
    SELECT doc_id, ch, c,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY c DESC, ch) AS rk
    FROM c
  ) WHERE rk = 1
), agg AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_chars,
         CAST(count(*) AS BIGINT) AS n_distinct,
         ROUND(ln(CAST(sum(c) AS DOUBLE))
               - sum(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)))
                 / CAST(sum(c) AS DOUBLE), 4) AS entropy4
  FROM c GROUP BY 1
)
SELECT a.doc_id, a.n_chars, a.n_distinct, t.top_char, t.top_cnt,
       CAST(t.top_cnt * 1000000 // a.n_chars AS BIGINT) AS top_share_ppm,
       a.entropy4,
       (t.top_cnt * 1000000 // a.n_chars) > {_Q196_PPM_THRESHOLD}
         AS is_low_quality
FROM agg a JOIN tops t USING (doc_id)
"""


_S24_SPLIT = "2024-01-16"
# alarm threshold h = 3 x MAD: in MAD units (MAD ~ 0.674 sigma for a
# normal) this is ~2 sigma — the fixture-binding choice (h=5 never
# fires at sf0.001; 3 fires 1/12/5 alarms at the three sfs while
# leaving the majority un-alarmed, both directions pinned by test)
_S24_H = 3


def s24_cusum_stream(spark, sf):
    """Streaming CUSUM drift monitor (operators/monitor.py) — the
    monitor family's change-point member (s20 PSI answers "did the
    distribution move", s23 top-k answers "did the heavy hitters
    change", this answers "did the LEVEL shift, and when"): the stream
    owns the per-(type × day) cents TOTALS (keyed_sum_windowed — state
    per open (type, day) is ONE int64, append emits closed days), and
    the read fits the robust median/MAD baseline on pre-split days and
    runs Page's one-sided CUSUM over the monitored days via the
    clamped_balance Lindley reflection identity as ONE window pass
    (cusum_daily_series).  Exact int64 end to end, alarm = S >
    3·MAD (both alarm directions bind at every fixture sf) — no
    ROUND anywhere.  Splice scoped to ``value IS NOT
    NULL`` (the operator's amount-NULL filter lands below
    EventTimeWatermark after Catalyst's pushdown — the s20/s22
    lesson)."""
    from ..operators.monitor import cusum_daily_series, keyed_sum_windowed
    from ..operators.robust import cents
    from ..streaming.core import run_to_memory, stream_events

    sdf = stream_events(spark, sf)
    daily = run_to_memory(
        keyed_sum_windowed(
            sdf, ["event_type"], "ts", cents("value"), bucket="day"
        ),
        "s24_daily",
        n_state_partitions=8,
    )
    daily = daily.localCheckpoint(eager=True)  # the s15 lineage cut
    return cusum_daily_series(
        daily, ["event_type"], "day", "total", _S24_SPLIT, h_mult=_S24_H
    )


S24_SQL = f"""
WITH d AS MATERIALIZED (
  SELECT event_type,
         strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         CAST(sum({_CENTS}) AS BIGINT) AS total
  FROM events
  WHERE value IS NOT NULL
    AND date_trunc('day', ts)
        < (SELECT date_trunc('day', max(ts)) FROM events
           WHERE value IS NOT NULL)
  GROUP BY 1, 2
), ref AS (
  SELECT * FROM d WHERE day < '{_S24_SPLIT}'
), med AS (
  SELECT event_type, total AS med_ref FROM (
    SELECT event_type, total, day,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY total, day) AS rn,
           count(*) OVER (PARTITION BY event_type) AS n
    FROM ref) WHERE rn = (n + 1) // 2
), dev0 AS (
  SELECT r.event_type, r.day, abs(r.total - m.med_ref) AS dv
  FROM ref r JOIN med m USING (event_type)
), mad AS (
  SELECT event_type, dv AS mad_ref FROM (
    SELECT event_type, dv, day,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY dv, day) AS rn,
           count(*) OVER (PARTITION BY event_type) AS n
    FROM dev0) WHERE rn = (n + 1) // 2
), base AS (
  SELECT m.event_type, m.med_ref, a.mad_ref
  FROM med m JOIN mad a USING (event_type)
), series AS MATERIALIZED (
  SELECT c.event_type, c.day, c.total AS x, b.med_ref, b.mad_ref,
         c.total - b.med_ref - b.mad_ref AS dev
  FROM d c LEFT JOIN base b USING (event_type)
  WHERE c.day >= '{_S24_SPLIT}'
), fold AS (
  SELECT event_type, day, x, med_ref, mad_ref, dev,
         CAST(sum(dev) OVER w AS BIGINT) AS prefix
  FROM series
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS UNBOUNDED PRECEDING)
), fold2 AS (
  SELECT event_type, day, x, med_ref, mad_ref, dev, prefix,
         CAST(least(min(prefix) OVER w2, 0) AS BIGINT) AS floor_
  FROM fold
  WINDOW w2 AS (PARTITION BY event_type ORDER BY day
                ROWS UNBOUNDED PRECEDING)
)
SELECT event_type, day, CAST(x AS BIGINT) AS day_total,
       med_ref, mad_ref, CAST(dev AS BIGINT) AS dev,
       CAST(prefix - floor_ AS BIGINT) AS cusum,
       CASE WHEN mad_ref IS NOT NULL
            THEN (prefix - floor_) > {_S24_H} * mad_ref END AS is_alarm
FROM fold2
"""


_S25_WINDOW_DAYS = 7


def s25_rolling_active_stream(spark, sf):
    """Streaming rolling distinct actives (operators/rolling.py
    rolling_active_from_pairs) — q168's production split: the stream
    owns the (user × day) DISTINCT as a windowed count agg
    (value_histogram_windowed with the user as the value — each
    (user, closed day) pair emits exactly once), and the batch read
    runs the contribution-explode DAU/WAU/stickiness over the emitted
    pair frame — COUNT(DISTINCT) over a sliding frame stays illegal
    on streams too, so the same rewrite carries.  Splice scoped to
    ``user_id IS NOT NULL`` (the histogram stage's NULL-value filter
    lands below EventTimeWatermark after Catalyst's pushdown — the
    s20/s22 lesson; vacuous on this fixture, scoped anyway)."""
    from ..operators.quantsketch import value_histogram_windowed
    from ..operators.rolling import rolling_active_from_pairs
    from ..streaming.core import run_to_memory, stream_events

    sdf = stream_events(spark, sf).select("ts", "user_id")
    pairs = run_to_memory(
        value_histogram_windowed(
            sdf, [], "ts", "user_id", bucket="day"
        ),
        "s25_active",
        n_state_partitions=8,
    )
    pairs = pairs.localCheckpoint(eager=True)  # the s15 lineage cut
    active = pairs.select("user_id", F.to_date("day").alias("_day"))
    return rolling_active_from_pairs(
        active, "user_id", "_day", _S25_WINDOW_DAYS
    )


S25_SQL = f"""
WITH active AS MATERIALIZED (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
  WHERE user_id IS NOT NULL
    AND date_trunc('day', ts)
        < (SELECT date_trunc('day', max(ts)) FROM events
           WHERE user_id IS NOT NULL)
), days AS (
  SELECT DISTINCT d FROM active
), wau AS (
  SELECT dy.d, CAST(count(DISTINCT a.user_id) AS BIGINT) AS wau
  FROM days dy JOIN active a
    ON a.d BETWEEN dy.d - {_S25_WINDOW_DAYS - 1} AND dy.d
  GROUP BY 1
), dau AS (
  SELECT d, CAST(count(*) AS BIGINT) AS dau FROM active GROUP BY 1
)
SELECT strftime(dau.d, '%Y-%m-%d') AS day, dau.dau, wau.wau,
       CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE) AS stickiness
FROM dau JOIN wau ON dau.d = wau.d
"""



STAGED_QUERIES = {
    "q193_ivfpq_topk": q193_ivfpq_topk,
    "s22_asof_enrich_stream": s22_asof_enrich_stream,
    "q194_bpe_batched": q194_bpe_batched,
    "s23_topk_drift_stream": s23_topk_drift_stream,
    "q195_bitlsh_topk": q195_bitlsh_topk,
    "q196_char_entropy": q196_char_entropy,
    "s24_cusum_stream": s24_cusum_stream,
    "s25_rolling_active_stream": s25_rolling_active_stream,
}

STAGED_ORACLE = {
    "q193_ivfpq_topk": Q193_SQL,
    "s22_asof_enrich_stream": S22_SQL,
    "q194_bpe_batched": Q194_SQL,
    "s23_topk_drift_stream": S23_SQL,
    "q195_bitlsh_topk": Q195_SQL,
    "q196_char_entropy": Q196_SQL,
    "s24_cusum_stream": S24_SQL,
    "s25_rolling_active_stream": S25_SQL,
}
