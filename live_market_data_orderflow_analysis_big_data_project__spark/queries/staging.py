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

The round-15 rotation (docs/ROTATION_r15.md) promoted the full staged
pool: q193 IVF-PQ top-k, q194 batched BPE, q195 hyperplane bit-LSH
top-k, q196 char-entropy screen -> queries/ablock.py; s22 streaming
as-of enrichment, s23 top-k ranking drift, s24 CUSUM drift, s25
rolling distinct actives -> queries/sblock.py.

Window arithmetic for entries staged here now (docs/ROTATION_r15.md
look-ahead): the r16 and r17 windows are fully consumed by the 50
r12-latest / 50 r13-latest age-rule re-entry cohorts, so anything
staged during r15/r16 holds pytest-only evidence until the r18
rotation unless a window entry fails and frees a slot.  Entries
staged here must therefore carry the full evidence class (3-sf
hash-pass, 16x probe where batch, plan/determinism/dtype audits,
unit + binding tests) and expect to stand on it for two rounds.

Staged during round 15 for the r18 window (the honest capability gaps
named in VERDICT r14 / docs/ROTATION_r16.md):

- q197: connected components by alternating large-star/small-star
  (operators/cc.py ``cc_bigstar``) — the O(log d)-round successor to
  q111's min-label propagation (Kiveris et al. 2014 shape), closing
  the one data-dependent-iteration dedup stage: chained template spam
  makes q111's round count equal the chain length, while this
  contracts distance-to-minimum ~geometrically.  Same edge frame and
  the SAME recursive-CTE oracle as q111 (identical output contract),
  so the gate proves the new machinery equals the old on real
  near-dup graphs; the diameter-100 adversarial chain is pinned by
  test (tests/test_cc.py: 8 rounds where min-label needs 100).
- q198: char-granularity exact substring dedup via winnowing
  (operators/winnow.py ``substring_dup_spans``) — the
  Schleimer/Wilkerson/Aiken winnowing form of the Lee et al. 2022
  exact-substring capability: per-window-min k-gram fingerprints
  (guaranteed detection of shared runs >= w + k - 1), diagonal-run
  assembly into verified shared SPANS (q124's mod-p sampling flags
  pairs probabilistically and cannot localize; this measures
  max_span_chars exactly — the 509-char top span at sf0.001 is a
  verified literal substring of both docs).
- s26: streaming incremental banded-LSH near-dup ingest
  (operators/incdedup.py ``banded_pairs_from_fps`` + the foreachBatch
  fingerprint store) — q149's production loop as a real micro-batch
  pipeline: each ingest batch is SimHash-fingerprinted independently
  (per-doc stateless => batch-invariant, pinned by a 3-batch replay
  test), appended exactly-once to the shard fp store (the s13
  batch_id idempotency pattern), band-joined against the persisted
  index at read time.  Oracle = q149's SQL verbatim (no splice — the
  s21 stateless class); exact recall by pigeonhole.
- q199: Zipf-aware certified top-k (operators/topk.py
  ``topk_threshold_rollup``, the candidate carried on VERDICT's list
  since r12) — the q143 certified heavy-hitter structure with a
  phi = 1/theta SUPPORT cut instead of the fixed rank-m cut: kept
  rows adapt to the Zipf head (<= theta + 1 per bucket, far fewer on
  skewed buckets; dropped mass provably < total/theta), the
  merge/read certificate algebra is q143's verbatim, and uniform
  buckets degrade LOUDLY (top-1 only, certified=false) — pinned by
  tests over both the Zipf token frame and the uniform events frame.
- q200: training-label QA (operators/labels.py ``label_agreement``)
  — the label-aggregation stage of a preference/annotation pipeline
  (a capability family the inventory lacked): per-item majority vote
  with latest-wins rating dedup and deterministic tie-breaks, plus
  corpus-level pairwise observed agreement, marginal chance
  agreement, and kappa in a fixed IEEE parenthesization (the q154
  discipline — the all-int64 rational form's N^3-scale terms
  overflowed int64 at the 16x probe, the probe-driven rewrite).
  Exact-integer item rows + one ROUND-4 summary scalar; 16x probe
  1.6x.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sources.tables import load_table


def q197_cc_bigstar(spark, sf):
    """Connected components over the SAME near-dup edge frame as q111
    (exact-dup star edges UNION verified Jaccard pairs), computed by
    the alternating large-star/small-star algorithm (operators/cc.py
    cc_bigstar) instead of min-label propagation — O(log d) rounds vs
    q111's diameter-many (the chained-template-spam hedge at corpus
    scale).  Output contract identical to q111 ((doc_id, cluster_id =
    component min)), so the oracle is q111's recursive CTE verbatim
    and a hash-pass proves new-machinery == old on the full fixture
    graph."""
    from ..operators.cc import cc_bigstar
    from ..operators.llmops import jaccard_pairs
    from .lblock import _Q91_BOUND

    d = load_table(spark, sf, "documents")
    hashed = d.select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("h")
    )
    kept = hashed.groupBy("h").agg(F.min("doc_id").alias("kept_id"))
    star = (
        hashed.join(kept, "h")
        .filter(F.col("doc_id") != F.col("kept_id"))
        .select(
            F.col("kept_id").alias("doc_a"),
            F.col("doc_id").alias("doc_b"),
        )
    )
    near = jaccard_pairs(
        d.filter(F.col("doc_id") < _Q91_BOUND), threshold=0.5, ngram=3
    ).select("doc_a", "doc_b")
    return cc_bigstar(star.unionAll(near))


def _q197_sql() -> str:
    # q111's oracle verbatim — the two operators share the output
    # contract, so sharing the oracle is the point of the gate
    from .pblock import Q111_SQL

    return Q111_SQL


_Q198_K = 32
_Q198_W = 8
_Q198_MAX_DF = 50


def q198_substring_dups(spark, sf):
    """Char-granularity exact substring dedup (operators/winnow.py
    substring_dup_spans): winnowed k=32-gram fingerprints (the
    per-window minimum of every w=8 window by (md5, pos desc) — any
    shared run >= w + k - 1 = 39 chars is GUARANTEED a shared
    fingerprint), df-screened at max_df=50 (q124's boilerplate
    suppression), paired by gram, assembled into same-diagonal runs
    (gap <= k merges — overlapping/abutting matches are one contiguous
    shared substring by construction).  Per pair: n_shared_grams,
    n_runs, max_span_chars — all exact integers, every stage
    deterministic and replayed by the oracle.  Detection binds both
    directions at every fixture sf (pairs exist; most docs pair with
    nobody) and winnowing genuinely thins (selected << total grams —
    pinned by test)."""
    from ..operators.winnow import substring_dup_spans

    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    return substring_dup_spans(
        docs,
        k=_Q198_K,
        w=_Q198_W,
        max_df=_Q198_MAX_DF,
    )


def _q198_sql() -> str:
    k, w, max_df = _Q198_K, _Q198_W, _Q198_MAX_DF
    return f"""
WITH d AS (SELECT doc_id, text FROM documents
           WHERE len(text) >= {k + w - 1}),
g AS (
  SELECT doc_id, CAST(s.g AS BIGINT) AS pos,
         substring(text, s.g, {k}) AS gram
  FROM d, unnest(range(1, len(text) - {k} + 2)) AS s(g)
), n AS (
  SELECT doc_id, count(*) AS n FROM g GROUP BY 1
), sel0 AS (
  -- the winner of the w-window starting at each complete-window
  -- position: (md5 asc, pos desc) — the rightmost-on-tie winnowing
  -- rule, identical to the operator's struct-min
  SELECT w.doc_id, p.pos, p.gram,
         row_number() OVER (
           PARTITION BY w.doc_id, w.pos
           ORDER BY CAST(('0x' || substring(md5(p.gram), 1, 15))
                         AS BIGINT),
                    p.pos DESC) AS rk
  FROM g w
  JOIN n ON n.doc_id = w.doc_id AND w.pos <= n.n - {w} + 1
  JOIN g p ON p.doc_id = w.doc_id
          AND p.pos BETWEEN w.pos AND w.pos + {w} - 1
), sel AS (
  SELECT DISTINCT doc_id, pos, gram FROM sel0 WHERE rk = 1
), keep AS (
  SELECT gram FROM sel GROUP BY gram
  HAVING count(DISTINCT doc_id) <= {max_df}
), fp AS (
  SELECT s.* FROM sel s JOIN keep USING (gram)
), pr AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.gram,
         a.pos AS pos_a, a.pos - b.pos AS diag
  FROM fp a JOIN fp b ON a.gram = b.gram AND a.doc_id < b.doc_id
), isl AS (
  SELECT doc_a, doc_b, diag, pos_a,
         CASE WHEN pos_a - lag(pos_a)
                         OVER (PARTITION BY doc_a, doc_b, diag
                               ORDER BY pos_a) > {k}
              THEN 1 ELSE 0 END AS brk
  FROM pr
), runs AS (
  SELECT doc_a, doc_b, diag, pos_a,
         sum(brk) OVER (PARTITION BY doc_a, doc_b, diag ORDER BY pos_a
                        ROWS UNBOUNDED PRECEDING) AS run_id
  FROM isl
), rspan AS (
  SELECT doc_a, doc_b, diag, run_id,
         max(pos_a) - min(pos_a) + {k} AS span
  FROM runs GROUP BY 1, 2, 3, 4
), agg_r AS (
  SELECT doc_a, doc_b, CAST(count(*) AS BIGINT) AS n_runs,
         CAST(max(span) AS BIGINT) AS max_span_chars
  FROM rspan GROUP BY 1, 2
), shared AS (
  SELECT doc_a, doc_b,
         CAST(count(DISTINCT gram) AS BIGINT) AS n_shared_grams
  FROM pr GROUP BY 1, 2
)
SELECT s.doc_a, s.doc_b, s.n_shared_grams, r.n_runs, r.max_span_chars
FROM shared s JOIN agg_r r USING (doc_a, doc_b)
"""


def s26_incremental_lsh_stream(spark, sf):
    """Streaming incremental banded-LSH near-dup ingest — q149's
    production loop as a REAL micro-batch pipeline (the s12 exact-hash
    twin's missing similarity rung): the shard band of the documents
    table replays through the file source, each micro-batch is SimHash-
    fingerprinted independently inside ``foreachBatch`` (per-doc
    stateless, so batch boundaries cannot change the result) and
    appended exactly-once to the shard fingerprint store (one
    ``batch_id=`` dir per batch — the s13 idempotency pattern); the
    read stage band-joins the accumulated store against the persisted
    index fingerprints (banded_pairs_from_fps), emitting (shard x
    index) + (shard x shard) pairs with exact recall by pigeonhole.
    No watermark, no state store, no splice — per-row stateless (the
    s21 class), so the oracle is q149's SQL verbatim and the gate
    proves stream == batch on the identical pair set.  Per-ingest cost
    is O(shard batch): the corpus is never re-fingerprinted — the
    point of the pattern at 100 TB."""
    import os
    import tempfile

    from ..operators.incdedup import banded_pairs_from_fps
    from ..operators.llmops import simhash_fingerprints_long
    from ..streaming.core import foreach_batch_sink, stream_table
    from .ablock import _Q149_BOUND

    docs = load_table(spark, sf, "documents").filter(
        F.col("doc_id") < _Q149_BOUND
    )
    split = docs.agg(F.expr("(max(doc_id) * 4) div 5").alias("__s"))
    d = docs.crossJoin(F.broadcast(split))
    index_fps = simhash_fingerprints_long(
        d.filter(F.col("doc_id") < F.col("__s"))
    ).localCheckpoint(eager=True)

    # the split scalar reaches the stream via a broadcast stream-static
    # equi-join on a literal key (stream-side cross joins are not
    # supported; a driver collect is the q137/q149 anti-pattern)
    sdocs = stream_table(spark, sf, "documents").select(
        "doc_id", "text", F.lit(1).alias("__k")
    )
    sp = split.select("__s", F.lit(1).alias("__k"))
    shard_stream = (
        sdocs.join(F.broadcast(sp), "__k")
        .where(
            (F.col("doc_id") >= F.col("__s"))
            & (F.col("doc_id") < _Q149_BOUND)
        )
        .select("doc_id", "text")
    )

    # FIXED per-(entry, sf) path, not mkdtemp (the pblock/s13 policy —
    # VERDICT r15 item 7): repeated bench/gate/probe runs REPLACE the
    # previous copy instead of accumulating unbounded dirs under /tmp.
    # Reset per invocation — a reused checkpoint would mark all input
    # processed and drain instantly (the s13 lesson).  Keyed by the sf
    # dir name because the shard content differs per scale factor.
    # Same one-harness-at-a-time caveat as pblock's _roundtrip_path.
    import shutil

    base = os.path.join(
        tempfile.gettempdir(),
        "spark_graft_roundtrip",
        "s26_lsh_" + os.path.basename(os.path.normpath(sf)),
    )
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base, exist_ok=True)
    store = os.path.join(base, "fps")

    def fp_batch(batch_df, batch_id):
        if batch_df.isEmpty():
            return  # AvailableNow's final no-data batch
        simhash_fingerprints_long(batch_df).write.mode(
            "overwrite"
        ).parquet(os.path.join(store, f"batch_id={batch_id}"))

    q = foreach_batch_sink(
        shard_stream, fp_batch, os.path.join(base, "ckpt")
    )
    if not q.awaitTermination(300):
        q.stop()  # the s13 lesson: never leave an orphan query running
        raise RuntimeError("s26 availableNow drain timed out after 300s")
    shard_fps = (
        spark.read.parquet(store)
        .drop("batch_id")
        .localCheckpoint(eager=True)
    )
    return banded_pairs_from_fps(index_fps, shard_fps, max_hamming=2)


def _s26_sql() -> str:
    # q149's oracle verbatim — the stream is per-row stateless, so the
    # drained pair set IS the batch pair set (no splice)
    from .ablock import Q149_SQL

    return Q149_SQL


_Q199_THETA = 64
_Q199_K = 5


def q199_topk_zipf(spark, sf):
    """Zipf-aware certified top-k (operators/topk.py
    topk_threshold_rollup — the q143 capability's phi-heavy-hitter
    constructor, carried on VERDICT's list since r12): most frequent
    word tokens per language, bucketed by source, with the cut at
    ceil(bucket_total / theta=64) instead of q143's fixed rank-m —
    space adapts to the Zipf head (kept rows bounded by theta + 1
    per bucket unconditionally, far fewer on skewed buckets) and the
    dropped mass is provably below total/theta, so tail bounds are
    distribution-tight.  The merge and the self-certifying read are
    q143's topk_merge/topk_read VERBATIM — same certified structure,
    second constructor.  On the fixture the threshold genuinely drops
    (most buckets), maps are multi-item, and BOTH certificate
    outcomes appear at the gate sfs (1/5 groups certified at
    sf0.001/0.01, 5/5 at sf0.1) — pinned by test.  Word frequencies
    are the canonical Zipf domain ('most frequent n-grams per shard',
    the operator docstring's own example)."""
    from ..operators.llmops import tokens_col
    from ..operators.topk import (
        topk_merge,
        topk_read,
        topk_threshold_rollup,
    )

    d = load_table(spark, sf, "documents").select(
        "lang", "source", F.explode(tokens_col("text")).alias("tok")
    )
    rollup = topk_threshold_rollup(
        d, ["lang"], "source", "tok", theta=_Q199_THETA
    )
    merged = topk_merge(rollup, ["lang"])
    return topk_read(merged, ["lang"], k=_Q199_K).select(
        "lang", "item", "est", "upper", "rank", "certified"
    )


def _q199_sql() -> str:
    toks = (
        "list_filter(regexp_split_to_array(lower(text), '\\W+'),"
        " x -> x <> '')"
    )
    th, k = _Q199_THETA, _Q199_K
    return f"""
WITH c AS (
  SELECT lang, source, tok, CAST(count(*) AS BIGINT) AS n
  FROM (SELECT lang, source, unnest({toks}) AS tok FROM documents)
  GROUP BY 1, 2, 3
), r AS (
  SELECT *,
         row_number() OVER (PARTITION BY lang, source
                            ORDER BY n DESC, tok ASC) AS rn,
         (sum(n) OVER (PARTITION BY lang, source) + {th} - 1) // {th}
           AS thr
  FROM c
), kept AS (
  SELECT *, (n >= thr OR rn = 1) AS keep FROM r
), tb AS (
  SELECT lang, source,
         coalesce(max(CASE WHEN NOT keep THEN n END), 0) AS tail_bound
  FROM kept GROUP BY 1, 2
), slack AS (
  SELECT lang, CAST(sum(tail_bound) AS BIGINT) AS total_slack
  FROM tb GROUP BY 1
), merged AS (
  SELECT x.lang, x.tok AS item, CAST(sum(x.n) AS BIGINT) AS est,
         CAST(sum(t.tail_bound) AS BIGINT) AS reported_tb
  FROM kept x JOIN tb t ON x.lang = t.lang AND x.source = t.source
  WHERE x.keep
  GROUP BY 1, 2
), m2 AS (
  SELECT m.lang, m.item, m.est,
         m.est + s.total_slack - m.reported_tb AS upper,
         s.total_slack
  FROM merged m JOIN slack s USING (lang)
), ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY lang ORDER BY est DESC, item ASC) AS rank
  FROM m2
), kth AS (
  SELECT lang, min(est) AS kth_est, max(total_slack) AS slk
  FROM ranked WHERE rank <= {k} GROUP BY 1
), outs AS (
  SELECT lang, max(upper) AS best_out
  FROM ranked WHERE rank > {k} GROUP BY 1
)
SELECT r.lang, r.item, r.est, r.upper, CAST(r.rank AS BIGINT) AS rank,
       (k.kth_est > greatest(coalesce(o.best_out, 0), k.slk)) AS certified
FROM ranked r
JOIN kth k USING (lang)
LEFT JOIN outs o USING (lang)
WHERE r.rank <= {k}
"""


_Q200_GROUP = 4  # raters per item band: event_id div 4


def q200_label_agreement(spark, sf):
    """Training-label QA (operators/labels.py label_agreement): the
    label-aggregation stage of a preference/annotation pipeline —
    per-item majority vote with latest-wins rating dedup and a
    deterministic (count desc, label asc) tie-break, plus the
    corpus-level chance-corrected agreement: pairwise observed
    agreement (the variable-raters-per-item generalization of Fleiss'
    P_o), marginal chance agreement, and kappa from exact int64 terms
    in a fixed IEEE parenthesization + ROUND-4 (the q154 discipline;
    sweep class on promotion).  Framing:
    each event is a rating — rater = user_id, label = event_type,
    item = event_id div 4 (bands of 4 consecutive events), so the
    latest-wins dedup genuinely fires (~90-110 duplicate (item, rater)
    cells at every sf), unanimity binds both ways (14/250 items at
    sf0.001), and kappa lands near zero (labels are independent of
    items in the fixture — the calibration a real pipeline would
    alarm on)."""
    from ..operators.labels import label_agreement

    ev = load_table(spark, sf, "events")
    return label_agreement(ev, F.expr("event_id div 4"))


_Q200_SQL = """
WITH base AS MATERIALIZED (
  SELECT event_id // 4 AS item_id, user_id AS rater,
         event_type AS label, epoch_us(ts) AS us, event_id
  FROM events
  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
), ratings AS (
  SELECT item_id, rater, label FROM (
    SELECT *, row_number() OVER (PARTITION BY item_id, rater
                                 ORDER BY us DESC, event_id DESC) AS rk
    FROM base
  ) WHERE rk = 1
), cells AS MATERIALIZED (
  SELECT item_id, label, CAST(count(*) AS BIGINT) AS n_c
  FROM ratings GROUP BY 1, 2
), items AS MATERIALIZED (
  SELECT item_id, CAST(sum(n_c) AS BIGINT) AS n_raters,
         CAST(sum(n_c * (n_c - 1)) AS BIGINT) AS n_concordant
  FROM cells GROUP BY 1
), maj AS (
  SELECT item_id, label AS majority_label, n_c AS maj_n FROM (
    SELECT *, row_number() OVER (PARTITION BY item_id
                                 ORDER BY n_c DESC, label) AS rk
    FROM cells
  ) WHERE rk = 1
), marg AS MATERIALIZED (
  SELECT label, CAST(sum(n_c) AS BIGINT) AS n_l FROM cells GROUP BY 1
), gmaj AS (
  SELECT label, n_l FROM (
    SELECT *, row_number() OVER (ORDER BY n_l DESC, label) AS rk
    FROM marg
  ) WHERE rk = 1
), tot AS (
  SELECT CAST(sum(n_raters) AS BIGINT) AS n,
         CAST(sum(n_raters * (n_raters - 1)) AS BIGINT) AS p,
         CAST(sum(n_concordant) AS BIGINT) AS c
  FROM items
), qq AS (
  SELECT CAST(sum(n_l * n_l) AS BIGINT) AS q FROM marg
)
SELECT 'item' AS kind, CAST(i.item_id AS BIGINT) AS item_id,
       i.n_raters,
       CAST(i.n_raters * (i.n_raters - 1) AS BIGINT) AS n_pairs,
       i.n_concordant, m.majority_label,
       CAST((m.maj_n * 1000000) // i.n_raters AS BIGINT)
         AS majority_share_ppm,
       m.maj_n = i.n_raters AS is_unanimous,
       CAST(NULL AS DOUBLE) AS kappa4
FROM items i JOIN maj m USING (item_id)
UNION ALL
SELECT 'summary', NULL, t.n, t.p, t.c, g.label,
       CAST((g.n_l * 1000000) // t.n AS BIGINT),
       CAST(NULL AS BOOLEAN),
       CASE WHEN t.p > 0 AND t.n * t.n <> s.q
            THEN ROUND((CAST(t.c AS DOUBLE) / t.p
                        - CAST(s.q AS DOUBLE) / (t.n * t.n))
                       / (1.0 - CAST(s.q AS DOUBLE) / (t.n * t.n)), 4)
            END
FROM tot t, qq s, gmaj g
"""


STAGED_QUERIES = {
    "q197_cc_bigstar": q197_cc_bigstar,
    "q198_substring_dups": q198_substring_dups,
    "s26_incremental_lsh_stream": s26_incremental_lsh_stream,
    "q199_topk_zipf": q199_topk_zipf,
    "q200_label_agreement": q200_label_agreement,
}

STAGED_ORACLE = {
    "q197_cc_bigstar": _q197_sql(),
    "q198_substring_dups": _q198_sql(),
    "s26_incremental_lsh_stream": _s26_sql(),
    "q199_topk_zipf": _q199_sql(),
    "q200_label_agreement": _Q200_SQL,
}
