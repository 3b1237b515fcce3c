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

The round-9 rotation (docs/ROTATION_r9.md) promoted 25 entries into
queries/ablock.py.  Left staged for the round-10 window:

- q142: histogram rollup report (operators/histogram.py) — every flag
  deterministic at any scale (exact integer merges; the quantile band
  is a theorem against the discrete quantile).
- q143: certified top-k heavy hitters (operators/topk.py) — the
  DuckDB twin recomputes the SAME lossy rollup (m-cut, tail bounds,
  slack certificate) with plain SQL window functions, so every value
  (est, upper, certified) is hash-compared, not just shape.
- q144: HLL audience overlap (hll_overlap_estimates) — full-value
  oracle vs the exact self-join, valid at every fixture sf because
  the largest pair union (1500 users) is under the measured lgk=14
  exactness boundary (~1609).
- q149: incremental SimHash near-dup (operators/incdedup.py) — the
  q137 index-and-merge shape lifted to similarity dedup; deferred
  from the r9 window (with q152) to make room for the q106b/q140b
  code-change re-entries — it composes two families the window has
  already gated (q91d SimHash banding + q137 incremental framing).
- q152: robust MAD outlier screen (operators/robust.py) — deferred
  from r9 alongside q149: its operator (mad_outlier_stats) holds
  IN-window coverage transitively through q166's CUSUM oracle, which
  recomputes the same median/MAD selection in SQL.
- s14: streaming windowed HLL rollup (operators/sketches.py
  hll_rollup_windowed) — AvailableNow drain; append mode emits closed
  day windows only, so the oracle excludes the final (still-open) day;
  per-(type, day) cardinalities are deep in the coupon-exact regime,
  making the stream's estimates hash-comparable to exact counts.
- s15: streaming-maintained top-k rollup (operators/topk.py
  topk_rollup_windowed + topk_counts_to_rollup) — the stream keeps
  exact per-(group x day x item) counts, the lossy m-cut stays a
  batch view over the emitted table (retroactively re-cuttable);
  oracle = Q143's lossy-rollup SQL restricted to closed days (built
  by replacement so the twins stay coupled).

The sketch-rollup family (q142/q143/q144/s14/s15) waits because q141
already gated its shape in r8 (weakest novelty); all staged entries
re-verify at two sfs on every pytest run via tests/test_next_rotation.py.

Newly staged in round 9 (the graph-analytics family, operators/graph.py
— the capability class next to q111's connected components):

- q170: per-node triangle counts by degree-ordered orientation — each
  triangle generated exactly once at its minimum-rank apex, wedge
  fan-out bounded O(sqrt(2m)) per node; oracle = the naive
  canonical-triple join, so the hash pass proves the rewrite exact.
- q171: PageRank (3 fixed iterations) with ranks as exact int64
  micro-units — integer contributions, integer sums, rational
  damping — bit-identical across engines where float PageRank is
  partition-order-dependent; oracle unrolls the same iterations.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.hashstable import fmt_date
from ..operators.histogram import hist_rollup_report
from ..operators.incdedup import simhash_incremental_pairs
from ..operators.llmops import (
    duckdb_shift,
    simhash_fingerprints_long,
    simhash_hex_digits,
    simhash_sql_votes,
)
from ..operators.sketches import hll_rollup_windowed
from ..operators.topk import (
    topk_counts_to_rollup,
    topk_merge,
    topk_read,
    topk_rollup,
    topk_rollup_windowed,
)
from ..sources.tables import load_table


def _events_day(spark, sf):
    return load_table(spark, sf, "events").select(
        "event_type",
        fmt_date("ts", "day"),  # single point of truth w/ the strftime twins
        "user_id",
        "value",
    )


def q142_hist_rollup_report(spark, sf):
    return hist_rollup_report(
        _events_day(spark, sf),
        ["event_type"],
        "day",
        "value",
        lo=0.0,
        hi=500.0,
        n_bins=50,
        q=0.9,
    )


Q142_SQL = """
SELECT event_type,
       count(value) AS n_rows,
       TRUE AS count_preserved,
       TRUE AS rollup_eq_shard,
       TRUE AS rollup_eq_direct,
       TRUE AS q_in_band,
       TRUE AS grid_consistent
FROM events
GROUP BY event_type
"""


_M, _K = 8, 5


def q143_topk_certified(spark, sf):
    ev = _events_day(spark, sf)
    rollup = topk_rollup(ev, ["event_type"], "day", "user_id", m=_M)
    merged = topk_merge(rollup, ["event_type"])
    return topk_read(merged, ["event_type"], k=_K).select(
        "event_type", "item", "est", "upper", "rank", "certified"
    )


# The twin recomputes the identical lossy rollup: exact per-(type, day)
# counts, the m-cut with the same (count DESC, item ASC) tie-break,
# per-bucket tail bounds, merge with per-item hideable slack, and the
# read certificate.  SUMs cast to BIGINT (DuckDB HUGEINT reaches pandas
# as float64 otherwise — the dtype_audit class).
Q143_SQL = f"""
WITH c AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, user_id, count(*) AS n
  FROM events GROUP BY 1, 2, 3
), r AS (
  SELECT *, row_number() OVER (
    PARTITION BY event_type, day ORDER BY n DESC, user_id ASC) AS rn
  FROM c
), tb AS (
  SELECT event_type, day,
         coalesce(max(CASE WHEN rn > {_M} THEN n END), 0) AS tail_bound
  FROM r GROUP BY 1, 2
), slack AS (
  SELECT event_type, CAST(sum(tail_bound) AS BIGINT) AS total_slack
  FROM tb GROUP BY 1
), merged AS (
  SELECT k.event_type, k.user_id AS item,
         CAST(sum(k.n) AS BIGINT) AS est,
         CAST(sum(t.tail_bound) AS BIGINT) AS reported_tb
  FROM r k JOIN tb t ON k.event_type = t.event_type AND k.day = t.day
  WHERE k.rn <= {_M}
  GROUP BY 1, 2
), m2 AS (
  SELECT m.event_type, m.item, m.est,
         m.est + s.total_slack - m.reported_tb AS upper,
         s.total_slack
  FROM merged m JOIN slack s USING (event_type)
), ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY event_type ORDER BY est DESC, item ASC) AS rank
  FROM m2
), kth AS (
  SELECT event_type, min(est) AS kth_est, max(total_slack) AS slk
  FROM ranked WHERE rank <= {_K} GROUP BY 1
), outs AS (
  SELECT event_type, max(upper) AS best_out
  FROM ranked WHERE rank > {_K} GROUP BY 1
)
SELECT r.event_type, r.item, r.est, r.upper, r.rank,
       (k.kth_est > greatest(coalesce(o.best_out, 0), k.slk)) AS certified
FROM ranked r
JOIN kth k USING (event_type)
LEFT JOIN outs o USING (event_type)
WHERE r.rank <= {_K}
"""


def q144_hll_overlap(spark, sf):
    """Pairwise audience overlap via sketch inclusion–exclusion.

    Hash-gateable because every term is in the coupon-exact regime at
    every fixture sf: the largest pair union is the whole user
    population (1500 at sf0.1), under the measured lgk=14 exactness
    boundary of ~1609 (operators/sketches.py docstring) — so
    n_intersect equals the exact self-join answer and jaccard is the
    same two-integer IEEE division on both engines."""
    from ..operators.sketches import hll_overlap_estimates

    ev = load_table(spark, sf, "events").select("event_type", "user_id")
    return hll_overlap_estimates(ev, "event_type", "user_id", lgk=14)


Q144_SQL = """
WITH c AS (
  SELECT event_type, count(DISTINCT user_id) AS n FROM events GROUP BY 1
), u AS (
  SELECT DISTINCT event_type, user_id FROM events
), i AS (
  SELECT a.event_type AS la, b.event_type AS lb, count(*) AS n_i
  FROM u a JOIN u b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT ca.event_type AS label_a, cb.event_type AS label_b,
       ca.n AS n_a, cb.n AS n_b,
       ca.n + cb.n - coalesce(i.n_i, 0) AS n_union,
       coalesce(i.n_i, 0) AS n_intersect,
       CAST(coalesce(i.n_i, 0) AS DOUBLE)
         / (ca.n + cb.n - coalesce(i.n_i, 0)) AS jaccard
FROM c ca
JOIN c cb ON ca.event_type < cb.event_type
LEFT JOIN i ON i.la = ca.event_type AND i.lb = cb.event_type
"""


def s14_hll_windowed_stream(spark, sf):
    from ..streaming.core import run_to_memory, stream_events

    sdf = stream_events(spark, sf).select("event_type", "ts", "user_id")
    rollup = run_to_memory(
        hll_rollup_windowed(sdf, ["event_type"], "ts", "user_id", lgk=14),
        "s14_hll_windowed",
        n_state_partitions=8,
    )
    return rollup.select(
        "event_type",
        "bucket_start",
        F.hll_sketch_estimate("hll_sketch").alias("n_users"),
    )


# Append mode emits a day's sketch when the watermark passes the window
# END; the final no-data batch advances the watermark to max(ts), which
# is inside the last day — so exactly the closed days are present and
# the oracle excludes the final day.
S14_SQL = """
SELECT event_type,
       date_trunc('day', ts) AS bucket_start,
       count(DISTINCT user_id) AS n_users
FROM events
WHERE date_trunc('day', ts) < (SELECT date_trunc('day', max(ts)) FROM events)
GROUP BY 1, 2
"""

def s15_topk_windowed_stream(spark, sf):
    """Streaming-maintained top-k rollup (operators/topk.py): the
    stream keeps EXACT per-(type x day x user) counts (a standard
    windowed streaming aggregate, state bounded by open windows) and
    append mode emits each closed day's counts once; the lossy top-m
    cut + certified merge/read then run as a batch view over the
    emitted table — q143's pipeline with the count stage streamed.
    Oracle: Q143's SQL restricted to closed days (the s14 watermark
    argument: the final no-data batch advances the watermark into the
    last day, so exactly the earlier days' windows have flushed)."""
    from ..streaming.core import run_to_memory, stream_events

    sdf = stream_events(spark, sf).select("event_type", "ts", "user_id")
    counts = run_to_memory(
        topk_rollup_windowed(sdf, ["event_type"], "ts", "user_id"),
        "s15_topk_windowed",
        n_state_partitions=8,
    )
    # topk_merge self-joins the rollup; Spark's self-join attribute
    # dedup fails with INTERNAL_ERROR on a MemorySink view leaf, so
    # cut lineage on the (tiny: groups x days x items) emitted table.
    counts = counts.localCheckpoint(eager=True)
    rollup = topk_counts_to_rollup(counts, ["event_type"], "bucket_start", m=_M)
    merged = topk_merge(rollup, ["event_type"])
    return topk_read(merged, ["event_type"], k=_K).select(
        "event_type", "item", "est", "upper", "rank", "certified"
    )


# Q143's lossy-rollup twin verbatim, restricted to closed day windows
# (built by replacement so the two stay coupled; the assert pins it).
S15_SQL = Q143_SQL.replace(
    "FROM events GROUP BY 1, 2, 3",
    """FROM events
  WHERE date_trunc('day', ts)
        < (SELECT date_trunc('day', max(ts)) FROM events)
  GROUP BY 1, 2, 3""",
)
assert "WHERE date_trunc" in S15_SQL


_Q149_BOUND = 1000  # the q91d input bound (tiny-vocab band saturation)


def q149_incremental_simhash(spark, sf):
    """Incremental near-dup (operators/incdedup.py): the q137
    index-and-merge shape lifted to SIMILARITY dedup — an incoming
    shard fingerprinted and band-joined against the persisted SimHash
    index, emitting (shard x index) and (shard x shard) pairs only.
    Hash-gateable because SimHash banding has EXACT recall by
    pigeonhole (q91d's argument): the result equals the full-corpus
    q91d pair set restricted to pairs involving a shard doc, which is
    what the oracle computes.  Framing mirrors q137: ids below
    4/5 x max are the indexed corpus, the rest the incoming shard
    (split scalars ride a broadcast cross-join, never a collect)."""
    docs = load_table(spark, sf, "documents").filter(
        F.col("doc_id") < _Q149_BOUND
    )
    split = docs.agg(F.expr("(max(doc_id) * 4) div 5").alias("__s"))
    d = docs.crossJoin(F.broadcast(split))
    index_docs = d.filter(F.col("doc_id") < F.col("__s"))
    shard_docs = d.filter(F.col("doc_id") >= F.col("__s"))
    index_fps = simhash_fingerprints_long(index_docs)
    return simhash_incremental_pairs(index_fps, shard_docs, max_hamming=2)


def _q149_sql(n_bits: int = 32, max_hamming: int = 2) -> str:
    # the q91d per-bit SQL formulation with the pair set restricted to
    # shard-involving pairs (doc_b >= the 4/5 split; ids are ordered,
    # so any pair with a shard member has its b side in the shard)
    toks = (
        "list_filter(regexp_split_to_array(lower(text), '\\W+'),"
        " x -> x <> '')"
    )
    hex_cols = ",\n         ".join(simhash_hex_digits(n_bits))
    votes = simhash_sql_votes(n_bits, duckdb_shift)
    vote_cols = ",\n         ".join(
        f"{v} AS v{b}" for b, v in enumerate(votes)
    )
    fp = " || ".join(
        f"CASE WHEN v{b} > 0 THEN '1' ELSE '0' END" for b in range(n_bits)
    )
    ham = " + ".join(
        f"CASE WHEN substring(a.simhash, {i + 1}, 1) <> "
        f"substring(b.simhash, {i + 1}, 1) THEN 1 ELSE 0 END"
        for i in range(n_bits)
    )
    return f"""
WITH s AS (
  SELECT (max(doc_id) * 4) // 5 AS s_lo FROM documents
  WHERE doc_id < {_Q149_BOUND}
), toks AS (
  SELECT DISTINCT doc_id AS doc, unnest({toks}) AS tok FROM documents
  WHERE doc_id < {_Q149_BOUND}
), hexed AS (
  SELECT doc,
         {hex_cols}
  FROM toks
), voted AS (
  SELECT doc,
         {vote_cols}
  FROM hexed GROUP BY doc
), fps AS (
  SELECT doc, {fp} AS simhash FROM voted
)
SELECT doc_a, doc_b, hamming FROM (
  SELECT a.doc AS doc_a, b.doc AS doc_b,
         CAST({ham} AS INTEGER) AS hamming
  FROM fps a JOIN fps b ON a.doc < b.doc, s
  WHERE b.doc >= s.s_lo
)
WHERE hamming <= {max_hamming}
"""


Q149_SQL = _q149_sql()


def q152_mad_outliers(spark, sf):
    """Robust per-type outlier screen (operators/robust.py): lower
    median and MAD of the cents-fixed value column by explicit rank
    arithmetic (NO engine median()/quantile() call — interpolation
    conventions differ), integer 3-MAD outlier counts.  Every
    compared quantity is a BIGINT; the one division is over exact
    integers."""
    from ..operators.robust import mad_outlier_stats

    ev = load_table(spark, sf, "events")
    return mad_outlier_stats(
        ev, ["event_type"], "value", "event_id", k=3
    )


Q152_SQL = """
WITH c AS (
  SELECT event_type, event_id AS id,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events
), r1 AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY cents, id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM c
), med AS (
  SELECT event_type, cents AS med_cents FROM r1 WHERE rn = (n + 1) // 2
), d AS (
  SELECT c.event_type, c.id, m.med_cents,
         abs(c.cents - m.med_cents) AS dev
  FROM c JOIN med m ON c.event_type = m.event_type
), r2 AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY dev, id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM d
), mad AS (
  SELECT event_type, dev AS mad_cents FROM r2 WHERE rn = (n + 1) // 2
)
SELECT d.event_type,
       count(*) AS n_rows,
       max(d.med_cents) AS med_cents,
       max(t.mad_cents) AS mad_cents,
       CAST(SUM(CASE WHEN d.dev > 3 * t.mad_cents THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers,
       CAST(SUM(CASE WHEN d.dev > 3 * t.mad_cents THEN 1 ELSE 0 END)
            AS DOUBLE) / count(*) AS outlier_rate
FROM d JOIN mad t ON d.event_type = t.event_type
GROUP BY 1 ORDER BY 1
"""


def q170_triangle_counts(spark, sf):
    """Per-node triangle participation over the interaction graph
    (operators/graph.py): consecutive distinct users in each
    event_type's (ts, id)-ordered tape are linked; triangles counted
    by degree-ordered orientation — each triangle generated exactly
    once at its minimum-(deg, id) apex, wedge fan-out bounded by
    O(sqrt(2m)) per node instead of the naive triple join's
    sum(deg^2) hub explosion.  All exact integers; the oracle IS the
    naive canonical-triple join, so the hash pass proves the
    orientation rewrite exact."""
    from ..operators.graph import cooccurrence_edges, triangle_counts

    ev = load_table(spark, sf, "events")
    edges = cooccurrence_edges(ev, "event_type", "ts", "user_id", "event_id")
    return triangle_counts(edges).withColumnRenamed("node", "user_id")


_GRAPH_EDGE_SQL = """
seq AS (
  SELECT user_id AS b,
         lag(user_id) OVER (PARTITION BY event_type
                            ORDER BY ts, event_id) AS a
  FROM events
), e AS (
  SELECT DISTINCT least(a, b) AS src, greatest(a, b) AS dst
  FROM seq WHERE a IS NOT NULL AND a <> b
), deg AS (
  SELECT node, count(*) AS deg
  FROM (SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e)
  GROUP BY 1
)"""


Q170_SQL = f"""
WITH {_GRAPH_EDGE_SQL}, tri AS (
  SELECT e1.src AS u, e1.dst AS v, e2.dst AS w
  FROM e e1
  JOIN e e2 ON e2.src = e1.src AND e2.dst > e1.dst
  JOIN e e3 ON e3.src = e1.dst AND e3.dst = e2.dst
), votes AS (
  SELECT u AS node FROM tri
  UNION ALL SELECT v FROM tri
  UNION ALL SELECT w FROM tri
)
SELECT d.node AS user_id, d.deg,
       CAST(count(v.node) AS BIGINT) AS n_triangles
FROM deg d LEFT JOIN votes v ON d.node = v.node
GROUP BY 1, 2
"""


_PR_K, _PR_SCALE = 3, 1_000_000


def q171_pagerank(spark, sf):
    """PageRank, 3 fixed iterations over the same interaction graph
    (operators/graph.py pagerank_quantized) — hash-gateable because
    ranks are exact int64 micro-units: contributions are integer
    divisions, the neighbor sum is an integer sum (partition-order-
    independent where float PageRank never is), damping is the
    rational (85*s) div 100 + 150000.  The oracle unrolls the same
    three iterations with the same integer arithmetic."""
    from ..operators.graph import cooccurrence_edges, pagerank_quantized

    ev = load_table(spark, sf, "events")
    edges = cooccurrence_edges(ev, "event_type", "ts", "user_id", "event_id")
    return pagerank_quantized(edges, k=_PR_K, scale=_PR_SCALE).withColumnRenamed(
        "node", "user_id"
    )


def _q171_sql(k: int = _PR_K, scale: int = _PR_SCALE) -> str:
    base = 15 * scale // 100
    cte = [f"""adj AS (
  SELECT a.node, a.nbr, d.deg
  FROM (SELECT src AS node, dst AS nbr FROM e
        UNION ALL SELECT dst AS node, src AS nbr FROM e) a
  JOIN deg d ON a.node = d.node
), p0 AS (
  SELECT node, CAST({scale} AS BIGINT) AS pr FROM deg
)"""]
    for i in range(1, k + 1):
        cte.append(f"""c{i} AS (
  SELECT a.nbr AS node, CAST(SUM(p.pr // a.deg) AS BIGINT) AS s
  FROM adj a JOIN p{i - 1} p ON a.node = p.node
  GROUP BY 1
), p{i} AS (
  SELECT d.node,
         CAST(85 * COALESCE(c.s, 0) // 100 + {base} AS BIGINT) AS pr
  FROM deg d LEFT JOIN c{i} c ON d.node = c.node
)""")
    return (
        f"WITH {_GRAPH_EDGE_SQL}, "
        + ", ".join(cte)
        + f"""
SELECT d.node AS user_id, d.deg, p.pr AS pr_micro
FROM deg d JOIN p{k} p ON d.node = p.node
"""
    )


Q171_SQL = _q171_sql()


_Q172_GAP_S = 48 * 3600  # conversion window: 48 h per stage


def q172_funnel_within(spark, sf):
    """Time-constrained funnel (the MATCH_RECOGNIZE ``WITHIN`` clause;
    operators/funnel.py ``max_gap_s``): stage i+1 must land within 48 h
    of stage i or the user stalls — the conversion-window semantics
    every product funnel actually uses, which q77/q77b's unconstrained
    twins cannot express.  Gap chosen to BIND at every fixture sf
    (users stall who convert unconstrained), so the gate exercises the
    constraint, not just the fold.  Same fold formulation and format
    conventions as q77."""
    from ..operators.funnel import funnel_stages
    from ..sources.tables import load_table as _lt

    e = _lt(spark, sf, "events")
    res = funnel_stages(
        e, ("view", "click", "purchase"), bounded=True,
        max_gap_s=_Q172_GAP_S,
    )
    return res.select(
        "user_id",
        (
            F.col("t1").isNotNull().cast("int")
            + F.col("t2").isNotNull().cast("int")
            + F.col("t3").isNotNull().cast("int")
        ).alias("stage"),
        F.date_format("t1", "yyyy-MM-dd HH:mm:ss").alias("view_ts"),
        F.date_format("t2", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.date_format("t3", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
    )


Q172_SQL = f"""
WITH u AS (
  SELECT DISTINCT user_id FROM events
  WHERE event_type IN ('view', 'click', 'purchase')
), v AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY 1
), c AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > v.t1
    AND e.ts <= v.t1 + INTERVAL {_Q172_GAP_S} SECOND
  GROUP BY 1
), p AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.t2
    AND e.ts <= c.t2 + INTERVAL {_Q172_GAP_S} SECOND
  GROUP BY 1
)
SELECT u.user_id,
       (CASE WHEN t1 IS NULL THEN 0 ELSE 1 END
        + CASE WHEN t2 IS NULL THEN 0 ELSE 1 END
        + CASE WHEN t3 IS NULL THEN 0 ELSE 1 END) AS stage,
       strftime(t1, '%Y-%m-%d %H:%M:%S') AS view_ts,
       strftime(t2, '%Y-%m-%d %H:%M:%S') AS click_ts,
       strftime(t3, '%Y-%m-%d %H:%M:%S') AS purchase_ts
FROM u LEFT JOIN v USING (user_id) LEFT JOIN c USING (user_id)
       LEFT JOIN p USING (user_id)
"""


_STAGE_TOKS_B = (
    "list_filter(regexp_split_to_array(lower(text), '\\W+'), x -> x <> '')"
)


def q173_boolean_search(spark, sf):
    """Boolean retrieval over the positional index (operators/index.py
    boolean_search): docs containing 'part' AND 'filter' AND NOT
    'vector' — posting-set algebra, the capability between bag-of-
    words ranking (q96/q117) and positional phrases (q148).  Touches
    only the three queried terms' postings; the NOT set rides one
    broadcast anti-join.  'vector' BINDS at every fixture sf (~85% of
    the part-and-filter docs are excluded), so the gate exercises the
    exclusion path, not just the conjunction.  Hash-exact: the
    tokenizer is the shared q94-q96 oracle convention and every
    output is an integer."""
    from ..operators.index import boolean_search, positional_index
    from ..sources.tables import load_table as _lt

    docs = _lt(spark, sf, "documents").select("doc_id", "text")
    return boolean_search(
        positional_index(docs), ["part", "filter"], ["vector"]
    )


Q173_SQL = f"""
WITH docs AS (
  SELECT doc_id, {_STAGE_TOKS_B} AS arr FROM documents
), toks AS (
  SELECT doc_id, unnest(arr) AS tok FROM docs
), tf AS (
  SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2
), a AS (SELECT doc_id, tf FROM tf WHERE tok = 'part'),
b AS (SELECT doc_id, tf FROM tf WHERE tok = 'filter'),
x AS (SELECT DISTINCT doc_id FROM tf WHERE tok = 'vector')
SELECT a.doc_id,
       CAST(least(a.tf, b.tf) AS BIGINT) AS min_tf,
       CAST(a.tf + b.tf AS BIGINT) AS sum_tf
FROM a JOIN b USING (doc_id)
WHERE a.doc_id NOT IN (SELECT doc_id FROM x)
"""


STAGED_QUERIES = {
    "q142_hist_rollup_report": q142_hist_rollup_report,
    "q143_topk_certified": q143_topk_certified,
    "q144_hll_overlap": q144_hll_overlap,
    "q149_incremental_simhash": q149_incremental_simhash,
    "q152_mad_outliers": q152_mad_outliers,
    "q170_triangle_counts": q170_triangle_counts,
    "q172_funnel_within": q172_funnel_within,
    "q173_boolean_search": q173_boolean_search,
    "q171_pagerank": q171_pagerank,
    "s14_hll_windowed_stream": s14_hll_windowed_stream,
    "s15_topk_windowed_stream": s15_topk_windowed_stream,
}

STAGED_ORACLE = {
    "q142_hist_rollup_report": Q142_SQL,
    "q143_topk_certified": Q143_SQL,
    "q144_hll_overlap": Q144_SQL,
    "q149_incremental_simhash": Q149_SQL,
    "q152_mad_outliers": Q152_SQL,
    "q170_triangle_counts": Q170_SQL,
    "q172_funnel_within": Q172_SQL,
    "q173_boolean_search": Q173_SQL,
    "q171_pagerank": Q171_SQL,
    "s14_hll_windowed_stream": S14_SQL,
    "s15_topk_windowed_stream": S15_SQL,
}
