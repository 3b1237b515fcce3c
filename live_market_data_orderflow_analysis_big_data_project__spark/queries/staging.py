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

The round-10 rotation (docs/ROTATION_r10.md) promoted all 11 entries
staged at r9 close.  Staged during round 10 for the r11 window:

- q174: prefix-filtered set-similarity self-join (operators/
  setjoin.py) — exact threshold Jaccard over token SETS via the
  AllPairs/PPJoin frequency-ordered prefix filter, the lossless
  blocking member the near-dup family lacked (shingle equality /
  MinHash / SimHash / FastSS cover the other blocking classes).
  Oracle = the naive all-pairs token-set join: the hash pass proves
  the prefix filter loses nothing.
- q175: k-core peeling (operators/kcore.py) — fixed peeling rounds
  with all-integer state (the q171 unroll trick); rounds chosen to
  reach fixpoint at every fixture sf (pinned by test), so the result
  IS the true k-core while the oracle stays unrolled CTEs.
- q176: collocation lift (operators/collocations.py) — PMI's exact
  integer argument in ppm (log is monotone and a cross-engine ulp
  trap; the integer ranks identically and hash-gates).
- q177: interval x interval overlap join (operators/overlapjoin.py)
  — bin-decomposed equi-join emitting each overlapping pair once
  with exact int64-us overlap; oracle IS the naive non-equi join
  (DuckDB plans it as its native IEJoin).
- s18: streaming funnel (operators/funnel.py funnel_state_stream) —
  the MATCH_RECOGNIZE class made stateful: per-user constant-size
  stage-vector state via applyInPandasWithState, final emission ==
  the batch fold exactly, so the oracle is Q77's SQL verbatim (the
  s16 stream==batch equality pattern).
- q178: join-key skew diagnostics (operators/skew.py skew_report) —
  the measurement that picks the mitigation posture (broadcast / AQE
  split / salted_join) and sizes the salt: exact integer max/p99
  bucket, top-1 share ppm, x-mean skew factor; p99 rank-selected on
  the bucket-size histogram (provably O(sqrt(2 n_rows)) rows), never
  a global sort over the key frame.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sources.tables import load_table


_Q174_T = (7, 10)    # Jaccard threshold 0.7 as an exact rational
_Q174_NGRAM = 3      # shingle sets — token sets saturate (see setjoin.py)


def q174_setsim_join(spark, sf):
    """Prefix-filtered exact set-similarity self-join (operators/
    setjoin.py): all document pairs with 3-shingle-set Jaccard >= 0.7
    over the WHOLE corpus (no doc bound — the prefix filter is the
    scale path, and the oracle's candidate stage is shingle-equality
    blocking, tractable at every fixture sf).  The threshold is the
    exact rational 7/10 on BOTH engines (prefix length and acceptance
    test are integer arithmetic), so boundary pairs cannot flip;
    jaccard is the same two-integer IEEE division as the q91/q144
    convention.  The 0.7 bar BINDS: 12k/11.5k/1130k candidate pairs
    share a shingle at the three sfs, 28/25/256 pass."""
    from ..operators.setjoin import setsim_join

    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    return setsim_join(docs, *_Q174_T, ngram=_Q174_NGRAM)


_STAGE_TOKS_C = (
    "list_filter(regexp_split_to_array(lower(text), '\\W+'), x -> x <> '')"
)

Q174_SQL = f"""
WITH docs AS (
  SELECT doc_id AS doc, {_STAGE_TOKS_C} AS arr FROM documents
), toks AS (
  SELECT doc, unnest(arr) AS tok, generate_subscripts(arr, 1) AS pos
  FROM docs
), sh AS (
  SELECT DISTINCT a.doc, a.tok || ' ' || b.tok || ' ' || c.tok AS shingle
  FROM toks a
  JOIN toks b ON a.doc = b.doc AND b.pos = a.pos + 1
  JOIN toks c ON a.doc = c.doc AND c.pos = a.pos + 2
), sizes AS (
  SELECT doc, count(*) AS n FROM sh GROUP BY doc
), inter AS (
  SELECT a.doc AS doc_a, b.doc AS doc_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       CAST(sa.n AS BIGINT) AS n_a,
       CAST(sb.n AS BIGINT) AS n_b,
       CAST(n_inter AS BIGINT) AS n_inter,
       CAST(n_inter AS DOUBLE) / (sa.n + sb.n - n_inter) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc = doc_a
JOIN sizes sb ON sb.doc = doc_b
WHERE n_inter * ({_Q174_T[1]} + {_Q174_T[0]})
      >= {_Q174_T[0]} * (sa.n + sb.n)
"""


_Q175_K = 3       # peel threshold: binds on the daily graph at every sf
_Q175_ROUNDS = 6  # past the measured fixpoint depth (max 5 at sf0.1)
_Q175_DAY = "2024-01-01"


def q175_kcore(spark, sf):
    """k-core peeling (operators/kcore.py) over the DAILY interaction
    graph (one day's event tape — the full-period co-occurrence graph
    is near-complete and no k binds on it; the daily graph's degree
    distribution is scale-invariant because tape length and user count
    both scale with sf): 6 fixed peeling rounds at k=3 — past the
    measured fixpoint depth at every fixture sf (max 5; one-more-round
    stability pinned in tests), so in_core marks TRUE k-core
    membership while the oracle unrolls the same rounds as chained
    CTEs (the q171 fixed-iteration trick).  All integers; k=3 BINDS
    everywhere (peels 15/15, 27/134, 400/1338 nodes at the three
    sfs)."""
    from ..operators.graph import cooccurrence_edges
    from ..operators.kcore import kcore_peel

    ev = load_table(spark, sf, "events").filter(
        F.to_date("ts") == F.lit(_Q175_DAY)
    )
    edges = cooccurrence_edges(ev, "event_type", "ts", "user_id", "event_id")
    return kcore_peel(
        edges, k=_Q175_K, rounds=_Q175_ROUNDS
    ).withColumnRenamed("node", "user_id")


# the q170/q171 edge CTE restricted to the single day
# MATERIALIZED: the unrolled peel chain references each level several
# times; DuckDB inlines plain CTEs per reference, which compounds
# exponentially over 6 rounds (measured: thousands of parquet re-opens,
# "too many open files").  Materializing each level makes the oracle
# linear in rounds, like the engine side.
_Q175_EDGE_SQL = f"""
seq AS MATERIALIZED (
  SELECT user_id AS b,
         lag(user_id) OVER (PARTITION BY event_type
                            ORDER BY ts, event_id) AS a
  FROM events WHERE CAST(ts AS DATE) = DATE '{_Q175_DAY}'
), e AS MATERIALIZED (
  SELECT DISTINCT least(a, b) AS src, greatest(a, b) AS dst
  FROM seq WHERE a IS NOT NULL AND a <> b
), deg AS MATERIALIZED (
  SELECT node, count(*) AS deg
  FROM (SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e)
  GROUP BY 1
)"""


def _q175_sql(k: int = _Q175_K, rounds: int = _Q175_ROUNDS) -> str:
    cte = ["e0 AS MATERIALIZED (SELECT src, dst FROM e)"]
    for i in range(1, rounds + 1):
        cte.append(f"""d{i} AS MATERIALIZED (
  SELECT node, count(*) AS deg FROM (
    SELECT src AS node FROM e{i - 1}
    UNION ALL SELECT dst AS node FROM e{i - 1}
  ) GROUP BY 1
), k{i} AS MATERIALIZED (
  SELECT node FROM d{i} WHERE deg >= {k}
), e{i} AS MATERIALIZED (
  SELECT p.src, p.dst FROM e{i - 1} p
  JOIN k{i} a ON p.src = a.node
  JOIN k{i} b ON p.dst = b.node
)""")
    return (
        f"WITH {_Q175_EDGE_SQL}, "
        + ", ".join(cte)
        + f""", dfinal AS (
  SELECT node, count(*) AS deg FROM (
    SELECT src AS node FROM e{rounds}
    UNION ALL SELECT dst AS node FROM e{rounds}
  ) GROUP BY 1
)
SELECT d.node AS user_id, d.deg,
       (f.node IS NOT NULL) AS in_core,
       CAST(coalesce(f.deg, 0) AS BIGINT) AS core_deg
FROM deg d LEFT JOIN dfinal f ON d.node = f.node
"""
    )


Q175_SQL = _q175_sql()


_Q176_MIN_COUNT = 5


def q176_collocations(spark, sf):
    """Collocation lift over adjacent token bigrams (operators/
    collocations.py): lift_ppm = n_ab * N * 1e6 div (n_a * n_b) —
    PMI's exact integer argument (log is monotone), every output
    an int64."""
    from ..operators.collocations import collocation_lift

    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    return collocation_lift(docs, min_count=_Q176_MIN_COUNT)


Q176_SQL = f"""
WITH docs AS (
  SELECT doc_id AS doc, {_STAGE_TOKS_C} AS arr FROM documents
), toks AS (
  SELECT doc, unnest(arr) AS tok, generate_subscripts(arr, 1) AS pos
  FROM docs
), bg AS (
  SELECT a.tok AS tok_a, b.tok AS tok_b, count(*) AS n_ab
  FROM toks a JOIN toks b ON a.doc = b.doc AND b.pos = a.pos + 1
  GROUP BY 1, 2
), l AS (
  SELECT tok_a, CAST(sum(n_ab) AS BIGINT) AS n_a FROM bg GROUP BY 1
), r AS (
  SELECT tok_b, CAST(sum(n_ab) AS BIGINT) AS n_b FROM bg GROUP BY 1
), t AS (
  SELECT CAST(sum(n_ab) AS BIGINT) AS nn FROM bg
)
SELECT tok_a, tok_b,
       CAST(n_ab AS BIGINT) AS n_ab,
       n_a, n_b,
       CAST((CAST(n_ab AS BIGINT) * nn * 1000000) // (n_a * n_b)
            AS BIGINT) AS lift_ppm
FROM bg JOIN l USING (tok_a) JOIN r USING (tok_b), t
WHERE n_ab >= {_Q176_MIN_COUNT}
"""


_Q177_BIN_S = 3600


def q177_interval_overlap(spark, sf):
    """Interval x interval overlap join (operators/overlapjoin.py):
    per-(user, day) activity spans joined to per-(event_type, hour)
    activity windows, each overlapping pair once with its exact
    int64-us overlap.  The discriminating term is the overlap
    PREDICATE itself — a pair joins only where the user's span covers
    part of that hour window, so the output is a small fraction of
    the span x window cross product at every sf (pinned in
    tests/test_overlapjoin.py).  The engine side is the bin-decomposed
    equi-join; the oracle is the naive non-equi join (DuckDB plans it
    as its native IEJoin)."""
    from ..operators.overlapjoin import interval_overlap_binned

    ev = load_table(spark, sf, "events")
    spans = ev.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
    spans = spans.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "lo",
        "hi",
    )
    windows = (
        ev.groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
        .select(
            "event_type",
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "lo",
            "hi",
        )
    )
    return interval_overlap_binned(
        spans,
        windows,
        left_keys=("user_id", "day"),
        right_keys=("event_type", "hour"),
        bin_seconds=_Q177_BIN_S,
    )


Q177_SQL = """
WITH spans AS (
  SELECT user_id, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
         min(ts) AS lo, max(ts) AS hi
  FROM events GROUP BY 1, 2
), wins AS (
  SELECT event_type,
         strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
         min(ts) AS lo, max(ts) AS hi
  FROM events GROUP BY 1, date_trunc('hour', ts)
)
SELECT s.user_id AS l_user_id, s.day AS l_day,
       w.event_type AS r_event_type, w.hour AS r_hour,
       CAST(epoch_us(least(s.hi, w.hi)) - epoch_us(greatest(s.lo, w.lo))
            AS BIGINT) AS overlap_us
FROM spans s JOIN wins w
  ON s.lo <= w.hi AND w.lo <= s.hi
"""


def s18_funnel_stream(spark, sf):
    """Streaming funnel twin of q77 (operators/funnel.py
    funnel_state_stream): per-user stage-vector state updated per
    micro-batch; each user's most-advanced emission (max stage; ties
    are identical rows) equals the batch fold exactly, so the oracle
    is Q77's SQL VERBATIM — stream==batch equality, no window-closure
    restriction (the s16 pattern for the MATCH_RECOGNIZE class)."""
    from pyspark.sql import Window

    from ..operators.funnel import funnel_state_stream
    from ..streaming.core import run_to_memory, stream_events

    sdf = stream_events(spark, sf).select("user_id", "ts", "event_type")
    em = run_to_memory(
        funnel_state_stream(sdf, ("view", "click", "purchase")),
        "s18_funnel",
        output_mode="update",
        n_state_partitions=8,
    )
    # tiny per-user emission table; cut lineage before the window
    # (the s15/s16 MemorySink self-reference lesson)
    em = em.localCheckpoint(eager=True).dropDuplicates()
    ts_cols = [
        F.when(
            F.col(f"t{i}_us") >= 0, F.timestamp_micros(F.col(f"t{i}_us"))
        ).alias(f"t{i}")
        for i in (1, 2, 3)
    ]
    full = em.select("user_id", *ts_cols)
    stage = (
        F.col("t1").isNotNull().cast("int")
        + F.col("t2").isNotNull().cast("int")
        + F.col("t3").isNotNull().cast("int")
    )
    latest = (
        full.withColumn("stage", stage)
        .withColumn(
            "_rk",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(F.desc("stage"))
            ),
        )
        .where(F.col("_rk") == 1)
    )
    return latest.select(
        "user_id",
        "stage",
        F.date_format("t1", "yyyy-MM-dd HH:mm:ss").alias("view_ts"),
        F.date_format("t2", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.date_format("t3", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
    )


# stream==batch equality: the oracle is q77's cascaded-min SQL verbatim
from .eblock import Q77_SQL as S18_SQL  # noqa: E402


def q178_skew_report(spark, sf):
    """Join-key skew diagnostics (operators/skew.py skew_report) over
    three join keys of different shape: events by user_id (many keys,
    near-uniform), events by event_type (5 keys, near-uniform),
    lineitem by l_orderkey (1-7-row buckets).  Every output an exact
    int64 (counts, rank-selected p99, integer-ppm share, ceil-div
    skew factor) — the q161/q152 integer-selection conventions
    applied to the operational question that sizes salted_join."""
    from ..operators.skew import skew_report

    ev = load_table(spark, sf, "events")
    li = load_table(spark, sf, "lineitem")
    return (
        skew_report(ev, "user_id")
        .unionByName(skew_report(ev, "event_type"))
        .unionByName(skew_report(li, "l_orderkey"))
    )


def _q178_one(table: str, key: str) -> str:
    return f"""
SELECT '{key}' AS keyset,
       a.n_rows, a.n_keys, a.max_bucket, p.p99_bucket,
       CAST(a.max_bucket * 1000000 // a.n_rows AS BIGINT)
         AS top1_share_ppm,
       CAST((a.max_bucket * a.n_keys + a.n_rows - 1) // a.n_rows
            AS BIGINT) AS skew_factor
FROM (
  SELECT CAST(sum(n) AS BIGINT) AS n_rows,
         CAST(count(*) AS BIGINT) AS n_keys,
         CAST(max(n) AS BIGINT) AS max_bucket
  FROM (SELECT {key}, count(*) AS n FROM {table} GROUP BY 1)
) a, (
  SELECT CAST(min(n) AS BIGINT) AS p99_bucket
  FROM (
    SELECT n, sum(k) OVER (ORDER BY n) AS cum, sum(k) OVER () AS nk
    FROM (SELECT n, count(*) AS k
          FROM (SELECT {key}, count(*) AS n FROM {table} GROUP BY 1)
          GROUP BY 1)
  ) WHERE cum >= (99 * nk + 99) // 100
) p
"""


Q178_SQL = (
    _q178_one("events", "user_id")
    + " UNION ALL "
    + _q178_one("events", "event_type")
    + " UNION ALL "
    + _q178_one("lineitem", "l_orderkey")
)


STAGED_QUERIES = {
    "q174_setsim_join": q174_setsim_join,
    "q175_kcore": q175_kcore,
    "q176_collocations": q176_collocations,
    "q177_interval_overlap": q177_interval_overlap,
    "s18_funnel_stream": s18_funnel_stream,
    "q178_skew_report": q178_skew_report,
}

STAGED_ORACLE = {
    "q174_setsim_join": Q174_SQL,
    "q175_kcore": Q175_SQL,
    "q176_collocations": Q176_SQL,
    "q177_interval_overlap": Q177_SQL,
    "s18_funnel_stream": S18_SQL,
    "q178_skew_report": Q178_SQL,
}
