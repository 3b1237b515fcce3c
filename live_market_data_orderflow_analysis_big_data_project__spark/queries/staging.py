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

The round-11 rotation (docs/ROTATION_r11.md) promoted all 6 entries
staged at r10 close (q174 set-similarity join, q175 k-core, q176
collocation lift, q177 interval overlap join, s18 streaming funnel,
q178 skew diagnostics).  Staged during round 11 for the r12 window
(the r10 verdict's suggested cohort; its 4th suggestion — a
stream-side interp twin for q150 — already exists: s17 emits
``interp_sum``, so the streaming slot goes to the quantile rollup
that completes the streaming sketch family instead):

- q179: grouped-agg pandas UDF (functions/pandasudfs.py
  ``lower_median_cents``) — the one Python-UDF matrix cell q80-q84
  leave uncovered (Series -> scalar inside ``groupBy().agg()``).
  Exact int64 lower median computed in numpy, so the API proof still
  hash-gates against the SQL rank-selection twin.
- q180: mergeable rank-spaced quantile summary rollup
  (operators/quantsketch.py) — the KLL/MRL capability slot with a
  DETERMINISTIC compaction (values at ranks ceil(i*n_b/k)), so the
  estimate itself hash-gates (KLL's coin flips and GK's
  order-dependent tuples never can); per-group report audits the
  merged read against exact ranks with the closed-form error bound
  SUM_b(ceil(n_b/k) - 1).
- q181: deterministic weighted sampling without replacement
  (operators/sampling.py ``weighted_sample_race``) — the
  Efraimidis-Spirakis A-ES law realized exactly in integers: w
  tickets per item, md5 ticket keys, rank by minimum ticket (min of
  w uniforms ~ the u^(1/w) race, distributionally identical), no
  transcendental floats anywhere.
- s19: streaming quantile rollup — the stream maintains the
  per-(type x day) VALUE HISTOGRAM (windowed count agg, append emits
  closed days), the summary/read/audit stay a batch view over the
  emitted table (the s17 production split); oracle = Q180 restricted
  to closed days (the s14/s17 watermark-closure argument).
- q182: proximity retrieval (operators/index.py
  ``proximity_search``) — the NEAR/k query class between q148's
  exact phrase (adjacency) and q173's boolean AND (whole-document):
  occurrence pairs of two terms within k token positions, counted
  per doc with the closest distance.  Pure position algebra on two
  posting lists; k=5 BINDS at every fixture sf (188/186/1691 of the
  322/321/3098-doc AND sets qualify).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sources.tables import load_table

_CENTS = "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"


def q179_grouped_agg_pandas(spark, sf):
    """Grouped-agg pandas UDF surface proof (functions/pandasudfs.py
    lower_median_cents): per-user exact lower median of event value
    cents via a Series->scalar UDF in groupBy().agg().  Hash-gateable
    because numpy's int64 sort + index (n-1)//2 is the same exact
    rank selection as the oracle's window arithmetic (the q82 pattern
    at the grouped-AGG cell).  The q82 parallelism lesson applies
    verbatim: AQE sizes the exchange by shuffle BYTES and would
    coalesce this small frame onto one Python worker, so the grouped
    exchange is repartitioned at cluster width explicitly."""
    from ..functions.pandasudfs import lower_median_cents

    ev = load_table(spark, sf, "events").where(F.col("value").isNotNull())
    width = spark.sparkContext.defaultParallelism
    return (
        ev.select("user_id", F.expr(_CENTS).alias("cents"))
        .repartition(width, "user_id")
        .groupBy("user_id")
        .agg(lower_median_cents("cents").alias("med_cents"))
    )


Q179_SQL = f"""
WITH c AS (
  SELECT user_id, {_CENTS} AS cents
  FROM events WHERE value IS NOT NULL
), r AS (
  SELECT user_id, cents,
         row_number() OVER (PARTITION BY user_id ORDER BY cents) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM c
)
SELECT user_id, cents AS med_cents FROM r WHERE rn = (n + 1) // 2
"""


_Q180_K = 4
_Q180_QS = {"p50": (1, 2), "p90": (9, 10)}


def q180_quantile_rollup(spark, sf):
    """Mergeable rank-spaced quantile summary rollup
    (operators/quantsketch.py): per-(event_type x day) summaries of
    value cents at k=4 (the knob chosen so the compaction BINDS at
    the smallest fixture — day buckets hold ~7 rows at sf0.001, so
    n_summary < n_rows and err_bound > 0 at EVERY sf; deployment ks
    are 64-512, the gate proves the arithmetic not the accuracy
    ceiling), merged across days, read at p50/p90 and
    audited against the exact ranks — est/exact/err all exact int64,
    err <= the closed-form merge bound SUM_b(ceil(n_b/k) - 1) (the
    audit booleans are theorems, not tolerances).  Deterministic
    compaction = full hash gate; see the module docstring for why
    KLL/GK never can."""
    from ..operators.quantsketch import (
        quantile_report,
        spaced_summary,
        value_histogram,
    )

    ev = load_table(spark, sf, "events").where(F.col("value").isNotNull())
    base = ev.select(
        "event_type",
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd")
        .alias("day"),
        F.expr(_CENTS).alias("cents"),
    )
    hist = value_histogram(base, ["event_type"], "day", "cents")
    summ = spaced_summary(hist, ["event_type"], "day", "cents", _Q180_K)
    return quantile_report(
        hist, summ, ["event_type"], "day", "cents", _Q180_K, _Q180_QS
    )


def _q180_sql(where_extra: str = "") -> str:
    k = _Q180_K
    parts = [f"""
WITH c AS (
  SELECT event_type AS g,
         strftime(date_trunc('day', ts), '%Y-%m-%d') AS b,
         {_CENTS} AS v
  FROM events WHERE value IS NOT NULL{where_extra}
), hist AS (
  SELECT g, b, v, CAST(count(*) AS BIGINT) AS n FROM c GROUP BY 1, 2, 3
), hb AS (
  SELECT g, b, v, n,
         CAST(sum(n) OVER (PARTITION BY g, b ORDER BY v
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         CAST(sum(n) OVER (PARTITION BY g, b) AS BIGINT) AS nb
  FROM hist
), sw AS (
  SELECT g, v,
         ((i2 * nb + {k} - 1) // {k})
           - ((i1 * nb + {k} - 1) // {k}) AS w
  FROM (
    SELECT g, v, nb,
           (cum * {k}) // nb AS i2,
           ((cum - n) * {k}) // nb AS i1
    FROM hb
  ) WHERE i2 > i1
), nsum AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n_summary FROM sw GROUP BY 1
), pb AS (
  SELECT g, b, CAST(sum(n) AS BIGINT) AS nb FROM hist GROUP BY 1, 2
), tot AS (
  SELECT g, CAST(sum(nb) AS BIGINT) AS n_rows,
         CAST(count(*) AS BIGINT) AS n_buckets,
         CAST(sum((nb + {k} - 1) // {k} - 1) AS BIGINT) AS err_bound
  FROM pb GROUP BY 1
), mc AS (
  SELECT g, v, CAST(sum(mw) OVER (PARTITION BY g ORDER BY v
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw
  FROM (SELECT g, v, sum(w) AS mw FROM sw GROUP BY 1, 2)
), fc AS (
  SELECT g, v, CAST(fcn AS BIGINT) AS fcn,
         CAST(sum(fcn) OVER (PARTITION BY g ORDER BY v
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
  FROM (SELECT g, v, sum(n) AS fcn FROM hist GROUP BY 1, 2)
)"""]
    sel = ["tot.g AS event_type", "n_rows", "n_buckets", "n_summary",
           "err_bound"]
    joins = ["tot JOIN nsum USING (g)"]
    for name, (num, den) in _Q180_QS.items():
        parts.append(f""", t_{name} AS (
  SELECT g, CAST(({num} * n_rows + {den} - 1) // {den} AS BIGINT) AS t
  FROM tot
), est_{name} AS (
  SELECT mc.g, min(v) AS est FROM mc JOIN t_{name} USING (g)
  WHERE cw >= t GROUP BY 1
), ex_{name} AS (
  SELECT fc.g, min(v) AS exact FROM fc JOIN t_{name} USING (g)
  WHERE cum >= t GROUP BY 1
), er_{name} AS (
  SELECT fc.g,
         CAST(greatest(0, (cum - fcn + 1) - tq.t, tq.t - cum) AS BIGINT) AS err
  FROM fc JOIN est_{name} e ON fc.g = e.g AND fc.v = e.est
  JOIN t_{name} tq ON fc.g = tq.g
)""")
        sel += [f"est_{name}.est AS est_{name}",
                f"ex_{name}.exact AS exact_{name}",
                f"er_{name}.err AS err_{name}",
                f"er_{name}.err <= err_bound AS {name}_ok"]
        joins.append(
            f"JOIN est_{name} ON tot.g = est_{name}.g "
            f"JOIN ex_{name} ON tot.g = ex_{name}.g "
            f"JOIN er_{name} ON tot.g = er_{name}.g"
        )
    return (
        "".join(parts)
        + "\nSELECT " + ",\n       ".join(sel)
        + "\nFROM " + " ".join(joins)
    )


Q180_SQL = _q180_sql()


_Q181_N = 10


def q181_weighted_sample(spark, sf):
    """Deterministic weighted sampling without replacement
    (operators/sampling.py weighted_sample_race): 10 documents per
    language, inclusion following the A-ES u^(1/w) law with weight =
    512-char chunk count — realized as the exact-integer ticket race
    (min-of-w md5 keys), so the oracle recomputes the identical
    sample and the gate is a full hash pass (no RNG, no
    transcendental floats — the q147 reproducibility contract
    extended from systematic PPS to the reservoir law)."""
    from ..operators.sampling import weighted_sample_race

    docs = (
        load_table(spark, sf, "documents")
        .select("doc_id", "lang", "n_chars")
        .where(F.col("n_chars").isNotNull() & (F.col("n_chars") > 0))
    )
    wdf = docs.select(
        "doc_id", "lang", F.expr("(n_chars + 511) div 512").alias("w")
    )
    out = weighted_sample_race(wdf, ["lang"], "w", _Q181_N, "doc_id")
    return out.select(
        "lang", "doc_id", "weight", F.col("rank").alias("sample_rank")
    )


Q181_SQL = f"""
WITH b AS (
  SELECT doc_id, lang, CAST((n_chars + 511) // 512 AS BIGINT) AS weight
  FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0
), t AS (
  SELECT doc_id, lang, weight,
         unnest(generate_series(1, CAST(weight AS INT))) AS tick
  FROM b
), k AS (
  SELECT doc_id, lang, weight,
         min(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(tick AS VARCHAR)))
           AS mk
  FROM t GROUP BY 1, 2, 3
), r AS (
  SELECT lang, doc_id, weight,
         row_number() OVER (PARTITION BY lang ORDER BY mk, doc_id) AS rn
  FROM k
)
SELECT lang, doc_id, weight, CAST(rn AS BIGINT) AS sample_rank
FROM r WHERE rn <= {_Q181_N}
"""


def s19_quantile_stream(spark, sf):
    """Streaming twin of q180 — the streaming sketch family's
    quantile member (s14 HLL distincts, s15 top-k, s19 quantiles):
    the stream maintains the per-(type x day) VALUE HISTOGRAM
    (windowed count agg — the data-sized reduction; state per open
    (type, day, cents) is one count), append emits each day's
    histogram once when it closes, and the mergeable summary +
    p50/p90 read + exactness audit run as a batch view over the
    emitted table (the s17 production split).  Oracle: Q180
    restricted to closed days (watermark 0 + the final no-data batch
    advance to max(ts) — the s14/s17 closure argument)."""
    from ..operators.quantsketch import (
        quantile_report,
        spaced_summary,
        value_histogram_windowed,
    )
    from ..streaming.core import run_to_memory, stream_events

    sdf = stream_events(spark, sf).select("event_type", "ts", "value")
    sdf = sdf.where(F.col("value").isNotNull()).select(
        "event_type", "ts", F.expr(_CENTS).alias("cents")
    )
    hist = run_to_memory(
        value_histogram_windowed(
            sdf, ["event_type"], "ts", "cents", bucket="day"
        ),
        "s19_quanthist",
        n_state_partitions=8,
    )
    hist = hist.localCheckpoint(eager=True)  # the s15 lineage cut
    summ = spaced_summary(hist, ["event_type"], "day", "cents", _Q180_K)
    return quantile_report(
        hist, summ, ["event_type"], "day", "cents", _Q180_K, _Q180_QS
    )


# Q180's twin restricted to closed day windows (built by the same
# splice discipline as S17; the assert pins the splice point).  The
# splice's max(ts) is scoped to `value IS NOT NULL` because the STREAM
# filters NULL values BEFORE the watermark attaches (unlike s17, whose
# NULL rows ride through to the windowed sum) — so only non-null-value
# rows advance the watermark, and a fixture whose globally-latest
# events all carry NULL value would close fewer days than an unscoped
# max(ts) claims (the r11 ADVICE finding).
S19_SQL = _q180_sql(
    where_extra="""
    AND date_trunc('day', ts)
        < (SELECT date_trunc('day', max(ts)) FROM events
           WHERE value IS NOT NULL)"""
)
assert "AND date_trunc('day', ts)" in S19_SQL


_Q182_K = 5


def q182_proximity_search(spark, sf):
    """Proximity retrieval (operators/index.py proximity_search):
    docs with 'part' within 5 token positions of 'filter' — counted
    occurrence pairs + closest distance, the NEAR/k class between
    exact phrases (q148) and whole-document booleans (q173).
    Hash-exact: the shared q94-q96 tokenizer, 1-based positions
    (generate_subscripts parity), every output an integer.  The k=5
    gate BINDS at every sf: 188/186/1691 qualifying docs out of
    322/321/3098 containing both terms."""
    from ..operators.index import positional_index, proximity_search

    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    return proximity_search(
        positional_index(docs), "part", "filter", _Q182_K
    )


_STAGE_TOKS = (
    "list_filter(regexp_split_to_array(lower(text), '\\W+'), x -> x <> '')"
)

Q182_SQL = f"""
WITH docs AS (
  SELECT doc_id, {_STAGE_TOKS} AS arr FROM documents
), toks AS (
  SELECT doc_id, unnest(arr) AS tok, generate_subscripts(arr, 1) AS pos
  FROM docs
), a AS (SELECT doc_id, pos FROM toks WHERE tok = 'part'),
b AS (SELECT doc_id, pos FROM toks WHERE tok = 'filter'),
pairs AS (
  SELECT a.doc_id, abs(a.pos - b.pos) AS d
  FROM a JOIN b USING (doc_id)
  WHERE abs(a.pos - b.pos) <= {_Q182_K}
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(min(d) AS BIGINT) AS min_dist
FROM pairs GROUP BY 1
"""


STAGED_QUERIES = {
    "q179_grouped_agg_pandas": q179_grouped_agg_pandas,
    "q180_quantile_rollup": q180_quantile_rollup,
    "q181_weighted_sample": q181_weighted_sample,
    "s19_quantile_stream": s19_quantile_stream,
    "q182_proximity_search": q182_proximity_search,
}

STAGED_ORACLE = {
    "q179_grouped_agg_pandas": Q179_SQL,
    "q180_quantile_rollup": Q180_SQL,
    "q181_weighted_sample": Q181_SQL,
    "s19_quantile_stream": S19_SQL,
    "q182_proximity_search": Q182_SQL,
}
