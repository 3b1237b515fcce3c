"""E-block — general relational surface (SURVEY.md section 2.3).

The reference has no joins, window functions, or set ops (SURVEY.md
section 2.2: single-stream topology), so this block is the engine's
generalization to a full relational surface.  Scale posture per query:

- small dims (region/nation/part/bands) are explicitly ``F.broadcast``-ed;
  big-big joins shuffle on their keys and rely on AQE skew handling
  (session.py confs).
- the as-of join (q25) uses operators/asof.py's union+window strategy:
  ONE shuffle on the join key, no range cross-join — the formulation that
  survives 100 TB inputs.
- window functions always partition by a key (never a global window) and
  carry total-order tie-breaks so results are deterministic.
- hash-stability conventions from functions/hashstable.py: decimal-backed
  sums, formatted timestamps, ROUND(...,4) only on irrational outputs.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import dsum, fmt_date, fmt_minute, fmt_ts, round4
from ..operators.asof import asof_join
from ..operators.candles import rollup_ohlc
from ..operators.funnel import funnel_stages
from ..operators.warehouse import scd2_merge
from ..sources.bucketed import read_bucketed, write_bucketed
from ..sources.tables import load_table, register_views

_DEC = "decimal(28,6)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _sf_token(sf_dir: str) -> str:
    """Catalog/path-safe token derived from the sf dir (``sf0.1`` →
    ``sf0_1``) so per-sf artifacts can't collide."""
    base = os.path.basename(os.path.normpath(sf_dir))
    return "".join(c if c.isalnum() else "_" for c in base) or "sf"


def _revenue() -> F.Column:
    """Exact decimal revenue l_extendedprice * (1 - l_discount) (q04 twin)."""
    ep = F.col("l_extendedprice").cast("decimal(12,4)")
    dc = F.col("l_discount").cast("decimal(12,4)")
    return ep * (F.lit(1).cast("decimal(12,4)") - dc)


# =========================================================================
# Joins q20-q26
# =========================================================================


# --- q20: equi hash join orders ⋈ customer --------------------------------
# Big-big equi join: shuffles both sides on the key; AQE handles skew.
# hint("merge") pins sort-merge for the fact-fact join: Catalyst's
# column-pruned size estimates can fall under the broadcast threshold on
# replicated data and broadcast a fact side — fine at sf0.1, driver-fatal
# at 100 TB (measured super-linear in tools/scale_probe.py before the
# hint).  The hint encodes the intended physical plan; AQE still splits
# skewed partitions inside the SMJ.
def q20_join_inner(spark, sf):
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    return o.join(c.hint("merge"), o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "c_custkey", "c_name", "c_mktsegment", "o_totalprice"
    )


Q20_SQL = """
SELECT o_orderkey, c_custkey, c_name, c_mktsegment, o_totalprice
FROM orders JOIN customer ON o_custkey = c_custkey
"""


# --- q21: broadcast join lineitem ⋈ part (small dim) -----------------------
# part is a dimension table: broadcast it so the fact side never shuffles.
def q21_join_broadcast(spark, sf):
    li = _t(spark, sf, "lineitem")
    p = _t(spark, sf, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(_revenue().cast(_DEC)).cast("double").alias("revenue"),
        )
    )


Q21_SQL = """
SELECT p_brand, count(*) AS n_items,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,4))
                     * (1 - CAST(l_discount AS DECIMAL(12,4)))
                AS DECIMAL(28,6))) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


# --- q22: outer join customer ⟕ orders -------------------------------------
def q22_join_outer(spark, sf):
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


Q22_SQL = """
SELECT c_custkey, c_name, o_orderkey, o_totalprice
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
"""


# --- q23: semi + anti joins (customers with / without orders) --------------
def q23_join_semi_anti(spark, sf):
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    semi = (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .withColumn("status", F.lit("has_orders"))
    )
    anti = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .withColumn("status", F.lit("no_orders"))
    )
    return semi.unionByName(anti)


Q23_SQL = """
SELECT c_custkey, c_name, 'has_orders' AS status FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
UNION ALL
SELECT c_custkey, c_name, 'no_orders' AS status FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


# --- q24: non-equi range join events × value-band dim ----------------------
# The band dim is tiny and driver-side literal: broadcast nested-loop join
# is the correct physical plan (a shuffle range join would be wasteful).
# Built via SQL VALUES so it is a JVM LocalRelation — createDataFrame over a
# Python list compiles to applySchemaToPythonRDD, which drags Python worker
# startup into the broadcast build (measured 11s vs 0.8s at sf0.01).
_BANDS_SQL = """
SELECT * FROM VALUES
  ('low', -1e18, 50.0), ('mid', 50.0, 100.0),
  ('high', 100.0, 150.0), ('vip', 150.0, 1e18) AS t(band, lo, hi)
"""


def q24_join_range_theta(spark, sf):
    e = _t(spark, sf, "events")
    bands = spark.sql(_BANDS_SQL)
    cond = (e.value >= bands.lo) & (e.value < bands.hi)
    return e.join(F.broadcast(bands), cond, "inner").select(
        "event_id", "value", "band"
    )


Q24_SQL = """
WITH bands(band, lo, hi) AS (
  VALUES ('low', -1e18, 50.0), ('mid', 50.0, 100.0),
         ('high', 100.0, 150.0), ('vip', 150.0, 1e18)
)
SELECT event_id, value, band
FROM events JOIN bands ON value >= lo AND value < hi
"""


# --- q25: as-of join — latest order at-or-before each event ----------------
# Spark has no native ASOF JOIN (SURVEY.md section 4.2 item 1); the
# operators/asof.py union+window strategy is one shuffle on the key.  The
# right side is pre-deduped to one row per (customer, date) so the match is
# deterministic on both engines (DuckDB ASOF breaks ties arbitrarily).
def q25_join_asof(spark, sf):
    e = _t(spark, sf, "events").select("event_id", "user_id", "ts")
    r = (
        _t(spark, sf, "orders")
        .groupBy(F.col("o_custkey").alias("user_id"), "o_orderdate")
        .agg(F.max("o_totalprice").alias("last_order_price"))
    )
    out = asof_join(
        e,
        r,
        on="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        right_cols=["o_orderdate", "last_order_price"],
    )
    return out.select(
        "event_id",
        "user_id",
        fmt_date(F.col("o_orderdate"), "last_order_date"),
        "last_order_price",
    )


Q25_SQL = """
WITH r AS (
  SELECT o_custkey AS user_id, o_orderdate,
         max(o_totalprice) AS last_order_price
  FROM orders GROUP BY 1, 2
)
SELECT e.event_id, e.user_id,
       strftime(r.o_orderdate, '%Y-%m-%d') AS last_order_date,
       r.last_order_price
FROM events e ASOF LEFT JOIN r
  ON e.user_id = r.user_id AND e.ts >= r.o_orderdate
"""


# --- q26: multiway join chain (TPC-H Q5 shape) -----------------------------
# region→nation are broadcast dims; customer⋈orders⋈lineitem shuffle on
# their keys.  The fact joins carry explicit hint("merge"): without it,
# Catalyst's pruned-size estimates under-count the facts and broadcast
# them (tools/scale_probe.py measured 46.9x wall at 16x data — the plan
# that OOMs a driver at 100 TB); with the hint the chain scales linearly
# (~16x at 16x).  Dims stay broadcast; AQE handles skew inside the SMJs.
def q26_multiway_join(spark, sf):
    r = _t(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    n = _t(spark, sf, "nation")
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    li = _t(spark, sf, "lineitem")
    return (
        li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey)
        .join(c.hint("merge"), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(_revenue().cast(_DEC)).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


Q26_SQL = """
SELECT n_name,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,4))
                     * (1 - CAST(l_discount AS DECIMAL(12,4)))
                AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01'
GROUP BY n_name
"""


# =========================================================================
# Grouping extensions q30-q35
# =========================================================================


# --- q30: rollup ------------------------------------------------------------
def q30_rollup(spark, sf):
    li = _t(spark, sf, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        dsum(F.col("l_quantity"), "sum_qty"),
        dsum(F.col("l_extendedprice"), "sum_base"),
    )


Q30_SQL = """
SELECT l_returnflag, l_linestatus, count(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_base
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


# --- q31: cube --------------------------------------------------------------
def q31_cube(spark, sf):
    o = _t(spark, sf, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"),
        dsum(F.col("o_totalprice"), "sum_price"),
    )


Q31_SQL = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


# --- q32: explicit grouping sets (SQL entry point) --------------------------
# Shared ANSI text: Spark runs it via spark.sql over registered views,
# DuckDB runs the identical string.
Q32_SQL = """
SELECT l_returnflag, l_linestatus, count(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""


def q32_grouping_sets(spark, sf):
    register_views(spark, sf, ("lineitem",))
    return spark.sql(Q32_SQL)


# --- q33: distinct + countDistinct -----------------------------------------
def q33_distinct(spark, sf):
    e = _t(spark, sf, "events")
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct(fmt_date(F.col("ts"))).alias("n_days"),
        F.count("*").alias("n"),
    )


Q33_SQL = """
SELECT event_type,
       count(DISTINCT user_id) AS n_users,
       count(DISTINCT strftime(ts, '%Y-%m-%d')) AS n_days,
       count(*) AS n
FROM events
GROUP BY event_type
"""


# --- q34: approx_count_distinct (HLL) ---------------------------------------
# Raw HLL estimates differ across engines, so the round-2 entry was
# rows-only (driver recorded err:no_oracle).  Hash-checkable formulation:
# emit the EXACT distinct counts plus booleans asserting the HLL estimate
# lands within its error envelope (rsd=0.05 -> |err| < 3*rsd = 15% holds
# w.p. ~99.7%; the fixture estimates are well inside it at every sf).  The
# oracle emits the same exact counts and TRUE — the hash matches iff
# Spark's sketch is actually within tolerance, turning the approx operator
# into a driver-verifiable contract instead of an unchecked row count.
def q34_approx_distinct(spark, sf):
    e = _t(spark, sf, "events")
    tol = 0.15

    def _ok(approx, exact):
        return (
            F.abs(approx.cast("double") - exact.cast("double"))
            <= F.lit(tol) * exact.cast("double")
        )

    au = F.approx_count_distinct("user_id")
    ae = F.approx_count_distinct("event_id")
    xu = F.count_distinct("user_id")
    xe = F.count_distinct("event_id")
    return e.groupBy("event_type").agg(
        xu.alias("n_users_exact"),
        xe.alias("n_events_exact"),
        _ok(au, xu).alias("approx_users_ok"),
        _ok(ae, xe).alias("approx_events_ok"),
    )


Q34_SQL = """
SELECT event_type,
       count(DISTINCT user_id) AS n_users_exact,
       count(DISTINCT event_id) AS n_events_exact,
       TRUE AS approx_users_ok,
       TRUE AS approx_events_ok
FROM events
GROUP BY event_type
"""


# --- q35: HAVING (post-aggregation filter) ----------------------------------
def q35_having(spark, sf):
    e = _t(spark, sf, "events")
    agg = e.groupBy("user_id").agg(
        F.count("*").alias("n"), dsum(F.col("value"), "sum_value")
    )
    return agg.filter(F.col("sum_value") > 3000.0)


Q35_SQL = """
SELECT user_id, count(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY user_id
HAVING CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) > 3000.0
"""


# =========================================================================
# Window functions q40-q45
# =========================================================================


# --- q40: rank / dense_rank / row_number per group --------------------------
def q40_rank_window(spark, sf):
    e = _t(spark, sf, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    return e.select(
        "event_id",
        "event_type",
        "value",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.row_number().over(w).alias("rn"),
    )


Q40_SQL = """
SELECT event_id, event_type, value,
       rank()       OVER w AS rnk,
       dense_rank() OVER w AS drnk,
       row_number() OVER w AS rn
FROM events
WINDOW w AS (PARTITION BY event_type ORDER BY value DESC, event_id ASC)
"""


# --- q41: lag / lead per user ordered by time -------------------------------
def q41_lag_lead(spark, sf):
    e = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    return e.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value", 1).over(w).alias("prev_value"),
        F.lead("value", 1).over(w).alias("next_value"),
    )


Q41_SQL = """
SELECT event_id, user_id, value,
       lag(value, 1)  OVER w AS prev_value,
       lead(value, 1) OVER w AS next_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
"""


# --- q42: 3-row moving average per user -------------------------------------
# Decimal-backed sliding sum: add/remove on the frame is exact, so Spark's
# incremental window update and DuckDB's recompute agree bit-for-bit.
def q42_moving_agg(spark, sf):
    e = _t(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-2, 0)
    )
    msum = F.sum(F.col("value").cast(_DEC)).over(w).cast("double")
    mcnt = F.count("value").over(w)
    return e.select(
        "event_id", "user_id", "value", (msum / mcnt).alias("moving_avg3")
    )


Q42_SQL = """
SELECT event_id, user_id, value,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER w AS DOUBLE)
         / COUNT(value) OVER w AS moving_avg3
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""


# --- q43: ntile / percent_rank / cume_dist ----------------------------------
# percent_rank=(rank-1)/(n-1) and cume_dist are single IEEE divisions of
# integers — bit-identical across engines, no rounding needed.
def q43_ntile_dist(spark, sf):
    e = _t(spark, sf, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").asc(), F.col("event_id").asc()
    )
    return e.select(
        "event_id",
        "event_type",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


Q43_SQL = """
SELECT event_id, event_type,
       ntile(4)      OVER w AS quartile,
       percent_rank() OVER w AS pct_rank,
       cume_dist()    OVER w AS cume
FROM events
WINDOW w AS (PARTITION BY event_type ORDER BY value ASC, event_id ASC)
"""


# --- q44: range frame (trailing 30 days of order value per customer) --------
# Ordered by integer epoch seconds so the identical numeric RANGE frame
# exists on both engines (Spark's rangeBetween is numeric-only in PySpark).
def q44_range_frame(spark, sf):
    o = _t(spark, sf, "orders").withColumn(
        "epoch_s", F.unix_timestamp("o_orderdate")
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("epoch_s")
        .rangeBetween(-30 * 86400, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        fmt_date(F.col("o_orderdate"), "order_day"),
        F.sum(F.col("o_totalprice").cast(_DEC)).over(w).cast("double").alias("sum_30d"),
    )


Q44_SQL = """
SELECT o_orderkey, o_custkey,
       strftime(o_orderdate, '%Y-%m-%d') AS order_day,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) OVER w AS DOUBLE) AS sum_30d
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY CAST(floor(epoch(o_orderdate)) AS BIGINT)
             RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
"""


# --- q46: sliding event-time windows (batch twin of s02) --------------------
# Hash-checks Spark's window(ts, 10min, 5min) pane assignment against a
# first-principles oracle: an event at t belongs to panes
# p = floor(t/300) - k for k in {0,1} (window = 2 x slide), pane start
# p*300.  Upgrades sliding-window semantics from rows-only to hash-gated.
def q46_sliding_window_batch(spark, sf):
    e = _t(spark, sf, "events")
    return (
        e.groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n"), dsum(F.col("value"), "sum_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


Q46_SQL = """
WITH panes AS (
  SELECT event_type, value,
         CAST(floor(epoch(ts) / 300) - k AS BIGINT) AS p
  FROM events, unnest([0, 1]) AS t(k)
)
SELECT strftime(to_timestamp(p * 300), '%Y-%m-%d %H:%M') AS window_start,
       event_type, count(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
FROM panes
GROUP BY 1, 2
"""


# --- q47: session windows (batch twin of s03) -------------------------------
# Hash-checks Spark's session_window(ts, gap) against the classic SQL
# gaps-and-islands formulation: a new session starts when the gap since
# the previous event exceeds 5 minutes; session end = last event + gap.
def q47_session_window_batch(spark, sf):
    e = _t(spark, sf, "events")
    return (
        e.groupBy(F.session_window("ts", "5 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            fmt_ts(F.col("w.start"), "session_start"),
            fmt_ts(F.col("w.end"), "session_end"),
            "user_id",
            "n_events",
        )
    )


Q47_SQL = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER w > INTERVAL 5 MINUTES
                OR lag(ts) OVER w IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), numbered AS (
  SELECT user_id, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       strftime(max(ts) + INTERVAL 5 MINUTES,
                '%Y-%m-%d %H:%M:%S.%f') AS session_end,
       user_id,
       count(*) AS n_events
FROM numbered
GROUP BY user_id, sid
"""


# --- q48: hierarchical candle rollup (continuous-aggregate pattern) ---------
# 1-minute candles roll up to hourly WITHOUT rescanning raw events
# (operators/candles.py::rollup_ohlc).  The oracle computes the hourly
# candles DIRECTLY from raw events — hash equality asserts OHLC rollup
# associativity, the property that makes multi-resolution candle storage
# sound at 100 TB (each coarser level scans candles, not ticks).
def q48_candle_rollup(spark, sf):
    e = _t(spark, sf, "events")
    ts, v = F.col("ts"), F.col("value")
    minute = (
        e.groupBy(F.window(ts, "1 minute").alias("w"), "user_id")
        .agg(
            F.min_by(v, ts).alias("open"),
            F.max(v).alias("high"),
            F.min(v).alias("low"),
            F.max_by(v, ts).alias("close"),
            F.count("*").alias("n_events"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "user_id",
            "open",
            "high",
            "low",
            "close",
            "n_events",
        )
    )
    hourly = rollup_ohlc(
        minute,
        ts_col="window_start",
        key_col="user_id",
        window="1 hour",
        sum_cols=("n_events",),
    )
    return hourly.select(
        fmt_minute(F.col("window_start"), "hour_start"),
        "user_id",
        "open",
        "high",
        "low",
        "close",
        "n_events",
    )


Q48_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour_start,
       user_id,
       arg_min(value, ts) AS open,
       max(value) AS high,
       min(value) AS low,
       arg_max(value, ts) AS close,
       count(*) AS n_events
FROM events
GROUP BY 1, 2
"""


# --- q45: top-k per group (window rank + filter) ----------------------------
def q45_topk_per_group(spark, sf):
    e = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("user_id", "event_id", "value", "rn")
    )


Q45_SQL = """
SELECT user_id, event_id, value, rn FROM (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY value DESC, event_id ASC) AS rn
  FROM events
) WHERE rn <= 2
"""


# =========================================================================
# Set operations q50-q53
# =========================================================================


def q50_union_all(spark, sf):
    e = _t(spark, sf, "events")
    a = e.filter(F.col("event_type") == "purchase")
    b = e.filter(F.col("event_type") == "click")
    return a.unionByName(b).select("event_id", "event_type", "value")


Q50_SQL = """
SELECT event_id, event_type, value FROM events WHERE event_type = 'purchase'
UNION ALL
SELECT event_id, event_type, value FROM events WHERE event_type = 'click'
"""


def q51_union_distinct(spark, sf):
    e = _t(spark, sf, "events")
    a = e.filter(F.col("event_type") == "purchase").select("user_id")
    b = e.filter(F.col("event_type") == "view").select("user_id")
    return a.union(b).distinct()


Q51_SQL = """
SELECT user_id FROM events WHERE event_type = 'purchase'
UNION
SELECT user_id FROM events WHERE event_type = 'view'
"""


def q52_intersect(spark, sf):
    e = _t(spark, sf, "events")
    a = e.filter(F.col("event_type") == "purchase").select("user_id")
    b = e.filter(F.col("event_type") == "error").select("user_id")
    return a.intersect(b)


Q52_SQL = """
SELECT user_id FROM events WHERE event_type = 'purchase'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'error'
"""


def q53_except(spark, sf):
    e = _t(spark, sf, "events")
    a = e.filter(F.col("value") > 120.0).select("event_id").distinct()
    b = e.filter(F.col("event_type") == "purchase").select("event_id")
    return a.subtract(b)


Q53_SQL = """
SELECT event_id FROM events WHERE value > 120.0
EXCEPT
SELECT event_id FROM events WHERE event_type = 'purchase'
"""


# =========================================================================
# Scalar-function blocks q60-q64
# =========================================================================


# --- q60: string functions over part ----------------------------------------
def q60_string_funcs(spark, sf):
    p = _t(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 5).alias("name_pfx"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.lpad(F.col("p_size").cast("string"), 3, "0").alias("size_pad"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias(
            "name_trim"
        ),
        F.col("p_name").like("%gear%").alias("is_gear"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
    )


Q60_SQL = r"""
SELECT p_partkey,
       upper(p_name) AS name_upper,
       substring(p_name, 1, 5) AS name_pfx,
       concat_ws(':', p_brand, p_type) AS brand_type,
       lpad(CAST(p_size AS VARCHAR), 3, '0') AS size_pad,
       trim('  ' || p_name || '  ') AS name_trim,
       p_name LIKE '%gear%' AS is_gear,
       regexp_extract(p_name, '^(\w+)', 1) AS first_word
FROM part
"""


# --- q61: date/time functions + market-hours gate (O32 twin) ----------------
# The is_market_hours flag is the batch twin of the reference's trading-
# window gate (reference run_pipline.py:11-33: 09:15-15:30, weekdays).
def q61_date_funcs(spark, sf):
    e = _t(spark, sf, "events")
    ts = F.col("ts")
    dow = F.dayofweek(ts)  # 1=Sunday .. 7=Saturday
    return e.select(
        "event_id",
        F.year(ts).alias("y"),
        F.month(ts).alias("mo"),
        F.dayofmonth(ts).alias("d"),
        F.hour(ts).alias("hr"),
        F.minute(ts).alias("mi"),
        dow.alias("dow"),
        F.datediff(ts, F.lit("2024-01-01").cast("date")).alias("days_since"),
        fmt_date(F.add_months(ts, 3), "plus3m"),
        (
            dow.isin(2, 3, 4, 5, 6)
            & (
                (F.hour(ts) * 60 + F.minute(ts)).between(9 * 60 + 15, 15 * 60 + 30)
            )
        ).alias("is_market_hours"),
    )


Q61_SQL = """
SELECT event_id,
       EXTRACT(year FROM ts)   AS y,
       EXTRACT(month FROM ts)  AS mo,
       EXTRACT(day FROM ts)    AS d,
       EXTRACT(hour FROM ts)   AS hr,
       EXTRACT(minute FROM ts) AS mi,
       EXTRACT(dow FROM ts) + 1 AS dow,
       datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS days_since,
       strftime(ts + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m,
       (EXTRACT(dow FROM ts) + 1 IN (2, 3, 4, 5, 6)
        AND EXTRACT(hour FROM ts) * 60 + EXTRACT(minute FROM ts)
            BETWEEN 9 * 60 + 15 AND 15 * 60 + 30) AS is_market_hours
FROM events
"""


# --- q62: math functions ----------------------------------------------------
# sqrt is IEEE correctly-rounded in both engines (bit-identical, no round);
# ln/pow are libm calls that may differ in the last ulp -> ROUND(...,4).
def q62_math_funcs(spark, sf):
    li = _t(spark, sf, "lineitem")
    q = F.col("l_quantity")
    return li.select(
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        F.abs(F.col("l_discount") - F.col("l_tax")).alias("abs_dt"),
        F.sqrt(q).alias("sqrt_qty"),
        round4(F.log(F.col("l_extendedprice")), "ln_price"),
        round4(F.pow(q, F.lit(2)), "qty_sq"),
        F.ceil(q * 1.5).cast("long").alias("ceil_q"),
        F.floor(q * 1.5).cast("long").alias("floor_q"),
        (F.col("l_partkey") % 7).alias("pk_mod7"),
    )


Q62_SQL = """
SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
       abs(l_discount - l_tax) AS abs_dt,
       sqrt(l_quantity) AS sqrt_qty,
       ROUND(ln(l_extendedprice), 4) AS ln_price,
       ROUND(pow(l_quantity, 2), 4) AS qty_sq,
       CAST(ceil(l_quantity * 1.5) AS BIGINT) AS ceil_q,
       CAST(floor(l_quantity * 1.5) AS BIGINT) AS floor_q,
       l_partkey % 7 AS pk_mod7
FROM lineitem
"""


# --- q63: array functions over embeddings (O22 twin) ------------------------
# Elements are integer-ized with floor (exact, identical across engines)
# before slicing/sorting/joining so no float-formatting can leak into the
# hash; filter/transform are JVM-side higher-order functions.
def q63_array_funcs(spark, sf):
    emb = _t(spark, sf, "embeddings")
    ints = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * 1000).cast("bigint"),
    )
    return emb.select(
        "vec_id",
        F.size("embedding").alias("n_dims"),
        F.array_join(F.slice(ints, 1, 5), ",").alias("first5"),
        F.array_join(F.slice(F.sort_array(ints), 1, 5), ",").alias("sorted5"),
        F.size(F.filter(ints, lambda x: x > 0)).alias("n_pos"),
    )


Q63_SQL = """
WITH x AS (
  SELECT vec_id, embedding,
         list_transform(embedding,
                        e -> CAST(floor(CAST(e AS DOUBLE) * 1000) AS BIGINT)) AS ints
  FROM embeddings
)
SELECT vec_id,
       len(embedding) AS n_dims,
       array_to_string(list_slice(ints, 1, 5), ',') AS first5,
       array_to_string(list_slice(list_sort(ints), 1, 5), ',') AS sorted5,
       len(list_filter(ints, e -> e > 0)) AS n_pos
FROM x
"""


# --- q64: JSON functions over events.props (O4 twin) ------------------------
# Twin of the reference's from_json/get_json_object surface
# (reference data_processor.py:81, tick_to_hdfs.py:46).
def q64_json_funcs(spark, sf):
    e = _t(spark, sf, "events")
    m = F.from_json(F.col("props"), "map<string,bigint>")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_val"),
        F.get_json_object("props", "$.k").alias("k_str"),
        F.size(m).alias("n_keys"),
    )


Q64_SQL = """
SELECT event_id,
       CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
       json_extract_string(props, '$.k') AS k_str,
       len(json_keys(props)) AS n_keys
FROM events
"""


# =========================================================================
# SQL entry points q70-q73 — shared ANSI text through spark.sql + DuckDB
# =========================================================================

Q70_SQL = """
SELECT c_custkey, c_name
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 450000.0)
"""


def q70_subquery_in(spark, sf):
    register_views(spark, sf, ("customer", "orders"))
    return spark.sql(Q70_SQL)


Q71_SQL = """
SELECT event_id, user_id, value
FROM events
WHERE value > (SELECT CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
                      / COUNT(value) * 1.5
               FROM events)
"""


def q71_scalar_subquery(spark, sf):
    register_views(spark, sf, ("events",))
    return spark.sql(Q71_SQL)


# spend stays DECIMAL end-to-end: any intermediate double would re-round
# under each engine's own decimal rules (Spark HALF_UP vs DuckDB) and can
# legally differ in the last digit — the round-2 driver hash-fail.  One
# final cast to DOUBLE of the identical exact decimal is deterministic
# IEEE round-to-nearest on both engines.
Q72_SQL = """
WITH per_cust AS (
  SELECT o_custkey, count(*) AS n_orders,
         SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS spend
  FROM orders
  GROUP BY o_custkey
)
SELECT c_mktsegment,
       count(*) AS n_cust,
       -- BIGINT, not HUGEINT: DuckDB's integer SUM default reaches the
       -- driver's pandas comparator as float64 and hash-fails against
       -- Spark's int64 (the real round-2/3 q72 divergence; total_spend's
       -- decimal path was already exact).
       CAST(SUM(COALESCE(n_orders, 0)) AS BIGINT) AS total_orders,
       CAST(SUM(COALESCE(spend, CAST(0 AS DECIMAL(28,6)))) AS DOUBLE)
         AS total_spend
FROM customer LEFT JOIN per_cust ON c_custkey = o_custkey
GROUP BY c_mktsegment
"""


def q72_cte(spark, sf):
    register_views(spark, sf, ("customer", "orders"))
    return spark.sql(Q72_SQL)


# --- q73: pivot (conditional-aggregation twin for the oracle) ---------------
_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q73_pivot(spark, sf):
    e = _t(spark, sf, "events")
    return (
        e.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.sum(F.col("value").cast(_DEC)).cast("double"))
    )


Q73_SQL = """
SELECT user_id,
       CAST(SUM(CAST(CASE WHEN event_type = 'click' THEN value END
                AS DECIMAL(28,6))) AS DOUBLE) AS click,
       CAST(SUM(CAST(CASE WHEN event_type = 'error' THEN value END
                AS DECIMAL(28,6))) AS DOUBLE) AS error,
       CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value END
                AS DECIMAL(28,6))) AS DOUBLE) AS purchase,
       CAST(SUM(CAST(CASE WHEN event_type = 'signup' THEN value END
                AS DECIMAL(28,6))) AS DOUBLE) AS signup,
       CAST(SUM(CAST(CASE WHEN event_type = 'view' THEN value END
                AS DECIMAL(28,6))) AS DOUBLE) AS view
FROM events
GROUP BY user_id
"""


# =========================================================================
# UDF surface q80-q82
# =========================================================================
# UDFs are the engine's slow path (SURVEY.md section 4.1: prefer built-in
# expressions — the reference itself has zero UDFs).  These three queries
# exist to prove the surface works AND that each UDF matches a built-in/SQL
# twin; the hot path elsewhere never uses them.  q81/q82 are Arrow-batched
# (pandas) — the only acceptable Python form at 100 TB.


def _value_band(v) -> str | None:
    if v is None:
        return None
    if v < 50.0:
        return "low"
    if v < 100.0:
        return "mid"
    if v < 150.0:
        return "high"
    return "vip"


def q80_python_udf(spark, sf):
    e = _t(spark, sf, "events")
    band_udf = F.udf(_value_band, "string")
    return e.select("event_id", "value", band_udf("value").alias("band"))


Q80_SQL = """
SELECT event_id, value,
       CASE WHEN value IS NULL THEN NULL
            WHEN value < 50.0 THEN 'low'
            WHEN value < 100.0 THEN 'mid'
            WHEN value < 150.0 THEN 'high'
            ELSE 'vip' END AS band
FROM events
"""


def q81_pandas_udf(spark, sf):
    from ..functions.pandasudfs import rescale_half_minus_ten

    e = _t(spark, sf, "events")
    return e.select(
        "event_id", "value", rescale_half_minus_ten("value").alias("rescaled")
    )


Q81_SQL = """
SELECT event_id, value, value * 0.5 - 10.0 AS rescaled
FROM events
"""


# API-surface proof for groupBy().applyInPandas (the grouped-map Arrow
# path).  Scale posture: this exact computation is window-expressible
# (the oracle IS the window formulation), so at 100 TB you'd run the
# JVM window plan; grouped-map is for per-group logic Spark expressions
# genuinely can't state (model scoring, per-entity solvers).  Its bench
# cost (~4 s at sf0.1, the suite's slowest batch entry) is per-group
# pandas overhead over ~10k small groups — inherent to the API shape
# being proven, not a plan defect.
def q82_grouped_map(spark, sf):
    import numpy as np
    import pandas as pd

    def zscore(pdf: "pd.DataFrame") -> "pd.DataFrame":
        v = pdf["value"].astype("float64")
        std = v.std(ddof=1)  # matches SQL stddev_samp
        if not np.isfinite(std) or std == 0.0:
            z = pd.Series([None] * len(v), dtype="float64")
        else:
            z = ((v - v.mean()) / std).round(4)
        return pd.DataFrame(
            {"event_id": pdf["event_id"], "user_id": pdf["user_id"], "z": z}
        )

    e = _t(spark, sf, "events").select("event_id", "user_id", "value")
    # Explicit key repartition at cluster width: AQE sizes the grouped-map
    # exchange by shuffle BYTES and coalesces this small frame to ONE
    # partition, which serializes every group through a single Python
    # worker (measured 4.4 s; worker-per-core 0.9 s at sf0.1).  Arrow
    # grouped-map cost is per-worker Python time, not shuffle bytes, so
    # the parallelism decision must be explicit (docs/SCALING.md).
    width = spark.sparkContext.defaultParallelism
    return (
        e.repartition(width, "user_id")
        .groupBy("user_id")
        .applyInPandas(zscore, "event_id long, user_id long, z double")
    )


Q82_SQL = """
SELECT event_id, user_id,
       CASE WHEN stddev_samp(value) OVER w > 0
            THEN ROUND((value - avg(value) OVER w) / stddev_samp(value) OVER w, 4)
       END AS z
FROM events
WINDOW w AS (PARTITION BY user_id)
"""


# --- q74: unpivot/melt — the inverse of q73's pivot -------------------------
# Wide metric columns to long (key, metric, value) rows; values widen to
# a common DOUBLE.  The long layout is what keyed aggregation and
# storage partitioning want at scale (narrow rows, one shuffle key).
def q74_unpivot(spark, sf):
    o = _t(spark, sf, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
        F.col("o_custkey").cast("double").alias("o_custkey"),
    )
    return o.unpivot(
        "o_orderkey",
        ["o_totalprice", "o_custkey"],
        "metric",
        "val",
    )


Q74_SQL = """
SELECT o_orderkey, 'o_totalprice' AS metric,
       CAST(o_totalprice AS DOUBLE) AS val FROM orders
UNION ALL
SELECT o_orderkey, 'o_custkey' AS metric,
       CAST(o_custkey AS DOUBLE) AS val FROM orders
"""


# --- q75: null-handling surface (na.fill / na.replace / coalesce) -----------
# The DataFrameNaFunctions API over a deterministically nulled column
# (fixtures carry no nulls; NULLIF manufactures them identically on both
# engines), plus a drop-count twin via the same predicate.
def q75_null_handling(spark, sf):
    e = _t(spark, sf, "events").select(
        "event_id",
        "event_type",
        F.when(F.col("event_type") == "error", None)
        .otherwise(F.col("value"))
        .alias("v"),
    )
    out = e.na.fill({"v": -1.0}).na.replace(
        {"error": "ERR"}, subset=["event_type"]
    )
    return out.select(
        "event_id",
        F.col("event_type").alias("et"),
        F.col("v").alias("v_filled"),
    )


Q75_SQL = """
SELECT event_id,
       CASE WHEN event_type = 'error' THEN 'ERR' ELSE event_type END AS et,
       COALESCE(NULLIF(CASE WHEN event_type = 'error' THEN NULL
                            ELSE value END, NULL), -1.0) AS v_filled
FROM events
"""


# --- q76: SCD2 dimension merge (the MERGE-INTO relational core) -------------
# Upsert/dimension maintenance was the one relational capability class
# the E-block lacked: customer is the current dimension snapshot, the
# per-customer order aggregate is the update batch (eff = latest order
# date, acctbal += decimal order spend), and the output is full SCD2
# version history — matched keys close out the old row (valid_to = eff,
# is_current=0) and append the new current one; unmatched keys carry
# through.  operators/warehouse.py::scd2_merge: ONE equi-join planned
# once + a narrow explode version fan-out (single dim scan); money
# stays decimal end-to-end.
def q76_scd2_merge(spark, sf):
    cust = _t(spark, sf, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.col("c_acctbal").cast("decimal(28,6)").alias("acctbal"),
    )
    upd = (
        _t(spark, sf, "orders")
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.max("o_orderdate").alias("eff_date"),
            F.sum(F.col("o_totalprice").cast("decimal(28,6)")).alias(
                "spend"
            ),
        )
    )
    out = scd2_merge(
        cust,
        upd,
        "c_custkey",
        {"acctbal": F.col("acctbal") + F.col("spend")},
        "eff_date",
    )
    return out.select(
        "c_custkey",
        "c_mktsegment",
        F.col("acctbal").cast("double").alias("acctbal"),
        "valid_from",
        "valid_to",
        "is_current",
    )


Q76_SQL = """
WITH upd AS (
  SELECT o_custkey AS c_custkey, max(o_orderdate) AS eff,
         SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS spend
  FROM orders GROUP BY 1
), j AS (
  SELECT c.c_custkey, c.c_mktsegment,
         CAST(c.c_acctbal AS DECIMAL(28,6)) AS acctbal, u.eff, u.spend
  FROM customer c LEFT JOIN upd u USING (c_custkey)
)
SELECT c_custkey, c_mktsegment,
       CAST(CASE WHEN eff IS NOT NULL THEN acctbal + spend
                 ELSE acctbal END AS DOUBLE) AS acctbal,
       CASE WHEN eff IS NOT NULL THEN strftime(eff, '%Y-%m-%d')
            ELSE '1992-01-01' END AS valid_from,
       '9999-12-31' AS valid_to, 1 AS is_current
FROM j
UNION ALL
SELECT c_custkey, c_mktsegment, CAST(acctbal AS DOUBLE) AS acctbal,
       '1992-01-01' AS valid_from, strftime(eff, '%Y-%m-%d') AS valid_to,
       0 AS is_current
FROM j WHERE eff IS NOT NULL
"""


# --- q76b: SCD2 full-snapshot sync — the MERGE delete path ------------------
# Completes MERGE INTO's third branch (WHEN NOT MATCHED BY SOURCE): the
# update batch is a FULL snapshot of still-active customers (those with
# a 1997+ order), so dim keys absent from it are churned — closed out
# at the snapshot's as-of date with no new current version.  Same
# one-join-plus-narrow-explode core as q76 (scd2_merge close_missing=);
# the three MERGE branches differ only in which per-row version structs
# are non-null before the explode, so the plan shape is unchanged.
def q76b_scd2_snapshot_sync(spark, sf):
    cust = _t(spark, sf, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.col("c_acctbal").cast("decimal(28,6)").alias("acctbal"),
    )
    upd = (
        _t(spark, sf, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1997-01-01"))
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.max("o_orderdate").alias("eff_date"),
            F.sum(F.col("o_totalprice").cast("decimal(28,6)")).alias(
                "spend"
            ),
        )
    )
    out = scd2_merge(
        cust,
        upd,
        "c_custkey",
        {"acctbal": F.col("acctbal") + F.col("spend")},
        "eff_date",
        close_missing="1998-12-31",
    )
    return out.select(
        "c_custkey",
        "c_mktsegment",
        F.col("acctbal").cast("double").alias("acctbal"),
        "valid_from",
        "valid_to",
        "is_current",
    )


Q76B_SQL = """
WITH upd AS (
  SELECT o_custkey AS c_custkey, max(o_orderdate) AS eff,
         SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS spend
  FROM orders WHERE o_orderdate >= DATE '1997-01-01' GROUP BY 1
), j AS (
  SELECT c.c_custkey, c.c_mktsegment,
         CAST(c.c_acctbal AS DECIMAL(28,6)) AS acctbal, u.eff, u.spend
  FROM customer c LEFT JOIN upd u USING (c_custkey)
)
SELECT c_custkey, c_mktsegment,
       CAST(acctbal + spend AS DOUBLE) AS acctbal,
       strftime(eff, '%Y-%m-%d') AS valid_from,
       '9999-12-31' AS valid_to, 1 AS is_current
FROM j WHERE eff IS NOT NULL
UNION ALL
SELECT c_custkey, c_mktsegment, CAST(acctbal AS DOUBLE) AS acctbal,
       '1992-01-01' AS valid_from,
       CASE WHEN eff IS NOT NULL THEN strftime(eff, '%Y-%m-%d')
            ELSE '1998-12-31' END AS valid_to,
       0 AS is_current
FROM j
"""


# --- q77: sequential-pattern funnel (MATCH_RECOGNIZE class) -----------------
# Behavioral funnel view -> click -> purchase per user: the ordered-
# sequence capability (each stage's event must be strictly AFTER the
# previous stage's) that plain aggregation can't express.  Formulated
# as ONE shuffle: per-user events collected sorted, then a pure-
# expression `aggregate` fold cascades the three stage timestamps —
# state is O(1), no joins, no Python.  The fold is order-insensitive to
# ties (a stage event at exactly the previous stage's ts fails strict
# >, whatever the sort order), so it hash-matches the oracle's
# cascaded-min formulation exactly.
#
# 100 TB: memory per user is that user's event list — fine for
# bounded-entity histories (the funnel assumption); q77b runs the SAME
# operator with bounded=False — the cascade-join twin (3 keyed
# min-aggs, each joined back: more shuffles, O(1) memory) — against
# the SAME oracle, so the scale-safe path is engine code, not just
# oracle SQL (docs/TUNING.md documents the flag).
def _q77_format(res):
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


def q77_funnel_cascade(spark, sf):
    e = _t(spark, sf, "events")
    return _q77_format(
        funnel_stages(e, ("view", "click", "purchase"), bounded=True)
    )


# --- q77b: the unbounded-history funnel twin (cascade joins) ----------------
# Identical semantics and oracle as q77; the physical plan is the
# per-stage min-agg + join chain — the formulation that holds when a
# single user's history exceeds executor memory.
def q77b_funnel_cascade_joins(spark, sf):
    e = _t(spark, sf, "events")
    return _q77_format(
        funnel_stages(e, ("view", "click", "purchase"), bounded=False)
    )


Q77_SQL = """
WITH u AS (
  SELECT DISTINCT user_id FROM events
  WHERE event_type IN ('view', 'click', 'purchase')
), v AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY 1
), c AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1
), p AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1
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


# --- q83: mapInArrow — the Arrow-native batch UDF surface -------------------
# Completes the Python-integration matrix (q80 row UDF, q81 pandas UDF,
# q82 grouped map): RecordBatch-level compute with pyarrow kernels, no
# pandas materialization — the lowest-overhead Python path.  Same IEEE
# double ops as the SQL twin, so it is hash-exact.
def q83_arrow_map(spark, sf):
    def rescale(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for b in batches:
            v = b.column("value")
            yield pa.RecordBatch.from_arrays(
                [
                    b.column("event_id"),
                    v,
                    pc.subtract(pc.multiply(v, pa.scalar(0.5)), pa.scalar(10.0)),
                ],
                names=["event_id", "value", "rescaled"],
            )

    e = _t(spark, sf, "events").select("event_id", "value")
    return e.mapInArrow(rescale, "event_id long, value double, rescaled double")


Q83_SQL = """
SELECT event_id, value, value * 0.5 - 10.0 AS rescaled
FROM events
"""


# --- q84: Python UDTF — table-valued function surface -----------------------
# Like q80, an API-surface proof (row-at-a-time Python, never the hot
# path — q115's expression chunker is the scale formulation of row
# explosion).  Bounded input slice; DuckDB twin pairs unnest with
# generate_subscripts.
def q84_udtf(spark, sf):
    from pyspark.sql.functions import udtf

    @udtf(returnType="word string, pos int")
    class SplitWords:
        def eval(self, text: str):
            if text is None:
                return
            for i, w in enumerate(text.split(" ")):
                yield w, i + 1

    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 50)
    return d.lateralJoin(
        SplitWords(F.col("text").outer())
    ).select("doc_id", "word", "pos")


Q84_SQL = """
SELECT doc_id,
       unnest(string_split(text, ' ')) AS word,
       CAST(generate_subscripts(string_split(text, ' '), 1) AS INT) AS pos
FROM documents
WHERE doc_id < 50
"""


# --- q129: VARIANT semi-structured type (Spark 4) ---------------------------
# The open-typed twin of q64's schema-directed JSON path: props parses to
# a VARIANT once, fields come out via typed variant_get paths, and
# try_variant_get returns NULL (not an error) for absent paths — the
# shredding-free way to keep 100 TB of heterogeneous JSON queryable
# without committing to a struct schema at write time.  VARIANT itself
# never reaches the result (the comparator can't hash it); only the
# extracted scalars do.
def q129_variant_json(spark, sf):
    e = _t(spark, sf, "events")
    return e.select(
        "event_id",
        F.expr("variant_get(parse_json(props), '$.k', 'bigint')").alias(
            "k_val"
        ),
        F.expr("variant_get(parse_json(props), '$.k', 'string')").alias(
            "k_str"
        ),
        F.expr("try_variant_get(parse_json(props), '$.nope', 'bigint')").alias(
            "k_missing"
        ),
    )


Q129_SQL = """
SELECT event_id,
       CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
       json_extract_string(props, '$.k') AS k_str,
       CAST(NULL AS BIGINT) AS k_missing
FROM events
"""


# --- q130: custom Python data source (Spark 4 DataSource API) ---------------
# sources/pydatasource.py: the synthetic tick tape arrives through
# spark.read.format("tick_synth") — planner-integrated, partitioned,
# executor-side generation.  The stream is closed-form per tick id, so
# the oracle rebuilds it exactly from range(): a hash-pass proves the
# custom-source path (schema, partitioning, row conversion) end to end.
def q130_python_datasource(spark, sf):
    from ..sources.pydatasource import register

    register(spark)
    t = (
        spark.read.format("tick_synth")
        .option("n", 5000)
        .option("numPartitions", 8)
        .load()
    )
    return t.groupBy("instrument").agg(
        F.count("*").alias("n_ticks"),
        F.sum("qty").alias("total_qty"),
        F.min("price").alias("min_price"),
        F.max("price").alias("max_price"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
    )


# Price math is forced through identical IEEE double ops on both sides
# (CAST AS DOUBLE before the divide); decimal-literal arithmetic would
# re-round differently in the last ulp.
Q130_SQL = """
WITH t AS (
  SELECT i AS tick_id,
         TIMESTAMP '2024-01-01 00:00:00' + i * INTERVAL 1 SECOND AS ts,
         'INS' || CAST(i % 97 AS VARCHAR) AS instrument,
         CAST(100 AS DOUBLE)
           + CAST((i * 2654435761) % 1000 AS DOUBLE) / CAST(100 AS DOUBLE)
           AS price,
         i % 50 + 1 AS qty
  FROM range(5000) r(i)
)
SELECT instrument, count(*) AS n_ticks,
       CAST(SUM(qty) AS BIGINT) AS total_qty,
       min(price) AS min_price, max(price) AS max_price,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_ts
FROM t
GROUP BY instrument
"""


# --- q131: salted skew join (operators/skew.py) -----------------------------
# The 100-TB skew story's gate query: collapse ~90% of orders onto ONE hot
# custkey (the worst case AQE's bounded splits can't always dissolve), run
# it through salted_join, and hash-verify the aggregate against the plain
# join the oracle computes.  The salt values themselves are nondeterministic
# (monotonically_increasing_id-seeded) but never escape and cannot change
# the join RESULT — only its shuffle distribution — so the aggregate is
# hash-stable.
def q131_skew_salted_join(spark, sf):
    from ..operators.skew import salted_join

    o = _t(spark, sf, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.when(F.col("o_orderkey") % 10 < 9, F.lit(1))
        .otherwise(F.col("o_custkey"))
        .alias("hot_custkey"),
    )
    c = _t(spark, sf, "customer").select(
        F.col("c_custkey").alias("hot_custkey"), "c_mktsegment"
    )
    joined = salted_join(o, c, "hot_custkey", how="inner", salt=16)
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast(_DEC)).cast("double").alias(
            "total_price"
        ),
    )


Q131_SQL = """
SELECT c_mktsegment, count(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
         AS total_price
FROM (SELECT o_orderkey, o_totalprice,
             CASE WHEN o_orderkey % 10 < 9 THEN 1 ELSE o_custkey END
               AS hot_custkey
      FROM orders) o
JOIN customer ON customer.c_custkey = o.hot_custkey
GROUP BY c_mktsegment
"""


# --- q132: bucketed co-located fact-fact join (sources/bucketed.py) ---------
# The 100-TB join story's gate query: both fact tables are persisted
# bucketed by the join key (same bucket count), so the bucketing-aware
# scan feeds the sort-merge join with NO Exchange on either input — the
# shuffle is paid once at write time and amortized over every subsequent
# join (tests/test_bucketed.py asserts the exchange-free plan; this entry
# hash-verifies that the co-located plan returns the same rows as the
# oracle's plain join).  hint("merge") pins SMJ so the plan exercised is
# the bucketed one even where the dim side would fit a broadcast.
# Bucket files + catalog names are suffixed with the sf AND a per-process
# token: a fixed shared path/table would let a concurrent run at another
# sf (pytest at sf0.001 racing the driver at sf0.1) overwrite bucket
# files and catalog entries mid-read, or a partway-failed write silently
# serve the wrong sf's table on the next run.
def q132_write_tables(spark, sf) -> tuple[str, str]:
    """The amortized half of q132: persist orders/lineitem bucketed by
    the join key (eager saveAsTable).  Returns the catalog names.
    Split out so tools/scale_probe.py can time write and join
    separately — the 'shuffle paid once' claim needs its own number.

    Bucket count = 32 (local core width): a bucketed scan plans ONE
    task per bucket, so the bucket count is a hard read-parallelism
    cap — the 16x probe measured the earlier 8-bucket layout's
    join-only ratio at 3.7 (8 tasks, 24 cores idle) vs ~1.6 re-bucketed
    to 32.  At 100 TB size the count so bucket files land at 100 MB -
    1 GB AND the count comfortably exceeds executor-core width; both
    sides must share it to stay exchange-free (docs/TUNING.md).

    The per-(sf, pid) paths that make concurrent runs safe would leak
    a full bucketed copy of orders+lineitem per process (bench, pytest,
    driver, and each scale-probe subprocess) — an atexit hook drops the
    catalog entries and removes the directory when the writing process
    exits."""
    tok = f"{_sf_token(sf)}_{os.getpid()}"
    root = os.path.join(tempfile.gettempdir(), f"spark_graft_buckets_{tok}")
    orders_tbl = f"q132_orders_b_{tok}"
    lineitem_tbl = f"q132_lineitem_b_{tok}"
    o = _t(spark, sf, "orders").select("o_orderkey", "o_orderpriority")
    li = _t(spark, sf, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    # r16: the two bucketed writes are independent blocking jobs — run
    # them concurrently (guide §2.6, the q136/ivf_pq submit +
    # FIRST_EXCEPTION shape) so the smaller write rides the larger
    # one's scheduling tail instead of serializing after it.
    from concurrent.futures import FIRST_EXCEPTION, ThreadPoolExecutor, wait

    with ThreadPoolExecutor(max_workers=2) as pool:
        futs = [
            pool.submit(
                write_bucketed,
                o,
                orders_tbl,
                ("o_orderkey",),
                32,
                path=os.path.join(root, "q132_orders"),
                sort_cols=("o_orderkey",),
            ),
            pool.submit(
                write_bucketed,
                li,
                lineitem_tbl,
                ("l_orderkey",),
                32,
                path=os.path.join(root, "q132_lineitem"),
                sort_cols=("l_orderkey",),
            ),
        ]
        done, _ = wait(futs, return_when=FIRST_EXCEPTION)
        failed = next((f for f in done if f.exception() is not None), None)
        if failed is not None:
            for f in futs:
                f.cancel()
            raise failed.exception()
        for f in futs:
            f.result()
    _register_bucket_cleanup(spark, root, (orders_tbl, lineitem_tbl))
    return orders_tbl, lineitem_tbl


_BUCKET_CLEANUPS: set[str] = set()


def _register_bucket_cleanup(
    spark, root: str, tables: tuple[str, ...]
) -> None:
    """Drop the q132 bucket tables + directory when this process exits
    (once per root; overwrite mode already bounds reuse WITHIN a
    process)."""
    if root in _BUCKET_CLEANUPS:
        return
    _BUCKET_CLEANUPS.add(root)
    import atexit
    import shutil

    def _cleanup() -> None:
        try:
            for t in tables:
                spark.sql(f"DROP TABLE IF EXISTS {t}")
        except Exception:
            pass  # session may already be stopped; files still removed
        shutil.rmtree(root, ignore_errors=True)

    atexit.register(_cleanup)


def q132_join_tables(spark, orders_tbl: str, lineitem_tbl: str):
    """The per-query half of q132: exchange-free co-located SMJ over
    already-bucketed tables."""
    ob = read_bucketed(spark, orders_tbl)
    lb = read_bucketed(spark, lineitem_tbl)
    j = lb.join(ob.hint("merge"), lb.l_orderkey == ob.o_orderkey, "inner")
    return j.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_items"),
        dsum("l_quantity", "total_qty"),
        dsum("l_extendedprice", "total_price"),
    )


def q132_bucketed_join(spark, sf):
    orders_tbl, lineitem_tbl = q132_write_tables(spark, sf)
    return q132_join_tables(spark, orders_tbl, lineitem_tbl)


Q132_SQL = """
SELECT o_orderpriority, count(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS total_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)
         AS total_price
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


QUERIES = {
    "q20_join_inner": q20_join_inner,
    "q21_join_broadcast": q21_join_broadcast,
    "q22_join_outer": q22_join_outer,
    "q23_join_semi_anti": q23_join_semi_anti,
    "q24_join_range_theta": q24_join_range_theta,
    "q25_join_asof": q25_join_asof,
    "q26_multiway_join": q26_multiway_join,
    "q30_rollup": q30_rollup,
    "q31_cube": q31_cube,
    "q32_grouping_sets": q32_grouping_sets,
    "q33_distinct": q33_distinct,
    "q34_approx_distinct": q34_approx_distinct,
    "q35_having": q35_having,
    "q40_rank_window": q40_rank_window,
    "q41_lag_lead": q41_lag_lead,
    "q42_moving_agg": q42_moving_agg,
    "q43_ntile_dist": q43_ntile_dist,
    "q44_range_frame": q44_range_frame,
    "q45_topk_per_group": q45_topk_per_group,
    "q46_sliding_window_batch": q46_sliding_window_batch,
    "q47_session_window_batch": q47_session_window_batch,
    "q48_candle_rollup": q48_candle_rollup,
    "q50_union_all": q50_union_all,
    "q51_union_distinct": q51_union_distinct,
    "q52_intersect": q52_intersect,
    "q53_except": q53_except,
    "q60_string_funcs": q60_string_funcs,
    "q61_date_funcs": q61_date_funcs,
    "q62_math_funcs": q62_math_funcs,
    "q63_array_funcs": q63_array_funcs,
    "q64_json_funcs": q64_json_funcs,
    "q70_subquery_in": q70_subquery_in,
    "q71_scalar_subquery": q71_scalar_subquery,
    "q72_cte": q72_cte,
    "q73_pivot": q73_pivot,
    "q80_python_udf": q80_python_udf,
    "q81_pandas_udf": q81_pandas_udf,
    "q82_grouped_map": q82_grouped_map,
    "q74_unpivot": q74_unpivot,
    "q75_null_handling": q75_null_handling,
    "q76_scd2_merge": q76_scd2_merge,
    "q76b_scd2_snapshot_sync": q76b_scd2_snapshot_sync,
    "q77_funnel_cascade": q77_funnel_cascade,
    "q77b_funnel_cascade_joins": q77b_funnel_cascade_joins,
    "q83_arrow_map": q83_arrow_map,
    "q84_udtf": q84_udtf,
    "q129_variant_json": q129_variant_json,
    "q130_python_datasource": q130_python_datasource,
    "q131_skew_salted_join": q131_skew_salted_join,
    "q132_bucketed_join": q132_bucketed_join,
}

ORACLE = {
    "q20_join_inner": Q20_SQL,
    "q21_join_broadcast": Q21_SQL,
    "q22_join_outer": Q22_SQL,
    "q23_join_semi_anti": Q23_SQL,
    "q24_join_range_theta": Q24_SQL,
    "q25_join_asof": Q25_SQL,
    "q26_multiway_join": Q26_SQL,
    "q30_rollup": Q30_SQL,
    "q31_cube": Q31_SQL,
    "q32_grouping_sets": Q32_SQL,
    "q33_distinct": Q33_SQL,
    "q34_approx_distinct": Q34_SQL,  # exact counts + in-envelope booleans
    "q35_having": Q35_SQL,
    "q40_rank_window": Q40_SQL,
    "q41_lag_lead": Q41_SQL,
    "q42_moving_agg": Q42_SQL,
    "q43_ntile_dist": Q43_SQL,
    "q44_range_frame": Q44_SQL,
    "q45_topk_per_group": Q45_SQL,
    "q46_sliding_window_batch": Q46_SQL,
    "q47_session_window_batch": Q47_SQL,
    "q48_candle_rollup": Q48_SQL,
    "q50_union_all": Q50_SQL,
    "q51_union_distinct": Q51_SQL,
    "q52_intersect": Q52_SQL,
    "q53_except": Q53_SQL,
    "q60_string_funcs": Q60_SQL,
    "q61_date_funcs": Q61_SQL,
    "q62_math_funcs": Q62_SQL,
    "q63_array_funcs": Q63_SQL,
    "q64_json_funcs": Q64_SQL,
    "q70_subquery_in": Q70_SQL,
    "q71_scalar_subquery": Q71_SQL,
    "q72_cte": Q72_SQL,
    "q73_pivot": Q73_SQL,
    "q80_python_udf": Q80_SQL,
    "q81_pandas_udf": Q81_SQL,
    "q82_grouped_map": Q82_SQL,
    "q74_unpivot": Q74_SQL,
    "q75_null_handling": Q75_SQL,
    "q76_scd2_merge": Q76_SQL,
    "q76b_scd2_snapshot_sync": Q76B_SQL,
    "q77_funnel_cascade": Q77_SQL,
    "q77b_funnel_cascade_joins": Q77_SQL,
    "q83_arrow_map": Q83_SQL,
    "q84_udtf": Q84_SQL,
    "q129_variant_json": Q129_SQL,
    "q130_python_datasource": Q130_SQL,
    "q131_skew_salted_join": Q131_SQL,
    "q132_bucketed_join": Q132_SQL,
}
