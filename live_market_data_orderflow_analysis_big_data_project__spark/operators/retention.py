"""Cohort retention and activity streaks — the user-temporal analytics
pair every event-stream product query eventually needs.

The engine's event surface so far is per-bucket (candles, sessions,
funnels q77/q77b): nothing relates a user's activity BACK to their own
first appearance.  Two classic shapes close that:

- ``retention_cohorts``: group users by first-seen bucket (the cohort),
  then for each (cohort, age) count how many of them were active
  ``age`` buckets later — the retention triangle behind every
  "D7 retention" dashboard.
- ``activity_streaks``: per user, the gaps-and-islands decomposition of
  their active-day set — consecutive-day runs found with the
  ``day - row_number()`` trick (a run of consecutive days maps to a
  constant island key), no self-join, no per-user iteration.

Both are pure integer/count analytics — hash-exact by construction;
the single IEEE division (retention rate) divides bit-identical exact
integers.

At 100 TB: everything is keyed by user_id.  retention: one shuffle to
(user, day) distinct + first-seen (same key, one exchange feeds both),
one shuffle to (cohort, age) whose cardinality is days^2/2 — tiny.
The cohort-size side is cohort-keyed (= days) and broadcast.  streaks:
distinct + window + two groupBys all partition by user — AQE coalesces,
no skew possible (a user's partition is their active-day count, bounded
by the calendar).  No driver loops, no Python, no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["retention_cohorts", "activity_streaks"]


def retention_cohorts(
    df: DataFrame, user_col: str, ts_col: str
) -> DataFrame:
    """Retention triangle: (cohort_day, age) -> active users + rate.

    cohort_day = the user's first active day; age = whole days since
    it.  Every user contributes age 0 (their first day), so
    ``retention_rate`` is 1.0 at age 0 by construction.  Output:
    ``cohort_day`` (string), ``age`` (long), ``n_active``,
    ``cohort_size``, ``retention_rate`` = n_active / cohort_size.
    """
    u, d = F.col(user_col), F.to_date(ts_col).alias("d")
    active = df.select(u.alias("user_id"), d).distinct()
    w = Window.partitionBy("user_id")
    aged = active.select(
        "user_id",
        F.min("d").over(w).alias("cohort"),
        F.datediff("d", F.min("d").over(w)).cast("long").alias("age"),
    )
    sizes = (
        aged.where(F.col("age") == 0)
        .groupBy("cohort")
        .agg(F.count(F.lit(1)).alias("cohort_size"))
    )
    return (
        aged.groupBy("cohort", "age")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .join(F.broadcast(sizes), "cohort")
        .select(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_day"),
            "age",
            "n_active",
            "cohort_size",
            (F.col("n_active").cast("double") / F.col("cohort_size")).alias(
                "retention_rate"
            ),
        )
    )


def activity_streaks(df: DataFrame, user_col: str, ts_col: str) -> DataFrame:
    """Per-user consecutive-day streaks (gaps-and-islands).

    Output per user: ``n_active_days``, ``n_streaks`` (maximal
    consecutive-day runs), ``longest_streak`` (days), and
    ``longest_start`` — the start date of the longest streak,
    earliest-first on ties (a total-order tie-break, the q15
    convention).
    """
    u, d = F.col(user_col), F.to_date(ts_col).alias("d")
    active = df.select(u.alias("user_id"), d).distinct()
    rn = F.row_number().over(Window.partitionBy("user_id").orderBy("d"))
    islands = active.select(
        "user_id", "d", F.date_sub("d", rn).alias("island")
    )
    streaks = islands.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("len"), F.min("d").alias("start")
    )
    longest = F.max("len").over(Window.partitionBy("user_id"))
    return (
        streaks.withColumn("ml", longest)
        .groupBy("user_id")
        .agg(
            F.sum("len").alias("n_active_days"),
            F.count(F.lit(1)).alias("n_streaks"),
            F.max("len").alias("longest_streak"),
            F.date_format(
                F.min(F.when(F.col("len") == F.col("ml"), F.col("start"))),
                "yyyy-MM-dd",
            ).alias("longest_start"),
        )
    )
