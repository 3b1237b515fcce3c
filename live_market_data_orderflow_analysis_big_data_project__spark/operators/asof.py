"""As-of join (point-in-time join) — Spark has no native ASOF JOIN.

Implemented the scalable way (SURVEY.md section 4.2 item 1): UNION the two
sides tagged left/right, hash-partition by key, sort within the window by
(time, tag), and carry the nearest right-side row with
``last(..., ignoreNulls=True)``.  This is one shuffle on the join key —
no range cross-join, no per-key collect — and therefore survives skewed,
100 TB-scale inputs (each key's timeline is processed as an ordered window,
and Spark's window exec spills).

``direction`` mirrors pandas ``merge_asof``: "backward" (default) matches
the latest right row at-or-before the left timestamp; "forward" matches
the earliest right row at-or-after it.

For small right sides a broadcast join + max_by/min_by formulation is
cheaper; ``asof_join`` picks the union/window strategy by default and the
caller can opt into ``strategy="broadcast"``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

_STRATEGIES = ("union", "broadcast")
_DIRECTIONS = ("backward", "forward")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    strategy: str = "union",
    tolerance: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the nearest right row for the same
    ``on`` key: latest with ``right_ts <= left_ts`` (backward) or earliest
    with ``right_ts >= left_ts`` (forward).

    ``tolerance`` (e.g. "30 days") optionally bounds how far the match may
    be.  Right-side value columns come back named as in ``right_cols``.
    """
    if strategy not in _STRATEGIES:
        raise ValueError(f"strategy must be one of {_STRATEGIES}, got {strategy!r}")
    if direction not in _DIRECTIONS:
        raise ValueError(f"direction must be one of {_DIRECTIONS}, got {direction!r}")
    right_cols = right_cols or [c for c in right.columns if c not in (on, right_ts)]
    clash = set(right_cols) & set(left.columns)
    if clash:
        raise ValueError(
            f"right_cols {sorted(clash)} collide with left columns; "
            "rename or prefix them before the as-of join"
        )
    backward = direction == "backward"

    if strategy == "broadcast":
        # join + max_by/min_by: fine when right fits in memory after
        # broadcast.  A unique per-row id keys the post-join re-aggregation
        # so duplicate left rows survive (grouping by the left *columns*
        # would collapse them, and breaks for non-groupable types like map).
        lid = left.withColumn("__lid", F.monotonically_increasing_id())
        if backward:
            cond = (lid[on] == right[on]) & (right[right_ts] <= lid[left_ts])
            if tolerance is not None:
                cond = cond & (
                    right[right_ts] >= lid[left_ts] - F.expr(f"INTERVAL {tolerance}")
                )
            pick = F.max_by
        else:
            cond = (lid[on] == right[on]) & (right[right_ts] >= lid[left_ts])
            if tolerance is not None:
                cond = cond & (
                    right[right_ts] <= lid[left_ts] + F.expr(f"INTERVAL {tolerance}")
                )
            pick = F.min_by
        joined = lid.join(broadcast(right), cond, "left")
        aggs = [F.first(lid[c], ignorenulls=False).alias(c) for c in left.columns]
        aggs += [pick(right[c], right[right_ts]).alias(c) for c in right_cols]
        return joined.groupBy("__lid").agg(*aggs).drop("__lid")

    # union/window strategy: one shuffle on `on`, ordered nearest-carry.
    tag_l = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(
            right.select(F.struct(*[F.col(c) for c in right_cols])).schema[0].dataType
        ).alias("__r"),
    )
    tag_r = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in left.columns])).schema[0].dataType
        ).alias("__l"),
        F.struct(*[F.col(c) for c in right_cols]).alias("__r"),
    )
    unioned = tag_l.unionByName(tag_r)
    # Time runs ascending for backward, descending for forward, so the
    # "nearest eligible right row" is always the last one seen.  Right rows
    # sort before left rows at equal timestamps either way, so a tick AT
    # the right row's timestamp sees it (<= / >= semantics).
    t_order = F.col("__t").asc() if backward else F.col("__t").desc()
    w = (
        Window.partitionBy("__k")
        .orderBy(t_order, F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "__r_t", F.last(F.when(F.col("__is_left") == 0, F.col("__t")), ignorenulls=True).over(w)
    ).withColumn("__rf", F.last("__r", ignorenulls=True).over(w))
    out = carried.filter(F.col("__is_left") == 1)
    if tolerance is not None:
        if backward:
            far = F.col("__r_t") < F.col("__t") - F.expr(f"INTERVAL {tolerance}")
        else:
            far = F.col("__r_t") > F.col("__t") + F.expr(f"INTERVAL {tolerance}")
        out = out.withColumn(
            "__rf", F.when(far, F.lit(None)).otherwise(F.col("__rf"))
        )
    return out.select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        *[F.col(f"__rf.{c}").alias(c) for c in right_cols],
    )
