"""Bin-decomposed range (point-in-interval) join.

A pure non-equi join — ``points JOIN intervals ON p.ts BETWEEN i.lo
AND i.hi`` — gives Catalyst no equi-key, so the physical plan is
BroadcastNestedLoopJoin (when one side fits the broadcast threshold)
or a CartesianProduct: O(|points| x |intervals|) comparisons, the
classic 100 TB cliff.  The standard rewrite decomposes time into
fixed-width bins:

- each point belongs to exactly ONE bin (``epoch_us div width``);
- each interval is exploded to the bins it covers
  (``sequence(lo_bin, hi_bin)`` — bounded by span/width + 1 rows);
- an ordinary equi-join on the bin meets every qualifying
  (interval, point) pair exactly once (in the point's bin — no
  post-join dedup needed), and the BETWEEN residual is evaluated
  only within bins.

Cost: shuffle(points, by bin) + shuffle(intervals x fanout, by bin) +
per-bin hash join — linear in data for time-bounded intervals.  Pick
``bin_seconds`` near the median interval span: much smaller inflates
the interval fan-out, much larger inflates the per-bin candidate set.
Skewed bins (hot hours) are AQE's skew-join case, not a plan defect.

The join is on integer bin ids derived from exact microsecond
epochs, so results are engine-exact — the DuckDB twin can be the
naive non-equi join itself (IEJoin), making the rewrite hash-gateable:
a pass proves the decomposition loses and invents nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["range_join_binned", "range_count_binned"]


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    lo_col: str,
    hi_col: str,
    bin_seconds: int = 3600,
) -> DataFrame:
    """Equi-join rewrite of ``point_ts BETWEEN lo_col AND hi_col``.

    Returns the matched pairs — all columns of ``points`` plus all
    columns of ``intervals`` (names must be disjoint) — one row per
    qualifying (point, interval) pair.  Intervals are CLOSED on both
    ends; ``hi >= lo`` is assumed (zero-length intervals match points
    at exactly ``lo``).
    """
    # `div` is exact int64 division — a float `/` + floor() can land one
    # bin off when the quotient sits within an ulp of an integer.
    width = int(bin_seconds) * 1_000_000
    p = points.withColumn(
        "_bin", F.expr(f"unix_micros({point_ts}) div {width}")
    )
    iv = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.expr(f"unix_micros({lo_col}) div {width}"),
                F.expr(f"unix_micros({hi_col}) div {width}"),
            )
        ),
    )
    return (
        p.join(iv, "_bin")
        .where(
            (F.col(point_ts) >= F.col(lo_col))
            & (F.col(point_ts) <= F.col(hi_col))
        )
        .drop("_bin")
    )


def range_count_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    lo_col: str,
    hi_col: str,
    bin_seconds: int = 3600,
) -> DataFrame:
    """COUNT of points in each interval without materializing pairs.

    ``range_join_binned`` meets every qualifying pair, so its work is
    the matched-pair volume — |intervals| x point-density, QUADRATIC
    in a uniform scale-up of both (measured 16x data -> ~30x compute
    on the fixture).  When the query only needs the count, interior
    bins can be pre-aggregated: a bin strictly inside (lo_bin, hi_bin)
    lies entirely within the CLOSED interval, so it contributes its
    whole per-bin count as ONE row; only the two boundary bins need
    row-level BETWEEN checks.  Work drops to

        |intervals| x span/bin        (interior, pre-counted)
      + |intervals| x 2 x bin-density (boundary rows)

    — ``bin_seconds`` trades the two terms (smaller bins: more
    interior rows, fewer boundary candidates).  Both terms are linear
    in each input; the density-squared pair term is gone.

    Returns ``intervals`` (all columns, which must uniquely identify
    an interval) + ``n_in_range`` (0 for empty intervals).  Exact —
    interior/boundary bins partition the candidate set, so nothing is
    double-counted.

    The uniqueness requirement is ENFORCED, not assumed: contributions
    are grouped and re-attached by the full interval row, so duplicate
    interval rows would silently double-count — instead the operator
    raises at execution time when it meets one (the guard rides the
    output expression, so Catalyst cannot prune it).  Interval rows
    carrying NULLs are handled exactly (GROUP BY and the null-safe
    re-attach join both treat NULL as a value); an interval whose
    ``lo``/``hi`` is NULL matches nothing (SQL BETWEEN semantics) and
    surfaces with ``n_in_range = 0``.
    """
    width = int(bin_seconds) * 1_000_000
    iv_cols = intervals.columns
    # NB: the interval frame feeds three consumers, which LOOKS like a
    # lineage-cut candidate (the q159 idiom) — measured the other way:
    # a localCheckpoint here regressed the 16x probe 28.4 -> 43.8 s,
    # because the checkpoint leaf hides size/partitioning from AQE's
    # join planning of the bin joins, while Spark already dedupes the
    # upstream aggregation via ReusedExchange.  Cut upstream of the
    # OPERATOR only when the caller's interval build is expensive and
    # opaque; never inside it.
    iv = intervals.withColumn(
        "_lo_bin", F.expr(f"unix_micros({lo_col}) div {width}")
    ).withColumn("_hi_bin", F.expr(f"unix_micros({hi_col}) div {width}"))

    p = points.select(
        F.col(point_ts).alias("_p_ts"),
        F.expr(f"unix_micros({point_ts}) div {width}").alias("_bin"),
    )
    per_bin = p.groupBy("_bin").agg(F.count(F.lit(1)).alias("_cnt"))

    interior = (
        iv.withColumn(
            "_bin",
            F.explode(
                F.when(
                    F.col("_hi_bin") > F.col("_lo_bin") + F.lit(1),
                    F.sequence(
                        F.col("_lo_bin") + F.lit(1),
                        F.col("_hi_bin") - F.lit(1),
                    ),
                ).otherwise(F.array().cast("array<long>"))
            ),
        )
        .join(per_bin, "_bin")
        .select(*iv_cols, F.col("_cnt"))
    )
    boundary = (
        iv.withColumn(
            "_bin",
            F.explode(
                F.array_distinct(F.array(F.col("_lo_bin"), F.col("_hi_bin")))
            ),
        )
        .join(p, "_bin")
        .where(
            (F.col("_p_ts") >= F.col(lo_col))
            & (F.col("_p_ts") <= F.col(hi_col))
        )
        .select(*iv_cols, F.lit(1).cast("long").alias("_cnt"))
    )
    counts = (
        interior.unionByName(boundary)
        .groupBy(*iv_cols)
        .agg(F.sum("_cnt").alias("n_in_range"))
    )
    # Re-attach by the full interval row.  GROUP BY treats NULL as a
    # value, so the left side is the distinct interval rows + a
    # duplicate tally; eqNullSafe keys make NULL-carrying rows join
    # back instead of silently zeroing (a name-list join drops them).
    # The counts side's keys are renamed so the self-derived join
    # condition can never be attribute-ambiguous.  The helper names
    # are derived from a prefix CHECKED against the caller's interval
    # columns (an intervals frame already carrying e.g. ``_n_dup``
    # must not collide into a duplicate-attribute error).
    tag = "_rj"
    while any(c.startswith(tag) for c in iv_cols):
        tag += "x"
    dup_col = f"{tag}_dup"
    base = intervals.groupBy(*iv_cols).agg(
        F.count(F.lit(1)).alias(dup_col)
    )
    renamed = counts.select(
        *[F.col(c).alias(f"{tag}_k{i}") for i, c in enumerate(iv_cols)],
        "n_in_range",
    )
    cond = None
    for i, c in enumerate(iv_cols):
        eq = F.col(c).eqNullSafe(F.col(f"{tag}_k{i}"))
        cond = eq if cond is None else (cond & eq)
    guarded = F.when(
        F.col(dup_col) > 1,
        F.raise_error(
            F.lit(
                "range_count_binned: duplicate interval rows — interval "
                "columns must uniquely identify an interval (tag a "
                "surrogate id); refusing to double-count"
            )
        ).cast("long"),
    ).otherwise(F.coalesce(F.col("n_in_range"), F.lit(0)).cast("long"))
    return base.join(renamed, cond, "left").select(
        *iv_cols, guarded.alias("n_in_range")
    )
