"""Interval x interval OVERLAP join via bin decomposition — the pair-
materializing sibling of ``range_count_binned`` (operators/rangejoin.py
counts points per interval; this joins two interval SETS and emits
each overlapping pair once with its exact overlap duration — the
IEJoin / interval-join workload every temporal warehouse exposes).

The naive formulation is the non-equi join ``a.lo <= b.hi AND b.lo <=
a.hi`` — a BroadcastNestedLoop/Cartesian plan, quadratic in interval
density.  The bin rewrite makes it an equi-join: each interval
explodes to the time bins it covers (``span/bin_seconds`` rows), bins
equi-join, and each overlapping pair is kept exactly once at the
FIRST bin the two share — ``bin == greatest(a_lo_bin, b_lo_bin)``, a
deterministic dedup predicate requiring no distinct.  Overlap length
is then exact int64 microseconds ``least(hi) - greatest(lo)``.

Correctness: intervals overlap (touching included) iff their bin
ranges intersect AND the time test passes; the first shared bin is
unique per pair, so no pair is emitted twice; a shared bin with no
time overlap is filtered by the exact predicate.  The hash gate's
oracle IS the naive non-equi join.

Scale shape: per-bin candidate volume is |A in bin| x |B in bin| —
pick ``bin_seconds`` near the median interval span (the
rangejoin.py tuning note applies verbatim); fan-out per interval is
span/bin rows.  Both knobs trade against each other exactly as in
range_count_binned; the join itself is an equi-join AQE can plan,
skew-split, or co-locate on a bucketed bin column.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_overlap_binned"]


def _binned(
    df: DataFrame,
    lo_col: str,
    hi_col: str,
    keep: Sequence[str],
    width_us: int,
    side: str,
) -> DataFrame:
    lo_bin = F.expr(f"unix_micros({lo_col}) div {width_us}")
    hi_bin = F.expr(f"unix_micros({hi_col}) div {width_us}")
    return df.select(
        *[F.col(c).alias(f"{side}_{c}") for c in keep],
        F.expr(f"unix_micros({lo_col})").alias(f"{side}_lo_us"),
        F.expr(f"unix_micros({hi_col})").alias(f"{side}_hi_us"),
        lo_bin.alias(f"{side}_lo_bin"),
        F.explode(F.sequence(lo_bin, hi_bin)).alias("_bin"),
    )


def interval_overlap_binned(
    left: DataFrame,
    right: DataFrame,
    lo_col: str = "lo",
    hi_col: str = "hi",
    left_keys: Sequence[str] = ("id",),
    right_keys: Sequence[str] = ("id",),
    bin_seconds: int = 3600,
) -> DataFrame:
    """Every (left, right) interval pair with ``left.lo <= right.hi AND
    right.lo <= left.hi`` (touching counts, overlap_us >= 0), emitted
    once, with the exact int64-microsecond overlap:
    (``l_<keys>``, ``r_<keys>``, overlap_us).  NULL-bounded intervals
    match nothing (the comparison predicate is NULL)."""
    width = int(bin_seconds) * 1_000_000
    a = _binned(left, lo_col, hi_col, left_keys, width, "l")
    b = _binned(right, lo_col, hi_col, right_keys, width, "r")
    joined = a.join(b, "_bin").where(
        # each pair exactly once: at the first bin both cover
        (F.col("_bin") == F.greatest("l_lo_bin", "r_lo_bin"))
        # exact overlap test (bins are necessary, not sufficient)
        & (F.col("l_lo_us") <= F.col("r_hi_us"))
        & (F.col("r_lo_us") <= F.col("l_hi_us"))
    )
    return joined.select(
        *[f"l_{c}" for c in left_keys],
        *[f"r_{c}" for c in right_keys],
        (
            F.least("l_hi_us", "r_hi_us") - F.greatest("l_lo_us", "r_lo_us")
        ).cast("long").alias("overlap_us"),
    )
