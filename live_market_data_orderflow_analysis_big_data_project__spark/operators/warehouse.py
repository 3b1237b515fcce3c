"""Warehouse-maintenance operators: SCD2 dimension merge (upsert).

Spark-on-parquet has no transactional ``MERGE INTO`` (that is Delta/
Iceberg's ACID layer), but the MERGE's *relational core* — close out the
matched current rows, append new versions, carry the unmatched — is one
equi-join plus a union, and that is the part that must scale.  This
module implements the slowly-changing-dimension type-2 shape: a current
dimension snapshot merged with an update batch keyed by the dimension
key, emitting full version history (``valid_from`` / ``valid_to`` /
``is_current``).

100 TB design: ONE join on the dimension key, then the per-row version
fan-out is an ``explode(array_compact(...))`` — a NARROW op, so the
dimension is scanned once and joined once (a union-of-two-branches
formulation re-scans and re-joins the dim per branch; the executed
plan here has exactly one Join node, pinned in tests/test_warehouse).
In deployment the dimension table is bucketed by the key
(sources/bucketed.py), so only the — typically far smaller — update
batch shuffles; when the batch fits the broadcast threshold, hint it
broadcast and the dimension is never shuffled at all.  The physical
file replace that makes this atomic is the lakehouse layer's job; pair
with write_partitioned_parquet / compact_partitioned for the rewrite.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["scd2_merge"]


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    changes: Mapping[str, Column],
    eff_col: str,
    lo_date: str = "1992-01-01",
    hi_date: str = "9999-12-31",
    close_missing: str | None = None,
    skip_unchanged: bool = False,
) -> DataFrame:
    """SCD2 merge: version-history output of dim ⟕ updates.

    - ``updates`` carries ``key``, ``eff_col`` (effective date of the
      change) and whatever columns the ``changes`` expressions read.
    - ``changes`` maps dim column name -> its post-merge value
      expression (evaluated over the joined row).
    - Matched keys emit TWO rows: the closed-out old version
      (``valid_to = eff``, ``is_current = 0``) and the new current
      version (``valid_from = eff``, changed attrs, ``is_current=1``).
      Unmatched keys emit their single current row unchanged.
    - ``close_missing``: the ``WHEN NOT MATCHED BY SOURCE`` third of
      MERGE INTO.  When ``updates`` is a FULL snapshot (every key still
      alive appears in it), pass the snapshot's as-of date here and
      dim keys ABSENT from the batch are closed out instead of carried:
      they emit a single ``valid_to = close_missing, is_current = 0``
      row and no new current version — the delete/churn path.  ``None``
      (the default) is incremental-batch semantics: absence means "no
      change", the row carries through current.
    - ``skip_unchanged``: CDC no-op suppression.  When True, a matched
      key whose ``changes`` expressions all evaluate null-safely equal
      to the current attribute values emits NO new version — the row
      carries through current exactly as if unmatched (and in
      full-snapshot mode it is NOT churned: presence in the snapshot
      keeps it alive).  Prevents re-delivered/idempotent update feeds
      from growing version history with identical rows.

    Repeated maintenance: feed the PREVIOUS merge's current slice
    (``is_current = 1`` rows, history columns kept) back in as ``dim``
    — an existing ``valid_from`` column is carried through (the closed
    row keeps its real effective-from date instead of ``lo_date``);
    ``valid_to``/``is_current`` are recomputed and must not be passed
    as tracked attributes.  ``dim`` without history columns is the
    first-ever merge from a versionless snapshot.

    The delete path adds NO join and NO extra scan: it only changes
    which of the two per-row version structs are non-null before the
    narrow ``explode(array_compact(...))`` fan-out, so the one-join
    plan shape (pinned in tests/test_warehouse.py) is identical for
    all three MERGE branches.  Reference-parity anchor: the candle
    upsert shape, candle_to_hdfs.py:56-63.

    Dates are emitted as formatted strings (the engine's cross-engine
    hash convention).
    """
    if set(changes) & {"valid_from", "valid_to", "is_current"}:
        raise ValueError(
            "valid_from/valid_to/is_current are maintained by the merge "
            "and cannot be tracked attributes"
        )
    present = F.col(eff_col).isNotNull()
    # Normalize dim for repeated maintenance: carry the prior version's
    # valid_from; valid_to/is_current are recomputed below.
    if "valid_from" in dim.columns:
        dim = dim.withColumnRenamed("valid_from", "_prev_valid_from")
    else:
        dim = dim.withColumn("_prev_valid_from", F.lit(lo_date))
    dim = dim.drop("valid_to", "is_current")
    prev_from = F.col("_prev_valid_from")
    j = dim.join(updates, key, "left")
    dim_cols = [
        c for c in dim.columns if c not in (key, "_prev_valid_from")
    ]
    eff_str = F.date_format(F.col(eff_col), "yyyy-MM-dd")

    def version(attrs: Mapping[str, Column], vf: Column, vt: Column,
                cur: int) -> Column:
        return F.struct(
            *[attrs.get(c, F.col(c)).alias(c) for c in dim_cols],
            vf.alias("valid_from"),
            vt.alias("valid_to"),
            F.lit(cur).alias("is_current"),
        )

    if skip_unchanged:
        # no-op suppression: version only when some tracked attribute
        # actually changes (null-safe compare, so NULL->NULL is "same")
        diff = F.lit(False)
        for c, e in changes.items():
            diff = diff | ~e.eqNullSafe(F.col(c))
        apply = present & diff
    else:
        apply = present
    current = version(
        {c: F.when(apply, e).otherwise(F.col(c)) for c, e in changes.items()},
        F.when(apply, eff_str).otherwise(prev_from),
        F.lit(hi_date),
        1,
    )
    closed = F.when(apply, version({}, prev_from, eff_str, 0))
    if close_missing is not None:
        # full-snapshot semantics: keys ABSENT from the snapshot are
        # deletes — close them (single is_current=0 row), no current
        # version.  Present-but-unchanged keys (skip_unchanged) stay
        # alive: presence in the snapshot keeps them current.
        current = F.when(present, current)
        closed = F.when(apply, version({}, prev_from, eff_str, 0)).otherwise(
            F.when(~present, version({}, prev_from, F.lit(close_missing), 0))
        )
    exploded = j.select(
        F.col(key),
        F.explode(F.array_compact(F.array(current, closed))).alias("_v"),
    )
    return exploded.select(
        key,
        *[F.col(f"_v.{c}") for c in dim_cols],
        "_v.valid_from",
        "_v.valid_to",
        "_v.is_current",
    )
