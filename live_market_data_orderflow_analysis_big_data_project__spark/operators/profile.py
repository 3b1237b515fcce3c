"""Single-pass column profiling — the dataset-audit operator a
training-data pipeline runs before anything else touches a drop.

One ``agg`` computes, for every declared column: row count, null
count, EXACT distinct count, canonical min/max strings, and an exact
integer sum anchor (ints summed as-is, 2-decimal money through the
cents cast) — the Deequ/completeness-check shape, emitted as one row
per column so downstream constraint checks are plain filters.

Canonical strings keep the hash gate engine-exact: integers and exact
cents render identically in Spark and DuckDB; strings compare/render
in binary collation on both; timestamps go through the shared
second-precision format (hashstable.py convention: never raw
timestamp values).

At 100 TB: one job, two scan subtrees (see the in-function note: a
fused single agg is POISONED by string min/max buffers into a
SortAggregate keyed by all k distinct expressions — 8× slower
measured).  The min/max/sum pass is a keyless fold; the distinct
pass is Spark's Expand (each row re-emitted once per distinct
column) feeding partial-then-final hash aggregates, so the shuffle
carries only per-partition distinct partials.  At corpus scale swap
``exact_distinct=False`` for approx_count_distinct (HLL,
constant-size partials) — same plan shape, no k× expand.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .robust import cents

__all__ = ["profile_columns"]

_KINDS = ("int", "cents", "str", "ts")


def _canon(kind: str, col):
    """Canonical cross-engine string rendering of a min/max value."""
    if kind == "ts":
        return F.date_format(col, "yyyy-MM-dd HH:mm:ss")
    return col.cast("string")


def profile_columns(
    df: DataFrame,
    specs: list[tuple[str, str]],
    exact_distinct: bool = True,
) -> DataFrame:
    """Profile ``specs`` = [(column_name, kind)] in one aggregation.

    kind ∈ ``int`` (exact integer), ``cents`` (2-decimal money,
    audited in integer cents), ``str`` (binary collation), ``ts``
    (second-precision canonical format).  Output one row per column:
    ``col_name``, ``n_rows``, ``n_null``, ``n_distinct``,
    ``min_str``/``max_str`` (canonical, NULL on all-null columns),
    ``sum_anchor`` (exact int64 — NULL for str/ts kinds).
    """
    # TWO aggregations, not one: mixing k count_distinct's with
    # min/max over STRING columns poisons the whole Expand plan —
    # string-typed aggregate buffers are not hash-aggregable, so Spark
    # falls back to a SortAggregate KEYED BY ALL k DISTINCT EXPRESSIONS
    # over the k×-expanded input (measured 29 s vs 3.6 s on the sf0.1
    # fixture).  Split, each pass gets its best plan: the distinct pass
    # is Expand + HashAggregate (long-only buffers), the min/max/sum
    # pass is a keyless fold (SortAggregate with an empty key — no
    # sort).  The two one-row frames recombine with a trivial join.
    simple, dist, packs = [], [], []
    for name, kind in specs:
        if kind not in _KINDS:
            raise ValueError(f"unknown kind {kind!r} for {name!r}")
        base = cents(name) if kind == "cents" else F.col(name)
        dist.append(
            (
                F.count_distinct(base)
                if exact_distinct
                else F.approx_count_distinct(base)
            ).alias(f"_{name}_dist")
        )
        simple += [
            F.count(F.lit(1)).alias(f"_{name}_rows"),
            F.count(base).alias(f"_{name}_nn"),
            # min/max over the VALUE (typed ordering), rendered to the
            # canonical string only in the pack stage — a lexicographic
            # min of "10" vs "9" would be wrong for numeric kinds.
            F.min(base).alias(f"_{name}_min"),
            F.max(base).alias(f"_{name}_max"),
            (
                F.sum(base).cast("long")
                if kind in ("int", "cents")
                else F.max(F.lit(None).cast("long"))
            ).alias(f"_{name}_sum"),
        ]
        packs.append(
            F.struct(
                F.lit(name).alias("col_name"),
                F.col(f"_{name}_rows").alias("n_rows"),
                (F.col(f"_{name}_rows") - F.col(f"_{name}_nn")).alias(
                    "n_null"
                ),
                F.col(f"_{name}_dist").alias("n_distinct"),
                _canon(kind, F.col(f"_{name}_min")).alias("min_str"),
                _canon(kind, F.col(f"_{name}_max")).alias("max_str"),
                F.col(f"_{name}_sum").alias("sum_anchor"),
            )
        )
    one = df.agg(*simple).join(F.broadcast(df.agg(*dist)))
    return one.select(F.explode(F.array(*packs)).alias("p")).select("p.*")
