"""Z-order (Morton-curve) multi-dimensional clustering layout.

A date-partitioned or single-column-sorted layout (q133/q135) skips
files for predicates on THE sort column only; a selective predicate on
a second column still touches every file.  Z-ordering interleaves the
bits of two (rank- or value-normalized) columns so rows close in BOTH
dimensions land in the same files — the data-skipping layout Delta
Lake's `OPTIMIZE ZORDER BY` and Iceberg's z-order rewrite use for
multi-dimensional filter workloads.

Design (all integer arithmetic, engine-portable to the DuckDB oracle):

- ``tile``: value-normalized ``(v - mn) * 2^bits div span`` in
  ``[0, 2^bits)``.  Value normalization (vs ntile ranks) keeps the
  plan shuffle-free: the only global state is one min/max aggregate
  broadcast back into the scan, where an ntile rank would force a
  single-partition global window — the exact thing a 100 TB layout
  rewrite cannot do.  Skewed columns would prefer rank tiles; at
  cluster scale that is approx_percentile bucket edges, still a
  scalar broadcast, not a global sort.
- ``z``: classic bit interleave, a-bits on odd positions, b on even.
- ``file_id``: equal-width cut of z-space into ``n_files`` ranges.
  Equal-width (not equal-rows) keeps assignment a pure per-row
  function — no global row_number.  At deployment scale the same
  expression feeds ``repartitionByRange(zval)`` + per-range writers;
  file row-count balance then comes from range sampling.

The write itself is one hash ``repartition(file_id)`` + partitioned
write — one file per ``file_id=`` dir (each dir's rows live in exactly
one task, the bucketed-write trick from sources/bucketed.py), linear,
no Python.

100 TB: one pass to compute 4 scalars, one shuffle to co-locate each
output file's rows, one write.  Reads then prune by parquet footer
min/max: a box predicate on BOTH dimensions touches ~(box area /
z-range per file) files instead of the ~(box width) a single-column
sort gives.  q140 measures exactly that, deterministically, from the
written files.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "z_interleave",
    "z_interleave_n",
    "zorder_file_assign",
    "rank_tile_map",
    "rank_zorder_file_assign",
    "linear_file_assign",
    "write_layout",
]


def z_interleave_n(tiles: list[Column], bits: int) -> Column:
    """n-dimensional Morton interleave: bit i of tiles[d] lands at
    position ``i*n + (n-1-d)`` — earlier columns take the more
    significant position within each bit group, so for n=2 this is
    exactly the classic a-odd/b-even layout ``z_interleave`` documents.
    The result needs ``bits * n`` bits; with a long target that bounds
    ``bits * len(tiles) <= 63`` (8 bits x up to 7 dims), enforced here
    rather than silently wrapping."""
    n = len(tiles)
    if n == 0:
        raise ValueError("tiles must be non-empty")
    if bits * n > 63:
        raise ValueError(
            f"bits*dims = {bits * n} exceeds a long's 63 usable bits"
        )
    z = F.lit(0).cast("long")
    for i in range(bits):
        for d, t in enumerate(tiles):
            pos = i * n + (n - 1 - d)
            z = z + F.shiftleft(
                F.shiftright(t, i).bitwiseAND(F.lit(1)), pos
            )
    return z


def z_interleave(tile_a: Column, tile_b: Column, bits: int) -> Column:
    """Morton interleave: bit i of a -> position 2i+1, of b -> 2i (the
    2-dim case of ``z_interleave_n``)."""
    return z_interleave_n([tile_a, tile_b], bits)


def zorder_file_assign(
    df: DataFrame,
    col_a: str,
    col_b: str,
    bits: int = 8,
    n_files: int = 64,
) -> DataFrame:
    """Add ``tile_a``/``tile_b``/``zval``/``file_id`` columns.

    ``file_id = zval * n_files div 2^(2*bits)`` — equal-width z-range
    per file.  The min/max scalars come from one aggregate broadcast
    into the row expressions (no global window, no collect).
    """
    stats = df.agg(
        F.min(col_a).cast("long").alias("_mn_a"),
        F.max(col_a).cast("long").alias("_mx_a"),
        F.min(col_b).cast("long").alias("_mn_b"),
        F.max(col_b).cast("long").alias("_mx_b"),
    )
    j = df.crossJoin(F.broadcast(stats))
    # Spark `div` truncates, DuckDB `//` floors — identical on the
    # non-negative operands here (v >= mn, span >= 1).
    ta = F.expr(
        f"(CAST({col_a} AS BIGINT) - _mn_a) * {1 << bits} div "
        f"(_mx_a - _mn_a + 1)"
    ).alias("tile_a")
    tb = F.expr(
        f"(CAST({col_b} AS BIGINT) - _mn_b) * {1 << bits} div "
        f"(_mx_b - _mn_b + 1)"
    ).alias("tile_b")
    return _finish_z(j.select(*df.columns, ta, tb), bits, n_files)


def _finish_z(out: DataFrame, bits: int, n_files: int) -> DataFrame:
    """tile_a/tile_b -> zval -> equal-width file_id (shared tail of the
    value- and rank-tile assigners)."""
    out = out.withColumn(
        "zval", z_interleave(F.col("tile_a"), F.col("tile_b"), bits)
    )
    return out.withColumn(
        "file_id",
        F.expr(f"zval * {n_files} div {1 << (2 * bits)}").cast("int"),
    )


def rank_tile_map(df: DataFrame, col: str, bits: int = 8) -> DataFrame:
    """Exact equal-FREQUENCY tile map ``(col, tile_<col>)`` over the
    column's distinct-value domain: ``tile = rows_before * 2^bits div
    total`` (rows_before = exact count of rows with a smaller value).

    Value-width tiles (``zorder_file_assign``) lose resolution on
    skewed columns — the dense region collapses into one tile, so a
    box predicate there can't prune.  Rank tiles equalize ROWS per
    tile, restoring pruning granularity exactly where the data is.

    Scale envelope: the map is domain-sized, not corpus-sized — one
    groupBy(col) shuffle, then ONE single-partition window over the
    DISTINCT values to accumulate counts.  Fine for domains up to
    ~1e8 distinct values; an unbounded-domain column would use
    ``approx_percentile`` edges instead (same broadcast-map shape,
    approximate cut points — not hash-gateable cross-engine, which is
    why the gated operator is the exact map).  The map then broadcast-
    joins into the corpus scan: the corpus itself never shuffles for
    tiling."""
    counts = df.groupBy(col).agg(F.count("*").alias("_n"))
    w_prev = (
        Window.orderBy(col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = Window.orderBy(col).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return counts.select(
        F.col(col),
        F.coalesce(F.sum("_n").over(w_prev), F.lit(0)).alias("_cum"),
        F.sum("_n").over(w_all).alias("_tot"),
    ).select(
        col,
        F.expr(f"_cum * {1 << bits} div _tot").alias(f"tile_{col}"),
    )


def rank_zorder_file_assign(
    df: DataFrame,
    col_a: str,
    col_b: str,
    bits: int = 8,
    n_files: int = 64,
) -> DataFrame:
    """Rank-tile (equal-frequency) z-order: like ``zorder_file_assign``
    but each dimension's tile is its exact data rank, so every tile
    holds ~the same row count regardless of skew.  The two tile maps
    are domain-sized scalars broadcast into the scan — the corpus pays
    the same single co-location shuffle as the value-tile path.

    NULL handling: ``rank_tile_map``'s groupBy keeps NULL as its own
    domain value and the tile joins are null-safe (``eqNullSafe``), so
    NULL-valued rows are assigned the lowest tile (NULLS FIRST rank)
    and the output row count ALWAYS equals the input's — the same
    row-preservation contract as the value-tile assigner, which maps
    NULL to a null tile instead of dropping the row."""
    map_a = rank_tile_map(df, col_a, bits).withColumnRenamed(
        f"tile_{col_a}", "tile_a"
    ).withColumnRenamed(col_a, "_key_a")
    map_b = rank_tile_map(df, col_b, bits).withColumnRenamed(
        f"tile_{col_b}", "tile_b"
    ).withColumnRenamed(col_b, "_key_b")
    j = df.join(
        F.broadcast(map_a), F.col(col_a).eqNullSafe(F.col("_key_a"))
    ).join(F.broadcast(map_b), F.col(col_b).eqNullSafe(F.col("_key_b")))
    return _finish_z(j.select(*df.columns, "tile_a", "tile_b"), bits, n_files)


def linear_file_assign(
    df: DataFrame,
    col_a: str,
    col_b: str,
    bits: int = 8,
    n_files: int = 64,
) -> DataFrame:
    """Single-column (col_a) sorted layout baseline: the SAME tile
    normalization, but ``file_id`` cuts tile_a space only — what a
    plain ``sortBy(col_a)`` table gives a reader.  tile_b is carried
    so q140's box math is layout-symmetric."""
    assigned = zorder_file_assign(df, col_a, col_b, bits=bits, n_files=n_files)
    return assigned.withColumn(
        "file_id",
        F.expr(f"tile_a * {n_files} div {1 << bits}").cast("int"),
    )


def write_layout(df: DataFrame, path: str) -> None:
    """Materialize a file assignment: one parquet file per ``file_id=``
    dir.  ``repartition(file_id)`` puts each dir's rows in exactly one
    task, so each dir gets exactly one file (footer min/max = the
    layout's skipping contract; tests/test_zorder.py verifies the
    footers)."""
    (
        df.repartition("file_id")
        .write.mode("overwrite")
        .partitionBy("file_id")
        .parquet(path)
    )
