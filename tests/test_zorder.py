"""Z-order layout (operators/zorder.py + q140): the written files must
physically carry the skipping contract the query computes — one file per
``file_id=`` dir, parquet footer min/max per file equal to the
assignment's per-file tile bounds, and the both-dims box touching no
more z-ordered files than single-column-sorted files."""

from __future__ import annotations

import glob
import os
import tempfile

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from live_market_data_orderflow_analysis_big_data_project__spark.operators.zorder import (
    linear_file_assign,
    rank_tile_map,
    rank_zorder_file_assign,
    write_layout,
    z_interleave,
    z_interleave_n,
    zorder_file_assign,
)
from live_market_data_orderflow_analysis_big_data_project__spark.queries.pblock import (
    q140_zorder_layout,
    q140b_zorder_rank_tiles,
)
from live_market_data_orderflow_analysis_big_data_project__spark.sources.tables import (
    load_table,
)

SF0001 = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def z_written(spark):
    li = load_table(spark, SF0001, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    )
    assigned = zorder_file_assign(
        li, "l_partkey", "l_suppkey", bits=8, n_files=64
    )
    path = os.path.join(tempfile.mkdtemp(prefix="zorder_"), "z")
    write_layout(assigned, path)
    return assigned, path


def test_one_file_per_bucket_dir(z_written):
    _, path = z_written
    dirs = glob.glob(os.path.join(path, "file_id=*"))
    assert len(dirs) > 0
    for d in dirs:
        files = glob.glob(os.path.join(d, "*.parquet"))
        assert len(files) == 1, f"{d}: expected exactly one file"


def test_footer_minmax_matches_assignment(z_written):
    """Parquet footer stats per file == the assignment's per-file tile
    bounds — what a pruning reader actually sees is exactly what q140's
    oracle-verified math claims."""
    assigned, path = z_written
    expected = {
        row["file_id"]: row
        for row in assigned.groupBy("file_id")
        .agg(
            F.min("tile_a").alias("mn_a"),
            F.max("tile_a").alias("mx_a"),
            F.min("tile_b").alias("mn_b"),
            F.max("tile_b").alias("mx_b"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    seen = 0
    for d in glob.glob(os.path.join(path, "file_id=*")):
        fid = int(d.rsplit("=", 1)[1])
        f = glob.glob(os.path.join(d, "*.parquet"))[0]
        md = pq.ParquetFile(f).metadata
        cols = {
            md.schema.column(i).name: i for i in range(md.num_columns)
        }
        mins = {"tile_a": None, "tile_b": None}
        maxs = {"tile_a": None, "tile_b": None}
        nrows = 0
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            nrows += g.num_rows
            for c in ("tile_a", "tile_b"):
                st = g.column(cols[c]).statistics
                assert st is not None and st.has_min_max
                mins[c] = (
                    st.min if mins[c] is None else min(mins[c], st.min)
                )
                maxs[c] = (
                    st.max if maxs[c] is None else max(maxs[c], st.max)
                )
        e = expected[fid]
        assert (mins["tile_a"], maxs["tile_a"]) == (e["mn_a"], e["mx_a"])
        assert (mins["tile_b"], maxs["tile_b"]) == (e["mn_b"], e["mx_b"])
        assert nrows == e["n"]
        seen += 1
    assert seen == len(expected)


def test_zorder_skips_at_least_as_well_as_linear(spark):
    res = {
        r["layout"]: r for r in q140_zorder_layout(spark, SF0001).collect()
    }
    z, lin = res["zorder"], res["linear"]
    assert z["n_rows"] == lin["n_rows"]
    assert z["rows_in_box"] == lin["rows_in_box"]
    assert z["files_touched"] <= lin["files_touched"]
    # the box is selective on both dims — the z layout must actually
    # prune, not merely tie (1 vs 8 on every fixture sf, pinned loosely)
    assert z["files_touched"] < lin["files_touched"]


def test_linear_assignment_cuts_tile_a_only(spark):
    li = load_table(spark, SF0001, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    )
    lin = linear_file_assign(li, "l_partkey", "l_suppkey", bits=8, n_files=64)
    bad = lin.groupBy("file_id").agg(
        (F.max("tile_a") - F.min("tile_a")).alias("spread")
    )
    # equal-width cut of 256 tiles into 64 files -> 4-tile spread max
    assert bad.filter(F.col("spread") >= 4).count() == 0


def test_z_interleave_n_known_codes(spark):
    """Hand-computed Morton codes: 2-dim must equal the classic layout
    (and the z_interleave wrapper), 3-dim must place bit i of dim d at
    position i*3 + (2-d)."""
    df = spark.createDataFrame(
        [(3, 5, 6)], "a long, b long, c long"
    )
    r = df.select(
        z_interleave_n([F.col("a"), F.col("b")], 3).alias("z2"),
        z_interleave(F.col("a"), F.col("b"), 3).alias("z2w"),
        z_interleave_n([F.col("a"), F.col("b"), F.col("c")], 3).alias("z3"),
    ).collect()[0]
    # a=0b011, b=0b101 -> interleave a-odd/b-even: 0b001111 +
    # check digit by digit: bits (a2 b2 a1 b1 a0 b0) = 0 1 1 0 1 1
    assert r["z2"] == 0b011011
    assert r["z2w"] == r["z2"]
    # 3-dim: groups (a_i b_i c_i) from msb i=2: a=011 b=101 c=110
    # i2: a0? a2=0 b2=1 c2=1 -> 011 ; i1: a1=1 b1=0 c1=1 -> 101
    # i0: a0=1 b0=1 c0=0 -> 110  => 0b011101110
    assert r["z3"] == 0b011101110


def test_z_interleave_n_bounds():
    import pytest as _pytest

    with _pytest.raises(ValueError):
        z_interleave_n([], 8)
    with _pytest.raises(ValueError):
        z_interleave_n([F.lit(1)] * 8, 8)  # 64 bits > 63


def test_rank_tile_map_exact_ranks(spark):
    """Equal-frequency tiles: tile = exact rows-before * 2^bits div
    total, ties (equal values) share a tile, output is one row per
    distinct value."""
    df = spark.createDataFrame(
        [(v,) for v in [1, 1, 1, 1, 5, 5, 9, 100]], "v long"
    )
    m = {r["v"]: r["tile_v"] for r in rank_tile_map(df, "v", bits=3).collect()}
    # 8 rows, 2^3 tiles: rows_before 0,4,6,7 -> tiles 0,4,6,7
    assert m == {1: 0, 5: 4, 9: 6, 100: 7}


def test_rank_tiles_balance_rows_under_skew(spark):
    """On the heavy-tailed events.value, every rank tile must hold a
    near-equal row share, where value tiles concentrate most rows in
    the low tiles."""
    ev = load_table(spark, SF0001, "events").select(
        F.expr("CAST(floor(value * 100) AS BIGINT)").alias("v"),
        "user_id",
    )
    n = ev.count()
    rk = rank_zorder_file_assign(ev, "v", "user_id", bits=4, n_files=16)
    per_tile = rk.groupBy("tile_a").count().collect()
    # 16 tiles over 1000 rows: every rank tile within 2x of the mean
    assert all(abs(r["count"] - n / 16) < n / 16 for r in per_tile)
    vt = zorder_file_assign(ev, "v", "user_id", bits=4, n_files=16)
    top = vt.groupBy("tile_a").count().agg(F.max("count")).collect()[0][0]
    # the value layout's fattest tile holds >3x the mean — the skew
    # rank tiles are there to fix
    assert top > 3 * n / 16


def test_rank_layout_scans_fewer_rows_than_value(spark):
    """q140b's payoff, pinned: under skew the rank layout reads fewer
    ROWS for the same box (the value layout can win the file COUNT by
    hiding the dense region in few fat files — rows_scanned is the IO
    truth)."""
    res = {
        r["layout"]: r
        for r in q140b_zorder_rank_tiles(spark, SF0001).collect()
    }
    rk, val = res["rank"], res["value"]
    assert rk["n_rows"] == val["n_rows"]
    assert rk["rows_in_box"] == val["rows_in_box"]
    assert rk["rows_scanned"] < val["rows_scanned"]


def test_filtered_read_touches_only_overlapping_files(spark, z_written):
    """Runtime proof of the skipping contract: a Spark read of the
    written z-layout filtered to the tile box produces rows from no
    more files than the footer-overlap set q140 computes (1 z-file on
    every fixture sf)."""
    _, path = z_written
    lo, hi = 32, 63
    back = spark.read.parquet(path).filter(
        F.col("tile_a").between(lo, hi) & F.col("tile_b").between(lo, hi)
    )
    touched_files = {
        r["f"]
        for r in back.select(
            F.input_file_name().alias("f")
        ).distinct().collect()
    }
    assert len(touched_files) >= 1
    # overlap set from the same per-file bounds the footers carry
    per_file = (
        spark.read.parquet(path)
        .groupBy("file_id")
        .agg(
            F.min("tile_a").alias("mn_a"), F.max("tile_a").alias("mx_a"),
            F.min("tile_b").alias("mn_b"), F.max("tile_b").alias("mx_b"),
        )
        .collect()
    )
    overlapping = {
        r["file_id"]
        for r in per_file
        if r["mn_a"] <= hi and r["mx_a"] >= lo
        and r["mn_b"] <= hi and r["mx_b"] >= lo
    }
    got_ids = {
        int(f.split("file_id=")[1].split("/")[0]) for f in touched_files
    }
    assert got_ids <= overlapping
    assert len(got_ids) <= len(overlapping) <= 2


def test_rank_assign_preserves_null_rows(spark):
    """ADVICE r8: NULL-valued rows must not vanish from the written
    layout — the rank-tile joins are null-safe, NULL forms its own
    domain value and tiles lowest (NULLS FIRST rank), and the output
    row count always equals the input's (the value-tile path's
    row-preservation contract)."""
    rows = [(1, 10), (2, 20), (None, 30), (4, None), (None, None)]
    df = spark.createDataFrame(rows, "a long, b long")
    out = rank_zorder_file_assign(df, "a", "b", bits=2, n_files=4)
    got = out.collect()
    assert len(got) == len(rows)
    assert all(r["file_id"] is not None for r in got)
    # NULL ranks lowest: rows_before(NULL)=0 -> tile 0 on that axis
    by_ab = {(r["a"], r["b"]): (r["tile_a"], r["tile_b"]) for r in got}
    assert by_ab[(None, None)] == (0, 0)
    assert by_ab[(None, 30)][0] == 0
    assert by_ab[(4, None)][1] == 0
