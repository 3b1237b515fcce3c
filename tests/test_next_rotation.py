"""Staged next-rotation gate entries (queries/staging.py) run against
their DuckDB twins with the EXACT driver compare — row count, sorted
column names, order-insensitive value hash via tools/check_oracle's
normalization — so promotion into queries()/oracle_sql() in the next
window rotation is a pre-verified dict move."""

from __future__ import annotations

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo/tools")

from check_oracle import TABLES, hash_rows  # noqa: E402

from live_market_data_orderflow_analysis_big_data_project__spark.queries.staging import (  # noqa: E501
    STAGED_ORACLE,
    STAGED_QUERIES,
)

from conftest import SF0001, SF001


# Two DISTINCT sfs standing (the q123 lesson: a gate that passes at one
# scale only is rot waiting to happen); sf0.1 verified by hand each
# time the staged set changes (recorded in the staging commits).
# NB: conftest's SF001 is sf0.01 — the first revision of this list
# wrote (SF001, ".../sf0.01") and ran the same sf twice.
SFS = (SF0001, SF001)
assert len(set(SFS)) == 2


@pytest.fixture(scope="module", params=SFS, ids=lambda p: p.rsplit("/", 1)[1])
def sf_and_duck(request):
    sf = request.param
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    yield sf, con
    con.close()


def test_every_staged_entry_has_an_oracle():
    assert set(STAGED_QUERIES) == set(STAGED_ORACLE)


@pytest.mark.parametrize("key", sorted(STAGED_QUERIES))
def test_staged_entry_hash_matches_oracle(spark, sf_and_duck, key):
    sf, duck = sf_and_duck
    spdf = STAGED_QUERIES[key](spark, sf).toPandas()
    scols = list(spdf.columns)
    srows = list(spdf.itertuples(index=False, name=None))

    dpdf = duck.execute(STAGED_ORACLE[key]).df()
    dcols = list(dpdf.columns)
    drows = list(dpdf.itertuples(index=False, name=None))

    assert len(srows) == len(drows), (key, sf, len(srows), len(drows))
    assert sorted(scols) == sorted(dcols), (key, scols, dcols)
    assert hash_rows(scols, srows) == hash_rows(dcols, drows), (key, sf)
    assert len(srows) > 0, key
