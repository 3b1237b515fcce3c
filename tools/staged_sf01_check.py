"""Hand-run the staged-pool hash gates at sf0.1 (the third sf the
pytest 2-sf gate doesn't cover — part of the staging evidence class).

Usage: python tools/staged_sf01_check.py [key ...]   # default: all staged
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, "/root/repo")

from check_oracle import TABLES, hash_rows  # noqa: E402  (same dir)

SF = "/root/testdata/sf0.1"


def main() -> int:
    keys = sys.argv[1:]

    from live_market_data_orderflow_analysis_big_data_project__spark import (
        get_spark,
    )
    from live_market_data_orderflow_analysis_big_data_project__spark.queries.staging import (  # noqa: E501
        STAGED_ORACLE,
        STAGED_QUERIES,
    )

    keys = keys or sorted(STAGED_QUERIES)
    spark = get_spark("staged-sf01-check")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    n_fail = 0
    for key in keys:
        spdf = STAGED_QUERIES[key](spark, SF).toPandas()
        srows = list(spdf.itertuples(index=False, name=None))
        dpdf = con.execute(STAGED_ORACLE[key]).df()
        drows = list(dpdf.itertuples(index=False, name=None))
        ok = (
            len(srows) == len(drows)
            and sorted(spdf.columns) == sorted(dpdf.columns)
            and hash_rows(list(spdf.columns), srows)
            == hash_rows(list(dpdf.columns), drows)
            and len(srows) > 0
        )
        n_fail += not ok
        print(f"{'PASS' if ok else 'FAIL'} {key}: {len(srows)} rows")
    print(f"== staged sf0.1: {len(keys) - n_fail} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
