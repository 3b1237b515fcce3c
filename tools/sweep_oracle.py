"""Standing cross-sf oracle sweep for rounding-sensitive entries.

The r6 q123 lesson: a ROUND(double, 4) formulation passed the driver gate
at sf0.01 for two rounds, then diverged from DuckDB at sf0.1 only (a
half-boundary value that smaller fixtures never produce).  Scale-dependent
divergence is invisible to any single-sf gate, so every entry whose oracle
SQL rounds (the sensitive class) must hold a THREE-SF pass record — and
the record must be refreshed whenever the entry's code changes.

This tool runs each ROUND-bearing entry through the full driver-style
compare (Spark vs DuckDB, tools/check_oracle.py's normalize+hash) at
sf0.001, sf0.01, and sf0.1, and writes ``SWEEP.json``:

    {key: {"fingerprint": <sha256 of the entry's closure ASTs + oracle
           SQL>, "sfs": {"sf0.001": true, ...}}}

``tests/test_sweep_record.py`` (no Spark — record check only) then fails
if any sweep-eligible entry lacks a record, has a failing sf, or has a
fingerprint that no longer matches the worktree (i.e. the code changed
after the sweep).  Wired next to tools/stale_check.py in pytest: together
they enforce "every gate's evidence matches the code as it is NOW".

Usage:  python tools/sweep_oracle.py            # sweep all eligible
        python tools/sweep_oracle.py q123_quality_classifier  # subset
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RECORD = os.path.join(REPO, "SWEEP.json")
SFS = ("sf0.001", "sf0.01", "sf0.1")
TESTDATA = "/root/testdata"
_ROUND_RE = re.compile(r"\bROUND\s*\(", re.I)
_DOUBLE_RE = re.compile(r"AS\s+DOUBLE", re.I)
_ENVELOPE_RE = re.compile(r"\bTRUE\s+AS\b", re.I)


def eligible_keys() -> list[str]:
    """Hash-gated entries whose oracle SQL produces floats — ROUND(...)
    formulations (the original q123 class) plus every decimal-ratio /
    CAST(... AS DOUBLE) entry (widened per VERDICT r7 item 7: any
    float-producing comparison can in principle diverge at one scale
    only, so the three-sf record should be standing for the whole
    class, not just the subclass that already bit) — plus the
    envelope-boolean class (oracle emits literal TRUE flags: q34/q99b/
    q136/q141), whose failure mode is exactly scale-shaped: an
    approximate estimate drifts out of its tolerance band, or crosses
    a sketch-mode boundary (q141's coupon->dense cliff), at one sf
    only."""
    import __spark_entry__ as ent

    return [
        k
        for k, v in ent.oracle_sql().items()
        if _ROUND_RE.search(v)
        or _DOUBLE_RE.search(v)
        or _ENVELOPE_RE.search(v)
    ]


def fingerprint(key: str) -> str:
    """sha256 over the entry's transitive closure ASTs + its oracle SQL —
    the same closure stale_check diffs, so 'code changed' means the same
    thing to both gates."""
    from stale_check import _ClosureWalker, _read_worktree, entry_points

    import __spark_entry__ as ent

    mod, fn_name, extra = entry_points()[key]
    walker = _ClosureWalker(_read_worktree)
    members = walker.closure(mod, fn_name)
    for name in sorted(extra):
        members |= walker.closure(mod, name)
    h = hashlib.sha256()
    for relpath, name in sorted(members):
        h.update(f"{relpath}::{name}\n".encode())
        h.update((walker.node_dump(relpath, name) or "").encode())
    h.update(ent.oracle_sql()[key].encode())
    return h.hexdigest()


def _compare_one(spark, con, fn, sql, sf_dir) -> bool:
    from check_oracle import hash_rows

    spdf = fn(spark, sf_dir).toPandas()
    dpdf = con.execute(sql).df()
    if len(spdf) != len(dpdf):
        return False
    if sorted(spdf.columns) != sorted(dpdf.columns):
        return False
    srows = list(spdf.itertuples(index=False, name=None))
    drows = list(dpdf.itertuples(index=False, name=None))
    return hash_rows(list(spdf.columns), srows) == hash_rows(
        list(dpdf.columns), drows
    )


def main() -> None:
    import duckdb

    import __spark_entry__ as ent
    from check_oracle import TABLES
    from live_market_data_orderflow_analysis_big_data_project__spark import (
        get_spark,
    )

    keys = sys.argv[1:] or eligible_keys()
    qs, osql = ent.queries(), ent.oracle_sql()
    record: dict = {}
    if os.path.exists(RECORD):
        record = json.load(open(RECORD))

    spark = get_spark("oracle-sweep", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    failed = []
    for key in keys:
        entry = {"fingerprint": fingerprint(key), "sfs": {}}
        for sf in SFS:
            sf_dir = os.path.join(TESTDATA, sf)
            con = duckdb.connect()
            for t in TABLES:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
                )
            t0 = time.time()
            try:
                ok = _compare_one(spark, con, qs[key], osql[key], sf_dir)
            except Exception as e:  # noqa: BLE001 — record, don't abort sweep
                print(f"ERR  {key} @ {sf}: {type(e).__name__}: {e}")
                ok = False
            con.close()
            entry["sfs"][sf] = ok
            print(f"{'PASS' if ok else 'FAIL'} {key} @ {sf} "
                  f"({time.time() - t0:.1f}s)")
            if not ok:
                failed.append((key, sf))
        record[key] = entry
    spark.stop()

    with open(RECORD, "w") as f:
        json.dump(record, f, indent=1, sort_keys=True)
    print(f"\nwrote {RECORD} ({len(record)} entries)")
    if failed:
        print("FAILURES:", failed)
        sys.exit(1)


if __name__ == "__main__":
    main()
