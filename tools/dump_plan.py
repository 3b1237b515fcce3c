"""Dump .explain("formatted") for declared queries to plans/<tag>/.

Usage: python tools/dump_plan.py --tag r16 --suffix before [sf_dir] key...

Writes plans/<tag>/<key>_<suffix>.txt (the optimization-round evidence
artifact: the judge checks plan claims against these files).
Streaming (s*) entries are batch-planned the same way — their declared
callables return batch DataFrames of the drained result where
applicable; the file records whatever plan the returned frame carries.
"""

from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r16")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("keys", nargs="+")
    args = ap.parse_args()

    import __spark_entry__ as ent
    from live_market_data_orderflow_analysis_big_data_project__spark import get_spark

    qmap = ent.queries()
    keys = []
    for a in args.keys:
        match = [k for k in qmap if k == a or k.split("_", 1)[0] == a]
        if len(match) != 1:
            print(f"key {a!r} matches {match}", file=sys.stderr)
            sys.exit(2)
        keys.append(match[0])

    spark = get_spark("dump_plan")
    spark.sparkContext.setLogLevel("ERROR")
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        args.tag,
    )
    os.makedirs(outdir, exist_ok=True)
    for key in keys:
        df = qmap[key](spark, args.sf)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{key}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {key} @ {args.sf} ({args.suffix})\n")
            f.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
