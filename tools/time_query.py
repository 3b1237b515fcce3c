"""Time a subset of declared queries with bench.py's exact methodology
(warmed get_spark session, noop sink, median-of-3 / 2 for streaming,
clearCache between samples) — for isolating one query's before/after
during optimization without paying the full-suite wall.

Usage: python tools/time_query.py [sf_dir] key1 [key2 ...]
       SPARK_GRAFT_BENCH_SAMPLES=5 python tools/time_query.py sf_dir q146

Prints one line per key: key, per-sample seconds, and the bench median
(lower-middle order statistic). Keys may be unique prefixes (q146).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir = args.pop(0)
    if not args:
        print("usage: time_query.py [sf_dir] key...", file=sys.stderr)
        sys.exit(2)

    import __spark_entry__ as ent
    from live_market_data_orderflow_analysis_big_data_project__spark import get_spark
    from live_market_data_orderflow_analysis_big_data_project__spark.sources.tables import (  # noqa: E501
        TABLES,
        load_table,
    )

    qmap = ent.queries()
    keys = []
    for a in args:
        match = [k for k in qmap if k == a or k.split("_", 1)[0] == a]
        if len(match) != 1:
            print(f"key {a!r} matches {match}", file=sys.stderr)
            sys.exit(2)
        keys.append(match[0])

    spark = get_spark("time_query")
    spark.sparkContext.setLogLevel("ERROR")
    for t in TABLES:
        load_table(spark, sf_dir, t).count()
    spark.range(64).repartition(8).mapInPandas(
        lambda batches: batches, "id long"
    ).write.format("noop").mode("overwrite").save()
    from pyspark.sql import functions as _F

    spark.range(10_000).groupBy((_F.col("id") % 16).alias("k")).count().write.format(
        "noop"
    ).mode("overwrite").save()

    n_samples = int(os.environ.get("SPARK_GRAFT_BENCH_SAMPLES", "3"))
    n_s_samples = int(os.environ.get("SPARK_GRAFT_BENCH_S_SAMPLES", "2"))
    print(f"loadavg={os.getloadavg()[0]:.2f} sf_dir={sf_dir}")
    for key in keys:
        reps = n_s_samples if key.startswith("s") else n_samples
        runs: list[float] = []
        spark.sparkContext.setJobDescription(f"time_query:{key}")
        for _ in range(reps):
            t0 = time.time()
            df = qmap[key](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        srt = sorted(runs)
        med = srt[(len(srt) - 1) // 2]
        print(f"{key}: median={med:.3f} samples={runs}")
    spark.stop()


if __name__ == "__main__":
    main()
