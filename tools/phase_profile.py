"""Split a query's bench cost into (a) Python-side DataFrame
construction, (b) first noop execution (analysis+planning+run), and
(c) second noop execution (re-plan+run, analysis cached) — to decide
whether to optimize the plan, the expression tree size, or the runtime.

Usage: python tools/phase_profile.py [sf_dir] key...
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

    spark = get_spark("phase_profile")
    spark.sparkContext.setLogLevel("ERROR")
    for t in TABLES:
        load_table(spark, sf_dir, t).count()
    spark.range(64).repartition(8).mapInPandas(
        lambda b: b, "id long"
    ).write.format("noop").mode("overwrite").save()
    from pyspark.sql import functions as _F

    spark.range(10_000).groupBy((_F.col("id") % 16).alias("k")).count().write.format(
        "noop"
    ).mode("overwrite").save()

    print(f"loadavg={os.getloadavg()[0]:.2f} sf_dir={sf_dir}")
    print(f"{'key':<34} {'build':>7} {'exec1':>7} {'exec2':>7}")
    for key in keys:
        spark.sparkContext.setJobDescription(f"phase:{key}")
        t0 = time.time()
        df = qmap[key](spark, sf_dir)
        t1 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t3 = time.time()
        spark.catalog.clearCache()
        print(
            f"{key:<34} {t1 - t0:>7.3f} {t2 - t1:>7.3f} {t3 - t2:>7.3f}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
