"""Term-level decomposition of q121_semdedup's 16x ratio (2.4).

VERDICT r7 item 4: name the growing term and its knob.  SemDeDup's
cost model is ``pairs = n_vecs * min(|cluster|, max_cluster) / 2``
(in-stripe pairs, the published cluster-bounded quadratic).  This
probe counts that term exactly at 1x and 16x and times the pair-sim
stage separately from the fixed session/scan/window overhead.

Finding (2026-08-14, sf0.1 vs /tmp/scale_probe/x16, idle host):

  1x : n_vecs   2,000, max cluster  218 (UNDER the 512 cap -> striping
       inactive), in-stripe pairs   199,666  (~100 comparisons/vec)
  16x: n_vecs  32,000, max cluster 3,488 (cap binds: 7 stripes),
       in-stripe pairs 7,994,240  (~250 comparisons/vec — the cap/2
       ceiling)

Pair ratio 40.0x vs data 16x; this probe's walls (full-output action,
see the in-code note on count-elimination) are 3.07 s / 8.28 s =
ratio 2.69 — fitting wall = fixed + c*pairs gives c ~ 0.7 us/pair and
fixed ~ 2.9 s: the pair-sim stage is LINEAR IN THE PAIR COUNT, and
the pair count is super-linear only across the cap TRANSITION:
1x clusters sit below max_cluster so per-vector comparisons grow with
cluster size until the cap binds, then growth is linear (pairs/vec
pinned at ~max_cluster/2 = 256).  The standing 2.4 wall ratio IS
40/16 = 2.5 modulo fixed overhead — expected, bounded, and knobbed:

  - ``max_cluster`` halves the pair term per halving (at the cost of
    missing cross-stripe pairs — the approximation SemDeDup embraces);
  - in production the upstream quantizer scales k with the corpus so
    |cluster| stays O(1) and the term never transitions.

Not a scale risk: past cap saturation the ratio is ~data-linear.

Usage: python tools/probe_q121_terms.py [sf_dir] [mult_dir]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

SF1 = "/root/testdata/sf0.1"
SF16 = "/tmp/scale_probe/x16"
CAP = 512


def terms(sf_dir: str) -> dict:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from live_market_data_orderflow_analysis_big_data_project__spark import (
        get_spark,
    )
    from live_market_data_orderflow_analysis_big_data_project__spark.operators.pipeline import (  # noqa: E501
        semdedup,
    )
    from live_market_data_orderflow_analysis_big_data_project__spark.sources.tables import (  # noqa: E501
        load_table,
    )

    spark = get_spark()
    emb = load_table(spark, sf_dir, "embeddings")
    emb.count()  # warm
    spark.catalog.clearCache()

    out: dict = {"sf_dir": sf_dir}
    w = Window.partitionBy("label").orderBy("vec_id")
    st = emb.withColumn(
        "__sub",
        ((F.row_number().over(w) - F.lit(1)) / F.lit(CAP)).cast("int"),
    )
    g = st.groupBy("label", "__sub").count()
    row = g.agg(
        F.count("*").alias("n_stripes"),
        F.sum("count").alias("n_vecs"),
        F.max("count").alias("max_stripe"),
        F.sum(F.expr("count * (count - 1) / 2")).cast("long").alias(
            "sum_pairs"
        ),
    ).collect()[0]
    out.update(row.asDict())
    out["max_cluster"] = (
        emb.groupBy("label").count().agg(F.max("count")).collect()[0][0]
    )

    # NOT .count(): the final left join's right side is aggregate-keyed
    # (unique), so Catalyst ELIMINATES the whole pair pipeline under a
    # bare count — consume every output column to force the real work.
    t = time.time()
    res = semdedup(emb, threshold=0.35, max_cluster=CAP)
    row = res.agg(
        F.count("*").alias("n_out"),
        F.sum("n_close_earlier").alias("sum_close"),
        F.sum("max_cos_earlier").alias("sum_cos"),
    ).collect()[0]
    out["t_full"] = round(time.time() - t, 3)
    out["n_out"] = row["n_out"]
    out["sum_close"] = int(row["sum_close"] or 0)
    return out


if __name__ == "__main__":
    sf1 = sys.argv[1] if len(sys.argv) > 1 else SF1
    sf16 = sys.argv[2] if len(sys.argv) > 2 else SF16
    a = terms(sf1)
    print(json.dumps(a))
    b = terms(sf16)
    print(json.dumps(b))
    print(
        json.dumps(
            {
                "pair_ratio": round(b["sum_pairs"] / a["sum_pairs"], 1),
                "data_ratio": round(b["n_vecs"] / a["n_vecs"], 1),
                "wall_ratio": round(b["t_full"] / a["t_full"], 2),
            }
        )
    )
