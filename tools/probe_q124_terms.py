"""Term-level decomposition of q124's 16x scale-probe ratio.

VERDICT r5 flagged q124_fingerprint_overlap as the one at-scale outlier
(wall ratio 11.3 at 16x, under the <=16 linear bar but unexplained).
This probe measures every stage's cardinality at 1x and 16x so the ratio
decomposes into named terms:

  n_docs        input documents
  n_sel         (doc, fp) rows after mod-p selection      [linear map]
  n_fp_keys     distinct fingerprints                     [shuffle keys]
  n_drop_keys   heavy-hitter fps dropped (df > max_df)
  n_kept        (doc, fp) rows surviving the anti-join
  n_pair_keys   fps contributing pairs (2 <= df <= max_df)
  sum_pairs     SUM over keys of C(df, 2)  — the pair fan-out, THE
                candidate quadratic term
  cross_copy_pair_keys / cross_copy_pairs — of the above, keys whose doc
                set spans >1 replica copy (doc_id div 1_000_000): pairs
                that exist ONLY because the replica's copies share
                character k-grams.  Nonzero => fixture artifact, not
                operator behavior (a real 16x corpus has no systematic
                cross-shard char-gram sharing).
  n_out         final overlap pairs emitted

Usage: python tools/probe_q124_terms.py [sf_dir] [mult_dir]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

SF1 = "/root/testdata/sf0.1"
SF16 = "/tmp/scale_probe/x16"
COPY_STEP = 1_000_000  # doc_id offset per replica copy (scale_probe.py)


def terms(sf_dir: str, p: int = 61, max_df: int = 50,
          min_shared: int = 2) -> dict:
    from pyspark.sql import functions as F

    from live_market_data_orderflow_analysis_big_data_project__spark import (
        get_spark,
    )
    from live_market_data_orderflow_analysis_big_data_project__spark.operators.llmops import (  # noqa: E501
        _gram_select_fast,
    )
    from live_market_data_orderflow_analysis_big_data_project__spark.sources.tables import (  # noqa: E501
        load_table,
    )

    spark = get_spark(
        "q124-terms", extra_conf={"spark.driver.memory": "24g"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    sel = _gram_select_fast(
        docs, "doc_id", "text", k=8, base=31, mod=1_000_000_007, p=p
    ).cache()
    out: dict = {"sf_dir": sf_dir, "p": p, "max_df": max_df}
    out["n_docs"] = docs.count()
    out["n_sel"] = sel.count()
    df_per_fp = sel.groupBy("fp").agg(
        F.count("*").alias("fp_df"),
        F.countDistinct((F.col("doc") / COPY_STEP).cast("int")).alias(
            "n_copies"
        ),
    ).cache()
    out["n_fp_keys"] = df_per_fp.count()
    out["n_drop_keys"] = df_per_fp.filter(F.col("fp_df") > max_df).count()
    surv = df_per_fp.filter(
        (F.col("fp_df") >= 2) & (F.col("fp_df") <= max_df)
    )
    pairrow = surv.agg(
        F.count("*").alias("n_pair_keys"),
        F.sum(
            F.col("fp_df") * (F.col("fp_df") - 1) / 2
        ).cast("long").alias("sum_pairs"),
        F.sum(F.col("fp_df")).cast("long").alias("n_kept_pairable"),
        F.count(F.when(F.col("n_copies") > 1, 1)).alias(
            "cross_copy_pair_keys"
        ),
        F.sum(
            F.when(
                F.col("n_copies") > 1,
                F.col("fp_df") * (F.col("fp_df") - 1) / 2,
            )
        ).cast("long").alias("cross_copy_pairs"),
    ).collect()[0]
    out.update(pairrow.asDict())
    kept = sel.join(
        F.broadcast(
            df_per_fp.filter(F.col("fp_df") > max_df).select("fp")
        ),
        "fp",
        "left_anti",
    )
    out["n_kept"] = kept.count()
    from live_market_data_orderflow_analysis_big_data_project__spark.operators.llmops import (  # noqa: E501
        fingerprint_overlap_pairs,
    )

    out["n_out"] = fingerprint_overlap_pairs(
        docs, p=p, max_df=max_df, min_shared=min_shared
    ).count()
    sel.unpersist()
    df_per_fp.unpersist()
    spark.stop()
    return out


def main() -> None:
    sf1 = sys.argv[1] if len(sys.argv) > 1 else SF1
    sf16 = sys.argv[2] if len(sys.argv) > 2 else SF16
    a = terms(sf1)
    b = terms(sf16)
    print(json.dumps({"x1": a, "x16": b}, indent=2))
    print("\nterm                    1x            16x         ratio")
    for k in ("n_docs", "n_sel", "n_fp_keys", "n_drop_keys", "n_kept",
              "n_pair_keys", "sum_pairs", "cross_copy_pair_keys",
              "cross_copy_pairs", "n_out"):
        va, vb = a.get(k) or 0, b.get(k) or 0
        r = (vb / va) if va else float("inf")
        print(f"{k:22s} {va:>12,} {vb:>13,} {r:>9.1f}x")


if __name__ == "__main__":
    main()
