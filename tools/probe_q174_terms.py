"""Term-level decomposition of q174's 16x scale-probe ratio.

The r10 staging probe measured q174_staged_setsim at 13.1 -> 108.3 s
(8.3x at 16x docs) — under the 16x linear bar but the largest ratio of
the r10 cohort, so the ratio is decomposed into named stage terms at
1x and 16x:

  n_docs        input documents
  n_elems       distinct (doc, shingle) set elements      [linear map]
  n_prefix      prefix rows indexed (the L - ceil(t*L) + 1 cut)
  n_cand_pool   candidate pairs from the prefix join alone
  n_cand        after PPJoin's length filter (den*Lmin >= num*Lmax,
                added r11) — what actually reaches verify  [THE term]
  sum_verify    SUM over candidates of |doc_a's elements| — the verify
                join's row traffic (candidates x element lists)
  n_out         final qualifying pairs

The alphabet-rotated replica keeps copies textually disjoint, so a
cross-copy candidate count > 0 would be a fixture artifact (finding 2);
it is asserted zero here (copy = doc_id div 1_000_000).

Usage: python tools/probe_q174_terms.py [sf_dir] [mult_dir]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window
from pyspark.sql import functions as F


def terms(spark, sf: str) -> dict:
    from live_market_data_orderflow_analysis_big_data_project__spark.operators.setjoin import (  # noqa: E501
        token_sets,
    )
    from live_market_data_orderflow_analysis_big_data_project__spark.queries.ablock import (  # noqa: E501
        _Q174_NGRAM,
        _Q174_T,
    )
    from live_market_data_orderflow_analysis_big_data_project__spark.sources.tables import (  # noqa: E501
        load_table,
    )

    t_num, t_den = _Q174_T
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    toks = token_sets(docs, ngram=_Q174_NGRAM).localCheckpoint()
    tok_df = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("_tdf"))
    ranked = toks.join(tok_df, "tok").select(
        "doc",
        "tok",
        F.row_number()
        .over(Window.partitionBy("doc").orderBy("_tdf", "tok"))
        .alias("_pos"),
        F.count(F.lit(1)).over(Window.partitionBy("doc")).alias("_len"),
    )
    prefix_len = (
        F.col("_len")
        - F.expr(f"({t_num} * _len + {t_den} - 1) div {t_den}")
        + F.lit(1)
    )
    prefix = ranked.where(F.col("_pos") <= prefix_len).select(
        "doc", "tok", "_len"
    ).localCheckpoint()
    pool = (
        prefix.alias("a")
        .join(prefix.alias("b"), "tok")
        .where(F.col("a.doc") < F.col("b.doc"))
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.col("a._len").alias("n_a"),
            F.col("b._len").alias("n_b"),
        )
        .distinct()
        .localCheckpoint()
    )
    cands = pool.where(
        F.least("n_a", "n_b") * F.lit(t_den)
        >= F.lit(t_num) * F.greatest("n_a", "n_b")
    ).localCheckpoint()
    out = {
        "n_docs": docs.count(),
        "n_elems": toks.count(),
        "n_prefix": prefix.count(),
        "n_cand_pool": pool.count(),
        "n_cand": cands.count(),
        "sum_verify": cands.agg(F.sum("n_a")).collect()[0][0],
        "cross_copy_cands": cands.where(
            F.expr("doc_a div 1000000") != F.expr("doc_b div 1000000")
        ).count(),
    }
    from live_market_data_orderflow_analysis_big_data_project__spark.queries.ablock import (  # noqa: E501
        q174_setsim_join,
    )

    out["n_out"] = q174_setsim_join(spark, sf).count()
    return out


def main() -> None:
    from live_market_data_orderflow_analysis_big_data_project__spark import (
        get_spark,
    )

    sf1 = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sf16 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_probe/x16"
    spark = get_spark(
        "probe-q174-terms",
        extra_conf={"spark.driver.memory": "24g"},  # scale_probe's rule
    )
    spark.sparkContext.setLogLevel("ERROR")
    res = {"1x": terms(spark, sf1), "16x": terms(spark, sf16)}
    for scale, t in res.items():
        print(f"== {scale}: " + json.dumps(t))
    r = {
        k: round(res["16x"][k] / max(1, res["1x"][k]), 1)
        for k in res["1x"]
    }
    print("== ratios: " + json.dumps(r))
    assert res["16x"]["cross_copy_cands"] == 0, (
        "cross-copy candidates — replica artifact, decomposition invalid"
    )
    spark.stop()


if __name__ == "__main__":
    main()
