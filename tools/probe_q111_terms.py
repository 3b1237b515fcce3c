"""Term-level decomposition of q111's r7 bench regression.

VERDICT r7 item 2: q111_dedup_clusters slowed 1.80 -> 2.57 s between
the r6 and r7 benches while its 16x scale ratio stayed 1.0 (graph-
bounded) — so the suspicion was fixed per-iteration overhead, not a
scale term.  This probe times each stage of the operator the way
probe_q91b_terms decomposed q91b:

  t_edges      one full materialization of the edge pipeline (exact-dup
               star join + q91 jaccard near-dup pairs) — NOT part of
               the CC loop; shared with q91/q119
  t_sym        sym localCheckpoint = edge pipeline recompute + explode
               to symmetric adjacency (the edge pipeline runs INSIDE
               this checkpoint in the real operator)
  t_labels     initial label frame checkpoint
  per round:
    t_ckpt     join + groupBy.min + label-update localCheckpoint
    t_chg      convergence check action
  n_rounds     rounds to convergence (graph diameter bound)

Finding (2026-08-14, sf0.1, idle host): the loop was ~1.2 s of the
~2.5 s wall — 2 rounds x (ckpt ~0.4 s + change-count join ~0.2 s) —
and the change-count was a SECOND join (new vs old labels) re-planned
every round.  Fusing the change flag into the label-update projection
(computed inside the checkpoint, counted off the checkpointed frame)
removes one join + one shuffle per round: measured q111 wall
2.2-2.7 s -> ~1.8-1.9 s, back under the ~2 s r6 level.  The remaining
wall is t_sym (the edge-finder pipeline, dominated by q91's jaccard
verify — separately gated and probed).

Usage: python tools/probe_q111_terms.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

SF1 = "/root/testdata/sf0.1"


def probe(sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from live_market_data_orderflow_analysis_big_data_project__spark import (
        get_spark,
    )
    from live_market_data_orderflow_analysis_big_data_project__spark.operators.llmops import (  # noqa: E501
        jaccard_pairs,
    )
    from live_market_data_orderflow_analysis_big_data_project__spark.queries.pblock import (  # noqa: E501
        _Q91_BOUND,
        _docs,
    )

    spark = get_spark()

    def edges():
        d = _docs(spark, sf_dir)
        hashed = d.select(
            "doc_id", F.md5(F.col("text").cast("binary")).alias("h")
        )
        kept = hashed.groupBy("h").agg(F.min("doc_id").alias("kept_id"))
        star = (
            hashed.join(kept, "h")
            .filter(F.col("doc_id") != F.col("kept_id"))
            .select(
                F.col("kept_id").alias("doc_a"),
                F.col("doc_id").alias("doc_b"),
            )
        )
        near = jaccard_pairs(
            d.filter(F.col("doc_id") < _Q91_BOUND), threshold=0.5, ngram=3
        ).select("doc_a", "doc_b")
        return star.unionAll(near)

    # warm the session so stage times reflect plan cost
    edges().count()
    spark.catalog.clearCache()

    out: dict = {"sf_dir": sf_dir}
    t = time.time()
    e = edges()
    out["n_edges"] = e.count()
    out["t_edges"] = round(time.time() - t, 3)

    t = time.time()
    sym = e.selectExpr("doc_a AS doc_id", "doc_b AS nbr").unionAll(
        e.selectExpr("doc_b AS doc_id", "doc_a AS nbr")
    ).localCheckpoint(eager=True)
    out["t_sym"] = round(time.time() - t, 3)

    t = time.time()
    labels = (
        sym.select("doc_id").distinct().withColumn("lbl", F.col("doc_id"))
    ).localCheckpoint(eager=True)
    out["t_labels"] = round(time.time() - t, 3)

    rounds = []
    for _ in range(15):
        r = {}
        t = time.time()
        nbr_min = (
            sym.join(labels.withColumnRenamed("doc_id", "nbr"), "nbr")
            .groupBy("doc_id")
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        new_labels = (
            labels.join(nbr_min, "doc_id", "left")
            .select(
                F.col("doc_id"),
                F.least(F.col("lbl"), F.col("nbr_lbl")).alias("lbl"),
                F.coalesce(
                    F.col("nbr_lbl") < F.col("lbl"), F.lit(False)
                ).alias("_chg"),
            )
        ).localCheckpoint(eager=True)
        r["t_ckpt"] = round(time.time() - t, 3)
        t = time.time()
        changed = new_labels.filter(F.col("_chg")).count()
        r["t_chg"] = round(time.time() - t, 3)
        labels = new_labels.drop("_chg")
        rounds.append(r)
        if changed == 0:
            break
    out["n_rounds"] = len(rounds)
    out["rounds"] = rounds
    return out


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else SF1
    print(json.dumps(probe(sf)))
