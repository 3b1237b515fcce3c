"""Term-level decomposition of q91b's 16x scale-probe ratio.

VERDICT r6 item 3: q91b_near_dedup_minhash_lsh's wall ratio (4.2 at 16x,
r6) is under the <=16 linear bar but unexplained.  This probe measures
every stage's cardinality at 1x and 16x so the ratio decomposes into
named terms (same method that closed q124's 11.3 outlier):

  n_docs          input documents
  n_tok_rows      distinct (doc, 3-gram shingle) rows — the signature
                  build's shuffle input                   [linear map]
  n_band_rows     (doc, band, bkey) rows = n_docs * n_bands
  n_buckets       distinct occupied (band, bkey) buckets
  max_bucket      largest bucket (skew indicator: a hot bucket makes the
                  self-join quadratic IN THAT BUCKET)
  sum_bucket_pairs SUM over buckets of C(size, 2) — the bucket self-join
                  fan-out, THE candidate quadratic term; its knob is
                  band_rows (wider bands -> smaller buckets)
  n_cand          distinct candidate pairs after dedup across bands
  verify_rows     token rows touched by exact verification = SUM over
                  candidates of (n_tok_a + n_tok_b) — the re-score cost
  n_out           final pairs at threshold

The 16x fixtures are alphabet-rotated (textually disjoint) replicas, so
cross-copy terms like q124's are structurally zero here: shingles of
different copies never collide, only bucket KEYS can (xxhash64 of
disjoint shingle sets).  A super-linear sum_bucket_pairs therefore means
hash-key collisions across copies, not real near-dups.

Usage: python tools/probe_q91b_terms.py [sf_dir] [mult_dir]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

SF1 = "/root/testdata/sf0.1"
SF16 = "/tmp/scale_probe/x16"


def terms(sf_dir: str, threshold: float = 0.5, ngram: int = 3,
          n_hashes: int = 8, band_rows: int = 1) -> dict:
    from pyspark.sql import functions as F

    from live_market_data_orderflow_analysis_big_data_project__spark import (
        get_spark,
    )
    from live_market_data_orderflow_analysis_big_data_project__spark.operators.llmops import (  # noqa: E501
        minhash_band_stages,
        minhash_lsh_pairs,
    )
    from live_market_data_orderflow_analysis_big_data_project__spark.sources.tables import (  # noqa: E501
        load_table,
    )

    spark = get_spark(
        "q91b-terms", extra_conf={"spark.driver.memory": "24g"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    toks, sizes, bands = minhash_band_stages(
        docs, "doc_id", "text", n_hashes, band_rows, ngram
    )
    toks = toks.cache()
    out: dict = {
        "sf_dir": sf_dir, "n_hashes": n_hashes, "band_rows": band_rows,
    }
    out["n_docs"] = docs.count()
    out["n_tok_rows"] = toks.count()
    occ = bands.groupBy("band", "bkey").agg(
        F.count("*").alias("sz")
    ).cache()
    brow = occ.agg(
        F.sum("sz").cast("long").alias("n_band_rows"),
        F.count("*").alias("n_buckets"),
        F.max("sz").alias("max_bucket"),
        F.sum(F.col("sz") * (F.col("sz") - 1) / 2).cast("long").alias(
            "sum_bucket_pairs"
        ),
    ).collect()[0]
    out.update(brow.asDict())
    x, y = bands.alias("x"), bands.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bkey") == F.col("y.bkey"))
            & (F.col("x.doc") < F.col("y.doc")),
        )
        .select(F.col("x.doc").alias("doc_a"), F.col("y.doc").alias("doc_b"))
        .distinct()
        .cache()
    )
    out["n_cand"] = cand.count()
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("n_tok").alias("n_a"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("n_tok").alias("n_b"))
    out["verify_rows"] = (
        cand.join(sa, "doc_a").join(sb, "doc_b")
        .agg(F.sum(F.col("n_a") + F.col("n_b")).cast("long"))
        .collect()[0][0]
    ) or 0
    out["n_out"] = minhash_lsh_pairs(
        docs, threshold=threshold, ngram=ngram,
        n_hashes=n_hashes, band_rows=band_rows,
    ).count()
    toks.unpersist()
    occ.unpersist()
    cand.unpersist()
    spark.stop()
    return out


def main() -> None:
    sf1 = sys.argv[1] if len(sys.argv) > 1 else SF1
    sf16 = sys.argv[2] if len(sys.argv) > 2 else SF16
    a = terms(sf1)
    b = terms(sf16)
    print(json.dumps({"x1": a, "x16": b}, indent=2))
    print("\nterm                    1x            16x         ratio")
    for k in ("n_docs", "n_tok_rows", "n_band_rows", "n_buckets",
              "max_bucket", "sum_bucket_pairs", "n_cand", "verify_rows",
              "n_out"):
        va, vb = a.get(k) or 0, b.get(k) or 0
        r = (vb / va) if va else float("inf")
        print(f"{k:22s} {va:>12,} {vb:>13,} {r:>9.1f}x")


if __name__ == "__main__":
    main()
