"""operators/pipeline.py::cluster_safe_split — leakage-free splits.

The staged gate (q188) proves hash parity with the recursive-CTE
oracle at two sfs; these pin the atomicity guarantee (whole clusters
share one split), the singleton degradation to split_assign, and the
rep-text keying.
"""

from __future__ import annotations

from live_market_data_orderflow_analysis_big_data_project__spark.operators.pipeline import (  # noqa: E501
    cluster_safe_split,
    split_assign,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _clusters(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, cluster_id long")


def test_cluster_members_share_the_reps_split(spark):
    docs = _docs(
        spark,
        [(1, "alpha text"), (2, "alpha text!"), (3, "beta"), (4, "gamma")],
    )
    clusters = _clusters(spark, [(1, 1), (2, 1)])
    out = {r.doc_id: r for r in cluster_safe_split(docs, clusters).collect()}
    assert len(out) == 4
    # members 1 and 2 share cluster 1 and the REP's (doc 1) split key
    assert out[1].cluster_id == out[2].cluster_id == 1
    assert out[1].split_key == out[2].split_key
    assert out[1].split == out[2].split
    # the shared key is doc 1's text hash, NOT doc 2's own
    own2 = {
        r.doc_id: r.split_key for r in split_assign(docs).collect()
    }
    assert out[1].split_key == own2[1]
    assert out[3].cluster_id == 3 and out[4].cluster_id == 4


def test_singletons_degrade_to_split_assign(spark):
    docs = _docs(
        spark, [(i, f"document number {i} body") for i in range(1, 30)]
    )
    empty = _clusters(spark, [])
    safe = {
        r.doc_id: (r.split_key, r.split)
        for r in cluster_safe_split(docs, empty).collect()
    }
    plain = {
        r.doc_id: (r.split_key, r.split)
        for r in split_assign(docs).collect()
    }
    assert safe == plain


def test_transitive_cluster_is_atomic(spark):
    # a 4-doc chain collapsed to one cluster: all inherit rep 10
    docs = _docs(spark, [(i, f"text {i}") for i in (10, 11, 12, 13, 99)])
    clusters = _clusters(spark, [(10, 10), (11, 10), (12, 10), (13, 10)])
    out = cluster_safe_split(docs, clusters).collect()
    by_cluster: dict[int, set] = {}
    for r in out:
        by_cluster.setdefault(r.cluster_id, set()).add(r.split)
    assert by_cluster[10] and len(by_cluster[10]) == 1
    assert set(by_cluster) == {10, 99}
