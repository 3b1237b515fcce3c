"""fk_orphan_audit semantics on hand fixtures (operators/integrity.py)."""

from __future__ import annotations

from live_market_data_orderflow_analysis_big_data_project__spark.operators.integrity import (  # noqa: E501
    fk_orphan_audit,
)


def _audit(spark, children, parents, name="fk"):
    c = spark.createDataFrame([(k,) for k in children], "ck long")
    p = spark.createDataFrame([(k,) for k in parents], "pk long")
    rows = fk_orphan_audit([(name, c, "ck", p, "pk")]).collect()
    assert len(rows) == 1
    return rows[0]


def test_orphans_counted_with_multiplicity_and_distinct(spark):
    r = _audit(spark, [1, 1, 2, 9, 9, 9], [1, 2, 3])
    assert r["n_child"] == 6
    assert r["n_orphan"] == 3          # the three 9s
    assert r["n_orphan_keys"] == 1     # one missing parent key
    assert r["orphan_rate"] == 0.5


def test_clean_fk_reports_zero(spark):
    r = _audit(spark, [1, 2, 2], [1, 2])
    assert r["n_orphan"] == 0 and r["n_orphan_keys"] == 0
    assert r["orphan_rate"] == 0.0


def test_null_child_keys_are_not_orphans(spark):
    c = spark.createDataFrame([(1,), (None,), (None,)], "ck long")
    p = spark.createDataFrame([(1,)], "pk long")
    r = fk_orphan_audit([("fk", c, "ck", p, "pk")]).collect()[0]
    assert r["n_child"] == 1  # nulls excluded from the audit base
    assert r["n_orphan"] == 0


def test_duplicate_parent_keys_do_not_inflate_child_rows(spark):
    c = spark.createDataFrame([(1,), (2,)], "ck long")
    p = spark.createDataFrame([(1,), (1,), (1,)], "pk long")
    r = fk_orphan_audit([("fk", c, "ck", p, "pk")]).collect()[0]
    assert r["n_child"] == 2  # parent deduped -> join can't fan out
    assert r["n_orphan"] == 1


def test_multiple_fks_one_row_each(spark):
    c1 = spark.createDataFrame([(1,)], "a long")
    c2 = spark.createDataFrame([(9,)], "b long")
    p = spark.createDataFrame([(1,)], "k long")
    out = {
        r["fk"]: r
        for r in fk_orphan_audit(
            [("f1", c1, "a", p, "k"), ("f2", c2, "b", p, "k")]
        ).collect()
    }
    assert out["f1"]["n_orphan"] == 0
    assert out["f2"]["n_orphan"] == 1
