"""salted_join must be semantically identical to a plain equi-join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from live_market_data_orderflow_analysis_big_data_project__spark.operators.skew import (
    salted_join,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of left rows share one hot key
    left = spark.range(1000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
    )
    right = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("payload")
    )
    return left, right


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_matches_plain_join(skewed, how):
    left, right = skewed
    plain = left.join(right, "k", how)
    salted = salted_join(left, right, "k", how=how, salt=8)
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0
    assert "__salt" not in salted.columns


def test_salted_join_rejects_outer(skewed):
    left, right = skewed
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(left, right, "k", how="full")
