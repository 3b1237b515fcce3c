"""Vector (embedding) column expressions — all JVM-side higher-order
functions, no Python UDFs, so similarity math stays inside whole-stage
codegen (the reference's one good habit: expressions over UDFs, see
reference data_processor.py:125-140 and SURVEY.md section 4.1).

Elements are cast float->double *before* any arithmetic so results are
bit-identical to a DuckDB oracle that does the same (float->double widening
is exact; subsequent IEEE double ops are deterministic).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential-fold dot product of two array<float|double> columns.

    ``aggregate`` folds left-to-right, matching an oracle that sums
    products in list order.
    """
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    sq = F.transform(_c(a), lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity, double math end-to-end (round before hashing)."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
