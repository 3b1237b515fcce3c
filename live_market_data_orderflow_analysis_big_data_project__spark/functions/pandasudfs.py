"""Arrow-batched pandas UDFs (the only acceptable Python-side form in the
hot path at 100 TB — SURVEY.md section 4.1: expressions > UDFs; when Python
is unavoidable, Arrow batches, never per-row).

NOTE: no ``from __future__ import annotations`` here — pandas_udf resolves
eval types from *runtime* type hints, and PEP-563 stringified annotations
break its signature inspection.
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def rescale_half_minus_ten(v: pd.Series) -> pd.Series:
    """value * 0.5 - 10: *0.5 is a power-of-two scale (exact) and -10 one
    deterministic IEEE subtraction, so the result is bit-identical to the
    built-in-expression twin ``value * 0.5 - 10.0``."""
    return v * 0.5 - 10.0


@pandas_udf("long")
def lower_median_cents(v: pd.Series) -> int:
    """Exact lower median of an int64 cents column as a GROUPED-AGG
    pandas UDF (Series -> scalar inside ``groupBy().agg()``) — the one
    Python-UDF matrix cell q80-q84 leave uncovered (scalar row-UDF /
    scalar pandas / grouped-map / mapInPandas / UDTF).  numpy sorts
    the group's int64s and indexes (n-1)//2: every step exact integer,
    so the result hash-matches the SQL rank-selection twin
    bit-for-bit.  Scale posture: grouped-agg pandas UDFs get NO
    partial aggregation (each whole group crosses to Python via
    Arrow), so at 100 TB this cell is for group-local logic SQL can't
    state (model scoring, solvers); an expressible median belongs in
    the JVM rank window (the oracle's form) — the entry proves the
    API cell, like q80/q84."""
    a = v.dropna().to_numpy(dtype="int64")
    if len(a) == 0:
        return None
    a.sort()
    return int(a[(len(a) - 1) // 2])
