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
