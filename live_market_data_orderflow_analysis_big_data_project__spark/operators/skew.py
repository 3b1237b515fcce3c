"""Skew mitigation: salted equi-join.

Posture (in order): 1) broadcast the small side; 2) let AQE's skew-join
split oversized partitions (on by default, session.py); 3) when neither
applies — right side too big to broadcast AND the skew is a single
pathological key that AQE cannot split further (its splits are bounded by
``advisoryPartitionSizeInBytes``), or a context where AQE doesn't run
(e.g. stream-static joins) — salt the keys.

``salted_join`` spreads each left key over ``salt`` synthetic sub-keys and
replicates the right side ``salt`` times, so one hot key hashes to
``salt`` shuffle partitions instead of one.  Cost: right side inflates
x``salt`` — pick the smallest salt that dissolves the hot spot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join that salts the (possibly skewed) LEFT side's keys.

    Semantics are identical to ``left.join(right, on, how)`` for
    ``inner``/``left`` joins; the salt columns never escape.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports inner/left joins, got {how!r}; outer "
            "semantics would need de-dup of replicated right rows"
        )
    keys = [on] if isinstance(on, str) else list(on)
    # deterministic pseudo-random salt per left row: spreads a hot key
    # across `salt` shuffle partitions regardless of its value.
    lsalt = F.pmod(
        F.xxhash64(F.monotonically_increasing_id()), F.lit(salt)
    ).cast("int")
    l = left.withColumn("__salt", lsalt)
    r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = l.join(r, keys + ["__salt"], how)
    return out.drop("__salt")
