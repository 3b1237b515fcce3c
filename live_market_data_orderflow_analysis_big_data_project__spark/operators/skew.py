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

from pyspark.sql import DataFrame, Window
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


def skew_report(
    df: DataFrame,
    key_cols: str | list[str],
    label: str | None = None,
) -> DataFrame:
    """Join-key skew diagnostics — the measurement that picks between
    the three mitigation postures above (broadcast / AQE split /
    ``salted_join``) and sizes the salt.

    One row per invocation: ``keyset`` (the diagnosed key set, or
    ``label``), ``n_rows``, ``n_keys``, ``max_bucket`` (hottest key's
    row count), ``p99_bucket`` (exact rank-selected: the
    ceil(0.99 * n_keys)-th smallest bucket — integer rank arithmetic,
    no engine percentile), ``top1_share_ppm`` (hot key's share of all
    rows, exact integer ppm), and ``skew_factor`` =
    ceil(max_bucket / mean_bucket) — the x-mean ratio that is both
    the "is AQE enough?" signal (AQE splits handle moderate factors;
    a 100x single-key factor needs salting) and the natural
    ``salted_join`` salt: spreading the hot key over ``skew_factor``
    sub-keys brings its partitions down to ~mean size.

    Everything is exact integer arithmetic over one per-key count
    aggregation + one global fold — hash-gateable and cheap enough to
    run ahead of any recurring big join (NULL keys count as a key,
    matching GROUP BY join-planning reality).
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    name = label if label is not None else ",".join(keys)
    per_key = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("_n"))
    # Exact p99 WITHOUT a global sort over the key frame: rank-select on
    # the bucket-SIZE histogram.  Distinct sizes s1<s2<...<sk sum to at
    # most n_rows, so k(k+1)/2 <= n_rows and the histogram is provably
    # O(sqrt(2*n_rows)) rows — the one global window here runs over
    # that bounded frame, never over n_keys.
    sizes = per_key.groupBy("_n").agg(F.count(F.lit(1)).alias("_k"))
    wcum = Window.orderBy("_n").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = sizes.select(
        "_n",
        F.sum("_k").over(wcum).alias("_cum"),
        F.sum("_k").over(
            Window.partitionBy(F.lit(1))
        ).alias("_nk"),
    )
    p99 = cum.where(
        F.col("_cum") >= F.expr("(99 * _nk + 99) div 100")
    ).agg(F.min("_n").alias("p99_bucket"))
    agg = per_key.agg(
        F.sum("_n").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("_n").alias("max_bucket"),
    )
    return (
        agg.crossJoin(F.broadcast(p99))
        .select(
            F.lit(name).alias("keyset"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("n_keys").cast("long").alias("n_keys"),
            F.col("max_bucket").cast("long").alias("max_bucket"),
            F.col("p99_bucket").cast("long").alias("p99_bucket"),
            F.expr("max_bucket * 1000000 div n_rows")
            .cast("long")
            .alias("top1_share_ppm"),
            F.expr("(max_bucket * n_keys + n_rows - 1) div n_rows")
            .cast("long")
            .alias("skew_factor"),
        )
    )
