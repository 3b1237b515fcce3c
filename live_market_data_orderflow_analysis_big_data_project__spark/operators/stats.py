"""Exact-moment pairwise Pearson correlation over aligned buckets.

Spark ships ``F.corr``, but it accumulates FLOATS — the partial sums
depend on partition boundaries and merge order, so two runs (or two
engines) can disagree in the last ulps, which the driver's value-hash
gate cannot tolerate.  This operator computes the five raw moments
(n, Σx, Σy, Σxy, Σx², Σy²) as EXACT int64 sums of an integer-valued
series (the engine's cents convention, operators/robust.py::cents) and
derives Pearson r with a FIXED parenthesization of IEEE ops over those
bit-identical operands::

    num  = n·Σxy − Σx·Σy
    varx = n·Σx² − Σx·Σx          vary = n·Σy² − Σy·Σy
    r    = num / sqrt(varx · vary)

Every input to the float stage is an exact integer, double conversion
is correctly rounded, each ``·``/``−``/``/`` is one IEEE op, and IEEE
``sqrt`` is correctly rounded (unlike ln/exp) — so r is bit-identical
across engines, partitionings, and runs.  No ROUND anywhere.

Overflow bound: Σx² is an int64 sum, so the series must satisfy
Σx² < 2^63 (|x| ≲ 3·10^6 over ~10^6 buckets).  For wider domains lift
the moment sums to DECIMAL(38,0); the fixture cents stay orders of
magnitude inside the bound (probed at 16×).

At 100 TB: the only data-sized exchange is the upstream groupBy that
builds the (key, bucket, x) frame — one map-side-combinable shuffle of
the raw table.  Everything here runs on that DOMAIN-bounded frame
(|keys| × |buckets| rows): the self-join shuffles it by bucket, emits
≤ |keys|²/2 rows per bucket, and the moment agg is map-side
combinable on (key_a, key_b).  No all-pairs over raw rows, no window,
no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["autocorr_lags", "pairwise_corr", "group_trend"]


def group_trend(
    df: DataFrame, key_col: str, x_col: str, y_col: str
) -> DataFrame:
    """Per-group ordinary-least-squares line fit y = slope·x +
    intercept — grouped linear regression, the trend-detection
    capability Spark has no builtin for (MLlib fits ONE model per
    call, not one per key).

    Same exact-moment discipline as ``pairwise_corr``: ``x`` and ``y``
    are exact int64 series (bucket indices, cents); the five moments
    (n, Σx, Σy, Σxy, Σx²) are exact int64 sums; the closed-form
    numerators/denominator

        D = n·Σx² − Σx·Σx
        slope·D     = n·Σxy − Σx·Σy
        intercept·D = Σy·Σx² − Σx·Σxy

    are exact int64 products of those sums, and slope/intercept are
    ONE correctly-rounded IEEE division each — bit-identical across
    engines and partitionings, no ROUND anywhere.  ``slope`` and
    ``intercept`` are NULL when D = 0 (fewer than two distinct x).

    int64 headroom: the six products the closed forms compute (n·Σx²,
    n·Σxy, Σx·Σx, Σx·Σy, Σy·Σx², Σx·Σxy) are each ENFORCED per-group
    with a raise_error guard (the collocation_lift pattern) instead
    of wrapping silently under ANSI-off — rescale y (coarser cents)
    or shorten/re-anchor the x range past it.

    At 100 TB: one map-side-combinable moment shuffle keyed by group
    over one scan; everything after runs on the |groups|-row frame.

    Output: key, ``n``, ``sum_x``, ``sum_y`` (exact anchors),
    ``slope``, ``intercept``.
    """
    x, y = F.col(x_col), F.col(y_col)
    m = (
        df.where(x.isNotNull() & y.isNotNull())
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(x).alias("sum_x"),
            F.sum(y).alias("sum_y"),
            F.sum(x * y).alias("_sxy"),
            F.sum(x * x).alias("_sxx"),
        )
    )
    # int64 headroom guard, folded into the denominator so the
    # optimizer can never prune it: exactly the SIX products the
    # closed forms compute are checked, each with the overflow-free
    # rule a > 0 AND b > MAX div a (positive operands, floor
    # division).  A first draft used one conservative A·B bound over
    # the moment groups — it fired on the 16x scale probe for the
    # never-computed Σy·Σxy pairing while every real product had four
    # orders of magnitude of headroom; per-product checks keep the
    # guard honest (fires iff a real product would wrap).
    # CASE (not AND) around each division: conjuncts do not guarantee
    # conditional evaluation, so `a > 0 AND b > MAX div a` still throws
    # DIVIDE_BY_ZERO under ANSI when a = 0 (hypothesis found it on the
    # single-point group (0, 0)); CASE branches are evaluated lazily.
    _MAX = 9223372036854775807
    _checks = " OR ".join(
        f"(CASE WHEN {a} > 0 THEN {b} > {_MAX} div {a} ELSE false END)"
        for a, b in (
            ("n", "_sxx"),                      # n·Σx²
            ("n", "abs(_sxy)"),                 # n·Σxy
            ("abs(sum_x)", "abs(sum_x)"),       # Σx·Σx
            ("abs(sum_x)", "abs(sum_y)"),       # Σx·Σy
            ("abs(sum_y)", "_sxx"),             # Σy·Σx²
            ("abs(sum_x)", "abs(_sxy)"),        # Σx·Σxy
        )
    )
    den = F.expr(
        f"CASE WHEN {_checks} "
        "THEN CAST(raise_error('group_trend: moment product exceeds "
        "int64 headroom - rescale y or shorten the x range (module "
        "docstring)') AS BIGINT) "
        "ELSE n * _sxx - sum_x * sum_x END"
    )
    s_num = F.col("n") * F.col("_sxy") - F.col("sum_x") * F.col("sum_y")
    i_num = (
        F.col("sum_y") * F.col("_sxx") - F.col("sum_x") * F.col("_sxy")
    )
    m = m.withColumn("_den", den)
    return m.select(
        key_col,
        "n",
        "sum_x",
        "sum_y",
        F.when(
            F.col("_den") != 0,
            s_num.cast("double") / F.col("_den").cast("double"),
        ).alias("slope"),
        F.when(
            F.col("_den") != 0,
            i_num.cast("double") / F.col("_den").cast("double"),
        ).alias("intercept"),
    )


def pairwise_corr(
    df: DataFrame, key_col: str, bucket_col: str, x_col: str
) -> DataFrame:
    """Pairwise Pearson r between all key pairs of an aligned series.

    ``df`` is long-format ``(key, bucket, x)`` with ``x`` an exact
    integer (int64) series value; one row per (key, bucket).  Pairs are
    aligned on buckets where BOTH keys are present (inner join), the
    unordered pair is emitted once (``key_a < key_b``).

    Output per pair: ``key_a``, ``key_b``, ``n_buckets``,
    ``sum_a``/``sum_b`` (exact int64 anchors for the hash gate),
    ``mean_a``/``mean_b`` (one exact-int division each), ``corr``
    (NULL when either side is constant — zero variance).
    """
    k, b, x = F.col(key_col), F.col(bucket_col), F.col(x_col)
    # the series frame feeds both join sides; it is domain-bounded
    # (keys x buckets) by contract, so cut the lineage once instead of
    # recomputing the upstream aggregation per side (q111/s15 idiom)
    df = df.localCheckpoint(eager=True)
    a_side = df.select(k.alias("key_a"), b.alias("_b"), x.alias("_xa"))
    b_side = df.select(k.alias("key_b"), b.alias("_b"), x.alias("_xb"))
    pairs = a_side.join(b_side, "_b").where(F.col("key_a") < F.col("key_b"))
    xa, xb = F.col("_xa"), F.col("_xb")
    m = pairs.groupBy("key_a", "key_b").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(xa).alias("sum_a"),
        F.sum(xb).alias("sum_b"),
        F.sum(xa * xb).alias("_sxy"),
        F.sum(xa * xa).alias("_sxx"),
        F.sum(xb * xb).alias("_syy"),
    )
    nd = F.col("n_buckets").cast("double")
    sxd, syd = F.col("sum_a").cast("double"), F.col("sum_b").cast("double")
    sxyd = F.col("_sxy").cast("double")
    sxxd, syyd = F.col("_sxx").cast("double"), F.col("_syy").cast("double")
    num = nd * sxyd - sxd * syd
    varx = nd * sxxd - sxd * sxd
    vary = nd * syyd - syd * syd
    return m.select(
        "key_a",
        "key_b",
        "n_buckets",
        "sum_a",
        "sum_b",
        (sxd / nd).alias("mean_a"),
        (syd / nd).alias("mean_b"),
        F.when(
            (varx > F.lit(0.0)) & (vary > F.lit(0.0)),
            num / F.sqrt(varx * vary),
        ).alias("corr"),
    )


def autocorr_lags(
    df: DataFrame,
    key_col: str,
    idx_col: str,
    x_col: str,
    lags: tuple[int, ...] = (1, 2, 3),
) -> DataFrame:
    """Per-key autocorrelation of an integer series at fixed lags —
    the serial-dependence diagnostic (is today's flow predicted by
    yesterday's?) next to ``pairwise_corr``'s cross-key one.

    ``df`` is long-format ``(key, idx, x)``: ``idx`` an int64 series
    index (e.g. days since an epoch), ``x`` an exact int64 value, one
    row per (key, idx).  For each lag k the pairs (x_t, x_{t+k}) are
    aligned BY INDEX (self-join on ``idx + k``), not by row order —
    gaps in the series pair only what truly sits k steps apart; feed a
    densified 0-filled frame (the gapfill grid) when the statistic
    should treat missing buckets as zeros.

    Same exactness contract as ``pairwise_corr``: moments (n, Σx, Σy,
    Σxy, Σx², Σy²) are exact int64 sums; r is derived with a fixed
    parenthesization of IEEE ops over those bit-identical operands
    (IEEE sqrt is correctly rounded), so the output hashes with NO
    ROUND.  Σx² < 2^63 is the caller's bound (module docstring) —
    rescale x (coarser units) past it.

    At 100 TB: the lag side is the SAME domain-bounded (keys × idx)
    frame replicated |lags| times with shifted join keys — one keyed
    equi-join plus a map-side-combinable moment agg; never a window
    sort over raw rows, never all-pairs.

    Output per (key, lag): ``key``, ``lag``, ``n_pairs``, ``sum_x``,
    ``sum_y`` (exact anchors), ``corr`` (NULL when either slice is
    constant — zero variance).
    """
    if not lags or any(int(k) < 1 for k in lags):
        raise ValueError(f"lags must be positive ints, got {lags!r}")
    if len(set(lags)) != len(lags):
        # a duplicated lag would explode into duplicate pair rows and
        # the moment groupBy would silently DOUBLE them — fail loudly
        raise ValueError(f"lags must be distinct, got {lags!r}")
    k, i, x = F.col(key_col), F.col(idx_col), F.col(x_col)
    # the series frame feeds both join sides; domain-bounded by
    # contract, so cut the lineage once (the pairwise_corr idiom)
    df = df.localCheckpoint(eager=True)
    lag_arr = F.array(*[F.lit(int(v)).cast("long") for v in lags])
    a_side = df.select(k.alias("_k"), i.alias("_i"), x.alias("_xa"))
    b_side = (
        df.select(k.alias("_k"), i.alias("_bi"), x.alias("_xb"))
        .withColumn("lag", F.explode(lag_arr))
        .select("_k", (F.col("_bi") - F.col("lag")).alias("_i"), "_xb", "lag")
    )
    pairs = a_side.join(b_side, ["_k", "_i"])
    xa, xb = F.col("_xa"), F.col("_xb")
    m = pairs.groupBy("_k", "lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(xa).alias("sum_x"),
        F.sum(xb).alias("sum_y"),
        F.sum(xa * xb).alias("_sxy"),
        F.sum(xa * xa).alias("_sxx"),
        F.sum(xb * xb).alias("_syy"),
    )
    nd = F.col("n_pairs").cast("double")
    sxd, syd = F.col("sum_x").cast("double"), F.col("sum_y").cast("double")
    num = nd * F.col("_sxy").cast("double") - sxd * syd
    varx = nd * F.col("_sxx").cast("double") - sxd * sxd
    vary = nd * F.col("_syy").cast("double") - syd * syd
    return m.select(
        F.col("_k").alias(key_col),
        "lag",
        "n_pairs",
        "sum_x",
        "sum_y",
        F.when(
            (varx > F.lit(0.0)) & (vary > F.lit(0.0)),
            num / F.sqrt(varx * vary),
        ).alias("corr"),
    )
