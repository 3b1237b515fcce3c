"""Point-in-time (PIT) enrichment: join each event to the dimension
version that was valid AT ITS TIMESTAMP — the feature-store lookup.

An equi-join on the key alone (s05's shape) pins every event to ONE
current dimension row and silently time-travels: an event from Jan 3
gets enriched with attributes computed from Jan 20 data, and any model
trained on the result learns from the future (feature leakage — the
training-data twin of q188's split leakage).  The PIT join matches on
key AND ``valid_from <= ts < valid_to``, so each event sees exactly the
feature snapshot a production scorer would have seen live.

``daily_tier_dim`` builds the canonical such dimension from an event
log: one version per (entity, day) whose attributes describe the
PREVIOUS day (the nightly-batch feature pattern — today's traffic is
scored with yesterday's profile, never its own).  Days with no prior
activity still get a version (count 0) via the entity × day-span grid,
so the PIT join is total: every event in the span matches exactly one
interval.

Exactness: versions are calendar-day intervals from exact timestamps,
counts are exact int64, tiers a CASE over them — everything hashes
with no rounding.

At 100 TB: the dimension is DOMAIN-bounded (|entities| × |days|), built
with one map-side-combinable count shuffle plus a 1-row-bounds
broadcast crossJoin (the gapfill grid idiom); the PIT join itself is an
equi-join on the entity key with the interval predicate as a residual
filter — broadcastable when the dim fits, AQE-planned otherwise, and
usable unchanged as a stream-static join (the static side is looked up
per micro-batch with NO stream state, which is what makes PIT
enrichment safe on unbounded inputs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["daily_tier_dim", "pit_join"]

# prev-day activity tiers: boundaries chosen to split the fixture's
# ~2 events/user/day Poisson-ish counts into populated classes
TIER_CASE = (
    "CASE WHEN prev_cnt = 0 THEN 'idle' "
    "WHEN prev_cnt <= 2 THEN 'light' "
    "WHEN prev_cnt <= 5 THEN 'active' "
    "ELSE 'heavy' END"
)


def daily_tier_dim(
    events: DataFrame, key_col: str, ts_col: str
) -> DataFrame:
    """Per-(entity, day) SCD-style dimension: ``valid_from``/
    ``valid_to`` cover the day, ``prev_cnt`` is the entity's event
    count on the PREVIOUS day (0 when silent), ``tier`` the CASE over
    it.  The grid spans every entity × every day in the log's global
    [min_day, max_day] span, so a PIT join against it is total.
    """
    k, ts = F.col(key_col), F.col(ts_col)
    daily = events.groupBy(
        k.alias("_k"), F.date_trunc("day", ts).alias("_d")
    ).agg(F.count(F.lit(1)).cast("long").alias("_cnt"))
    bounds = daily.agg(F.min("_d").alias("_d0"), F.max("_d").alias("_d1"))
    grid = (
        daily.select("_k")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "_k",
            F.explode(
                F.sequence(
                    F.lit(0).cast("int"),
                    F.datediff(F.col("_d1"), F.col("_d0")).cast("int"),
                )
            ).alias("_i"),
            "_d0",
        )
        .select(
            "_k",
            F.date_add(F.col("_d0"), F.col("_i"))
            .cast("timestamp")
            .alias("valid_from"),
        )
    )
    prev = daily.select(
        "_k",
        (F.col("_d") + F.expr("INTERVAL 1 DAY")).alias("valid_from"),
        F.col("_cnt").alias("prev_cnt"),
    )
    dim = grid.join(prev, ["_k", "valid_from"], "left").select(
        F.col("_k").alias(key_col),
        "valid_from",
        (F.col("valid_from") + F.expr("INTERVAL 1 DAY")).alias("valid_to"),
        F.coalesce(F.col("prev_cnt"), F.lit(0)).cast("long").alias(
            "prev_cnt"
        ),
    )
    return dim.withColumn("tier", F.expr(TIER_CASE))


def pit_join(
    facts: DataFrame, dim: DataFrame, key_col: str, ts_col: str
) -> DataFrame:
    """Enrich ``facts`` with the ``dim`` version valid at each row's
    ``ts_col``: key equality + ``valid_from <= ts < valid_to``.

    Works identically on a batch frame and a readStream frame (the
    static side is per-micro-batch state-free) — inner join, so facts
    outside the dimension's validity span drop rather than silently
    carrying NULL features.

    Returns a DISAMBIGUATED schema: every ``facts`` column under its
    original name, followed by ``dim``'s attribute columns (all but
    its copy of ``key_col``) — so the result selects and writes
    cleanly with unqualified names.  A non-key column name shared by
    both inputs would make that projection ambiguous, so it raises
    up front (rename the dim attribute before joining).
    """
    dup = sorted((set(facts.columns) & set(dim.columns)) - {key_col})
    if dup:
        raise ValueError(
            f"pit_join: facts and dim share non-key columns {dup}; "
            "rename the dim attributes before joining"
        )
    d = dim.alias("_dim")
    f = facts.alias("_f")
    ts = F.col(f"_f.{ts_col}")
    joined = f.join(
        d,
        (F.col(f"_f.{key_col}") == F.col(f"_dim.{key_col}"))
        & (ts >= F.col("_dim.valid_from"))
        & (ts < F.col("_dim.valid_to")),
        "inner",
    )
    return joined.select(
        *[F.col(f"_f.{c}").alias(c) for c in facts.columns],
        *[
            F.col(f"_dim.{c}").alias(c)
            for c in dim.columns
            if c != key_col
        ],
    )
