"""Referential-integrity audit: FK orphan detection across tables.

The second half of the dataset-validation pair (column profiles are
operators/profile.py): before a corpus/warehouse drop is trusted,
every foreign key is checked for orphans — child rows whose parent is
absent.  One row per declared FK: child count, orphan count, distinct
orphan key count, orphan rate.

Mechanics per FK: the child is projected to ITS KEY ONLY, the parent
to a deduplicated key set, and a LEFT join's null side is counted —
one narrow equi-join and one map-side-combinable aggregate per FK, no
anti-join second pass (the same join answers "how many children" and
"how many orphans").  Exact integers + one IEEE division.

At 100 TB: the join is key-only (columns pruned at the scan), the
parent side is deduped before the join (its key set, not its rows),
and Catalyst picks broadcast vs merge per side size.  Orphans are
usually rare: the count aggregate collapses map-side, so the audit's
output is one row per FK regardless of data size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["fk_orphan_audit"]


def fk_orphan_audit(
    fks: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Audit ``[(fk_name, child_df, child_key, parent_df, parent_key)]``.

    Output one row per FK: ``fk``, ``n_child`` (non-null child keys;
    NULL FKs are not orphans — they're the profile audit's n_null),
    ``n_orphan``, ``n_orphan_keys`` (distinct missing parents),
    ``orphan_rate`` = n_orphan / n_child.
    """
    parts = []
    for name, child, ckey, parent, pkey in fks:
        c = child.select(F.col(ckey).alias("_k")).where(
            F.col(ckey).isNotNull()
        )
        p = parent.select(F.col(pkey).alias("_k")).distinct().withColumn(
            "_present", F.lit(1)
        )
        joined = c.join(p, "_k", "left")
        miss = F.when(F.col("_present").isNull(), 1).otherwise(0)
        parts.append(
            joined.agg(
                F.lit(name).alias("fk"),
                F.count(F.lit(1)).alias("n_child"),
                F.sum(miss).cast("long").alias("n_orphan"),
                F.count_distinct(
                    F.when(F.col("_present").isNull(), F.col("_k"))
                ).alias("n_orphan_keys"),
                (
                    F.sum(miss).cast("double")
                    / F.count(F.lit(1)).cast("double")
                ).alias("orphan_rate"),
            )
        )
    out = parts[0]
    for frame in parts[1:]:
        out = out.unionByName(frame)
    return out
