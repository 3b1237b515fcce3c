"""Multi-touch conversion attribution — last-touch and first-touch
credit within a bounded lookback window, as ONE per-user window pass.

The funnel family (q77/q172/s18) answers "how far did each user get";
attribution answers the converse marketing/product question: "which
prior touch gets credit for each conversion".  The naive form is a
conversions × touches inequality join (t.ts < c.ts AND t.ts >= c.ts −
lookback) — quadratic in a hot user's events and a
BroadcastNestedLoop trap, the same class q155/q177 replace with bin
decomposition.  Here the bounded lookback admits an even cheaper
rewrite: order each user's tape once and read the latest/earliest
qualifying touch with a RANGE frame over exact integer microseconds

    RANGE BETWEEN lookback_us PRECEDING AND 1 PRECEDING

so each conversion row sees exactly the touches with
c_us − lookback_us <= t_us <= c_us − 1 (strictly-before in integer
microseconds — no same-instant self-credit), picked as the min/max of
a (us, id, channel) struct: a total order, engine-identical, with the
event-id tie-break the q07/q45 determinism rule requires for
same-microsecond touches.

Everything stays exact integers until the output (gap in whole
seconds via integer div); conversions with no qualifying touch carry
NULL attribution (the unattributed bucket — never dropped, the q167
"brand-new segment" discipline).

At 100 TB: one shuffle by user, one ordered window pass per user —
the sessionization shape (q47/q153/q169 share it); the frame is
bounded by the lookback, never the tape.  No self-join, no
pair materialization, no Python.

(Reference parity: no attribution machinery in the reference —
SURVEY.md §2.4.  The ts→credit shape generalizes its aggressor-side
CASE classification, data_processor.py:120-127.)
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["touch_attribution"]


def touch_attribution(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    id_col: str,
    touch_types: Sequence[str],
    conv_type: str,
    lookback_s: int,
) -> DataFrame:
    """One row per conversion event with its attributed touches.

    Output: ``user_col``, ``conv_id`` / ``conv_ts`` (the conversion),
    ``last_channel`` / ``last_gap_s`` (latest qualifying touch — the
    last-touch model) and ``first_channel`` / ``first_gap_s``
    (earliest qualifying touch — the first-touch model); all NULL when
    no touch falls inside the lookback (unattributed).
    """
    if lookback_s <= 0:
        raise ValueError("lookback_s must be positive")
    us = F.unix_micros(F.col(ts_col))
    base = df.select(
        F.col(user_col).alias("_u"),
        F.col(id_col).alias("_id"),
        F.col(type_col).alias("_ty"),
        F.col(ts_col).alias("_ts"),
        us.alias("_us"),
    )
    touch = F.when(
        F.col("_ty").isin(*[str(t) for t in touch_types]),
        F.struct(
            F.col("_us").alias("us"),
            F.col("_id").alias("id"),
            F.col("_ty").alias("ch"),
        ),
    )
    frame = (
        Window.partitionBy("_u")
        .orderBy("_us")
        .rangeBetween(-int(lookback_s) * 1_000_000, -1)
    )
    tagged = base.select(
        "_u",
        "_id",
        "_ty",
        "_ts",
        "_us",
        F.max(touch).over(frame).alias("_last"),
        F.min(touch).over(frame).alias("_first"),
    )
    conv = tagged.where(F.col("_ty") == F.lit(str(conv_type)))
    return conv.select(
        F.col("_u").alias(user_col),
        F.col("_id").alias("conv_id"),
        F.col("_ts").alias("conv_ts"),
        F.col("_last.ch").alias("last_channel"),
        F.expr("(_us - _last.us) div 1000000").alias("last_gap_s"),
        F.col("_first.ch").alias("first_channel"),
        F.expr("(_us - _first.us) div 1000000").alias("first_gap_s"),
    )
