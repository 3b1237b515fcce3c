"""Collocation extraction over adjacent token bigrams — the
association-strength member of the text-statistics family
(q94 wordcount / q95 ngrams / q96 TF-IDF / q139 bigram dup stats).

Classic collocation scoring is PMI = log(P(ab) / (P(a·)P(·b))).  The
log is the hash-parity trap (libm log differs in the last ulp across
engines), and it is also MONOTONE — so the engine emits the exact
INTEGER argument instead: ``lift_ppm = n_ab * N * 1e6 div (n_a* *
n_*b)`` in parts-per-million, where n_ab counts the bigram, n_a* the
bigrams with that left token, n_*b with that right token, N all
bigrams.  Same ranking, same thresholds (PMI > 0 <=> lift_ppm >
1e6), bit-identical on every engine and partitioning — the q171
integer-quantization rule applied to text statistics.  Callers who
want nats apply log on the way OUT of the gate.

One bigram explode (positions via posexplode, adjacency by pos+1
self-join within doc — the q95/q148 idiom), three count aggregations
over it, two broadcast-sized joins on single-token keys.  Margin
tables are vocabulary-sized; at corpus scale they stay far under the
bigram table the counts reduce from.  int64 headroom: n_ab * N * 1e6
needs n_ab * N < 9.2e12 — rescale ``scale`` down for corpora past
~1e6 bigrams per hot pair; the headroom is ENFORCED per-row with a
``raise_error`` guard (the range_count_binned pattern), so Spark's
ANSI-off silent int64 wrap can never diverge quietly from the
oracle's loud BIGINT overflow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .llmops import tokens_col

__all__ = ["bigram_counts", "collocation_lift"]

LIFT_SCALE = 1_000_000  # parts-per-million


def bigram_counts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(tok_a, tok_b, n_ab) over adjacent token pairs, occurrences
    counted (not per-doc deduped — collocation statistics weigh
    repetition)."""
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.posexplode(tokens_col(text_col)).alias("pos", "tok"),
    )
    a = toks.select("doc", "pos", F.col("tok").alias("tok_a"))
    b = toks.select(
        "doc", (F.col("pos") - 1).alias("pos"), F.col("tok").alias("tok_b")
    )
    return (
        a.join(b, ["doc", "pos"])
        .groupBy("tok_a", "tok_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )


def collocation_lift(
    df: DataFrame,
    min_count: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    scale: int = LIFT_SCALE,
) -> DataFrame:
    """(tok_a, tok_b, n_ab, n_a, n_b, lift_ppm) for bigrams with
    ``n_ab >= min_count`` — ``n_a``/``n_b`` are the left/right bigram
    margins, ``lift_ppm`` the exact integer
    ``n_ab * N * scale div (n_a * n_b)``."""
    bg = bigram_counts(df, id_col, text_col)
    left = bg.groupBy("tok_a").agg(F.sum("n_ab").alias("n_a"))
    right = bg.groupBy("tok_b").agg(F.sum("n_ab").alias("n_b"))
    total = bg.agg(F.sum("n_ab").alias("_nn"))
    # int64 headroom guard (the range_count_binned pattern): with ANSI
    # off Spark WRAPS n_ab * _nn * scale silently while the DuckDB
    # oracle errors loudly — past the headroom the engines would
    # diverge without a sound.  Overflow-free check: the product fits
    # iff n_ab <= (MAX div scale) div _nn (positive integers, floor
    # division on both steps is exact for the <= comparison).
    lift = F.expr(
        f"CASE WHEN n_ab > (9223372036854775807 div {int(scale)}) div _nn "
        "THEN CAST(raise_error('collocation_lift: n_ab * N * scale "
        "exceeds int64 headroom - rescale `scale` down (module "
        "docstring)') AS BIGINT) "
        f"ELSE (n_ab * _nn * {int(scale)}) div (n_a * n_b) END"
    )
    return (
        bg.where(F.col("n_ab") >= F.lit(int(min_count)))
        .join(left, "tok_a")
        .join(right, "tok_b")
        .crossJoin(F.broadcast(total))
        .select(
            "tok_a",
            "tok_b",
            F.col("n_ab").cast("long").alias("n_ab"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            lift.cast("long").alias("lift_ppm"),
        )
    )
