"""Character-distribution text statistics — the entropy quality rung.

Low character entropy is the classic cheap boilerplate/degenerate-text
signal (C4/Gopher-class corpus filters): navigation spam, repeated
separators, base64 blobs and '=====' banners all collapse the char
distribution long before a language-ID or perplexity model notices.
This operator computes, per document, the exact character histogram
statistics plus the Shannon entropy of the char distribution — the
screen that runs BEFORE the model-based filters (q101 lang-id, q118 /
q185 LM fluency) because it needs no model at all.

Exactness strategy (the q118/q185 ln discipline):

- the character set is an EXPLICIT negated class of the five Java
  line terminators (LF, CR, NEL, LS, PS) passed as literal
  characters, NOT the regex ``.`` — Java's ``.`` excludes all five
  while RE2's excludes only LF, so the dot form would silently
  diverge on any CR-bearing doc; the explicit class makes the char
  multiset engine-identical by construction (line terminators are
  structure, not content);
- all counts are exact int64: ``n_chars``, ``n_distinct``,
  ``top_char`` (max count, char tie-break ASC), ``top_share_ppm`` =
  ``top_cnt * 1_000_000 div n_chars`` (integer ppm — the q176 rule);
- entropy is the ONE transcendental:  H = ln(n) - (SUM c_i ln c_i)/n
  (the factored form — each ln argument is an exact integer, so both
  engines evaluate ln at identical points), ROUND-4 on both sides
  (sweep-eligible on promotion);
- the boilerplate FLAG compares exact integers only
  (``top_share_ppm > threshold``) — never a rounded double (the q123
  half-boundary lesson: flags from doubles rot at one sf only).

Documents with zero matched characters (empty or newline-only text)
carry no distribution and are excluded — the same rule as
``value_histogram``'s NULL exclusion.

At 100 TB: one explode to (doc, char) — linear in corpus bytes, the
same traffic as any tokenize pass (q94/q109) — one (doc_id, char)
count shuffle (map-side combinable, heavily collapsing: <= |alphabet|
rows per doc out), then one doc-keyed agg.  No windows, no joins, no
driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["char_entropy_stats"]


def char_entropy_stats(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    top_share_ppm_threshold: int = 200_000,
) -> DataFrame:
    """Per doc: ``(id, n_chars, n_distinct, top_char, top_cnt,
    top_share_ppm, entropy4, is_low_quality)``.

    ``is_low_quality`` fires when the single most frequent character
    holds more than ``top_share_ppm_threshold`` ppm of the document —
    an exact-integer proxy for the low-entropy tail that needs no
    rounded-double comparison (the entropy itself ships ROUND-4 as a
    reported metric)."""
    # real control characters inside the class (a literal Column, so
    # no engine-specific escape syntax is ever parsed)
    pattern = "[^\n\r\u0085\u2028\u2029]"
    counts = (
        docs.select(
            F.col(id_col).alias("_id"),
            F.explode(
                F.regexp_extract_all(
                    F.col(text_col), F.lit(pattern), F.lit(0)
                )
            ).alias("_ch"),
        )
        .groupBy("_id", "_ch")
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
    )
    n = F.sum("_c").cast("long")
    # SUM c_i ln(c_i): every ln argument is an exact integer count
    s = F.sum(F.col("_c").cast("double") * F.log(F.col("_c").cast("double")))
    ent = F.round(
        F.log(n.cast("double")) - s / n.cast("double"), 4
    )
    return (
        counts.groupBy(F.col("_id").alias(id_col))
        .agg(
            n.alias("n_chars"),
            F.count(F.lit(1)).cast("long").alias("n_distinct"),
            # max count with char-ASC tie-break: order by (c desc,
            # ch asc) == min_by over the (-c, ch) struct
            F.min_by(
                "_ch", F.struct((-F.col("_c")).alias("a"), F.col("_ch"))
            ).alias("top_char"),
            F.max("_c").cast("long").alias("top_cnt"),
            ent.alias("entropy4"),
        )
        .withColumn(
            "top_share_ppm",
            F.expr("CAST(top_cnt * 1000000 div n_chars AS BIGINT)"),
        )
        .withColumn(
            "is_low_quality",
            F.col("top_share_ppm") > F.lit(top_share_ppm_threshold),
        )
        .select(
            id_col,
            "n_chars",
            "n_distinct",
            "top_char",
            "top_cnt",
            "top_share_ppm",
            "entropy4",
            "is_low_quality",
        )
    )
