"""Positional inverted index + phrase search — the retrieval
substrate under the ranking stack.

q96/q117/q134 rank documents by term STATISTICS (TF-IDF, BM25, RRF),
which cannot answer a PHRASE query: "part filter" as consecutive
tokens is invisible to any bag-of-words score.  The classic substrate
is the positional inverted index — per (term, doc): term frequency
and the sorted token-position list, plus document frequency per term
— the on-disk structure of Lucene/search engines, here materialized
as a plain DataFrame a parquet table can persist (the same
persistable-rollup posture as the sketch rollups: build once per
corpus version, answer phrase/proximity queries from the index
alone).

Build: one ``posexplode`` of the shared ``tokens_col`` tokenizer
(identical split semantics to q94-q96's oracle twins), one
(term, doc) groupBy — map-side combinable — and a per-term window for
df.  Positions are 1-BASED (``generate_subscripts`` parity, so oracle
SQL compares bit-for-bit).

Phrase search: k-term phrases resolve by joining the k posting lists
on doc_id and intersecting positions with a shifted higher-order
filter — ``filter(match, q -> array_contains(p_i, q + i))`` — a pure
expression, no explode of the position lists.  Each join's input is
one term's postings (|docs containing term| rows, bounded by the
rarest term prefix — join smallest-df first at scale); overlapping
matches are counted faithfully ("a a a" contains "a a" twice).

At 100 TB: the index build is the q94 wordcount shuffle with a
positions collect bolted on — state per (term, doc) is that doc's
occurrence list of the term (the same bounded-entity assumption as
any positional index; a pathological single-token doc caps it at doc
length).  Partition/persist the index BY TERM (bucketed), and a
phrase query touches only the queried terms' buckets — the corpus is
never rescanned per query.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .llmops import tokens_col

__all__ = [
    "positional_index",
    "phrase_search",
    "boolean_search",
    "proximity_search",
]


def positional_index(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(term, doc_id, tf, positions[1-based, sorted], df)."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens_col(text_col)).alias("_p0", "term"),
    )
    postings = toks.groupBy("term", "doc_id").agg(
        F.count("*").alias("tf"),
        F.sort_array(F.collect_list(F.col("_p0") + 1)).alias("positions"),
    )
    return postings.withColumn(
        "df", F.count("*").over(Window.partitionBy("term"))
    )


def phrase_search(index: DataFrame, terms: Sequence[str]) -> DataFrame:
    """Docs containing ``terms`` as consecutive tokens:
    (doc_id, n_occurrences, first_pos) — positions of the phrase's
    FIRST token, overlapping occurrences counted."""
    if not terms:
        raise ValueError("phrase_search needs at least one term")
    cur = index.where(F.col("term") == terms[0]).select(
        "doc_id", F.col("positions").alias("match")
    )
    def _shifted_hit(offset):
        # single-arg lambda: a 2-arg lambda would select F.filter's
        # (element, index) overload and shadow the captured offset
        return lambda q: F.array_contains(F.col("_p"), q + offset)

    for i, t in enumerate(terms[1:], 1):
        nxt = index.where(F.col("term") == t).select(
            "doc_id", F.col("positions").alias("_p")
        )
        cur = (
            cur.join(nxt, "doc_id")
            .select(
                "doc_id",
                F.filter("match", _shifted_hit(i)).alias("match"),
            )
            .where(F.size("match") > 0)
        )
    return cur.where(F.size("match") > 0).select(
        "doc_id",
        F.size("match").cast("bigint").alias("n_occurrences"),
        F.array_min("match").cast("bigint").alias("first_pos"),
    )


def boolean_search(
    index: DataFrame,
    must: Sequence[str],
    must_not: Sequence[str] = (),
) -> DataFrame:
    """Boolean retrieval over the index: docs containing EVERY ``must``
    term and NONE of the ``must_not`` terms —
    (doc_id, min_tf, sum_tf): the conjunction's scarcest-term count
    (the classic AND-semantics relevance floor) and total matched
    occurrences.  The set-operation complement to ``phrase_search``:
    phrase = positional adjacency, boolean = posting-set algebra.

    Plan: one posting-list equi-join per ``must`` term (input bounded
    by that term's df — join the rarest term first at scale) and ONE
    left-anti join against the union of the ``must_not`` postings.
    The exclusion DOC-SET scales with the excluded terms' document
    frequency — a low-df term yields a broadcast-sized set, but a
    stopword-class ``must_not`` term is corpus-proportional — so the
    join strategy is left to AQE (which broadcasts iff the built side
    is actually under the threshold) rather than forced.  Touches
    only the queried terms' postings — with the index persisted
    bucketed by term, a boolean query never scans the corpus.
    """
    if not must:
        raise ValueError("boolean_search needs at least one must-term")
    cur = index.where(F.col("term") == must[0]).select(
        "doc_id",
        F.col("tf").alias("min_tf"),
        F.col("tf").alias("sum_tf"),
    )
    for t in must[1:]:
        nxt = index.where(F.col("term") == t).select(
            "doc_id", F.col("tf").alias("_tf")
        )
        cur = cur.join(nxt, "doc_id").select(
            "doc_id",
            F.least("min_tf", "_tf").alias("min_tf"),
            (F.col("sum_tf") + F.col("_tf")).alias("sum_tf"),
        )
    if must_not:
        excl = index.where(
            F.col("term").isin(list(must_not))
        ).select("doc_id").distinct()
        cur = cur.join(excl, "doc_id", "left_anti")
    return cur.select(
        "doc_id",
        F.col("min_tf").cast("bigint").alias("min_tf"),
        F.col("sum_tf").cast("bigint").alias("sum_tf"),
    )


def proximity_search(
    index: DataFrame, term_a: str, term_b: str, k: int
) -> DataFrame:
    """Proximity query (the classic NEAR/k): docs where an occurrence
    of ``term_a`` lies within ``k`` token positions of an occurrence
    of ``term_b`` (unordered) — the retrieval class between
    ``phrase_search`` (exact adjacency, k fixed by the phrase) and
    ``boolean_search`` (whole-document co-occurrence, k = infinity).

    (doc_id, n_pairs, min_dist): qualifying occurrence PAIRS counted
    (a doc mentioning the terms together three times outranks one
    incidental co-mention — the proximity analogue of tf) and the
    closest distance, both exact integers.

    Pure-expression position algebra on the two posting lists (one
    equi-join on doc_id, nested higher-order filter/aggregate — no
    explode of the position lists, same idiom as phrase_search's
    shifted filter); each side's input is one term's postings, so a
    query touches two index buckets and never the corpus.  Pair
    fan-out inside a row is |positions_a| x |positions_b| bounded by
    the k-filter applied innermost.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if term_a == term_b:
        raise ValueError("proximity terms must differ")
    pa = index.where(F.col("term") == term_a).select(
        "doc_id", F.col("positions").alias("_pa")
    )
    pb = index.where(F.col("term") == term_b).select(
        "doc_id", F.col("positions").alias("_pb")
    )
    dists = F.expr(
        "flatten(transform(_pa, q -> "
        f"transform(filter(_pb, r -> abs(r - q) <= {int(k)}), "
        "r -> abs(r - q))))"
    )
    return (
        pa.join(pb, "doc_id")
        .select("doc_id", dists.alias("_d"))
        .where(F.size("_d") > 0)
        .select(
            "doc_id",
            F.size("_d").cast("bigint").alias("n_pairs"),
            F.array_min("_d").cast("bigint").alias("min_dist"),
        )
    )
