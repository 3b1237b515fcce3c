"""BPE tokenizer training on Spark: learn byte-pair-encoding merge
rules from a corpus — the subword-vocabulary step every LLM data
pipeline runs before token counting, packing, or NLL scoring.

The classic trainer (Sennrich et al. 2016, the algorithm behind GPT's
tokenizers) is a loop: count adjacent symbol pairs across the corpus,
merge the most frequent pair everywhere, repeat.  The distributed
formulation here exploits the standard factorization: pair statistics
depend only on the WORD-FREQUENCY table, so the corpus-sized work is a
single map-side-combinable token count, and every merge iteration runs
on the VOCABULARY-sized frame (distinct words), not the corpus.  That
is exactly how production BPE trainers scale, and it is why this is a
driver-loop algorithm of the q111/q171/q183 class: k bounded
iterations, each ending in a 1-row argmax collect (the learned rule
must become a literal in the next plan), with a localCheckpoint
lineage cut per round.

Words are carried as pipe-delimited symbol strings (``|c|a|t|``) —
tokens are ``\\w+`` so ``|`` can never collide with symbol text — and
a merge of (l, r) is ONE engine-native literal replace of ``|l|r|``
with ``|lr|``: left-to-right, non-overlapping, resuming AFTER the
replacement.  Spark's ``replace`` and DuckDB's ``replace`` share those
semantics exactly (pinned by test), including the run-overlap corner:
in ``|a|a|a|a|`` merging (a, a) rewrites only the first pair (the
match consumes the shared boundary pipe), yielding ``|aa|a|a|``.
Classic greedy BPE would produce ``|aa|aa|``; this single-pass variant
is deliberately defined by the replace semantics so both engines
compute the IDENTICAL deterministic function — the hash gate then
checks real cross-engine agreement instead of an unverifiable claim.
Ties in pair frequency break lexicographically on (l, r).

Everything is exact: int64 word/pair counts, string rewrites — the
output hashes with no rounding anywhere.

At 100 TB: one corpus-sized shuffle total (the initial word count);
per iteration, one vocab-sized pair explode (fan-out = word length),
one map-side-combinable pair-count shuffle, one TakeOrdered top-1
(never a global sort), one narrow replace.  Vocabulary frames are
millions of rows where corpora are trillions — the loop's cost is
independent of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .llmops import tokens_col

__all__ = ["bpe_merges", "bpe_merges_batched"]

# symbols of a pipe-delimited word string, empties (the string's
# sentinel ends) dropped — oracle twin:
# list_filter(string_split(sym, '|'), x -> x <> '')
_SYMS = "filter(split(sym, '\\\\|'), x -> x <> '')"

# adjacent symbol pairs of that array (empty when < 2 symbols)
_PAIRS = (
    f"CASE WHEN size({_SYMS}) >= 2 THEN "
    f"transform(sequence(1, size({_SYMS}) - 1), "
    f"j -> named_struct('l', element_at({_SYMS}, j), "
    f"'r', element_at({_SYMS}, j + 1))) "
    "ELSE array() END"
)


def bpe_merges(
    docs: DataFrame,
    n_merges: int = 3,
    top_symbols: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Learn ``n_merges`` BPE merge rules over ``docs[text_col]`` and
    report the resulting vocabulary head.

    Output rows (all-exact, hash-gateable):
      - one per merge: ``kind='merge'``, ``rank`` = merge order (1-
        based), ``token`` = ``'l r'`` (the pair), ``freq`` = its
        corpus pair count at merge time;
      - the top ``top_symbols`` final symbols by corpus frequency:
        ``kind='symbol'``, ``rank`` = frequency rank (ties break on
        the symbol), ``token`` = the symbol, ``freq``.

    Raises if the corpus exhausts its pairs before ``n_merges`` rules
    exist (a fixed-k oracle cannot represent early stopping — fail
    loudly instead of diverging).
    """
    spark = docs.sparkSession
    words = (
        docs.select(F.explode(tokens_col(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .select(
            "cnt",
            # Spark's split(w, '') keeps a trailing empty element; the
            # filter drops it so the sym string is byte-identical to
            # the oracle's ('|c|a|t|', never '|c|a|t||') — _SYMS /
            # _PAIRS already filter empties, but the replace() merge
            # step matches on the RAW string, so the representations
            # must agree exactly, not just after filtering.
            F.concat(
                F.lit("|"),
                F.array_join(
                    F.filter(
                        F.split(F.col("w"), ""), lambda x: x != ""
                    ),
                    "|",
                ),
                F.lit("|"),
            ).alias("sym"),
        )
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[int, str, str, int]] = []
    for i in range(1, n_merges + 1):
        pc = (
            words.select("cnt", F.explode(F.expr(_PAIRS)).alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("cnt").alias("freq"))
        )
        best = pc.orderBy(F.desc("freq"), "l", "r").limit(1).collect()
        if not best:
            raise ValueError(
                f"bpe_merges: corpus exhausted after {i - 1} merges "
                f"(asked for {n_merges})"
            )
        l, r, freq = best[0]["l"], best[0]["r"], int(best[0]["freq"])
        merges.append((i, l, r, freq))
        words = words.withColumn(
            "sym",
            F.replace(
                F.col("sym"), F.lit(f"|{l}|{r}|"), F.lit(f"|{l}{r}|")
            ),
        ).localCheckpoint(eager=True)
    vocab = (
        words.select("cnt", F.explode(F.expr(_SYMS)).alias("token"))
        .groupBy("token")
        .agg(F.sum("cnt").alias("freq"))
    )
    rk = F.row_number().over(Window.orderBy(F.desc("freq"), "token"))
    top = (
        vocab.withColumn("rank", rk.cast("long"))
        .where(F.col("rank") <= top_symbols)
        .select(F.lit("symbol").alias("kind"), "rank", "token", "freq")
    )
    merge_df = spark.createDataFrame(
        [(i, f"{l} {r}", freq) for i, l, r, freq in merges],
        "rank long, token string, freq long",
    ).select(F.lit("merge").alias("kind"), "rank", "token", "freq")
    return merge_df.unionByName(top)


def bpe_merges_batched(
    docs: DataFrame,
    n_rounds: int = 2,
    m_per_round: int = 2,
    top_symbols: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Batched BPE training — the ``bpe_merges`` scale shortcut for
    real tokenizer runs (30k+ merges): each round learns the top
    ``m_per_round`` pairs in ONE pair count + ONE m-row collect, then
    applies all m replaces in rank order in a single pass over the
    vocab frame — collect count drops from k to k/m, the standard
    production-trainer batching.

    Batch selection is GREEDY IN RANK ORDER (freq desc, then (l, r) —
    the q190 tie-break): accept a pair iff it is SYMBOL-DISJOINT from
    every pair already accepted this round ({l, r} sets disjoint),
    stop at m — the standard trainer shortcut (on natural text the
    raw top-m always shares a symbol: 'e r'/'o r'-style collisions,
    measured on the fixtures).  Disjointness makes the round's
    replace PATTERNS non-overlapping on the round-start string (two
    patterns ``|a|b|`` / ``|c|d|`` over disjoint symbols can never
    overlap beyond a shared boundary pipe), so applying them in rank
    order within one projection is well-defined.  It does NOT make
    the replaces a commuting set: a later pair whose symbol equals an
    earlier pair's CONCATENATION matches occurrences the earlier
    replace just created (batch [('a','b'), ('ab','x')] is
    symbol-disjoint, yet '|a|b|x|' -> '|ab|x|' -> '|abx|'), so
    application is order-dependent there and the reported round-start
    ``freq`` can understate what was actually merged — rank-order
    application IS the defined semantics, and the oracle replays the
    identical ordered chain.  The greedy
    scan runs over the round's top ``8·m`` candidates only (ONE m-row
    collect stays the point); a round that cannot fill m disjoint
    pairs from that prefix raises loudly (the fuzzy.py max_bucket
    circuit-breaker pattern) rather than silently shrinking the
    batch.  Note what greedy batching does NOT promise: a merged
    symbol's NEW pairs could out-rank the batch's tail in a fully
    sequential retrain, so batched == sequential is a per-corpus
    fact (checked by test on the fixtures), not a theorem; the
    batched semantics themselves are deterministic and
    oracle-replayable either way.

    Output schema matches ``bpe_merges``: merge rows carry the GLOBAL
    rank (round-major, rank-within-batch minor) and the pair's count
    at ROUND start; then the top ``top_symbols`` final symbols.

    At 100 TB: identical shape to ``bpe_merges`` (the corpus pays one
    token-count shuffle; rounds run on the vocab frame) with 1/m the
    driver round-trips and lineage cuts.
    """
    if n_rounds < 1 or m_per_round < 1:
        raise ValueError("n_rounds and m_per_round must be >= 1")
    spark = docs.sparkSession
    words = (
        docs.select(F.explode(tokens_col(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .select(
            "cnt",
            F.concat(
                F.lit("|"),
                F.array_join(
                    F.filter(F.split(F.col("w"), ""), lambda x: x != ""),
                    "|",
                ),
                F.lit("|"),
            ).alias("sym"),
        )
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[int, str, str, int]] = []
    rank = 0
    for i in range(1, n_rounds + 1):
        pc = (
            words.select("cnt", F.explode(F.expr(_PAIRS)).alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("cnt").alias("freq"))
        )
        cand = (
            pc.orderBy(F.desc("freq"), "l", "r")
            .limit(8 * m_per_round)
            .collect()
        )
        batch = []
        seen: set[str] = set()
        for row in cand:
            if row["l"] in seen or row["r"] in seen:
                continue
            batch.append(row)
            seen.update((row["l"], row["r"]))
            if len(batch) == m_per_round:
                break
        if len(batch) < m_per_round:
            raise ValueError(
                f"bpe_merges_batched: round {i} found only "
                f"{len(batch)} symbol-disjoint pairs in the top "
                f"{8 * m_per_round} candidates (m={m_per_round}) - "
                "corpus exhausted or pathologically collided; lower "
                "m_per_round or use bpe_merges"
            )
        col = F.col("sym")
        for row in batch:
            rank += 1
            merges.append((rank, row["l"], row["r"], int(row["freq"])))
            col = F.replace(
                col,
                F.lit(f"|{row['l']}|{row['r']}|"),
                F.lit(f"|{row['l']}{row['r']}|"),
            )
        words = words.withColumn("sym", col).localCheckpoint(eager=True)
    vocab = (
        words.select("cnt", F.explode(F.expr(_SYMS)).alias("token"))
        .groupBy("token")
        .agg(F.sum("cnt").alias("freq"))
    )
    rk = F.row_number().over(Window.orderBy(F.desc("freq"), "token"))
    top = (
        vocab.withColumn("rank", rk.cast("long"))
        .where(F.col("rank") <= top_symbols)
        .select(F.lit("symbol").alias("kind"), "rank", "token", "freq")
    )
    merge_df = spark.createDataFrame(
        [(r, f"{l} {x}", freq) for r, l, x, freq in merges],
        "rank long, token string, freq long",
    ).select(F.lit("merge").alias("kind"), "rank", "token", "freq")
    return merge_df.unionByName(top)
