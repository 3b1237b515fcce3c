"""Expression-level Bloom filter for broadcast-prefiltered joins.

The technique: build a Bloom bitmap over the small side's join keys as
a ONE-ROW DataFrame (bit positions via k seeded ``xxhash64`` probes,
words OR-combined with the ``bit_or`` aggregate, packed into a
dense ``array<bigint>`` of 64-bit words), broadcast that row, and
pre-filter the big side with a pure-expression membership test —
``element_at`` + mask AND per probe.  No UDF anywhere: build and probe
are JVM codegen expressions end-to-end, so the probe rides inside the
big side's scan stage.

Why this exists next to the plain broadcast join (pipeline.py
``decontaminate``): a broadcast hash join ships the small side's FULL
distinct key set to every executor.  At 100 TB the "small" side can
outgrow the broadcast threshold (a big benchmark-suite eval set, a
billion-key dedup index shard) while its BLOOM — ~10 bits/key at 1%
false positives, typically ~100x smaller than the string keys
themselves — still broadcasts trivially.  The bloom pass keeps only
(matches + ~fp_rate of the rest) of the big side, after which the
exact confirm join (now over a tiny slice) removes the false
positives; the result is IDENTICAL to the exact join, which is why
q106b hash-gates against q106's own oracle.  False negatives are
impossible by construction (every inserted key sets all k of its
bits), so no match is lost in the pass — asserted by equivalence in
tests/test_bloom.py.

This is the manual, composable form of what Spark's runtime row-level
filtering (``spark.sql.optimizer.runtime.bloomFilter.enabled``) does
for shuffle joins — exposed as an operator so it also applies where
the optimizer's version cannot reach: derived keys that only exist
after an explode (n-gram shingles), pre-aggregation filtering, or a
bloom persisted once and reused across many queries/batches (the
bitmap row is a plain DataFrame — writable to parquet like the q141
sketch rollup).

Sizing: fp_rate ~= (1 - e^(-k*n/m))^k; the classic k = (m/n) ln 2.
The dense bitmap costs m/8 bytes regardless of fill; m = 2^20
(default) holds ~100k keys at ~1% fp in a 128 KB broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bloom_build", "bloom_might_contain", "bloom_prefilter_join"]

DEFAULT_M_BITS = 1 << 20
DEFAULT_K = 5


def _positions(col: Column, m_bits: int, k: int) -> list[Column]:
    # k independent probes from seeded xxhash64: the seed literal is an
    # extra hashed column, giving k decorrelated 64-bit hashes JVM-side.
    return [
        F.pmod(F.xxhash64(col, F.lit(i)), F.lit(m_bits)) for i in range(k)
    ]


def _word(pos: Column) -> Column:
    return F.shiftright(pos, 6)


def _mask(pos: Column) -> Column:
    # variable shift amount -> the SQL function via call_function (the
    # pyspark shiftleft wrapper only accepts a literal int)
    return F.call_function(
        "shiftleft",
        F.lit(1).cast("bigint"),
        F.pmod(pos, F.lit(64)).cast("int"),
    )


_CHUNK = 128  # words per chunk in the dense-bitmap build (see below)


def bloom_build(
    keys: DataFrame,
    col: str | Column,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """One-row DataFrame holding the bitmap: ``bloom_bits`` — the DENSE
    bitmap as ``array<bigint>`` (length ceil(m_bits/64), rounded up to
    a chunk multiple).  Build is a distributed explode(k positions) ->
    ``bit_or`` per 64-bit word -> chunked scatter into dense
    sub-arrays -> single-row flatten.  Persistable and broadcastable
    (m_bits/8 bytes — 128 KB at the default sizing).

    r16 note on WHY dense: the original sparse ``map<word, bits>``
    made every probe an O(set_words) linear scan (Spark's
    ArrayBasedMapData has no hash lookup), so one row's membership
    test cost k * set_words key comparisons — measured: a 238k-row
    probe pass at the default sizing (~80k comparisons per row) cost
    2.6 s over its 1.1 s shingle-stream input.  A dense array probe is
    O(1) per ``element_at``; the same pass costs 0.6 s over the same
    input.  The scatter is chunked (``_CHUNK`` words per
    chunk, two map lookups bounded by _CHUNK and n_chunks) so the
    build stays distributed and never does an O(n_words * set_words)
    single-row transform."""
    c = F.col(col) if isinstance(col, str) else col
    n_words = (m_bits + 63) // 64
    n_chunks = (n_words + _CHUNK - 1) // _CHUNK
    words = (
        keys.select(
            F.explode(F.array(*_positions(c, m_bits, k))).alias("_pos")
        )
        .select(
            _word(F.col("_pos")).alias("_w"),
            _mask(F.col("_pos")).alias("_m"),
        )
        .groupBy("_w")
        .agg(F.bit_or("_m").alias("_bits"))
    )
    chunks = (
        words.groupBy(F.expr(f"_w div {_CHUNK}").alias("_c"))
        .agg(
            F.map_from_entries(
                F.collect_list(
                    F.struct(
                        F.pmod(F.col("_w"), F.lit(_CHUNK)).alias("_i"),
                        F.col("_bits"),
                    )
                )
            ).alias("_cm")
        )
        .select(
            "_c",
            F.expr(
                f"transform(sequence(0, {_CHUNK - 1}), "
                "i -> coalesce(element_at(_cm, CAST(i AS BIGINT)), "
                "CAST(0 AS BIGINT)))"
            ).alias("_arr"),
        )
    )
    return chunks.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("_c"), F.col("_arr")))
        ).alias("_chm")
    ).select(
        F.expr(
            f"flatten(transform(sequence(0, {n_chunks - 1}), "
            "c -> coalesce(element_at(_chm, CAST(c AS BIGINT)), "
            f"array_repeat(CAST(0 AS BIGINT), {_CHUNK}))))"
        ).alias("bloom_bits")
    )


def bloom_might_contain(
    col: Column,
    bloom_bits: Column,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> Column:
    """Pure-expression membership test: true iff all k probe bits are
    set.  False negatives impossible; false positives at the sized fp
    rate.  ``m_bits``/``k`` MUST match the build call (same probe
    family).  Each probe is one O(1) dense-array ``element_at`` plus a
    mask test (never null: the build's array always covers every word
    index the probe family can produce)."""
    out = None
    for p in _positions(col, m_bits, k):
        word = F.element_at(bloom_bits, (_word(p) + F.lit(1)).cast("int"))
        check = word.bitwiseAND(_mask(p)) != F.lit(0)
        out = check if out is None else (out & check)
    return out


def bloom_prefilter_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
    how: str = "inner",
    small_keys_distinct: bool = False,
) -> DataFrame:
    """Exact equi-join of ``big`` to ``small`` on column ``on``, with a
    bloom-of-``small`` pre-pass on the big side.  Result is identical
    to ``big.join(small, on, how)`` for match-only join types: the
    bloom admits every true match (no false negatives) and the exact
    confirm join removes the bloom's false positives.

    The bitmap row rides in via a broadcast nested-loop join of a
    1-row frame (the zorder scalar-stats pattern) so the pre-pass is
    a narrow filter inside the big side's scan stage; the confirm join
    then only sees the admitted slice.  The confirm join is left
    UNHINTED deliberately: in the operator's motivating regime the
    small side is exactly the frame that outgrew the broadcast
    threshold, so forcing ``F.broadcast`` there would recreate the
    problem the bloom pass exists to avoid — Catalyst/AQE still
    auto-broadcasts it whenever it does fit, and otherwise shuffles
    only the admitted slice (matches + ~fp_rate of the rest) against
    it.

    ``small_keys_distinct=True`` skips the build-side dedup when the
    caller already guarantees ``small``'s keys are distinct (adjacent
    Deduplicate nodes are NOT collapsed by Catalyst, so a redundant
    ``.distinct()`` here would be a second full shuffle of the key
    set).
    """
    if how not in ("inner", "semi", "leftsemi", "left_semi"):
        raise ValueError(
            "bloom_prefilter_join is only sound for match-only joins "
            f"(inner/semi); got {how!r}"
        )
    keys = small.select(on)
    if not small_keys_distinct:
        keys = keys.distinct()
    bloom = bloom_build(keys, on, m_bits, k)
    admitted = (
        big.crossJoin(F.broadcast(bloom))
        .where(bloom_might_contain(F.col(on), F.col("bloom_bits"), m_bits, k))
        .drop("bloom_bits")
    )
    return admitted.join(small, on, how)
