"""operators/bpe.py — distributed BPE merge learning.

The staged gate (q190) proves hash parity with the unrolled-CTE
oracle at two sfs; these pin the merge algebra on hand-computed
corpora, the frequency weighting, the lexicographic tie-break, the
early-exhaustion failure, and — critically — that Spark's and
DuckDB's literal ``replace`` share the left-to-right non-overlapping
resume-after-replacement semantics the operator's merge step is
DEFINED by (the run-overlap corner included).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from live_market_data_orderflow_analysis_big_data_project__spark.operators.bpe import (  # noqa: E501
    bpe_merges,
)


def _docs(spark, texts):
    return spark.createDataFrame([(t,) for t in texts], "text string")


def _run(spark, texts, k=3, top=20):
    out = bpe_merges(_docs(spark, texts), k, top).collect()
    merges = [
        (r.rank, r.token, r.freq) for r in out if r.kind == "merge"
    ]
    syms = {r.token: (r.rank, r.freq) for r in out if r.kind == "symbol"}
    return sorted(merges), syms


def test_hand_computed_merges(spark):
    # corpus: "the the the cat" -> words {the:3, cat:1}
    # pairs: (t,h)=3, (h,e)=3, (c,a)=1, (a,t)=1+... wait: 'cat' has
    # (c,a) and (a,t); 'the' has (t,h) and (h,e).
    # merge 1: freq 3 tie (h,e) vs (t,h) -> lexicographic: ('h','e')
    # wins over ('t','h').  'the' -> |t|he|
    # merge 2: (t,he)=3 beats (a,t)=1, (c,a)=1 -> 'the' -> |the|
    # merge 3: freq-1 pairs left: (a,t) vs (c,a) -> ('a','t') wins
    merges, syms = _run(spark, ["the the the cat"])
    assert merges == [(1, "h e", 3), (2, "t he", 3), (3, "a t", 1)]
    # final words: the -> [the] x3; cat -> [c, at]
    assert syms["the"] == (1, 3)
    assert {s for s in syms} == {"the", "c", "at"}


def test_frequency_weighting_across_docs(spark):
    # 'ab' appears 5 times across docs, 'cd' twice: (a,b) must win
    merges, _ = _run(spark, ["ab ab cd", "ab ab ab cd"], k=1)
    assert merges == [(1, "a b", 5)]


def test_run_overlap_single_pass_semantics(spark):
    # word 'aaaa' (x2) + 'ab' (x3): merge 1 is (a,a) with freq
    # 3 pairs x 2 = 6.  Single-pass replace on |a|a|a|a| consumes the
    # shared pipe: -> |aa|a|a| (NOT |aa|aa|) — so the post-merge vocab
    # of 'aaaa' is {aa:1, a:2} per occurrence.
    merges, syms = _run(spark, ["aaaa aaaa ab ab ab"], k=1)
    assert merges == [(1, "a a", 6)]
    # aaaa x2 -> aa:2, a:4 ; ab x3 -> a:3, b:3  => a:7, aa:2, b:3
    assert syms["a"][1] == 7
    assert syms["aa"][1] == 2
    assert syms["b"][1] == 3


def test_replace_semantics_pinned_cross_engine(spark):
    # the operator's merge step is DEFINED by engine replace()
    # semantics — prove Spark and DuckDB agree on the corners
    cases = [
        ("|a|a|a|a|", "|a|a|", "|aa|"),   # run overlap
        ("|a|b|a|b|", "|a|b|", "|ab|"),   # boundary-pipe consumption
        ("|x|a|b|y|", "|a|b|", "|ab|"),   # interior match
        ("|xa|b|y|", "|a|b|", "|ab|"),    # no false partial-symbol hit
    ]
    con = duckdb.connect()
    df = spark.createDataFrame(cases, "s string, f string, t string")
    got = df.select(
        "s", "f", "t", F.replace("s", "f", "t").alias("r")
    ).collect()
    for row in got:
        duck = con.execute(
            "select replace(?, ?, ?)", [row.s, row.f, row.t]
        ).fetchone()[0]
        assert row.r == duck, (row.s, row.f, row.t, row.r, duck)
    con.close()


def test_tie_break_is_lexicographic(spark):
    # (x,y) and (p,q) both freq 2 -> (p,q) first
    merges, _ = _run(spark, ["xy xy pq pq"], k=2)
    assert merges[0] == (1, "p q", 2)
    assert merges[1] == (2, "x y", 2)


def test_exhaustion_raises(spark):
    # single-char words have no pairs at all
    with pytest.raises(ValueError, match="exhausted"):
        _run(spark, ["a b c a b"], k=1)


def test_top_symbols_rank_and_cap(spark):
    _, syms = _run(spark, ["the the the cat"], k=3, top=2)
    assert len(syms) == 2
    assert syms["the"][0] == 1  # freq 3
    # freq-1 tie between 'at' and 'c' -> 'at' < 'c' lexicographically
    assert syms["at"][0] == 2


def test_fixture_binding(spark):
    """The q172/q183 binding discipline at BOTH gate sfs: the learned
    merges must actually restructure the vocabulary (some multi-char
    symbol appears in the top-20 with the full 3-merge chain applied)
    and the merge frequencies must be strictly positive and
    non-increasing in rank order — otherwise the gate degenerates to
    a char-frequency count."""
    from conftest import SF0001, SF001

    from live_market_data_orderflow_analysis_big_data_project__spark.queries.ablock import (  # noqa: E501
        q190_bpe_merges,
    )

    for sf in (SF0001, SF001):
        out = q190_bpe_merges(spark, sf).collect()
        merges = sorted(
            (r.rank, r.freq) for r in out if r.kind == "merge"
        )
        assert len(merges) == 3, sf
        assert all(f > 0 for _, f in merges), sf
        assert all(
            merges[i][1] >= merges[i + 1][1] for i in range(len(merges) - 1)
        ), (sf, merges)
        syms = [r.token for r in out if r.kind == "symbol"]
        assert len(syms) == 20, sf
        assert any(len(s) >= 2 for s in syms), (sf, syms)


# --- batched merges (staged gate q194) --------------------------------------


def _run_batched(spark, texts, rounds=2, m=2, top=20):
    from live_market_data_orderflow_analysis_big_data_project__spark.operators.bpe import (  # noqa: E501
        bpe_merges_batched,
    )

    out = bpe_merges_batched(_docs(spark, texts), rounds, m, top).collect()
    merges = [
        (r.rank, r.token, r.freq) for r in out if r.kind == "merge"
    ]
    syms = {r.token: (r.rank, r.freq) for r in out if r.kind == "symbol"}
    return sorted(merges), syms


def test_batched_greedy_skips_symbol_sharing_pair(spark):
    # words: "ther" x4, "orxx" x3 -> pairs (t,h)=4 (h,e)=4 (e,r)=4
    # (o,r)=3 (r,x)=3 (x,x)=3.  Round-1 rank order: (e,r), (h,e),
    # (t,h), (o,r), ...  Greedy m=2: accept ('e','r'); skip ('h','e')
    # (shares e) and ('t','h') is disjoint -> batch = [(e,r), (t,h)].
    merges, _ = _run_batched(
        spark, ["ther " * 4 + "orxx " * 3], rounds=1, m=2
    )
    assert merges == [(1, "e r", 4), (2, "t h", 4)]


def test_batched_equals_sequential_when_disjoint(spark):
    # corpus where the top-2 pairs are symbol-disjoint AND no merged
    # symbol's new pairs out-rank them: batched(1 round, m=2) must
    # equal sequential k=2 exactly (rank order included)
    texts = ["ab ab ab ab cd cd cd xyz"]
    got = _run_batched(spark, texts, rounds=1, m=2)
    want_m, want_s = _run(spark, texts, k=2)
    assert got == (sorted(want_m), want_s)


def test_batched_circuit_breaker_raises(spark):
    # every pair shares the symbol 'a': greedy cannot fill m=2 from
    # any prefix -> loud failure, never a silently smaller batch
    with pytest.raises(ValueError, match="symbol-disjoint"):
        _run_batched(spark, ["aaaa aaaa aaaa"], rounds=1, m=2)


def test_batched_replaces_commute_within_round(spark):
    # both round-1 merges applied in one pass: 'abcd' contains both
    # patterns back to back — final vocab must show 'ab' and 'cd'
    # both merged (disjoint patterns cannot shadow each other)
    _, syms = _run_batched(
        spark, ["ab ab ab ab cd cd cd abcd abcd xyz"], rounds=1, m=2
    )
    assert "ab" in syms and "cd" in syms


def test_batched_gate_binding(spark):
    """At both gate sfs the greedy scan must actually SKIP at least
    one ranked pair (the batch rule binds — on this corpus the raw
    top-m always shares a symbol, which is the entire reason the
    operator is greedy) and still fill every round."""
    from live_market_data_orderflow_analysis_big_data_project__spark.operators.bpe import (  # noqa: E501
        bpe_merges,
        bpe_merges_batched,
    )
    from live_market_data_orderflow_analysis_big_data_project__spark.queries.ablock import (  # noqa: E501
        _Q194_M,
        _Q194_ROUNDS,
        q194_bpe_batched,
    )
    from live_market_data_orderflow_analysis_big_data_project__spark.sources.tables import (  # noqa: E501
        load_table,
    )

    from conftest import SF0001, SF001

    from live_market_data_orderflow_analysis_big_data_project__spark.operators.llmops import (  # noqa: E501
        tokens_col,
    )

    for sf in (SF0001, SF001):
        out = q194_bpe_batched(spark, sf).collect()
        merges = [r for r in out if r.kind == "merge"]
        assert len(merges) == _Q194_ROUNDS * _Q194_M, sf
        # the batch rule itself: every round's picks pairwise disjoint
        for i in range(_Q194_ROUNDS):
            rnd = merges[i * _Q194_M:(i + 1) * _Q194_M]
            p = [set(r.token.split(" ")) for r in rnd]
            for a in range(len(p)):
                for b in range(a + 1, len(p)):
                    assert not (p[a] & p[b]), (sf, i, rnd)
    # the greedy skip FIRED (measured where it binds in round 1 —
    # sf0.001; at sf0.01 the collision appears in round 2 instead,
    # where recomputing raw ranks would replay the merge): the raw
    # round-1 rank-2 pair shares a symbol with rank-1, so plain top-m
    # would have been an invalid batch
    out = q194_bpe_batched(spark, SF0001).collect()
    bat_pairs = [r.token for r in out if r.kind == "merge"][: _Q194_M]
    p1, p2 = (set(t.split(" ")) for t in bat_pairs)
    docs = load_table(spark, SF0001, "documents").select("text")
    chars = docs.select(
        F.explode(tokens_col("text")).alias("w")
    ).select(
        F.filter(F.split("w", ""), lambda x: x != "").alias("cs")
    )
    raw = (
        chars.select(
            F.explode(
                # sequence(1, 0) counts DOWN in Spark, so 1-char
                # words need the explicit size guard (_PAIRS shape)
                F.expr(
                    "CASE WHEN size(cs) >= 2 THEN "
                    "transform(sequence(1, size(cs) - 1), "
                    "j -> named_struct('l', element_at(cs, j), "
                    "'r', element_at(cs, j + 1))) "
                    "ELSE array() END"
                )
            ).alias("p")
        )
        .groupBy("p.l", "p.r")
        .count()
        .orderBy(F.desc("count"), "l", "r")
        .limit(2)
        .collect()
    )
    assert {raw[0]["l"], raw[0]["r"]} == p1  # same first pick
    assert {raw[1]["l"], raw[1]["r"]} & p1  # raw rank-2 collides
    assert {raw[1]["l"], raw[1]["r"]} != p2  # so it was skipped
