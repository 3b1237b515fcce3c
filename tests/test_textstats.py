"""Char-entropy quality screen (operators/textstats.py): hand-model
equality on unicode/degenerate docs, the exclusion rules, and the
gate-fixture flag binding."""

from __future__ import annotations

import math
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import functions as F  # noqa: F401

from live_market_data_orderflow_analysis_big_data_project__spark.operators.textstats import (  # noqa: E501
    char_entropy_stats,
)

from conftest import SF0001, SF001


_TERMINATORS = {"\n", "\r", "\u0085", "\u2028", "\u2029"}


def _round4(v: float) -> float:
    # Spark's round(double, 4): BigDecimal.valueOf -> HALF_UP
    return float(Decimal(repr(v)).quantize(Decimal("0.0001"),
                                           rounding=ROUND_HALF_UP))


def _model(texts, thr):
    out = {}
    for i, t in texts.items():
        chars = [c for c in t if c not in _TERMINATORS]
        if not chars:
            continue  # no distribution -> excluded
        c = Counter(chars)
        n = len(chars)
        top_char, top_cnt = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        s = sum(v * math.log(v) for v in c.values())
        ent = _round4(math.log(n) - s / n)
        ppm = top_cnt * 1_000_000 // n
        out[i] = (n, len(c), top_char, top_cnt, ppm, ent, ppm > thr)
    return out


def test_matches_python_model_on_synthetic_docs(spark):
    texts = {
        0: "aaaaaaaaab",            # near-degenerate: flag fires
        1: "abcdefghij",            # uniform: max entropy, no flag
        2: "the quick brown fox",   # natural text
        3: "éüñΩ éüñΩ x",           # unicode
        4: "a\nb\rc\u2028d",         # all terminator flavors excluded
        5: "\n\r\u2029",             # terminator-only: excluded entirely
        6: "zz",                    # tiny
    }
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = {
        r.doc_id: (
            r.n_chars,
            r.n_distinct,
            r.top_char,
            r.top_cnt,
            r.top_share_ppm,
            r.entropy4,
            r.is_low_quality,
        )
        for r in char_entropy_stats(df, "doc_id", "text", 500_000)
        .collect()
    }
    assert got == _model(texts, 500_000)
    assert 5 not in got  # the no-distribution exclusion


def test_tie_break_is_char_ascending(spark):
    # 'b' and 'a' tie at 2 occurrences: top_char must be 'a'
    df = spark.createDataFrame(
        [(0, "abab")], "doc_id long, text string"
    )
    row = char_entropy_stats(df, "doc_id", "text").collect()[0]
    assert (row.top_char, row.top_cnt) == ("a", 2)


def test_gate_flag_binds_both_directions(spark):
    """At both gate sfs the exact-integer flag must fire for SOME
    docs and pass others (a constant boolean column degenerates the
    gate to the numeric columns alone)."""
    from live_market_data_orderflow_analysis_big_data_project__spark.queries.ablock import (  # noqa: E501
        q196_char_entropy,
    )

    for sf in (SF0001, SF001):
        flags = [
            r.is_low_quality for r in q196_char_entropy(spark, sf).collect()
        ]
        assert any(flags) and not all(flags), (
            sf,
            sum(flags),
            len(flags),
        )
