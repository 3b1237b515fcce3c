"""Winnowed substring dedup (operators/winnow.py): the winnowing
guarantee on planted shared substrings, a pure-Python fingerprint
model, span truthfulness (every reported max span IS a literal shared
substring), the df-screen, and the gate-fixture bindings."""

from __future__ import annotations

import hashlib
import random
import string

from pyspark.sql import functions as F  # noqa: F401

from live_market_data_orderflow_analysis_big_data_project__spark.operators.winnow import (  # noqa: E501
    substring_dup_spans,
    winnow_fingerprints,
)

from conftest import SF0001, SF001


def _h60(s: str) -> int:
    # the operator's selection key: 60-bit md5-prefix int (numeric
    # order == 15-hex-char lexicographic order)
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _model_fps(text: str, k: int, w: int):
    """The winnowing selection in pure Python: winner of every
    complete w-window by (md5-prefix-int asc, pos desc); 1-based
    positions."""
    n = len(text) - k + 1
    if len(text) < k + w - 1:
        return set()
    grams = [(p, text[p - 1 : p - 1 + k]) for p in range(1, n + 1)]
    out = set()
    for s in range(1, n - w + 2):
        win = grams[s - 1 : s - 1 + w]
        p, g = min(win, key=lambda pg: (_h60(pg[1]), -pg[0]))
        out.add((p, g))
    return out


def _docs(spark, texts):
    return spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )


def test_fingerprints_match_python_model(spark):
    rng = random.Random(3)
    texts = {
        i: "".join(
            rng.choice(string.ascii_lowercase + " ") for _ in range(120)
        )
        for i in range(4)
    }
    texts[4] = "short"  # < k + w - 1: contributes nothing
    k, w = 8, 4
    got = {
        (r.doc_id, r.pos, r.gram)
        for r in winnow_fingerprints(
            _docs(spark, texts), k=k, w=w
        ).collect()
    }
    want = {
        (i, p, g)
        for i, t in texts.items()
        for (p, g) in _model_fps(t, k, w)
    }
    assert got == want


def test_planted_shared_substring_is_always_detected(spark):
    """The winnowing guarantee: ANY shared run of >= w + k - 1 chars
    yields a shared selected fingerprint — deterministic detection,
    the contrast with q124's mod-p sampling.  The MINIMAL payload
    (w + k - 1 chars) guarantees one shared fingerprint, so the
    certified span is >= k (one match certifies k chars, not the whole
    run — the span is a LOWER bound); a LONG payload's interior
    windows winnow identically in both docs, so the certified span
    approaches the payload: >= L - 2(w - 1)."""
    k, w = 8, 4
    rng = random.Random(17)
    for trial in range(5):
        def noise(n):
            return "".join(
                rng.choice(string.ascii_uppercase) for _ in range(n)
            )

        # minimal payload: detection guaranteed, span >= k
        pmin = "".join(
            rng.choice(string.ascii_lowercase) for _ in range(w + k - 1)
        )
        texts = {
            0: noise(rng.randrange(0, 40)) + pmin + noise(20),
            1: noise(rng.randrange(0, 40)) + pmin + noise(20),
        }
        out = substring_dup_spans(
            _docs(spark, texts), k=k, w=w
        ).collect()
        assert len(out) == 1, (trial, out)
        r = out[0]
        assert (r.doc_a, r.doc_b) == (0, 1)
        assert r.max_span_chars >= k, trial

        # long payload: interior-window selections coincide, the
        # certified span covers all but the w-1 edge positions
        plong = "".join(
            rng.choice(string.ascii_lowercase) for _ in range(80)
        )
        texts = {
            0: noise(rng.randrange(0, 40)) + plong + noise(20),
            1: noise(rng.randrange(0, 40)) + plong + noise(20),
        }
        out = substring_dup_spans(
            _docs(spark, texts), k=k, w=w
        ).collect()
        assert len(out) == 1, (trial, out)
        assert out[0].max_span_chars >= 80 - 2 * (w - 1), (
            trial,
            out[0].max_span_chars,
        )


def test_reported_spans_are_literal_shared_substrings(spark):
    """Span truthfulness on the fixture: for the 3 widest-span pairs,
    a max_span_chars-length substring of doc_a occurs verbatim in
    doc_b — the 'exact' in exact substring dedup."""
    docs = (
        spark.read.parquet(f"{SF0001}/documents.parquet")
        .select("doc_id", "text")
    )
    rows = sorted(
        substring_dup_spans(docs).collect(),
        key=lambda r: -r.max_span_chars,
    )[:3]
    assert rows
    texts = {
        r.doc_id: r.text
        for r in docs.where(
            F.col("doc_id").isin(
                [x for r in rows for x in (r.doc_a, r.doc_b)]
            )
        ).collect()
    }
    for r in rows:
        a, b, span = texts[r.doc_a], texts[r.doc_b], r.max_span_chars
        assert any(
            a[i : i + span] in b for i in range(len(a) - span + 1)
        ), (r.doc_a, r.doc_b, span)


def test_df_screen_drops_boilerplate(spark):
    """A gram shared by every doc disappears at max_df below the doc
    count (no pairs), reappears above it (all pairs)."""
    k, w = 8, 4
    boiler = "zqzqzqzqzqzqzq"  # w + k - 1 = 11 <= 14 chars, shared
    rng = random.Random(5)
    texts = {
        i: boiler
        + "".join(rng.choice(string.ascii_uppercase) for _ in range(30))
        for i in range(4)
    }
    none = substring_dup_spans(
        _docs(spark, texts), k=k, w=w, max_df=3
    ).count()
    assert none == 0
    allp = substring_dup_spans(
        _docs(spark, texts), k=k, w=w, max_df=4
    ).count()
    assert allp == 6  # C(4,2)


def test_gate_bindings_on_fixture(spark):
    """At both gate sfs: pairs exist (detection binds), most docs pair
    with nobody (the screen binds), and winnowing genuinely thins the
    gram frame (selected << total grams)."""
    for sf in (SF0001, SF001):
        docs = (
            spark.read.parquet(f"{sf}/documents.parquet")
            .select("doc_id", "text")
        )
        out = substring_dup_spans(docs).collect()
        assert out, sf
        n_docs = docs.count()
        paired = {r.doc_a for r in out} | {r.doc_b for r in out}
        assert len(paired) < n_docs / 2, (sf, len(paired))
        fp = winnow_fingerprints(docs).count()
        total = (
            docs.where(F.length("text") >= 39)
            .select((F.length("text") - 31).alias("n"))
            .agg(F.sum("n"))
            .collect()[0][0]
        )
        assert fp < total / 3, (sf, fp, total)
