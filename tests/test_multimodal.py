"""Unit tests for operators/multimodal.py (binary payload plumbing)."""

from __future__ import annotations

import hashlib

import pytest

from live_market_data_orderflow_analysis_big_data_project__spark.operators.multimodal import (
    decode_image,
    extract_features,
    with_payload,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(1, "hello"), (2, ""), (3, "Ω unicode")],
        "doc_id long, text string",
    )


def test_with_payload_schema_and_bytes(docs):
    out = with_payload(docs)
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "modality", "n_bytes", "payload",
    ]
    rows = {r["doc_id"]: r for r in out.collect()}
    assert bytes(rows[1]["payload"]) == b"hello"
    assert rows[3]["n_bytes"] == len("Ω unicode".encode())  # byte length, not chars


def test_extract_features_matches_python_hashlib(docs):
    rows = {r["doc_id"]: r for r in extract_features(with_payload(docs)).collect()}
    assert rows[1]["payload_md5"] == hashlib.md5(b"hello").hexdigest()
    assert rows[1]["first_byte"] == ord("h")
    assert rows[2]["n_bytes"] == 0 and rows[2]["first_byte"] is None


def test_decode_image_is_a_loud_stub(docs):
    with pytest.raises(NotImplementedError, match="decode"):
        decode_image(with_payload(docs))


def test_fake_decode_resize_shape(spark):
    from live_market_data_orderflow_analysis_big_data_project__spark.operators.multimodal import (
        fake_decode_resize,
        with_payload,
    )

    df = spark.createDataFrame(
        [(1, "abcdefghijklmnopqrstuvwxyz"), (2, "xy"), (3, "")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["pixels"]
        for r in fake_decode_resize(with_payload(df), out_len=4).collect()
    }
    b = b"abcdefghijklmnopqrstuvwxyz"
    assert out[1] == [b[i * 25 // 3] for i in range(4)]
    assert len(out[1]) == 4
    # shorter-than-target payloads repeat endpoint samples, empty -> []
    # offsets i*(n-1)//(out_len-1) = i*1//3 -> [0, 0, 0, 1]
    assert out[2] == [ord("x"), ord("x"), ord("x"), ord("y")]
    assert out[3] == []


def test_sample_frames_explodes_rows(spark):
    from live_market_data_orderflow_analysis_big_data_project__spark.operators.multimodal import (
        sample_frames,
        with_payload,
    )

    df = spark.createDataFrame(
        [(1, "0123456789"), (2, "")], "doc_id long, text string"
    )
    rows = sample_frames(with_payload(df), n_frames=4).collect()
    got = {(r["doc_id"], r["frame_idx"]): (r["offset"], r["frame_byte"]) for r in rows}
    # 1 payload row -> 4 frame rows; empty payload -> none
    assert len(rows) == 4
    assert got == {
        (1, 0): (0, ord("0")),
        (1, 1): (3, ord("3")),
        (1, 2): (6, ord("6")),
        (1, 3): (9, ord("9")),
    }


def test_null_payload_yields_null_features_not_crash(spark):
    """A NULL text row (NULL payload after with_payload) must flow through
    every mapInPandas operator as NULL/skipped output — one bad row must
    not kill a corpus job (round-2 ADVICE item 1)."""
    from live_market_data_orderflow_analysis_big_data_project__spark.operators.multimodal import (
        extract_features,
        fake_decode_resize,
        sample_frames,
        with_payload,
    )

    df = spark.createDataFrame(
        [(1, None), (2, "ok")], "doc_id long, text string"
    )
    wp = with_payload(df)
    assert {r["doc_id"]: r["payload"] for r in wp.collect()}[1] is None

    feats = {r["doc_id"]: r for r in extract_features(wp).collect()}
    assert feats[1]["n_bytes"] is None
    assert feats[1]["payload_md5"] is None
    assert feats[1]["first_byte"] is None
    assert feats[2]["first_byte"] == ord("o")

    pix = {r["doc_id"]: r["pixels"] for r in fake_decode_resize(wp, 4).collect()}
    assert pix[1] is None and pix[2] is not None

    frames = sample_frames(wp, n_frames=2).collect()
    assert {r["doc_id"] for r in frames} == {2}


def test_fixture_docs_are_ascii_single_byte():
    """q105's oracle mixes byte offsets (Spark side indexes raw UTF-8)
    with character-based substring/unicode (DuckDB side) — only sound
    while every fixture doc is pure ASCII and non-NULL.  Pin that
    assumption so a fixture change fails here, not as a silent q105 hash
    divergence (round-2 ADVICE item 4)."""
    import duckdb

    con = duckdb.connect()
    for sf in ("0.001", "0.01", "0.1"):
        bad = con.execute(
            f"SELECT count(*) FROM '/root/testdata/sf{sf}/documents.parquet' "
            "WHERE text IS NULL OR strlen(text) <> length(text)"
        ).fetchone()[0]
        assert bad == 0, f"sf{sf}: {bad} non-ASCII or NULL docs break q105 parity"
