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
