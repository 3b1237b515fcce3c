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
