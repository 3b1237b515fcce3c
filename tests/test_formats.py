"""Corpus-format IO: schema-pinned JSONL/CSV/ORC round-trips and
malformed-record quarantine semantics (sources/formats.py)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from live_market_data_orderflow_analysis_big_data_project__spark.sources.formats import (
    CORRUPT_COL,
    read_csv_pinned,
    read_jsonl,
    read_orc,
    write_csv,
    write_jsonl,
    write_orc,
)

# Built without fromDDL: that classmethod needs a live session, and this
# module is collected before the spark fixture starts one.
DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("n", IntegerType()),
    ]
)


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, text="plain", n=10),
            Row(doc_id=2, text='with "quotes" and, commas', n=20),
            Row(doc_id=3, text="unicode é中文", n=30),
        ],
        schema=DOC_SCHEMA,
    )


def test_jsonl_roundtrip_lossless(spark, docs, tmp_path):
    path = str(tmp_path / "docs")
    write_jsonl(docs, path)
    back = read_jsonl(spark, path, DOC_SCHEMA, bad_records="fail")
    assert sorted(back.collect()) == sorted(docs.collect())


def test_jsonl_quarantine_captures_bad_lines(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    (src / "part-0.json").write_text(
        '{"doc_id": 1, "text": "ok", "n": 5}\n'
        "THIS IS NOT JSON\n"
        '{"doc_id": 2, "text": "also ok", "n": 6}\n'
    )
    back = read_jsonl(spark, str(src), DOC_SCHEMA, bad_records="quarantine")
    rows = back.collect()
    assert len(rows) == 3
    bad = [r for r in rows if r[CORRUPT_COL] is not None]
    assert len(bad) == 1 and bad[0][CORRUPT_COL] == "THIS IS NOT JSON"
    clean = [r for r in rows if r[CORRUPT_COL] is None]
    assert sorted(r.doc_id for r in clean) == [1, 2]


def test_jsonl_drop_and_fail_modes(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    (src / "part-0.json").write_text(
        '{"doc_id": 1, "text": "ok", "n": 5}\nbroken\n'
    )
    dropped = read_jsonl(spark, str(src), DOC_SCHEMA, bad_records="drop")
    assert dropped.count() == 1
    with pytest.raises(Exception):
        read_jsonl(spark, str(src), DOC_SCHEMA, bad_records="fail").count()
    with pytest.raises(ValueError):
        read_jsonl(spark, str(src), DOC_SCHEMA, bad_records="nonsense")


def test_csv_roundtrip_quotes_and_commas(spark, docs, tmp_path):
    path = str(tmp_path / "docs")
    write_csv(docs, path)
    back = read_csv_pinned(spark, path, DOC_SCHEMA, bad_records="fail")
    assert sorted(back.collect()) == sorted(docs.collect())


def test_csv_multiline_roundtrip(spark, tmp_path):
    schema = StructType(
        [StructField("id", LongType()), StructField("body", StringType())]
    )
    df = spark.createDataFrame(
        [Row(id=1, body="line one\nline two"), Row(id=2, body="single")],
        schema=schema,
    )
    path = str(tmp_path / "ml")
    write_csv(df, path)
    back = read_csv_pinned(
        spark, path, schema, bad_records="fail", multi_line=True
    )
    assert sorted(back.collect()) == sorted(df.collect())


def test_orc_roundtrip_preserves_arrays(spark, tmp_path):
    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )
    df = spark.createDataFrame(
        [Row(vec_id=1, embedding=[0.5, -1.25]), Row(vec_id=2, embedding=[])],
        schema=schema,
    )
    path = str(tmp_path / "orc")
    write_orc(df, path)
    back = read_orc(spark, path)
    assert back.schema == df.schema
    assert sorted(back.collect()) == sorted(df.collect())
    files = [f for f in os.listdir(path) if f.startswith("part-")]
    assert files, "expected at least one ORC part file"


def test_jsonl_roundtrip_property(spark, tmp_path):
    """Hypothesis: JSONL round-trip is lossless for arbitrary unicode
    text (quotes, newlines, control chars, surrogate-adjacent)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    schema = StructType(
        [StructField("id", LongType()), StructField("body", StringType())]
    )
    case = {"n": 0}

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        texts=st.lists(
            st.text(
                alphabet=st.characters(
                    exclude_categories=("Cs",)  # no lone surrogates
                ),
                max_size=80,
            ),
            min_size=1,
            max_size=6,
        )
    )
    def roundtrip(texts):
        case["n"] += 1
        df = spark.createDataFrame(
            [Row(id=i, body=t) for i, t in enumerate(texts)], schema=schema
        )
        path = str(tmp_path / f"jl{case['n']}")
        write_jsonl(df, path)
        back = read_jsonl(spark, path, schema, bad_records="fail")
        assert sorted(back.collect()) == sorted(df.collect())

    roundtrip()


def test_csv_roundtrip_property(spark, tmp_path):
    """Hypothesis: CSV (multiLine) round-trip is lossless for non-empty
    printable text including quotes, commas, and newlines."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    schema = StructType(
        [StructField("id", LongType()), StructField("body", StringType())]
    )
    case = {"n": 0}

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        texts=st.lists(
            st.text(
                alphabet=st.characters(
                    exclude_categories=("Cs", "Cc"),
                    include_characters='",\n',
                ),
                min_size=1,
                max_size=60,
            ).filter(lambda s: s.strip() != ""),
            min_size=1,
            max_size=5,
        )
    )
    def roundtrip(texts):
        case["n"] += 1
        df = spark.createDataFrame(
            [Row(id=i, body=t) for i, t in enumerate(texts)], schema=schema
        )
        path = str(tmp_path / f"cs{case['n']}")
        write_csv(df, path)
        back = read_csv_pinned(
            spark, path, schema, bad_records="fail", multi_line=True
        )
        assert sorted(back.collect()) == sorted(df.collect())

    roundtrip()
