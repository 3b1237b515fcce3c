"""Schema-pinned corpus-format IO: JSONL, CSV, ORC.

The reference's at-rest format is parquet only (tick_to_hdfs.py:64,
candle_to_hdfs.py:57); a training-data pipeline additionally lives on
JSONL (the interchange format of web-scale text corpora), CSV (tabular
drops from spreadsheet-land), and ORC (the other columnar container).
These wrappers pin the posture that survives 100 TB:

- **Never infer schema.**  ``inferSchema``/sampled JSON inference reads
  the dataset once before the real job — a full extra pass at scale and
  a schema that drifts with the sample.  Every reader here REQUIRES an
  explicit schema (the same rule the reference applies to Kafka JSON:
  data_processor.py:20-63 declares all 5 nesting levels).
- **Quarantine, don't crash.**  At corpus scale malformed lines are a
  certainty.  ``bad_records="quarantine"`` keeps them in a
  ``_corrupt_record`` column for a side-channel audit (same pattern as
  operators/ticks.py's parse-quarantine variant); "drop" and "fail"
  map to Spark's DROPMALFORMED / FAILFAST.
- **Bounded file sizes on write.**  ``maxRecordsPerFile`` instead of
  ``coalesce(1)`` so writes stay parallel and downstream listings see
  neither million-file dirs nor single 2 TB files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructField, StructType, StringType

_BAD_RECORD_MODES = {
    "quarantine": "PERMISSIVE",
    "drop": "DROPMALFORMED",
    "fail": "FAILFAST",
}

CORRUPT_COL = "_corrupt_record"


def _reader_schema(schema: StructType, bad_records: str) -> StructType:
    if bad_records == "quarantine" and CORRUPT_COL not in schema.fieldNames():
        return StructType(
            list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
        )
    return schema


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    bad_records: str = "quarantine",
) -> DataFrame:
    """Read line-delimited JSON with a pinned schema.

    ``bad_records="quarantine"`` adds a ``_corrupt_record`` column holding
    the raw line for every row that failed to parse (all data columns
    NULL there); filter on it to split clean/quarantined streams.
    """
    if bad_records not in _BAD_RECORD_MODES:
        raise ValueError(f"bad_records must be one of {sorted(_BAD_RECORD_MODES)}")
    return (
        spark.read.schema(_reader_schema(schema, bad_records))
        .option("mode", _BAD_RECORD_MODES[bad_records])
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str | None = None,
    max_records_per_file: int = 5_000_000,
) -> None:
    """Write line-delimited JSON, parallel, with bounded file sizes."""
    w = df.write.mode(mode).option("maxRecordsPerFile", max_records_per_file)
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_csv_pinned(
    spark: SparkSession,
    path: str,
    schema: StructType,
    bad_records: str = "quarantine",
    header: bool = True,
    multi_line: bool = False,
) -> DataFrame:
    """Read CSV with a pinned schema (no inferSchema pass).

    ``multi_line=True`` parses quoted fields containing newlines — needed
    for free-text columns, at the cost of file-at-a-time (non-splittable)
    parsing; leave False for line-safe data so reads stay splittable.
    """
    if bad_records not in _BAD_RECORD_MODES:
        raise ValueError(f"bad_records must be one of {sorted(_BAD_RECORD_MODES)}")
    return (
        spark.read.schema(_reader_schema(schema, bad_records))
        .option("mode", _BAD_RECORD_MODES[bad_records])
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", header)
        .option("multiLine", multi_line)
        # Spark trims cell whitespace by default on BOTH read and write —
        # silent corruption for text data (found by the hypothesis
        # round-trip test: '0 ' came back as '0').  Preserve bytes.
        .option("ignoreLeadingWhiteSpace", False)
        .option("ignoreTrailingWhiteSpace", False)
        .csv(path)
    )


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    header: bool = True,
    max_records_per_file: int = 5_000_000,
) -> None:
    """Parallel CSV write (quoted/escaped per RFC 4180 defaults).

    Unlike sinks.export_csv (the reference-parity coalesce(1) export for
    humans, README.md:402), this keeps one file per task for data-sized
    output.
    """
    (
        df.write.mode(mode)
        .option("header", header)
        .option("maxRecordsPerFile", max_records_per_file)
        # Preserve cell whitespace (writer also trims by default).
        .option("ignoreLeadingWhiteSpace", False)
        .option("ignoreTrailingWhiteSpace", False)
        .csv(path)
    )


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """Read ORC (self-describing columnar; schema travels with the file,
    including nested array/struct columns)."""
    return spark.read.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    max_records_per_file: int = 5_000_000,
) -> None:
    """Write ORC with bounded file sizes (zlib default compression)."""
    (
        df.write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .orc(path)
    )
