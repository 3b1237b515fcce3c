"""Batch table loaders for the driver fixtures (TESTDATA.md).

Generalizes the reference's batch Parquet read-back path
(reference README.md:386-391: ``spark.read.parquet(...)``), with timestamp
normalization for the two fixture encodings seen across driver builds:

- TIMESTAMP(NANOS): Spark's reader rejects it; under
  ``spark.sql.legacy.parquet.nanosAsLong`` the column arrives as int64
  nanoseconds and we truncate-divide to microseconds (``ts div 1000``) —
  exactly what DuckDB does when it reads the same file.
- naive TIMESTAMP(MICROS): Spark 4 surfaces it as TIMESTAMP_NTZ unless
  ``spark.sql.parquet.inferTimestampNTZ.enabled=false`` (set in
  session.ENGINE_CONFS).  Should a session still hand us NTZ (conf applied
  after a cached scan, foreign session), we cast it to session-tz TIMESTAMP
  here — a wall-clock no-op under the enforced UTC zone, and the type
  ``withWatermark`` and the DuckDB oracle both expect.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

from ..session import ensure_engine_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(
    spark: SparkSession, sf_dir: str, name: str, normalize: bool = True
) -> DataFrame:
    """Load one fixture table, normalizing nanosecond timestamps.

    ``normalize=False`` returns the raw frame (``events.ts`` as int64
    nanoseconds) — the streaming file source needs this schema to read the
    same files before applying its own normalization.
    """
    ensure_engine_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if normalize:
        df = normalize_timestamps(df, name)
    return df


def normalize_timestamps(df: DataFrame, name: str = "events") -> DataFrame:
    """Normalize fixture timestamp encodings to session-tz TIMESTAMP."""
    if name == "events" and "ts" in df.columns and isinstance(
        df.schema["ts"].dataType, LongType
    ):
        # int64 nanoseconds -> timestamp (microsecond precision, floor-div,
        # matching DuckDB's ns->us truncation of the same parquet column).
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    ntz = [
        f.name for f in df.schema.fields if isinstance(f.dataType, TimestampNTZType)
    ]
    for c in ntz:
        # Naive UTC fixture under a UTC session: cast preserves wall-clock.
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names=TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names=TABLES) -> None:
    """Register each fixture as a temp view (for spark.sql entry points)."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
