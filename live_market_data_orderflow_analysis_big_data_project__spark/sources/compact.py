"""Small-file compaction for partitioned parquet layouts.

Streaming ingestion with frequent triggers (reference parity:
tick_to_hdfs.py:70's 10-second trigger writing `date=` partitioned
parquet) produces one file per micro-batch per partition dir — at 100 TB
that is millions of KB-sized files, and scan planning (file listing +
footer reads) starts to dominate query time.  Compaction rewrites the
layout so each partition dir holds few, target-sized files.

The Spark-native formulation needs no custom file surgery:

- ``repartition(partition_col)`` routes every row of a hive partition to
  one task, so each dir is written as ONE file;
- the writer's ``maxRecordsPerFile`` option re-splits oversized
  partitions at a row bound, capping file size without a second pass;
- hot partitions (one date holding a disproportionate share — the skew
  case where a single writer task serializes) can be spread over
  ``tasks_per_partition`` salted writer tasks, trading 1-file-per-dir
  for bounded write parallelism.  The salt is a deterministic
  ``xxhash64`` of ``salt_col`` so reruns produce identical file
  contents.

Compaction is a pure rewrite: the gate query (q135) hash-verifies the
compacted dataset's checksums against the original fixture via the
DuckDB oracle, and tests/test_sinks.py asserts the file-count collapse
and the maxRecordsPerFile re-split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def compact_partitioned(
    spark: SparkSession,
    src: str,
    dst: str,
    partition_col: str,
    max_records_per_file: int = 5_000_000,
    tasks_per_partition: int = 1,
    salt_col: str | None = None,
) -> DataFrame:
    """Rewrite the partitioned parquet at ``src`` into ``dst`` with few,
    bounded-size files per partition dir; returns the compacted frame.

    ``tasks_per_partition > 1`` requires ``salt_col`` (a stable id
    column) so the writer-task assignment is deterministic.
    """
    df = spark.read.parquet(src)
    if tasks_per_partition > 1:
        if salt_col is None:
            raise ValueError(
                "tasks_per_partition > 1 needs salt_col for a "
                "deterministic writer-task split"
            )
        salt = F.pmod(
            F.xxhash64(F.col(salt_col)), F.lit(tasks_per_partition)
        )
        df = df.withColumn("__salt", salt)
        out = df.repartition(F.col(partition_col), F.col("__salt")).drop(
            "__salt"
        )
    else:
        out = df.repartition(F.col(partition_col))
    (
        out.write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(partition_col)
        .parquet(dst)
    )
    return spark.read.parquet(dst)
