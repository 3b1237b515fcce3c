"""SparkSession factory + runtime conf normalization.

The reference hand-tunes for an 8 GB host (reference README.md:501-504:
``spark.default.parallelism=2``, ``spark.sql.shuffle.partitions=4``).  We
instead enable AQE and let runtime statistics coalesce/skew-split partitions,
which is the posture that survives a 1000-executor / 100 TB scale-up.

``ensure_engine_confs`` exists because the correctness driver hands us *its*
SparkSession: every conf the engine depends on must be runtime-settable and
is (re)applied there before any table is read.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs the engine depends on.  Notes:
# - session.timeZone=UTC: fixture timestamps are naive UTC; DuckDB oracle
#   agrees only under UTC (SURVEY.md section 7.3 "Timestamp semantics").
# - nanosAsLong: older fixture builds carried TIMESTAMP(NANOS) which Spark's
#   vectorized reader rejects; we read the raw int64 and convert to
#   microseconds ourselves (sources/tables.py), matching DuckDB's ns->us
#   truncation.  Harmless when the fixture is already microseconds.
# - inferTimestampNTZ off: current fixtures store naive TIMESTAMP(MICROS)
#   (isAdjustedToUTC=false), which Spark 4 would otherwise surface as
#   TIMESTAMP_NTZ — a type withWatermark rejects and DuckDB doesn't model.
#   Reading it as session-tz TIMESTAMP under the enforced UTC zone preserves
#   the wall-clock values exactly (sources/tables.py also casts any stray
#   NTZ column defensively).
# - AQE on: runtime partition coalescing + skew-join splitting instead of
#   hand-tuned shuffle partition counts.
ENGINE_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


# Confs whose absence silently corrupts results (wrong timestamps / failed
# nanos reads) rather than just slowing things down: these must fail loudly.
_CORRECTNESS_CRITICAL = (
    "spark.sql.session.timeZone",
    "spark.sql.legacy.parquet.nanosAsLong",
    "spark.sql.parquet.inferTimestampNTZ.enabled",
)


def ensure_engine_confs(spark: SparkSession) -> SparkSession:
    """Apply the engine's runtime confs to an externally created session.

    Correctness-critical confs are verified by reading them back; a mismatch
    raises instead of letting every events-table query return
    wrong-but-plausible results (round-1 advisory, session.py hygiene).
    """
    import warnings

    for k, v in ENGINE_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception as exc:
            if k in _CORRECTNESS_CRITICAL:
                raise RuntimeError(
                    f"engine conf {k}={v} could not be set ({exc}); "
                    "results would be silently wrong — refusing to continue"
                ) from exc
            warnings.warn(f"engine conf {k}={v} not applied: {exc}", stacklevel=2)
    for k in _CORRECTNESS_CRITICAL:
        got = spark.conf.get(k, None)
        want = ENGINE_CONFS[k]
        if got is None or got.lower() != want.lower():
            raise RuntimeError(
                f"engine conf {k} reads back as {got!r}, expected {want!r}"
            )
    return spark


def get_spark(
    app_name: str = "orderflow-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    rocksdb_state: bool = False,
) -> SparkSession:
    """Create (or get) a SparkSession with the engine defaults.

    local[$SPARK_GRAFT_CPUS] by default; on a real cluster pass the master
    URL (the reference submits to spark://spark-master:7077,
    docker-compose.yml:156-161).

    ``rocksdb_state=True`` switches streaming state to the RocksDB
    provider — required posture for 100 TB-scale key spaces where
    HDFS-backed in-memory state maps would blow executor heaps (verified
    working in this build).
    """
    if rocksdb_state:
        extra_conf = dict(extra_conf or {})
        extra_conf.setdefault(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = os.environ.get("SPARK_MASTER_URL", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = SparkSession.builder.master(master).appName(app_name)
    for k, v in ENGINE_CONFS.items():
        builder = builder.config(k, v)
    builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    # Driver heap (r16, guide §5 "memory layout"): in local[N] mode the
    # driver JVM *is* the executor — all N task threads share its heap,
    # and Spark's default is a bare -Xmx1g.  At N=32 that is ~13 MB of
    # execution memory per concurrent task: every hash aggregate/join
    # build spills, and GC time compounds across a long suite (measured
    # r16: the same queries run 2-5x slower late-suite under the 1g
    # heap; full bench 314 s -> 186 s with the heap sized to the task
    # count).  Size the heap to the local core count (384 MB/task-slot,
    # floor 2g) capped at 1/4 of host RAM; SPARK_GRAFT_DRIVER_MEM_MB
    # overrides.  On a real cluster (SPARK_MASTER_URL) executor memory
    # is the deployment's knob and the driver does no data work, so the
    # same default is simply a sane driver size there.  Only effective
    # at JVM launch — a pre-existing session keeps its heap.
    mem_mb = os.environ.get("SPARK_GRAFT_DRIVER_MEM_MB")
    if mem_mb is None:
        local_cores = 0
        if master.startswith("local["):
            n = master[len("local["):-1]
            local_cores = os.cpu_count() or 8 if n == "*" else int(n)
        want = max(2048, 384 * local_cores)
        try:
            with open("/proc/meminfo") as f:
                host_kb = int(f.readline().split()[1])
            want = min(want, host_kb // 1024 // 4)
        except (OSError, ValueError, IndexError):
            pass
        mem_mb = str(want)
    builder = builder.config("spark.driver.memory", f"{mem_mb}m")
    # JIT code cache (r16): a long-lived session running hundreds of
    # distinct queries generates thousands of Janino/whole-stage-codegen
    # classes; the JVM default ReservedCodeCacheSize (240 MB) fills
    # mid-suite, after which the JIT flushes/stops compiling and hot
    # codegen loops run cold — the measured late-suite 2-5x per-query
    # degradation.  512 MB keeps the whole suite's generated code
    # resident.  Appended (not overwritten) if the caller passed its own
    # extraJavaOptions via extra_conf.
    _jvm_opts = "-XX:ReservedCodeCacheSize=512m"
    # Scratch space (r16, guide §2.1/§6): spark.local.dir (shuffle
    # files, spills) and java.io.tmpdir (streaming temp checkpoints —
    # offset/commit logs and HDFS-backed state stores fsync per
    # micro-batch) default to /tmp, which on this host is a shared
    # spinning block device; the streaming suite measured 2.5-3.7x
    # faster with scratch on the local tmpfs (s02 7.4 s -> 2.9 s,
    # s19 19.1 s -> 5.1 s under disk contention).  On a real cluster
    # spark.local.dir is the deployment's NVMe scratch — same posture,
    # this just picks the fastest local medium here.  Override with
    # SPARK_GRAFT_SCRATCH; empty string disables.
    scratch = os.environ.get("SPARK_GRAFT_SCRATCH")
    if scratch is None and os.path.isdir("/dev/shm") and os.access(
        "/dev/shm", os.W_OK
    ):
        scratch = "/dev/shm/spark_graft_local"
    if scratch:
        os.makedirs(scratch, exist_ok=True)
        builder = builder.config("spark.local.dir", scratch)
        _jvm_opts += f" -Djava.io.tmpdir={scratch}"
    _ejo_key = "spark.driver.extraJavaOptions"
    if extra_conf and _ejo_key in extra_conf:
        extra_conf = dict(extra_conf)
        extra_conf[_ejo_key] = f"{extra_conf[_ejo_key]} {_jvm_opts}"
    else:
        builder = builder.config(_ejo_key, _jvm_opts)
    builder = builder.config("spark.ui.enabled", "false")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    return ensure_engine_confs(spark)
