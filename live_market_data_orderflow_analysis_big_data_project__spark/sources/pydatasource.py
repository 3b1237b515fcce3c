"""Custom Python data source (Spark 4 ``pyspark.sql.datasource`` API).

The reference ingests from a single hard-wired source family (Upstox
WebSocket -> Kafka -> Spark, data_streamer.py:83-120 ->
data_processor.py:65-69).  This module shows the engine-native way to
add a NEW source format to Spark itself: a ``DataSource`` subclass that
the planner treats like any built-in format — schema known up front,
reads split into ``InputPartition`` units that execute in parallel on
executors, no driver-side materialization.

``TickSynthDataSource`` generates a deterministic synthetic tick tape
(closed-form per tick id, no RNG state), so it doubles as a correctness
fixture: the exact same stream is expressible as a SQL ``range()``
query, giving the custom-source path a hash-exact DuckDB oracle
(queries/eblock.py::q130_python_datasource).

100 TB posture: generation is pure per-partition compute — N partitions
scale out with no shuffle, no skew (uniform slices), and the same
pattern (partition list built on the driver, rows yielded on executors)
is how a real connector would split a remote store's shards.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

# Closed-form tick model: every field is a pure function of tick_id, so
# any engine can reproduce the stream exactly (see Q130_SQL).
PRICE_MULT = 2654435761  # Knuth multiplicative constant
N_INSTRUMENTS = 97
BASE_TS = datetime(2024, 1, 1, 0, 0, 0)

TICK_SCHEMA = (
    "tick_id bigint, ts timestamp, instrument string, "
    "price double, qty bigint"
)


class _Slice(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class TickSynthReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 10_000))
        self.num_partitions = int(options.get("numpartitions", 8))

    def partitions(self):
        per = max(1, -(-self.n // self.num_partitions))  # ceil-div
        return [
            _Slice(lo, min(lo + per, self.n))
            for lo in range(0, self.n, per)
        ]

    def read(self, partition: _Slice):
        for i in range(partition.start, partition.end):
            yield (
                i,
                BASE_TS + timedelta(seconds=i),
                f"INS{i % N_INSTRUMENTS}",
                100.0 + ((i * PRICE_MULT) % 1000) / 100.0,
                i % 50 + 1,
            )


class TickSynthStreamReader(DataSourceStreamReader):
    """Micro-batch stream over the same closed-form tape.

    Offsets are plain tick counts; each micro-batch covers
    ``rowsPerBatch`` ticks, split into ``numPartitions`` executor-side
    slices — the offset/partition protocol a real connector (e.g. a
    queue consumer) implements, minus the network.  ``maxTicks`` bounds
    ``latestOffset`` so Trigger.AvailableNow drains to a finite,
    deterministic tape (which is what makes the streaming entry
    hash-checkable against a SQL ``range()`` oracle).
    """

    def __init__(self, options):
        self.rows_per_batch = int(options.get("rowsperbatch", 1000))
        self.max_ticks = int(options.get("maxticks", 10_000))
        self.num_partitions = int(options.get("numpartitions", 4))
        self._available = 0  # ticks "arrived" so far (advances per poll)
        # Restart-safety high-water mark = highest offset known to be IN
        # THE SINK.  Restarts need it because the engine compares
        # offsets by INEQUALITY (any latest != committed plans a batch):
        # a reader whose pacing state lags the offset WAL plans a
        # BACKWARDS batch, rewinds the WAL, and the following forward
        # batches would re-emit already-sunk rows.  Emission clamps to
        # _hwm and availability fast-forwards over it.
        #
        # What may advance it (learned from tracing the engine across
        # stop/restart — tests/test_pydatasource.py pins all of this):
        #  - commit(end): called only after the sink committed the batch;
        #  - a real batch's START offset: the engine constructs batch
        #    N+1 only after sinking batch N, and the restart replay's
        #    start equals the sink-committed offset;
        #  - NEVER a planned END (planning is not sinking — the reader
        #    instance survives in-session restarts, and advancing on
        #    ends made the replay of a sink-uncommitted batch emit
        #    nothing: 500 rows lost);
        #  - NEVER the start==end recovery probe the engine issues right
        #    after a restart: its offsets come from the WAL, which can
        #    run AHEAD of the sink.
        self._hwm = 0

    def initialOffset(self) -> dict:
        return {"tick": 0}

    def latestOffset(self) -> dict:
        # Each poll reveals one more micro-batch of the tape, up to the
        # cap — offsets-as-availability, the queue-consumer protocol.
        self._available = min(
            max(self._available, self._hwm) + self.rows_per_batch,
            self.max_ticks,
        )
        return {"tick": self._available}

    def partitions(self, start: dict, end: dict):
        # MUST cover [start, end) exactly, minus what is provably in the
        # sink already: the engine records `end` in the offset WAL, so
        # under-emitting loses data and re-emitting duplicates it.
        lo, hi = start["tick"], end["tick"]
        if lo == hi:
            # Restart recovery probe (offsets from the WAL, possibly
            # ahead of the sink): no rows, no state updates.
            return [_Slice(lo, lo)]
        emit_lo = max(lo, self._hwm)
        self._available = max(self._available, lo, hi)
        self._hwm = max(self._hwm, lo)
        if hi <= emit_lo:
            # Backwards batch (lagging latestOffset after restart): the
            # WAL rewinds but nothing re-emits; `lo` here equals the
            # sink-committed offset, so the clamp holds for the forward
            # batches that follow.
            return [_Slice(emit_lo, emit_lo)]
        per = max(1, -(-(hi - emit_lo) // self.num_partitions))
        return [
            _Slice(a, min(a + per, hi)) for a in range(emit_lo, hi, per)
        ]

    def read(self, partition: _Slice):
        yield from TickSynthReader.read(self, partition)

    def commit(self, end: dict) -> None:
        # Nothing external to acknowledge for a synthetic tape, but the
        # committed offset feeds the restart high-water mark.
        self._hwm = max(self._hwm, end["tick"])


class TickSynthDataSource(DataSource):
    """``spark.read.format("tick_synth").option("n", 5000).load()`` or
    ``spark.readStream.format("tick_synth").option("maxTicks", ...)``."""

    @classmethod
    def name(cls) -> str:
        return "tick_synth"

    def schema(self) -> str:
        return TICK_SCHEMA

    def reader(self, schema) -> TickSynthReader:
        return TickSynthReader(self.options)

    def streamReader(self, schema) -> TickSynthStreamReader:
        return TickSynthStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the engine's Python data sources."""
    spark.dataSource.register(TickSynthDataSource)
