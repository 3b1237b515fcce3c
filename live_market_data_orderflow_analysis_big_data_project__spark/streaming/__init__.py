from .core import (
    dedup_within_watermark,
    parquet_sink,
    run_to_memory,
    running_vwap,
    serialize_json,
    session_counts,
    sliding_counts,
    stream_events,
    stream_events_dir,
)

__all__ = [
    "stream_events",
    "stream_events_dir",
    "run_to_memory",
    "parquet_sink",
    "serialize_json",
    "sliding_counts",
    "session_counts",
    "dedup_within_watermark",
    "running_vwap",
]
