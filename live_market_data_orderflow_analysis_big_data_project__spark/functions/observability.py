"""Zero-extra-pass pipeline metrics via ``DataFrame.observe``.

A 100 TB job cannot afford a second scan just to know how much it
processed or dropped: ``observe`` attaches aggregate metrics to the
existing plan, computed on the rows that actually flow through it —
batch results arrive via ``Observation`` (or a listener), streaming
results ride each micro-batch's ``QueryProgress.observedMetrics``.

The reference has no metrics story at all (its only visibility is six
console-sink debug taps, data_processor.py:74-79); this is the
engine-native replacement: quality counters on the real pipeline with
zero extra passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observe_quality(
    df: DataFrame,
    name: str = "quality",
    numeric_col: str | None = None,
    required_cols: tuple[str, ...] = (),
):
    """Attach row-count / null-count / numeric-range metrics to ``df``.

    Returns ``(observed_df, observation)`` for batch frames, or
    ``(observed_df, None)`` for streaming frames (named observation;
    read it from each ``QueryProgress.observedMetrics[name]``).

    Metrics: ``n_rows``, ``n_null_<col>`` per required column, and
    ``min/max_<numeric_col>`` when given — the standard completeness +
    range data-quality gate, computed inline.
    """
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in required_cols:
        metrics.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"n_null_{c}")
        )
    if numeric_col is not None:
        metrics.append(F.min(numeric_col).alias(f"min_{numeric_col}"))
        metrics.append(F.max(numeric_col).alias(f"max_{numeric_col}"))
    if df.isStreaming:
        # Streaming requires the name-based variant; metrics surface in
        # every micro-batch's progress event.
        return df.observe(name, *metrics), None
    obs = Observation(name)
    return df.observe(obs, *metrics), obs
