"""Streaming CUSUM monitor stages (operators/monitor.py) and the
rolling-actives streaming split: hand-model equality, the
NULL-baseline path, batch/stream parity with progressive delivery,
and gate-fixture bindings."""

from __future__ import annotations

import datetime as dt
import tempfile

from pyspark.sql import functions as F

from live_market_data_orderflow_analysis_big_data_project__spark.operators.monitor import (  # noqa: E501
    cusum_daily_series,
    keyed_sum_windowed,
)

from conftest import SF0001, SF001


def _t(day: int, hour: int) -> dt.datetime:
    return dt.datetime(2024, 1, day, hour, 0, 0)


def test_keyed_sum_windowed_batch_equals_groupby(spark):
    rows = [
        ("a", _t(1, 9), 5),
        ("a", _t(1, 15), 7),
        ("a", _t(2, 10), -3),
        ("b", _t(1, 11), 2),
        ("b", _t(3, 12), None),  # NULL amount: excluded
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v long")
    got = {
        (r.k, r.day): r.total
        for r in keyed_sum_windowed(df, ["k"], "ts", F.col("v")).collect()
    }
    assert got == {("a", "2024-01-01"): 12, ("a", "2024-01-02"): -3,
                   ("b", "2024-01-01"): 2}


def test_keyed_sum_windowed_stream_emits_closed_days_once(spark):
    """Progressive delivery: the emitted closed-day totals are
    batch-count INVARIANT and equal to the batch day-sums restricted
    to days strictly before the final (never-closed) day."""
    from live_market_data_orderflow_analysis_big_data_project__spark.streaming.core import (  # noqa: E501
        run_to_memory,
        stream_events_dir,
    )

    schema = "k string, ts timestamp, v long"
    b1 = [("a", _t(1, 9), 5), ("a", _t(1, 15), 7)]
    b2 = [("a", _t(2, 10), 3), ("b", _t(2, 11), 4)]
    b3 = [("a", _t(3, 12), 9)]  # final day: stays open, never emits
    tmp = tempfile.mkdtemp(prefix="s24_batches_")
    for part in (b1, b2, b3):
        spark.createDataFrame(part, schema).coalesce(1).write.mode(
            "append"
        ).parquet(tmp)

    want = {("a", "2024-01-01", 12), ("a", "2024-01-02", 3),
            ("b", "2024-01-02", 4)}
    for max_files in (None, 1):
        sdf = stream_events_dir(
            spark, tmp, schema, max_files_per_trigger=max_files
        )
        out = run_to_memory(
            keyed_sum_windowed(sdf, ["k"], "ts", F.col("v")),
            f"t_s24_{max_files}",
        )
        got = {(r.k, r.day, r.total) for r in out.collect()}
        assert got == want, max_files


def _lindley(series, med, mad, h):
    out = []
    prefix, floor = 0, 0
    for day, x in series:
        dev = x - med - mad
        prefix += dev
        floor = min(floor, prefix)
        s = prefix - min(floor, 0)
        out.append((day, x, dev, s, s > h * mad))
    return out


def test_cusum_series_matches_hand_lindley_loop(spark):
    """cusum_daily_series == the literal per-day clamp loop, alarms
    included; a group with NO reference days surfaces with NULL
    baseline and NULL statistic (the q167 new-segment rule)."""
    rows = [
        # group 'a': ref days 1-5 (totals 10,12,10,14,10), monitored 6-9
        *[("a", f"2024-01-0{d}", x) for d, x in
          [(1, 10), (2, 12), (3, 10), (4, 14), (5, 10)]],
        *[("a", f"2024-01-0{d}", x) for d, x in
          [(6, 30), (7, 5), (8, 40), (9, 41)]],
        # group 'b': appears only after the split — no baseline
        ("b", "2024-01-07", 100),
        ("b", "2024-01-08", 200),
    ]
    df = spark.createDataFrame(rows, "g string, day string, total long")
    out = cusum_daily_series(df, ["g"], "day", "total", "2024-01-06",
                             h_mult=3)
    got = {
        (r.g, r.day): (r.day_total, r.med_ref, r.mad_ref, r.dev,
                       r.cusum, r.is_alarm)
        for r in out.collect()
    }
    # hand baseline for 'a': sorted totals 10,10,10,12,14 -> lower
    # median 10; deviations 0,2,0,4,0 -> sorted 0,0,0,2,4 -> MAD 0...
    # MAD 0 makes every positive dev alarm; the fixture-shaped case
    # (MAD > 0) is covered by the gate binding test below.
    med, mad = 10, 0
    want_a = _lindley(
        [("2024-01-06", 30), ("2024-01-07", 5),
         ("2024-01-08", 40), ("2024-01-09", 41)], med, mad, 3
    )
    for day, x, dev, s, alarm in want_a:
        assert got[("a", day)] == (x, med, mad, dev, s, alarm), day
    for day, x in [("2024-01-07", 100), ("2024-01-08", 200)]:
        assert got[("b", day)] == (x, None, None, None, None, None), day


def test_cusum_gate_alarm_binds_both_directions(spark):
    from live_market_data_orderflow_analysis_big_data_project__spark.queries.sblock import (  # noqa: E501
        s24_cusum_stream,
    )

    for sf in (SF0001, SF001):
        rows = s24_cusum_stream(spark, sf).collect()
        alarms = [r.is_alarm for r in rows if r.is_alarm is not None]
        assert alarms, sf
        assert any(alarms) and not all(alarms), (sf, sum(alarms))
        # the splice held back the never-closed final day: the
        # monitored series must end strictly before the corpus max day
        assert all(r.mad_ref is not None for r in rows), sf


def test_rolling_active_stream_matches_batch_on_closed_days(spark):
    """s25's invariant at both gate sfs: the streamed DAU/WAU equals
    the batch rolling_active_users computed over events restricted to
    closed days (the splice is the ONLY difference)."""
    from live_market_data_orderflow_analysis_big_data_project__spark.operators.rolling import (  # noqa: E501
        rolling_active_users,
    )
    from live_market_data_orderflow_analysis_big_data_project__spark.queries.sblock import (  # noqa: E501
        s25_rolling_active_stream,
    )
    from live_market_data_orderflow_analysis_big_data_project__spark.sources.tables import (  # noqa: E501
        load_table,
    )

    for sf in (SF0001, SF001):
        got = {
            (r.day, r.dau, r.wau)
            for r in s25_rolling_active_stream(spark, sf).collect()
        }
        ev = load_table(spark, sf, "events").where(
            F.col("user_id").isNotNull()
        )
        last = ev.agg(F.max(F.to_date("ts"))).collect()[0][0]
        closed = ev.where(F.to_date("ts") < F.lit(last))
        want = {
            (r.day, r.dau, r.wau)
            for r in rolling_active_users(
                closed, "user_id", "ts", 7
            ).collect()
        }
        assert got == want, sf
        assert any(d < w for _, d, w in got), sf  # windows accumulate


def test_keyed_sum_windowed_drops_late_rows(spark):
    """The s04 late-data semantic on the NEW sum stage — pinned to
    Spark's ACTUAL contract (measured): the watermark is a lower
    bound, so a row arriving in the batch where its window is still
    in state MERGES (eviction runs at batch end, after input), and a
    row arriving after the window's state was EVICTED in an earlier
    batch is dropped.  Sequential delivery therefore excludes the
    two-batches-late row; single-batch delivery (the gate's
    single-file replay) includes everything."""
    import glob
    import os
    import time

    from live_market_data_orderflow_analysis_big_data_project__spark.streaming.core import (  # noqa: E501
        run_to_memory,
        stream_events_dir,
    )

    schema = "k string, ts timestamp, v long"
    b1 = [("a", _t(1, 9), 5), ("a", _t(2, 10), 3)]
    b2 = [("a", _t(3, 12), 9)]   # advances wm; day-1 state EVICTED here
    b3 = [("a", _t(1, 20), 100),  # two batches late: state gone -> drop
          ("a", _t(4, 8), 2)]
    tmp = tempfile.mkdtemp(prefix="s24_late_")
    # FileStreamSource orders and admits by file TIMESTAMP: files
    # carrying the same second land in ONE batch even under
    # maxFilesPerTrigger=1 (measured) — distinct mtimes are what make
    # the sequential case genuinely sequential.  Stamp each append's
    # part files with an explicit strictly-increasing whole-second
    # mtime instead of sleeping past the clock tick: exact on slow or
    # coarse-mtime filesystems (the r14 ADVICE flake) and faster.
    base = int(time.time()) - 60
    stamped: set[str] = set()
    for i, part in enumerate((b1, b2, b3)):
        spark.createDataFrame(part, schema).coalesce(1).write.mode(
            "append"
        ).parquet(tmp)
        t_i = base + i * 2
        for f in glob.glob(os.path.join(tmp, "*.parquet")):
            if f not in stamped:
                os.utime(f, (t_i, t_i))
                stamped.add(f)

    def drained(max_files):
        sdf = stream_events_dir(
            spark, tmp, schema, max_files_per_trigger=max_files
        )
        out = run_to_memory(
            keyed_sum_windowed(sdf, ["k"], "ts", F.col("v")),
            f"t_s24_late_{max_files}",
        )
        return {(r.k, r.day): r.total for r in out.collect()}

    # one batch: everything is in state together
    assert drained(None) == {("a", "2024-01-01"): 105,
                             ("a", "2024-01-02"): 3,
                             ("a", "2024-01-03"): 9}
    # sequential: day 1 evicted in batch 2, the batch-3 late row drops
    assert drained(1) == {("a", "2024-01-01"): 5,
                          ("a", "2024-01-02"): 3,
                          ("a", "2024-01-03"): 9}
