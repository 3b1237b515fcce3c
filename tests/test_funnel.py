"""funnel_stages (operators/funnel.py): the bounded fold and the
cascade-join formulation must be row-identical — the bounded= flag is a
physical-plan choice, never a semantic one (docs/TUNING.md)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from live_market_data_orderflow_analysis_big_data_project__spark.operators.funnel import (
    funnel_stages,
)

STAGES = ("view", "click", "purchase")


def _rows():
    t = datetime.datetime(2024, 1, 1, 12, 0, 0)
    s = lambda sec: t + datetime.timedelta(seconds=sec)
    return [
        (1, s(0), 1, "view"), (2, s(10), 1, "click"),
        (3, s(20), 1, "purchase"),
        # click before view; tie at view ts; purchase before click;
        # no view; repeat events after completion
        (4, s(0), 2, "click"), (5, s(10), 2, "view"),
        (6, s(0), 3, "view"), (7, s(0), 3, "click"),
        (8, s(0), 4, "view"), (9, s(5), 4, "purchase"),
        (10, s(10), 4, "click"),
        (11, s(0), 5, "click"), (12, s(5), 5, "purchase"),
        (13, s(0), 6, "view"), (14, s(1), 6, "click"),
        (15, s(2), 6, "purchase"), (16, s(3), 6, "view"),
        (17, s(4), 6, "click"), (18, s(5), 6, "purchase"),
        # non-stage noise events must be ignored by both paths
        (19, s(2), 1, "scroll"),
    ]


def _events(spark):
    return spark.createDataFrame(
        _rows(), "event_id long, ts timestamp, user_id long,"
        " event_type string"
    )


def test_fold_equals_cascade_joins(spark):
    e = _events(spark)
    key = lambda r: (r["user_id"], r["t1"], r["t2"], r["t3"])
    fold = sorted(map(key, funnel_stages(e, STAGES, bounded=True).collect()))
    casc = sorted(
        map(key, funnel_stages(e, STAGES, bounded=False).collect())
    )
    assert fold == casc
    assert len(fold) == 6


def test_fold_equals_cascade_on_fixture(spark):
    """Same equivalence over the real events fixture (every user, real
    timestamp collisions)."""
    e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    key = lambda r: (r["user_id"], r["t1"], r["t2"], r["t3"])
    fold = sorted(map(key, funnel_stages(e, STAGES, bounded=True).collect()))
    casc = sorted(
        map(key, funnel_stages(e, STAGES, bounded=False).collect())
    )
    assert fold == casc and len(fold) > 0


def test_cascade_semantics(spark):
    out = {
        r["user_id"]: r
        for r in funnel_stages(_events(spark), STAGES,
                               bounded=False).collect()
    }
    reached = lambda r: sum(r[f"t{i}"] is not None for i in (1, 2, 3))
    assert reached(out[1]) == 3
    assert reached(out[2]) == 1   # click strictly before view
    assert reached(out[3]) == 1   # tie fails strict >
    assert reached(out[4]) == 2   # purchase must follow the click
    assert reached(out[5]) == 0   # no view
    assert reached(out[6]) == 3   # first pass counts, repeats ignored
    assert out[6]["t3"] == datetime.datetime(2024, 1, 1, 12, 0, 2)


def test_max_gap_conversion_window(spark):
    """WITHIN-clause semantics: a stage event beyond max_gap_s of the
    previous stage's ts doesn't count (and later ones are further out,
    so the user stalls) — identically in both formulations."""
    t = datetime.datetime(2024, 1, 1)
    s = lambda sec: t + datetime.timedelta(seconds=sec)
    rows = [
        # u1 converts inside the window
        (1, s(0), 1, "view"), (2, s(30), 1, "click"),
        (3, s(50), 1, "purchase"),
        # u2's click is 2h after the view -> stalls at stage 1
        (4, s(0), 2, "view"), (5, s(7200), 2, "click"),
        # u3: first click beyond window, NO second click -> the
        # unconstrained run would count the late click; windowed must not
        (6, s(0), 3, "view"), (7, s(100), 3, "click"),
        (8, s(120), 3, "purchase"),
    ]
    e = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
        " event_type string"
    )
    for bounded in (True, False):
        out = {
            r["user_id"]: r
            for r in funnel_stages(
                e, STAGES, bounded=bounded, max_gap_s=60
            ).collect()
        }
        reached = lambda r: sum(r[f"t{i}"] is not None for i in (1, 2, 3))
        assert reached(out[1]) == 3, bounded
        assert reached(out[2]) == 1, bounded
        assert reached(out[3]) == 1, bounded  # click at +100s > 60s gap
    # and unconstrained still counts u3's click+purchase
    un = {
        r["user_id"]: r
        for r in funnel_stages(e, STAGES, bounded=True).collect()
    }
    assert sum(un[3][f"t{i}"] is not None for i in (1, 2, 3)) == 3


def test_n_stage_generalization(spark):
    """The fold builder must generalize beyond 3 stages."""
    t = datetime.datetime(2024, 1, 1)
    rows = [(i, t + datetime.timedelta(seconds=i), 1, s)
            for i, s in enumerate(["a", "b", "c", "d"])]
    e = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
        " event_type string"
    )
    four = ("a", "b", "c", "d")
    fold = funnel_stages(e, four, bounded=True).collect()[0]
    casc = funnel_stages(e, four, bounded=False).collect()[0]
    assert all(fold[f"t{i}"] is not None for i in range(1, 5))
    assert tuple(fold) == tuple(casc)


def test_q172_gap_binds_on_the_fixture(spark):
    """VERDICT r9 item 4: q172's discriminating term — the 48 h
    conversion window — must BIND on the driver fixture (users stall
    who convert unconstrained), otherwise the gate only re-proves the
    unconstrained fold.  Pinned as an assertion so a fixture
    regeneration cannot silently un-bind the constraint (measured at
    r9 staging: stage-sum 2866 constrained vs 4500 unconstrained at
    sf0.1; binds at every sf)."""
    from conftest import SF001

    from live_market_data_orderflow_analysis_big_data_project__spark.queries.ablock import (  # noqa: E501
        _Q172_GAP_S,
    )
    from live_market_data_orderflow_analysis_big_data_project__spark.sources.tables import (  # noqa: E501
        load_table,
    )

    e = load_table(spark, SF001, "events")
    stage_sum = lambda df: df.agg(
        F.sum(
            F.col("t1").isNotNull().cast("int")
            + F.col("t2").isNotNull().cast("int")
            + F.col("t3").isNotNull().cast("int")
        )
    ).collect()[0][0]
    unconstrained = stage_sum(funnel_stages(e, STAGES, bounded=True))
    constrained = stage_sum(
        funnel_stages(e, STAGES, bounded=True, max_gap_s=_Q172_GAP_S)
    )
    assert constrained < unconstrained, (constrained, unconstrained)
    assert constrained > 0
