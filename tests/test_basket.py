"""cooccurrence_lift semantics on hand fixtures (operators/basket.py)."""

from __future__ import annotations

from live_market_data_orderflow_analysis_big_data_project__spark.operators.basket import (  # noqa: E501
    cooccurrence_lift,
)


def _run(spark, rows):
    df = spark.createDataFrame(rows, "b long, item string")
    out = cooccurrence_lift(df, ["b"], "item")
    return {(r["item_a"], r["item_b"]): r for r in out.collect()}


def test_counts_support_confidence_lift(spark):
    # baskets: 1={x,y}, 2={x,y}, 3={x}, 4={y,z}
    rows = [(1, "x"), (1, "y"), (2, "x"), (2, "y"), (3, "x"),
            (4, "y"), (4, "z")]
    got = _run(spark, rows)
    xy = got[("x", "y")]
    assert xy["n_pair"] == 2 and xy["n_a"] == 3 and xy["n_b"] == 3
    assert xy["n_baskets"] == 4
    assert xy["support"] == 0.5
    assert xy["conf_a_to_b"] == 2 / 3
    assert xy["lift"] == (2.0 * 4.0) / (3.0 * 3.0)
    yz = got[("y", "z")]
    assert yz["n_pair"] == 1 and yz["conf_b_to_a"] == 1.0
    assert ("x", "z") not in got  # never co-occur -> no row


def test_duplicate_events_count_once_per_basket(spark):
    rows = [(1, "x"), (1, "x"), (1, "y"), (1, "y"), (2, "x")]
    got = _run(spark, rows)
    assert got[("x", "y")]["n_pair"] == 1
    assert got[("x", "y")]["n_a"] == 2  # x in baskets 1 and 2


def test_pair_emitted_once_unordered(spark):
    rows = [(1, "x"), (1, "y"), (1, "z")]
    got = _run(spark, rows)
    assert set(got) == {("x", "y"), ("x", "z"), ("y", "z")}


def test_independent_items_lift_is_one(spark):
    # x and y in every basket: P(xy)=1, lift = 1 exactly.
    rows = [(b, i) for b in (1, 2, 3) for i in ("x", "y")]
    assert _run(spark, rows)[("x", "y")]["lift"] == 1.0


def test_multi_column_basket_key(spark):
    df = spark.createDataFrame(
        [(1, "a", "x"), (1, "a", "y"), (1, "b", "x"), (2, "a", "y")],
        "u long, d string, item string",
    )
    out = cooccurrence_lift(df, ["u", "d"], "item").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["item_a"], r["item_b"], r["n_pair"], r["n_baskets"]) == (
        "x", "y", 1, 3,
    )
