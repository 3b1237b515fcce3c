"""operators/index.py — positional inverted index + phrase search.

The staged gate (q148) proves bigram-phrase parity with the DuckDB
adjacency oracle at two sfs; these pin the index structure itself and
the phrase semantics the gate's fixture can't isolate: 3-term
phrases, OVERLAPPING occurrences, absent phrases, and tokenizer
parity with the shared tokens_col.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from live_market_data_orderflow_analysis_big_data_project__spark.operators.index import (
    phrase_search,
    positional_index,
)


DOCS = [
    (1, "The quick brown fox; the quick brown dog."),
    (2, "quick brown quick brown quick"),
    (3, "a a a a"),
    (4, "nothing relevant here"),
]


@pytest.fixture(scope="module")
def idx(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return positional_index(df)


def test_index_structure(idx):
    rows = {(r.term, r.doc_id): r for r in idx.collect()}
    # punctuation split + lowercase; positions 1-based and sorted
    r = rows[("the", 1)]
    assert r.tf == 2 and r.positions == [1, 5]
    assert rows[("quick", 2)].positions == [1, 3, 5]
    # df counts documents, not occurrences
    assert rows[("quick", 1)].df == 2 and rows[("a", 3)].df == 1


def test_three_term_phrase(idx):
    got = {
        r.doc_id: (r.n_occurrences, r.first_pos)
        for r in phrase_search(idx, ["the", "quick", "brown"]).collect()
    }
    assert got == {1: (2, 1)}


def test_overlapping_occurrences_counted(idx):
    got = {
        r.doc_id: (r.n_occurrences, r.first_pos)
        for r in phrase_search(idx, ["a", "a"]).collect()
    }
    assert got == {3: (3, 1)}  # "a a a a" contains "a a" three times


def test_absent_phrase_is_empty(idx):
    assert phrase_search(idx, ["brown", "nothing"]).count() == 0


def test_single_term_falls_back_to_postings(idx):
    got = {
        r.doc_id: (r.n_occurrences, r.first_pos)
        for r in phrase_search(idx, ["quick"]).collect()
    }
    assert got == {1: (2, 2), 2: (3, 1)}


def test_empty_phrase_rejected(idx):
    with pytest.raises(ValueError):
        phrase_search(idx, [])


def test_no_python_in_plan(idx):
    plan = (
        phrase_search(idx, ["the", "quick"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_q173_not_term_binds_on_the_fixture(spark):
    """VERDICT r9 item 4: q173's discriminating term — the must_not
    exclusion — must BIND on the driver fixture (a large share of the
    part-AND-filter docs contain 'vector' and are excluded), otherwise
    the gate only re-proves the conjunction path.  Pinned as an
    assertion so a fixture regeneration cannot silently un-bind the
    exclusion (measured at r9 staging: 3098 -> 467 docs at sf0.1;
    binds at every sf)."""
    from conftest import SF001

    from live_market_data_orderflow_analysis_big_data_project__spark.operators.index import (  # noqa: E501
        boolean_search,
    )
    from live_market_data_orderflow_analysis_big_data_project__spark.sources.tables import (  # noqa: E501
        load_table,
    )

    docs = load_table(spark, SF001, "documents").select("doc_id", "text")
    fixture_idx = positional_index(docs)
    with_not = boolean_search(fixture_idx, ["part", "filter"], ["vector"])
    without = boolean_search(fixture_idx, ["part", "filter"])
    n_with, n_without = with_not.count(), without.count()
    assert n_with < n_without, (n_with, n_without)
    assert n_with > 0


# ---------------------------------------------------------------------------
# proximity_search — NEAR/k (staged gate q182)
# ---------------------------------------------------------------------------

def test_proximity_semantics_hand_corpus(spark):
    from live_market_data_orderflow_analysis_big_data_project__spark.operators.index import (  # noqa: E501
        positional_index,
        proximity_search,
    )

    docs = [
        (1, "alpha x x beta"),           # dist 3: in at k=3, out at k=2
        (2, "alpha x x x x x beta"),     # dist 6: out at k<=5
        (3, "beta alpha"),               # unordered: dist 1
        (4, "alpha alpha beta"),         # two pairs: dists 2 and 1
        (5, "alpha only here"),          # one term only
    ]
    idx = positional_index(
        spark.createDataFrame(docs, "doc_id long, text string")
    )
    got = {
        r.doc_id: (r.n_pairs, r.min_dist)
        for r in proximity_search(idx, "alpha", "beta", 3).collect()
    }
    assert got == {1: (1, 3), 3: (1, 1), 4: (2, 1)}
    at2 = {
        r.doc_id
        for r in proximity_search(idx, "alpha", "beta", 2).collect()
    }
    assert at2 == {3, 4}


def test_proximity_k_binds_on_the_fixture(spark):
    """The q172/q173 binding discipline: at the gate sf the k=5 bound
    must exclude a real share of the docs containing BOTH terms —
    otherwise q182 degenerates into the boolean AND it is supposed to
    refine."""
    from conftest import SF001

    from live_market_data_orderflow_analysis_big_data_project__spark.operators.index import (  # noqa: E501
        positional_index,
        proximity_search,
    )
    from live_market_data_orderflow_analysis_big_data_project__spark.queries.ablock import (  # noqa: E501
        _Q182_K,
    )
    from live_market_data_orderflow_analysis_big_data_project__spark.sources.tables import (  # noqa: E501
        load_table,
    )

    docs = load_table(spark, SF001, "documents").select("doc_id", "text")
    idx = positional_index(docs).localCheckpoint()
    both = (
        idx.where(F.col("term") == "part")
        .select("doc_id")
        .join(idx.where(F.col("term") == "filter").select("doc_id"), "doc_id")
        .count()
    )
    near = proximity_search(idx, "part", "filter", _Q182_K).count()
    assert 0 < near < both, (near, both)


def test_proximity_no_python_no_explode_of_positions(spark):
    from live_market_data_orderflow_analysis_big_data_project__spark.operators.index import (  # noqa: E501
        positional_index,
        proximity_search,
    )

    idx = positional_index(
        spark.createDataFrame([(1, "a b"), (2, "b a")],
                              "doc_id long, text string")
    )
    plan = (
        proximity_search(idx, "a", "b", 2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
