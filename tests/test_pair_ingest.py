"""Unit tests for sources.pair_ingest.split_pair_table.

Covers the reference Quora-loader semantics (reference
script/utilities.py:444-471): a labeled pair-per-row file splits into
two one-row-per-entity tables plus a deduplicated positive-match table.
The hand-built fixture exercises the cases the round-3 verdict flagged
as unverified: ids appearing in many pairs (dedup-to-entity with a
deterministic min-text representative), the label filter, and duplicate
(id_a, id_b) match rows collapsing to one.
"""

import pytest
from pyspark.sql import Row

from neural_entity_matching_spark.sources.pair_ingest import split_pair_table


@pytest.fixture(scope="module")
def pair_file(spark):
    rows = [
        # qid1=1 appears in three pairs with two distinct texts -> min() rep.
        Row(qid1=1, qid2=10, question1="beta text", question2="r-ten", is_duplicate=1),
        Row(qid1=1, qid2=11, question1="alpha text", question2="r-eleven", is_duplicate=0),
        Row(qid1=1, qid2=12, question1="beta text", question2="r-twelve", is_duplicate=1),
        # duplicate positive pair row -> must collapse to one match row
        Row(qid1=2, qid2=10, question1="gamma", question2="r-ten-alt", is_duplicate=1),
        Row(qid1=2, qid2=10, question1="gamma", question2="r-ten-alt", is_duplicate=1),
        # negative-only lhs id: present in entities, absent from matches
        Row(qid1=3, qid2=13, question1="delta", question2="r-thirteen", is_duplicate=0),
    ]
    return spark.createDataFrame(rows)


def test_entities_one_row_per_id_with_min_representative(pair_file):
    lhs, rhs, _ = split_pair_table(pair_file)
    lhs_rows = {r["id"]: r["text"] for r in lhs.collect()}
    rhs_rows = {r["id"]: r["text"] for r in rhs.collect()}
    # one row per distinct id on each side
    assert set(lhs_rows) == {1, 2, 3}
    assert set(rhs_rows) == {10, 11, 12, 13}
    # id 1 had texts {"beta text", "alpha text"} -> min() representative
    assert lhs_rows[1] == "alpha text"
    # id 10 appeared twice on the rhs with texts {"r-ten", "r-ten-alt"}
    assert rhs_rows[10] == "r-ten"


def test_matches_filtered_and_deduplicated(pair_file):
    _, _, matches = split_pair_table(pair_file)
    got = {(r["id_a"], r["id_b"]) for r in matches.collect()}
    # label filter drops is_duplicate == 0; dup (2,10) collapses to one
    assert got == {(1, 10), (1, 12), (2, 10)}
    assert matches.count() == 3


def test_custom_column_names(spark):
    rows = [
        Row(l=100, r=200, lt="foo", rt="bar", y=1),
        Row(l=100, r=201, lt="foo", rt="baz", y=0),
    ]
    df = spark.createDataFrame(rows)
    lhs, rhs, matches = split_pair_table(
        df, id_cols=("l", "r"), text_cols=("lt", "rt"), label_col="y"
    )
    assert lhs.columns == ["id", "text"]
    assert rhs.columns == ["id", "text"]
    assert matches.columns == ["id_a", "id_b"]
    assert [(r["id_a"], r["id_b"]) for r in matches.collect()] == [(100, 200)]
    assert lhs.count() == 1 and rhs.count() == 2
