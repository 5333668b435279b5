"""Minimal-interval semantics (Intervals family) on hand-built position
streams — the cases where naive all-pairs and minimal-interval answers
differ."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def tok(spark):
    # doc 1: a . a b      -> ordered minimal = [(2,3)] (outer (0,3) dies)
    # doc 2: a b a b      -> ordered minimal = [(0,1),(2,3)]
    # doc 3: b a          -> ordered none; unordered minimal = [(0,1)]
    # doc 4: a x x x b    -> ordered [(0,4)], gaps 3
    rows = [
        (1, "a", 0), (1, "a", 2), (1, "b", 3),
        (2, "a", 0), (2, "b", 1), (2, "a", 2), (2, "b", 3),
        (3, "b", 0), (3, "a", 1),
        (4, "a", 0), (4, "x", 1), (4, "x", 2), (4, "x", 3), (4, "b", 4),
    ]
    return spark.createDataFrame(rows, "doc_id long, term string, pos int")


def _set(df):
    return {(r["doc_id"], r["lo"], r["hi"]) for r in df.collect()}


def test_minimal_ordered(tok):
    from lucene_solr_spark.operators.intervals import minimal_ordered

    got = _set(minimal_ordered(tok, "a", "b"))
    assert got == {(1, 2, 3), (2, 0, 1), (2, 2, 3), (4, 0, 4)}


def test_minimal_ordered_maxgaps(tok):
    from lucene_solr_spark.operators.intervals import minimal_ordered

    got = _set(minimal_ordered(tok, "a", "b", max_gaps=2))
    assert got == {(1, 2, 3), (2, 0, 1), (2, 2, 3)}  # doc4 gaps=3 dropped


def test_minimal_unordered(tok):
    from lucene_solr_spark.operators.intervals import minimal_unordered

    got = _set(minimal_unordered(tok, "a", "b"))
    # doc1: (2,3) minimal, (0,3) contains it -> dies
    # doc2: (0,1),(1,2),(2,3) minimal; (0,3) dies
    # doc3: (0,1); doc4: (0,4)
    assert got == {
        (1, 2, 3),
        (2, 0, 1), (2, 1, 2), (2, 2, 3),
        (3, 0, 1),
        (4, 0, 4),
    }


def test_containing_and_not(tok):
    from lucene_solr_spark.operators.intervals import (
        containing,
        minimal_ordered,
        not_containing,
    )

    iv = minimal_ordered(tok, "a", "b")
    with_x = _set(containing(iv, tok, "x"))
    assert with_x == {(4, 0, 4)}
    without_x = _set(not_containing(iv, tok, "x"))
    assert without_x == {(1, 2, 3), (2, 0, 1), (2, 2, 3)}


@pytest.fixture(scope="module")
def tok3(spark):
    # one doc: a@0, b@3, c@5, a@10, b@12, c@13
    rows = [
        (1, "a", 0), (1, "b", 3), (1, "c", 5),
        (1, "a", 10), (1, "b", 12), (1, "c", 13),
    ]
    return spark.createDataFrame(rows, "doc_id long, term string, pos int")


def test_minimal_ordered_n3(tok3):
    from lucene_solr_spark.operators.intervals import minimal_ordered_n

    got = _set(minimal_ordered_n(tok3, ["a", "b", "c"]))
    # chain from a@0 -> b@3 -> c@5 = [0,5]; from a@10 -> [10,13]
    assert got == {(1, 0, 5), (1, 10, 13)}


def test_minimal_unordered_n3(tok3):
    from lucene_solr_spark.operators.intervals import minimal_unordered_n

    got = _set(minimal_unordered_n(tok3, ["a", "b", "c"]))
    # sweep candidates: [0,5] [3,10] [5,12] [10,13] — lo strictly
    # increasing, none contains another -> all minimal
    assert got == {(1, 0, 5), (1, 3, 10), (1, 5, 12), (1, 10, 13)}


def test_minimal_unordered_n3_maxgaps(tok3):
    from lucene_solr_spark.operators.intervals import minimal_unordered_n

    got = _set(minimal_unordered_n(tok3, ["a", "b", "c"], max_gaps=3))
    # widths: 6,8,8,4 -> gaps = width-3 = 3,5,5,1 -> keep gaps<=3
    assert got == {(1, 0, 5), (1, 10, 13)}


def test_ordered_n2_matches_binary(tok):
    from lucene_solr_spark.operators.intervals import (
        minimal_ordered,
        minimal_ordered_n,
    )

    assert _set(minimal_ordered_n(tok, ["a", "b"])) == _set(
        minimal_ordered(tok, "a", "b")
    )
