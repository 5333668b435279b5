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


@pytest.fixture(scope="module")
def tok_nested(spark):
    # doc 10: a b c a x b c   — nesting playground
    # doc 11: c b a            — b,c before a: ordered(a, unordered(b,c)) none
    # doc 12: a x b x c x d
    rows = [
        (10, "a", 0), (10, "b", 1), (10, "c", 2), (10, "a", 3),
        (10, "x", 4), (10, "b", 5), (10, "c", 6),
        (11, "c", 0), (11, "b", 1), (11, "a", 2),
        (12, "a", 0), (12, "x", 1), (12, "b", 2), (12, "x", 3),
        (12, "c", 4), (12, "x", 5), (12, "d", 6),
    ]
    return spark.createDataFrame(rows, "doc_id long, term string, pos int")


def _assert_minimal(pairs):
    """Minimality property: no interval of the set contains another."""
    by_doc = {}
    for d, lo, hi in pairs:
        by_doc.setdefault(d, []).append((lo, hi))
    for d, ivs in by_doc.items():
        for lo, hi in ivs:
            for lo2, hi2 in ivs:
                if (lo2, hi2) != (lo, hi):
                    assert not (lo2 >= lo and hi2 <= hi), (d, (lo, hi), (lo2, hi2))


def test_set_algebra_matches_term_level(tok):
    """ordered/unordered over term SETS reproduce the two-term operators."""
    from lucene_solr_spark.operators.intervals import (
        minimal_ordered,
        minimal_unordered,
        ordered_sets,
        term_intervals,
        unordered_sets,
    )

    a, b = term_intervals(tok, "a"), term_intervals(tok, "b")
    assert _set(ordered_sets(a, b)) == _set(minimal_ordered(tok, "a", "b"))
    assert _set(unordered_sets(a, b)) == _set(minimal_unordered(tok, "a", "b"))
    assert _set(ordered_sets(a, b, max_gaps=2)) == _set(
        minimal_ordered(tok, "a", "b", max_gaps=2)
    )


def test_nested_ordered_over_unordered(tok_nested):
    """ordered(a, unordered(b, c)) — a genuinely nested expression."""
    from lucene_solr_spark.operators.intervals import (
        ordered_sets,
        term_intervals,
        unordered_sets,
    )

    t = tok_nested
    u = unordered_sets(term_intervals(t, "b"), term_intervals(t, "c"))
    # doc 10: unordered minimal {(1,2),(2,5),(5,6)} — (2,5) = [c@2, b@5]
    # contains neither neighbour; doc 11 {(0,1)}; doc 12 {(2,4)}
    assert _set(u) == {
        (10, 1, 2), (10, 2, 5), (10, 5, 6), (11, 0, 1), (12, 2, 4),
    }
    got = _set(ordered_sets(term_intervals(t, "a"), u))
    # doc 10: a@0 -> (1,2) => (0,2); a@3 -> (5,6) => (3,6); both minimal
    # doc 11: no u after a@2; doc 12: a@0 -> (2,4) => (0,4)
    assert got == {(10, 0, 2), (10, 3, 6), (12, 0, 4)}
    _assert_minimal(got)


def test_nested_three_levels_and_filters(tok_nested):
    """containing/not_containing over a nested set, three levels deep."""
    from lucene_solr_spark.operators.intervals import (
        contained_by_sets,
        containing_sets,
        not_containing_sets,
        ordered_sets,
        term_intervals,
        unordered_sets,
    )

    t = tok_nested
    nested = ordered_sets(
        term_intervals(t, "a"),
        unordered_sets(term_intervals(t, "b"), term_intervals(t, "c")),
    )
    # level 3: keep nested intervals containing an x occurrence
    with_x = _set(containing_sets(nested, term_intervals(t, "x")))
    assert with_x == {(10, 3, 6), (12, 0, 4)}
    without_x = _set(not_containing_sets(nested, term_intervals(t, "x")))
    assert without_x == {(10, 0, 2)}
    # containedBy: b-c windows inside an a..d ordered envelope (doc 12 only)
    env = ordered_sets(term_intervals(t, "a"), term_intervals(t, "d"))
    u = unordered_sets(term_intervals(t, "b"), term_intervals(t, "c"))
    inside = _set(contained_by_sets(u, env))
    assert inside == {(12, 2, 4)}
    _assert_minimal(with_x)
    _assert_minimal(without_x)


def test_nested_minimality_property(tok, tok_nested):
    """Every combinator output is a minimal set, at any nesting depth."""
    from lucene_solr_spark.operators.intervals import (
        ordered_sets,
        term_intervals,
        unordered_sets,
    )

    for t in (tok, tok_nested):
        a = term_intervals(t, "a")
        b = term_intervals(t, "b")
        for expr in (
            ordered_sets(a, b),
            unordered_sets(a, b),
            ordered_sets(a, unordered_sets(b, term_intervals(t, "x"))),
            unordered_sets(ordered_sets(a, b), term_intervals(t, "x")),
        ):
            _assert_minimal(_set(expr))
