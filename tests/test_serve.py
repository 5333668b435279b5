"""Serving fast path (serve.py): rank identity vs the distributed plan
across the query-type matrix, RAM-budget fallback, and the latency win.

The serving path replicates search.py's compiled Column arithmetic in
float64 numpy with the same IEEE association order, so ranks must match
exactly and scores to ~1 ulp (multi-clause sums may reassociate)."""

from __future__ import annotations

import pytest

from lucene_solr_spark.query import (
    Blended,
    Boolean,
    Boost,
    ConstantScore,
    DisMax,
    Fuzzy,
    LangFilter,
    MatchAll,
    MultiPhrase,
    Phrase,
    Prefix,
    Synonym,
    Term,
    TermInSet,
    TermRange,
    Wildcard,
)
from lucene_solr_spark.search import Searcher


@pytest.fixture(scope="module")
def both(index_small):
    dist = Searcher(index_small)
    serving = dist.serve().serving
    return dist, serving


def _assert_same(dist, serving, q, k=10):
    want = [
        (r["doc_id"], r["score"])
        for r in dist.search(q, k, with_fields=False).collect()
    ]
    got = serving.search(q, k, with_fields=False)
    assert [d for d, _ in got] == [d for d, _ in want], (q, want, got)
    for (_, sw), (_, sg) in zip(want, got):
        assert sg == pytest.approx(sw, rel=1e-12, abs=1e-12), (q, want, got)
    return want


QUERIES = [
    Term("search"),
    Term("engin", boost=2.5),
    Boolean(must=[Term("search"), Term("engin")]),
    Boolean(should=[Term("search"), Term("engin"), Term("web")]),
    Boolean(
        should=[Term("search"), Term("engin"), Term("web")],
        min_should_match=2,
    ),
    Boolean(must=[Term("search")], must_not=[Term("engin")]),
    Boolean(must=[Term("search")], filter=[Term("web")]),
    Boolean(
        must=[Term("search")],
        should=[Term("web", boost=3.0)],
        boost=1.7,
    ),
    Boolean(
        must=[Boolean(should=[Term("search"), Term("web")])],
        must_not=[Phrase(("search", "engin"))],
    ),
    DisMax(children=[Term("search"), Term("engin")], tie_breaker=0.3),
    DisMax(children=[Term("search"), Term("web")], tie_breaker=0.0, boost=2.0),
    Synonym(terms=("search", "lookup")),
    Blended(terms=("search", "engin")),
    Phrase(("search", "engin")),
    MultiPhrase(slots=(("search", "web"), ("engin",))),
    Prefix("sea"),
    Wildcard("s?arch"),
    Fuzzy("serch", max_edits=1),
    TermRange("search", "searching"),
    TermInSet(terms=("search", "engin", "zzzz")),
    ConstantScore(Prefix("sea"), boost=4.0),
    Boost(Term("search"), 0.25),
    LangFilter(Term("search"), "en"),
    MatchAll(),
    Boolean(must=[MatchAll()], must_not=[Term("search")]),
]


@pytest.mark.parametrize("q", QUERIES, ids=lambda q: type(q).__name__ + str(abs(hash(repr(q))) % 10**6))
def test_rank_identity(both, q):
    dist, serving = both
    _assert_same(dist, serving, q)


def test_string_queries_parse_identically(both):
    dist, serving = both
    for s in ["search engine", "+search -engine", '"search engine"',
              "search^2 web", "sea*"]:
        want = [
            (r["doc_id"], r["score"])
            for r in dist.search(s, 10, with_fields=False).collect()
        ]
        got = serving.search(s, 10, with_fields=False)
        assert [d for d, _ in got] == [d for d, _ in want], s
        for (_, sw), (_, sg) in zip(want, got):
            assert sg == pytest.approx(sw, rel=1e-12)


def test_count_identity(both):
    dist, serving = both
    for q in [Term("search"), Boolean(should=[Term("search"), Term("web")]),
              Prefix("w00")]:
        assert serving.count(q) == dist.count(q), q


def test_with_fields_urls(both):
    dist, serving = both
    want = {
        r["doc_id"]: r["url"]
        for r in dist.search(Term("search"), 5).collect()
    }
    got = serving.search(Term("search"), 5)
    assert {d: u for d, _, u in got} == want


def test_unknown_and_empty(both):
    _, serving = both
    assert serving.search(Term("zzzznotaterm"), 5) == []
    assert serving.search("", 5) == []
    assert serving.search(Boolean(), 5) == []


def test_k_larger_than_matches(both):
    dist, serving = both
    _assert_same(dist, serving, Term("naïve"), k=10**6)


def test_volume_guard_falls_back(index_small):
    from lucene_solr_spark.serve import CandidateVolumeExceeded

    dist = Searcher(index_small)
    hybrid = dist.serve(max_fetch_bytes=64)  # absurdly small budget
    with pytest.raises(CandidateVolumeExceeded):
        hybrid.serving.search(Term("search"), 5)
    got = hybrid.search(Term("search"), 5, with_fields=False)
    assert hybrid.fell_back == 1 and hybrid.served == 0
    want = [
        (r["doc_id"], r["score"])
        for r in dist.search(Term("search"), 5, with_fields=False).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in want]


def test_unsupported_node_falls_back(index_small):
    from lucene_solr_spark.query import FunctionScore

    dist = Searcher(index_small)
    hybrid = dist.serve()
    got = hybrid.search(
        Boolean(must=[Term("search")], should=[FunctionScore("1.0 / (doc_id + 1)")]),
        5,
        with_fields=False,
    )
    assert hybrid.fell_back == 1
    assert len(got) == 5


def test_lru_eviction_bounded(index_small):
    dist = Searcher(index_small)
    serving = dist.serve(cache_bytes=1 << 12).serving  # 4 KiB budget
    for t in ["search", "engin", "web", "index", "data"]:
        serving.search(Term(t), 5, with_fields=False)
    assert serving._cache_nbytes <= (1 << 12) + 64 or len(serving._cache) == 1


def test_steady_state_latency_beats_spark_floor(both):
    """The whole point: warm serving queries are orders of magnitude
    under the ~300 ms Spark job floor. Generous 50 ms bound to stay
    robust on a loaded CI host."""
    import time

    _, serving = both
    serving.search("search engine", 10, with_fields=False)  # warm
    t0 = time.time()
    n = 50
    for _ in range(n):
        serving.search("search engine", 10, with_fields=False)
    per = (time.time() - t0) / n
    assert per < 0.05, f"warm serve query took {per*1000:.1f} ms"


def test_search_after_pagination(both):
    """Page 2 via searchAfter must equal rows k..2k of a double-size
    search, and match the distributed search_after."""
    dist, serving = both
    q = Boolean(should=[Term("search"), Term("web")])
    full = serving.search(q, 10, with_fields=False)
    assert len(full) == 10
    last_score, last_doc = full[4][1], full[4][0]
    page2 = serving.search_after(q, last_score, last_doc, k=5)
    assert page2 == full[5:10]
    want = [
        (r["doc_id"], r["score"])
        for r in dist.search_after(q, last_score, last_doc, k=5).collect()
    ]
    assert [d for d, _ in page2] == [d for d, _ in want]


def test_refresh_reopens_after_rebuild(spark, pages_small, tmp_path):
    """SearcherManager analog: after the index is rebuilt with more
    docs, refresh() loads the new generation; an unchanged index
    refreshes to False without dropping caches."""
    from pyspark.sql import functions as F

    from lucene_solr_spark.indexer import build_index
    from lucene_solr_spark.serve import ServingSearcher

    pages = spark.read.parquet(pages_small)
    idx = str(tmp_path / "ridx")
    build_index(spark, pages.limit(400), idx, profile="en", num_buckets=4)
    s = ServingSearcher(idx)
    n0 = s.n_docs
    s.search(Term("search"), 5, with_fields=False)  # warm a cache entry
    assert s.refresh() is False  # unchanged: no-op, cache retained
    assert len(s._cache) > 0
    build_index(spark, pages, idx, profile="en", num_buckets=4)
    assert s.refresh() is True
    assert s.n_docs > n0
    # new generation serves correctly
    assert len(s.search(Term("search"), 5, with_fields=False)) > 0
