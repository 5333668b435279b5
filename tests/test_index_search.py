"""Differential oracle tests (SURVEY.md §6.1 TestWANDScorer pattern):
engine top-k must be rank-identical with equal scores (rtol 1e-9) vs the
exhaustive pure-Python oracle, across the query-type matrix of FIXTURES.md §4.
"""

import pyarrow.parquet as pq
import pytest

from lucene_solr_spark import query as Q
from lucene_solr_spark.oracle import OracleIndex
from lucene_solr_spark.search import Searcher


@pytest.fixture(scope="module")
def oracle(pages_small):
    tbl = pq.read_table(pages_small, columns=["url", "text", "lang"])
    rows = list(
        zip(
            tbl.column("url").to_pylist(),
            tbl.column("text").to_pylist(),
            tbl.column("lang").to_pylist(),
        )
    )
    return OracleIndex(rows, profile="en")


@pytest.fixture(scope="module")
def searcher(index_small):
    return Searcher(index_small)


def assert_topk_match(searcher, oracle, q, k=10):
    eng = [
        (r["doc_id"], r["score"])
        for r in searcher.search(q, k, with_fields=False).collect()
    ]
    orc = [(d, s) for d, _u, s in oracle.search(q, k)]
    assert len(eng) == len(orc), (q, len(eng), len(orc), eng[:3], orc[:3])
    for (ed, es), (od, os_) in zip(eng, orc):
        assert ed == od, (q, eng, orc)
        assert es == pytest.approx(os_, rel=1e-9), (q, ed, es, os_)


# string queries through the classic-syntax parser (analyzed with 'en' chain)
STRING_QUERIES = [
    "search",            # head term
    "engine",            # possessive/stem folding
    "w000003",           # synthetic mid term
    "the",               # pure stopword -> empty query
    "running",           # stemmed form matches 'run' docs
    "engine data",       # OR
    "search engine data city",  # wide OR
    "+search +engine",   # AND
    "+search +engine +data",    # AND-3
    "+search engine -data",     # must/should/not mix
    "+data -search",
    '"search engine"',   # phrase (may be empty)
    "w0001*",            # prefix
    "w00017*",
]


@pytest.mark.parametrize("qtext", STRING_QUERIES)
def test_string_queries_match_oracle(searcher, oracle, qtext):
    if qtext == "the":
        # stopword-only query: no clauses -> empty result both sides
        assert searcher.count(Q.parse(qtext, "en")) == 0
        assert oracle.count(Q.parse(qtext, "en")) == 0
        return
    assert_topk_match(searcher, oracle, qtext)


def test_phrase_with_hits(searcher, oracle):
    # take a real bigram from the corpus so the phrase path is exercised
    bigram = None
    for _url, text, _lang in zip(oracle.urls, [None] * 0, []):
        pass
    # pick two adjacent emitted terms of doc 0 from the oracle postings
    doc0_terms = sorted(
        [
            (ps[0], t)
            for t, pl in oracle.postings.items()
            if 0 in pl
            for ps in [pl[0]]
        ]
    )
    for (p1, t1), (p2, t2) in zip(doc0_terms, doc0_terms[1:]):
        if p2 == p1 + 1:
            bigram = (t1, t2)
            break
    assert bigram, "corpus should contain an adjacent bigram in doc 0"
    q = Q.Phrase(bigram)
    assert oracle.count(q) >= 1
    assert_topk_match(searcher, oracle, q)


AST_QUERIES = [
    Q.Boolean(should=[Q.Term("search"), Q.Term("engin")], min_should_match=2),
    Q.Boolean(
        must=[Q.Term("data")],
        should=[Q.Term("search"), Q.Term("engin"), Q.Term("citi")],
        min_should_match=1,
    ),
    Q.Synonym(("search", "engin")),
    Q.Fuzzy("searc", max_edits=1),
    Q.TermRange("w000100", "w000200"),
    Q.TermInSet(("search", "engin", "data", "nosuchterm")),
    Q.Wildcard("w0001?0"),
    Q.Regexp("w00012[0-9]"),
    Q.DisMax([Q.Term("search"), Q.Term("engin")], tie_breaker=0.3),
    Q.Boost(Q.Term("search"), 2.5),
    Q.ConstantScore(Q.Term("search"), 1.5),
    Q.LangFilter(Q.Term("search"), "en"),
    Q.LangFilter(Q.Boolean(should=[Q.Term("search"), Q.Term("data")]), "de"),
    Q.MatchAll(),
    Q.Boolean(must=[Q.MatchAll()], must_not=[Q.Term("search")]),
    Q.Boolean(must=[Q.Term("data")], filter=[Q.Term("search")]),
]


@pytest.mark.parametrize("q", AST_QUERIES, ids=lambda q: type(q).__name__)
def test_ast_queries_match_oracle(searcher, oracle, q):
    assert_topk_match(searcher, oracle, q)


def test_counts_match(searcher, oracle):
    for qtext in ["search", "engine data", "+search +engine"]:
        assert searcher.count(Q.parse(qtext, "en")) == oracle.count(
            Q.parse(qtext, "en")
        )


def test_search_after_pagination(searcher, oracle):
    q = Q.parse("engine data", "en")
    full = [(d, s) for d, _u, s in oracle.search(q, 20)]
    page1 = full[:10]
    after_score, after_doc = page1[-1][1], page1[-1][0]
    eng_page2 = [
        (r["doc_id"], r["score"])
        for r in searcher.search_after(q, after_score, after_doc, 10).collect()
    ]
    orc_page2 = full[10:20]
    assert [d for d, _ in eng_page2] == [d for d, _ in orc_page2]


def test_classic_similarity_runs(index_small, oracle):
    s = Searcher(index_small, similarity="classic")
    rows = s.search("search engine", 10, with_fields=False).collect()
    assert len(rows) > 0
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_lru_query_cache(spark, index_small):
    """LRUQueryCache analog: repeated filter clauses hit the cache and
    return identical results; eviction unpersists."""
    from lucene_solr_spark.query import Boolean, Term, TermRange
    from lucene_solr_spark.search import QueryCache, Searcher

    cache = QueryCache(max_entries=2)
    s = Searcher(index_small, query_cache=cache)
    q = Boolean(must=[Term("search")], filter=[TermRange("w000000", "w000099")])
    first = [(r["doc_id"], round(r["score"], 8))
             for r in s.search(q, 10, with_fields=False).collect()]
    assert cache.misses == 1 and cache.hits == 0
    second = [(r["doc_id"], round(r["score"], 8))
              for r in s.search(q, 10, with_fields=False).collect()]
    assert second == first
    assert cache.hits == 1
    # uncached searcher agrees (cache changes cost, never results)
    plain = Searcher(index_small)
    third = [(r["doc_id"], round(r["score"], 8))
             for r in plain.search(q, 10, with_fields=False).collect()]
    assert third == first
    # LRU eviction: two more distinct filters evict the first
    for hi in ("w000199", "w000299"):
        s.search(Boolean(must=[Term("search")],
                         filter=[TermRange("w000100", hi)]), 5,
                 with_fields=False).collect()
    assert len(cache._entries) == 2
    cache.clear()


def test_dfr_ib_matrix_sweep(spark):
    """Full DFR (7 basic x 2 after x 2 norm) and IB (2 dist x 2 lambda)
    matrices produce finite, non-negative scores over a grid of
    (tf, dl, df, ttf) statistics — one Spark job for the whole sweep."""
    from pyspark.sql import functions as F

    from lucene_solr_spark.score import dfr_score, ib_score

    rows = [
        (1.0, 10.0, 1.0, 1.0),
        (3.0, 50.0, 40.0, 120.0),
        (8.0, 200.0, 99.0, 400.0),
        (1.0, 1000.0, 5.0, 7.0),
    ]
    df = spark.createDataFrame(rows, "tf double, dl double, df double, ttf double")
    n_docs, avgdl = 100, 120.0
    cols = []
    for basic in ("in", "if", "ine", "g", "be", "p", "d"):
        for after in ("l", "b"):
            for norm in ("h1", "h2"):
                cols.append(
                    dfr_score(
                        F.col("tf"), F.col("dl"), F.col("df"), F.col("ttf"),
                        n_docs, avgdl, basic=basic, after=after, norm=norm,
                    ).alias(f"dfr_{basic}_{after}_{norm}")
                )
    for dist in ("ll", "spl"):
        for lam in ("df", "ttf"):
            cols.append(
                ib_score(
                    F.col("tf"), F.col("dl"), F.col("df"), F.col("ttf"),
                    n_docs, avgdl, distribution=dist, lambda_model=lam,
                ).alias(f"ib_{dist}_{lam}")
            )
    out = df.select(*cols).collect()
    assert len(out[0]) == 7 * 2 * 2 + 4
    for row in out:
        for name, v in row.asDict().items():
            assert v is not None and v >= 0.0, (name, v)
            assert v == v and v != float("inf"), (name, v)


def test_per_field_similarity_dispatch():
    """PerFieldSimilarityWrapper resolves the scorer factory by field name,
    falling back to the default for unmapped fields."""
    from lucene_solr_spark.score import (
        PerFieldSimilarity,
        bm25_score,
        boolean_score,
        classic_score,
    )

    pfs = PerFieldSimilarity(
        default=bm25_score,
        per_field={"title": classic_score, "source": boolean_score},
    )
    assert pfs.get("title") is classic_score
    assert pfs.get("source") is boolean_score
    assert pfs.get("text") is bm25_score
    assert pfs.get("unknown_field") is bm25_score


def test_dense_ids_require_unique_rejects_duplicates(spark):
    """The dup-key guard rides the counting pass (ids.py): duplicate urls
    must fail loudly before any index table is written."""
    import pytest as _pytest

    from lucene_solr_spark.ids import assign_dense_ids

    df = spark.createDataFrame(
        [("u1",), ("u2",), ("u1",)], ["url"]
    )
    with _pytest.raises(ValueError, match="duplicate"):
        # the counting pass collects, so the error surfaces eagerly
        assign_dense_ids(df, "url", partitions=2, require_unique=True)


def test_dense_ids_require_unique_passes_and_stays_dense(spark):
    from lucene_solr_spark.ids import assign_dense_ids

    df = spark.createDataFrame([(f"u{i:03d}",) for i in range(57)], ["url"])
    out = assign_dense_ids(df, "url", partitions=4, require_unique=True)
    ids = sorted(r["doc_id"] for r in out.collect())
    assert ids == list(range(57))


def test_lead_filter_fires_and_matches_oracle(searcher, oracle):
    """ConjunctionDISI lead-iterator prefilter (search.py:_lead_filter):
    pick a rare term (df 1..5) from term_stats and AND it with the head
    term 'search' — the >=8x df gap forces the gate; top-k must stay
    rank- and score-identical with the exhaustive oracle."""
    from pyspark.sql import functions as F

    head_df = searcher._stats_for(["search"])["search"]["df"]
    rare = (
        searcher.index["term_stats"]
        .filter((F.col("df") >= 1) & (F.col("df") * 8 <= F.lit(head_df)))
        .orderBy("df", "term")
        .select("term")
        .first()
    )
    assert rare is not None, "corpus should contain a rare term"
    q = Q.Boolean(must=[Q.Term(rare["term"]), Q.Term("search")])
    bound = searcher._stats_for([c.term for c in q.must])
    assert searcher._lead_filter(q, bound) is not None, "gate must fire"
    assert_topk_match(searcher, oracle, q)
    # and a SHOULD contribution on top of the gated musts
    q2 = Q.Boolean(
        must=[Q.Term(rare["term"]), Q.Term("search")],
        should=[Q.Term("data")],
    )
    assert_topk_match(searcher, oracle, q2)


def test_query_result_cache_skips_jobs(spark, searcher):
    """queryResultCache: the second ask (same query, same or smaller k,
    or next page within the window) runs ZERO Spark jobs; a k past the
    cached window re-executes."""
    from lucene_solr_spark.query import Term

    s = searcher
    q = Term("search")
    tracker = spark.sparkContext.statusTracker

    first = s.search_cached(q, 5, window=10)
    n_jobs_after_first = len(tracker().getJobIdsForGroup(None) or [])
    again = s.search_cached(q, 5, window=10)
    page2 = s.search_cached(q, 10, window=10)
    n_jobs_after_hits = len(tracker().getJobIdsForGroup(None) or [])
    assert n_jobs_after_hits == n_jobs_after_first  # pure cache hits
    assert [r["doc_id"] for r in again] == [r["doc_id"] for r in first]
    assert [r["doc_id"] for r in page2[:5]] == [r["doc_id"] for r in first]
    # ordering contract preserved
    scores = [r["score"] for r in page2]
    assert scores == sorted(scores, reverse=True)
    # k beyond the cached window re-executes (unless exhausted)
    bigger = s.search_cached(q, 25, window=10)
    assert len(bigger) >= len(page2)
