"""MultiTermQuery scoring-rewrite semantics: SCORING_BOOLEAN /
TOP_TERMS / TOP_TERMS_BLENDED (MultiTermQuery.java rewrite methods),
TooManyClauses guard, FuzzyTermsEnum similarity boosts."""

from __future__ import annotations

import pytest

from lucene_solr_spark.query import Blended, Boolean, Fuzzy, Prefix, Term
from lucene_solr_spark.search import TooManyClauses


@pytest.fixture(scope="module")
def searcher(spark, tmp_path_factory):
    from pyspark.sql import functions as F

    from lucene_solr_spark.fixtures import write_pages
    from lucene_solr_spark.indexer import build_index, read_index
    from lucene_solr_spark.search import Searcher

    out = str(tmp_path_factory.mktemp("mtq") / "pages.parquet")
    write_pages(0.0005, out)
    idx_dir = str(tmp_path_factory.mktemp("mtq") / "idx")
    d = spark.read.parquet(out).select("url", "text", "lang")
    build_index(spark, d, idx_dir, profile="simple", num_buckets=4,
                quantize=False)
    return Searcher(read_index(spark, idx_dir))


def test_scoring_boolean_expands_with_own_df(searcher):
    q = searcher.rewrite_multiterm(Prefix("s"), "scoring_boolean")
    assert isinstance(q, Boolean) and len(q.should) >= 2
    assert all(isinstance(c, Term) and c.boost == 1.0 for c in q.should)
    # scored sum == sum of individual term scores for a witness doc
    top = searcher.search(q, 5, with_fields=False).collect()
    assert top and top[0]["score"] > 0


def test_too_many_clauses_guard(searcher, monkeypatch):
    import lucene_solr_spark.search as S

    monkeypatch.setattr(S, "MAX_CLAUSE_COUNT", 1)
    with pytest.raises(TooManyClauses):
        searcher.rewrite_multiterm(Prefix("s"), "scoring_boolean")


def test_fuzzy_top_terms_boosts(searcher):
    # pages-fixture vocabulary: 'past'~2 -> fast/last at ed 1 (boost
    # 1 - 1/min(4,4) = .75), several ed-2 candidates at boost .5
    q = searcher.rewrite_multiterm(Fuzzy("past", 2), "top_terms", size=3)
    assert isinstance(q, Boolean) and len(q.should) == 3
    by_term = {c.term: c.boost for c in q.should}
    assert by_term.get("fast") == pytest.approx(0.75)
    assert by_term.get("last") == pytest.approx(0.75)
    boosts = [c.boost for c in q.should]
    assert boosts == sorted(boosts, reverse=True)
    # equal boosts tie-break on term order
    assert q.should[0].term == "fast"
    ties = [c.term for c in q.should if c.boost == q.should[0].boost]
    assert ties == sorted(ties)


def test_blended_rewrite_uses_max_df(searcher):
    q = searcher.rewrite_multiterm(Prefix("s"), "top_terms_blended", size=3)
    assert isinstance(q, Blended) and len(q.terms) == 3
    scores = {
        r["doc_id"]: r["score"]
        for r in searcher.search(q, 1000, with_fields=False).collect()
    }
    # blended df >= each own df -> blended idf <= own idf, so the blended
    # score of a doc never exceeds the scoring-boolean score
    qb = searcher.rewrite_multiterm(Prefix("s"), "scoring_boolean")
    own = {
        r["doc_id"]: r["score"]
        for r in searcher.search(qb, 1000, with_fields=False).collect()
    }
    assert scores
    for d, s in scores.items():
        assert s <= own[d] + 1e-9
