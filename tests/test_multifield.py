"""Multi-field document model (multifield.py): per-field indexes share
the dense doc-id space; fielded search, cross-field dismax, per-field
similarity (FieldInfos / PerFieldPostingsFormat / PerFieldSimilarityWrapper
/ ExtendedDismaxQParser qf semantics)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.multifield import (
    MultiFieldSearcher,
    build_multifield_index,
)
from lucene_solr_spark.query import Term

DOCS = [
    # (url, title, body)
    ("u01", "spark merge engine", "the merge of sorted runs is a merge"),
    ("u02", "index build", "merge policy picks segments to merge now"),
    ("u03", "query engine", "a query engine scores documents"),
    ("u04", "merge", "no occurrences here at all"),
    ("u05", "totally other", "join join join merge"),
]


@pytest.fixture(scope="module")
def mf(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("mfidx"))
    docs = spark.createDataFrame(
        [(u, t, b, "en") for u, t, b in DOCS],
        "url string, title string, body string, lang string",
    )
    indexes = build_multifield_index(
        spark,
        docs,
        out,
        fields={"title": F.col("title"), "body": F.col("body")},
        profile="simple",
        num_buckets=4,
        quantize=False,
    )
    return indexes


def test_doc_ids_align_across_fields(mf):
    """ids are rank-of-url, a pure function of the url set — the property
    that makes per-field indexes joinable without any mapping table."""
    t = {r["url"]: r["doc_id"] for r in mf["title"]["docmeta"].collect()}
    b = {r["url"]: r["doc_id"] for r in mf["body"]["docmeta"].collect()}
    assert t == b and len(t) == len(DOCS)


def test_field_stats_are_per_field(mf):
    """Per-field CollectionStatistics: avgdl/sumTotalTermFreq differ."""
    st, sb = mf["title"]["stats"], mf["body"]["stats"]
    assert st["doc_count"] == sb["doc_count"] == len(DOCS)
    assert st["avgdl"] != sb["avgdl"]


def _bm25(tf, df, n, dl, avgdl, k1=1.2, b=0.75):
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    return idf * tf / (tf + k1 * (1 - b + b * dl / avgdl))


def test_fielded_term_scores_title_only(mf):
    s = MultiFieldSearcher(mf)
    rows = s.search_field("title", Term("merge"), 10).collect()
    # title 'merge' appears in u01, u04 only (not u02/u05 whose merges are body)
    urls = {r["doc_id"] for r in rows}
    ids = {r["url"]: r["doc_id"] for r in mf["title"]["docmeta"].collect()}
    assert urls == {ids["u01"], ids["u04"]}
    # hand-computed BM25 under TITLE stats: n=5, df=2, avgdl=mean title len
    title_lens = {"u01": 3, "u02": 2, "u03": 2, "u04": 1, "u05": 2}
    avgdl = sum(title_lens.values()) / 5
    by_id = {r["doc_id"]: r["score"] for r in rows}
    assert by_id[ids["u04"]] == pytest.approx(
        _bm25(1, 2, 5, 1, avgdl), rel=1e-6
    )
    assert by_id[ids["u01"]] == pytest.approx(
        _bm25(1, 2, 5, 3, avgdl), rel=1e-6
    )


def test_dismax_fields_matches_hand_computation(mf):
    """qf=title^2,body tie=0.1 for ['merge']: per doc the field max + 0.1
    * remainder, verified against the per-field searchers' own scores."""
    s = MultiFieldSearcher(mf)
    got = {
        r["doc_id"]: r["score"]
        for r in s.dismax_fields(["merge"], {"title": 2.0, "body": 1.0}, 10, tie=0.1).collect()
    }
    title = {
        r["doc_id"]: 2.0 * r["score"]
        for r in s.search_field("title", Term("merge"), 100).collect()
    }
    body = {
        r["doc_id"]: r["score"]
        for r in s.search_field("body", Term("merge"), 100).collect()
    }
    assert set(got) == set(title) | set(body)
    for d, sc in got.items():
        parts = [title.get(d, 0.0), body.get(d, 0.0)]
        want = max(parts) + 0.1 * (sum(parts) - max(parts))
        assert sc == pytest.approx(want, rel=1e-9)


def test_perfield_similarity_sum(mf):
    """title scored classic, body scored bm25, summed — each under its own
    field's stats (PerFieldSimilarityWrapper)."""
    s = MultiFieldSearcher(
        mf, similarities={"title": "classic", "body": "bm25"}
    )
    got = {
        r["doc_id"]: r["score"]
        for r in s.combined_sum_fields(["merge"], {"title": 1.0, "body": 1.0}, 10).collect()
    }
    classic_title = {
        r["doc_id"]: r["score"]
        for r in s.search_field("title", Term("merge"), 100).collect()
    }
    bm25_body = {
        r["doc_id"]: r["score"]
        for r in MultiFieldSearcher(mf)
        .search_field("body", Term("merge"), 100)
        .collect()
    }
    for d, sc in got.items():
        want = classic_title.get(d, 0.0) + bm25_body.get(d, 0.0)
        assert sc == pytest.approx(want, rel=1e-9)
    # classic formula spot check on u04 (title 'merge', dl=1, tf=1, df=2, n=5)
    ids = {r["url"]: r["doc_id"] for r in mf["title"]["docmeta"].collect()}
    idf = math.log(6.0 / 3.0) + 1.0
    assert classic_title[ids["u04"]] == pytest.approx(idf * idf, rel=1e-6)


def test_queries_touch_only_their_fields_index(mf):
    """A title query's plan reads the title postings path only — the
    analog of Lucene seeking one field's terms dictionary."""
    s = MultiFieldSearcher(mf)
    plan = s.search_field("title", Term("merge"), 10)._jdf.queryExecution().executedPlan().toString()
    assert "/title/postings" in plan and "/body/postings" not in plan


def test_combined_field_query_bm25f(mf):
    """CombinedFieldQuery: hand-compute the pseudo-field BM25 for 'merge'
    with title^2 + body, and check the degenerate single-field case
    equals the plain fielded search."""
    s = MultiFieldSearcher(mf)
    res = {
        r["doc_id"]: r["score"]
        for r in s.combined_field_query(
            ["merge"], {"title": 2.0, "body": 1.0}, 10
        ).collect()
    }
    # hand model over DOCS
    titles = {u: t.split() for u, t, _ in DOCS}
    bodies = {u: b.split() for u, _, b in DOCS}
    ids = {r["url"]: r["doc_id"] for r in mf["body"]["docmeta"].collect()}
    n = len(DOCS)
    avgdl = 2.0 * sum(len(v) for v in titles.values()) / n + sum(
        len(v) for v in bodies.values()
    ) / n
    df_t = sum("merge" in v for v in titles.values())
    df_b = sum("merge" in v for v in bodies.values())
    df = max(df_t, df_b)
    for u in titles:
        tf = 2.0 * titles[u].count("merge") + bodies[u].count("merge")
        if tf == 0:
            assert ids[u] not in res
            continue
        dl = 2.0 * len(titles[u]) + len(bodies[u])
        assert res[ids[u]] == pytest.approx(
            _bm25(tf, df, n, dl, avgdl), rel=1e-9
        )
    # degenerate: one field at weight 1 == the fielded search
    single = {
        r["doc_id"]: r["score"]
        for r in s.combined_field_query(["merge"], {"body": 1.0}, 10).collect()
    }
    fielded = {
        r["doc_id"]: r["score"]
        for r in s.search_field("body", Term("merge"), 10).collect()
    }
    assert single == pytest.approx(fielded)
