"""Token-graph filters (WordDelimiterGraphFilter, index-time
SynonymGraphFilter) golden vectors + MultiPhraseQuery differential vs the
pure-Python oracle (the TestMultiPhraseQuery pattern, SURVEY.md §6.1)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# WordDelimiterGraphFilter golden vectors
# (expected outputs follow WordDelimiterGraphFilter.java default flags:
#  GENERATE_WORD_PARTS | GENERATE_NUMBER_PARTS | SPLIT_ON_CASE_CHANGE |
#  SPLIT_ON_NUMERICS | STEM_ENGLISH_POSSESSIVE)
# ---------------------------------------------------------------------------

WDGF_GOLDEN = [
    ("Wi-Fi", [("Wi", 1), ("Fi", 1)]),
    ("wifi", [("wifi", 1)]),
    ("PowerShot", [("Power", 1), ("Shot", 1)]),
    ("SD500", [("SD", 1), ("500", 1)]),
    ("O'Neil's", [("O", 1), ("Neil", 1)]),
    ("j2se", [("j", 1), ("2", 1), ("se", 1)]),
    ("top-10-list", [("top", 1), ("10", 1), ("list", 1)]),
    ("---", []),
    ("XL", [("XL", 1)]),  # all-caps run is NOT split
]


@pytest.mark.parametrize("token,expect", WDGF_GOLDEN)
def test_wdgf_golden(token, expect):
    from lucene_solr_spark.analysis import word_delimiter_graph

    assert word_delimiter_graph(token) == expect


def test_wdgf_catenate_and_original():
    from lucene_solr_spark.analysis import word_delimiter_graph

    out = word_delimiter_graph("Wi-Fi", catenate_all=True)
    # catenated token stacks at the FIRST part's position (pos_inc 0)
    assert out == [("Wi", 1), ("WiFi", 0), ("Fi", 1)]
    out = word_delimiter_graph("Wi-Fi", preserve_original=True)
    assert out == [("Wi", 1), ("Wi-Fi", 0), ("Fi", 1)]


def test_wdgf_positions_compose():
    """Driving WDGF over a token stream: parts advance positions, stacked
    variants share them — the shape MultiPhrase consumes."""
    from lucene_solr_spark.analysis import word_delimiter_graph

    stream = []
    pos = -1
    for tok in "the Wi-Fi PowerShot".split():
        for sub, inc in word_delimiter_graph(tok, catenate_all=True):
            pos += inc
            stream.append((sub.lower(), pos))
    assert stream == [
        ("the", 0),
        ("wi", 1), ("wifi", 1), ("fi", 2),
        ("power", 3), ("powershot", 3), ("shot", 4),
    ]


# ---------------------------------------------------------------------------
# index-time SynonymGraphFilter
# ---------------------------------------------------------------------------

def test_synonym_graph_single_and_multiword():
    from lucene_solr_spark.analysis import synonym_graph

    toks = [("new", 0), ("york", 1), ("pizza", 2)]
    rules = {("new", "york"): ("nyc",), ("pizza",): ("pie",)}
    out = synonym_graph(toks, rules)
    # nyc stacks at position 0 (the match start); pie stacks at 2
    assert out == [
        ("new", 0), ("nyc", 0), ("york", 1), ("pie", 2), ("pizza", 2)
    ]


def test_synonym_graph_longest_match_wins():
    from lucene_solr_spark.analysis import synonym_graph

    toks = [("new", 0), ("york", 1), ("city", 2)]
    rules = {("new", "york"): ("ny",), ("new", "york", "city"): ("nyc",)}
    out = synonym_graph(toks, rules)
    assert ("nyc", 0) in out and ("ny", 0) not in out


def test_synonym_graph_respects_position_holes():
    """A stopword hole inside a would-be match breaks contiguity."""
    from lucene_solr_spark.analysis import synonym_graph

    toks = [("new", 0), ("york", 2)]  # hole at position 1
    out = synonym_graph(toks, {("new", "york"): ("nyc",)})
    assert ("nyc", 0) not in out


# ---------------------------------------------------------------------------
# MultiPhraseQuery: engine == pure-Python oracle (differential)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "slots",
    [
        # bigrams that genuinely occur in the fixture corpus (thousands of
        # matches) — single-term, multi-term, and partially-unknown slots
        ((("hand",), ("hand",))),
        ((("w004983", "w009583"), ("hand",))),
        ((("w004983", "nosuchterm"), ("hand",))),
        ((("hand",), ("w004983", "w009772"))),
        ((("nosuchterm",), ("hand",))),  # dead slot -> empty
    ],
)
def test_multi_phrase_engine_equals_oracle(spark, index_small, pages_small, slots):
    from lucene_solr_spark.oracle import OracleIndex
    from lucene_solr_spark.query import MultiPhrase
    from lucene_solr_spark.search import Searcher

    pages = spark.read.parquet(pages_small).collect()
    oracle = OracleIndex([(r["url"], r["text"], r["lang"]) for r in pages])
    q = MultiPhrase(slots=tuple(tuple(s) for s in slots))
    expect = [
        (url, round(s, 8)) for _d, url, s in oracle.search(q, 10)
    ]
    s = Searcher(index_small)
    got = [
        (r["url"], round(r["score"], 8))
        for r in s.search(q, 10).select("url", "score").collect()
    ]
    assert got == expect


# ---------------------------------------------------------------------------
# composition: WDGF index-time stacking consumed by Term / MultiPhrase
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def wdgf_index(spark, tmp_path_factory):
    from lucene_solr_spark.indexer import build_index, read_index

    docs = [
        ("u1", "en", "my Wi-Fi router works"),
        ("u2", "en", "plain wifi router setup"),
        ("u3", "en", "WiFi PowerShot SD500 camera"),
        ("u4", "en", "wired ethernet router only"),
    ]
    pages = spark.createDataFrame(docs, "url string, lang string, text string")
    out = str(tmp_path_factory.mktemp("wdgfidx") / "idx")
    build_index(spark, pages, out, profile="wdgf", num_buckets=4)
    return read_index(spark, out), docs


def test_wdgf_index_matches_all_variants(spark, wdgf_index):
    """catenate_all stacking: Term('wifi') matches 'Wi-Fi', 'wifi' AND
    'WiFi' docs — the practical schema the filter exists for."""
    from lucene_solr_spark.query import Term
    from lucene_solr_spark.search import Searcher

    idx, _docs = wdgf_index
    s = Searcher(idx)
    urls = {r["url"] for r in s.search(Term("wifi"), 10).collect()}
    assert urls == {"u1", "u2", "u3"}
    # split parts are positioned tokens too
    assert {r["url"] for r in s.search(Term("sd"), 10).collect()} == {"u3"}


def test_wdgf_index_equals_oracle(spark, wdgf_index):
    """Engine == pure-Python oracle on the wdgf profile (stacked postings
    flow through build_index's slow-path analyzer identically)."""
    from lucene_solr_spark.oracle import OracleIndex
    from lucene_solr_spark.query import Boolean, MultiPhrase, Term
    from lucene_solr_spark.search import Searcher

    idx, docs = wdgf_index
    oracle = OracleIndex([(u, t, l) for u, l, t in docs], profile="wdgf")
    s = Searcher(idx)
    for q in (
        Term("wifi"),
        Term("router"),
        Boolean(should=[Term("wifi"), Term("ethernet")]),
        MultiPhrase(slots=(("wifi", "wired"), ("router", "ethernet"))),
    ):
        expect = [(u, round(sc, 8)) for _d, u, sc in oracle.search(q, 10)]
        got = [
            (r["url"], round(r["score"], 8))
            for r in s.search(q, 10).select("url", "score").collect()
        ]
        assert got == expect, q
