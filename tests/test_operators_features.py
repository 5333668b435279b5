"""Unit tests for search-UX and spans operators over a tiny hand-built
corpus with known answers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def mini_docs(spark):
    rows = [
        (0, "quick brown fox jumps over the lazy dog"),
        (1, "the quick dog barks"),
        (2, "brown bear sleeps"),
        (3, "fox and dog and fox"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def mini_tok(spark, mini_docs):
    return mini_docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "term")
    ).select("doc_id", "term", (F.col("pos0") + 1).alias("pos"))


def test_highlight_first_window(mini_docs):
    from lucene_solr_spark.operators.search_features import (
        highlight_first_window,
    )

    out = {
        r["doc_id"]: r["snippet"]
        for r in highlight_first_window(
            mini_docs, "text", ["fox", "dog"], 2, 2
        ).collect()
    }
    assert out[0] == "quick brown <em>fox</em> jumps over"
    assert out[1] == "the quick <em>dog</em> barks"
    assert out[2] is None
    # first hit at position 1: start clamps to 1, window end-anchored
    assert out[3] == "<em>fox</em> and <em>dog</em>"


def test_suggest_and_spellcheck(mini_tok):
    from lucene_solr_spark.operators.search_features import (
        spellcheck,
        suggest_prefix,
    )

    sugg = suggest_prefix(mini_tok, "b", 10).collect()
    assert [(r["term"], r["df"]) for r in sugg] == [
        ("brown", 2),
        ("barks", 1),
        ("bear", 1),
    ]
    sp = spellcheck(mini_tok, "fix", 1, 3).collect()
    assert sp[0]["term"] == "fox" and sp[0]["distance"] == 1


def test_span_near_and_sloppy(mini_tok):
    from lucene_solr_spark.operators.spans import (
        span_first,
        span_near,
        sloppy_phrase_freq,
    )

    # "fox ... dog": doc 3 = fox(1) dog(3) fox(5): ordered pairs within slop 1:
    # (1,3): dist 1 -> match; (5,3) not ordered; so n_matches=1
    near = {
        r["doc_id"]: r["n_matches"]
        for r in span_near(mini_tok, "fox", "dog", 1, True).collect()
    }
    assert near == {3: 1}
    # unordered slop 1 adds the (dog 3, fox 5) pair
    un = {
        r["doc_id"]: r["n_matches"]
        for r in span_near(mini_tok, "fox", "dog", 1, False).collect()
    }
    assert un == {3: 2}
    first = sorted(
        r["doc_id"] for r in span_first(mini_tok, "quick", 3).collect()
    )
    assert first == [0, 1]  # 'quick' at pos 1 and 2 (1-based < 3)
    sf = {
        r["doc_id"]: round(r["sloppy_freq"], 4)
        for r in sloppy_phrase_freq(mini_tok, "fox", "dog", 1).collect()
    }
    # greedy walk on doc3 fox(1) dog(3) fox(5): one emission ml=1 (w=0.5),
    # tail ml=3 > slop — same value the all-pairs form happens to give here
    assert sf == {3: 0.5}


def test_sloppy_greedy_vs_allpairs_differential(spark):
    """Lucene-greedy vs all-pairs on overlapping repeats: doc 'a b a b',
    query "a b"~2. Greedy consumes each position once -> two exact matches
    (freq 2.0); all-pairs also scores the two cross pairs at ml=2 ->
    2 + 2/3. The two semantics MUST disagree here (that disagreement is
    what SloppyPhraseMatcher's greedy consumption is about), and greedy
    must match the hand-traced Lucene value."""
    from lucene_solr_spark.operators.spans import (
        sloppy_phrase_freq,
        sloppy_phrase_freq_allpairs,
    )

    tok = spark.createDataFrame(
        [(1, "a", 0), (1, "b", 1), (1, "a", 2), (1, "b", 3)],
        "doc_id long, term string, pos int",
    )
    greedy = {
        r["doc_id"]: round(r["sloppy_freq"], 4)
        for r in sloppy_phrase_freq(tok, "a", "b", 2).collect()
    }
    allp = {
        r["doc_id"]: round(r["sloppy_freq"], 4)
        for r in sloppy_phrase_freq_allpairs(tok, "a", "b", 2).collect()
    }
    assert greedy == {1: 2.0}
    assert allp == {1: 2.6667}
    assert greedy != allp


def test_greedy_sloppy_kernel_cases():
    """Hand-traced Lucene values for the pure-Python kernel."""
    from lucene_solr_spark.operators.spans import greedy_sloppy_freq_lists

    # exact adjacency: "a b" -> adjusted [0], [0]
    assert greedy_sloppy_freq_lists([[0], [0]], 2) == 1.0
    # transposition "b a": a at 1, b at 0 -> adjusted [1], [-1] -> ml=2
    assert greedy_sloppy_freq_lists([[1], [-1]], 2) == pytest.approx(1 / 3)
    assert greedy_sloppy_freq_lists([[1], [-1]], 1) == 0.0
    # missing term -> conjunction fails
    assert greedy_sloppy_freq_lists([[0, 5], []], 3) == 0.0
    # 3-term exact phrase "x y z" at 0,1,2 -> adjusted [0],[0],[0]
    assert greedy_sloppy_freq_lists([[0], [0], [0]], 0) == 1.0
    # 3-term with one gap: x(0) y(2) z(3) -> adjusted [0],[1],[1] -> ml=1
    assert greedy_sloppy_freq_lists([[0], [1], [1]], 2) == 0.5


def test_ltr_rescore(spark, mini_tok):
    from lucene_solr_spark.operators.search_features import ltr_linear_rescore

    tf = (
        mini_tok.filter(F.col("term") == "fox")
        .groupBy("doc_id")
        .agg(F.count("*").alias("tf_fox"))
    )
    out = ltr_linear_rescore(
        tf, features={}, weights={"tf_fox": 1.5}, k=2
    ).collect()
    assert out[0]["doc_id"] == 3 and out[0]["ltr_score"] == 3.0
    assert out[1]["doc_id"] == 0 and out[1]["ltr_score"] == 1.5


def test_token_filter_library():
    from lucene_solr_spark.analysis import (
        ascii_fold,
        char_ngrams,
        edge_ngrams,
        shingles,
    )

    assert shingles(["quick", "brown", "fox"], 2) == ["quick brown", "brown fox"]
    assert shingles(["solo"], 2) == []
    assert char_ngrams("index", 3) == ["ind", "nde", "dex"]
    assert edge_ngrams("search", 2, 4) == ["se", "sea", "sear"]
    assert ascii_fold("café straße naïve œuvre") == "cafe strasse naive oeuvre"


def test_analyze_with_offsets_golden():
    """Offsets reference the ORIGINAL surface form: possessive strip and
    Porter stemming change the term, never the (start, end) span."""
    from lucene_solr_spark.analysis import analyze_with_offsets

    text = "The engine's engines are engineered well."
    rows = analyze_with_offsets(text)
    # (term, pos, start, end); 'The'/'are' are stopword holes
    assert rows == [
        ("engin", 1, 4, 12),
        ("engin", 2, 13, 20),
        ("engin", 4, 25, 35),
        ("well", 5, 36, 40),
    ]
    # every span slices the source back to the surface form the term came from
    assert [text[s:e] for _, _, s, e in rows] == [
        "engine's",
        "engines",
        "engineered",
        "well",
    ]


def test_highlight_unified_offset_faithful(spark):
    """Stemming/possessives shift the term away from the surface form, yet
    the snippet reproduces the source bytes (punctuation intact) with tags
    at original offsets — the UnifiedHighlighter contract."""
    from lucene_solr_spark.operators.search_features import highlight_unified

    df = spark.createDataFrame(
        [
            (1, "The engine's engines are engineered well."),
            (2, "Nothing relevant here at all."),
            (3, "A search engine indexes the web; engines crawl pages."),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["snippet"]
        for r in highlight_unified(
            df, "doc_id", "text", "engine", window=8
        ).collect()
    }
    assert 2 not in out  # no analyzed match -> no snippet row
    assert (
        out[1] == "<em>engine's</em> <em>engines</em> are <em>engineered</em> well"
    )
    # source bytes between matches are verbatim (the ';' survives);
    # window=8 spans token positions 0-7, so 'pages' (pos 8) is outside
    assert out[3] == (
        "search <em>engine</em> indexes the web; <em>engines</em> crawl"
    )


def test_highlight_unified_best_window_and_empty(spark):
    from lucene_solr_spark.operators.search_features import highlight_unified

    # two windows; the second has 2 hits -> higher passage score wins
    text = (
        "alpha beta gamma delta epsilon zeta eta theta "
        "iota engine kappa engines lambda mu nu xi"
    )
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = highlight_unified(df, "doc_id", "text", "engine", window=8).collect()
    assert len(out) == 1
    assert out[0]["snippet"] == (
        "iota <em>engine</em> kappa <em>engines</em> lambda mu nu xi"
    )
    # stopword-only query -> empty result, not an error
    empty = highlight_unified(df, "doc_id", "text", "the and", window=8)
    assert empty.count() == 0


def test_ltr_trees_rescore_golden(spark):
    """MultipleAdditiveTreesModel evaluator: hand-built 2-tree ensemble,
    scores verified against manual evaluation (Solr branching rule:
    feature <= threshold -> left)."""
    from lucene_solr_spark.operators.search_features import ltr_trees_rescore

    df = spark.createDataFrame(
        [(1, 5.0, 0.2), (2, 1.0, 0.9), (3, 9.0, 0.5), (4, 3.0, 0.1)],
        "doc_id long, tf double, ratio double",
    )
    trees = [
        {
            "weight": 2.0,
            "root": {
                "feature": "tf",
                "threshold": 4.0,
                "left": {"value": 0.1},
                "right": {
                    "feature": "ratio",
                    "threshold": 0.3,
                    "left": {"value": 0.5},
                    "right": {"value": 0.9},
                },
            },
        },
        {"weight": 0.5, "root": {"value": 1.0}},
    ]
    out = {
        r["doc_id"]: r["ltr_score"]
        for r in ltr_trees_rescore(
            df, {"tf": F.col("tf"), "ratio": F.col("ratio")}, trees, k=10
        ).collect()
    }
    # doc1: tf=5>4, ratio=0.2<=0.3 -> 0.5*2 + 0.5 = 1.5
    # doc2: tf=1<=4 -> 0.1*2 + 0.5 = 0.7
    # doc3: tf=9>4, ratio=0.5>0.3 -> 0.9*2 + 0.5 = 2.3
    # doc4: tf=3<=4 -> 0.7
    assert out == pytest.approx({1: 1.5, 2: 0.7, 3: 2.3, 4: 0.7})


def test_ltr_gbt_differential(spark):
    """Train a spark.ml GBTRegressor, convert via gbt_to_ltr_trees, and
    check the CASE-WHEN ensemble evaluator reproduces spark.ml's own
    transform() predictions exactly."""
    mlpytest = pytest.importorskip("pyspark.ml")
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import GBTRegressor

    from lucene_solr_spark.operators.search_features import (
        gbt_to_ltr_trees,
        ltr_trees_rescore,
    )

    rows = [
        (i, float(i % 7), float((i * 3) % 5) / 5.0,
         float(i % 7) * 0.8 - float((i * 3) % 5) * 0.3 + (0.1 if i % 2 else -0.1))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, f1 double, f2 double, label double")
    assembler = VectorAssembler(inputCols=["f1", "f2"], outputCol="fv")
    train = assembler.transform(df)
    model = GBTRegressor(
        featuresCol="fv", labelCol="label", maxIter=5, maxDepth=3, seed=7
    ).fit(train)
    expected = {
        r["doc_id"]: r["prediction"] for r in model.transform(train).collect()
    }
    model._ltr_feature_names = ["f1", "f2"]
    trees = gbt_to_ltr_trees(model)
    got = {
        r["doc_id"]: r["ltr_score"]
        for r in ltr_trees_rescore(
            df, {"f1": F.col("f1"), "f2": F.col("f2")}, trees, k=100
        ).collect()
    }
    assert set(got) == set(expected)
    for d in expected:
        assert got[d] == pytest.approx(expected[d], abs=1e-9), d


# ---------------------------------------------------------------------------
# PageRank (operators/graph.py)
# ---------------------------------------------------------------------------

def test_pagerank_uniform_on_cycle(spark):
    """On a directed cycle every node has one in/out edge -> PageRank is
    exactly uniform at every iteration."""
    from lucene_solr_spark.operators.graph import pagerank

    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a")], ["src", "dst"]
    )
    rows = pagerank(e, "src", "dst", iters=5).collect()
    assert {r["pagerank"] for r in rows} == {round(1 / 3, 6)}


def test_pagerank_mass_conserved_without_sinks(spark):
    """No dangling nodes -> total mass stays 1 after any iteration count."""
    from lucene_solr_spark.operators.graph import pagerank

    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("c", "b")],
        ["src", "dst"],
    )
    rows = pagerank(e, "src", "dst", iters=4).collect()
    assert abs(sum(r["pagerank"] for r in rows) - 1.0) < 1e-4


def test_pagerank_hub_outranks_leaf(spark):
    """Star pointing at a hub: the hub must outrank every spoke."""
    from lucene_solr_spark.operators.graph import pagerank

    e = spark.createDataFrame(
        [("s1", "hub"), ("s2", "hub"), ("s3", "hub"), ("hub", "s1")],
        ["src", "dst"],
    )
    pr = {r["node"]: r["pagerank"] for r in pagerank(e, "src", "dst").collect()}
    assert pr["hub"] > pr["s2"] and pr["hub"] > pr["s3"]


# ---------------------------------------------------------------------------
# Monitor / percolator (operators/monitor.py)
# ---------------------------------------------------------------------------

def _tok(spark, rows):
    import pyspark.sql.functions as F
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return df.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "term")
    ).select("doc_id", "term", (F.col("pos0") + 1).alias("pos"))


def test_monitor_any_all_phrase_semantics(spark):
    from lucene_solr_spark.operators.monitor import monitor_match

    tok = _tok(spark, [
        (1, "alpha beta gamma"),
        (2, "beta delta"),
        (3, "gamma alpha beta"),   # phrase 'alpha beta' adjacent here
        (4, "alpha gamma beta"),   # all three terms, phrase NOT adjacent
    ])
    queries = spark.createDataFrame(
        [
            (10, "any", ["delta"]),
            (11, "all", ["alpha", "beta"]),
            (12, "phrase", ["alpha", "beta"]),
            (13, "all", ["alpha", "zzz"]),
        ],
        "query_id long, qtype string, terms array<string>",
    )
    got = {(r["doc_id"], r["query_id"])
           for r in monitor_match(tok, queries).collect()}
    assert got == {
        (2, 10),                   # any: delta only in doc 2
        (1, 11), (3, 11), (4, 11), # all alpha+beta
        (1, 12), (3, 12),          # phrase adjacency (doc 4 excluded)
    }


def test_monitor_phrase_repeated_term(spark):
    from lucene_solr_spark.operators.monitor import monitor_match

    tok = _tok(spark, [(1, "x table table y"), (2, "table x table")])
    queries = spark.createDataFrame(
        [(1, "phrase", ["table", "table"])],
        "query_id long, qtype string, terms array<string>",
    )
    got = {(r["doc_id"], r["query_id"])
           for r in monitor_match(tok, queries).collect()}
    assert got == {(1, 1)}
