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
    # doc3 pairs: (1,3) ml=1 w=0.5 ; (5,3) ml=|3-5-1|=3 >1 excluded... wait
    # ml = |pb - pa - 1| = |3 - 5 - 1| = 3 -> excluded; so 0.5
    assert sf == {3: 0.5}


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
