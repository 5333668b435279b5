"""FeatureField scoring functions + SpanMultiTermQueryWrapper +
PhraseWildcardQuery unit semantics."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.functions.valuesources import (
    feature_log,
    feature_saturation,
    feature_sigmoid,
)
from lucene_solr_spark.operators.spans import span_multiterm_near, span_near


def test_feature_functions_closed_forms(spark):
    df = spark.createDataFrame([(100.0,), (280.0,), (0.0,)], ["f"])
    rows = df.select(
        feature_saturation(F.col("f"), 280.0, 2.0).alias("sat"),
        feature_log(F.col("f"), 1.0, 1.0).alias("lg"),
        feature_sigmoid(F.col("f"), 280.0, 2.0, 1.0).alias("sig"),
    ).collect()
    f0 = rows[0]
    assert f0["sat"] == pytest.approx(2.0 * 100 / 380)
    assert f0["lg"] == pytest.approx(math.log(101.0))
    assert f0["sig"] == pytest.approx(100**2 / (100**2 + 280**2))
    # pivot point: saturation = w/2, sigmoid = 1/2
    assert rows[1]["sat"] == pytest.approx(1.0)
    assert rows[1]["sig"] == pytest.approx(0.5)
    assert rows[2]["sat"] == 0.0 and rows[2]["sig"] == 0.0


def test_span_multiterm_near_equals_union_of_exact(spark):
    rows = []
    text = "merge sort then merge scan then merge other".split()
    for pos, term in enumerate(text):
        rows.append((1, term, pos + 1))
    tok = spark.createDataFrame(rows, ["doc_id", "term", "pos"])
    multi = span_multiterm_near(tok, "merge", ["sort", "scan"], 0).collect()
    a = span_near(tok, "merge", "sort", 0).collect()
    b = span_near(tok, "merge", "scan", 0).collect()
    total = sum(r["n_matches"] for r in a) + sum(r["n_matches"] for r in b)
    assert multi and multi[0]["n_matches"] == total == 2


def test_phrase_wildcard_too_many_and_empty(spark, tmp_path_factory):
    from lucene_solr_spark.fixtures import write_pages
    from lucene_solr_spark.indexer import build_index, read_index
    from lucene_solr_spark.query import Prefix
    from lucene_solr_spark.search import Searcher, TooManyClauses

    out = str(tmp_path_factory.mktemp("pw") / "pages.parquet")
    write_pages(0.0002, out)
    idx = str(tmp_path_factory.mktemp("pw") / "idx")
    build_index(
        spark,
        spark.read.parquet(out).select("url", "text", "lang"),
        idx,
        profile="simple",
        num_buckets=4,
        quantize=False,
    )
    s = Searcher(read_index(spark, idx))
    # empty expansion -> empty result, not an error
    assert s.phrase_wildcard(["fast", Prefix("zzzqx")], 5).count() == 0
    import lucene_solr_spark.search as S

    old = S.MAX_CLAUSE_COUNT
    try:
        S.MAX_CLAUSE_COUNT = 1
        with pytest.raises(TooManyClauses):
            s.phrase_wildcard(["fast", Prefix("s")], 5)
    finally:
        S.MAX_CLAUSE_COUNT = old
    # a real match scores > 0
    top = s.phrase_wildcard(["the", Prefix("s")], 5).collect()
    assert all(r["score"] > 0 for r in top)


def test_leading_wildcard_reversed_matches_rlike(spark, tmp_path_factory):
    from lucene_solr_spark.fixtures import write_pages
    from lucene_solr_spark.indexer import build_index, read_index
    from lucene_solr_spark.search import Searcher

    out = str(tmp_path_factory.mktemp("lw") / "pages.parquet")
    write_pages(0.0002, out)
    idx = str(tmp_path_factory.mktemp("lw") / "idx")
    build_index(
        spark,
        spark.read.parquet(out).select("url", "text", "lang"),
        idx,
        profile="simple",
        num_buckets=4,
        quantize=False,
    )
    s = Searcher(read_index(spark, idx))
    rev = sorted(
        r["term"] for r in s.leading_wildcard_terms("*st").collect()
    )
    scan = sorted(
        r["term"]
        for r in s.term_stats.filter(
            __import__("pyspark.sql.functions", fromlist=["col"])
            .col("term")
            .rlike("^.*st$")
        ).collect()
    )
    assert rev == scan and rev
    import pytest as _pt

    with _pt.raises(ValueError):
        s.leading_wildcard_terms("foo*")
    with _pt.raises(ValueError):
        s.leading_wildcard_terms("*f?o")


def test_boilerplate_template_ngrams_detects_planted_phrase(spark):
    from lucene_solr_spark.pipeline.webprep import detect_template_ngrams

    rows = []
    for i in range(10):
        body = f"unique{i} words here differ{i}"
        # the template phrase appears in 8/10 docs of site A
        text = ("copyright acme corp " + body) if i < 8 else body
        rows.append(("siteA", i, text))
    for i in range(10):
        rows.append(("siteB", 100 + i, f"other{i} text entirely{i}"))
    df = spark.createDataFrame(rows, ["source", "doc_id", "text"])
    out = detect_template_ngrams(df, n=2, min_frac=0.5).collect()
    found = {(r["source"], r["shingle"]) for r in out}
    assert ("siteA", "copyright acme") in found
    assert ("siteA", "acme corp") in found
    assert all(src == "siteA" for src, _ in found)
    fr = {r["shingle"]: r["doc_frac"] for r in out}
    assert fr["copyright acme"] == 0.8


def test_rrf_fuse_formula(spark):
    from lucene_solr_spark.operators.search_features import rrf_fuse

    a = spark.createDataFrame([(1, 1), (2, 2)], ["doc_id", "rank"])
    b = spark.createDataFrame([(2, 1), (3, 2)], ["doc_id", "rank"])
    out = {r["doc_id"]: r["rrf"] for r in rrf_fuse([a, b], k0=60, k=10).collect()}
    assert out[2] == pytest.approx(1 / 61 + 1 / 62, abs=1e-6)
    assert out[1] == pytest.approx(1 / 61, abs=1e-6)
    assert out[3] == pytest.approx(1 / 62, abs=1e-6)
    # doc 2 (in both lists) outranks either single-list doc
    assert out[2] > out[1] > out[3]


def test_temperature_mix_rates():
    from lucene_solr_spark.pipeline.sampling import temperature_mix_rates

    counts = {"en": 800, "fr": 100, "de": 100}
    # alpha=1: proportional — every rate equals target/total
    r1 = temperature_mix_rates(counts, 1.0, 500)
    for v in r1.values():
        assert v == pytest.approx(0.5)
    # alpha=0: uniform over sources — tail upsampled to cap, head cut
    r0 = temperature_mix_rates(counts, 0.0, 300)
    assert r0["fr"] == pytest.approx(1.0)  # 100 wanted, capped at all
    assert r0["en"] == pytest.approx(100 / 800)
    # alpha=0.5 sits between
    rh = temperature_mix_rates(counts, 0.5, 300)
    assert r0["en"] < rh["en"] < r1["en"]
    assert rh["fr"] > rh["en"]


def test_remove_template_ngrams_strips_planted_phrase(spark):
    from lucene_solr_spark.pipeline.webprep import (
        detect_template_ngrams,
        remove_template_ngrams,
    )

    rows = []
    for i in range(10):
        body = f"unique{i} words here differ{i}"
        text = ("copyright acme corp " + body) if i < 8 else body
        rows.append(("siteA", i, text))
    df = spark.createDataFrame(rows, ["source", "doc_id", "text"])
    tmpl = detect_template_ngrams(df, n=2, min_frac=0.5)
    out = {r["doc_id"]: r for r in remove_template_ngrams(df, tmpl, n=2).collect()}
    # flagged templates: "copyright acme", "acme corp" (8/10 docs) AND
    # "words here" (all 10 docs — the body itself plants a template)
    for i in range(8):
        assert out[i]["cleaned_text"] == f"unique{i} differ{i}"
        assert out[i]["n_removed"] == 5  # copyright acme corp, words here
    for i in range(8, 10):
        assert out[i]["cleaned_text"] == f"unique{i} differ{i}"
        assert out[i]["n_removed"] == 2  # words here
