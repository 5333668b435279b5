"""Web-corpus prep (URL canonicalization/dedup) + decontamination +
repeated-span detection + infix suggester."""

from __future__ import annotations

from pyspark.sql import functions as F


def _canon(spark, url: str) -> str:
    from lucene_solr_spark.pipeline.webprep import canonicalize_url

    df = spark.createDataFrame([(url,)], "url string")
    return canonicalize_url(df).first()["canonical_url"]


def test_canonicalize_rules(spark):
    # fragment dropped, scheme+host lowercased, www stripped, default port
    # stripped, tracking params dropped, params sorted, trailing slash cut
    assert (
        _canon(spark, "HTTPS://WWW.Example.COM:443/A/b/?z=1&utm_source=t&a=2#x")
        == "https://example.com/A/b?a=2&z=1"
    )
    # non-default port kept; path case preserved
    assert (
        _canon(spark, "http://Host.example.com:8080/Path")
        == "http://host.example.com:8080/Path"
    )
    # http:80 is default; empty path becomes "/"
    assert _canon(spark, "http://example.com:80") == "http://example.com/"
    # https with :80 is NOT default -> kept
    assert _canon(spark, "https://example.com:80/") == "https://example.com:80/"
    # all params tracking -> no query part; fbclid/gclid/msclkid covered
    assert (
        _canon(spark, "http://a.com/p?utm_medium=m&fbclid=1&gclid=2&msclkid=3")
        == "http://a.com/p"
    )


def test_url_dedup_keeps_earliest(spark):
    from lucene_solr_spark.pipeline.webprep import url_dedup

    rows = [
        (1, "http://A.com/x?b=1&a=1"),
        (2, "HTTP://a.com:80/x/?a=1&b=1#f"),  # same canonical as doc 1
        (3, "http://a.com/y"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = url_dedup(df)
    kept = sorted(r["doc_id"] for r in out.collect())
    assert kept == [1, 3]


def test_host_stats_counts_dups(spark):
    from lucene_solr_spark.pipeline.webprep import host_stats

    rows = [
        (1, "http://www.a.com/x"),
        (2, "http://A.com/x#frag"),  # dup of 1 after canonicalization
        (3, "http://a.com/y"),
        (4, "http://b.com/z"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r["host"]: r for r in host_stats(df).collect()}
    assert out["a.com"]["pages"] == 3
    assert out["a.com"]["distinct_urls"] == 2
    assert out["a.com"]["dup_pages"] == 1
    assert out["b.com"]["dup_pages"] == 0


def _mkdocs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_contamination_and_decontaminate(spark):
    from lucene_solr_spark.pipeline.decontam import (
        contamination_report,
        decontaminate,
    )

    bench = _mkdocs(spark, ["the quick brown fox jumps over the lazy dog"])
    corpus = _mkdocs(
        spark,
        [
            "intro text the quick brown fox jumps here now",  # shares a 5-gram
            "completely different words with no overlap at all",
        ],
    )
    rep = contamination_report(corpus, bench, n=5).collect()
    assert [r["doc_id"] for r in rep] == [0]
    assert rep[0]["contaminated_grams"] == 1  # "the quick brown fox jumps"
    clean = decontaminate(corpus, bench, n=5)
    assert [r["doc_id"] for r in clean.collect()] == [1]


def test_duplicate_window_stats_and_fraction(spark):
    from lucene_solr_spark.pipeline.decontam import (
        duplicate_window_fraction,
        duplicate_window_stats,
    )

    span = "one two three four five six seven eight"  # exactly 8 tokens
    docs = _mkdocs(
        spark,
        [
            f"{span} tail a b",
            f"head x {span}",
            "totally unrelated tokens nine ten eleven twelve thirteen fourteen",
        ],
    )
    stats = duplicate_window_stats(docs, k=8).first()
    assert stats["dup_windows"] == 1  # only the shared span
    assert stats["max_df"] == 2
    assert stats["docs_with_dup_span"] == 2

    frac = {r["doc_id"]: r for r in duplicate_window_fraction(docs, k=8).collect()}
    assert frac[2]["dup_windows"] == 0
    # doc 0 has 11 tokens -> 4 windows of 8, one of them the shared span
    assert frac[0]["dup_windows"] == 1 and frac[0]["windows"] == 4
    assert abs(frac[0]["dup_frac"] - 0.25) < 1e-9


def test_suggest_infix_matches_any_token_prefix(spark):
    from lucene_solr_spark.operators.search_features import suggest_infix

    rows = [
        ("corpus speed test", 10),
        ("Speedy delivery", 30),
        ("no match here", 99),
        ("test spee", 5),
    ]
    df = spark.createDataFrame(rows, "suggestion string, weight long")
    got = suggest_infix(df, "spee", k=10).collect()
    assert [r["suggestion"] for r in got] == [
        "Speedy delivery",  # weight 30, case-insensitive
        "corpus speed test",  # weight 10
        "test spee",  # weight 5, infix token equal to typed
    ]


def test_semantic_contamination_brute_vs_lsh_gate(spark):
    """The brute/ANN crossover (round-4 VERDICT item 8): below
    max_brute_cells the broadcast nested loop runs; above it the
    hyperplane-LSH gated path activates (CAP_METRICS records which), and
    planted near-duplicates are still flagged."""
    import numpy as np

    from lucene_solr_spark.pipeline.decontam import semantic_contamination
    from lucene_solr_spark.pipeline.metrics import CAP_METRICS

    rng = np.random.default_rng(0)
    dim = 16
    ev_rows = [(i, [float(x) for x in rng.normal(size=dim)]) for i in range(8)]
    # corpus: 3 planted near-dups of eval vectors (tiny noise) + 20 random
    corpus_rows = [
        (100 + i, [float(x + 1e-4) for x in ev_rows[i][1]]) for i in range(3)
    ] + [(200 + i, [float(x) for x in rng.normal(size=dim)]) for i in range(20)]
    ev = spark.createDataFrame(ev_rows, "vec_id long, embedding array<double>")
    corpus = spark.createDataFrame(
        corpus_rows, "vec_id long, embedding array<double>"
    )

    brute = semantic_contamination(corpus, ev, threshold=0.95)
    assert CAP_METRICS["semantic_contamination.path"]["path"] == "brute"
    b_flag = {r["vec_id"] for r in brute.collect() if r["contaminated"]}
    assert {100, 101, 102} <= b_flag

    gated = semantic_contamination(
        corpus, ev, threshold=0.95, max_brute_cells=10, n_planes=3
    )
    assert CAP_METRICS["semantic_contamination.path"]["path"] == "lsh"
    rows = {r["vec_id"]: r for r in gated.collect()}
    assert len(rows) == corpus.count()  # no-candidate rows keep their row
    g_flag = {i for i, r in rows.items() if r["contaminated"]}
    assert {100, 101, 102} <= g_flag  # planted dups collide in probed buckets
