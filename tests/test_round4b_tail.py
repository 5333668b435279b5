"""Round-4 tail tranche: SimpleQueryParser grammar (never-raise contract,
operator surface) and the math-evaluator long tail III (freqTable, rank
transform with averaged ties, normalizeSum, empirical CDF) against pandas
closed forms."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from lucene_solr_spark.query import (
    Boolean,
    Fuzzy,
    MatchAll,
    Phrase,
    Prefix,
    Term,
)
from lucene_solr_spark.query_parser import parse_simple


# ---------------------------------------------------------------------------
# SimpleQueryParser grammar (SimpleQueryParser.java semantics)
# ---------------------------------------------------------------------------


class TestParseSimple:
    def test_default_and(self):
        q = parse_simple("foo bar", profile="simple")
        assert isinstance(q, Boolean)
        assert [c.term for c in q.must] == ["foo", "bar"]
        assert not q.should and not q.must_not

    def test_or_default_operator(self):
        q = parse_simple("foo bar", profile="simple", default_op="OR")
        assert [c.term for c in q.should] == ["foo", "bar"]
        assert not q.must

    def test_pipe_or(self):
        q = parse_simple("a | b | c", profile="simple")
        assert [c.term for c in q.should] == ["a", "b", "c"]

    def test_not_clause(self):
        q = parse_simple("foo -bar", profile="simple")
        assert [c.term for c in q.must] == ["foo"]
        assert [c.term for c in q.must_not] == ["bar"]

    def test_not_only_gets_matchall(self):
        q = parse_simple("-foo", profile="simple")
        assert isinstance(q.must[0], MatchAll)
        assert q.must_not[0].term == "foo"

    def test_phrase_with_near_slop(self):
        q = parse_simple('"a b"~2', profile="simple")
        assert isinstance(q, Phrase) and q.terms == ("a", "b") and q.slop == 2

    def test_trailing_star_prefix(self):
        q = parse_simple("te*", profile="simple")
        assert isinstance(q, Prefix) and q.prefix == "te"

    def test_fuzzy_suffix(self):
        assert parse_simple("term~1", profile="simple") == Fuzzy("term", 1)
        assert parse_simple("term~", profile="simple") == Fuzzy("term", 2)
        # ~0 means exact (FuzzyQuery maxEdits=0 degenerates to TermQuery)
        assert parse_simple("term~0", profile="simple") == Term("term")

    def test_grouping_precedence(self):
        q = parse_simple("dup (a | b)", profile="simple")
        assert q.must[0] == Term("dup")
        inner = q.must[1]
        assert [c.term for c in inner.should] == ["a", "b"]

    def test_entry_query_shape(self):
        q = parse_simple(
            'dup window* | vector -"merge join"', profile="simple"
        )
        b1, b2 = q.should
        assert b1.must == [Term("dup"), Prefix("window")]
        assert b2.must == [Term("vector")]
        assert b2.must_not == [Phrase(("merge", "join"))]

    # -- the never-raise degradation contract ------------------------------
    def test_unbalanced_quote_consumes_to_end(self):
        q = parse_simple('"unbalanced quote body', profile="simple")
        assert isinstance(q, Phrase) and q.terms[0] == "unbalanced"

    def test_unbalanced_paren_parses_to_end(self):
        q = parse_simple("(foo bar", profile="simple")
        assert [c.term for c in q.must] == ["foo", "bar"]

    def test_dangling_operator_dropped(self):
        assert parse_simple("foo |", profile="simple") == Term("foo")

    def test_empty_and_garbage_never_raise(self):
        assert parse_simple("", profile="simple") == MatchAll()
        for junk in (")", "|", "~", "- ", "(((", '"""', "a |) b"):
            parse_simple(junk, profile="simple")  # must not raise

    def test_midword_hyphen_is_literal(self):
        q = parse_simple("well-known", profile="simple")
        # the analyzer splits the hyphenated token; no NOT clause appears
        assert not getattr(q, "must_not", [])


# ---------------------------------------------------------------------------
# Math-evaluator long tail III
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def values_df(spark):
    rng = np.random.RandomState(11)
    vals = rng.randint(1, 8, size=200)
    return (
        spark.createDataFrame(
            [(int(i), int(v)) for i, v in enumerate(vals)], ["idx", "val"]
        ),
        vals,
    )


def test_freq_table_matches_pandas(spark, values_df):
    from lucene_solr_spark.operators.matheval import freq_table_stream

    df, vals = values_df
    out = freq_table_stream(df, "val").toPandas()
    s = pd.Series(vals).value_counts().sort_index()
    assert list(out["value"]) == list(s.index)
    assert list(out["cnt"]) == list(s.values)
    cum = s.cumsum()
    assert list(out["cum_freq"]) == list(cum.values)
    np.testing.assert_allclose(
        out["pct"], s.values / len(vals), atol=1e-6
    )
    np.testing.assert_allclose(
        out["cum_pct"], cum.values / len(vals), atol=1e-6
    )


def test_rank_transform_averages_ties(spark, values_df):
    from lucene_solr_spark.operators.matheval import rank_transform_stream

    df, vals = values_df
    out = (
        rank_transform_stream(df, "idx", "val")
        .toPandas()
        .set_index("idx")["rank"]
        .sort_index()
    )
    expected = pd.Series(vals).rank(method="average")
    np.testing.assert_allclose(out.values, expected.values, atol=1e-9)


def test_normalize_sum_is_probability_vector(spark, values_df):
    from pyspark.sql import functions as F

    from lucene_solr_spark.operators.matheval import normalize_sum_stream

    df, vals = values_df
    counts = df.groupBy("val").agg(F.count("*").alias("cnt"))
    out = normalize_sum_stream(counts, "val", "cnt").toPandas()
    assert out["p"].sum() == pytest.approx(1.0, abs=1e-5)
    s = pd.Series(vals).value_counts().sort_index()
    np.testing.assert_allclose(
        out.sort_values("val")["p"].values, s.values / len(vals), atol=1e-6
    )


def test_empirical_cdf_matches_fraction(spark, values_df):
    from lucene_solr_spark.operators.matheval import empirical_cdf_stream

    df, vals = values_df
    probes = [2.0, 4.5, 7.0]
    out = (
        empirical_cdf_stream(df, "val", probes)
        .toPandas()
        .set_index("probe")["cdf"]
    )
    for p in probes:
        assert out[p] == pytest.approx((vals <= p).mean(), abs=1e-6)


def test_ols2_matches_numpy_lstsq(spark):
    from lucene_solr_spark.operators.matheval import ols2_stream

    rng = np.random.RandomState(3)
    x1 = rng.uniform(0, 10, 150)
    x2 = rng.uniform(-5, 5, 150)
    y = 4.0 + 2.5 * x1 - 1.25 * x2 + rng.normal(0, 0.5, 150)
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(y, x1, x2)],
        ["y", "x1", "x2"],
    )
    row = ols2_stream(df, "y", "x1", "x2").first()
    X = np.column_stack([np.ones_like(x1), x1, x2])
    beta, res, _, _ = np.linalg.lstsq(X, y, rcond=None)
    assert row["b0"] == pytest.approx(beta[0], abs=1e-4)
    assert row["b1"] == pytest.approx(beta[1], abs=1e-4)
    assert row["b2"] == pytest.approx(beta[2], abs=1e-4)
    sst = ((y - y.mean()) ** 2).sum()
    assert row["r2"] == pytest.approx(1.0 - res[0] / sst, abs=1e-5)


def test_stats_cardinality_hll_bound(spark):
    """approx_count_distinct (HLL++) lands within 3*rsd of the exact
    distinct count — the statsComponent cardinality accuracy contract."""
    from pyspark.sql import functions as F

    from lucene_solr_spark.operators.facets import stats_cardinality

    o = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    row = stats_cardinality(o, "o_custkey", rsd=0.02).first()
    exact = o.select(F.count_distinct("o_custkey")).first()[0]
    assert abs(row["approx_distinct"] - exact) <= max(1, 3 * 0.02 * exact)
    assert row["n_rows"] == o.count()


def test_percentiles_approx_close_to_exact(spark):
    """Sketch percentiles land within 1% relative error of the exact
    interpolated quantiles at default accuracy."""
    from pyspark.sql import functions as F

    from lucene_solr_spark.operators.facets import percentiles_approx

    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    row = percentiles_approx(li, "l_extendedprice", [0.25, 0.5, 0.9]).first()
    exact = li.agg(
        F.expr("percentile(l_extendedprice, array(0.25, 0.5, 0.9))")
    ).first()[0]
    for got, want in zip([row["ap25"], row["ap50"], row["ap90"]], exact):
        assert abs(got - want) / want < 0.01


def test_analyze_stages_compose():
    """Each stage's output is the next stage's input; the last stage
    equals the real index chain (analyze_en)."""
    from lucene_solr_spark.analysis import analyze_en, analyze_stages

    text = "The Engineers' testing queries ran smoothly"
    rows = analyze_stages(text)
    by = {}
    for st, p, t in rows:
        by.setdefault(st, []).append((p, t))
    # stop output is a subset of lowercase output at identical positions
    low = dict(by["2_lowercase_possessive"])
    for p, t in by["3_stop"]:
        assert low[p] == t
    # porter stage preserves stop-stage positions exactly
    assert [p for p, _ in by["4_porter"]] == [p for p, _ in by["3_stop"]]
    # final stage == the index chain
    assert [(t, p) for p, t in by["4_porter"]] == analyze_en(text)


def test_fuzzy_kmeans_matches_numpy_reference(spark):
    """8 rounds of the Spark fuzzy c-means == a numpy reference with the
    same init (lowest-id points), fuzzifier, and round count."""
    from lucene_solr_spark.operators.ml import fuzzy_kmeans_embeddings

    rng = np.random.RandomState(5)
    blobs = np.vstack([
        rng.normal(0.0, 0.3, (20, 4)),
        rng.normal(3.0, 0.3, (20, 4)),
        rng.normal(-3.0, 0.3, (20, 4)),
    ])
    df = spark.createDataFrame(
        [(int(i), [float(v) for v in blobs[i]]) for i in range(len(blobs))],
        ["doc_id", "embedding"],
    )
    out = (
        fuzzy_kmeans_embeddings(df, "doc_id", "embedding", k=3, m=2.0, iters=8)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )

    # numpy reference
    k, m, x = 3, 2.0, blobs
    centers = x[:k].copy()
    for _ in range(8):
        d2 = ((x[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
        d2 = np.maximum(d2, 1e-300)
        u = np.zeros((len(x), k))
        for j in range(k):
            u[:, j] = 1.0 / (
                (d2[:, j, None] / d2) ** (1.0 / (m - 1.0))
            ).sum(-1)
        w = u ** m
        centers = (w.T @ x) / w.sum(0)[:, None]
    d2 = ((x[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
    d2 = np.maximum(d2, 1e-300)
    u = np.zeros((len(x), k))
    for j in range(k):
        u[:, j] = 1.0 / ((d2[:, j, None] / d2) ** (1.0 / (m - 1.0))).sum(-1)
    ref_cluster = u.argmax(1)
    ref_membership = u.max(1)

    assert list(out["cluster"]) == list(ref_cluster)
    np.testing.assert_allclose(
        out["membership"], np.round(ref_membership, 4), atol=2e-4
    )
    # blob points should be confidently clustered together
    assert len(set(out["cluster"][:20])) == 1
    assert (out["membership"][:20] > 0.9).all()
