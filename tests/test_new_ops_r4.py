"""Round-4 breadth operators: span containment algebra, WordBreak
spellchecker, BlendedInfix position blending, CommonGrams, PathHierarchy.

The driver's DuckDB oracle harness covers value parity on the sf corpus;
these tests pin the SEMANTICS on adversarial micro-corpora (one big span
containing two littles, floor of the blend coefficient, skip param, ...)
that the synthetic corpus may never exercise.
"""

from __future__ import annotations

import pytest


def _tok_df(spark, docs: dict[int, str]):
    from pyspark.sql import functions as F

    rows = [(i, t) for i, t in docs.items()]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "term")
    ).select("doc_id", "term", (F.col("pos0") + 1).alias("pos"))


class TestSpanContainment:
    def test_big_span_emitted_once_despite_two_littles(self, spark):
        # big = near(a, b, slop 9); doc 1 has ONE big span [1,5] holding
        # TWO littles -> containing counts the big span once.
        from lucene_solr_spark.operators.spans import span_containing

        tok = _tok_df(spark, {1: "a x lit lit b", 2: "a b lit", 3: "lit a b"})
        out = span_containing(tok, ("a", "b", 9), "lit").collect()
        got = {r["doc_id"]: r["n_spans"] for r in out}
        # doc 2/3: little outside [start, end] of the only big span
        assert got == {1: 1}

    def test_within_counts_each_little_once_under_two_bigs(self, spark):
        # two overlapping big spans both containing the same little:
        # within emits the little ONCE (distinct little spans).
        from lucene_solr_spark.operators.spans import span_within

        tok = _tok_df(spark, {1: "a a lit b b"})
        # bigs: (1,4) (1,5) (2,4) (2,5); little at 3 inside all four
        out = span_within(tok, ("a", "b", 9), "lit").collect()
        assert {r["doc_id"]: r["n_spans"] for r in out} == {1: 1}

    def test_within_multiple_littles(self, spark):
        from lucene_solr_spark.operators.spans import span_within

        tok = _tok_df(spark, {1: "a lit lit b lit"})
        # little at 2 and 3 are inside [1,4]; little at 5 is outside
        out = span_within(tok, ("a", "b", 9), "lit").collect()
        assert {r["doc_id"]: r["n_spans"] for r in out} == {1: 2}


class TestWordBreak:
    def test_split_found_and_ranked_by_combined_df(self, spark):
        from lucene_solr_spark.operators.search_features import (
            word_break_suggest,
        )

        tok = _tok_df(
            spark,
            {1: "fast scan", 2: "fast scan", 3: "fasts can", 4: "fast join"},
        )
        out = word_break_suggest(tok, "fastscan").collect()
        rows = [(r["left"], r["right"], r["combined_df"]) for r in out]
        # fast(3)+scan(2)=5 beats fasts(1)+can(1)=2
        assert rows == [("fast", "scan", 5), ("fasts", "can", 2)]

    def test_min_break_length_excludes_short_halves(self, spark):
        from lucene_solr_spark.operators.search_features import (
            word_break_suggest,
        )

        tok = _tok_df(spark, {1: "a bc abc"})
        out = word_break_suggest(
            tok, "abc", min_break_length=2
        ).collect()
        assert out == []  # only split a|bc exists and 'a' is too short

    def test_empty_input_returns_empty(self, spark):
        from lucene_solr_spark.operators.search_features import (
            word_break_suggest,
        )

        tok = _tok_df(spark, {1: "x y"})
        assert word_break_suggest(tok, "xy").collect() == []

    def test_combinations(self, spark):
        from lucene_solr_spark.operators.search_features import (
            word_combine_suggest,
        )

        tok = _tok_df(
            spark, {1: "data base database", 2: "database big table"}
        )
        out = word_combine_suggest(tok, ["data", "base", "big"]).collect()
        assert [(r["pair_at"], r["combined"], r["df"]) for r in out] == [
            (0, "database", 2)
        ]


class TestBlendedInfix:
    def test_position_linear_coefficient_and_floor(self, spark):
        from lucene_solr_spark.operators.search_features import (
            suggest_blended_infix,
        )

        # doc 1: match at pos0=0 -> coef 1.0, weight 4 -> 4.0
        # doc 2: match at pos0=2 -> coef 0.8, weight 4 -> 3.2
        # doc 3: match at pos0=30 -> coef floored at 0.1, weight 31 -> 3.1
        docs = {
            1: "q a b c",
            2: "a b q c",
            3: " ".join(["x"] * 30 + ["q"]),
        }
        out = suggest_blended_infix(_tok_df(spark, docs), "q", k=10).collect()
        got = {r["doc_id"]: (r["min_pos"], r["blended"]) for r in out}
        assert got == {1: (0, 4.0), 2: (2, 3.2), 3: (30, 3.1)}
        order = [r["doc_id"] for r in out]
        assert order == [1, 2, 3]


class TestCommonGrams:
    def test_golden_vector(self):
        from lucene_solr_spark.analysis import common_grams

        toks = "the quick fox of the sea".split()
        out = common_grams(toks, frozenset({"the", "of"}))
        assert out == [
            "the", "the_quick", "quick", "fox", "fox_of", "of", "of_the",
            "the", "the_sea", "sea",
        ]

    def test_no_common_words_is_identity(self):
        from lucene_solr_spark.analysis import common_grams

        toks = "a b c".split()
        assert common_grams(toks, frozenset()) == toks

    def test_distributed_form_matches_row_function(self, spark):
        """The lead()-window emission in entry_round4 produces exactly the
        grams common_grams emits (differential: window form vs row spec)."""
        from collections import Counter

        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from lucene_solr_spark.analysis import common_grams

        docs = {
            1: "the big order of the day",
            2: "a small a a order",
            3: "no stop words here",
        }
        common = {"a", "the"}
        expected = Counter()
        for t in docs.values():
            for g in common_grams(t.split(), frozenset(common)):
                if "_" in g:
                    expected[g] += 1
        tok = _tok_df(spark, docs)
        w = Window.partitionBy("doc_id").orderBy("pos")
        grams = (
            tok.withColumn("nxt", F.lead("term").over(w))
            .filter(
                F.col("nxt").isNotNull()
                & (
                    F.col("term").isin(*common)
                    | F.col("nxt").isin(*common)
                )
            )
            .groupBy(F.concat_ws("_", "term", "nxt").alias("gram"))
            .agg(F.count("*").alias("n"))
            .collect()
        )
        assert {r["gram"]: r["n"] for r in grams} == dict(expected)


class TestPathHierarchy:
    def test_golden_vectors(self):
        from lucene_solr_spark.analysis import path_hierarchy

        assert path_hierarchy("/a/b/c") == ["/a", "/a/b", "/a/b/c"]
        assert path_hierarchy("a/b") == ["a", "a/b"]
        assert path_hierarchy("/a/b/c", skip=1) == ["/b", "/b/c"]
        assert path_hierarchy("", delimiter="/") == []
        assert path_hierarchy("x", delimiter="/") == ["x"]

    def test_trailing_and_double_delimiters_collapse(self):
        from lucene_solr_spark.analysis import path_hierarchy

        assert path_hierarchy("/a//b/") == ["/a", "/a/b"]


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))
