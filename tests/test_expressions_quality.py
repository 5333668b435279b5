"""Expression compiler (functions/expressions.py) and search-quality
metrics (operators/quality.py) — semantics pinned on micro-fixtures.
"""

from __future__ import annotations

import math

import pytest


def _eval(spark, src, **vars):
    """Evaluate an expression over a single-row frame of the given vars."""
    from pyspark.sql import functions as F

    from lucene_solr_spark.functions.expressions import compile_expression

    row = spark.createDataFrame([tuple(vars.values())], list(vars.keys()))
    bindings = {k: F.col(k).cast("double") for k in vars}
    return row.select(
        compile_expression(src, bindings).alias("v")
    ).first()["v"]


class TestExpressionCompiler:
    def test_precedence_and_unary(self, spark):
        assert _eval(spark, "2 + 3 * 4", x=0) == 14.0
        assert _eval(spark, "(2 + 3) * 4", x=0) == 20.0
        assert _eval(spark, "-2 * 3 + 10", x=0) == 4.0
        assert _eval(spark, "10 % 4 / 2", x=0) == 1.0

    def test_bindings_and_functions(self, spark):
        assert _eval(spark, "sqrt(x) + 1", x=9.0) == 4.0
        assert _eval(spark, "pow(x, 2) - max(x, 3)", x=5.0) == 20.0
        v = _eval(spark, "ln(exp(x))", x=2.5)
        assert abs(v - 2.5) < 1e-9

    def test_comparisons_are_doubles(self, spark):
        assert _eval(spark, "x > 3", x=5.0) == 1.0
        assert _eval(spark, "x > 3", x=2.0) == 0.0
        assert _eval(spark, "(x >= 2) && (x <= 4)", x=3.0) == 1.0
        assert _eval(spark, "!(x == 2) || (x < 0)", x=2.0) == 0.0

    def test_ternary(self, spark):
        assert _eval(spark, "x > 0 ? 10 : 20", x=1.0) == 10.0
        assert _eval(spark, "x > 0 ? 10 : 20", x=-1.0) == 20.0
        # nested ternary binds right
        assert _eval(spark, "x > 0 ? x > 1 ? 3 : 2 : 1", x=0.5) == 1.0 + 1.0

    def test_scientific_and_decimal_literals(self, spark):
        assert _eval(spark, "1e2 + .5", x=0) == 100.5

    def test_errors(self):
        from lucene_solr_spark.functions.expressions import (
            ExpressionError,
            compile_expression,
        )

        with pytest.raises(ExpressionError):
            compile_expression("1 +", {})
        with pytest.raises(ExpressionError):
            compile_expression("unknown_var", {})
        with pytest.raises(ExpressionError):
            compile_expression("nosuchfn(1)", {})
        with pytest.raises(ExpressionError):
            compile_expression("sqrt(1, 2)", {})
        with pytest.raises(ExpressionError):
            compile_expression("1 @ 2", {})
        with pytest.raises(ExpressionError):
            compile_expression("(1 + 2", {})


class TestQualityMetrics:
    def _frames(self, spark):
        # query A: ranked [d1, d2, d3]; qrels: d1 grade 2, d3 grade 1
        # query B: ranked [d4, d5]; no relevant docs at all
        results = spark.createDataFrame(
            [("A", 1, 1), ("A", 2, 2), ("A", 3, 3), ("B", 4, 1), ("B", 5, 2)],
            ["query_id", "doc_id", "rank"],
        )
        qrels = spark.createDataFrame(
            [("A", 1, 2.0), ("A", 3, 1.0), ("B", 99, 1.0)],
            ["query_id", "doc_id", "grade"],
        )
        return results, qrels

    def test_values(self, spark):
        from lucene_solr_spark.operators.quality import (
            search_quality_metrics,
        )

        results, qrels = self._frames(spark)
        out = {
            r["query_id"]: (r["p_at_k"], r["mrr"], r["ndcg_at_k"])
            for r in search_quality_metrics(results, qrels, k=3).collect()
        }
        # A: P@3 = 2/3; MRR = 1/1; DCG = 3/log2(2) + 1/log2(4) = 3.5
        #    IDCG = 3/log2(2) + 1/log2(3); nDCG = 3.5 / idcg
        idcg = 3.0 + 1.0 / math.log2(3.0)
        assert out["A"][0] == round(2 / 3, 6)
        assert out["A"][1] == 1.0
        assert out["A"][2] == round(3.5 / idcg, 6)
        # B: relevant doc 99 never retrieved -> all zeros
        assert out["B"] == (0.0, 0.0, 0.0)
        # macro mean
        assert out["__mean__"][1] == 0.5

    def test_rank_beyond_k_counts_for_mrr_not_patk(self, spark):
        from lucene_solr_spark.operators.quality import (
            search_quality_metrics,
        )

        results = spark.createDataFrame(
            [("Q", i, i) for i in range(1, 6)], ["query_id", "doc_id", "rank"]
        )
        qrels = spark.createDataFrame(
            [("Q", 4, 1.0)], ["query_id", "doc_id", "grade"]
        )
        out = search_quality_metrics(results, qrels, k=3).collect()
        row = {r["query_id"]: r for r in out}["Q"]
        assert row["p_at_k"] == 0.0  # hit is at rank 4 > k
        assert row["mrr"] == 0.25  # but MRR sees the whole list
        assert row["ndcg_at_k"] == 0.0


class TestDistancesAndKS:
    def test_distances(self, spark):
        from pyspark.sql import functions as F

        from lucene_solr_spark.operators.matheval import (
            cosine_sim_col,
            euclidean_dist_col,
            manhattan_dist_col,
        )

        df = spark.createDataFrame(
            [([3.0, 4.0], [0.0, 0.0])], ["a", "b"]
        )
        r = df.select(
            euclidean_dist_col(F.col("a"), F.col("b")).alias("l2"),
            manhattan_dist_col(F.col("a"), F.col("b")).alias("l1"),
            cosine_sim_col(F.col("a"), F.col("a")).alias("self_cos"),
        ).first()
        assert r["l2"] == 5.0 and r["l1"] == 7.0
        assert abs(r["self_cos"] - 1.0) < 1e-9

    def test_ks_identical_samples_is_zero(self, spark):
        from lucene_solr_spark.operators.matheval import ks_test_stream

        rows = [("a", float(v)) for v in range(10)] + [
            ("b", float(v)) for v in range(10)
        ]
        df = spark.createDataFrame(rows, ["g", "v"])
        r = ks_test_stream(df, "g", "v", "a", "b").first()
        assert r["d"] == 0.0 and r["n1"] == 10 and r["n2"] == 10

    def test_ks_disjoint_samples_is_one(self, spark):
        from lucene_solr_spark.operators.matheval import ks_test_stream

        rows = [("a", float(v)) for v in range(5)] + [
            ("b", float(v + 100)) for v in range(5)
        ]
        df = spark.createDataFrame(rows, ["g", "v"])
        assert ks_test_stream(df, "g", "v", "a", "b").first()["d"] == 1.0


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))
