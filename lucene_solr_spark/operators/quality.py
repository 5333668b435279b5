"""Search-quality evaluation: P@k, MRR, nDCG@k over (results, qrels).

Reference parity: lucene/benchmark/src/java/org/apache/lucene/benchmark/
quality/ — QualityBenchmark + trec.Trec1MQReader feed judged queries
through the engine and score the ranked lists (QualityStats computes
precision/recall@k and MRR; nDCG is the standard graded extension used by
the same harness downstream). The reference evaluates one query at a
time on the driver; here ALL queries evaluate in one distributed plan —
a join on (query_id, doc_id) plus two ranked windows — so a 10^6-query
eval set is one job, not 10^6 loops.

Contracts:
  * results: (query_id, doc_id, rank) — rank 1-based, unique per query.
  * qrels:   (query_id, doc_id, grade) — grade > 0 means relevant;
    graded values feed nDCG's numerator (2^grade - 1).
  * Output: one row per query_id with p_at_k, mrr (reciprocal rank of
    the FIRST relevant hit anywhere in the list), ndcg_at_k — plus the
    macro-averaged summary row under query_id = '__mean__'.

Everything is equi-join + window + agg (single exchange keyed on
query_id); the ideal-DCG ranking reuses the same shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def _dcg_term(grade, rank):
    return (F.pow(F.lit(2.0), grade) - 1.0) / F.log2(rank + 1.0)


def search_quality_metrics(
    results: DataFrame, qrels: DataFrame, k: int = 10
) -> DataFrame:
    """Per-query P@k, MRR, nDCG@k + a '__mean__' macro-average row."""
    r = results.select(
        F.col("query_id").cast("string").alias("query_id"),
        "doc_id",
        F.col("rank").cast("double").alias("rank"),
    )
    q = qrels.select(
        F.col("query_id").cast("string").alias("query_id"),
        "doc_id",
        F.col("grade").cast("double").alias("grade"),
    )
    joined = r.join(q, ["query_id", "doc_id"], "left").select(
        "query_id",
        "rank",
        F.coalesce("grade", F.lit(0.0)).alias("grade"),
    )
    per_q = joined.groupBy("query_id").agg(
        (
            F.sum(
                F.when((F.col("rank") <= k) & (F.col("grade") > 0), 1.0)
                .otherwise(0.0)
            )
            / F.lit(float(k))
        ).alias("p_at_k"),
        F.coalesce(
            F.lit(1.0)
            / F.min(F.when(F.col("grade") > 0, F.col("rank"))),
            F.lit(0.0),
        ).alias("mrr"),
        F.sum(
            F.when(
                F.col("rank") <= k, _dcg_term(F.col("grade"), F.col("rank"))
            ).otherwise(0.0)
        ).alias("dcg"),
    )
    # ideal DCG: qrels ranked by grade desc (doc_id tiebreak for
    # determinism), top-k per query
    iw = Window.partitionBy("query_id").orderBy(
        F.desc("grade"), F.asc("doc_id")
    )
    ideal = (
        q.filter(F.col("grade") > 0)
        .withColumn("irank", F.row_number().over(iw).cast("double"))
        .filter(F.col("irank") <= k)
        .groupBy("query_id")
        .agg(
            F.sum(_dcg_term(F.col("grade"), F.col("irank"))).alias("idcg")
        )
    )
    scored = (
        per_q.join(ideal, "query_id", "left")
        .select(
            "query_id",
            F.round("p_at_k", 6).alias("p_at_k"),
            F.round("mrr", 6).alias("mrr"),
            F.round(
                F.when(
                    F.col("idcg") > 0, F.col("dcg") / F.col("idcg")
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("ndcg_at_k"),
        )
    )
    mean_row = scored.agg(
        F.lit("__mean__").alias("query_id"),
        F.round(F.avg("p_at_k"), 6).alias("p_at_k"),
        F.round(F.avg("mrr"), 6).alias("mrr"),
        F.round(F.avg("ndcg_at_k"), 6).alias("ndcg_at_k"),
    )
    return scored.unionByName(mean_row)
