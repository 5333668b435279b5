"""MoreLikeThis (lucene/queries/.../mlt/MoreLikeThis.java ≈L100):
extract the top tf-idf terms of a source doc, build an OR query from them.

Pure DataFrame recipe: per-doc tf x global idf, window top-N, then a
disjunction score over the selected terms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def top_tfidf_terms(
    tok: DataFrame, doc_id: int, n_docs: int, max_terms: int = 5
) -> DataFrame:
    """Top tf-idf terms of one doc. tok: (doc_id, term)."""
    df_tbl = tok.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    tf_tbl = (
        tok.filter(F.col("doc_id") == doc_id)
        .groupBy("term")
        .agg(F.count("*").alias("tf"))
    )
    j = tf_tbl.join(df_tbl, "term")
    # classic MLT score: tf * log(N / df)
    score = F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))
    return (
        j.select("term", F.round(score, 4).alias("mlt_score"))
        .orderBy(F.desc("mlt_score"), F.asc("term"))
        .limit(max_terms)
    )


def more_like_this(
    tok: DataFrame, dl: DataFrame, doc_id: int, n_docs: int, avgdl: float,
    max_terms: int = 5, k: int = 10, k1: float = 1.2, b: float = 0.75,
) -> DataFrame:
    """Full MLT: top terms of `doc_id` -> BM25 OR query -> top-k other docs.

    ONE Spark plan, zero driver collects: the selected-terms frame (at most
    `max_terms` rows, carrying its own df for the idf expression) is
    broadcast-joined into the corpus tf aggregation — the term selection
    never round-trips through the driver (round-1 version ran two collects
    per query)."""
    df_tbl = tok.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    tf_src = (
        tok.filter(F.col("doc_id") == doc_id)
        .groupBy("term")
        .agg(F.count("*").alias("tf"))
    )
    mlt = F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))
    top_terms = (
        tf_src.join(df_tbl, "term")
        .select("term", "df", F.round(mlt, 4).alias("mlt_score"))
        .orderBy(F.desc("mlt_score"), F.asc("term"))
        .limit(max_terms)
    )
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf = (
        tok.join(F.broadcast(top_terms.select("term", "df")), "term")
        .groupBy("doc_id", "term", "df")
        .agg(F.count("*").alias("tf"))
    )
    scored = (
        tf.join(dl, "doc_id")
        .withColumn(
            "_s",
            idf
            * F.col("tf")
            / (
                F.col("tf")
                + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl))
            ),
        )
        .groupBy("doc_id")
        .agg(F.sum("_s").alias("score"))
        .filter(F.col("doc_id") != doc_id)
    )
    return (
        scored.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id", F.round("score", 4).alias("score"))
    )
