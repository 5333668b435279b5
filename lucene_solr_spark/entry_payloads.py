"""Driver entries for the payloads family (operators/payloads.py) vs
pure ANSI-SQL DuckDB oracles.

Payloads are synthesized deterministically from token position so BOTH
sides derive them independently: token at 0-based position i carries
payload (i % 7) / 2.0. The Spark side goes the long way round — it
RENDERS a ``term|payload`` delimited text per document, then parses it
back through delimited_payload_tokens (the DelimitedPayloadTokenFilter
path under test); the SQL oracle states the payload arithmetic directly
over token positions (DuckDB generate_subscripts is 1-based, hence
``(pos-1) % 7``).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .operators.payloads import (
    delimited_payload_tokens,
    payload_score,
    span_payload_check,
)
from .score import bm25_score


def _payload_tokens(spark, sf_dir):
    """documents -> delimited text -> parsed (doc_id, term, pos, payload)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ptext = F.array_join(
        F.transform(
            F.split(F.col("text"), " "),
            lambda t, i: F.concat_ws(
                "|", t, ((i % 7) / F.lit(2.0)).cast("string")
            ),
        ),
        " ",
    )
    return delimited_payload_tokens(
        docs.select("doc_id", ptext.alias("text"))
    )


def q_payload_score_avg(spark, sf_dir):
    """PayloadScoreQuery(term=merge, AvgPayloadFunction,
    includeSpanScore=false): score(doc) = avg payload at 'merge'
    positions; top 10."""
    g = payload_score(_payload_tokens(spark, sf_dir), "merge", fn="avg")
    return (
        g.select("doc_id", F.round("score", 4).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )


def q_payload_score_span(spark, sf_dir):
    """PayloadScoreQuery(term=merge, SumPayloadFunction,
    includeSpanScore=true): sum-of-payloads × the term's BM25 score."""
    tokens = _payload_tokens(spark, sf_dir)
    dl = tokens.groupBy("doc_id").agg(F.count("*").alias("dl"))
    n = dl.count()
    avgdl = dl.agg(F.avg("dl")).first()[0]
    tf = (
        tokens.filter(F.col("term") == "merge")
        .groupBy("doc_id")
        .agg(F.count("*").alias("tf"))
    )
    df_val = tf.count()
    span = tf.join(dl, "doc_id").select(
        "doc_id",
        bm25_score(
            F.col("tf"), F.col("dl"), F.lit(float(df_val)), n, avgdl
        ).alias("score"),
    )
    g = payload_score(tokens, "merge", fn="sum", span_scores=span)
    return (
        g.select("doc_id", F.round("score", 4).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
    )


def q_span_payload_check(spark, sf_dir):
    """SpanPayloadCheck on the ordered span "hash join" requiring the
    'hash' position's payload == 1.0 ('join' unconstrained); all
    matching docs with their match counts."""
    g = span_payload_check(
        _payload_tokens(spark, sf_dir), ["hash", "join"], [1.0, None]
    )
    return g.select("doc_id", F.col("n_matches").cast("long").alias("n_matches"))


_PTOK = """
ptok AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS term,
         generate_subscripts(string_split(text, ' '), 1) AS pos,
         (((generate_subscripts(string_split(text, ' '), 1) - 1) % 7)) / 2.0
           AS payload
  FROM documents
)"""

SQL_PAYLOAD_SCORE_AVG = f"""
WITH {_PTOK},
g AS (SELECT doc_id, avg(payload) AS score FROM ptok
      WHERE term = 'merge' GROUP BY doc_id)
SELECT doc_id, ROUND(score, 4) AS score
FROM (SELECT * FROM g ORDER BY score DESC, doc_id LIMIT 10) t
"""

SQL_PAYLOAD_SCORE_SPAN = f"""
WITH {_PTOK},
dl AS (SELECT doc_id, count(*) AS dl FROM ptok GROUP BY doc_id),
cstats AS (
  SELECT (SELECT count(*) FROM documents) AS n, avg(dl) AS avgdl FROM dl),
tf AS (SELECT doc_id, count(*) AS tf, sum(payload) AS psum FROM ptok
       WHERE term = 'merge' GROUP BY doc_id),
dfv AS (SELECT count(*) AS df FROM tf),
g AS (
  SELECT tf.doc_id,
         tf.psum * ln(1 + (cstats.n - dfv.df + 0.5) / (dfv.df + 0.5)) * tf.tf
           / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / cstats.avgdl)) AS score
  FROM tf, dl, cstats, dfv WHERE dl.doc_id = tf.doc_id)
SELECT doc_id, ROUND(score, 4) AS score
FROM (SELECT * FROM g ORDER BY score DESC, doc_id LIMIT 10) t
"""

SQL_SPAN_PAYLOAD_CHECK = f"""
WITH {_PTOK},
a AS (SELECT doc_id, pos, payload FROM ptok WHERE term = 'hash'),
b AS (SELECT doc_id, pos FROM ptok WHERE term = 'join')
SELECT a.doc_id AS doc_id, count(*) AS n_matches
FROM a JOIN b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
WHERE a.payload = 1.0
GROUP BY a.doc_id
"""

REGISTRY_PAYLOADS = {
    "payload_score_avg": (q_payload_score_avg, SQL_PAYLOAD_SCORE_AVG),
    "payload_score_span": (q_payload_score_span, SQL_PAYLOAD_SCORE_SPAN),
    "span_payload_check": (q_span_payload_check, SQL_SPAN_PAYLOAD_CHECK),
}
