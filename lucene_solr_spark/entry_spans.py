"""Driver-contract entries: Spans positional algebra (operators/spans.py)
and the non-BM25 similarity family (score.py) — each with a DuckDB oracle.

Reference parity: SpanNearQuery/SpanFirstQuery (lucene/core/.../search/
spans/), SloppyPhraseMatcher, LMDirichletSimilarity (mu=2000),
ClassicSimilarity (TFIDFSimilarity) — SURVEY.md §3.3/§3.5.
"""

from __future__ import annotations

from pyspark.sql import functions as F

MU = 2000.0


def _tok(spark, sf_dir):
    from .entry_queries import _tok as tok

    return tok(spark, sf_dir)


def q_span_near_ordered(spark, sf_dir):
    """SpanNearQuery(in_order=true, slop=3) on ('big','order')."""
    from .operators.spans import span_near

    return span_near(_tok(spark, sf_dir), "big", "order", 3, True).orderBy(
        "doc_id"
    )


_SQL_POS = """
tok AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS term,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
)"""

SQL_SPAN_NEAR_ORDERED = f"""
WITH {_SQL_POS},
pa AS (SELECT doc_id, pos AS p FROM tok WHERE term = 'big'),
pb AS (SELECT doc_id, pos AS p FROM tok WHERE term = 'order')
SELECT pa.doc_id, count(*) AS n_matches
FROM pa JOIN pb ON pa.doc_id = pb.doc_id
WHERE pb.p > pa.p AND pb.p - pa.p - 1 <= 3
GROUP BY pa.doc_id ORDER BY pa.doc_id
"""


def q_span_near_unordered(spark, sf_dir):
    """SpanNearQuery(in_order=false, slop=2)."""
    from .operators.spans import span_near

    return span_near(_tok(spark, sf_dir), "big", "order", 2, False).orderBy(
        "doc_id"
    )


SQL_SPAN_NEAR_UNORDERED = f"""
WITH {_SQL_POS},
pa AS (SELECT doc_id, pos AS p FROM tok WHERE term = 'big'),
pb AS (SELECT doc_id, pos AS p FROM tok WHERE term = 'order')
SELECT pa.doc_id, count(*) AS n_matches
FROM pa JOIN pb ON pa.doc_id = pb.doc_id
WHERE pa.p <> pb.p AND abs(pb.p - pa.p) - 1 <= 2
GROUP BY pa.doc_id ORDER BY pa.doc_id
"""


def q_span_first(spark, sf_dir):
    """SpanFirstQuery: 'dup' within the first 10 positions (1-based)."""
    from .operators.spans import span_first

    return span_first(_tok(spark, sf_dir), "dup", 11).orderBy("doc_id")


SQL_SPAN_FIRST = f"""
WITH {_SQL_POS}
SELECT DISTINCT doc_id FROM tok
WHERE term = 'dup' AND pos < 11 ORDER BY doc_id
"""


def q_sloppy_phrase(spark, sf_dir):
    """Sloppy phrase freq, slop=2, weight 1/(1+matchLength) (see
    operators/spans.py for the all-pairs simplification note)."""
    from .operators.spans import sloppy_phrase_freq

    out = sloppy_phrase_freq(_tok(spark, sf_dir), "big", "order", 2)
    return out.select(
        "doc_id", F.round("sloppy_freq", 4).alias("sloppy_freq")
    ).orderBy("doc_id")


SQL_SLOPPY_PHRASE = f"""
WITH {_SQL_POS},
pa AS (SELECT doc_id, pos AS p FROM tok WHERE term = 'big'),
pb AS (SELECT doc_id, pos AS p FROM tok WHERE term = 'order'),
m AS (
  SELECT pa.doc_id, abs(pb.p - pa.p - 1) AS ml
  FROM pa JOIN pb ON pa.doc_id = pb.doc_id
  WHERE pa.p <> pb.p AND abs(pb.p - pa.p - 1) <= 2
)
SELECT doc_id, ROUND(sum(1.0 / (1.0 + ml)), 4) AS sloppy_freq
FROM m GROUP BY doc_id ORDER BY doc_id
"""


def q_lm_dirichlet(spark, sf_dir):
    """LMDirichletSimilarity (mu=2000) top-10 for 'dup' — raw doc lengths
    (the SQL-expressible path; quantized variant covered by oracle.py)."""
    from .entry_queries import _dl
    from .score import lm_dirichlet_score

    tok, dl = _tok(spark, sf_dir), _dl(spark, sf_dir)
    sum_ttf = int(dl.agg(F.sum("dl")).first()[0])
    tf = tok.filter(F.col("term") == "dup").groupBy("doc_id").agg(
        F.count("*").alias("tf")
    )
    ttf = tok.filter(F.col("term") == "dup").count()
    j = tf.join(dl, "doc_id")
    scored = j.select(
        "doc_id",
        lm_dirichlet_score(
            F.col("tf"), F.col("dl"), F.lit(float(ttf)), sum_ttf, MU
        ).alias("score"),
    )
    return (
        scored.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
        .select("doc_id", F.round("score", 4).alias("score"))
    )


SQL_LM_DIRICHLET = f"""
WITH {_SQL_POS},
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
sums AS (SELECT CAST(sum(dl) AS DOUBLE) AS sum_ttf FROM dl),
tf AS (SELECT doc_id, count(*) AS tf FROM tok WHERE term = 'dup' GROUP BY doc_id),
ttfv AS (SELECT CAST(count(*) AS DOUBLE) AS ttf FROM tok WHERE term = 'dup'),
s AS (
  SELECT tf.doc_id,
         greatest(
           ln(1 + tf.tf / ({MU} * (ttfv.ttf / sums.sum_ttf)))
             + ln({MU} / (dl.dl + {MU})),
           0.0) AS score
  FROM tf, dl, sums, ttfv WHERE dl.doc_id = tf.doc_id
)
SELECT doc_id, ROUND(score, 4) AS score
FROM (SELECT * FROM s ORDER BY score DESC, doc_id LIMIT 10) t
"""


def q_classic_tfidf(spark, sf_dir):
    """ClassicSimilarity (TF-IDF): sqrt(tf)·idf²/sqrt(dl), idf =
    ln((N+1)/(df+1))+1 — raw lengths."""
    from .entry_queries import _cstats, _dl

    tok, dl = _tok(spark, sf_dir), _dl(spark, sf_dir)
    n, _ = _cstats(spark, sf_dir)
    tf = tok.filter(F.col("term") == "dup").groupBy("doc_id").agg(
        F.count("*").alias("tf")
    )
    df_val = tf.count()
    idf = F.lit(
        __import__("math").log((n + 1.0) / (df_val + 1.0)) + 1.0
    )
    j = tf.join(dl, "doc_id")
    scored = j.select(
        "doc_id",
        (F.sqrt("tf") * idf * idf / F.sqrt("dl")).alias("score"),
    )
    return (
        scored.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
        .select("doc_id", F.round("score", 4).alias("score"))
    )


SQL_CLASSIC_TFIDF = f"""
WITH {_SQL_POS},
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
tf AS (SELECT doc_id, count(*) AS tf FROM tok WHERE term = 'dup' GROUP BY doc_id),
dfv AS (SELECT CAST(count(*) AS DOUBLE) AS df FROM tf),
s AS (
  SELECT tf.doc_id,
         sqrt(tf.tf) * pow(ln((n.n + 1) / (dfv.df + 1)) + 1, 2) / sqrt(dl.dl)
           AS score
  FROM tf, dl, n, dfv WHERE dl.doc_id = tf.doc_id
)
SELECT doc_id, ROUND(score, 4) AS score
FROM (SELECT * FROM s ORDER BY score DESC, doc_id LIMIT 10) t
"""


REGISTRY_SPANS: dict[str, tuple] = {
    "span_near_ordered": (q_span_near_ordered, SQL_SPAN_NEAR_ORDERED),
    "span_near_unordered": (q_span_near_unordered, SQL_SPAN_NEAR_UNORDERED),
    "span_first": (q_span_first, SQL_SPAN_FIRST),
    "sloppy_phrase_freq": (q_sloppy_phrase, SQL_SLOPPY_PHRASE),
    "lm_dirichlet_topk": (q_lm_dirichlet, SQL_LM_DIRICHLET),
    "classic_tfidf_topk": (q_classic_tfidf, SQL_CLASSIC_TFIDF),
}
