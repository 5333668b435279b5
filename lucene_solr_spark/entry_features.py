"""Driver-contract entries for the search-UX operator family
(operators/search_features.py): highlight, suggest, spellcheck,
real-time get, LTR rescoring — each with a DuckDB ANSI-SQL oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

_TOKS = """
tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
)"""


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _tok(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )


def q_highlight(spark, sf_dir):
    """UnifiedHighlighter-style first-window snippet with <em> wrapping."""
    from .operators.search_features import highlight_first_window

    d = _docs(spark, sf_dir)
    out = highlight_first_window(d, "text", ["dup", "vector"], 3, 3)
    return (
        out.filter(F.col("snippet").isNotNull())
        .select("doc_id", "snippet")
        .orderBy("doc_id")
        .limit(20)
    )


SQL_HIGHLIGHT = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
h AS (
  SELECT doc_id, toks,
         least(NULLIF(list_position(toks, 'dup'), 0),
               NULLIF(list_position(toks, 'vector'), 0)) AS fh
  FROM t
),
w AS (
  SELECT doc_id,
         list_slice(toks, greatest(fh - 3, 1), fh + 3) AS win
  FROM h WHERE fh IS NOT NULL
)
SELECT doc_id,
       array_to_string(
         list_transform(win, x -> CASE WHEN x IN ('dup', 'vector')
                                  THEN '<em>' || x || '</em>' ELSE x END),
         ' ') AS snippet
FROM w ORDER BY doc_id LIMIT 20
"""


def q_suggest_prefix(spark, sf_dir):
    """Terms-dict prefix suggester: top-10 terms by df under 'st'."""
    from .operators.search_features import suggest_prefix

    return suggest_prefix(_tok(spark, sf_dir), "st", 10)


SQL_SUGGEST_PREFIX = f"""
WITH {_TOKS}
SELECT term, count(DISTINCT doc_id) AS df
FROM tok WHERE term LIKE 'st%'
GROUP BY term ORDER BY df DESC, term LIMIT 10
"""


def q_spellcheck(spark, sf_dir):
    """DirectSolrSpellChecker: corrections for the typo 'vectr'."""
    from .operators.search_features import spellcheck

    return spellcheck(_tok(spark, sf_dir), "vectr", 2, 5)


SQL_SPELLCHECK = f"""
WITH {_TOKS},
cand AS (
  SELECT term, count(DISTINCT doc_id) AS df,
         levenshtein(term, 'vectr') AS distance
  FROM tok GROUP BY term
)
SELECT term, distance, df FROM cand
WHERE distance <= 2 AND term <> 'vectr'
ORDER BY distance, df DESC, term LIMIT 5
"""


def q_realtime_get(spark, sf_dir):
    """Point lookup by uniqueKey (RealTimeGetComponent)."""
    from .operators.search_features import realtime_get

    return realtime_get(_docs(spark, sf_dir), "doc_id", 42).select(
        "doc_id", "lang", "source", "n_chars"
    )


SQL_REALTIME_GET = """
SELECT doc_id, lang, source, n_chars FROM documents WHERE doc_id = 42
"""


def q_ltr_rescore(spark, sf_dir):
    """LinearModel LTR over a phase-1 candidate set: features = tf('dup'),
    doc length; score = 2·tf − 0.01·dl (ReRank two-stage plan)."""
    from .operators.search_features import ltr_linear_rescore

    tok = _tok(spark, sf_dir)
    tf = (
        tok.filter(F.col("term") == "dup")
        .groupBy("doc_id")
        .agg(F.count("*").alias("tf_dup"))
    )
    dl = tok.groupBy("doc_id").agg(F.count("*").alias("dl"))
    cand = tf.join(dl, "doc_id")
    out = ltr_linear_rescore(
        cand,
        features={},
        weights={"tf_dup": 2.0, "dl": -0.01},
        k=10,
    )
    return out.select(
        "doc_id", F.round("ltr_score", 4).alias("ltr_score")
    )


SQL_LTR_RESCORE = f"""
WITH {_TOKS},
tf AS (SELECT doc_id, count(*) AS tf_dup FROM tok WHERE term = 'dup' GROUP BY doc_id),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
cand AS (SELECT tf.doc_id, tf.tf_dup, dl.dl FROM tf JOIN dl ON tf.doc_id = dl.doc_id),
s AS (SELECT doc_id, 2.0 * tf_dup - 0.01 * dl AS ltr_score FROM cand)
SELECT doc_id, ROUND(ltr_score, 4) AS ltr_score
FROM (SELECT * FROM s ORDER BY ltr_score DESC, doc_id LIMIT 10) t
"""


REGISTRY_FEATURES: dict[str, tuple] = {
    "highlight_snippets": (q_highlight, SQL_HIGHLIGHT),
    "suggest_prefix": (q_suggest_prefix, SQL_SUGGEST_PREFIX),
    "spellcheck_fuzzy": (q_spellcheck, SQL_SPELLCHECK),
    "realtime_get": (q_realtime_get, SQL_REALTIME_GET),
    "ltr_linear_rescore": (q_ltr_rescore, SQL_LTR_RESCORE),
}


# ---------------------------------------------------------------------------
# ML streaming expressions (train/classify/kmeans) — rows-only (spark.ml
# models aren't ANSI-SQL-expressible; determinism via fixed seeds)
# ---------------------------------------------------------------------------

def q_ml_train_classify(spark, sf_dir):
    """TextLogitStream/ClassifyStream parity: train a text classifier to
    predict lang=='en' from text, report per-class prediction counts
    (operators/ml.py; TextLogitStream.java ≈L80)."""
    from .operators.ml import train_text_logit

    docs = _docs(spark, sf_dir).withColumn(
        "label", (F.col("lang") == "en").cast("double")
    )
    _model, preds = train_text_logit(docs, "text", "label", max_iter=5)
    return (
        preds.groupBy("label", "prediction")
        .agg(F.count("*").alias("n"))
        .orderBy("label", "prediction")
    )


def q_ml_kmeans(spark, sf_dir):
    """kmeans() math-evaluator parity over the embeddings table: cluster
    sizes with fixed seed (operators/ml.py; KmeansEvaluator)."""
    from .operators.ml import kmeans_embeddings

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = kmeans_embeddings(emb, "embedding", k=4, seed=42)
    return (
        out.groupBy("cluster").agg(F.count("*").alias("n"))
        .orderBy("cluster")
    )


REGISTRY_FEATURES.update(
    {
        "ml_train_classify": (q_ml_train_classify, None),
        "ml_kmeans_clusters": (q_ml_kmeans, None),
    }
)
