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


def q_highlight_passage(spark, sf_dir):
    """Passage-scored highlighter (PassageScorer): best BM25-weighted
    16-token passage per matching doc."""
    from .operators.search_features import highlight_best_passage

    d = _docs(spark, sf_dir)
    n_docs = d.count()
    out = highlight_best_passage(
        d, "doc_id", "text", ["dup", "vector"], n_docs, window=16
    )
    return out.orderBy("doc_id").limit(15)


SQL_HIGHLIGHT_PASSAGE = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
         generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
  FROM documents),
nd AS (SELECT count(*) AS n FROM documents),
dfs AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tok
        WHERE tok IN ('dup', 'vector') GROUP BY tok),
ptf AS (SELECT doc_id, pos // 16 AS win, tok, count(*) AS tf
        FROM tok WHERE tok IN ('dup', 'vector') GROUP BY 1, 2, 3),
scored AS (
  SELECT ptf.doc_id, ptf.win,
         sum(ln(1 + (nd.n - dfs.df + 0.5) / (dfs.df + 0.5))
             * ptf.tf / (ptf.tf + 1.2)) AS pscore
  FROM ptf, dfs, nd WHERE dfs.tok = ptf.tok GROUP BY 1, 2),
best AS (
  SELECT doc_id, win, pscore,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY pscore DESC, win) AS rn
  FROM scored),
out AS (
  SELECT d.doc_id, b.pscore,
         list_slice(string_split(d.text, ' '), b.win * 16 + 1,
                    b.win * 16 + 16) AS parr
  FROM documents d JOIN best b ON b.doc_id = d.doc_id AND b.rn = 1)
SELECT doc_id, ROUND(pscore, 4) AS pscore,
       array_to_string(
         list_transform(parr, x -> CASE WHEN x IN ('dup', 'vector')
                                   THEN '<em>' || x || '</em>' ELSE x END),
         ' ') AS passage
FROM out ORDER BY doc_id LIMIT 15
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


def q_ltr_trees_rescore(spark, sf_dir):
    """LambdaMART / MultipleAdditiveTreesModel LTR: a fixed 2-tree
    ensemble over (tf_dup, dl) — each tree a nested CASE WHEN, the
    ensemble a weighted sum (solr/contrib/ltr MultipleAdditiveTreesModel
    semantics; trainable via spark.ml GBT, see gbt_to_ltr_trees)."""
    from .operators.search_features import ltr_trees_rescore

    tok = _tok(spark, sf_dir)
    tf = (
        tok.filter(F.col("term") == "dup")
        .groupBy("doc_id")
        .agg(F.count("*").cast("double").alias("tf_dup"))
    )
    dl = tok.groupBy("doc_id").agg(F.count("*").cast("double").alias("dl"))
    cand = tf.join(dl, "doc_id")
    trees = [
        {
            "weight": 2.0,
            "root": {
                "feature": "tf_dup",
                "threshold": 2.0,
                "left": {"value": 0.1},
                "right": {
                    "feature": "dl",
                    "threshold": 30.0,
                    "left": {"value": 1.0},
                    "right": {"value": 0.6},
                },
            },
        },
        {
            "weight": 1.0,
            "root": {
                "feature": "dl",
                "threshold": 25.0,
                "left": {"value": 0.3},
                "right": {"value": -0.2},
            },
        },
    ]
    out = ltr_trees_rescore(cand, features={}, trees=trees, k=10)
    return out.select(
        "doc_id", F.round("ltr_score", 4).alias("ltr_score")
    )


SQL_LTR_TREES = f"""
WITH {_TOKS},
tf AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS tf_dup FROM tok
       WHERE term = 'dup' GROUP BY doc_id),
dl AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl FROM tok GROUP BY doc_id),
cand AS (SELECT tf.doc_id, tf.tf_dup, dl.dl FROM tf
         JOIN dl ON tf.doc_id = dl.doc_id),
s AS (SELECT doc_id,
             2.0 * (CASE WHEN tf_dup <= 2.0 THEN 0.1
                         WHEN dl <= 30.0 THEN 1.0 ELSE 0.6 END)
             + 1.0 * (CASE WHEN dl <= 25.0 THEN 0.3 ELSE -0.2 END)
             AS ltr_score
      FROM cand)
SELECT doc_id, ROUND(ltr_score, 4) AS ltr_score
FROM (SELECT * FROM s ORDER BY ltr_score DESC, doc_id LIMIT 10) t
"""


def q_highlight_unified(spark, sf_dir):
    """Offset-faithful UnifiedHighlighter: query 'tables' is analyzed to
    stem 'tabl', matching surface form 'table' in the source text; the
    snippet is assembled from ORIGINAL character offsets, not a re-split.
    Rows-only (the Porter-stemmed analyzed-match semantics are not
    ANSI-SQL-expressible; golden tests in test_operators_features.py
    pin the byte-faithfulness contract)."""
    from .operators.search_features import highlight_unified

    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 40)
    out = highlight_unified(d, "doc_id", "text", "tables", window=12)
    return out.orderBy("doc_id").limit(15)


REGISTRY_FEATURES: dict[str, tuple] = {
    "highlight_snippets": (q_highlight, SQL_HIGHLIGHT),
    "highlight_passage": (q_highlight_passage, SQL_HIGHLIGHT_PASSAGE),
    "highlight_unified": (q_highlight_unified, None),
    "suggest_prefix": (q_suggest_prefix, SQL_SUGGEST_PREFIX),
    "spellcheck_fuzzy": (q_spellcheck, SQL_SPELLCHECK),
    "realtime_get": (q_realtime_get, SQL_REALTIME_GET),
    "ltr_linear_rescore": (q_ltr_rescore, SQL_LTR_RESCORE),
    "ltr_trees_rescore": (q_ltr_trees_rescore, SQL_LTR_TREES),
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


# ---------------------------------------------------------------------------
# analysis-chain breadth: shingles / char n-grams / edge n-grams
# (ShingleFilter, NGramTokenFilter, EdgeNGramTokenFilter — SURVEY.md §3.2)
# ---------------------------------------------------------------------------

def q_shingle_bigrams(spark, sf_dir):
    """Token bigrams (ShingleFilter n=2): top-10 by count — pure Column
    ops: split -> slide via transform over an index sequence."""
    d = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    bigrams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - 2),
        lambda i: F.concat_ws(" ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)),
    )
    return (
        d.filter(F.size(toks) >= 2)
        .select(F.explode(bigrams).alias("shingle"))
        .groupBy("shingle")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("shingle"))
        .limit(10)
    )


SQL_SHINGLE_BIGRAMS = f"""
WITH {_TOKS.replace("AS term", "AS term, generate_subscripts(string_split(text, ' '), 1) AS pos").replace("unnest(string_split(text, ' '))", "unnest(string_split(text, ' '))")}
SELECT a.term || ' ' || b.term AS shingle, count(*) AS n
FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
GROUP BY 1 ORDER BY n DESC, shingle LIMIT 10
"""


def q_char_ngrams(spark, sf_dir):
    """Char 3-grams over the distinct vocabulary (NGramTokenFilter):
    top-10 by #terms containing the gram."""
    vocab = _tok(spark, sf_dir).select("term").distinct()
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.length("term") - 2),
            lambda i: F.col("term").substr(i, F.lit(3)),
        )
    )
    return (
        vocab.filter(F.length("term") >= 3)
        .select(F.explode(grams).alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").alias("n_terms"))
        .orderBy(F.desc("n_terms"), F.asc("gram"))
        .limit(10)
    )


SQL_CHAR_NGRAMS = f"""
WITH {_TOKS},
vocab AS (SELECT DISTINCT term FROM tok WHERE length(term) >= 3),
grams AS (
  SELECT DISTINCT term, substr(term, i, 3) AS gram
  FROM vocab, unnest(range(1, length(term) - 1)) AS t(i)
)
SELECT gram, count(*) AS n_terms FROM grams
GROUP BY gram ORDER BY n_terms DESC, gram LIMIT 10
"""


def q_edge_ngrams(spark, sf_dir):
    """Edge n-grams 1..4 of the vocabulary (EdgeNGramTokenFilter —
    the autocomplete index): top-10 prefixes by #terms."""
    vocab = _tok(spark, sf_dir).select("term").distinct()
    prefixes = F.transform(
        F.sequence(F.lit(1), F.least(F.length("term"), F.lit(4))),
        lambda i: F.col("term").substr(F.lit(1), i),
    )
    return (
        vocab.select(F.explode(prefixes).alias("prefix"))
        .groupBy("prefix")
        .agg(F.count("*").alias("n_terms"))
        .orderBy(F.desc("n_terms"), F.asc("prefix"))
        .limit(10)
    )


SQL_EDGE_NGRAMS = f"""
WITH {_TOKS},
vocab AS (SELECT DISTINCT term FROM tok),
grams AS (
  SELECT term, substr(term, 1, i) AS prefix
  FROM vocab, unnest(range(1, least(length(term), 4) + 1)) AS t(i)
)
SELECT prefix, count(*) AS n_terms FROM grams
GROUP BY prefix ORDER BY n_terms DESC, prefix LIMIT 10
"""


REGISTRY_FEATURES.update(
    {
        "shingle_bigrams": (q_shingle_bigrams, SQL_SHINGLE_BIGRAMS),
        "char_ngrams": (q_char_ngrams, SQL_CHAR_NGRAMS),
        "edge_ngrams": (q_edge_ngrams, SQL_EDGE_NGRAMS),
    }
)


# ---------------------------------------------------------------------------
# search-UX round 2: term vectors, query elevation, spellcheck collation,
# cursorMark deep paging, phonetic matching
# ---------------------------------------------------------------------------

def _tok_pos(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "term")
    ).select("doc_id", "term", (F.col("pos0") + 1).alias("pos"))


def q_term_vectors(spark, sf_dir):
    """TermVectorsComponent: term vectors for docs 5 and 7 (positions
    surfaced as a joined string for deterministic hashing)."""
    from .operators.search_features import term_vectors

    tv = term_vectors(_tok_pos(spark, sf_dir), [5, 7])
    return tv.select(
        "doc_id",
        "term",
        "tf",
        F.array_join("positions", ",").alias("positions"),
    ).orderBy("doc_id", "term")


SQL_TERM_VECTORS = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents WHERE doc_id IN (5, 7))
SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf,
       array_to_string(list_sort(list(pos)), ',') AS positions
FROM tok GROUP BY doc_id, term ORDER BY doc_id, term
"""


def q_query_elevation(spark, sf_dir):
    """QueryElevationComponent: organic ranking = tf('dup') desc, with
    docs 7 and 3 pinned (in that editorial order) and doc 1 excluded."""
    from .operators.search_features import elevate

    tok = _tok(spark, sf_dir)
    scored = (
        tok.filter(F.col("term") == "dup")
        .groupBy("doc_id")
        .agg(F.count("*").cast("double").alias("score"))
    )
    out = elevate(scored, [7, 3], k=10, exclude_ids=[1])
    return out.select("doc_id", F.round("score", 4).alias("score"), "elevated")


SQL_QUERY_ELEVATION = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
scored AS (
  SELECT doc_id, CAST(count(*) AS DOUBLE) AS score
  FROM tok WHERE term = 'dup' AND doc_id <> 1 GROUP BY doc_id),
ranked AS (
  SELECT doc_id, score,
         CASE WHEN doc_id = 7 THEN 1 WHEN doc_id = 3 THEN 2
              ELSE 2147483647 END AS elev
  FROM scored)
SELECT doc_id, ROUND(score, 4) AS score, elev <> 2147483647 AS elevated
FROM (SELECT * FROM ranked ORDER BY elev, score DESC, doc_id LIMIT 10) t
"""


def q_spellcheck_collation(spark, sf_dir):
    """SpellCheckCollator: best per-word corrections for 'vectr dup' plus
    the collation's conjunctive hit count."""
    from .operators.search_features import spellcheck_collate

    out = spellcheck_collate(_tok(spark, sf_dir), ["vectr", "dup"], 2)
    return out.select("collation", F.col("hits").cast("long").alias("hits"))


SQL_SPELLCHECK_COLLATION = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
terms AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
words(widx, word) AS (VALUES (0, 'vectr'), (1, 'dup')),
cand AS (
  SELECT w.widx, t.term, t.df, levenshtein(t.term, w.word) AS distance
  FROM terms t CROSS JOIN words w
  WHERE levenshtein(t.term, w.word) <= 2),
best AS (
  SELECT widx, term AS corrected FROM (
    SELECT widx, term,
           row_number() OVER (PARTITION BY widx
                              ORDER BY distance, df DESC, term) AS rn
    FROM cand) x WHERE rn = 1),
coll AS (SELECT string_agg(corrected, ' ' ORDER BY widx) AS collation FROM best),
hits AS (
  SELECT CAST(count(*) AS BIGINT) AS hits FROM (
    SELECT doc_id FROM tok
    WHERE term IN (SELECT corrected FROM best)
    GROUP BY doc_id
    HAVING count(DISTINCT term) = 2) h)
SELECT coll.collation, hits.hits FROM coll, hits
"""


def q_cursor_page(spark, sf_dir):
    """cursorMark deep paging: page 2 (rows 21-30) of documents ordered by
    (n_chars desc, doc_id)."""
    from .operators.search_features import cursor_page

    d = _docs(spark, sf_dir).select("doc_id", "n_chars")
    out = cursor_page(
        d, page=2, page_size=10,
        order_cols=[F.desc("n_chars"), F.asc("doc_id")],
    )
    return out.orderBy(F.desc("n_chars"), F.asc("doc_id"))


SQL_CURSOR_PAGE = """
SELECT doc_id, n_chars FROM documents
ORDER BY n_chars DESC, doc_id LIMIT 10 OFFSET 20
"""


def q_phonetic_terms(spark, sf_dir):
    """PhoneticFilter matching: vocabulary terms sounding like 'vector'
    (American Soundex; rows-only — soundex is not ANSI-SQL-expressible
    without backreference regex, which DuckDB's RE2 lacks)."""
    from .operators.search_features import phonetic_terms

    return phonetic_terms(_tok(spark, sf_dir), "vector", 10)


def q_suggest_fuzzy(spark, sf_dir):
    """FuzzySuggester: completions for the typo'd prefix 'vectr' within
    1 edit of the candidate head."""
    from .operators.search_features import suggest_fuzzy

    return suggest_fuzzy(_tok(spark, sf_dir), "vect", 1, 10)


SQL_SUGGEST_FUZZY = f"""
WITH {_TOKS},
cand AS (
  SELECT term, count(DISTINCT doc_id) AS df,
         levenshtein(substr(term, 1, 4), 'vect') AS head_dist
  FROM tok GROUP BY term
)
SELECT term, head_dist, df FROM cand
WHERE length(term) >= 3 AND head_dist <= 1
ORDER BY df DESC, term LIMIT 10
"""


def q_result_clustering(spark, sf_dir):
    """Carrot2-style search-result clustering: tf-idf + seeded KMeans over
    the 'dup OR vector' result set (rows-only: spark.ml iteration isn't
    SQL-expressible)."""
    from .operators.search_features import result_clustering

    return result_clustering(
        _docs(spark, sf_dir), ["dup", "vector"], n_results=40, n_clusters=3
    )


REGISTRY_FEATURES.update(
    {
        "suggest_fuzzy": (q_suggest_fuzzy, SQL_SUGGEST_FUZZY),
        "result_clustering": (q_result_clustering, None),
        "term_vectors": (q_term_vectors, SQL_TERM_VECTORS),
        "query_elevation": (q_query_elevation, SQL_QUERY_ELEVATION),
        "spellcheck_collation": (q_spellcheck_collation, SQL_SPELLCHECK_COLLATION),
        "cursor_page": (q_cursor_page, SQL_CURSOR_PAGE),
        "phonetic_terms": (q_phonetic_terms, None),
    }
)


def q_suggest_infix(spark, sf_dir):
    """AnalyzingInfixSuggester over a bigram suggestion corpus built from
    the documents table (weight = bigram frequency): typing 'va' matches
    any suggestion one of whose tokens starts with 'va'."""
    from .operators.search_features import suggest_infix
    from .pipeline.dedup import shingle_grams

    sug = (
        shingle_grams(_docs(spark, sf_dir), n=2)
        .groupBy(F.col("gram").alias("suggestion"))
        .agg(F.count("*").alias("weight"))
    )
    return suggest_infix(sug, "va", 10)


SQL_SUGGEST_INFIX = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text,' ')) AS term,
         generate_subscripts(string_split(text,' '), 1) AS pos
  FROM documents),
sug AS (
  SELECT suggestion, count(*) AS weight FROM (
    SELECT DISTINCT a.doc_id, a.term || ' ' || b.term AS suggestion
    FROM tok a JOIN tok b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1)
  GROUP BY suggestion)
SELECT suggestion, weight FROM sug
WHERE len(list_filter(string_split(lower(suggestion), ' '),
                      t -> t LIKE 'va%')) > 0
ORDER BY weight DESC, suggestion LIMIT 10
"""

REGISTRY_FEATURES.update(
    {
        "suggest_infix": (q_suggest_infix, SQL_SUGGEST_INFIX),
    }
)


# ---------------------------------------------------------------------------
# Monitor / percolator (reverse search): registered queries matched against
# the document stream (lucene/monitor Monitor.java ≈L60,
# TermFilteredPresearcher.java ≈L80)
# ---------------------------------------------------------------------------

_MONITOR_QUERIES = [
    # (query_id, qtype, terms)
    (1, "any", ["customer", "vector"]),
    (2, "all", ["key", "agg", "row"]),
    (3, "phrase", ["table", "table"]),
    (4, "all", ["zzzmissing", "key"]),      # negative control: never matches
    (5, "any", ["window"]),
]


def q_monitor_match(spark, sf_dir):
    """Percolate sf documents through 5 registered queries; report matched
    docs per query. Presearcher join is term-keyed (query side broadcast),
    then per-type verification — never doc x query."""
    from .operators.monitor import monitor_match

    queries = spark.createDataFrame(
        [(i, t, terms) for i, t, terms in _MONITOR_QUERIES],
        "query_id long, qtype string, terms array<string>",
    )
    pairs = monitor_match(_tok_pos(spark, sf_dir), queries)
    return (
        pairs.groupBy("query_id")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("query_id")
    )


def _sql_monitor() -> str:
    vals = []
    for qid, qtype, terms in _MONITOR_QUERIES:
        for slot, term in enumerate(terms):
            vals.append(f"({qid}, '{qtype}', {len(terms)}, {slot}, '{term}')")
    values = ",\n    ".join(vals)
    return f"""
WITH q(query_id, qtype, n_terms, slot, term) AS (VALUES
    {values}),
tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS term,
               generate_subscripts(string_split(text,' '), 1) AS pos
        FROM documents),
dterms AS (SELECT DISTINCT doc_id, term FROM tok),
hits AS (SELECT DISTINCT d.doc_id, q.query_id, q.qtype, q.n_terms, q.slot
         FROM dterms d JOIN q USING (term)),
matched AS (SELECT doc_id, query_id, qtype, n_terms,
                   count(DISTINCT slot) AS m
            FROM hits GROUP BY doc_id, query_id, qtype, n_terms),
anyall AS (SELECT doc_id, query_id FROM matched
           WHERE qtype = 'any' OR (qtype = 'all' AND m = n_terms)),
phc AS (SELECT doc_id, query_id, n_terms FROM matched
        WHERE qtype = 'phrase' AND m = n_terms),
pho AS (SELECT DISTINCT c.doc_id, c.query_id, c.n_terms, q.slot,
               t.pos - q.slot AS anchor
        FROM phc c
        JOIN q ON q.query_id = c.query_id AND q.qtype = 'phrase'
        JOIN tok t ON t.doc_id = c.doc_id AND t.term = q.term),
phok AS (SELECT DISTINCT doc_id, query_id FROM (
           SELECT doc_id, query_id, anchor
           FROM pho GROUP BY doc_id, query_id, n_terms, anchor
           HAVING count(*) = n_terms)),
allm AS (SELECT * FROM anyall UNION SELECT * FROM phok)
SELECT query_id, count(*) AS n_docs FROM allm
GROUP BY query_id ORDER BY query_id
"""


SQL_MONITOR = _sql_monitor()

REGISTRY_FEATURES.update(
    {
        "monitor_percolate": (q_monitor_match, SQL_MONITOR),
    }
)


# ---------------------------------------------------------------------------
# Lucene classification module (lucene/classification/ — SimpleNaiveBayes,
# KNearestNeighbor, BooleanPerceptron) over the documents table, class =
# lang. operators/classification.py carries the reference citations.
# ---------------------------------------------------------------------------

def q_classify_naive_bayes(spark, sf_dir):
    """SimpleNaiveBayesClassifier: classify docs 0..9 by language using
    index-derived statistics (add-one-smoothed multinomial NB). Every
    statistic comes from one vocabulary-sized aggregation; classification
    is a broadcast join — zero corpus shuffle at serve time."""
    from .operators.classification import naive_bayes_classify

    d = _docs(spark, sf_dir)
    tok = _tok(spark, sf_dir)
    classes = d.select("doc_id", F.col("lang").alias("class"))
    qtok = tok.filter(F.col("doc_id") < 10).select(
        F.col("doc_id").alias("qid"), "term"
    )
    return naive_bayes_classify(tok, classes, qtok)


SQL_CLASSIFY_NB = """
WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS term FROM documents),
cls AS (SELECT doc_id, lang AS class FROM documents),
t AS (SELECT tok.doc_id, term, class FROM tok JOIN cls USING (doc_id)),
stats AS (SELECT term, class, count(*) AS tf_wc FROM t GROUP BY term, class),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
priors AS (SELECT class, count(*) AS n_docs, sum(coalesce(dl, 0)) AS n_tokens
           FROM cls LEFT JOIN dl USING (doc_id) GROUP BY class),
vocab AS (SELECT count(DISTINCT term) AS v FROM tok),
n AS (SELECT count(*) AS n FROM documents),
q AS (SELECT doc_id AS qid, term FROM tok WHERE doc_id < 10),
qx AS (SELECT qid, term, class FROM q CROSS JOIN (SELECT class FROM priors)),
liked AS (SELECT qid, qx.term, qx.class, coalesce(stats.tf_wc, 0) AS tf_wc
          FROM qx LEFT JOIN stats ON stats.term = qx.term AND stats.class = qx.class),
scored AS (SELECT qid, liked.class,
                  ln(priors.n_docs / CAST(n.n AS DOUBLE))
                  + sum(ln((tf_wc + 1.0) / (priors.n_tokens + vocab.v))) AS score
           FROM liked JOIN priors ON liked.class = priors.class, vocab, n
           GROUP BY qid, liked.class, priors.n_docs, n.n, vocab.v)
SELECT qid, class, ROUND(score, 4) AS score FROM (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, class) AS rn
  FROM scored) x
WHERE rn = 1 ORDER BY qid
"""


def q_classify_knn(spark, sf_dir):
    """KNearestNeighborClassifier: BM25 top-10 neighbours of docs 0..4
    (self excluded), class = argmax of summed neighbour scores."""
    from .operators.classification import knn_classify

    d = _docs(spark, sf_dir)
    tok = _tok(spark, sf_dir)
    dl = tok.groupBy("doc_id").agg(F.count("*").alias("dl"))
    n = d.count()
    avgdl = float(dl.agg(F.avg("dl")).first()[0])
    classes = d.select("doc_id", F.col("lang").alias("class"))
    qtok = (
        tok.filter(F.col("doc_id") < 5)
        .select(F.col("doc_id").alias("qid"), "term")
        .distinct()
    )
    return knn_classify(tok, dl, classes, qtok, n, avgdl, k=10)


SQL_CLASSIFY_KNN = """
WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS term FROM documents),
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
cstats AS (SELECT (SELECT count(*) FROM documents) AS n, avg(dl) AS avgdl FROM dl),
dfs AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
q AS (SELECT DISTINCT doc_id AS qid, term FROM tok WHERE doc_id < 5),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
       WHERE term IN (SELECT term FROM q) GROUP BY doc_id, term),
scored AS (SELECT q.qid, tf.doc_id,
                  sum(ln(1 + (cstats.n - dfs.df + 0.5) / (dfs.df + 0.5)) * tf.tf
                      / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / cstats.avgdl))) AS score
           FROM q JOIN tf USING (term)
           JOIN dfs ON dfs.term = q.term
           JOIN dl ON dl.doc_id = tf.doc_id, cstats
           WHERE tf.doc_id != q.qid
           GROUP BY q.qid, tf.doc_id),
topk AS (SELECT qid, doc_id, score FROM (
           SELECT qid, doc_id, score,
                  row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rn
           FROM scored) x WHERE rn <= 10),
votes AS (SELECT qid, d.lang AS class, sum(score) AS vote
          FROM topk JOIN documents d ON d.doc_id = topk.doc_id
          GROUP BY qid, d.lang)
SELECT qid, class, ROUND(vote, 4) AS vote FROM (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY vote DESC, class) AS rn
  FROM votes) x
WHERE rn = 1 ORDER BY qid
"""


def q_classify_perceptron(spark, sf_dir):
    """BooleanPerceptronClassifier (batch/pocket variant, documented
    deviation): train a binary en-vs-rest perceptron over the term space,
    classify docs 0..9. Rows-only: the epoch loop is iterative (not
    ANSI-SQL-expressible); semantics pinned by separable-fixture tests in
    tests/test_classification.py."""
    from .operators.classification import perceptron_classify, perceptron_train

    d = _docs(spark, sf_dir)
    tok = _tok(spark, sf_dir)
    labels = d.select(
        "doc_id",
        F.when(F.col("lang") == "en", 1).otherwise(-1).alias("y"),
    )
    w = perceptron_train(tok, labels, epochs=3)
    qtok = tok.filter(F.col("doc_id") < 10).select(
        F.col("doc_id").alias("qid"), "term"
    )
    return perceptron_classify(tok, w, qtok)


REGISTRY_FEATURES.update(
    {
        "classify_naive_bayes": (q_classify_naive_bayes, SQL_CLASSIFY_NB),
        "classify_knn": (q_classify_knn, SQL_CLASSIFY_KNN),
        "classify_perceptron": (q_classify_perceptron, None),
    }
)


# ---------------------------------------------------------------------------
# TermsComponent full enumeration params + FunctionRangeQuery (frange)
# ---------------------------------------------------------------------------

def q_terms_enum(spark, sf_dir):
    """TermsComponent (solr/core/.../component/TermsComponent.java):
    terms.lower/terms.upper bounds + terms.regex filter over the terms
    dictionary, returning (term, df, ttf) in index (lexicographic) order —
    the terms-dict browse surface. Pure aggregation + pushed-down range
    filter; at scale this hits the bucketed term_stats table, never the
    postings."""
    tok = _tok(spark, sf_dir)
    return (
        tok.groupBy("term")
        .agg(F.count_distinct("doc_id").alias("df"), F.count("*").alias("ttf"))
        .filter(
            (F.col("term") >= "sa") & (F.col("term") < "sz")
            & F.col("term").rlike("^s[a-z]+$")
        )
        .orderBy("term")
        .limit(20)
    )


SQL_TERMS_ENUM = """
WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS term FROM documents)
SELECT term, count(DISTINCT doc_id) AS df, count(*) AS ttf
FROM tok
WHERE term >= 'sa' AND term < 'sz' AND regexp_matches(term, '^s[a-z]+$')
GROUP BY term ORDER BY term LIMIT 20
"""


def q_frange_query(spark, sf_dir):
    """FunctionRangeQuery / {!frange l=.. u=..} (solr/core/.../search/
    FunctionRangeQuery.java): filter docs by the VALUE of a function
    query — here scale(n_chars, 0, 100) in [20, 60] — then return them
    ordered. The function is a pure Column expression evaluated in the
    scan; the min/max bind is one map-side-combined aggregate."""
    d = _docs(spark, sf_dir)
    mm = d.agg(
        F.min("n_chars").alias("lo"), F.max("n_chars").alias("hi")
    ).first()
    lo, hi = float(mm["lo"]), float(mm["hi"])
    scaled = (F.col("n_chars") - F.lit(lo)) / F.lit(hi - lo) * F.lit(100.0)
    return (
        d.select("doc_id", F.round(scaled, 4).alias("fval"))
        .filter((F.col("fval") >= 20.0) & (F.col("fval") <= 60.0))
        .orderBy("doc_id")
        .limit(50)
    )


SQL_FRANGE = """
WITH mm AS (SELECT min(n_chars) AS lo, max(n_chars) AS hi FROM documents),
s AS (SELECT doc_id,
             ROUND((n_chars - mm.lo) / CAST(mm.hi - mm.lo AS DOUBLE) * 100.0, 4) AS fval
      FROM documents, mm)
SELECT doc_id, fval FROM s WHERE fval >= 20.0 AND fval <= 60.0
ORDER BY doc_id LIMIT 50
"""


REGISTRY_FEATURES.update(
    {
        "terms_enum": (q_terms_enum, SQL_TERMS_ENUM),
        "frange_query": (q_frange_query, SQL_FRANGE),
    }
)


# ---------------------------------------------------------------------------
# grouping ngroups + context-filtered suggester (round 3b)
# ---------------------------------------------------------------------------

def q_group_ngroups(spark, sf_dir):
    """Solr group.ngroups: for docs matching term 'merge', the matched-doc
    count and the number of distinct lang groups."""
    from .operators.collapse import group_ngroups

    d = _docs(spark, sf_dir)
    hits = d.filter(F.array_contains(F.split("text", " "), "merge"))
    return group_ngroups(hits.select("doc_id", "lang"), "lang").select(
        F.col("matches").cast("long").alias("matches"),
        F.col("ngroups").cast("long").alias("ngroups"),
    )


SQL_GROUP_NGROUPS = """
WITH hits AS (
  SELECT doc_id, lang FROM documents
  WHERE list_contains(string_split(text, ' '), 'merge')
)
SELECT count(*) AS matches, count(DISTINCT lang) AS ngroups FROM hits
"""


def q_suggest_context(spark, sf_dir):
    """ContextSuggestField: prefix 'm' suggestions restricted to context
    lang='en', ranked by weight (df) desc."""
    from .operators.search_features import suggest_prefix_context

    d = _docs(spark, sf_dir)
    toks = d.select(
        "doc_id",
        F.col("lang").alias("context"),
        F.explode(F.split("text", " ")).alias("term"),
    )
    return suggest_prefix_context(toks, "m", ["en"], k=10).select(
        "term", F.col("weight").cast("long").alias("weight")
    )


SQL_SUGGEST_CONTEXT = """
WITH tok AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS term
  FROM documents
)
SELECT term, count(DISTINCT doc_id) AS weight
FROM tok WHERE lang = 'en' AND term LIKE 'm%'
GROUP BY term ORDER BY weight DESC, term LIMIT 10
"""

REGISTRY_FEATURES.update(
    {
        "group_ngroups": (q_group_ngroups, SQL_GROUP_NGROUPS),
        "suggest_context": (q_suggest_context, SQL_SUGGEST_CONTEXT),
    }
)


def q_suggest_free_text(spark, sf_dir):
    """FreeTextSuggester: complete "hash j" — candidates starting with
    'j' ranked by the stupid-backoff bigram LM behind context 'hash'."""
    from .operators.search_features import free_text_suggest

    return free_text_suggest(_tok_pos(spark, sf_dir), "hash j", k=10)


SQL_SUGGEST_FREE_TEXT = """
WITH tokp AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents),
uni AS (SELECT term, count(*) AS c1 FROM tokp GROUP BY term),
tot AS (SELECT count(*) AS t FROM tokp),
ctxp AS (SELECT doc_id, pos + 1 AS pos FROM tokp WHERE term = 'hash'),
cctx AS (SELECT count(*) AS c FROM ctxp),
big AS (SELECT t.term, count(*) AS c2 FROM tokp t
        JOIN ctxp USING (doc_id, pos) GROUP BY t.term),
cand AS (SELECT u.term, u.c1, b.c2 FROM uni u LEFT JOIN big b USING (term)
         WHERE u.term LIKE 'j%'),
sc AS (SELECT term,
              CASE WHEN c2 IS NOT NULL
                   THEN c2 * 1.0 / (SELECT c FROM cctx)
                   ELSE 0.4 * c1 / (SELECT t FROM tot) END AS score
       FROM cand)
SELECT term, ROUND(score, 6) AS score
FROM (SELECT * FROM sc ORDER BY score DESC, term LIMIT 10) q
"""

REGISTRY_FEATURES.update(
    {"suggest_free_text": (q_suggest_free_text, SQL_SUGGEST_FREE_TEXT)}
)


def q_highlight_unified_simple(spark, sf_dir):
    """UnifiedHighlighter, SIMPLE-profile tier WITH a full DuckDB oracle
    (round-4 VERDICT item 10): the simple tokenizer ([a-z0-9]+ runs over
    lowercased text) IS SQL-expressible, and on the space-separated
    documents fixture the offset-faithful snippet fold over original
    bytes equals the window's tokens joined by single spaces with
    <em></em> around matches — so snippet, passage score AND window
    choice are all value-hashed against SQL. The english-profile tier
    (highlight_unified) stays rows-only: Porter isn't SQL."""
    from .operators.search_features import highlight_unified

    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 300)
    out = highlight_unified(
        d, "doc_id", "text", "dup", profile="simple", window=12
    )
    return out.orderBy("doc_id").limit(20)


SQL_HIGHLIGHT_UNIFIED_SIMPLE = """
WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 300),
tokp AS (SELECT doc_id,
                unnest(string_split(text, ' ')) AS term,
                generate_subscripts(string_split(text, ' '), 1) - 1 AS pos
         FROM d),
tok AS (SELECT doc_id, term, pos, pos // 12 AS win FROM tokp),
m AS (SELECT * FROM tok WHERE term = 'dup'),
dfv AS (SELECT count(DISTINCT doc_id) AS df FROM m),
nd AS (SELECT count(*) AS n FROM d),
ptf AS (SELECT doc_id, win, count(*) AS tf FROM m GROUP BY doc_id, win),
ps AS (SELECT doc_id, win,
              ln(1 + (nd.n - dfv.df + 0.5) / (dfv.df + 0.5))
                * tf / (tf + 1.2) AS pscore
       FROM ptf, dfv, nd),
best AS (SELECT doc_id, win, pscore FROM (
           SELECT *, row_number() OVER (
             PARTITION BY doc_id ORDER BY pscore DESC, win ASC) AS rn
           FROM ps) WHERE rn = 1),
snip AS (SELECT t.doc_id,
                string_agg(
                  CASE WHEN t.term = 'dup'
                       THEN '<em>' || t.term || '</em>' ELSE t.term END,
                  ' ' ORDER BY t.pos) AS snippet
         FROM tok t JOIN best b ON t.doc_id = b.doc_id AND t.win = b.win
         GROUP BY t.doc_id)
SELECT b.doc_id, ROUND(b.pscore, 4) AS pscore, s.snippet
FROM best b JOIN snip s USING (doc_id)
ORDER BY b.doc_id LIMIT 20
"""

REGISTRY_FEATURES["highlight_unified_simple"] = (
    q_highlight_unified_simple, SQL_HIGHLIGHT_UNIFIED_SIMPLE,
)
