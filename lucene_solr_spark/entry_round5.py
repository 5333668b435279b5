"""Round-5 driver-contract entries.

Tranche 41 — Snowball multilingual stemming (snowball.py): the German /
French / Spanish chains the round-4 verdict ranked as the top remaining
real-user gap. Each entry injects a FIXED vocabulary into the token
stream (deterministic by position) and stems it with the Python
implementation; the DuckDB oracle independently hard-codes the expected
stem per vocabulary word (the golden vectors of tests/test_snowball.py,
each hand-traced through the published Snowball specification) — so the
value-hash compares the distributed chain against an independently
stated truth, not against itself.

Reference twins: lucene/analysis/common/src/java/org/apache/lucene/
analysis/{de/GermanAnalyzer.java, fr/FrenchAnalyzer.java,
es/SpanishAnalyzer.java} + the generated SnowballStemmer subclasses.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .entry_queries import _tok


def _stem_entry(spark, sf_dir, vocab: list, stem_fn, elision: bool = False):
    """Inject vocab[pos % n] as the term, stem via mapInPandas."""
    tok = _tok(spark, sf_dir).filter(F.col("doc_id") < 10)
    arr = F.array(*[F.lit(w) for w in vocab])
    injected = tok.select(
        "doc_id",
        "pos",
        F.element_at(arr, (F.col("pos") % len(vocab)) + 1).alias("word"),
    )

    def apply_stem(it):
        from .analysis import elision_filter

        for pdf in it:
            pdf = pdf.copy()
            if elision:
                pdf["stem"] = pdf["word"].map(
                    lambda w: stem_fn(elision_filter(w).lower())
                )
            else:
                pdf["stem"] = pdf["word"].map(lambda w: stem_fn(w.lower()))
            yield pdf[["doc_id", "pos", "word", "stem"]]

    out = injected.mapInPandas(
        apply_stem, "doc_id long, pos int, word string, stem string"
    )
    return out.orderBy("doc_id", "pos")


_DE_VOCAB = [
    ("laufen", "lauf"),
    ("lebendig", "lebend"),
    ("bedürfnisse", "bedurfnis"),
    ("kategorie", "kategori"),
    ("abhängen", "abhang"),
    ("häuser", "haus"),
    ("zeitungen", "zeitung"),
    ("heimlichkeit", "heimlich"),
    ("straße", "strass"),
    ("forderung", "forder"),
]

_FR_VOCAB = [
    ("continuité", "continu"),
    ("majestueux", "majestu"),
    ("principaux", "principal"),
    ("l'amitié", "amiti"),
    ("politique", "polit"),
    ("mangeaient", "mang"),
    ("nationale", "national"),
    ("confusion", "confus"),
    ("administrativement", "administr"),
    ("chèvres", "chevr"),
]

_ES_VOCAB = [
    ("apresuradamente", "apresur"),
    ("comiendo", "com"),
    ("guerra", "guerr"),
    ("agradecería", "agradec"),
    ("haciéndola", "hac"),
    ("llegues", "lleg"),
    ("valientes", "valient"),
    ("amablemente", "amabl"),
    ("conveniencia", "convenient"),
    ("cañón", "cañon"),
]


def q_analysis_stem_de(spark, sf_dir):
    from .snowball import german_stem

    return _stem_entry(spark, sf_dir, [w for w, _ in _DE_VOCAB], german_stem)


def q_analysis_stem_fr(spark, sf_dir):
    from .snowball import french_stem

    return _stem_entry(
        spark, sf_dir, [w for w, _ in _FR_VOCAB], french_stem, elision=True
    )


def q_analysis_stem_es(spark, sf_dir):
    from .snowball import spanish_stem

    return _stem_entry(spark, sf_dir, [w for w, _ in _ES_VOCAB], spanish_stem)


def _stem_sql(vocab: list) -> str:
    arr = ", ".join("'%s'" % w.replace("'", "''") for w, _ in vocab)
    cases = "\n".join(
        "         WHEN '%s' THEN '%s'"
        % (w.replace("'", "''"), s.replace("'", "''"))
        for w, s in vocab
    )
    return f"""
WITH tok AS (
  SELECT doc_id,
         CAST(generate_subscripts(string_split(text, ' '), 1) AS INT) AS pos
  FROM documents WHERE doc_id < 10),
inj AS (
  SELECT doc_id, pos,
         ([{arr}])[(pos % {len(vocab)}) + 1] AS word
  FROM tok)
SELECT doc_id, pos, word,
       CASE word
{cases}
       END AS stem
FROM inj ORDER BY doc_id, pos
"""


SQL_STEM_DE = _stem_sql(_DE_VOCAB)
SQL_STEM_FR = _stem_sql(_FR_VOCAB)
SQL_STEM_ES = _stem_sql(_ES_VOCAB)


REGISTRY_R5: dict[str, tuple] = {
    "analysis_stem_de": (q_analysis_stem_de, SQL_STEM_DE),
    "analysis_stem_fr": (q_analysis_stem_fr, SQL_STEM_FR),
    "analysis_stem_es": (q_analysis_stem_es, SQL_STEM_ES),
}


# ---------------------------------------------------------------------------
# Tranche 42 — IVF-PQ composition (IVFADC, Jegou 2011): trained coarse
# cells -> residual PQ codes -> per-cell ADC scan -> exact rerank.
# rows_only: the trained KMeans/PQ codebooks are not SQL-expressible;
# recall >= 0.9 vs brute force + partition-prune plan are pinned in
# tests/test_ivfpq.py.
# ---------------------------------------------------------------------------


def q_ann_ivfpq_topk(spark, sf_dir):
    import os

    from .pipeline.pq import ivfpq_build, ivfpq_topk

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    codes, centroids, cb = ivfpq_build(
        emb, n_centroids=8, m=8, ksub=16, seed=42
    )
    q = [float(x) for x in emb.orderBy("vec_id").limit(1).collect()[0]["embedding"]]
    out = ivfpq_topk(
        emb, codes, centroids, cb, q, nprobe=6, candidates=64, k=10
    )
    return out


REGISTRY_R5["ann_ivfpq_topk"] = (q_ann_ivfpq_topk, None)


# ---------------------------------------------------------------------------
# Tranche 43 — LambdaMART TRAINING (Burges 2010; closes the verdict's
# last missing row: inference existed, training now does too).
# rows_only: spark.ml tree fits are not SQL-expressible; NDCG-improves
# and evaluator-compatibility are pinned in tests/test_lambdamart.py.
# ---------------------------------------------------------------------------


def q_ltr_lambdamart_train(spark, sf_dir):
    from .operators.ml import lambdamart_train
    from .operators.search_features import ltr_trees_rescore

    ev = _t_events(spark, sf_dir).filter(F.col("event_id") < 400)
    data = ev.select(
        (F.col("event_id") % 8).cast("string").alias("qid"),
        F.col("event_id").alias("doc_id"),
        # deterministic learnable label: monotone in value with a bucket
        F.least(F.lit(4.0), F.floor(F.col("value") / 40.0).cast("double")).alias(
            "label"
        ),
        (F.col("value") / 200.0).alias("f1"),
        (F.col("event_id") % 7).cast("double").alias("f2"),
    )
    trees = lambdamart_train(
        data, "qid", "label", ["f1", "f2"], n_trees=3, lr=0.2, max_depth=2
    )
    one_q = data.filter(F.col("qid") == "0")
    return ltr_trees_rescore(
        one_q, features={}, trees=trees, k=10
    ).select("doc_id", "label", F.round("ltr_score", 4).alias("ltr_score"))


def _t_events(spark, sf_dir):
    import os

    return spark.read.parquet(os.path.join(sf_dir, "events.parquet"))


REGISTRY_R5["ltr_lambdamart_train"] = (q_ltr_lambdamart_train, None)


# ---------------------------------------------------------------------------
# Tranche 44 — Italian / Portuguese Snowball (same oracle design as
# tranche 41: golden stems stated independently in SQL).
# ---------------------------------------------------------------------------

_IT_VOCAB = [
    ("abbandonata", "abbandon"),
    ("pronto", "pront"),
    ("felicità", "felic"),
    ("mangiarla", "mang"),
    ("nazionale", "nazional"),
    ("azione", "azion"),
    ("belli", "bell"),
    ("amichevole", "amichevol"),
]

_PT_VOCAB = [
    ("cantando", "cant"),
    ("bonita", "bonit"),
    ("importância", "import"),
    ("corações", "coraçõ"),
    ("nacional", "nacional"),
    ("grandeza", "grandez"),
    ("felizmente", "feliz"),
]


def q_analysis_stem_it(spark, sf_dir):
    from .snowball import italian_stem

    return _stem_entry(spark, sf_dir, [w for w, _ in _IT_VOCAB], italian_stem)


def q_analysis_stem_pt(spark, sf_dir):
    from .snowball import portuguese_stem

    return _stem_entry(spark, sf_dir, [w for w, _ in _PT_VOCAB], portuguese_stem)


REGISTRY_R5["analysis_stem_it"] = (q_analysis_stem_it, _stem_sql(_IT_VOCAB))
REGISTRY_R5["analysis_stem_pt"] = (q_analysis_stem_pt, _stem_sql(_PT_VOCAB))


# ---------------------------------------------------------------------------
# Tranche 45 — UAX#29 WB15/16 + emoji tokenization as a driver entry:
# deterministic emoji strings injected by position, tokenized by the
# real chain (mapInPandas over tokenize_standard); the oracle hard-codes
# the expected token list per injected string (golden vectors of
# tests/test_analysis.py, independently restated in SQL).
# ---------------------------------------------------------------------------

_EMOJI_VOCAB = [
    # (injected string, expected space-joined token list)
    ("go\U0001F1FA\U0001F1F8now", "go \U0001F1FA\U0001F1F8 now"),
    ("\U0001F1FA\U0001F1F8\U0001F1EB\U0001F1F7",
     "\U0001F1FA\U0001F1F8 \U0001F1EB\U0001F1F7"),
    ("\U0001F600\U0001F600", "\U0001F600 \U0001F600"),
    ("hi\U0001F468‍\U0001F469‍\U0001F467ok",
     "hi \U0001F468‍\U0001F469‍\U0001F467 ok"),
    ("\U0001F44D\U0001F3FD", "\U0001F44D\U0001F3FD"),
    ("a⚡b", "a ⚡ b"),
]


def q_analysis_emoji_tokens(spark, sf_dir):
    tok = _tok(spark, sf_dir).filter(F.col("doc_id") < 5)
    arr = F.array(*[F.lit(w) for w, _ in _EMOJI_VOCAB])
    injected = tok.select(
        "doc_id",
        "pos",
        F.element_at(arr, (F.col("pos") % len(_EMOJI_VOCAB)) + 1).alias("s"),
    )

    def apply_tok(it):
        from .analysis import tokenize_standard

        for pdf in it:
            pdf = pdf.copy()
            pdf["tokens"] = pdf["s"].map(
                lambda t: " ".join(tokenize_standard(t))
            )
            yield pdf[["doc_id", "pos", "s", "tokens"]]

    out = injected.mapInPandas(
        apply_tok, "doc_id long, pos int, s string, tokens string"
    )
    return out.orderBy("doc_id", "pos")


def _emoji_sql() -> str:
    arr = ", ".join("'%s'" % w for w, _ in _EMOJI_VOCAB)
    cases = "\n".join(
        "         WHEN '%s' THEN '%s'" % (w, t) for w, t in _EMOJI_VOCAB
    )
    return f"""
WITH tok AS (
  SELECT doc_id,
         CAST(generate_subscripts(string_split(text, ' '), 1) AS INT) AS pos
  FROM documents WHERE doc_id < 5),
inj AS (
  SELECT doc_id, pos,
         ([{arr}])[(pos % {len(_EMOJI_VOCAB)}) + 1] AS s
  FROM tok)
SELECT doc_id, pos, s,
       CASE s
{cases}
       END AS tokens
FROM inj ORDER BY doc_id, pos
"""


REGISTRY_R5["analysis_emoji_tokens"] = (q_analysis_emoji_tokens, _emoji_sql())
