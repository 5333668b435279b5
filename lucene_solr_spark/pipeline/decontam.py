"""Cross-corpus n-gram operators for training-data hygiene:

* **Benchmark decontamination** — flag training documents sharing long
  word n-grams with an evaluation/benchmark set (the GPT-3/PaLM
  "13-gram overlap" protocol; at test scale we use shorter grams so the
  synthetic corpus actually collides). The benchmark side is small by
  definition, so its gram set is broadcast — the corpus side is scanned
  once with a narrow shingle transform and a broadcast semi-join: zero
  wide shuffles over the 100 TB side.

* **Duplicate-window (repeated substring) detection** — the signal
  behind suffix-array substring dedup (Lee et al. 2021, "Deduplicating
  Training Data Makes Language Models Better"): a k-token window whose
  hash occurs in >=2 distinct documents is a repeated span. The exact
  suffix-array construction does not distribute cheaply; the standard
  scalable approximation is fixed-k rolling windows + one hash-keyed
  aggregation, which finds every duplicated substring of length >= k.
  Shuffle width is bounded by hashing each window to 64 bits
  (xxhash64) before the exchange — the shuffle carries (doc_id, int64),
  not the window text.

Both operators are pure DataFrame compositions (shingle transform is a
narrow O(tokens) array map; one groupBy each) and inherit AQE skew
handling on the gram key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingle_grams


def _doc_grams(docs: DataFrame, n: int, text_col: str) -> DataFrame:
    """(doc_id, gram) distinct word n-grams — narrow map + explode."""
    return shingle_grams(docs, n=n, text_col=text_col)


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Per-corpus-document contamination vs the benchmark set:
    (doc_id, n_grams, contaminated_grams, contamination_frac), docs with
    at least one overlapping n-gram only.

    The benchmark gram set is broadcast (eval sets are a few thousand
    documents even when the corpus is 10^12), so the corpus side joins
    map-side with no shuffle; the per-doc aggregation is the only
    exchange, keyed by doc_id."""
    cg = _doc_grams(corpus, n, text_col)
    bg = F.broadcast(_doc_grams(benchmark, n, text_col)
                     .select("gram").distinct())
    hit = cg.join(bg, "gram", "left_semi").groupBy("doc_id").agg(
        F.count("*").alias("contaminated_grams")
    )
    tot = cg.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    return (
        tot.join(hit, "doc_id", "inner")
        .select(
            "doc_id",
            "n_grams",
            "contaminated_grams",
            F.round(
                F.col("contaminated_grams") / F.col("n_grams"), 4
            ).alias("contamination_frac"),
        )
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    max_frac: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Drop corpus docs whose contamination fraction exceeds ``max_frac``
    (0.0 = any shared n-gram removes the doc, the strict protocol)."""
    rep = contamination_report(corpus, benchmark, n, text_col)
    bad = rep.filter(F.col("contamination_frac") > max_frac).select(
        F.col("doc_id").alias(id_col)
    )
    return corpus.join(bad, id_col, "left_anti")


def duplicate_window_stats(
    docs: DataFrame, k: int = 8, text_col: str = "text"
) -> DataFrame:
    """Corpus-level repeated-span summary: total distinct (doc, window)
    pairs, number of distinct windows duplicated across >=2 docs, the
    max cross-doc df of any window, and how many docs contain at least
    one duplicated window."""
    g = _doc_grams(docs, k, text_col).select(
        "doc_id", F.xxhash64("gram").alias("wh")
    )
    df_per_window = g.groupBy("wh").agg(
        F.count("*").alias("df")
    )
    dup = df_per_window.filter(F.col("df") >= 2)
    docs_hit = (
        g.join(dup.select("wh"), "wh", "left_semi")
        .select("doc_id")
        .distinct()
        .count()
    )
    row = df_per_window.agg(
        F.count("*").alias("distinct_windows"),
        F.sum("df").alias("doc_windows"),
        F.sum(F.when(F.col("df") >= 2, 1).otherwise(0)).alias(
            "dup_windows"
        ),
        F.max("df").alias("max_df"),
    )
    return row.select(
        "doc_windows",
        "distinct_windows",
        "dup_windows",
        "max_df",
        F.lit(docs_hit).cast("long").alias("docs_with_dup_span"),
    )


def duplicate_window_fraction(
    docs: DataFrame, k: int = 8, text_col: str = "text"
) -> DataFrame:
    """Per-doc fraction of k-token windows that also occur in ANOTHER
    document — the filter signal used to drop or trim heavily-duplicated
    pages. (doc_id, windows, dup_windows, dup_frac)."""
    g = _doc_grams(docs, k, text_col).select(
        "doc_id", F.xxhash64("gram").alias("wh")
    )
    # a window counts as duplicated for THIS doc when some other doc has
    # it: cross-doc df >= 2 (grams are distinct per doc already)
    dup = g.groupBy("wh").agg(F.count("*").alias("df"))
    per_doc = (
        g.join(dup, "wh")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("windows"),
            F.sum(F.when(F.col("df") >= 2, 1).otherwise(0)).alias(
                "dup_windows"
            ),
        )
    )
    return per_doc.select(
        "doc_id",
        "windows",
        "dup_windows",
        F.round(F.col("dup_windows") / F.col("windows"), 4).alias(
            "dup_frac"
        ),
    )


def semantic_contamination(
    corpus: DataFrame,
    eval_small: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.99,
) -> DataFrame:
    """Embedding-space decontamination — the semantic complement of the
    n-gram overlap protocol (used alongside it by recent LLM data
    pipelines: near-duplicates of eval items that share no long n-gram
    still leak through paraphrase; cosine similarity in embedding space
    catches them).

    For each corpus vector: max cosine against the (small, broadcast)
    eval set, plus a `contaminated` flag at ``threshold``. The eval side
    is broadcast — the 100 TB corpus side is scanned ONCE with per-row
    cost |eval|·dim inside whole-stage codegen (zip_with/aggregate JVM
    expressions, no Python); no wide shuffle besides the final per-id
    max, which is map-side combined."""
    from .similarity import _dot, _norm, as_double

    ev = eval_small.select(
        F.col(id_col).alias("_eval_id"),
        as_double(F.col(vec_col)).alias("_ev"),
    )
    v = as_double(F.col(vec_col))
    cos = _dot(v, F.col("_ev")) / (_norm(v) * _norm(F.col("_ev")))
    per_pair = corpus.crossJoin(F.broadcast(ev)).select(
        F.col(id_col), cos.alias("_cos")
    )
    return (
        per_pair.groupBy(id_col)
        .agg(F.max("_cos").alias("max_cos"))
        .select(
            id_col,
            F.round("max_cos", 4).alias("max_cos"),
            (F.col("max_cos") >= threshold).alias("contaminated"),
        )
    )
