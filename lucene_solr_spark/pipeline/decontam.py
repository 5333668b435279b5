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
    max_brute_cells: int = 5_000_000,
    n_planes: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Embedding-space decontamination — the semantic complement of the
    n-gram overlap protocol (used alongside it by recent LLM data
    pipelines: near-duplicates of eval items that share no long n-gram
    still leak through paraphrase; cosine similarity in embedding space
    catches them).

    For each corpus vector: max cosine against the (small, broadcast)
    eval set, plus a `contaminated` flag at ``threshold``.

    Brute/ANN crossover: the default plan is a broadcast nested loop —
    the 100 TB corpus side is scanned ONCE with per-row cost |eval|·dim
    multiply-adds inside whole-stage codegen (zip_with/aggregate JVM
    expressions, no Python); no wide shuffle besides the final per-id
    max, which is map-side combined. That is the right plan while
    |eval| · dim <= ``max_brute_cells`` (default 5e6 ≈ a 5k-item eval set
    at dim 1024, single-digit µs/row). BEYOND the cap (say a 10^6-row
    eval set) the per-row loop dominates the scan, so the function
    automatically switches to the hyperplane-LSH gated path: bucket
    corpus and eval vectors on sign(plane·v), single-bit multiprobe on
    the (small) eval side, cosine only within candidate buckets, per-id
    max, then a left join so no-candidate corpus rows keep their row
    (max_cos null, contaminated false) — the same bucket shape as
    similarity.embedding_cosine_near_dups. The gated path is exact for
    the `contaminated` flag with high probability (near-dups at
    threshold >= ~0.9 collide in the probed buckets) but approximate for
    max_cos on far-away rows; which path ran is recorded in
    metrics.CAP_METRICS['semantic_contamination.path']."""
    from .metrics import record_cap
    from .similarity import _dot, _norm, as_double

    ev = eval_small.select(
        F.col(id_col).alias("_eval_id"),
        as_double(F.col(vec_col)).alias("_ev"),
    )
    v = as_double(F.col(vec_col))
    dim = int(
        corpus.select(F.size(vec_col).alias("d")).limit(1).first()["d"]
    )
    n_eval = eval_small.count()
    flag = lambda c: (F.col(c) >= threshold).alias("contaminated")  # noqa: E731
    if n_eval * dim <= max_brute_cells:
        record_cap(
            "semantic_contamination.path", kept=n_eval, dropped=0,
            path="brute", cells=n_eval * dim,
        )
        cos = _dot(v, F.col("_ev")) / (_norm(v) * _norm(F.col("_ev")))
        per_pair = corpus.crossJoin(F.broadcast(ev)).select(
            F.col(id_col), cos.alias("_cos")
        )
        return (
            per_pair.groupBy(id_col)
            .agg(F.max("_cos").alias("max_cos"))
            .select(
                id_col, F.round("max_cos", 4).alias("max_cos"),
                flag("max_cos"),
            )
        )
    # ---- LSH-gated path (|eval|·dim above the brute crossover) ----------
    import numpy as np

    record_cap(
        "semantic_contamination.path", kept=n_eval, dropped=0,
        path="lsh", cells=n_eval * dim, n_planes=n_planes,
    )
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))

    def bucket_of(col):
        b = F.lit(0)
        for i in range(n_planes):
            p = F.array(*[F.lit(float(x)) for x in planes[i]])
            b = b + F.when(_dot(col, p) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        return b

    cb = corpus.select(F.col(id_col), v.alias("_v")).withColumn(
        "_bkt", bucket_of(F.col("_v"))
    )
    ev_probes = (
        ev.withColumn("_b0", bucket_of(F.col("_ev")))
        .select(
            "_ev",
            F.explode(
                F.array(
                    F.col("_b0"),
                    *[
                        F.col("_b0").bitwiseXOR(F.lit(1 << i))
                        for i in range(n_planes)
                    ],
                )
            ).alias("_bkt"),
        )
    )
    cos = _dot(F.col("_v"), F.col("_ev")) / (
        _norm(F.col("_v")) * _norm(F.col("_ev"))
    )
    best = (
        cb.join(F.broadcast(ev_probes), "_bkt")
        .select(F.col(id_col), cos.alias("_cos"))
        .groupBy(id_col)
        .agg(F.max("_cos").alias("max_cos"))
    )
    return (
        corpus.select(id_col)
        .join(best, id_col, "left")
        .select(
            id_col,
            F.round("max_cos", 4).alias("max_cos"),
            F.coalesce(F.col("max_cos") >= threshold, F.lit(False)).alias(
                "contaminated"
            ),
        )
    )
