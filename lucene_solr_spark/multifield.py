"""Multi-field document model — Lucene's Document/Field structure.

Lucene keeps ONE inverted index per indexed field: FieldInfos enumerates
the fields, PerFieldPostingsFormat routes each field's postings to its own
terms dictionary, norms are per-field arrays, and collection statistics
(docCount, sumTotalTermFreq, avgFieldLength) are per-field
(lucene/core/.../index/FieldInfos.java; .../codecs/perfield/
PerFieldPostingsFormat.java; CollectionStatistics per field in
IndexSearcher#collectionStatistics).

Spark restatement: one single-field index (indexer.build_index — the full
proven pipeline: vectorized analysis, one bucket exchange, packed blocks)
per field under ``out_dir/<field>/``.  The per-field indexes share the
dense doc-id space FOR FREE: ids.assign_dense_ids mints
``doc_id = rank of url``, a pure function of the url set, so every
per-field build over the same corpus produces identical ids (property
asserted in tests/test_multifield.py).  Per-field stats, norms and
per-field similarity then fall out of the per-field indexes exactly as in
Lucene — no cross-field coupling anywhere in the build.

Scale note (10^12 docs): fields build independently (Lucene likewise
inverts each field of a document separately), so the multi-field build is
F sequential (or concurrent) runs of the proven single-field plan; no new
shuffle shape is introduced.  Queries touch only the indexes of the
fields they reference — a title-only query never scans body postings,
the analog of Lucene reading only that field's terms dictionary.

Cross-field scoring implemented here:

* ``search_field``           — fielded TermQuery/etc (``title:foo``).
* ``dismax_fields``          — eDisMax ``qf``: per query term, take the
  max field score (+ tie * remainder), then sum over terms
  (DisjunctionMaxQuery per term — ExtendedDismaxQParser's main clause).
* ``combined_sum_fields``    — per-field similarity sum: each field
  scored under ITS OWN similarity (PerFieldSimilarityWrapper semantics,
  .../similarities/PerFieldSimilarityWrapper.java) with per-field
  collection stats, summed across fields (BooleanQuery of fielded terms).

Every path is a single Spark plan: bucket-pruned postings scans unioned,
one or two hash aggregations, TakeOrderedAndProject — no driver loops.
"""

from __future__ import annotations

import os
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .indexer import build_index, read_index
from .search import Searcher


def build_multifield_index(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    fields: dict,
    **build_kw,
) -> dict:
    """Build one index per field.

    ``docs`` must carry ``url`` (unique doc key) and ``lang``; ``fields``
    maps field name -> Column expression producing that field's text
    (e.g. ``{"title": F.col("title"), "body": F.col("text")}``).
    Returns ``{field: read_index(...)}``.  Doc ids are identical across
    the per-field indexes (rank-of-url, see module docstring).
    """
    out = {}
    for name, col in fields.items():
        d = docs.select("url", "lang", col.alias("text"))
        sub = os.path.join(out_dir, name)
        build_index(spark, d, sub, **build_kw)
        out[name] = read_index(spark, sub)
    return out


class MultiFieldSearcher:
    """Fielded search over per-field indexes sharing one doc-id space.

    ``similarities`` maps field -> similarity name (default "bm25") — the
    PerFieldSimilarityWrapper hook: each field's scorer uses that field's
    own collection stats (N_f, avgdl_f) under its own similarity.
    """

    def __init__(self, indexes: dict, similarities: dict | None = None):
        sims = similarities or {}
        self.searchers: dict[str, Searcher] = {
            f: Searcher(ix, similarity=sims.get(f, "bm25"))
            for f, ix in indexes.items()
        }

    def search_field(self, field: str, query, k: int = 10) -> DataFrame:
        """Fielded query (``title:foo``) — only that field's index is
        touched, the analog of seeking one field's terms dictionary."""
        return self.searchers[field].search(query, k, with_fields=False)

    # ---- cross-field leaf frames ------------------------------------------
    def _term_frames(self, terms, field_boosts) -> list[DataFrame]:
        """One (doc_id, _qt, score) frame per (present term, field), each a
        bucket-pruned postings scan scored under the field's similarity."""
        frames = []
        for fname, boost in field_boosts.items():
            s = self.searchers[fname]
            stats = s._stats_for(list(terms))
            for t in terms:
                st = stats.get(t)
                if st is None:
                    continue
                p = s._term_postings(t)
                sc = s._score_expr(
                    F.col("tf"), F.col("dlq"), st["df"], float(boost)
                )
                frames.append(
                    p.select(
                        "doc_id",
                        F.lit(t).alias("_qt"),
                        sc.alias("score"),
                    )
                )
        return frames

    def _empty(self) -> DataFrame:
        return next(iter(self.searchers.values()))._empty()

    def dismax_fields(
        self, terms: list, qf: dict, k: int = 10, tie: float = 0.0
    ) -> DataFrame:
        """eDisMax ``qf``: score(doc) = Σ_term [ max_field(boost_f ·
        score_f(term)) + tie · (Σ_field − max_field) ]
        (ExtendedDismaxQParser builds one DisjunctionMaxQuery per query
        term over the qf fields — solr/.../ExtendedDismaxQParser.java).
        One plan: union of bucket-pruned scans → (doc, term) dismax agg →
        doc sum agg → TakeOrderedAndProject."""
        frames = self._term_frames(terms, qf)
        if not frames:
            return self._empty()
        u = reduce(lambda a, b: a.unionByName(b), frames)
        per_term = (
            u.groupBy("doc_id", "_qt")
            .agg(F.max("score").alias("_mx"), F.sum("score").alias("_sm"))
            .select(
                "doc_id",
                (
                    F.col("_mx")
                    + F.lit(float(tie)) * (F.col("_sm") - F.col("_mx"))
                ).alias("score"),
            )
        )
        return (
            per_term.groupBy("doc_id")
            .agg(F.sum("score").alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
        )

    def combined_sum_fields(
        self, terms: list, field_boosts: dict, k: int = 10
    ) -> DataFrame:
        """BooleanQuery of fielded SHOULD terms, each field under its own
        similarity (PerFieldSimilarityWrapper): score(doc) =
        Σ_field Σ_term boost_f · sim_f(term, doc)."""
        frames = self._term_frames(terms, field_boosts)
        if not frames:
            return self._empty()
        u = reduce(lambda a, b: a.unionByName(b), frames)
        return (
            u.groupBy("doc_id")
            .agg(F.sum("score").alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
        )

    def combined_field_query(
        self, terms: list, field_weights: dict, k: int = 10
    ) -> DataFrame:
        """CombinedFieldQuery / BM25F (lucene/sandbox/.../search/
        CombinedFieldQuery.java ≈L60): the fields merge into ONE
        pseudo-field BEFORE BM25, instead of mixing per-field scores:

          tf'(d)  = Σ_f w_f · tf_f(d)
          dl'(d)  = Σ_f w_f · dl_f(d)      (every field's length counts,
                                            matched or not)
          avgdl'  = Σ_f w_f · avgdl_f      (== avg of dl' when all docs
                                            carry all fields)
          df(t)   = max_f df_f(t)          (the reference's pseudo-
                                            TermStatistics merge)

        then ONE BM25 saturation over the pseudo-field — a long title hit
        cannot dominate the way a per-field dismax can. Plan: per-field
        bucket-pruned postings scans unioned, one (doc, term) agg, one
        doc-keyed join to the combined-length table, broadcast (term, df)
        bind, final per-doc sum. No driver loops; the per-field scans are
        the same ones a fielded query does."""
        from . import BM25_B, BM25_K1
        from .score import bm25_score

        frames = []
        dl_cols = []
        dl_frames = []
        avgdl_p = 0.0
        n = None
        term_df: dict[str, int] = {}
        for fname, w in field_weights.items():
            s = self.searchers[fname]
            n = s.n_docs
            avgdl_p += float(w) * float(s.avgdl)
            stats = s._stats_for(list(terms))
            for t in terms:
                st = stats.get(t)
                if st is None:
                    continue
                term_df[t] = max(term_df.get(t, 0), st["df"])
                frames.append(
                    s._term_postings(t).select(
                        "doc_id",
                        F.lit(t).alias("_qt"),
                        (F.col("tf") * F.lit(float(w))).alias("_wtf"),
                    )
                )
            dl_frames.append(
                s.docmeta.select(
                    "doc_id",
                    (F.col("field_len").cast("double") * F.lit(float(w)))
                    .alias(f"_dl_{fname}"),
                )
            )
            dl_cols.append(f"_dl_{fname}")
        if not frames:
            return self._empty()
        u = reduce(lambda a, b: a.unionByName(b), frames)
        g = u.groupBy("doc_id", "_qt").agg(F.sum("_wtf").alias("_tf"))
        dlj = reduce(lambda a, b: a.join(b, "doc_id"), dl_frames)
        combined_dl = reduce(
            lambda a, b: a + b, [F.col(c) for c in dl_cols]
        ).alias("_cdl")
        dlj = dlj.select("doc_id", combined_dl)
        spark = dlj.sparkSession
        dfs = spark.createDataFrame(
            [(t, float(df)) for t, df in term_df.items()],
            "_qt string, _df double",
        )
        per = g.join(dlj, "doc_id").join(F.broadcast(dfs), "_qt")
        sc = bm25_score(
            F.col("_tf"), F.col("_cdl"), F.col("_df"), n, avgdl_p,
            BM25_K1, BM25_B, 1.0,
        )
        return (
            per.select("doc_id", sc.alias("score"))
            .groupBy("doc_id")
            .agg(F.sum("score").alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
        )


def build_multilang_index(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    langs: tuple = ("en", "de", "fr", "es"),
    default_profile: str = "standard",
    **build_kw,
) -> dict:
    """Language-gated indexing — the Solr per-language-collection pattern
    (one schema/analyzer per language; SolrCloud routes each document to
    its language's collection and fans queries out across them).

    Each language's documents build their OWN index under
    ``out_dir/<lang>/`` with that language's analysis chain (en ->
    EnglishAnalyzer, de/fr/es -> Snowball chains from snowball.py, other
    -> `default_profile`, the stem-disabled StandardAnalyzer fallback).
    Unlike build_multifield_index, the per-language indexes do NOT share
    a doc-id space (disjoint url subsets — exactly the per-collection
    model); cross-language search merges by score with the url as the
    stable key (multilang_search).

    Scale: L independent runs of the proven single-field build plan, each
    over ONLY its language's partition of the corpus — the lang filter is
    pushed to the parquet scan, and no new shuffle shape appears.
    """
    from .analysis import ANALYZERS

    out = {}
    for lang in langs:
        profile = lang if lang in ANALYZERS else default_profile
        d = docs.filter(F.col("lang") == lang).select("url", "lang", "text")
        sub = os.path.join(out_dir, lang)
        build_index(spark, d, sub, profile=profile, **build_kw)
        out[lang] = read_index(spark, sub)
    return out


def multilang_search(
    indexes: dict, queries_by_lang: dict, k: int = 10
) -> DataFrame:
    """Cross-language top-k merge: run each language's (already analyzed
    or analyzable) query against its own index and merge by
    (score desc, url asc) — the SolrCloud inter-collection TopDocs.merge
    with url as the global stable key (per-collection doc ids are not
    comparable). ``queries_by_lang`` maps lang -> query (str or AST)."""
    frames = []
    for lang, q in queries_by_lang.items():
        ix = indexes.get(lang)
        if ix is None:
            continue
        s = Searcher(ix)
        top = s.search(q, k, with_fields=True).select(
            F.lit(lang).alias("lang"), "url", "score"
        )
        frames.append(top)
    if not frames:
        raise ValueError("no queried language has an index")
    u = reduce(lambda a, b: a.unionByName(b), frames)
    return u.orderBy(F.desc("score"), F.asc("url")).limit(k)
