"""Block-max WAND top-k over packed posting blocks.

Spark restatement of Lucene's WANDScorer / ImpactsDISI (SURVEY.md §3.4,
§5.3 item 1; lucene/core/src/java/org/apache/lucene/search/WANDScorer.java
≈L60, MaxScoreCache.java ≈L40, BlockMaxConjunctionScorer.java ≈L40):

  Lucene: per segment, iterators keep per-block max impacts; once the
  top-k heap is full, blocks whose summed max-score can't beat the k-th
  score are skipped (advanceShallow).

  Ours: packed blocks are doc-RANGE aligned across terms (indexer:
  blk = doc_id // BLOCK_SPAN), so

    1. the *bound pass* is pure metadata SQL: per (term, blk) upper bound
       ub = idf * score(max_tf, min_dlq); per-blk bound = sum of its
       terms' ubs (a groupBy over a few thousand tiny rows — JVM-side);
    2. the *threshold* θ is estimated by exactly scoring only the most
       promising blocks (highest sum-ub), k-th score of that subset —
       a valid (conservative) lower bound of the true k-th score;
    3. the *prune*: only blocks with sum_ub >= θ are decoded at all;
    4. the *kernel*: every doc's full score lives inside ONE blk group
       (alignment!), so scoring is applyInPandas per blk — decode
       varint blocks, numpy-accumulate over a dense local score array,
       emit the per-blk top-k. No (doc_id, score) shuffle ever happens:
       the only shuffled rows are k rows per surviving block.
    5. global top-k = orderBy(score desc, doc_id).limit(k) over those.

Soundness: ub uses the same float64 BM25 formula inflated by (1+1e-9), so
ub >= any achievable score in the block; θ from a subset <= true k-th
score; hence no pruned block can contain a true top-k doc (ties included,
since survivors use >=). Verified against the exhaustive scorer in tests
(the TestWANDScorer differential-oracle pattern, SURVEY.md §6.1).
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import BM25_B, BM25_K1
from . import indexer as _indexer

_UB_SLACK = 1.0 + 1e-9


def _bm25(tf, dlq, idf: float, avgdl: float) -> np.ndarray:
    norm = BM25_K1 * (1.0 - BM25_B + BM25_B * dlq / avgdl)
    return idf * tf / (tf + norm)


class WandSearcher:
    """Top-k disjunction/conjunction over a packed index (read_index dict)."""

    def __init__(self, index: dict):
        if "packed" not in index:
            raise ValueError("index has no packed postings (build with packed=True)")
        self._index = index  # scorer-selection fallback needs the flat tables
        self.packed: DataFrame = index["packed"]
        self.term_stats: DataFrame = index["term_stats"]
        # liveDocs mask (segments with uncompacted delete-by-query
        # tombstones): packed blocks still contain deleted docs, so the
        # kernel emits ALL block hits (no per-blk truncation) and the mask
        # anti-joins before every top-k cut — deleted docs can neither rank
        # nor displace live docs
        self.deletes: DataFrame | None = index.get("deletes")
        self.n_docs: int = index["stats"]["doc_count"]
        self.avgdl: float = float(index["stats"]["avgdl"])
        self.num_buckets: int = int(index["stats"].get("num_buckets", 16))
        # below this many candidate blocks, θ-probing costs more than it
        # saves (an extra Spark round trip) — decode everything instead
        self.probe_threshold: int = 64
        # TermStates cache over the immutable snapshot (same contract as
        # Searcher._term_states): df per term never changes, so repeated
        # query terms skip the stats-bind job. None = absent term.
        self._term_states: dict[str, int | None] = {}

    def _mask(self, hits: DataFrame) -> DataFrame:
        """liveDocs filter on kernel output (no-op without tombstones)."""
        if self.deletes is None:
            return hits
        return hits.join(self.deletes, "doc_id", "left_anti")

    def _pruned(self, df: DataFrame, terms: list[str]) -> DataFrame:
        if "bucket" in df.columns:
            from .xxhash import bucket_of_term

            buckets = sorted(
                {bucket_of_term(t, self.num_buckets) for t in terms}
            )
            df = df.filter(F.col("bucket").isin(buckets))
        return df

    def _idfs(self, terms: list[str]) -> tuple[dict[str, float], dict[str, int]]:
        """(term -> idf, term -> query multiplicity).

        A repeated query term is a repeated disjunction clause in Lucene
        (DisjunctionSumScorer sums it once per clause), so its contribution
        is weighted by multiplicity rather than deduped away.
        """
        from collections import Counter

        weights = dict(Counter(terms))
        uniq = list(weights)
        cache = self._term_states
        missing = sorted(t for t in uniq if t not in cache)
        if missing:
            rows = (
                self._pruned(self.term_stats, missing)
                .filter(F.col("term").isin(missing))
                .select("term", "df")
                .collect()
            )
            for t in missing:
                cache[t] = None
            for r in rows:
                cache[r["term"]] = int(r["df"])
        n = self.n_docs
        idfs = {
            t: math.log(1.0 + (n - cache[t] + 0.5) / (cache[t] + 0.5))
            for t in uniq
            if cache.get(t) is not None
        }
        return idfs, {t: weights[t] for t in idfs}

    def _meta_with_ub(
        self, idfs: dict[str, float], weights: dict[str, int] | None = None
    ) -> DataFrame:
        spark = self.packed.sparkSession
        weights = weights or {}
        idf_df = spark.createDataFrame(
            [(t, v * weights.get(t, 1)) for t, v in idfs.items()],
            "term string, idf double",
        )
        meta = (
            self._pruned(self.packed, list(idfs))
            .filter(F.col("term").isin(list(idfs)))
            .join(F.broadcast(idf_df), "term")
        )
        norm = F.lit(BM25_K1) * (
            F.lit(1.0 - BM25_B)
            + F.lit(BM25_B) * F.col("min_dlq") / F.lit(self.avgdl)
        )
        ub = (
            F.col("idf") * F.col("max_tf") / (F.col("max_tf") + norm)
        ) * F.lit(_UB_SLACK)
        return meta.withColumn("ub", ub)

    def _kernel(self, blocks: DataFrame, idfs: dict[str, float], k: int,
                mode: str, n_terms: int, weights: dict[str, int] | None = None):
        """applyInPandas per blk: decode, accumulate, per-blk top-k (the
        truncation is skipped when a deletes mask must filter first)."""
        truncate = self.deletes is None
        import pandas as pd

        from .codec import unpack_postings_block, varint_decode

        avgdl = self.avgdl
        span = _indexer.BLOCK_SPAN
        w = weights or {}

        def score_blk(key, pdf: pd.DataFrame) -> pd.DataFrame:
            blk = int(key[0])
            base = blk * span
            scores = np.zeros(span, dtype=np.float64)
            counts = np.zeros(span, dtype=np.int32)
            for row in pdf.itertuples(index=False):
                docs, tfs = unpack_postings_block(row.docs, row.tfs)
                dlqs, _ = varint_decode(row.dlqs)
                local = docs - base
                scores[local] += w.get(row.term, 1) * _bm25(
                    tfs.astype(np.float64),
                    dlqs.astype(np.float64),
                    idfs[row.term],
                    avgdl,
                )
                counts[local] += 1
            if mode == "and":
                mask = counts == n_terms
            else:
                mask = counts > 0
            hit = np.nonzero(mask)[0]
            if hit.size == 0:
                return pd.DataFrame({"doc_id": [], "score": []}).astype(
                    {"doc_id": "int64", "score": "float64"}
                )
            hs = scores[hit]
            if truncate and hit.size > k:
                # deterministic boundary: (score desc, doc_id asc), matching
                # the global tie-break so k-th ties are never cut arbitrarily
                order = np.lexsort((hit, -hs))[:k]
                hit, hs = hit[order], hs[order]
            return pd.DataFrame({"doc_id": hit + base, "score": hs})

        return blocks.groupBy("blk").applyInPandas(
            score_blk, "doc_id long, score double"
        )

    def _probe_theta(
        self, meta, blk_ub, idfs, k, mode, n_terms, weights
    ) -> float:
        """θ estimation: exactly score only the most promising blocks.
        Adaptive gating without any extra Spark job: an upper bound on the
        candidate block count is known driver-side from collection stats
        (≤ n_docs/span ranges, and ≤ sum of term dfs) — when that bound is
        small, the probe round trip costs more than decoding everything
        (like totalHitsThreshold gating WAND activation in Lucene).
        Returns -inf when probing is skipped or under-filled."""
        span = _indexer.BLOCK_SPAN
        max_blocks = (self.n_docs + span - 1) // span
        if max_blocks <= self.probe_threshold:
            return -math.inf
        n_probe = max(2, (k + span - 1) // span + 1)
        probe_blks = (
            blk_ub.orderBy(F.desc("sum_ub"), F.asc("blk"))
            .limit(n_probe)
            .select("blk")
        )
        probe = meta.join(F.broadcast(probe_blks), "blk")
        top = (
            self._mask(self._kernel(probe, idfs, k, mode, n_terms, weights))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
            .collect()
        )
        return top[-1]["score"] if len(top) == k else -math.inf

    def _dense_all_terms(self, uniq_terms: list[str]) -> bool:
        """Scorer selection (BooleanWeight#scorer ≈L300 picks
        BooleanScorer vs WANDScorer per query shape; WANDScorer's
        block-max skipping only pays when some clause is sparse): when
        EVERY query term's df is large enough that essentially every
        doc-range block contains every term (df >= 8 * n_blocks means
        >= 8 postings per block on average), per-block sum_ub is nearly
        uniform, θ prunes nothing, and the probe + Python decode kernel
        are pure overhead over the flat JVM disjunction — measured at
        sf1.0 (3 head terms): θ kept 245/245 blocks, WAND path ~4 s vs
        flat path ~0.9 s for rank-identical results. Dense-only queries
        therefore fall back to the flat scorer; any query with one
        sparse term keeps block-max (where it wins). Driver-side test —
        uses only the already-bound TermStates, no extra job."""
        span = _indexer.BLOCK_SPAN
        n_blocks = max(1, (self.n_docs + span - 1) // span)
        cache = self._term_states
        return all(
            (cache.get(t) or 0) >= 8 * n_blocks for t in uniq_terms
        )

    def _flat_fallback(
        self, weights: dict[str, int], k: int, mode: str
    ) -> DataFrame:
        """Flat-postings JVM scorer for dense queries: same scores, same
        tie-break, no Python stage (WAND==exhaustive is a test invariant).
        A repeated query term is a repeated clause (its multiplicity in
        `weights`), exactly the kernel's w-multiplier semantics."""
        from .query import Boolean, Term
        from .search import Searcher

        s = self.__dict__.setdefault("_flat_searcher", Searcher(self._index))
        clauses = [Term(t) for t, w in weights.items() for _ in range(w)]
        q = Boolean(must=clauses) if mode == "and" else Boolean(should=clauses)
        return s.search(q, k, with_fields=False).select("doc_id", "score")

    def search(
        self, terms: list[str], k: int = 10, mode: str = "or"
    ) -> DataFrame:
        """Top-k (doc_id, score) for an OR (sum-score) or AND query.

        Scale shape: per-block metadata (blk_ub) NEVER reaches the driver —
        at 10^12 docs that is ~2.4e8 rows. The θ probe picks the highest
        sum_ub blocks via a distributed orderBy/limit (n_probe rows, tiny,
        broadcast back), θ itself is ONE scalar collected from the k probe
        hits, and survivors are selected with a broadcast-semi-join on the
        distributed blk_ub — no literal isin lists anywhere.
        """
        idfs, weights = self._idfs(terms)
        spark = self.packed.sparkSession
        if not idfs or (mode == "and" and len(idfs) < len(set(terms))):
            return spark.createDataFrame([], "doc_id long, score double")
        if self.deletes is None and self._dense_all_terms(list(idfs)):
            # deletes force the kernel's mask-aware path; without them the
            # flat scorer is rank+score identical and has no Python stage
            return self._flat_fallback(weights, k, mode)
        meta = self._meta_with_ub(idfs, weights).persist()
        n_terms = len(idfs)

        blk_ub = meta.groupBy("blk").agg(
            F.sum("ub").alias("sum_ub"),
            # count DISTINCT terms: if a (term, blk) group were ever split
            # into two packed rows, count(*) would overflow n_terms and
            # silently drop a valid AND block
            F.count_distinct("term").alias("n_terms_in_blk"),
        )
        if mode == "and":
            blk_ub = blk_ub.filter(F.col("n_terms_in_blk") == n_terms)

        theta = self._probe_theta(meta, blk_ub, idfs, k, mode, n_terms, weights)

        # survivors stay distributed: semi-join meta against the pruned
        # block metadata. No broadcast hint — post-θ survivors are usually
        # tiny (AQE picks broadcast then) but can be wide for low-θ queries,
        # and a forced broadcast of 1e8 blk rows would OOM the driver.
        # θ=-inf (no probe, or probe under-filled) prunes nothing — skip
        # the join entirely rather than pay a no-op shuffle.
        if math.isinf(theta):
            cand = meta if mode != "and" else meta.join(
                blk_ub.select("blk"), "blk", "left_semi"
            )
        else:
            survivors = blk_ub.filter(
                F.col("sum_ub") >= F.lit(theta)
            ).select("blk")
            cand = meta.join(survivors, "blk", "left_semi")
        out = (
            self._mask(self._kernel(cand, idfs, k, mode, n_terms, weights))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
        )
        # Return the UNEVALUATED plan (plan-composable, like Searcher.search:
        # late-materialization joins start from this relation, not a local
        # collect). meta stays persisted while the returned plan references
        # it; Spark's ContextCleaner unpersists it when the caller drops the
        # DataFrame — an eager unpersist here would force re-deriving meta
        # on every downstream action.
        return out

    def pruning_stats(self, terms: list[str], k: int = 10) -> dict:
        """How many blocks WAND skipped (observability for BENCH).

        One search pass (k rows collected -> θ) plus ONE aggregation job
        computing total and surviving block counts together — the stats no
        longer re-derive blk_ub with separate count() jobs per metric.
        """
        idfs, weights = self._idfs(terms)
        rows = self.search(terms, k).collect()
        kth = rows[-1]["score"] if len(rows) >= k else -math.inf
        meta = self._meta_with_ub(idfs, weights)
        agg = (
            meta.groupBy("blk")
            .agg(F.sum("ub").alias("sum_ub"))
            .agg(
                F.count("*").alias("total"),
                F.sum(
                    F.when(F.col("sum_ub") >= F.lit(kth), 1).otherwise(0)
                ).alias("kept"),
            )
            .collect()[0]
        )
        return {
            "total_blocks": agg["total"],
            "kept_blocks": agg["kept"] or 0,
            "theta": kth,
        }

    def search_maxscore(
        self, terms: list[str], k: int = 10, prune_info: dict | None = None
    ) -> DataFrame:
        """MAXSCORE top-k disjunction — the OTHER dynamic pruning strategy
        Lucene ships (lucene/core/.../search/MaxScoreBulkScorer.java ≈L60;
        Turtle & Flood 1995): terms are partitioned by GLOBAL max score
        into non-essential (the longest ub-ascending prefix whose summed
        max scores stay BELOW θ) and essential (the rest); a doc whose
        postings touch only non-essential terms can score at most that
        prefix sum < θ, so only blocks containing at least one
        ESSENTIAL-term posting are decoded.

        Distributed shape mirrors search(): θ from the same block probe,
        the term partition is computed driver-side from one n_terms-row
        aggregate (the per-term max block ub — TermStates-sized, not
        corpus-sized), candidate blocks stay as a distributed semi-join.
        Where WAND prunes on per-block SUMMED bounds, MAXSCORE prunes on
        the per-TERM global bound — cheaper bookkeeping, coarser pruning
        (Lucene picks between them per query for the same reason).
        Soundness: Σ_{non-essential} gub < θ strictly (the partition loop
        stops before crossing θ), so pruned docs can't reach θ even on a
        tie; probed θ <= true k-th score as in search().

        `prune_info={}` receives {"theta", "essential", "non_essential"}.
        """
        idfs, weights = self._idfs(terms)
        spark = self.packed.sparkSession
        if not idfs:
            return spark.createDataFrame([], "doc_id long, score double")
        meta = self._meta_with_ub(idfs, weights).persist()
        n_terms = len(idfs)
        blk_ub = meta.groupBy("blk").agg(F.sum("ub").alias("sum_ub"))
        theta = self._probe_theta(meta, blk_ub, idfs, k, "or", n_terms, weights)

        essential = sorted(idfs)
        non_essential: list[str] = []
        if not math.isinf(theta):
            # per-term global upper bound: max over the term's block ubs —
            # one tiny aggregate (n_terms rows), the MaxScoreCache analog
            gub = {
                r["term"]: float(r["gub"])
                for r in meta.groupBy("term")
                .agg(F.max("ub").alias("gub"))
                .collect()
            }
            acc = 0.0
            ordered = sorted(gub, key=lambda t: (gub[t], t))
            for t in ordered:
                if acc + gub[t] < theta:
                    acc += gub[t]
                    non_essential.append(t)
                else:
                    break
            essential = [t for t in ordered if t not in set(non_essential)]
            if not essential:  # probe θ exceeded every bound: top-k is final
                essential = ordered[-1:]
        if prune_info is not None:
            prune_info["theta"] = theta
            prune_info["essential"] = sorted(essential)
            prune_info["non_essential"] = sorted(non_essential)
        if non_essential:
            ess_blks = (
                meta.filter(F.col("term").isin(essential))
                .select("blk")
                .distinct()
            )
            cand = meta.join(ess_blks, "blk", "left_semi")
        else:
            cand = meta
        out = (
            self._mask(self._kernel(cand, idfs, k, "or", n_terms, weights))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
        )
        return out
