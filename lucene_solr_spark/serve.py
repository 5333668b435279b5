"""In-process serving fast path: ``Searcher.serve()``.

Why this exists (and why it is NOT a scale lie)
-----------------------------------------------
The distributed read path (search.py) compiles every query to a Spark
plan; even a fully pruned plan pays Spark's per-job scheduling floor
(~0.3-0.4 s on local[32]), which is 3-4x the reference's "p50 << 100 ms"
serving latency. Lucene never pays that floor because SERVING in Lucene
is a per-shard, in-process affair: an IndexSearcher holds the terms dict
(FST) in RAM, posting lists come off the OS page cache, and scoring is a
tight loop inside one process (IndexSearcher.java, SegmentReader.java —
SURVEY.md §4.2).

At 100 TB that is exactly how this engine would serve too: the BUILD and
MERGE are distributed Spark jobs (indexer.py); the built index is then
range/hash-split into shards, and each serving node runs THIS class over
its own shard directory, answering queries in-process and fanning out /
merging top-k across shards (the SolrCloud distributed-search model:
per-shard searchers + a coordinator merge, TopDocs.merge). Nothing here
pretends a 100 TB index fits in one process — the class guards its RAM
budget explicitly and hands anything larger back to the distributed
path:

* the terms dictionary (term -> df, ttf) IS loaded fully — that is the
  FST-in-RAM analog and is O(vocab), not O(corpus); Lucene makes the
  same bet.
* posting lists are fetched lazily per term straight from the index's
  bucket-partitioned parquet (partition-pruned, column-pruned pyarrow
  reads — the mmap analog; NO Spark job) and kept in an LRU byte-budget
  cache (the page-cache analog).
* before fetching, the query's candidate volume is estimated from the
  already-resident df stats; a query whose uncached posting volume
  exceeds ``max_fetch_bytes`` raises CandidateVolumeExceeded, and the
  ``Searcher.serve()`` wrapper falls back to the distributed plan. The
  cutover is the honest "this query's working set does not fit this
  shard's RAM budget" case.

Rank identity: scoring replicates search.py's compiled Column arithmetic
op-for-op in float64 numpy (same IEEE ops in the same association
order), so ranks — and scores to the last ulp for single-clause queries
— match the distributed path; tests/test_serve.py pins rank identity
across the query-type matrix.

Reference parity: IndexSearcher#search(Query, int) over a single
segment; TermStates pre-warm == FST residency; LRU postings cache ==
page cache; CandidateVolumeExceeded fallback == the coordinator routing
a too-hot query to the batch tier.
"""

from __future__ import annotations

import glob
import json
import math
import os
import re
from collections import OrderedDict

import numpy as np

from . import BM25_B, BM25_K1
from .query import (
    Blended,
    Boolean,
    Boost,
    ConstantScore,
    DisMax,
    Fuzzy,
    LangFilter,
    MatchAll,
    MultiPhrase,
    Phrase,
    Prefix,
    Query,
    Regexp,
    Synonym,
    Term,
    TermInSet,
    TermRange,
    Wildcard,
)
from .search import _collect_terms
from .xxhash import bucket_of_term


class CandidateVolumeExceeded(RuntimeError):
    """The query's uncached posting volume exceeds the serving RAM
    budget — route it to the distributed path."""


class UnsupportedQuery(TypeError):
    """Query node type the serving path does not evaluate — route it to
    the distributed path (a dedicated type so HybridSearcher's fallback
    never swallows a genuine TypeError bug)."""


def _load_stats(index_dir: str) -> dict:
    stats_files = glob.glob(os.path.join(index_dir, "stats", "part-*"))
    with open(stats_files[0]) as f:
        return json.loads(f.readline())


class ServingSearcher:
    """One shard's in-process searcher over an index directory.

    Parameters
    ----------
    index_dir : the build_index() output directory (bucket-partitioned
        parquet: postings/, term_stats/, docmeta/, stats/).
    similarity : 'bm25' (default) or 'classic' — must match the
        comparison Searcher for rank-identity.
    cache_bytes : LRU budget for resident posting arrays (page-cache
        analog). Evicts least-recently-used terms past the budget.
    max_fetch_bytes : per-query cap on UNCACHED posting bytes the query
        may pull in; estimated from df before any I/O. Exceeding it
        raises CandidateVolumeExceeded (fallback signal).
    """

    _ROW_BYTES = 12  # resident bytes per posting row: int64 doc_id + int32 tf

    def __init__(
        self,
        index_dir: str,
        similarity: str = "bm25",
        cache_bytes: int = 256 << 20,
        max_fetch_bytes: int = 64 << 20,
    ):
        import pyarrow.dataset as pads

        self.index_dir = index_dir
        self.similarity = similarity
        self.cache_bytes = int(cache_bytes)
        self.max_fetch_bytes = int(max_fetch_bytes)
        st = _load_stats(index_dir)
        self.stats = st
        self.n_docs = int(st["doc_count"])
        self.avgdl = float(st["avgdl"])
        # scoring stats default to this shard's own; set_global_stats
        # (ShardedServing / ExactStatsCache analog) overrides them so a
        # shard scores with COLLECTION-level df/N/avgdl while matching
        # against its local postings
        self.score_n_docs = self.n_docs
        self.score_avgdl = self.avgdl
        self._df_override: dict | None = None
        self.num_buckets = int(st.get("num_buckets", 16))
        self.profile = st.get("profile", "en")

        # --- terms dict pre-warm (FST residency; TermStates for EVERY
        # term, so the stats bind is a dict lookup, never I/O) ---
        tdict = pads.dataset(
            os.path.join(index_dir, "term_stats"),
            format="parquet",
            partitioning="hive",
        ).to_table(columns=["term", "df", "ttf"])
        terms = tdict.column("term").to_pylist()
        dfs = tdict.column("df").to_numpy()
        ttfs = tdict.column("ttf").to_numpy()
        self._term_stats: dict[str, tuple[int, int]] = {
            t: (int(d), int(tt)) for t, d, tt in zip(terms, dfs, ttfs)
        }
        self._sorted_terms: list[str] = sorted(self._term_stats)

        # --- docmeta columns in RAM: dlq (norms array analog) + lang;
        # urls load lazily on the first with_fields request ---
        dm = pads.dataset(
            os.path.join(index_dir, "docmeta"), format="parquet"
        ).to_table(columns=["doc_id", "dlq", "lang"])
        ids = dm.column("doc_id").to_numpy()
        if len(ids) != self.n_docs or (
            len(ids) and int(ids.max()) != self.n_docs - 1
        ):
            raise ValueError(
                "ServingSearcher requires dense doc ids [0, n_docs)"
            )
        self._dlq = np.zeros(self.n_docs, dtype=np.float64)
        self._dlq[ids] = dm.column("dlq").to_numpy().astype(np.float64)
        lang = np.empty(self.n_docs, dtype=object)
        lang[ids] = dm.column("lang").to_pylist()
        self._lang = lang
        self._urls: np.ndarray | None = None

        self._postings_ds = pads.dataset(
            os.path.join(index_dir, "postings"),
            format="parquet",
            partitioning="hive",
        )
        # LRU: term -> (doc_ids int64 asc, tf float64); byte-accounted
        self._cache: "OrderedDict[str, tuple[np.ndarray, np.ndarray]]" = (
            OrderedDict()
        )
        self._cache_nbytes = 0
        # positions cache (phrase path): term -> dict(doc_id -> int32 array)
        self._pos_cache: "OrderedDict[str, dict]" = OrderedDict()
        self.fetches = 0  # cold I/O count (observability)

    # ---- posting residency (page-cache analog) ---------------------------
    def _estimate_fetch_bytes(self, terms: set) -> int:
        return sum(
            self._term_stats[t][0] * self._ROW_BYTES
            for t in terms
            if t in self._term_stats and t not in self._cache
        )

    def _ensure_resident(self, terms: set) -> None:
        import pyarrow.compute as pc

        need = sorted(
            t
            for t in terms
            if t in self._term_stats and t not in self._cache
        )
        if not need:
            return
        est = self._estimate_fetch_bytes(set(need))
        if est > self.max_fetch_bytes:
            raise CandidateVolumeExceeded(
                f"query needs ~{est >> 20} MiB of uncached postings "
                f"(cap {self.max_fetch_bytes >> 20} MiB)"
            )
        by_bucket: dict[int, list[str]] = {}
        for t in need:
            by_bucket.setdefault(
                bucket_of_term(t, self.num_buckets), []
            ).append(t)
        for b, ts in by_bucket.items():
            tab = self._postings_ds.to_table(
                columns=["term", "doc_id", "tf"],
                filter=(pc.field("bucket") == b)
                & pc.field("term").isin(ts),
            )
            self.fetches += 1
            tcol = np.asarray(tab.column("term").to_pylist(), dtype=object)
            did = tab.column("doc_id").to_numpy()
            tf = tab.column("tf").to_numpy().astype(np.float64)
            for t in ts:
                m = tcol == t
                ids_t = did[m]
                tf_t = tf[m]
                order = np.argsort(ids_t, kind="stable")
                self._put(t, ids_t[order], tf_t[order])
        for t in need:  # negative entries are free: absent from _term_stats
            if t not in self._cache:
                self._put(t, np.empty(0, np.int64), np.empty(0, np.float64))

    def _put(self, term: str, ids: np.ndarray, tf: np.ndarray) -> None:
        self._cache[term] = (ids, tf)
        self._cache.move_to_end(term)
        self._cache_nbytes += ids.nbytes + tf.nbytes
        while self._cache_nbytes > self.cache_bytes and len(self._cache) > 1:
            _t, (i0, t0) = self._cache.popitem(last=False)
            self._cache_nbytes -= i0.nbytes + t0.nbytes

    def _postings(self, term: str) -> tuple[np.ndarray, np.ndarray]:
        hit = self._cache.get(term)
        if hit is None:
            self._ensure_resident({term})
            hit = self._cache[term]
        else:
            self._cache.move_to_end(term)
        return hit

    def _positions(self, term: str) -> dict:
        import pyarrow.compute as pc

        hit = self._pos_cache.get(term)
        if hit is not None:
            self._pos_cache.move_to_end(term)
            return hit
        b = bucket_of_term(term, self.num_buckets)
        tab = self._postings_ds.to_table(
            columns=["doc_id", "positions"],
            filter=(pc.field("bucket") == b) & (pc.field("term") == term),
        )
        self.fetches += 1
        out = {
            int(d): np.asarray(p, dtype=np.int64)
            for d, p in zip(
                tab.column("doc_id").to_pylist(),
                tab.column("positions").to_pylist(),
            )
        }
        self._pos_cache[term] = out
        if len(self._pos_cache) > 64:
            self._pos_cache.popitem(last=False)
        return out

    # ---- scoring (float64 replicas of score.py Column arithmetic) --------
    def _idf(self, df: int) -> float:
        return math.log(
            1.0 + (self.score_n_docs - df + 0.5) / (df + 0.5)
        )

    def _df(self, term: str) -> int:
        if self._df_override is not None:
            return int(self._df_override.get(term, 0))
        st = self._term_stats.get(term)
        return int(st[0]) if st else 0

    def set_global_stats(
        self, n_docs: int, avgdl: float, dfs: dict
    ) -> None:
        """ExactStatsCache analog (solr/core/.../search/stats/
        ExactStatsCache.java ≈L60): score with collection-level stats
        so per-shard ranking merges rank-identically to a monolithic
        index. `dfs` maps term -> global df."""
        self.score_n_docs = int(n_docs)
        self.score_avgdl = float(avgdl)
        self._df_override = dict(dfs)

    def _score_rows(
        self, tf: np.ndarray, dlq: np.ndarray, df: int, boost: float
    ) -> np.ndarray:
        if self.similarity == "classic":
            idf = math.log((self.score_n_docs + 1.0) / (df + 1.0)) + 1.0
            return boost * np.sqrt(tf) * idf * idf / np.sqrt(dlq)
        # same association order as score.py bm25_score:
        # boost * idf * tf / (tf + k1*((1-b) + b*dlq/avgdl))
        norm = BM25_K1 * (
            (1.0 - BM25_B) + BM25_B * dlq / self.score_avgdl
        )
        return boost * self._idf(df) * tf / (tf + norm)

    # ---- multi-term expansion against the RAM terms dict ------------------
    def _expand_terms(self, q: Query) -> list[str]:
        if isinstance(q, Prefix):
            pred = lambda t: t.startswith(q.prefix)  # noqa: E731
        elif isinstance(q, Wildcard):
            rx = re.compile(
                "^"
                + "".join(
                    ".*" if c == "*" else "." if c == "?" else re.escape(c)
                    for c in q.pattern
                )
                + "$"
            )
            pred = rx.match
        elif isinstance(q, Regexp):
            rx = re.compile("^" + q.pattern + "$")
            pred = rx.match
        elif isinstance(q, Fuzzy):
            lev = _levenshtein_capped
            pred = lambda t: lev(t, q.term, q.max_edits)  # noqa: E731
        elif isinstance(q, TermRange):
            lo, hi = q.lower, q.upper

            def pred(t):
                if lo is not None and (t < lo or (t == lo and not q.include_lower)):
                    return False
                if hi is not None and (t > hi or (t == hi and not q.include_upper)):
                    return False
                return True

        elif isinstance(q, TermInSet):
            want = set(q.terms)
            pred = lambda t: t in want  # noqa: E731
        else:  # pragma: no cover
            raise TypeError(q)
        return [t for t in self._sorted_terms if pred(t)]

    # ---- evaluation: every node -> (unique doc_ids, scores) --------------
    def _eval(self, q: Query, scored: bool = True):
        empty = (np.empty(0, np.int64), np.empty(0, np.float64))
        if isinstance(q, Term):
            st = self._term_stats.get(q.term)
            if st is None:
                return empty
            ids, tf = self._postings(q.term)
            if not scored:
                return ids, np.zeros(len(ids))
            return ids, self._score_rows(
                tf, self._dlq[ids], self._df(q.term), q.boost
            )

        if isinstance(q, Synonym):
            present = [t for t in q.terms if t in self._term_stats]
            if not present:
                return empty
            df_max = max(self._df(t) for t in present)
            parts = [self._postings(t) for t in present]
            ids = np.concatenate([p[0] for p in parts])
            tfs = np.concatenate([p[1] for p in parts])
            uids, inv = np.unique(ids, return_inverse=True)
            tf_sum = np.zeros(len(uids))
            np.add.at(tf_sum, inv, tfs)
            if not scored:
                return uids, np.zeros(len(uids))
            return uids, self._score_rows(
                tf_sum, self._dlq[uids], df_max, q.boost
            )

        if isinstance(q, Blended):
            present = [t for t in q.terms if t in self._term_stats]
            if not present:
                return empty
            df_max = max(self._df(t) for t in present)
            parts = [self._postings(t) for t in present]
            ids = np.concatenate([p[0] for p in parts])
            tfs = np.concatenate([p[1] for p in parts])
            row_s = (
                self._score_rows(tfs, self._dlq[ids], df_max, q.boost)
                if scored
                else np.zeros(len(ids))
            )
            uids, inv = np.unique(ids, return_inverse=True)
            s_sum = np.zeros(len(uids))
            np.add.at(s_sum, inv, row_s)
            return uids, s_sum

        if isinstance(q, Phrase):
            return self._eval_phrase(q, scored)

        if isinstance(q, MultiPhrase):
            return self._eval_multi_phrase(q, scored)

        if isinstance(q, (Prefix, Wildcard, Regexp, Fuzzy, TermRange, TermInSet)):
            # CONSTANT_SCORE_REWRITE — uncapped by clause count exactly
            # like the distributed _compile_multiterm semi-join; the
            # serving-side control is posting VOLUME (_ensure_resident's
            # max_fetch_bytes guard -> CandidateVolumeExceeded -> the
            # hybrid falls back to the distributed plan)
            terms = self._expand_terms(q)
            if not terms:
                return empty
            self._ensure_resident(set(terms))
            ids = np.unique(
                np.concatenate([self._postings(t)[0] for t in terms])
            )
            boost = float(getattr(q, "boost", 1.0))
            return ids, np.full(len(ids), boost if scored else 0.0)

        if isinstance(q, MatchAll):
            ids = np.arange(self.n_docs, dtype=np.int64)
            return ids, np.full(self.n_docs, float(q.boost))

        if isinstance(q, Boost):
            ids, s = self._eval(q.child, scored)
            return ids, s * q.boost

        if isinstance(q, ConstantScore):
            ids, _ = self._eval(q.child, scored=False)
            return ids, np.full(len(ids), float(q.boost))

        if isinstance(q, DisMax):
            rows = [self._eval(c, scored) for c in q.children]
            total = sum(len(r[0]) for r in rows)
            if total * 4 >= self.n_docs:
                mx = np.full(self.n_docs, -np.inf)
                sm = np.zeros(self.n_docs)
                matched = np.zeros(self.n_docs, dtype=bool)
                for ids, s in rows:
                    # each child emits unique ids -> plain fancy indexing
                    mx[ids] = np.maximum(mx[ids], s)
                    sm[ids] += s
                    matched[ids] = True
                ids = np.nonzero(matched)[0].astype(np.int64)
            else:
                # sparse: memory O(candidates), not O(shard) — see
                # _eval_boolean's adaptive note
                uids = np.unique(
                    np.concatenate(
                        [r[0] for r in rows] or [np.empty(0, np.int64)]
                    )
                )
                if len(uids) == 0:
                    return empty
                mx = np.full(len(uids), -np.inf)
                sm = np.zeros(len(uids))
                for cids, s in rows:
                    pos = np.searchsorted(uids, cids)
                    mx[pos] = np.maximum(mx[pos], s)
                    sm[pos] += s
                score = (
                    mx + q.tie_breaker * (sm - mx)
                ) * q.boost
                return uids, score
            score = (
                mx[ids] + q.tie_breaker * (sm[ids] - mx[ids])
            ) * q.boost
            return ids, score

        if isinstance(q, LangFilter):
            ids, s = self._eval(q.child, scored)
            keep = self._lang[ids] == q.lang
            return ids[keep], s[keep]

        if isinstance(q, Boolean):
            return self._eval_boolean(q, scored)

        raise UnsupportedQuery(
            f"serving path does not support {type(q).__name__}"
        )

    def _eval_boolean(self, q: Boolean, scored: bool):
        # evaluate every clause once (each emits unique ids — the same
        # invariant the distributed _compile_boolean documents)
        n_must = len(q.must) + len(q.filter)
        must_rows = [self._eval(c, scored) for c in q.must]
        filt_rows = [self._eval(c, scored=False) for c in q.filter]
        should_rows = [self._eval(c, scored) for c in q.should]
        not_rows = [self._eval(c, scored=False) for c in q.must_not]
        if not q.should and n_must == 0:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        msm = q.min_should_match
        if n_must == 0:
            msm = max(msm, 1)

        total = sum(
            len(r[0]) for r in must_rows + filt_rows + should_rows + not_rows
        )
        # Adaptive aggregation: dense per-doc accumulators are fastest
        # but allocate O(n_docs) PER QUERY — fine for a 1M-doc shard,
        # 2.4 GB/query at 100M docs. Selective queries (candidate rows
        # << corpus) aggregate SPARSELY over the union of clause ids
        # instead: memory O(candidates), the shard size drops out.
        if total * 4 >= self.n_docs:
            score = np.zeros(self.n_docs)
            must_cnt = np.zeros(self.n_docs, dtype=np.int32)
            should_cnt = np.zeros(self.n_docs, dtype=np.int32)
            for ids, s in must_rows:
                score[ids] += s
                must_cnt[ids] += 1
            for ids, _ in filt_rows:
                must_cnt[ids] += 1
            for ids, s in should_rows:
                score[ids] += s
                should_cnt[ids] += 1
            cond = must_cnt == n_must
            if q.should:
                cond &= should_cnt >= msm
            for ids, _ in not_rows:
                cond[ids] = False
            ids = np.nonzero(cond)[0].astype(np.int64)
            return ids, score[ids] * q.boost

        # sparse path: factorize the union of ids into a compact index
        all_ids = np.concatenate(
            [r[0] for r in must_rows + filt_rows + should_rows]
            or [np.empty(0, np.int64)]
        )
        uids = np.unique(all_ids)
        if len(uids) == 0:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        score = np.zeros(len(uids))
        must_cnt = np.zeros(len(uids), dtype=np.int32)
        should_cnt = np.zeros(len(uids), dtype=np.int32)
        for ids, s in must_rows:
            pos = np.searchsorted(uids, ids)
            score[pos] += s
            must_cnt[pos] += 1
        for ids, _ in filt_rows:
            must_cnt[np.searchsorted(uids, ids)] += 1
        for ids, s in should_rows:
            pos = np.searchsorted(uids, ids)
            score[pos] += s
            should_cnt[pos] += 1
        cond = must_cnt == n_must
        if q.should:
            cond &= should_cnt >= msm
        for ids, _ in not_rows:
            # excluded ids may lie outside the union; mask the overlap
            if len(ids):
                inset = np.isin(ids, uids, assume_unique=True)
                if inset.any():
                    cond[np.searchsorted(uids, ids[inset])] = False
        keep = np.nonzero(cond)[0]
        return uids[keep], score[keep] * q.boost

    def _eval_phrase(self, q: Phrase, scored: bool):
        empty = (np.empty(0, np.int64), np.empty(0, np.float64))
        terms = list(q.terms)
        if any(t not in self._term_stats for t in terms):
            return empty
        pos = [self._positions(t) for t in terms]
        docs = set(pos[0])
        for p in pos[1:]:
            docs &= set(p)
        out_ids, out_tf = [], []
        for d in sorted(docs):
            starts = pos[0][d]
            for i in range(1, len(terms)):
                starts = np.intersect1d(
                    starts, pos[i][d] - i, assume_unique=True
                )
                if len(starts) == 0:
                    break
            if len(starts):
                out_ids.append(d)
                out_tf.append(len(starts))
        if not out_ids:
            return empty
        ids = np.asarray(out_ids, dtype=np.int64)
        ptf = np.asarray(out_tf, dtype=np.float64)
        if not scored:
            return ids, np.zeros(len(ids))
        # PhraseWeight: idf = sum of constituent idfs, freq = phrase freq
        idf_sum = sum(self._idf(self._df(t)) for t in terms)
        dlq = self._dlq[ids]
        norm = BM25_K1 * (
            (1.0 - BM25_B) + BM25_B * dlq / self.score_avgdl
        )
        return ids, q.boost * idf_sum * ptf / (ptf + norm)

    def _eval_multi_phrase(self, q: MultiPhrase, scored: bool):
        empty = (np.empty(0, np.int64), np.empty(0, np.float64))
        present: list[list[str]] = []
        for slot in q.slots:
            have = [t for t in slot if t in self._term_stats]
            if not have:
                return empty
            present.append(have)

        def slot_pos(terms: list[str]) -> dict:
            merged: dict[int, np.ndarray] = {}
            for t in terms:
                for d, p in self._positions(t).items():
                    prev = merged.get(d)
                    merged[d] = (
                        p
                        if prev is None
                        else np.unique(np.concatenate([prev, p]))
                    )
            return merged

        pos = [slot_pos(s) for s in present]
        docs = set(pos[0])
        for p in pos[1:]:
            docs &= set(p)
        out_ids, out_tf = [], []
        for d in sorted(docs):
            starts = np.unique(pos[0][d])
            for i in range(1, len(pos)):
                starts = np.intersect1d(starts, np.unique(pos[i][d]) - i)
                if len(starts) == 0:
                    break
            if len(starts):
                out_ids.append(d)
                out_tf.append(len(starts))
        if not out_ids:
            return empty
        ids = np.asarray(out_ids, dtype=np.int64)
        ptf = np.asarray(out_tf, dtype=np.float64)
        if not scored:
            return ids, np.zeros(len(ids))
        idf_sum = sum(
            self._idf(self._df(t)) for s in present for t in s
        )
        dlq = self._dlq[ids]
        norm = BM25_K1 * (
            (1.0 - BM25_B) + BM25_B * dlq / self.score_avgdl
        )
        return ids, q.boost * idf_sum * ptf / (ptf + norm)

    # ---- public API -------------------------------------------------------
    def parse(self, text: str) -> Query:
        from .query import parse

        return parse(text, self.profile)

    def search(self, q, k: int = 10, with_fields: bool = True) -> list:
        """Top-k [(doc_id, score[, url])] by (score desc, doc_id asc) —
        the TopScoreDocCollector contract, computed in-process."""
        if isinstance(q, str):
            q = self.parse(q)
        terms: set = set()
        _collect_terms(q, terms)
        # single pre-flight volume check over ALL the query's terms (the
        # per-_postings lazy path would check one term at a time)
        self._ensure_resident(terms)
        ids, scores = self._eval(q, scored=True)
        n = len(ids)
        if n == 0:
            return []
        if n > k:
            # partial-select the k-th score, keep every row at-or-above
            # it (ties included) so the exact (score desc, doc_id asc)
            # sort below sees the full tie group
            kth = np.partition(-scores, k - 1)[k - 1]
            cand = np.nonzero(-scores <= kth)[0]
        else:
            cand = np.arange(n)
        order = np.lexsort((ids[cand], -scores[cand]))
        top = cand[order[:k]]
        if not with_fields:
            return [(int(ids[i]), float(scores[i])) for i in top]
        urls = self._load_urls()
        return [
            (int(ids[i]), float(scores[i]), str(urls[ids[i]])) for i in top
        ]

    def count(self, q) -> int:
        if isinstance(q, str):
            q = self.parse(q)
        terms: set = set()
        _collect_terms(q, terms)
        self._ensure_resident(terms)
        ids, _ = self._eval(q, scored=True)
        return int(len(ids))

    def refresh(self) -> bool:
        """SearcherManager#maybeRefresh analog (lucene/core/.../search/
        SearcherManager.java ≈L60): re-open the shard after a commit.
        Compares the on-disk stats snapshot with the resident one; when
        changed, reloads the terms dict / docmeta arrays and drops the
        posting caches (a new segment set invalidates them — Lucene
        likewise opens fresh per-segment readers and lets the page cache
        re-warm). Returns True if a newer index generation was loaded."""
        new_stats = _load_stats(self.index_dir)
        if new_stats == self.stats:
            return False
        self.__init__(
            self.index_dir,
            similarity=self.similarity,
            cache_bytes=self.cache_bytes,
            max_fetch_bytes=self.max_fetch_bytes,
        )
        return True

    def search_after(
        self, q, after_score: float, after_doc: int, k: int = 10
    ) -> list:
        """searchAfter pagination — same (sort tuple) > after filter as
        the distributed Searcher.search_after, in-process."""
        if isinstance(q, str):
            q = self.parse(q)
        terms: set = set()
        _collect_terms(q, terms)
        self._ensure_resident(terms)
        ids, scores = self._eval(q, scored=True)
        keep = (scores < after_score) | (
            (scores == after_score) & (ids > after_doc)
        )
        ids, scores = ids[keep], scores[keep]
        if len(ids) == 0:
            return []
        order = np.lexsort((ids, -scores))[:k]
        return [(int(ids[i]), float(scores[i])) for i in order]

    def _load_urls(self) -> np.ndarray:
        if self._urls is None:
            import pyarrow.dataset as pads

            dm = pads.dataset(
                os.path.join(self.index_dir, "docmeta"), format="parquet"
            ).to_table(columns=["doc_id", "url"])
            urls = np.empty(self.n_docs, dtype=object)
            urls[dm.column("doc_id").to_numpy()] = dm.column(
                "url"
            ).to_pylist()
            self._urls = urls
        return self._urls


def _levenshtein_capped(a: str, b: str, cap: int) -> bool:
    """edit_distance(a, b) <= cap, banded (O(len*cap))."""
    if abs(len(a) - len(b)) > cap:
        return False
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        lo = max(1, i - cap)
        hi = min(len(b), i + cap)
        if lo > 1:
            cur[lo - 1] = cap + 1
        for j in range(lo, hi + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (a[i - 1] != b[j - 1]),
            )
        if hi < len(b):
            cur[hi + 1 :] = [cap + 1] * (len(b) - hi)
        if min(cur[lo - 1 : hi + 1]) > cap:
            return False
        prev = cur
    return prev[len(b)] <= cap


class HybridSearcher:
    """Searcher.serve() handle: in-process fast path with transparent
    fallback to the distributed plan when the query is unsupported or
    its candidate volume exceeds the serving RAM budget (the per-shard
    coordinator's serve-or-batch routing decision)."""

    def __init__(self, serving: ServingSearcher, distributed):
        self.serving = serving
        self.distributed = distributed
        self.served = 0
        self.fell_back = 0

    def search(self, q, k: int = 10, with_fields: bool = True) -> list:
        try:
            out = self.serving.search(q, k, with_fields=with_fields)
            self.served += 1
            return out
        except (CandidateVolumeExceeded, UnsupportedQuery):
            self.fell_back += 1
            rows = self.distributed.search(
                q, k, with_fields=with_fields
            ).collect()
            if with_fields:
                return [
                    (r["doc_id"], r["score"], r["url"]) for r in rows
                ]
            return [(r["doc_id"], r["score"]) for r in rows]


class ShardedServing:
    """Distributed serving: one ServingSearcher per shard directory plus
    the coordinator merge — the SolrCloud read path (per-shard searchers,
    TopDocs.merge) realized over build_index shards.

    Exact global stats (ExactStatsCache): at construction the shards'
    RAM-resident terms dicts merge into collection-level df per term and
    collection N/avgdl, pushed back into every shard via
    set_global_stats — so each shard scores every candidate with the SAME
    idf/norm a monolithic index would, and the merged ranking is
    RANK-IDENTICAL to one index over the union corpus (pinned in
    tests/test_serve_sharded.py; Solr's default LocalStatsCache accepts
    per-shard skew instead — we implement the exact tier).

    The merge key is (score desc, url asc): per-shard doc ids are local
    (each shard mints its own dense ids), and url is the global unique
    key — the same total order the monolithic (score desc, doc_id asc)
    produces, because doc ids are minted in url rank order.

    Scale shape: shards serve independently (one process/node each); the
    coordinator holds k rows per shard. The stats merge moves only the
    terms dicts (O(vocab) per shard, one-time)."""

    def __init__(self, shard_dirs: list, similarity: str = "bm25"):
        self.shards = [
            ServingSearcher(d, similarity=similarity) for d in shard_dirs
        ]
        n_total = sum(s.n_docs for s in self.shards)
        # avgdl = total sum of field lengths / total docs; each shard's
        # stats carry avgdl = sum_ttf/doc_count, so recombine exactly
        sum_len = sum(s.avgdl * s.n_docs for s in self.shards)
        avgdl = sum_len / n_total if n_total else 0.0
        dfs: dict[str, int] = {}
        for s in self.shards:
            for t, (df, _ttf) in s._term_stats.items():
                dfs[t] = dfs.get(t, 0) + df
        for s in self.shards:
            s.set_global_stats(n_total, avgdl, dfs)
        self.n_docs = n_total

    def search(self, q, k: int = 10) -> list:
        """Top-k [(url, score)] merged across shards by
        (score desc, url asc) — TopDocs.merge with the global key."""
        rows = []
        for s in self.shards:
            for doc_id, score, url in s.search(q, k, with_fields=True):
                rows.append((url, float(score)))
        rows.sort(key=lambda r: (-r[1], r[0]))
        return rows[:k]

    def count(self, q) -> int:
        return sum(s.count(q) for s in self.shards)
