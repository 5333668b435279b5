"""Query execution: compile a Query AST into a DataFrame plan ending in
``orderBy(desc(score), asc(doc_id)).limit(k)``.

Spark restatement of the Lucene read path (SURVEY.md §4.2):

  IndexSearcher#createWeight (stats bind)  ->  one tiny driver-side lookup of
      (df, ttf) for the query's terms against term_stats with bucket pruning
      (TermStates.build analog), embedded as literals in the plan.
  Scorer DAG (ConjunctionDISI / DisjunctionSumScorer / ReqExclScorer /
      MinShouldMatchSumScorer, SURVEY.md §3.4)  ->  ONE union + groupBy(doc_id)
      shuffle: every clause contributes (doc_id, score, clause flags); the
      aggregation enforces MUST counts / minimumNumberShouldMatch and sums
      scores; MUST_NOT is a left_anti join.
  TopScoreDocCollector  ->  orderBy(score desc, doc_id asc).limit(k) —
      Catalyst's TakeOrderedAndProject = per-partition top-k + driver merge,
      exactly TopDocs.merge.
  Stored-field fetch  ->  late-materialization join of the final top-k back
      to docmeta (GET_TOP_IDS / GET_FIELDS two-phase pattern).

Every scoring expression is a JVM-side Column (whole-stage codegen); no
Python runs at query time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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
    FunctionScore,
    Prefix,
    Query,
    Regexp,
    Synonym,
    Term,
    TermInSet,
    TermRange,
    Wildcard,
)
from .score import bm25_score, classic_score

# BooleanQuery#maxClauseCount (IndexSearcher.TooManyClauses): the cap a
# scoring multi-term rewrite may expand to before it must degrade to the
# constant-score filter path.
MAX_CLAUSE_COUNT = 1024


class TooManyClauses(RuntimeError):
    pass


def _collect_terms(q: Query, out: set) -> None:
    if isinstance(q, Term):
        out.add(q.term)
    elif isinstance(q, (Phrase, Synonym, TermInSet, Blended)):
        out.update(q.terms)
    elif isinstance(q, MultiPhrase):
        for slot in q.slots:
            out.update(slot)
    elif isinstance(q, Boolean):
        for c in q.must + q.should + q.must_not + q.filter:
            _collect_terms(c, out)
    elif isinstance(q, (Boost, ConstantScore, LangFilter)):
        _collect_terms(q.child, out)
    elif isinstance(q, DisMax):
        for c in q.children:
            _collect_terms(c, out)


class QueryCache:
    """LRUQueryCache analog (lucene/core/.../search/LRUQueryCache.java
    ≈L60): Lucene caches per-segment bitsets of frequently-reused FILTER
    clauses; ours memoizes the filter clause's doc-id DataFrame as a
    persisted (in-memory columnar) table with LRU eviction — the second
    use of a cached filter is a memory scan, not a postings scan.

    Only non-scoring clauses are cacheable (same rule as Lucene: scores
    depend on stats, matches don't)."""

    def __init__(self, max_entries: int = 32):
        from collections import OrderedDict

        self._entries: "OrderedDict[str, DataFrame]" = OrderedDict()
        self.max_entries = max_entries
        self.hits = 0
        self.misses = 0

    def get_or_compute(self, key: str, compute) -> DataFrame:
        if key in self._entries:
            self._entries.move_to_end(key)
            self.hits += 1
            return self._entries[key]
        self.misses += 1
        df = compute().persist()
        self._entries[key] = df
        if len(self._entries) > self.max_entries:
            _old_key, old = self._entries.popitem(last=False)
            old.unpersist()
        return df

    def clear(self) -> None:
        for df in self._entries.values():
            df.unpersist()
        self._entries.clear()


class Searcher:
    """Bind an index (read_index() dict) + similarity; compile & run queries.

    `query_cache` (optional QueryCache) caches filter-clause doc-id sets
    across queries (LRUQueryCache semantics — see QueryCache)."""

    def __init__(
        self,
        index: dict,
        similarity: str = "bm25",
        query_cache: "QueryCache | None" = None,
    ):
        self.index = index
        self.postings = index["postings"]
        self.docmeta = index["docmeta"]
        self.term_stats = index["term_stats"]
        self.n_docs = index["stats"]["doc_count"]
        self.avgdl = index["stats"]["avgdl"]
        self.num_buckets = index["stats"].get("num_buckets", 16)
        self.similarity = similarity
        self.query_cache = query_cache
        # TermStates cache (TermStates.build / SegmentTermsEnum#seekExact
        # over Lucene's RAM-resident terms-dict FST): an index snapshot is
        # immutable, so a term's (df, ttf) never changes for this Searcher —
        # repeated query terms skip the stats-bind Spark job entirely.
        # None = negative entry (term absent), cached too so unknown-term
        # queries don't re-scan.
        self._term_states: dict[str, dict | None] = {}
        # queryResultCache: query repr -> (window fetched, collected rows)
        self._result_cache: dict[str, tuple[int, list]] = {}

    # ---- stats bind (Weight creation) ------------------------------------
    def _buckets(self, terms) -> list[int]:
        from .xxhash import bucket_of_term

        return sorted({bucket_of_term(t, self.num_buckets) for t in terms})

    def _stats_for(self, terms: list[str]) -> dict[str, dict]:
        if not terms:
            return {}
        cache = self._term_states
        missing = sorted({t for t in terms if t not in cache})
        if missing:
            ts = self.term_stats
            if "bucket" in ts.columns:
                # partition pruning: the terms-dict seek touches only the
                # buckets the query terms hash to (SegmentTermsEnum#seekExact)
                ts = ts.filter(F.col("bucket").isin(self._buckets(missing)))
            rows = (
                ts.filter(F.col("term").isin(missing))
                .select("term", "df", "ttf")
                .collect()
            )
            for t in missing:
                cache[t] = None
            for r in rows:
                cache[r["term"]] = {"df": int(r["df"]), "ttf": int(r["ttf"])}
        return {t: cache[t] for t in terms if cache.get(t) is not None}

    def _score_expr(self, tf, dlq, df: int, boost: float = 1.0):
        if self.similarity == "classic":
            return classic_score(tf, dlq, F.lit(float(df)), self.n_docs, boost)
        return bm25_score(
            tf, dlq, F.lit(float(df)), self.n_docs, self.avgdl,
            BM25_K1, BM25_B, boost,
        )

    def _idf(self, df: int) -> float:
        import math

        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def _term_postings(self, term: str) -> DataFrame:
        p = self.postings
        if "bucket" in p.columns:
            from .xxhash import bucket_of_term

            p = p.filter(
                F.col("bucket") == bucket_of_term(term, self.num_buckets)
            )
        return p.filter(F.col("term") == term)

    # ---- leaf scorers: (doc_id, score) ------------------------------------
    def _compile(self, q: Query, stats: dict, scored: bool = True) -> DataFrame:
        if isinstance(q, Term):
            st = stats.get(q.term)
            if st is None:
                return self._empty()
            p = self._term_postings(q.term)
            score = (
                self._score_expr(F.col("tf"), F.col("dlq"), st["df"], q.boost)
                if scored
                else F.lit(0.0)
            )
            return p.select("doc_id", score.alias("score"))

        if isinstance(q, Synonym):
            # summed tf across synonyms, df = max df (SynonymQuery.java)
            present = [t for t in q.terms if t in stats]
            if not present:
                return self._empty()
            df_max = max(stats[t]["df"] for t in present)
            p = self.postings
            if "bucket" in p.columns:
                p = p.filter(F.col("bucket").isin(self._buckets(present)))
            p = p.filter(F.col("term").isin(present))
            g = p.groupBy("doc_id").agg(
                F.sum("tf").alias("tf"), F.first("dlq").alias("dlq")
            )
            score = (
                self._score_expr(F.col("tf"), F.col("dlq"), df_max, q.boost)
                if scored
                else F.lit(0.0)
            )
            return g.select("doc_id", score.alias("score"))

        if isinstance(q, Blended):
            # per-term tf, blended df = max df (BlendedTermQuery.java
            # ≈L60 BooleanRewrite): score each term row with df_max, sum
            present = [t for t in q.terms if t in stats]
            if not present:
                return self._empty()
            df_max = max(stats[t]["df"] for t in present)
            p = self.postings
            if "bucket" in p.columns:
                p = p.filter(F.col("bucket").isin(self._buckets(present)))
            p = p.filter(F.col("term").isin(present))
            if scored:
                row_score = self._score_expr(
                    F.col("tf"), F.col("dlq"), df_max, q.boost
                )
            else:
                row_score = F.lit(0.0)
            return (
                p.select("doc_id", row_score.alias("_s"))
                .groupBy("doc_id")
                .agg(F.sum("_s").alias("score"))
            )

        if isinstance(q, Phrase):
            return self._compile_phrase(q, stats, scored)

        if isinstance(q, MultiPhrase):
            return self._compile_multi_phrase(q, stats, scored)

        if isinstance(q, (Prefix, Wildcard, Regexp, Fuzzy, TermRange, TermInSet)):
            return self._compile_multiterm(q, scored)

        if isinstance(q, MatchAll):
            return self.docmeta.select(
                "doc_id", F.lit(float(q.boost)).alias("score")
            )

        if isinstance(q, FunctionScore):
            # FunctionQuery: every doc matches; score = boost * expr over
            # docmeta columns (a narrow projection, no postings touched)
            score = (
                (F.expr(q.expr) * F.lit(float(q.boost)))
                if scored
                else F.lit(0.0)
            )
            return self.docmeta.select("doc_id", score.alias("score"))

        if isinstance(q, Boost):
            child = self._compile(q.child, stats, scored)
            return child.select(
                "doc_id", (F.col("score") * q.boost).alias("score")
            )

        if isinstance(q, ConstantScore):
            child = self._compile(q.child, stats, scored=False)
            return child.select(
                "doc_id", F.lit(float(q.boost)).alias("score")
            ).dropDuplicates(["doc_id"])

        if isinstance(q, DisMax):
            parts = []
            for i, c in enumerate(q.children):
                parts.append(
                    self._compile(c, stats, scored).withColumn(
                        "_cid", F.lit(i)
                    )
                )
            u = parts[0]
            for p in parts[1:]:
                u = u.unionByName(p)
            # max + tie * (sum - max)  (DisjunctionMaxQuery ≈L40)
            agg = u.groupBy("doc_id").agg(
                F.max("score").alias("_mx"), F.sum("score").alias("_sm")
            )
            return agg.select(
                "doc_id",
                (
                    (F.col("_mx") + F.lit(q.tie_breaker) * (F.col("_sm") - F.col("_mx")))
                    * q.boost
                ).alias("score"),
            )

        if isinstance(q, LangFilter):
            child = self._compile(q.child, stats, scored)
            keep = self.docmeta.filter(F.col("lang") == q.lang).select("doc_id")
            return child.join(keep, "doc_id", "left_semi")

        if isinstance(q, Boolean):
            return self._compile_boolean(q, stats, scored)

        raise TypeError(f"unsupported query node: {q!r}")

    def _compile_phrase(self, q: Phrase, stats: dict, scored: bool) -> DataFrame:
        terms = list(q.terms)
        if any(t not in stats for t in terms):
            return self._empty()
        # positions join: doc must contain every term; phrase freq = number of
        # start positions p with term_i at p+i for all i (ExactPhraseMatcher).
        base = (
            self._term_postings(terms[0])
            .select("doc_id", "dlq", F.col("positions").alias("_p0"))
        )
        joined = base
        for i, t in enumerate(terms[1:], start=1):
            nxt = self._term_postings(t).select(
                "doc_id", F.col("positions").alias(f"_p{i}")
            )
            joined = joined.join(nxt, "doc_id")
        # chain: starts = p0 ∩ (p1-1) ∩ (p2-2) ...
        # NB: F.transform treats a 2-arg lambda as f(element, array_index),
        # so the offset must be captured via a 1-arg closure factory.
        def _shift_by(offset):
            return lambda x: x - F.lit(offset)

        starts = F.col("_p0")
        for i in range(1, len(terms)):
            starts = F.array_intersect(
                starts, F.transform(F.col(f"_p{i}"), _shift_by(i))
            )
        tf = F.size(starts)
        out = joined.select("doc_id", "dlq", tf.alias("_ptf")).filter(
            F.col("_ptf") > 0
        )
        if not scored:
            return out.select("doc_id", F.lit(0.0).alias("score"))
        # PhraseWeight: idf = sum of constituent term idfs; freq = phrase freq
        idf_sum = sum(self._idf(stats[t]["df"]) for t in terms)
        k1, b = BM25_K1, BM25_B
        norm = F.lit(k1) * (
            F.lit(1.0 - b) + F.lit(b) * F.col("dlq") / F.lit(float(self.avgdl))
        )
        score = (
            F.lit(q.boost)
            * F.lit(idf_sum)
            * F.col("_ptf")
            / (F.col("_ptf") + norm)
        )
        return out.select("doc_id", score.alias("score"))

    def _compile_multi_phrase(
        self, q: MultiPhrase, stats: dict, scored: bool
    ) -> DataFrame:
        """MultiPhraseQuery (MultiPhraseQuery.java ≈L60, UnionPostingsEnum):
        per slot, the positions of ALL slot terms merge into one sorted
        union iterator; matching then proceeds exactly like ExactPhrase.
        Ours: per slot, union the slot terms' postings and aggregate a
        distinct-merged positions array per doc (one groupBy per slot,
        bucket-pruned scan), then the same shifted array_intersect chain as
        _compile_phrase. idf = sum over every constituent term (Lucene
        passes all termStatistics to the similarity)."""
        slots = [list(s) for s in q.slots]
        # a slot with NO indexed term can never match (UnionPostingsEnum
        # over an empty set is exhausted)
        present: list[list[str]] = []
        for s in slots:
            have = [t for t in s if t in stats]
            if not have:
                return self._empty()
            present.append(have)

        def slot_positions(terms: list[str], keep_dlq: bool):
            p = self.postings
            if "bucket" in p.columns:
                p = p.filter(F.col("bucket").isin(self._buckets(terms)))
            p = p.filter(F.col("term").isin(terms))
            aggs = [
                F.array_sort(
                    F.array_distinct(F.flatten(F.collect_list("positions")))
                ).alias("_pos")
            ]
            if keep_dlq:
                aggs.append(F.first("dlq").alias("dlq"))
            return p.groupBy("doc_id").agg(*aggs)

        base = slot_positions(present[0], keep_dlq=True).select(
            "doc_id", "dlq", F.col("_pos").alias("_p0")
        )
        joined = base
        for i, terms in enumerate(present[1:], start=1):
            nxt = slot_positions(terms, keep_dlq=False).select(
                "doc_id", F.col("_pos").alias(f"_p{i}")
            )
            joined = joined.join(nxt, "doc_id")

        def _shift_by(offset):
            return lambda x: x - F.lit(offset)

        starts = F.col("_p0")
        for i in range(1, len(present)):
            starts = F.array_intersect(
                starts, F.transform(F.col(f"_p{i}"), _shift_by(i))
            )
        tf = F.size(starts)
        out = joined.select("doc_id", "dlq", tf.alias("_ptf")).filter(
            F.col("_ptf") > 0
        )
        if not scored:
            return out.select("doc_id", F.lit(0.0).alias("score"))
        idf_sum = sum(
            self._idf(stats[t]["df"]) for s in present for t in s
        )
        norm = F.lit(BM25_K1) * (
            F.lit(1.0 - BM25_B)
            + F.lit(BM25_B) * F.col("dlq") / F.lit(float(self.avgdl))
        )
        score = (
            F.lit(q.boost) * F.lit(idf_sum) * F.col("_ptf") / (F.col("_ptf") + norm)
        )
        return out.select("doc_id", score.alias("score"))

    def _expand_terms(self, q: Query) -> DataFrame:
        """MultiTermQuery rewrite: expand against the terms dictionary
        (term_stats = our sorted terms dict; MultiTermQuery.java ≈L60)."""
        t = F.col("term")
        if isinstance(q, Prefix):
            cond = t.startswith(q.prefix)
        elif isinstance(q, Wildcard):
            rx = "^" + "".join(
                ".*" if c == "*" else "." if c == "?" else __import__("re").escape(c)
                for c in q.pattern
            ) + "$"
            cond = t.rlike(rx)
        elif isinstance(q, Regexp):
            cond = t.rlike("^" + q.pattern + "$")
        elif isinstance(q, Fuzzy):
            cond = F.levenshtein(t, F.lit(q.term)) <= q.max_edits
        elif isinstance(q, TermRange):
            # None bound = open-ended ([a TO *] / [* TO b] parser syntax)
            lo = (
                F.lit(True)
                if q.lower is None
                else (t >= q.lower if q.include_lower else t > q.lower)
            )
            hi = (
                F.lit(True)
                if q.upper is None
                else (t <= q.upper if q.include_upper else t < q.upper)
            )
            cond = lo & hi
        elif isinstance(q, TermInSet):
            cond = t.isin(list(q.terms))
        else:  # pragma: no cover
            raise TypeError(q)
        return self.term_stats.filter(cond).select("term")

    def _compile_multiterm(self, q: Query, scored: bool) -> DataFrame:
        """CONSTANT_SCORE_REWRITE (Lucene 8 default for multi-term queries):
        matching docs score == boost."""
        terms = self._expand_terms(q)
        matched = self.postings.join(
            F.broadcast(terms), "term", "left_semi"
        ).select("doc_id").dropDuplicates(["doc_id"])
        boost = getattr(q, "boost", 1.0)
        return matched.select(
            "doc_id", F.lit(float(boost) if scored else 0.0).alias("score")
        )

    def rewrite_multiterm(
        self, q: Query, method: str = "scoring_boolean", size: int = 50
    ) -> Query:
        """MultiTermQuery#rewrite scoring methods (MultiTermQuery.java
        ≈L60; the Lucene 8 default CONSTANT_SCORE_REWRITE is
        `_compile_multiterm` above):

        * 'scoring_boolean' — SCORING_BOOLEAN_REWRITE: every matching
          term becomes a SHOULD TermQuery scored with its OWN df; raises
          TooManyClauses past BooleanQuery#maxClauseCount (1024).
        * 'top_terms' — TopTermsScoringBooleanQueryRewrite(size): keep
          `size` terms. For Fuzzy, boost = 1 - ed/min(|term|, |target|)
          (FuzzyTermsEnum's similarity boost), queue ordered by boost
          desc then term asc — faithful. For constant-boost expansions
          (prefix/wildcard/range/set) the reference queue degenerates to
          term order; we order by docFreq desc, term asc (documented
          deviation: df-desc keeps the terms that can actually score).
        * 'top_terms_blended' — TopTermsBlendedFreqScoringRewrite(size):
          the kept set scores as a Blended query (df := max df of the
          set, per-term tfs, summed).

        The expansion runs ON THE CLUSTER against the terms dict
        (bucket-pruned for TermInSet; a filter scan otherwise, exactly
        the terms-dict walk Lucene's TermsEnum does RAM-side); only the
        winning <= max(size, 1024) terms come back to the driver.
        """
        cand = self._expand_terms(q).join(
            self.term_stats.select("term", "df"), "term"
        )
        boost = float(getattr(q, "boost", 1.0))
        if isinstance(q, Fuzzy):
            sim = 1.0 - F.levenshtein(
                F.col("term"), F.lit(q.term)
            ) / F.least(F.length("term"), F.lit(len(q.term))).cast("double")
            cand = cand.withColumn("_boost", sim)
            order = [F.desc("_boost"), F.asc("term")]
        else:
            cand = cand.withColumn("_boost", F.lit(1.0))
            order = [F.desc("df"), F.asc("term")]

        if method == "scoring_boolean":
            rows = cand.select("term", "_boost").limit(
                MAX_CLAUSE_COUNT + 1
            ).collect()
            if len(rows) > MAX_CLAUSE_COUNT:
                raise TooManyClauses(
                    f"multi-term expansion exceeds {MAX_CLAUSE_COUNT}"
                )
            return Boolean(
                should=[
                    Term(r["term"], boost * float(r["_boost"]))
                    for r in sorted(rows, key=lambda r: r["term"])
                ]
            )
        rows = cand.orderBy(*order).limit(size).collect()
        if method == "top_terms":
            return Boolean(
                should=[
                    Term(r["term"], boost * float(r["_boost"])) for r in rows
                ]
            )
        if method == "top_terms_blended":
            return Blended(
                terms=tuple(sorted(r["term"] for r in rows)), boost=boost
            )
        raise ValueError(method)

    def search_cached(self, q, k: int = 10, window: int = 20):
        """SolrIndexSearcher queryResultCache (SolrIndexSearcher.java
        ≈L60; solrconfig queryResultCache + queryResultWindowSize): the
        ORDERED result list of a (query, k) pair is cached so repeats and
        next-page requests skip scoring entirely. As in the reference, k
        rounds UP to the window multiple before executing, so a page-2
        ask (k=20 after k=10) is already in cache. Returns a list of Row
        (k rows — driver-sized by definition); keyed on the query AST's
        canonical repr (frozen dataclasses), valid for this Searcher's
        immutable snapshot."""
        want = ((k + window - 1) // window) * window
        key = repr(q)
        hit = self._result_cache.get(key)
        # a cached page satisfies the ask when it was fetched with a
        # window >= want, or when it came back short (query exhausted —
        # every larger k is satisfied too)
        if hit is None or (hit[0] < want and len(hit[1]) == hit[0]):
            rows = self.search(q, want, with_fields=False).collect()
            self._result_cache[key] = (want, rows)
            hit = self._result_cache[key]
        return hit[1][:k]

    def leading_wildcard_terms(self, pattern: str) -> DataFrame:
        """ReversedWildcardFilterFactory (solr/core/.../analysis/
        ReversedWildcardFilterFactory.java ≈L40): Solr indexes REVERSED
        tokens (marker + "oof" for "foo") so a leading wildcard `*oo`
        becomes a trailing PREFIX seek on the reversed dictionary instead
        of a full terms scan. Spark restatement: the reversed dictionary
        is the `reverse(term)` view of term_stats and the leading
        wildcard is `startswith` on it — on a reversed-bucketed terms
        dict this is the same bucket-pruned seek a Prefix does (the
        pattern must be `*suffix` with no inner wildcards; anything else
        belongs to the general `_expand_terms` rlike path)."""
        if not pattern.startswith("*") or any(
            c in pattern[1:] for c in "*?"
        ):
            raise ValueError("leading_wildcard_terms handles '*suffix'")
        rev_prefix = pattern[1:][::-1]
        return self.term_stats.filter(
            F.reverse(F.col("term")).startswith(rev_prefix)
        ).select("term", "df")

    def phrase_wildcard(self, parts: list, k: int = 10) -> DataFrame:
        """PhraseWildcardQuery (lucene/sandbox/.../search/
        PhraseWildcardQuery.java ≈L60): a phrase where any slot may be a
        multi-term subquery ("fast s*"). Semantics == MultiPhraseQuery
        over the per-slot terms-dict expansions (the sandbox class only
        optimizes WHICH segment expands first; matches and scores are
        MultiPhraseQuery's). `parts`: str for an exact slot, a
        multi-term Query (Prefix/Wildcard/...) for an expanding slot.
        Expansion is capped by BooleanQuery#maxClauseCount per slot."""
        slots = []
        for p in parts:
            if isinstance(p, str):
                slots.append((p,))
                continue
            rows = (
                self._expand_terms(p)
                .limit(MAX_CLAUSE_COUNT + 1)
                .collect()
            )
            if len(rows) > MAX_CLAUSE_COUNT:
                raise TooManyClauses(
                    f"phrase slot expansion exceeds {MAX_CLAUSE_COUNT}"
                )
            if not rows:
                return self._empty()
            slots.append(tuple(sorted(r["term"] for r in rows)))
        return self.search(
            MultiPhrase(slots=tuple(slots)), k, with_fields=False
        )

    def _lead_filter(self, q: Boolean, stats: dict) -> DataFrame | None:
        """ConjunctionDISI lead-iterator prefilter (ConjunctionDISI.java
        ≈L50: the conjunction advances by the SPARSEST iterator, so the
        other clauses only ever visit its doc ids). When a must-Term's df
        is both small in absolute terms and far below the other clauses'
        (the stats are already bound driver-side — no extra job), return
        its doc-id set to semi-join every other clause's scan BEFORE the
        union exchange: the wide clauses' posting rows drop at the scan
        instead of riding the shuffle. Broadcast is safe by the df cap."""
        if len(q.must) + len(q.filter) < 2:
            return None
        dfs = [
            (stats[c.term]["df"], c.term)
            for c in q.must + q.filter
            if isinstance(c, Term) and c.term in stats
        ]
        if not dfs:
            return None
        lead_df, lead_term = min(dfs)
        others = [d for d, _ in dfs if d != lead_df] + [
            self.n_docs
            for c in q.must + q.filter
            if not isinstance(c, Term)
        ]
        # worth it only when the lead is selective (small enough to
        # broadcast) AND at least 8x sparser than the widest clause —
        # otherwise the extra lead scan outweighs the shuffled-row savings
        if lead_df > 100_000 or (others and lead_df * 8 > max(others)):
            return None
        return F.broadcast(
            self._term_postings(lead_term).select("doc_id")
        )

    def _compile_boolean(self, q: Boolean, stats: dict, scored: bool) -> DataFrame:
        # Every _compile branch emits AT MOST ONE row per doc_id (Term =
        # one posting row; Synonym/DisMax/nested Boolean aggregate;
        # Phrase joins doc-distinct sides; multi-term/ConstantScore
        # dropDuplicates; MatchAll/FunctionScore scan docmeta). The
        # clause-match counters below are therefore plain SUMs — a
        # count_distinct here would force Catalyst's two-exchange
        # distinct-aggregate plan for zero semantic gain.
        parts = []
        n_must = len(q.must) + len(q.filter)
        lead = self._lead_filter(q, stats) if n_must >= 2 else None

        def gate(df: DataFrame) -> DataFrame:
            return df if lead is None else df.join(lead, "doc_id", "left_semi")

        for c in q.must:
            parts.append(
                gate(self._compile(c, stats, scored))
                .withColumn("_must", F.lit(1))
            )
        for i, c in enumerate(q.filter):
            # filter clauses are non-scoring -> cacheable (LRUQueryCache
            # caches exactly these: reused fq bitsets)
            if self.query_cache is not None:
                matched = self.query_cache.get_or_compute(
                    repr(c),
                    lambda c=c: self._compile(c, stats, scored=False)
                    .select("doc_id")
                    .dropDuplicates(["doc_id"]),
                ).withColumn("score", F.lit(0.0))
            else:
                matched = self._compile(c, stats, scored=False)
            parts.append(gate(matched).withColumn("_must", F.lit(1)))
        for c in q.should:
            # result docs must match every MUST clause, so the lead gate
            # is sound for SHOULD contributions too (they only ever add
            # score to docs already inside the lead's doc set)
            parts.append(
                gate(self._compile(c, stats, scored))
                .withColumn("_must", F.lit(0))
            )
        if not parts:
            return self._empty()
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        agg = u.groupBy("doc_id").agg(
            F.sum("score").alias("_s"),
            F.sum("_must").alias("_nm"),
            F.sum(1 - F.col("_must")).alias("_ns"),
        )
        cond = F.col("_nm") == n_must
        msm = q.min_should_match
        if n_must == 0:
            msm = max(msm, 1)  # pure-SHOULD boolean: at least one clause
        if q.should:
            cond = cond & (F.col("_ns") >= msm)
        res = agg.filter(cond).select(
            "doc_id", (F.col("_s") * q.boost).alias("score")
        )
        if q.must_not:
            excl = None
            for c in q.must_not:
                d = self._compile(c, stats, scored=False).select("doc_id")
                excl = d if excl is None else excl.unionByName(d)
            res = res.join(excl.dropDuplicates(["doc_id"]), "doc_id", "left_anti")
        return res

    def _empty(self) -> DataFrame:
        spark = self.postings.sparkSession
        return spark.createDataFrame([], "doc_id long, score double")

    # ---- public API --------------------------------------------------------
    def score_all(self, q) -> DataFrame:
        """All matching (doc_id, score) — the exhaustive scorer (no top-k)."""
        if isinstance(q, str):
            from .query import parse

            q = parse(q, self.index["stats"].get("profile", "en"))
        terms: set = set()
        _collect_terms(q, terms)
        stats = self._stats_for(sorted(terms))
        return self._compile(q, stats, scored=True)

    def search(self, q, k: int = 10, with_fields: bool = True) -> DataFrame:
        """Top-k by (score desc, doc_id asc) with late-materialized url."""
        scores = self.score_all(q)
        topk = scores.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
        if not with_fields:
            return topk
        return (
            topk.join(self.docmeta.select("doc_id", "url"), "doc_id")
            .orderBy(F.desc("score"), F.asc("doc_id"))
        )

    def count(self, q) -> int:
        """TotalHitCountCollector analog."""
        return self.score_all(q).count()

    def serve(self, index_dir: str | None = None, **kw):
        """In-process serving fast path with distributed fallback —
        see serve.py for the per-shard serving model and its honest
        RAM-budget cutover. Returns a HybridSearcher whose .search()
        answers supported queries without a Spark job (p50 in the ms
        range, vs the ~0.3-0.4 s Spark scheduling floor) and routes
        unsupported / over-budget queries back through this Searcher."""
        from .serve import HybridSearcher, ServingSearcher

        path = index_dir or self.index.get("path")
        if path is None:
            raise ValueError(
                "serve() needs the on-disk index path (read_index sets "
                "it; pass index_dir= when the index dict was built by hand)"
            )
        return HybridSearcher(
            ServingSearcher(path, similarity=self.similarity, **kw), self
        )

    def explain(self, terms: list[str], doc_id: int) -> DataFrame:
        """IndexSearcher#explain (Explanation tree, BM25Similarity
        #explain): per-term score breakdown for ONE document — (term, tf,
        df, idf, dl, tf_norm, contrib), contrib = idf * tf_norm, summed
        over rows = the doc's score for the OR query of `terms`.

        One bucket-pruned postings scan filtered to (terms, doc_id) +
        a broadcast stats join — the same partition pruning as a search,
        never a full scan."""
        stats = self._stats_for(sorted(set(terms)))
        p = self.postings
        if "bucket" in p.columns:
            p = p.filter(F.col("bucket").isin(self._buckets(list(stats))))
        rows = p.filter(
            F.col("term").isin(list(stats)) & (F.col("doc_id") == doc_id)
        ).select("term", "tf", "dlq")
        spark = self.postings.sparkSession
        sdf = spark.createDataFrame(
            [(t, s["df"], self._idf(s["df"])) for t, s in stats.items()],
            "term string, df long, idf double",
        )
        norm = F.lit(BM25_K1) * (
            F.lit(1.0 - BM25_B)
            + F.lit(BM25_B) * F.col("dlq") / F.lit(self.avgdl)
        )
        tf_norm = F.col("tf") / (F.col("tf") + norm)
        return (
            rows.join(F.broadcast(sdf), "term")
            .select(
                "term",
                "tf",
                "df",
                F.round("idf", 4).alias("idf"),
                F.col("dlq").alias("dl"),
                F.round(tf_norm, 4).alias("tf_norm"),
                F.round(F.col("idf") * tf_norm, 4).alias("contrib"),
            )
            .orderBy("term")
        )

    def search_after(
        self, q, after_score: float, after_doc: int, k: int = 10
    ) -> DataFrame:
        """searchAfter pagination: filter (sort tuple) > after, then top-k
        (TopFieldCollector#searchAfter)."""
        scores = self.score_all(q)
        cond = (F.col("score") < after_score) | (
            (F.col("score") == after_score) & (F.col("doc_id") > after_doc)
        )
        return scores.filter(cond).orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
