"""Single-node, exhaustive, pure-Python/numpy reference implementation —
the differential oracle (SURVEY.md §6.1: the TestWANDScorer pattern — assert
pruned/distributed top-k == brute-force top-k).

Shares the exact analysis/norm kernels with the engine (analysis.py,
norms.py) so any disagreement isolates the *distributed plan*, not the
scalar semantics. Scores in float64, identical formula to score.py.
"""

from __future__ import annotations

import math
import re
from collections import defaultdict

from . import BM25_B, BM25_K1
from .analysis import analyze
from .norms import quantized_length
from .query import (
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


def _levenshtein(a: str, b: str) -> int:
    if a == b:
        return 0
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


class OracleIndex:
    def __init__(self, rows, profile: str = "en"):
        """rows: iterable of (url, text, lang)."""
        rows = sorted(rows, key=lambda r: r[0])
        self.urls = [r[0] for r in rows]
        self.langs = [r[2] for r in rows]
        self.postings: dict[str, dict[int, list[int]]] = defaultdict(dict)
        lens = []
        cache: dict = {}
        for doc_id, (_url, text, _lang) in enumerate(rows):
            toks = analyze(text, profile, cache)
            lens.append(len(toks))
            for term, pos in toks:
                self.postings[term].setdefault(doc_id, []).append(pos)
        self.field_len = lens
        self.dlq = quantized_length(lens) if lens else []
        self.n_docs = len(rows)
        self.sum_ttf = int(sum(lens))
        self.avgdl = self.sum_ttf / self.n_docs if self.n_docs else 0.0
        self.profile = profile

    # ---- scoring ----------------------------------------------------------
    def _idf(self, df: int) -> float:
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def _bm25(self, tf: float, doc_id: int, idf: float, boost: float = 1.0) -> float:
        dlq = float(self.dlq[doc_id])
        norm = BM25_K1 * (1.0 - BM25_B + BM25_B * dlq / self.avgdl)
        return boost * idf * tf / (tf + norm)

    # ---- per-node evaluation: dict doc_id -> score -------------------------
    def _eval(self, q: Query, scored: bool = True) -> dict[int, float]:
        if isinstance(q, Term):
            pl = self.postings.get(q.term)
            if not pl:
                return {}
            idf = self._idf(len(pl))
            return {
                d: self._bm25(len(ps), d, idf, q.boost) if scored else 0.0
                for d, ps in pl.items()
            }
        if isinstance(q, Synonym):
            pls = [self.postings[t] for t in q.terms if t in self.postings]
            if not pls:
                return {}
            df = max(len(pl) for pl in pls)
            idf = self._idf(df)
            tf: dict[int, int] = defaultdict(int)
            for pl in pls:
                for d, ps in pl.items():
                    tf[d] += len(ps)
            return {
                d: self._bm25(t, d, idf, q.boost) if scored else 0.0
                for d, t in tf.items()
            }
        if isinstance(q, Phrase):
            pls = [self.postings.get(t) for t in q.terms]
            if any(pl is None for pl in pls):
                return {}
            idf = sum(self._idf(len(pl)) for pl in pls)
            out = {}
            docs = set(pls[0])
            for pl in pls[1:]:
                docs &= set(pl)
            for d in docs:
                starts = set(pls[0][d])
                for i, pl in enumerate(pls[1:], 1):
                    starts &= {p - i for p in pl[d]}
                if starts:
                    out[d] = (
                        self._bm25(len(starts), d, idf, q.boost) if scored else 0.0
                    )
            return out
        if isinstance(q, MultiPhrase):
            slot_pls = []
            for slot in q.slots:
                merged: dict[int, set] = {}
                for t in slot:
                    for d, ps in self.postings.get(t, {}).items():
                        merged.setdefault(d, set()).update(ps)
                if not merged:
                    return {}
                slot_pls.append(merged)
            idf = sum(
                self._idf(len(self.postings[t]))
                for slot in q.slots
                for t in slot
                if t in self.postings
            )
            docs = set(slot_pls[0])
            for pl in slot_pls[1:]:
                docs &= set(pl)
            out = {}
            for d in docs:
                starts = set(slot_pls[0][d])
                for i, pl in enumerate(slot_pls[1:], 1):
                    starts &= {p - i for p in pl[d]}
                if starts:
                    out[d] = (
                        self._bm25(len(starts), d, idf, q.boost) if scored else 0.0
                    )
            return out
        if isinstance(q, (Prefix, Wildcard, Regexp, Fuzzy, TermRange, TermInSet)):
            terms = self._expand(q)
            docs: set[int] = set()
            for t in terms:
                docs.update(self.postings[t])
            boost = getattr(q, "boost", 1.0)
            return {d: (boost if scored else 0.0) for d in docs}
        if isinstance(q, MatchAll):
            return {d: (q.boost if scored else 0.0) for d in range(self.n_docs)}
        if isinstance(q, Boost):
            return {d: s * q.boost for d, s in self._eval(q.child, scored).items()}
        if isinstance(q, ConstantScore):
            return {d: (q.boost if scored else 0.0) for d in self._eval(q.child, False)}
        if isinstance(q, DisMax):
            per_doc: dict[int, list[float]] = defaultdict(list)
            for c in q.children:
                for d, s in self._eval(c, scored).items():
                    per_doc[d].append(s)
            return {
                d: (max(ss) + q.tie_breaker * (sum(ss) - max(ss))) * q.boost
                for d, ss in per_doc.items()
            }
        if isinstance(q, LangFilter):
            child = self._eval(q.child, scored)
            return {d: s for d, s in child.items() if self.langs[d] == q.lang}
        if isinstance(q, Boolean):
            return self._eval_bool(q, scored)
        raise TypeError(q)

    def _expand(self, q: Query) -> list[str]:
        terms = self.postings.keys()
        if isinstance(q, Prefix):
            return [t for t in terms if t.startswith(q.prefix)]
        if isinstance(q, Wildcard):
            rx = "^" + "".join(
                ".*" if c == "*" else "." if c == "?" else re.escape(c)
                for c in q.pattern
            ) + "$"
            return [t for t in terms if re.match(rx, t)]
        if isinstance(q, Regexp):
            rx = re.compile("^" + q.pattern + "$")
            return [t for t in terms if rx.match(t)]
        if isinstance(q, Fuzzy):
            return [t for t in terms if _levenshtein(t, q.term) <= q.max_edits]
        if isinstance(q, TermRange):
            lo = (lambda t: t >= q.lower) if q.include_lower else (lambda t: t > q.lower)
            hi = (lambda t: t <= q.upper) if q.include_upper else (lambda t: t < q.upper)
            return [t for t in terms if lo(t) and hi(t)]
        if isinstance(q, TermInSet):
            return [t for t in q.terms if t in self.postings]
        raise TypeError(q)

    def _eval_bool(self, q: Boolean, scored: bool) -> dict[int, float]:
        musts = [self._eval(c, scored) for c in q.must]
        filts = [self._eval(c, False) for c in q.filter]
        shoulds = [self._eval(c, scored) for c in q.should]
        nots: set[int] = set()
        for c in q.must_not:
            nots.update(self._eval(c, False))
        msm = q.min_should_match
        if not musts and not filts:
            msm = max(msm, 1)
        out: dict[int, float] = {}
        if musts or filts:
            docs = None
            for m in musts + filts:
                docs = set(m) if docs is None else docs & set(m)
        else:
            docs = set()
            for s in shoulds:
                docs.update(s)
        for d in docs:
            if d in nots:
                continue
            n_should = sum(1 for s in shoulds if d in s)
            if q.should and n_should < msm:
                continue
            score = sum(m.get(d, 0.0) for m in musts) + sum(
                s.get(d, 0.0) for s in shoulds
            )
            out[d] = score * q.boost
        return out

    # ---- public -----------------------------------------------------------
    def search(self, q, k: int = 10):
        """Top-k [(doc_id, url, score)] by (score desc, doc_id asc)."""
        if isinstance(q, str):
            from .query import parse

            q = parse(q, self.profile)
        scores = self._eval(q, scored=True)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        return [(d, self.urls[d], s) for d, s in ranked]

    def count(self, q) -> int:
        if isinstance(q, str):
            from .query import parse

            q = parse(q, self.profile)
        return len(self._eval(q, scored=False))
