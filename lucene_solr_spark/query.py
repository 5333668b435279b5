"""Query AST + parser + logical rewrite.

Reference parity: the query algebra of lucene/core/src/java/org/apache/lucene/
search/ (TermQuery, BooleanQuery MUST/SHOULD/MUST_NOT/FILTER with
minimumNumberShouldMatch, PhraseQuery, PrefixQuery, WildcardQuery,
RegexpQuery, FuzzyQuery, TermRangeQuery, TermInSetQuery, SynonymQuery,
MatchAllDocsQuery, BoostQuery, ConstantScoreQuery, DisjunctionMaxQuery) and
the classic query-parser syntax subset (`+must should -not "a phrase" pref*`,
lucene/queryparser/.../classic/QueryParser.jj).

Rewrite (IndexSearcher#rewrite fixpoint + BooleanQuery#rewrite ≈L300-450):
flatten nested same-occur booleans, unwrap single-SHOULD, dedup clauses —
done here on the (tiny) AST in Python before plan construction.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


class Query:
    pass


@dataclass(frozen=True)
class Term(Query):
    term: str
    boost: float = 1.0


@dataclass(frozen=True)
class Phrase(Query):
    terms: tuple
    slop: int = 0
    boost: float = 1.0


@dataclass(frozen=True)
class MultiPhrase(Query):
    """MultiPhraseQuery (MultiPhraseQuery.java ≈L60): each slot holds a SET
    of alternative terms — the shape synonym/WDGF token stacks produce.
    slots: tuple of tuples of terms; a start position p matches if for
    every slot i SOME slot term occurs at p+i."""

    slots: tuple  # tuple[tuple[str, ...], ...]
    boost: float = 1.0


@dataclass(frozen=True)
class Prefix(Query):
    prefix: str
    boost: float = 1.0


@dataclass(frozen=True)
class Wildcard(Query):
    pattern: str  # glob: * and ?
    boost: float = 1.0


@dataclass(frozen=True)
class Regexp(Query):
    pattern: str
    boost: float = 1.0


@dataclass(frozen=True)
class Fuzzy(Query):
    term: str
    max_edits: int = 2
    boost: float = 1.0


@dataclass(frozen=True)
class TermRange(Query):
    lower: str
    upper: str
    include_lower: bool = True
    include_upper: bool = True
    boost: float = 1.0


@dataclass(frozen=True)
class TermInSet(Query):
    terms: tuple
    boost: float = 1.0


@dataclass(frozen=True)
class Synonym(Query):
    """OR over synonyms scored as one pseudo-term: summed tf, max df
    (SynonymQuery.java ≈L50)."""

    terms: tuple
    boost: float = 1.0


@dataclass(frozen=True)
class Blended(Query):
    """BlendedTermQuery (lucene/core/.../search/BlendedTermQuery.java
    ≈L60, BooleanRewrite): every term scores SEPARATELY (own tf) but with
    a blended df = max df across the set; per-doc score is the sum.
    Contrast Synonym, which merges tfs into one pseudo-term."""

    terms: tuple
    boost: float = 1.0


@dataclass(frozen=True)
class MatchAll(Query):
    boost: float = 1.0


@dataclass
class Boolean(Query):
    must: list = field(default_factory=list)
    should: list = field(default_factory=list)
    must_not: list = field(default_factory=list)
    filter: list = field(default_factory=list)
    min_should_match: int = 0
    boost: float = 1.0


@dataclass(frozen=True)
class Boost(Query):
    child: Query
    boost: float


@dataclass(frozen=True)
class ConstantScore(Query):
    child: Query
    boost: float = 1.0


@dataclass
class DisMax(Query):
    children: list
    tie_breaker: float = 0.0
    boost: float = 1.0


@dataclass(frozen=True)
class FunctionScore(Query):
    """FunctionQuery (lucene/queries/function/FunctionQuery.java; Solr's
    `bf` boost-function param): matches every document with
    score = boost * expr(docmeta columns). `expr` is a Spark SQL scalar
    expression over docmeta columns (doc_id, field_len, lang, ...), e.g.
    Solr recip(x,m,a,b) == "a / (m * x + b)". Used as an additive SHOULD
    sibling of a required user query (ExtendedDismaxQParser wraps as
    `+(main) (bf)`), never alone as the match-all it would otherwise be."""

    expr: str
    boost: float = 1.0


@dataclass(frozen=True)
class LangFilter(Query):
    """Solr `fq=lang:x`-style metadata filter composed with a scored query."""

    child: Query
    lang: str


_QTOK_RE = re.compile(
    r"""(?P<mod>[+\-]?)(?:"(?P<phrase>[^"]*)"|(?P<word>[^\s"]+))"""
)


def parse(text: str, profile: str = "en") -> Query:
    """Classic-syntax subset: `+must should -not "exact phrase" pref*`.
    Terms are analyzed with the index profile's chain (query-time analyzer ==
    index-time analyzer); a bare analyzed-away term (e.g. a stopword) yields
    no clause, matching Lucene's parser dropping empty analyzed terms.
    """
    from .analysis import analyze_query_terms

    b = Boolean()
    for m in _QTOK_RE.finditer(text):
        mod, phrase, word = m.group("mod"), m.group("phrase"), m.group("word")
        if phrase is not None:
            terms = analyze_query_terms(phrase, profile)
            if not terms:
                continue
            q: Query = Phrase(tuple(terms)) if len(terms) > 1 else Term(terms[0])
        elif word.endswith("*") and len(word) > 1 and "*" not in word[:-1]:
            q = Prefix(word[:-1].lower())
        else:
            terms = analyze_query_terms(word, profile)
            if not terms:
                continue
            q = Term(terms[0]) if len(terms) == 1 else Phrase(tuple(terms))
        if mod == "+":
            b.must.append(q)
        elif mod == "-":
            b.must_not.append(q)
        else:
            b.should.append(q)
    return rewrite(b)


def _dedup(lst):
    try:
        return list(dict.fromkeys(lst))  # order-preserving
    except TypeError:  # unhashable (nested mutable Boolean) — keep as-is
        return lst


def rewrite(q: Query) -> Query:
    """BooleanQuery#rewrite-style simplification to fixpoint."""
    if not isinstance(q, Boolean):
        return q
    must = [rewrite(c) for c in q.must]
    should = [rewrite(c) for c in q.should]
    must_not = [rewrite(c) for c in q.must_not]
    filt = [rewrite(c) for c in q.filter]
    # flatten nested pure-SHOULD booleans into this one (same-occur flatten)
    flat_should = []
    for c in should:
        if (
            isinstance(c, Boolean)
            and not c.must
            and not c.must_not
            and not c.filter
            and c.min_should_match <= 1
            and c.boost == 1.0
        ):
            flat_should.extend(c.should)
        else:
            flat_should.append(c)
    should = _dedup(flat_should)
    must = _dedup(must)
    # single-clause unwrap
    if len(must) == 1 and not should and not must_not and not filt:
        return must[0]
    if (
        len(should) == 1
        and not must
        and not must_not
        and not filt
        and q.min_should_match <= 1
    ):
        return should[0]
    # MUST_NOT-only -> +MatchAll (BooleanQuery#rewrite)
    if must_not and not must and not should and not filt:
        must = [MatchAll()]
    return Boolean(must, should, must_not, filt, q.min_should_match, q.boost)
