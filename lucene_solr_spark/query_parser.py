"""Classic Lucene query-parser syntax -> Query AST.

Reference parity: lucene/queryparser/src/java/org/apache/lucene/
queryparser/classic/QueryParser.jj (grammar, ≈L1-400) and
QueryParserBase#addClause (the famous left-to-right AND/OR promotion —
classic Lucene has NO boolean precedence; `a AND b OR c` promotes only
the AND's neighbors). From-scratch recursive-descent implementation.

Supported syntax (the documented classic subset):

  term            analyzed with the index profile's chain
  "a phrase"~2    phrase with slop
  te?m  te*m  t*  wildcards (trailing-star-only becomes Prefix)
  term~  term~1   fuzzy (default max_edits 2)
  term^4  (...)^2 boosts
  [a TO b] {a TO b}  term ranges (inclusive / exclusive, mixable)
  +req -prohib NOT x  occur modifiers
  a AND b  a OR b  a && b  a || b
  ( grouping )
  lang:en         metadata field -> constant-score filter clause (Solr fq
                  semantics; the engine scores one text field)
  text:foo        explicit default field
  \\-escaped specials inside terms

Analysis parity with Lucene: full-analyzed terms go through the profile
chain (query analyzer == index analyzer); MULTITERM queries (wildcard,
prefix, fuzzy, range) are only lowercased, matching Lucene's
``normalizeMultiTerm`` (no stemming of ``runn*``).
"""

from __future__ import annotations

import re

from .query import (
    Boolean,
    Boost,
    ConstantScore,
    Fuzzy,
    LangFilter,
    MatchAll,
    Phrase,
    Prefix,
    Query,
    Term,
    TermRange,
    Wildcard,
    rewrite,
)

_WS = re.compile(r"\s+")
_QUOTED = re.compile(r'"((?:[^"\\]|\\.)*)"(~(?P<slop>\d+))?(\^(?P<boost>\d+(?:\.\d+)?))?')
_RANGE = re.compile(
    r"(?P<lb>[\[\{])\s*(?P<lo>[^\s\]\}]+)\s+TO\s+(?P<hi>[^\s\]\}]+)\s*"
    r"(?P<rb>[\]\}])(\^(?P<boost>\d+(?:\.\d+)?))?"
)
_WORD = re.compile(r"(?:[^\s()\"\\^~]|\\.)+")
_FIELD = re.compile(r"(?:[A-Za-z_][\w]*):")

_CONJ_NONE, _CONJ_AND, _CONJ_OR = 0, 1, 2
_MOD_NONE, _MOD_REQ, _MOD_NOT = 0, 1, 2

KNOWN_FIELDS = ("text", "lang")


class QueryParseError(ValueError):
    pass


def _unescape(s: str) -> str:
    return re.sub(r"\\(.)", r"\1", s)


class _Scanner:
    """Cursor over the query string; the parser pulls structured pieces."""

    def __init__(self, text: str):
        self.text = text
        self.pos = 0

    def skip_ws(self) -> None:
        m = _WS.match(self.text, self.pos)
        if m:
            self.pos = m.end()

    def eof(self) -> bool:
        self.skip_ws()
        return self.pos >= len(self.text)

    def peek(self) -> str:
        self.skip_ws()
        return self.text[self.pos] if self.pos < len(self.text) else ""

    def take(self, rx: re.Pattern):
        self.skip_ws()
        m = rx.match(self.text, self.pos)
        if m:
            self.pos = m.end()
        return m

    def take_char(self, ch: str) -> bool:
        self.skip_ws()
        if self.pos < len(self.text) and self.text[self.pos] == ch:
            self.pos += 1
            return True
        return False


def _suffixes(sc: _Scanner):
    """Optional `~N` fuzzy/slop then `^f` boost glued to the last token."""
    fuzzy = None
    boost = None
    if sc.pos < len(sc.text) and sc.text[sc.pos] == "~":
        sc.pos += 1
        m = re.match(r"\d+(\.\d+)?", sc.text[sc.pos:])
        if m:
            sc.pos += m.end()
            fuzzy = float(m.group(0))
        else:
            fuzzy = -1.0  # bare ~ (default edits)
    if sc.pos < len(sc.text) and sc.text[sc.pos] == "^":
        sc.pos += 1
        m = re.match(r"\d+(\.\d+)?", sc.text[sc.pos:])
        if not m:
            raise QueryParseError("expected number after ^")
        sc.pos += m.end()
        boost = float(m.group(0))
    return fuzzy, boost


def _boost(q: Query, b) -> Query:
    return Boost(q, float(b)) if b is not None and float(b) != 1.0 else q


class _Parser:
    def __init__(self, profile: str, default_field: str = "text"):
        self.profile = profile
        self.default_field = default_field

    # -- analysis ----------------------------------------------------------
    def _analyze(self, raw: str):
        from .analysis import analyze_query_terms

        return analyze_query_terms(_unescape(raw), self.profile)

    # -- grammar -----------------------------------------------------------
    def parse(self, text: str) -> Query:
        sc = _Scanner(text)
        q = self._query(sc, self.default_field)
        if not sc.eof():
            raise QueryParseError(
                f"unparsed input at {sc.pos}: {text[sc.pos:]!r}"
            )
        return rewrite(q) if q is not None else MatchAll()

    def _query(self, sc: _Scanner, field: str):
        """clause* with QueryParserBase#addClause occur assembly."""
        clauses: list[list] = []  # [occur, query] pairs; occur mutable
        while not sc.eof() and sc.peek() != ")":
            conj = self._conj(sc)
            mods = self._mods(sc)
            item = self._clause(sc, field)
            if item is None:  # analyzed away (stopword-only)
                continue
            q, is_filter = item
            # addClause(QueryParserBase ≈L480): AND promotes the PREVIOUS
            # clause to MUST unless it is prohibited
            if clauses and conj == _CONJ_AND and clauses[-1][0] != "must_not":
                clauses[-1][0] = "must"
            if mods == _MOD_NOT:
                occur = "must_not"
            elif mods == _MOD_REQ or conj == _CONJ_AND:
                occur = "must"
            elif is_filter:
                occur = "filter"  # metadata fields are non-scoring (fq)
            else:
                occur = "should"
            clauses.append([occur, q])
        if not clauses:
            return None
        b = Boolean()
        for occur, q in clauses:
            getattr(b, occur).append(q)
        return b

    def _conj(self, sc: _Scanner) -> int:
        save = sc.pos
        m = sc.take(_WORD)
        if m:
            w = m.group(0)
            if w in ("AND", "&&"):
                return _CONJ_AND
            if w in ("OR", "||"):
                return _CONJ_OR
        sc.pos = save
        return _CONJ_NONE

    def _mods(self, sc: _Scanner) -> int:
        save = sc.pos
        m = sc.take(_WORD)
        if m and m.group(0) in ("NOT", "!"):
            return _MOD_NOT
        sc.pos = save
        if sc.take_char("+"):
            return _MOD_REQ
        if sc.take_char("-"):
            return _MOD_NOT
        return _MOD_NONE

    def _clause(self, sc: _Scanner, field: str):
        """Returns (query, is_metadata_filter) or None if analyzed away."""
        sc.skip_ws()
        # optional field: prefix
        m = _FIELD.match(sc.text, sc.pos)
        if m:
            fname = m.group(0)[:-1]
            if fname not in KNOWN_FIELDS:
                raise QueryParseError(f"unknown field {fname!r}")
            sc.pos = m.end()
            field = fname

        ch = sc.peek()
        if ch == "(":
            sc.take_char("(")
            inner = self._query(sc, field)
            if not sc.take_char(")"):
                raise QueryParseError("expected )")
            _, boost = _suffixes(sc)
            if inner is None:
                return None
            return _boost(inner, boost), False
        if ch == '"':
            m = sc.take(_QUOTED)
            if not m:
                raise QueryParseError("unterminated phrase")
            terms = self._analyze(m.group(1))
            if not terms:
                return None
            slop = int(m.group("slop") or 0)
            q: Query = (
                Phrase(tuple(terms), slop=slop)
                if len(terms) > 1
                else Term(terms[0])
            )
            return _boost(q, m.group("boost")), False
        if ch in "[{":
            m = sc.take(_RANGE)
            if not m:
                raise QueryParseError("malformed range (expected [a TO b])")
            lo = None if m.group("lo") == "*" else _unescape(m.group("lo")).lower()
            hi = None if m.group("hi") == "*" else _unescape(m.group("hi")).lower()
            q = TermRange(
                lo,
                hi,
                include_lower=m.group("lb") == "[",
                include_upper=m.group("rb") == "]",
            )
            return _boost(q, m.group("boost")), False

        m = sc.take(_WORD)
        if not m:
            raise QueryParseError(f"unexpected character {ch!r}")
        raw = m.group(0)
        fuzzy, boost = _suffixes(sc)

        if field == "lang":
            q = ConstantScore(LangFilter(MatchAll(), _unescape(raw).lower()))
            return _boost(q, boost), True

        has_wild = re.search(r"(?<!\\)[*?]", raw) is not None
        if has_wild:
            # multiterm normalization: lowercase only (no stemming)
            pat = _unescape(raw).lower()
            if (
                pat.endswith("*")
                and "*" not in pat[:-1]
                and "?" not in pat
                and len(pat) > 1
            ):
                q = Prefix(pat[:-1])
            else:
                q = Wildcard(pat)
            return _boost(q, boost), False
        if fuzzy is not None:
            # bare `~` (encoded as fuzzy < 0) = 2 edits, the Lucene default;
            # explicit `~N` = exactly N edits capped at 2 — in particular
            # `term~0` means EXACT match (0 edits), not maximal fuzziness.
            edits = 2 if fuzzy < 0 else min(int(fuzzy), 2)
            q = Fuzzy(_unescape(raw).lower(), max_edits=edits)
            return _boost(q, boost), False

        terms = self._analyze(raw)
        if not terms:
            return None
        q = Term(terms[0]) if len(terms) == 1 else Phrase(tuple(terms))
        return _boost(q, boost), False


def parse_classic(
    text: str, profile: str = "en", default_field: str = "text"
) -> Query:
    """Parse a classic-syntax query string into the Query AST (then
    BooleanQuery-rewrite). Raises QueryParseError on malformed input."""
    return _Parser(profile, default_field).parse(text)


def parse_edismax(
    text: str,
    profile: str = "en",
    mm: int = 0,
    tie: float = 0.0,
    phrase_boost: float = 0.0,
    phrase_slop: int = 0,
    pf2: float = 0.0,
    ps2: int = 0,
    pf3: float = 0.0,
    ps3: int = 0,
    bq: "Query | None" = None,
    bf: str | None = None,
) -> Query:
    """eDisMax-style user-query parsing (solr/search/ExtendedDismaxQParser
    ≈L200): forgiving end-user syntax — bare words become SHOULD clauses
    governed by `mm` (minimum-should-match), +/- survive, all other
    classic specials are treated as literal text (the escape-everything
    step), and when `phrase_boost` > 0 the whole query is re-added as a
    sloppy phrase SHOULD clause (the `pf`/`ps` params), rewarding docs
    where the terms appear together.

    Round-4 param surface (ExtendedDismaxQParser#addShingledPhraseQueries
    / #getBoostQueries / #getBoostFunctions):
      pf2/ps2 — every adjacent BIGRAM of the non-negated query terms is
        added as a slop-ps2 phrase SHOULD clause boosted by pf2;
      pf3/ps3 — same for adjacent TRIGRAMS;
      bq — an extra Query whose score ADDS to matching docs (additive,
        unlike Boost which multiplies);
      bf — a boost function: Spark SQL scalar expression over docmeta
        columns, wrapped as FunctionScore (Solr recip(x,m,a,b) ==
        "a / (m * x + b)").
    All boost clauses sit OUTSIDE the mm-governed boolean as optional
    siblings of the REQUIRED user query — `+(main) pf pf2 pf3 bq bf` —
    so they never affect matching, only ranking.

    The engine scores ONE text field, so the per-field dismax of `qf`
    degenerates to that field; `tie` is accepted for API parity and used
    only when a caller composes multiple fields into an explicit DisMax.
    """
    del tie  # single scored field: qf-dismax degenerates (documented)
    from .analysis import analyze_query_terms

    b = Boolean(min_should_match=mm)
    all_terms: list[str] = []
    for m in re.finditer(r"(?P<mod>[+\-]?)(?:\"(?P<ph>[^\"]*)\"|(?P<w>\S+))", text):
        mod, ph, w = m.group("mod"), m.group("ph"), m.group("w")
        if ph is not None:
            terms = analyze_query_terms(ph, profile)
            if not terms:
                continue
            q: Query = Phrase(tuple(terms)) if len(terms) > 1 else Term(terms[0])
        else:
            terms = analyze_query_terms(w, profile)
            if not terms:
                continue
            q = Term(terms[0]) if len(terms) == 1 else Phrase(tuple(terms))
        if mod != "-":
            all_terms.extend(terms)
        if mod == "+":
            b.must.append(q)
        elif mod == "-":
            b.must_not.append(q)
        else:
            b.should.append(q)
    extras: list[Query] = []
    if phrase_boost > 0 and len(all_terms) > 1:
        # pf sits OUTSIDE the mm-governed boolean (ExtendedDismaxQParser
        # adds the phrase query as a sibling optional clause of the main
        # query, so mm never counts it)
        extras.append(
            Boost(Phrase(tuple(all_terms), slop=phrase_slop), phrase_boost)
        )
    if pf2 > 0 and len(all_terms) >= 2:
        extras.extend(
            Boost(Phrase(tuple(all_terms[i : i + 2]), slop=ps2), pf2)
            for i in range(len(all_terms) - 1)
        )
    if pf3 > 0 and len(all_terms) >= 3:
        extras.extend(
            Boost(Phrase(tuple(all_terms[i : i + 3]), slop=ps3), pf3)
            for i in range(len(all_terms) - 2)
        )
    if bq is not None:
        extras.append(bq)
    if bf is not None:
        from .query import FunctionScore

        extras.append(FunctionScore(expr=bf))
    if extras:
        return rewrite(Boolean(must=[rewrite(b)], should=extras))
    return rewrite(b)


def parse_simple(
    text: str, profile: str = "en", default_op: str = "AND"
) -> Query:
    """Lucene SimpleQueryParser (lucene/queryparser/src/java/org/apache/
    lucene/queryparser/simple/SimpleQueryParser.java ≈L80): the
    end-user-safe grammar — it NEVER raises; malformed input degrades to
    literal terms. Supported operators (the default feature flags):

      ``a b``        clauses joined with ``default_op`` (AND_OPERATOR /
                     OR_OPERATOR ctor arg)
      ``a | b``      OR (lowest precedence; ``+``/whitespace binds tighter,
                     matching the reference's left-to-right buildup where
                     ``|`` starts a new SHOULD branch)
      ``-a``         NOT (prohibited within its AND group)
      ``"a b"~2``    phrase, optional NEAR slop
      ``te*``        trailing-star prefix (PREFIX_OPERATOR; mid-word ``*``
                     is literal text in SimpleQueryParser, unlike classic)
      ``a~1``        fuzzy (FUZZY_OPERATOR, max_edits default 2)
      ``( ... )``    precedence grouping

    Degradation rules, as in the reference: an unbalanced ``"`` consumes
    to end-of-string as the phrase body; an unbalanced ``(`` parses to
    end-of-string; a dangling operator is dropped; an empty/all-stopword
    query yields MatchAll (reference returns null -> match-nothing at the
    IndexSearcher level; we surface the identity element instead so
    composition never NPEs — documented deviation).

    Multi-term operands (prefix, fuzzy) are lowercased only, never
    stemmed, mirroring ``SimpleQueryParser#newPrefixQuery`` going through
    ``normalizeMultiTerm`` — same discipline as parse_classic.
    """
    from .analysis import analyze_query_terms

    pos = [0]
    n = len(text)

    def _ws() -> None:
        while pos[0] < n and text[pos[0]].isspace():
            pos[0] += 1

    def _word() -> str:
        out = []
        while pos[0] < n:
            c = text[pos[0]]
            if c == "\\" and pos[0] + 1 < n:
                out.append(text[pos[0] + 1])
                pos[0] += 2
                continue
            if c.isspace() or c in '|()"~' or (c == "-" and not out):
                break
            out.append(c)
            pos[0] += 1
        return "".join(out)

    def _atom() -> Query | None:
        _ws()
        if pos[0] >= n:
            return None
        c = text[pos[0]]
        if c == "(":
            pos[0] += 1
            q = _or()
            _ws()
            if pos[0] < n and text[pos[0]] == ")":
                pos[0] += 1
            return q
        if c == '"':
            pos[0] += 1
            end = text.find('"', pos[0])
            body = text[pos[0]:] if end < 0 else text[pos[0]:end]
            pos[0] = n if end < 0 else end + 1
            slop = 0
            if pos[0] < n and text[pos[0]] == "~":
                m = re.match(r"~(\d+)", text[pos[0]:])
                if m:
                    slop = int(m.group(1))
                    pos[0] += m.end()
            terms = analyze_query_terms(_unescape(body), profile)
            if not terms:
                return None
            return (
                Term(terms[0])
                if len(terms) == 1
                else Phrase(tuple(terms), slop=slop)
            )
        w = _word()
        if not w:
            pos[0] += 1  # stray ')' or lone '-' — skip, never raise
            return None
        if w.endswith("*") and len(w) > 1:
            return Prefix(w[:-1].lower())
        if pos[0] < n and text[pos[0]] == "~":
            m = re.match(r"~(\d+)?", text[pos[0]:])
            pos[0] += m.end()
            edits = int(m.group(1)) if m.group(1) else 2
            return Term(w.lower()) if edits == 0 else Fuzzy(w.lower(), edits)
        terms = analyze_query_terms(w, profile)
        if not terms:
            return None
        return Term(terms[0]) if len(terms) == 1 else Phrase(tuple(terms))

    def _group() -> Query | None:
        """One default_op-joined run of [-]atom clauses (stops at | or ))."""
        must: list[Query] = []
        must_not: list[Query] = []
        while True:
            _ws()
            if pos[0] >= n or text[pos[0]] in "|)":
                break
            negated = False
            while pos[0] < n and text[pos[0]] == "-":
                negated = not negated
                pos[0] += 1
            q = _atom()
            if q is None:
                continue
            (must_not if negated else must).append(q)
        if not must and not must_not:
            return None
        if len(must) == 1 and not must_not:
            return must[0]
        if default_op.upper() == "AND":
            return Boolean(must=must, must_not=must_not)
        return Boolean(should=must, must_not=must_not)

    def _or() -> Query | None:
        branches: list[Query] = []
        while True:
            g = _group()
            if g is not None:
                branches.append(g)
            _ws()
            if pos[0] < n and text[pos[0]] == "|":
                pos[0] += 1
                continue
            break
        if not branches:
            return None
        return branches[0] if len(branches) == 1 else Boolean(should=branches)

    q = _or()
    return rewrite(q) if q is not None else MatchAll()


def expand_synonyms(q, synonyms: dict) -> "Query":
    """Query-time synonym expansion (lucene/analysis/.../synonym/
    SynonymGraphFilter applied at QUERY time + QueryBuilder's graph query
    construction): Term(t) with synonyms becomes SynonymQuery(t, syns...)
    (summed tf, max df — SynonymQuery.java), and Phrase(t1..tn) becomes
    MultiPhraseQuery with a per-slot alternative set. Unlike index-time
    stacking (which FlattenGraphFilter makes lossy — analysis.py), the
    query-time rewrite preserves exact phrase semantics: this is the path
    Lucene documentation recommends for multi-token-safe synonyms.

    ``synonyms``: term -> list of single-token synonyms (symmetric
    application is the caller's choice, as in Solr's expand=true/false)."""
    from .query import (
        Boolean,
        Boost,
        ConstantScore,
        DisMax,
        MultiPhrase,
        Phrase,
        Synonym,
        Term,
    )

    def slot(t: str) -> tuple:
        return tuple([t] + list(synonyms.get(t, ())))

    if isinstance(q, Term):
        alts = slot(q.term)
        if len(alts) == 1:
            return q
        return Synonym(terms=alts, boost=q.boost)
    if isinstance(q, Phrase) and q.slop == 0:
        if not any(t in synonyms for t in q.terms):
            return q
        return MultiPhrase(
            slots=tuple(slot(t) for t in q.terms), boost=q.boost
        )
    if isinstance(q, Boolean):
        return Boolean(
            must=[expand_synonyms(c, synonyms) for c in q.must],
            should=[expand_synonyms(c, synonyms) for c in q.should],
            must_not=[expand_synonyms(c, synonyms) for c in q.must_not],
            filter=[expand_synonyms(c, synonyms) for c in q.filter],
            min_should_match=q.min_should_match,
            boost=q.boost,
        )
    if isinstance(q, Boost):
        return Boost(expand_synonyms(q.child, synonyms), q.boost)
    if isinstance(q, ConstantScore):
        return ConstantScore(expand_synonyms(q.child, synonyms), q.boost)
    if isinstance(q, DisMax):
        # parse_edismax output trees are DisMax-rooted; without this
        # branch synonym expansion silently skipped eDisMax queries.
        return DisMax(
            children=[expand_synonyms(c, synonyms) for c in q.children],
            tie_breaker=q.tie_breaker,
            boost=q.boost,
        )
    return q


def parse_field_boosts(qf: str) -> dict[str, float]:
    """Solr qf/pf syntax — ``"title^2 body^0.5 body"`` -> {field: boost}
    (SolrPluginUtils#parseFieldBoosts ≈L120). A repeated field keeps the
    LAST boost; a bare field gets boost 1.0; blank input -> {}."""
    out: dict[str, float] = {}
    for tok in qf.split():
        if "^" in tok:
            name, _, b = tok.partition("^")
            out[name] = float(b)
        else:
            out[tok] = 1.0
    return out


def resolve_field_aliases(
    qf: dict[str, float], aliases: dict[str, dict[str, float]]
) -> dict[str, float]:
    """eDisMax field aliasing (``f.<alias>.qf`` —
    ExtendedDismaxQParser.Alias / #addAliasesFromRequest ≈L1300): a
    pseudo-field in qf expands to its alias's real-field map with boosts
    MULTIPLIED; aliases may reference other aliases (depth-first), and a
    cycle raises ValueError like Solr's "Field aliases lead to a cycle".
    Boosts for the same real field arriving down different paths ADD
    (the field appears once per DisMax with the summed boost)."""
    out: dict[str, float] = {}

    def expand(field: str, boost: float, seen: tuple) -> None:
        if field in seen:
            raise ValueError(
                f"Field aliases lead to a cycle: {' -> '.join(seen + (field,))}"
            )
        sub = aliases.get(field)
        if sub is None:
            out[field] = out.get(field, 0.0) + boost
            return
        for f2, b2 in sub.items():
            expand(f2, boost * b2, seen + (field,))

    for f, b in qf.items():
        expand(f, b, ())
    return out


# ---------------------------------------------------------------------------
# Query#toString analog: render a parsed AST back to classic query-parser
# syntax. Contract (pinned by the grammar-fuzz round-trip test): for any
# string s the classic parser accepts, parse(render(parse(s))) ==
# parse(s) — i.e. rendering is a faithful fixed point of the parse. The
# reference's Query.toString has the same re-parseable intent for the
# classic syntax subset (lucene/core/.../search/Query.java ≈L40 toString;
# QueryParser round-trips in TestQueryParser).
# ---------------------------------------------------------------------------


def _render_num(x: float) -> str:
    s = f"{x:g}"
    return s


def _render_atom(q: Query) -> str:
    from .query import (
        Boolean,
        Boost,
        ConstantScore,
        Fuzzy,
        LangFilter,
        MatchAll,
        Phrase,
        Prefix,
        Term,
        TermRange,
        Wildcard,
    )

    if isinstance(q, Term):
        return q.term
    if isinstance(q, Phrase):
        body = '"' + " ".join(q.terms) + '"'
        return body + (f"~{q.slop}" if q.slop else "")
    if isinstance(q, Prefix):
        return q.prefix + "*"
    if isinstance(q, Wildcard):
        return q.pattern
    if isinstance(q, Fuzzy):
        return f"{q.term}~{q.max_edits}"
    if isinstance(q, TermRange):
        lo = q.lower if q.lower is not None else "*"
        hi = q.upper if q.upper is not None else "*"
        return (
            ("[" if q.include_lower else "{")
            + f"{lo} TO {hi}"
            + ("]" if q.include_upper else "}")
        )
    if isinstance(q, Boost):
        child = q.child
        if isinstance(child, Boolean):
            return f"({_render_bool(child)})^{_render_num(q.boost)}"
        return f"{_render_atom(child)}^{_render_num(q.boost)}"
    if isinstance(q, ConstantScore) and isinstance(q.child, LangFilter):
        return f"lang:{q.child.lang}"
    if isinstance(q, Boolean):
        return f"({_render_bool(q)})"
    if isinstance(q, MatchAll):
        return ""
    raise ValueError(f"render_classic: unsupported node {type(q).__name__}")


def _render_bool(b) -> str:
    from .query import MatchAll

    parts = []
    for c in b.must:
        if isinstance(c, MatchAll):
            # BooleanQuery#rewrite adds +MatchAll to MUST_NOT-only
            # queries; "-x" alone re-parses back to exactly that, so the
            # synthetic MatchAll is omitted from the rendering.
            continue
        parts.append("+" + _render_atom(c))
    for c in b.should:
        parts.append(_render_atom(c))
    for c in b.filter:
        parts.append(_render_atom(c))
    for c in b.must_not:
        parts.append("-" + _render_atom(c))
    return " ".join(parts)


def render_classic(q: Query) -> str:
    """AST -> classic syntax (Query.toString() analog).

    Fixed-point contract — analysis-stable profiles ONLY:
    parse_classic(render_classic(p), profile=P) == p holds for profiles P
    whose analysis chain is idempotent on its own output (e.g.
    'standard': lowercase only), and that is what the 3000-string fuzz
    test pins. Under profile='en' the rendered terms are POST-analysis
    stems, and re-parsing re-analyzes them: stems that collide with
    stopwords are dropped ('being'->'be'->stopword) and Porter is not
    idempotent ('university'->'univers'->'univ'), so the round-trip can
    change the AST — same caveat as Lucene's own QueryParser.toString(),
    which is documented as not guaranteed to re-parse identically.
    Re-parse a rendered 'en' query with an analysis-free profile
    (e.g. 'keyword'/'standard') to recover the AST exactly."""
    from .query import Boolean, Boost, ConstantScore, LangFilter, MatchAll

    if isinstance(q, MatchAll):
        return ""
    if isinstance(q, Boolean):
        return _render_bool(q)
    # a bare metadata filter at the root only unwraps back out of the
    # Boolean if it re-enters as MUST (filter-only Booleans don't
    # single-clause-unwrap) — render with the + it was parsed from
    inner = q.child if isinstance(q, Boost) else q
    if isinstance(inner, ConstantScore) and isinstance(
        inner.child, LangFilter
    ):
        return "+" + _render_atom(q)
    return _render_atom(q)
