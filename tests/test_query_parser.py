"""Classic query-parser syntax -> AST (QueryParser.jj subset).

AST-level golden tests (no Spark) + one end-to-end parity check: the
parsed query must produce the same top-k as the hand-built AST.
"""

from __future__ import annotations

import pytest

from lucene_solr_spark.query import (
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
from lucene_solr_spark.query_parser import QueryParseError, parse_classic


def p(s, profile="simple"):
    return parse_classic(s, profile=profile)


def test_single_term_unwraps():
    assert p("hello") == Term("hello")


def test_default_or():
    q = p("alpha beta")
    assert isinstance(q, Boolean)
    assert q.should == [Term("alpha"), Term("beta")]
    assert not q.must


def test_and_promotes_both_sides():
    q = p("alpha AND beta")
    assert q.must == [Term("alpha"), Term("beta")]
    assert not q.should


def test_classic_no_precedence():
    # famous classic behavior: AND promotes only its neighbors
    q = p("alpha AND beta OR gamma")
    assert q.must == [Term("alpha"), Term("beta")]
    assert q.should == [Term("gamma")]


def test_plus_minus_not():
    q = p("+alpha -beta NOT gamma delta")
    assert q.must == [Term("alpha")]
    assert q.must_not == [Term("beta"), Term("gamma")]
    assert q.should == [Term("delta")]


def test_and_does_not_unprohibit():
    # `a AND NOT b`: previous stays must, b prohibited
    q = p("alpha AND NOT beta")
    assert q.must == [Term("alpha")]
    assert q.must_not == [Term("beta")]


def test_phrase_with_slop_and_boost():
    q = p('"alpha beta"~2')
    assert q == Phrase(("alpha", "beta"), slop=2)
    q = p('"alpha beta"^3')
    assert q == Boost(Phrase(("alpha", "beta")), 3.0)


def test_grouping_with_boost():
    q = p("(alpha OR beta)^2 gamma")
    grp = q.should[0]
    assert isinstance(grp, Boost) and grp.boost == 2.0
    assert grp.child.should == [Term("alpha"), Term("beta")]
    assert q.should[1] == Term("gamma")


def test_wildcards_prefix_fuzzy():
    assert p("alph*") == Prefix("alph")
    assert p("al?ha") == Wildcard("al?ha")
    assert p("a*b*") == Wildcard("a*b*")
    assert p("alpha~") == Fuzzy("alpha", max_edits=2)
    assert p("alpha~1") == Fuzzy("alpha", max_edits=1)
    # term~0 is EXACT matching (0 edits) in classic Lucene, not the default 2
    assert p("alpha~0") == Fuzzy("alpha", max_edits=0)
    assert p("alpha~5") == Fuzzy("alpha", max_edits=2)  # capped at 2


def test_multiterm_not_stemmed():
    # english profile stems, but wildcard/fuzzy must NOT be stemmed
    assert p("Runn*", profile="en") == Prefix("runn")
    assert p("Running~1", profile="en") == Fuzzy("running", max_edits=1)


def test_ranges():
    assert p("[alpha TO beta]") == TermRange("alpha", "beta", True, True)
    assert p("{alpha TO beta}") == TermRange("alpha", "beta", False, False)
    assert p("[alpha TO beta}") == TermRange("alpha", "beta", True, False)
    assert p("[alpha TO *]") == TermRange("alpha", None, True, True)


def test_term_boost():
    q = p("alpha^2 beta")
    assert q.should == [Boost(Term("alpha"), 2.0), Term("beta")]


def test_lang_field_is_filter():
    q = p("alpha lang:en")
    assert q.must == [] and q.should == [Term("alpha")]
    assert q.filter == [ConstantScore(LangFilter(MatchAll(), "en"))]


def test_text_field_explicit():
    assert p("text:alpha") == Term("alpha")


def test_unknown_field_rejected():
    with pytest.raises(QueryParseError):
        p("title:alpha")


def test_unbalanced_paren_rejected():
    with pytest.raises(QueryParseError):
        p("(alpha OR beta")


def test_escaped_specials():
    # escaping defeats the FIELD production; the analyzer then tokenizes
    # "alpha:beta" into two terms (same as Lucene: escape affects the
    # parser, not the analysis chain) -> a single positional clause
    assert p(r"alpha\:beta") == Phrase(("alpha", "beta"))


def test_stopword_only_clause_dropped():
    # english chain drops stopwords; the whole clause vanishes
    q = parse_classic("the alpha", profile="en")
    assert q == Term("alpha")


def test_empty_query_matches_all():
    assert p("") == MatchAll()


def test_edismax_basic():
    from lucene_solr_spark.query_parser import parse_edismax

    q = parse_edismax("alpha beta -gamma", profile="simple", mm=2)
    assert q.should == [Term("alpha"), Term("beta")]
    assert q.must_not == [Term("gamma")]
    assert q.min_should_match == 2


def test_edismax_specials_are_literal():
    from lucene_solr_spark.query_parser import parse_edismax

    # end-user syntax: AND/parens/colons are content, not operators
    # (the simple profile strips non-alnum, like the escape-everything step)
    q = parse_edismax("alpha (beta", profile="simple")
    assert q.should == [Term("alpha"), Term("beta")]


def test_edismax_phrase_boost_outside_mm():
    from lucene_solr_spark.query_parser import parse_edismax

    q = parse_edismax("alpha beta", profile="simple", mm=2,
                      phrase_boost=5.0, phrase_slop=1)
    # outer: must=[mm-governed boolean], should=[boosted sloppy phrase]
    inner = q.must[0]
    assert inner.should == [Term("alpha"), Term("beta")]
    assert inner.min_should_match == 2
    assert q.should == [Boost(Phrase(("alpha", "beta"), slop=1), 5.0)]


def test_edismax_quoted_phrase_kept():
    from lucene_solr_spark.query_parser import parse_edismax

    q = parse_edismax('+"alpha beta" gamma', profile="simple")
    assert q.must == [Phrase(("alpha", "beta"))]
    assert q.should == [Term("gamma")]


def test_end_to_end_matches_hand_ast(spark):
    import pandas as pd

    from lucene_solr_spark.indexer import build_index, read_index
    from lucene_solr_spark.search import Searcher

    import tempfile

    docs = [
        ("u0", "alpha beta gamma", "en"),
        ("u1", "alpha beta", "en"),
        ("u2", "gamma delta", "en"),
        ("u3", "alpha gamma delta", "fr"),
        ("u4", "beta beta alpha", "en"),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(docs, columns=["url", "text", "lang"])
    )
    out = tempfile.mkdtemp(prefix="qp_idx_")
    build_index(spark, df, out, profile="simple", num_buckets=2,
                quantize=False)
    s = Searcher(read_index(spark, out))

    parsed = parse_classic('+alpha (beta OR delta) -"gamma delta"',
                           profile="simple")
    hand = Boolean(
        must=[Term("alpha")],
        should=[Boolean(should=[Term("beta"), Term("delta")])],
        must_not=[Phrase(("gamma", "delta"))],
    )
    got = [(r.doc_id, round(r.score, 6))
           for r in s.search(parsed, 10).collect()]
    want = [(r.doc_id, round(r.score, 6))
            for r in s.search(hand, 10).collect()]
    assert got == want and len(got) > 0


def test_expand_synonyms_term_and_phrase():
    from lucene_solr_spark.query import (
        Boolean, MultiPhrase, Phrase, Synonym, Term,
    )
    from lucene_solr_spark.query_parser import expand_synonyms

    syn = {"fast": ["quick", "rapid"], "hash": ["merge"]}
    assert expand_synonyms(Term("fast"), syn) == Synonym(
        terms=("fast", "quick", "rapid"), boost=1.0
    )
    # no synonyms -> unchanged
    t = Term("slow")
    assert expand_synonyms(t, syn) is t
    assert expand_synonyms(Phrase(("hash", "join")), syn) == MultiPhrase(
        slots=(("hash", "merge"), ("join",)), boost=1.0
    )
    # sloppy phrases are left alone (no positional-union sloppy matcher)
    p = Phrase(("hash", "join"), slop=2)
    assert expand_synonyms(p, syn) is p
    # recursion through Boolean preserves structure
    b = Boolean(must=[Term("fast")], should=[Phrase(("hash", "join"))])
    out = expand_synonyms(b, syn)
    assert isinstance(out.must[0], Synonym)
    assert isinstance(out.should[0], MultiPhrase)


def test_edismax_pf23_bq_bf_tree():
    """Round-4 param surface: pf2/pf3 shingled phrase boosts, additive bq,
    FunctionScore bf — all optional siblings of the required user query."""
    from lucene_solr_spark.query import (
        Boolean,
        Boost,
        FunctionScore,
        Phrase,
        Term,
    )
    from lucene_solr_spark.query_parser import parse_edismax

    q = parse_edismax(
        "dup vector merge", profile="simple", pf2=1.5, pf3=1.25,
        bq=Boost(Term("join"), 0.5), bf="100.0 / (100.0 + doc_id)",
    )
    assert isinstance(q, Boolean) and len(q.must) == 1
    shoulds = q.should
    assert Boost(Phrase(("dup", "vector")), 1.5) in shoulds
    assert Boost(Phrase(("vector", "merge")), 1.5) in shoulds
    assert Boost(Phrase(("dup", "vector", "merge")), 1.25) in shoulds
    assert Boost(Term("join"), 0.5) in shoulds
    assert FunctionScore(expr="100.0 / (100.0 + doc_id)") in shoulds
    # negated terms never feed the shingles
    q2 = parse_edismax("dup -vector merge", profile="simple", pf2=2.0)
    pairs = [c for c in q2.should if isinstance(c, Boost)]
    assert pairs == [Boost(Phrase(("dup", "merge")), 2.0)]


def test_parse_field_boosts():
    from lucene_solr_spark.query_parser import parse_field_boosts

    assert parse_field_boosts("title^2 body^0.5") == {"title": 2.0, "body": 0.5}
    assert parse_field_boosts("body") == {"body": 1.0}
    assert parse_field_boosts("a^2 a^3") == {"a": 3.0}  # last wins
    assert parse_field_boosts("") == {}


def test_resolve_field_aliases_multiplies_and_adds():
    from lucene_solr_spark.query_parser import resolve_field_aliases

    # boosts multiply down the alias path
    out = resolve_field_aliases(
        {"headline": 1.5}, {"headline": {"title": 2.0}}
    )
    assert out == {"title": 3.0}
    # nested alias -> alias -> field
    out = resolve_field_aliases(
        {"a": 2.0}, {"a": {"b": 3.0}, "b": {"title": 0.5}}
    )
    assert out == {"title": 3.0}
    # same real field down two paths: boosts ADD
    out = resolve_field_aliases(
        {"x": 1.0, "y": 1.0}, {"x": {"body": 2.0}, "y": {"body": 3.0}}
    )
    assert out == {"body": 5.0}
    # non-aliased fields pass through
    out = resolve_field_aliases({"body": 1.25}, {})
    assert out == {"body": 1.25}


def test_resolve_field_aliases_cycle_raises():
    import pytest as _pytest

    from lucene_solr_spark.query_parser import resolve_field_aliases

    with _pytest.raises(ValueError, match="cycle"):
        resolve_field_aliases({"a": 1.0}, {"a": {"b": 1.0}, "b": {"a": 1.0}})


def test_render_classic_fixed_point_fuzz():
    """Grammar fuzz: for every random string the classic parser accepts,
    parse(render(parse(s))) == parse(s) — the Query#toString contract
    (re-parseable rendering) over the whole classic subset."""
    import random

    from lucene_solr_spark.query_parser import (
        QueryParseError,
        parse_classic,
        render_classic,
    )

    rng = random.Random(99)
    words = ["hash", "join", "scan", "merge", "tablex", "qz"]

    def atom():
        r = rng.random()
        if r < 0.35:
            return rng.choice(words)
        if r < 0.45:
            return '"%s"%s' % (
                " ".join(rng.sample(words, rng.randrange(1, 3))),
                rng.choice(["", "~1", "~2"]),
            )
        if r < 0.55:
            return rng.choice(words)[:4] + "*"
        if r < 0.62:
            return rng.choice(words).replace("a", "?", 1)
        if r < 0.70:
            return "%s~%d" % (rng.choice(words), rng.randrange(0, 3))
        if r < 0.80:
            lo = rng.choice(["*", rng.choice(words)])
            hi = rng.choice(["*", rng.choice(words)])
            return "%s%s TO %s%s" % (
                rng.choice("[{"), lo, hi, rng.choice("]}"),
            )
        if r < 0.86:
            return "lang:" + rng.choice(["en", "de", "fr"])
        return rng.choice(words)

    def clause(depth):
        mod = rng.choice(["", "", "", "+", "-", "NOT "])
        if depth < 2 and rng.random() < 0.25:
            body = "(" + expr(depth + 1) + ")"
        else:
            body = atom()
        boost = rng.choice(["", "", "^2", "^0.5", "^1.5"])
        return mod + body + boost

    def expr(depth=0):
        n = rng.randrange(1, 4)
        parts = [clause(depth)]
        for _ in range(n - 1):
            conj = rng.choice(["", "", "AND", "OR"])
            parts.append((conj + " " if conj else "") + clause(depth))
        return " ".join(parts)

    accepted = 0
    for _ in range(3000):
        s = expr()
        try:
            p1 = parse_classic(s, profile="standard")
        except QueryParseError:
            continue
        accepted += 1
        r = render_classic(p1)
        p2 = parse_classic(r, profile="standard")
        assert p1 == p2, (s, r, p1, p2)
        # idempotence of the rendering itself
        assert render_classic(p2) == r, (s, r)
    assert accepted > 1500, accepted  # the generator mostly emits valid syntax


def test_render_classic_en_profile_contract():
    """Pin the documented 'en'-profile behavior: rendered terms are
    POST-analysis stems, so re-parsing under profile='en' re-analyzes
    them and may change the AST (stem->stopword collision, Porter
    non-idempotence) — while re-parsing the rendering with the
    analysis-stable 'standard' profile recovers the AST exactly."""
    from lucene_solr_spark.query_parser import parse_classic, render_classic

    # stem collides with a stopword: 'being' -> 'be' (stopword) -> dropped
    p1 = parse_classic("being hash", profile="en")
    r = render_classic(p1)
    assert "be" in r and "hash" in r
    p_en = parse_classic(r, profile="en")
    assert p_en != p1  # the documented round-trip divergence under 'en'
    assert parse_classic(r, profile="standard") == p1  # exact recovery

    # Porter non-idempotence: 'university' -> 'univers' -> 'univ'
    p2 = parse_classic("university", profile="en")
    r2 = render_classic(p2)
    assert parse_classic(r2, profile="standard") == p2
    assert parse_classic(r2, profile="en") != p2
