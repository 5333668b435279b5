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


def test_tokenizer_golden():
    for text, expect in TOKENIZER_CASES:
        assert tokenize_standard(text) == expect, text


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
