"""Snowball German/French/Spanish stemmers: golden vectors hand-derived
from the published Snowball algorithm specifications (each pair traced
through the spec's steps; several are canonical pairs quoted in the
algorithm descriptions), chain dispatch, and the end-to-end language-
gated index build (build_multilang_index)."""

from __future__ import annotations

import pytest

from lucene_solr_spark.snowball import french_stem, german_stem, spanish_stem

GERMAN = [
    # step 1 (a/b/c) + umlaut fold + niss rule + U-marking
    ("laufen", "lauf"),
    ("lebendig", "lebend"),
    ("bedürfnisse", "bedurfnis"),
    ("kategorie", "kategori"),
    ("abhängen", "abhang"),
    ("verständnis", "verstandnis"),
    ("aufeinander", "aufeinand"),
    ("häuser", "haus"),
    ("tische", "tisch"),
    ("bauen", "bau"),          # U-marking makes R1 reach the 'en'
    ("ausgefeiltere", "ausgefeilt"),
    # ß -> ss
    ("straße", "strass"),
    # step 3 d-suffixes + R2 gating
    ("heimlichkeit", "heimlich"),
    ("zeitung", "zeitung"),     # 'ung' not in R2 -> untouched
    ("zeitungen", "zeitung"),   # step1 'en' only; 'ung' still not in R2
    ("forderung", "forder"),
    # short words pass through
    ("zu", "zu"),
    ("ab", "ab"),
]

FRENCH = [
    ("continuité", "continu"),
    ("majestueux", "majestu"),
    ("voudriez", "voudr"),
    ("principaux", "principal"),
    ("mangeaient", "mang"),     # I-marking + step 2b (c) + e-removal
    ("mangèrent", "mang"),
    ("abandonnée", "abandon"),  # step 2b + undouble 'onn'
    ("chèvres", "chevr"),       # step 4 s + e, step 6 unaccent
    ("aimer", "aim"),           # two-initial-vowel RV
    ("adorateurs", "ador"),
    ("politique", "polit"),     # qU marking feeds iqUe
    ("croyances", "croyanc"),   # Y marking blocks R2; step 4 path
    ("logement", "log"),
    ("largement", "larg"),
    ("exactement", "exact"),
    ("confusion", "confus"),    # usion fails R2; step 4 ion rule fires
    ("nationale", "national"),
    ("dérangement", "dérang"),
    ("administrativement", "administr"),  # ement -> iv -> at chain
    ("eu", "eu"),
]

SPANISH = [
    ("apresuradamente", "apresur"),  # amente -> ad-in-R2 chain
    ("comiendo", "com"),
    ("guerra", "guerr"),
    ("cañón", "cañon"),              # accent folds, ñ preserved
    ("agradecería", "agradec"),
    ("haciéndola", "hac"),           # step 0 pronoun + iéndo unaccent
    ("llegues", "lleg"),             # step 2b gu -> drop u
    ("valientes", "valient"),
    ("amablemente", "amabl"),        # mente; able NOT in R2; step 3 e
    ("conveniencia", "convenient"),  # encia -> ente in R2, step 3 drops e
    ("la", "la"),
]


@pytest.mark.parametrize("word,stem", GERMAN, ids=[w for w, _ in GERMAN])
def test_german(word, stem):
    assert german_stem(word) == stem


@pytest.mark.parametrize("word,stem", FRENCH, ids=[w for w, _ in FRENCH])
def test_french(word, stem):
    assert french_stem(word) == stem


@pytest.mark.parametrize("word,stem", SPANISH, ids=[w for w, _ in SPANISH])
def test_spanish(word, stem):
    assert spanish_stem(word) == stem


def test_chain_dispatch():
    from lucene_solr_spark.analysis import analyze, analyze_lang

    # de profile stems with the German algorithm
    assert ("lauf", 0) in analyze("Laufen", "de")
    # fr profile applies elision before stemming
    out = analyze("l'amitié", "fr")
    assert out and out[0][0] == french_stem("amitié")
    # es profile
    assert ("com", 0) in analyze("comiendo", "es")
    # analyze_lang dispatch: en -> Porter, unknown -> standard (no stem)
    assert analyze_lang("running", "en") == [("run", 0)]
    assert analyze_lang("Running", "zh") == [("running", 0)]
    assert analyze_lang("comiendo", "es") == [("com", 0)]


def test_batch_chain_matches_per_row():
    """The vectorized unique-token batch chain (analyze_flat) must agree
    with the per-row analyzers for the new profiles."""
    from lucene_solr_spark.analysis import ANALYZERS, analyze_flat

    texts = [
        "Die Zeitungen berichten über Bedürfnisse",
        "l'amitié continuité des chèvres",
        "guerra apresuradamente comiendo",
        "",
    ]
    for profile in ("de", "fr", "es"):
        row_idx, terms, pos, field_len = analyze_flat(texts, profile)
        flat = list(zip(row_idx.tolist(), terms.tolist(), pos.tolist()))
        want = []
        fn = ANALYZERS[profile]
        for r, t in enumerate(texts):
            for term, p in fn(t):
                want.append((r, term, p))
        assert flat == want, profile


def test_multilang_index_gating(spark, tmp_path):
    """End-to-end: build_multilang_index routes each doc through its
    language's chain; the German index stores German stems, the French
    index French stems, and cross-language merge returns both."""
    from lucene_solr_spark.multifield import (
        build_multilang_index,
        multilang_search,
    )
    from lucene_solr_spark.query import Term
    from lucene_solr_spark.search import Searcher

    docs = spark.createDataFrame(
        [
            ("u:de1", "de", "die Zeitungen berichten über Bedürfnisse"),
            ("u:de2", "de", "wir laufen und laufen"),
            ("u:fr1", "fr", "la continuité des politiques majestueux"),
            ("u:fr2", "fr", "ils mangeaient l'amitié"),
            ("u:es1", "es", "estamos comiendo apresuradamente"),
            ("u:en1", "en", "search engines running quickly"),
        ],
        "url string, lang string, text string",
    )
    idx = build_multilang_index(
        spark, docs, str(tmp_path / "ml"), langs=("en", "de", "fr", "es"),
        num_buckets=4,
    )
    # German stem 'zeitung' hits the de doc; surface 'zeitungen' does not
    s_de = Searcher(idx["de"])
    assert s_de.count(Term("zeitung")) == 1
    assert s_de.count(Term("zeitungen")) == 0
    assert s_de.count(Term("bedurfnis")) == 1  # umlaut folded + niss rule
    # French: elision dropped the article, stem indexed
    s_fr = Searcher(idx["fr"])
    assert s_fr.count(Term(french_stem("amitié"))) == 1
    assert s_fr.count(Term("continu")) == 1
    # Spanish
    s_es = Searcher(idx["es"])
    assert s_es.count(Term("com")) == 1
    # English chain unchanged (Porter)
    s_en = Searcher(idx["en"])
    assert s_en.count(Term("run")) == 1
    # cross-language merge by score with url as the stable key
    merged = multilang_search(
        idx, {"de": Term("zeitung"), "fr": Term("continu")}, k=5
    ).collect()
    assert {r["url"] for r in merged} == {"u:de1", "u:fr1"}


ITALIAN = [
    ("abbandonata", "abbandon"),
    ("abbandonare", "abbandon"),
    ("pronto", "pront"),
    ("felicità", "felic"),       # ità in R2, ic not in R2
    ("mangiarla", "mang"),       # step 0 pronoun: ar+la -> are -> verb
    ("nazionale", "nazional"),   # step 3a drops final e
    ("azione", "azion"),         # azione not in R2 here; step3a e
    ("belli", "bell"),           # step 3a i? 'i' at rv -> trace: step2 no; 3a i
    ("amichevole", "amichevol"),
    ("di", "di"),
]

PORTUGUESE = [
    ("cantando", "cant"),
    ("bonita", "bonit"),
    ("importância", "import"),
    ("corações", "coraçõ"),      # nasal marker survives, 'es' verb drop
    ("nacional", "nacional"),    # nothing matches; no residual
    ("grandeza", "grandez"),     # eza NOT in R2 here; step 4 residual a
    ("felizmente", "feliz"),     # mente in R2
    ("o", "o"),
]


@pytest.mark.parametrize("word,stem", ITALIAN, ids=[w for w, _ in ITALIAN])
def test_italian(word, stem):
    from lucene_solr_spark.snowball import italian_stem

    assert italian_stem(word) == stem


@pytest.mark.parametrize("word,stem", PORTUGUESE, ids=[w for w, _ in PORTUGUESE])
def test_portuguese(word, stem):
    from lucene_solr_spark.snowball import portuguese_stem

    assert portuguese_stem(word) == stem


def test_it_pt_chain_dispatch():
    from lucene_solr_spark.analysis import analyze

    assert analyze("l'abbandonata", "it") == [("abbandon", 0)]
    assert analyze("cantando", "pt") == [("cant", 0)]


def test_it_pt_batch_matches_per_row():
    from lucene_solr_spark.analysis import ANALYZERS, analyze_flat

    texts = ["l'abbandonata felicità nazionale", "cantando corações grandeza", ""]
    for profile in ("it", "pt"):
        row_idx, terms, pos, field_len = analyze_flat(texts, profile)
        flat = list(zip(row_idx.tolist(), terms.tolist(), pos.tolist()))
        want = []
        for r, t in enumerate(texts):
            for term, p in ANALYZERS[profile](t):
                want.append((r, term, p))
        assert flat == want, profile
