"""Phonetic encoders: classic American Soundex spec vectors (including
the H/W transparency and vowel-separator rules) + RefinedSoundex
algorithm properties."""

from lucene_solr_spark.analysis import refined_soundex, soundex


def test_soundex_spec_vectors():
    # the canonical examples from the Soundex specification
    assert soundex("Robert") == "R163"
    assert soundex("Rupert") == "R163"
    assert soundex("Ashcraft") == "A261"  # H transparent: f after shc
    assert soundex("Ashcroft") == "A261"
    assert soundex("Tymczak") == "T522"  # vowel separates duplicate codes
    assert soundex("Pfister") == "P236"  # adjacent same-code collapse
    assert soundex("Honeyman") == "H555"


def test_soundex_padding_and_case():
    assert soundex("Lee") == "L000"
    assert soundex("lee") == soundex("LEE")
    assert soundex("a") == "A000"
    assert soundex("") == ""
    assert soundex("123") == ""


def test_soundex_phonetic_equivalence():
    assert soundex("smith") == soundex("smyth")
    assert soundex("vector") == soundex("vektor")


def test_refined_soundex_properties():
    # first letter retained, codes appended with adjacent-dup collapse
    assert refined_soundex("testing") == "T6036084"
    assert refined_soundex("TESTING") == "T6036084"
    # adjacent identical letters collapse to one code
    assert refined_soundex("bb") == "B1"
    assert refined_soundex("") == ""
    # finer-grained than classic: distinguishes pairs soundex merges
    assert refined_soundex("Catherine") != refined_soundex("Kathryn")


class TestMetaphone:
    """commons-codec MetaphoneTest vectors (default 4-char cap)."""

    VECTORS = {
        "howl": "HL", "testing": "TSTN", "The": "0", "quick": "KK",
        "brown": "BRN", "fox": "FKS", "jumped": "JMPT", "over": "OFR",
        "lazy": "LS", "dogs": "TKS",
        # initial-cluster / silent-letter rules
        "knight": "NT", "wright": "RT", "gnu": "N", "xavier": "SFR",
        # silent GH / GN(ED)
        "SIGNED": "SNT", "BAUGH": "B", "GHENT": "KNT",
        # C family: SCE/SCI silent-C, SCH->K, initial-CH quirk, CH->X
        "SCIENCE": "SNS", "SCHEDULE": "SKTL", "CHARACTER": "KRKT",
        "TEACH": "TX",
        # DGE/DGI/DGY -> J, TIA/TIO -> X, TCH silent-T, TH -> 0
        "DODGY": "TJ", "DODGE": "TJ", "PORTION": "PRXN",
        "RETCH": "RX", "WATCH": "WX",
        # PH -> F, SH -> X, QU, vowels only initially
        "PHISH": "FX", "SHOT": "XT", "queen": "KN", "aero": "ER",
    }

    def test_commons_codec_vectors(self):
        from lucene_solr_spark.analysis import metaphone

        for word, want in self.VECTORS.items():
            assert metaphone(word) == want, word

    def test_empty_and_single(self):
        from lucene_solr_spark.analysis import metaphone

        assert metaphone("") == ""
        assert metaphone("7") == ""
        assert metaphone("a") == "A"

    def test_matching_groups(self):
        from lucene_solr_spark.analysis import metaphone

        # classic phonetic-equivalence groups
        assert metaphone("smith") == metaphone("smyth")
        assert metaphone("phillip") == metaphone("filip")
