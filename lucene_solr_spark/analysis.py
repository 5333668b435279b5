"""Analysis chains — tokenization + token filters, the per-row "projection
pipeline" that determines every downstream number (tf, df, doc length).

Reference parity (SURVEY.md §3.2):
  * StandardTokenizer — UAX#29 word break, maxTokenLength=255
    (lucene/core/src/java/org/apache/lucene/analysis/standard/
     StandardTokenizer.java ≈L40). Round 4: the full Unicode 9.0
    word-break property table for the mid-token classes — MidLetter,
    MidNum, MidNumLet, Single/Double_Quote with the Hebrew WB7a-c rules,
    ExtendNumLet via \\w, Katakana WB13 runs, ideographs/Hiragana as
    single-char tokens, >255-char tokens split. See the class tables at
    TOKEN_RE below; positional rules are enforced with one-char
    lookarounds (the regex restatement of the JFlex DFA states).
  * EnglishPossessiveFilter — strip trailing 's (.../en/
    EnglishPossessiveFilter.java ≈L40)
  * LowerCaseFilter (.../analysis/LowerCaseFilter.java ≈L30)
  * StopFilter — 33-word English set; position increments accumulate across
    holes (.../analysis/StopFilter.java ≈L40)
  * PorterStemFilter (.../en/PorterStemFilter.java ≈L40) -> porter.py
  * EnglishAnalyzer chain = Standard -> Possessive -> LowerCase -> Stop ->
    PorterStem (.../en/EnglishAnalyzer.java createComponents ≈L110)

Doc length semantics: field_len = number of emitted tokens (stopword holes do
NOT count; discountOverlaps=true default) — ref DefaultIndexingChain PerField
#invert ≈L750, BM25Similarity#computeNorm ≈L110.

Everything here is plain Python over strings so the same code drives (a) the
pure-Python oracle and (b) Arrow-batched pandas UDFs (tokenize via C-speed
regex findall, stemming memoized over unique tokens — no Spark-level
per-row Python).
"""

from __future__ import annotations

import re

import numpy as np

from . import ENGLISH_STOP_WORDS
from .porter import porter_stem

MAX_TOKEN_LENGTH = 255

# ---------------------------------------------------------------------------
# UAX#29 word-break property table (Unicode 9.0 WordBreakProperty.txt — the
# version StandardTokenizerImpl.jflex is generated from in Lucene 7/8).
# Round 4 ports the full mid-token classes AND the WB4 ignorable classes;
# previously only ['\u2019.] between word chars and ',' between digits were
# modeled.
# ---------------------------------------------------------------------------
# WB4 ignorables (Extend | Format | ZWJ): generated from Python's own
# unicodedata (public Unicode character database) — General_Category
# Mn/Mc/Me plus Cf minus U+200B (ZERO WIDTH SPACE has WordBreak=Other, it
# BREAKS). These attach to the preceding word/kana/ideograph char and are
# kept in the token text, exactly Lucene's DFA behavior for "cafe\u0301",
# "foo\u00adbar" (soft hyphen), ZWJ/ZWNJ joins, Indic matras. Documented
# micro-deltas vs the generated JFlex table: (a) Cf prepended-concatenation
# marks U+0600-0605/06DD/070F/08E2 are WordBreak=Numeric in the spec but
# ignorable here (they are not word chars in Python \w, so the Numeric-run
# join cannot be expressed — they simply never break a token); (b) the
# mid-token lookbehind rules tolerate ONE trailing ignorable between the
# literal word char and the separator (runs of 2+ ignorables immediately
# before a mid-token separator fall back to a break). Regional indicators
# (U+1F1E6-1F1FF, WB15/WB16): a run of RIs chunks into PAIRS (emoji flag
# sequences), an odd trailing RI stands alone — the Lucene 7.3+
# StandardTokenizer emoji tokenization (LUCENE-8122) for flags; WB4
# ignorables may intervene between the pair's halves. Closed round 5 —
# no remaining UAX#29 deltas beyond the documented Cf-prepend micro-note.
# ---------------------------------------------------------------------------
_WB4_IGNORE = (
    "\u00ad\u0300-\u036f\u0483-\u0489\u0591-\u05bd\u05bf\u05c1\u05c2"
    "\u05c4\u05c5\u05c7\u0600-\u0605\u0610-\u061a\u061c\u064b-\u065f"
    "\u0670\u06d6-\u06dd\u06df-\u06e4\u06e7\u06e8\u06ea-\u06ed\u070f"
    "\u0711\u0730-\u074a\u07a6-\u07b0\u07eb-\u07f3\u07fd\u0816-\u0819"
    "\u081b-\u0823\u0825-\u0827\u0829-\u082d\u0859-\u085b\u0890\u0891"
    "\u0898-\u089f\u08ca-\u0903\u093a-\u093c\u093e-\u094f\u0951-\u0957"
    "\u0962\u0963\u0981-\u0983\u09bc\u09be-\u09c4\u09c7\u09c8"
    "\u09cb-\u09cd\u09d7\u09e2\u09e3\u09fe\u0a01-\u0a03\u0a3c"
    "\u0a3e-\u0a42\u0a47\u0a48\u0a4b-\u0a4d\u0a51\u0a70\u0a71\u0a75"
    "\u0a81-\u0a83\u0abc\u0abe-\u0ac5\u0ac7-\u0ac9\u0acb-\u0acd"
    "\u0ae2\u0ae3\u0afa-\u0aff\u0b01-\u0b03\u0b3c\u0b3e-\u0b44"
    "\u0b47\u0b48\u0b4b-\u0b4d\u0b55-\u0b57\u0b62\u0b63\u0b82"
    "\u0bbe-\u0bc2\u0bc6-\u0bc8\u0bca-\u0bcd\u0bd7\u0c00-\u0c04\u0c3c"
    "\u0c3e-\u0c44\u0c46-\u0c48\u0c4a-\u0c4d\u0c55\u0c56\u0c62\u0c63"
    "\u0c81-\u0c83\u0cbc\u0cbe-\u0cc4\u0cc6-\u0cc8\u0cca-\u0ccd"
    "\u0cd5\u0cd6\u0ce2\u0ce3\u0d00-\u0d03\u0d3b\u0d3c\u0d3e-\u0d44"
    "\u0d46-\u0d48\u0d4a-\u0d4d\u0d57\u0d62\u0d63\u0d81-\u0d83\u0dca"
    "\u0dcf-\u0dd4\u0dd6\u0dd8-\u0ddf\u0df2\u0df3\u0e31\u0e34-\u0e3a"
    "\u0e47-\u0e4e\u0eb1\u0eb4-\u0ebc\u0ec8-\u0ecd\u0f18\u0f19\u0f35"
    "\u0f37\u0f39\u0f3e\u0f3f\u0f71-\u0f84\u0f86\u0f87\u0f8d-\u0f97"
    "\u0f99-\u0fbc\u0fc6\u102b-\u103e\u1056-\u1059\u105e-\u1060"
    "\u1062-\u1064\u1067-\u106d\u1071-\u1074\u1082-\u108d\u108f"
    "\u109a-\u109d\u135d-\u135f\u1712-\u1715\u1732-\u1734\u1752\u1753"
    "\u1772\u1773\u17b4-\u17d3\u17dd\u180b-\u180f\u1885\u1886\u18a9"
    "\u1920-\u192b\u1930-\u193b\u1a17-\u1a1b\u1a55-\u1a5e\u1a60-\u1a7c"
    "\u1a7f\u1ab0-\u1ace\u1b00-\u1b04\u1b34-\u1b44\u1b6b-\u1b73"
    "\u1b80-\u1b82\u1ba1-\u1bad\u1be6-\u1bf3\u1c24-\u1c37\u1cd0-\u1cd2"
    "\u1cd4-\u1ce8\u1ced\u1cf4\u1cf7-\u1cf9\u1dc0-\u1dff\u200c-\u200f"
    "\u202a-\u202e\u2060-\u2064\u2066-\u206f\u20d0-\u20f0\u2cef-\u2cf1"
    "\u2d7f\u2de0-\u2dff\u302a-\u302f\u3099\u309a\ua66f-\ua672"
    "\ua674-\ua67d\ua69e\ua69f\ua6f0\ua6f1\ua802\ua806\ua80b\ua823-\ua827"
    "\ua82c\ua880\ua881\ua8b4-\ua8c5\ua8e0-\ua8f1\ua8ff\ua926-\ua92d"
    "\ua947-\ua953\ua980-\ua983\ua9b3-\ua9c0\ua9e5\uaa29-\uaa36\uaa43"
    "\uaa4c\uaa4d\uaa7b-\uaa7d\uaab0\uaab2-\uaab4\uaab7\uaab8\uaabe\uaabf"
    "\uaac1\uaaeb-\uaaef\uaaf5\uaaf6\uabe3-\uabea\uabec\uabed\ufb1e"
    "\ufe00-\ufe0f\ufe20-\ufe2f\ufeff\ufff9-\ufffb\U000101fd\U000102e0"
    "\U00010376-\U0001037a\U00010a01-\U00010a03\U00010a05\U00010a06"
    "\U00010a0c-\U00010a0f\U00010a38-\U00010a3a\U00010a3f"
    "\U00010ae5\U00010ae6\U00010d24-\U00010d27\U00010eab\U00010eac"
    "\U00010f46-\U00010f50\U00010f82-\U00010f85\U00011000-\U00011002"
    "\U00011038-\U00011046\U00011070\U00011073\U00011074"
    "\U0001107f-\U00011082\U000110b0-\U000110ba\U000110bd\U000110c2"
    "\U000110cd\U00011100-\U00011102\U00011127-\U00011134"
    "\U00011145\U00011146\U00011173\U00011180-\U00011182"
    "\U000111b3-\U000111c0\U000111c9-\U000111cc\U000111ce\U000111cf"
    "\U0001122c-\U00011237\U0001123e\U000112df-\U000112ea"
    "\U00011300-\U00011303\U0001133b\U0001133c\U0001133e-\U00011344"
    "\U00011347\U00011348\U0001134b-\U0001134d\U00011357"
    "\U00011362\U00011363\U00011366-\U0001136c\U00011370-\U00011374"
    "\U00011435-\U00011446\U0001145e\U000114b0-\U000114c3"
    "\U000115af-\U000115b5\U000115b8-\U000115c0\U000115dc\U000115dd"
    "\U00011630-\U00011640\U000116ab-\U000116b7\U0001171d-\U0001172b"
    "\U0001182c-\U0001183a\U00011930-\U00011935\U00011937\U00011938"
    "\U0001193b-\U0001193e\U00011940\U00011942\U00011943"
    "\U000119d1-\U000119d7\U000119da-\U000119e0\U000119e4"
    "\U00011a01-\U00011a0a\U00011a33-\U00011a39\U00011a3b-\U00011a3e"
    "\U00011a47\U00011a51-\U00011a5b\U00011a8a-\U00011a99"
    "\U00011c2f-\U00011c36\U00011c38-\U00011c3f\U00011c92-\U00011ca7"
    "\U00011ca9-\U00011cb6\U00011d31-\U00011d36\U00011d3a"
    "\U00011d3c\U00011d3d\U00011d3f-\U00011d45\U00011d47"
    "\U00011d8a-\U00011d8e\U00011d90\U00011d91\U00011d93-\U00011d97"
    "\U00011ef3-\U00011ef6\U00013430-\U00013438\U00016af0-\U00016af4"
    "\U00016b30-\U00016b36\U00016f4f\U00016f51-\U00016f87"
    "\U00016f8f-\U00016f92\U00016fe4\U00016ff0\U00016ff1"
    "\U0001bc9d\U0001bc9e\U0001bca0-\U0001bca3\U0001cf00-\U0001cf2d"
    "\U0001cf30-\U0001cf46\U0001d165-\U0001d169\U0001d16d-\U0001d182"
    "\U0001d185-\U0001d18b\U0001d1aa-\U0001d1ad\U0001d242-\U0001d244"
    "\U0001da00-\U0001da36\U0001da3b-\U0001da6c\U0001da75\U0001da84"
    "\U0001da9b-\U0001da9f\U0001daa1-\U0001daaf\U0001e000-\U0001e006"
    "\U0001e008-\U0001e018\U0001e01b-\U0001e021\U0001e023\U0001e024"
    "\U0001e026-\U0001e02a\U0001e130-\U0001e136\U0001e2ae"
    "\U0001e2ec-\U0001e2ef\U0001e8d0-\U0001e8d6\U0001e944-\U0001e94a"
    "\U000e0001\U000e0020-\U000e007f\U000e0100-\U000e01ef"
)
_EFS = rf"[{_WB4_IGNORE}]*"

# Hiragana: no WB rule binds it — one char per token (same as IDEOGRAPHIC).
# U+3099-309A (combining kana voicing marks, Mn) live in the WB4 table and
# attach to the preceding kana instead of standing alone.
_HIRA = "\u3041-\u3096\u309b-\u309f"
# Katakana (incl. phonetic extensions + halfwidth): WB13 binds runs.
_KATA = "\u30a0-\u30ff\u31f0-\u31ff\uff66-\uff9f"
# CJK ideographs tokenized one-char-per-token (IDEOGRAPHIC type).
_IDEO = "\u2e80-\u2eff\u3400-\u4dbf\u4e00-\u9fff\uf900-\ufaff"
_CJK_CLASS = _IDEO + _HIRA + _KATA  # chars excluded from word runs
# MidLetter (WB6/7 with ALetter on both sides): middle dot, ano teleia,
# Hebrew gershayim, hyphenation point, vertical/small/fullwidth colon.
# ASCII ':' is NOT MidLetter since Unicode 6.1.
_MIDLETTER = "\u00b7\u0387\u05f4\u2027\ufe13\ufe55\uff1a"
# MidNum (WB11/12, Numeric both sides): comma/semicolon family + Arabic
# separators + fraction slash. '.' is MidNumLet, not MidNum.
_MIDNUM = ",;\u037e\u0589\u060c\u060d\u066c\u07f8\u2044\ufe10\ufe14\ufe50\ufe54\uff0c\uff1b"
# MidNumLet (letter-letter OR digit-digit): full stop + quote-like dots.
_MIDNUMLET = ".\u2018\u2019\u2024\ufe52\uff07\uff0e"
# Single_Quote joins like MidNumLet (MidNumLetQ) + WB7a trailing after Hebrew.
# Hebrew_Letter: letters + Yiddish digraphs + geresh U+05F3 (ALetter there).
_HEBREW = "\u05d0-\u05ea\u05ef-\u05f3"

# word char = \w minus ideographs/kana (those take the single-char/run branch);
# each word char may carry a run of WB4 ignorables (kept in the token).
_W = rf"(?:(?![{_CJK_CLASS}])\w)"
_WE = rf"(?:(?![{_CJK_CLASS}])\w{_EFS})"
# UAX#29 word = word-char run, extendable across a mid-token char when the
# IMMEDIATELY adjacent chars satisfy the class's rule:
#   WB6/WB7:   ALetter  (MidLetter | MidNumLetQ) ALetter
#   WB11/WB12: Numeric  (MidNum   | MidNumLetQ) Numeric
#   WB7b/WB7c: Hebrew_Letter Double_Quote Hebrew_Letter   (e.g. \u05e6\u05d4"\u05dc)
#   WB7a:      Hebrew_Letter Single_Quote  (trailing, kept on the token)
# ALetter\u00d7Numeric adjacency (WB9/WB10) and ExtendNumLet '_' (WB13a/b)
# need no separator handling — both live inside \w. Lookbehinds check the
# char before the separator (always a word char here, never ideo/kana).
# lookbehinds tolerate one trailing WB4 ignorable between the literal
# word char and the mid-token separator (fixed-width alternatives).
_LB_ALPHA = rf"(?:(?<=[^\W\d_])|(?<=[^\W\d_][{_WB4_IGNORE}]))"
_LB_NUM = rf"(?:(?<=\d)|(?<=\d[{_WB4_IGNORE}]))"
_LB_HEB = rf"(?:(?<=[{_HEBREW}])|(?<=[{_HEBREW}][{_WB4_IGNORE}]))"
_UAX_WORD = (
    rf"{_WE}+"
    rf"(?:(?:"
    rf"{_LB_ALPHA}[{_MIDLETTER}{_MIDNUMLET}']{_EFS}(?=(?![\d_]){_W})"
    rf"|{_LB_NUM}[{_MIDNUM}{_MIDNUMLET}']{_EFS}(?=\d)"
    rf"|{_LB_HEB}\"{_EFS}(?=[{_HEBREW}])"
    rf"){_WE}+)*"
    rf"(?:{_LB_HEB}'{_EFS})?"
)
# WB15/WB16: regional-indicator runs chunk into pairs (flag sequences);
# a greedy {1,2} quantifier over an RI class yields exactly that pairing
# (2,2,...,then the odd 1). WB4 ignorables may sit between the halves.
_RI = "\U0001f1e6-\U0001f1ff"

# Extended_Pictographic core blocks (LUCENE-8122 emoji tokenization:
# StandardTokenizer 7.3+ emits pictographic sequences as single <EMOJI>
# tokens). ZWJ (U+200D) and variation selectors are WB4 ignorables, so
# the `EFS PICTO` glue below binds ZWJ sequences (family emoji, skin
# tones via the modifier block) into ONE token, exactly the reference's
# emoji-sequence behavior. Out of scope (disclosed): keycap sequences
# (digit + VS16 + U+20E3) tokenize as the bare digit — the combining
# keycap rides as an ignorable on a word token.
_PICTO = (
    "☀-➿"            # Misc Symbols, Dingbats
    "⬀-⯿"            # Misc Symbols and Arrows (⭐ etc.)
    "\U0001f000-\U0001f0ff"    # Mahjong/Domino/Cards
    "\U0001f300-\U0001f5ff"    # Misc Symbols & Pictographs
    "\U0001f600-\U0001f64f"    # Emoticons
    "\U0001f680-\U0001f6ff"    # Transport & Map
    "\U0001f700-\U0001f77f"    # Alchemical
    "\U0001f900-\U0001f9ff"    # Supplemental Symbols & Pictographs
    "\U0001fa70-\U0001faff"    # Symbols & Pictographs Extended-A
)
_EMOD = "\U0001f3fb-\U0001f3ff"  # skin-tone modifiers (E_Modifier)

TOKEN_RE = re.compile(
    rf"(?:[{_KATA}]{_EFS})+"       # WB13: katakana runs bind (+ ignorables)
    rf"|[{_IDEO}{_HIRA}]{_EFS}"    # ideograph / hiragana: one char per token
    rf"|[{_RI}](?:{_EFS}[{_RI}])?{_EFS}"  # WB15/16: RI pair | lone RI
    # emoji sequences: a pictograph extends ONLY via ZWJ+pictograph
    # (WB3c, family emoji) or a directly-attached skin-tone modifier
    # (E_Base x E_Modifier); adjacent independent emoji stay separate
    rf"|[{_PICTO}](?:{_EFS}(?:\u200d{_EFS}[{_PICTO}]|[{_EMOD}]))*{_EFS}"
    rf"|{_UAX_WORD}"
)

# EF-free twin: on text with NO WB4 ignorables every EF*/lookbehind
# alternative above is a no-op, so this stripped pattern is provably
# identical there — and ~4x faster (the big ignorable class is dead
# weight at every char otherwise). One C-speed class search per row
# dispatches; only rows actually carrying combining marks / format chars
# pay for the exact pattern.
_EF_PRESENT_RE = re.compile(rf"[{_WB4_IGNORE}]")


def _expand_class(cls: str) -> frozenset:
    """Expand a regex char-class body (literals + a-b ranges; the
    backslash-u escapes are already decoded at this point) to a frozenset.
    set.isdisjoint(str) is a C-speed per-char membership scan, ~50x
    faster than searching a 300-range class with sre (which falls back
    to a linear range scan per character for astral-bearing classes)."""
    out = []
    i = 0
    while i < len(cls):
        if i + 2 < len(cls) and cls[i + 1] == "-":
            out.extend(map(chr, range(ord(cls[i]), ord(cls[i + 2]) + 1)))
            i += 3
        else:
            out.append(cls[i])
            i += 1
    return frozenset(out)


_EF_SET = _expand_class(_WB4_IGNORE)
_UAX_WORD_NOEF = (
    rf"{_W}+"
    rf"(?:(?:"
    rf"(?<=[^\W\d_])[{_MIDLETTER}{_MIDNUMLET}'](?=(?![\d_]){_W})"
    rf"|(?<=\d)[{_MIDNUM}{_MIDNUMLET}'](?=\d)"
    rf"|(?<=[{_HEBREW}])\"(?=[{_HEBREW}])"
    rf"){_W}+)*"
    rf"(?:(?<=[{_HEBREW}])')?"
)
TOKEN_RE_NOEF = re.compile(
    rf"[{_KATA}]+"
    rf"|[{_IDEO}{_HIRA}]"
    rf"|[{_RI}]{{1,2}}"
    # no ZWJ can occur in EF-free text; only direct modifier attachment
    rf"|[{_PICTO}][{_EMOD}]*"
    rf"|{_UAX_WORD_NOEF}"
)


def _token_re_for(text: str):
    # isascii() is an O(1) header-flag read; no EF char is ASCII
    if text.isascii() or _EF_SET.isdisjoint(text):
        return TOKEN_RE_NOEF
    return TOKEN_RE

_POSSESSIVE_RE = re.compile(r"['’][sS]$")
SIMPLE_TOKEN_RE = re.compile(r"[a-z0-9]+")


def tokenize_standard(text: str) -> list[str]:
    """StandardTokenizer: UAX#29 word-break subset + 255-char split."""
    toks = _token_re_for(text).findall(text)
    out = []
    for t in toks:
        if len(t) <= MAX_TOKEN_LENGTH:
            out.append(t)
        else:
            out.extend(
                t[i : i + MAX_TOKEN_LENGTH]
                for i in range(0, len(t), MAX_TOKEN_LENGTH)
            )
    return out


def strip_possessive(token: str) -> str:
    return _POSSESSIVE_RE.sub("", token)


def analyze_en(text: str, stem_cache: dict | None = None) -> list[tuple[str, int]]:
    """EnglishAnalyzer chain -> [(term, position)], positions preserve
    stopword holes (StopFilter accumulates position increments)."""
    out = []
    cache = stem_cache if stem_cache is not None else {}
    for pos, tok in enumerate(tokenize_standard(text)):
        t = strip_possessive(tok).lower()
        if not t or t in ENGLISH_STOP_WORDS:
            continue  # hole: position increment accumulates
        s = cache.get(t)
        if s is None:
            s = porter_stem(t)
            cache[t] = s
        out.append((s, pos))
    return out


def analyze_standard(text: str) -> list[tuple[str, int]]:
    """StandardAnalyzer: Standard -> LowerCase -> Stop(empty default)."""
    return [(t.lower(), i) for i, t in enumerate(tokenize_standard(text))]


def analyze_simple(text: str) -> list[tuple[str, int]]:
    """'simple' profile: lowercase [a-z0-9]+ runs, no stop/stem — the
    ANSI-SQL-expressible twin used for the DuckDB oracle path
    (SURVEY.md §6.2 item 8)."""
    return [(t, i) for i, t in enumerate(SIMPLE_TOKEN_RE.findall(text.lower()))]


def analyze_wdgf(text: str) -> list[tuple[str, int]]:
    """'wdgf' profile: Whitespace -> WordDelimiterGraph(catenate_all) ->
    LowerCase -> Stop. WHITESPACE tokenization, not Standard — the
    standard tokenizer already strips intra-word delimiters ('Wi-Fi' ->
    'Wi','Fi'), destroying what WDGF needs to see; Solr schemas pair WDGF
    with WhitespaceTokenizer for exactly this reason. Graph stacking means
    several (term, pos) pairs share a position — 'Wi-Fi' indexes as wi@p,
    wifi@p, fi@p+1, so Term queries match any variant and MultiPhrase
    consumes the stack."""
    out = []
    pos = -1
    for tok in text.split():
        for sub, inc in word_delimiter_graph(tok, catenate_all=True):
            pos += inc
            t = sub.lower()
            if t and t not in ENGLISH_STOP_WORDS:
                out.append((t, pos))
    return out


# graph-emitting profiles can't ride the 1:1 vectorized chain (_chain_one
# maps one surface token to one term); analyze_flat falls back to the
# per-row path for them
GRAPH_PROFILES = {"wdgf"}

def analyze_de(text: str) -> list[tuple[str, int]]:
    """GermanAnalyzer core chain: Standard -> LowerCase -> Snowball German
    (lucene/analysis/common/.../de/GermanAnalyzer.java ≈L60). Stop list
    deliberately empty (documented deviation: the reference ships the
    Snowball German stop list; positions here carry no stop holes)."""
    from .snowball import german_stem

    return [(german_stem(t.lower()), i) for i, t in enumerate(tokenize_standard(text))]


def analyze_fr(text: str) -> list[tuple[str, int]]:
    """FrenchAnalyzer core chain: Standard -> Elision -> LowerCase ->
    Snowball French (.../fr/FrenchAnalyzer.java ≈L70). Stop list empty
    (same documented deviation as analyze_de)."""
    from .snowball import french_stem

    out = []
    for i, t in enumerate(tokenize_standard(text)):
        t = elision_filter(t).lower()
        if t:
            out.append((french_stem(t), i))
    return out


def analyze_es(text: str) -> list[tuple[str, int]]:
    """SpanishAnalyzer core chain: Standard -> LowerCase -> Snowball
    Spanish (.../es/SpanishAnalyzer.java ≈L60). Stop list empty (same
    documented deviation as analyze_de)."""
    from .snowball import spanish_stem

    return [(spanish_stem(t.lower()), i) for i, t in enumerate(tokenize_standard(text))]


def analyze_it(text: str) -> list[tuple[str, int]]:
    """ItalianAnalyzer core chain: Standard -> Elision(It) -> LowerCase ->
    Snowball Italian (.../it/ItalianAnalyzer.java ≈L70; Italian elision
    articles per ItalianAnalyzer.DEFAULT_ARTICLES). Stop list empty
    (same documented deviation as analyze_de)."""
    from .snowball import italian_stem

    out = []
    for i, t in enumerate(tokenize_standard(text)):
        t = elision_filter(t, IT_ELISION_ARTICLES).lower()
        if t:
            out.append((italian_stem(t), i))
    return out


def analyze_pt(text: str) -> list[tuple[str, int]]:
    """PortugueseAnalyzer core chain: Standard -> LowerCase -> Snowball
    Portuguese (.../pt/PortugueseAnalyzer.java ≈L60). Stop list empty
    (same documented deviation as analyze_de)."""
    from .snowball import portuguese_stem

    return [
        (portuguese_stem(t.lower()), i)
        for i, t in enumerate(tokenize_standard(text))
    ]


IT_ELISION_ARTICLES = (
    "c", "l", "all", "dall", "dell", "nell", "sull", "coll", "pell",
    "gl", "agl", "dagl", "degl", "negl", "sugl", "un", "m", "t", "s",
    "v", "d",
)


def analyze_lang(text: str, lang: str) -> list[tuple[str, int]]:
    """Language-gated chain dispatch (the per-language field routing a
    Solr schema does with text_en/text_de/text_fr/text_es field types):
    en -> EnglishAnalyzer chain, de/fr/es -> Snowball chains, anything
    else -> StandardAnalyzer (tokenize+lowercase, no stem — the honest
    fallback for languages without a shipped stemmer)."""
    if lang in ("en", "english"):
        return analyze_en(text)
    fn = ANALYZERS.get(lang)
    return fn(text) if fn is not None else analyze_standard(text)


ANALYZERS = {
    "en": analyze_en,
    "english": analyze_en,
    "standard": analyze_standard,
    "simple": analyze_simple,
    "wdgf": analyze_wdgf,
    "de": analyze_de,
    "fr": analyze_fr,
    "es": analyze_es,
    "it": analyze_it,
    "pt": analyze_pt,
}


def analyze(text: str, profile: str = "en", stem_cache: dict | None = None):
    if profile in ("en", "english"):
        return analyze_en(text, stem_cache)
    return ANALYZERS[profile](text)


# ---------------------------------------------------------------------------
# Vectorized batch analysis — the index-build hot path.
#
# Same semantics as analyze(), restated columnar: tokenize via C-speed regex,
# then run the filter chain (possessive -> lower -> stop -> Porter) once per
# UNIQUE surface token of the batch (Zipf: uniques ≪ tokens) and scatter the
# results back with numpy indexing. A process-lifetime memo carries stems
# across Arrow batches. No per-token Python in the flat path.
# ---------------------------------------------------------------------------

# cheap pre-screen for the rare >255-char-token slow path; plain \w (no
# lookahead — that would be quadratic) so CJK runs may false-positive, which
# only costs re-tokenizing those rows via tokenize_standard (identical output)
_LONG_TOKEN_RE = re.compile(r"\w{256}")
_CHAIN_MEMO: dict[str, dict] = {
    "en": {}, "english": {}, "standard": {}, "simple": {},
    "de": {}, "fr": {}, "es": {}, "it": {}, "pt": {},
}

# ASCII fast path: on pure-ASCII rows (str.isascii, a C check) the CJK
# alternatives and the per-char (?!CJK) lookahead in TOKEN_RE are dead
# weight — this explicit-class twin is ~3x faster and provably identical
# on ASCII input: the ASCII members of the UAX#29 mid classes are
# MidNumLetQ = ['.]  (letter-letter or digit-digit) and MidNum = [,;]
# (digit-digit only); MidLetter and the Hebrew quote rules have no ASCII
# members (':' left MidLetter in Unicode 6.1). Equivalence is pinned by a
# randomized differential test (tests/test_analysis.py).
_ASCII_TOKEN_RE = re.compile(
    r"[0-9A-Za-z_]+"
    r"(?:(?:(?<=[A-Za-z])['.](?=[A-Za-z])|(?<=\d)[.,;'](?=\d))"
    r"[0-9A-Za-z_]+)*"
)


def _tokenize_rows(s, profile: str):
    """Tokenize a pandas Series of strings -> list of per-row token lists.
    Row-major, positions implicit (list order). Applies the ASCII
    fast-path per row and the >255-char-token split (detected with ONE
    regex pass over a NUL-joined megastring instead of per-row scans —
    NUL never extends a \\w run, so tokens cannot cross the joins)."""
    if profile == "simple":
        return [SIMPLE_TOKEN_RE.findall(t) for t in s.str.lower()]
    vals = s.tolist()
    asc = [t.isascii() for t in vals]
    if all(asc):
        found = [_ASCII_TOKEN_RE.findall(t) for t in vals]
    else:
        found = [
            (_ASCII_TOKEN_RE if a else _token_re_for(t)).findall(t)
            for t, a in zip(vals, asc)
        ]
    if _LONG_TOKEN_RE.search("\x00".join(vals)) is not None:
        # rare: re-run the exact splitting tokenizer on affected rows only
        found = [
            tokenize_standard(t) if _LONG_TOKEN_RE.search(t) else f
            for t, f in zip(vals, found)
        ]
    return found


def _chain_one(tok: str, profile: str) -> str | None:
    """Full filter chain for one surface token; None = dropped (hole)."""
    if profile in ("en", "english"):
        t = strip_possessive(tok).lower()
        if not t or t in ENGLISH_STOP_WORDS:
            return None
        return porter_stem(t)
    if profile == "standard":
        return tok.lower()
    if profile == "de":
        from .snowball import german_stem

        return german_stem(tok.lower())
    if profile == "fr":
        from .snowball import french_stem

        t = elision_filter(tok).lower()
        return french_stem(t) if t else None
    if profile == "es":
        from .snowball import spanish_stem

        return spanish_stem(tok.lower())
    if profile == "it":
        from .snowball import italian_stem

        t = elision_filter(tok, IT_ELISION_ARTICLES).lower()
        return italian_stem(t) if t else None
    if profile == "pt":
        from .snowball import portuguese_stem

        return portuguese_stem(tok.lower())
    return tok  # simple: tokenizer already lowercased


def analyze_flat(texts, profile: str = "en"):
    """Batch analysis -> flat columnar postings fragments.

    Args:  texts — 1-D array/Series of strings (None treated as empty).
    Returns (row_idx, terms, pos, field_len):
      row_idx   int64[k]  — index into `texts` for each emitted token
      terms     object[k] — analyzed terms (post-chain)
      pos       int64[k]  — token position (tokenizer output order; stopword
                            holes preserved, as StopFilter accumulates)
      field_len int64[n]  — emitted-token count per input row (the BM25 norm
                            length; holes don't count — PerField#invert)
    """
    import pandas as pd
    import itertools

    s = pd.Series(texts, dtype=object).fillna("")
    if profile in GRAPH_PROFILES:
        # graph profiles emit 1->N stacked tokens — run the per-row chain
        # (documented slow path; the 1:1 memoized fast path can't stack)
        row_idx_l, terms_l, pos_l, field_len = [], [], [], np.zeros(len(s), np.int64)
        fn = ANALYZERS[profile]
        for i, txt in enumerate(s):
            tps = fn(txt)
            field_len[i] = len(tps)
            for t, p in tps:
                row_idx_l.append(i)
                terms_l.append(t)
                pos_l.append(p)
        return (
            np.asarray(row_idx_l, dtype=np.int64),
            np.asarray(terms_l, dtype=object),
            np.asarray(pos_l, dtype=np.int64),
            field_len,
        )
    found = _tokenize_rows(s, profile)
    counts = np.fromiter(map(len, found), dtype=np.int64, count=len(found))
    n = len(s)
    total = int(counts.sum())
    row_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
    if total == 0:
        return (
            row_idx,
            np.empty(0, dtype=object),
            np.empty(0, dtype=np.int64),
            np.zeros(n, dtype=np.int64),
        )
    flat = np.fromiter(
        itertools.chain.from_iterable(found), dtype=object, count=total
    )
    offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))
    pos = np.arange(total, dtype=np.int64) - np.repeat(offsets, counts)

    if profile == "simple":
        return row_idx, flat, pos, counts

    inv, uniq = pd.factorize(flat)  # hash-based: ~10x faster than np.unique
    memo = _CHAIN_MEMO[profile]
    mapped = np.fromiter(
        (
            memo[t] if t in memo else memo.setdefault(t, _chain_one(t, profile))
            for t in uniq
        ),
        dtype=object,
        count=len(uniq),
    )
    terms = mapped[inv]
    keep = np.not_equal(terms, None)
    field_len = np.bincount(row_idx[keep], minlength=n).astype(np.int64)
    return row_idx[keep], terms[keep], pos[keep], field_len


def analyze_flat_grouped(texts, profile: str = "en", return_codes: bool = False):
    """Batch analysis + map-side per-(row, term) aggregation — the DWPT
    in-RAM inversion (TermsHashPerField#add): tf and sorted positions are
    computed HERE, before any shuffle, so the index build never shuffles
    token-level rows.

    The whole pipeline after tokenization runs in INTEGER CODE SPACE: one
    string factorize over the batch's surface tokens, the filter chain
    memoized per unique surface token, then a single-key stable argsort on
    row*n_stems+stem_code. Term strings materialize only once per output
    GROUP — no intermediate 4-million-object term array, no second string
    factorize, no 3-key lexsort (the round-2 kernel spent >half its time
    there).

    Returns (grp_row, grp_term, grp_tf, pos_values, pos_offsets, field_len):
      grp_row     int64[g]   — row index of each (row, term) group
      grp_term    object[g]  — analyzed term
      grp_tf      int64[g]   — term frequency within the row
      pos_values  int64[k]   — all positions, group-major, sorted per group
      pos_offsets int64[g+1] — group i's positions = values[off[i]:off[i+1]]
                               (exactly an Arrow ListArray, zero-copy)
      field_len   int64[n]   — emitted-token count per row

    ``return_codes=True`` returns
    (grp_row, grp_code, term_dict, grp_tf, pos_values, pos_offsets,
    field_len) instead — grp_code int64[g] indexes into term_dict
    object[u] (the batch's distinct analyzed terms). The block-grouped
    index build regroups by (code, doc-block) in integer space and only
    materializes one term string per OUTPUT group, so it takes the codes
    directly rather than paying a second factorize over grp_term.
    """
    import itertools

    import pandas as pd

    if profile in GRAPH_PROFILES:
        # graph profiles ride the per-row chain; group via the same
        # combined-key stable sort afterwards
        row_idx, terms, pos, field_len = analyze_flat(texts, profile)
        if len(row_idx) == 0:
            empty = np.empty(0, dtype=np.int64)
            if return_codes:
                return (row_idx, empty, np.empty(0, dtype=object), empty,
                        empty, np.zeros(1, np.int64), field_len)
            return row_idx, terms, empty, empty, np.zeros(1, np.int64), field_len
        codes, uniq = pd.factorize(terms)
        key = row_idx * np.int64(len(uniq)) + codes
        order = np.argsort(key, kind="stable")
        k, r, c, p = key[order], row_idx[order], codes[order], pos[order]
        boundary = np.empty(len(k), dtype=bool)
        boundary[0] = True
        np.not_equal(k[1:], k[:-1], out=boundary[1:])
        starts = np.flatnonzero(boundary)
        tf = np.diff(np.append(starts, len(k)))
        offsets = np.append(starts, len(k))
        if return_codes:
            return (r[starts], c[starts].astype(np.int64),
                    np.asarray(uniq, dtype=object), tf, p, offsets, field_len)
        return r[starts], uniq[c[starts]], tf, p, offsets, field_len

    s = pd.Series(texts, dtype=object).fillna("")
    n = len(s)
    found = _tokenize_rows(s, profile)
    counts = np.fromiter(map(len, found), dtype=np.int64, count=n)
    total = int(counts.sum())
    empty = np.empty(0, dtype=np.int64)
    if total == 0:
        if return_codes:
            return (
                empty, empty, np.empty(0, dtype=object), empty, empty,
                np.zeros(1, np.int64), np.zeros(n, dtype=np.int64),
            )
        return (
            empty, np.empty(0, dtype=object), empty, empty,
            np.zeros(1, np.int64), np.zeros(n, dtype=np.int64),
        )
    row_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
    flat = np.fromiter(
        itertools.chain.from_iterable(found), dtype=object, count=total
    )
    offsets0 = np.concatenate(([0], np.cumsum(counts)[:-1]))
    pos = np.arange(total, dtype=np.int64) - np.repeat(offsets0, counts)

    if profile == "simple":
        # identity chain: surface tokens ARE the terms
        inv, stem_uniq = pd.factorize(flat)
        scode, keep = inv, None
        ri, sc, ps = row_idx, scode, pos
        field_len = counts
    else:
        inv, uniq = pd.factorize(flat)
        memo = _CHAIN_MEMO[profile]
        stems_u = np.fromiter(
            (
                memo[t] if t in memo else memo.setdefault(t, _chain_one(t, profile))
                for t in uniq
            ),
            dtype=object,
            count=len(uniq),
        )
        valid = np.not_equal(stems_u, None)
        stem_inv, stem_uniq = pd.factorize(stems_u[valid])
        # per-unique-surface-token stem code; -1 = dropped (stop/empty)
        scode_u = np.full(len(uniq), -1, dtype=np.int64)
        scode_u[valid] = stem_inv
        scode = scode_u[inv]
        keep = scode >= 0
        ri, sc, ps = row_idx[keep], scode[keep], pos[keep]
        field_len = np.bincount(ri, minlength=n).astype(np.int64)
    if len(ri) == 0:
        if return_codes:
            return (
                empty, empty, np.empty(0, dtype=object), empty, empty,
                np.zeros(1, np.int64), field_len,
            )
        return (
            empty, np.empty(0, dtype=object), empty, empty,
            np.zeros(1, np.int64), field_len,
        )
    n_stems = np.int64(len(stem_uniq))
    max_pos_p1 = np.int64(int(ps.max()) + 1)
    if int(n) * int(n_stems) * int(max_pos_p1) < (1 << 62):
        # pack (row, stem, pos) into ONE int64 and VALUE-sort it — a direct
        # np.sort is several times faster than a stable argsort plus the
        # permutation gathers, and pos decodes back out of the low bits
        key = (ri * n_stems + sc) * max_pos_p1 + ps
        key = np.sort(key)
        p = key % max_pos_p1
        g = key // max_pos_p1
    else:  # pathological batch: fall back to the stable argsort
        g0 = ri * n_stems + sc
        order = np.argsort(g0, kind="stable")
        g, p = g0[order], ps[order]
    boundary = np.empty(len(g), dtype=bool)
    boundary[0] = True
    np.not_equal(g[1:], g[:-1], out=boundary[1:])
    starts = np.flatnonzero(boundary)
    tf = np.diff(np.append(starts, len(g)))
    offsets = np.append(starts, len(g))
    gg = g[starts]
    grp_row = gg // n_stems
    if return_codes:
        return (grp_row, gg - grp_row * n_stems,
                np.asarray(stem_uniq, dtype=object), tf, p, offsets, field_len)
    grp_term = np.asarray(stem_uniq, dtype=object)[gg - grp_row * n_stems]
    return grp_row, grp_term, tf, p, offsets, field_len


# ---------------------------------------------------------------------------
# token-filter library beyond the core chain (SURVEY.md §3.2 rows
# ShingleFilter / NGramTokenFilter / EdgeNGramTokenFilter /
# ASCIIFoldingFilter) — list-in/list-out, usable per-row or vectorized
# ---------------------------------------------------------------------------

def shingles(tokens: list[str], n: int = 2, sep: str = " ") -> list[str]:
    """ShingleFilter: token n-grams (.../analysis/shingle/ShingleFilter.java)."""
    return [sep.join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)]


def char_ngrams(term: str, n: int = 3) -> list[str]:
    """NGramTokenFilter: all char n-grams (.../analysis/ngram/)."""
    return [term[i : i + n] for i in range(len(term) - n + 1)]


def edge_ngrams(term: str, min_n: int = 1, max_n: int = 5) -> list[str]:
    """EdgeNGramTokenFilter: leading prefixes min_n..max_n (autocomplete)."""
    return [term[:i] for i in range(min_n, min(max_n, len(term)) + 1)]


_FOLD_SPECIAL = {"ß": "ss", "æ": "ae", "œ": "oe", "Æ": "AE", "Œ": "OE",
                 "ø": "o", "Ø": "O", "đ": "d", "Đ": "D", "ł": "l", "Ł": "L"}


def ascii_fold(term: str) -> str:
    """ASCIIFoldingFilter equivalent for the Latin ranges: NFD-decompose,
    drop combining marks, map the non-decomposable specials
    (.../miscellaneous/ASCIIFoldingFilter.java — its ~2000-LoC switch is
    the hand-unrolled form of exactly this)."""
    import unicodedata

    out = []
    for c in term:
        if c in _FOLD_SPECIAL:
            out.append(_FOLD_SPECIAL[c])
            continue
        d = unicodedata.normalize("NFD", c)
        out.append("".join(x for x in d if not unicodedata.combining(x)))
    return "".join(out)


# ---------------------------------------------------------------------------
# token-GRAPH filters (SURVEY.md §3.2 rows WordDelimiterGraphFilter /
# SynonymGraphFilter): stacked tokens share a position — exactly what our
# (term, position) postings model stores natively, and what MultiPhrase
# consumes at query time. Index-time graph emission is FLATTENED (like
# Lucene's FlattenGraphFilter, which indexing requires): posLength collapses
# to 1, the documented lossy step that makes Lucene recommend query-time
# synonyms for exact multi-word phrase semantics.
# ---------------------------------------------------------------------------

_WDGF_DELIM_RE = re.compile(r"[^0-9A-Za-z]+")

# Flag bits mirror WordDelimiterGraphFilter.java's public constants.
WDGF_GENERATE_WORD_PARTS = 1 << 0
WDGF_GENERATE_NUMBER_PARTS = 1 << 1
WDGF_CATENATE_WORDS = 1 << 2
WDGF_CATENATE_NUMBERS = 1 << 3
WDGF_CATENATE_ALL = 1 << 4
WDGF_PRESERVE_ORIGINAL = 1 << 5
WDGF_SPLIT_ON_CASE_CHANGE = 1 << 6
WDGF_SPLIT_ON_NUMERICS = 1 << 7
WDGF_STEM_ENGLISH_POSSESSIVE = 1 << 8
WDGF_DEFAULT = (
    WDGF_GENERATE_WORD_PARTS
    | WDGF_GENERATE_NUMBER_PARTS
    | WDGF_SPLIT_ON_CASE_CHANGE
    | WDGF_SPLIT_ON_NUMERICS
    | WDGF_STEM_ENGLISH_POSSESSIVE
)


def _wdgf_case_split(seg: str) -> list[str]:
    """Case-change boundaries per WordDelimiterIterator: lower->Upper
    ("PowerShot" -> Power|Shot), and before the LAST upper of an upper run
    followed by a lower ("USAToday" -> USA|Today); a bare upper run ("XL")
    never splits."""
    out, start = [], 0
    for i in range(1, len(seg)):
        prev, cur = seg[i - 1], seg[i]
        nxt = seg[i + 1] if i + 1 < len(seg) else ""
        if (prev.islower() and cur.isupper()) or (
            prev.isupper() and cur.isupper() and nxt.islower()
        ):
            out.append(seg[start:i])
            start = i
    out.append(seg[start:])
    return out


def _wdgf_num_split(seg: str) -> list[str]:
    """Letter<->digit boundaries: "SD500" -> SD|500, "j2se" -> j|2|se."""
    out, start = [], 0
    for i in range(1, len(seg)):
        if seg[i - 1].isdigit() != seg[i].isdigit():
            out.append(seg[start:i])
            start = i
    out.append(seg[start:])
    return out


def word_delimiter_graph_flags(
    token: str, flags: int = WDGF_DEFAULT
) -> list[tuple[str, int]]:
    """WordDelimiterGraphFilter with the FULL per-flag matrix
    (.../miscellaneous/WordDelimiterGraphFilter.java ≈L120:
    GENERATE_WORD_PARTS, GENERATE_NUMBER_PARTS, CATENATE_WORDS,
    CATENATE_NUMBERS, CATENATE_ALL, PRESERVE_ORIGINAL,
    SPLIT_ON_CASE_CHANGE, SPLIT_ON_NUMERICS, STEM_ENGLISH_POSSESSIVE).

    Returns [(subtoken, pos_increment)]: generated parts advance the
    position by 1; catenated variants STACK at the first part of their
    run (pos_increment 0) and the preserved original stacks at the first
    part — the token-graph shape, flattened (posLength collapses to 1,
    the same lossy step as FlattenGraphFilter).

      "Wi-Fi"    -> [("Wi",1), ("Fi",1)]           (+ ("WiFi",0) if catenate)
      "SD500"    -> [("SD",1), ("500",1)]
      "O'Neil's" -> [("O",1), ("Neil",1)]
      "foobar"   -> [("foobar",1)]

    Mixed alpha+digit parts (only possible with SPLIT_ON_NUMERICS off)
    are generated by EITHER generate flag (Lucene types them ALPHA|NUM)
    but do not join CATENATE_WORDS/CATENATE_NUMBERS runs.
    """
    base = (
        _POSSESSIVE_RE.sub("", token)
        if flags & WDGF_STEM_ENGLISH_POSSESSIVE
        else token
    )
    parts: list[str] = []
    for seg in _WDGF_DELIM_RE.split(base):
        if not seg:
            continue
        subs = (
            _wdgf_case_split(seg)
            if flags & WDGF_SPLIT_ON_CASE_CHANGE
            else [seg]
        )
        if flags & WDGF_SPLIT_ON_NUMERICS:
            subs = [p for s in subs for p in _wdgf_num_split(s)]
        parts.extend(subs)
    if not parts:
        return []
    gen = [
        bool(
            (flags & WDGF_GENERATE_WORD_PARTS and any(c.isalpha() for c in p))
            or (
                flags & WDGF_GENERATE_NUMBER_PARTS
                and any(c.isdigit() for c in p)
            )
        )
        for p in parts
    ]
    stacked: dict[int, list[str]] = {}

    def _add_runs(pred) -> None:
        i = 0
        while i < len(parts):
            if pred(parts[i]):
                j = i
                while j + 1 < len(parts) and pred(parts[j + 1]):
                    j += 1
                if j > i:  # single-part run would duplicate the part itself
                    stacked.setdefault(i, []).append("".join(parts[i : j + 1]))
                i = j + 1
            else:
                i += 1

    if flags & WDGF_CATENATE_WORDS:
        _add_runs(str.isalpha)
    if flags & WDGF_CATENATE_NUMBERS:
        _add_runs(str.isdigit)
    if flags & WDGF_CATENATE_ALL and len(parts) > 1:
        stacked.setdefault(0, []).append("".join(parts))
    out: list[tuple[str, int]] = []
    for i, p in enumerate(parts):
        toks: list[str] = [p] if gen[i] else []
        if (
            i == 0
            and flags & WDGF_PRESERVE_ORIGINAL
            and (len(parts) > 1 or parts[0] != token)
        ):
            toks.append(token)
        toks.extend(stacked.get(i, ()))
        if not toks:
            continue
        out.append((toks[0], 1))
        out.extend((t, 0) for t in toks[1:])
    return out


def word_delimiter_graph(
    token: str,
    catenate_all: bool = False,
    preserve_original: bool = False,
    flags: int = WDGF_DEFAULT,
) -> list[tuple[str, int]]:
    """Default-flag WDGF (see word_delimiter_graph_flags for the matrix);
    the two keyword booleans are kept as shorthands for the two most
    common extra flags."""
    if catenate_all:
        flags |= WDGF_CATENATE_ALL
    if preserve_original:
        flags |= WDGF_PRESERVE_ORIGINAL
    return word_delimiter_graph_flags(token, flags)


def synonym_graph(
    tokens: list[tuple[str, int]],
    rules: dict[tuple[str, ...], tuple[str, ...]],
) -> list[tuple[str, int]]:
    """Index-time SynonymGraphFilter (.../synonym/SynonymGraphFilter.java
    ≈L80): greedy longest-match of multi-word rules over the token stream;
    each matched rule's outputs are STACKED at the match's first position
    (graph flattened for indexing — posLength collapses, the documented
    lossy index-time behavior).

    tokens: [(term, position)]; rules: {("new","york"): ("nyc",), ...}.
    Returns the augmented [(term, position)] list, original tokens kept.
    """
    if not tokens:
        return []
    max_len = max((len(k) for k in rules), default=0)
    out = list(tokens)
    terms = [t for t, _ in tokens]
    i = 0
    while i < len(tokens):
        matched = 0
        # greedy: longest rule first (SynGraphFilter's FST longest match)
        for ln in range(min(max_len, len(tokens) - i), 0, -1):
            key = tuple(terms[i : i + ln])
            # contiguity: positions must be consecutive (no stopword hole
            # inside a synonym match)
            if key in rules and tokens[i + ln - 1][1] - tokens[i][1] == ln - 1:
                pos0 = tokens[i][1]
                out.extend((syn, pos0) for syn in rules[key])
                matched = ln
                break
        i += matched or 1
    out.sort(key=lambda tp: (tp[1], tp[0]))
    return out


def synonym_graph_tokens(
    tokens: list[tuple[str, int]],
    rules: dict[tuple[str, ...], tuple[str, ...]],
) -> list[tuple[str, int, int]]:
    """Index-time SynonymGraphFilter with TRUE graph positions — the
    round-4 verdict's flatten-lossy closure. Returns
    [(term, position, posLength)] where positions are graph NODES in
    topological order and a token occupies the edge [pos, pos+posLength)
    (PositionLengthAttribute, .../synonym/SynonymGraphFilter.java ≈L80).

    A matched rule inserts a parallel path between the match's boundary
    nodes; the region spans max(len(input), len(output)) positions, each
    path's tokens take one node step except the last, which stretches to
    the region end — exactly the TestSynonymGraphFilter shapes:

      "fast wi fi network" + (wi fi -> wifi):
        fast@0, wifi@1(len 2), wi@1, fi@2, network@3
      "fast wifi network"  + (wifi -> wi fi):
        fast@0, wifi@1(len 2), wi@1, fi@2, network@3

    Unlike the flatten (synonym_graph above, kept for the documented
    lossy path), downstream consumers that understand posLength
    (graph_phrase_freq) neither false-match across a stacked multi-word
    output nor miss the single-token side of a span.

    Holes (stopword position gaps in the input) break match contiguity,
    same contiguity rule as the flatten; the hole's width is preserved
    in the output node numbering.
    """
    if not tokens:
        return []
    max_len = max((len(k) for k in rules), default=0)
    terms = [t for t, _ in tokens]
    out: list[tuple[str, int, int]] = []
    node = 0  # next output node for the current input position
    i = 0
    prev_in_pos: int | None = None
    while i < len(tokens):
        # carry input holes into the output axis
        if prev_in_pos is not None:
            node += max(tokens[i][1] - prev_in_pos - 1, 0)
        matched = 0
        for ln in range(min(max_len, len(tokens) - i), 0, -1):
            key = tuple(terms[i : i + ln])
            if key in rules and tokens[i + ln - 1][1] - tokens[i][1] == ln - 1:
                outs = rules[key]
                width = max(ln, len(outs))
                for j in range(ln):  # original path (keepOrig=true)
                    pl = 1 if j < ln - 1 else width - (ln - 1)
                    out.append((terms[i + j], node + j, pl))
                for j in range(len(outs)):  # synonym path
                    pl = 1 if j < len(outs) - 1 else width - (len(outs) - 1)
                    out.append((outs[j], node + j, pl))
                node += width
                matched = ln
                break
        if not matched:
            out.append((terms[i], node, 1))
            node += 1
        prev_in_pos = tokens[i + (matched or 1) - 1][1]
        i += matched or 1
    out.sort(key=lambda tp: (tp[1], -tp[2], tp[0]))
    return out


def graph_phrase_freq(
    graph: list[tuple[str, int, int]], phrase: list[str]
) -> int:
    """Count phrase matches over a posLength token graph: the phrase
    matches along a PATH — each term's token must start at the node
    where the previous term's token ended (pos + posLength), the
    SpanNearQuery-over-graph semantics query-time SynonymGraphFilter
    relies on (Lucene matches graphs at query time only; our index-side
    consumer gets the same path rule)."""
    if not phrase:
        return 0
    by_term: dict[str, list[tuple[int, int]]] = {}
    for t, p, pl in graph:
        by_term.setdefault(t, []).append((p, pl))
    first = by_term.get(phrase[0], [])
    count = 0
    for p0, pl0 in first:
        frontier = {p0 + pl0}
        ok = True
        for t in phrase[1:]:
            nxt = {
                p + pl
                for p, pl in by_term.get(t, [])
                if p in frontier
            }
            if not nxt:
                ok = False
                break
            frontier = nxt
        if ok:
            count += 1
    return count


def analyze_with_offsets(
    text: str, profile: str = "en"
) -> list[tuple[str, int, int, int]]:
    """Analysis chain that carries character offsets into the ORIGINAL
    text -> [(term, position, start_offset, end_offset)].

    Lucene OffsetAttribute semantics (lucene/core .../tokenattributes/
    OffsetAttribute.java): offsets always reference the surface form the
    tokenizer saw — token filters (possessive strip, lowercase, Porter
    stem) change the term but NOT its offsets, which is what lets the
    UnifiedHighlighter mark up the original bytes. Positions mirror
    analyze(): stopword holes consume a position but emit nothing.

    Profiles: en/english (Standard -> Possessive -> Lower -> Stop ->
    Porter), standard, simple (offsets computed on the lowercased text —
    identical for ASCII; documented caveat for the rare length-changing
    Unicode lowercasings).
    """
    out: list[tuple[str, int, int, int]] = []
    if profile == "simple":
        low = text.lower()
        for i, m in enumerate(SIMPLE_TOKEN_RE.finditer(low)):
            out.append((m.group(), i, m.start(), m.end()))
        return out
    if profile not in ("en", "english", "standard"):
        raise ValueError(f"offsets unsupported for profile {profile!r}")
    pos = 0
    for m in TOKEN_RE.finditer(text):
        tok = m.group()
        if len(tok) <= MAX_TOKEN_LENGTH:
            pieces = [(tok, m.start(), m.end())]
        else:  # 255-char split, offsets per chunk (StandardTokenizer)
            pieces = [
                (
                    tok[i : i + MAX_TOKEN_LENGTH],
                    m.start() + i,
                    m.start() + min(i + MAX_TOKEN_LENGTH, len(tok)),
                )
                for i in range(0, len(tok), MAX_TOKEN_LENGTH)
            ]
        for sub, so, eo in pieces:
            if profile == "standard":
                out.append((sub.lower(), pos, so, eo))
            else:
                t = strip_possessive(sub).lower()
                if t and t not in ENGLISH_STOP_WORDS:
                    out.append((porter_stem(t), pos, so, eo))
            pos += 1  # holes accumulate position increments
    return out


def analyze_query_terms(query_text: str, profile: str = "en") -> list[str]:
    """Query-time analysis of a bare term/phrase string (same chain as
    index time — Lucene's query parser analyzes query text with the
    field's query analyzer)."""
    return [t for t, _ in analyze(query_text, profile)]


# ---------------------------------------------------------------------------
# Phonetic filters (SURVEY §3.2 long tail; Solr PhoneticFilterFactory) —
# classic American Soundex + commons-codec RefinedSoundex, both from the
# published algorithm specs (lucene/analysis/phonetic wraps commons-codec).
# ---------------------------------------------------------------------------

_SOUNDEX_CODES = {}
for _grp, _d in (("BFPV", "1"), ("CGJKQSXZ", "2"), ("DT", "3"),
                 ("L", "4"), ("MN", "5"), ("R", "6")):
    for _c in _grp:
        _SOUNDEX_CODES[_c] = _d

# RefinedSoundex US English mapping for A..Z (commons-codec
# RefinedSoundex.US_ENGLISH_MAPPING_STRING)
_REFINED_MAP = "01360240043788015936020505"


def soundex(term: str) -> str:
    """American Soundex, 4 chars (letter + 3 digits, zero-padded).

    Rules implemented exactly: drop AEIOUY/H/W; adjacent identical codes
    collapse; H/W do NOT break a run of identical codes; vowels DO."""
    letters = [c for c in term.upper() if "A" <= c <= "Z"]
    if not letters:
        return ""
    out = letters[0]
    prev = _SOUNDEX_CODES.get(letters[0], "")
    for c in letters[1:]:
        if c in "HW":
            continue  # transparent: the previous code survives across H/W
        d = _SOUNDEX_CODES.get(c, "")
        if d and d != prev:
            out += d
            if len(out) == 4:
                return out
        prev = d  # vowels set prev='' -> same code after a vowel re-emits
    return (out + "000")[:4]


def refined_soundex(term: str) -> str:
    """RefinedSoundex (commons-codec): first letter + per-letter codes
    with adjacent duplicates collapsed, no length cap, vowels coded 0."""
    letters = [c for c in term.upper() if "A" <= c <= "Z"]
    if not letters:
        return ""
    out = [letters[0]]
    last = None
    for c in letters:
        d = _REFINED_MAP[ord(c) - 65]
        if d != last:
            out.append(d)
        last = d
    return "".join(out)


_MP_VOWELS = "AEIOU"
_MP_FRONTV = "EIY"
_MP_VARSON = "CSPTG"


def metaphone(term: str, max_len: int = 4) -> str:
    """Metaphone (Lawrence Philips, Computer Language 7(12), 1990) with
    commons-codec `Metaphone` rule semantics and its default 4-char cap —
    the third encoder lucene/analysis/phonetic PhoneticFilterFactory
    exposes (after Soundex/RefinedSoundex above). From-scratch Python
    from the published rule table; validated against the commons-codec
    test vectors in tests/test_phonetic.py."""
    letters = [c for c in term.upper() if "A" <= c <= "Z"]
    if not letters:
        return ""
    if len(letters) == 1:
        return letters[0]
    two = letters[0] + letters[1]
    if two in ("AE", "GN", "KN", "PN", "WR"):
        local = letters[1:]
    elif letters[0] == "X":
        local = ["S"] + letters[1:]
    elif two == "WH":
        local = ["W"] + letters[2:]
    else:
        local = letters
    w = len(local)

    def at(i: int) -> str:
        return local[i] if 0 <= i < w else ""

    def region(i: int, s: str) -> bool:
        return "".join(local[i : i + len(s)]) == s

    code: list[str] = []
    n = 0
    while len(code) < max_len and n < w:
        c = local[n]
        if c != "C" and n > 0 and local[n - 1] == c:
            n += 1
            continue  # adjacent duplicates collapse (except CC)
        if c in _MP_VOWELS:
            if n == 0:
                code.append(c)
        elif c == "B":
            if not (n == w - 1 and at(n - 1) == "M"):
                code.append("B")  # silent -MB$
        elif c == "C":
            if at(n - 1) == "S" and at(n + 1) in _MP_FRONTV and at(n + 1):
                pass  # SCE/SCI/SCY: C silent
            elif region(n, "CIA"):
                code.append("X")
            elif at(n + 1) in _MP_FRONTV and at(n + 1):
                code.append("S")
            elif at(n - 1) == "S" and at(n + 1) == "H":
                code.append("K")  # SCH
            elif at(n + 1) == "H":
                # commons-codec quirk preserved: word-initial CH with a
                # vowel at index 2 is HARD (CHARACTER -> K...), else X
                if n == 0 and w >= 3 and at(2) in _MP_VOWELS:
                    code.append("K")
                else:
                    code.append("X")
            else:
                code.append("K")
        elif c == "D":
            if at(n + 1) == "G" and at(n + 2) in _MP_FRONTV and at(n + 2):
                code.append("J")  # DGE/DGI/DGY
                n += 2
            else:
                code.append("T")
        elif c == "G":
            silent = False
            if at(n + 1) == "H" and n + 1 == w - 1:
                silent = True  # -GH$
            elif at(n + 1) == "H" and at(n + 2) not in _MP_VOWELS:
                silent = True  # GH + consonant
            elif n > 0 and (region(n, "GN") or region(n, "GNED")):
                silent = True
            if not silent:
                hard = at(n - 1) == "G"
                if at(n + 1) in _MP_FRONTV and at(n + 1) and not hard:
                    code.append("J")
                else:
                    code.append("K")
        elif c == "H":
            if n == w - 1:
                pass
            elif n > 0 and at(n - 1) in _MP_VARSON:
                pass  # silent after C/S/P/T/G
            elif at(n + 1) in _MP_VOWELS:
                code.append("H")
        elif c == "J":
            code.append("J")
        elif c == "K":
            if at(n - 1) != "C":
                code.append("K")
        elif c in "FLMNR":
            code.append(c)
        elif c == "P":
            code.append("F" if at(n + 1) == "H" else "P")
        elif c == "Q":
            code.append("K")
        elif c == "S":
            if region(n, "SH") or region(n, "SIO") or region(n, "SIA"):
                code.append("X")
            else:
                code.append("S")
        elif c == "T":
            if region(n, "TIA") or region(n, "TIO"):
                code.append("X")
            elif region(n, "TCH"):
                pass  # silent in -TCH-
            elif region(n, "TH"):
                code.append("0")  # theta
            else:
                code.append("T")
        elif c == "V":
            code.append("F")
        elif c == "W":
            if n < w - 1 and at(n + 1) in _MP_VOWELS:
                code.append("W")
        elif c == "X":
            code.append("K")
            code.append("S")
        elif c == "Y":
            if n < w - 1 and at(n + 1) in _MP_VOWELS:
                code.append("Y")
        elif c == "Z":
            code.append("S")
        n += 1
    return "".join(code[:max_len])


def common_grams(
    tokens: list[str], common_words: set[str] | frozenset[str]
) -> list[str]:
    """CommonGramsFilter (lucene/analysis/common/.../commongrams/
    CommonGramsFilter.java ≈L50): wherever a token pair involves a common
    word, emit the joined bigram "a_b" ALONGSIDE the unigrams (the filter
    sets posIncrement=0 on the gram — here the flat emission order
    unigram, gram, unigram... mirrors the stream order). Phrase queries on
    stopword-adjacent pairs then hit single postings instead of two
    position joins."""
    out: list[str] = []
    for i, tok in enumerate(tokens):
        out.append(tok)
        if i + 1 < len(tokens) and (
            tok in common_words or tokens[i + 1] in common_words
        ):
            out.append(f"{tok}_{tokens[i + 1]}")
    return out


def path_hierarchy(
    path: str, delimiter: str = "/", skip: int = 0
) -> list[str]:
    """PathHierarchyTokenizer (lucene/analysis/common/.../path/
    PathHierarchyTokenizer.java ≈L40): emit every ancestor prefix of a
    delimited path — "/a/b/c" -> ["/a", "/a/b", "/a/b/c"]. `skip` drops
    that many leading components (reference's skip param). Used for
    drill-down facets over hierarchies (category trees, file paths,
    URL paths)."""
    parts = [p for p in path.split(delimiter) if p != ""]
    parts = parts[skip:]
    lead = delimiter if path.startswith(delimiter) else ""
    return [
        lead + delimiter.join(parts[: i + 1]) for i in range(len(parts))
    ]


def analyze_stages(text: str) -> list[tuple[str, int, str]]:
    """FieldAnalysisRequestHandler / analysis.jsp parity (solr/core/.../
    handler/FieldAnalysisRequestHandler.java ≈L60): the per-stage token
    streams of the EnglishAnalyzer chain as (stage, position, token)
    rows — the analysis-debug surface an operator uses to see WHY a
    query does or does not match. Stages mirror the index chain exactly:
    tokenizer -> lowercase+possessive -> stop (position holes preserved)
    -> porter. Each stage's output is the next stage's input (asserted
    in tests)."""
    from .porter import porter_stem

    rows: list[tuple[str, int, str]] = []
    toks = tokenize_standard(text)
    for pos, t in enumerate(toks):
        rows.append(("1_tokenizer", pos, t))
    lowered = [strip_possessive(t).lower() for t in toks]
    for pos, t in enumerate(lowered):
        if t:
            rows.append(("2_lowercase_possessive", pos, t))
    stopped = [
        (pos, t)
        for pos, t in enumerate(lowered)
        if t and t not in ENGLISH_STOP_WORDS
    ]
    for pos, t in stopped:
        rows.append(("3_stop", pos, t))
    for pos, t in stopped:
        rows.append(("4_porter", pos, porter_stem(t)))
    return rows


# ---------------------------------------------------------------------------
# Miscellaneous token-filter utilities (SURVEY §3.2 "trivial Arrow ops"
# row — lucene/analysis/common/.../miscellaneous/): TrimFilter,
# LengthFilter, LimitTokenCountFilter, and the KeywordRepeatFilter +
# stemmer + RemoveDuplicatesTokenFilter stack (index both the surface
# form AND its stem at the SAME position, dropping the duplicate when
# the stem equals the surface — the standard "match exact and stemmed"
# recipe).
# ---------------------------------------------------------------------------


def trim_filter(token: str) -> str:
    """TrimFilter (TrimFilter.java ≈L30): strip surrounding whitespace
    (keyword-tokenizer fields)."""
    return token.strip()


def length_filter(tokens: list, min_len: int, max_len: int) -> list:
    """LengthFilter (LengthFilter.java ≈L30): keep len in [min, max]."""
    return [t for t in tokens if min_len <= len(t) <= max_len]


def limit_token_count(tokens: list, max_count: int) -> list:
    """LimitTokenCountFilter (≈L30): truncate the stream after N tokens
    (maxFieldLength analog)."""
    return tokens[: max_count]


def keyword_repeat_porter(text: str) -> list:
    """StandardTokenizer -> LowerCase -> KeywordRepeatFilter ->
    PorterStem -> RemoveDuplicatesTokenFilter: [(term, pos)] where each
    position holds the surface form and (when different) its stem —
    KeywordRepeatFilter emits the token twice with the first marked
    KEYWORD (stemmer passes it through), RemoveDuplicates drops the
    second copy when stemming changed nothing (same term, same posinc=0).
    """
    out = []
    for pos, tok in enumerate(tokenize_standard(text)):
        surface = tok.lower()
        stem = porter_stem(surface)
        out.append((surface, pos))
        if stem != surface:
            out.append((stem, pos))
    return out


# ---------------------------------------------------------------------------
# ElisionFilter (lucene/analysis/common/.../util/ElisionFilter.java ≈L30)
# with FrenchAnalyzer.DEFAULT_ARTICLES (.../fr/FrenchAnalyzer.java ≈L60):
# strip a leading "article + apostrophe" contraction ("l'avion" ->
# "avion"); case-insensitive on the article, both ASCII ' and U+2019.
# ---------------------------------------------------------------------------

FRENCH_ELISION_ARTICLES = (
    "l", "m", "t", "qu", "n", "s", "j", "d", "c",
    "jusqu", "quoiqu", "lorsqu", "puisqu",
)


def elision_filter(token: str, articles=FRENCH_ELISION_ARTICLES) -> str:
    for apos in ("'", "’"):
        i = token.find(apos)
        if i > 0 and token[:i].lower() in articles:
            return token[i + 1 :]
    return token
