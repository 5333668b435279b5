"""Porter stemmer — from-scratch Python port of Martin Porter's 1980
"An algorithm for suffix stripping", in the exact variant the reference ships.

Reference parity: lucene/analysis/common/src/java/org/apache/lucene/analysis/
en/PorterStemmer.java (≈L60, ~540 LoC) — which is the canonical ANSI-C
``porter.c`` translated to Java, INCLUDING its two marked DEPARTUREs from the
published paper text:

  * step 2: ``bli -> ble``   (paper: ``abli -> able``)
  * step 2: ``logi -> log``  (not in the paper)

Words of length <= 2 are returned unchanged (PorterStemmer#stem:
``if (k > k0+1)`` guard).  Only ASCII lowercase input is expected (the
analysis chain lowercases first).
"""

from __future__ import annotations

_VOWELS = frozenset("aeiou")


def _is_cons(word: str, i: int) -> bool:
    c = word[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return True if i == 0 else not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """m in [C](VC){m}[V] computed over `stem`."""
    n = len(stem)
    i = 0
    # skip initial consonants
    while i < n and _is_cons(stem, i):
        i += 1
    m = 0
    while True:
        # skip vowels
        while i < n and not _is_cons(stem, i):
            i += 1
        if i >= n:
            return m
        # skip consonants
        while i < n and _is_cons(stem, i):
            i += 1
        m += 1
        if i >= n:
            return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_cons(word, len(word) - 1)
    )


def _ends_cvc(word: str) -> bool:
    """*o: stem ends consonant-vowel-consonant and final consonant not w,x,y."""
    if len(word) < 3:
        return False
    n = len(word)
    return (
        _is_cons(word, n - 1)
        and not _is_cons(word, n - 2)
        and _is_cons(word, n - 3)
        and word[-1] not in "wxy"
    )


def _step1(word: str) -> str:
    # step 1a
    if word.endswith("s"):
        if word.endswith("sses"):
            word = word[:-2]
        elif word.endswith("ies"):
            word = word[:-2]
        elif not word.endswith("ss"):
            word = word[:-1]
    # step 1b
    if word.endswith("eed"):
        if _measure(word[:-3]) > 0:
            word = word[:-1]
    else:
        stripped = None
        if word.endswith("ed") and _has_vowel(word[:-2]):
            stripped = word[:-2]
        elif word.endswith("ing") and _has_vowel(word[:-3]):
            stripped = word[:-3]
        if stripped is not None:
            word = stripped
            if word.endswith(("at", "bl", "iz")):
                word = word + "e"
            elif _ends_double_cons(word) and word[-1] not in "lsz":
                word = word[:-1]
            elif _measure(word) == 1 and _ends_cvc(word):
                word = word + "e"
    # step 1c
    if word.endswith("y") and _has_vowel(word[:-1]):
        word = word[:-1] + "i"
    return word


# (suffix, replacement, min_measure_exclusive) applied on the stem before the
# suffix; first match by the switch-on-penultimate-letter structure of the
# reference, reproduced as ordered lists per key letter.
_STEP2 = {
    "a": [("ational", "ate"), ("tional", "tion")],
    "c": [("enci", "ence"), ("anci", "ance")],
    "e": [("izer", "ize")],
    "l": [  # 'bli'->'ble' is the reference's DEPARTURE
        ("bli", "ble"),
        ("alli", "al"),
        ("entli", "ent"),
        ("eli", "e"),
        ("ousli", "ous"),
    ],
    "o": [("ization", "ize"), ("ation", "ate"), ("ator", "ate")],
    "s": [
        ("alism", "al"),
        ("iveness", "ive"),
        ("fulness", "ful"),
        ("ousness", "ous"),
    ],
    "t": [("aliti", "al"), ("iviti", "ive"), ("biliti", "ble")],
    "g": [("logi", "log")],  # DEPARTURE
}

_STEP3 = {
    "e": [("icate", "ic"), ("ative", ""), ("alize", "al")],
    "i": [("iciti", "ic")],
    "l": [("ical", "ic"), ("ful", "")],
    "s": [("ness", "")],
}

_STEP4 = {
    "a": ["al"],
    "c": ["ance", "ence"],
    "e": ["er"],
    "i": ["ic"],
    "l": ["able", "ible"],
    "n": ["ant", "ement", "ment", "ent"],
    "o": ["ion", "ou"],  # 'ion' needs preceding s or t
    "s": ["ism"],
    "t": ["ate", "iti"],
    "u": ["ous"],
    "v": ["ive"],
    "z": ["ize"],
}


def _apply_map(word: str, rules: dict, min_m: int, key_idx: int = -2) -> str:
    """Reference's switch-on-letter structure: step 2 and 4 switch on the
    penultimate letter, step 3 on the FINAL letter (porter.c / Lucene
    PorterStemmer step3/step4/step5)."""
    if len(word) < 2:
        return word
    key = word[key_idx]
    for suffix, repl in rules.get(key, ()):
        if word.endswith(suffix):
            stem = word[: -len(suffix)]
            if _measure(stem) > min_m:
                return stem + repl
            return word  # reference breaks out of the switch on suffix match
    return word


def _step4(word: str) -> str:
    if len(word) < 2:
        return word
    key = word[-2]
    for suffix in _STEP4.get(key, ()):
        if word.endswith(suffix):
            stem = word[: -len(suffix)]
            if suffix == "ion" and not (stem.endswith("s") or stem.endswith("t")):
                return word
            if _measure(stem) > 1:
                return stem
            return word
    return word


def _step5(word: str) -> str:
    # step 5a
    if word.endswith("e"):
        m = _measure(word[:-1])
        if m > 1 or (m == 1 and not _ends_cvc(word[:-1])):
            word = word[:-1]
    # step 5b
    if word.endswith("ll") and _measure(word) > 1:
        word = word[:-1]
    return word


def porter_stem(word: str) -> str:
    """Stem one lowercase word per the classic Porter algorithm."""
    if len(word) <= 2:
        return word
    word = _step1(word)
    word = _apply_map(word, _STEP2, 0, key_idx=-2)
    word = _apply_map(word, _STEP3, 0, key_idx=-1)
    word = _step4(word)
    word = _step5(word)
    return word


def stem_many(words) -> list[str]:
    """Stem an iterable of words with memoization over unique tokens —
    the vectorization trick used by the analysis chain (zipf vocab means
    uniques ≪ tokens)."""
    cache: dict[str, str] = {}
    out = []
    for w in words:
        s = cache.get(w)
        if s is None:
            s = porter_stem(w)
            cache[w] = s
        out.append(s)
    return out
