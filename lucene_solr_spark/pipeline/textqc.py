"""Text analysis for training-data pipelines: language-ID heuristic, quality
scoring, token counting, document fingerprinting. All JVM-side expressions
(split/regexp/md5) — zero Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import ENGLISH_STOP_WORDS

_STOP_ARRAY = sorted(ENGLISH_STOP_WORDS)


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + regex word count + distinct terms per doc."""
    toks = F.split(F.col(text_col), r"\s+")
    words = F.expr(rf"regexp_extract_all({text_col}, '[a-z0-9]+', 0)")
    return df.select(
        "doc_id",
        F.size(toks).alias("ws_tokens"),
        F.size(words).alias("word_tokens"),
        F.size(F.array_distinct(words)).alias("distinct_terms"),
    )


def stopword_ratio(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Fraction of tokens that are English stopwords — the core signal of an
    n-gram language-ID heuristic."""
    toks = F.split(F.col(text_col), " ")
    stops = F.array(*[F.lit(w) for w in _STOP_ARRAY])
    n_stop = F.size(F.array_intersect(toks, stops))  # distinct-stopword count
    n_stop_total = F.size(
        F.filter(toks, lambda t: F.array_contains(stops, t))
    )
    return df.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        n_stop.alias("distinct_stopwords"),
        F.round(n_stop_total / F.size(toks), 4).alias("stop_ratio"),
    )


def lang_id_heuristic(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Language ID: stopword-density thresholding ('en' if dense enough).
    Real corpora: per-language character n-gram profiles via the same
    expression shape (score per language -> greatest())."""
    s = stopword_ratio(df, text_col)
    return s.select(
        "doc_id",
        "stop_ratio",
        F.when(F.col("stop_ratio") >= 0.03, "en").otherwise("other").alias(
            "pred_lang"
        ),
    )


# Per-language function-word profiles (high-frequency closed-class words —
# the standard cheap lang-ID signal; cf. the reference's per-language
# analyzer stopword sets under lucene/analysis/common). Kept short and
# distinctive on purpose: densities are compared ACROSS profiles, so a few
# very frequent words per language dominate the decision.
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was",
           "for", "with", "his", "they", "this", "have", "not"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "eine",
           "mit", "auf", "sich", "dem", "den", "von", "zu", "im"],
    "fr": ["le", "la", "les", "et", "des", "est", "une", "dans", "que",
           "pour", "qui", "pas", "sur", "au", "ce", "il"],
    "es": ["el", "la", "los", "las", "que", "y", "en", "un", "una",
           "es", "del", "se", "por", "con", "para", "no"],
}


def lang_id_multi(
    df: DataFrame, text_col: str = "text", min_density: float = 0.02
) -> DataFrame:
    """Multi-language ID: per-language function-word occurrence density,
    argmax across profiles, 'und' below `min_density`. Ties break by
    profile order (en > de > fr > es), stated in the contract so the SQL
    oracle can restate it. Pure array expressions over one lowercase
    tokenization — a narrow zero-shuffle map at any corpus size."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z]+"), lambda t: t != ""
    )
    d = df.select("doc_id", toks.alias("_t"))
    def _contains(arr):
        # single-arg lambda: a 2-arg lambda would be read as (element, index)
        return lambda t: F.array_contains(arr, t)

    counts = {}
    for lang, words in LANG_PROFILES.items():
        arr = F.array(*[F.lit(w) for w in words])
        counts[lang] = F.size(F.filter(F.col("_t"), _contains(arr)))
    n = F.size(F.col("_t"))
    best = F.greatest(*counts.values())
    pick = F.lit("und")
    for lang in reversed(list(LANG_PROFILES)):  # earlier profiles win ties
        pick = F.when(counts[lang] == best, lang).otherwise(pick)
    pick = F.when((n > 0) & (best / n >= F.lit(min_density)), pick).otherwise(
        F.lit("und")
    )
    return d.select(
        "doc_id",
        pick.alias("pred_lang"),
        F.when(n > 0, F.round(best / n, 4)).otherwise(F.lit(0.0)).alias(
            "top_density"
        ),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality scoring: length / mean word length / stopword ratio blended —
    Gopher-style filters as one select."""
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    mean_len = (F.length(F.col(text_col)) - (n - 1)) / n  # avg token length
    stops = F.array(*[F.lit(w) for w in _STOP_ARRAY])
    stop_r = F.size(F.filter(toks, lambda t: F.array_contains(stops, t))) / n
    score = (
        F.when(n < 8, 0.0)
        .when(mean_len < 2.0, 0.2)
        .otherwise(
            F.least(F.lit(1.0), n / F.lit(256.0)) * 0.6
            + F.least(F.lit(1.0), stop_r * 10) * 0.4
        )
    )
    return df.select(
        "doc_id",
        n.alias("n_tokens"),
        F.round(mean_len, 4).alias("mean_token_len"),
        F.round(stop_r, 4).alias("stop_ratio"),
        F.round(score, 4).alias("quality"),
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of the normalized (sorted distinct terms)
    content — robust to token order, the classic fingerprint dedup key."""
    words = F.array_sort(
        F.array_distinct(F.split(F.col(text_col), " "))
    )
    return df.select(
        "doc_id", F.md5(F.concat_ws(" ", words)).alias("fingerprint")
    )


def pii_redact(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII scrubbing pass (training-data hygiene): redact email addresses,
    international-ish phone numbers, and IPv4 addresses with typed
    placeholders; reports per-doc counts. Pure regexp_replace /
    regexp_count Column expressions (RE2-safe syntax, no backreferences)
    so the whole pass stays inside whole-stage codegen — at 100 TB this
    is a narrow map with zero shuffle."""
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone = r"\+?[0-9]{1,3}[-. ]?\(?[0-9]{2,4}\)?[-. ][0-9]{3,4}[-. ][0-9]{3,4}"
    ipv4 = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
    # Pass order matters: IPv4 BEFORE phones — the phone pattern's [-. ]
    # separators would otherwise swallow dotted IPs with 3-digit octets
    # (192.168.100.123 fully matches the phone regex) and mis-tag them.
    t = F.col(text_col)
    n_email = F.size(F.split(t, email)) - 1
    redacted = F.regexp_replace(t, email, "<EMAIL>")
    n_ip = F.size(F.split(redacted, ipv4)) - 1
    redacted2 = F.regexp_replace(redacted, ipv4, "<IP>")
    n_phone = F.size(F.split(redacted2, phone)) - 1
    return df.select(
        "doc_id",
        F.regexp_replace(redacted2, phone, "<PHONE>").alias("text"),
        n_email.cast("int").alias("n_emails"),
        n_phone.cast("int").alias("n_phones"),
        n_ip.cast("int").alias("n_ips"),
    )


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1 'repetition'
    family, restated over whitespace tokens): fraction of duplicate
    tokens (1 - distinct/total) and the fraction of all tokens covered by
    the single most frequent 2-gram. Narrow per-doc array expressions —
    no explode, no shuffle."""
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    dup_frac = F.lit(1.0) - F.size(F.array_distinct(toks)) / n
    # most frequent 2-gram count: aggregate(max over distinct grams of
    # that gram's occurrence count) — all inside one SQL expression
    grams_sql = (
        f"CASE WHEN size(split({text_col}, ' ')) >= 2 THEN "
        f"transform(sequence(1, size(split({text_col}, ' ')) - 1),"
        f" i -> concat_ws(' ', slice(split({text_col}, ' '), i, 2)))"
        f" ELSE array() END"
    )
    top2 = F.expr(
        f"aggregate(array_distinct({grams_sql}), 0, "
        f"(acc, g) -> greatest(acc, size(filter({grams_sql}, x -> x = g))))"
    )
    # Coverage is capped at 1.0: overlapping occurrences ('a a a' has two
    # 'a a' bigrams over three tokens) would otherwise double-count shared
    # tokens and push the fraction outside [0,1] (Gopher defines it as the
    # fraction of tokens covered, which can never exceed 1).
    top2_frac = F.when(
        n >= 2, F.least(F.lit(1.0), (top2 * 2) / n)
    ).otherwise(F.lit(0.0))
    return df.select(
        "doc_id",
        F.round(dup_frac, 4).alias("dup_token_frac"),
        F.round(top2_frac, 4).alias("top_bigram_frac"),
    )
