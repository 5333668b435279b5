"""Arrow-batched pandas UDFs wrapping the analysis/extraction kernels.

All UDFs are vectorized pandas UDFs (Arrow batch transfer); inside a batch we
use C-speed regex/numpy over pandas Series plus memoized per-token work — the
`input_hint` requirement (no per-row Python at the Spark level).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from .analysis import SIMPLE_TOKEN_RE, analyze
from .extract import html_strip
from .norms import int_to_byte4, quantized_length

TOKENS_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("term", T.StringType(), False),
            T.StructField("pos", T.IntegerType(), False),
        ]
    )
)


@pandas_udf(T.StringType())
def extract_text(html: pd.Series) -> pd.Series:
    return html.map(html_strip)


def make_analyze_udf(profile: str):
    """Returns a pandas UDF: text -> array<struct<term,pos>> for `profile`."""

    if profile == "simple":

        @pandas_udf(TOKENS_SCHEMA)
        def analyze_udf(text: pd.Series) -> pd.Series:
            # fully vectorized: lower + findall run in C
            found = text.str.lower().str.findall(SIMPLE_TOKEN_RE)
            return found.map(lambda toks: [(t, i) for i, t in enumerate(toks)])

        return analyze_udf

    @pandas_udf(TOKENS_SCHEMA)
    def analyze_udf(text: pd.Series) -> pd.Series:
        cache: dict = {}  # stem memo shared across the whole Arrow batch
        return text.map(lambda s: analyze(s, profile, cache))

    return analyze_udf


@pandas_udf(T.IntegerType())
def norm_byte_udf(field_len: pd.Series) -> pd.Series:
    return pd.Series(int_to_byte4(field_len.to_numpy()))


@pandas_udf(T.IntegerType())
def quantized_len_udf(field_len: pd.Series) -> pd.Series:
    return pd.Series(quantized_length(field_len.to_numpy()))


@pandas_udf(T.StringType())
def soundex_udf(term: pd.Series) -> pd.Series:
    """American Soundex code per term (phonetic matching); memoized over
    the batch's unique terms (vocab is Zipf — few unique per batch)."""
    from .analysis import soundex

    cache: dict = {}

    def enc(t):
        c = cache.get(t)
        if c is None:
            c = soundex(t if isinstance(t, str) else "")
            cache[t] = c
        return c

    return term.map(enc)


def simple_tokens_col(text_col):
    """JVM-only tokenization for the `simple` profile — stays inside
    whole-stage codegen (no Python at all). Equivalent to
    regexp_extract_all(lower(text), '[a-z0-9]+')."""
    return F.filter(
        F.split(F.lower(text_col), r"[^a-z0-9]+"), lambda x: x != F.lit("")
    )


@pandas_udf(T.StringType())
def metaphone_udf(term: pd.Series) -> pd.Series:
    """Metaphone code per term (PhoneticFilter's third encoder); memoized
    over the batch's unique terms like soundex_udf."""
    from .analysis import metaphone

    cache: dict = {}

    def enc(t):
        c = cache.get(t)
        if c is None:
            c = metaphone(t if isinstance(t, str) else "")
            cache[t] = c
        return c

    return term.map(enc)
