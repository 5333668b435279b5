"""Randomized property tests (hypothesis) — the reference's signature test
technique (LuceneTestCase random-seed invariants, SURVEY.md §6.1): every
failure shrinks to a minimal counterexample and replays deterministically.

Pure-python/numpy properties only (no SparkSession — fast)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


# ---------------------------------------------------------------------------
# codec: varint/delta round-trips for arbitrary uint64 inputs
# ---------------------------------------------------------------------------

@given(
    st.lists(st.integers(min_value=0, max_value=(1 << 62) - 1), max_size=300)
)
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip_property(values):
    from lucene_solr_spark.codec import varint_decode, varint_encode

    arr = np.array(values, dtype=np.uint64)
    dec, off = varint_decode(varint_encode(arr))
    enc = varint_encode(arr)
    assert off == len(enc)
    assert np.array_equal(dec, arr)


@given(
    st.lists(
        st.integers(min_value=0, max_value=(1 << 40) - 1),
        min_size=1,
        max_size=200,
        unique=True,
    ),
    st.lists(st.integers(min_value=1, max_value=10_000), min_size=1, max_size=200),
)
@settings(max_examples=100, deadline=None)
def test_postings_block_roundtrip_property(doc_ids, tfs):
    from lucene_solr_spark.codec import (
        pack_postings_block,
        unpack_postings_block,
    )

    n = min(len(doc_ids), len(tfs))
    docs = np.sort(np.array(doc_ids[:n], dtype=np.int64))
    tf = np.array(tfs[:n], dtype=np.int64)
    db, tb = pack_postings_block(docs, tf)
    d2, t2 = unpack_postings_block(db, tb)
    assert np.array_equal(d2, docs)
    assert np.array_equal(t2, tf)


# ---------------------------------------------------------------------------
# SmallFloat norms: monotonic, idempotent, exact below 40
# ---------------------------------------------------------------------------

@given(st.integers(min_value=0, max_value=2**31 - 1))
@settings(max_examples=300, deadline=None)
def test_smallfloat_properties(n):
    from lucene_solr_spark.norms import byte4_to_int, int_to_byte4

    b = int(int_to_byte4(np.array([n]))[0])
    assert 0 <= b <= 255
    dec = int(byte4_to_int(np.array([b]))[0])
    # decoded value never exceeds the input and re-encodes to the same byte
    assert dec <= n
    assert int(int_to_byte4(np.array([dec]))[0]) == b
    if n <= 40:
        assert dec == n  # exact range (SmallFloat free values + 3-bit mantissa)


@given(st.integers(min_value=0, max_value=2**20), st.integers(min_value=0, max_value=2**20))
@settings(max_examples=200, deadline=None)
def test_smallfloat_monotonic(a, b):
    from lucene_solr_spark.norms import int_to_byte4

    lo, hi = sorted((a, b))
    ea = int(int_to_byte4(np.array([lo]))[0])
    eb = int(int_to_byte4(np.array([hi]))[0])
    assert ea <= eb


# ---------------------------------------------------------------------------
# BM25: monotonic in tf, anti-monotonic in dl, non-negative, finite
# (BaseSimilarityTestCase#testRandomScoring invariants)
# ---------------------------------------------------------------------------

@given(
    st.integers(min_value=1, max_value=1000),   # tf
    st.integers(min_value=1, max_value=5000),   # dl
    st.integers(min_value=1, max_value=10**6),  # df
    st.integers(min_value=1, max_value=10**6),  # N
)
@settings(max_examples=300, deadline=None)
def test_bm25_invariants(tf, dl, df, n):
    import math

    df = min(df, n)
    avgdl = 250.0
    k1, b = 1.2, 0.75

    def score(tf_, dl_):
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        norm = k1 * (1 - b + b * dl_ / avgdl)
        return idf * tf_ / (tf_ + norm)

    s = score(tf, dl)
    assert math.isfinite(s) and s >= 0
    assert score(tf + 1, dl) >= s        # monotonic in tf
    assert score(tf, dl + 1) <= s + 1e-12  # anti-monotonic in dl


# ---------------------------------------------------------------------------
# analyzer: flat path == per-row path for arbitrary printable text
# ---------------------------------------------------------------------------

@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                whitelist_categories=("Lu", "Ll", "Nd", "Po", "Zs"),
                max_codepoint=0x2FFF,
            ),
            max_size=200,
        ),
        max_size=20,
    )
)
@settings(max_examples=60, deadline=None)
def test_analyze_flat_property(texts):
    from lucene_solr_spark.analysis import analyze, analyze_flat

    row_idx, terms, pos, field_len = analyze_flat(texts, "en")
    per_row: dict[int, list] = {}
    for r, t, p in zip(row_idx, terms, pos):
        per_row.setdefault(int(r), []).append((t, int(p)))
    for i, txt in enumerate(texts):
        expect = analyze(txt, "en")
        assert per_row.get(i, []) == expect
        assert field_len[i] == len(expect)


# ---------------------------------------------------------------------------
# xxhash64: pure-python == reference vectors property (self-consistency:
# prefix-freedom — distinct strings hash distinctly in sample space)
# ---------------------------------------------------------------------------

@given(st.binary(max_size=200), st.binary(max_size=200))
@settings(max_examples=200, deadline=None)
def test_xxhash_deterministic_and_spreads(a, b):
    from lucene_solr_spark.xxhash import xxhash64

    assert xxhash64(a) == xxhash64(a)
    if a != b:
        # not a guarantee, but collision in 2^64 under hypothesis sampling
        # indicates a broken implementation
        assert xxhash64(a) != xxhash64(b)
