"""BPE trainer/encoder: paper example, naive-reference differential,
round-trip + determinism properties, and the distributed plumbing."""

from __future__ import annotations

import random

import pytest

from lucene_solr_spark.pipeline.bpe import (
    EOW,
    WORD_RE,
    encode_bpe,
    encode_word,
    learn_bpe,
    merges_df,
    train_bpe,
    word_counts,
)


# ---------------------------------------------------------------------------
# naive reference: recount ALL pairs from scratch each merge (obviously
# correct, O(V^2)); the engine's incremental patching must match exactly
# ---------------------------------------------------------------------------
def _naive_learn(wc, num_merges, min_pair_count=2):
    vocab = {}
    for w, c in wc:
        syms = tuple(w) + (EOW,)
        vocab[syms] = vocab.get(syms, 0) + c
    merges = []
    for _ in range(num_merges):
        pairs = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < min_pair_count:
            break
        merges.append(best)
        joined = best[0] + best[1]
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i < len(syms) - 1
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + c
        vocab = new_vocab
    return merges


def test_sennrich_worked_example():
    """Fig. 1 of Sennrich et al. 2016 (adapted to our EOW-last layout):
    {low:5, lower:2, newest:6, widest:3} — the most frequent pair is
    ('e','s') with count 9, then ('es','t') 9, then ('est','</w>') 9."""
    wc = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = learn_bpe(wc, num_merges=3, min_pair_count=1)
    assert merges == [("e", "s"), ("es", "t"), ("est", EOW)]


def test_matches_naive_reference_randomized():
    rng = random.Random(42)
    alphabet = "abcde"
    for trial in range(8):
        words = {}
        for _ in range(rng.randint(5, 30)):
            w = "".join(
                rng.choice(alphabet) for _ in range(rng.randint(1, 8))
            )
            words[w] = rng.randint(1, 20)
        wc = sorted(words.items())
        fast = learn_bpe(wc, num_merges=25, min_pair_count=2)
        slow = _naive_learn(wc, num_merges=25, min_pair_count=2)
        assert fast == slow, f"trial {trial}: {fast} != {slow}"


def test_encode_round_trip_and_rank_priority():
    wc = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = learn_bpe(wc, num_merges=10, min_pair_count=1)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ["low", "lower", "newest", "widest", "lowest", "news", "zzz"]:
        pieces = encode_word(w, ranks)
        # lossless: concatenation restores word + end marker
        assert "".join(pieces) == w + EOW
    # a training word with enough merges collapses to one piece
    assert encode_word("newest", ranks) == ["newest" + EOW]


def test_min_pair_count_stops_merging_singletons():
    wc = [("ab", 1), ("cd", 1)]
    assert learn_bpe(wc, num_merges=10, min_pair_count=2) == []


def test_train_is_deterministic_under_input_order():
    wc = [("low", 5), ("newest", 6), ("widest", 3), ("lower", 2)]
    m1 = learn_bpe(wc, 8, 1)
    m2 = learn_bpe(list(reversed(wc)), 8, 1)
    assert m1 == m2


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_word_counts_matches_python(spark, docs):
    got = {r["word"]: r["count"] for r in word_counts(docs).collect()}
    want: dict[str, int] = {}
    for r in docs.select("text").collect():
        for w in WORD_RE.findall(str(r["text"]).lower()):
            want[w] = want.get(w, 0) + 1
    assert got == want


def test_distributed_encode_matches_local(spark, docs):
    merges = train_bpe(docs, num_merges=50)
    assert merges  # corpus big enough to learn something
    ranks = {p: i for i, p in enumerate(merges)}
    enc = {
        r["doc_id"]: (r["n_words"], r["n_pieces"], r["pieces"])
        for r in encode_bpe(docs, merges).collect()
    }
    for r in docs.select("doc_id", "text").collect():
        words = WORD_RE.findall(str(r["text"]).lower())
        pieces = [p for w in words for p in encode_word(w, ranks)]
        n_words, n_pieces, got = enc[r["doc_id"]]
        assert n_words == len(words)
        assert n_pieces == len(pieces)
        assert list(got) == pieces
    # merges table round-trips through a DataFrame in rank order
    mdf = merges_df(spark, merges).orderBy("rank").collect()
    assert [(m["left"], m["right"]) for m in mdf] == merges


def test_compression_property(spark, docs):
    """More merges never increase the piece count of any document."""
    m_small = train_bpe(docs, num_merges=10)
    m_big = train_bpe(docs, num_merges=100)
    small = {
        r["doc_id"]: r["n_pieces"] for r in encode_bpe(docs, m_small).collect()
    }
    big = {
        r["doc_id"]: r["n_pieces"] for r in encode_bpe(docs, m_big).collect()
    }
    assert set(small) == set(big)
    assert all(big[d] <= small[d] for d in small)
