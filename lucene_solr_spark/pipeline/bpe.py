"""Byte-pair-encoding tokenizer: distributed train + encode.

The tokenization stage of an LLM training-data pipeline (the step right
after quality filtering / dedup in this package). Algorithm is classic
word-level BPE (Sennrich, Haddow & Birch 2016, "Neural Machine
Translation of Rare Words with Subword Units", ACL): words are symbol
sequences ending in an end-of-word marker; training repeatedly merges
the most frequent adjacent symbol pair; encoding replays the merge table
in rank order.

Scale shape (the part that must survive 100 TB):

  * Training never iterates over the corpus. One map (regex
    pre-tokenize) + one map-side-combined ``groupBy(word).count()``
    reduces 10^12 documents to a word-frequency table bounded by the
    VOCABULARY, not the corpus (few million rows at web scale; capped
    here by ``max_words`` highest-count words, deterministic tie-break).
    The merge loop then runs driver-side over that table — exactly how
    reference BPE trainers work (Sennrich's learn_bpe.py and HuggingFace
    tokenizers both train on a word->count dict).
  * Encoding is a zero-shuffle narrow map: the merge table broadcasts
    (``vocab_size`` entries), and the Arrow-batched UDF memoizes
    word->pieces per batch, so cost scales with DISTINCT words per
    batch, not tokens (Zipf: a few thousand entries cover ~90% of
    running text).

Not ANSI-SQL-expressible (the merge loop is iterative, encoding replays
an ordered merge table), so the driver entries are rows-only; the
algorithm itself is pinned in tests/test_bpe.py by (a) the worked
example from the paper, (b) a naive O(V^2)-per-merge reference
implementation compared on randomized corpora, (c) the lossless
round-trip property concat(pieces) == word + marker, and (d) train ==
retrain determinism.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Pre-tokenizer: the repo's 'simple' profile (analysis.SIMPLE_TOKEN_RE on
# lowercased text) so BPE sits on the same word stream as the rest of the
# pipeline tier. End-of-word marker per Sennrich et al.
WORD_RE = re.compile(r"[a-z0-9]+")
EOW = "</w>"


def word_counts(
    docs: DataFrame, text_col: str = "text", max_words: int = 100_000
) -> DataFrame:
    """(word, count) over the corpus, capped to the ``max_words`` most
    frequent (count desc, then word asc — deterministic). The one
    corpus-wide aggregation of training; map-side combined, result is
    vocabulary-sized."""
    words = docs.select(
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)")
        ).alias("word")
    )
    return (
        words.groupBy("word")
        .agg(F.count("*").alias("count"))
        .orderBy(F.col("count").desc(), F.col("word").asc())
        .limit(max_words)
    )


def _pair_counts(vocab: dict[tuple[str, ...], int]) -> dict[tuple[str, str], int]:
    counts: dict[tuple[str, str], int] = {}
    for syms, c in vocab.items():
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            counts[p] = counts.get(p, 0) + c
    return counts


def _merge_word(
    syms: tuple[str, ...], pair: tuple[str, str], joined: str
) -> tuple[str, ...]:
    """Replace every non-overlapping left-to-right occurrence of ``pair``."""
    out: list[str] = []
    i = 0
    n = len(syms)
    while i < n:
        if i < n - 1 and syms[i] == pair[0] and syms[i + 1] == pair[1]:
            out.append(joined)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def learn_bpe(
    wc: list[tuple[str, int]], num_merges: int, min_pair_count: int = 2
) -> list[tuple[str, str]]:
    """Driver-side merge loop over a (word, count) table.

    Deterministic: highest pair count wins, ties break on the
    lexicographically smallest (left, right). Stops early when the best
    pair drops below ``min_pair_count`` (merging singletons memorizes
    noise). Incremental: after a merge only words containing it can
    change, so pair counts are patched per affected word instead of
    recounted — O(affected) per merge, the same optimization as
    Sennrich's reference trainer."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, c in wc:
        syms = tuple(w) + (EOW,)
        vocab[syms] = vocab.get(syms, 0) + c
    pairs = _pair_counts(vocab)
    # which words contain a given pair (rebuilt lazily per merge)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < min_pair_count:
            break
        merges.append(best)
        joined = best[0] + best[1]
        changed = [
            (syms, c)
            for syms, c in vocab.items()
            if any(
                syms[i] == best[0] and syms[i + 1] == best[1]
                for i in range(len(syms) - 1)
            )
        ]
        for syms, c in changed:
            del vocab[syms]
            # retract old pair counts for this word
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] -= c
                if pairs[p] <= 0:
                    del pairs[p]
            new = _merge_word(syms, best, joined)
            vocab[new] = vocab.get(new, 0) + c
            for i in range(len(new) - 1):
                p = (new[i], new[i + 1])
                pairs[p] = pairs.get(p, 0) + c
    return merges


def train_bpe(
    docs: DataFrame,
    text_col: str = "text",
    num_merges: int = 200,
    max_words: int = 100_000,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Distributed word counting + driver-side merge learning.

    The vocab collect is capped at ``max_words``; per the "no silent
    caps" rule the full (vocab-sized, map-side-combined) aggregate is
    persisted once so the same pass yields both the top-``max_words``
    rows and the count of distinct words the cap dropped
    (``metrics.CAP_METRICS['train_bpe.vocab']``)."""
    from pyspark import StorageLevel

    from .metrics import record_cap

    words = docs.select(
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)")
        ).alias("word")
    )
    wc_all = (
        words.groupBy("word")
        .agg(F.count("*").alias("count"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    try:
        n_vocab = wc_all.count()
        top = (
            wc_all.orderBy(F.col("count").desc(), F.col("word").asc())
            .limit(max_words)
            .collect()
        )
    finally:
        wc_all.unpersist()
    record_cap(
        "train_bpe.vocab", kept=len(top),
        dropped=max(0, n_vocab - len(top)), max_words=max_words,
    )
    wc = [(r["word"], r["count"]) for r in top]
    return learn_bpe(wc, num_merges, min_pair_count)


def merges_df(spark, merges: list[tuple[str, str]]) -> DataFrame:
    """Merge table as a DataFrame: (rank, left, right, merged)."""
    rows = [
        (i, left, right, left + right)
        for i, (left, right) in enumerate(merges)
    ]
    return spark.createDataFrame(rows, "rank int, left string, right string, merged string")


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Replay merges on one word, always applying the LOWEST-rank pair
    present first — the standard BPE encode (greedy by train order, not
    by position), identical to GPT-2's bpe() loop."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_rank = None
        best_pair = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_pair = (syms[i], syms[i + 1])
        if best_pair is None:
            break
        syms = list(_merge_word(tuple(syms), best_pair, best_pair[0] + best_pair[1]))
    return syms


def encode_bpe(
    docs: DataFrame, merges: list[tuple[str, str]], text_col: str = "text"
) -> DataFrame:
    """Per-doc BPE pieces: (doc_id, n_words, n_pieces, pieces array).

    Zero-shuffle narrow map. The merge table rides the closure (broadcast
    by Spark's task serializer — vocab_size entries); per-batch word
    memoization makes cost ~distinct-words, not tokens."""
    import pandas as pd

    ranks = {pair: i for i, pair in enumerate(merges)}
    out_schema = (
        "doc_id long, n_words int, n_pieces int, pieces array<string>"
    )

    def run(batches):
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            ids, n_words, n_pieces, pieces_col = [], [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                words = WORD_RE.findall(str(text).lower())
                pieces: list[str] = []
                for w in words:
                    p = cache.get(w)
                    if p is None:
                        p = encode_word(w, ranks)
                        cache[w] = p
                    pieces.extend(p)
                ids.append(doc_id)
                n_words.append(len(words))
                n_pieces.append(len(pieces))
                pieces_col.append(pieces)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_words": n_words,
                    "n_pieces": n_pieces,
                    "pieces": pieces_col,
                }
            )

    return docs.select("doc_id", text_col).mapInPandas(run, out_schema)
