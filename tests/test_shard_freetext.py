"""pack_shards (token-budget training-shard packing) and
free_text_suggest (stupid-backoff n-gram completion)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.operators.search_features import free_text_suggest
from lucene_solr_spark.pipeline.sampling import pack_shards


def test_pack_shards_matches_serial_greedy(spark):
    rows = [(i, (i * 37) % 90 + 10) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = {
        r["doc_id"]: r["shard"]
        for r in pack_shards(df, "w", 250.0, partitions=7).collect()
    }
    cum, want = 0, {}
    for i, w in rows:
        want[i] = cum // 250
        cum += w
    assert got == want


def test_pack_shards_partition_invariant(spark):
    rows = [(i, 60) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    a = {r["doc_id"]: r["shard"] for r in pack_shards(df, "w", 100.0, partitions=2).collect()}
    b = {r["doc_id"]: r["shard"] for r in pack_shards(df, "w", 100.0, partitions=13).collect()}
    assert a == b
    # 60+60 > 100 -> one doc per shard here? no: floor(exclusive/100):
    # doc0 cum0 -> shard 0, doc1 cum60 -> shard 0, doc2 cum120 -> shard 1
    assert a[0] == 0 and a[1] == 0 and a[2] == 1


def test_oversized_doc_gets_own_shards(spark):
    df = spark.createDataFrame(
        [(1, 50), (2, 500), (3, 50)], "doc_id long, w long"
    )
    got = {r["doc_id"]: r["shard"] for r in pack_shards(df, "w", 100.0).collect()}
    assert got == {1: 0, 2: 0, 3: 5}  # doc3 starts at cum 550


@pytest.fixture(scope="module")
def ft_tokens(spark):
    texts = [
        (1, "hash join is a hash join"),
        (2, "hash join beats nested loop"),
        (3, "hash jump is rare"),
        (4, "jump jump jump jelly"),
    ]
    d = spark.createDataFrame(texts, "doc_id long, text string")
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "term")
    )


def test_free_text_bigram_beats_backoff(ft_tokens):
    got = [
        (r["term"], r["score"])
        for r in free_text_suggest(ft_tokens, "hash j", k=5).collect()
    ]
    terms = [t for t, _ in got]
    # 'join' follows 'hash' 3/4 times, 'jump' 1/4; both bigram-scored.
    assert terms[0] == "join" and terms[1] == "jump"
    s = dict(got)
    assert s["join"] == pytest.approx(0.75)
    assert s["jump"] == pytest.approx(0.25)
    # 'jelly' never follows 'hash' -> unigram backoff 0.4 * c1/T
    total = ft_tokens.count()
    assert s["jelly"] == pytest.approx(round(0.4 * 1 / total, 6))


def test_free_text_no_context_unigram(ft_tokens):
    got = {
        r["term"]: r["score"]
        for r in free_text_suggest(ft_tokens, "j", k=5).collect()
    }
    total = ft_tokens.count()
    assert got["jump"] == pytest.approx(round(4 / total, 6))


def test_free_text_trailing_space_full_context(ft_tokens):
    """'hash ' = complete token context, empty prefix: all successors."""
    got = [r["term"] for r in free_text_suggest(ft_tokens, "hash ", k=3).collect()]
    assert got[0] == "join"
