"""Sharded serving (ShardedServing): exact global stats make the merged
per-shard ranking RANK-IDENTICAL to one monolithic index over the union
corpus — the ExactStatsCache + TopDocs.merge claim, end to end."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.query import Boolean, Phrase, Prefix, Synonym, Term


@pytest.fixture(scope="module")
def sharded(spark, pages_small, tmp_path_factory):
    from lucene_solr_spark.indexer import build_index, read_index
    from lucene_solr_spark.search import Searcher
    from lucene_solr_spark.serve import ShardedServing

    base = tmp_path_factory.mktemp("sharded")
    pages = spark.read.parquet(pages_small)
    # monolithic truth index
    mono_dir = str(base / "mono")
    build_index(spark, pages, mono_dir, profile="en", num_buckets=4)
    mono = Searcher(read_index(spark, mono_dir))
    # two shards split by url hash (the document-routing rule)
    dirs = []
    for i in range(2):
        d = str(base / f"shard{i}")
        build_index(
            spark,
            pages.filter(F.pmod(F.xxhash64("url"), F.lit(2)) == i),
            d,
            profile="en",
            num_buckets=4,
        )
        dirs.append(d)
    return mono, ShardedServing(dirs)


QUERIES = [
    Term("search"),
    Boolean(must=[Term("search"), Term("engin")]),
    Boolean(should=[Term("search"), Term("engin"), Term("web")]),
    Boolean(must=[Term("search")], must_not=[Term("web")]),
    Synonym(terms=("search", "lookup")),
    Phrase(("search", "engin")),
    Prefix("w00"),
    "search engine",
]


@pytest.mark.parametrize(
    "q", QUERIES, ids=lambda q: type(q).__name__ + str(abs(hash(repr(q))) % 10**6)
)
def test_sharded_rank_identical_to_monolithic(sharded, q):
    mono, cluster = sharded
    want = [
        (r["url"], r["score"])
        for r in mono.search(q, 10, with_fields=True).collect()
    ]
    got = cluster.search(q, 10)
    assert [u for u, _ in got] == [u for u, _ in want], (q, want, got)
    for (_, sw), (_, sg) in zip(want, got):
        assert sg == pytest.approx(sw, rel=1e-9), q


def test_sharded_count_matches(sharded):
    mono, cluster = sharded
    for q in [Term("search"), Prefix("w00")]:
        assert cluster.count(q) == mono.count(q)


def test_local_stats_would_diverge(sharded):
    """Negative control: WITHOUT the global-stats push the shards score
    with local df/N and at least the scores differ — proving the
    ExactStatsCache step is doing real work."""
    mono, cluster = sharded
    s0 = cluster.shards[0]
    q = Term("search")
    ids_g, scores_g = s0._eval(q)
    # revert shard 0 to local stats
    n, a, o = s0.score_n_docs, s0.score_avgdl, s0._df_override
    try:
        s0.score_n_docs, s0.score_avgdl, s0._df_override = (
            s0.n_docs, s0.avgdl, None,
        )
        ids_l, scores_l = s0._eval(q)
    finally:
        s0.score_n_docs, s0.score_avgdl, s0._df_override = n, a, o
    assert list(ids_g) == list(ids_l)
    assert max(abs(scores_g - scores_l)) > 1e-6
