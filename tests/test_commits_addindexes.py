"""Commit-point history (SnapshotDeletionPolicy / point-in-time reads) and
IndexWriter.addIndexes bulk import (segments.py)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def tiny_pages(tmp_path_factory):
    from lucene_solr_spark.fixtures import write_pages

    out = str(tmp_path_factory.mktemp("tp") / "pages.parquet")
    write_pages(0.0005, out)
    return out


def _top10(index, terms):
    from lucene_solr_spark.query import Boolean, Term
    from lucene_solr_spark.search import Searcher

    s = Searcher(index)
    q = Boolean(should=[Term(t) for t in terms])
    rows = [(round(r["score"], 6), r["url"]) for r in s.search(q, 20).collect()]
    return sorted(rows, key=lambda t: (-t[0], t[1]))[:10]


def test_commit_history_time_travel_and_expunge(spark, tiny_pages, tmp_path_factory):
    from lucene_solr_spark.merge import compact
    from lucene_solr_spark.segments import (
        build_segmented,
        expunge_commits,
        list_commits,
        read_manifest,
        read_segmented,
    )

    out = str(tmp_path_factory.mktemp("tt") / "idx")
    pages = spark.read.parquet(tiny_pages)
    build_segmented(spark, pages, out, profile="simple", n_units=4,
                    num_buckets=4)
    gen0 = read_manifest(out)["generation"]
    segs0 = {r["seg"] for r in read_manifest(out)["segments"].values()}
    assert len(segs0) == 4

    # commit log exists and is monotone
    commits = list_commits(out)
    assert [c["generation"] for c in commits] == sorted(
        c["generation"] for c in commits
    )
    assert commits[-1]["generation"] == gen0

    # compact everything into one segment; old dirs must SURVIVE because
    # retained commits still reference them
    merged = compact(spark, out, segs_per_tier=2, max_merge_at_once=4)
    assert merged
    for seg in segs0:
        assert os.path.isdir(os.path.join(out, seg)), seg

    # point-in-time read at the pre-merge commit == current read
    old = read_segmented(spark, out, generation=gen0)
    cur = read_segmented(spark, out)
    assert old["stats"]["doc_count"] == cur["stats"]["doc_count"]
    assert _top10(old, ["search", "engine"]) == _top10(cur, ["search", "engine"])

    # expunge: prune history to the live commit, GC released dirs
    dropped = expunge_commits(out, keep=1)
    assert set(dropped) == segs0
    for seg in segs0:
        assert not os.path.isdir(os.path.join(out, seg))
    with pytest.raises(FileNotFoundError):
        read_segmented(spark, out, generation=gen0)
    # current read still fine
    assert read_segmented(spark, out)["stats"]["doc_count"] == \
        cur["stats"]["doc_count"]


def test_add_indexes_matches_monolithic(spark, tiny_pages, tmp_path_factory):
    from lucene_solr_spark.indexer import build_index, read_index
    from lucene_solr_spark.segments import (
        add_indexes,
        build_segmented,
        read_manifest,
        read_segmented,
    )

    root = tmp_path_factory.mktemp("ai")
    pages = spark.read.parquet(tiny_pages)
    half = F.pmod(F.xxhash64("url"), F.lit(2))
    a_pages, b_pages = pages.filter(half == 0), pages.filter(half == 1)

    dst = str(root / "dst")
    src = str(root / "src")
    build_segmented(spark, a_pages, dst, profile="simple", n_units=2,
                    num_buckets=4)
    build_segmented(spark, b_pages, src, profile="simple", n_units=2,
                    num_buckets=4)
    na = read_segmented(spark, dst)["stats"]["doc_count"]
    nb = read_segmented(spark, src)["stats"]["doc_count"]

    add_indexes(spark, dst, src)
    combined = read_segmented(spark, dst)
    assert combined["stats"]["doc_count"] == na + nb

    # ids stay collision-free after the rebase
    ids = combined["docmeta"].select("doc_id")
    assert ids.distinct().count() == ids.count() == na + nb

    # results identical to a monolithic index over the full corpus
    # (score/url comparison — doc ids legitimately differ across layouts)
    mono_dir = str(root / "mono")
    build_index(spark, pages, mono_dir, profile="simple", num_buckets=4)
    mono = read_index(spark, mono_dir)
    for terms in (["search"], ["search", "engine"], ["the"]):
        assert _top10(combined, terms) == _top10(mono, terms)

    # re-running is a no-op (resume semantics)
    man_before = read_manifest(dst)
    add_indexes(spark, dst, src)
    assert read_manifest(dst)["segments"].keys() == man_before["segments"].keys()
    assert read_segmented(spark, dst)["stats"]["doc_count"] == na + nb


def test_add_indexes_rejects_incompatible(spark, tiny_pages, tmp_path_factory):
    from lucene_solr_spark.segments import add_indexes, build_segmented

    root = tmp_path_factory.mktemp("aibad")
    pages = spark.read.parquet(tiny_pages).limit(50)
    d1 = str(root / "d1")
    d2 = str(root / "d2")
    build_segmented(spark, pages, d1, profile="simple", n_units=1,
                    num_buckets=4)
    build_segmented(spark, pages, d2, profile="simple", n_units=1,
                    num_buckets=8)
    with pytest.raises(ValueError):
        add_indexes(spark, d1, d2)
