"""Delete-by-query / atomic-update / TTL lifecycle over the segmented index:
tombstones exclude docs at search time (Searcher AND WandSearcher), atomic
updates replace by url with fresh ids, merge physically reclaims tombstones
and recomputes df/ttf (expungeDeletes semantics)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def seg_index(spark, pages_small, tmp_path):
    from lucene_solr_spark.segments import build_segmented

    out = str(tmp_path / "segidx")
    pages = spark.read.parquet(pages_small).limit(300)
    build_segmented(spark, pages, out, profile="en", n_units=3)
    return out


def _hits(spark, out_dir, text="search engine", k=50):
    from lucene_solr_spark.search import Searcher
    from lucene_solr_spark.segments import read_segmented

    idx = read_segmented(spark, out_dir)
    s = Searcher(idx)
    return {
        r["doc_id"]: r["url"]
        for r in s.search(text, k=k).select("doc_id", "url").collect()
    }


def test_delete_by_query_excludes_from_search(spark, seg_index):
    from lucene_solr_spark.deletes import delete_by_query, read_deletes
    from lucene_solr_spark.query import parse

    before = _hits(spark, seg_index)
    assert before
    victim = sorted(before)[0]
    n = delete_by_query(spark, seg_index, parse("search engine"))
    assert n >= len(before)
    after = _hits(spark, seg_index)
    assert not after  # every match tombstoned
    assert victim not in _hits(spark, seg_index, "w000001", k=1000)
    d = read_deletes(spark, seg_index)
    assert d.count() == n
    # idempotent: re-deleting the same query adds nothing (matches are gone)
    assert delete_by_query(spark, seg_index, parse("search engine")) == 0


def test_wand_respects_tombstones(spark, seg_index):
    from lucene_solr_spark.deletes import delete_by_ids
    from lucene_solr_spark.segments import read_segmented
    from lucene_solr_spark.wand import WandSearcher

    idx = read_segmented(spark, seg_index)
    w = WandSearcher(idx)
    top = w.search(["search", "engin"], 5, "or").collect()
    assert top
    victims = [r["doc_id"] for r in top[:2]]
    delete_by_ids(spark, seg_index, victims)
    idx2 = read_segmented(spark, seg_index)
    assert idx2.get("deletes") is not None
    top2 = WandSearcher(idx2).search(["search", "engin"], 5, "or").collect()
    got = {r["doc_id"] for r in top2}
    assert not (got & set(victims))
    # survivors keep their exact scores and order
    keep = [(r["doc_id"], round(r["score"], 8)) for r in top[2:]]
    new = [(r["doc_id"], round(r["score"], 8)) for r in top2[: len(keep)]]
    assert new == keep


def test_atomic_update_replaces_by_url(spark, seg_index):
    from lucene_solr_spark.deletes import atomic_update
    from lucene_solr_spark.segments import read_segmented

    idx = read_segmented(spark, seg_index)
    row = idx["docmeta"].orderBy("doc_id").first()
    url = row["url"]
    updates = spark.createDataFrame(
        [(url, "en", "zzzfreshterm zzzfreshterm unique replacement text")],
        "url string, lang string, text string",
    )
    rec = atomic_update(spark, seg_index, updates)
    assert rec["n_docs"] == 1
    idx2 = read_segmented(spark, seg_index)
    live = idx2["docmeta"].filter(F.col("url") == url).collect()
    assert len(live) == 1  # exactly one live version
    assert live[0]["doc_id"] != row["doc_id"]  # fresh id, never recycled
    hits = _hits(spark, seg_index, "zzzfreshterm", k=5)
    assert set(hits.values()) == {url}


def test_merge_reclaims_tombstones(spark, seg_index):
    from lucene_solr_spark.deletes import delete_by_query, deletes_path
    from lucene_solr_spark.merge import merge_segments
    from lucene_solr_spark.query import parse
    from lucene_solr_spark.segments import live_segments, read_manifest, read_segmented

    n = delete_by_query(spark, seg_index, parse("search engine"))
    assert n > 0
    pre = read_segmented(spark, seg_index)
    live_pre = pre["docmeta"].count()
    segs = [r["seg"] for r in live_segments(read_manifest(seg_index))]
    merge_segments(spark, seg_index, segs, "seg_compact")
    # tombstone dir retired on full compaction
    assert not os.path.isdir(deletes_path(seg_index))
    post = read_segmented(spark, seg_index)
    assert post["docmeta"].count() == live_pre
    assert post["postings"].filter(F.col("term") == "search").count() == 0
    # manifest stats now reflect the post-delete corpus
    assert post["stats"]["doc_count"] == live_pre
    # df genuinely recomputed: 'search' gone from term_stats
    assert post["term_stats"].filter(F.col("term") == "search").count() == 0
    # and search still works on the compacted index
    assert _hits(spark, seg_index, "w000001", k=10)


def test_atomic_update_version_conflict(spark, seg_index):
    from lucene_solr_spark.deletes import VersionConflict, atomic_update
    from lucene_solr_spark.segments import read_manifest

    gen = read_manifest(seg_index)["generation"]
    updates = spark.createDataFrame(
        [("doc-x", "en", "conflict test text")],
        "url string, lang string, text string",
    )
    # correct expected version succeeds (and bumps the generation twice:
    # tombstone commit + segment commit)
    atomic_update(spark, seg_index, updates, expected_version=gen)
    stale = read_manifest(seg_index)["generation"]
    assert stale > gen
    # a second writer with the OLD generation is rejected
    with pytest.raises(VersionConflict):
        atomic_update(spark, seg_index, updates, expected_version=gen)
