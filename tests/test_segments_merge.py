"""Segment lifecycle: resumable checkpointed builds (UpdateLog#recoverFromLog
analog) and TieredMergePolicy-style compaction with merge invariance
(SURVEY.md §6.2 items 5 and 7)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def seg_dir(spark, pages_small, tmp_path_factory):
    from lucene_solr_spark.segments import build_segmented

    out = str(tmp_path_factory.mktemp("seg") / "idx")
    pages = spark.read.parquet(pages_small)
    # simulate a crash: only 3 of 6 units complete on the first invocation
    man = build_segmented(spark, pages, out, profile="en", n_units=6,
                          num_buckets=4, max_units=3)
    assert sum(1 for r in man["segments"].values() if r["status"] == "done") == 3
    # resume: picks up the remaining units, skips the done ones
    man = build_segmented(spark, pages, out, profile="en", n_units=6,
                          num_buckets=4)
    assert sum(1 for r in man["segments"].values() if r["status"] == "done") == 6
    return out


def _top10(index, query_terms):
    """Top-10 as (score, url) made tie-robust: equal scores are ordered by
    url (doc_id tiebreak differs legitimately across index layouts), and
    boundary ties are resolved by fetching k+10 then keeping the first 10
    by (score desc, url)."""
    from lucene_solr_spark.query import Boolean, Term
    from lucene_solr_spark.search import Searcher

    s = Searcher(index)
    q = Boolean(should=[Term(t) for t in query_terms])
    rows = [
        (round(r["score"], 6), r["url"]) for r in s.search(q, 20).collect()
    ]
    return sorted(rows, key=lambda t: (-t[0], t[1]))[:10]


def test_segmented_matches_monolithic(spark, pages_small, seg_dir, index_small):
    """Distribution transparency (BaseDistributedSearchTestCase pattern):
    segmented build == monolithic build, compared on (score, url) since
    doc ids legitimately differ across layouts."""
    from lucene_solr_spark.segments import read_segmented

    seg_idx = read_segmented(spark, seg_dir)
    assert seg_idx["stats"]["doc_count"] == index_small["stats"]["doc_count"]
    assert (
        seg_idx["stats"]["sum_total_term_freq"]
        == index_small["stats"]["sum_total_term_freq"]
    )
    for terms in (["search"], ["search", "engin"], ["w000005"]):
        assert _top10(seg_idx, terms) == _top10(index_small, terms)


def test_resume_is_idempotent(spark, pages_small, seg_dir):
    """Re-running a finished build changes nothing (fingerprint skip)."""
    from lucene_solr_spark.segments import build_segmented, read_manifest

    before = read_manifest(seg_dir)
    pages = spark.read.parquet(pages_small)
    build_segmented(spark, pages, seg_dir, profile="en", n_units=6,
                    num_buckets=4)
    after = read_manifest(seg_dir)
    assert {r["seg"]: r["attempt"] for r in before["segments"].values()} == {
        r["seg"]: r["attempt"] for r in after["segments"].values()
    }


def test_lineage_metrics(spark, seg_dir):
    from lucene_solr_spark.segments import lineage_df

    ldf = lineage_df(spark, seg_dir)
    rows = ldf.collect()
    assert len(rows) == 6
    assert all(r["status"] == "done" and r["wall_s"] > 0 for r in rows)
    assert sum(r["n_docs"] for r in rows) == 1000


def test_find_merges_policy():
    from lucene_solr_spark.merge import find_merges

    # 14 tiny segments, budget 10 -> merge the 10 smallest
    segs = [{"seg": f"s{i}", "n_docs": 100 + i} for i in range(14)]
    merges = find_merges(segs, segs_per_tier=10, max_merge_at_once=10)
    assert merges and len(merges[0]) == 10
    assert merges[0] == [f"s{i}" for i in range(10)]
    # under budget -> no merges
    assert find_merges(segs[:5], segs_per_tier=10) == []
    # max_merged_docs cap respected
    merges = find_merges(
        [{"seg": f"s{i}", "n_docs": 600} for i in range(14)],
        segs_per_tier=4, max_merge_at_once=10, max_merged_docs=2000,
        floor_docs=10,
    )
    assert merges and all(len(g) <= 3 for g in merges)


def test_compaction_merge_invariance(spark, pages_small, tmp_path_factory):
    """Query results identical before and after compaction, and the
    segment count actually shrinks (SegmentMerger parity)."""
    from lucene_solr_spark.merge import compact
    from lucene_solr_spark.segments import (
        build_segmented,
        live_segments,
        read_manifest,
        read_segmented,
    )

    out = str(tmp_path_factory.mktemp("cmp") / "idx")
    pages = spark.read.parquet(pages_small)
    build_segmented(spark, pages, out, profile="en", n_units=12, num_buckets=4)
    before_idx = read_segmented(spark, out)
    before = {t: _top10(before_idx, [t]) for t in ("search", "w000005")}
    n_before = len(live_segments(read_manifest(out)))

    merged = compact(spark, out, segs_per_tier=2, max_merge_at_once=6,
                     floor_docs=10)
    assert merged, "expected at least one merge"
    n_after = len(live_segments(read_manifest(out)))
    assert n_after < n_before

    after_idx = read_segmented(spark, out)
    assert after_idx["stats"]["doc_count"] == 1000
    for t, expected in before.items():
        assert _top10(after_idx, [t]) == expected

    # packed WAND still equals exhaustive on the compacted index
    from lucene_solr_spark.wand import WandSearcher

    w = WandSearcher(after_idx)
    wand = [
        (r["doc_id"], round(r["score"], 8))
        for r in w.search(["search"], 10).collect()
    ]
    from lucene_solr_spark.query import Term
    from lucene_solr_spark.search import Searcher

    exact = [
        (r["doc_id"], round(r["score"], 8))
        for r in Searcher(after_idx)
        .score_all(Term("search"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(10)
        .collect()
    ]
    assert wand == exact
