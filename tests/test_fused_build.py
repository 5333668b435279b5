"""Fused single-pass postings writer vs the committer-backed two-pass path.

The fused path (`build_index(..., fused=True)`, the default) writes the
flat-postings AND packed-blocks part-files from the same sorted task
partition via pyarrow, manifest-committed by the driver
(indexer._fused_postings_writer / _commit_fused). These tests pin the
contract that matters: both paths produce IDENTICAL tables — including
when the (bucket, salt) hash exchange collides several buckets into one
task partition, the bug class the per-bucket-run slicing exists for.
"""
from __future__ import annotations

import json
import os

import pytest


@pytest.fixture(scope="module")
def both_indexes(spark, pages_small, tmp_path_factory):
    from lucene_solr_spark.indexer import build_index

    root = tmp_path_factory.mktemp("fusedeq")
    pages = spark.read.parquet(pages_small)
    # num_buckets=8, salt=3 -> 24 hash-partitioned keys over 24 target
    # partitions: collisions guaranteed, so single partitions hold rows
    # from SEVERAL buckets (the per-run writer split under test)
    kw = dict(profile="en", num_buckets=8, salt=3)
    build_index(spark, pages, str(root / "fused"), fused=True, **kw)
    build_index(spark, pages, str(root / "twopass"), fused=False, **kw)
    return str(root / "fused"), str(root / "twopass")


@pytest.mark.parametrize(
    "table", ["postings", "packed", "docmeta", "term_stats"]
)
def test_fused_tables_match_two_pass(spark, both_indexes, table):
    fused, twopass = both_indexes
    a = spark.read.parquet(os.path.join(fused, table))
    b = spark.read.parquet(os.path.join(twopass, table))
    assert sorted(a.columns) == sorted(b.columns)
    a, b = a.select(*sorted(a.columns)), b.select(*sorted(b.columns))
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_fused_manifest_commit(both_indexes):
    """_manifest.json lists exactly the committed files; no temp litter."""
    fused, _ = both_indexes
    for table in ("postings", "packed"):
        troot = os.path.join(fused, table)
        with open(os.path.join(troot, "_manifest.json")) as f:
            manifest = json.load(f)
        on_disk = set()
        for dirpath, _d, files in os.walk(troot):
            for fn in files:
                assert not fn.endswith(".tmp"), "uncommitted temp file"
                if not fn.startswith("_"):
                    on_disk.add(
                        os.path.relpath(os.path.join(dirpath, fn), troot)
                    )
        assert set(manifest["files"]) == on_disk
        assert manifest["partitions"], "lineage rows missing"


def test_fused_empty_corpus_falls_back(spark, tmp_path):
    """0-doc build: pyarrow writes nothing, so the fused branch must fall
    back to the committer write and still leave schema-bearing tables."""
    from lucene_solr_spark.indexer import build_index, read_index

    pages = spark.range(0).selectExpr(
        "cast(null as string) url",
        "cast(null as string) lang",
        "cast(null as string) text",
    )
    out = str(tmp_path / "idx0")
    stats = build_index(spark, pages, out, profile="en", num_buckets=4)
    assert stats["doc_count"] == 0
    idx = read_index(spark, out)
    assert idx["postings"].count() == 0
