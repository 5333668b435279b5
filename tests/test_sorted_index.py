"""Index sorting (setIndexSort) + early-terminated sorted top-k."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.indexer import build_index, read_index
from lucene_solr_spark.operators.sorted_index import (
    assert_index_sorted,
    early_terminated_topk,
)


@pytest.fixture(scope="module")
def sorted_idx(spark):
    """Index over sf0.001 documents, sorted by n_chars DESC (longest doc
    gets doc_id 0)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pages = docs.select(
        F.format_string("doc%09d", "doc_id").alias("url"),
        "text",
        "lang",
        "n_chars",
    )
    d = tempfile.mkdtemp(prefix="sorted_idx_")
    build_index(
        spark, pages, d, profile="simple", num_buckets=4, quantize=False,
        sort_by=[("n_chars", "desc")],
    )
    idx = read_index(spark, d)
    yield idx, docs
    shutil.rmtree(d, ignore_errors=True)


def test_doc_ids_monotone_in_sort_field(spark, sorted_idx):
    idx, docs = sorted_idx
    joined = (
        idx["docmeta"]
        .select("doc_id", F.substring("url", 4, 9).cast("long").alias("oid"))
        .join(docs.select(F.col("doc_id").alias("oid"), "n_chars"), "oid")
        .orderBy("doc_id")
        .collect()
    )
    lens = [r["n_chars"] for r in joined]
    assert lens == sorted(lens, reverse=True)
    # equal-length ties break on url asc == original id asc
    for a, b in zip(joined, joined[1:]):
        if a["n_chars"] == b["n_chars"]:
            assert a["oid"] < b["oid"]


def test_index_sort_recorded(sorted_idx):
    idx, _ = sorted_idx
    assert idx["stats"]["index_sort"] == [["n_chars", "desc"]]
    assert assert_index_sorted(idx) == [["n_chars", "desc"]]


def test_unsorted_index_raises(spark):
    fake = {"stats": {"doc_count": 1}}
    with pytest.raises(ValueError, match="sort_by"):
        assert_index_sorted(fake)


def _exhaustive(idx, terms, k, mode):
    post = idx["postings"]
    m = (
        post.filter(F.col("term").isin(sorted(set(terms))))
        .select("term", "doc_id")
        .distinct()
    )
    if mode == "and" and len(set(terms)) > 1:
        m = (
            m.groupBy("doc_id")
            .agg(F.count("*").alias("nt"))
            .filter(F.col("nt") == len(set(terms)))
        )
    return [
        r["doc_id"]
        for r in m.select("doc_id").distinct().orderBy("doc_id").limit(k).collect()
    ]


@pytest.mark.parametrize(
    "terms,mode",
    [
        (["the"], "or"),
        (["dup"], "or"),
        (["dup", "vector"], "and"),
        (["dup", "vector"], "or"),
        (["zzzznothere"], "or"),
        (["dup", "zzzznothere"], "and"),
    ],
)
def test_early_topk_matches_exhaustive(sorted_idx, terms, mode):
    idx, _ = sorted_idx
    for k in (3, 10):
        got = [
            r["doc_id"]
            for r in early_terminated_topk(
                idx, terms, k=k, mode=mode, first_bound=8
            ).collect()
        ]
        assert got == _exhaustive(idx, terms, k, mode)


def test_early_termination_actually_prunes(sorted_idx):
    """A frequent term must finish with final_bound << n_docs (the probe
    never widened to the full corpus), and widening probes must converge
    for a rare term."""
    idx, _ = sorted_idx
    n_docs = idx["stats"]["doc_count"]
    info: dict = {}
    got = early_terminated_topk(
        idx, ["the"], k=5, mode="or", first_bound=16, probe_info=info
    ).collect()
    assert len(got) == 5
    assert info["final_bound"] < n_docs
    # absent term: probes widen to the end and return empty, no spin
    info2: dict = {}
    empty = early_terminated_topk(
        idx, ["zzzznothere"], k=5, mode="or", first_bound=16, probe_info=info2
    ).collect()
    assert empty == []
    assert info2["final_bound"] == n_docs


def test_top1_is_longest_matching_doc(spark, sorted_idx):
    """doc_id 0-ward == longest n_chars: the top-1 for a term is the
    longest document containing it."""
    idx, docs = sorted_idx
    top = early_terminated_topk(idx, ["dup"], k=1, mode="or").collect()
    oid = (
        idx["docmeta"]
        .filter(F.col("doc_id") == top[0]["doc_id"])
        .select(F.substring("url", 4, 9).cast("long").alias("oid"))
        .collect()[0]["oid"]
    )
    best = (
        docs.filter(F.array_contains(F.split("text", " "), "dup"))
        .orderBy(F.col("n_chars").desc(), "doc_id")
        .limit(1)
        .collect()[0]["doc_id"]
    )
    assert oid == best


def test_sorted_range_count_matches_filter(spark, tmp_path_factory):
    """Contiguous-run range count == plain predicate count; mis-declared
    sort field raises."""
    import pytest
    from pyspark.sql import functions as F

    from lucene_solr_spark.fixtures import write_pages
    from lucene_solr_spark.indexer import build_index, read_index
    from lucene_solr_spark.operators.sorted_index import sorted_range_count

    out = str(tmp_path_factory.mktemp("src") / "pages.parquet")
    write_pages(0.0003, out)
    d = spark.read.parquet(out).select(
        "url", "text", "lang", F.length("text").alias("n_chars")
    )
    idx_dir = str(tmp_path_factory.mktemp("src") / "idx")
    build_index(
        spark, d, idx_dir, profile="simple", num_buckets=4,
        quantize=False, sort_by=[("n_chars", "desc")],
    )
    idx = read_index(spark, idx_dir)
    lo, hi = 200, 400
    expect = d.filter(
        (F.col("n_chars") >= lo) & (F.col("n_chars") <= hi)
    ).count()
    info = {}
    got = sorted_range_count(idx, "n_chars", lo, hi, probe_info=info)
    assert got == expect > 0
    assert info["hi_id"] - info["lo_id"] + 1 == got
    # empty range returns 0, not an error
    assert sorted_range_count(idx, "n_chars", 10**9, 2 * 10**9) == 0
    with pytest.raises(ValueError):
        sorted_range_count(idx, "lang", 0, 1)
