"""Early-terminated top-k over a SORTED index.

Lucene parity: IndexWriterConfig#setIndexSort writes segments in sort-field
order, and TopFieldCollector with the matching Sort stops collecting a
segment as soon as k docs are found, because docs arrive in sort order
(LUCENE-6766; lucene/core/.../search/TopFieldCollector.java ≈L200,
`canEarlyTerminate`). The whole point is to NOT read postings for the
long tail of a match set when the query sorts by the index sort.

Spark restatement: build_index(sort_by=...) assigns dense doc ids in sort
order, so "top-k by the index sort" == "the k LOWEST matching doc_ids".
Early termination becomes IO pruning: probe with a doc_id < bound
predicate — postings part-files are written sorted by (term, doc_id), so
the predicate pushes into the parquet scan and row-groups whose doc_id
min exceeds the bound are never read (the same min/max skip Lucene gets
from its sorted segment) — and geometrically widen the bound until k
matches are in. The driver runs <= log4(n_docs/first_bound) small probe
jobs; each probe reads only the leading slice of each term's postings
run. At 10^12 docs a top-10-recent query over a warc_ts-sorted index
reads a few row-groups per term instead of the full posting lists.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def early_terminated_topk(
    index: dict,
    terms: list[str],
    k: int = 10,
    mode: str = "and",
    first_bound: int | None = None,
    probe_info: dict | None = None,
) -> DataFrame:
    """Top-k matching docs in index-sort order (= lowest doc ids).

    `terms` is the boolean filter (`mode` "and"/"or") — this collector
    sorts by the index sort, it does not score (Lucene likewise skips
    scoring when sort != relevance and trackScores is off).
    `first_bound` seeds the probe window (default 64*k); pass
    `probe_info={}` to get {"probes": int, "final_bound": int} back for
    observability/tests.
    """
    if mode not in ("and", "or"):
        raise ValueError(f"mode must be 'and' or 'or', got {mode!r}")
    post = index["postings"]
    n_docs = int(index["stats"]["doc_count"])
    uniq = sorted(set(terms))

    def matches(upper: int | None) -> DataFrame:
        # the bound is applied at the SCAN (before any agg) so it pushes
        # into the parquet reader alongside the term filter. Flat postings
        # are unique per (term, doc_id) — the indexer's inversion contract —
        # so the single-term path needs NO exchange at all, and the
        # conjunction count needs no pre-distinct.
        src = post.filter(F.col("term").isin(uniq))
        if upper is not None:
            src = src.filter(F.col("doc_id") < upper)
        if len(uniq) == 1:
            return src.select("doc_id")
        if mode == "and":
            return (
                src.groupBy("doc_id")
                .agg(F.count("*").alias("_nt"))
                .filter(F.col("_nt") == len(uniq))
                .select("doc_id")
            )
        return src.select("doc_id").distinct()

    bound = min(max(first_bound or 64 * k, k), n_docs) if n_docs else 0
    probes = 0
    while True:
        probes += 1
        cand = matches(bound if bound < n_docs else None)
        if bound >= n_docs or cand.limit(k).count() >= k:
            break
        bound *= 4
    if probe_info is not None:
        probe_info["probes"] = probes
        probe_info["final_bound"] = min(bound, n_docs)
    return cand.orderBy("doc_id").limit(k)


def assert_index_sorted(index: dict) -> list:
    """The recorded index sort (stats["index_sort"]) or raise — callers
    that require early-termination semantics should fail loudly on an
    unsorted index rather than silently return ids in url order."""
    srt = index["stats"].get("index_sort")
    if not srt:
        raise ValueError(
            "index was not built with sort_by=...; early-terminated "
            "sorted top-k requires an index sort (Lucene throws the "
            "matching IllegalStateException for a Sort mismatch)"
        )
    return srt


def sorted_range_count(
    index: dict,
    field: str,
    lo,
    hi,
    probe_info: dict | None = None,
) -> int:
    """IndexSortSortedNumericDocValuesRangeQuery analog
    (lucene/sandbox/.../search/IndexSortSortedNumericDocValuesRange
    Query.java ≈L60): when the range field IS the index sort, the match
    set is one CONTIGUOUS doc-id run, so the count resolves from the run
    BOUNDARIES — two tiny agg jobs over the docmeta column — instead of
    a full predicate scan of every row. Lucene finds the boundaries by
    binary search over the sorted doc values; columnar Spark gets the
    same IO shape because docmeta is range-partitioned by doc_id and the
    min/max probes prune to the boundary partitions.

    Returns the count of docs with lo <= field <= hi (inclusive both
    ends, the SortedNumericDocValuesField.newSlowRangeQuery contract).
    Requires the index sorted by exactly (field desc|asc); raises
    otherwise (same loud failure as assert_index_sorted).
    """
    srt = assert_index_sorted(index)
    if len(srt) != 1 or srt[0][0] != field:
        raise ValueError(
            f"index sort {srt} does not lead with {field}; the contiguous-"
            "run boundary trick needs the range field as the index sort"
        )
    if "sortvals" not in index:
        raise ValueError(
            "index has no sortvals sidecar (built before sort-value "
            "persistence, or without sort_by)"
        )
    meta = index["sortvals"].select("doc_id", field)
    in_range = (F.col(field) >= F.lit(lo)) & (F.col(field) <= F.lit(hi))
    row = meta.filter(in_range).agg(
        F.min("doc_id").alias("lo_id"),
        F.max("doc_id").alias("hi_id"),
        F.count("*").alias("n"),
    ).first()
    if probe_info is not None:
        probe_info["lo_id"] = row["lo_id"]
        probe_info["hi_id"] = row["hi_id"]
    if row["lo_id"] is None:
        return 0
    # the sorted-index contract: the match run is contiguous, so
    # count == hi_id - lo_id + 1. Assert it (catches a mis-sorted index
    # the way Lucene's CheckIndex would) and return the boundary count.
    n_span = int(row["hi_id"]) - int(row["lo_id"]) + 1
    if int(row["n"]) != n_span:
        raise AssertionError(
            f"index claims sort by {field} but the [{lo}, {hi}] match run "
            f"is not contiguous: {row['n']} rows span {n_span} ids"
        )
    return n_span
