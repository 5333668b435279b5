"""Stable dense doc-ID assignment.

Lucene docIDs are per-segment and ephemeral (renumbered on merge —
BaseCompositeReader#readerBase). We instead mint STABLE dense ids
``doc_id = rank of url in global url order`` (SURVEY.md §8), which makes the
(score desc, doc_id asc) tiebreak deterministic and reproducible.

Scalable pattern (no global window, no zipWithIndex/RDD): range-partition by
the key, count rows per partition, broadcast the per-partition offsets, add a
partition-local row_number.

CORRECTNESS NOTE — the counting pass and the main pass MUST observe the
same physical partitioning. repartitionByRange samples its child to pick
boundaries, and re-executing the exchange can sample slightly different
boundaries, silently shifting a few rows across partitions — offsets from
pass 1 then disagree with row_numbers from pass 2 and the ids come out
non-dense. `persist_exchange=True` (the index build's setting) pins ONE
materialization of the exchange that both passes share; the caller
unpersists via `cache_registry` once downstream work is materialized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_dense_ids(
    df: DataFrame,
    key: str,
    id_col: str = "doc_id",
    partitions: int | None = None,
    persist_exchange: bool = False,
    cache_registry: list | None = None,
    require_unique: bool = False,
    order_by: list | None = None,
) -> DataFrame:
    """`persist_exchange=True` caches the range-partitioned input so the
    counting pass and the main pass share one exchange — REQUIRED for
    guaranteed-dense ids (see module note) and the right call when `df`
    carries a wide payload (the index build passes text through here).
    The persisted handle is appended to `cache_registry` (if given) so the
    caller can unpersist when done.

    `order_by` (optional, list of sort Columns / column names) assigns ids
    in THAT total order instead of `key` order — the index-sort hook
    (Lucene IndexWriterConfig#setIndexSort): build_index passes the sort
    fields and doc ids come out monotone in them. The caller must make the
    order total (append `key` as the final tiebreak). Caveat: with a
    custom order, equal `key` values with different sort values may land
    in different range partitions, so the `require_unique` per-partition
    distinct-count check is conservative (it can miss such a duplicate;
    ids stay dense regardless — the downstream id join is what fans out)."""
    p = partitions or df.sparkSession.sparkContext.defaultParallelism
    order = list(order_by) if order_by else [key]
    # ONE pass computes BOTH the per-partition local rank (the window can
    # run before the global offsets are known) and the rows the counting
    # aggregation reads — so with persist_exchange there is exactly ONE
    # materialization, and the counts come from the SAME materialized rows
    # the ranks did (stronger than the round-4 pinned-exchange fix, which
    # still ran the window as a second execution over the cache; profiling
    # showed that second materialization was ~half the ids phase).
    w = Window.partitionBy("_pid").orderBy(*order)
    local = (
        df.repartitionByRange(p, *order)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn("_rank", F.row_number().over(w))
    )
    if persist_exchange:
        from pyspark import StorageLevel

        local = local.persist(StorageLevel.MEMORY_AND_DISK)
        if cache_registry is not None:
            cache_registry.append(local)
    # <= `partitions` rows — driver-side by design, O(p) not O(rows); with
    # persist_exchange this also materializes the shared pass.
    # require_unique rides the SAME counting pass: range partitioning
    # co-locates equal keys, so sum(per-partition countDistinct) IS the
    # global distinct count — no separate full-scan job for the dup check.
    aggs = [F.count("*").alias("count")]
    if require_unique:
        aggs.append(F.countDistinct(key).alias("n_uniq"))
    counts = local.groupBy("_pid").agg(*aggs).orderBy("_pid").collect()
    if require_unique:
        n_rows = sum(r["count"] for r in counts)
        n_uniq = sum(r["n_uniq"] for r in counts)
        if n_uniq != n_rows:
            raise ValueError(
                f"duplicate '{key}' values: {n_rows} rows, "
                f"{n_uniq} distinct"
            )
    offsets, acc = {}, 0
    for row in counts:
        offsets[row["_pid"]] = acc
        acc += row["count"]
    offsets_df = df.sparkSession.createDataFrame(
        [(pid, off) for pid, off in offsets.items()],
        "_pid int, _offset long",  # explicit: offsets may be empty (0-row df)
    )
    # offsets apply as a pure map over the (possibly cached) local ranks —
    # no second window, no second sort, no extra exchange
    return (
        local.join(F.broadcast(offsets_df), "_pid")
        .withColumn(id_col, F.col("_rank") + F.col("_offset") - 1)
        .drop("_pid", "_rank", "_offset")
    )
