"""TieredMergePolicy-style segment selection + distributed sort-merge
compaction (north_rule: "a TieredMergePolicy-like distributed segment merge
expressed as sort-merge over term-partitioned DataFrames").

Reference parity (SURVEY.md §4.1 step 6):
  * selection — lucene/core/src/java/org/apache/lucene/index/
    TieredMergePolicy.java (defaults segsPerTier=10, maxMergeAtOnce=10,
    maxMergedSegmentMB=5120; findMerges ≈L280, candidate score ≈L500:
    skew x size^0.05 — smaller, evenly-sized merges preferred). We port
    the policy arithmetic with doc counts standing in for byte sizes.
  * execution — SegmentMerger.java ≈L100 does a k-way sorted term merge
    with docID rebasing. Ours needs NO rebasing (stable global doc ids),
    so a merge is a pure Spark job: union the segments' postings
    term-partitioned (repartition by term bucket), re-aggregate term_stats
    by sum, re-pack packed blocks, write one new segment dir, then
    atomically swap the manifest (commit point) and delete the old dirs.

Merging never changes query results (merge-invariance test) because doc
ids, tfs and dlqs are carried through untouched — only file layout changes.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .segments import _union_read, live_segments, read_manifest, write_manifest

SEGS_PER_TIER = 10
MAX_MERGE_AT_ONCE = 10
FLOOR_SEGMENT_DOCS = 2_000  # floorSegmentMB analog, in docs
MAX_MERGED_DOCS = 50_000_000  # maxMergedSegmentMB analog


def find_merges(
    segments: list[dict],
    segs_per_tier: int = SEGS_PER_TIER,
    max_merge_at_once: int = MAX_MERGE_AT_ONCE,
    floor_docs: int = FLOOR_SEGMENT_DOCS,
    max_merged_docs: int = MAX_MERGED_DOCS,
) -> list[list[str]]:
    """Pick merge candidates, TieredMergePolicy-style.

    Tiering: with sizes floored at `floor_docs` (tiny segments count as one
    floor unit, TieredMergePolicy#floorSize), the allowed segment count is
    segs_per_tier per power-of-merge-factor tier; while over budget, merge
    the `max_merge_at_once` smallest segments whose total stays under
    `max_merged_docs` (the skew-minimizing choice: merging the smallest
    run gives the most even result — the score function's preference).
    """
    import math

    def allowed_count(pool) -> int:
        # port of TieredMergePolicy#findMerges allowedSegCount loop ≈L330:
        # budget segsPerTier per geometric level from the floor size up
        remaining = float(sum(max(n, floor_docs) for n, _ in pool))
        level = float(floor_docs)
        allowed = 0.0
        while remaining > 0:
            per_level = remaining / level
            if per_level < segs_per_tier:
                allowed += math.ceil(per_level)
                break
            allowed += segs_per_tier
            remaining -= segs_per_tier * level
            level *= max_merge_at_once
        return int(allowed)

    pool = sorted((max(r["n_docs"], 1), r["seg"]) for r in segments)
    merges: list[list[str]] = []
    while len(merges) <= 8:
        if len(pool) <= allowed_count(pool):
            break
        # merge the smallest run (most even result = best candidate score)
        group, tot, rest = [], 0, []
        for n, seg in pool:
            if (
                not seg.startswith("<")
                and len(group) < max_merge_at_once
                and tot + n <= max_merged_docs
            ):
                group.append(seg)
                tot += n
            else:
                rest.append((n, seg))
        if len(group) < 2:
            break
        merges.append(group)
        pool = sorted(rest + [(tot, f"<merged:{len(merges)}>")])
    return merges


def merge_segments(
    spark: SparkSession, out_dir: str, seg_names: list[str], new_seg: str
) -> dict:
    """Physically merge segment dirs into `new_seg` and commit the swap."""
    man = read_manifest(out_dir)
    recs = {
        r["seg"]: r for r in live_segments(man) if r["seg"] in set(seg_names)
    }
    assert len(recs) == len(seg_names), "unknown segment in merge spec"
    num_buckets = man["num_buckets"]
    paths = [os.path.join(out_dir, s) for s in seg_names]
    new_dir = os.path.join(out_dir, new_seg)

    # tombstone reclamation (SegmentMerger skips deleted docs): merged
    # output physically drops deleted rows; stats are recomputed from the
    # surviving data rather than summed from the (pre-delete) manifest
    from .deletes import read_deletes

    deletes = read_deletes(spark, out_dir)

    # ---- postings: k-way merge == union + term-partitioned rewrite --------
    postings = _union_read(spark, [os.path.join(p, "postings") for p in paths])
    if deletes is not None:
        postings = postings.join(deletes, "doc_id", "left_anti")
    postings.repartition(num_buckets, "bucket").sortWithinPartitions(
        "term", "doc_id"
    ).write.mode("overwrite").partitionBy("bucket").parquet(
        os.path.join(new_dir, "postings")
    )

    # ---- docmeta: plain union, doc ids are stable ------------------------
    docmeta = _union_read(spark, [os.path.join(p, "docmeta") for p in paths])
    if deletes is not None:
        docmeta = docmeta.join(deletes, "doc_id", "left_anti")
    docmeta.repartitionByRange(
        max(spark.sparkContext.defaultParallelism, 1), "doc_id"
    ).write.mode("overwrite").parquet(os.path.join(new_dir, "docmeta"))

    # ---- term_stats: additive when no deletes; recomputed from surviving
    # postings when tombstones were reclaimed (df/ttf genuinely change)
    if deletes is None:
        ts = _union_read(spark, [os.path.join(p, "term_stats") for p in paths])
        merged_ts = ts.groupBy("term").agg(
            F.sum("df").alias("df"), F.sum("ttf").alias("ttf")
        )
    else:
        merged_ts = (
            spark.read.parquet(os.path.join(new_dir, "postings"))
            .groupBy("term")
            .agg(F.count("*").alias("df"), F.sum("tf").alias("ttf"))
        )
    merged_ts = merged_ts.withColumn(
        "bucket", F.pmod(F.xxhash64("term"), F.lit(num_buckets)).cast("int")
    )
    merged_ts.repartition(num_buckets, "bucket").write.mode(
        "overwrite"
    ).partitionBy("bucket").parquet(os.path.join(new_dir, "term_stats"))

    # ---- packed blocks: re-pack from merged flat postings ----------------
    if all(os.path.isdir(os.path.join(p, "packed")) for p in paths):
        from .indexer import write_packed_postings

        merged_post = spark.read.parquet(os.path.join(new_dir, "postings"))
        write_packed_postings(
            merged_post.select("term", "doc_id", "tf", "dlq"),
            new_dir,
            num_buckets,
        )

    # ---- stats json ------------------------------------------------------
    if deletes is None:
        n_docs = sum(r["n_docs"] for r in recs.values())
        sum_ttf = sum(r["sum_ttf"] for r in recs.values())
    else:
        agg = (
            spark.read.parquet(os.path.join(new_dir, "docmeta"))
            .agg(F.count("*").alias("n"), F.sum("field_len").alias("s"))
            .collect()[0]
        )
        n_docs, sum_ttf = int(agg["n"]), int(agg["s"] or 0)
    stats = {
        "doc_count": n_docs,
        "sum_total_term_freq": sum_ttf,
        "avgdl": (sum_ttf / n_docs) if n_docs else 0.0,
        "profile": man["profile"],
        "num_buckets": num_buckets,
    }
    # driver-side single-row write in the part-file layout read_index
    # globs (a one-row Spark json job costs ~5s of scheduler/committer
    # overhead; same change as indexer.build_index)
    import json as _json
    import shutil as _shutil

    stats_dir = os.path.join(new_dir, "stats")
    _shutil.rmtree(stats_dir, ignore_errors=True)
    os.makedirs(stats_dir, exist_ok=True)
    with open(os.path.join(stats_dir, "part-00000.json"), "w") as f:
        f.write(_json.dumps(stats) + "\n")

    # ---- atomic commit: swap manifest entries, then delete old dirs ------
    units = sorted(u for r in recs.values() for u in r["units"])
    wall = sum(r.get("wall_s") or 0 for r in recs.values())
    attempts = max(r.get("attempt") or 1 for r in recs.values())
    new_rec = {
        "seg": new_seg,
        "status": "done",
        "units": units,
        "n_docs": n_docs,
        "sum_ttf": sum_ttf,
        "wall_s": wall,
        "attempt": attempts,
        "fingerprint": "+".join(
            r.get("fingerprint") or "" for r in recs.values()
        ),
        "merged_from": seg_names,
    }
    man = read_manifest(out_dir)
    man["segments"] = {
        k: v
        for k, v in man["segments"].items()
        if v["seg"] not in set(seg_names)
    }
    # atomic-update segments carry no unit ids — key the merged record by
    # the new segment name in that case
    key = f"m{min(units)}" if units else f"m_{new_seg}"
    man["segments"][key] = new_rec
    write_manifest(out_dir, man)
    # IndexDeletionPolicy: a segment dir still referenced by a RETAINED
    # commit point must survive the merge so read_segmented(generation=N)
    # keeps working; expunge_commits() reclaims it when history is pruned
    from .segments import referenced_segs

    protected = referenced_segs(out_dir) - {
        r["seg"] for r in live_segments(man)
    }
    for p in paths:
        if os.path.basename(p) in protected:
            continue
        shutil.rmtree(p, ignore_errors=True)
    # full compaction consumed every tombstone (ids are never recycled, so
    # leftover tombstones for already-dropped ids would be harmless — but a
    # full merge is the natural point to retire them, Lucene expungeDeletes)
    if deletes is not None and not (
        {r["seg"] for r in live_segments(man)} - {new_seg}
    ):
        from .deletes import deletes_path

        shutil.rmtree(deletes_path(out_dir), ignore_errors=True)
    return new_rec


def compact(
    spark: SparkSession, out_dir: str, **policy
) -> list[dict]:
    """Run the merge policy to completion (ConcurrentMergeScheduler's loop,
    foreground — background scheduling is an orchestration concern)."""
    done = []
    gen = 0
    while True:
        man = read_manifest(out_dir)
        merges = find_merges(live_segments(man), **policy)
        if not merges:
            return done
        for group in merges:
            gen += 1
            existing = {r["seg"] for r in live_segments(man)}
            new_name = f"seg_m{man['generation']:05d}_{gen}"
            assert new_name not in existing
            done.append(merge_segments(spark, out_dir, group, new_name))
