"""Segmented, checkpoint-resumable index builds with per-partition lineage.

Spark restatement of Lucene's segment lifecycle + Solr's transaction-log
recovery (SURVEY.md §2.1 Segment/commit-point rows, §3.12 UpdateLog):

  DocumentsWriterPerThread -> one *build unit* = a deterministic hash
      partition of the corpus (pmod(xxhash64(url), n_units)); each unit
      builds an independent, self-contained segment directory through
      indexer.build_index (exactly a DWPT flush).
  segments_N commit point  -> manifest.json, written ATOMICALLY
      (tmp + os.replace) after every unit — the Iceberg-snapshot analog.
  UpdateLog#recoverFromLog -> resume: a unit whose manifest row says
      status=done (with matching corpus fingerprint) is skipped; killing
      the build at any point loses at most the in-flight unit.

Lineage/metrics per unit (north_rule: "checkpoint-resumable per-partition
lineage and build metrics"): n_docs, sum_ttf, wall_s, attempt count and
the unit fingerprint live in the manifest and are queryable via
`lineage_df(spark, out_dir)`.

Stable doc IDs: unit `u` owns the id range [u * UNIT_CAPACITY, ...), and
ids are dense-by-url *within* the unit — so segment merges never renumber
docs (unlike Lucene's ephemeral per-segment ids, BaseCompositeReader
#readerBase) and a rebuilt unit reproduces identical ids (idempotent).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .indexer import DEFAULT_BUCKETS, build_index

MANIFEST = "manifest.json"
UNIT_CAPACITY = 1 << 33  # id range per build unit


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, MANIFEST)


def read_manifest(out_dir: str) -> dict | None:
    p = _manifest_path(out_dir)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


COMMITS_DIR = "commits"
DEFAULT_KEEP_COMMITS = 8


def _commits_dir(out_dir: str) -> str:
    return os.path.join(out_dir, COMMITS_DIR)


def write_manifest(
    out_dir: str, man: dict, keep_commits: int = DEFAULT_KEEP_COMMITS
) -> None:
    """Atomic commit point (segments_N / Iceberg-snapshot analog).

    Every commit also snapshots itself to commits/manifest_<gen>.json —
    the Lucene IndexCommit history that SnapshotDeletionPolicy exposes
    (and the Iceberg snapshot log). The newest `keep_commits` generations
    are retained (KeepOnlyLastCommitDeletionPolicy is keep_commits=1);
    `read_segmented(..., generation=N)` opens a retained commit
    point-in-time, and merge/compaction will NOT delete segment dirs a
    retained commit still references (IndexDeletionPolicy contract) —
    `expunge_commits` prunes history and GCs the dirs it released."""
    man = dict(man, generation=man.get("generation", 0) + 1)
    tmp = _manifest_path(out_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(man, f, indent=1, sort_keys=True)
    os.replace(tmp, _manifest_path(out_dir))
    cdir = _commits_dir(out_dir)
    os.makedirs(cdir, exist_ok=True)
    snap = os.path.join(cdir, f"manifest_{man['generation']:09d}.json")
    tmp2 = snap + ".tmp"
    with open(tmp2, "w") as f:
        json.dump(man, f, indent=1, sort_keys=True)
    os.replace(tmp2, snap)
    for old in _commit_files(out_dir)[:-keep_commits]:
        os.remove(os.path.join(cdir, old))


def _commit_files(out_dir: str) -> list[str]:
    cdir = _commits_dir(out_dir)
    if not os.path.isdir(cdir):
        return []
    return sorted(
        f
        for f in os.listdir(cdir)
        if f.startswith("manifest_") and f.endswith(".json")
    )


def list_commits(out_dir: str) -> list[dict]:
    """Retained commit points, oldest first: (generation, n_segments,
    n_docs) — IndexReader.listCommits / the Iceberg snapshot log."""
    out = []
    for f in _commit_files(out_dir):
        with open(os.path.join(_commits_dir(out_dir), f)) as fh:
            m = json.load(fh)
        segs = [r for r in m["segments"].values() if r.get("status") == "done"]
        out.append(
            {
                "generation": m["generation"],
                "n_segments": len(segs),
                "n_docs": sum(r.get("n_docs", 0) for r in segs),
            }
        )
    return out


def read_commit(out_dir: str, generation: int) -> dict:
    """Load one retained commit's manifest by generation."""
    p = os.path.join(
        _commits_dir(out_dir), f"manifest_{generation:09d}.json"
    )
    if not os.path.exists(p):
        raise FileNotFoundError(
            f"commit generation {generation} not retained in {out_dir} "
            f"(have: {[c['generation'] for c in list_commits(out_dir)]})"
        )
    with open(p) as f:
        return json.load(f)


def referenced_segs(out_dir: str) -> set[str]:
    """Segment dir names referenced by ANY retained commit — the set an
    IndexDeletionPolicy must protect from physical deletion."""
    refs: set[str] = set()
    for f in _commit_files(out_dir):
        with open(os.path.join(_commits_dir(out_dir), f)) as fh:
            m = json.load(fh)
        refs.update(
            r["seg"] for r in m["segments"].values() if r.get("status") == "done"
        )
    return refs


def expunge_commits(out_dir: str, keep: int = 1) -> list[str]:
    """Prune commit history to the newest `keep` generations and GC the
    segment dirs only the pruned commits referenced. Returns the deleted
    dir names. The live manifest's segments are always protected."""
    import shutil

    before = referenced_segs(out_dir)
    cdir = _commits_dir(out_dir)
    for old in _commit_files(out_dir)[:-keep] if keep > 0 else []:
        os.remove(os.path.join(cdir, old))
    man = read_manifest(out_dir) or {"segments": {}}
    keepset = referenced_segs(out_dir) | {
        r["seg"] for r in man["segments"].values() if r.get("status") == "done"
    }
    dropped = []
    for seg in sorted(before - keepset):
        shutil.rmtree(os.path.join(out_dir, seg), ignore_errors=True)
        dropped.append(seg)
    return dropped


def _unit_fingerprint(unit_pages: DataFrame) -> str:
    """Cheap deterministic content fingerprint of a unit's url set —
    idempotence key for resume (re-running a done unit is skipped only if
    its input is unchanged)."""
    row = unit_pages.agg(
        F.count("*").alias("n"),
        # fold each hash into [0, 2^30) before summing: order-insensitive,
        # ANSI-overflow-safe up to ~2^33 rows per unit
        F.sum(F.pmod(F.xxhash64("url"), F.lit(1 << 30))).alias("h"),
    ).collect()[0]
    return f"{row['n']}:{row['h']}"


def build_segmented(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    profile: str = "en",
    n_units: int = 8,
    num_buckets: int = DEFAULT_BUCKETS,
    max_units: int | None = None,
) -> dict:
    """Build (or resume building) a segmented index. Returns the manifest.

    `max_units` limits how many units are processed this invocation — used
    by tests to simulate a mid-build crash; production restarts just call
    this again and it picks up where the last atomic commit left off.
    """
    os.makedirs(out_dir, exist_ok=True)
    man = read_manifest(out_dir) or {
        "profile": profile,
        "n_units": n_units,
        "num_buckets": num_buckets,
        "segments": {},
        "generation": 0,
    }
    assert man["n_units"] == n_units, "n_units cannot change across resumes"

    units = pages.withColumn("_unit", F.pmod(F.xxhash64("url"), F.lit(n_units)))
    done_this_call = 0
    # a unit is done if it appears in ANY done segment's `units` list —
    # merge_segments rekeys manifest entries to "m<min(units)>", so looking
    # up only str(u) would rebuild merged units and duplicate their docs
    done_units = {
        int(x)
        for rec in man["segments"].values()
        if rec.get("status") == "done"
        for x in rec.get("units", [])
    }
    for u in range(n_units):
        if max_units is not None and done_this_call >= max_units:
            break
        rec = man["segments"].get(str(u))
        sub = units.filter(F.col("_unit") == u).drop("_unit")
        if u in done_units:
            continue
        attempt = (rec.get("attempt", 0) if rec else 0) + 1
        seg = f"seg_{u:05d}"
        seg_dir = os.path.join(out_dir, seg)
        fp = _unit_fingerprint(sub)
        t0 = time.perf_counter()
        stats = build_index(
            spark,
            sub,
            seg_dir,
            profile=profile,
            num_buckets=num_buckets,
            doc_base=u * UNIT_CAPACITY,
        )
        man["segments"][str(u)] = {
            "seg": seg,
            "status": "done",
            "units": [u],
            "n_docs": stats["doc_count"],
            "sum_ttf": stats["sum_total_term_freq"],
            "wall_s": round(time.perf_counter() - t0, 3),
            "attempt": attempt,
            "fingerprint": fp,
        }
        write_manifest(out_dir, man)  # checkpoint after EVERY unit
        man = read_manifest(out_dir)
        done_this_call += 1
    return man


def live_segments(man: dict) -> list[dict]:
    return [r for r in man["segments"].values() if r.get("status") == "done"]


def _union_read(spark: SparkSession, paths: list[str]) -> DataFrame:
    """unionByName of independently-read parquet dirs (each segment dir is
    its own hive-partitioned table root, so one multi-path read would
    conflict)."""
    dfs = [spark.read.parquet(p) for p in paths]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def read_segmented(
    spark: SparkSession, out_dir: str, generation: int | None = None
) -> dict:
    """Open a segmented index as one logical index (Searcher/WAND-ready).

    term_stats are re-aggregated across segments (exact global df/ttf —
    ExactStatsCache semantics, free because units partition the docs).

    `generation` opens a RETAINED commit point-in-time (DirectoryReader
    .open(IndexCommit) / Iceberg snapshot read): the segment SET is as of
    that commit. Caveat (documented): tombstones are a global append-only
    table without per-commit fencing, so deletes issued after the commit
    still mask docs in a point-in-time read — ids are never recycled, so
    this only ever hides later-deleted docs, never resurrects or corrupts.
    """
    if generation is not None:
        man = read_commit(out_dir, generation)
        missing = [
            r["seg"]
            for r in live_segments(man)
            if not os.path.isdir(os.path.join(out_dir, r["seg"]))
        ]
        if missing:
            raise FileNotFoundError(
                f"commit {generation} references expunged segments: {missing}"
            )
    else:
        man = read_manifest(out_dir)
    if not man:
        raise FileNotFoundError(f"no manifest in {out_dir}")
    segs = live_segments(man)
    if not segs:
        raise ValueError("no completed segments")
    paths = [os.path.join(out_dir, r["seg"]) for r in segs]
    docmeta = _union_read(spark, [os.path.join(p, "docmeta") for p in paths])
    postings = _union_read(spark, [os.path.join(p, "postings") for p in paths])
    term_stats = (
        _union_read(spark, [os.path.join(p, "term_stats") for p in paths])
        .groupBy("term")
        .agg(F.sum("df").alias("df"), F.sum("ttf").alias("ttf"))
    )
    # liveDocs: tombstones anti-join the row-level tables. Collection stats
    # (doc_count/avgdl) and term_stats df/ttf intentionally keep counting
    # deleted docs until a merge reclaims them — exactly Lucene's semantics
    # (CollectionStatistics uses maxDoc-level counts; IDF drifts until
    # expungeDeletes).
    from .deletes import read_deletes

    deletes = read_deletes(spark, out_dir)
    if deletes is not None:
        docmeta = docmeta.join(deletes, "doc_id", "left_anti")
        postings = postings.join(deletes, "doc_id", "left_anti")
    n_docs = sum(r["n_docs"] for r in segs)
    sum_ttf = sum(r["sum_ttf"] for r in segs)
    out = {
        "docmeta": docmeta,
        "postings": postings,
        "term_stats": term_stats,
        "stats": {
            "doc_count": n_docs,
            "sum_total_term_freq": sum_ttf,
            "avgdl": (sum_ttf / n_docs) if n_docs else 0.0,
            "profile": man["profile"],
            "num_buckets": man["num_buckets"],
        },
        "manifest": man,
        "dir": out_dir,
    }
    if deletes is not None:
        out["deletes"] = deletes
    packed_paths = [
        os.path.join(p, "packed")
        for p in paths
        if os.path.isdir(os.path.join(p, "packed"))
    ]
    if len(packed_paths) == len(paths):
        out["packed"] = _union_read(spark, packed_paths)
    return out


def lineage_df(spark: SparkSession, out_dir: str) -> DataFrame:
    """Per-unit lineage + metrics as a DataFrame (the build_manifest table
    of SURVEY.md §5.3 item 7)."""
    man = read_manifest(out_dir) or {"segments": {}}
    # manifest keys are "<unit>" for plain builds but "m<unit>" after
    # compaction and "s<epoch>" for stream ingest — parse defensively
    rows = [
        (
            int(u) if str(u).isdigit() else None,
            r["seg"],
            r["status"],
            r.get("n_docs"),
            r.get("sum_ttf"),
            r.get("wall_s"),
            r.get("attempt"),
            r.get("fingerprint"),
        )
        for u, r in man["segments"].items()
    ]
    return spark.createDataFrame(
        rows,
        "unit int, seg string, status string, n_docs long, sum_ttf long, "
        "wall_s double, attempt int, fingerprint string",
    )


def add_indexes(spark: SparkSession, dst_dir: str, src_dir: str) -> dict:
    """IndexWriter.addIndexes: bulk-import every live segment of `src_dir`
    into `dst_dir` (lucene/core/.../index/IndexWriter.java addIndexes
    ≈L2900 — the CodecReader overload, which REWRITES incoming segments
    rebasing doc ids; the Directory overload's file-copy shortcut is
    impossible here because our ids are globally stable, so colliding
    unit ranges must genuinely move).

    Rebase: one constant shift K·UNIT_CAPACITY applied to every imported
    doc_id, with K = max(dst units)+1 − min(src units) — unit structure
    is preserved and the shifted ranges land strictly above every
    existing dst unit, so ids stay collision-free and dense-per-unit.
    Per imported segment: postings/docmeta are rewritten with the shifted
    id (one narrow map + the same partitioned layout), src tombstones are
    reclaimed during the rewrite (addIndexes drops deleted docs), packed
    blocks are re-encoded from the rewritten postings (block keys derive
    from doc ids), and term_stats re-aggregate from them. Each segment
    commits atomically — a crash mid-import loses only the in-flight
    segment, and re-running resumes (same "a<unit>" key check).

    Requires identical analyzer profile and num_buckets (Lucene likewise
    leaves codec/analyzer compatibility to the caller; bucket values are
    pmod(xxhash64(term), num_buckets) so a mismatch would mis-place rows).
    """
    man = read_manifest(dst_dir)
    sman = read_manifest(src_dir)
    if not man or not sman:
        raise FileNotFoundError("both dst and src must have manifests")
    if man["profile"] != sman["profile"]:
        raise ValueError("analyzer profile mismatch")
    if man["num_buckets"] != sman["num_buckets"]:
        raise ValueError("num_buckets mismatch")
    num_buckets = man["num_buckets"]
    dst_units = {u for r in live_segments(man) for u in r["units"]}
    src_segs = sorted(live_segments(sman), key=lambda r: min(r["units"]))
    if not src_segs:
        return man
    src_min = min(u for r in src_segs for u in r["units"])
    shift_units = (max(dst_units, default=-1) + 1) - src_min
    shift = shift_units * UNIT_CAPACITY

    from .deletes import read_deletes

    sdel = read_deletes(spark, src_dir)
    # resume/idempotence is keyed on SOURCE identity: the unit shift is
    # recomputed from the current dst manifest, so after a partial import
    # the remaining segments get a different shift — the already-imported
    # ones must be recognized by where they came from, not by unit number
    already = {
        r.get("imported_from")
        for r in man["segments"].values()
        if r.get("status") == "done"
    }
    for rec in src_segs:
        if f"{src_dir}:{rec['seg']}" in already:
            continue  # resume: already imported
        new_units = sorted(u + shift_units for u in rec["units"])
        key = f"a{new_units[0]}"
        if rec.get("n_docs", 0) == 0:
            continue  # empty segment (e.g. an empty build unit): nothing to import
        seg = f"a_{new_units[0]:05d}"
        new_dir = os.path.join(dst_dir, seg)
        src_seg = os.path.join(src_dir, rec["seg"])
        t0 = time.perf_counter()

        docmeta = spark.read.parquet(os.path.join(src_seg, "docmeta"))
        if sdel is not None:
            docmeta = docmeta.join(sdel, "doc_id", "left_anti")
        docmeta = docmeta.withColumn("doc_id", F.col("doc_id") + F.lit(shift))
        if sdel is None:
            n_docs, sum_ttf = rec["n_docs"], rec["sum_ttf"]
        else:
            agg = docmeta.agg(
                F.count("*").alias("n"), F.sum("field_len").alias("s")
            ).collect()[0]
            n_docs, sum_ttf = int(agg["n"]), int(agg["s"] or 0)
            if n_docs == 0:
                continue  # every doc tombstoned: reclaimed, nothing to import
        docmeta.repartitionByRange(
            max(spark.sparkContext.defaultParallelism, 1), "doc_id"
        ).write.mode("overwrite").parquet(os.path.join(new_dir, "docmeta"))

        post = spark.read.parquet(os.path.join(src_seg, "postings"))
        if sdel is not None:
            post = post.join(sdel, "doc_id", "left_anti")
        post = post.withColumn("doc_id", F.col("doc_id") + F.lit(shift))
        post.repartition(num_buckets, "bucket").sortWithinPartitions(
            "term", "doc_id"
        ).write.mode("overwrite").partitionBy("bucket").parquet(
            os.path.join(new_dir, "postings")
        )
        rewritten = spark.read.parquet(os.path.join(new_dir, "postings"))

        if os.path.isdir(os.path.join(src_seg, "packed")):
            from .indexer import write_packed_postings

            write_packed_postings(
                rewritten.select("term", "doc_id", "tf", "dlq"),
                new_dir,
                num_buckets,
            )

        ts = rewritten.groupBy("term").agg(
            F.count("*").alias("df"), F.sum("tf").alias("ttf")
        ).withColumn(
            "bucket", F.pmod(F.xxhash64("term"), F.lit(num_buckets)).cast("int")
        )
        ts.repartition(num_buckets, "bucket").write.mode(
            "overwrite"
        ).partitionBy("bucket").parquet(os.path.join(new_dir, "term_stats"))

        man = read_manifest(dst_dir)
        man["segments"][key] = {
            "seg": seg,
            "status": "done",
            "units": new_units,
            "n_docs": n_docs,
            "sum_ttf": sum_ttf,
            "wall_s": round(time.perf_counter() - t0, 3),
            "attempt": 1,
            "fingerprint": rec.get("fingerprint"),
            "imported_from": f"{src_dir}:{rec['seg']}",
        }
        write_manifest(dst_dir, man)
    return read_manifest(dst_dir)
