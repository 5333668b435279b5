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


def write_manifest(out_dir: str, man: dict) -> None:
    """Atomic commit point (segments_N / Iceberg-snapshot analog)."""
    man = dict(man, generation=man.get("generation", 0) + 1)
    tmp = _manifest_path(out_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(man, f, indent=1, sort_keys=True)
    os.replace(tmp, _manifest_path(out_dir))


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


def read_segmented(spark: SparkSession, out_dir: str) -> dict:
    """Open a segmented index as one logical index (Searcher/WAND-ready).

    term_stats are re-aggregated across segments (exact global df/ttf —
    ExactStatsCache semantics, free because units partition the docs).
    """
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
