"""Delete-by-query and atomic-update MERGE over the segmented index.

Lucene/Solr parity (SURVEY.md §3.12):
  * IndexWriter#deleteDocuments(Query) -> liveDocs bits; deletes apply at
    SEARCH time per segment and are physically reclaimed at merge
    (SegmentMerger skips deleted docs). Collection stats (docCount, avgdl)
    keep counting deleted docs until they are merged away — we mirror that.
  * Solr atomic update (DistributedUpdateProcessor ≈L1100) = read current
    doc, apply ops, index the new version, tombstone the old one.

Ours: tombstones are append-only parquet under <index>/_deletes/gen_*/
(doc_id rows). Each delete batch is one atomic parquet write + one manifest
commit. read_segmented anti-joins them into docmeta/postings (the liveDocs
filter); WandSearcher masks them after per-block scoring; merge/compact
physically drops tombstoned rows. Tombstones are retired on full
compaction; stale tombstones are harmless because unit-ranged doc ids are
never recycled (a replacement doc gets a fresh id range).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .segments import read_manifest, read_segmented, write_manifest

DELETES_DIR = "_deletes"


def deletes_path(out_dir: str) -> str:
    return os.path.join(out_dir, DELETES_DIR)


def read_deletes(spark: SparkSession, out_dir: str) -> DataFrame | None:
    """All tombstoned doc_ids, or None if no deletes were ever committed."""
    p = deletes_path(out_dir)
    if not os.path.isdir(p) or not any(os.scandir(p)):
        return None
    gens = [os.path.join(p, d) for d in sorted(os.listdir(p))]
    dfs = [spark.read.parquet(g) for g in gens]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out.select("doc_id").distinct()


def _commit_tombstones(
    spark: SparkSession, out_dir: str, ids: DataFrame, reason: str
) -> int:
    """Write one tombstone generation atomically, then bump the manifest
    (the commit point — a crash between the two leaves an uncommitted but
    harmless extra tombstone file, at-least-once delete semantics)."""
    man = read_manifest(out_dir)
    gen = man.get("generation", 0)
    dest = os.path.join(deletes_path(out_dir), f"gen_{gen:06d}_{int(time.time()*1000)}")
    ids = ids.select("doc_id").distinct()
    ids.write.mode("overwrite").parquet(dest)
    n = spark.read.parquet(dest).count()
    man.setdefault("delete_log", []).append({"path": os.path.basename(dest),
                                             "n_docs": n, "reason": reason})
    write_manifest(out_dir, man)
    return n


def delete_by_query(spark: SparkSession, out_dir: str, query) -> int:
    """IndexWriter#deleteDocuments(Query): resolve the query against the
    LIVE index (existing tombstones already applied) and tombstone every
    match. Returns the number of newly deleted docs."""
    from .search import Searcher

    idx = read_segmented(spark, out_dir)
    s = Searcher(idx)
    matches = s.score_all(query).select("doc_id").distinct()
    return _commit_tombstones(spark, out_dir, matches, f"query:{query!r}")


def delete_by_ids(spark: SparkSession, out_dir: str, doc_ids: list[int]) -> int:
    ids = spark.createDataFrame([(int(i),) for i in doc_ids], "doc_id long")
    return _commit_tombstones(spark, out_dir, ids, "ids")


def expire_ttl(
    spark: SparkSession, out_dir: str, age_df: DataFrame
) -> int:
    """TTL (Solr DocExpirationUpdateProcessor): caller supplies the expired
    doc set as a DataFrame with a doc_id column (e.g. docmeta joined to an
    expiry column and filtered on now); we tombstone it."""
    return _commit_tombstones(spark, out_dir, age_df.select("doc_id"), "ttl")


class VersionConflict(Exception):
    """Optimistic-concurrency failure (Solr: version conflict 409)."""


def atomic_update(
    spark: SparkSession, out_dir: str, updates: DataFrame,
    expected_version: int | None = None,
) -> dict:
    """Solr atomic-update MERGE: for each incoming (url, lang, text) row,
    tombstone the currently-live doc with that url (if any) and index the
    new version as a fresh segment with a fresh id range (ids are never
    recycled).

    `_version_` optimistic concurrency (Solr DistributedUpdateProcessor
    version gate ≈L1200): the manifest generation is the index's version;
    pass `expected_version` (a generation previously read via
    read_manifest) and the update is REJECTED with VersionConflict if
    another writer committed in between — read-check-write at snapshot
    granularity, the same contract Solr enforces per doc.

    One tombstone commit + one segment build + one manifest commit; a crash
    between them resumes safely (the tombstone is idempotent, the segment
    build is keyed by a fresh unit id)."""
    from .indexer import build_index
    from .segments import UNIT_CAPACITY

    man = read_manifest(out_dir)
    if expected_version is not None and man.get("generation", 0) != expected_version:
        raise VersionConflict(
            f"expected generation {expected_version}, "
            f"index is at {man.get('generation', 0)}"
        )
    old = read_segmented(spark, out_dir)["docmeta"].select("doc_id", "url")
    stale = old.join(
        F.broadcast(updates.select("url").distinct()), "url", "left_semi"
    ).select("doc_id")
    _commit_tombstones(spark, out_dir, stale, "atomic_update")

    man = read_manifest(out_dir)
    gen = man.get("generation", 0)
    key = f"a{gen}"
    seg = f"seg_a{gen:05d}"
    seg_dir = os.path.join(out_dir, seg)
    # id range disjoint from plain units (u < n_units) and stream epochs
    # ((1<<20)+epoch): atomic updates live at (1<<21)+gen
    doc_base = ((1 << 21) + gen) * UNIT_CAPACITY
    t0 = time.perf_counter()
    stats = build_index(
        spark,
        updates,
        seg_dir,
        profile=man["profile"],
        num_buckets=man["num_buckets"],
        doc_base=doc_base,
    )
    man = read_manifest(out_dir)
    man["segments"][key] = {
        "seg": seg,
        "status": "done",
        "units": [],
        "n_docs": stats["doc_count"],
        "sum_ttf": stats["sum_total_term_freq"],
        "wall_s": round(time.perf_counter() - t0, 3),
        "attempt": 1,
        "fingerprint": f"atomic:{gen}",
    }
    write_manifest(out_dir, man)
    return man["segments"][key]
