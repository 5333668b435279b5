"""Numeric DocValues updates and soft deletes.

Lucene parity:
  * IndexWriter#updateNumericDocValue(term, field, value) —
    lucene/core/.../index/IndexWriter.java (≈L1900): change a per-doc
    numeric value WITHOUT reindexing the document. Updates are buffered
    and written as docvalues-update files per segment
    (FieldUpdatesBuffer / ReadersAndUpdates); readers overlay the latest
    generation on the base docvalues; merges bake the updates into the
    merged segment and the update files are dropped.
  * Soft deletes — IndexWriterConfig#setSoftDeletesField +
    SoftDeletesRetentionMergePolicy: a "delete" is just a numeric
    docvalues update on the soft-deletes field; searches filter on it
    (liveDocs derived from docvalues), collection stats keep counting the
    doc until a merge actually drops it, and the retention merge policy
    may KEEP soft-deleted docs matching a retention query (point-in-time
    readers / CDC).

Spark restatement: append-only parquet generations under
``<index>/_dv_updates/`` with rows (doc_id, field, value, seq) — the
same atomic write + manifest-commit protocol as deletes.py tombstones.
``resolve_docvalues`` overlays latest-seq-wins updates on a base column
via one left join (the update log is tiny next to the corpus — Spark
broadcasts it; at 10^12 docs a large log shuffles on doc_id, the same
key docmeta is already range-partitioned by). ``fold_docvalues``
(the merge) bakes updates into a new docmeta generation and retires the
log. Soft deletes ride the same machinery on the reserved field
``__soft_deletes``; ``fold`` takes a retention predicate.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .segments import read_manifest, write_manifest

DV_DIR = "_dv_updates"
SOFT_DELETES_FIELD = "__soft_deletes"


def _dv_path(out_dir: str) -> str:
    return os.path.join(out_dir, DV_DIR)


def update_numeric_docvalues(
    spark: SparkSession, out_dir: str, updates: DataFrame, field: str
) -> int:
    """Commit one generation of (doc_id, value) updates for ``field``.
    Returns the generation's seq (monotone — later generations win)."""
    man = read_manifest(out_dir) or {}
    seq = int(man.get("dv_seq", 0)) + 1
    dest = os.path.join(_dv_path(out_dir), f"gen_{seq:06d}")
    (
        updates.select(
            F.col("doc_id").cast("long"),
            F.lit(field).alias("field"),
            F.col("value").cast("double"),
            F.lit(seq).cast("long").alias("seq"),
        )
        .write.mode("overwrite")
        .parquet(dest)
    )
    man["dv_seq"] = seq
    man.setdefault("dv_log", []).append(
        {"path": os.path.basename(dest), "field": field,
         "ts": int(time.time() * 1000)}
    )
    write_manifest(out_dir, man)
    return seq


def read_dv_updates(
    spark: SparkSession, out_dir: str, field: str | None = None
) -> DataFrame | None:
    """Union of all committed update generations (doc_id, field, value,
    seq), optionally one field; None if no updates exist."""
    p = _dv_path(out_dir)
    if not os.path.isdir(p) or not any(os.scandir(p)):
        return None
    spark_df = spark.read.parquet(os.path.join(p, "gen_*"))
    if field is not None:
        spark_df = spark_df.filter(F.col("field") == field)
    return spark_df


def latest_dv(
    spark: SparkSession, out_dir: str, field: str
) -> DataFrame | None:
    """(doc_id, value) of the LATEST update per doc for ``field``
    (max-seq-wins — ReadersAndUpdates picks the highest delGen).

    A single generation can carry two rows for one doc_id (caller
    submitted duplicates in one batch); they share the seq, so the plain
    (doc_id, max seq) join would fan out and resolve_docvalues would
    duplicate base rows. Dedupe with a deterministic max(value) tiebreak
    within the winning generation — DataFrames carry no row order, so
    "last submitted wins" is not definable; max is stable across runs."""
    u = read_dv_updates(spark, out_dir, field)
    if u is None:
        return None
    mx = u.groupBy("doc_id").agg(F.max("seq").alias("seq"))
    return (
        u.join(mx, ["doc_id", "seq"])
        .groupBy("doc_id")
        .agg(F.max("value").alias("value"))
    )


def resolve_docvalues(
    spark: SparkSession,
    out_dir: str,
    base: DataFrame,
    field: str,
    base_col: str | None = None,
) -> DataFrame:
    """Overlay the update log on ``base`` (must carry doc_id): the output
    has column ``field`` = latest update if any, else ``base_col`` (or
    null when the field only exists as updates). One broadcast left join."""
    lat = latest_dv(spark, out_dir, field)
    fallback = F.col(base_col) if base_col else F.lit(None).cast("double")
    if lat is None:
        return base.withColumn(field, fallback.cast("double"))
    lat = lat.withColumnRenamed("value", "_dv_new")
    return (
        base.join(F.broadcast(lat), "doc_id", "left")
        .withColumn(field, F.coalesce("_dv_new", fallback.cast("double")))
        .drop("_dv_new")
    )


# ---- soft deletes ----------------------------------------------------------

def soft_delete(spark: SparkSession, out_dir: str, ids: DataFrame) -> int:
    """Soft-delete docs (ids: frame with doc_id) = a numeric docvalues
    update __soft_deletes := 1 (softUpdateDocument's device)."""
    return update_numeric_docvalues(
        spark, out_dir,
        ids.select("doc_id", F.lit(1.0).alias("value")),
        SOFT_DELETES_FIELD,
    )


def soft_undelete(spark: SparkSession, out_dir: str, ids: DataFrame) -> int:
    """Clear the soft-delete flag (a later-generation update wins)."""
    return update_numeric_docvalues(
        spark, out_dir,
        ids.select("doc_id", F.lit(0.0).alias("value")),
        SOFT_DELETES_FIELD,
    )


def live_filter(spark: SparkSession, out_dir: str, df: DataFrame) -> DataFrame:
    """Mask soft-deleted docs out of any (doc_id, ...) frame — the
    liveDocs bitset derived from the soft-deletes docvalues field.
    Collection stats are NOT touched (Lucene counts soft-deleted docs
    until merge)."""
    lat = latest_dv(spark, out_dir, SOFT_DELETES_FIELD)
    if lat is None:
        return df
    dead = lat.filter(F.col("value") == 1.0).select("doc_id")
    return df.join(F.broadcast(dead), "doc_id", "left_anti")


def fold_docvalues(
    spark: SparkSession,
    out_dir: str,
    docmeta: DataFrame,
    numeric_fields: dict | None = None,
    retention: "F.Column | None" = None,
) -> DataFrame:
    """The merge step (ReadersAndUpdates#writeFieldUpdates +
    SoftDeletesRetentionMergePolicy): bake latest updates into docmeta
    columns (``numeric_fields``: {field: base_col_or_None}) and DROP
    soft-deleted docs — except those matching ``retention`` (a boolean
    Column over the docmeta row), which are kept still-soft-deleted.
    Returns the merged docmeta; caller rewrites the table and may retire
    the _dv_updates log (generations <= current dv_seq)."""
    out = docmeta
    for fld, base_col in (numeric_fields or {}).items():
        out = resolve_docvalues(spark, out_dir, out, fld, base_col)
    lat = latest_dv(spark, out_dir, SOFT_DELETES_FIELD)
    if lat is not None:
        dead = lat.filter(F.col("value") == 1.0).select(
            "doc_id", F.lit(True).alias("_sd")
        )
        out = out.join(F.broadcast(dead), "doc_id", "left")
        keep = F.col("_sd").isNull()
        if retention is not None:
            keep = keep | retention
        out = out.filter(keep).drop("_sd")
    return out
