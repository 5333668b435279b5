"""Vector fields stored IN the index — Lucene 9 vector search parity.

Reference parity:
  * KnnVectorsFormat / Lucene99HnswVectorsFormat — lucene/core/.../codecs/
    lucene99/: each indexed vector field stores per-doc float vectors +
    a search structure beside the postings; FieldInfos records the field,
    similarity and dimension.
  * KnnFloatVectorQuery — lucene/core/.../search/KnnFloatVectorQuery.java:
    top-k nearest with optional filter; deleted docs are skipped
    (liveDocs); with a selective filter Lucene falls back to exact search
    over the filtered subset.

Spark restatement: ``<index>/vectors/<field>/data`` is a parquet table
(doc_id, vector) PARTITIONED BY the coarse-quantizer cell, plus a JSON
sidecar with the quantizer spec. HNSW is a pointer-chasing in-RAM graph
— the wrong structure for object storage at 10^12 docs — so the scale
structure here is IVF: the probe is a partition-pruned scan of the
nprobe nearest cells (Iceberg/parquet partition pruning does the work),
exact cosine inside. Two quantizers:

  * ``kmeans``      — spark.ml KMeans trained on a bounded sample
                      (production path; centroids in the sidecar).
  * ``hyperplane``  — closed-form sign-pattern cells (deterministic, so
                      an ANSI-SQL oracle can restate the probe exactly).

``knn_field_search`` composes with the rest of the index: soft-deleted
docs are masked via docvalues.live_filter (Lucene liveDocs), and a
filter frame gives filtered kNN (top-k AMONG allowed docs).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pipeline.similarity import (
    _dot,
    as_double,
    cosine_topk,
    hyperplane_planes,
    ivf_train,
)
from .segments import read_manifest, write_manifest

VECTORS_DIR = "vectors"


def _field_dir(out_dir: str, field: str) -> str:
    return os.path.join(out_dir, VECTORS_DIR, field)


def add_vector_field(
    spark: SparkSession,
    out_dir: str,
    vectors: DataFrame,
    field: str = "vec",
    quantizer: str = "kmeans",
    n_centroids: int = 16,
    n_planes: int = 3,
    seed: int = 42,
    vec_col: str = "vector",
) -> dict:
    """Attach a vector field to an existing index directory.

    ``vectors``: (doc_id, <vec_col> array). Writes the IVF-partitioned
    data table + quantizer sidecar and records the field in the manifest
    (the FieldInfos entry). Returns the sidecar meta dict."""
    fdir = _field_dir(out_dir, field)
    v = vectors.select(
        F.col("doc_id").cast("long"), as_double(F.col(vec_col)).alias("vector")
    )
    dim = len(v.select("vector").first()["vector"])
    if quantizer == "kmeans":
        assigned, centroids = ivf_train(
            v, n_centroids=n_centroids, seed=seed, vec_col="vector"
        )
        meta = {"quantizer": "kmeans", "centroids": centroids, "dim": dim}
        data = assigned.select("doc_id", "vector", F.col("centroid").alias("cell"))
    elif quantizer == "hyperplane":
        planes = hyperplane_planes(n_planes, dim, seed)
        cell = F.lit(0)
        for i in range(n_planes):
            p = F.array(*[F.lit(float(x)) for x in planes[i]])
            cell = cell + F.when(
                _dot(F.col("vector"), p) > 0, F.lit(1 << i)
            ).otherwise(F.lit(0))
        meta = {
            "quantizer": "hyperplane",
            "planes": [[float(x) for x in row] for row in planes],
            "dim": dim,
        }
        data = v.withColumn("cell", cell)
    else:
        raise ValueError(f"unknown quantizer {quantizer!r}")
    data.write.mode("overwrite").partitionBy("cell").parquet(
        os.path.join(fdir, "data")
    )
    with open(os.path.join(fdir, "meta.json"), "w") as f:
        json.dump(meta, f)
    man = read_manifest(out_dir) or {}
    fields = man.setdefault("vector_fields", {})
    fields[field] = {"quantizer": meta["quantizer"], "dim": dim}
    write_manifest(out_dir, man)
    return meta


def read_vector_field(spark: SparkSession, out_dir: str, field: str):
    fdir = _field_dir(out_dir, field)
    with open(os.path.join(fdir, "meta.json")) as f:
        meta = json.load(f)
    return spark.read.parquet(os.path.join(fdir, "data")), meta


def _probe_cells(meta: dict, query_vec: list, nprobe: int) -> list[int]:
    import numpy as np

    q = np.asarray(query_vec, dtype=np.float64)
    if meta["quantizer"] == "kmeans":
        c = np.asarray(meta["centroids"], dtype=np.float64)
        sims = (c @ q) / (
            np.linalg.norm(c, axis=1) * np.linalg.norm(q) + 1e-12
        )
        return [int(i) for i in np.argsort(-sims)[:nprobe]]
    planes = np.asarray(meta["planes"], dtype=np.float64)
    n_planes = planes.shape[0]
    cell = sum((1 << i) for i in range(n_planes) if float(planes[i] @ q) > 0)
    # own cell + single-bit multiprobe neighbors, capped at nprobe.
    # Flip order matters when nprobe < n_planes+1: probe the cells across
    # the hyperplanes the query is CLOSEST to first (smallest |margin| =
    # most likely to hide true neighbors — Lv et al. 2007 multi-probe
    # LSH), not fixed bit order.
    margins = np.abs(planes @ q)
    flips = [int(i) for i in np.argsort(margins, kind="stable")]
    return ([cell] + [cell ^ (1 << i) for i in flips])[:nprobe]


def knn_field_search(
    spark: SparkSession,
    out_dir: str,
    field: str,
    query_vec: list,
    k: int = 10,
    nprobe: int = 3,
    live: bool = True,
    filter_df: DataFrame | None = None,
) -> DataFrame:
    """KnnFloatVectorQuery over an indexed vector field: rank cells
    driver-side against the tiny quantizer sidecar, scan ONLY the nprobe
    probed partitions (parquet partition pruning), exact cosine within.
    ``live=True`` masks soft-deleted docs (liveDocs); ``filter_df``
    (doc_id rows) restricts to an allowed set (filtered kNN)."""
    data, meta = read_vector_field(spark, out_dir, field)
    cells = _probe_cells(meta, query_vec, nprobe)
    cand = data.filter(F.col("cell").isin(cells))
    if filter_df is not None:
        cand = cand.join(F.broadcast(filter_df.select("doc_id")), "doc_id", "left_semi")
    if live:
        from .docvalues import live_filter

        cand = live_filter(spark, out_dir, cand)
    return cosine_topk(cand, [float(x) for x in query_vec], k,
                       id_col="doc_id", vec_col="vector")
