"""Vector field stored in the index (vectors.py): IVF-partitioned layout,
partition-pruned probe, liveDocs masking, filtered kNN."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.vectors import (
    add_vector_field,
    knn_field_search,
    read_vector_field,
)


@pytest.fixture(scope="module")
def vf_idx(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("vfidx"))
    rng = np.random.default_rng(11)
    # 3 well-separated clusters of 30 vectors each, dim 8
    centers = rng.standard_normal((3, 8)) * 10
    rows = []
    for c in range(3):
        for j in range(30):
            v = centers[c] + rng.standard_normal(8) * 0.1
            rows.append((c * 100 + j, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "doc_id long, vector array<double>")
    meta = add_vector_field(
        spark, out, df, field="vec", quantizer="kmeans", n_centroids=3,
        seed=5,
    )
    return out, rows, meta


def _brute_topk(rows, qv, k, exclude=()):
    q = np.asarray(qv)
    scored = []
    for i, v in rows:
        if i in exclude:
            continue
        v = np.asarray(v)
        scored.append((float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q))), i))
    scored.sort(key=lambda t: (-t[0], t[1]))
    return [i for _, i in scored[:k]]


def test_kmeans_field_probe_recall(spark, vf_idx):
    out, rows, _ = vf_idx
    qv = rows[5][1]  # a cluster-0 member
    got = [
        r["doc_id"]
        for r in knn_field_search(spark, out, "vec", qv, k=10, nprobe=1,
                                  live=False).collect()
    ]
    want = _brute_topk(rows, qv, 10)
    # clusters are well separated: nprobe=1 is exact here
    assert got == want


def test_probe_is_partition_pruned(spark, vf_idx):
    out, rows, _ = vf_idx
    plan = (
        knn_field_search(spark, out, "vec", rows[0][1], k=5, nprobe=1,
                         live=False)
        ._jdf.queryExecution().executedPlan().toString()
    )
    import re

    m = re.search(r"PartitionFilters: \[[^\]]*cell", plan)
    assert m, "probe must push a partition filter on the cell column"


def test_filtered_knn(spark, vf_idx):
    out, rows, _ = vf_idx
    qv = rows[5][1]
    allowed = spark.createDataFrame(
        [(i,) for i, _ in rows if i % 2 == 0], "doc_id long"
    )
    got = [
        r["doc_id"]
        for r in knn_field_search(
            spark, out, "vec", qv, k=5, nprobe=1, live=False,
            filter_df=allowed,
        ).collect()
    ]
    assert all(i % 2 == 0 for i in got)
    want = [i for i in _brute_topk(rows, qv, 100) if i % 2 == 0][:5]
    assert got == want


def test_live_docs_masking(spark, vf_idx):
    out, rows, _ = vf_idx
    from lucene_solr_spark.docvalues import soft_delete

    qv = rows[5][1]
    before = [
        r["doc_id"]
        for r in knn_field_search(spark, out, "vec", qv, k=3, nprobe=1).collect()
    ]
    soft_delete(
        spark, out, spark.createDataFrame([(before[0],)], "doc_id long")
    )
    after = [
        r["doc_id"]
        for r in knn_field_search(spark, out, "vec", qv, k=3, nprobe=1).collect()
    ]
    assert before[0] not in after


def test_manifest_records_field(spark, vf_idx):
    out, _, meta = vf_idx
    from lucene_solr_spark.segments import read_manifest

    man = read_manifest(out)
    assert man["vector_fields"]["vec"]["quantizer"] == "kmeans"
    data, meta2 = read_vector_field(spark, out, "vec")
    assert meta2["dim"] == 8 and data.count() == 90
