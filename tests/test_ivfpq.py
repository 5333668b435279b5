"""IVF-PQ composition (IVFADC): recall vs brute-force cosine on the
driver embeddings table, partition-prune plan assertion on a
centroid-partitioned codes table, and residual-encoding sanity."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))


@pytest.fixture(scope="module")
def built(spark, emb):
    from lucene_solr_spark.pipeline.pq import ivfpq_build

    codes, centroids, cb = ivfpq_build(
        emb, n_centroids=16, m=16, ksub=32, seed=42
    )
    return codes.persist(), centroids, cb


def _queries(emb, n=10):
    rows = emb.orderBy("vec_id").limit(n).collect()
    return [(r["vec_id"], list(map(float, r["embedding"]))) for r in rows]


def test_recall_at_10_vs_brute(spark, emb, built):
    """Verdict bar: recall@10 >= 0.9 vs brute-force cosine at sf0.1.

    Probe-ratio note: the synthetic embeddings are near-random unit
    vectors (top-10 cosines ~0.3-0.4, neighbor cells near-uniform), so
    the coarse quantizer cannot concentrate true neighbors — hitting
    0.9 needs nprobe=12/16. On clustered real corpora the same code
    prunes far harder at the same recall; the prune MECHANISM (cell
    partition filter reaching the scan) is what the plan test pins."""
    from lucene_solr_spark.pipeline.pq import ivfpq_topk
    from lucene_solr_spark.pipeline.similarity import cosine_topk

    codes, centroids, cb = built
    hits = total = 0
    for _vid, q in _queries(emb, n=8):
        truth = {
            r["vec_id"]
            for r in cosine_topk(emb, q, k=10).collect()
        }
        got = {
            r["vec_id"]
            for r in ivfpq_topk(
                emb, codes, centroids, cb, q, nprobe=12, candidates=192, k=10
            ).collect()
        }
        hits += len(truth & got)
        total += len(truth)
    recall = hits / total
    assert recall >= 0.9, f"recall@10 = {recall:.3f}"


def test_partition_prune_plan(spark, built, tmp_path):
    """The production layout: codes written partitionBy('centroid');
    the probe's filter must reach the scan as a PartitionFilters entry
    (the scan reads nprobe directories, not the corpus)."""
    codes, _centroids, _cb = built
    path = str(tmp_path / "codes")
    codes.write.partitionBy("centroid").parquet(path)
    on_disk = spark.read.parquet(path)
    plan = (
        on_disk.filter(F.col("centroid").isin([1, 3, 5]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan
    assert "centroid" in plan.split("PartitionFilters", 1)[1][:200]


def test_residual_codes_differ_from_raw(emb, built):
    """Residual encoding is real: the same corpus PQ-encoded raw vs
    residual yields different codes for most vectors (the residual
    distribution is re-centered per cell)."""
    from lucene_solr_spark.pipeline.pq import pq_encode, pq_train

    codes, _centroids, cb = built
    raw_cb = pq_train(emb, m=16, ksub=32, seed=42)
    raw_codes = pq_encode(emb, raw_cb)
    j = codes.select("vec_id", F.col("pq_code").alias("res_code")).join(
        raw_codes.select("vec_id", F.col("pq_code").alias("raw_code")),
        "vec_id",
    )
    diff = j.filter(F.col("res_code") != F.col("raw_code")).count()
    assert diff > j.count() * 0.5


def test_shortlist_contains_exact_top1(spark, emb, built):
    """The query's own vector (unit-norm corpus: cosine 1.0 with itself)
    must survive the ADC shortlist and rank first after rerank."""
    from lucene_solr_spark.pipeline.pq import ivfpq_topk

    codes, centroids, cb = built
    for vid, q in _queries(emb, n=4):
        top = ivfpq_topk(
            emb, codes, centroids, cb, q, nprobe=12, candidates=192, k=3
        ).collect()
        assert top and top[0]["vec_id"] == vid
