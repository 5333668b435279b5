"""LambdaMART training (operators/ml.py lambdamart_train): the trained
ensemble must (a) be consumable by the MultipleAdditiveTreesModel
evaluator (ltr_trees_rescore), (b) improve NDCG@10 monotonically-ish
over boosting rounds on synthetic ranking data, (c) clearly beat the
untrained baseline."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def rankdata(spark):
    """40 queries x 20 candidates; relevance = noisy monotone function of
    f1 with a weaker f2 term — learnable, not memorizable."""
    import random

    rng = random.Random(7)
    rows = []
    for q in range(40):
        for d in range(20):
            f1 = rng.random()
            f2 = rng.random()
            f3 = rng.random()  # pure noise feature
            rel = 3.0 * f1 + 1.0 * f2 + 0.6 * rng.random()
            label = float(min(4, int(rel)))
            rows.append((f"q{q}", d, label, f1, f2, f3))
    return spark.createDataFrame(
        rows, "qid string, doc_id long, label double, f1 double, f2 double, f3 double"
    ).persist()


def test_train_improves_ndcg(rankdata):
    from lucene_solr_spark.operators.ml import lambdamart_train, ndcg_at_k
    from lucene_solr_spark.operators.search_features import _tree_column

    feats = ["f1", "f2", "f3"]
    trees = lambdamart_train(
        rankdata, "qid", "label", feats, n_trees=8, lr=0.2, max_depth=3
    )
    assert len(trees) == 8 and all("root" in t for t in trees)

    def score_col(ts):
        s = F.lit(0.0)
        for t in ts:
            s = s + F.lit(float(t["weight"])) * _tree_column(t["root"])
        return s

    base = ndcg_at_k(
        rankdata.withColumn("s", F.lit(0.0) + F.col("f3") * 0.0 + F.rand(1)),
        "qid", "label", "s", k=10,
    )
    after2 = ndcg_at_k(
        rankdata.withColumn("s", score_col(trees[:2])), "qid", "label", "s", 10
    )
    after8 = ndcg_at_k(
        rankdata.withColumn("s", score_col(trees)), "qid", "label", "s", 10
    )
    assert after8 > base + 0.05, (base, after2, after8)
    assert after8 >= after2 - 1e-9, (after2, after8)
    assert after8 > 0.9, after8  # strong signal is learnable


def test_trained_model_feeds_evaluator(rankdata):
    """End-to-end: the trained trees drop into ltr_trees_rescore (the
    Solr MultipleAdditiveTreesModel evaluator) unchanged."""
    from lucene_solr_spark.operators.ml import lambdamart_train
    from lucene_solr_spark.operators.search_features import ltr_trees_rescore

    trees = lambdamart_train(
        rankdata, "qid", "label", ["f1", "f2", "f3"],
        n_trees=4, lr=0.2, max_depth=3,
    )
    one_q = rankdata.filter(F.col("qid") == "q0")
    top = ltr_trees_rescore(one_q, features={}, trees=trees, k=5).collect()
    assert len(top) == 5
    # the reranked top-5 should be label-better on average than the
    # bottom-5 of the same query
    top_ids = [r["doc_id"] for r in top]
    labels = {r["doc_id"]: r["label"] for r in one_q.collect()}
    mean_top = sum(labels[i] for i in top_ids) / 5
    mean_all = sum(labels.values()) / len(labels)
    assert mean_top > mean_all
