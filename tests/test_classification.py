"""Lucene classification-module semantics (operators/classification.py):
SimpleNaiveBayes, KNearestNeighbor, BooleanPerceptron (batch variant).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.operators.classification import (
    knn_classify,
    naive_bayes_classify,
    perceptron_classify,
    perceptron_train,
)


def _tok(df):
    return df.select("doc_id", F.explode(F.split("text", " ")).alias("term"))


def _corpus(spark):
    # two clearly separated vocabularies
    rows = [
        (0, "apple banana apple fruit", "food"),
        (1, "banana fruit fruit apple", "food"),
        (2, "pear apple banana banana", "food"),
        (3, "engine wheel brake engine", "car"),
        (4, "wheel wheel engine brake", "car"),
        (5, "brake engine wheel tyre", "car"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string, lang string")


def test_naive_bayes_assigns_expected_classes(spark):
    d = _corpus(spark)
    tok = _tok(d)
    classes = d.select("doc_id", F.col("lang").alias("class"))
    q = spark.createDataFrame(
        [(100, "apple"), (100, "banana"), (101, "engine"), (101, "wheel")],
        "qid int, term string",
    )
    out = {r["qid"]: r["class"] for r in naive_bayes_classify(tok, classes, q).collect()}
    assert out == {100: "food", 101: "car"}


def test_naive_bayes_score_formula_exact(spark):
    d = _corpus(spark)
    tok = _tok(d)
    classes = d.select("doc_id", F.col("lang").alias("class"))
    q = spark.createDataFrame([(100, "apple")], "qid int, term string")
    row = naive_bayes_classify(tok, classes, q).collect()[0]
    # hand-computed: vocab = 8 distinct terms, food has 12 tokens, 3 docs of 6
    # tf(apple|food) = 4 -> ln(3/6) + ln((4+1)/(12+8))
    expected = math.log(3 / 6) + math.log(5 / 20)
    assert row["class"] == "food"
    assert abs(row["score"] - round(expected, 4)) < 1e-9


def test_naive_bayes_unseen_token_still_scored(spark):
    d = _corpus(spark)
    tok = _tok(d)
    classes = d.select("doc_id", F.col("lang").alias("class"))
    q = spark.createDataFrame([(7, "zzz")], "qid int, term string")
    rows = naive_bayes_classify(tok, classes, q).collect()
    # unseen everywhere: likelihoods equal, prior ties, class name breaks tie
    assert len(rows) == 1 and rows[0]["class"] == "car"


def test_knn_classify_majority_of_neighbours(spark):
    d = _corpus(spark)
    tok = _tok(d)
    dl = tok.groupBy("doc_id").agg(F.count("*").alias("dl"))
    classes = d.select("doc_id", F.col("lang").alias("class"))
    avgdl = float(dl.agg(F.avg("dl")).first()[0])
    q = spark.createDataFrame(
        [(200, "apple"), (200, "fruit"), (201, "engine"), (201, "tyre")],
        "qid int, term string",
    )
    out = {r["qid"]: r["class"] for r in
           knn_classify(tok, dl, classes, q, 6, avgdl, k=3).collect()}
    assert out == {200: "food", 201: "car"}


def test_knn_excludes_self_when_qid_is_corpus_doc(spark):
    d = _corpus(spark)
    tok = _tok(d)
    dl = tok.groupBy("doc_id").agg(F.count("*").alias("dl"))
    classes = d.select("doc_id", F.col("lang").alias("class"))
    avgdl = float(dl.agg(F.avg("dl")).first()[0])
    q = tok.filter(F.col("doc_id") == 0).select(
        F.col("doc_id").alias("qid"), "term"
    ).distinct()
    out = knn_classify(tok, dl, classes, q, 6, avgdl, k=2).collect()
    assert out[0]["qid"] == 0 and out[0]["class"] == "food"


def test_perceptron_separates_and_classifies(spark):
    d = _corpus(spark)
    tok = _tok(d)
    labels = d.select(
        "doc_id", F.when(F.col("lang") == "food", 1).otherwise(-1).alias("y")
    )
    w = perceptron_train(tok, labels, epochs=10)
    # training data itself must be classified perfectly (separable vocab)
    q = tok.select(F.col("doc_id").alias("qid"), "term")
    preds = perceptron_classify(tok, w, q)
    joined = preds.join(
        labels.withColumnRenamed("doc_id", "qid"), "qid"
    ).collect()
    assert all(r["y_hat"] == r["y"] for r in joined)


def test_perceptron_zero_epochs_returns_empty_weights(spark):
    d = _corpus(spark)
    tok = _tok(d)
    labels = d.select("doc_id", F.lit(1).alias("y"))
    w = perceptron_train(tok, labels, epochs=0)
    assert w.count() == 0


def test_perceptron_all_positive_converges_first_epoch(spark):
    d = _corpus(spark)
    tok = _tok(d)
    labels = d.select("doc_id", F.lit(1).alias("y"))
    # initial all-zero weights misclassify everything (sign(0) = -1),
    # one batch update pushes every doc positive
    w = perceptron_train(tok, labels, epochs=5)
    q = tok.select(F.col("doc_id").alias("qid"), "term")
    preds = perceptron_classify(tok, w, q).collect()
    assert all(r["y_hat"] == 1 for r in preds)


def test_features_ig_perfect_and_useless_terms(spark):
    """A term perfectly correlated with the class carries IG == H(C);
    a term present in every doc carries IG == 0."""
    import math

    from lucene_solr_spark.operators.classification import features_ig

    rows = []
    for d in range(8):
        label = 1 if d < 4 else 0
        terms = ["common"] + (["pos"] if label else ["neg"])
        for p, t in enumerate(terms):
            rows.append((d, t, p))
    tok = spark.createDataFrame(rows, ["doc_id", "term", "pos"])
    classes = spark.createDataFrame(
        [(d, 1 if d < 4 else 0) for d in range(8)], ["doc_id", "label"]
    )
    out = {r["term"]: r["ig"] for r in features_ig(tok, classes, k=10).collect()}
    hc = math.log(2)  # H(0.5) in nats
    assert out["pos"] == pytest.approx(hc, abs=1e-6)
    assert out["neg"] == pytest.approx(hc, abs=1e-6)
    assert out["common"] == pytest.approx(0.0, abs=1e-9)
