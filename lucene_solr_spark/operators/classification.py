"""Lucene classification module re-expressed as DataFrame plans.

Reference twins (lucene/classification/src/java/org/apache/lucene/
classification/):
  * SimpleNaiveBayesClassifier.java (≈L60, assignClass/getPrecomputedClasses):
    multinomial naive Bayes whose statistics come straight from the inverted
    index — prior = docCount(class)/maxDoc, per-token likelihood
    P(w|c) = (tf(w,c) + 1) / (tokens(c) + |V|) (add-one smoothing over the
    vocabulary), score = ln prior + Σ ln P(w|c), argmax over classes.
  * KNearestNeighborClassifier.java (≈L50): build a MoreLikeThis-style
    query from the input text, take the BM25 top-k neighbours, assign the
    class with the largest SUM OF NEIGHBOUR SCORES (score-weighted vote;
    ties broken by class name for determinism).
  * BooleanPerceptronClassifier.java (≈L70): binary classifier over the
    term space; weights updated when the thresholded weight-sum
    misclassifies a doc. Lucene trains doc-sequentially; a driver-side
    doc loop is the one shape that cannot scale, so ours is the BATCH
    (pocket) perceptron: each epoch is ONE distributed aggregation of the
    per-term update Σ_misclassified (y - ŷ)·tf(w,d), applied to a small
    broadcast weight table. Deviation documented: batch updates converge
    to a separating hyperplane on linearly separable data like the
    sequential rule, but the intermediate weight sequences differ.

Scale shape: every classifier reduces to (a) one aggregation over the
token table producing a per-class statistics table that is small —
O(|V| × n_classes) rows — and (b) a broadcast join of those statistics
against the text being classified. Nothing here ever shuffles the corpus
on anything but (term) or (doc_id); the statistics tables are the only
state, so classifying a 100 TB stream is a zero-shuffle broadcast map.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def naive_bayes_class_stats(tok: DataFrame, classes: DataFrame) -> DataFrame:
    """Per-(term, class) training statistics for SimpleNaiveBayesClassifier.

    tok: (doc_id, term); classes: (doc_id, class). Returns the joined
    stats table (term, class, tf_wc) plus per-class token totals and doc
    counts via `naive_bayes_priors`. One term-keyed aggregation — the
    output is vocabulary-sized, not corpus-sized."""
    t = tok.join(classes, "doc_id")
    return t.groupBy("term", "class").agg(F.count("*").alias("tf_wc"))


def naive_bayes_priors(tok: DataFrame, classes: DataFrame) -> DataFrame:
    """(class, n_docs, n_tokens) per class."""
    dl = tok.groupBy("doc_id").agg(F.count("*").alias("dl"))
    return (
        classes.join(dl, "doc_id", "left")
        .groupBy("class")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.coalesce("dl", F.lit(0))).alias("n_tokens"),
        )
    )


def naive_bayes_classify(
    tok: DataFrame,
    classes: DataFrame,
    query_tok: DataFrame,
    round_to: int = 4,
) -> DataFrame:
    """Assign each query document its max-likelihood class.

    query_tok: (qid, term) — the tokenized text(s) to classify (for
    index-time classification this is the corpus itself; for search-time
    it is the incoming docs). Returns (qid, class, score) with one row
    per qid: score = ln(docCount(c)/N) + Σ_tokens ln((tf(w,c)+1)/(tokens_c+|V|)),
    the add-one-smoothed multinomial NB of SimpleNaiveBayesClassifier.
    Ties broken by class ascending (deterministic).

    Tokens UNSEEN in class c still contribute ln(1/(tokens_c+|V|)) — the
    left join keeps them, exactly as Lucene's implementation counts a
    zero term frequency into the smoothed likelihood."""
    stats = naive_bayes_class_stats(tok, classes)
    priors = naive_bayes_priors(tok, classes)
    n_docs = classes.count()
    vocab = tok.select("term").distinct().count()
    # every (query token, class) pair needs a likelihood, including
    # unseen-in-class tokens -> cross the query tokens with the class
    # list (small), then LEFT join the (term, class) stats
    qx = query_tok.crossJoin(F.broadcast(priors.select("class")))
    liked = qx.join(F.broadcast(stats), ["term", "class"], "left").withColumn(
        "tf_wc", F.coalesce("tf_wc", F.lit(0))
    )
    scored = (
        liked.join(F.broadcast(priors), "class")
        .withColumn(
            "_ll",
            F.log(
                (F.col("tf_wc") + F.lit(1.0))
                / (F.col("n_tokens") + F.lit(float(vocab)))
            ),
        )
        .groupBy("qid", "class", "n_docs")
        .agg(F.sum("_ll").alias("_sum_ll"))
        .withColumn(
            "score",
            F.log(F.col("n_docs") / F.lit(float(n_docs))) + F.col("_sum_ll"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("class"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("qid", "class", F.round("score", round_to).alias("score"))
        .orderBy("qid")
    )


def knn_classify(
    tok: DataFrame,
    dl: DataFrame,
    classes: DataFrame,
    query_tok: DataFrame,
    n_docs: int,
    avgdl: float,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 4,
) -> DataFrame:
    """KNearestNeighborClassifier: BM25 top-k neighbours of each query
    text, class = argmax of the sum of neighbour scores.

    query_tok: (qid, term). Self-matches are excluded when qid equals a
    corpus doc_id (the classifier's leave-one-out shape). Returns
    (qid, class, vote) where vote = Σ scores of the neighbours in that
    class, rounded. One corpus aggregation keyed on (doc_id); the query
    side is broadcast."""
    dfs = tok.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    qterms = query_tok.select("qid", "term").distinct()
    qdf = qterms.join(dfs, "term")  # query terms with their df
    tf = (
        tok.join(F.broadcast(qdf.select("term").distinct()), "term")
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    scored = (
        tf.join(F.broadcast(qdf), "term")
        .join(dl, "doc_id")
        .filter(F.col("doc_id") != F.col("qid"))
        .withColumn(
            "_s",
            idf
            * F.col("tf")
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl))
            ),
        )
        .groupBy("qid", "doc_id")
        .agg(F.sum("_s").alias("score"))
    )
    wk = Window.partitionBy("qid").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    topk = scored.withColumn("_rn", F.row_number().over(wk)).filter(
        F.col("_rn") <= k
    )
    votes = (
        topk.join(classes.withColumnRenamed("doc_id", "doc_id"), "doc_id")
        .groupBy("qid", "class")
        .agg(F.sum("score").alias("vote"))
    )
    wv = Window.partitionBy("qid").orderBy(F.desc("vote"), F.asc("class"))
    return (
        votes.withColumn("_rn", F.row_number().over(wv))
        .filter(F.col("_rn") == 1)
        .select("qid", "class", F.round("vote", round_to).alias("vote"))
        .orderBy("qid")
    )


def perceptron_train(
    tok: DataFrame,
    labels: DataFrame,
    epochs: int = 5,
    lr: float = 1.0,
) -> DataFrame:
    """Batch (pocket) perceptron over the term space — the distributed
    form of BooleanPerceptronClassifier's training loop.

    labels: (doc_id, y) with y in {-1, +1}. Model: ŷ(d) = sign(Σ_w
    weight(w)·tf(w,d)) with sign(0) = -1. Each epoch: one aggregation of
    Σ_{misclassified d} y_d·tf(w,d) per term, added to the weight table
    (small — vocabulary-sized — and broadcast back). Returns
    (term, weight) for terms with non-zero weight.

    The per-epoch convergence signal (misclassified count) is one scalar
    to the driver; the weight table is localCheckpoint-free because it is
    re-derived per epoch from a bounded plan over the persisted tf table."""
    tf = (
        tok.groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .join(labels, "doc_id")
        .persist()
    )
    weights = None  # None == all-zero weight table
    for _ in range(epochs):
        if weights is None:
            margin = tf.select("doc_id", "y").distinct().withColumn(
                "m", F.lit(0.0)
            )
        else:
            margin = (
                tf.join(F.broadcast(weights), "term", "left")
                .withColumn("w", F.coalesce("weight", F.lit(0.0)))
                .groupBy("doc_id", "y")
                .agg(F.sum(F.col("w") * F.col("tf")).alias("m"))
            )
        mis = margin.filter(
            (F.when(F.col("m") > 0, 1).otherwise(-1)) != F.col("y")
        ).select("doc_id", "y")
        if mis.limit(1).count() == 0:
            break
        upd = (
            tf.join(mis.select("doc_id"), "doc_id", "left_semi")
            .groupBy("term")
            .agg(F.sum(F.col("y") * F.col("tf") * F.lit(lr)).alias("delta"))
        )
        if weights is None:
            weights = upd.withColumnRenamed("delta", "weight")
        else:
            weights = (
                weights.join(upd, "term", "full")
                .select(
                    "term",
                    (
                        F.coalesce("weight", F.lit(0.0))
                        + F.coalesce("delta", F.lit(0.0))
                    ).alias("weight"),
                )
            )
        weights = weights.filter(F.col("weight") != 0).localCheckpoint(
            eager=True
        )
    tf.unpersist()
    if weights is None:
        spark = tok.sparkSession
        return spark.createDataFrame([], "term string, weight double")
    return weights


def perceptron_classify(
    tok: DataFrame, weights: DataFrame, query_tok: DataFrame
) -> DataFrame:
    """Apply a trained perceptron: (qid, y_hat, margin). Broadcast the
    weight table; one aggregation over the query tokens."""
    tf = query_tok.groupBy("qid", "term").agg(F.count("*").alias("tf"))
    m = (
        tf.join(F.broadcast(weights), "term", "left")
        .withColumn("w", F.coalesce("weight", F.lit(0.0)))
        .groupBy("qid")
        .agg(F.sum(F.col("w") * F.col("tf")).alias("margin"))
    )
    return m.select(
        "qid",
        F.when(F.col("margin") > 0, 1).otherwise(-1).alias("y_hat"),
        F.round("margin", 4).alias("margin"),
    ).orderBy("qid")


def features_ig(
    tok: DataFrame, classes: DataFrame, k: int = 10
) -> DataFrame:
    """FeaturesSelectionStream (solr/solrj/.../io/stream/
    FeaturesSelectionStream.java ≈L60): per-term information gain against
    a binary class label, the feature-selection stage in front of
    train() / TextLogitStream. IG(t) = H(C) − P(t)·H(C|t) −
    P(¬t)·H(C|¬t), all probabilities from document-level presence counts.

    One distinct-(term, doc) agg joined to a broadcast class table —
    the counts are exact integers, so the ranking is deterministic under
    any partitioning; entropy arithmetic happens once per TERM (tiny).

    `classes`: (doc_id, label) with label ∈ {0, 1}.
    """
    totals = classes.agg(
        F.count("*").alias("n"), F.sum("label").alias("n1")
    ).first()
    n, n1 = int(totals["n"]), int(totals["n1"])
    per_term = (
        tok.select("doc_id", "term")
        .dropDuplicates(["doc_id", "term"])
        # classes is one row PER DOC — never broadcast it; a doc_id-keyed
        # equi-join lets Catalyst pick (and co-partitions with the dedup
        # exchange at scale)
        .join(classes, "doc_id")
        .groupBy("term")
        .agg(
            F.count("*").alias("df"),
            F.sum("label").alias("df1"),
        )
    )

    def _h(p):
        # binary entropy with 0·ln0 = 0
        return -(
            F.when(p > 0, p * F.log(p)).otherwise(F.lit(0.0))
            + F.when(p < 1, (1 - p) * F.log(1 - p)).otherwise(F.lit(0.0))
        )

    pt = F.col("df") / F.lit(float(n))
    p_c_t = F.col("df1") / F.col("df")
    p_c_nt = (F.lit(float(n1)) - F.col("df1")) / (F.lit(float(n)) - F.col("df"))
    hc = _h(F.lit(float(n1) / n))
    ig = hc - pt * _h(p_c_t) - F.when(
        F.col("df") < n, (1 - pt) * _h(p_c_nt)
    ).otherwise(F.lit(0.0))
    return (
        per_term.select("term", F.round(ig, 6).alias("ig"))
        .orderBy(F.desc("ig"), F.asc("term"))
        .limit(k)
    )
