"""ML streaming-expression parity via spark.ml (SURVEY.md §3.9 rows
model/train/classify and the kmeans/multiKmeans math evaluators).

Reference twins:
  * features()/train() — solr/solrj/src/java/org/apache/solr/client/solrj/
    io/stream/FeaturesSelectionStream.java (~400 LoC, IG feature selection)
    + TextLogitStream.java (≈L80: iterative logistic regression trained by
    shard map-reduce). Ours: HashingTF/IDF + spark.ml LogisticRegression —
    the same estimator family, trained by Spark's native distributed
    gradient aggregation (treeAggregate = the shard map-reduce).
  * classify() — solr/core/src/java/org/apache/solr/handler/
    ClassifyStream.java (≈L40): apply a stored model to a tuple stream =
    `model.transform(df)`.
  * kmeans()/multiKmeans — .../io/eval/KmeansEvaluator.java: spark.ml
    KMeans over array<float> columns.

These run genuinely distributed (no driver-side training loops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def train_text_logit(
    docs: DataFrame,
    text_col: str,
    label_col: str,
    num_features: int = 1 << 12,
    max_iter: int = 10,
):
    """TextLogitStream analog: tokenize -> hashed tf-idf -> logistic
    regression. Returns (pipeline_model, predictions_df)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, IDF, Tokenizer

    pipe = Pipeline(
        stages=[
            Tokenizer(inputCol=text_col, outputCol="_toks"),
            HashingTF(
                inputCol="_toks", outputCol="_tf", numFeatures=num_features
            ),
            IDF(inputCol="_tf", outputCol="features"),
            LogisticRegression(
                featuresCol="features", labelCol=label_col, maxIter=max_iter
            ),
        ]
    )
    model = pipe.fit(docs)
    return model, model.transform(docs)


def classify(model, docs: DataFrame) -> DataFrame:
    """ClassifyStream analog: apply a fitted model to a stream."""
    return model.transform(docs)


def kmeans_embeddings(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    k: int = 4,
    seed: int = 42,
    max_iter: int = 20,
) -> DataFrame:
    """kmeans() evaluator analog over an array<float> column: returns the
    input with a `cluster` column plus deterministic seeding."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = embeddings.withColumn("_v", array_to_vector(F.col(vec_col)))
    km = KMeans(k=k, seed=seed, maxIter=max_iter, featuresCol="_v")
    model = km.fit(vecs)
    return model.transform(vecs).withColumnRenamed(
        "prediction", "cluster"
    ).drop("_v")
