"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline (one narrow map + TakeOrdered,
no shuffle beyond the final top-k merge); the IVF variant prunes to the
query's coarse partition first — at 10^12 scale that's an Iceberg partition
filter on the centroid id, turning a full scan into one partition read.

Dot products run as JVM-side higher-order functions (zip_with + aggregate):
no Python in the scoring loop. A Pandas-UDF/numpy batch variant would win on
very wide vectors; at 64 dims the codegen'd expression is faster than the
Arrow round-trip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def cosine_topk(
    emb: DataFrame, query_vec: list[float], k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force exact cosine top-k vs a literal query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    v = as_double(F.col(vec_col))
    cos = _dot(v, q) / (_norm(v) * F.lit(_py_norm(query_vec)))
    # order by the RAW value, round only in the final projection (keeps the
    # tie-break semantics identical to the SQL oracle)
    return (
        emb.select(F.col(id_col), cos.alias("_raw"))
        .orderBy(F.desc("_raw"), F.asc(id_col))
        .limit(k)
        .select(F.col(id_col), F.round("_raw", 4).alias("cosine"))
    )


def _py_norm(v: list[float]) -> float:
    import math

    return math.sqrt(sum(float(x) * float(x) for x in v))


def ivf_cosine_topk(
    emb: DataFrame, query_vec: list[float], query_partition, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding", part_col: str = "label",
) -> DataFrame:
    """IVF probe with an EXTERNAL coarse partition column (pre-assigned).
    The trained path is ivf_train + ivf_probe_topk below."""
    return cosine_topk(
        emb.filter(F.col(part_col) == query_partition), query_vec, k,
        id_col, vec_col,
    )


def ivf_train(
    emb: DataFrame, n_centroids: int = 10, seed: int = 42,
    vec_col: str = "embedding", max_iter: int = 20,
):
    """IVF coarse quantizer: train KMeans centroids over the corpus and
    assign every vector -> (assigned_df with `centroid` column, centroids).

    At 10^12 scale the assignment is written `partitionBy("centroid")`
    (Iceberg partition on the centroid id), so a probe is a partition-
    pruned scan; the centroid table itself is tiny (n_centroids × dim) and
    lives on the driver / broadcast. Training cost is one KMeans over a
    SAMPLE at scale (df.sample) — centroids don't need every row."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = emb.withColumn("_v", array_to_vector(as_double(F.col(vec_col))))
    model = KMeans(
        k=n_centroids, seed=seed, maxIter=max_iter, featuresCol="_v"
    ).fit(vecs)
    assigned = (
        model.transform(vecs)
        .withColumnRenamed("prediction", "centroid")
        .drop("_v")
    )
    centroids = [list(map(float, c)) for c in model.clusterCenters()]
    return assigned, centroids


def ivf_probe_topk(
    assigned: DataFrame, centroids: list[list[float]],
    query_vec: list[float], nprobe: int = 3, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """IVF query: rank centroids by cosine vs the query (driver-side numpy
    over the tiny centroid table), scan only the `nprobe` nearest
    partitions, brute-force within. The filter is a partition-pruning
    predicate on the centroid id — the 10^12-scale path reads nprobe
    partitions, not the corpus."""
    import numpy as np

    q = np.asarray(query_vec, dtype=np.float64)
    c = np.asarray(centroids, dtype=np.float64)
    sims = (c @ q) / (np.linalg.norm(c, axis=1) * np.linalg.norm(q) + 1e-12)
    probes = [int(i) for i in np.argsort(-sims)[:nprobe]]
    return cosine_topk(
        assigned.filter(F.col("centroid").isin(probes)), query_vec, k,
        id_col, vec_col,
    )


def hyperplane_planes(n_planes: int, dim: int, seed: int = 7):
    """Deterministic coarse-quantizer hyperplanes (shared by engine and
    oracle — the plane literals are embedded in both plans)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def ivf_hyperplane_topk(
    emb: DataFrame, query_vec: list[float], n_planes: int = 3,
    seed: int = 7, k: int = 10, id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF probe with a DETERMINISTIC coarse quantizer: sign pattern of
    fixed random hyperplanes partitions the corpus into 2^n_planes cells;
    the query probes its own cell plus every single-bit-flip neighbor
    (multiprobe), then brute-forces cosine within the probed cells only.

    Same physical shape as centroid IVF (partition prune -> scan nprobe
    partitions; at scale: write partitionBy(bucket)), but the quantizer is
    closed-form, so an ANSI-SQL oracle can restate the identical pruning —
    the entry checks the probe MECHANICS exactly, while KMeans-IVF recall
    is covered by tests (clustered-data recall, ivf_train/ivf_probe_topk)."""
    import numpy as np

    planes = hyperplane_planes(n_planes, len(query_vec), seed)
    q = np.asarray(query_vec, dtype=np.float64)
    qbucket = sum((1 << i) for i in range(n_planes) if float(planes[i] @ q) > 0)
    probes = [qbucket] + [qbucket ^ (1 << i) for i in range(n_planes)]

    v = as_double(F.col(vec_col))
    bucket = F.lit(0)
    for i in range(n_planes):
        p = F.array(*[F.lit(float(x)) for x in planes[i]])
        bucket = bucket + F.when(_dot(v, p) > 0, F.lit(1 << i)).otherwise(F.lit(0))
    cand = emb.withColumn("_bucket", bucket).filter(
        F.col("_bucket").isin(probes)
    )
    return cosine_topk(cand, query_vec, k, id_col, vec_col)


def lsh_hyperplane_buckets(
    emb: DataFrame, n_planes: int = 4, seed: int = 42,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH bucketing: sign pattern of `n_planes`
    deterministic pseudo-random hyperplanes -> bucket id. Vectors in the
    same bucket are ANN candidates (bucket join replaces the n^2 scan)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    first = emb.select(F.size(vec_col).alias("d")).first()
    dim = int(first["d"])
    planes = rng.standard_normal((n_planes, dim))
    v = as_double(F.col(vec_col))
    bucket = F.lit(0).cast("long")
    for i in range(n_planes):
        p = F.array(*[F.lit(float(x)) for x in planes[i]])
        bit = F.when(_dot(v, p) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = bucket + bit
    return emb.select(F.col(id_col), bucket.alias("bucket"))


def embedding_cosine_near_dups(
    emb: DataFrame, threshold: float, exact: bool = False,
    n_planes: int = 3, seed: int = 42,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (a, b, cosine) with
    cosine >= threshold, a < b.

    exact=True runs the all-pairs join (oracle/gate scale only).
    Default: hyperplane-LSH bucket both copies with single-bit multiprobe
    and verify within buckets — the 10^12 shape (bucket equi-join, never
    n^2); recall vs exact is asserted in tests."""
    import numpy as np

    l = emb.select(F.col(id_col).alias("a"), as_double(F.col(vec_col)).alias("va"))
    r = emb.select(F.col(id_col).alias("b"), as_double(F.col(vec_col)).alias("vb"))
    if exact:
        cand = l.join(r, F.col("a") < F.col("b"))
    else:
        rng = np.random.default_rng(seed)
        dim = int(emb.select(F.size(vec_col).alias("d")).first()["d"])
        planes = rng.standard_normal((n_planes, dim))

        def bucket_col(v):
            bcol = F.lit(0)
            for i in range(n_planes):
                p = F.array(*[F.lit(float(x)) for x in planes[i]])
                bcol = bcol + F.when(_dot(v, p) > 0, F.lit(1 << i)).otherwise(
                    F.lit(0)
                )
            return bcol

        lb = l.withColumn("bucket", bucket_col(F.col("va")))
        rb = r.withColumn("bucket", bucket_col(F.col("vb")))
        probes = lb.select(
            "a", "va",
            F.explode(
                F.array(
                    F.col("bucket"),
                    *[
                        F.col("bucket").bitwiseXOR(F.lit(1 << i))
                        for i in range(n_planes)
                    ],
                )
            ).alias("bucket"),
        )
        cand = (
            probes.join(rb, "bucket")
            .filter(F.col("a") < F.col("b"))
            .dropDuplicates(["a", "b"])
        )
    cos = _dot(F.col("va"), F.col("vb")) / (
        _norm(F.col("va")) * _norm(F.col("vb"))
    )
    return (
        cand.select("a", "b", F.round(cos, 4).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
        .orderBy("a", "b")
    )


def embedding_norms(emb: DataFrame, id_col="vec_id", vec_col="embedding") -> DataFrame:
    v = as_double(F.col(vec_col))
    return emb.select(F.col(id_col), F.round(_norm(v), 4).alias("l2_norm"))


def knn_join(
    left: DataFrame, right: DataFrame, k: int,
    left_id="vec_id", right_id="vec_id", vec_col="embedding",
) -> DataFrame:
    """k-NN join (small left side): broadcast left, cross-score, window top-k
    per left id. At scale: LSH/IVF-bucket both sides first, then this join
    runs per bucket."""
    from pyspark.sql import Window

    l = left.select(
        F.col(left_id).alias("qid"), as_double(F.col(vec_col)).alias("qv")
    )
    r = right.select(
        F.col(right_id).alias("nid"), as_double(F.col(vec_col)).alias("nv")
    )
    cross = F.broadcast(l).crossJoin(r).filter(F.col("qid") != F.col("nid"))
    cos = _dot(F.col("qv"), F.col("nv")) / (_norm(F.col("qv")) * _norm(F.col("nv")))
    # rank on the ROUNDED value (both engines see identical rounded ties)
    scored = cross.select("qid", "nid", F.round(cos, 4).alias("cosine"))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def knn_join_bucketed(
    left: DataFrame, right: DataFrame, k: int, n_planes: int = 4,
    seed: int = 42, left_id="vec_id", right_id="vec_id", vec_col="embedding",
) -> DataFrame:
    """Approximate k-NN join for LARGE × LARGE sides: hyperplane-LSH bucket
    BOTH sides with the same planes, equi-join on the bucket id, window
    top-k per query within its bucket. Shuffle is keyed on the bucket —
    never a cross product; recall/cost trades via n_planes (fewer planes =
    bigger buckets = higher recall, more compute). Multiprobe: each query
    also probes the n_planes single-bit-flip neighbor buckets, recovering
    most boundary losses for one extra join row per plane."""
    import numpy as np

    from pyspark.sql import Window

    rng = np.random.default_rng(seed)
    dim = int(right.select(F.size(vec_col).alias("d")).first()["d"])
    planes = rng.standard_normal((n_planes, dim))

    def bucket_col(v):
        b = F.lit(0)
        for i in range(n_planes):
            p = F.array(*[F.lit(float(x)) for x in planes[i]])
            b = b + F.when(_dot(v, p) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        return b

    r = right.select(
        F.col(right_id).alias("nid"), as_double(F.col(vec_col)).alias("nv")
    ).withColumn("bucket", bucket_col(F.col("nv")))
    l0 = left.select(
        F.col(left_id).alias("qid"), as_double(F.col(vec_col)).alias("qv")
    ).withColumn("bucket", bucket_col(F.col("qv")))
    # multiprobe fan-out: own bucket + every single-bit flip
    probes = l0.select(
        "qid", "qv",
        F.explode(
            F.array(
                F.col("bucket"),
                *[F.col("bucket").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)],
            )
        ).alias("bucket"),
    )
    cand = probes.join(r, "bucket").filter(F.col("qid") != F.col("nid"))
    cos = _dot(F.col("qv"), F.col("nv")) / (
        _norm(F.col("qv")) * _norm(F.col("nv"))
    )
    scored = cand.select(
        "qid", "nid", F.round(cos, 4).alias("cosine")
    ).dropDuplicates(["qid", "nid"])
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
