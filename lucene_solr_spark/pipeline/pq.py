"""Product quantization (PQ) for embedding columns — the memory-compression
tier of ANN at 10^12 scale.

Reference parity note: the Lucene reference's KNN vector codec compresses
vectors with scalar/product quantization (lucene/core KnnVectorsFormat
family); this module re-expresses that capability Spark-first.

Why PQ at 100 TB: a 64-dim float32 embedding is 256 bytes; its PQ code at
m=16 subspaces x 16 centroids is 16 x 4-bit = 8 bytes (32x smaller — we
store one byte per code for simplicity: 16 bytes, 16x). The candidate scan over
codes therefore touches 1/32 of the bytes of a raw-vector scan, and the
codes table for 10^12 vectors fits in ~8 TB instead of 256 TB. Training
reads only a driver-side SAMPLE (codebooks are m*ksub*dsub floats — KBs);
encoding is one narrow Arrow-batched map; ADC query scoring is pure JVM
expression (per-subspace literal lookup tables), so the hot scan never
leaves whole-stage codegen and never ships Python.

Pipeline:
  codebooks = pq_train(emb)              # numpy Lloyd's on a sample
  codes     = pq_encode(emb, codebooks)  # pandas UDF -> array<smallint>
  topk      = pq_adc_topk(codes, codebooks, query, k)  # JVM LUT scan

Asymmetric distance computation (ADC, Jegou et al. 2011, "Product
quantization for nearest neighbor search"): the query stays EXACT; each
database vector is approximated by its per-subspace centroid, so
dot(q, x) ~= sum_i dot(q_i, c[i][code_i]) — the m dot products against the
query are precomputed driver-side into LUT[i][j] and inlined as literal
arrays; the scan computes sum_i LUT_i[code_i] with element_at, then
TakeOrderedAndProject keeps the global top-k (no full sort).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _kmeans_1sub(x: np.ndarray, ksub: int, seed: int, iters: int) -> np.ndarray:
    """Seeded Lloyd's for one subspace (sample is small: rows x dsub)."""
    rng = np.random.default_rng(seed)
    # k-means++ style seeding, deterministic
    cent = x[rng.choice(len(x), size=1)]
    for _ in range(ksub - 1):
        d2 = np.min(
            ((x[:, None, :] - cent[None, :, :]) ** 2).sum(-1), axis=1
        )
        p = d2 / max(d2.sum(), 1e-12)
        cent = np.vstack([cent, x[rng.choice(len(x), p=p)]])
    for _ in range(iters):
        d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
        assign = np.argmin(d2, axis=1)
        for j in range(ksub):
            pts = x[assign == j]
            if len(pts):
                cent[j] = pts.mean(axis=0)
            else:
                # empty cluster: reseed on the point farthest from its center
                cent[j] = x[int(np.argmax(d2.min(axis=1)))]
    return cent


def pq_train(
    emb: DataFrame, m: int = 16, ksub: int = 16, seed: int = 42,
    sample_rows: int = 4096, iters: int = 25, vec_col: str = "embedding",
) -> np.ndarray:
    """Train PQ codebooks on a deterministic sample -> (m, ksub, dsub).

    The sample collect is the documented exception to no-driver-collects:
    codebooks are tiny model state (m*ksub*dsub floats) and PQ training at
    any corpus size uses a bounded sample — the same pattern as ivf_train's
    KMeans (similarity.py). Sampling is ORDER BY a stable key LIMIT n, so
    engine reruns are reproducible."""
    rows = (
        emb.select(F.col(vec_col).alias("v"))
        .orderBy(F.xxhash64(F.col("v").cast("array<float>").cast("string")))
        .limit(sample_rows)
        .collect()
    )
    # "no silent caps": count(*) over the source is footer-metadata cheap
    # on parquet (no columns projected) and says what the sample cut.
    from .metrics import record_cap

    n_total = emb.count()
    record_cap(
        "pq_train.sample", kept=len(rows),
        dropped=max(0, n_total - len(rows)), sample_rows=sample_rows,
    )
    x = np.asarray([r["v"] for r in rows], dtype=np.float64)
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    return np.stack(
        [
            _kmeans_1sub(x[:, i * dsub : (i + 1) * dsub], ksub, seed + i, iters)
            for i in range(m)
        ]
    )


def pq_encode(
    emb: DataFrame, codebooks: np.ndarray,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Encode vectors -> array<smallint> of per-subspace centroid ids.

    One narrow Arrow-batched map (pandas UDF, codebooks in the closure —
    KBs, shipped once per worker); no shuffle. At 10^12 scale this is the
    write path of the codes table (stored column: m bytes/vector)."""
    from pyspark.sql.functions import pandas_udf

    m, ksub, dsub = codebooks.shape
    cb = codebooks  # (m, ksub, dsub)

    @pandas_udf("array<smallint>")
    def encode(col: pd.Series) -> pd.Series:
        x = np.asarray(col.tolist(), dtype=np.float64)  # (n, dim)
        n = x.shape[0]
        if n == 0:
            return pd.Series([], dtype=object)
        codes = np.empty((n, m), dtype=np.int16)
        for i in range(m):
            sub = x[:, i * dsub : (i + 1) * dsub]  # (n, dsub)
            # ||s - c||^2 = ||s||^2 - 2 s.c + ||c||^2 ; argmin drops ||s||^2
            dots = sub @ cb[i].T  # (n, ksub)
            c2 = (cb[i] ** 2).sum(axis=1)  # (ksub,)
            codes[:, i] = np.argmin(c2[None, :] - 2.0 * dots, axis=1)
        return pd.Series(list(codes))

    return emb.select(F.col(id_col), encode(F.col(vec_col)).alias("pq_code"))


def pq_adc_topk(
    codes: DataFrame, codebooks: np.ndarray, query_vec: list[float],
    k: int = 10, id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-k over the codes table — pure JVM expression scan.

    score ~= cosine(q, x): numerator sum_i LUT_i[code_i] with
    LUT_i[j] = dot(q_i, c[i][j]); denominator ||q|| * approx ||x|| with
    ||x||^2 ~= sum_i NLUT_i[code_i], NLUT_i[j] = ||c[i][j]||^2. Both LUTs
    are m x ksub literal arrays inlined into the plan (m*ksub doubles),
    so the scan is element_at sums inside whole-stage codegen and the
    result is TakeOrderedAndProject — exactly the shape that survives a
    1000-executor scan of a 10^12-row codes table."""
    m, ksub, dsub = codebooks.shape
    q = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.linalg.norm(q))
    dot_expr = F.lit(0.0)
    n2_expr = F.lit(0.0)
    for i in range(m):
        qi = q[i * dsub : (i + 1) * dsub]
        lut = [float(codebooks[i, j] @ qi) for j in range(ksub)]
        nlut = [float(codebooks[i, j] @ codebooks[i, j]) for j in range(ksub)]
        code_i = F.element_at(F.col("pq_code"), i + 1).cast("int")
        dot_expr = dot_expr + F.element_at(
            F.array(*[F.lit(v) for v in lut]), code_i + F.lit(1)
        )
        n2_expr = n2_expr + F.element_at(
            F.array(*[F.lit(v) for v in nlut]), code_i + F.lit(1)
        )
    cos = dot_expr / (F.sqrt(n2_expr) * F.lit(qn) + F.lit(1e-12))
    return (
        codes.select(F.col(id_col), cos.alias("_raw"))
        .orderBy(F.desc("_raw"), F.asc(id_col))
        .limit(k)
        .select(F.col(id_col), F.round("_raw", 4).alias("adc_cosine"))
    )


def pq_topk_rerank(
    emb: DataFrame, codes: DataFrame, codebooks: np.ndarray,
    query_vec: list[float], k: int = 10, candidates: int = 50,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """The full production PQ pattern: ADC scan -> top-`candidates`
    compressed-domain shortlist -> EXACT cosine rerank over the raw
    vectors of just that shortlist -> top-k.

    The expensive part (the corpus-wide scan) touches only codes; the raw
    vectors are fetched for `candidates` rows via a broadcast semi-join —
    late materialization, the same shape as the BM25 top-k -> docmeta
    fetch in search.py. recall(final top-k) == recall(shortlist), so the
    quality knob is `candidates`, not the quantizer."""
    from .similarity import cosine_topk

    short = pq_adc_topk(codes, codebooks, query_vec, k=candidates, id_col=id_col)
    cand_vecs = emb.join(
        F.broadcast(short.select(id_col)), id_col, "left_semi"
    )
    return cosine_topk(cand_vecs, query_vec, k=k, id_col=id_col, vec_col=vec_col)


def pq_topk(
    emb: DataFrame, query_vec: list[float], k: int = 10, m: int = 16,
    ksub: int = 16, seed: int = 42, candidates: int = 50,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Train -> encode -> ADC shortlist -> exact rerank in one call."""
    cb = pq_train(emb, m=m, ksub=ksub, seed=seed, vec_col=vec_col)
    codes = pq_encode(emb, cb, id_col=id_col, vec_col=vec_col)
    return pq_topk_rerank(
        emb, codes, cb, query_vec, k=k, candidates=candidates,
        id_col=id_col, vec_col=vec_col,
    )


# ---------------------------------------------------------------------------
# Scalar quantization (SQ8) — the other vector-compression tier. Unlike PQ,
# the quantizer is closed-form (per-dimension affine over exact corpus
# min/max), so an ANSI-SQL oracle can restate the ENTIRE pipeline and the
# driver value-hashes it; it is also the shape of Lucene's int8 scalar
# quantization for KNN vectors (Lucene99ScalarQuantizedVectorsFormat).
# ---------------------------------------------------------------------------

def sq8_stats(emb: DataFrame, vec_col: str = "embedding"):
    """Exact per-dimension (min, max) over the corpus -> two python lists.

    One narrow posexplode + 64-group aggregation; the collected result is
    dim rows of scalar model state (the TermStates.build pattern — the
    stats table is tiny and becomes plan literals). At 10^12 scale this
    aggregation is map-side-combined per partition before one 64-key
    exchange."""
    stats = (
        emb.select(F.posexplode(vec_col).alias("i", "x"))
        .groupBy("i")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
        .orderBy("i")
        .collect()
    )
    mins = [float(r["mn"]) for r in stats]
    maxs = [float(r["mx"]) for r in stats]
    return mins, maxs


def sq8_encode(
    emb: DataFrame, mins: list[float], maxs: list[float],
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Quantize each dimension to 8 bits: floor((x-mn)*255/(mx-mn) + 0.5),
    clamped to [0,255] — explicit floor(+0.5), not round(), so any SQL
    engine restates it without half-even ambiguity. 4x smaller than
    float32, pure zip_with expressions, zero shuffle."""
    mn = F.array(*[F.lit(v) for v in mins])
    rng = F.array(*[F.lit(mx - mi) for mx, mi in zip(maxs, mins)])
    centered = F.zip_with(
        F.col(vec_col), mn, lambda x, m: x.cast("double") - m
    )
    code = F.zip_with(
        centered, rng,
        lambda d, r: F.least(
            F.lit(255),
            F.greatest(
                F.lit(0),
                F.floor(
                    F.when(r > 0, d * F.lit(255.0) / r).otherwise(F.lit(0.0))
                    + F.lit(0.5)
                ).cast("int"),
            ),
        ),
    )
    return emb.select(F.col(id_col), code.alias("sq_code"))


def sq8_topk(
    codes: DataFrame, mins: list[float], maxs: list[float],
    query_vec: list[float], k: int = 10, id_col: str = "vec_id",
) -> DataFrame:
    """Cosine top-k over dequantized int8 codes vs the exact query.

    x_hat_j = mn_j + code_j * (mx_j - mn_j)/255; cosine(q, x_hat) as
    zip_with/aggregate JVM expressions over the codes column only, ending
    in TakeOrderedAndProject. The scan reads 1/4 of the raw-vector bytes;
    at 10^12 vectors the codes table is the hot store and the float
    vectors are cold archive."""
    import math

    mn = F.array(*[F.lit(v) for v in mins])
    step = F.array(*[F.lit((mx - mi) / 255.0) for mx, mi in zip(maxs, mins)])
    deq = F.zip_with(
        F.zip_with(F.col("sq_code"), step, lambda c, s: c.cast("double") * s),
        mn,
        lambda xs, m: xs + m,
    )
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = math.sqrt(sum(float(x) * float(x) for x in query_vec))
    dot = F.aggregate(
        F.zip_with(deq, q, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    n2 = F.aggregate(
        F.transform(deq, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
    )
    cos = dot / (F.sqrt(n2) * F.lit(qn) + F.lit(1e-12))
    return (
        codes.select(F.col(id_col), cos.alias("_raw"))
        .orderBy(F.desc("_raw"), F.asc(id_col))
        .limit(k)
        .select(F.col(id_col), F.round("_raw", 4).alias("sq_cosine"))
    )


def sq8_search(
    emb: DataFrame, query_vec: list[float], k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """stats -> encode -> dequantized cosine top-k in one call."""
    mins, maxs = sq8_stats(emb, vec_col)
    codes = sq8_encode(emb, mins, maxs, id_col=id_col, vec_col=vec_col)
    return sq8_topk(codes, mins, maxs, query_vec, k=k, id_col=id_col)


# ---------------------------------------------------------------------------
# IVF-PQ (IVFADC, Jegou et al. 2011 "Product Quantization for Nearest
# Neighbor Search" §IV) — the 10^12-vector composition: a trained coarse
# quantizer prunes the scan to nprobe cells, PQ codes of the RESIDUAL
# (x - centroid) are ADC-scored inside those cells only, and the exact
# rerank touches just the shortlist's raw vectors. Storage per vector:
# 4B cell id + m code bytes; the scan reads nprobe/n_centroids of that.
# ---------------------------------------------------------------------------


def ivfpq_build(
    emb: DataFrame, n_centroids: int = 16, m: int = 8, ksub: int = 16,
    seed: int = 42, id_col: str = "vec_id", vec_col: str = "embedding",
):
    """Train coarse KMeans + residual PQ codebooks; encode the corpus ->
    (codes_df(id, centroid, pq_code), centroids, codebooks).

    Residual encoding: each vector's PQ code is over x - c[cell], so one
    shared codebook set serves every cell (the IVFADC design — the
    residual distribution is far more compact than the raw one). At
    corpus scale the codes table is written partitionBy('centroid') so a
    probe is a partition-pruned scan (asserted in tests)."""
    from .similarity import ivf_train

    assigned, centroids = ivf_train(
        emb, n_centroids=n_centroids, seed=seed, vec_col=vec_col
    )
    cen = np.asarray(centroids, dtype=np.float64)
    cen_lit = F.array(
        *[F.array(*[F.lit(float(v)) for v in c]) for c in centroids]
    )
    res = assigned.select(
        id_col,
        "centroid",
        F.zip_with(
            as_double_arr(F.col(vec_col)),
            F.element_at(cen_lit, F.col("centroid") + 1),
            lambda a, b: a - b,
        ).alias("_residual"),
    )
    cb = pq_train(res, m=m, ksub=ksub, seed=seed, vec_col="_residual")
    codes = pq_encode(res, cb, id_col=id_col, vec_col="_residual").join(
        assigned.select(id_col, "centroid"), id_col
    )
    return codes.select(id_col, "centroid", "pq_code"), cen, cb


def as_double_arr(col):
    return F.transform(col, lambda x: x.cast("double"))


def ivfpq_topk(
    emb: DataFrame, codes: DataFrame, centroids: np.ndarray,
    codebooks: np.ndarray, query_vec: list, nprobe: int = 4,
    candidates: int = 64, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """IVFADC query: rank cells driver-side (tiny centroid table), prune
    the codes scan to the nprobe nearest cells, ADC-score inside them,
    shortlist `candidates` by approximate dot, exact-rerank the
    shortlist's raw vectors.

    By linearity dot(q, x) = dot(q, c + r) = dot(q, c) + dot(q, r)
    ≈ dot(q, c[cell]) + Σ_i LUT_i[code_i] with LUT_i[j] =
    dot(q_i, cb[i][j]) — so the residual LUT (m*ksub literal doubles)
    is CELL-INDEPENDENT and only the scalar dot(q, c) offset is
    per-cell (a literal map over the probed cells). Unit-norm corpora
    (ours) make dot ranking == cosine ranking; the exact rerank fixes
    residual quantization error on the shortlist regardless."""
    from .similarity import cosine_topk

    m, ksub, dsub = codebooks.shape
    q = np.asarray(query_vec, dtype=np.float64)
    cn = centroids / (
        np.linalg.norm(centroids, axis=1, keepdims=True) + 1e-12
    )
    sims = cn @ (q / (np.linalg.norm(q) + 1e-12))
    probes = [int(i) for i in np.argsort(-sims)[:nprobe]]

    # shared residual LUT: dot(q_i, cb[i][j]) — the residual part of the
    # approximate dot is cell-independent by linearity
    lut_expr = F.lit(0.0)
    for i in range(m):
        qi = q[i * dsub : (i + 1) * dsub]
        lut = [float(codebooks[i, j] @ qi) for j in range(ksub)]
        code_i = F.element_at(F.col("pq_code"), i + 1).cast("int")
        lut_expr = lut_expr + F.element_at(
            F.array(*[F.lit(v) for v in lut]), code_i + F.lit(1)
        )
    # per-cell constant offset dot(q, c), bound as a literal map
    off = F.create_map(
        *[
            x
            for cell in probes
            for x in (F.lit(cell), F.lit(float(centroids[cell] @ q)))
        ]
    )
    pruned = codes.filter(F.col("centroid").isin(probes))
    approx = pruned.select(
        F.col(id_col),
        (off[F.col("centroid")] + lut_expr).alias("_adc"),
    )
    short = (
        approx.orderBy(F.desc("_adc"), F.asc(id_col))
        .limit(candidates)
        .select(id_col)
    )
    cand_vecs = emb.join(F.broadcast(short), id_col, "left_semi")
    return cosine_topk(cand_vecs, query_vec, k=k, id_col=id_col, vec_col=vec_col)
