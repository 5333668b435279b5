"""Scale-path pipeline operators: LSH dedup (banding -> pairs -> verify ->
connected components), SimHash Hamming bucketing, trained IVF, bucketed kNN
join. Each approximate path is checked against its exact counterpart —
the recall/completeness contract that matters at 10^12 docs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


# ---------------------------------------------------------------------------
# LSH dedup
# ---------------------------------------------------------------------------

def _brute_pairs(spark, docs, threshold=0.8):
    """Exact all-pairs shingle-Jaccard >= threshold (test scale only)."""
    from lucene_solr_spark.pipeline.dedup import shingle_grams

    sh = shingle_grams(docs, 3)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.select(F.col("doc_id").alias("a"), "gram")
    b = sh.select(F.col("doc_id").alias("b"), "gram")
    inter = (
        a.join(b, "gram")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("i"))
    )
    j = (
        inter.join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("sz", "sa"), "a")
        .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("sz", "sb"), "b")
        .withColumn("j", F.col("i") / (F.col("sa") + F.col("sb") - F.col("i")))
        .filter(F.col("j") >= threshold)
    )
    return {(r["a"], r["b"]) for r in j.collect()}


def test_lsh_pairs_recall_and_precision(spark, docs):
    """Banded LSH + exact verify must equal brute-force pairs: the verify
    stage guarantees precision 1.0; b=8 × r=2 banding at j>=0.8 has miss
    probability (1-0.8^2)^8 ≈ 3e-4 per pair -> recall 1.0 expected here."""
    from lucene_solr_spark.pipeline.dedup import (
        lsh_candidate_pairs,
        minhash_over,
        shingle_grams,
        verify_jaccard,
    )

    truth = _brute_pairs(spark, docs, 0.8)
    assert truth, "fixture must contain near-dup pairs"
    sh = shingle_grams(docs, 3)
    sig = minhash_over(sh, 16)
    pairs = lsh_candidate_pairs(sig, 8, 2)
    got = {
        (r["a"], r["b"])
        for r in verify_jaccard(sh, pairs, 0.8).collect()
    }
    assert got <= truth  # exact verify: no false positives, ever
    recall = len(got & truth) / len(truth)
    assert recall == 1.0, f"recall {recall}: missed {truth - got}"


def test_connected_components_shapes(spark):
    """Chain, triangle, and isolated pair resolve to min-id components."""
    from lucene_solr_spark.pipeline.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4),      # chain -> cluster 1
         (10, 11), (11, 12), (10, 12),  # triangle -> cluster 10
         (20, 21)],                     # pair -> cluster 20
        "a long, b long",
    )
    got = {
        r["doc_id"]: r["cluster"] for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1,
                   10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_lsh_dedup_keep_one(spark, docs):
    """End-to-end: keep-one policy removes exactly (n_docs_in_clusters -
    n_clusters) docs, and every removed doc has a kept near-dup."""
    from lucene_solr_spark.pipeline.dedup import lsh_dedup_clusters

    cc = lsh_dedup_clusters(docs, 3, 8, 2, 0.8)
    rows = cc.collect()
    clusters = {}
    for r in rows:
        clusters.setdefault(r["cluster"], []).append(r["doc_id"])
    for cid, members in clusters.items():
        assert cid == min(members)  # keep-one = min doc id
        assert len(members) >= 2


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def test_simhash_chunk_bucketing_is_complete(spark, docs):
    """Pigeonhole: 4×16-bit chunk join must find EVERY pair with Hamming
    <= 3 (pairs within <= chunks-1 flips share an exact chunk)."""
    from lucene_solr_spark.pipeline.dedup import (
        simhash64,
        simhash_hamming_candidates,
    )

    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    sim = simhash64(tok).persist()
    bucketed = {
        (r["a"], r["b"], r["hamming"])
        for r in simhash_hamming_candidates(sim, 3).collect()
    }
    a = sim.select(F.col("doc_id").alias("a"), F.col("simhash").alias("ha"))
    b = sim.select(F.col("doc_id").alias("b"), F.col("simhash").alias("hb"))
    allp = (
        a.crossJoin(b)
        .filter(F.col("a") < F.col("b"))
        .select(
            "a", "b",
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
    )
    exact = {(r["a"], r["b"], r["hamming"]) for r in allp.collect()}
    sim.unpersist()
    assert bucketed == exact
    assert exact, "fixture must contain simhash near-dups"


def test_simhash_mixed_sign_chunk0_pair(spark):
    """Regression: chunk extraction must be sign-safe. This pair is
    negative-vs-positive and shares ONLY chunk 0 (low 16 bits); with the
    old `% 65536` extraction (Spark's % keeps the dividend's sign) the
    negative hash got a negative chunk-0 key and the pair was never
    joined, breaking pigeonhole completeness."""
    from lucene_solr_spark.pipeline.dedup import simhash_hamming_candidates

    ha = -(1 << 63) + (1 << 32) + (1 << 16) + 5   # negative; c1,c2,c3 differ
    hb = 5                                         # positive; shares only c0
    sim = spark.createDataFrame(
        [(1, ha), (2, hb)], "doc_id long, simhash long"
    )
    got = {
        (r["a"], r["b"], r["hamming"])
        for r in simhash_hamming_candidates(sim, max_hamming=3).collect()
    }
    assert got == {(1, 2, 3)}


def test_lsh_hot_bucket_cap_bounds_pairs(spark):
    """One degenerate bucket (2k identical signatures — the boilerplate-
    page case) must yield O(n) star pairs, not n(n-1)/2 ≈ 2M; the star
    keeps every member connected to the bucket min so downstream
    connected components still collapse the cluster. lsh_bucket_stats
    surfaces the capped bucket."""
    from lucene_solr_spark.pipeline.dedup import (
        connected_components,
        lsh_bucket_stats,
        lsh_candidate_pairs,
    )

    n = 2000
    sig = spark.createDataFrame(
        [(i, "x", "x") for i in range(n)], "doc_id long, mh_0 string, mh_1 string"
    )
    pairs = lsh_candidate_pairs(sig, bands=1, rows_per_band=2, max_bucket=100)
    rows = pairs.collect()
    assert len(rows) == n - 1  # star: each non-min doc linked to doc 0
    assert {r["a"] for r in rows} == {0}
    cc = connected_components(pairs).collect()
    assert {r["cluster"] for r in cc} == {0} and len(cc) == n
    stats = lsh_bucket_stats(sig, 1, 2, max_bucket=100).collect()
    assert len(stats) == 1 and stats[0]["n_docs"] == n


def test_lsh_small_buckets_unaffected_by_cap(spark, docs):
    """With the default cap, real-fixture pairs are identical to the
    uncapped all-pairs result (no bucket in the fixture is oversized)."""
    from lucene_solr_spark.pipeline.dedup import (
        lsh_candidate_pairs,
        minhash_over,
        shingle_grams,
    )

    sig = minhash_over(shingle_grams(docs, 3), 16)
    capped = {
        (r["a"], r["b"]) for r in lsh_candidate_pairs(sig, 8, 2).collect()
    }
    uncapped = {
        (r["a"], r["b"])
        for r in lsh_candidate_pairs(sig, 8, 2, max_bucket=10**9).collect()
    }
    assert capped == uncapped


def test_connected_components_checkpointed_chain(spark):
    """A 20-node chain needs 19 propagation rounds — several
    localCheckpoint() lineage truncations — and must still converge to
    the min-id component."""
    from lucene_solr_spark.pipeline.dedup import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 119)], "a long, b long"
    )
    got = {
        r["doc_id"]: r["cluster"]
        for r in connected_components(edges, max_iter=25, checkpoint_every=3).collect()
    }
    assert got == {i: 100 for i in range(100, 120)}


# ---------------------------------------------------------------------------
# IVF + bucketed kNN join
# ---------------------------------------------------------------------------

def _clustered_embeddings(spark, n_clusters=8, per=40, dim=16, seed=7):
    import numpy as np

    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim)) * 5.0
    rows = []
    i = 0
    for c in range(n_clusters):
        pts = centers[c] + rng.standard_normal((per, dim))
        for p in pts:
            rows.append((i, [float(x) for x in p]))
            i += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_ivf_recall_on_clustered_data(spark):
    """On genuinely clustered data (the case IVF exists for), nprobe=1
    already recovers the true top-10; the fixture's near-uniform vectors
    are the documented worst case needing high nprobe."""
    from lucene_solr_spark.pipeline.similarity import (
        cosine_topk,
        ivf_probe_topk,
        ivf_train,
    )

    e = _clustered_embeddings(spark)
    qrow = e.filter(F.col("vec_id") == 0).first()
    qv = list(qrow["embedding"])
    rest = e.filter(F.col("vec_id") != 0)
    exact = [r["vec_id"] for r in cosine_topk(rest, qv, 10).collect()]
    assigned, cents = ivf_train(rest, n_centroids=8, seed=42)
    got = [
        r["vec_id"]
        for r in ivf_probe_topk(assigned, cents, qv, nprobe=1, k=10).collect()
    ]
    recall = len(set(got) & set(exact)) / 10
    assert recall >= 0.9, f"nprobe=1 recall {recall} on separated clusters"


def test_knn_join_bucketed_recall_clustered(spark):
    """Bucketed (LSH+multiprobe) kNN join vs the exact broadcast join on
    clustered data — the workload LSH bucketing exists for. (On the
    fixture's near-uniform vectors, hyperplane LSH recall is inherently
    low — near-orthogonal vectors straddle every hyperplane — so the
    uniform case below only sanity-checks better-than-random.)"""
    from lucene_solr_spark.pipeline.similarity import (
        knn_join,
        knn_join_bucketed,
    )

    e = _clustered_embeddings(spark)
    left = e.filter(F.col("vec_id") < 10)
    exact = {
        (r["qid"], r["nid"]) for r in knn_join(left, e, k=3).collect()
    }
    approx = {
        (r["qid"], r["nid"])
        for r in knn_join_bucketed(left, e, k=3).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"bucketed kNN recall {recall} on clustered data"


def test_knn_join_bucketed_beats_random_on_uniform(spark, emb):
    """Near-uniform fixture: bucketed join must still beat the random-
    bucketing baseline (own bucket + 4 multiprobes ≈ 5/16 of the corpus)."""
    from lucene_solr_spark.pipeline.similarity import (
        knn_join,
        knn_join_bucketed,
    )

    left = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r["qid"], r["nid"]) for r in knn_join(left, emb, k=3).collect()
    }
    approx = {
        (r["qid"], r["nid"])
        for r in knn_join_bucketed(left, emb, k=3).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, f"uniform-data recall {recall} (random ≈ 0.31 scan)"


def test_simhash_manku_complete_random(spark):
    """Manku multi-table scheme finds EXACTLY the brute-force Hamming<=3
    pair set over random 64-bit hashes, including mixed-sign and planted
    pairs whose differing bits straddle three different blocks."""
    import random

    from lucene_solr_spark.pipeline.dedup import simhash_manku_candidates

    def signed(u):
        return u - (1 << 64) if u >= (1 << 63) else u

    rng = random.Random(7)
    raw = [rng.getrandbits(64) for _ in range(60)]
    hashes = [(i, signed(u)) for i, u in enumerate(raw)]
    # planted near-dups: flip bits in three DIFFERENT 11/10-bit blocks
    # (flips done in the unsigned domain, then converted once)
    for j, bits in enumerate([(0,), (5, 20), (3, 25, 60), (63,)]):
        v = raw[0]
        for b in bits:
            v ^= 1 << b
        hashes.append((100 + j, signed(v)))
    sim = spark.createDataFrame(hashes, "doc_id long, simhash long")
    got = {
        (r["a"], r["b"], r["hamming"])
        for r in simhash_manku_candidates(sim, max_hamming=3).collect()
    }
    a = sim.select(F.col("doc_id").alias("a"), F.col("simhash").alias("ha"))
    b = sim.select(F.col("doc_id").alias("b"), F.col("simhash").alias("hb"))
    exact = {
        (r["a"], r["b"], r["hamming"])
        for r in a.crossJoin(b)
        .filter(F.col("a") < F.col("b"))
        .select(
            "a", "b",
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
        .collect()
    }
    assert got == exact
    # the 4 planted pairs (vs doc 0) must all be present
    planted = {(0, 100, 1), (0, 101, 2), (0, 102, 3), (0, 103, 1)}
    assert planted <= got


# ---------------------------------------------------------------------------
# Product quantization ADC (pipeline/pq.py)
# ---------------------------------------------------------------------------

def test_pq_codes_shape_and_range(spark, emb):
    from lucene_solr_spark.pipeline import pq as PQ

    cb = PQ.pq_train(emb, m=16, ksub=16, sample_rows=256, iters=5)
    assert cb.shape == (16, 16, 4)  # 64-dim corpus -> dsub=4
    codes = PQ.pq_encode(emb, cb).collect()
    assert len(codes) == emb.count()
    for r in codes:
        assert len(r["pq_code"]) == 16
        assert all(0 <= c < 16 for c in r["pq_code"])


def test_pq_adc_recall_vs_brute(spark, emb):
    """PQ is a candidate generator for exact rerank: the ADC shortlist at
    candidates=50 (10% of this near-uniform fixture) must retain >= 0.7 of
    the true top-10, and the reranked top-10 must equal the shortlist's
    survivors (rerank is exact). Near-uniform vectors are the hard case —
    real embedding corpora cluster and recall rises."""
    from lucene_solr_spark.pipeline import pq as PQ
    from lucene_solr_spark.pipeline.similarity import cosine_topk

    row = emb.filter(F.col("vec_id") == 3).first()
    qv = [float(x) for x in row["embedding"]]
    rest = emb.filter(F.col("vec_id") != 3)
    truth = [r["vec_id"] for r in cosine_topk(rest, qv, k=10).collect()]

    cb = PQ.pq_train(rest, m=16, ksub=16)
    codes = PQ.pq_encode(rest, cb)
    short = {r["vec_id"] for r in PQ.pq_adc_topk(codes, cb, qv, k=50).collect()}
    shortlist_recall = len(set(truth) & short) / 10.0
    assert shortlist_recall >= 0.7, f"ADC shortlist recall too low: {shortlist_recall}"

    final = [r["vec_id"] for r in
             PQ.pq_topk_rerank(rest, codes, cb, qv, k=10, candidates=50).collect()]
    # exact rerank: every true neighbor that survived the shortlist must be
    # in the final top-10, in true cosine order
    survivors = [v for v in truth if v in short]
    assert final[: len(survivors)] == survivors


def test_pq_adc_plan_is_jvm_side(spark, emb):
    """The ADC scan must stay in whole-stage codegen (literal LUT
    element_at sums) and end in TakeOrderedAndProject — no Python UDF, no
    global sort in the query path."""
    from lucene_solr_spark.pipeline import pq as PQ

    cb = PQ.pq_train(emb, m=16, ksub=16, sample_rows=128, iters=3)
    codes = PQ.pq_encode(emb, cb)
    qv = [0.1] * 64
    plan = PQ.pq_adc_topk(codes, cb, qv, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    head = plan.split("ArrowEvalPython")[0] if "ArrowEvalPython" in plan else plan
    assert "BatchEvalPython" not in head  # no row-at-a-time python anywhere


# ---------------------------------------------------------------------------
# Multi-language ID (textqc.lang_id_multi)
# ---------------------------------------------------------------------------

def test_lang_id_multi_classifies_fixed_sentences(spark):
    from lucene_solr_spark.pipeline import textqc as TQ

    rows = [
        (1, "the cat and the dog that was in the house for it is not this"),
        (2, "der hund und die katze laufen nicht in das haus von dem mann"),
        (3, "le chat et les chiens sont dans la maison pour que il dort"),
        (4, "el perro y la casa de los gatos es una cosa que se ve con el"),
        (5, "zzz qqq xyzzy plugh foobar quux grault garply waldo fred"),
        (6, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r["pred_lang"] for r in TQ.lang_id_multi(df).collect()}
    assert got == {1: "en", 2: "de", 3: "fr", 4: "es", 5: "und", 6: "und"}


def test_lang_id_multi_tie_breaks_by_profile_order(spark):
    from lucene_solr_spark.pipeline import textqc as TQ

    # 'no' is in the es profile only; 'the' en only; equal counts -> en wins
    df = spark.createDataFrame([(1, "the no the no")], ["doc_id", "text"])
    r = TQ.lang_id_multi(df).first()
    assert r["pred_lang"] == "en"


# ---------------------------------------------------------------------------
# SQ8 scalar quantization + line-level dedup
# ---------------------------------------------------------------------------

def test_sq8_roundtrip_error_bounded(spark, emb):
    """Quantize -> dequantize error per dimension is bounded by half a step
    ((mx-mn)/255/2) — the defining property of the affine int8 quantizer."""
    from lucene_solr_spark.pipeline import pq as PQ

    mins, maxs = PQ.sq8_stats(emb)
    codes = PQ.sq8_encode(emb, mins, maxs)
    joined = emb.join(codes, "vec_id").select("embedding", "sq_code").collect()
    for r in joined:
        for j, (x, c) in enumerate(zip(r["embedding"], r["sq_code"])):
            step = (maxs[j] - mins[j]) / 255.0
            xh = mins[j] + c * step
            assert abs(float(x) - xh) <= step / 2 + 1e-9


def test_sq8_topk_close_to_exact(spark, emb):
    """int8 quantization at 64 dims keeps cosine error ~1e-3: the SQ8
    top-10 must share >= 8 of the exact top-10."""
    from lucene_solr_spark.pipeline import pq as PQ
    from lucene_solr_spark.pipeline.similarity import cosine_topk

    row = emb.filter(F.col("vec_id") == 7).first()
    qv = [float(x) for x in row["embedding"]]
    rest = emb.filter(F.col("vec_id") != 7)
    truth = {r["vec_id"] for r in cosine_topk(rest, qv, k=10).collect()}
    got = {r["vec_id"] for r in PQ.sq8_search(rest, qv, k=10).collect()}
    assert len(truth & got) >= 8


def test_line_dedup_finds_shared_boilerplate(spark):
    from lucene_solr_spark.pipeline.dedup import line_dedup_stats

    boiler = "subscribe to our newsletter for weekly updates and offers"
    rows = [
        (1, f"unique first doc. {boiler}. more text here for padding"),
        (2, f"second document body. {boiler}. trailing content words"),
        (3, f"third one with {boiler} inline but not sentence-split"),
        (4, "no shared units at all in this document body text"),
        (5, f"{boiler}. {boiler}. repeated twice in one doc"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = line_dedup_stats(df).collect()
    # the boilerplate sentence: docs 1, 2, 5 split it out exactly
    # (doc 3 embeds it mid-sentence -> different unit)
    top = got[0]
    assert top["n_docs"] == 3 and top["n_occurrences"] == 4


def test_line_dedup_ignores_short_units(spark):
    from lucene_solr_spark.pipeline.dedup import line_dedup_stats

    rows = [(1, "ok. ok. ok"), (2, "ok. yes. no")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    assert line_dedup_stats(df, min_len=20).count() == 0


# ---------------------------------------------------------------------------
# Data mixing + unigram-LM scoring (pipeline/sampling.py)
# ---------------------------------------------------------------------------

def test_sample_mix_deterministic_and_rate_shaped(spark):
    from lucene_solr_spark.pipeline.sampling import sample_mix

    rows = [(i, "s_keep" if i % 2 == 0 else "s_drop") for i in range(2000)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    kept = sample_mix(df, {"s_keep": 1.0, "s_drop": 0.0})
    got = kept.groupBy("source").count().collect()
    assert {r["source"]: r["count"] for r in got} == {"s_keep": 1000}
    # half-rate keeps roughly half (hash-uniform), and re-running the
    # plan returns the identical subset (deterministic hash, no RNG)
    half = sample_mix(df, {"s_keep": 0.5, "s_drop": 0.5})
    n1 = half.count()
    assert 800 <= n1 <= 1200
    ids1 = {r["doc_id"] for r in half.collect()}
    ids2 = {r["doc_id"] for r in half.collect()}
    assert ids1 == ids2


def test_unigram_logprob_ranks_rare_text_lower(spark):
    from lucene_solr_spark.pipeline.sampling import unigram_logprob

    common = "the cat sat on the mat " * 5
    rows = [(i, common.strip()) for i in range(9)] + [
        (9, "zqx wvu kjh gfd bnm poi")
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r["mean_logprob"] for r in unigram_logprob(df).collect()}
    assert got[9] < got[0]  # rare-token doc scores lower
