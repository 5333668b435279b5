"""Similarity scoring as pure Spark Column expressions (JVM-side, inside
whole-stage codegen — no Python in the hot scoring path).

Reference parity (SURVEY.md §3.5,
lucene/core/src/java/org/apache/lucene/search/similarities/):

  * BM25Similarity (8.x form, LUCENE-8563: NO (k1+1) numerator):
      idf  = ln(1 + (N - df + 0.5) / (df + 0.5))          (#idf ≈L80)
      norm = k1 * (1 - b + b * dlq / avgdl)               (BM25Scorer cache)
      score = boost * idf * tf / (tf + norm)
    with dlq = SmallFloat-decoded quantized doc length (LENGTH_TABLE) and
    avgdl = sumTotalTermFreq / docCount (exact global stats — our build
    computes them by construction; ExactStatsCache semantics).
  * ClassicSimilarity (TF-IDF): sqrt(tf) * idf^2, idf = log((N+1)/(df+1))+1,
    lengthNorm = 1/sqrt(dlq).
  * BooleanSimilarity: score = boost.
  * LMDirichletSimilarity (mu=2000), LMJelinekMercerSimilarity (lambda=0.1):
    language-model scores over (tf, dlq, ttf, sum_ttf).

All are stateless per (term, doc) given collection stats -> parameterized
Column factories score(tf, dlq; df, N, avgdl).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from . import BM25_B, BM25_K1


def bm25_idf(df_col: Column, n_docs: int) -> Column:
    return F.log(
        1.0 + (F.lit(float(n_docs)) - df_col + 0.5) / (df_col + 0.5)
    )


def bm25_score(
    tf: Column,
    dlq: Column,
    df_col: Column,
    n_docs: int,
    avgdl: float,
    k1: float = BM25_K1,
    b: float = BM25_B,
    boost: float = 1.0,
) -> Column:
    norm = F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dlq / F.lit(float(avgdl)))
    return F.lit(boost) * bm25_idf(df_col, n_docs) * tf / (tf + norm)


def classic_score(
    tf: Column, dlq: Column, df_col: Column, n_docs: int, boost: float = 1.0
) -> Column:
    idf = F.log((F.lit(float(n_docs)) + 1.0) / (df_col + 1.0)) + 1.0
    return F.lit(boost) * F.sqrt(tf) * idf * idf / F.sqrt(dlq)


def boolean_score(boost: float = 1.0) -> Column:
    return F.lit(float(boost))


def lm_dirichlet_score(
    tf: Column,
    dlq: Column,
    ttf: Column,
    sum_ttf: int,
    mu: float = 2000.0,
    boost: float = 1.0,
) -> Column:
    # score = log(1 + tf / (mu * p(t|C))) + log(mu / (dlq + mu)), clipped >= 0
    p_c = ttf / F.lit(float(sum_ttf))
    raw = F.log(1.0 + tf / (F.lit(mu) * p_c)) + F.log(F.lit(mu) / (dlq + F.lit(mu)))
    return F.lit(boost) * F.greatest(raw, F.lit(0.0))


def lm_jelinek_mercer_score(
    tf: Column,
    dlq: Column,
    ttf: Column,
    sum_ttf: int,
    lam: float = 0.1,
    boost: float = 1.0,
) -> Column:
    p_c = ttf / F.lit(float(sum_ttf))
    raw = F.log(1.0 + (F.lit(1.0 - lam) * tf / dlq) / (F.lit(lam) * p_c))
    return F.lit(boost) * F.greatest(raw, F.lit(0.0))


def _tfn_h2(tf: Column, dl: Column, avgdl: float, c: float = 1.0) -> Column:
    """NormalizationH2 (Amati & van Rijsbergen DFR framework):
    tfn = tf * log2(1 + c * avgdl / dl)."""
    return tf * F.log2(1.0 + F.lit(c) * F.lit(float(avgdl)) / dl)


def dfr_inl2_score(
    tf: Column,
    dl: Column,
    df_col: Column,
    n_docs: int,
    avgdl: float,
    c: float = 1.0,
    boost: float = 1.0,
) -> Column:
    """DFR I(n)L2 (DFRSimilarity with BasicModelIn + AfterEffectL +
    NormalizationH2; formulas per the published DFR framework — Amati &
    van Rijsbergen 2002, the same ones the similarities package
    documents):
      tfn   = tf * log2(1 + c*avgdl/dl)
      In    = tfn * log2((N + 1) / (df + 0.5))
      L     = 1 / (tfn + 1)
      score = boost * L * In
    """
    tfn = _tfn_h2(tf, dl, avgdl, c)
    basic = tfn * F.log2((F.lit(float(n_docs)) + 1.0) / (df_col + 0.5))
    after = 1.0 / (tfn + 1.0)
    return F.lit(boost) * after * basic


def ib_ll_score(
    tf: Column,
    dl: Column,
    df_col: Column,
    n_docs: int,
    avgdl: float,
    c: float = 1.0,
    boost: float = 1.0,
) -> Column:
    """IB LL/DF/H2 (IBSimilarity with DistributionLL + LambdaDF +
    NormalizationH2; information-based model of Clinchant & Gaussier 2010):
      tfn    = tf * log2(1 + c*avgdl/dl)
      lambda = (df + 1) / (N + 1)
      score  = boost * log((tfn + lambda) / lambda)
    """
    tfn = _tfn_h2(tf, dl, avgdl, c)
    lam = (df_col + 1.0) / (F.lit(float(n_docs)) + 1.0)
    return F.lit(boost) * F.log((tfn + lam) / lam)


def axiomatic_f2exp_score(
    tf: Column,
    dl: Column,
    df_col: Column,
    n_docs: int,
    avgdl: float,
    s: float = 0.5,
    k: float = 0.35,
    boost: float = 1.0,
) -> Column:
    """Axiomatic F2EXP (Fang & Zhai 2005; AxiomaticF2EXP):
      score = boost * (N / df)^k * tf / (tf + s + s * dl / avgdl)
    """
    idf = F.pow(F.lit(float(n_docs)) / df_col, F.lit(k))
    return (
        F.lit(boost)
        * idf
        * tf
        / (tf + F.lit(s) + F.lit(s) * dl / F.lit(float(avgdl)))
    )


def dfi_chi2_score(
    tf: Column,
    dl: Column,
    ttf: Column,
    sum_ttf: int,
    boost: float = 1.0,
) -> Column:
    """DFI with the chi-squared independence measure (DFISimilarity +
    IndependenceChiSquared; Kocabas/Dincer/Karaoglan 2011 "divergence from
    independence"): expected freq under independence e = dl * ttf/sumTTF;
    measure = (tf - e)^2 / e; score = boost * log2(measure + 1), and terms
    at-or-below their expected frequency contribute nothing."""
    e = dl * ttf / F.lit(float(sum_ttf))
    measure = (tf - e) * (tf - e) / e
    raw = F.log2(measure + 1.0)
    return F.lit(boost) * F.when(tf > e, raw).otherwise(F.lit(0.0))


SIMILARITIES = {
    "bm25": bm25_score,
    "classic": classic_score,
}
