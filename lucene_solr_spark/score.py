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


_LOG2_E = 1.4426950408889634  # log2(e)


def dfr_tfn(tf: Column, dl: Column, avgdl: float, norm: str, c: float) -> Column:
    """DFR second (length) normalization (Amati & van Rijsbergen 2002;
    lucene .../similarities/Normalization*.java):
      h1: tfn = c * tf * avgdl / dl        (uniform density)
      h2: tfn = tf * log2(1 + c*avgdl/dl)  (logarithmic density)
      h3: tfn = tf * (tf + c*mu) ... not in the 2-param family — the h3/z
          members take term-level stats; the two H members Lucene defaults
          to are covered; 'none' = raw tf.
    """
    if norm == "h1":
        return F.lit(c) * tf * F.lit(float(avgdl)) / dl
    if norm == "h2":
        return _tfn_h2(tf, dl, avgdl, c)
    if norm == "none":
        return tf + F.lit(0.0)
    raise ValueError(f"unknown DFR normalization {norm!r}")


def dfr_score(
    tf: Column,
    dl: Column,
    df_col: Column,
    ttf: Column,
    n_docs: int,
    avgdl: float,
    basic: str = "in",
    after: str = "l",
    norm: str = "h2",
    c: float = 1.0,
    boost: float = 1.0,
) -> Column:
    """Full DFR matrix (DFRSimilarity = BasicModel x AfterEffect x
    Normalization; SURVEY §3.5; formulas per the published framework —
    Amati & van Rijsbergen, TOIS 2002, as also documented by the
    similarities package and the Terrier platform).

    Basic models (Inf1, with lambda = F/N, F = collection ttf of the term):
      in : tfn * log2((N+1) / (df+0.5))                        (inverse doc freq)
      if : tfn * log2((N+1) / (F+0.5))                         (inverse term freq)
      ine: tfn * log2((N+1) / (ne+0.5)),
           ne = N * (1 - ((N-1)/N)^F)                          (expected-n)
      g  : log2(1+lam) + tfn * log2((1+lam)/lam),
           lam = F/(N+F)                                       (geometric BE limit)
      be : -log2(1/(1+lam)) - tfn*log2(lam/(1+lam)), lam = F/N (Bose-Einstein)
      p  : tfn*log2(tfn/lam) + (lam + 1/(12*tfn) - tfn)*log2(e)
           + 0.5*log2(2*pi*tfn)                                (Poisson/Stirling)
      d  : F*phi*log2(phi/p) + F*(1-phi)*log2((1-phi)/(1-p))
           + 0.5*log2(2*pi*tfn*(1-phi)),
           phi = tfn/F, p = 1/N                                (binomial divergence)

    After-effects (Inf2 gain): l = 1/(tfn+1); b = (F+1)/(df*(tfn+1));
    none = 1.  score = boost * Inf2 * Inf1, floored at 0.
    """
    import math

    tfn = dfr_tfn(tf, dl, avgdl, norm, c)
    n = F.lit(float(n_docs))
    lam = ttf / n
    if basic == "in":
        inf1 = tfn * F.log2((n + 1.0) / (df_col + 0.5))
    elif basic == "if":
        inf1 = tfn * F.log2((n + 1.0) / (ttf + 0.5))
    elif basic == "ine":
        ne = n * (1.0 - F.pow((n - 1.0) / n, ttf))
        inf1 = tfn * F.log2((n + 1.0) / (ne + 0.5))
    elif basic == "g":
        lam_g = ttf / (n + ttf)
        inf1 = F.log2(1.0 + lam_g) + tfn * F.log2((1.0 + lam_g) / lam_g)
    elif basic == "be":
        inf1 = F.log2(1.0 + lam) + tfn * F.log2((1.0 + lam) / lam)
    elif basic == "p":
        inf1 = (
            tfn * F.log2(tfn / lam)
            + (lam + 1.0 / (12.0 * tfn) - tfn) * F.lit(_LOG2_E)
            + 0.5 * F.log2(F.lit(2.0 * math.pi) * tfn)
        )
    elif basic == "d":
        # tfn is length-normalized and can exceed F for a short doc holding
        # most occurrences; phi must stay in (0, 1) for the binomial form
        phi = F.least(tfn / ttf, F.lit(1.0 - 1e-9))
        inf1 = (
            ttf * phi * F.log2(phi * n)
            + ttf * (1.0 - phi) * F.log2((1.0 - phi) / (1.0 - 1.0 / n))
            + 0.5 * F.log2(F.lit(2.0 * math.pi) * tfn * (1.0 - phi))
        )
    else:
        raise ValueError(f"unknown DFR basic model {basic!r}")
    if after == "l":
        inf2 = 1.0 / (tfn + 1.0)
    elif after == "b":
        inf2 = (ttf + 1.0) / (df_col * (tfn + 1.0))
    elif after == "none":
        inf2 = F.lit(1.0)
    else:
        raise ValueError(f"unknown DFR after-effect {after!r}")
    return F.lit(boost) * F.greatest(inf2 * inf1, F.lit(0.0))


def ib_score(
    tf: Column,
    dl: Column,
    df_col: Column,
    ttf: Column,
    n_docs: int,
    avgdl: float,
    distribution: str = "ll",
    lambda_model: str = "df",
    norm: str = "h2",
    c: float = 1.0,
    boost: float = 1.0,
) -> Column:
    """Full IB matrix (IBSimilarity = Distribution x Lambda x Normalization;
    information-based models of Clinchant & Gaussier, SIGIR 2010):
      lambda: df  = (df+1)/(N+1);  ttf = (F+1)/(N+1)
      ll  (log-logistic):           score = log((tfn + lam) / lam)
      spl (smoothed power law):     score = -log((lam^(tfn/(tfn+1)) - lam)
                                                 / (1 - lam))
    """
    tfn = dfr_tfn(tf, dl, avgdl, norm, c)
    n = F.lit(float(n_docs))
    if lambda_model == "df":
        lam = (df_col + 1.0) / (n + 1.0)
    elif lambda_model == "ttf":
        lam = (ttf + 1.0) / (n + 1.0)
    else:
        raise ValueError(f"unknown IB lambda {lambda_model!r}")
    if distribution == "ll":
        raw = F.log((tfn + lam) / lam)
    elif distribution == "spl":
        raw = -F.log((F.pow(lam, tfn / (tfn + 1.0)) - lam) / (1.0 - lam))
    else:
        raise ValueError(f"unknown IB distribution {distribution!r}")
    return F.lit(boost) * F.greatest(raw, F.lit(0.0))


def multi_similarity_score(sub_scores: list[Column]) -> Column:
    """MultiSimilarity (lucene .../similarities/MultiSimilarity.java):
    CombSUM evidence combination (Shaw & Fox 1994) — the document score is
    the SUM of each member similarity's score for the same match."""
    out = sub_scores[0]
    for s in sub_scores[1:]:
        out = out + s
    return out


class PerFieldSimilarity:
    """PerFieldSimilarityWrapper (lucene .../similarities/
    PerFieldSimilarityWrapper.java, solr SchemaSimilarityFactory): resolves
    the similarity *expression factory* by field name at plan-build time —
    each field's query clauses are scored by that field's similarity, and
    clause scores combine exactly as the boolean DAG prescribes (the
    wrapper changes only which SimScorer a field binds)."""

    def __init__(self, default, per_field: dict | None = None):
        self.default = default
        self.per_field = per_field or {}

    def get(self, field: str):
        return self.per_field.get(field, self.default)


SIMILARITIES = {
    "bm25": bm25_score,
    "classic": classic_score,
}


def sweetspot_score(
    tf: Column,
    dlq: Column,
    df_col: Column,
    n_docs: int,
    ln_min: int = 1,
    ln_max: int = 1,
    steepness: float = 0.5,
    tf_base: float = 0.0,
    tf_min: float = 0.0,
    boost: float = 1.0,
) -> Column:
    """SweetSpotSimilarity (lucene/misc/src/java/org/apache/lucene/misc/
    SweetSpotSimilarity.java ≈L40) — ClassicSimilarity with two tuned
    curves:

      baselineTf:  freq <= tf_min -> tf_base, else
                   sqrt(freq + tf_base² − tf_min)   (baselineTf ≈L120)
      lengthNorm:  1 / sqrt( steepness · (|len−min| + |len−max|
                   − (max−min)) + 1 )               (lengthNorm ≈L90)
                   == 1 inside the [ln_min, ln_max] plateau, hyperbolic
                   falloff outside — docs in the sweet-spot length range
                   are NOT penalized relative to each other.

    idf is Classic's (ln((N+1)/(df+1)) + 1)², as SweetSpot inherits it.
    """
    t = tf.cast("double")
    base_tf = F.when(t <= F.lit(float(tf_min)), F.lit(float(tf_base))).otherwise(
        F.sqrt(t + F.lit(float(tf_base) ** 2) - F.lit(float(tf_min)))
    )
    length = dlq.cast("double")
    spread = float(ln_max - ln_min)
    norm = 1.0 / F.sqrt(
        F.lit(float(steepness))
        * (
            F.abs(length - F.lit(float(ln_min)))
            + F.abs(length - F.lit(float(ln_max)))
            - F.lit(spread)
        )
        + 1.0
    )
    idf = F.log((F.lit(float(n_docs)) + 1.0) / (df_col + 1.0)) + 1.0
    return F.lit(float(boost)) * base_tf * idf * idf * norm
