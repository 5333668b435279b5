"""Math-expression evaluators — the Streaming Expressions math library
(solr/solrj/src/java/org/apache/solr/client/solrj/io/eval/*Evaluator.java,
~250 classes; SURVEY.md §3.9 'math evaluators'). The families a real user
reaches for, re-expressed as DISTRIBUTED DataFrame aggregations rather
than Solr's driver-side tuple evaluation:

  * describe / percentile / hist     — DescribeEvaluator, HistogramEvaluator
  * regress / predict                — RegressionEvaluator, PredictEvaluator
  * corr / cov                       — CorrelationEvaluator, CovarianceEvaluator
  * conv (time-series smoothing)     — ConvolutionEvaluator
  * ttest / anova                    — TTestEvaluator, AnovaEvaluator
  * normalDistribution / cumulativeProbability — NormalDistributionEvaluator

Aggregates and window math run JVM-side (whole-stage codegen). p-values
need the regularized incomplete beta, which SQL lacks — it is computed
DRIVER-SIDE on the two or three scalars the distributed agg returns,
using the classic continued-fraction algorithm (Numerical Recipes §6.4,
public domain formulation; also how commons-math does it under Solr).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# Descriptive statistics
# ---------------------------------------------------------------------------


def describe_stream(df: DataFrame, col: str) -> DataFrame:
    """DescribeEvaluator: one-row summary (count, mean, stddev, min, max,
    exact interpolated quartiles). Uses Spark's exact `percentile`
    (linear interpolation — the same definition as commons-math's default
    and DuckDB's quantile_cont)."""
    c = F.col(col)
    return df.agg(
        F.count(c).alias("n"),
        F.avg(c).alias("mean"),
        F.stddev_samp(c).alias("stddev"),
        F.min(c).alias("min"),
        F.expr(f"percentile({col}, 0.25)").alias("p25"),
        F.expr(f"percentile({col}, 0.5)").alias("p50"),
        F.expr(f"percentile({col}, 0.75)").alias("p75"),
        F.max(c).alias("max"),
    )


def hist_stream(
    df: DataFrame, col: str, lo: float, hi: float, nbins: int
) -> DataFrame:
    """HistogramEvaluator: fixed-range equal-width bins -> (bin, n).
    Values outside [lo, hi) clamp to the edge bins (commons-math
    EmpiricalDistribution convention); one map + one agg, scale-free."""
    w = (hi - lo) / nbins
    c = F.col(col)
    bin_col = F.least(
        F.greatest(F.floor((c - F.lit(lo)) / F.lit(w)), F.lit(0)),
        F.lit(nbins - 1),
    ).cast("int")
    return (
        df.select(bin_col.alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").alias("n"))
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# Regression family
# ---------------------------------------------------------------------------


def regress_stream(df: DataFrame, x: str, y: str) -> DataFrame:
    """RegressionEvaluator (simple OLS y ~ x): one distributed agg ->
    (slope, intercept, r2). slope = cov(x,y)/var(x); r2 = corr²."""
    cx, cy = F.col(x), F.col(y)
    agg = df.agg(
        F.covar_samp(cx, cy).alias("_cov"),
        F.var_samp(cx).alias("_varx"),
        F.avg(cx).alias("_mx"),
        F.avg(cy).alias("_my"),
        F.corr(cx, cy).alias("_r"),
    )
    return agg.select(
        (F.col("_cov") / F.col("_varx")).alias("slope"),
        (F.col("_my") - F.col("_cov") / F.col("_varx") * F.col("_mx")).alias(
            "intercept"
        ),
        (F.col("_r") * F.col("_r")).alias("r2"),
    )


def predict_col(x: Column, slope: float, intercept: float) -> Column:
    """PredictEvaluator: apply a fitted model to a column (the fitted
    scalars bind as literals — the stats-bind pattern)."""
    return F.lit(float(slope)) * x + F.lit(float(intercept))


def corr_stream(df: DataFrame, x: str, y: str) -> DataFrame:
    """CorrelationEvaluator + CovarianceEvaluator in one agg."""
    cx, cy = F.col(x), F.col(y)
    return df.agg(
        F.corr(cx, cy).alias("corr"),
        F.covar_samp(cx, cy).alias("cov"),
    )


# ---------------------------------------------------------------------------
# Convolution (time-series smoothing form of ConvolutionEvaluator)
# ---------------------------------------------------------------------------


def conv_stream(
    df: DataFrame,
    order_col: str,
    val_col: str,
    kernel: list[float],
    part_cols: list[str] | None = None,
) -> DataFrame:
    """ConvolutionEvaluator over an ordered series: out[i] =
    Σ_j kernel[j] · val[i - j + center] with zero padding at the edges
    (the 'same-length' smoothing Solr math expressions use conv for).
    One window per series — no shuffle beyond the partition sort."""
    n = len(kernel)
    center = n // 2
    w = Window.orderBy(order_col)
    if part_cols:
        w = Window.partitionBy(*part_cols).orderBy(order_col)
    out = None
    for j, k in enumerate(kernel):
        off = j - center
        term = F.lit(float(k)) * F.coalesce(
            F.lag(F.col(val_col), off).over(w)
            if off >= 0
            else F.lead(F.col(val_col), -off).over(w),
            F.lit(0.0),
        )
        out = term if out is None else out + term
    return df.withColumn("conv", out)


def moving_avg_stream(
    df: DataFrame,
    order_col: str,
    val_col: str,
    n: int,
    part_cols: list[str] | None = None,
) -> DataFrame:
    """MovingAverageEvaluator: trailing window mean of size `n` over an
    ordered series. Solr emits only FULL windows (output length
    len-n+1) — mirrored here by null-ing the first n-1 rows' `moving_avg`
    instead of emitting a partial-window mean. One window spec, no
    shuffle beyond the series sort."""
    w = Window.orderBy(order_col)
    if part_cols:
        w = Window.partitionBy(*part_cols).orderBy(order_col)
    avg = F.avg(F.col(val_col)).over(w.rowsBetween(-(n - 1), 0))
    pos = F.row_number().over(w)
    return df.withColumn(
        "moving_avg", F.when(pos >= n, avg)
    )


def diff_stream(
    df: DataFrame,
    order_col: str,
    val_col: str,
    lag: int = 1,
    part_cols: list[str] | None = None,
) -> DataFrame:
    """DiffEvaluator (lag differencing): out[i] = x[i] - x[i-lag]; the
    first `lag` rows have no predecessor and emit null (Solr's diff
    returns the shortened series — same information)."""
    w = Window.orderBy(order_col)
    if part_cols:
        w = Window.partitionBy(*part_cols).orderBy(order_col)
    return df.withColumn(
        "diff", F.col(val_col) - F.lag(F.col(val_col), lag).over(w)
    )


# ---------------------------------------------------------------------------
# Regularized incomplete beta (driver-side, on agg scalars only) and the
# tests built on it. Continued fraction per Numerical Recipes §6.4 /
# DiDonato & Morris — the standard public formulation.
# ---------------------------------------------------------------------------


def _betacf(a: float, b: float, x: float) -> float:
    MAXIT, EPS, FPMIN = 200, 3e-16, 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c, d = 1.0, 1.0 - qab * x / qap
    if abs(d) < FPMIN:
        d = FPMIN
    d = 1.0 / d
    h = d
    for m in range(1, MAXIT + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        de = d * c
        h *= de
        if abs(de - 1.0) < EPS:
            break
    return h


def betainc(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_bt = (
        math.lgamma(a + b)
        - math.lgamma(a)
        - math.lgamma(b)
        + a * math.log(x)
        + b * math.log1p(-x)
    )
    bt = math.exp(ln_bt)
    if x < (a + 1.0) / (a + b + 2.0):
        return bt * _betacf(a, b, x) / a
    return 1.0 - bt * _betacf(b, a, 1.0 - x) / b


def _t_sf_two_sided(t: float, dof: float) -> float:
    """Two-sided p for Student's t."""
    return betainc(dof / 2.0, 0.5, dof / (dof + t * t))


def _f_sf(f: float, d1: float, d2: float) -> float:
    """Upper tail of the F distribution."""
    if f <= 0:
        return 1.0
    return betainc(d2 / 2.0, d1 / 2.0, d2 / (d2 + d1 * f))


def ttest_ind(
    df: DataFrame,
    group_col: str,
    val_col: str,
    a,
    b,
    equal_var: bool = False,
) -> dict:
    """TTestEvaluator (two-sample): Welch by default (commons-math
    TTest#tTest), pooled-variance with equal_var=True. The distributed
    part is ONE agg returning 6 scalars; t/df/p are O(1) driver math."""
    g = F.col(group_col)
    v = F.col(val_col)
    row = df.filter(g.isin([a, b])).agg(
        F.count(F.when(g == a, 1)).alias("na"),
        F.avg(F.when(g == a, v)).alias("ma"),
        F.var_samp(F.when(g == a, v)).alias("va"),
        F.count(F.when(g == b, 1)).alias("nb"),
        F.avg(F.when(g == b, v)).alias("mb"),
        F.var_samp(F.when(g == b, v)).alias("vb"),
    ).collect()[0]
    na, ma, va = row["na"], row["ma"], row["va"]
    nb, mb, vb = row["nb"], row["mb"], row["vb"]
    if equal_var:
        sp2 = ((na - 1) * va + (nb - 1) * vb) / (na + nb - 2)
        se = math.sqrt(sp2 * (1.0 / na + 1.0 / nb))
        dof = float(na + nb - 2)
    else:
        se = math.sqrt(va / na + vb / nb)
        dof = (va / na + vb / nb) ** 2 / (
            (va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1)
        )
    t = (ma - mb) / se
    return {"t": t, "df": dof, "p": _t_sf_two_sided(t, dof)}


def anova_oneway(df: DataFrame, group_col: str, val_col: str) -> dict:
    """AnovaEvaluator (one-way): F statistic + p. One groupBy agg (per-group
    n/mean/var — map-side partial), tiny collect, O(groups) driver math."""
    per = df.groupBy(group_col).agg(
        F.count(val_col).alias("n"),
        F.avg(val_col).alias("m"),
        F.var_samp(val_col).alias("v"),
    ).collect()
    ntot = sum(r["n"] for r in per)
    grand = sum(r["n"] * r["m"] for r in per) / ntot
    k = len(per)
    ssb = sum(r["n"] * (r["m"] - grand) ** 2 for r in per)
    ssw = sum((r["n"] - 1) * (r["v"] or 0.0) for r in per)
    d1, d2 = float(k - 1), float(ntot - k)
    f = (ssb / d1) / (ssw / d2)
    return {"F": f, "df1": d1, "df2": d2, "p": _f_sf(f, d1, d2)}


# ---------------------------------------------------------------------------
# Normal distribution (Column-level, codegen-friendly)
# ---------------------------------------------------------------------------

# Abramowitz & Stegun 7.1.26 erf approximation (|err| < 1.5e-7) as pure
# Column arithmetic — mirrorable verbatim in SQL for the oracle.
_ERF_A = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)
_ERF_P = 0.3275911


def erf_col(x: Column) -> Column:
    ax = F.abs(x)
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(_ERF_P) * ax)
    poly = (
        F.lit(_ERF_A[0]) * t
        + F.lit(_ERF_A[1]) * t * t
        + F.lit(_ERF_A[2]) * t * t * t
        + F.lit(_ERF_A[3]) * t * t * t * t
        + F.lit(_ERF_A[4]) * t * t * t * t * t
    )
    y = F.lit(1.0) - poly * F.exp(-ax * ax)
    return F.when(x < 0, -y).otherwise(y)


def norm_cdf_col(x: Column, mu: float = 0.0, sigma: float = 1.0) -> Column:
    """NormalDistribution#cumulativeProbability as a Column."""
    z = (x - F.lit(float(mu))) / F.lit(float(sigma) * math.sqrt(2.0))
    return F.lit(0.5) * (F.lit(1.0) + erf_col(z))


def norm_pdf_col(x: Column, mu: float = 0.0, sigma: float = 1.0) -> Column:
    z = (x - F.lit(float(mu))) / F.lit(float(sigma))
    return F.exp(F.lit(-0.5) * z * z) / F.lit(
        float(sigma) * math.sqrt(2.0 * math.pi)
    )


# ---------------------------------------------------------------------------
# round-4 long tail: matrix evaluators, stored-model predict, more
# distributions (solr/solrj .../io/eval/{TransposeEvaluator,
# UnitEvaluator, PredictEvaluator, ExponentialDistributionEvaluator,
# PoissonDistributionEvaluator}.java)
# ---------------------------------------------------------------------------

def transpose_matrix(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """matrix()/transpose(): rows of array<double> -> the transposed
    matrix as (i, row) where row[j] = input row j's component i. Fully
    distributed: posexplode to (id, i, x), hash-shuffle on the dimension
    index i (dims spread over the cluster; no driver materialization),
    order each output row by the stable input id. At 10^12 rows a full
    transpose is only meaningful dimension-wise — which is exactly this
    shape (one output row per DIMENSION, the statistics-evaluator use)."""
    e = df.select(id_col, F.posexplode(vec_col).alias("i", "x"))
    return e.groupBy("i").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col(id_col), F.col("x")))),
            lambda s: s["x"],
        ).alias("row")
    )


def unitize_col(v: Column) -> Column:
    """unitize(): v / ||v||_2 as a Column over array<double>."""
    n = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    return F.transform(v, lambda x: x / n)


def expon_cdf_col(x: Column, rate: float) -> Column:
    """exponentialDistribution(rate).cumulativeProbability(x)."""
    return F.lit(1.0) - F.exp(-F.lit(float(rate)) * x)


def poisson_pmf_col(k: Column, lam: float) -> Column:
    """poissonDistribution(lam).probability(k) for integer k <= 20
    (factorial stays exact in a long; the evaluator's supported range)."""
    return (
        F.exp(F.lit(-float(lam)))
        * F.pow(F.lit(float(lam)), k.cast("double"))
        / F.factorial(k).cast("double")
    )


# ---------------------------------------------------------------------------
# round-4 second tranche: scaling/standardization, element-wise vector
# algebra, rank statistics, contingency tests, more distributions
# (solr/solrj .../io/eval/{ZScoresEvaluator, MinMaxScaleEvaluator,
# EBEAddEvaluator, EBEMultiplyEvaluator, BinomialDistributionEvaluator,
# UniformRealDistributionEvaluator, GeometricDistributionEvaluator,
# SpearmansCorrelationEvaluator, MannWhitneyUTestEvaluator,
# ChiSquareDataSetEvaluator, CorrelationEvaluator(matrix)}.java).
# Every evaluator is a Column expression / single declarative agg —
# whole-stage codegen, no UDFs, map-side partial aggregation — so each
# scales to 10^12 rows exactly like the built-in it lowers to.
# ---------------------------------------------------------------------------

def zscores_stream(df: DataFrame, col: str) -> DataFrame:
    """zscores(): standardize a numeric stream — (x - mean) / stddev_samp.
    Two-pass shape (one scalar agg, then a codegen map), same as the
    evaluator's semantics on a collected stream but never collected."""
    m = df.agg(
        F.avg(col).alias("mu"), F.stddev_samp(col).alias("sd")
    )
    return df.crossJoin(F.broadcast(m)).withColumn(
        "zscore", (F.col(col) - F.col("mu")) / F.col("sd")
    ).drop("mu", "sd")


def minmax_scale_col(x: Column, lo: Column, hi: Column,
                     out_lo: float = 0.0, out_hi: float = 1.0) -> Column:
    """minMaxScale(): affine map of x from [lo, hi] to [out_lo, out_hi]."""
    return F.lit(float(out_lo)) + (x - lo) * F.lit(float(out_hi - out_lo)) / (
        hi - lo
    )


def ebe_add_col(a: Column, b: Column) -> Column:
    """ebeAdd(): element-wise vector sum (zip_with keeps it codegen)."""
    return F.zip_with(a, b, lambda x, y: x + y)


def ebe_multiply_col(a: Column, b: Column) -> Column:
    """ebeMultiply(): element-wise (Hadamard) product."""
    return F.zip_with(a, b, lambda x, y: x * y)


def dot_product_col(a: Column, b: Column) -> Column:
    """dotProduct() over two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def binomial_pmf_col(k: Column, n: int, p: float) -> Column:
    """binomialDistribution(n, p).probability(k), exact C(n, k) for
    n <= 20 (factorial stays a long, the evaluator's practical range)."""
    c = (
        F.factorial(F.lit(int(n)))
        / (F.factorial(k) * F.factorial(F.lit(int(n)) - k))
    ).cast("double")
    return (
        c
        * F.pow(F.lit(float(p)), k.cast("double"))
        * F.pow(F.lit(1.0 - float(p)), (F.lit(int(n)) - k).cast("double"))
    )


def uniform_cdf_col(x: Column, lo: float, hi: float) -> Column:
    """uniformDistribution(lo, hi).cumulativeProbability(x), clamped."""
    t = (x - F.lit(float(lo))) / F.lit(float(hi - lo))
    return F.least(F.lit(1.0), F.greatest(F.lit(0.0), t))


def geometric_pmf_col(k: Column, p: float) -> Column:
    """geometricDistribution(p).probability(k): failures before the first
    success, P(K = k) = (1-p)^k * p (commons-math convention)."""
    return F.pow(F.lit(1.0 - float(p)), k.cast("double")) * F.lit(float(p))


def spearman_corr_stream(df: DataFrame, x: str, y: str) -> DataFrame:
    """spearmansCorr(): Pearson correlation of the two rank vectors.
    Average ranks for ties (the commons-math NaturalRanking default).
    Window ranks are a single shuffle each; the corr agg is map-side
    partial — no collect."""
    from pyspark.sql import Window

    rx = F.avg(F.row_number().over(Window.orderBy(F.col(x), F.col(y)))).over(
        Window.partitionBy(F.col(x))
    )
    ry = F.avg(F.row_number().over(Window.orderBy(F.col(y), F.col(x)))).over(
        Window.partitionBy(F.col(y))
    )
    ranked = df.select(rx.alias("_rx"), ry.alias("_ry"))
    return ranked.agg(F.corr("_rx", "_ry").alias("spearman"))


def mann_whitney_u_stream(
    df: DataFrame, group_col: str, val_col: str, g1, g2
) -> DataFrame:
    """mannWhitney(): U statistic for two samples with average-rank ties.
    U1 = R1 - n1(n1+1)/2 where R1 = rank-sum of sample 1 over the pooled
    ranking; U = min(U1, U2). One global window rank + one agg."""
    from pyspark.sql import Window

    two = df.filter(F.col(group_col).isin([g1, g2])).select(
        group_col, F.col(val_col).cast("double").alias("_v")
    )
    pooled_rank = F.avg(
        F.row_number().over(Window.orderBy(F.col("_v")))
    ).over(Window.partitionBy(F.col("_v")))
    ranked = two.withColumn("_r", pooled_rank)
    agg = ranked.groupBy(group_col).agg(
        F.sum("_r").alias("rsum"), F.count("*").alias("n")
    )
    u = agg.select(
        F.sum(
            F.when(
                F.col(group_col) == g1,
                F.col("rsum") - F.col("n") * (F.col("n") + 1) / 2,
            )
        ).alias("u1"),
        F.sum(
            F.when(
                F.col(group_col) == g2,
                F.col("rsum") - F.col("n") * (F.col("n") + 1) / 2,
            )
        ).alias("u2"),
    )
    return u.select(F.least("u1", "u2").alias("u"))


def chisquare_dataset_stream(
    df: DataFrame, obs_col: str, exp_col: str
) -> DataFrame:
    """chiSquareDataSet(): Pearson chi-square statistic of an observed
    count stream against an expected stream (commons-math
    ChiSquareTest#chiSquareDataSetsComparison with equal totals reduces
    to sum((o-e)^2/e); callers pre-scale unequal totals)."""
    return df.agg(
        F.sum(
            (F.col(obs_col) - F.col(exp_col))
            * (F.col(obs_col) - F.col(exp_col))
            / F.col(exp_col)
        ).alias("chisq")
    )


def corr_matrix_stream(df: DataFrame, cols: list) -> DataFrame:
    """corr(matrix(...)): pairwise Pearson matrix over named columns as
    (i, j, corr) rows — one agg computes all pairs map-side; the output
    is |cols|^2 rows regardless of input size."""
    aggs = []
    for i, a in enumerate(cols):
        for j, b in enumerate(cols):
            aggs.append(F.corr(a, b).alias(f"_c_{i}_{j}"))
    wide = df.agg(*aggs)
    pairs = F.array(*[
        F.struct(
            F.lit(i).alias("i"), F.lit(j).alias("j"),
            F.col(f"_c_{i}_{j}").alias("corr"),
        )
        for i in range(len(cols))
        for j in range(len(cols))
    ])
    return wide.select(F.explode(pairs).alias("p")).select(
        "p.i", "p.j", "p.corr"
    )


def euclidean_dist_col(a: Column, b: Column) -> Column:
    """distance(a, b) EUCLIDEAN (solr/.../io/eval/DistanceEvaluator.java):
    L2 distance of two numeric arrays — zip_with + aggregate, JVM-side."""
    sq = F.zip_with(a, b, lambda x, y: (x - y) * (x - y))
    return F.sqrt(
        F.aggregate(sq, F.lit(0.0), lambda acc, v: acc + v)
    )


def manhattan_dist_col(a: Column, b: Column) -> Column:
    """distance(a, b, manhattan()): L1 distance of two numeric arrays."""
    ab = F.zip_with(a, b, lambda x, y: F.abs(x - y))
    return F.aggregate(ab, F.lit(0.0), lambda acc, v: acc + v)


def cosine_sim_col(a: Column, b: Column) -> Column:
    """cosineSimilarity(a, b) (CosineSimilarityEvaluator): dot / (|a||b|)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(
        F.zip_with(a, a, lambda x, y: x * y), F.lit(0.0),
        lambda acc, v: acc + v,
    ))
    nb = F.sqrt(F.aggregate(
        F.zip_with(b, b, lambda x, y: x * y), F.lit(0.0),
        lambda acc, v: acc + v,
    ))
    return dot / (na * nb)


def ks_test_stream(
    df: DataFrame, group_col: str, val_col: str, g1, g2
) -> DataFrame:
    """ks(sample1, sample2) (KolmogorovSmirnovEvaluator, two-sample form):
    D = sup_v |F1(v) - F2(v)| over the pooled observed values, where Fi is
    the empirical CDF of sample i. Shape: one groupBy(value) collapsing
    ties, one ordered window for the two running sums, one max agg — no
    cross join, no collect; the window's single global sort is over
    DISTINCT values (bounded by value cardinality, not row count).
    Returns (d, n1, n2); the asymptotic p-value is a driver-side scalar
    the caller derives (documented: commons-math uses the exact/asymptotic
    Kolmogorov distribution; the statistic itself is the contract here).
    """
    from pyspark.sql import Window

    two = df.filter(F.col(group_col).isin([g1, g2])).select(
        group_col, F.col(val_col).cast("double").alias("_v")
    )
    per_val = two.groupBy("_v").agg(
        F.sum(F.when(F.col(group_col) == g1, 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col(group_col) == g2, 1).otherwise(0)).alias("c2"),
    )
    w = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, 0)
    cum = per_val.select(
        F.sum("c1").over(w).alias("f1"),
        F.sum("c2").over(w).alias("f2"),
    )
    totals = cum.agg(
        F.max("f1").alias("n1"), F.max("f2").alias("n2")
    ).first()
    n1, n2 = int(totals["n1"]), int(totals["n2"])
    return cum.agg(
        F.round(
            F.max(F.abs(F.col("f1") / n1 - F.col("f2") / n2)), 6
        ).alias("d"),
        F.lit(n1).alias("n1"),
        F.lit(n2).alias("n2"),
    )


# ---------------------------------------------------------------------------
# Round-4 tranche: the remaining high-traffic evaluators from
# solr/solrj/src/java/org/apache/solr/client/solrj/io/eval/ —
# moments (skewness/kurtosis, DescribeEvaluator's DescriptiveStatistics
# tail), ModeEvaluator, CovarianceEvaluator, MovingMedianEvaluator,
# ExponentialMovingAverageEvaluator, PolyFitEvaluator, OutliersEvaluator.
# Determinism discipline: wherever the input column is integral, raw
# moments accumulate as EXACT bigint sums (order-independent across any
# partitioning — the property that makes the hash-match reproducible on
# a 1000-executor cluster); doubles appear only in the final scalar
# arithmetic, which is a fixed expression tree on both engines.
# ---------------------------------------------------------------------------
def central_moments_stream(df: DataFrame, col: str) -> DataFrame:
    """Population skewness g1 = m3/m2^1.5 and excess kurtosis
    g2 = m4/m2^2 - 3 from exact integer raw moments (central moments by
    the binomial expansion). One map-side-combinable agg, no second pass.
    """
    x = F.col(col).cast("bigint")
    g = df.agg(
        F.count(x).alias("n"),
        F.sum(x).alias("s1"),
        F.sum(x * x).alias("s2"),
        F.sum(x * x * x).alias("s3"),
        F.sum(x * x * x * x).alias("s4"),
    )
    n = F.col("n").cast("double")
    mu = F.col("s1") / n
    m2 = F.col("s2") / n - mu * mu
    m3 = F.col("s3") / n - 3 * mu * (F.col("s2") / n) + 2 * mu * mu * mu
    m4 = (
        F.col("s4") / n
        - 4 * mu * (F.col("s3") / n)
        + 6 * mu * mu * (F.col("s2") / n)
        - 3 * mu * mu * mu * mu
    )
    return g.select(
        F.col("n").cast("bigint").alias("n"),
        F.round(mu, 6).alias("mean"),
        F.round(m3 / F.pow(m2, 1.5), 6).alias("skewness"),
        F.round(m4 / (m2 * m2) - 3.0, 6).alias("kurtosis"),
    )


def means_stream(df: DataFrame, col: str) -> DataFrame:
    """geometricMean / harmonicMean (commons-math definitions): requires
    col > 0. Float sums over ~n rows; consumers round (ULP-order noise is
    far below the 6-dp contract)."""
    x = F.col(col).cast("double")
    return df.filter(x > 0).agg(
        F.round(F.exp(F.avg(F.log(x))), 6).alias("geometric_mean"),
        F.round(F.count(x) / F.sum(1.0 / x), 6).alias("harmonic_mean"),
    )


def mode_stream(df: DataFrame, col: str) -> DataFrame:
    """ModeEvaluator: most frequent value; smallest value wins ties
    (deterministic contract — commons-math returns ALL tied modes; the
    single-row form documents the tiebreak)."""
    counts = df.groupBy(col).agg(F.count("*").alias("freq"))
    return counts.orderBy(F.desc("freq"), F.asc(col)).limit(1)


def covariance_exact_stream(df: DataFrame, x: str, y: str) -> DataFrame:
    """CovarianceEvaluator (population): E[xy] - E[x]E[y] from exact
    bigint sums when both columns are integral."""
    cx, cy = F.col(x).cast("bigint"), F.col(y).cast("bigint")
    g = df.agg(
        F.count("*").alias("n"),
        F.sum(cx).alias("sx"),
        F.sum(cy).alias("sy"),
        F.sum(cx * cy).alias("sxy"),
    )
    n = F.col("n").cast("double")
    return g.select(
        F.round(
            F.col("sxy") / n - (F.col("sx") / n) * (F.col("sy") / n), 6
        ).alias("cov_pop")
    )


def moving_median_stream(
    df: DataFrame, order_col: str, val_col: str, window: int
) -> DataFrame:
    """MovingMedianEvaluator: exact median over a trailing row window of
    size `window` (emitted only once the window is full, as the reference
    does — the first window-1 points are dropped)."""
    from pyspark.sql import Window as W

    w = W.orderBy(order_col).rowsBetween(-(window - 1), 0)
    idx = W.orderBy(order_col)
    return (
        df.select(
            F.col(order_col),
            # exact interpolated median; `median` itself rejects window
            # frames in Spark, `percentile` does not
            F.expr(f"percentile({val_col}, 0.5)")
            .over(w)
            .alias("moving_median"),
            F.row_number().over(idx).alias("_rn"),
        )
        .filter(F.col("_rn") >= window)
        .drop("_rn")
    )


def exp_moving_avg_stream(
    df: DataFrame, order_col: str, val_col: str, alpha: float
) -> DataFrame:
    """ExponentialMovingAverageEvaluator: e_1 = x_1,
    e_i = a*x_i + (1-a)*e_{i-1}, unrolled to the closed form
    e_i = (1-a)^(i-1) x_1 + a * sum_{j=2..i} (1-a)^(i-j) x_j so the whole
    series is ONE window sum (no sequential recursion, no Python loop).
    """
    from pyspark.sql import Window as W

    b = 1.0 - alpha
    idx = W.orderBy(order_col)
    w = W.orderBy(order_col).rowsBetween(W.unboundedPreceding, 0)
    t = df.select(
        F.col(order_col),
        F.col(val_col).cast("double").alias("_x"),
        F.row_number().over(idx).alias("_i"),
    )
    # sum over j<=i of w_j with w_j = x_j * (a / b^j), then scale by b^i;
    # the j=1 term swaps a -> 1 to honour e_1 = x_1 exactly.
    term = F.when(F.col("_i") == 1, F.col("_x") / F.lit(b)).otherwise(
        F.col("_x") * F.lit(alpha) / F.pow(F.lit(b), F.col("_i"))
    )
    t = t.withColumn("_term", term)
    return t.select(
        F.col(order_col),
        F.round(
            F.sum("_term").over(w) * F.pow(F.lit(b), F.col("_i")), 6
        ).alias("ema"),
    )


def polyfit2_stream(df: DataFrame, order_col: str, val_col: str) -> DataFrame:
    """PolyFitEvaluator, degree 2: least-squares y = c0 + c1 x + c2 x^2
    with x = 1..n (the reference fits against the sequence index). The
    3x3 normal equations are solved in closed form (Cramer) from exact
    bigint power sums — a single agg, deterministic under any
    partitioning."""
    from pyspark.sql import Window as W

    idx = W.orderBy(order_col)
    t = df.select(
        F.row_number().over(idx).cast("bigint").alias("_x"),
        F.col(val_col).cast("bigint").alias("_y"),
    )
    x, y = F.col("_x"), F.col("_y")
    g = t.agg(
        F.count("*").alias("s0"),
        F.sum(x).alias("s1"),
        F.sum(x * x).alias("s2"),
        F.sum(x * x * x).alias("s3"),
        F.sum(x * x * x * x).alias("s4"),
        F.sum(y).alias("t0"),
        F.sum(x * y).alias("t1"),
        F.sum(x * x * y).alias("t2"),
    )
    s0, s1, s2 = (F.col(c).cast("double") for c in ("s0", "s1", "s2"))
    s3, s4 = F.col("s3").cast("double"), F.col("s4").cast("double")
    t0, t1, t2 = (F.col(c).cast("double") for c in ("t0", "t1", "t2"))
    det = (
        s0 * (s2 * s4 - s3 * s3)
        - s1 * (s1 * s4 - s2 * s3)
        + s2 * (s1 * s3 - s2 * s2)
    )
    c0 = (
        t0 * (s2 * s4 - s3 * s3)
        - s1 * (t1 * s4 - t2 * s3)
        + s2 * (t1 * s3 - t2 * s2)
    ) / det
    c1 = (
        s0 * (t1 * s4 - t2 * s3)
        - t0 * (s1 * s4 - s2 * s3)
        + s2 * (s1 * t2 - s2 * t1)
    ) / det
    c2 = (
        s0 * (s2 * t2 - s3 * t1)
        - s1 * (s1 * t2 - s2 * t1)
        + t0 * (s1 * s3 - s2 * s2)
    ) / det
    return g.select(
        F.round(c0, 6).alias("c0"),
        F.round(c1, 6).alias("c1"),
        F.round(c2, 6).alias("c2"),
    )


def iqr_outliers_stream(df: DataFrame, id_col: str, col: str) -> DataFrame:
    """OutliersEvaluator (Tukey fences): rows with x < Q1 - 1.5*IQR or
    x > Q3 + 1.5*IQR, exact interpolated quartiles. The fences are a
    1-row broadcast — no second shuffle of the data."""
    q = df.agg(
        F.expr(f"percentile({col}, 0.25)").alias("q1"),
        F.expr(f"percentile({col}, 0.75)").alias("q3"),
    )
    fences = q.select(
        (F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))).alias("lo"),
        (F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))).alias("hi"),
    )
    j = df.crossJoin(F.broadcast(fences))
    return (
        j.filter((F.col(col) < F.col("lo")) | (F.col(col) > F.col("hi")))
        .select(id_col, col)
        .orderBy(id_col)
    )


def timeseries_gapfill(
    df: DataFrame,
    ts_col: str,
    start: str,
    end: str,
    bucket: str = "hour",
) -> DataFrame:
    """TimeSeriesStream / facet.range zero-bucket semantics
    (solr/solrj/.../io/stream/TimeSeriesStream.java ≈L60; range facets
    emit EVERY bucket in [start, end), zero counts included). The full
    bucket sequence is generated with F.sequence (codegen, no driver
    loop) and the observed aggregation left-joins onto it — at 10^12
    events the agg shuffles |buckets| rows, the spine is constant-size.
    """
    spark = df.sparkSession
    step = {"hour": "interval 1 hour", "day": "interval 1 day"}[bucket]
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.to_timestamp(F.lit(start)),
                F.to_timestamp(F.lit(end)) - F.expr(step),
                F.expr(step),
            )
        ).alias("bucket_ts")
    )
    agg = (
        df.filter(
            (F.col(ts_col) >= F.lit(start)) & (F.col(ts_col) < F.lit(end))
        )
        .groupBy(F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts"))
        .agg(F.count("*").alias("n"))
    )
    return (
        spine.join(agg, "bucket_ts", "left_outer")
        .select(
            F.unix_timestamp("bucket_ts").alias("bucket_epoch"),
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        )
        .orderBy("bucket_epoch")
    )


def lerp_stream(
    points: DataFrame, queries: DataFrame, x: str = "x", y: str = "y",
    qx: str = "qx",
) -> DataFrame:
    """LerpEvaluator (solr/solrj/.../io/eval/LerpEvaluator.java): linear
    interpolation of a (x, y) series at query points. Distributed form:
    bracket each query point with a max-struct / min-struct agg over the
    two range joins (knot x values must be distinct; queries outside
    [min x, max x] are dropped, as commons-math's interpolator would
    reject them)."""
    p = points.select(
        F.col(x).cast("double").alias("_x"), F.col(y).cast("double").alias("_y")
    )
    q = queries.select(F.col(qx).cast("double").alias("_qx")).distinct()
    prev = (
        q.join(p, F.col("_x") <= F.col("_qx"))
        .groupBy("_qx")
        .agg(F.max(F.struct("_x", "_y")).alias("_p"))
    )
    nxt = (
        q.join(p, F.col("_x") >= F.col("_qx"))
        .groupBy("_qx")
        .agg(F.min(F.struct("_x", "_y")).alias("_n"))
    )
    j = prev.join(nxt, "_qx")
    px, py = F.col("_p._x"), F.col("_p._y")
    nx, ny = F.col("_n._x"), F.col("_n._y")
    val = F.when(nx == px, py).otherwise(
        py + (ny - py) * (F.col("_qx") - px) / (nx - px)
    )
    return j.select(
        F.col("_qx").alias(qx), F.round(val, 6).alias("lerp")
    ).orderBy(qx)


def freq_table_stream(df: DataFrame, col: str) -> DataFrame:
    """FrequencyTableEvaluator (solr/solrj/.../io/eval/
    FrequencyTableEvaluator.java ≈L40): per distinct value — count, pct,
    cumFreq, cumPct. Distributed form: one groupBy reduces the input to
    |distinct values| rows; the cumulative window then runs over that
    REDUCED table only (single-partition window over the value axis is
    safe because the cardinality is the table's distinct count, not its
    row count — the commit rule for every windowed matheval here)."""
    v = F.col(col).cast("bigint").alias("value")
    counts = df.select(v).groupBy("value").agg(F.count("*").alias("cnt"))
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy()
    return counts.select(
        "value",
        "cnt",
        F.round(F.col("cnt") / F.sum("cnt").over(tot), 6).alias("pct"),
        F.sum("cnt").over(w).alias("cum_freq"),
        F.round(
            F.sum("cnt").over(w) / F.sum("cnt").over(tot), 6
        ).alias("cum_pct"),
    ).orderBy("value")


def rank_transform_stream(df: DataFrame, id_col: str, col: str) -> DataFrame:
    """RankEvaluator (solr/solrj/.../io/eval/RankEvaluator.java ≈L30):
    commons-math NaturalRanking with TiesStrategy.AVERAGE — each value is
    replaced by its fractional rank; ties share the average of the ranks
    they occupy. Distributed two-phase form (no global window over the
    raw rows): (1) reduce to per-value counts, (2) cumulative-sum window
    over the reduced value table gives rank_below, (3) broadcast-join the
    per-value avg rank back: avg_rank = rank_below + (count + 1) / 2."""
    x = F.col(col).cast("double").alias("_v")
    counts = df.select(x).groupBy("_v").agg(F.count("*").alias("_c"))
    w = Window.orderBy("_v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow - 1
    )
    ranked = counts.select(
        "_v",
        (
            F.coalesce(F.sum("_c").over(w), F.lit(0))
            + (F.col("_c") + 1) / 2.0
        ).alias("rank"),
    )
    return (
        df.select(F.col(id_col), F.col(col).cast("double").alias("_v"))
        .join(F.broadcast(ranked), "_v")
        .select(id_col, F.round("rank", 2).alias("rank"))
        .orderBy(id_col)
    )


def normalize_sum_stream(df: DataFrame, key: str, col: str) -> DataFrame:
    """NormalizeSumEvaluator (solr/solrj/.../io/eval/
    NormalizeSumEvaluator.java ≈L30): scale a vector so it sums to 1
    (probability normalization). Applied to a keyed aggregate vector; the
    total comes from a whole-table window over the already-reduced keyed
    rows."""
    tot = Window.partitionBy()
    return df.select(
        key,
        F.round(
            F.col(col).cast("double") / F.sum(F.col(col).cast("double")).over(tot),
            6,
        ).alias("p"),
    ).orderBy(key)


def empirical_cdf_stream(
    df: DataFrame, col: str, probes: list[float]
) -> DataFrame:
    """EmpiricalDistributionEvaluator + cumulativeProbability
    (solr/solrj/.../io/eval/EmpiricalDistributionEvaluator.java ≈L40,
    CumulativeProbabilityEvaluator.java): P(X <= probe) as the sample
    fraction. Distributed form: ONE pass — each probe is a conditional
    mean inside a single agg (map-side combinable, no shuffle of data
    columns), then the scalar row unpivots to (probe, cdf)."""
    x = F.col(col).cast("double")
    aggs = [
        F.avg((x <= float(p)).cast("double")).alias(f"_p{i}")
        for i, p in enumerate(probes)
    ]
    row = df.agg(*aggs)
    pairs = []
    for i, p in enumerate(probes):
        pairs.extend([F.lit(float(p)), F.round(F.col(f"_p{i}"), 6)])
    return (
        row.select(
            F.explode(
                F.create_map(*pairs)
            ).alias("probe", "cdf")
        )
        .orderBy("probe")
    )


def ols2_stream(
    df: DataFrame, y: str, x1: str, x2: str
) -> DataFrame:
    """OLSRegressionEvaluator (solr/solrj/.../io/eval/
    OLSRegressionEvaluator.java ≈L40; commons-math
    OLSMultipleLinearRegression) for the two-predictor case, solved in
    closed form from ONE distributed aggregation pass (9 sums — all
    map-side combinable; the 2x2 normal-equation solve happens on the
    scalar row, codegen'd, no driver round-trip):

        b1 = (S22*S1y - S12*S2y) / (S11*S22 - S12^2)
        b2 = (S11*S2y - S12*S1y) / (S11*S22 - S12^2)
        b0 = mean(y) - b1*mean(x1) - b2*mean(x2)
        r2 = (b1*S1y + b2*S2y) / Syy

    where Sij are centered cross-product sums. Returns one row
    (b0, b1, b2, r2) rounded to 6 dp."""
    cy = F.col(y).cast("double")
    c1 = F.col(x1).cast("double")
    c2 = F.col(x2).cast("double")
    g = df.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(c1).alias("s1"),
        F.sum(c2).alias("s2"),
        F.sum(cy).alias("sy"),
        F.sum(c1 * c1).alias("s11r"),
        F.sum(c2 * c2).alias("s22r"),
        F.sum(c1 * c2).alias("s12r"),
        F.sum(c1 * cy).alias("s1yr"),
        F.sum(c2 * cy).alias("s2yr"),
        F.sum(cy * cy).alias("syyr"),
    )
    n = F.col("n")
    s11 = F.col("s11r") - F.col("s1") * F.col("s1") / n
    s22 = F.col("s22r") - F.col("s2") * F.col("s2") / n
    s12 = F.col("s12r") - F.col("s1") * F.col("s2") / n
    s1y = F.col("s1yr") - F.col("s1") * F.col("sy") / n
    s2y = F.col("s2yr") - F.col("s2") * F.col("sy") / n
    syy = F.col("syyr") - F.col("sy") * F.col("sy") / n
    det = s11 * s22 - s12 * s12
    b1 = (s22 * s1y - s12 * s2y) / det
    b2 = (s11 * s2y - s12 * s1y) / det
    b0 = (F.col("sy") - b1 * F.col("s1") - b2 * F.col("s2")) / n
    r2 = (b1 * s1y + b2 * s2y) / syy
    return g.select(
        F.round(b0, 6).alias("b0"),
        F.round(b1, 6).alias("b1"),
        F.round(b2, 6).alias("b2"),
        F.round(r2, 6).alias("r2"),
    )


# ---------------------------------------------------------------------------
# Round-4 tranche: distribution evaluators with closed-form CDFs
# (solr/solrj/.../io/eval/WeibullDistributionEvaluator.java ≈L30,
# LogNormalDistributionEvaluator.java ≈L30, ZipFDistributionEvaluator.java
# ≈L30, CumulativeProbabilityEvaluator.java ≈L40 — commons-math
# distribution semantics). All pure Column arithmetic (codegen), each
# mirrorable verbatim in oracle SQL.
# ---------------------------------------------------------------------------


def weibull_cdf_col(x: Column, shape: float, scale: float) -> Column:
    """WeibullDistribution(shape k, scale λ).cumulativeProbability:
    1 - exp(-(x/λ)^k) for x >= 0, else 0."""
    k = float(shape)
    lam = float(scale)
    pos = F.lit(1.0) - F.exp(-F.pow(x / F.lit(lam), F.lit(k)))
    return F.when(x < 0, F.lit(0.0)).otherwise(pos)


def lognormal_cdf_col(x: Column, mu: float, sigma: float) -> Column:
    """LogNormalDistribution(μ of log, σ of log).cumulativeProbability:
    Φ((ln x - μ)/σ) via the same A&S 7.1.26 erf as norm_cdf_col —
    identical arithmetic is restated in the oracle SQL."""
    z = (F.log(x) - F.lit(float(mu))) / F.lit(float(sigma) * math.sqrt(2.0))
    pos = F.lit(0.5) * (F.lit(1.0) + erf_col(z))
    return F.when(x <= 0, F.lit(0.0)).otherwise(pos)


def zipf_pmf_df(spark, n: int, exponent: float, k_max: int) -> DataFrame:
    """ZipFDistribution(N, s).probability(k) for k = 1..k_max:
    k^-s / H(N, s), the generalized harmonic normalizer computed with ONE
    `aggregate` over a broadcast-free sequence literal (no data read at
    all — the evaluator is a pure generator, like Solr's)."""
    s = float(exponent)
    h = F.aggregate(
        F.sequence(F.lit(1), F.lit(int(n))),
        F.lit(0.0),
        lambda acc, i: acc + F.lit(1.0) / F.pow(i.cast("double"), F.lit(s)),
    )
    ks = spark.range(1, int(k_max) + 1).select(F.col("id").alias("k"))
    return ks.select(
        "k",
        F.round(
            (F.lit(1.0) / F.pow(F.col("k").cast("double"), F.lit(s)))
            / h,
            9,
        ).alias("pmf"),
    ).orderBy("k")


# ---------------------------------------------------------------------------
# markovChain() (solr/solrj/.../io/eval/MarkovChainEvaluator.java ≈L30):
# transition matrix estimated FROM DATA (per-user ordered event streams),
# then the t-step distribution by relational matrix power — a self-join
# per squaring step, which is how a 10^6-state chain would have to be
# powered on a cluster anyway (the dense matrix doesn't fit one box).
# ---------------------------------------------------------------------------


def event_transition_matrix(events: DataFrame) -> DataFrame:
    """(src, dst, p): row-stochastic transition matrix over event_type,
    estimated from each user's ts-ordered event sequence. One window
    (partitionBy user) + one groupBy — both on the same user-hash
    exchange at scale."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.withColumn("nxt", F.lead("event_type").over(w))
        .filter(F.col("nxt").isNotNull())
        .groupBy(
            F.col("event_type").alias("src"), F.col("nxt").alias("dst")
        )
        .agg(F.count("*").alias("n"))
    )
    tot = pairs.groupBy("src").agg(F.sum("n").alias("tot"))
    return pairs.join(tot, "src").select(
        "src", "dst", (F.col("n") / F.col("tot")).alias("p")
    )


def markov_two_step(events: DataFrame) -> DataFrame:
    """P² — two-step transition probabilities: p2(a, c) = Σ_b p(a,b)·p(b,c),
    i.e. ONE equi-join on the middle state + one agg. States are few
    (event types), so the join side is broadcast; at 10^6+ states the
    same plan shuffles on the middle-state key."""
    p = event_transition_matrix(events)
    q = p.select(
        F.col("src").alias("mid"), F.col("dst").alias("dst2"),
        F.col("p").alias("p2"),
    )
    return (
        p.join(F.broadcast(q), F.col("dst") == F.col("mid"))
        .groupBy(F.col("src"), F.col("dst2").alias("dst"))
        .agg(F.round(F.sum(F.col("p") * F.col("p2")), 9).alias("p_two_step"))
        .orderBy("src", "dst")
    )


# ---------------------------------------------------------------------------
# derivative() / integrate() (DerivativeEvaluator.java ≈L30,
# IntegrateEvaluator.java ≈L30) over a (t, y) series: central finite
# differences and the cumulative trapezoid — one lag/lead window each,
# partitioned by nothing only when the series is ALREADY a small
# aggregate (daily buckets); the window key matches the upstream
# groupBy exchange.
# ---------------------------------------------------------------------------


def derivative_stream(df: DataFrame, t_col: str, y_col: str) -> DataFrame:
    """Central difference dy/dt: (y[i+1] - y[i-1]) / (t[i+1] - t[i-1]);
    one-sided at the series ends."""
    from pyspark.sql import Window

    w = Window.orderBy(t_col)
    yp = F.lag(y_col).over(w)
    yn = F.lead(y_col).over(w)
    tp = F.lag(t_col).over(w)
    tn = F.lead(t_col).over(w)
    dy = (
        F.when(tp.isNull(), (yn - F.col(y_col)) / (tn - F.col(t_col)))
        .when(tn.isNull(), (F.col(y_col) - yp) / (F.col(t_col) - tp))
        .otherwise((yn - yp) / (tn - tp))
    )
    return df.select(
        F.col(t_col), F.round(dy, 9).alias("dydt")
    ).orderBy(t_col)


def integrate_stream(df: DataFrame, t_col: str, y_col: str) -> DataFrame:
    """Cumulative trapezoid ∫y dt: running sum of
    (y[i] + y[i-1])/2 · (t[i] - t[i-1])."""
    from pyspark.sql import Window

    w = Window.orderBy(t_col)
    step = (
        (F.col(y_col) + F.lag(y_col).over(w))
        / F.lit(2.0)
        * (F.col(t_col) - F.lag(t_col).over(w))
    )
    cum = F.sum(F.coalesce(step, F.lit(0.0))).over(
        Window.orderBy(t_col).rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.select(
        F.col(t_col), F.round(cum, 9).alias("integral")
    ).orderBy(t_col)


def oscillate_df(spark, amplitude: float, angular_freq: float,
                 phase: float, n: int) -> DataFrame:
    """oscillate(A, ω, φ) (OscillateEvaluator.java ≈L30): A·sin(ωt + φ)
    sampled at t = 0..n-1 — a pure generator, no input data."""
    return (
        spark.range(0, int(n))
        .select(F.col("id").alias("t"))
        .select(
            "t",
            F.round(
                F.lit(float(amplitude))
                * F.sin(
                    F.lit(float(angular_freq)) * F.col("t").cast("double")
                    + F.lit(float(phase))
                ),
                9,
            ).alias("y"),
        )
        .orderBy("t")
    )


# ---------------------------------------------------------------------------
# Regularized lower incomplete gamma P(a, x) — series for x < a+1,
# continued fraction otherwise (Numerical-Recipes-style gser/gcf
# construction from the published formulas; same device as the betainc
# above). Drives GammaDistribution.cumulativeProbability.
# ---------------------------------------------------------------------------


def _gammainc_p(a: float, x: float) -> float:
    if x <= 0.0:
        return 0.0
    lg = math.lgamma(a)
    if x < a + 1.0:
        # series: P = gser
        ap = a
        summ = 1.0 / a
        delt = summ
        for _ in range(500):
            ap += 1.0
            delt *= x / ap
            summ += delt
            if abs(delt) < abs(summ) * 1e-14:
                break
        return summ * math.exp(-x + a * math.log(x) - lg)
    # continued fraction: Q = gcf, P = 1 - Q (modified Lentz)
    tiny = 1e-300
    b = x + 1.0 - a
    c = 1.0 / tiny
    d = 1.0 / b
    h = d
    for i in range(1, 500):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        if abs(d) < tiny:
            d = tiny
        c = b + an / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delt = d * c
        h *= delt
        if abs(delt - 1.0) < 1e-14:
            break
    q = math.exp(-x + a * math.log(x) - lg) * h
    return 1.0 - q


def gamma_cdf_stream(
    df: DataFrame, x_col: str, shape: float, scale: float
) -> DataFrame:
    """GammaDistribution(shape, scale).cumulativeProbability over a
    column: P(shape, x/scale) via an Arrow-batched pandas UDF (the
    incomplete-gamma recurrence is iterative — not Column-expressible).
    Keeps the input order columns."""
    import pandas as pd

    a = float(shape)
    sc = float(scale)

    def _cdf_fn(s):
        return s.map(lambda v: _gammainc_p(a, float(v) / sc))

    # bind real annotation objects (module has stringified annotations and
    # no top-level pandas import, so hint-style pandas_udf can't resolve)
    _cdf_fn.__annotations__ = {"s": pd.Series, "return": pd.Series}
    _cdf = F.pandas_udf(_cdf_fn, "double")

    return df.withColumn("cdf", F.round(_cdf(F.col(x_col)), 9))


# ---------------------------------------------------------------------------
# monteCarlo() (MonteCarloEvaluator.java ≈L40): re-evaluate an expression
# n times with freshly sampled variables; here E[X·Y], X ~ N(μ,σ),
# Y ~ U(a,b). Distributed + deterministic: the n draws split across
# `parts` tasks, each task seeds its own numpy Generator with
# (seed, partition_id) — same answer at any parallelism — and emits ONE
# partial (sum, count); the final mean is a 1-row agg.
# ---------------------------------------------------------------------------


def monte_carlo_mean(
    spark,
    n: int = 100_000,
    seed: int = 42,
    mu: float = 10.0,
    sigma: float = 3.0,
    lo: float = 0.0,
    hi: float = 2.0,
    parts: int = 16,
) -> DataFrame:
    import numpy as np
    import pandas as pd

    per = int(n) // int(parts)

    def _partials(it):
        for pdf in it:
            for pid in pdf["pid"]:
                g = np.random.default_rng((int(seed), int(pid)))
                x = g.normal(mu, sigma, per)
                y = g.uniform(lo, hi, per)
                v = x * y
                yield pd.DataFrame(
                    {"s": [float(v.sum())], "n": [float(per)]}
                )

    pids = spark.range(0, int(parts)).select(F.col("id").alias("pid"))
    partials = pids.repartition(int(parts), "pid").mapInPandas(
        _partials, "s double, n double"
    )
    return partials.agg(
        F.round(F.sum("s") / F.sum("n"), 6).alias("mc_mean"),
        F.sum("n").cast("long").alias("n_samples"),
    )


# ---------------------------------------------------------------------------
# fft() (FFTEvaluator.java ≈L30): DFT magnitude spectrum of a small
# aggregated series (daily counts). The series at this point is one
# row per bucket — tiny — so the transform itself runs in ONE
# mapInPandas task over the collected-to-one-partition series; the
# heavy part (the aggregation that produced the series) stays
# distributed.
# ---------------------------------------------------------------------------


def fft_magnitudes(df: DataFrame, t_col: str, y_col: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    def _fft(it):
        batches = list(it)
        if not batches:
            yield pd.DataFrame({"freq_bin": pd.Series([], dtype="int64"),
                                "magnitude": pd.Series([], dtype="float64")})
            return
        rows = pd.concat(batches, ignore_index=True)
        rows = rows.sort_values(t_col, ignore_index=True)
        mags = np.abs(np.fft.rfft(rows[y_col].to_numpy(dtype=float)))
        yield pd.DataFrame(
            {"freq_bin": np.arange(len(mags)), "magnitude": mags}
        )

    out = df.select(t_col, y_col).coalesce(1).mapInPandas(
        _fft, "freq_bin long, magnitude double"
    )
    return out.select(
        "freq_bin", F.round("magnitude", 6).alias("magnitude")
    ).orderBy("freq_bin")
