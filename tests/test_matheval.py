"""Math-evaluator family (solr io/eval): distributed aggs + driver-side
special functions, with closed-form and hand-computed golden values."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def test_betainc_closed_forms():
    from lucene_solr_spark.operators.matheval import betainc

    # I_x(a, 1) = x^a ; I_x(1, b) = 1 - (1-x)^b ; symmetry
    for x in (0.05, 0.3, 0.7, 0.95):
        assert betainc(3.0, 1.0, x) == pytest.approx(x**3, rel=1e-12)
        assert betainc(1.0, 2.5, x) == pytest.approx(
            1 - (1 - x) ** 2.5, rel=1e-12
        )
        assert betainc(2.0, 5.0, x) == pytest.approx(
            1 - betainc(5.0, 2.0, 1 - x), rel=1e-10
        )
    assert betainc(2.0, 3.0, 0.0) == 0.0
    assert betainc(2.0, 3.0, 1.0) == 1.0


def test_t_pvalue_limits():
    from lucene_solr_spark.operators.matheval import _t_sf_two_sided

    # df=1 is Cauchy: two-sided p = 1 - (2/pi) atan(t)
    for t in (0.5, 1.0, 2.0, 5.0):
        assert _t_sf_two_sided(t, 1.0) == pytest.approx(
            1 - 2 / math.pi * math.atan(t), rel=1e-9
        )
    # large df approaches the normal: p(1.96, 1e6) ~ 0.05
    assert _t_sf_two_sided(1.959964, 1e6) == pytest.approx(0.05, abs=1e-4)
    assert _t_sf_two_sided(0.0, 10.0) == pytest.approx(1.0)


def test_anova_golden(spark):
    """Hand-computed one-way ANOVA: groups [1,2,3],[2,3,4],[6,7,8] ->
    F = 21, p = I_{6/48}(3, 1) = 0.125^3 (closed form since df1/2 = 1)."""
    from lucene_solr_spark.operators.matheval import anova_oneway

    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0),
            ("b", 2.0), ("b", 3.0), ("b", 4.0),
            ("c", 6.0), ("c", 7.0), ("c", 8.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = anova_oneway(df, "g", "v")
    assert r["F"] == pytest.approx(21.0, rel=1e-12)
    assert (r["df1"], r["df2"]) == (2.0, 6.0)
    assert r["p"] == pytest.approx(0.125**3, rel=1e-9)


def test_ttest_welch_and_pooled(spark):
    from lucene_solr_spark.operators.matheval import ttest_ind

    rows = [("a", v) for v in (1.0, 2.0, 3.0, 4.0)] + [
        ("b", v) for v in (3.0, 4.0, 5.0, 6.0)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    # equal n, equal variance: Welch == pooled; t = -2/sqrt(2*5/3/4)
    se = math.sqrt(2 * (5.0 / 3.0) / 4)
    for ev in (False, True):
        r = ttest_ind(df, "g", "v", "a", "b", equal_var=ev)
        assert r["t"] == pytest.approx(-2.0 / se, rel=1e-12)
        assert r["df"] == pytest.approx(6.0, rel=1e-9)
        assert 0.0 < r["p"] < 1.0
    # p symmetric in sign and decreasing in |t|
    r0 = ttest_ind(df, "g", "v", "b", "a")
    assert r0["t"] == pytest.approx(2.0 / se)
    assert r0["p"] == pytest.approx(
        ttest_ind(df, "g", "v", "a", "b")["p"], rel=1e-12
    )


def test_regress_and_predict(spark):
    from lucene_solr_spark.operators.matheval import (
        predict_col,
        regress_stream,
    )

    # exact line y = 3x + 1 -> slope 3, intercept 1, r2 1
    df = spark.createDataFrame(
        [(float(x), 3.0 * x + 1.0) for x in range(10)], "x double, y double"
    )
    r = regress_stream(df, "x", "y").collect()[0]
    assert r["slope"] == pytest.approx(3.0)
    assert r["intercept"] == pytest.approx(1.0)
    assert r["r2"] == pytest.approx(1.0)
    pred = df.select(
        predict_col(F.col("x"), r["slope"], r["intercept"]).alias("p"),
        "y",
    ).collect()
    for row in pred:
        assert row["p"] == pytest.approx(row["y"])


def test_conv_stream_golden(spark):
    from lucene_solr_spark.operators.matheval import conv_stream

    df = spark.createDataFrame(
        [(0, 1.0), (1, 2.0), (2, 4.0), (3, 8.0)], "i long, v double"
    )
    out = {
        r["i"]: r["conv"]
        for r in conv_stream(df, "i", "v", [0.25, 0.5, 0.25]).collect()
    }
    # zero-padded smoothing: out[0]=.5*1+.25*2 ; out[1]=.25*1+.5*2+.25*4 ...
    assert out == pytest.approx(
        {0: 1.0, 1: 2.25, 2: 4.5, 3: 5.0}
    )


def test_moving_avg_and_diff_golden(spark):
    from lucene_solr_spark.operators.matheval import (
        diff_stream,
        moving_avg_stream,
    )

    df = spark.createDataFrame(
        [(0, 1.0), (1, 2.0), (2, 4.0), (3, 8.0), (4, 16.0)],
        "i long, v double",
    )
    ma = {
        r["i"]: r["moving_avg"]
        for r in moving_avg_stream(df, "i", "v", 3).collect()
    }
    # full windows only: rows 0-1 null, then trailing means of 3
    assert ma[0] is None and ma[1] is None
    assert ma[2] == pytest.approx(7.0 / 3)
    assert ma[3] == pytest.approx(14.0 / 3)
    assert ma[4] == pytest.approx(28.0 / 3)

    d = {r["i"]: r["diff"] for r in diff_stream(df, "i", "v", 2).collect()}
    assert d[0] is None and d[1] is None
    assert d == pytest.approx({0: None, 1: None, 2: 3.0, 3: 6.0, 4: 12.0})


def test_describe_and_hist(spark):
    from lucene_solr_spark.operators.matheval import (
        describe_stream,
        hist_stream,
    )

    df = spark.createDataFrame(
        [(float(v),) for v in range(1, 11)], "v double"
    )
    d = describe_stream(df, "v").collect()[0]
    assert d["n"] == 10 and d["mean"] == 5.5
    assert d["p50"] == pytest.approx(5.5)
    assert d["p25"] == pytest.approx(3.25)
    h = {r["bin"]: r["n"] for r in hist_stream(df, "v", 0.0, 10.0, 5).collect()}
    # bins [0,2),[2,4),[4,6),[6,8),[8,10] with clamp: 10.0 clamps into bin 4
    assert h == {0: 1, 1: 2, 2: 2, 3: 2, 4: 3}


def test_norm_cdf_accuracy(spark):
    """A&S 7.1.26 approximation within 1.5e-7 of math.erf everywhere."""
    from lucene_solr_spark.operators.matheval import norm_cdf_col

    vals = [(-3.0,), (-1.96,), (-0.5,), (0.0,), (0.5,), (1.0,), (1.96,), (3.2,)]
    df = spark.createDataFrame(vals, "x double")
    rows = df.select("x", norm_cdf_col(F.col("x")).alias("c")).collect()
    for r in rows:
        exact = 0.5 * (1 + math.erf(r["x"] / math.sqrt(2)))
        assert r["c"] == pytest.approx(exact, abs=2e-7), r["x"]


def test_spearman_mannwhitney_golden(spark):
    """Hand-computed golden values with TIES (the avg-rank branch)."""
    from lucene_solr_spark.operators.matheval import (
        mann_whitney_u_stream,
        spearman_corr_stream,
    )

    # x = [1,2,2,3], y = [10,20,30,30]: avg ranks
    # rx = [1, 2.5, 2.5, 4], ry = [1, 2, 3.5, 3.5] -> pearson(rx, ry)
    df = spark.createDataFrame(
        [(1.0, 10.0), (2.0, 20.0), (2.0, 30.0), (3.0, 30.0)], ["x", "y"]
    )
    got = spearman_corr_stream(df, "x", "y").first()["spearman"]
    import statistics as st

    rx, ry = [1, 2.5, 2.5, 4], [1, 2, 3.5, 3.5]
    mx, my = st.mean(rx), st.mean(ry)
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    den = (
        sum((a - mx) ** 2 for a in rx) * sum((b - my) ** 2 for b in ry)
    ) ** 0.5
    assert got == pytest.approx(num / den, rel=1e-9)

    # Mann-Whitney: g1=[1,2], g2=[2,3] pooled ranks [1, 2.5, 2.5, 4]
    # R1 = 3.5, U1 = 3.5 - 3 = 0.5 ; R2 = 6.5, U2 = 6.5 - 3 = 3.5 -> U=0.5
    df2 = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 2.0), ("b", 3.0)], ["g", "v"]
    )
    u = mann_whitney_u_stream(df2, "g", "v", "a", "b").first()["u"]
    assert u == pytest.approx(0.5)


def test_distributions_and_ebe_columns(spark):
    from lucene_solr_spark.operators.matheval import (
        binomial_pmf_col,
        dot_product_col,
        ebe_add_col,
        ebe_multiply_col,
        geometric_pmf_col,
        uniform_cdf_col,
    )

    df = spark.createDataFrame([(3, 150.0)], ["k", "x"])
    r = df.select(
        binomial_pmf_col(F.col("k"), 10, 0.4).alias("b"),
        geometric_pmf_col(F.col("k"), 0.25).alias("g"),
        uniform_cdf_col(F.col("x"), 100.0, 300.0).alias("u"),
        uniform_cdf_col(F.col("x"), 200.0, 300.0).alias("u0"),
        uniform_cdf_col(F.col("x"), 0.0, 100.0).alias("u1"),
    ).first()
    assert r["b"] == pytest.approx(120 * 0.4**3 * 0.6**7, rel=1e-12)
    assert r["g"] == pytest.approx(0.75**3 * 0.25, rel=1e-12)
    assert r["u"] == pytest.approx(0.25)
    assert r["u0"] == 0.0  # clamped below
    assert r["u1"] == 1.0  # clamped above

    dv = spark.createDataFrame(
        [([1.0, 2.0, 3.0], [4.0, 5.0, 6.0])], ["a", "b"]
    )
    r2 = dv.select(
        ebe_add_col(F.col("a"), F.col("b")).alias("s"),
        ebe_multiply_col(F.col("a"), F.col("b")).alias("p"),
        dot_product_col(F.col("a"), F.col("b")).alias("d"),
    ).first()
    assert r2["s"] == [5.0, 7.0, 9.0]
    assert r2["p"] == [4.0, 10.0, 18.0]
    assert r2["d"] == pytest.approx(32.0)


def test_zscores_chisq_corrmatrix(spark):
    from lucene_solr_spark.operators.matheval import (
        chisquare_dataset_stream,
        corr_matrix_stream,
        zscores_stream,
    )

    df = spark.createDataFrame([(float(v),) for v in (2, 4, 4, 4, 5, 5, 7, 9)], ["v"])
    z = {r["v"]: r["zscore"] for r in zscores_stream(df, "v").collect()}
    import statistics as st

    vals = [2, 4, 4, 4, 5, 5, 7, 9]
    mu, sd = st.mean(vals), st.stdev(vals)
    assert z[2.0] == pytest.approx((2 - mu) / sd, rel=1e-9)
    assert z[9.0] == pytest.approx((9 - mu) / sd, rel=1e-9)

    oe = spark.createDataFrame(
        [(10.0, 8.0), (20.0, 22.0), (30.0, 30.0)], ["o", "e"]
    )
    chisq = chisquare_dataset_stream(oe, "o", "e").first()["chisq"]
    assert chisq == pytest.approx(4.0 / 8 + 4.0 / 22, rel=1e-12)

    m = spark.createDataFrame(
        [(1.0, 2.0, -1.0), (2.0, 4.0, -2.0), (3.0, 6.5, -3.0)], ["a", "b", "c"]
    )
    cm = {
        (r["i"], r["j"]): r["corr"]
        for r in corr_matrix_stream(m, ["a", "b", "c"]).collect()
    }
    assert len(cm) == 9
    assert cm[(0, 0)] == pytest.approx(1.0)
    assert cm[(0, 2)] == pytest.approx(-1.0)
    assert cm[(0, 1)] == pytest.approx(cm[(1, 0)])
    assert 0.99 < cm[(0, 1)] <= 1.0
