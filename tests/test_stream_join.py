"""Stream-stream interval join (click attribution): the watermarked
streaming run must converge to exactly the batch result — Spark's
unified-semantics guarantee the SQL oracle relies on."""

from __future__ import annotations

import time
from datetime import datetime

import pytest


def _rows():
    # user 1: views at :00 and :10, click at :25 -> last touch = :10 view
    # user 1: click at :50 -> no view within 30m (the :10 view is 40m old)
    # user 2: view at :05, click at :06 -> attributed
    # user 3: click with no views at all -> unmatched
    d = lambda m: datetime(2026, 1, 1, 10, m)
    views = [
        (1, 100, d(0)),
        (1, 101, d(10)),
        (2, 200, d(5)),
    ]
    clicks = [
        (1, 900, d(25)),
        (1, 901, d(50)),
        (2, 902, d(6)),
        (3, 903, d(30)),
    ]
    return views, clicks


@pytest.fixture()
def dirs(spark, tmp_path):
    views, clicks = _rows()
    vd, cd = str(tmp_path / "views"), str(tmp_path / "clicks")
    spark.createDataFrame(
        views, "user_id long, imp_id long, imp_ts timestamp"
    ).write.parquet(vd)
    spark.createDataFrame(
        clicks, "user_id long, click_id long, click_ts timestamp"
    ).write.parquet(cd)
    return vd, cd


def test_batch_last_touch_semantics(spark, dirs):
    from lucene_solr_spark.streaming.incremental import (
        click_attribution,
        last_touch,
    )

    vd, cd = dirs
    pairs = click_attribution(
        spark.read.parquet(vd), spark.read.parquet(cd), "30 minutes"
    )
    won = {
        r["click_id"]: r["imp_id"] for r in last_touch(pairs).collect()
    }
    assert won == {900: 101, 902: 200}  # 901 and 903 unattributed


def test_stream_join_equals_batch(spark, dirs, tmp_path):
    from lucene_solr_spark.streaming.incremental import click_attribution

    vd, cd = dirs
    batch_pairs = {
        (r["click_id"], r["imp_id"])
        for r in click_attribution(
            spark.read.parquet(vd), spark.read.parquet(cd), "30 minutes"
        ).collect()
    }
    vs = spark.readStream.schema(
        "user_id long, imp_id long, imp_ts timestamp"
    ).parquet(vd)
    cs = spark.readStream.schema(
        "user_id long, click_id long, click_ts timestamp"
    ).parquet(cd)
    out = click_attribution(vs, cs, "30 minutes", watermark="1 minute")
    q = (
        out.writeStream.format("memory")
        .queryName("attr_test")
        .outputMode("append")
        .trigger(processingTime="500 milliseconds")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        deadline = time.time() + 180
        got: set = set()
        while time.time() < deadline:
            got = {
                (r["click_id"], r["imp_id"])
                for r in spark.sql("SELECT * FROM attr_test").collect()
            }
            if got == batch_pairs:
                break
            time.sleep(2)
    finally:
        q.stop()
    assert got == batch_pairs and batch_pairs
