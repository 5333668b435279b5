"""Structured-Streaming ingest: NRT segment commits per micro-batch,
topic()-style incremental consumption, watermarked window aggs
(SURVEY.md §3.12)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def stream_dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("stream")
    return {
        "src": str(base / "src"),
        "idx": str(base / "idx"),
        "ckpt": str(base / "ckpt"),
        "topic": str(base / "topic.json"),
    }


def _write_pages_slice(spark, out_dir, start, end):
    from lucene_solr_spark.fixtures import generate_pages

    os.makedirs(out_dir, exist_ok=True)
    tbl = generate_pages(end).slice(start, end - start)
    import pyarrow.parquet as pq

    pq.write_table(tbl, os.path.join(out_dir, f"part_{start}_{end}.parquet"))


def test_stream_build_and_topic(spark, stream_dirs):
    from lucene_solr_spark.search import Searcher
    from lucene_solr_spark.segments import read_manifest, read_segmented
    from lucene_solr_spark.streaming import TopicCursor, stream_build

    # batch 1 arrives
    _write_pages_slice(spark, stream_dirs["src"], 0, 300)
    q = stream_build(
        spark, stream_dirs["src"], stream_dirs["idx"], stream_dirs["ckpt"],
        profile="en", num_buckets=4,
    )
    q.awaitTermination(300)
    man = read_manifest(stream_dirs["idx"])
    n_segs_1 = len(man["segments"])
    assert n_segs_1 >= 1
    idx = read_segmented(spark, stream_dirs["idx"])
    assert idx["stats"]["doc_count"] == 300

    cursor = TopicCursor(stream_dirs["idx"], stream_dirs["topic"])
    first = cursor.poll(spark)
    assert first.count() == 300
    cursor.ack()

    # batch 2 arrives; restart the (availableNow) query — checkpoint makes
    # it process only the new files
    _write_pages_slice(spark, stream_dirs["src"], 300, 500)
    q = stream_build(
        spark, stream_dirs["src"], stream_dirs["idx"], stream_dirs["ckpt"],
        profile="en", num_buckets=4,
    )
    q.awaitTermination(300)
    idx = read_segmented(spark, stream_dirs["idx"])
    assert idx["stats"]["doc_count"] == 500

    # NRT visibility: the new snapshot is searchable
    s = Searcher(idx)
    assert s.search("search", k=5, with_fields=False).count() >= 0

    # topic(): only the delta arrives on the second poll
    second = cursor.poll(spark)
    assert second.count() == 200
    # without ack, redelivery (at-least-once)
    again = TopicCursor(stream_dirs["idx"], stream_dirs["topic"]).poll(spark)
    assert again.count() == 200
    cursor.ack()
    third = cursor.poll(spark)
    assert third.count() == 0


def test_windowed_event_counts_batch_parity(spark):
    """The same windowed-agg plan runs on a batch DF; counts must match a
    plain groupBy on truncated hours."""
    from lucene_solr_spark.streaming import windowed_event_counts

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    got = (
        windowed_event_counts(events, "1 hour", "2 hours")
        .orderBy("window_start", "event_type")
        .collect()
    )
    expect = (
        events.groupBy(
            F.date_trunc("hour", "ts").alias("window_start"), "event_type"
        )
        .agg(F.count("*").alias("n_events"))
        .orderBy("window_start", "event_type")
        .collect()
    )
    assert [(r["window_start"], r["event_type"], r["n_events"]) for r in got] == [
        (r["window_start"], r["event_type"], r["n_events"]) for r in expect
    ]
