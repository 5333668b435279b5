"""Stateful-streaming sessionization (applyInPandasWithState): the stream
must converge to EXACTLY the batch sessionization of the same events —
gap-closed sessions are emitted with the triggering batch, and each
user's still-open final session is flushed by the idle timeout.

NOTE: `q.processAllAvailable()` is deliberately NOT used — with
ProcessingTimeTimeout the micro-batch engine keeps scheduling zero-data
batches to evaluate pending timeouts, so "all available processed" never
quiesces. A real deployment (and this test) reads the sink with a
deadline instead.
"""

from __future__ import annotations

import datetime as dt
import time

import pytest


def _events():
    base = dt.datetime(2024, 3, 1, 10, 0, 0)
    rows = []
    # user 1: two sessions (3 events, 45-min gap, 2 events)
    for m in (0, 5, 10):
        rows.append((1, base + dt.timedelta(minutes=m)))
    for m in (55, 60):
        rows.append((1, base + dt.timedelta(minutes=m)))
    # user 2: three sessions of 1, 2, 1 events
    rows.append((2, base))
    for m in (40, 42):
        rows.append((2, base + dt.timedelta(minutes=m)))
    rows.append((2, base + dt.timedelta(minutes=90)))
    # user 3: one session only (closed only by the idle timeout)
    for m in (0, 1, 2):
        rows.append((3, base + dt.timedelta(minutes=m)))
    return rows


@pytest.fixture()
def events_dir(spark, tmp_path):
    out = str(tmp_path / "events")
    spark.createDataFrame(
        _events(), "user_id long, ts timestamp"
    ).coalesce(1).write.parquet(out)
    return out


def _key(r):
    return (r["user_id"], r["session_start"], r["session_end"], r["n_events"])


def test_stream_sessions_match_batch(spark, events_dir, tmp_path):
    from lucene_solr_spark.streaming.sessions import (
        sessionize_batch,
        sessionize_stream,
    )

    batch = sessionize_batch(spark.read.parquet(events_dir), 30).collect()
    expect_all = {_key(r) for r in batch}
    by_user: dict[int, int] = {}
    for r in batch:
        by_user[r["user_id"]] = by_user.get(r["user_id"], 0) + 1
    assert [by_user[u] for u in (1, 2, 3)] == [2, 3, 1]

    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(
        events_dir
    )
    # short idle timeout: after the single data batch, zero-data timeout
    # batches flush each user's open session, so the sink converges to the
    # full batch result
    out = sessionize_stream(stream, 30, idle_timeout_ms=3_000)
    q = (
        out.writeStream.format("memory")
        .queryName("sess_test")
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
                _key(r) for r in spark.sql("SELECT * FROM sess_test").collect()
            }
            if got == expect_all:
                break
            time.sleep(2)
    finally:
        q.stop()
    assert got == expect_all
