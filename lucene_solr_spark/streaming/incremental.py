"""Streaming semantics restated on Structured Streaming (SURVEY.md §3.12).

The reference has no watermarks/event-time — its "streaming" is (a) NRT
ingest visibility via soft commits and (b) incremental pull. Mapping:

  NRT ingest / commitWithin    -> `stream_build`: a Structured Streaming
      query over an arriving `pages` source; every micro-batch builds one
      new SEGMENT and atomically commits the manifest (foreachBatch +
      epoch-keyed segment names = exactly-once on retry, the tlog/replay
      durability contract of DirectUpdateHandler2#commit ≈L600 /
      UpdateLog.java ≈L100). Readers reopen via read_segmented and see an
      immutable snapshot (MVCC via segments — DirectoryReader#openIfChanged).
  topic(checkpoint, q)         -> `TopicCursor`: at-least-once incremental
      consumption by persisted checkpoint; our `_version_` is the segment
      generation (TopicStream.java ≈L60).
  daemon(expr, runInterval)    -> just `trigger(processingTime=...)` on the
      same query (DaemonStream.java).
  timeseries()/tumbling window -> `windowed_event_counts`: watermarked
      event-time window agg — Spark-native bonus beyond parity
      (TimeSeriesStream.java ≈L60).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..indexer import DEFAULT_BUCKETS, build_index
from ..segments import read_manifest, write_manifest

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)

# streaming units live above any bulk-build unit range
STREAM_UNIT_BASE = 1 << 20


def stream_build(
    spark: SparkSession,
    source_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    profile: str = "en",
    num_buckets: int = DEFAULT_BUCKETS,
    trigger_once: bool = True,
    processing_time: str | None = None,
):
    """Continuously index pages parquet files arriving under `source_dir`.

    Each micro-batch becomes segment ``seg_s{epoch:09d}`` with doc ids in
    the epoch's own range — idempotent per epoch: if foreachBatch retries
    after a crash, the segment dir is overwritten and the manifest entry
    re-written identically (exactly-once effect on top of the streaming
    checkpoint's at-least-once delivery).

    Returns the StreamingQuery (caller awaits/stops it).
    """
    os.makedirs(index_dir, exist_ok=True)

    def commit_batch(batch_df: DataFrame, epoch_id: int) -> None:
        n = batch_df.count()
        if n == 0:
            return
        seg = f"seg_s{epoch_id:09d}"
        seg_dir = os.path.join(index_dir, seg)
        t0 = time.perf_counter()
        stats = build_index(
            spark,
            batch_df,
            seg_dir,
            profile=profile,
            num_buckets=num_buckets,
            doc_base=(STREAM_UNIT_BASE + epoch_id) * (1 << 33),
        )
        man = read_manifest(index_dir) or {
            "profile": profile,
            "n_units": 0,
            "num_buckets": num_buckets,
            "segments": {},
            "generation": 0,
        }
        man["segments"][f"s{epoch_id}"] = {
            "seg": seg,
            "status": "done",
            "units": [STREAM_UNIT_BASE + epoch_id],
            "n_docs": stats["doc_count"],
            "sum_ttf": stats["sum_total_term_freq"],
            "wall_s": round(time.perf_counter() - t0, 3),
            "attempt": 1,
            "fingerprint": f"epoch:{epoch_id}",
        }
        write_manifest(index_dir, man)  # soft commit: new searcher visible

    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", "8")
        .parquet(source_dir)
    )
    writer = (
        stream.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    elif processing_time:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


class TopicCursor:
    """topic()-style incremental consumption: each poll() returns only the
    docs of segments committed since the last acknowledged checkpoint.

    Checkpoint = set of consumed segment names, persisted as JSON next to
    the subscriber (TopicStream persists its checkpoints in a collection;
    ours is a file — same at-least-once contract: poll() then ack())."""

    def __init__(self, index_dir: str, checkpoint_path: str):
        self.index_dir = index_dir
        self.checkpoint_path = checkpoint_path
        self._pending: list[str] | None = None

    def _seen(self) -> set[str]:
        if not os.path.exists(self.checkpoint_path):
            return set()
        with open(self.checkpoint_path) as f:
            return set(json.load(f)["seen"])

    def poll(self, spark: SparkSession) -> DataFrame:
        """New docs (docmeta rows) since the last ack'd checkpoint."""
        from ..segments import _union_read, live_segments

        man = read_manifest(self.index_dir)
        seen = self._seen()
        new = [
            r["seg"]
            for r in live_segments(man or {"segments": {}})
            if r["seg"] not in seen
        ]
        self._pending = sorted(seen | set(new))
        if not new:
            return spark.createDataFrame(
                [],
                "doc_id long, url string, lang string, field_len int, "
                "norm_byte int, dlq int",
            )
        return _union_read(
            spark,
            [os.path.join(self.index_dir, s, "docmeta") for s in new],
        )

    def ack(self) -> None:
        """Commit the cursor (at-least-once: crash before ack -> redeliver)."""
        if self._pending is None:
            return
        tmp = self.checkpoint_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"seen": self._pending}, f)
        os.replace(tmp, self.checkpoint_path)
        self._pending = None


def windowed_event_counts(
    events_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window counts per event_type — the event-time
    upgrade of Solr's timeseries() (which buckets stored data only).

    Works on a streaming OR batch events DataFrame (same plan both ways —
    Spark's unified semantics)."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def click_attribution(
    impressions,
    clicks,
    max_delay: str = "30 minutes",
    watermark: str | None = None,
):
    """Stream-stream interval join — last-touch click attribution, the
    canonical Structured Streaming join (Spark docs: stream-stream joins
    with event-time range conditions). Each click pairs with the
    impressions of the SAME user whose ts lies in
    [click_ts - max_delay, click_ts]; the caller picks last-touch with
    `last_touch()` below (batch) or consumes the raw pairs (streaming,
    where the post-join agg would need its own output-mode contract).

    With `watermark` set, BOTH sides get event-time watermarks and Spark
    bounds the join state to watermark + max_delay — the property that
    makes this run forever on an unbounded click log. The SAME function
    body serves batch DataFrames (unified semantics), which is what the
    SQL oracle checks; batch == streaming is asserted in
    tests/test_streaming.py.

    Inputs: impressions(user_id, imp_id, imp_ts), clicks(user_id,
    click_id, click_ts).
    """
    if watermark is not None:
        impressions = impressions.withWatermark("imp_ts", watermark)
        clicks = clicks.withWatermark("click_ts", watermark)
    cond = (
        (impressions["user_id"] == clicks["user_id"])
        & (impressions["imp_ts"] <= clicks["click_ts"])
        & (
            impressions["imp_ts"]
            >= clicks["click_ts"] - F.expr(f"INTERVAL {max_delay}")
        )
    )
    return clicks.join(impressions, cond, "inner").select(
        clicks["user_id"],
        "click_id",
        "click_ts",
        "imp_id",
        "imp_ts",
    )


def last_touch(pairs):
    """Pick the attribution winner per click: the LATEST impression in
    the window, imp_id as the deterministic tiebreak (one max-struct agg,
    no window function — map-side combinable)."""
    return (
        pairs.groupBy("click_id")
        .agg(F.max(F.struct("imp_ts", "imp_id")).alias("_w"))
        .select(
            "click_id",
            F.col("_w.imp_id").alias("imp_id"),
            F.col("_w.imp_ts").alias("imp_ts"),
        )
    )
