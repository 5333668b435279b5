"""Sessionization: gap-timeout event sessions, batch AND stateful-streaming.

The custom-stateful-operator tier of the brief ("applyInPandasWithState
for custom stateful operators"): Solr has no session operator, but every
large-scale event pipeline needs one, and it is exactly the shape Spark's
arbitrary-state API exists for.

Two implementations with IDENTICAL semantics (a session = maximal run of
a user's events where consecutive gaps are < `gap`):

  * sessionize_batch — window lag + cumulative gap-count: pure Catalyst
    (two window functions over one user-keyed exchange), the ANSI-SQL
    twin the oracle states.
  * sessionize_stream — applyInPandasWithState over a streaming source:
    per-user state carries (last_ts, session_start, n_events); a
    ProcessingTimeTimeout flushes idle sessions. At 10^12 events the
    state store shards by user across executors — no driver state.

Operational note: with ProcessingTimeTimeout the micro-batch engine keeps
scheduling zero-data batches to evaluate pending timeouts, so
`query.processAllAvailable()` never quiesces — consumers must read the
sink with their own deadline (tests/test_streaming_sessions.py does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long"
)


def sessionize_batch(
    events: DataFrame, gap_minutes: int = 30,
    user_col: str = "user_id", ts_col: str = "ts",
) -> DataFrame:
    """(user_id, session_start, session_end, n_events), one row per
    session: new session when the gap to the previous event >= gap."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col)
    gap_s = gap_minutes * 60
    # fractional epoch seconds (timestamp->double), NOT unix_timestamp —
    # that truncates to seconds and would split sessions differently than
    # any fractional-precision engine (the SQL oracle uses epoch())
    def _epoch(c):
        # TIMESTAMP_NTZ can't cast to double directly; go via TIMESTAMP
        # (sessions run in UTC — driver_check/tests pin the session TZ)
        return c.cast("timestamp").cast("double")

    new_sess = (
        F.when(
            _epoch(F.col(ts_col)) - _epoch(F.lag(ts_col).over(w)) >= gap_s,
            1,
        )
        .otherwise(0)
    )
    with_id = events.withColumn(
        "_sid",
        F.sum(F.coalesce(new_sess, F.lit(0))).over(
            Window.partitionBy(user_col)
            .orderBy(ts_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        with_id.groupBy(user_col, "_sid")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .drop("_sid")
        .select(user_col, "session_start", "session_end", "n_events")
    )


def sessionize_stream(
    events_stream: DataFrame, gap_minutes: int = 30,
    idle_timeout_ms: int = 60_000,
) -> DataFrame:
    """Streaming sessionization via applyInPandasWithState: per-user state
    accumulates the open session; a session row is EMITTED when a new
    event breaks the gap, or when the idle timeout fires (flushing the
    open session). Output schema == sessionize_batch."""
    import pandas as pd

    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    gap_s = gap_minutes * 60

    def update(key, pdfs, state: GroupState):
        (user_id,) = key
        rows = []
        if state.hasTimedOut:
            if state.exists:
                start, end, n = state.get
                rows.append((user_id, start, end, n))
                state.remove()
        else:
            events = pd.concat(list(pdfs), ignore_index=True)
            events = events.sort_values("ts")
            if state.exists:
                start, end, n = state.get
            else:
                start = end = None
                n = 0
            for ts in events["ts"]:
                t = ts.timestamp()
                if start is None:
                    start, end, n = t, t, 1
                elif t - end >= gap_s:
                    rows.append((user_id, start, end, n))
                    start, end, n = t, t, 1
                else:
                    end, n = t, n + 1
            if start is not None:
                state.update((start, end, n))
                state.setTimeoutDuration(idle_timeout_ms)
        import datetime as dt

        out = pd.DataFrame(
            rows, columns=["user_id", "session_start", "session_end", "n_events"]
        )
        if len(out):
            out["session_start"] = out["session_start"].map(
                lambda s: dt.datetime.utcfromtimestamp(s)
            )
            out["session_end"] = out["session_end"].map(
                lambda s: dt.datetime.utcfromtimestamp(s)
            )
        yield out

    return (
        events_stream.groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=SESSION_SCHEMA,
            stateStructType="start double, end double, n long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
