"""Sessionization — gap-based event sessions, batch and streaming.

The reference has no streaming (SURVEY.md §2.10); this is an
engine-added operator pair for the ingest-telemetry side of a crawl
pipeline, demonstrating the custom-stateful-streaming shape
(``applyInPandasWithState``) next to an oracle-checkable batch twin:

- ``sessionize``          batch: lag + cumsum windows, ANSI-SQL
  expressible (driver-gated against DuckDB).
- ``sessionize_stream``   streaming: per-user state (open session)
  carried across micro-batches, sessions emitted when the gap closes
  them or the event-time watermark times the state out. State is
  bounded: one open session per active user.

Both define a session identically: events of one user ordered by
(ts, event_id); a new session starts when the gap to the previous event
exceeds ``gap_seconds``. Timestamps are handled as epoch seconds
(longs) at the boundary so batch/stream/DuckDB agree bit-for-bit.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("start_ts", T.LongType(), False),
        T.StructField("end_ts", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("sum_value", T.DoubleType(), True),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_ts", T.LongType(), False),
        T.StructField("last_ts", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("sum_value", T.DoubleType(), True),
    ]
)


def sessionize(
    events: DataFrame,
    gap_seconds: int = 28_800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Batch sessionization: -> (user_id, session_seq, start_ts, end_ts,
    n_events, sum_value), session_seq 1-based per user in time order.

    One window pass (lag -> new-session flag -> running sum) + one
    groupBy — both partitioned by user, so the only shuffle key is
    user_id; no global sort.
    """
    ts_long = F.col(ts_col).cast("timestamp").cast("long")
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
    flagged = (
        events.withColumn("_ts", ts_long)
        .withColumn("_prev", F.lag("_ts").over(w))
        .withColumn(
            "_new",
            F.when(
                F.col("_prev").isNull() | ((F.col("_ts") - F.col("_prev")) > gap_seconds), 1
            ).otherwise(0),
        )
        .withColumn("_seq", F.sum("_new").over(w))
    )
    return (
        flagged.groupBy(F.col(user_col).alias("user_id"), F.col("_seq").alias("session_seq"))
        .agg(
            F.min("_ts").alias("start_ts"),
            F.max("_ts").alias("end_ts"),
            F.count("*").alias("n_events"),
            F.round(F.sum(value_col), 6).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("session_seq").cast("int").alias("session_seq"),
            "start_ts",
            "end_ts",
            "n_events",
            "sum_value",
        )
    )


def _merge_session(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state,
    gap_seconds: int,
    id_col: str = "event_id",
    value_col: str = "value",
) -> Iterator[pd.DataFrame]:
    """applyInPandasWithState body: fold this batch's events for one
    user into the open-session state; emit every session closed either
    by a gap inside the batch or by the event-time timeout."""
    user = int(key[0])
    closed = []

    if state.hasTimedOut:
        if state.exists:
            s0, l0, n0, v0 = state.get
            closed.append((user, s0, l0, n0, round(v0, 6)))
            state.remove()
        if closed:
            yield pd.DataFrame(closed, columns=[f.name for f in SESSION_SCHEMA.fields])
        return

    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values(["_ts", id_col], kind="mergesort")
    if state.exists:
        start, last, n, val = state.get
    else:
        start = last = None
        n, val = 0, 0.0
    for ts, v in zip(rows["_ts"].astype("int64"), rows[value_col].astype("float64")):
        ts = int(ts)
        if last is not None and ts - last > gap_seconds:
            closed.append((user, start, last, n, round(val, 6)))
            start, n, val = ts, 0, 0.0
        if start is None:
            start = ts
        last = ts
        n += 1
        val += float(v)
    state.update((int(start), int(last), int(n), float(val)))
    # close the open session when the watermark passes last_ts + gap
    state.setTimeoutTimestamp((int(last) + gap_seconds) * 1000)
    if closed:
        yield pd.DataFrame(closed, columns=[f.name for f in SESSION_SCHEMA.fields])


def sessionize_stream(
    events_stream: DataFrame,
    gap_seconds: int = 28_800,
    watermark: str = "1 hour",
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
):
    """Streaming sessionization over an event stream -> stream of CLOSED
    sessions (same schema as the batch twin minus session_seq, which is
    meaningless under out-of-order closure).

    State per user = the one open session (4 scalars); event-time
    timeout at last_ts + gap closes sessions for idle users, so state
    size tracks ACTIVE users only — the property that lets this run
    forever at web scale.
    """
    prepared = (
        events_stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .withColumn("_ts", F.col(ts_col).cast("long"))
    )

    def fn(key, pdfs, state):
        yield from _merge_session(key, pdfs, state, gap_seconds, id_col, value_col)

    return prepared.groupBy(F.col(user_col)).applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf="EventTimeTimeout",
    )
