"""Sessionization: batch twin semantics + stateful streaming closure
across restarts (applyInPandasWithState, event-time timeouts)."""

from __future__ import annotations

import tempfile
from pathlib import Path

from pyspark.sql import functions as F

from sgpt_spark.operators.sessions import sessionize, sessionize_stream

GAP = 100  # seconds
EVENT_SCHEMA = "event_id long, ts timestamp, user_id long, value double"


def _events_df(spark, rows):
    # rows: (event_id, epoch_s, user_id, value)
    return spark.createDataFrame(
        [(e, u, v, t) for e, t, u, v in rows], "event_id long, user_id long, value double, t long"
    ).select("event_id", F.timestamp_seconds("t").alias("ts"), "user_id", "value")


def test_batch_sessionize(spark):
    rows = [
        (1, 1000, 1, 1.0),
        (2, 1050, 1, 2.0),
        (3, 1300, 1, 4.0),   # gap 250 > 100 -> new session
        (4, 1100, 2, 8.0),
    ]
    got = {
        (r["user_id"], r["session_seq"]): (r["start_ts"], r["end_ts"], r["n_events"], r["sum_value"])
        for r in sessionize(_events_df(spark, rows), gap_seconds=GAP).collect()
    }
    assert got == {
        (1, 1): (1000, 1050, 2, 3.0),
        (1, 2): (1300, 1300, 1, 4.0),
        (2, 1): (1100, 1100, 1, 8.0),
    }


def test_streaming_sessions_close_across_restarts(spark):
    base = Path(tempfile.mkdtemp(prefix="sgpt_sessions_"))
    src, out, ckpt = base / "src", base / "out", base / "ckpt"
    src.mkdir()

    def run_once():
        stream = spark.readStream.schema(EVENT_SCHEMA).parquet(str(src))
        q = (
            sessionize_stream(stream, gap_seconds=GAP, watermark="10 seconds")
            .writeStream.format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    batches = [
        [(1, 1000, 1, 1.0), (2, 1050, 1, 2.0), (3, 1300, 1, 4.0), (4, 1100, 2, 8.0)],
        [(5, 2000, 3, 16.0)],
        [(6, 3000, 4, 32.0)],
    ]
    all_rows = []
    for i, rows in enumerate(batches):
        all_rows.extend(rows)
        _events_df(spark, rows).coalesce(1).write.mode("append").parquet(str(src))
        run_once()

    emitted = {
        (r["user_id"], r["start_ts"], r["end_ts"], r["n_events"], r["sum_value"])
        for r in spark.read.parquet(str(out)).collect()
    }
    # final watermark = 3000 - 10; every session with end+gap <= 2990 is
    # closed, the rest (user 4) still open in state
    batch_sessions = {
        (r["user_id"], r["start_ts"], r["end_ts"], r["n_events"], r["sum_value"])
        for r in sessionize(_events_df(spark, all_rows), gap_seconds=GAP).collect()
    }
    want = {s for s in batch_sessions if s[2] + GAP <= 2990}
    assert emitted == want
    assert (4, 3000, 3000, 1, 32.0) not in emitted  # still open
    assert len(want) == 4
