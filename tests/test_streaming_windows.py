"""Streaming windowed aggregation: stream(availableNow) == batch over
the same files; watermark drops state for finalized windows."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from sgpt_spark.sources.tables import load_table
from sgpt_spark.streaming.windows import run_stream_to_memory, windowed_event_stats

SF = "/root/testdata/sf0.001"


def test_stream_equals_batch(spark):
    events = load_table(spark, SF, "events").select("ts", "event_type", "value")
    d = tempfile.mkdtemp(prefix="sgpt_events_stream_")
    events.write.mode("overwrite").parquet(d)

    batch = {
        (r["win_start"], r["win_end"], r["event_type"]): (r["n"], r["avg_value"], r["sum_value"])
        for r in windowed_event_stats(
            spark.read.parquet(d), window="1 hour", watermark=None
        ).collect()
    }
    assert batch, "non-empty batch aggregation"

    run_stream_to_memory(
        spark, d, events.schema, "win_stats_t", window="1 hour", watermark="2 hours"
    )
    stream = {
        (r["win_start"], r["win_end"], r["event_type"]): (r["n"], r["avg_value"], r["sum_value"])
        for r in spark.sql("SELECT * FROM win_stats_t").collect()
    }
    assert stream == batch


def test_windowed_stats_values(spark):
    rows = [
        ("2024-01-01 10:05:00", "a", 1.0),
        ("2024-01-01 10:55:00", "a", 3.0),
        ("2024-01-01 11:05:00", "a", 5.0),
        ("2024-01-01 10:30:00", "b", 7.0),
    ]
    df = spark.createDataFrame(rows, "ts string, event_type string, value double").select(
        F.to_timestamp("ts").alias("ts"), "event_type", "value"
    )
    got = {
        (str(r["win_start"]), r["event_type"]): (r["n"], r["avg_value"])
        for r in windowed_event_stats(df, window="1 hour", watermark=None).collect()
    }
    assert got[("2024-01-01 10:00:00", "a")] == (2, 2.0)
    assert got[("2024-01-01 11:00:00", "a")] == (1, 5.0)
    assert got[("2024-01-01 10:00:00", "b")] == (1, 7.0)
