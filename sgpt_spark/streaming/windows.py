"""Event-time windowed aggregation with late-data watermarks.

The reference is strictly batch (SURVEY.md §2.10); this engine adds the
Structured Streaming operators a production crawl/ingest pipeline needs:
windowed per-type stats over an event stream (page fetches, index
appends, quality-filter decisions) that stay correct under out-of-order
arrival.

Design: the SAME aggregation expression serves batch and streaming —
``F.window`` is valid in both — so correctness is tested by equality:
stream(availableNow) over a directory == batch groupBy over the same
files. The watermark bounds state: windows older than the watermark are
finalized and dropped from the state store, which is what makes the
aggregation runnable forever on an unbounded stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_stats(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str | None = "2 hours",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """events(ts timestamp, event_type, value) -> per-(window, type)
    count/avg/sum. Works on both a static DataFrame and a streaming one;
    pass ``watermark=None`` for batch use (watermarks only apply to
    streams)."""
    # watermarks require TIMESTAMP (with tz); parquet often carries NTZ.
    # Cast unconditionally so batch and stream aggregate identically.
    src = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if watermark is not None and src.isStreaming:
        src = src.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.window(F.col(ts_col), window), F.col(type_col))
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg(value_col), 6).alias("avg_value"),
            F.round(F.sum(value_col), 6).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            F.col(type_col).alias("event_type"),
            "n",
            "avg_value",
            "sum_value",
        )
    )


def run_stream_to_memory(
    spark,
    events_dir: str,
    schema,
    table_name: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
):
    """Drive ``windowed_event_stats`` over a directory stream into an
    in-memory sink (complete mode) and block until all available data
    is processed. Returns the query (stopped)."""
    stream = spark.readStream.schema(schema).parquet(events_dir)
    agg = windowed_event_stats(stream, window=window, watermark=watermark)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(table_name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
