"""Streaming pipelines for the events table.

The reference only has streaming *ingest* (ImportExport/KafkaImporter.cpp,
StreamImporter.cpp — append rows to a table). Here the ingest analogue is
`read_event_stream` (file/kafka/rate source → normalized schema) and the
processing analogue is real Structured Streaming: watermarks, tumbling/
sliding/session windows, streaming dedup.

These functions accept any streaming OR batch DataFrame with the events
schema, so the exact same code path is verified in batch mode
(queries/streaming_batch.py) and in streaming tests
(tests/test_streaming.py, memory sink).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_SCHEMA = (
    "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, "
    "value DOUBLE, props STRING"
)


def read_event_stream(
    spark: SparkSession,
    source_dir: str,
    fmt: str = "parquet",
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-based streaming ingest (the Kafka/stdin importer analogue —
    swap for `format("kafka")` + from_json in production)."""
    return (
        spark.readStream.format(fmt)
        .schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(source_dir)
    )


def with_watermark(events: DataFrame, delay: str = "30 minutes") -> DataFrame:
    """Late-data bound; state for windows older than max(ts)-delay is
    dropped — bounded state at 100 TB/day stream rates."""
    return events.withWatermark("ts", delay)


def tumbling_counts(events: DataFrame, width: str = "10 minutes") -> DataFrame:
    return (
        events.groupBy(F.window("ts", width).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total")
    )


def sliding_counts(
    events: DataFrame, width: str = "10 minutes", slide: str = "5 minutes"
) -> DataFrame:
    return (
        events.groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .select(F.col("w.start").alias("window_start"), "n", "total")
    )


def session_counts(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    return (
        events.groupBy(
            F.session_window("ts", gap).alias("w"), F.col("user_id")
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .select("user_id", F.col("w.start").alias("session_start"), "n", "total")
    )


def dedup_stream(events: DataFrame, delay: str = "1 hour") -> DataFrame:
    """Streaming dedup within the watermark (bounded dedup state)."""
    return events.withWatermark("ts", delay).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_to_memory(df: DataFrame, name: str, spark: SparkSession):
    """Run a streaming DF to completion into an in-memory sink (tests)."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete" if df.isStreaming else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
