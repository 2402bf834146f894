"""Structured Streaming extension surface (SURVEY.md §2.11): the same
aggregations verified in batch by the oracle, executed as REAL streams
(file source, availableNow trigger, memory sink) — checked against their
batch results for exact equality."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from heavydb_spark.catalog import load_table
from heavydb_spark.streaming import events as stream_ops
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def event_stream_dir(spark, tmp_path_factory):
    """Events re-written as a 4-file parquet directory so the file
    source delivers multiple micro-batches."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    ev = load_table(spark, SF_DIR, "events")
    ev.repartition(4).write.mode("overwrite").parquet(d)
    return d


def _run_stream(spark, df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_streaming_tumbling_equals_batch(spark, event_stream_dir):
    ev_stream = stream_ops.read_event_stream(spark, event_stream_dir)
    assert ev_stream.isStreaming
    agg = stream_ops.tumbling_counts(
        stream_ops.with_watermark(ev_stream, "1 hour")
    )
    got = {
        (r["window_start"], r["event_type"]): (r["n"], round(r["total"], 4))
        for r in _run_stream(spark, agg, "t_tumbling").collect()
    }
    batch = stream_ops.tumbling_counts(load_table(spark, SF_DIR, "events"))
    want = {
        (r["window_start"], r["event_type"]): (r["n"], round(r["total"], 4))
        for r in batch.collect()
    }
    assert got == want


def test_streaming_session_window(spark, event_stream_dir):
    ev_stream = stream_ops.read_event_stream(spark, event_stream_dir)
    # files arrive in arbitrary (non-chronological) order — the
    # watermark must cover the fixture's full 30-day span or genuinely
    # late events are (correctly) dropped
    agg = stream_ops.session_counts(
        stream_ops.with_watermark(ev_stream, "1000 hours")
    )
    got = _run_stream(spark, agg, "t_session")
    batch = stream_ops.session_counts(load_table(spark, SF_DIR, "events"))
    assert got.count() == batch.count()
    assert got.agg(F.sum("n")).first()[0] == batch.agg(F.sum("n")).first()[0]


def test_streaming_dedup(spark, event_stream_dir):
    ev_stream = stream_ops.read_event_stream(spark, event_stream_dir)
    dedup = stream_ops.dedup_stream(ev_stream, "1000 hours")
    q = (
        dedup.writeStream.format("memory")
        .queryName("t_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("t_dedup")
    n_events = load_table(spark, SF_DIR, "events").count()
    assert got.count() == n_events  # fixture has unique event_ids
    assert got.select("event_id").distinct().count() == n_events
