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


def _ordered_stream_dir(spark, tmp_path_factory):
    """Events split into 4 time-range files with increasing mtimes so
    the file source delivers micro-batches in event-time order (the
    stateful sessionizer's documented arrival contract)."""
    import glob
    import os
    import shutil

    d = str(tmp_path_factory.mktemp("events_ordered"))
    ev = load_table(spark, SF_DIR, "events").orderBy("ts").collect()
    n = len(ev)
    schema = load_table(spark, SF_DIR, "events").schema
    for i in range(4):
        chunk = ev[i * n // 4 : (i + 1) * n // 4]
        tmp = os.path.join(d, f"_tmp{i}")
        spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dest = os.path.join(d, f"{i:02d}.parquet")
        shutil.move(part, dest)
        shutil.rmtree(tmp)
        os.utime(dest, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))
    return d


def test_stateful_sessionize_matches_batch(spark, tmp_path_factory):
    """applyInPandasWithState sessionizer: closed sessions from the
    stream must equal batch-computed sessions, where a user's final
    session counts as closed iff the event-time timeout could fire for
    it (end + gap < final watermark = max_ts - delay) — availableNow
    runs a trailing timeout batch that flushes those."""
    import datetime

    from pyspark.sql import Window

    ev_stream = stream_ops.read_event_stream(
        spark, _ordered_stream_dir(spark, tmp_path_factory)
    )
    got = _run_stream_append(
        spark, stream_ops.stateful_sessionize(ev_stream, gap_minutes=30),
        "stateful_sessions",
    )
    got_rows = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in got.collect()
    }

    # batch expectation: gap>30min starts a new session; the last
    # session per user is included iff its flush timeout (end + 30min
    # gap) precedes the final watermark (max_ts - 1h delay)
    ev = load_table(spark, SF_DIR, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    sess = (
        ev.withColumn("prev", F.lag("ts").over(w))
        .withColumn(
            "new_sess",
            (
                F.col("prev").isNull()
                | (F.col("ts") > F.col("prev") + F.expr("INTERVAL 30 MINUTES"))
            ).cast("int"),
        )
        .withColumn("sid", F.sum("new_sess").over(w))
        .groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    max_ts = ev.agg(F.max("ts")).first()[0]
    final_wm = max_ts - datetime.timedelta(hours=1)
    last_sid = sess.groupBy("user_id").agg(F.max("sid").alias("max_sid"))
    expected = (
        sess.join(last_sid, "user_id")
        .filter(
            (F.col("sid") < F.col("max_sid"))
            | (
                F.col("session_end") + F.expr("INTERVAL 30 MINUTES")
                < F.lit(final_wm)
            )
        )
        .select("user_id", "session_start", "session_end", "n_events")
    )
    exp_rows = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in expected.collect()
    }
    assert got_rows == exp_rows


def _run_stream_append(spark, df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def _bounded_disorder_dir(spark, tmp_path_factory):
    """Time-quartile files, but ~10% of each quartile's tail events are
    displaced into the NEXT file — genuine cross-batch disorder bounded
    by <2 days (inside the watermark delay), the case buffering exists
    for."""
    import glob
    import os
    import shutil

    d = str(tmp_path_factory.mktemp("events_disorder"))
    ev = sorted(
        load_table(spark, SF_DIR, "events").collect(), key=lambda r: r.ts
    )
    n = len(ev)
    schema = load_table(spark, SF_DIR, "events").schema
    files = [list(ev[i * n // 4 : (i + 1) * n // 4]) for i in range(4)]
    # displace every 3rd of the last 30 events of files 0-2 into the
    # next file — ~1 day of displacement, safely inside the 2-day
    # watermark delay (disorder beyond the delay is dropped by design)
    for i in range(3):
        tail = files[i][-30:]
        moved = tail[::3]
        files[i] = [r for r in files[i] if r not in moved]
        files[i + 1] = moved + files[i + 1]
    for i, chunk in enumerate(files):
        tmp = os.path.join(d, f"_tmp{i}")
        spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dest = os.path.join(d, f"{i:02d}.parquet")
        shutil.move(part, dest)
        shutil.rmtree(tmp)
        os.utime(dest, (1_700_000_000 + i * 10, 1_700_000_000 + i * 10))
    return d


def test_buffered_sessionize_out_of_order(spark, tmp_path_factory):
    """Buffered sessionizer under bounded cross-batch disorder: every
    emitted session must exactly match a batch-computed session, with
    no duplicates, and sessions safely past the watermark must all be
    emitted despite arrival disorder."""
    import datetime

    from pyspark.sql import Window

    ev_stream = stream_ops.read_event_stream(
        spark, _bounded_disorder_dir(spark, tmp_path_factory)
    )
    got = _run_stream_append(
        spark,
        stream_ops.stateful_sessionize_buffered(
            ev_stream, gap_minutes=30, delay="2 days"
        ),
        "buffered_sessions",
    )
    got_rows = [
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in got.collect()
    ]
    assert len(got_rows) == len(set(got_rows)), "duplicate sessions emitted"

    ev = load_table(spark, SF_DIR, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    sess = (
        ev.withColumn("prev", F.lag("ts").over(w))
        .withColumn(
            "new_sess",
            (
                F.col("prev").isNull()
                | (F.col("ts") > F.col("prev") + F.expr("INTERVAL 30 MINUTES"))
            ).cast("int"),
        )
        .withColumn("sid", F.sum("new_sess").over(w))
        .groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    batch_rows = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in sess.collect()
    }
    assert set(got_rows) <= batch_rows, "emitted session not in batch truth"

    # coverage: sessions ending 3+ days before the global max must have
    # closed (watermark delay is 2 days)
    max_ts = ev.agg(F.max("ts")).first()[0]
    cutoff = max_ts - datetime.timedelta(days=3)
    must_have = {b for b in batch_rows if b[2] < cutoff}
    missing = must_have - set(got_rows)
    assert not missing, f"{len(missing)} safely-final sessions not emitted"


def test_parse_kafka_events_batch(spark):
    """Kafka value-payload parsing (KafkaImporter.cpp row parse +
    reject behavior), unit-tested on a batch DataFrame with the Kafka
    wire schema — no broker in the container; read_event_stream
    applies the same transform to format('kafka')."""
    import json

    rows = [
        (None, json.dumps({
            "event_id": 1, "ts": "2024-01-01T10:00:00", "user_id": 7,
            "event_type": "click", "value": 1.5, "props": "{}",
        }).encode()),
        (None, json.dumps({
            "event_id": 2, "ts": "2024-01-01T10:05:00", "user_id": 8,
            "event_type": "view", "value": None, "props": None,
        }).encode()),
        (None, b"{ not json"),       # malformed -> rejected
        (None, None),                # tombstone -> rejected
    ]
    raw = spark.createDataFrame(rows, "key binary, value binary")
    got = stream_ops.parse_kafka_events(raw)
    assert got.columns == [
        "event_id", "ts", "user_id", "event_type", "value", "props"
    ]
    out = {r.event_id: r for r in got.collect()}
    assert set(out) == {1, 2}
    assert out[1].user_id == 7 and abs(out[1].value - 1.5) < 1e-12
    assert out[2].value is None
    assert str(out[1].ts).startswith("2024-01-01 10:00:00")


def test_read_event_stream_kafka_gate(spark):
    """fmt='kafka' without a bootstrap server is a config error."""
    with pytest.raises(ValueError, match="kafka_bootstrap"):
        stream_ops.read_event_stream(spark, fmt="kafka")


def test_ingest_stream_to_table(spark, event_stream_dir, tmp_path):
    """Stream -> managed table ingest (KafkaImporter append job):
    all events land exactly once; a second run with the same
    checkpoint ingests nothing new."""
    spark.sql("DROP TABLE IF EXISTS events_ingest")
    ckpt = str(tmp_path / "ckpt")
    try:
        q = stream_ops.ingest_stream_to_table(
            stream_ops.read_event_stream(spark, event_stream_dir),
            "events_ingest",
            ckpt,
        )
        q.awaitTermination(120)
        n_src = load_table(spark, SF_DIR, "events").count()
        got = spark.table("events_ingest")
        assert got.count() == n_src
        assert got.select("event_id").distinct().count() == n_src
        # idempotent re-run: checkpoint prevents re-ingest
        q2 = stream_ops.ingest_stream_to_table(
            stream_ops.read_event_stream(spark, event_stream_dir),
            "events_ingest",
            ckpt,
        )
        q2.awaitTermination(120)
        assert spark.table("events_ingest").count() == n_src
    finally:
        spark.sql("DROP TABLE IF EXISTS events_ingest")


def test_streaming_interval_join_equals_batch(spark, event_stream_dir):
    """Watermarked stream-stream interval join produces exactly the
    batch join's matches (append mode; state bounded by watermark +
    range condition)."""
    from pyspark.sql import functions as F

    ev_stream = stream_ops.read_event_stream(spark, event_stream_dir)
    clicks_s = ev_stream.filter(F.col("event_type") == "click")
    buys_s = ev_stream.filter(F.col("event_type") == "purchase")
    # the fixture spans ~30 days and the file source may split it into
    # several unordered microbatches — a watermark wider than the span
    # keeps every row on-time so stream==batch exactly
    joined = stream_ops.interval_join_streams(
        clicks_s, buys_s, max_lag="10 minutes", watermark="60 days"
    )
    assert joined.isStreaming
    q = (
        joined.writeStream.format("memory")
        .queryName("t_ivjoin")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.l_ts, r.r_ts)
        for r in spark.table("t_ivjoin").collect()
    }

    ev = load_table(spark, SF_DIR, "events")
    batch = stream_ops.interval_join_streams(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
        max_lag="10 minutes",
    )
    want = {(r.user_id, r.l_ts, r.r_ts) for r in batch.collect()}
    assert got == want and len(want) > 0


@pytest.fixture(scope="module")
def event_stream_ordered_dir(spark, tmp_path_factory):
    """Events split into 4 time-ordered parquet files (oldest file
    written first, so the file source's oldest-first order yields
    chronological micro-batches), plus a final sentinel file far in
    the future whose batch pushes the watermark past every real row —
    required for outer-join null emission before availableNow
    terminates. Sentinel rows use user_id = -999 and are excluded
    from comparisons."""
    import time as _time

    from pyspark.sql import functions as F

    d = str(tmp_path_factory.mktemp("events_stream_ordered"))
    ev = load_table(spark, SF_DIR, "events").orderBy("ts")
    n = ev.count()
    rows_per = (n + 3) // 4
    ranked = ev.withColumn(
        "rk", F.row_number().over(__import__("pyspark").sql.Window.orderBy("ts"))
    )
    for i in range(4):
        part = ranked.filter(
            (F.col("rk") > i * rows_per) & (F.col("rk") <= (i + 1) * rows_per)
        ).drop("rk")
        part.coalesce(1).write.mode("overwrite").parquet(f"{d}/f{i}")
        _time.sleep(1.1)  # distinct mtimes -> deterministic source order
    max_ts = ev.agg(F.max("ts")).first()[0]
    sentinel = spark.createDataFrame(
        [
            (-1, -999, "click", 0.0, max_ts),
            (-2, -999, "purchase", 0.0, max_ts),
        ],
        "event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE, ts TIMESTAMP_NTZ",
    ).select(
        "event_id",
        "user_id",
        F.col("event_type"),
        F.col("value"),
        (F.col("ts") + F.expr("INTERVAL 365 DAYS")).alias("ts"),
    )
    template = load_table(spark, SF_DIR, "events").limit(0)
    aligned = sentinel.select(
        *[
            (
                F.col(c) if c in sentinel.columns else F.lit(None)
            ).cast(template.schema[c].dataType).alias(c)
            for c in template.columns
        ]
    )
    aligned.coalesce(1).write.mode("overwrite").parquet(f"{d}/f4")
    # A SECOND sentinel file even further out: state eviction in batch
    # N uses the watermark computed at the end of batch N-1, so the
    # unmatched rows of the last real batch flush only in a batch that
    # runs AFTER the first sentinel advanced the watermark.
    aligned.withColumn(
        "ts", F.col("ts") + F.expr("INTERVAL 30 DAYS")
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/f5")
    # flatten: move part files into d with ordered names
    import glob
    import shutil

    for i in range(6):
        src = glob.glob(f"{d}/f{i}/part-*.parquet")[0]
        shutil.move(src, f"{d}/{i:02d}.parquet")
        shutil.rmtree(f"{d}/f{i}")
        _time.sleep(1.1)
    return d


def test_streaming_interval_join_outer_equals_batch(
    spark, event_stream_ordered_dir
):
    """LEFT OUTER stream-stream interval join: with chronological
    micro-batches (maxFilesPerTrigger=1) and a watermark-advancing
    sentinel, the stream emits exactly the batch left join — matched
    rows plus null-attributed clicks."""
    from pyspark.sql import functions as F

    ev_stream = stream_ops.read_event_stream(spark, event_stream_ordered_dir)
    clicks_s = ev_stream.filter(F.col("event_type") == "click")
    buys_s = ev_stream.filter(F.col("event_type") == "purchase")
    # NOTE: the sentinel exclusion must NOT be a filter on the joined
    # stream — Catalyst pushes it through the join into the file scan,
    # eliminating the sentinel rows BELOW the watermark operator, so
    # the watermark never advances and outer rows never emit. Filter
    # after collection instead.
    joined = stream_ops.interval_join_streams(
        clicks_s, buys_s, max_lag="10 minutes", watermark="1 minute",
        how="left_outer",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("t_ivjoin_outer")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    got = {
        (r.user_id, r.l_ts, r.r_ts)
        for r in spark.table("t_ivjoin_outer").collect()
        if r.user_id != -999
    }

    ev = load_table(spark, SF_DIR, "events")
    batch = stream_ops.interval_join_streams(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
        max_lag="10 minutes",
        how="left_outer",
    )
    want = {(r.user_id, r.l_ts, r.r_ts) for r in batch.collect()}
    assert got == want
    assert any(r_ts is None for (_, _, r_ts) in want)  # outer rows exist
    assert len(want) > 0


def test_streaming_interval_join_full_outer_equals_batch(
    spark, event_stream_ordered_dir
):
    """FULL OUTER stream-stream interval join: chronological
    micro-batches + watermark sentinel emit exactly the batch full
    join — matched rows, null-attributed clicks, AND orphan
    purchases with null click columns."""
    from pyspark.sql import functions as F

    ev_stream = stream_ops.read_event_stream(spark, event_stream_ordered_dir)
    clicks_s = ev_stream.filter(F.col("event_type") == "click")
    buys_s = ev_stream.filter(F.col("event_type") == "purchase")
    joined = stream_ops.interval_join_streams(
        clicks_s, buys_s, max_lag="10 minutes", watermark="1 minute",
        how="full_outer",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("t_ivjoin_full")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    got = {
        (r.user_id, r.l_ts, r.r_ts)
        for r in spark.table("t_ivjoin_full").collect()
        if r.user_id != -999
    }

    ev = load_table(spark, SF_DIR, "events")
    batch = stream_ops.interval_join_streams(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
        max_lag="10 minutes",
        how="full_outer",
    )
    want = {(r.user_id, r.l_ts, r.r_ts) for r in batch.collect()}
    assert got == want
    assert any(r_ts is None for (_, _, r_ts) in want)   # unmatched clicks
    assert any(l_ts is None for (_, l_ts, _) in want)   # orphan purchases


def test_ingest_stream_continuous_microbatch(spark, tmp_path):
    """ingest_stream_to_table(available_now=False): the continuous
    default micro-batch trigger starts, ingests files appearing over
    time across >= 2 micro-batches, and stops cleanly (the importer
    daemon mode, KafkaImporter.cpp run loop)."""
    import time

    spark.sql("DROP TABLE IF EXISTS events_ingest_cont")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    ev = load_table(spark, SF_DIR, "events").limit(200).localCheckpoint()
    first = ev.limit(100)
    second = ev.subtract(first)
    first.coalesce(1).write.mode("overwrite").parquet(src)
    q = None
    try:
        q = stream_ops.ingest_stream_to_table(
            stream_ops.read_event_stream(spark, src, max_files_per_trigger=1),
            "events_ingest_cont",
            ckpt,
            available_now=False,
        )
        deadline = time.time() + 120
        while time.time() < deadline:
            if (
                spark.catalog.tableExists("events_ingest_cont")
                and spark.table("events_ingest_cont").count() >= first.count()
            ):
                break
            time.sleep(1)
        # second wave lands while the query is live -> a later micro-batch
        second.coalesce(1).write.mode("append").parquet(src)
        total = ev.count()
        while time.time() < deadline:
            if spark.table("events_ingest_cont").count() >= total:
                break
            time.sleep(1)
        assert spark.table("events_ingest_cont").count() == total
        batches = [
            p for p in q.recentProgress if p["numInputRows"] > 0
        ]
        assert len(batches) >= 2, "expected >= 2 non-empty micro-batches"
        assert q.isActive
    finally:
        if q is not None:
            q.stop()
            q.awaitTermination(60)
        spark.sql("DROP TABLE IF EXISTS events_ingest_cont")


def test_streaming_corpus_clean_equals_batch(spark, tmp_path_factory):
    """Streaming corpus cleaning (quality filter -> first-arrival text
    dedup) produces exactly the batch pipeline's distinct kept set —
    the incremental form of the scrub/quality/dedup chain, proven
    stream==batch on the hash set and the per-language distinct
    counts."""
    from pyspark.sql import functions as F

    d = str(tmp_path_factory.mktemp("docs_stream"))
    docs = load_table(spark, SF_DIR, "documents")
    # duplicate some docs into a second shard so the stream sees dups
    docs.write.mode("overwrite").parquet(d)
    docs.limit(40).write.mode("append").parquet(d)

    stream = stream_ops.streaming_corpus_clean(
        stream_ops.read_document_stream(spark, d, max_files_per_trigger=1)
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("t_corpus_clean")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("t_corpus_clean")

    t = F.col("text")
    alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", "")) / F.length(t)
    batch = (
        spark.read.parquet(d)
        .filter((F.length(t) >= 40) & (alpha >= 0.5))
        .select(F.md5(t).alias("text_hash"), "lang")
        .distinct()
    )
    got_hashes = {r["text_hash"] for r in got.select("text_hash").collect()}
    batch_hashes = {r["text_hash"] for r in batch.select("text_hash").distinct().collect()}
    assert got_hashes == batch_hashes and len(got_hashes) > 0
    got_lang = {
        (r["lang"], r["n"])
        for r in got.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    batch_lang = {
        (r["lang"], r["n"])
        for r in batch.groupBy("lang").agg(
            F.count_distinct("text_hash").alias("n")
        ).collect()
    }
    assert got_lang == batch_lang


def test_streaming_model_score_equals_batch(spark, tmp_path_factory):
    """Streaming model-based quality filtering scores each micro-batch
    with the offline-trained (literal-weight) classifier and keeps
    exactly the batch-kept set — stateless scoring, no state store, so
    the per-doc logits are identical to the batch run."""
    from pyspark.sql import functions as F

    from heavydb_spark.operators.text import quality_classifier_score

    d = str(tmp_path_factory.mktemp("docs_score_stream"))
    docs = load_table(spark, SF_DIR, "documents")
    half = docs.count() // 2
    docs.filter(F.col("doc_id") < half).write.mode("overwrite").parquet(d)
    docs.filter(F.col("doc_id") >= half).write.mode("append").parquet(d)

    stream = stream_ops.streaming_model_score(
        stream_ops.read_document_stream(spark, d, max_files_per_trigger=1)
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("t_model_score")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: r["quality_logit"]
        for r in spark.table("t_model_score").collect()
    }
    batch = {
        r["doc_id"]: r["quality_logit"]
        for r in quality_classifier_score(spark.read.parquet(d))
        .filter(F.col("quality_label"))
        .collect()
    }
    assert got == batch and len(got) > 0
