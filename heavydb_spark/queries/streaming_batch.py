"""Streaming-semantics operators, batch-verifiable form (SURVEY.md §2.11).

The reference has no streaming operators (ingest only — KafkaImporter.cpp,
StreamImporter.cpp); these are the declared extension surface. Each query
runs the SAME aggregation shape Structured Streaming would run (window /
session_window / dropDuplicates), executed in batch mode over the events
table so the DuckDB oracle can verify it. The true streaming forms live
in heavydb_spark/streaming/ and are exercised by tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from heavydb_spark.queries.registry import query
from heavydb_spark.queries.util import T, r2


@query(
    "stream_tumbling_window",
    oracle="""
    SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
           event_type,
           count(*) AS n,
           round(sum(value), 2) AS total
    FROM events
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def stream_tumbling_window(spark, sf_dir):
    """B12: tumbling window agg — `window()` is epoch-aligned exactly
    like DuckDB time_bucket. Calls the SHARED streaming builder
    (streaming/events.tumbling_counts), so the oracle check covers the
    exact code the streams run."""
    from heavydb_spark.streaming.events import tumbling_counts

    ev = T(spark, sf_dir, "events")
    return (
        tumbling_counts(ev)
        .select(
            "window_start", "event_type", "n",
            r2(F.col("total")).alias("total"),
        )
        .orderBy("window_start", "event_type")
    )


@query(
    "stream_sliding_window",
    oracle="""
    WITH expanded AS (
        SELECT unnest([time_bucket(INTERVAL '5 minutes', ts),
                       time_bucket(INTERVAL '5 minutes', ts) - INTERVAL 5 MINUTE]) AS window_start,
               value
        FROM events
    )
    SELECT window_start, count(*) AS n, round(sum(value), 2) AS total
    FROM expanded
    GROUP BY window_start ORDER BY window_start
    """,
)
def stream_sliding_window(spark, sf_dir):
    """Sliding window (10 min window, 5 min slide): each event lands in 2
    windows — the oracle expands membership explicitly. Calls the
    SHARED streaming builder (streaming/events.sliding_counts)."""
    from heavydb_spark.streaming.events import sliding_counts

    ev = T(spark, sf_dir, "events")
    return (
        sliding_counts(ev)
        .select("window_start", "n", r2(F.col("total")).alias("total"))
        .orderBy("window_start")
    )


@query(
    "stream_session_window",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sessions AS (
        SELECT user_id, ts, value,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM flagged
    )
    SELECT user_id, min(ts) AS session_start, count(*) AS n,
           round(sum(value), 2) AS total
    FROM sessions GROUP BY user_id, sid
    ORDER BY user_id, session_start
    """,
)
def stream_session_window(spark, sf_dir):
    """session_window(ts, '30 minutes') — gap-based sessions; the oracle
    reproduces the same gap semantics via lag+cumsum. Calls the SHARED
    streaming builder (streaming/events.session_counts)."""
    from heavydb_spark.streaming.events import session_counts

    ev = T(spark, sf_dir, "events")
    return (
        session_counts(ev)
        .select(
            "user_id", "session_start", "n",
            r2(F.col("total")).alias("total"),
        )
        .orderBy("user_id", "session_start")
    )


@query(
    "stream_dedup_events",
    oracle="""
    SELECT event_type, count(*) AS n
    FROM (
        SELECT DISTINCT ON (user_id, event_type,
                            time_bucket(INTERVAL '1 hour', ts))
               user_id, event_type
        FROM events ORDER BY user_id, event_type,
                             time_bucket(INTERVAL '1 hour', ts), ts
    )
    GROUP BY event_type ORDER BY event_type
    """,
)
def stream_dedup_events(spark, sf_dir):
    """dropDuplicates on (user, type, hour-bucket) — the watermarked
    streaming dedup pattern (dropDuplicatesWithinWatermark), batch form."""
    ev = T(spark, sf_dir, "events")
    return (
        ev.withColumn("hour_bucket", F.date_trunc("hour", "ts"))
        .dropDuplicates(["user_id", "event_type", "hour_bucket"])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type")
    )


@query(
    "stream_interval_join",
    oracle="""
    SELECT a.user_id,
           a.ts AS l_ts, a.event_type AS l_type, round(a.value, 2) AS l_value,
           b.ts AS r_ts, b.event_type AS r_type, round(b.value, 2) AS r_value
    FROM events a
    JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL 10 MINUTE
    WHERE a.event_type = 'click' AND b.event_type = 'purchase'
    ORDER BY a.user_id, l_ts, r_ts
    """,
)
def stream_interval_join(spark, sf_dir):
    """Stream-stream interval join, batch-verifiable form: click events
    matched to same-user purchases within the next 10 minutes — the
    attribution-join shape. The streaming form
    (streaming/events.interval_join_streams) runs the identical plan
    with watermarks bounding state; tests/test_streaming.py proves
    stream==batch."""
    from heavydb_spark.streaming.events import interval_join_streams

    ev = T(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    buys = ev.filter(F.col("event_type") == "purchase")
    out = interval_join_streams(clicks, buys, max_lag="10 minutes")
    return out.select(
        "user_id", "l_ts", "l_type", r2(F.col("l_value")).alias("l_value"),
        "r_ts", "r_type", r2(F.col("r_value")).alias("r_value"),
    ).orderBy("user_id", "l_ts", "r_ts")


@query(
    "stream_interval_join_outer",
    oracle="""
    SELECT a.user_id,
           a.ts AS l_ts, round(a.value, 2) AS l_value,
           b.r_ts, b.r_type, round(b.r_value, 2) AS r_value
    FROM events a
    LEFT JOIN (
        SELECT user_id AS r_uid, ts AS r_ts, event_type AS r_type,
               value AS r_value
        FROM events WHERE event_type = 'purchase'
    ) b
      ON a.user_id = b.r_uid
     AND b.r_ts > a.ts
     AND b.r_ts <= a.ts + INTERVAL 10 MINUTE
    WHERE a.event_type = 'click'
    ORDER BY a.user_id, l_ts, r_ts
    """,
)
def stream_interval_join_outer(spark, sf_dir):
    """LEFT OUTER stream-stream interval join, batch-verifiable form:
    every click appears — attributed to same-user purchases within 10
    minutes, or with null purchase columns (the attribution-timeout
    shape). The streaming form emits the null row once the combined
    watermark passes l_ts + max_lag; tests/test_streaming.py proves
    stream==batch on time-ordered microbatches."""
    from heavydb_spark.streaming.events import interval_join_streams

    ev = T(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    buys = ev.filter(F.col("event_type") == "purchase")
    out = interval_join_streams(
        clicks, buys, max_lag="10 minutes", how="left_outer"
    )
    return out.select(
        "user_id", "l_ts", r2(F.col("l_value")).alias("l_value"),
        "r_ts", "r_type", r2(F.col("r_value")).alias("r_value"),
    ).orderBy("user_id", "l_ts", "r_ts")


@query(
    "stream_interval_join_full",
    oracle="""
    SELECT coalesce(a.user_id, b.r_uid) AS user_id,
           a.ts AS l_ts, round(a.value, 2) AS l_value,
           b.r_ts, b.r_type, round(b.r_value, 2) AS r_value
    FROM (SELECT * FROM events WHERE event_type = 'click') a
    FULL JOIN (
        SELECT user_id AS r_uid, ts AS r_ts, event_type AS r_type,
               value AS r_value
        FROM events WHERE event_type = 'purchase'
    ) b
      ON a.user_id = b.r_uid
     AND b.r_ts > a.ts
     AND b.r_ts <= a.ts + INTERVAL 10 MINUTE
    ORDER BY user_id, l_ts, r_ts
    """,
)
def stream_interval_join_full(spark, sf_dir):
    """FULL OUTER stream-stream interval join, batch-verifiable form:
    every click appears (attributed or null-purchase) AND every
    purchase appears (attributed or null-click — the orphan-conversion
    audit). Streaming form emits the unmatched rows as the watermark
    passes each side's bound; tests/test_streaming.py proves
    stream==batch on chronological micro-batches."""
    from heavydb_spark.streaming.events import interval_join_streams

    ev = T(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    buys = ev.filter(F.col("event_type") == "purchase")
    out = interval_join_streams(
        clicks, buys, max_lag="10 minutes", how="full_outer"
    )
    return out.select(
        "user_id", "l_ts", r2(F.col("l_value")).alias("l_value"),
        "r_ts", "r_type", r2(F.col("r_value")).alias("r_value"),
    ).orderBy("user_id", "l_ts", "r_ts")
