"""Built-in table functions (SURVEY.md §2.10).

generate_series / sessionize (tf_compute_dwell_times) / feature
similarity — the reference's system UDTFs re-expressed as DataFrame
pipelines (operators/series.py, operators/sessionize.py,
operators/similarity.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from heavydb_spark.operators.series import generate_series, generate_series_ts
from heavydb_spark.operators.sessionize import dwell_times
from heavydb_spark.operators.similarity import feature_self_similarity
from heavydb_spark.queries.registry import query
from heavydb_spark.queries.util import T


@query(
    "tf_generate_series",
    oracle="""
    SELECT generate_series AS series FROM generate_series(1, 10000, 7)
    ORDER BY series
    """,
)
def tf_generate_series(spark, sf_dir):
    """generate_series(start, stop, step) int form
    (UtilityTableFunctions.h:28) — spark.range is the parallel source."""
    return generate_series(spark, 1, 10000, 7).orderBy("series")


@query(
    "tf_generate_series_ts",
    oracle="""
    SELECT generate_series AS series
    FROM generate_series(TIMESTAMP '2024-01-01 00:00:00',
                         TIMESTAMP '2024-03-01 00:00:00',
                         INTERVAL 6 HOUR)
    ORDER BY series
    """,
)
def tf_generate_series_ts(spark, sf_dir):
    """generate_series timestamp+interval form (UtilityTableFunctions.h:30)."""
    return generate_series_ts(
        spark, "2024-01-01 00:00:00", "2024-03-01 00:00:00", "6 HOUR"
    ).orderBy("series")


@query(
    "tf_dwell_times",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sessions AS (
        SELECT user_id, ts,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           min(ts) AS session_start,
           max(ts) AS session_end,
           epoch(max(ts)) - epoch(min(ts)) AS dwell_seconds,
           count(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
)
def tf_dwell_times(spark, sf_dir):
    """tf_compute_dwell_times (SessionizeTableFunctions.hpp): gap-based
    sessionization (30 min) + per-session dwell aggregation."""
    ev = T(spark, sf_dir, "events")
    return dwell_times(ev, "user_id", "ts", gap_seconds=1800).orderBy(
        "user_id", "session_id"
    )


@query(
    "tf_feature_similarity",
    oracle="""
    WITH v AS (
        SELECT user_id, event_type, CAST(sum(value) AS DOUBLE) AS val
        FROM events WHERE user_id < 12
        GROUP BY user_id, event_type
    ), norms AS (
        SELECT user_id, sqrt(sum(val * val)) AS norm FROM v GROUP BY user_id
    )
    SELECT a.user_id AS key_a, b.user_id AS key_b,
           round(sum(a.val * b.val) / (max(na.norm) * max(nb.norm)), 6) AS cos_sim
    FROM v a
    JOIN v b ON a.event_type = b.event_type AND a.user_id < b.user_id
    JOIN norms na ON na.user_id = a.user_id
    JOIN norms nb ON nb.user_id = b.user_id
    GROUP BY a.user_id, b.user_id
    ORDER BY key_a, key_b
    """,
)
def tf_feature_similarity(spark, sf_dir):
    """tf_feature_self_similarity (SimilarityTableFunctions.hpp): cosine
    between entities over sparse (feature→metric) vectors, via equi-join
    on feature — never a dense cross join."""
    ev = T(spark, sf_dir, "events").filter(F.col("user_id") < 12)
    return feature_self_similarity(ev, "user_id", "event_type", "value").orderBy(
        "key_a", "key_b"
    )
