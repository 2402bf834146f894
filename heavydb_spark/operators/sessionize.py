"""Sessionization / dwell-time operators.

Reference: tf_compute_dwell_times table function
(QueryEngine/TableFunctions/SystemFunctions/os/SessionizeTableFunctions.hpp).
Spark-first design: a session id is a running sum over a gap indicator —
pure window algebra, no state machine, no UDF. Scales as one shuffle on
the entity key plus a per-partition sort (exactly how the reference's
partition build works, WindowContext.cpp:534).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign per-entity session ids: a new session starts after a gap
    > `gap_seconds` between consecutive events."""
    w = Window.partitionBy(entity_col).orderBy(ts_col)
    prev_ts = F.lag(ts_col).over(w)
    # timestamp_ntz has no direct numeric cast; route via timestamp
    # (session tz is pinned UTC — session.py RUNTIME_CONF)
    gap = F.col(ts_col).cast("timestamp").cast("double") - prev_ts.cast(
        "timestamp"
    ).cast("double")
    new_session = F.when(
        prev_ts.isNull() | (gap > gap_seconds), F.lit(1)
    ).otherwise(F.lit(0))
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(session_col, F.sum(new_session).over(w_run))


def dwell_times(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
) -> DataFrame:
    """Per (entity, session): start/end/dwell seconds/event count —
    the tf_compute_dwell_times output shape."""
    s = sessionize(df, entity_col, ts_col, gap_seconds)
    return s.groupBy(entity_col, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (
            F.max(F.col(ts_col).cast("timestamp").cast("double"))
            - F.min(F.col(ts_col).cast("timestamp").cast("double"))
        ).alias("dwell_seconds"),
        F.count(F.lit(1)).alias("n_events"),
    )
