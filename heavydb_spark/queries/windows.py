"""Window-function surface (SURVEY.md §2.5; Shared/sqldefs.h:143-173).

All reference window kinds map to Spark Window specs; partitions are
hash-distributed then sorted per partition — the same shape as the
reference's hash-partition + sortPartition (WindowContext.cpp:534,1238),
with Spark's WindowExec replacing the segment-tree framed aggregation
(QueryEngine/Utils/SegmentTree.h).

Determinism rule: every ORDER BY in a window spec includes a unique
tiebreak column so results are stable across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from heavydb_spark.operators.windows import (
    conditional_change_event,
    forward_fill,
)
from heavydb_spark.queries.registry import query
from heavydb_spark.queries.util import T, r2, r4


@query(
    "window_row_number_topn",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) WHERE rn = 1 ORDER BY o_custkey
    """,
)
def window_row_number_topn(spark, sf_dir):
    """ROW_NUMBER top-1-per-group — the canonical dedup/top-n pattern
    (reference: ROW_NUMBER, sqldefs.h:148)."""
    o = T(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey")
    )


@query(
    "window_ranks",
    oracle="""
    SELECT l_returnflag, l_quantity,
           rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rnk,
           dense_rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS drnk,
           round(percent_rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity), 6) AS prnk,
           round(cume_dist() OVER (PARTITION BY l_returnflag ORDER BY l_quantity), 6) AS cdist
    FROM (SELECT DISTINCT l_returnflag, l_quantity FROM lineitem)
    ORDER BY l_returnflag, l_quantity
    """,
)
def window_ranks(spark, sf_dir):
    """RANK/DENSE_RANK/PERCENT_RANK/CUME_DIST (sqldefs.h:149-152) over a
    distinct domain (deterministic)."""
    li = (
        T(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_quantity")
        .distinct()
    )
    w = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    return li.select(
        "l_returnflag",
        "l_quantity",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("prnk"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
    ).orderBy("l_returnflag", "l_quantity")


@query(
    "window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           lag(o_totalprice) OVER w AS prev_price,
           lead(o_totalprice) OVER w AS next_price,
           lag(o_totalprice, 2, -1.0) OVER w AS prev2_price
    FROM orders
    WHERE o_custkey < 50
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
)
def window_lag_lead(spark, sf_dir):
    """LAG/LEAD with offset and default (sqldefs.h:153-156)."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.lag("o_totalprice", 2, -1.0).over(w).alias("prev2_price"),
    ).orderBy("o_custkey", "o_orderdate", "o_orderkey")


@query(
    "window_moving_avg",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           round(avg(l_extendedprice) OVER (
               PARTITION BY l_suppkey
               ORDER BY l_shipdate, l_orderkey, l_linenumber
               ROWS BETWEEN 10 PRECEDING AND CURRENT ROW), 4) AS mov_avg
    FROM lineitem
    WHERE l_suppkey < 20
    ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber
    """,
)
def window_moving_avg(spark, sf_dir):
    """B09: framed aggregate (ROWS frame — segment-tree path in the
    reference, WindowContext.h:247)."""
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") < 20)
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(-10, Window.currentRow)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        r4(F.avg("l_extendedprice").over(w)).alias("mov_avg"),
    ).orderBy("l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber")


@query(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
    FROM orders WHERE o_custkey < 100
    ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
)
def window_running_sum(spark, sf_dir):
    o = T(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        r2(F.sum("o_totalprice").over(w)).alias("running_total"),
    ).orderBy("o_custkey", "o_orderdate", "o_orderkey")


@query(
    "window_range_interval",
    oracle="""
    SELECT user_id, event_id,
           round(sum(value) OVER (
               PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL 10 MINUTES PRECEDING AND CURRENT ROW), 2) AS sum_10m
    FROM events WHERE user_id < 10
    ORDER BY user_id, ts, event_id
    """,
)
def window_range_interval(spark, sf_dir):
    """RANGE frame with interval bound (translateIntervalExprForWindow-
    Framing) — Spark rangeBetween over epoch seconds."""
    ev = T(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    ev = ev.withColumn(
        "ts_sec", F.col("ts").cast("timestamp").cast("double")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_sec")
        .rangeBetween(-600, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        r2(F.sum("value").over(w)).alias("sum_10m"),
    ).orderBy("user_id", "ts_sec", "event_id")


@query(
    "window_ntile_firstlast",
    oracle="""
    SELECT o_orderkey,
           ntile(4) OVER w AS quartile,
           first_value(o_orderkey) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND UNBOUNDED FOLLOWING) AS first_key,
           last_value(o_orderkey) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND UNBOUNDED FOLLOWING) AS last_key,
           nth_value(o_orderkey, 3) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND UNBOUNDED FOLLOWING) AS third_key
    FROM orders WHERE o_custkey < 30
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    ORDER BY o_custkey, o_totalprice DESC, o_orderkey
    """,
)
def window_ntile_firstlast(spark, sf_dir):
    """NTILE / FIRST_VALUE / LAST_VALUE / NTH_VALUE (sqldefs.h:157-166)."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_custkey") < 30)
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.col("o_orderkey")
    )
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        o.select(
            "o_orderkey",
            F.col("o_custkey").alias("_ck"),
            F.col("o_totalprice").alias("_tp"),
            F.ntile(4).over(w).alias("quartile"),
            F.first("o_orderkey").over(wf).alias("first_key"),
            F.last("o_orderkey").over(wf).alias("last_key"),
            F.nth_value("o_orderkey", 3).over(wf).alias("third_key"),
        )
        .orderBy("_ck", F.desc("_tp"), "o_orderkey")
        .drop("_ck", "_tp")
    )


@query(
    "window_forward_fill",
    oracle="""
    SELECT user_id, event_id,
           last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
    FROM (
        SELECT user_id, event_id, ts,
               CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
        FROM events
    ) WHERE user_id < 20
    ORDER BY user_id, ts, event_id
    """,
)
def window_forward_fill(spark, sf_dir):
    """FORWARD_FILL (sqldefs.h fill kinds) via ignore-nulls last()."""
    ev = T(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    v = F.when(F.col("event_type") == "error", None).otherwise(F.col("value"))
    ev = ev.withColumn("v", v)
    return ev.select(
        "user_id",
        "event_id",
        forward_fill(F.col("v"), ["user_id"], ["ts", "event_id"]).alias(
            "filled"
        ),
        F.col("ts").alias("_ts"),
    ).orderBy("user_id", "_ts", "event_id").drop("_ts")


@query(
    "window_conditional_change_event",
    oracle="""
    SELECT user_id, event_id, event_type,
           CAST(sum(CASE WHEN prev_type IS NOT NULL AND prev_type <> event_type
                    THEN 1 ELSE 0 END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS change_events
    FROM (
        SELECT user_id, event_id, event_type, ts,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        FROM events
    ) WHERE user_id < 15
    ORDER BY user_id, ts, event_id
    """,
)
def window_conditional_change_event(spark, sf_dir):
    """CONDITIONAL_CHANGE_EVENT (sqldefs.h:173) — lag-compare + running
    sum composition (operators/windows.py)."""
    ev = T(spark, sf_dir, "events").filter(F.col("user_id") < 15)
    return ev.select(
        "user_id",
        "event_id",
        "event_type",
        conditional_change_event(
            F.col("event_type"), ["user_id"], ["ts", "event_id"]
        ).alias("change_events"),
        F.col("ts").alias("_ts"),
    ).orderBy("user_id", "_ts", "event_id").drop("_ts")


@query(
    "window_lag_lead_in_frame",
    oracle="""
    WITH t AS (
        SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
               list(l_quantity) OVER (
                   PARTITION BY l_suppkey ORDER BY l_orderkey, l_linenumber
                   ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS lb,
               list(l_quantity) OVER (
                   PARTITION BY l_suppkey ORDER BY l_orderkey, l_linenumber
                   ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS lf
        FROM lineitem WHERE l_orderkey < 300
    )
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CASE WHEN len(lb) > 1 THEN list_extract(lb, len(lb) - 1) END AS lag_f,
           CASE WHEN len(lf) > 2 THEN list_extract(lf, 3) END AS lead_f
    FROM t ORDER BY l_suppkey, l_orderkey, l_linenumber
    """,
)
def window_lag_lead_in_frame(spark, sf_dir):
    """LAG_IN_FRAME / LEAD_IN_FRAME (sqldefs.h:154,156) — frame-aware
    lag/lead the reference computes natively in WindowContext; for
    constant ROWS frames the in-frame test is offset-vs-bound
    arithmetic on a plain lag/lead (operators/windows.py) — O(1) per
    row, no frame materialization."""
    from heavydb_spark.operators.windows import lag_in_frame, lead_in_frame

    li = T(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 300)
    part, order = "l_suppkey", ["l_orderkey", "l_linenumber"]
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        lag_in_frame(F.col("l_quantity"), 1, part, order, preceding=3).alias("lag_f"),
        lead_in_frame(F.col("l_quantity"), 2, part, order, following=3).alias("lead_f"),
    ).orderBy("l_suppkey", "l_orderkey", "l_linenumber")


@query(
    "sql_dialect_window_fill",
    oracle="""
    SELECT user_id, event_id,
           last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ff,
           first_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS bf,
           CAST(sum(CASE WHEN prev_type IS NOT NULL AND prev_type <> event_type
                    THEN 1 ELSE 0 END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cce
    FROM (
        SELECT user_id, event_id, ts, event_type,
               CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        FROM events
    ) WHERE user_id < 12
    ORDER BY user_id, ts, event_id
    """,
)
def sql_dialect_window_fill(spark, sf_dir):
    """HeavyDB-dialect window SQL through engine.sql — FORWARD_FILL /
    BACKWARD_FILL / CONDITIONAL_CHANGE_EVENT in their reference syntax
    (Shared/sqldefs.h:170-173), string-rewritten by dialect.py rather
    than built via the DataFrame API."""
    from heavydb_spark.engine import Engine

    eng = Engine(spark).attach(sf_dir)
    return eng.sql("""
        SELECT user_id, event_id,
               FORWARD_FILL(CASE WHEN event_type = 'error' THEN NULL
                            ELSE value END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id) AS ff,
               BACKWARD_FILL(CASE WHEN event_type = 'error' THEN NULL
                             ELSE value END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id) AS bf,
               CONDITIONAL_CHANGE_EVENT(event_type)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id) AS cce,
               ts AS _ts
        FROM events WHERE user_id < 12
        ORDER BY user_id, _ts, event_id
    """).drop("_ts")


@query(
    "sql_dialect_null_order",
    oracle="""
    WITH k AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 3 = 0 THEN NULL
                    ELSE o_totalprice END AS v
        FROM orders WHERE o_orderkey < 120
    )
    SELECT o_orderkey,
           row_number() OVER (ORDER BY v NULLS LAST,
                              o_orderkey NULLS LAST) AS rn_asc,
           row_number() OVER (ORDER BY v DESC NULLS FIRST,
                              o_orderkey NULLS LAST) AS rn_desc
    FROM k ORDER BY o_orderkey
    """,
)
def sql_dialect_null_order(spark, sf_dir):
    """Calcite default null collation through engine.sql
    (SqlToRelConverter.java:2185 nulls HIGH: LAST on ASC, FIRST on
    DESC): the Spark side writes NO NULLS clauses — the dialect
    appends them — while the oracle spells Calcite's placement
    explicitly (DuckDB's own default is LAST on both directions, so
    an un-annotated oracle would NOT match on DESC). row_number makes
    the ordering hash-comparable; the global window is a deliberate
    part of the semantics probe over a 80-row slice, not a scale
    pattern."""
    from heavydb_spark.engine import Engine

    eng = Engine(spark).attach(sf_dir)
    return eng.sql("""
        WITH k AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 3 = 0 THEN NULL
                        ELSE o_totalprice END AS v
            FROM orders WHERE o_orderkey < 120
        )
        SELECT o_orderkey,
               row_number() OVER (ORDER BY v, o_orderkey) AS rn_asc,
               row_number() OVER (ORDER BY v DESC, o_orderkey) AS rn_desc
        FROM k ORDER BY o_orderkey
    """)
