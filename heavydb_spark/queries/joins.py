"""Join surface (SURVEY.md §2.3; Shared/sqldefs.h:252-260).

The reference supports INNER/LEFT/SEMI/ANTI, left-deep multi-way joins
(RelLeftDeepInnerJoin.cpp), hash tables per join (PerfectJoinHashTable /
BaselineJoinHashTable), and loop joins for theta quals (JoinLoop.h:31).
Spark picks broadcast/shuffled-hash/sort-merge per side automatically;
we add explicit `broadcast()` hints for dimension tables — the analogue
of the reference's REPLICATED tables (TableDescriptor.h:119).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from heavydb_spark.queries.registry import query
from heavydb_spark.queries.util import T, r2


@query(
    "join_star_agg",
    oracle="""
    SELECT n_name, round(sum(l_extendedprice), 2) AS revenue, count(*) AS n
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name ORDER BY n_name
    """,
)
def join_star_agg(spark, sf_dir):
    """B08: multi-way star join. Left-deep hash-join chain in the
    reference (create_left_deep_join, RelAlgDag.cpp:3780); here the fact
    table joins shuffle-free against broadcast dimensions."""
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    n = T(spark, sf_dir, "nation")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            r2(F.sum("l_extendedprice")).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("n_name")
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT c_mktsegment,
           count(*) AS n_rows,
           count(o_orderkey) AS n_matched,
           count(*) - count(o_orderkey) AS n_customers_no_orders
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey AND o_totalprice > 450000
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def join_left_outer(spark, sf_dir):
    """LEFT OUTER with a join-side filter (OuterJoinOptViaNullRejection
    does NOT fire since the filter is in the ON clause)."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    return (
        c.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_totalprice") > 450000),
            "left",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("o_orderkey").alias("n_matched"),
            (F.count(F.lit(1)) - F.count("o_orderkey")).alias(
                "n_customers_no_orders"
            ),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_mktsegment, count(*) AS n
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def join_semi(spark, sf_dir):
    """SEMI join (sqldefs.h:255; from IN-subquery decorrelation,
    HeavyDBParser.java:285) → Spark left_semi."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("c_mktsegment")
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_mktsegment, count(*) AS n
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def join_anti(spark, sf_dir):
    """ANTI join (sqldefs.h:256, NOT-IN decorrelation). o_custkey is
    non-null in the fixture so left_anti matches NOT IN semantics."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("c_mktsegment")
    )


@query(
    "join_multi_key",
    oracle="""
    SELECT l_returnflag, count(*) AS n, round(sum(s_acctbal), 2) AS bal
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey AND l_linenumber = (s_suppkey % 7) + 1
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def join_multi_key(spark, sf_dir):
    """Composite-key join (baseline hash table, BaselineJoinHashTable.h:49;
    adjacent equi-quals coalesced, EquiJoinCondition.cpp)."""
    li = T(spark, sf_dir, "lineitem")
    s = T(spark, sf_dir, "supplier")
    return (
        li.join(
            broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("l_linenumber") == (F.col("s_suppkey") % 7) + 1),
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            r2(F.sum("s_acctbal")).alias("bal"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "join_theta_loop",
    oracle="""
    SELECT r_name, count(*) AS n_other_nations
    FROM region
    JOIN nation ON n_regionkey <> r_regionkey
    GROUP BY r_name ORDER BY r_name
    """,
)
def join_theta_loop(spark, sf_dir):
    """Theta (non-equi) join → loop join in the reference (JoinLoop.h:31
    UpperBound) → BroadcastNestedLoopJoin in Spark."""
    r = T(spark, sf_dir, "region")
    n = T(spark, sf_dir, "nation")
    return (
        r.join(broadcast(n), F.col("n_regionkey") != F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_other_nations"))
        .orderBy("r_name")
    )


@query(
    "join_range_qual",
    oracle="""
    SELECT o_orderstatus, count(*) AS n
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
      AND l_shipdate >= o_orderdate
      AND l_shipdate < o_orderdate + INTERVAL 60 DAY
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def join_range_qual(spark, sf_dir):
    """Equi + range qual (RangeJoinHashTable.h:21 analogue): the equi key
    drives the hash join, the range qual is a post-probe filter."""
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    return (
        li.join(
            o,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") >= F.col("o_orderdate"))
            & (
                F.col("l_shipdate")
                < F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
            ),
        )
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("o_orderstatus")
    )


@query(
    "join_null_safe",
    oracle="""
    SELECT count(*) AS n
    FROM (SELECT nullif(o_orderstatus, 'P') AS k, o_orderkey FROM orders) a
    JOIN (SELECT nullif(o_orderstatus, 'P') AS k, o_orderkey FROM orders) b
      ON a.k IS NOT DISTINCT FROM b.k AND a.o_orderkey = b.o_orderkey
    """,
)
def join_null_safe(spark, sf_dir):
    """Null-safe equality BW_EQ (sqldefs.h:33) → Spark `<=>`
    (eqNullSafe), DuckDB IS NOT DISTINCT FROM."""
    o = T(spark, sf_dir, "orders")
    a = o.select(
        F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("k"), "o_orderkey"
    ).alias("a")
    b = o.select(
        F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("k"), "o_orderkey"
    ).alias("b")
    return a.join(
        b,
        F.col("a.k").eqNullSafe(F.col("b.k"))
        & (F.col("a.o_orderkey") == F.col("b.o_orderkey")),
    ).agg(F.count(F.lit(1)).alias("n"))


@query(
    "subquery_scalar",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > (SELECT 0.999999 * max(o_totalprice) FROM orders)
    ORDER BY o_orderkey
    """,
)
def subquery_scalar(spark, sf_dir):
    """Scalar subquery — SINGLE_VALUE agg inserted by the planner
    (sqldefs.h:85); Catalyst does the same via ScalarSubquery."""
    o = T(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > (SELECT 0.999999 * max(o_totalprice) FROM orders)
        ORDER BY o_orderkey
        """
    )


@query(
    "subquery_correlated_exists",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_suppkey = s_suppkey AND l_quantity > 49.9
    )
    ORDER BY s_suppkey
    """,
)
def subquery_correlated_exists(spark, sf_dir):
    """Correlated EXISTS (decorrelated to semi join —
    Tests/CorrelatedSubqueryTest.cpp pattern)."""
    T(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    T(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_suppkey = s_suppkey AND l_quantity > 49.9
        )
        ORDER BY s_suppkey
        """
    )


@query(
    "subquery_in_select",
    oracle="""
    SELECT p_partkey, p_name
    FROM part
    WHERE p_partkey IN (
        SELECT l_partkey FROM lineitem WHERE l_quantity >= 49.95
    )
    ORDER BY p_partkey
    """,
)
def subquery_in_select(spark, sf_dir):
    """IN-subquery → semi join (rewriteConstrainedByIn, QueryRewrite.h:46)."""
    T(spark, sf_dir, "part").createOrReplaceTempView("part")
    T(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT p_partkey, p_name
        FROM part
        WHERE p_partkey IN (
            SELECT l_partkey FROM lineitem WHERE l_quantity >= 49.95
        )
        ORDER BY p_partkey
        """
    )


@query(
    "join_multistep_tpch_q3",
    oracle="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def join_multistep_tpch_q3(spark, sf_dir):
    """B10 MultiStep: TPC-H Q3 shape — filter pushdown through joins
    (JoinFilterPushDown.h:26; Catalyst does it statically)."""
    c = T(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = T(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    )
    li = T(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    )
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            r2(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.col("o_orderdate"), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "join_multistep_tpch_q5",
    oracle="""
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def join_multistep_tpch_q5(spark, sf_dir):
    """TPC-H Q5 shape: 6-table left-deep join tree with a region filter
    that must propagate through nation to prune suppliers (the
    reference flattens to a left-deep tree, RelLeftDeepInnerJoin.cpp).

    Fact-centric join order: lineitem is the LEFT/probe side of every
    join so the largest relation is never a broadcast build — at 100 TB
    the fact table streams while customer/orders hash-join on their
    keys and the true dims (supplier/nation/region) broadcast. (Written
    the customer-first way, Catalyst's size estimate after column
    pruning picks lineitem as the build side — a 33 MB broadcast at
    sf0.1 and a non-plan at scale.)"""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1994-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    )
    li = T(spark, sf_dir, "lineitem")
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            r2(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.col("n_name"))
    )


@query(
    "join_multistep_tpch_q10",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1995-07-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def join_multistep_tpch_q10(spark, sf_dir):
    """TPC-H Q10 shape (returned-item revenue): fact-centric 4-table
    join — lineitem streams with the returnflag filter pushed to the
    scan, filtered orders hash-joins on the key, customer/nation
    broadcast; top-20 via TakeOrdered, no global sort materialized."""
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1995-07-01 00:00:00").cast("timestamp_ntz"))
    )
    c = T(spark, sf_dir, "customer")
    n = T(spark, sf_dir, "nation")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            r2(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "join_multistep_tpch_q7",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(extract(year FROM l_shipdate) AS BIGINT) AS l_year,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_9')
        OR (n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_3'))
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def join_multistep_tpch_q7(spark, sf_dir):
    """TPC-H Q7 shape (volume shipping between two nations): the
    nation table joins TWICE under different roles (supplier-side and
    customer-side) with a disjunctive cross-nation predicate — the
    self-join-aliasing + OR-of-conjunctions case the reference routes
    through its left-deep builder.

    Catalyst cannot push the two-sided OR below either join (it needs
    both sides bound), but its one-sided consequences ARE derivable by
    hand: each side of the pair is one of the two nations, so supplier
    and customer pre-filter to `n_name IN (the two nations)` via their
    (broadcast, 2-row) nation joins BEFORE touching the fact — the
    lineitem probe stream and the orders side of the orderkey shuffle
    both shrink ~(2/|nation|) up front, and only the residual 2-of-4
    combo filter remains after the joins. Plan-asserted in
    tests/test_plans.py (In-filter pushed to both nation scans;
    lineitem never a broadcast build)."""
    li = T(spark, sf_dir, "lineitem")
    s = T(spark, sf_dir, "supplier")
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    names = ("NATION_3", "NATION_9")
    n1 = (
        T(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(*names))
        .select(
            F.col("n_nationkey").alias("n1_key"),
            F.col("n_name").alias("supp_nation"),
        )
    )
    n2 = (
        T(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(*names))
        .select(
            F.col("n_nationkey").alias("n2_key"),
            F.col("n_name").alias("cust_nation"),
        )
    )
    s_f = s.join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
    c_f = c.join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
    o_f = o.join(c_f, F.col("o_custkey") == F.col("c_custkey"))
    pair = (
        ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_9"))
        | ((F.col("supp_nation") == "NATION_9") & (F.col("cust_nation") == "NATION_3"))
    )
    return (
        li.join(F.broadcast(s_f), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o_f, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            r2(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "subquery_correlated_scalar",
    oracle="""
    SELECT s_suppkey, s_name,
           (SELECT round(CAST(max(l_extendedprice) AS DOUBLE), 2)
            FROM lineitem WHERE l_suppkey = s_suppkey AND l_quantity > 45)
               AS max_big_price
    FROM supplier ORDER BY s_suppkey
    """,
)
def subquery_correlated_scalar(spark, sf_dir):
    """Correlated scalar subquery in the SELECT list
    (Tests/CorrelatedSubqueryTest.cpp Select.Correlated): per-outer-row
    aggregate over a filtered inner relation, NULL when the inner set
    is empty — Catalyst decorrelates to a left outer aggregate join,
    the same rewrite the reference's Calcite frontend applies."""
    T(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    T(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT s_suppkey, s_name,
               (SELECT round(CAST(max(l_extendedprice) AS DOUBLE), 2)
                FROM lineitem WHERE l_suppkey = s_suppkey AND l_quantity > 45)
                   AS max_big_price
        FROM supplier ORDER BY s_suppkey
        """
    )


@query(
    "subquery_not_in_nulls",
    oracle="""
    SELECT p_partkey FROM part
    WHERE p_partkey NOT IN (
        SELECT CASE WHEN l_quantity > 49.97 THEN NULL ELSE l_partkey END
        FROM lineitem WHERE l_partkey < 50
    )
    ORDER BY p_partkey
    """,
)
def subquery_not_in_nulls(spark, sf_dir):
    """NOT IN with a NULLABLE inner expression — the three-valued-logic
    decorrelation case the reference's Calcite frontend guards
    specially (HeavyDBParser.java:285-325 NOT-IN policy): if the inner
    set contains any NULL, NOT IN yields no rows unless the comparison
    is definitely true-for-all. Both engines must agree on null-aware
    anti-join semantics."""
    T(spark, sf_dir, "part").createOrReplaceTempView("part")
    T(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT p_partkey FROM part
        WHERE p_partkey NOT IN (
            SELECT CASE WHEN l_quantity > 49.97 THEN NULL ELSE l_partkey END
            FROM lineitem WHERE l_partkey < 50
        )
        ORDER BY p_partkey
        """
    )


@query(
    "join_asof_backward",
    oracle="""
    WITH l AS (
        SELECT event_id, user_id, ts, value
        FROM events WHERE event_type = 'click'
    ), r AS (
        SELECT user_id, ts, value
        FROM events WHERE event_type = 'purchase'
    ), j AS (
        SELECT l.event_id, l.user_id, l.ts AS click_ts, l.value,
               r.ts AS m_ts, r.value AS m_value,
               epoch_us(l.ts) - epoch_us(r.ts) AS gap_us
        FROM l ASOF LEFT JOIN r
          ON l.user_id = r.user_id AND l.ts >= r.ts
    )
    SELECT event_id, user_id, click_ts, value,
           CASE WHEN gap_us <= 7200000000 THEN m_ts END AS r_match_ts,
           CASE WHEN gap_us <= 7200000000 THEN m_value END AS r_value,
           CASE WHEN gap_us <= 7200000000 THEN gap_us END AS gap_us
    FROM j ORDER BY event_id
    """,
)
def join_asof_backward(spark, sf_dir):
    """As-of join (operators/temporal.py asof_join): every click joined
    to the user's most recent purchase at-or-before it, within a
    2-hour tolerance — the point-in-time lookup (trades-to-quotes,
    features-to-snapshots) the reference serves with its range-join
    machinery (QueryEngine/RangeTableFunctions.h). Implemented with NO
    join at all: union both sides, one per-key window, running `last`
    — a single hash shuffle, exact, parameter-free (vs a binned range
    join's bin guess + row replication). Oracle = DuckDB's native
    ASOF LEFT JOIN with the tolerance as an exact integer-microsecond
    post-filter."""
    from heavydb_spark.operators.temporal import asof_join

    ev = T(spark, sf_dir, "events")
    l = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.col("ts").alias("click_ts"), "value"
    )
    r = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    out = asof_join(
        l, r, ["user_id"], left_ts="click_ts", right_ts="ts",
        tolerance_seconds=7200,
    )
    return out.select(
        "event_id", "user_id", "click_ts", "value",
        "r_match_ts", "r_value",
        (
            F.unix_micros(F.col("click_ts").cast("timestamp"))
            - F.unix_micros(F.col("r_match_ts").cast("timestamp"))
        ).alias("gap_us"),
    ).orderBy("event_id")


@query(
    "join_fuzzy_names",
    oracle="""
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           levenshtein(a.c_name, b.c_name) AS dist
    FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    ORDER BY id_a, id_b
    """,
)
def join_fuzzy_names(spark, sf_dir):
    """Fuzzy string join (operators/dedup.py fuzzy_string_pairs): all
    customer-name pairs within edit distance 1 via SymSpell-style
    delete-1 neighborhood blocking — an equi-join on generated
    variants plus exact levenshtein verify, never an all-pairs
    comparison (the oracle brute-forces the quadratic form DuckDB can
    afford at sf0.01; the Spark plan is the one that survives 100 TB).
    Mirrors the reference's LEVENSHTEIN string-op kernels
    (StringOps/) lifted from a per-row function to a scalable join."""
    from heavydb_spark.operators.dedup import fuzzy_string_pairs

    c = T(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return fuzzy_string_pairs(c, "c_custkey", "c_name", max_dist=1).orderBy(
        "id_a", "id_b"
    )
