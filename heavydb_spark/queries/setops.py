"""Set operations (SURVEY.md §2.7).

Reference: UNION ALL only (RelLogicalUnion, RelAlgDag.h:3136; plain UNION
throws, RelAlgDag.cpp:847; INTERSECT/EXCEPT unsupported, :3242). Spark
provides all of them natively — UNION ALL matches reference surface, the
rest declared as beyond-parity.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from heavydb_spark.queries.registry import query
from heavydb_spark.queries.util import T


@query(
    "union_all",
    oracle="""
    SELECT name, bal FROM (
        SELECT c_name AS name, c_acctbal AS bal FROM customer WHERE c_acctbal > 9900
        UNION ALL
        SELECT s_name AS name, s_acctbal AS bal FROM supplier WHERE s_acctbal > 9000
    ) ORDER BY name, bal
    """,
)
def union_all(spark, sf_dir):
    """UNION ALL (executeUnion, RelAlgExecutor.cpp:2964)."""
    c = (
        T(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9900)
        .select(F.col("c_name").alias("name"), F.col("c_acctbal").alias("bal"))
    )
    s = (
        T(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .select(F.col("s_name").alias("name"), F.col("s_acctbal").alias("bal"))
    )
    return c.unionAll(s).orderBy("name", "bal")


@query(
    "union_distinct",
    oracle="""
    SELECT c_nationkey AS nk FROM customer
    UNION
    SELECT s_nationkey AS nk FROM supplier
    ORDER BY nk
    """,
)
def union_distinct(spark, sf_dir):
    """Plain UNION — rejected by the reference (RelAlgDag.cpp:847),
    native in Spark (beyond-parity)."""
    c = T(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = T(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.union(s).distinct().orderBy("nk")


@query(
    "intersect_keys",
    oracle="""
    SELECT l_partkey AS pk FROM lineitem WHERE l_quantity > 49
    INTERSECT
    SELECT l_partkey AS pk FROM lineitem WHERE l_quantity < 2
    ORDER BY pk
    """,
)
def intersect_keys(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") > 49).select(F.col("l_partkey").alias("pk"))
    b = li.filter(F.col("l_quantity") < 2).select(F.col("l_partkey").alias("pk"))
    return a.intersect(b).orderBy("pk")


@query(
    "except_keys",
    oracle="""
    SELECT s_nationkey AS nk FROM supplier
    EXCEPT
    SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 9000
    ORDER BY nk
    """,
)
def except_keys(spark, sf_dir):
    s = T(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    c = (
        T(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_nationkey").alias("nk"))
    )
    # subtract == set EXCEPT; exceptAll().distinct() would be wrong (a key
    # occurring more often on the left than the right survives the
    # per-occurrence subtraction and then the distinct).
    return s.subtract(c).orderBy("nk")
