"""Core slice: scan → project → filter → agg → sort (SURVEY.md §2.1-2.2).

Reference nodes: RelScan (RelAlgDag.h:1281), RelProject (:1452), RelFilter
(:2138), RelCompound fusion (:2328) — all expressed declaratively so
Catalyst reproduces the fused filter+project+agg pipeline via whole-stage
codegen, with parquet column pruning and predicate pushdown standing in
for the reference's lazy column fetch (PlanState.h:47) and fragment
skipping (InputMetadata.cpp).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from heavydb_spark.queries.registry import query
from heavydb_spark.queries.util import T, r2, r4


@query(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark, sf_dir):
    """TPC-H Q1-shaped flagship: fused filter+project+agg (RelCompound,
    RelAlgDag.h:2328) + sort (RelSort, :2516)."""
    li = T(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            r2(F.sum("l_quantity")).alias("sum_qty"),
            r2(F.sum("l_extendedprice")).alias("sum_base_price"),
            r2(F.sum(disc_price)).alias("sum_disc_price"),
            r2(F.sum(disc_price * (1 + F.col("l_tax")))).alias("sum_charge"),
            r4(F.avg("l_quantity")).alias("avg_qty"),
            r4(F.avg("l_extendedprice")).alias("avg_price"),
            r4(F.avg("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "scan_project_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount), 4) AS net_price,
           l_quantity
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 12 AND l_returnflag = 'A'
    ORDER BY l_orderkey, l_linenumber
    """,
)
def scan_project_filter(spark, sf_dir):
    """RelScan + RelProject + RelFilter; predicate reaches the parquet
    scan (PushedFilters), projection prunes to 6 of 11 columns."""
    li = T(spark, sf_dir, "lineitem")
    return (
        li.filter(
            F.col("l_quantity").between(10, 12) & (F.col("l_returnflag") == "A")
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
            ).alias("net_price"),
            "l_quantity",
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "case_expr",
    oracle="""
    SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
                WHEN o_totalprice < 150000 THEN 'mid'
                ELSE 'high' END AS price_band,
           o_orderstatus,
           count(*) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def case_expr(spark, sf_dir):
    """Searched CASE with common-type coercion (RelAlgTranslator::
    translateCase, CaseIR.cpp)."""
    o = T(spark, sf_dir, "orders")
    band = (
        F.when(F.col("o_totalprice") < 50000, "low")
        .when(F.col("o_totalprice") < 150000, "mid")
        .otherwise("high")
    )
    return (
        o.groupBy(band.alias("price_band"), F.col("o_orderstatus"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            r2(F.sum("o_totalprice")).alias("total"),
        )
        .orderBy("price_band", "o_orderstatus")
    )


@query(
    "in_list_filter",
    oracle="""
    SELECT o_orderpriority, count(*) AS n
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_orderstatus NOT IN ('F')
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def in_list_filter(spark, sf_dir):
    """IN-list predicates (translateInOper; big lists → InValuesBitmap,
    QueryEngine/InValuesBitmap.cpp — Spark folds to OR/InSet)."""
    o = T(spark, sf_dir, "orders")
    return (
        o.filter(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            & ~F.col("o_orderstatus").isin("F")
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("o_orderpriority")
    )


@query(
    "like_regexp_filter",
    oracle="""
    SELECT p_type, count(*) AS n,
           CAST(count_if(p_name ILIKE '%RED%') AS BIGINT) AS n_ilike
    FROM part
    WHERE p_name LIKE '%red%' OR regexp_matches(p_name, '^(blue|green) ')
    GROUP BY p_type ORDER BY p_type
    """,
)
def like_regexp_filter(spark, sf_dir):
    """LIKE / ILIKE / REGEXP predicates (translateLike/translateRegexp,
    QueryEngine/RegexpFunctions.cpp)."""
    p = T(spark, sf_dir, "part")
    return (
        p.filter(
            F.col("p_name").like("%red%")
            | F.col("p_name").rlike("^(blue|green) ")
        )
        .groupBy("p_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_if(F.col("p_name").ilike("%RED%")).alias("n_ilike"),
        )
        .orderBy("p_type")
    )


@query(
    "distinct_projection",
    oracle="""
    SELECT DISTINCT c_mktsegment, c_nationkey
    FROM customer
    WHERE c_acctbal > 5000
    ORDER BY c_mktsegment, c_nationkey
    """,
)
def distinct_projection(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_acctbal") > 5000)
        .select("c_mktsegment", "c_nationkey")
        .distinct()
        .orderBy("c_mktsegment", "c_nationkey")
    )


@query(
    "values_literal",
    oracle="""
    SELECT * FROM (VALUES (1, 'one'), (2, 'two'), (3, 'three')) AS t(n, name)
    ORDER BY n
    """,
)
def values_literal(spark, sf_dir):
    """RelLogicalValues — SELECT over literal rows (RelAlgDag.h:3206,
    executeLogicalValues RelAlgExecutor.cpp:1820)."""
    return spark.sql(
        "SELECT * FROM VALUES (1, 'one'), (2, 'two'), (3, 'three') AS t(n, name) ORDER BY n"
    )


@query(
    "null_handling",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS n_rows,
           count(nullif(o_orderpriority, '4-NOT SPECIFIED')) AS n_specified,
           coalesce(nullif(min(o_orderpriority), '1-URGENT'), 'fallback') AS min_or_fallback,
           CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def null_handling(spark, sf_dir):
    """NULL semantics: NULLIF/COALESCE/ISNULL (reference sentinel-null
    machinery, sqltypes.h inline_int_null_val — Spark native nulls)."""
    o = T(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(F.nullif(F.col("o_orderpriority"), F.lit("4-NOT SPECIFIED"))).alias("n_specified"),
            F.coalesce(
                F.nullif(F.min("o_orderpriority"), F.lit("1-URGENT")),
                F.lit("fallback"),
            ).alias("min_or_fallback"),
            F.sum(
                F.when(F.col("o_orderpriority").isNull(), 1).otherwise(0)
            ).alias("n_null"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "sql_dialect_int_division",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_orderkey // l_linenumber AS int_div,
           7 // 2 AS lit_div,
           (0 - 7) // 2 AS neg_lit_div,
           l_orderkey // 4 AS col_lit_div,
           (l_partkey + l_suppkey) // 3 AS expr_div,
           round(l_quantity / 2, 6) AS frac_div,
           round(l_orderkey * 1.0e0 / l_linenumber, 6) AS guarded_div
    FROM lineitem WHERE l_orderkey < 200
    ORDER BY l_orderkey, l_linenumber
    """,
)
def sql_dialect_int_division(spark, sf_dir):
    """Reference-semantics C-style integer division through engine.sql
    (QueryEngine/ArithmeticIR.cpp kDIVIDE; Tests/ExecuteTest.cpp
    division cases): `/` over two provably integer-typed operands
    truncates toward zero — int columns, int literals, a negative
    literal, and an additive int expression all integer-divide, while a
    DOUBLE operand (l_quantity) or a float factor anywhere in the left
    multiplicative chain (l_orderkey * 1.0e0 — the exponent form keeps
    the result DOUBLE on both engines; a plain `1.0` is DECIMAL in
    Spark, which the driver canonicalizer stringifies differently from
    the oracle's DOUBLE even when values match) keeps Spark's
    fractional division.  The dialect proves operand types via the Engine's
    attached-schema resolver and emits Spark `DIV` (IntegralDivide —
    the same trunc-toward-zero as C++ and DuckDB's `//`)."""
    from heavydb_spark.engine import Engine

    eng = Engine(spark).attach(sf_dir)
    return eng.sql("""
        SELECT l_orderkey, l_linenumber,
               l_orderkey / l_linenumber AS int_div,
               7 / 2 AS lit_div,
               -7 / 2 AS neg_lit_div,
               l_orderkey / 4 AS col_lit_div,
               (l_partkey + l_suppkey) / 3 AS expr_div,
               ROUND(l_quantity / 2, 6) AS frac_div,
               ROUND(l_orderkey * 1.0e0 / l_linenumber, 6) AS guarded_div
        FROM lineitem WHERE l_orderkey < 200
        ORDER BY l_orderkey, l_linenumber
    """)
