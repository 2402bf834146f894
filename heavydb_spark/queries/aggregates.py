"""Aggregation surface (SURVEY.md §2.4; Shared/sqldefs.h:76-90).

Spark's HashAggregateExec plays both the perfect-hash and baseline-hash
group-by roles (GroupByAndAggregate.cpp:197-320) — it spills instead of
needing the reference's NDV estimator / retry ladder. Partial→final
aggregation replaces the JIT'd reduction (ResultSetReductionJIT.cpp).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from heavydb_spark.queries.registry import query
from heavydb_spark.queries.util import T, r2, r4


@query(
    "agg_count_star",
    oracle="SELECT count(*) AS n FROM lineitem",
)
def agg_count_star(spark, sf_dir):
    """B01: non-grouped aggregate (QueryDescriptionType::NonGroupedAggregate)."""
    return T(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("n"))


@query(
    "agg_groupby_count",
    oracle="""
    SELECT l_returnflag, count(*) AS n FROM lineitem
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_groupby_count(spark, sf_dir):
    """B02: perfect-hash single-column group-by analogue."""
    return (
        T(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("l_returnflag")
    )


@query(
    "agg_groupby_avg",
    oracle="""
    SELECT l_returnflag, round(avg(l_extendedprice), 4) AS avg_price
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_groupby_avg(spark, sf_dir):
    """B03."""
    return (
        T(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(r4(F.avg("l_extendedprice")).alias("avg_price"))
        .orderBy("l_returnflag")
    )


@query(
    "agg_groupby_multicol",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def agg_groupby_multicol(spark, sf_dir):
    """B04: perfect-hash multi-column group-by analogue."""
    return (
        T(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            r4(F.avg("l_extendedprice")).alias("avg_price"),
            r2(F.sum("l_quantity")).alias("sum_qty"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "agg_groupby_highcard",
    oracle="""
    SELECT o_custkey, count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders GROUP BY o_custkey ORDER BY o_custkey
    """,
)
def agg_groupby_highcard(spark, sf_dir):
    """B05: baseline-hash (high-cardinality key) group-by analogue —
    Spark hash agg + shuffle on the key; AQE coalesces output partitions."""
    return (
        T(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            r2(F.sum("o_totalprice")).alias("total"),
        )
        .orderBy("o_custkey")
    )


@query(
    "agg_count_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS ndv_part,
           count(DISTINCT l_suppkey) AS ndv_supp
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_count_distinct(spark, sf_dir):
    """Exact COUNT DISTINCT (CountDistinctDescriptor.h:39 bitmap/hash-set
    → Spark expand+two-phase agg)."""
    return (
        T(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("ndv_part"),
            F.countDistinct("l_suppkey").alias("ndv_supp"),
        )
        .orderBy("l_returnflag")
    )


@query("agg_approx_count_distinct")  # approx: engine-specific → rows-only check
def agg_approx_count_distinct(spark, sf_dir):
    """APPROX_COUNT_DISTINCT — HyperLogLog (QueryEngine/HyperLogLog.h:88;
    default precision 11 bits ≈ rsd 0.023). Spark HLL++ with matching rsd."""
    return (
        T(spark, sf_dir, "lineitem")
        .agg(F.approx_count_distinct("l_partkey", rsd=0.023).alias("approx_ndv"))
    )


@query("agg_approx_percentile")  # approx: engine-specific → rows-only check
def agg_approx_percentile(spark, sf_dir):
    """APPROX_QUANTILE/APPROX_MEDIAN — t-digest (Shared/quantile.h:184) →
    Spark approx_percentile (B07). Both quantiles read ONE shared
    sketch (the array form builds a single QuantileSummaries instead
    of two — half the aggregation work; the reference's t-digest is
    likewise built once and probed per quantile)."""
    both = F.percentile_approx(
        "l_extendedprice", F.array(F.lit(0.5), F.lit(0.95)), 10000
    )
    return T(spark, sf_dir, "lineitem").agg(
        both[0].alias("approx_median"),
        both[1].alias("approx_p95"),
    )


@query(
    "agg_exact_median",
    oracle="""
    SELECT l_returnflag,
           round(median(l_extendedprice), 4) AS med_price
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_exact_median(spark, sf_dir):
    """Exact median (Spark `median`, 3.4+) — checkable against DuckDB."""
    return (
        T(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(r4(F.median("l_extendedprice")).alias("med_price"))
        .orderBy("l_returnflag")
    )


@query(
    "agg_count_if_sum_if",
    oracle="""
    SELECT o_orderstatus,
           CAST(count_if(o_totalprice > 100000) AS BIGINT) AS n_big,
           round(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice ELSE 0 END), 2) AS urgent_total
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def agg_count_if_sum_if(spark, sf_dir):
    """COUNT_IF / SUM_IF (sqldefs.h:87-88)."""
    o = T(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.count_if(F.col("o_totalprice") > 100000).alias("n_big"),
            r2(
                F.sum(
                    F.when(
                        F.col("o_orderpriority") == "1-URGENT",
                        F.col("o_totalprice"),
                    ).otherwise(F.lit(0.0))
                )
            ).alias("urgent_total"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "agg_mode",
    oracle="""
    WITH counts AS (
        SELECT o_orderstatus, o_orderpriority, count(*) AS c
        FROM orders GROUP BY o_orderstatus, o_orderpriority
    )
    SELECT o_orderstatus, o_orderpriority AS mode_priority
    FROM (
        SELECT o_orderstatus, o_orderpriority,
               row_number() OVER (PARTITION BY o_orderstatus
                                  ORDER BY c DESC, o_orderpriority) AS rn
        FROM counts
    ) WHERE rn = 1 ORDER BY o_orderstatus
    """,
)
def agg_mode(spark, sf_dir):
    """MODE (QueryEngine/AggMode.h:42) — expressed as count+rank with a
    deterministic tie-break (value order), the distributed-safe form; the
    engines' native `mode()` tie-breaking is unspecified."""
    o = T(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("c"), F.col("o_orderpriority")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_orderstatus", F.col("o_orderpriority").alias("mode_priority"))
        .orderBy("o_orderstatus")
    )


@query(
    "agg_sample_any_value",
    oracle="""
    SELECT l_returnflag, min(l_orderkey) AS sample_key
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_sample_any_value(spark, sf_dir):
    """SAMPLE (sqldefs.h:84) — any value from the group. For oracle
    determinism we pin the sampled value to min(); the dialect maps
    SAMPLE() → any_value() in free-form SQL."""
    return (
        T(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.min("l_orderkey").alias("sample_key"))
        .orderBy("l_returnflag")
    )


@query(
    "agg_having",
    oracle="""
    SELECT o_custkey, count(*) AS n_orders
    FROM orders GROUP BY o_custkey
    HAVING count(*) >= 15
    ORDER BY o_custkey
    """,
)
def agg_having(spark, sf_dir):
    """HAVING — filter fused into the Compound agg node (RelAlgDag.h:2328)."""
    return (
        T(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 15)
        .orderBy("o_custkey")
    )


@query(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_extendedprice), 4) AS sd_price,
           round(var_samp(l_quantity), 4) AS var_qty,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
           round(covar_samp(l_quantity, l_extendedprice), 2) AS cov_qp,
           min(l_extendedprice) AS min_price,
           max(l_extendedprice) AS max_price
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_stats(spark, sf_dir):
    """Statistical aggregates (reference ships these via extension fns)."""
    return (
        T(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            r4(F.stddev_samp("l_extendedprice")).alias("sd_price"),
            r4(F.var_samp("l_quantity")).alias("var_qty"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qp"),
            r2(F.covar_samp("l_quantity", "l_extendedprice")).alias("cov_qp"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def agg_rollup(spark, sf_dir):
    """ROLLUP — the reference rejects GROUP BY extensions
    (RelAlgDag.cpp:3305); Spark provides them natively, declared as
    beyond-parity surface."""
    return (
        T(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            r2(F.sum("l_quantity")).alias("sum_qty"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@query(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def agg_cube(spark, sf_dir):
    """CUBE — GROUP BY extension the reference rejects
    (RelAlgDag.cpp:3305); included because Spark provides it free."""
    return (
        T(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


@query(
    "sort_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
)
def sort_topk(spark, sf_dir):
    """B06: ORDER BY + LIMIT → Spark TakeOrderedAndProject (the built-in
    replacement for the reference's SpeculativeTopN / StreamingTopN,
    QueryEngine/SpeculativeTopN.h:57)."""
    return (
        T(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.col("o_orderkey"))
        .limit(100)
    )


@query(
    "sort_limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 50 OFFSET 25
    """,
)
def sort_limit_offset(spark, sf_dir):
    """LIMIT/OFFSET (RelSort offset, RelAlgDag.h:2516; Spark offset 3.4+)."""
    return (
        T(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.col("o_orderkey"))
        .offset(25)
        .limit(50)
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(grouping(l_returnflag) AS INT) AS g_rf,
           CAST(grouping(l_linestatus) AS INT) AS g_ls,
           CAST(sum(CAST(l_quantity AS INT)) AS BIGINT) AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                            (l_returnflag), (l_linestatus), ())
    ORDER BY g_rf, g_ls, l_returnflag NULLS LAST, l_linestatus NULLS LAST
    """,
)
def agg_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS with GROUPING() flags through engine.sql.
    The reference REJECTS GROUP BY extensions at plan build
    (RelAlgDag.cpp:3305 "GROUP BY extensions not supported") even
    though its Calcite front end parses them — SURVEY.md §2.4 includes
    the family anyway because Spark provides it for free, so this is a
    strict superset surface, not parity. The GROUPING() bits
    disambiguate real NULL keys from subtotal rows, and the
    un-annotated ORDER BY exercises the Calcite nulls-HIGH collation
    on the subtotal NULLs."""
    from heavydb_spark.engine import Engine

    eng = Engine(spark).attach(sf_dir)
    return eng.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
               CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
               SUM(CAST(l_quantity AS INT)) AS sum_qty,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), (l_linestatus), ())
        ORDER BY g_rf, g_ls, l_returnflag, l_linestatus
    """)


@query(
    "agg_filter_clause",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS n,
           count(*) FILTER (WHERE o_totalprice > 100000) AS n_big,
           CAST(sum(CAST(o_custkey AS INT))
                FILTER (WHERE o_orderpriority LIKE '1%') AS BIGINT)
               AS cust_urgent,
           round(avg(o_totalprice)
                 FILTER (WHERE o_totalprice > 100000), 4) AS avg_big
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def agg_filter_clause(spark, sf_dir):
    """Aggregate FILTER (WHERE ...) clause through engine.sql — the
    SQL:2003 form Calcite parses for the reference (the executor
    lowers it to conditional aggregation, same as the reference's
    COUNT_IF family, Tests/ExecuteTest.cpp conditional-agg cases).
    Spark and DuckDB both support it natively, so the dialect passes
    it through untouched."""
    from heavydb_spark.engine import Engine

    eng = Engine(spark).attach(sf_dir)
    return eng.sql("""
        SELECT o_orderstatus,
               COUNT(*) AS n,
               COUNT(*) FILTER (WHERE o_totalprice > 100000) AS n_big,
               SUM(CAST(o_custkey AS INT))
                   FILTER (WHERE o_orderpriority LIKE '1%')
                   AS cust_urgent,
               ROUND(AVG(o_totalprice)
                     FILTER (WHERE o_totalprice > 100000), 4) AS avg_big
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """)


@query(
    "agg_hll_sketch_merge",
    oracle="""
    SELECT source,
           CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_exact,
           TRUE AS est_ok
    FROM documents GROUP BY source
    UNION ALL
    SELECT '__ALL__' AS source,
           CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_exact,
           TRUE AS est_ok
    FROM documents
    ORDER BY source
    """,
)
def agg_hll_sketch_merge(spark, sf_dir):
    """Mergeable HLL count-distinct sketches — the fragment-merge
    pattern of the reference's APPROX_COUNT_DISTINCT (per-fragment HLL
    buffers unified across fragments, QueryEngine/HyperLogLog.h:88
    hll_unify; CountDistinctDescriptor.h:39): per-source sketches
    (`hll_sketch_agg`, lgK=12) are persisted as binary columns, UNIONED
    (`hll_union_agg`) instead of rescanning, and estimated. At 100 TB
    this is THE precompute shape — per-partition/day sketches stored
    once, any source/time rollup answered by a k-byte sketch union,
    never a re-scan of the corpus.

    Driver-exact contract: per-source exact distinct counts (oracled),
    plus `est_ok` — the sketch estimate within max(2, 5%) of exact
    (3-sigma for lgK=12 is ~5%) per source AND for the union-of-parts
    and whole-corpus sketches on the __ALL__ row. The estimates
    themselves are engine-specific (Apache DataSketches), so the
    tolerance flag is the portable claim."""
    d = T(spark, sf_dir, "documents")
    key = F.md5("text")
    tol = lambda est, exact: (
        F.abs(est - exact)
        <= F.greatest(F.lit(2.0), F.lit(0.05) * exact)
    )
    parts = d.groupBy("source").agg(
        F.hll_sketch_agg(key, F.lit(12)).alias("sk"),
        F.countDistinct(key).alias("n_exact"),
    )
    per_source = parts.select(
        "source",
        "n_exact",
        tol(F.hll_sketch_estimate("sk"), F.col("n_exact")).alias("est_ok"),
    )
    total = (
        parts.agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk", F.lit(False))).alias(
                "merged_est"
            ),
            F.sum("n_exact").alias("n_sum"),
        )
        .crossJoin(
            d.agg(
                F.hll_sketch_estimate(
                    F.hll_sketch_agg(key, F.lit(12))
                ).alias("whole_est"),
                F.countDistinct(key).alias("n_exact"),
            )
        )
        .select(
            F.lit("__ALL__").alias("source"),
            "n_exact",
            (
                tol(F.col("merged_est"), F.col("n_exact"))
                & tol(F.col("whole_est"), F.col("n_exact"))
            ).alias("est_ok"),
        )
    )
    return per_source.unionByName(total).orderBy("source")


_PIVOT_LANGS = ("de", "en", "es", "fr", "zh")


@query(
    "agg_pivot_matrix",
    oracle="""
    SELECT source,
    """ + ",\n    ".join(
        f"CAST(sum(CASE WHEN lang = '{lg}' THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS {lg}_n,\n    "
        f"round(avg(CASE WHEN lang = '{lg}' THEN n_chars END), 2)"
        f" AS {lg}_chars"
        for lg in _PIVOT_LANGS
    ) + """
    FROM documents GROUP BY source ORDER BY source
    """,
)
def agg_pivot_matrix(spark, sf_dir):
    """PIVOT: the (source x lang) matrix of document counts and mean
    lengths via Spark's native `groupBy().pivot(values).agg()` — with
    the value list EXPLICIT, the pivot compiles to one pass of
    conditional aggregates (exactly the CASE expansion the oracle
    writes out), no second scan, no distinct-values job. The
    wide-matrix report every corpus dashboard starts from; a Spark
    extension beyond the reference's surface (HeavyDB has no PIVOT —
    users write the CASE form; both spellings work here)."""
    d = T(spark, sf_dir, "documents")
    p = (
        d.groupBy("source")
        .pivot("lang", list(_PIVOT_LANGS))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("n_chars"), 2).alias("chars"),
        )
    )
    cols = [F.col("source")]
    for lg in _PIVOT_LANGS:
        # empty pivot cells: count is NULL, the oracle's CASE-sum is 0
        cols.append(
            F.coalesce(F.col(f"{lg}_n"), F.lit(0)).alias(f"{lg}_n")
        )
        cols.append(F.col(f"{lg}_chars"))
    return p.select(*cols).orderBy("source")
