"""Driver-visible invariant checks for the iterative / estimator
operators (the rows-only catalog entries).

The reference's own tests assert invariants for these surfaces rather
than exact values (Tests/SystemTableFunctionsTest.cpp,
Tests/ApproxQuantileTest.cpp). Here each companion query computes the
invariants IN SPARK and emits them as boolean columns; the oracle is
`SELECT true AS ...` — so the driver's hash compare fails the round if
any invariant is ever false. Every invariant below is deterministic:
MLlib fits are seeded, the estimators hash deterministically, and the
mathematical invariants (projection contraction, leaf-mean range,
within-group variance) hold for any fit.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from heavydb_spark.queries.registry import query
from heavydb_spark.queries.util import T


@query(
    "ml_kmeans_invariants",
    oracle="""
    SELECT true AS ids_in_range, true AS four_clusters,
           true AS all_assigned, true AS deterministic_rerun
    """,
)
def ml_kmeans_invariants(spark, sf_dir):
    """kmeans (MLTableFunctions.hpp) invariants as driver-checked
    booleans: every assignment lands in [0, k), all k clusters are
    used, no input row is dropped, and a seeded re-fit reproduces the
    assignment exactly."""
    from heavydb_spark.operators import ml

    e = T(spark, sf_dir, "embeddings")
    a1 = ml.kmeans_fit(e, "embedding", k=4, seed=42).select(
        "vec_id", "cluster_id"
    )
    a2 = ml.kmeans_fit(e, "embedding", k=4, seed=42).select(
        "vec_id", F.col("cluster_id").alias("c2")
    )
    stats = (
        a1.join(a2, "vec_id")
        .agg(
            F.bool_and(
                (F.col("cluster_id") >= 0) & (F.col("cluster_id") < 4)
            ).alias("ids_in_range"),
            (F.count_distinct("cluster_id") == 4).alias("four_clusters"),
            F.bool_and(F.col("cluster_id") == F.col("c2")).alias(
                "deterministic_rerun"
            ),
            F.count(F.lit(1)).alias("n"),
        )
    )
    total = e.agg(F.count(F.lit(1)).alias("t"))
    return stats.crossJoin(total).select(
        "ids_in_range",
        "four_clusters",
        (F.col("n") == F.col("t")).alias("all_assigned"),
        "deterministic_rerun",
    )


@query(
    "ml_pca_invariants",
    oracle="""
    SELECT true AS dim_is_k, true AS projection_contractive,
           true AS variance_ordered
    """,
)
def ml_pca_invariants(spark, sf_dir):
    """PCA (pca_fit / PCA_PROJECT) invariants: output dimension k,
    orthonormal-projection contraction (||P(x-y)|| <= ||x-y|| for
    every sampled pair — holds for ANY orthonormal basis, fit-state
    independent), and explained variance ordered pc1 >= pc2."""
    from heavydb_spark.operators import ml

    e = T(spark, sf_dir, "embeddings")
    proj = ml.pca_project(e, "embedding", k=2).localCheckpoint(eager=False)
    sample = proj.filter(F.col("vec_id") < 40)
    a = sample.select(
        F.col("vec_id").alias("ida"),
        F.col("embedding").alias("va"),
        F.col("pca_arr").alias("pa"),
    )
    b = sample.select(
        F.col("vec_id").alias("idb"),
        F.col("embedding").alias("vb"),
        F.col("pca_arr").alias("pb"),
    )
    pairs = a.join(b, F.col("ida") < F.col("idb"))
    d_orig = F.sqrt(
        F.aggregate(
            F.zip_with(
                "va", "vb", lambda x, y: (x - y) * (x - y)
            ),
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double"),
        )
    )
    d_proj = F.sqrt(
        F.aggregate(
            F.zip_with(
                "pa", "pb", lambda x, y: (x - y) * (x - y)
            ),
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double"),
        )
    )
    contract = pairs.agg(
        F.bool_and(d_proj <= d_orig + F.lit(1e-9)).alias(
            "projection_contractive"
        )
    )
    shape = proj.agg(
        F.bool_and(F.size("pca_arr") == 2).alias("dim_is_k"),
        (
            F.var_samp(F.element_at("pca_arr", 1))
            >= F.var_samp(F.element_at("pca_arr", 2)) - F.lit(1e-9)
        ).alias("variance_ordered"),
    )
    return shape.crossJoin(contract).select(
        "dim_is_k", "projection_contractive", "variance_ordered"
    )


@query(
    "ml_forest_invariants",
    oracle="""
    SELECT true AS preds_in_label_range, true AS rows_preserved,
           true AS r2_nonnegative
    """,
)
def ml_forest_invariants(spark, sf_dir):
    """Tree-regressor (decision_tree_reg_fit + ml_reg_predict)
    invariants: leaf-mean predictions stay inside the training label
    range, one prediction per input row, and training r2 >= 0
    (within-leaf variance never exceeds total variance)."""
    from heavydb_spark.operators.ml import r2_score, tree_reg_fit_predict

    o = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 2000)
        .select(
            F.col("o_custkey").cast("double").alias("f1"),
            F.dayofyear("o_orderdate").cast("double").alias("f2"),
            F.col("o_totalprice").alias("label"),
        )
    )
    pred = tree_reg_fit_predict(
        o, ["f1", "f2"], "label", kind="decision_tree"
    ).localCheckpoint(eager=False)
    bounds = o.agg(
        F.min("label").alias("lo"),
        F.max("label").alias("hi"),
        F.count(F.lit(1)).alias("t"),
    )
    stats = pred.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("prediction").alias("pmin"),
        F.max("prediction").alias("pmax"),
    )
    r2 = r2_score(pred, "label", "prediction")
    return (
        stats.crossJoin(bounds)
        .crossJoin(r2)
        .select(
            (
                (F.col("pmin") >= F.col("lo") - 1e-6)
                & (F.col("pmax") <= F.col("hi") + 1e-6)
            ).alias("preds_in_label_range"),
            (F.col("n") == F.col("t")).alias("rows_preserved"),
            (F.col("r2") >= -1e-6).alias("r2_nonnegative"),
        )
    )


@query(
    "sim_ann_ivf_invariants",
    oracle="""
    SELECT true AS k_rows, true AS scores_exact, true AS scores_sorted
    """,
)
def sim_ann_ivf_invariants(spark, sf_dir):
    """IVF ANN invariants: exactly k results, every returned cosine
    equals an independent exact recomputation for that vec_id (the
    index may choose which vectors to score, but never their scores),
    and results are emitted best-first."""
    from heavydb_spark.operators import similarity
    from heavydb_spark.queries.datapipe import _query_vec

    e = T(spark, sf_dir, "embeddings")
    qvec = _query_vec(spark, sf_dir)
    res = similarity.ann_topk_ivf(
        e.filter(F.col("vec_id") != 0), "embedding", qvec, k=10,
        n_lists=8, nprobe=2,
    ).localCheckpoint(eager=False)
    exact = e.select(
        "vec_id",
        F.round(
            similarity.cosine_similarity(
                F.col("embedding"), similarity._vec_lit(qvec)
            ),
            6,
        ).alias("exact_sim"),
    )
    w = Window.orderBy(F.desc("cos_sim"), "vec_id")
    ordered = res.withColumn("prev", F.lag("cos_sim").over(w))
    sortedness = ordered.agg(
        F.bool_and(
            F.col("prev").isNull() | (F.col("prev") >= F.col("cos_sim"))
        ).alias("scores_sorted")
    )
    joined = res.join(exact, "vec_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.bool_and(F.col("cos_sim") == F.col("exact_sim")).alias(
            "scores_exact"
        ),
    )
    return joined.crossJoin(sortedness).select(
        (F.col("n") == 10).alias("k_rows"), "scores_exact", "scores_sorted"
    )


@query(
    "agg_approx_invariants",
    oracle="""
    SELECT true AS ndv_within_bounds, true AS median_within_bounds,
           true AS p95_within_bounds
    """,
)
def agg_approx_invariants(spark, sf_dir):
    """Estimator invariants, driver-checked: HLL NDV within 5% of the
    exact count (rsd 0.023, deterministic hashing — the error is fixed
    per dataset), and the t-digest-style approximate quantiles land
    between generous exact-rank brackets (accuracy 10000 => rank error
    <= n/10000)."""
    li = T(spark, sf_dir, "lineitem")
    s = li.agg(
        F.approx_count_distinct("l_partkey", rsd=0.023).alias("a_ndv"),
        F.count_distinct("l_partkey").alias("e_ndv"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("a_med"),
        F.percentile_approx("l_extendedprice", 0.95, 10000).alias("a_p95"),
        F.expr("percentile(l_extendedprice, 0.45)").alias("lo_med"),
        F.expr("percentile(l_extendedprice, 0.55)").alias("hi_med"),
        F.expr("percentile(l_extendedprice, 0.93)").alias("lo_p95"),
        F.expr("percentile(l_extendedprice, 0.97)").alias("hi_p95"),
    )
    return s.select(
        (
            F.abs(F.col("a_ndv") - F.col("e_ndv"))
            <= 0.05 * F.col("e_ndv")
        ).alias("ndv_within_bounds"),
        F.col("a_med").between(F.col("lo_med"), F.col("hi_med")).alias(
            "median_within_bounds"
        ),
        F.col("a_p95").between(F.col("lo_p95"), F.col("hi_p95")).alias(
            "p95_within_bounds"
        ),
    )
