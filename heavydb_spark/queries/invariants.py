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
    SELECT true AS k_rows, true AS ids_distinct, true AS scores_exact,
           true AS bounded_by_exact_best
    """,
)
def sim_ann_ivf_invariants(spark, sf_dir):
    """IVF ANN invariants, each falsifiable against the operator's
    contract (a sortedness check on the operator's own orderBy would
    be a tautology): exactly k results with distinct ids; every
    returned cosine equals an independent exact recomputation for that
    vec_id (the index may choose WHICH vectors to score, never their
    scores); and no returned score exceeds the exact global best —
    the probe can miss the best list but can never invent a better
    score."""
    from heavydb_spark.operators import similarity
    from heavydb_spark.queries.datapipe import _query_vec

    e = T(spark, sf_dir, "embeddings")
    qvec = _query_vec(spark, sf_dir)
    res = similarity.ann_topk_ivf(
        e.filter(F.col("vec_id") != 0), "embedding", qvec, k=10,
        n_lists=8, nprobe=2,
    ).localCheckpoint(eager=False)
    exact = e.filter(F.col("vec_id") != 0).select(
        "vec_id",
        F.round(
            similarity.cosine_similarity(
                F.col("embedding"), similarity._vec_lit(qvec)
            ),
            6,
        ).alias("exact_sim"),
    )
    best = exact.agg(F.max("exact_sim").alias("best_sim"))
    joined = res.join(exact, "vec_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("vec_id").alias("nd"),
        F.bool_and(F.col("cos_sim") == F.col("exact_sim")).alias(
            "scores_exact"
        ),
        F.max("cos_sim").alias("ret_best"),
    )
    return joined.crossJoin(best).select(
        (F.col("n") == 10).alias("k_rows"),
        (F.col("nd") == 10).alias("ids_distinct"),
        "scores_exact",
        (F.col("ret_best") <= F.col("best_sim")).alias(
            "bounded_by_exact_best"
        ),
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


@query(
    "ml_pca_fit_invariants",
    oracle="""
    SELECT true AS components_unit_norm, true AS components_orthogonal,
           true AS ev_ordered_and_bounded
    """,
)
def ml_pca_fit_invariants(spark, sf_dir):
    """pca_fit loading-matrix invariants: each component has unit L2
    norm, the two components are orthogonal, and explained variances
    are ordered, non-negative, and sum to <= 1 — properties of ANY
    valid eigendecomposition, independent of convergence details."""
    from heavydb_spark.operators.ml import pca_fit

    e = T(spark, sf_dir, "embeddings")
    fit = pca_fit(e, "embedding", k=2).localCheckpoint(eager=False)
    norms = fit.groupBy("component_idx").agg(
        F.sum(F.col("loading") * F.col("loading")).alias("sq")
    )
    unit = norms.agg(
        F.bool_and(F.abs(F.col("sq") - 1.0) < 1e-6).alias(
            "components_unit_norm"
        )
    )
    c0 = fit.filter(F.col("component_idx") == 0).select(
        "feature_idx", F.col("loading").alias("l0")
    )
    c1 = fit.filter(F.col("component_idx") == 1).select(
        "feature_idx", F.col("loading").alias("l1")
    )
    ortho = (
        c0.join(c1, "feature_idx")
        .agg(F.sum(F.col("l0") * F.col("l1")).alias("dot"))
        .select(
            (F.abs(F.col("dot")) < 1e-6).alias("components_orthogonal")
        )
    )
    ev = fit.groupBy("component_idx").agg(
        F.first("explained_variance").alias("ev")
    )
    evp = ev.groupBy().pivot("component_idx", [0, 1]).sum("ev")
    ev_ok = evp.select(
        (
            (F.col("0") >= F.col("1"))
            & (F.col("1") >= 0)
            & (F.col("0") + F.col("1") <= 1.0 + 1e-9)
        ).alias("ev_ordered_and_bounded")
    )
    return unit.crossJoin(ortho).crossJoin(ev_ok)


@query(
    "ml_var_importance_invariants",
    oracle="""
    SELECT true AS one_row_per_feature, true AS importances_nonneg,
           true AS importances_sum_to_one
    """,
)
def ml_var_importance_invariants(spark, sf_dir):
    """random_forest var_importance invariants: one row per feature,
    every importance >= 0, and MLlib's normalized importances sum to 1
    (the forest always finds at least one informative split on this
    fixture)."""
    from heavydb_spark.operators.ml import forest_var_importance

    o = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 2000)
        .select(
            F.col("o_custkey").cast("double").alias("f1"),
            F.dayofyear("o_orderdate").cast("double").alias("f2"),
            F.month("o_orderdate").cast("double").alias("f3"),
            F.col("o_totalprice").alias("label"),
        )
    )
    imp = forest_var_importance(o, ["f1", "f2", "f3"], "label")
    return imp.agg(
        (F.count(F.lit(1)) == 3).alias("one_row_per_feature"),
        F.bool_and(F.col("importance") >= 0).alias("importances_nonneg"),
        (F.abs(F.sum("importance") - 1.0) < 1e-6).alias(
            "importances_sum_to_one"
        ),
    )


@query(
    "ml_decision_trees_invariants",
    oracle="""
    SELECT true AS tree_count, true AS binary_tree_shape,
           true AS unit_weights
    """,
)
def ml_decision_trees_invariants(spark, sf_dir):
    """get_decision_trees invariants: the forest has exactly num_trees
    members, every tree is a proper binary tree (odd node count,
    num_nodes >= 2^depth... >= depth+1), and random-forest tree weights
    are 1.0."""
    from heavydb_spark.operators.ml import get_decision_trees

    o = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 2000)
        .select(
            F.col("o_custkey").cast("double").alias("f1"),
            F.dayofyear("o_orderdate").cast("double").alias("f2"),
            F.col("o_totalprice").alias("label"),
        )
    )
    trees = get_decision_trees(o, ["f1", "f2"], "label", num_trees=5)
    return trees.agg(
        (F.count(F.lit(1)) == 5).alias("tree_count"),
        F.bool_and(
            (F.col("num_nodes") % 2 == 1)
            & (F.col("num_nodes") >= F.col("depth") + 1)
        ).alias("binary_tree_shape"),
        F.bool_and(F.col("weight") == 1.0).alias("unit_weights"),
    )


@query(
    "tf_raster_slope_path_invariants",
    oracle="""
    SELECT true AS starts_at_origin, true AS ends_at_destination,
           true AS steps_dense, true AS steps_adjacent
    """,
)
def tf_raster_slope_path_invariants(spark, sf_dir):
    """Slope-weighted shortest-path invariants (the Dijkstra itself is
    deterministic but its cost values are float-order sensitive):
    the path starts at the origin bin, ends at the destination bin,
    path_step is dense 1..n, and consecutive cells are 8-neighbors
    (one bin apart in each axis at bin_size 5)."""
    from heavydb_spark.operators.spatial import (
        raster_graph_shortest_slope_weighted_path,
    )

    ev = T(spark, sf_dir, "events")
    pts = ev.select(
        ((F.col("event_id") * 13 % 1000) / 10.0).alias("x"),
        ((F.col("event_id") * 17 % 1000) / 10.0).alias("y"),
        F.col("value").alias("z"),
    )
    path = raster_graph_shortest_slope_weighted_path(
        pts,
        bin_size=5.0,
        origin=(2.5, 2.5),
        destination=(97.5, 97.5),
        slope_weight_exponent=2.0,
        slope_pct_max=2000.0,
    ).localCheckpoint(eager=False)
    w = Window.orderBy("path_step")
    stepped = path.select(
        "path_step",
        "x",
        "y",
        F.lag("x").over(w).alias("px"),
        F.lag("y").over(w).alias("py"),
        F.lag("path_step").over(w).alias("ps"),
    )
    adj = stepped.agg(
        F.bool_and(
            F.col("px").isNull()
            | (
                (F.abs(F.col("x") - F.col("px")) <= 5.0 + 1e-9)
                & (F.abs(F.col("y") - F.col("py")) <= 5.0 + 1e-9)
                & (F.col("path_step") == F.col("ps") + 1)
            )
        ).alias("steps_adjacent"),
        (F.min("path_step") == 1).alias("steps_start_at_one"),
        F.count(F.lit(1)).alias("n"),
        F.max("path_step").alias("mx"),
        F.min_by(F.struct("x", "y"), "path_step").alias("first_cell"),
        F.max_by(F.struct("x", "y"), "path_step").alias("last_cell"),
    )
    return adj.select(
        (
            (F.col("first_cell.x") == 2.5) & (F.col("first_cell.y") == 2.5)
        ).alias("starts_at_origin"),
        (
            (F.col("last_cell.x") == 97.5) & (F.col("last_cell.y") == 97.5)
        ).alias("ends_at_destination"),
        (
            (F.col("mx") == F.col("n")) & F.col("steps_start_at_one")
        ).alias("steps_dense"),
        "steps_adjacent",
    )


@query(
    "ml_model_ddl_tree",
    oracle="""
    SELECT true AS created, true AS pred_in_range,
           true AS train_r2_nonneg, true AS eval_r2_le_1,
           true AS deterministic_refit, true AS dropped
    """,
)
def ml_model_ddl_tree(spark, sf_dir):
    """CREATE MODEL OF TYPE DECISION_TREE_REG / RANDOM_FOREST_REG
    (MLModelType.h:25; options ParserNode.cpp:3594-3688) invariants:

    - a DT fit with no split scores r2 >= 0 on its own training
      relation (leaf means minimize train SSE, so SSE <= SST);
    - forest predictions stay inside the training label range (every
      leaf value is a mean of training labels);
    - any r2 is <= 1 by definition — checked on the held-out slice of
      a DATA_SPLIT_EVAL_FRACTION model;
    - a seeded re-CREATE reproduces predictions exactly;
    - DROP MODEL removes the name from SHOW MODELS.
    """
    from heavydb_spark.engine import Engine

    eng = Engine(spark)
    eng.attach(sf_dir)
    sel = (
        "SELECT l_extendedprice, l_quantity, l_discount "
        "FROM lineitem WHERE l_orderkey < 4000"
    )
    eng.sql(f"CREATE OR REPLACE MODEL __inv_dt OF TYPE DECISION_TREE_REG "
            f"AS {sel} WITH (MAX_TREE_DEPTH=4)")
    train_r2 = eng.sql("EVALUATE MODEL __inv_dt").collect()[0]["r2"]

    eng.sql(f"CREATE OR REPLACE MODEL __inv_rf OF TYPE RANDOM_FOREST_REG "
            f"AS {sel} WITH (NUM_TREES=3, MAX_TREE_DEPTH=4, "
            f"DATA_SPLIT_EVAL_FRACTION=0.25)")
    eval_r2 = eng.sql("EVALUATE MODEL __inv_rf").collect()[0]["r2"]
    scored = eng.sql(
        "SELECT l_extendedprice AS y, "
        "ML_PREDICT('__inv_rf', l_quantity, l_discount) AS p "
        "FROM lineitem WHERE l_orderkey < 4000"
    )
    row = scored.agg(
        F.min("y").alias("lo"), F.max("y").alias("hi"),
        F.min("p").alias("plo"), F.max("p").alias("phi"),
        F.round(F.sum("p"), 4).alias("psum"),
    ).collect()[0]
    pred_in_range = row["plo"] >= row["lo"] and row["phi"] <= row["hi"]

    eng.sql(f"CREATE OR REPLACE MODEL __inv_rf OF TYPE RANDOM_FOREST_REG "
            f"AS {sel} WITH (NUM_TREES=3, MAX_TREE_DEPTH=4, "
            f"DATA_SPLIT_EVAL_FRACTION=0.25)")
    row2 = eng.sql(
        "SELECT round(sum(ML_PREDICT('__inv_rf', l_quantity, l_discount)), 4)"
        " AS psum FROM lineitem WHERE l_orderkey < 4000"
    ).collect()[0]
    deterministic = float(row2["psum"]) == float(row["psum"])

    eng.sql("DROP MODEL __inv_dt")
    eng.sql("DROP MODEL __inv_rf")
    names = {r["model_name"] for r in eng.sql("SHOW MODELS").collect()}
    dropped = "__inv_dt" not in names and "__inv_rf" not in names

    return spark.createDataFrame(
        [(
            True,
            bool(pred_in_range),
            bool(train_r2 >= 0.0),
            bool(eval_r2 <= 1.0),
            bool(deterministic),
            bool(dropped),
        )],
        "created boolean, pred_in_range boolean, train_r2_nonneg boolean,"
        " eval_r2_le_1 boolean, deterministic_refit boolean, dropped boolean",
    )


@query(
    "ml_model_ddl_pca",
    oracle="""
    SELECT true AS unit_norm_components, true AS orthogonal_components,
           true AS ev_in_unit_range, true AS ev_nonincreasing,
           true AS ev_sums_le_one, true AS deterministic_refit,
           true AS evaluate_rejected
    """,
)
def ml_model_ddl_pca(spark, sf_dir):
    """CREATE MODEL OF TYPE PCA (MLModelType.h:25) invariants on the
    fitted loading matrix: component vectors are unit-norm and mutually
    orthogonal, explained variance is a non-increasing sequence in
    [0,1] summing to <= 1, a re-fit is bit-identical, and EVALUATE
    MODEL (a regression metric) rejects PCA models."""
    import math

    from heavydb_spark.dialect import MODELS
    from heavydb_spark.engine import Engine

    eng = Engine(spark)
    eng.attach(sf_dir)
    sel = (
        "SELECT l_quantity, l_discount, l_tax FROM lineitem "
        "WHERE l_orderkey < 4000"
    )
    eng.sql(f"CREATE OR REPLACE MODEL __inv_pca OF TYPE PCA AS {sel}")
    m = MODELS["__inv_pca"]
    nfeat = len(m.loadings)
    k = len(m.loadings[0])
    comps = [[m.loadings[f][c] for f in range(nfeat)] for c in range(k)]
    unit = all(
        abs(math.sqrt(sum(v * v for v in comp)) - 1.0) < 1e-6
        for comp in comps
    )
    ortho = all(
        abs(sum(a * b for a, b in zip(comps[i], comps[j]))) < 1e-6
        for i in range(k)
        for j in range(i + 1, k)
    )
    ev = m.explained_variance
    ev_range = all(-1e-9 <= v <= 1.0 + 1e-9 for v in ev)
    ev_sorted = all(ev[i] >= ev[i + 1] - 1e-9 for i in range(len(ev) - 1))
    ev_sum = sum(ev) <= 1.0 + 1e-6

    eng.sql(f"CREATE OR REPLACE MODEL __inv_pca OF TYPE PCA AS {sel}")
    m2 = MODELS["__inv_pca"]
    deterministic = (
        m2.loadings == m.loadings
        and m2.explained_variance == m.explained_variance
    )
    try:
        eng.sql("EVALUATE MODEL __inv_pca")
        rejected = False
    except ValueError:
        rejected = True
    eng.sql("DROP MODEL __inv_pca")
    return spark.createDataFrame(
        [(
            bool(unit), bool(ortho), bool(ev_range), bool(ev_sorted),
            bool(ev_sum), bool(deterministic), bool(rejected),
        )],
        "unit_norm_components boolean, orthogonal_components boolean,"
        " ev_in_unit_range boolean, ev_nonincreasing boolean,"
        " ev_sums_le_one boolean, deterministic_refit boolean,"
        " evaluate_rejected boolean",
    )


@query(
    "sim_semantic_kmeans_invariants",
    oracle="""
    SELECT true AS all_ids_once, true AS originals_kept,
           true AS planted_dropped_to_source, true AS dup_of_lower
    """,
)
def sim_semantic_kmeans_invariants(spark, sf_dir):
    """semantic_dedup_kmeans invariants, each falsifiable against the
    operator's contract: every input id appears exactly once; no
    original (vec_id < 1000) is dropped (natural max cosine in the
    fixture ~0.51 < 0.9); every planted copy is dropped toward EXACTLY
    its source (identical vectors share every centroid distance, hence
    the cluster — and the only >=0.9 neighbor of v+1000 is v), with
    max_cos >= 0.9; and every dup_of is a strictly lower id."""
    from heavydb_spark.operators import similarity

    e = T(spark, sf_dir, "embeddings")
    base = e.filter(F.col("vec_id") < 50).select("vec_id", "embedding")
    dup = base.select(
        (F.col("vec_id") + 1000).alias("vec_id"), F.col("embedding")
    )
    res = similarity.semantic_dedup_kmeans(
        base.unionByName(dup), "embedding", "vec_id",
        threshold=0.9, n_lists=4,
    ).localCheckpoint(eager=False)
    planted = res.filter(F.col("vec_id") >= 1000)
    return res.agg(
        (
            (F.count(F.lit(1)) == 100)
            & (F.count_distinct("vec_id") == 100)
        ).alias("all_ids_once"),
        F.bool_and(
            F.when(F.col("vec_id") < 1000,
                   F.col("kept") & F.col("dup_of").isNull())
            .otherwise(F.lit(True))
        ).alias("originals_kept"),
        F.bool_and(
            F.when(
                F.col("vec_id") >= 1000,
                (~F.col("kept"))
                & (F.col("dup_of") == F.col("vec_id") - 1000)
                & (F.col("max_cos") >= 0.9),
            ).otherwise(F.lit(True))
        ).alias("planted_dropped_to_source"),
        F.bool_and(
            F.when(F.col("dup_of").isNotNull(),
                   F.col("dup_of") < F.col("vec_id"))
            .otherwise(F.lit(True))
        ).alias("dup_of_lower"),
    )
