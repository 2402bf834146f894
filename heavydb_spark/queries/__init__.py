"""Query catalog — every operator class from SURVEY.md §2 as a named query.

Each entry pairs a Spark DataFrame builder `(spark, sf_dir) -> DataFrame`
with (where SQL-expressible) an ANSI-SQL oracle string DuckDB runs on the
same parquet — the DuckDB analogue of the reference's SQLiteComparator
pattern (Tests/ExecuteTest.cpp:314). `__spark_entry__.py` exposes this
registry to the verify driver.

Conventions:
- every computed column is aliased identically in Spark and oracle SQL;
- floating aggregates are rounded (2dp sums, 4dp avgs) on BOTH sides so
  cross-engine FP summation order can't flip the value hash;
- results carry a deterministic ORDER BY-able key set (no ties).
"""

from __future__ import annotations

from heavydb_spark.queries.registry import ORACLES, QUERIES, query  # noqa: F401

# Import for side effect: each module registers its queries.
from heavydb_spark.queries import (  # noqa: F401,E402
    core,
    aggregates,
    joins,
    windows,
    setops,
    scalar_functions,
    tablefuncs,
    datapipe,
    streaming_batch,
    extended,
    tpch,
    invariants,
)

# ---------------------------------------------------------------------------
# Registration-order priority.
#
# The verify driver correctness-checks queries in registration order with a
# bounded budget (~50 per round).  The union of the r1-r3 windows covered all
# 135 pre-r4 queries with zero outstanding failures, so round 4 front-loads:
# (1) every query ADDED this round (geo/point-cloud/obj-detect/pipeline/
# TPC-H+DS/stream/portable-sketch/invariant additions), (2) queries that
# GRADUATED from rows-only to exact oracles, (3) everything whose code was
# touched this round, then the remaining rows-only rotation and a per-family
# green regression slice (those roll into the r5 window).
# ---------------------------------------------------------------------------
_PRIORITY = [
    # --- round-4 additions (never driver-verified) ---
    "geo_geos_union_diff",
    "geo_geos_convexhull",
    "geo_geos_concavehull",
    "geo_multipolygon_props",
    "geo_transform_utm",
    "tf_point_cloud_metadata",
    "tf_load_point_cloud",
    "tf_torch_obj_detect",
    "pipe_end_to_end_corpus",
    "dedup_simhash_portable",
    "dedup_minhash_portable",
    "sim_ann_lsh",               # graduated: seeded-hyperplane exact oracle
    "tf_generate_random_strings",  # graduated: portable-LCG exact oracle
    "ml_dbscan",                 # graduated: closed-form blob oracle
    "ml_kmeans_invariants",
    "ml_pca_invariants",
    "ml_forest_invariants",
    "sim_ann_ivf_invariants",
    "agg_approx_invariants",
    "ml_pca_fit_invariants",
    "ml_var_importance_invariants",
    "ml_decision_trees_invariants",
    "tf_raster_slope_path_invariants",
    # --- code-touched in round 4 — re-verify ---
    "pipe_mix_sources",          # now weights real fixture sources (non-vacuous)
    "sim_embedding_neardup",     # planted duplicates + exact oracle (was rows-only)
    "window_lag_lead_in_frame",  # collect_list emulation -> O(1) lag/lead
    "join_multistep_tpch_q7",    # pre-pushed one-sided nation filters
    "pipe_pack_sequences",       # group-column type derived from schema
    "tf_raster_slope_path",      # driver-materialization cell cap
    "sql_dialect_window_fill",   # dialect window-rewrite module touched
    "tpch_q2_min_cost_supplier",
    "tpch_q4_priority_exists",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q11_important_value",
    "tpch_q12_priority_class",
    "tpch_q13_order_distribution",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_cnt",
    "tpch_q17_small_qty_revenue",
    "tpch_q18_large_orders",
    "tpch_q19_disjunctive_join",
    "tpch_q20_nested_in",
    "tpch_q21_waiting_supplier",
    "tpch_q22_global_sales",
    "stream_interval_join_outer",
    "stream_interval_join_full",
    "pipe_dedup_keep_best",
    "tpcds_q36_hierarchy_rank",
    "tpcds_cross_channel",
    "tpcds_q51_cumulative_join",
    "tpcds_q88_band_counts",
    "text_repetition",
    "subquery_correlated_scalar",
    "subquery_not_in_nulls",
    "dml_update_correlated_postimage",
    # --- rows-only rotation: every sketch/iterative query re-recorded
    # this round (invariant value-tests live in tests/test_operators.py:
    # kmeans cluster consistency, dbscan density, pca distances,
    # var_importance simplex, planted-dup recovery) ---
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sim_ann_ivf",
    "ml_kmeans",
    "ml_pca_project",
    "ml_pca_fit",
    "ml_var_importance",
    "ml_decision_trees",
    "ml_forest_predict",
    # --- regression slice: one green representative per family ---
    "pricing_summary",
    "scan_project_filter",
    "join_star_agg",
    "join_multistep_tpch_q3",
    "join_multistep_tpch_q5",
    "join_multistep_tpch_q10",
    "agg_groupby_multicol",
    "agg_count_if_sum_if",
    "window_moving_avg",
    "window_forward_fill",
    "window_conditional_change_event",
    "union_distinct",
    "fn_datetime",
    "fn_decimal",
    "fn_string_extra",
    "sim_cosine_topk",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_connected_components",
    "pipe_decontaminate",
    "pipe_sample_stratified",
    "pipe_pii_scrub",
    "pipe_dictionary_encode",
    "text_quality",
    "text_lang_id",
    "mm_frame_sample",
    "geo_polygon_contains_join",
    "geo_bbox_join",
    "geo_accessors_distance",
    "tf_cross_section_2d",
    "tf_mandelbrot",
    "ml_linear_reg2",
    "stream_interval_join",
    "stream_sliding_window",
    "dml_update_postimage",
]


def _reorder() -> None:
    known = [n for n in _PRIORITY if n in QUERIES]
    rest = [n for n in QUERIES if n not in set(known)]
    order = known + rest
    for mapping in (QUERIES, ORACLES):
        snapshot = dict(mapping)
        mapping.clear()
        mapping.update(
            {n: snapshot[n] for n in order if n in snapshot}
        )


_reorder()
