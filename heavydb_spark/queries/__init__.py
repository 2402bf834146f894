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
# The verify driver correctness-checks queries in registration order
# with a bounded budget (~50 per round).  Driver union r1-r7: 254/254
# — every catalog entry has sat in a window at least once.  The r7
# verdict orders rounds 8-9 as pure staleness-debt retirement (zero
# net-new queries); this list commits BOTH window compositions:
#
# ROUND-8 WINDOW (positions 1-50) — r7 verdict task #1:
#   1-39  every entry whose last driver check was ROUND 2 — all
#         predate the r4-r6 global dialect changes (null collation,
#         quoted identifiers, int division).  tf_generate_series /
#         tf_generate_series_ts also regression-cover the r8
#         balanced-paren rewrite of TABLE(generate_series(...)).
#   40-50 the 11 first r3-checked entries in registration order.
#   Pre-verified with scripts/replay_window.py 50 /root/testdata/sf0.01
#   before round-end (the r7 pre-verification recipe): 47 hash-green +
#   3 rows-only-by-design, 0 fails — re-run clean against the final
#   r8 code after the dialect fixpoint change.
#
# ROUND-9 WINDOW (positions 51-100) — r7 verdict task #2:
#   51-81  the remaining 31 r3-checked entries;
#   82-83  the r8 regression slice: sim_ann_ivfpq +
#          sim_ann_ivfpq_invariants (residual=True became the
#          ann_topk_ivfpq default in r8 — the only r8 behavior change
#          to already-green catalog queries; both pre-verified at
#          sf0.01 in r8);
#   84-100 the 17 oldest r4-checked entries in registration order.
#   ALSO pre-verified in r8 (replay_window.py 100 at sf0.01 came back
#   90 green + 10 rows-only, 0 fails across the full first 100 — both
#   windows ship pre-checked).  After r9 completes, no catalog entry's
#   last driver check predates ROUND 4, and every r7/r8-touched query
#   has a post-change check.
#
# Past position 100: the remaining r4-checked entries, then r5/r6/r7
# greens freshest-last in registration order (an over-budget driver
# keeps eating staleness in age order).
# ---------------------------------------------------------------------------
_PRIORITY = [
    # --- ROUND-8 WINDOW: the 39 r2-checked entries ---
    "dedup_connected_components",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "except_keys",
    "fn_array_ops",
    "fn_cast_trycast",
    "fn_datetime_week_variants",
    "fn_encode_hash",
    "fn_json_value",
    "fn_math",
    "fn_udaf_geomean",
    "fn_unnest_explode",
    "geo_bbox_join",
    "geo_point_distance",
    "geo_polygon_contains_join",
    "geo_polygon_props",
    "geo_range_join",
    "intersect_keys",
    "like_regexp_filter",
    "llm_transform_template",
    "ml_linear_reg",
    "ml_r2_score",
    "mm_media_features",
    "sim_ann_ivf",
    "sim_cosine_topk",
    "stream_dedup_events",
    "stream_session_window",
    "stream_tumbling_window",
    "text_lang_id",
    "text_token_stats",
    "tf_cross_section_1d",
    "tf_dwell_times",
    "tf_feature_similarity",
    "tf_generate_series",
    "tf_generate_series_ts",
    "tf_geo_rasterize",
    "tf_geo_rasterize_slope",
    "tf_graph_shortest_paths",
    # --- ROUND-8 WINDOW: the 11 first r3-checked entries ---
    "agg_count_if_sum_if",
    "agg_groupby_multicol",
    "dedup_fingerprint",
    "dedup_minhash_lsh",
    "fn_datetime",
    "fn_decimal",
    "fn_string_extra",
    "geo_accessors_distance",
    "geo_grid_join",
    "geo_linestring_props",
    "geo_polygon_intersects",
    # --- ROUND-9 WINDOW: the remaining 31 r3-checked entries ---
    "geo_transform_900913",
    "geo_wkt_roundtrip",
    "join_multistep_tpch_q10",
    "join_multistep_tpch_q3",
    "join_multistep_tpch_q5",
    "join_star_agg",
    "ml_decision_trees",
    "ml_forest_predict",
    "ml_kmeans",
    "ml_linear_reg2",
    "ml_pca_fit",
    "ml_pca_project",
    "ml_var_importance",
    "mm_frame_sample",
    "pipe_decontaminate",
    "pipe_dictionary_encode",
    "pipe_pii_scrub",
    "pipe_sample_stratified",
    "pricing_summary",
    "scan_project_filter",
    "stream_interval_join",
    "stream_sliding_window",
    "text_quality",
    "tf_cross_section_2d",
    "tf_feature_query_similarity",
    "tf_mandelbrot",
    "tf_raster_contour",
    "tf_raster_contour_bands",
    "union_distinct",
    "window_forward_fill",
    "window_moving_avg",
    # --- ROUND-9 WINDOW: r8 regression slice (residual default) ---
    "sim_ann_ivfpq",
    "sim_ann_ivfpq_invariants",
    # --- ROUND-9 WINDOW: the 17 oldest r4-checked entries ---
    "agg_approx_invariants",
    "geo_geos_concavehull",
    "geo_geos_convexhull",
    "ml_decision_trees_invariants",
    "ml_forest_invariants",
    "ml_kmeans_invariants",
    "ml_pca_fit_invariants",
    "ml_pca_invariants",
    "ml_var_importance_invariants",
    "pipe_dedup_keep_best",
    "sim_ann_ivf_invariants",
    "stream_interval_join_full",
    "stream_interval_join_outer",
    "tf_raster_slope_path_invariants",
    "tpcds_q36_hierarchy_rank",
    "tpch_q11_important_value",
    "tpch_q12_priority_class",
    # --- past the window: remaining r4-checked (age order) ---
    "tpch_q13_order_distribution",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_cnt",
    "tpch_q17_small_qty_revenue",
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
