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
# bounded budget (~50 per round).  r1-r5 union: all 193 pre-r6 queries
# driver-checked at least once, 2 reds (HUGEINT-fragile oracles, fixed in
# r6).  Round-6 window composition, per the r5 verdict:
#   1-2  the two r5 reds with their driver-robust (BIGINT-cast) oracles;
#   3-10 the r6 additions (int-division dialect closeout, TPC-DS
#        q67/q64/q49/q38, datum shifts, grouping sets, FILTER clause);
#   11-18 the late-r6 additions (shared-run / semantic / classifier /
#        perplexity pipeline ops, TPC-DS q1/q93, model-filter chain) —
#        never driver-checked, so they must sit inside the window;
#   19-30 the end-of-r6 additions (span rewrite, temperature mixing,
#        vocab/tf-idf/overlap analytics, TPC-DS q23/q95, BPE train +
#        first-merge contract) — never driver-checked, same rule; they
#        push the tail of the r1-stale block (~9 window_* entries,
#        re-greened by family representatives in r5) out to round 7;
#   then the final-session r6 additions (BM25 / chunking / hybrid
#        retrieval, HLL sketch rollup, TPC-DS q59, Z-order layout,
#        as-of join) — never driver-checked; with these the
#        never-checked block slightly overflows a 50-query window, so
#        its tail plus the whole r1-stale block rotate to round 7;
#   then every query whose last driver check was ROUND 1 — all 29 predate
#        the r4/r5 global dialect changes (null collation, quoted
#        identifiers, now int division) and several go through Engine.sql
#        with un-annotated ORDER BYs (sort_topk, agg_groupby_*, subquery_*);
#   then r2-checked queries up to the ~50 budget (dedup/fn_*/geo slice
#        doubles as the rows-only rotation for dedup_simhash);
#   past the window: remaining r2/r3-checked stale queries first so an
#        over-budget driver keeps eating staleness, then the r4/r5 greens.
# ---------------------------------------------------------------------------
_PRIORITY = [
    # --- the two r5 reds, oracles now HUGEINT-free (verdict item 1) ---
    "pipe_corpus_report",
    "pipe_mix_token_budget",
    # --- round-6 additions ---
    "sql_dialect_int_division",   # C-style int/int division closeout
    "tpcds_q67_rollup_rank",      # ROLLUP + rank over grouping levels
    "tpcds_q64_cross_year_sales", # wide multi-CTE self-join
    "geo_transform_datum",        # Helmert datum shifts (OSGB36/ED50)
    "agg_grouping_sets",          # explicit GROUPING SETS + GROUPING()
    "tpcds_q49_ranked_returns",   # dual-ranked worst-return items
    "tpcds_q38_triple_intersect", # INTERSECT-chain channel overlap
    "agg_filter_clause",          # SQL:2003 FILTER (WHERE ...) aggregates
    "dedup_shared_run",           # exact-substring shared-run dedup
    "sim_semantic_dedup",         # SemDeDup-shaped semantic dedup
    "text_quality_classifier",    # hashed-linear quality classifier
    "tpcds_q1_returns_above_avg", # correlated group-average returns
    "tpcds_q93_net_after_returns",# returns-adjusted net sales
    "text_lm_perplexity",         # bigram-LM perplexity filter
    "pipe_model_filter_chain",    # composed model-based curation chain
    "sim_semantic_dedup_kmeans",  # paper-faithful SemDeDup (rows-only)
    "sim_semantic_kmeans_invariants",  # its exact contract companion
    "pipe_dsir_select",           # DSIR target-domain data selection
    "dedup_span_rewrite",         # ExactSubstr span-removal corpus edit
    "pipe_mix_temperature",       # q_s ∝ n_s^alpha temperature mixing
    "text_ngram_vocab",           # Zipf-head bigram vocabulary report
    "text_tfidf_topterms",        # per-doc tf-idf keyword extraction
    "pipe_source_overlap",        # cross-source shingle-overlap matrix
    "tpcds_q23_frequent_best",    # frequent-items x best-customers CTEs
    "tpcds_q95_returned_multi_supplier",  # double-EXISTS decorrelation
    "text_bpe_first_merge",       # BPE round-1 contract (exact oracle)
    "text_bpe_train",             # iterative BPE trainer (rows-only)
    "pipe_shard_assign",          # deterministic loader sharding
    "sim_label_centroids",        # per-label embedding coherence QA
    "text_gopher_filter",         # Gopher-rule composite doc filter
    "pipe_curation_v2",           # gopher→span-rewrite→mix→shard chain
    "dedup_boilerplate_segments", # CCNet repeated-segment removal edit
    "text_bpe_encode_contract",   # BPE merge-application exact contract
    "text_bpe_encode",            # trained-merge corpus encode (rows-only)
    "text_bpe_encode_invariants", # its algebraic contract companion
    "tpcds_q17_quantity_variability",  # CV from exact moment sums
    "tpcds_q34_frequent_buyer_band",   # HAVING-band then dim join-back
    "sim_scalar_quantize",        # SQ8 embedding codec + quality report
    "sim_pq_encode",              # PQ codes + recon report (rows-only)
    "sim_pq_invariants",          # PQ algebraic contract companion
    "pipe_tokenize_pack",         # BPE-count packing chain (exact oracle)
    "sql_dialect_geo_predicates", # reference-name geo/render closeouts
    "text_heavy_hitters",         # MG two-pass exact top-k + certificate
    "sim_ann_ivfpq",              # IVF-PQ composite ANN (rows-only)
    "sim_ann_ivfpq_invariants",   # its planted-copy/subset contract
    "pipe_epoch_oversample",      # fractional-epoch recipe replication
    "text_bm25_topk",             # Okapi BM25 ranked retrieval
    "text_chunk_windows",         # overlapping token-window chunking
    "sim_hybrid_retrieval",       # BM25 recall -> cosine rerank
    "agg_hll_sketch_merge",       # mergeable HLL sketch rollup
    "tpcds_q59_wow_ratio",        # week-over-week CTE self-join
    "geo_zorder_layout",          # Morton-clustered fragment layout
    "join_asof_backward",         # as-of join via union+window
    "join_fuzzy_names",           # edit-distance join, delete-1 blocking
    "pipe_weighted_sample",       # A-ES weighted sample w/o replacement
    "pipe_winsorize",             # per-group exact-percentile clamp
    "agg_pivot_matrix",           # native PIVOT, explicit value list
    "text_source_divergence",     # per-source unigram KL drift monitor
    "pipe_split_no_leakage",      # cluster-routed train/val/test split
    "tpcds_q78_channel_ratio",    # returns-excluded FULL-JOIN ratio
    "tpcds_q72_followup_orders",  # date-band residual equi-join
    # --- last checked r1 (predates all global dialect changes) ---
    "sort_topk",
    "agg_groupby_avg",
    "agg_groupby_count",
    "agg_groupby_highcard",
    "agg_having",
    "agg_count_star",
    "agg_count_distinct",
    "agg_approx_count_distinct",
    "agg_approx_percentile",
    "agg_exact_median",
    "agg_mode",
    "agg_stats",
    "agg_sample_any_value",
    "agg_rollup",
    "agg_cube",
    "distinct_projection",
    "subquery_scalar",
    "subquery_in_select",
    "subquery_correlated_exists",
    "join_anti",
    "join_semi",
    "join_left_outer",
    "join_multi_key",
    "join_null_safe",
    "join_range_qual",
    "window_lag_lead",
    "window_running_sum",
    "window_ntile_firstlast",
    "window_row_number_topn",
    "window_conditional_change_event",
    # --- last checked r2, filling the ~50 budget ---
    "fn_string_basic",
    "fn_string_regex",
    "fn_string_distance",
    "fn_math",
    "fn_cast_trycast",
    "fn_datetime_week_variants",
    "fn_array_ops",
    "fn_unnest_explode",
    "fn_json_value",
    "fn_encode_hash",
    "fn_udaf_geomean",
    "like_regexp_filter",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "geo_bbox_join",
    "geo_point_distance",
    # --- past the window: remaining stale r2/r3 before any r4/r5 green ---
    "geo_polygon_contains_join",
    "geo_polygon_props",
    "geo_range_join",
    "intersect_keys",
    "except_keys",
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
    "dedup_connected_components",
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
