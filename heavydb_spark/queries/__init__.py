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
)

# ---------------------------------------------------------------------------
# Registration-order priority.
#
# The verify driver correctness-checks queries in registration order with a
# bounded budget (round 1: exactly the first 50).  Round 1 proved the first
# 50 families green, so round 2 front-loads one representative per
# PREVIOUSLY-UNVERIFIED operator family (scalar functions, table functions,
# data-pipeline, streaming, ML, geo, DML) plus the two queries whose oracle
# types were fixed this round; near-duplicate variants and round-1-green
# queries follow.  Between rounds the union of CORRECTNESS_r*.json rows then
# covers every family in SURVEY.md §2.
# ---------------------------------------------------------------------------
_PRIORITY = [
    # --- round-3 additions (never driver-verified) ---
    "pipe_decontaminate",
    "pipe_sample_stratified",
    "pipe_mix_sources",
    "pipe_pii_scrub",
    "pipe_pack_sequences",
    "pipe_dictionary_encode",
    "tf_raster_slope_path",
    "tf_cross_section_2d",
    "tf_raster_contour_bands",
    "tf_mandelbrot",
    "ml_linear_reg2",
    "ml_var_importance",
    "ml_decision_trees",
    "ml_pca_fit",
    "geo_accessors_distance",
    "stream_interval_join",
    "join_multistep_tpch_q10",
    "join_multistep_tpch_q7",
    # changed this round (fact-centric rewrite) — re-verify
    "join_multistep_tpch_q5",
    # --- registered in r1/r2 but never inside the driver window ---
    "geo_wkt_roundtrip",
    "geo_transform_900913",
    "geo_linestring_props",
    "geo_polygon_intersects",
    "geo_grid_join",
    "fn_string_extra",
    "dedup_fingerprint",
    "sim_ann_lsh",
    "sim_embedding_neardup",
    "text_quality",
    "mm_frame_sample",
    "tf_feature_query_similarity",
    "stream_sliding_window",
    "ml_kmeans",
    "ml_pca_project",
    "tf_generate_random_strings",
    "ml_forest_predict",
    "ml_dbscan",
    "tf_raster_contour",
    # --- regression slice: one green representative per family ---
    "pricing_summary",
    "scan_project_filter",
    "join_star_agg",
    "join_multistep_tpch_q3",
    "agg_groupby_multicol",
    "agg_count_if_sum_if",
    "window_moving_avg",
    "window_forward_fill",
    "union_distinct",
    "fn_datetime",
    "fn_decimal",
    "dedup_minhash_lsh",
    "sim_cosine_topk",
    "geo_polygon_contains_join",
    "dml_update_postimage",
    "sql_dialect_window_fill",
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
