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
    # oracle-type fixes from round 1 (re-verify the hash now matches)
    "like_regexp_filter",
    "agg_count_if_sum_if",
    # set operations (after union_all, driver-unverified in r1)
    "union_distinct",
    "intersect_keys",
    "except_keys",
    # scalar function families
    "fn_string_basic",
    "fn_string_regex",
    "fn_string_distance",
    "fn_datetime",
    "fn_datetime_week_variants",
    "fn_math",
    "fn_cast_trycast",
    "fn_json_value",
    "fn_encode_hash",
    "fn_array_ops",
    "fn_unnest_explode",
    "fn_udaf_geomean",
    "fn_decimal",
    # table functions
    "tf_generate_series",
    "tf_generate_series_ts",
    "tf_dwell_times",
    "tf_feature_similarity",
    "tf_graph_shortest_paths",
    "tf_geo_rasterize",
    "tf_cross_section_1d",
    # training-data pipeline
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sim_cosine_topk",
    "sim_ann_ivf",
    "text_token_stats",
    "text_lang_id",
    "mm_media_features",
    "llm_transform_template",
    # streaming (batch-form oracles)
    "stream_tumbling_window",
    "stream_session_window",
    "stream_dedup_events",
    # ML table functions
    "ml_linear_reg",
    "ml_r2_score",
    # geo
    "geo_point_distance",
    "geo_bbox_join",
    "geo_range_join",
    "geo_polygon_props",
    "geo_polygon_contains_join",
    # DML post-images (delete NULL-predicate fix this round)
    "dml_update_postimage",
    "dml_delete_postimage",
    # SQL-dialect-routed query (engine.sql path)
    "sql_dialect_window_fill",
    # round-2 additions: new operator families first seen this round
    "dedup_connected_components",
    "tf_geo_rasterize_slope",
    # remaining new geo variants (same family as geo_polygon_props;
    # verified if the driver budget extends past 50)
    "geo_wkt_roundtrip",
    "geo_transform_900913",
    "geo_linestring_props",
    "geo_polygon_intersects",
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
