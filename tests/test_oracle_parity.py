"""Oracle parity: every catalog query with an oracle must hash-match
DuckDB on the same parquet — the SQLiteComparator pattern
(Tests/ExecuteTest.cpp:314) with DuckDB.

This is the same check the verify driver runs at sf0.01; running it
in-repo at sf0.001 keeps the loop fast.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR, compare_query


def _oracle_names():
    from heavydb_spark.queries import ORACLES

    return sorted(ORACLES)


@pytest.mark.parametrize("name", _oracle_names())
def test_oracle_parity(spark, ddb, name):
    compare_query(spark, ddb, name, SF_DIR)


def test_all_queries_run(spark):
    """Queries without an oracle still must execute and return rows>=0
    with a stable schema — and (r6 verdict) their RESULT projection
    must not contain array/struct-typed columns either: the driver's
    rows-only canon pandas-sorts the result and dies on unhashable
    lists (the r6 `sim_pq_encode` ERR)."""
    from tests.conftest import spark_type_class

    from heavydb_spark.queries import ORACLES, QUERIES

    for name, fn in QUERIES.items():
        if name in ORACLES:
            continue
        df = fn(spark, SF_DIR)
        assert df.columns, name
        nested = [
            f.name for f in df.schema.fields
            if spark_type_class(f.dataType) == "nested"
        ]
        assert not nested, (
            f"{name}: rows-only result has array/struct column(s) "
            f"{nested} — the driver canon crashes on these"
        )
        assert df.count() >= 0, name


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 40


# FIXTURES.md §3 config looping: the reference runs every query on CPU
# AND GPU device types (ExecuteTest.cpp:608); our analogue is config
# axes that change the physical execution — codegen off forces the
# interpreted path, AQE off forces static planning. A representative
# slice (one query per operator family) reruns under each.
CONFIG_SLICE = [
    "pricing_summary", "join_star_agg", "window_range_interval",
    "agg_mode", "fn_datetime", "union_distinct", "subquery_scalar",
    "dedup_exact", "text_quality", "geo_bbox_join",
    # r7 widening: one representative per family added since the slice
    # was drawn — physical plans for these differ most under AQE-off
    # (static join/shuffle planning) and codegen-off (interpreted
    # Expand/window/HOF paths)
    "join_asof_backward", "join_fuzzy_names", "agg_grouping_sets",
    "agg_pivot_matrix", "agg_hll_sketch_merge", "pipe_winsorize",
    "pipe_weighted_sample", "dedup_span_rewrite",
]


@pytest.mark.parametrize("conf,value", [
    ("spark.sql.codegen.wholeStage", "false"),
    ("spark.sql.adaptive.enabled", "false"),
])
@pytest.mark.parametrize("name", CONFIG_SLICE)
def test_oracle_parity_config_loop(spark, ddb, conf, value, name):
    old = spark.conf.get(conf)
    spark.conf.set(conf, value)
    try:
        compare_query(spark, ddb, name, SF_DIR)
    finally:
        spark.conf.set(conf, old)


@pytest.mark.parametrize("name", _oracle_names())
def test_oracle_result_types_driver_safe(ddb, name):
    """Guard against driver-fragile oracle result types (r5 verdict #2):
    DuckDB promotes sum(INTEGER) to HUGEINT (INT128), which external
    harnesses canonicalize differently than BIGINT (e.g. Arrow fetch
    -> float64 -> "700.0" vs Spark's "700").  No oracle result column
    may be HUGEINT — cast aggregate sums to BIGINT in the oracle SQL."""
    from heavydb_spark.queries import ORACLES

    rel = ddb.sql(ORACLES[name])
    bad = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if str(t).upper() in ("HUGEINT", "INT128", "UHUGEINT")
    ]
    assert not bad, (
        f"{name}: oracle emits driver-fragile column types {bad}; "
        "CAST(... AS BIGINT) in the oracle SQL"
    )


def test_canonical_is_driver_faithful():
    """The local canon must predict driver hashes (r6 verdict #7): the
    r6 `sql_dialect_int_division` red shipped because the old local
    canon formatted floats to fixed 6 decimals, which happened to equal
    a DECIMAL(29,6)'s string — Decimal('0.800000') vs 0.8 compared
    equal locally while the driver's pandas canon hashed them apart."""
    from decimal import Decimal

    from tests.conftest import canonical

    assert canonical([[Decimal("0.800000")]]) != canonical([[0.8]])
    # same-class, same-scale decimals still canonicalize equal
    assert canonical([[Decimal("0.80")]]) == canonical([[Decimal("0.80")]])
    # float tolerance (6-digit rounding) is preserved
    assert canonical([[0.8000000001]]) == canonical([[0.8]])


def test_priority_names_all_registered():
    """Every name in the registration-priority list must exist in the
    catalog — a rename would otherwise silently drop a family out of
    the driver's bounded correctness window."""
    from heavydb_spark.queries import QUERIES, _PRIORITY

    missing = [n for n in _PRIORITY if n not in QUERIES]
    assert not missing, f"priority names not registered: {missing}"
    # and the window-front names are unique
    assert len(_PRIORITY) == len(set(_PRIORITY))
