"""Shared fixtures: one SparkSession per test session + DuckDB oracle.

Mirrors the reference's SQLiteComparator harness
(Tests/ExecuteTest.cpp:314, compare_impl :385) with DuckDB as oracle.
"""

from __future__ import annotations

import decimal
import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="session")
def spark():
    from heavydb_spark.session import get_spark

    s = get_spark(app_name="heavydb_spark_tests", master="local[8]",
                  shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def engine(spark):
    from heavydb_spark.engine import Engine

    return Engine(spark).attach(SF_DIR)


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def canonical(rows, ndigits=6):
    """Canonicalize result rows for cross-engine comparison: floats
    rounded, everything stringified, row order insensitive.

    Driver-faithful Decimal handling (r6 verdict #7): the external
    driver's pandas canon stringifies a DECIMAL differently from a
    DOUBLE even when values are equal (Decimal('0.800000') vs 0.8), so
    a Spark-DECIMAL-vs-oracle-DOUBLE result must FAIL locally too —
    Decimals get a distinct tag instead of the float format."""
    out = []
    for row in rows:
        vals = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("nan")
                else:
                    vals.append(f"{round(v, ndigits):.{ndigits}f}")
            elif isinstance(v, decimal.Decimal):
                vals.append(f"decimal:{v}")
            elif v is None:
                vals.append("<null>")
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


# ------------------------------------------------------------------
# Result-type classification (r6 verdict #2): the driver's pandas
# canonicalizer is type-sensitive — HUGEINT, array-typed columns, and
# decimal-vs-double class mismatches all flip the hash or crash the
# sort even when values are identical.  Both engines' RESULT
# projections must land in the same boring type class.

_NESTED_SPARK = {"array", "map", "struct"}


def spark_type_class(dt) -> str:
    t = dt.typeName()
    if t in ("byte", "short", "integer", "long"):
        return "int"
    if t in ("float", "double"):
        return "float"
    if t.startswith("decimal"):
        return "decimal"
    if t in _NESTED_SPARK:
        return "nested"
    if t.startswith("timestamp"):
        return "timestamp"
    return t  # string, boolean, date, binary, ...


def duck_type_class(t) -> str:
    s = str(t).upper()
    if s in ("HUGEINT", "INT128", "UHUGEINT"):
        return "hugeint"  # never acceptable — distinct class by design
    if s in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT",
             "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if s in ("FLOAT", "REAL", "DOUBLE"):
        return "float"
    if s.startswith("DECIMAL"):
        return "decimal"
    if s.endswith("[]") or s.startswith(("LIST", "STRUCT", "MAP", "ARRAY")):
        return "nested"
    if s.startswith("TIMESTAMP"):
        return "timestamp"
    return {
        "VARCHAR": "string", "BOOLEAN": "boolean", "DATE": "date",
        "BLOB": "binary",
    }.get(s, s.lower())


def assert_result_types_driver_safe(name, sdf, orel):
    """Three per-column assertions over the RESULT projections:
    (a) no HUGEINT oracle column, (b) no array/list-typed column on
    either side, (c) Spark dtype class == oracle dtype class."""
    s_cls = {f.name.lower(): spark_type_class(f.dataType)
             for f in sdf.schema.fields}
    o_cls = {c.lower(): duck_type_class(t)
             for c, t in zip(orel.columns, orel.types)}
    hug = [c for c, k in o_cls.items() if k == "hugeint"]
    assert not hug, (
        f"{name}: oracle emits HUGEINT column(s) {hug}; "
        "CAST(... AS BIGINT) in the oracle SQL"
    )
    nested = [c for c, k in {**s_cls, **o_cls}.items() if k == "nested"]
    assert not nested, (
        f"{name}: array/struct-typed RESULT column(s) {nested} crash "
        "the driver canonicalizer — project array_join(...) instead"
    )
    diff = {
        c: (s_cls[c], o_cls[c])
        for c in s_cls if c in o_cls and s_cls[c] != o_cls[c]
    }
    assert not diff, (
        f"{name}: result dtype class mismatch (spark, oracle): {diff}"
    )


def compare_query(spark, ddb, name: str, sf_dir: str = SF_DIR):
    """Run catalog query `name` on Spark and its oracle on DuckDB and
    assert canonical equality (schema names + values)."""
    from heavydb_spark.queries import ORACLES, QUERIES

    sdf = QUERIES[name](spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = [c.lower() for c in sdf.columns]

    ores = ddb.sql(ORACLES[name])
    assert_result_types_driver_safe(name, sdf, ores)
    orows = ores.fetchall()
    ocols = [c.lower() for c in ores.columns]

    assert sorted(scols) == sorted(ocols), (
        f"{name}: column mismatch spark={scols} oracle={ocols}"
    )
    # align column order by name before canonicalizing; position-
    # stable sort handles duplicate lowercased names (list.index
    # would compare the first duplicate twice and skip the second)
    sidx = sorted(range(len(scols)), key=lambda j: scols[j])
    oidx = sorted(range(len(ocols)), key=lambda j: ocols[j])
    s_c = canonical([[r[i] for i in sidx] for r in srows])
    o_c = canonical([[r[i] for i in oidx] for r in orows])
    assert len(s_c) == len(o_c), (
        f"{name}: row count spark={len(s_c)} oracle={len(o_c)}"
    )
    mism = [
        (a, b) for a, b in zip(s_c, o_c) if a != b
    ]
    assert not mism, f"{name}: {len(mism)} row mismatches; first: {mism[:3]}"
