"""Typed wide-fixture coverage (FIXTURES.md §2) — the Spark analogue of
the reference's `test` table (Tests/ExecuteTest.cpp:141-187,30063-30112):
one fixture exercising int widths, floats, decimals, booleans, strings,
timestamps (µs), dates, seconds-of-day TIME, null patterns, and int64
extremes. Every check runs the SAME SQL on the engine and on DuckDB over
an identically-constructed fixture and compares canonicalized rows.
"""

from __future__ import annotations

import pytest

from conftest import canonical

# (x int not null, w tinyint, y int, z smallint, t bigint, b boolean,
#  f float, d double, str, m timestamp(6), n time-as-seconds, o date,
#  dd decimal(10,2), u int-with-nulls, ofq/ufq bigint extremes)
ROWS = [
    (7, -8, 42, 101, 1001, "true", 1.1, 2.2, "'foo'", "TIMESTAMP '2014-12-13 22:23:15.874533'", 3391, "DATE '1999-09-09'", "111.11", 5, 9223372036854775807, -9223372036854775807),
    (8, -7, 43, 102, 1002, "false", 1.2, 2.4, "'bar'", "TIMESTAMP '2014-12-13 22:23:15.000000'", 0, "DATE '1999-09-09'", "222.22", "NULL", 1, -1),
    (7, -7, 43, "NULL", 1001, "true", 1.3, 2.6, "'baz'", "TIMESTAMP '2006-04-26 03:49:04.607435'", 86399, "DATE '1999-09-09'", "333.33", "NULL", 0, 0),
    (9, "NULL", "NULL", 103, "NULL", "NULL", "NULL", "NULL", "NULL", "NULL", "NULL", "NULL", "NULL", "NULL", "NULL", "NULL"),
    (7, -8, 42, 101, 1001, "false", 1.1, 2.2, "'foo'", "TIMESTAMP '2014-12-13 22:23:15.874533'", 3391, "DATE '1999-09-09'", "111.11", 6, 2147483647, -2147483648),
    (8, -7, 43, 102, 1002, "true", 1.2, 2.4, "'bar'", "TIMESTAMP '2014-12-14 22:23:15.437321'", 7200, "DATE '2000-01-01'", "222.22", "NULL", 1, -1),
]

COLS = "x w y z t b f d str m n o dd u ofq ufq".split()
CASTS = {
    "x": "INT", "w": "TINYINT", "y": "INT", "z": "SMALLINT", "t": "BIGINT",
    "b": "BOOLEAN", "f": "FLOAT", "d": "DOUBLE", "str": "STRING",
    "m": "TIMESTAMP", "n": "INT", "o": "DATE", "dd": "DECIMAL(10,2)",
    "u": "INT", "ofq": "BIGINT", "ufq": "BIGINT",
}


def _values_sql() -> str:
    rows = ", ".join(
        "(" + ", ".join(str(v) for v in row) + ")" for row in ROWS
    )
    casts = ", ".join(
        f"CAST({c} AS {CASTS[c].replace('STRING', 'VARCHAR(20)')}) AS {c}"
        for c in COLS
    )
    return f"SELECT {casts} FROM (VALUES {rows}) AS v({', '.join(COLS)})"


@pytest.fixture(scope="module", autouse=True)
def typed_test(spark, ddb):
    sql = _values_sql()
    spark.sql(f"CREATE OR REPLACE TEMP VIEW typed_test AS {sql}")
    ddb.sql(f"CREATE OR REPLACE VIEW typed_test AS {sql}")
    # empty companion (ExecuteTest.cpp:30114)
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW typed_empty AS "
        f"SELECT * FROM ({sql}) WHERE 1 = 0"
    )
    ddb.sql(
        f"CREATE OR REPLACE VIEW typed_empty AS SELECT * FROM ({sql}) WHERE 1 = 0"
    )
    yield


CHECKS = [
    # null-aware counts & int-width sums
    "SELECT count(*) AS c, count(w) AS cw, count(u) AS cu, sum(x) AS sx, "
    "sum(w) AS sw, sum(y) AS sy, sum(z) AS sz, sum(t) AS st FROM typed_test",
    # int64 extremes survive min/max
    "SELECT max(ofq) AS mx, min(ufq) AS mn FROM typed_test",
    # boolean aggregation + conditional aggs
    "SELECT count_if(b) AS ct, count_if(NOT b) AS cf, "
    "sum(CASE WHEN b THEN 1 ELSE 0 END) AS sb FROM typed_test",
    # decimal exact sums and comparisons
    "SELECT sum(dd) AS sdd, count(*) AS c FROM typed_test WHERE dd > 111.11",
    # null-safe equality (BW_EQ ≈ IS NOT DISTINCT FROM)
    "SELECT count(*) AS c FROM typed_test a, typed_test b "
    "WHERE a.u IS NOT DISTINCT FROM b.u",
    # group by nullable key: null group must appear once
    "SELECT str, count(*) AS c, sum(x) AS sx FROM typed_test GROUP BY str",
    # float/double arithmetic with rounding
    "SELECT round(sum(CAST(f AS DOUBLE)), 4) AS sf, round(avg(d), 4) AS ad "
    "FROM typed_test",
    # timestamp µs precision: comparisons must distinguish sub-second
    "SELECT count(DISTINCT m) AS dm, min(m) AS mn, max(m) AS mx, "
    "sum(CASE WHEN m > TIMESTAMP '2014-12-13 22:23:15.000001' "
    "THEN 1 ELSE 0 END) AS gt_us FROM typed_test",
    # seconds-of-day TIME semantics on int column
    "SELECT max(n) AS mx, min(n) AS mn, "
    "sum(CASE WHEN n >= 43200 THEN 1 ELSE 0 END) AS pm FROM typed_test",
    # date grouping
    "SELECT o, count(*) AS c FROM typed_test GROUP BY o",
    # coalesce / nullif / case coercion
    "SELECT sum(coalesce(u, -1)) AS su, count(nullif(x, 7)) AS cx, "
    "sum(CASE WHEN u IS NULL THEN 0.5 ELSE u END) AS mixed FROM typed_test",
    # empty-table aggregates (null vs zero counts)
    "SELECT count(*) AS c, sum(x) AS sx, max(str) AS mstr FROM typed_empty",
    # distinct on dict-encoded-style strings
    "SELECT count(DISTINCT str) AS ds FROM typed_test",
    # predicate over tinyint/smallint boundaries
    "SELECT count(*) AS c FROM typed_test WHERE w < 0 AND z BETWEEN 100 AND 102",
]


@pytest.mark.parametrize("sql", CHECKS, ids=range(len(CHECKS)))
def test_typed_fixture_parity(spark, ddb, sql):
    sdf = spark.sql(sql)
    srows = [tuple(r) for r in sdf.collect()]
    scols = [c.lower() for c in sdf.columns]
    ores = ddb.sql(sql)
    orows = ores.fetchall()
    ocols = [c.lower() for c in ores.columns]
    assert sorted(scols) == sorted(ocols), sql
    sidx = [scols.index(c) for c in sorted(scols)]
    oidx = [ocols.index(c) for c in sorted(ocols)]
    s_c = canonical([[r[i] for i in sidx] for r in srows])
    o_c = canonical([[r[i] for i in oidx] for r in orows])
    assert s_c == o_c, f"{sql}\nspark={s_c}\noracle={o_c}"


def test_decimal_semantics(spark):
    """Pin DECIMAL(18,2) semantics on the typed view (reference stores
    NUMERIC as scaled int64, Shared/sqltypes.h:56-71):

    - sums/products are EXACT (no FP drift), with composed scales
      (s1+s2 on multiply, max on add) — matches the reference's scaled
      arithmetic;
    - downscale CAST rounds HALF_UP in Spark; the reference's scaled-
      int conversion truncates (documented divergence, the one place
      the engines differ — QueryEngine/DecimalDivision.h's truncating
      division is the same family);
    - decimal/decimal division keeps DECIMAL in Spark (rescaled per
      Spark's rules) while DuckDB falls back to DOUBLE — division for
      oracle queries is therefore done in DOUBLE on both sides.
    """
    from decimal import Decimal

    df = spark.sql("""
        SELECT CAST('0.10' AS DECIMAL(18,2)) AS d,
               CAST('123.456' AS DECIMAL(18,3)) AS d3,
               CAST('100.10' AS DECIMAL(18,2)) AS p,
               CAST('3.00' AS DECIMAL(18,2)) AS q
    """)
    r = df.selectExpr(
        "CAST(d3 AS DECIMAL(18,2)) AS half_up",
        "p * q AS prod",
        "p + d3 AS added",
        "p / q AS ratio",
    )
    row = r.first()
    # HALF_UP on downscale (123.456 -> 123.46; DuckDB/reference truncate
    # to 123.45)
    assert row.half_up == Decimal("123.46")
    # multiply composes scale 2+2=4, exactly
    assert row.prod == Decimal("300.3000")
    # add takes max scale, exactly
    assert row.added == Decimal("223.556")
    # division stays decimal (Spark scale rule: max(6, s1+p2+1))
    assert dict(r.dtypes)["ratio"].startswith("decimal")
    assert abs(float(row.ratio) - 100.10 / 3.00) < 1e-9

    # exact accumulation: 10k * 0.10 == 1000.00 exactly as DECIMAL
    from pyspark.sql import functions as F

    s = (
        spark.range(10_000)
        .select(F.lit("0.10").cast("decimal(18,2)").alias("d"))
        .agg(F.sum("d").alias("s"))
        .first()["s"]
    )
    assert s == Decimal("1000.00")


def test_decimal_typed_view(spark):
    """catalog.load_table_decimal casts every registered money column
    and leaves the rest untouched."""
    from heavydb_spark.catalog import DECIMAL_COLUMNS, load_table_decimal
    from tests.conftest import SF_DIR

    li = load_table_decimal(spark, SF_DIR, "lineitem")
    types = dict(li.dtypes)
    for c in DECIMAL_COLUMNS["lineitem"]:
        assert types[c] == "decimal(18,2)", c
    assert types["l_quantity"] == "double"  # untouched
