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
