"""Fractional-numeric -> integer cast rounding parity.

The reference ROUNDS half away from zero when casting fp or decimal
values to integer types (QueryEngine/CastIR.cpp codegenCastFromFp
:618-630 adds +-0.5 before fptosi; RuntimeFunctions.cpp
scale_decimal_down_nullable:209-229 adds scale/2 before the divide;
Tests/ExecuteTest.cpp Select.CastFromLiteral), while Spark's native
CAST truncates.  dialect._rewrite_fp_int_casts wraps PROVABLY
fractional operands in round(x, 0).
"""

from __future__ import annotations


class TestLiteralCasts:
    def test_decimal_literal_rounds(self, engine):
        r = engine.sql(
            "SELECT CAST(2.7 AS INT) AS a, CAST(2.3 AS INT) AS b,"
            " CAST(-2.7 AS INT) AS c, CAST(2.5 AS INT) AS d,"
            " CAST(-2.5 AS INT) AS e, CAST(2.3 AS TINYINT) AS f,"
            " CAST(2.7 AS BIGINT) AS g").first()
        assert (r["a"], r["b"], r["c"]) == (3, 2, -3)
        # half away from zero on both signs
        assert (r["d"], r["e"]) == (3, -3)
        assert (r["f"], r["g"]) == (2, 3)

    def test_double_expr_rounds(self, engine):
        r = engine.sql(
            "SELECT CAST(CAST(2.7 AS DOUBLE) AS INT) AS a,"
            " CAST(SQRT(2) AS INT) AS b,"
            " CAST(AVG(n_nationkey + 0.6) AS INT) AS c"
            " FROM nation WHERE n_nationkey = 2").first()
        assert r["a"] == 3
        assert r["b"] == 1
        assert r["c"] == 3  # 2.6 -> 3

    def test_integer_operands_untouched(self, engine):
        r = engine.sql(
            "SELECT CAST(7 AS INT) AS a,"
            " CAST(n_nationkey AS TINYINT) AS b"
            " FROM nation WHERE n_nationkey = 2").first()
        assert r["a"] == 7 and r["b"] == 2

    def test_string_operands_round(self, engine):
        # parseInteger -> parseFloatAsInteger applies std::round
        # (Shared/Datum.cpp:238/:180); TRY_STRTOL is the same
        # TryStringCast kernel (StringOps.cpp:98)
        r = engine.sql(
            "SELECT CAST('2.7' AS INT) AS a, CAST('-2.5' AS INT) AS b,"
            " TRY_STRTOL('2.7') AS c, TRY_STRTOL('junk') AS d,"
            " CAST('9007199254740993' AS BIGINT) AS big,"
            " CAST('2.7e1' AS INT) AS e").first()
        assert (r["a"], r["b"], r["c"], r["d"]) == (3, -3, 3, None)
        # pure-integer strings stay on the exact native path
        assert r["big"] == 9007199254740993
        assert r["e"] == 27

    def test_fractional_column_rounds(self, engine):
        spark = engine.spark
        spark.createDataFrame(
            [(2.7,), (-2.5,), (3.2,)], ["v"]
        ).createOrReplaceTempView("_fpcast")
        rows = engine.sql(
            "SELECT CAST(v AS INT) AS i FROM _fpcast").collect()
        assert sorted(r["i"] for r in rows) == [-3, 3, 3]
        spark.catalog.dropTempView("_fpcast")

    def test_lineitem_quantity_cast(self, engine):
        # l_extendedprice is a fractional column in the fixtures: the
        # SQL cast agrees with DuckDB's round-to-nearest cast
        r = engine.sql(
            "SELECT CAST(l_extendedprice AS BIGINT) AS p,"
            " l_extendedprice AS raw"
            " FROM lineitem ORDER BY l_orderkey, l_linenumber"
            " LIMIT 5").collect()
        for row in r:
            assert row["p"] == int(row["raw"] + (0.5 if row["raw"] >= 0
                                                 else -0.5))
