"""Scalar function library parity (SURVEY.md §2.8).

One query per family, each exercising many functions at once against the
DuckDB oracle. Engine-specific spellings are resolved to semantically
identical formulas on both sides (e.g. Spark `weekday` == DuckDB
`isodow - 1`; Spark `regexp_count` == DuckDB `len(regexp_extract_all)`).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from heavydb_spark.queries.registry import query
from heavydb_spark.queries.util import T, r4, r6


@query(
    "fn_string_basic",
    oracle="""
    SELECT p_partkey,
           lower(p_name) AS lname,
           upper(p_brand) AS ubrand,
           length(p_name) AS name_len,
           reverse(p_type) AS rtype,
           substring(p_name, 2, 5) AS sub,
           left(p_name, 3) AS l3,
           right(p_name, 3) AS r3,
           lpad(p_brand, 12, '*') AS padded,
           trim(concat('  ', p_name, '  ')) AS trimmed,
           replace(p_name, ' ', '_') AS replaced,
           split_part(p_name, ' ', 2) AS second_word,
           concat(p_brand, '|', p_type) AS joined,
           repeat(left(p_brand, 2), 2) AS rep,
           strpos(p_name, 'e') AS pos_e,
           contains(p_name, 'red') AS has_red,
           starts_with(p_type, 'ECO') AS is_eco,
           ends_with(p_name, 't') AS ends_t
    FROM part WHERE p_partkey < 200 ORDER BY p_partkey
    """,
)
def fn_string_basic(spark, sf_dir):
    """LOWER/UPPER/LEN/REVERSE/SUBSTR/LEFT/RIGHT/LPAD/TRIM/REPLACE/
    SPLIT_PART/CONCAT/REPEAT/POSITION/CONTAINS/STARTSWITH/ENDSWITH
    (Shared/sqldefs.h:92-141, StringOps/StringOps.cpp)."""
    p = T(spark, sf_dir, "part").filter(F.col("p_partkey") < 200)
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("lname"),
        F.upper("p_brand").alias("ubrand"),
        F.length("p_name").alias("name_len"),
        F.reverse("p_type").alias("rtype"),
        F.substring("p_name", 2, 5).alias("sub"),
        F.substring("p_name", 1, 3).alias("l3"),
        F.col("p_name").substr(F.length("p_name") - 2, F.lit(3)).alias("r3"),
        F.lpad("p_brand", 12, "*").alias("padded"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("trimmed"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("replaced"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias("second_word"),
        F.concat(F.col("p_brand"), F.lit("|"), F.col("p_type")).alias("joined"),
        F.repeat(F.substring("p_brand", 1, 2), 2).alias("rep"),
        F.instr(F.col("p_name"), "e").alias("pos_e"),
        F.col("p_name").contains("red").alias("has_red"),
        F.col("p_type").startswith("ECO").alias("is_eco"),
        F.col("p_name").endswith("t").alias("ends_t"),
    ).orderBy("p_partkey")


@query(
    "fn_string_regex",
    oracle="""
    SELECT doc_id,
           regexp_replace(substring(text, 1, 60), '[aeiou]', '#', 'g') AS devoweled,
           regexp_extract(text, '([a-z]+)', 1) AS first_word,
           len(regexp_extract_all(substring(text, 1, 200), 'the')) AS n_the,
           regexp_matches(text, '^[a-z]') AS starts_lower
    FROM documents WHERE doc_id < 100 ORDER BY doc_id
    """,
)
def fn_string_regex(spark, sf_dir):
    """REGEXP_REPLACE/REGEXP_SUBSTR/REGEXP_COUNT (sqldefs.h regex ops;
    QueryEngine/RegexpFunctions.cpp)."""
    d = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select(
        "doc_id",
        F.regexp_replace(F.substring("text", 1, 60), "[aeiou]", "#").alias("devoweled"),
        F.regexp_extract(F.col("text"), "([a-z]+)", 1).alias("first_word"),
        F.regexp_count(F.substring("text", 1, 200), F.lit("the")).alias("n_the"),
        F.col("text").rlike("^[a-z]").alias("starts_lower"),
    ).orderBy("doc_id")


@query(
    "fn_string_distance",
    oracle="""
    SELECT n_name,
           levenshtein(n_name, 'UNITED STATES') AS lev,
           round(jaro_winkler_similarity(n_name, 'UNITED STATES'), 6) AS jw
    FROM nation ORDER BY n_name
    """,
)
def fn_string_distance(spark, sf_dir):
    """LEVENSHTEIN_DISTANCE (Spark native) + JAROWINKLER_SIMILARITY
    (pandas UDF, functions/strings.py — StringOps.cpp kernels)."""
    from heavydb_spark.functions.strings import jaro_winkler_similarity

    n = T(spark, sf_dir, "nation")
    return n.select(
        "n_name",
        F.levenshtein(F.col("n_name"), F.lit("UNITED STATES")).alias("lev"),
        F.round(
            jaro_winkler_similarity(F.col("n_name"), F.lit("UNITED STATES")), 6
        ).alias("jw"),
    ).orderBy("n_name")


@query(
    "fn_datetime",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS y,
           quarter(o_orderdate) AS q,
           month(o_orderdate) AS m,
           day(o_orderdate) AS d,
           isodow(o_orderdate) - 1 AS wd,
           dayofyear(o_orderdate) AS doy,
           weekofyear(o_orderdate) AS woy,
           CAST(extract(epoch FROM o_orderdate) AS BIGINT) AS ep,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon_start,
           CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP) AS q_start,
           CAST(date_trunc('week', o_orderdate) AS TIMESTAMP) AS wk_start,
           o_orderdate + INTERVAL 90 DAY AS plus90,
           o_orderdate - INTERVAL 2 MONTH AS minus2m,
           date_diff('day', o_orderdate, TIMESTAMP '2000-01-01 00:00:00') AS days_to_y2k,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end
    FROM orders WHERE o_orderkey < 300 ORDER BY o_orderkey
    """,
)
def fn_datetime(spark, sf_dir):
    """EXTRACT/DATE_TRUNC/DATEADD/DATEDIFF surface (ExtractFromTime.h:77,
    DateTruncate.h:27, DateAdd.h:42, DateTimeTranslator.h:29)."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 300)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.quarter("o_orderdate").alias("q"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.weekday("o_orderdate").alias("wd"),
        F.dayofyear("o_orderdate").alias("doy"),
        F.weekofyear("o_orderdate").alias("woy"),
        F.unix_timestamp(
            F.col("o_orderdate").cast("timestamp")
        ).alias("ep"),
        F.date_trunc("month", "o_orderdate").cast("timestamp_ntz").alias("mon_start"),
        F.date_trunc("quarter", "o_orderdate").cast("timestamp_ntz").alias("q_start"),
        F.date_trunc("week", "o_orderdate").cast("timestamp_ntz").alias("wk_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")).alias("plus90"),
        (F.col("o_orderdate") - F.expr("INTERVAL 2 MONTH")).alias("minus2m"),
        F.expr(
            "timestampdiff(DAY, o_orderdate, TIMESTAMP_NTZ '2000-01-01 00:00:00')"
        ).alias("days_to_y2k"),
        F.last_day(F.col("o_orderdate").cast("date"))
        .cast("timestamp_ntz")
        .alias("month_end"),
    ).orderBy("o_orderkey")


@query(
    "fn_math",
    oracle="""
    SELECT o_orderkey,
           abs(o_totalprice - 250000) AS abs_diff,
           CAST(sign(o_totalprice - 250000) AS DOUBLE) AS sgn,
           round(o_totalprice, -3) AS round_k,
           CAST(floor(o_totalprice / 1000) AS BIGINT) AS floor_k,
           CAST(ceil(o_totalprice / 1000) AS BIGINT) AS ceil_k,
           round(sqrt(o_totalprice), 6) AS sqrt_p,
           round(ln(o_totalprice), 6) AS ln_p,
           round(log10(o_totalprice), 6) AS log10_p,
           round(exp(o_totalprice / 1000000), 6) AS exp_p,
           round(power(o_totalprice / 100000, 2), 6) AS pow_p,
           mod(CAST(o_orderkey AS BIGINT), 7) AS mod7,
           round(sin(o_totalprice / 100000), 6) AS sin_x,
           round(atan2(o_totalprice, 100000.0), 6) AS atan2_x,
           round(degrees(o_totalprice / 1000000), 6) AS deg_x,
           CASE WHEN o_totalprice < 0 THEN 0
                WHEN o_totalprice >= 500000 THEN 6
                ELSE CAST(floor(o_totalprice / 500000 * 5) AS INT) + 1 END AS bucket
    FROM orders WHERE o_orderkey < 300 ORDER BY o_orderkey
    """,
)
def fn_math(spark, sf_dir):
    """Math extension functions (QueryEngine/ExtensionFunctions.hpp: Acos..
    Tanh, Exp, Log, Power, Round, Floor/Ceil, degrees/radians) +
    WIDTH_BUCKET (translateWidthBucket) — bucket formula mirrored in the
    oracle since DuckDB 1.0 lacks width_bucket."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 300)
    return o.select(
        "o_orderkey",
        F.abs(F.col("o_totalprice") - 250000).alias("abs_diff"),
        F.signum(F.col("o_totalprice") - 250000).alias("sgn"),
        F.round(F.col("o_totalprice"), -3).alias("round_k"),
        F.floor(F.col("o_totalprice") / 1000).alias("floor_k"),
        F.ceil(F.col("o_totalprice") / 1000).alias("ceil_k"),
        r6(F.sqrt("o_totalprice")).alias("sqrt_p"),
        r6(F.log(F.col("o_totalprice"))).alias("ln_p"),
        r6(F.log10("o_totalprice")).alias("log10_p"),
        r6(F.exp(F.col("o_totalprice") / 1000000)).alias("exp_p"),
        r6(F.pow(F.col("o_totalprice") / 100000, 2)).alias("pow_p"),
        (F.col("o_orderkey").cast("bigint") % 7).alias("mod7"),
        r6(F.sin(F.col("o_totalprice") / 100000)).alias("sin_x"),
        r6(F.atan2(F.col("o_totalprice"), F.lit(100000.0))).alias("atan2_x"),
        r6(F.degrees(F.col("o_totalprice") / 1000000)).alias("deg_x"),
        F.width_bucket(F.col("o_totalprice"), F.lit(0.0), F.lit(500000.0), F.lit(5)).alias("bucket"),
    ).orderBy("o_orderkey")


@query(
    "fn_cast_trycast",
    oracle="""
    SELECT d.doc_id,
           CAST(d.n_chars AS DOUBLE) AS chars_dbl,
           CAST(d.n_chars AS VARCHAR) AS chars_str,
           TRY_CAST(d.lang AS INT) AS lang_int,
           TRY_CAST(substring(d.source, 4, 10) AS INT) AS src_num,
           CAST(round(d.n_chars / 100.0, 0) AS INT) AS chars_h
    FROM documents d WHERE d.doc_id < 200 ORDER BY d.doc_id
    """,
)
def fn_cast_trycast(spark, sf_dir):
    """CAST / TRY_CAST (CastIR.cpp; TRY_STRING_CAST sqldefs.h:128)."""
    d = T(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return d.select(
        "doc_id",
        F.col("n_chars").cast("double").alias("chars_dbl"),
        F.col("n_chars").cast("string").alias("chars_str"),
        F.col("lang").try_cast("int").alias("lang_int"),
        F.substring("source", 4, 10).try_cast("int").alias("src_num"),
        F.round(F.col("n_chars") / 100.0, 0).cast("int").alias("chars_h"),
    ).orderBy("doc_id")


@query(
    "fn_json_value",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           TRY_CAST(json_extract_string(props, '$.k') AS INT) AS k_int
    FROM events WHERE event_id < 500 ORDER BY event_id
    """,
)
def fn_json_value(spark, sf_dir):
    """JSON_VALUE (sqldefs.h:129) → get_json_object."""
    ev = T(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").try_cast("int").alias("k_int"),
    ).orderBy("event_id")


@query(
    "fn_encode_hash",
    oracle="""
    SELECT n_name,
           to_base64(CAST(n_name AS BLOB)) AS b64,
           CAST(from_base64(to_base64(CAST(n_name AS BLOB))) AS VARCHAR) AS roundtrip,
           md5(n_name) AS h_md5,
           sha256(n_name) AS h_sha256,
           greatest(n_nationkey, n_regionkey * 5) AS g,
           least(n_nationkey, n_regionkey * 5) AS l
    FROM nation ORDER BY n_name
    """,
)
def fn_encode_hash(spark, sf_dir):
    """BASE64_ENCODE/DECODE + HASH (sqldefs.h:121-137; md5/sha256 as the
    cross-engine-stable HASH surface) + GREATEST/LEAST."""
    n = T(spark, sf_dir, "nation")
    return n.select(
        "n_name",
        F.base64(F.col("n_name").cast("binary")).alias("b64"),
        F.unbase64(F.base64(F.col("n_name").cast("binary"))).cast("string").alias("roundtrip"),
        F.md5(F.col("n_name").cast("binary")).alias("h_md5"),
        F.sha2(F.col("n_name").cast("binary"), 256).alias("h_sha256"),
        F.greatest(F.col("n_nationkey"), F.col("n_regionkey") * 5).alias("g"),
        F.least(F.col("n_nationkey"), F.col("n_regionkey") * 5).alias("l"),
    ).orderBy("n_name")


@query(
    "fn_array_ops",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           round(CAST(embedding[1] AS DOUBLE), 6) AS first_el,
           round(CAST(embedding[64] AS DOUBLE), 6) AS last_el,
           round(list_dot_product(CAST(embedding AS DOUBLE[]),
                                  CAST(embedding AS DOUBLE[])), 6) AS self_dot
    FROM embeddings WHERE vec_id < 100 ORDER BY vec_id
    """,
)
def fn_array_ops(spark, sf_dir):
    """ARRAY ops: CARDINALITY / array_at / DOT_PRODUCT
    (QueryEngine/ArrayOps.cpp:246, translateDotProduct)."""
    from heavydb_spark.functions.arrays import dot_product

    e = T(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_el"),
        F.round(F.element_at("embedding", 64).cast("double"), 6).alias("last_el"),
        F.round(dot_product(F.col("embedding"), F.col("embedding")), 6).alias("self_dot"),
    ).orderBy("vec_id")


@query(
    "fn_unnest_explode",
    oracle="""
    SELECT vec_id, pos, round(val, 6) AS val
    FROM (
        SELECT vec_id,
               generate_subscripts(embedding, 1) AS pos,
               CAST(unnest(embedding) AS DOUBLE) AS val
        FROM embeddings WHERE vec_id < 5
    ) ORDER BY vec_id, pos
    """,
)
def fn_unnest_explode(spark, sf_dir):
    """UNNEST (SQLOps kUNNEST, sqldefs.h:53) → posexplode."""
    e = T(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 5)
    return (
        e.select("vec_id", F.posexplode("embedding").alias("pos0", "val"))
        .select(
            "vec_id",
            (F.col("pos0") + 1).alias("pos"),
            F.round(F.col("val").cast("double"), 6).alias("val"),
        )
        .orderBy("vec_id", "pos")
    )


@query(
    "fn_string_extra",
    oracle="""
    SELECT p_partkey,
           upper(left(p_brand, 1)) || lower(substring(p_brand, 2)) AS icap,
           substr(p_name, 1, 2) || 'XX' || substr(p_name, 5) AS olay,
           'v' || repeat(' ', 3) || 'w' AS spaced,
           ltrim('  ' || p_brand) AS lt,
           rtrim(p_brand || '  ') AS rt,
           base64(encode(p_brand)) AS b64,
           replace(p_name, ' ', '+') AS urlenc,
           translate(p_brand, '#', '_') AS trans
    FROM part WHERE p_partkey < 200 ORDER BY p_partkey
    """,
)
def fn_string_extra(spark, sf_dir):
    """INITCAP/OVERLAY/SPACE/LTRIM/RTRIM/BASE64_ENCODE/URL_ENCODE
    (Shared/sqldefs.h:92-141; StringOps/StringOps.cpp kernels). p_brand is
    single-token and p_name is [a-z ]+, so the DuckDB oracle can emulate
    INITCAP and form-style URL_ENCODE (space -> '+') exactly.
    URL_ENCODE uses the engine's registered pandas UDF (functions/
    strings.py) — r10 aligned it with the reference's FORM encoding
    (StringOps.cpp:937 UrlEncode: space -> '+', unreserved alnum+'-._~'
    kept, uppercase %XX otherwise; pinned by UrlEncodeTest
    'Hello+World%21') — called as a function object so it cannot be
    shadowed by the differently-spelled Spark builtin."""
    from heavydb_spark.functions.strings import url_encode

    p = T(spark, sf_dir, "part").filter(F.col("p_partkey") < 200)
    return p.select(
        "p_partkey",
        F.initcap("p_brand").alias("icap"),
        F.overlay("p_name", F.lit("XX"), 3, 2).alias("olay"),
        F.concat(F.lit("v"), F.expr("space(3)"), F.lit("w")).alias("spaced"),
        F.ltrim(F.concat(F.lit("  "), F.col("p_brand"))).alias("lt"),
        F.rtrim(F.concat(F.col("p_brand"), F.lit("  "))).alias("rt"),
        F.base64(F.encode("p_brand", "utf-8")).alias("b64"),
        url_encode(F.col("p_name")).alias("urlenc"),
        F.translate("p_brand", "#", "_").alias("trans"),
    ).orderBy("p_partkey")


@query(
    "fn_datetime_week_variants",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_orderdate AS DATE) - CAST(dayofweek(o_orderdate) AS INT)
               AS TIMESTAMP) AS wk_sunday,
           CAST(CAST(o_orderdate AS DATE) - ((CAST(dayofweek(o_orderdate) AS INT) + 1) % 7)
               AS TIMESTAMP) AS wk_saturday,
           CAST(floor(hour(o_orderdate) / 6) + 1 AS INT) AS quarterday
    FROM orders WHERE o_orderkey < 300 ORDER BY o_orderkey
    """,
)
def fn_datetime_week_variants(spark, sf_dir):
    """DATE_TRUNC WEEK_SUNDAY / WEEK_SATURDAY and EXTRACT QUARTERDAY —
    HeavyDB-specific fields with no Spark builtin
    (QueryEngine/DateTruncate.h:27-46, ExtractFromTime.h:77-98).
    Spark dayofweek is 1=Sunday; DuckDB's is 0=Sunday."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 300)
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.date_sub(d, F.dayofweek(d) - 1)
        .cast("timestamp_ntz")
        .alias("wk_sunday"),
        F.date_sub(d, F.dayofweek(d) % 7)
        .cast("timestamp_ntz")
        .alias("wk_saturday"),
        (F.floor(F.hour("o_orderdate") / 6) + 1).cast("int").alias("quarterday"),
    ).orderBy("o_orderkey")


@query(
    "fn_udaf_geomean",
    oracle="""
    SELECT l_returnflag,
           round(exp(avg(ln(l_extendedprice))), 4) AS gm
    FROM lineitem WHERE l_extendedprice > 0
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def fn_udaf_geomean(spark, sf_dir):
    """User-defined aggregate via GROUPED_AGG pandas_udf (§2.9 UDAF
    surface): geometric mean per group, oracle-checked against the
    exp(avg(ln)) identity."""
    from heavydb_spark.functions import geometric_mean

    gm = geometric_mean()
    li = T(spark, sf_dir, "lineitem").filter(F.col("l_extendedprice") > 0)
    return (
        li.groupBy("l_returnflag")
        .agg(F.round(gm(F.col("l_extendedprice")), 4).alias("gm"))
        .orderBy("l_returnflag")
    )


@query(
    "fn_decimal",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS STRING) AS sum_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS STRING) AS revenue,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))
                    * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS STRING) AS revenue_tax,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 / CAST(sum(l_quantity) AS DOUBLE), 6) AS price_per_unit
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def fn_decimal(spark, sf_dir):
    """DECIMAL(18,2) money arithmetic on the typed view
    (catalog.load_table_decimal): exact scaled sums and scale-composed
    products, compared as strings so floating point cannot mask drift
    — the reference's NUMERIC storage semantics (Shared/sqltypes.h:
    56-71). Division is performed in DOUBLE on both sides: decimal
    division rules differ by engine (reference scaled-int division,
    QueryEngine/DecimalDivision.h; DuckDB converts to DOUBLE; Spark
    keeps decimal with rescale) — pinned in tests/test_types.py.
    """
    from heavydb_spark.catalog import load_table_decimal

    li = load_table_decimal(spark, sf_dir, "lineitem")
    price, disc, tax = (
        F.col("l_extendedprice"), F.col("l_discount"), F.col("l_tax"),
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(price).cast("string").alias("sum_price"),
            F.sum(price * (F.lit(1) - disc)).cast("string").alias("revenue"),
            F.sum(price * (F.lit(1) - disc) * (F.lit(1) + tax))
            .cast("string")
            .alias("revenue_tax"),
            F.round(
                F.sum(price).cast("double") / F.sum("l_quantity").cast("double"), 6
            ).alias("price_per_unit"),
        )
        .orderBy("l_returnflag")
    )


_PROBE_CLOSEOUT_SQL = """
    SELECT o.o_orderkey AS ok,
           DATEPART('yy', o.o_orderdate) AS yy_part,
           DATEPART('y', o.o_orderdate) AS doy_part,
           DATEPART('m', o.o_orderdate) AS m_part,
           DATEPART('n', DATEADD('n', MOD(o.o_orderkey, 300),
                    TIMESTAMP '2024-01-01 00:00:00')) AS n_part,
           DATEPART('s', DATEADD('s', MOD(o.o_orderkey, 500),
                    TIMESTAMP '2024-01-01 00:00:00')) AS s_part,
           DATEADD('m', 2, o.o_orderdate) AS m_add,
           DATEDIFF('s', TIMESTAMP '2024-01-01 00:00:00',
                    DATEADD('s', MOD(o.o_orderkey, 86401),
                            TIMESTAMP '2024-01-01 00:00:00')) AS s_diff,
           DATEDIFF('d', TIMESTAMP '1995-01-01 00:00:00',
                    o.o_orderdate) AS d_diff,
           DATEDIFF('m', TIMESTAMP '1995-01-01 00:00:00',
                    DATE_TRUNC('month', o.o_orderdate)) AS m_diff,
           POSITION('E' IN o.o_orderpriority) AS pos_e,
           POSITION('E' IN o.o_orderpriority FROM 4) AS pos_e_from4,
           s.sumif_hi AS sumif_hi,
           ROUND_TO_DIGIT(o.o_totalprice / 7, 2) AS rtd2,
           ROUND2_TO_DIGIT(o.o_totalprice / 13, 1) AS rtd1,
           TRY_STRTOD(RCONCAT('.25', CAST(o.o_orderkey AS TEXT))) AS strtod,
           TRY_STRTOL(SUBSTRING(CAST(o.o_orderkey + 1000000 AS TEXT), 2, 7))
               AS strtol,
           JSON_VALUE(RCONCAT('}', RCONCAT(CAST(o.o_orderkey AS TEXT),
                      '{"k": ')), 'lax $.k') AS jsonv,
           MID(o.o_orderpriority, 3, 4) AS midv,
           LEVENSHTEIN_DISTANCE(o.o_orderpriority, '1-URGENT') AS lev,
           CAST(o.o_totalprice AS TEXT) IS NOT NULL AS txt_ok,
           TIMESTAMP(3) '2024-01-01 00:00:00.123' AS ts3
    FROM orders o,
         (SELECT ROUND(CAST(SUM_IF(CAST(o_totalprice AS DECIMAL(18, 2)),
                                   o_totalprice > 150000.0e0) AS DOUBLE),
                       2) AS sumif_hi
          FROM orders WHERE o_orderkey < 1200) s
    WHERE o.o_orderkey < 1200
    ORDER BY ok
"""


@query(
    "fn_dialect_probe_closeout",
    oracle="""
    SELECT o.o_orderkey AS ok,
           year(o.o_orderdate) AS yy_part,
           dayofyear(o.o_orderdate) AS doy_part,
           month(o.o_orderdate) AS m_part,
           minute(TIMESTAMP '2024-01-01 00:00:00'
                  + INTERVAL (o.o_orderkey % 300) MINUTE) AS n_part,
           second(TIMESTAMP '2024-01-01 00:00:00'
                  + INTERVAL (o.o_orderkey % 500) SECOND) AS s_part,
           o.o_orderdate + INTERVAL 2 MONTH AS m_add,
           CAST(o.o_orderkey % 86401 AS BIGINT) AS s_diff,
           CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00',
                          o.o_orderdate) AS BIGINT) AS d_diff,
           CAST(date_diff('month', TIMESTAMP '1995-01-01 00:00:00',
                          date_trunc('month', o.o_orderdate)) AS BIGINT)
               AS m_diff,
           position('E' IN o.o_orderpriority) AS pos_e,
           CASE WHEN position('E' IN substring(o.o_orderpriority, 4)) > 0
                THEN position('E' IN substring(o.o_orderpriority, 4)) + 3
                ELSE 0 END AS pos_e_from4,
           s.sumif_hi AS sumif_hi,
           round((o.o_totalprice / 7) * 100) / 100 AS rtd2,
           round((o.o_totalprice / 13) * 10) / 10 AS rtd1,
           TRY_CAST(concat(CAST(o.o_orderkey AS VARCHAR), '.25') AS DOUBLE)
               AS strtod,
           TRY_CAST(substring(CAST(o.o_orderkey + 1000000 AS VARCHAR), 2, 7)
                    AS BIGINT) AS strtol,
           json_extract_string(concat('{"k": ',
               CAST(o.o_orderkey AS VARCHAR), '}'), '$.k') AS jsonv,
           substring(o.o_orderpriority, 3, 4) AS midv,
           levenshtein(o.o_orderpriority, '1-URGENT') AS lev,
           CAST(o.o_totalprice AS VARCHAR) IS NOT NULL AS txt_ok,
           TIMESTAMP '2024-01-01 00:00:00.123' AS ts3
    FROM orders o,
         (SELECT round(CAST(sum(CASE WHEN o_totalprice > 150000.0
                                 THEN CAST(o_totalprice AS DECIMAL(18, 2))
                                 END) AS DOUBLE), 2) AS sumif_hi
          FROM orders WHERE o_orderkey < 1200) s
    WHERE o.o_orderkey < 1200
    ORDER BY ok
    """,
)
def fn_dialect_probe_closeout(spark, sf_dir):
    """r9 consolidation of the r8 probe-sweep dialect surface under a
    DRIVER oracle (verdict r8 queue #2) — every form below previously
    had only pytest coverage. Routed through Engine.sql exactly as
    HeavyDB SQL arrives: the TSQL/SQL_TSI datetime alias tables
    ('yy'/'y'/'m'/'n'/'s' per-function routing,
    CalciteDeserializerUtils.cpp:59-211 — 'm'/'s'/'y' silently took
    Spark's own single-letter meanings before r8), DATEADD/DATEDIFF
    alias scaling, POSITION...FROM (StringOps.h:157 1-based-in-whole-
    string, 0 = miss), SUM_IF (sqldefs.h:88), ROUND_TO_DIGIT /
    ROUND2_TO_DIGIT (ExtensionFunctions.hpp:289-298 exact formula),
    TRY_STRTOD / TRY_STRTOL (StringOps.h:143), JSON_VALUE lax mode,
    MID / RCONCAT / LEVENSHTEIN_DISTANCE (sqldefs.h SqlStringOpKind),
    CAST AS TEXT, and the dimensioned TIMESTAMP(3) literal
    (ExecuteTest.cpp:6602)."""
    from heavydb_spark.engine import Engine

    eng = Engine(spark).attach(sf_dir)
    return eng.sql(_PROBE_CLOSEOUT_SQL)
