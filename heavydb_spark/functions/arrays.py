"""Array / vector functions (SURVEY.md §2.8 array ops).

Reference: array_at / CARDINALITY / UNNEST / DOT_PRODUCT
(QueryEngine/ArrayOps.cpp:246, RelAlgTranslator::translateDotProduct,
DotProductReturnTypes.h). Spark mapping: element_at / size / explode are
built-in; the vector math is expressed with higher-order functions
(zip_with + aggregate), which run JVM-side inside codegen — no Python in
the hot path. These are the primitives the similarity-search operators
(operators/similarity.py) build on.
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F


def dot_product(a: Column, b: Column) -> Column:
    """Sum of elementwise products; JVM higher-order functions."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v.cast("double"),
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + (v * v).cast("double"))
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


def l2_distance(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v.cast("double"),
        )
    )


# SQL UDF forms (Spark 4 SQL scalar functions, stay JVM-side).
_SQL_FUNCS = {
    "dot_product": """
        CREATE OR REPLACE TEMPORARY FUNCTION dot_product(
            a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE
        RETURN aggregate(zip_with(a, b, (x, y) -> x * y),
                         CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)
    """,
    "cosine_similarity": """
        CREATE OR REPLACE TEMPORARY FUNCTION cosine_similarity(
            a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE
        RETURN aggregate(zip_with(a, b, (x, y) -> x * y),
                         CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)
               / (sqrt(aggregate(a, CAST(0.0 AS DOUBLE),
                                 (acc, v) -> acc + v * v))
                  * sqrt(aggregate(b, CAST(0.0 AS DOUBLE),
                                   (acc, v) -> acc + v * v)))
    """,
}


def register_array_functions(spark: SparkSession) -> None:
    import logging

    for name, ddl in _SQL_FUNCS.items():
        try:
            spark.sql(ddl)
        except Exception as exc:
            # SQL scalar UDFs unavailable → DataFrame helpers still
            # work; log the skipped function for traceability.
            logging.getLogger(__name__).warning(
                "array SQL function %s not registered: %s", name, exc
            )
