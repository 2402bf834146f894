"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query smoke check at sf0.001.
queries()     — every implemented operator (SURVEY.md §2 + pipeline ops)
                as (spark, sf_dir) -> DataFrame builders.
oracle_sql()  — DuckDB-equivalent ANSI SQL per query (omitted only for
                approximate sketches → rows-only check).

The real catalog lives in heavydb_spark/queries/ — one module per
operator family, each entry registered with its oracle beside it.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF_SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary) on sf0.001."""
    from heavydb_spark.queries import QUERIES

    return QUERIES["pricing_summary"](spark, SF_SMOKE_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from heavydb_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from heavydb_spark.queries import ORACLES

    return dict(ORACLES)
