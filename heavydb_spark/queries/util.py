"""Shared helpers for query builders."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from heavydb_spark.catalog import load_table


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def r2(col) -> "F.Column":
    """Round a floating aggregate to 2dp — applied identically in oracle
    SQL so cross-engine FP summation order can't flip the value hash."""
    return F.round(col, 2)


def r4(col) -> "F.Column":
    return F.round(col, 4)


def r6(col) -> "F.Column":
    return F.round(col, 6)
