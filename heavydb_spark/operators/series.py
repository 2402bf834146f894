"""generate_series table functions (SURVEY.md §2.10).

Reference: UDTF generate_series int/timestamp
(QueryEngine/TableFunctions/SystemFunctions/os/UtilityTableFunctions.h:28-30)
and generate_random_strings (:49). Spark-first: `spark.range` for the
integer form (a parallel, splittable source — no driver loop) and
`sequence()+explode` for the timestamp form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def generate_series(
    spark: SparkSession, start: int, stop: int, step: int = 1
) -> DataFrame:
    """Inclusive-stop integer series, like the reference UDTF."""
    if step == 0:
        raise ValueError("step must be nonzero")
    end_exclusive = stop + (1 if step > 0 else -1)
    return spark.range(start, end_exclusive, step).select(
        F.col("id").alias("series")
    )


def generate_series_ts(
    spark: SparkSession, start: str, stop: str, interval: str
) -> DataFrame:
    """Timestamp series with an interval step, inclusive stop."""
    return spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(start).cast("timestamp_ntz"),
                F.lit(stop).cast("timestamp_ntz"),
                F.expr(f"INTERVAL {interval}"),
            )
        ).alias("series")
    )


def generate_random_strings(
    spark: SparkSession, n: int, length: int = 10, seed: int = 42
) -> DataFrame:
    """Deterministic pseudo-random strings (reference
    UtilityTableFunctions.h:49) — base: xxhash64 of the row id, hex
    encoded and cut to length; distributed via spark.range."""
    return spark.range(n).select(
        F.col("id"),
        F.substring(
            F.lower(F.hex(F.xxhash64(F.col("id"), F.lit(seed)))), 1, length
        ).alias("rand_str"),
    )
