"""Shared helpers for query builders."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from heavydb_spark.catalog import load_table


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def r2(col) -> "F.Column":
    """Round a floating aggregate to 2dp — applied identically in oracle
    SQL so cross-engine FP summation order can't flip the value hash.

    KNOWN HAZARD: when the true sum lands exactly on a .xx5 half (easy
    for 4-decimal revenue terms), Spark's round() goes through the
    double's shortest decimal repr (BigDecimal HALF_UP on "…x.025")
    while DuckDB rounds the raw double (…x.024999…): the two engines
    disagree by one cent. The catalog's r2() greens have empirically
    avoided the boundary, but aggregations with MANY small groups
    (e.g. per-month sums) hit it — use `sum_half_up_cents` there."""
    return F.round(col, 2)


def sum_half_up_cents(col, decimals: int = 4) -> "F.Column":
    """Deterministic 2dp sum of a fixed-point expression: sum exact
    1e-`decimals` integers (order-independent while < 2^53), then
    round half-up to cents with floor(x + 0.5) — identical in Spark
    and DuckDB even on exact halves. Oracle SQL twin:
    floor(sum(round(expr * 10^d)) / 10^(d-2) + 0.5) / 100.0"""
    scale = 10 ** decimals
    down = 10 ** (decimals - 2)
    return (
        F.floor(F.sum(F.round(col * scale)) / down + 0.5) / 100.0
    )


def range_spread(df: DataFrame, *key_cols: str) -> DataFrame:
    """RANGE-partition the (cheap, narrow) INPUT by the final sort key.

    r13 optimization for map-heavy queries that end in
    `.orderBy(key)`: a terminal global sort samples range boundaries
    by EXECUTING ITS CHILD — when the child is an expensive projection
    with no exchange below it (regex/split feature maps over a scan),
    the whole map runs twice and on the scan's partitioning (a single
    partition for a one-file fixture).  Range-partitioning the RAW
    input by the key first and finishing with
    `.sortWithinPartitions(key)` yields the identical total order
    while (a) sampling only the cheap scan, (b) computing the map
    once, (c) spreading it across every core (guide §1.2/§2.5).

    Partition count = max(cores, shuffle.partitions), explicit on
    purpose — see session.spread_partition_count (AQE would coalesce a
    count-less exchange by bytes and serialize the expensive map).
    """
    from heavydb_spark.session import spread_partition_count

    return df.repartitionByRange(
        spread_partition_count(df.sparkSession), *[F.col(c) for c in key_cols]
    )


def r4(col) -> "F.Column":
    return F.round(col, 4)


def r6(col) -> "F.Column":
    return F.round(col, 6)
