"""Skew mitigation: salted joins and salted aggregation.

Reference context: HeavyDB shards tables and batches fragments per
device (TableDescriptor.h:65, Execute.cpp:3028) but has no skew-key
handling — a hot key lands on one kernel. Spark's AQE skew-join
(enabled in session.py) splits oversized partitions at runtime; these
operators are the explicit, plan-time alternative for when AQE cannot
help (e.g. a broadcast is too big and one key dominates the shuffle).

Salting: the skewed (probe) side gets a deterministic salt in
[0, salt_factor); the build side is replicated once per salt value.
The join key becomes (key, salt), spreading a hot key over salt_factor
reducers. Cost: build side shuffles salt_factor× — use only when the
build side is small relative to the hot-key volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    how: str = "inner",
    salt_factor: int = 8,
) -> DataFrame:
    """Equi-join with the skewed side salted and the other side
    replicated salt_factor times.

    Deterministic salt (xxhash64 of the whole row's monotonic id is
    overkill; a hash of the key alone would defeat the purpose — every
    copy of the hot key must NOT get the same salt), so we salt on
    spark_partition_id + a per-row counter-free expression: a hash of
    all columns. Returns the same columns a plain `skewed.join(other,
    on, how)` would.
    """
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(salt_factor)
    ).cast("int")
    s = skewed.withColumn("__salt", salt)
    o = other.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(salt_factor)])),
    )
    out = s.join(o, [on, "__salt"], how)
    return out.drop("__salt")


def salted_count(
    df: DataFrame, key: str, salt_factor: int = 16
) -> DataFrame:
    """Two-phase count for a heavily skewed group-by key: partial count
    on (key, salt), final sum on key. Spark's partial aggregation
    already does this map-side when counts collapse well; explicit
    salting helps when the first shuffle itself is the bottleneck
    (e.g. distinct-like aggregates that cannot partially collapse)."""
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_factor))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(key, "__salt")
        .agg(F.count(F.lit(1)).alias("__pc"))
    )
    return partial.groupBy(key).agg(F.sum("__pc").alias("n"))
