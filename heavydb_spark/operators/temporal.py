"""Temporal joins: scalable as-of join (point-in-time lookup).

The reference covers inequality joins via its range-join machinery
(QueryEngine/RangeTableFunctions.h, the binned range join mirrored in
operators/spatial.py range_join); an as-of join ("latest right row at
or before each left row's timestamp, per key") is the time-series /
feature-store form of that lookup — joining events to the most recent
dimension snapshot, trades to quotes, features to label timestamps.

Spark-first design — NO join operator at all:
- Union the two inputs (left tagged side=1, right side=0) on
  (keys, ts, side), right payload carried as ONE struct column.
- One window per key ordered by (ts, side): `last(payload,
  ignorenulls=true)` over UNBOUNDED PRECEDING..CURRENT ROW gives every
  left row the most recent right payload at-or-before its timestamp
  (right sorts before left at equal ts, so ties match, matching
  DuckDB/pandas ASOF `>=` semantics).
- That is ONE hash shuffle on the key — the same cost as the
  best-case equi-join — with no range explosion, no binning, and no
  skew amplification beyond the key's own frequency. A binned range
  join needs a bin-size guess and replicates rows per bin; the
  union-window form is exact and parameter-free. At 100 TB both
  sides stream through the same sort-merge window; memory per task is
  O(1) beyond the sort (the running `last` is a single struct).

Determinism: if the right side has duplicate (keys, ts) rows the
window frame order among the duplicates is engine-dependent — callers
must deduplicate the right side to unique (keys, ts) first (the
catalog query does; asof_join documents rather than hides this).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance_seconds: float | None = None,
    direction: str = "backward",
    right_prefix: str = "r_",
) -> DataFrame:
    """LEFT as-of join: every left row, plus the right row with the
    greatest right_ts <= left_ts ("backward", default) or smallest
    right_ts >= left_ts ("forward") for the same key values — or
    nulls when none exists (or the match is farther than
    `tolerance_seconds`).

    Output: all left columns, each right payload column prefixed with
    `right_prefix`, and `{right_prefix}match_ts` (the matched right
    timestamp). The right side must be unique per (keys, right_ts).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("asof_join: direction must be backward|forward")
    keys = list(keys)
    lpay = [c for c in left.columns if c not in keys]
    rpay = [c for c in right.columns if c not in keys and c != right_ts]

    r_struct = F.struct(*[F.col(c) for c in rpay]) if rpay else F.struct(
        F.lit(0).alias("__none")
    )
    rtype = right.select(r_struct.alias("s")).schema["s"].dataType
    l_struct = F.struct(*[F.col(c) for c in lpay])
    ltype = left.select(l_struct.alias("s")).schema["s"].dataType

    lu = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        l_struct.alias("__l"),
        F.lit(None).cast(rtype).alias("__r"),
    )
    ru = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(ltype).alias("__l"),
        r_struct.alias("__r"),
    )
    u = lu.unionByName(ru)

    if direction == "backward":
        order = [F.col("__ts").asc(), F.col("__side").asc()]
    else:
        order = [F.col("__ts").desc(), F.col("__side").asc()]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        u.withColumn("__m", F.last("__r", ignorenulls=True).over(w))
        .withColumn(
            "__mts",
            F.last(
                F.when(F.col("__side") == 0, F.col("__ts")),
                ignorenulls=True,
            ).over(w),
        )
        .filter(F.col("__side") == 1)
    )
    if tolerance_seconds is not None:
        # exact integer-microsecond comparison — a double-epoch compare
        # loses sub-us precision at 2024 epochs (16 significant digits)
        gap: Column = F.abs(
            F.unix_micros(F.col("__ts").cast("timestamp"))
            - F.unix_micros(F.col("__mts").cast("timestamp"))
        )
        ok = F.col("__mts").isNotNull() & (
            gap <= F.lit(int(tolerance_seconds * 1_000_000))
        )
        matched = matched.withColumn(
            "__m", F.when(ok, F.col("__m"))
        ).withColumn("__mts", F.when(ok, F.col("__mts")))

    out_cols = (
        [F.col(k) for k in keys]
        + [F.col(f"__l.{c}").alias(c) for c in lpay]
        + [F.col("__mts").alias(f"{right_prefix}match_ts")]
        + [F.col(f"__m.{c}").alias(f"{right_prefix}{c}") for c in rpay]
    )
    return matched.select(*out_cols)
