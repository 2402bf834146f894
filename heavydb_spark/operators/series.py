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


_RAND_ALPHA = "abcdefghijklmnopqrstuvwxyz0123456789"


def generate_random_strings_portable(
    spark: SparkSession, n: int, length: int = 10, seed: int = 42
) -> DataFrame:
    """generate_random_strings on the portable 2-round LCG hash
    (operators/pipeline.portable_hash) instead of xxhash64: character
    j of row id indexes the 36-char alphabet by
    midsquare(hash(id*length + j + seed*7919)) % 36, so ANY SQL engine
    reproduces the exact strings — the oracle-checkable variant of the
    seeded UDTF (reference UtilityTableFunctions.h:49 seeds a PRNG the
    same way). The mid-square step (h*h + h mod M) matters: the LCG
    alone is affine in its input, so consecutive positions would step
    the alphabet by a constant stride — squaring breaks the linearity.
    Still one narrow spark.range stage, all codegen."""
    from heavydb_spark.operators.pipeline import _M31, portable_hash

    def char_at(j):
        h = portable_hash(F.col("id") * length + F.lit(j + seed * 7919))
        g = F.pmod(h * h + h, F.lit(_M31))
        return F.substring(
            F.lit(_RAND_ALPHA),
            (F.pmod(g, F.lit(36)) + 1).cast("int"),
            F.lit(1),
        )

    chars = [char_at(j) for j in range(length)]
    return spark.range(n).select(
        F.col("id"), F.concat(*chars).alias("rand_str")
    )


def mandelbrot(
    spark,
    x_pixels: int,
    y_pixels: int,
    x_min: float,
    x_max: float,
    y_min: float,
    y_max: float,
    max_iterations: int,
):
    """tf_mandelbrot (ExampleTableFunctions.h:25 / .cpp:33-61): per
    pixel (cx, cy) iterate z = z^2 + c from z=0 while |z|^2 < 4, up to
    max_iterations; emit (x, y, num_iterations) with
    cx = x*(x_max-x_min)/x_pixels + x_min (reference get_scale/pixel
    mapping).

    Spark-first: the pixel grid is one spark.range (parallel, no data
    source), and the escape loop is a single F.aggregate fold over
    sequence(1, max_iterations) carrying (zx, zy, n) in a struct — a
    compute-bound embarrassingly-parallel map, the same shape the
    reference's tbb::parallel_for gives it.
    """
    from pyspark.sql import functions as F

    if x_pixels <= 0 or y_pixels <= 0:
        raise ValueError("pixel counts must be positive")
    if max_iterations <= 0 or max_iterations > 16384:
        raise ValueError("max_iterations must be in (0, 16384]")
    x_scale = (x_max - x_min) / x_pixels
    y_scale = (y_max - y_min) / y_pixels
    grid = spark.range(x_pixels * y_pixels).select(
        (F.col("id") % x_pixels).alias("px"),
        (F.col("id") / x_pixels).cast("long").alias("py"),
    )
    cx = (F.col("px") * x_scale + x_min).alias("x")
    cy = (F.col("py") * y_scale + y_min).alias("y")
    zero = F.struct(
        F.lit(0.0).alias("zx"), F.lit(0.0).alias("zy"),
        F.lit(0).alias("n"),
    )
    def step(acc, _):
        zx, zy, n = acc["zx"], acc["zy"], acc["n"]
        live = (zx * zx + zy * zy) < 4.0
        return F.when(
            live,
            F.struct(
                (zx * zx - zy * zy + F.col("x")).alias("zx"),
                (2.0 * zx * zy + F.col("y")).alias("zy"),
                (n + 1).alias("n"),
            ),
        ).otherwise(acc)

    esc = F.aggregate(
        F.sequence(F.lit(1), F.lit(max_iterations)), zero, step
    )
    return (
        grid.select(cx, cy)
        .select("x", "y", esc["n"].cast("int").alias("num_iterations"))
    )
