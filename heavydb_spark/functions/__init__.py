"""Scalar function surface (SURVEY.md §2.8).

Nearly all of the reference's string/datetime/math library maps 1:1 onto
`pyspark.sql.functions` and stays JVM-side (whole-stage codegen). This
package holds only the genuine gaps, each registered as a SQL function so
both the DataFrame API and `engine.sql` can reach it.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from heavydb_spark.functions.strings import register_string_functions
from heavydb_spark.functions.arrays import register_array_functions
from heavydb_spark.functions.geo import register_geo_functions
from heavydb_spark.functions.geos import register_geos_functions
from heavydb_spark.functions.render import register_render_functions
from heavydb_spark.functions.h3 import register_h3_functions


# Registration is idempotent but NOT free: ~80 CREATE FUNCTION
# statements + pandas-UDF registrations cost several seconds, and every
# Engine() construction calls register_all — memoize per live session.
# Weak-keyed so stopped sessions stay garbage-collectable (id() reuse
# is a non-issue: the entry dies with the session).
import weakref  # noqa: E402

_REGISTERED: "weakref.WeakSet[SparkSession]" = weakref.WeakSet()


def register_all(spark: SparkSession) -> None:
    try:
        if spark in _REGISTERED:
            return
    except TypeError:  # not weak-referenceable: register every time
        pass
    register_string_functions(spark)
    register_array_functions(spark)
    # geos first: geo's st_intersects SQL body calls st_intersection
    register_geos_functions(spark)
    register_geo_functions(spark)
    register_render_functions(spark)
    register_h3_functions(spark)
    try:
        _REGISTERED.add(spark)
    except TypeError:
        pass


def single_value(col):
    """SINGLE_VALUE aggregate (sqldefs.h:85): the group's value, erroring
    if the group holds more than one distinct value — the runtime check
    the reference's planner inserts under scalar subqueries. JVM-side:
    raise_error fires inside codegen, no UDF."""
    from pyspark.sql import functions as F

    return F.when(
        F.count_distinct(col) > 1,
        F.raise_error(F.lit("more than one row returned by SINGLE_VALUE")),
    ).otherwise(F.first(col, ignorenulls=True))


from heavydb_spark.functions.udaf import geometric_mean  # noqa: F401,E402
