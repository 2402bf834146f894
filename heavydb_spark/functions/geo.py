"""Minimal geospatial subset (SURVEY.md §2.8 geo; declared scope).

Reference: QueryEngine/ExtensionFunctionsGeo.hpp (ST_Distance/ST_DWithin/
ST_Contains/ST_X/ST_Y/distance_in_meters...), Geospatial/ (~3.4k LoC).
Full OGC surface is out of core parity scope (Sedona territory); this
module covers the point-math subset used by the reference's own
benchmarks: point construction, coordinate access, euclidean and
haversine distances, ST_DWithin, and bounding-box containment — all as
plain Column expressions (codegen'd, oracle-checkable).

Representation: POINT = struct<x double, y double> (lon/lat for
geography). No WKB — at 100 TB you want columnar doubles, not parsed
strings.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6371008.8  # mean radius, as in distance_in_meters


def st_point(x: Column, y: Column) -> Column:
    return F.struct(x.cast("double").alias("x"), y.cast("double").alias("y"))


def st_x(p: Column) -> Column:
    return p["x"]


def st_y(p: Column) -> Column:
    return p["y"]


def st_distance(a: Column, b: Column) -> Column:
    """Cartesian distance (ST_Distance on GEOMETRY points)."""
    dx = a["x"] - b["x"]
    dy = a["y"] - b["y"]
    return F.sqrt(dx * dx + dy * dy)


def st_distance_sphere(a: Column, b: Column) -> Column:
    """Haversine great-circle distance in meters (distance_in_meters,
    ExtensionFunctionsGeo.hpp) — x=lon, y=lat in degrees."""
    lat1, lat2 = F.radians(a["y"]), F.radians(b["y"])
    dlat = lat2 - lat1
    dlon = F.radians(b["x"]) - F.radians(a["x"])
    h = (
        F.pow(F.sin(dlat / 2), 2)
        + F.cos(lat1) * F.cos(lat2) * F.pow(F.sin(dlon / 2), 2)
    )
    return 2 * EARTH_RADIUS_M * F.asin(F.sqrt(h))


def st_dwithin(a: Column, b: Column, dist: float) -> Column:
    return st_distance(a, b) <= dist


def st_contains_bbox(
    xmin: Column, ymin: Column, xmax: Column, ymax: Column, p: Column
) -> Column:
    """Bounding-box containment — the pre-filter the reference's
    bounding-box-intersect join hash table accelerates
    (JoinHashTable/BoundingBoxIntersectJoinHashTable.h:29)."""
    return (
        (p["x"] >= xmin)
        & (p["x"] <= xmax)
        & (p["y"] >= ymin)
        & (p["y"] <= ymax)
    )


def grid_cell(p: Column, cell_size: float) -> Column:
    """Grid-cell id for bucketed spatial joins (the Spark-side analogue
    of the reference's binned range-join hash, RangeJoinHashTable.h:21):
    equi-join on neighboring cells, then exact-distance verify."""
    return F.struct(
        F.floor(p["x"] / cell_size).cast("long").alias("cx"),
        F.floor(p["y"] / cell_size).cast("long").alias("cy"),
    )
