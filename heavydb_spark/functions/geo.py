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

import pandas as pd  # noqa: F401 - resolves pandas_udf type hints
from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6372797.560856  # the reference's exact haversine
# radius (ExtensionFunctions.hpp distance_in_meters:445)


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


# ---------------------------------------------------------------- polygons
#
# POLYGON = array<ring>, ring = array<struct<x double, y double>>; ring 0
# is the outer boundary, later rings are holes (the reference's
# render-group layout, Geospatial/Types.h GeoPolygon). Rings may be open
# or closed (repeated first point contributes a zero-length edge — both
# forms give identical results). Columnar doubles, no WKB/WKT parsing,
# all higher-order-function Column expressions (JVM-side).
#
# Reference semantics: ST_Area / ST_Perimeter / ST_Centroid /
# ST_Contains in QueryEngine/ExtensionFunctionsGeo.hpp (area via
# triangle fan ~ shoelace; centroid area-weighted with hole subtraction;
# contains via winding/parity test). Shapes tested against
# Tests/GeospatialTest.cpp expectations in tests/test_operators.py.


def _ring_edge_terms(ring: Column, term) -> Column:
    """Map each cyclic edge (p_i, p_{i+1 mod n}) of `ring` to
    `term(a, b)` — the building block for shoelace sums, perimeter and
    ray casting."""
    return F.transform(
        ring,
        lambda p, i: term(
            p, F.element_at(ring, ((i + F.lit(1)) % F.size(ring)) + F.lit(1))
        ),
    )


def _fsum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, v: acc + v)


def ring_signed_area(ring: Column) -> Column:
    """0.5 * Σ (x_i·y_{i+1} − x_{i+1}·y_i): positive for CCW rings."""
    return (
        _fsum(
            _ring_edge_terms(
                ring, lambda a, b: a["x"] * b["y"] - b["x"] * a["y"]
            )
        )
        / 2.0
    )


def ring_perimeter(ring: Column) -> Column:
    return _fsum(
        _ring_edge_terms(
            ring,
            lambda a, b: F.sqrt(
                (a["x"] - b["x"]) * (a["x"] - b["x"])
                + (a["y"] - b["y"]) * (a["y"] - b["y"])
            ),
        )
    )


def st_area(poly: Column) -> Column:
    """|outer| minus Σ|holes| — orientation-independent, like the
    reference's ST_Area (ExtensionFunctionsGeo.hpp area functions)."""
    ring_areas = F.transform(poly, lambda r: F.abs(ring_signed_area(r)))
    outer = F.element_at(ring_areas, 1)
    return outer * 2 - _fsum(ring_areas)  # outer - (sum - outer)


def st_perimeter(poly: Column) -> Column:
    """Sum of all ring lengths (outer + holes), per OGC/PostGIS and the
    reference's ST_Perimeter."""
    return _fsum(F.transform(poly, ring_perimeter))


def st_centroid(poly: Column) -> Column:
    """Area-weighted centroid with holes subtracted; returns
    struct<x,y>. Per-ring centroid uses the standard shoelace moment
    (sign cancels, so it is orientation-independent); rings weight
    +|A| (outer) / −|A| (holes)."""

    def _moment(ring: Column, coord: str) -> Column:
        # Σ (c_i + c_{i+1}) · cross_i   — divided by 6·signed_area later
        return _fsum(
            _ring_edge_terms(
                ring,
                lambda a, b: (a[coord] + b[coord])
                * (a["x"] * b["y"] - b["x"] * a["y"]),
            )
        )

    # weighted sums over rings: w_r · centroid_r where w_r = ±|A_r|.
    # centroid_r = moment / (6·signed_A_r); w_r·centroid_r =
    # sign_flag · |A_r| · moment / (6·signed_A_r) = sign_flag·moment·
    # sign(A_r)/6 … fold the signs directly:
    def _weighted(coord: str) -> Column:
        terms = F.transform(
            poly,
            lambda r, i: F.when(
                i == 0, _moment(r, coord) * F.signum(ring_signed_area(r))
            ).otherwise(
                -_moment(r, coord) * F.signum(ring_signed_area(r))
            )
            / 6.0,
        )
        return _fsum(terms)

    area = st_area(poly)
    return F.struct(
        (_weighted("x") / area).alias("x"),
        (_weighted("y") / area).alias("y"),
    )


def st_contains_point(poly: Column, px: Column, py: Column) -> Column:
    """Even-odd ray cast over every ring's edges (hole edges flip
    parity, so a point inside a hole is outside the polygon) —
    ST_Contains(POLYGON, POINT). Points exactly on an edge follow
    half-open crossing semantics (consistent between engines; the
    reference treats boundaries similarly via its winding test)."""
    crossings = F.transform(
        poly,
        lambda ring: _fsum(
            _ring_edge_terms(
                ring,
                lambda a, b: F.when(
                    ((a["y"] > py) != (b["y"] > py))
                    & (
                        px
                        < a["x"]
                        + (b["x"] - a["x"]) * (py - a["y"]) / (b["y"] - a["y"])
                    ),
                    F.lit(1.0),
                ).otherwise(F.lit(0.0)),
            )
        ),
    )
    return (_fsum(crossings).cast("long") % 2) == 1


def st_polygon_bbox(poly: Column) -> Column:
    """struct<xmin,ymin,xmax,ymax> of the outer ring — the coarse
    filter for containment joins (BoundingBoxIntersectJoinHashTable.h)."""
    outer = F.element_at(poly, 1)
    xs = F.transform(outer, lambda p: p["x"])
    ys = F.transform(outer, lambda p: p["y"])
    return F.struct(
        F.array_min(xs).alias("xmin"),
        F.array_min(ys).alias("ymin"),
        F.array_max(xs).alias("xmax"),
        F.array_max(ys).alias("ymax"),
    )


def _poly_edges(poly: Column) -> Column:
    """All cyclic edges of every ring as structs (ax,ay,bx,by)."""
    return F.flatten(
        F.transform(
            poly,
            lambda ring: _ring_edge_terms(
                ring,
                lambda a, b: F.struct(
                    a["x"].alias("ax"),
                    a["y"].alias("ay"),
                    b["x"].alias("bx"),
                    b["y"].alias("by"),
                ),
            ),
        )
    )


def _segments_intersect(e1: Column, e2: Column) -> Column:
    """Segment intersection via the orientation method (proper crossing
    or collinear touch)."""

    def cross(ox, oy, ax, ay, bx, by):
        return (ax - ox) * (by - oy) - (ay - oy) * (bx - ox)

    p1x, p1y, p2x, p2y = e1["ax"], e1["ay"], e1["bx"], e1["by"]
    q1x, q1y, q2x, q2y = e2["ax"], e2["ay"], e2["bx"], e2["by"]
    d1 = cross(q1x, q1y, q2x, q2y, p1x, p1y)
    d2 = cross(q1x, q1y, q2x, q2y, p2x, p2y)
    d3 = cross(p1x, p1y, p2x, p2y, q1x, q1y)
    d4 = cross(p1x, p1y, p2x, p2y, q2x, q2y)
    proper = (((d1 > 0) & (d2 < 0)) | ((d1 < 0) & (d2 > 0))) & (
        ((d3 > 0) & (d4 < 0)) | ((d3 < 0) & (d4 > 0))
    )

    def on_seg(d, px, py, ax, ay, bx, by):
        return (
            (d == 0)
            & (px <= F.greatest(ax, bx))
            & (px >= F.least(ax, bx))
            & (py <= F.greatest(ay, by))
            & (py >= F.least(ay, by))
        )

    return (
        proper
        | on_seg(d1, p1x, p1y, q1x, q1y, q2x, q2y)
        | on_seg(d2, p2x, p2y, q1x, q1y, q2x, q2y)
        | on_seg(d3, q1x, q1y, p1x, p1y, p2x, p2y)
        | on_seg(d4, q2x, q2y, p1x, p1y, p2x, p2y)
    )


def st_intersects(pa: Column, pb: Column) -> Column:
    """ST_Intersects(POLYGON, POLYGON): filled regions overlap iff some
    boundary edges (any ring — holes included) intersect, or one
    polygon's outer-ring vertex lies strictly inside the other (full
    even-odd containment, so a polygon entirely inside the other's
    hole correctly does NOT intersect). ExtensionFunctionsGeo.hpp
    polygon-polygon intersects semantics."""
    ea, eb = _poly_edges(pa), _poly_edges(pb)
    edges_cross = F.exists(
        ea, lambda e1: F.exists(eb, lambda e2: _segments_intersect(e1, e2))
    )
    va = F.element_at(F.element_at(pa, 1), 1)
    vb = F.element_at(F.element_at(pb, 1), 1)
    return (
        edges_cross
        | st_contains_point(pa, vb["x"], vb["y"])
        | st_contains_point(pb, va["x"], va["y"])
    )


# -------------------------------------------------------------- linestrings
#
# LINESTRING = array<struct<x,y>> (open path — no closing edge, unlike
# rings). Geospatial/Types.h GeoLineString; ST_Length / ST_NPoints /
# ST_StartPoint / ST_EndPoint / ST_Distance(point, linestring) from
# ExtensionFunctionsGeo.hpp.


def _open_edges(ls: Column, term) -> Column:
    """term(a, b) over consecutive point pairs, NO wrap-around edge."""
    n = F.size(ls)
    return F.zip_with(
        F.slice(ls, 1, n - 1), F.slice(ls, 2, n - 1), term
    )


def st_length(ls: Column) -> Column:
    return _fsum(
        _open_edges(
            ls,
            lambda a, b: F.sqrt(
                (a["x"] - b["x"]) * (a["x"] - b["x"])
                + (a["y"] - b["y"]) * (a["y"] - b["y"])
            ),
        )
    )


def st_npoints(ls: Column) -> Column:
    return F.size(ls)


def st_startpoint(ls: Column) -> Column:
    return F.element_at(ls, 1)


def st_endpoint(ls: Column) -> Column:
    return F.element_at(ls, -1)


def st_distance_point_linestring(
    px: Column, py: Column, ls: Column
) -> Column:
    """Min distance from (px,py) to any segment: per-segment projection
    parameter t clamped to [0,1], then point-to-projection distance —
    the same segment walk as ST_Distance(POINT, LINESTRING)
    (ExtensionFunctionsGeo.hpp distance_point_line kernels)."""

    def seg_dist(a: Column, b: Column) -> Column:
        dx, dy = b["x"] - a["x"], b["y"] - a["y"]
        seg_len2 = dx * dx + dy * dy
        t_raw = ((px - a["x"]) * dx + (py - a["y"]) * dy) / seg_len2
        t = F.when(seg_len2 == 0, F.lit(0.0)).otherwise(
            F.least(F.greatest(t_raw, F.lit(0.0)), F.lit(1.0))
        )
        cx, cy = a["x"] + t * dx, a["y"] + t * dy
        return F.sqrt((px - cx) * (px - cx) + (py - cy) * (py - cy))

    return F.array_min(_open_edges(ls, seg_dist))


def st_geomfromtext_linestring(wkt: Column) -> Column:
    """'LINESTRING (x y, x y, ...)' -> array<struct<x,y>>."""
    body = F.regexp_replace(wkt, r"(?i)^\s*LINESTRING\s*\(", "")
    body = F.regexp_replace(body, r"\)\s*$", "")

    def parse_point(pt: Column) -> Column:
        parts = F.split(F.trim(pt), r"\s+")
        return F.struct(
            F.element_at(parts, 1).cast("double").alias("x"),
            F.element_at(parts, 2).cast("double").alias("y"),
        )

    return F.transform(F.split(body, ","), parse_point)


# ------------------------------------------------------------ WKT surface
#
# ST_GeomFromText / ST_AsText for POINT and POLYGON — the reference's
# WKT import/export path (Geospatial/Types.cpp GeoPoint/GeoPolygon WKT
# constructors). Parsing is pure Column expressions (regexp + split +
# transform); coordinates round-trip exactly (Spark's double<->string
# conversion is shortest-roundtrip).


def st_geomfromtext_point(wkt: Column) -> Column:
    """'POINT (x y)' -> struct<x,y>."""
    x = F.regexp_extract(wkt, r"(?i)POINT\s*\(\s*(\S+)\s+(\S+)\s*\)", 1)
    y = F.regexp_extract(wkt, r"(?i)POINT\s*\(\s*(\S+)\s+(\S+)\s*\)", 2)
    return F.struct(
        x.cast("double").alias("x"), y.cast("double").alias("y")
    )


def st_astext_point(p: Column) -> Column:
    return F.concat(
        F.lit("POINT ("),
        p["x"].cast("string"),
        F.lit(" "),
        p["y"].cast("string"),
        F.lit(")"),
    )


def _drop_closing_vertex(ring: Column) -> Column:
    """WKT rings repeat the first vertex at the end; the reference's
    stored form drops it (ST_NPoints('POLYGON((0 0,4 0,0 4,0 0))') = 3,
    Tests/GeospatialTest.cpp ST_NPoints block) — normalize on parse."""
    n = F.size(ring)
    closed = (n > 1) & (
        F.element_at(ring, 1) == F.element_at(ring, -1)
    )
    return F.when(closed, F.slice(ring, 1, n - 1)).otherwise(ring)


def st_geomfromtext_polygon(wkt: Column) -> Column:
    """'POLYGON ((x y, ...), (x y, ...))' -> array-of-rings; first ring
    outer, rest holes (OGC ring order, Geospatial/Types.cpp). A
    repeated closing vertex is dropped, matching the reference's
    stored representation."""
    body = F.regexp_replace(wkt, r"(?i)^\s*POLYGON\s*\(\s*\(", "")
    body = F.regexp_replace(body, r"\)\s*\)\s*$", "")
    rings = F.split(body, r"\)\s*,\s*\(")

    def parse_point(pt: Column) -> Column:
        parts = F.split(F.trim(pt), r"\s+")
        return F.struct(
            F.element_at(parts, 1).cast("double").alias("x"),
            F.element_at(parts, 2).cast("double").alias("y"),
        )

    return F.transform(
        rings,
        lambda r: _drop_closing_vertex(
            F.transform(F.split(r, ","), parse_point)
        ),
    )


def st_astext_polygon(poly: Column) -> Column:
    def ring_text(r: Column) -> Column:
        return F.concat(
            F.lit("("),
            F.array_join(
                F.transform(
                    r,
                    lambda p: F.concat(
                        p["x"].cast("string"), F.lit(" "), p["y"].cast("string")
                    ),
                ),
                ", ",
            ),
            F.lit(")"),
        )

    return F.concat(
        F.lit("POLYGON ("),
        F.array_join(F.transform(poly, ring_text), ", "),
        F.lit(")"),
    )


def st_transform_4326_900913(p: Column) -> Column:
    """ST_Transform(point, 900913): WGS-84 lon/lat -> Web Mercator
    meters, with the reference's exact constants
    (QueryEngine/ExtensionFunctions.hpp:402-409 conv_4326_900913_x/y)."""
    return F.struct(
        (p["x"] * 111319.490778).alias("x"),
        (
            6378136.99911
            * F.log(F.tan(0.00872664626 * p["y"] + 0.785398163397))
        ).alias("y"),
    )


def grid_cell(p: Column, cell_size: float) -> Column:
    """Grid-cell id for bucketed spatial joins (the Spark-side analogue
    of the reference's binned range-join hash, RangeJoinHashTable.h:21):
    equi-join on neighboring cells, then exact-distance verify."""
    return F.struct(
        F.floor(p["x"] / cell_size).cast("long").alias("cx"),
        F.floor(p["y"] / cell_size).cast("long").alias("cy"),
    )


def st_numrings(poly: Column) -> Column:
    """ST_NumRings (ExtensionFunctionsGeo.hpp ring-count accessors):
    outer ring + holes."""
    return F.size(poly)


def st_npoints_polygon(poly: Column) -> Column:
    """ST_NPoints over all rings of a polygon."""
    return _fsum(F.transform(poly, lambda r: F.size(r).cast("double"))).cast(
        "int"
    )


def st_buffer_point(
    p: Column, radius: float, n_segments: int = 16
) -> Column:
    """ST_Buffer(POINT, r) (reference delegates to GEOS,
    Geospatial/GeosRuntime.cpp): regular n-gon approximation of the
    radius-r disc, as a single-ring polygon. Deterministic closed-form
    vertices — the buffered ring composes with every polygon operator
    here (area/perimeter/contains), and the approximation error is the
    standard circle-to-n-gon sagitta (~r·(1-cos(pi/n)))."""
    import math

    two_pi = 2 * math.pi
    ring = F.transform(
        F.sequence(F.lit(0), F.lit(n_segments - 1)),
        lambda i: F.struct(
            (p["x"] + radius * F.cos(i.cast("double") * two_pi / n_segments)
             ).alias("x"),
            (p["y"] + radius * F.sin(i.cast("double") * two_pi / n_segments)
             ).alias("y"),
        ),
    )
    return F.array(ring)


def st_intersection_bbox(a: Column, b: Column) -> Column:
    """Envelope intersection of two polygons: the overlap rectangle of
    their bounding boxes as struct<xmin,ymin,xmax,ymax>, NULL when the
    envelopes are disjoint — the cheap pre-pass of ST_Intersection
    (full polygon clipping is GEOS scope, like the reference's
    Geospatial/GeosRuntime.cpp delegation)."""
    ba, bb = st_polygon_bbox(a), st_polygon_bbox(b)
    xmin = F.greatest(ba["xmin"], bb["xmin"])
    ymin = F.greatest(ba["ymin"], bb["ymin"])
    xmax = F.least(ba["xmax"], bb["xmax"])
    ymax = F.least(ba["ymax"], bb["ymax"])
    box = F.struct(
        xmin.alias("xmin"), ymin.alias("ymin"),
        xmax.alias("xmax"), ymax.alias("ymax"),
    )
    return F.when((xmin <= xmax) & (ymin <= ymax), box)


def st_distance_point_polygon(
    px: Column, py: Column, poly: Column
) -> Column:
    """ST_Distance(POINT, POLYGON) (ExtensionFunctionsGeo.hpp
    distance_point_poly): 0 when the point is inside (holes count as
    outside), else min distance over every ring's edges."""
    edge_d = F.array_min(
        F.flatten(
            F.transform(
                poly,
                lambda ring: _ring_pt_dists(ring, px, py),
            )
        )
    )
    return F.when(st_contains_point(poly, px, py), F.lit(0.0)).otherwise(
        edge_d
    )


def _ring_pt_dists(ring: Column, px: Column, py: Column) -> Column:
    """Per-edge point distances for a closed ring (wraps last->first)."""
    n = F.size(ring)

    def seg_dist(a: Column, b: Column) -> Column:
        dx, dy = b["x"] - a["x"], b["y"] - a["y"]
        seg_len2 = dx * dx + dy * dy
        t_raw = ((px - a["x"]) * dx + (py - a["y"]) * dy) / seg_len2
        t = F.when(seg_len2 == 0, F.lit(0.0)).otherwise(
            F.least(F.greatest(t_raw, F.lit(0.0)), F.lit(1.0))
        )
        cx, cy = a["x"] + t * dx, a["y"] + t * dy
        return F.sqrt((px - cx) * (px - cx) + (py - cy) * (py - cy))

    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: seg_dist(
            F.element_at(ring, i),
            F.element_at(ring, F.when(i == n, 1).otherwise(i + 1)),
        ),
    )


# ---------------------------------------------------------- MULTI* types
#
# MULTIPOINT = array<point>, MULTILINESTRING = array<linestring>,
# MULTIPOLYGON = array<polygon> — one more nesting level per compound
# (Shared/sqltypes.h:84-97 kMULTIPOINT/kMULTILINESTRING/kMULTIPOLYGON;
# Geospatial/Types.h GeoMultiPolygon). Component geometries are
# disjoint per OGC, so aggregate accessors sum/any over components.


def st_numgeometries(multi: Column) -> Column:
    """ST_NumGeometries over any MULTI* geometry."""
    return F.size(multi)


def st_npoints_multipolygon(mp: Column) -> Column:
    """Total vertex count over every ring of every polygon."""
    return _fsum(
        F.transform(
            mp,
            lambda poly: _fsum(
                F.transform(poly, lambda r: F.size(r).cast("double"))
            ),
        )
    ).cast("int")


def st_area_multipolygon(mp: Column) -> Column:
    """Σ component areas (holes subtracted per component)."""
    return _fsum(F.transform(mp, st_area))


def st_perimeter_multipolygon(mp: Column) -> Column:
    return _fsum(F.transform(mp, st_perimeter))


def st_length_multilinestring(mls: Column) -> Column:
    return _fsum(F.transform(mls, st_length))


def st_centroid_multipolygon(mp: Column) -> Column:
    """Area-weighted centroid across components: Σ(area_i · c_i) / Σarea_i.
    NULL for a degenerate (zero-total-area or empty) multipolygon —
    e.g. st_intersection of disjoint polygons — rather than a
    divide-by-zero."""
    wx = _fsum(F.transform(mp, lambda p: st_area(p) * st_centroid(p)["x"]))
    wy = _fsum(F.transform(mp, lambda p: st_area(p) * st_centroid(p)["y"]))
    total = st_area_multipolygon(mp)
    return F.when(
        total != 0,
        F.struct((wx / total).alias("x"), (wy / total).alias("y")),
    )


def st_contains_point_multipolygon(
    mp: Column, px: Column, py: Column
) -> Column:
    """Any component contains the point (components disjoint per OGC)."""
    return F.exists(mp, lambda p: st_contains_point(p, px, py))


def st_geomfromtext_multipolygon(wkt: Column) -> Column:
    """'MULTIPOLYGON (((x y, ...), (...)), ((...)))' ->
    array-of-polygons (Geospatial/Types.cpp GeoMultiPolygon WKT)."""
    body = F.regexp_replace(
        wkt, r"(?i)^\s*MULTIPOLYGON\s*\(\s*\(\s*\(", ""
    )
    body = F.regexp_replace(body, r"\)\s*\)\s*\)\s*$", "")
    polys = F.split(body, r"\)\s*\)\s*,\s*\(\s*\(")

    def parse_point(pt: Column) -> Column:
        parts = F.split(F.trim(pt), r"\s+")
        return F.struct(
            F.element_at(parts, 1).cast("double").alias("x"),
            F.element_at(parts, 2).cast("double").alias("y"),
        )

    def parse_poly(ptxt: Column) -> Column:
        rings = F.split(ptxt, r"\)\s*,\s*\(")
        return F.transform(
            rings,
            lambda r: _drop_closing_vertex(
                F.transform(F.split(r, ","), parse_point)
            ),
        )

    return F.transform(polys, parse_poly)


def st_astext_multipolygon(mp: Column) -> Column:
    def ring_text(r: Column) -> Column:
        return F.concat(
            F.lit("("),
            F.array_join(
                F.transform(
                    r,
                    lambda p: F.concat(
                        p["x"].cast("string"), F.lit(" "), p["y"].cast("string")
                    ),
                ),
                ", ",
            ),
            F.lit(")"),
        )

    def poly_text(p: Column) -> Column:
        return F.concat(
            F.lit("("),
            F.array_join(F.transform(p, ring_text), ", "),
            F.lit(")"),
        )

    return F.concat(
        F.lit("MULTIPOLYGON ("),
        F.array_join(F.transform(mp, poly_text), ", "),
        F.lit(")"),
    )


def st_geomfromtext_multipoint(wkt: Column) -> Column:
    """'MULTIPOINT (x y, x y, ...)' (also accepts the parenthesized
    '(x y), (x y)' form) -> array<point>."""
    body = F.regexp_replace(wkt, r"(?i)^\s*MULTIPOINT\s*\(", "")
    body = F.regexp_replace(body, r"\)\s*$", "")
    body = F.regexp_replace(body, r"[()]", "")

    def parse_point(pt: Column) -> Column:
        parts = F.split(F.trim(pt), r"\s+")
        return F.struct(
            F.element_at(parts, 1).cast("double").alias("x"),
            F.element_at(parts, 2).cast("double").alias("y"),
        )

    return F.transform(F.split(body, ","), parse_point)


# ------------------------------------------------------ general transform
#
# ST_Transform beyond the 4326<->900913 pair: WGS-84 -> UTM zone
# (EPSG 326xx) via the Gauss-Krueger/transverse-Mercator series
# (3rd order in the third flattening n — sub-mm over a UTM zone).
# Reference surface: the ST_Transform overloads of
# QueryEngine/ExtensionFunctionsGeo.hpp (arbitrary SRID via proj);
# here the projection math is closed-form so the same formula can run
# as a Spark Column expression AND as oracle SQL text. Both variants
# are generated from ONE formula over a tiny two-backend expression
# builder, so the floating-point operation structure is identical and
# results hash-match at 6 decimals.

_WGS84_A = 6378137.0
_WGS84_F = 1.0 / 298.257223563
_UTM_K0 = 0.9996
_UTM_E0 = 500000.0


class _SqlExpr:
    """String-building backend: arithmetic on parenthesized SQL text."""

    def __init__(self, s: str):
        self.s = f"({s})"

    def _b(self, op, o):
        o = o.s if isinstance(o, _SqlExpr) else repr(float(o))
        return _SqlExpr(f"{self.s} {op} {o}")

    def _rb(self, op, o):
        o = o.s if isinstance(o, _SqlExpr) else repr(float(o))
        return _SqlExpr(f"{o} {op} {self.s}")

    def __add__(self, o):
        return self._b("+", o)

    def __radd__(self, o):
        return self._rb("+", o)

    def __sub__(self, o):
        return self._b("-", o)

    def __rsub__(self, o):
        return self._rb("-", o)

    def __mul__(self, o):
        return self._b("*", o)

    def __rmul__(self, o):
        return self._rb("*", o)

    def __truediv__(self, o):
        return self._b("/", o)

    def __rtruediv__(self, o):
        return self._rb("/", o)

    def __neg__(self):
        return _SqlExpr(f"-{self.s}")


class _SqlOps:
    @staticmethod
    def fn(name):
        return lambda x: _SqlExpr(f"{name}({x.s})")

    def __init__(self):
        for f in ("sin", "cos", "atan", "asin", "exp", "ln", "sqrt",
                  "radians", "degrees"):
            setattr(self, f, self.fn(f))

    @staticmethod
    def atan2(y, x):
        return _SqlExpr(f"atan2({y.s}, {x.s})")


class _ColOps:
    sin = staticmethod(F.sin)
    cos = staticmethod(F.cos)
    atan = staticmethod(F.atan)
    asin = staticmethod(F.asin)
    atan2 = staticmethod(F.atan2)
    exp = staticmethod(F.exp)
    ln = staticmethod(F.log)
    sqrt = staticmethod(F.sqrt)
    radians = staticmethod(F.radians)
    degrees = staticmethod(F.degrees)


class _Datum:
    """Helmert 7-parameter datum transformation, stored in the EPSG
    'local datum -> WGS 84' position-vector convention (translation
    metres, rotations arc-seconds, scale ppm) together with the local
    ellipsoid. The reference reaches these through proj's +towgs84
    pipeline (Geospatial/ GDAL delegation); the parameters themselves
    are public EPSG registry values."""

    def __init__(self, a, inv_f, tx, ty, tz, rx_s, ry_s, rz_s, ds_ppm):
        import math

        self.a = float(a)
        self.f = 1.0 / float(inv_f)
        self.tx, self.ty, self.tz = float(tx), float(ty), float(tz)
        arc = math.pi / (180.0 * 3600.0)
        self.rx, self.ry, self.rz = rx_s * arc, ry_s * arc, rz_s * arc
        self.s = ds_ppm * 1e-6


# OSGB36 -> WGS 84 (EPSG transformation 1314, ~2 m accuracy over GB;
# the same 7 parameters proj ships as 27700's +towgs84). Airy 1830.
_OSGB36 = _Datum(6377563.396, 299.3249646,
                 446.448, -125.157, 542.060,
                 0.1502, 0.2470, 0.8421, -20.4894)
# ED50 -> WGS 84 (EPSG 1133 European mean, 3-parameter, ~10 m).
# International 1924 (Hayford) ellipsoid.
_ED50 = _Datum(6378388.0, 297.0, -87.0, -98.0, -121.0, 0.0, 0.0, 0.0, 0.0)


class _TMParams:
    """One transverse-Mercator projected CRS: ellipsoid (a, f), natural
    origin (lat0, lon0), scale k0, false easting/northing, and an
    optional Helmert datum (None = datum-matches-WGS84, e.g. GRS80
    CRSs treated as coincident, like proj does without a grid). The
    raw _tm_formula entry points are projection-only; `st_transform`
    composes the datum step for CRSs that declare one."""

    def __init__(self, a, inv_f, lat0, lon0, k0, e0, n0, datum=None):
        self.a = float(a)
        self.f = 1.0 / float(inv_f)
        self.lat0 = float(lat0)
        self.lon0 = float(lon0)
        self.k0 = float(k0)
        self.e0 = float(e0)
        self.n0 = float(n0)
        self.datum = datum


_GRS80_INV_F = 298.257222101
# EPSG transverse-Mercator parameter table (public EPSG registry
# values): UTM north/south on WGS-84, ETRS89 UTM (GRS80), and national
# TM grids — the reference accepts these via proj
# (ExtensionFunctionsGeo.hpp ST_Transform overloads + Geospatial/).
_EPSG_TM: dict[int, _TMParams] = {
    # OSGB36 / British National Grid (Airy 1830, OSGB36 datum)
    27700: _TMParams(6377563.396, 299.3249646, 49.0, -2.0,
                     0.9996012717, 400000.0, -100000.0, datum=_OSGB36),
    # IRENET95 / Irish Transverse Mercator (GRS80)
    2157: _TMParams(6378137.0, _GRS80_INV_F, 53.5, -8.0,
                    0.99982, 600000.0, 750000.0),
    # NZGD2000 / New Zealand Transverse Mercator (GRS80)
    2193: _TMParams(6378137.0, _GRS80_INV_F, 0.0, 173.0,
                    0.9996, 1600000.0, 10000000.0),
    # ETRS89-extended / LAEA is NOT TM; ETRS89 UTM zones are:
}
for _z in range(1, 61):
    _EPSG_TM[32600 + _z] = _TMParams(
        _WGS84_A, 298.257223563, 0.0, _z * 6 - 183, 0.9996, 500000.0, 0.0
    )
    _EPSG_TM[32700 + _z] = _TMParams(
        _WGS84_A, 298.257223563, 0.0, _z * 6 - 183, 0.9996, 500000.0,
        10000000.0,
    )
for _z in range(28, 39):  # ETRS89 / UTM zones 28N-38N
    _EPSG_TM[25800 + _z] = _TMParams(
        6378137.0, _GRS80_INV_F, 0.0, _z * 6 - 183, 0.9996, 500000.0, 0.0
    )
for _z in range(28, 39):  # ED50 / UTM zones 28N-38N (Hayford + datum)
    _EPSG_TM[23000 + _z] = _TMParams(
        6378388.0, 297.0, 0.0, _z * 6 - 183, 0.9996, 500000.0, 0.0,
        datum=_ED50,
    )


def _tm_coeffs(prm: _TMParams):
    n = prm.f / (2.0 - prm.f)
    big_a = (prm.a / (1.0 + n)) * (1.0 + n * n / 4.0 + n**4 / 64.0)
    return n, big_a


def _tm_m0(prm: _TMParams) -> float:
    """Meridian arc length (scaled by A) at the natural-origin latitude
    — a plain-Python constant folded into the series so the SQL text
    stays free of per-CRS branches."""
    import math

    if prm.lat0 == 0.0:
        return 0.0
    n, big_a = _tm_coeffs(prm)
    a1 = n / 2.0 - 2.0 * n * n / 3.0 + 5.0 * n**3 / 16.0
    a2 = 13.0 * n * n / 48.0 - 3.0 * n**3 / 5.0
    a3 = 61.0 * n**3 / 240.0
    c1 = 2.0 * math.sqrt(n) / (1.0 + n)
    phi = math.radians(prm.lat0)
    s = math.sin(phi)
    t = math.sinh(math.atanh(s) - c1 * math.atanh(c1 * s))
    xi = math.atan(t)
    north = xi
    for j, aj in ((1, a1), (2, a2), (3, a3)):
        north += aj * math.sin(2.0 * j * xi)
    return big_a * north


def _tm_formula(ops, lon, lat, prm: _TMParams):
    """Transverse-Mercator forward series (Krueger, 3rd order in n) for
    any _TMParams CRS, written once over either backend. sinh/cosh/
    atanh are spelled with exp/ln so Spark and DuckDB run the exact
    same primitive calls."""
    n, big_a = _tm_coeffs(prm)
    a1 = n / 2.0 - 2.0 * n * n / 3.0 + 5.0 * n**3 / 16.0
    a2 = 13.0 * n * n / 48.0 - 3.0 * n**3 / 5.0
    a3 = 61.0 * n**3 / 240.0
    c1 = 2.0 * (n ** 0.5) / (1.0 + n)
    lam0 = prm.lon0
    m0 = _tm_m0(prm)

    def atanh(x):
        return 0.5 * ops.ln((1.0 + x) / (1.0 - x))

    def sinh(x):
        return (ops.exp(x) - ops.exp(-x)) / 2.0

    def cosh(x):
        return (ops.exp(x) + ops.exp(-x)) / 2.0

    phi = ops.radians(lat)
    lam = ops.radians(lon - lam0)
    s = ops.sin(phi)
    t = sinh(atanh(s) - c1 * atanh(c1 * s))
    xi = ops.atan(t / ops.cos(lam))
    eta = atanh(ops.sin(lam) / ops.sqrt(1.0 + t * t))
    east = eta
    north = xi
    for j, aj in ((1, a1), (2, a2), (3, a3)):
        east = east + aj * ops.cos(2.0 * j * xi) * sinh(2.0 * j * eta)
        north = north + aj * ops.sin(2.0 * j * xi) * cosh(2.0 * j * eta)
    return (
        prm.e0 + prm.k0 * big_a * east,
        prm.n0 + prm.k0 * (big_a * north - m0),
    )


def _utm_formula(ops, lon, lat, zone: int):
    """UTM-north specialization of _tm_formula (kept for the existing
    Column/SQL entry points)."""
    return _tm_formula(ops, lon, lat, _EPSG_TM[32600 + zone])


def utm_from_wgs84(lon: Column, lat: Column, zone: int) -> Column:
    """ST_Transform(point, EPSG 326xx): WGS-84 lon/lat -> UTM easting/
    northing (northern-hemisphere false northing 0) as struct<x,y>."""
    e, nn = _utm_formula(_ColOps(), lon.cast("double"), lat.cast("double"), zone)
    return F.struct(e.alias("x"), nn.alias("y"))


def utm_from_wgs84_sql(lon_expr: str, lat_expr: str, zone: int) -> tuple[str, str]:
    """The ANSI-SQL text of `utm_from_wgs84` (for DuckDB oracles)."""
    e, nn = _utm_formula(_SqlOps(), _SqlExpr(lon_expr), _SqlExpr(lat_expr), zone)
    return e.s, nn.s


def _tm_inverse_formula(ops, easting, northing, prm: _TMParams):
    """Inverse transverse-Mercator series (3rd order in n) for any
    _TMParams CRS — the other direction of ExtensionFunctionsGeo.hpp's
    ST_Transform overloads."""
    n, big_a = _tm_coeffs(prm)
    b1 = n / 2.0 - 2.0 * n * n / 3.0 + 37.0 * n**3 / 96.0
    b2 = n * n / 48.0 + n**3 / 15.0
    b3 = 17.0 * n**3 / 480.0
    d1 = 2.0 * n - 2.0 * n * n / 3.0 - 2.0 * n**3
    d2 = 7.0 * n * n / 3.0 - 8.0 * n**3 / 5.0
    d3 = 56.0 * n**3 / 15.0
    lam0 = prm.lon0
    m0 = _tm_m0(prm)

    def sinh(x):
        return (ops.exp(x) - ops.exp(-x)) / 2.0

    def cosh(x):
        return (ops.exp(x) + ops.exp(-x)) / 2.0

    xi = (northing - prm.n0 + prm.k0 * m0) / (prm.k0 * big_a)
    eta = (easting - prm.e0) / (prm.k0 * big_a)
    xi_p = xi
    eta_p = eta
    for j, bj in ((1, b1), (2, b2), (3, b3)):
        xi_p = xi_p - bj * ops.sin(2.0 * j * xi) * cosh(2.0 * j * eta)
        eta_p = eta_p - bj * ops.cos(2.0 * j * xi) * sinh(2.0 * j * eta)
    chi = ops.asin(ops.sin(xi_p) / cosh(eta_p))
    phi = chi
    for j, dj in ((1, d1), (2, d2), (3, d3)):
        phi = phi + dj * ops.sin(2.0 * j * chi)
    lam = ops.atan(sinh(eta_p) / ops.cos(xi_p))
    return (
        lam0 + ops.degrees(lam),
        ops.degrees(phi),
    )


def _utm_inverse_formula(ops, easting, northing, zone: int):
    """UTM-north specialization of _tm_inverse_formula."""
    return _tm_inverse_formula(ops, easting, northing, _EPSG_TM[32600 + zone])


def tm_from_wgs84(lon: Column, lat: Column, srid: int) -> Column:
    """ST_Transform(point, any EPSG TM code in _EPSG_TM): WGS-84
    lon/lat -> projected easting/northing struct<x,y>."""
    e, nn = _tm_formula(
        _ColOps(), lon.cast("double"), lat.cast("double"), _EPSG_TM[srid]
    )
    return F.struct(e.alias("x"), nn.alias("y"))


def tm_from_wgs84_sql(lon_expr: str, lat_expr: str, srid: int) -> tuple[str, str]:
    """ANSI-SQL text of `tm_from_wgs84` (for DuckDB oracles)."""
    e, nn = _tm_formula(
        _SqlOps(), _SqlExpr(lon_expr), _SqlExpr(lat_expr), _EPSG_TM[srid]
    )
    return e.s, nn.s


def tm_to_wgs84(easting: Column, northing: Column, srid: int) -> Column:
    """Inverse of tm_from_wgs84 for any EPSG TM code in _EPSG_TM."""
    lon, lat = _tm_inverse_formula(
        _ColOps(), easting.cast("double"), northing.cast("double"),
        _EPSG_TM[srid],
    )
    return F.struct(lon.alias("x"), lat.alias("y"))


def tm_to_wgs84_sql(e_expr: str, n_expr: str, srid: int) -> tuple[str, str]:
    """ANSI-SQL text of `tm_to_wgs84` (for DuckDB oracles)."""
    lon, lat = _tm_inverse_formula(
        _SqlOps(), _SqlExpr(e_expr), _SqlExpr(n_expr), _EPSG_TM[srid]
    )
    return lon.s, lat.s


def utm_to_wgs84(easting: Column, northing: Column, zone: int) -> Column:
    """ST_Transform(EPSG 326xx -> 4326): UTM easting/northing -> WGS-84
    lon/lat struct<x,y> (inverse Krueger series; round-trips with
    utm_from_wgs84 to ~1e-9 degrees)."""
    return tm_to_wgs84(easting, northing, 32600 + zone)


def utm_to_wgs84_sql(e_expr: str, n_expr: str, zone: int) -> tuple[str, str]:
    """ANSI-SQL text of `utm_to_wgs84` (for DuckDB oracles)."""
    lon, lat = _utm_inverse_formula(
        _SqlOps(), _SqlExpr(e_expr), _SqlExpr(n_expr), zone
    )
    return lon.s, lat.s


# --------------------------------------------------------- datum shifts
#
# Helmert 7-parameter datum transformation for CRSs whose datum is not
# WGS-84-coincident (27700/OSGB36, 230xx/ED50): geodetic (h=0) ->
# geocentric XYZ -> position-vector Helmert -> geodetic on the other
# ellipsoid (Bowring's closed single-step inverse, sub-mm at h=0).
# The reference applies exactly this via proj's +towgs84 parameters;
# here each step is written once over the two expression backends so
# the oracle replays the identical floating-point structure. Each
# stage must be leaf-bound (_bind_once / a SQL subquery column) before
# feeding the next — the TM series references its inputs many times
# and inlining a datum-shift expression there blows the tree up
# multiplicatively.


def _geodetic_to_xyz_formula(ops, lon, lat, a: float, f: float):
    e2 = f * (2.0 - f)
    phi = ops.radians(lat)
    lam = ops.radians(lon)
    s = ops.sin(phi)
    big_n = a / ops.sqrt(1.0 - e2 * s * s)
    return (
        big_n * ops.cos(phi) * ops.cos(lam),
        big_n * ops.cos(phi) * ops.sin(lam),
        big_n * (1.0 - e2) * s,
    )


def _helmert_formula(x, y, z, d: _Datum, inverse: bool):
    """Position-vector Helmert LOCAL->WGS84; inverse=True applies the
    standard negated-parameter reverse (error << 1 mm at these
    magnitudes). Pure arithmetic — backend-agnostic."""
    sgn = -1.0 if inverse else 1.0
    m = 1.0 + sgn * d.s
    rx, ry, rz = sgn * d.rx, sgn * d.ry, sgn * d.rz
    return (
        sgn * d.tx + m * (x - rz * y + ry * z),
        sgn * d.ty + m * (rz * x + y - rx * z),
        sgn * d.tz + m * (-(ry * x) + rx * y + z),
    )


def _xyz_to_geodetic_formula(ops, x, y, z, a: float, f: float):
    """Bowring's closed-form geocentric -> geodetic (lat, lon only —
    height is discarded; input points are surface coordinates)."""
    b = a * (1.0 - f)
    e2 = f * (2.0 - f)
    ep2 = e2 / (1.0 - e2)
    p = ops.sqrt(x * x + y * y)
    theta = ops.atan2(z * a, p * b)
    st = ops.sin(theta)
    ct = ops.cos(theta)
    phi = ops.atan2(
        z + ep2 * b * st * st * st, p - e2 * a * ct * ct * ct
    )
    return ops.degrees(ops.atan2(y, x)), ops.degrees(phi)


def _wgs84_to_datum(ll: Column, d: _Datum) -> Column:
    """WGS-84 lon/lat struct -> lon/lat struct on datum `d`, each stage
    lambda-bound so no series ever inlines another."""
    ops = _ColOps()

    def to_xyz(q):
        x, y, z = _geodetic_to_xyz_formula(
            ops, q["x"], q["y"], _WGS84_A, _WGS84_F
        )
        return F.struct(x.alias("x"), y.alias("y"), z.alias("z"))

    def shift(q):
        x, y, z = _helmert_formula(q["x"], q["y"], q["z"], d, inverse=True)
        return F.struct(x.alias("x"), y.alias("y"), z.alias("z"))

    def to_geo(q):
        lon, lat = _xyz_to_geodetic_formula(
            ops, q["x"], q["y"], q["z"], d.a, d.f
        )
        return F.struct(lon.alias("x"), lat.alias("y"))

    return _bind_once(_bind_once(_bind_once(ll, to_xyz), shift), to_geo)


def _datum_to_wgs84(ll: Column, d: _Datum) -> Column:
    """Inverse of _wgs84_to_datum: local-datum lon/lat -> WGS-84."""
    ops = _ColOps()

    def to_xyz(q):
        x, y, z = _geodetic_to_xyz_formula(ops, q["x"], q["y"], d.a, d.f)
        return F.struct(x.alias("x"), y.alias("y"), z.alias("z"))

    def shift(q):
        x, y, z = _helmert_formula(
            q["x"], q["y"], q["z"], d, inverse=False
        )
        return F.struct(x.alias("x"), y.alias("y"), z.alias("z"))

    def to_geo(q):
        lon, lat = _xyz_to_geodetic_formula(
            ops, q["x"], q["y"], q["z"], _WGS84_A, _WGS84_F
        )
        return F.struct(lon.alias("x"), lat.alias("y"))

    return _bind_once(_bind_once(_bind_once(ll, to_xyz), shift), to_geo)


def tm_from_wgs84_full(lon: Column, lat: Column, srid: int) -> Column:
    """Reference-semantics ST_Transform(4326 -> srid): datum shift
    (when the CRS declares one) THEN the TM projection — what proj
    does for 27700/230xx. The raw tm_from_wgs84 stays projection-only."""
    prm = _EPSG_TM[srid]
    if prm.datum is None:
        return tm_from_wgs84(lon, lat, srid)
    ll = F.struct(
        lon.cast("double").alias("x"), lat.cast("double").alias("y")
    )
    shifted = _wgs84_to_datum(ll, prm.datum)
    return _bind_once(
        shifted,
        lambda q: F.struct(
            *(
                c.alias(n)
                for c, n in zip(
                    _tm_formula(_ColOps(), q["x"], q["y"], prm), ("x", "y")
                )
            )
        ),
    )


def tm_to_wgs84_full(easting: Column, northing: Column, srid: int) -> Column:
    """Reference-semantics ST_Transform(srid -> 4326): inverse TM THEN
    the datum shift back to WGS-84."""
    prm = _EPSG_TM[srid]
    if prm.datum is None:
        return tm_to_wgs84(easting, northing, srid)
    local = tm_to_wgs84(easting, northing, srid)  # local-datum lon/lat
    return _datum_to_wgs84(local, prm.datum)


def datum_sql_stages(
    lon_expr: str, lat_expr: str, srid: int, inverse: bool = False,
    prefix: str = "",
) -> list[list[tuple[str, str]]]:
    """The ANSI-SQL text of the three datum-shift stages (for DuckDB
    oracles), as [(alias, expr), ...] lists per stage; the caller lays
    each stage in its own subquery/CTE so expressions stay leaf-fed,
    mirroring the _bind_once chain. inverse=False: WGS84 -> local
    datum (the forward-projection direction). `prefix` namespaces the
    intermediate column aliases so several pipelines can share one
    CTE chain."""
    d = _EPSG_TM[srid].datum
    ops = _SqlOps()
    src = (_WGS84_A, _WGS84_F) if not inverse else (d.a, d.f)
    dst = (d.a, d.f) if not inverse else (_WGS84_A, _WGS84_F)
    g = [prefix + n for n in ("gx", "gy", "gz")]
    h = [prefix + n for n in ("hx", "hy", "hz")]
    o = [prefix + n for n in ("lon2", "lat2")]
    x, y, z = _geodetic_to_xyz_formula(
        ops, _SqlExpr(lon_expr), _SqlExpr(lat_expr), *src
    )
    stage1 = list(zip(g, (x.s, y.s, z.s)))
    hx, hy, hz = _helmert_formula(
        _SqlExpr(g[0]), _SqlExpr(g[1]), _SqlExpr(g[2]), d,
        inverse=not inverse,
    )
    stage2 = list(zip(h, (hx.s, hy.s, hz.s)))
    lon2, lat2 = _xyz_to_geodetic_formula(
        ops, _SqlExpr(h[0]), _SqlExpr(h[1]), _SqlExpr(h[2]), *dst
    )
    stage3 = list(zip(o, (lon2.s, lat2.s)))
    return [stage1, stage2, stage3]


def st_transform_900913_4326(p: Column) -> Column:
    """ST_Transform(point, 900913 -> 4326): inverse Web Mercator with
    the reference's constants (ExtensionFunctions.hpp conv_900913_4326
    direction) — exact inverse of st_transform_4326_900913."""
    return F.struct(
        (p["x"] / 111319.490778).alias("x"),
        (
            (F.atan(F.exp(p["y"] / 6378136.99911)) - 0.785398163397)
            / 0.00872664626
        ).alias("y"),
    )


def _bind_once(struct_col: Column, fn) -> Column:
    """Evaluate `struct_col` once by binding it to a higher-order-
    function lambda variable. The transform series reference their
    input point dozens of times; naive Column composition would inline
    the full input expression at every reference — a multiplicative
    expression-tree blow-up that OOMs the driver at plan build when
    transforms chain. The lambda variable is a leaf, so each series
    stays O(its own size)."""
    return F.element_at(F.transform(F.array(struct_col), fn), 1)


def st_transform(p: Column, from_srid: int, to_srid: int) -> Column:
    """SRID-dispatching ST_Transform (the reference's overload surface,
    QueryEngine/ExtensionFunctionsGeo.hpp): closed-form SRIDs are 4326,
    900913, and every EPSG code in the _EPSG_TM transverse-Mercator
    table (UTM north 326xx, UTM south 327xx, ETRS89 UTM 258xx, ED50
    UTM 230xx, and the 27700/2157/2193 national grids); any supported
    pair composes through the 4326 pivot (proj pivots the same way).
    CRSs that declare a Helmert datum (27700/OSGB36, 230xx/ED50) get
    the 7-parameter datum shift applied around the projection, exactly
    like proj's +towgs84 path in the reference; grid-based datums
    (NAD27/NADCON, OSTN) remain out of scope. Other projections raise
    (the reference delegates them to proj, an out-of-container
    dependency). The input point is lambda-bound once so chained
    transforms can't blow up the expression tree."""
    if from_srid == to_srid:
        return p
    return _bind_once(p, lambda q: _st_transform_leaf(q, from_srid, to_srid))


def _st_transform_leaf(p: Column, from_srid: int, to_srid: int) -> Column:
    """Dispatch on a leaf-like point (lambda variable or plain column
    struct) — every branch may reference p.x/p.y freely."""
    if (from_srid, to_srid) == (4326, 900913):
        return st_transform_4326_900913(p)
    if (from_srid, to_srid) == (900913, 4326):
        return st_transform_900913_4326(p)
    if from_srid == 4326 and to_srid in _EPSG_TM:
        return tm_from_wgs84_full(p["x"], p["y"], to_srid)
    if to_srid == 4326 and from_srid in _EPSG_TM:
        return tm_to_wgs84_full(p["x"], p["y"], from_srid)
    if from_srid in _EPSG_TM and (
        to_srid in _EPSG_TM or to_srid == 900913
    ):
        ll = tm_to_wgs84_full(p["x"], p["y"], from_srid)
        return _bind_once(ll, lambda q: _st_transform_leaf(q, 4326, to_srid))
    if from_srid == 900913 and to_srid in _EPSG_TM:
        ll = st_transform_900913_4326(p)
        return _bind_once(
            ll, lambda q: tm_from_wgs84_full(q["x"], q["y"], to_srid)
        )
    raise ValueError(
        f"ST_Transform {from_srid}->{to_srid} unsupported; closed-form "
        "SRIDs are 4326, 900913, and the EPSG transverse-Mercator table "
        "(UTM north/south 326xx/327xx, ETRS89 UTM 258xx, ED50 UTM "
        "230xx, 27700, 2157, 2193), any pair composed through 4326. "
        "Helmert datum shifts are applied for 27700/230xx; other "
        "projections and grid-based datums need proj (reference: "
        "GDAL/proj delegation)."
    )


# ------------------------------------------------- SQL function surface
#
# The reference's geo ops are SQL functions (ST_Point/ST_X/ST_Distance/
# ST_DWithin/ST_Contains..., QueryEngine/ExtensionFunctionsGeo.hpp) —
# register the point-math subset as Spark SQL scalar functions (CREATE
# FUNCTION ... RETURN <expr>) so HeavyDB geo SQL strings run through
# `engine.sql` and stay fully JVM-side (no Python UDF).

_GEO_SQL_FUNCS = {
    "st_point": """
        CREATE OR REPLACE TEMPORARY FUNCTION st_point(x DOUBLE, y DOUBLE)
        RETURNS STRUCT<x: DOUBLE, y: DOUBLE>
        RETURN CASE WHEN x IS NULL OR y IS NULL
                    THEN CAST(NULL AS STRUCT<x: DOUBLE, y: DOUBLE>)
                    ELSE named_struct('x', x, 'y', y) END
    """,
    "st_x": """
        CREATE OR REPLACE TEMPORARY FUNCTION st_x(p STRUCT<x: DOUBLE, y: DOUBLE>)
        RETURNS DOUBLE RETURN p.x
    """,
    "st_y": """
        CREATE OR REPLACE TEMPORARY FUNCTION st_y(p STRUCT<x: DOUBLE, y: DOUBLE>)
        RETURNS DOUBLE RETURN p.y
    """,
    "st_distance": """
        CREATE OR REPLACE TEMPORARY FUNCTION st_distance(
            a STRUCT<x: DOUBLE, y: DOUBLE>, b STRUCT<x: DOUBLE, y: DOUBLE>)
        RETURNS DOUBLE
        RETURN sqrt((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y))
    """,
    "st_dwithin": """
        CREATE OR REPLACE TEMPORARY FUNCTION st_dwithin(
            a STRUCT<x: DOUBLE, y: DOUBLE>, b STRUCT<x: DOUBLE, y: DOUBLE>,
            d DOUBLE)
        RETURNS BOOLEAN
        RETURN sqrt((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)) <= d
    """,
    "distance_in_meters": """
        CREATE OR REPLACE TEMPORARY FUNCTION distance_in_meters(
            lon1 DOUBLE, lat1 DOUBLE, lon2 DOUBLE, lat2 DOUBLE)
        RETURNS DOUBLE
        RETURN 2 * 6372797.560856 * asin(sqrt(
            pow(sin((radians(lat2) - radians(lat1)) / 2), 2)
            + cos(radians(lat1)) * cos(radians(lat2))
              * pow(sin((radians(lon2) - radians(lon1)) / 2), 2)))
    """,
    "conv_4326_900913_x": """
        CREATE OR REPLACE TEMPORARY FUNCTION conv_4326_900913_x(x DOUBLE)
        RETURNS DOUBLE RETURN x * 111319.490778
    """,
    # ---- geometry-typed SQL surface (array-of-rings representation,
    # ARRAY<ARRAY<STRUCT<x,y>>>; POINT/LINESTRING normalize into it via
    # st_geomfromtext). Pure SQL bodies mirroring the Column helpers
    # above formula for formula (shoelace area with holes, area-weighted
    # centroid, even-odd ray cast, open-path length); st_intersects
    # delegates to the GEOS overlay kernel (functions/geos.py), so it
    # must register AFTER register_geos_functions (register_all order).
    # SQL scalar functions cannot overload, so st_astext takes the
    # POINT struct (the polygon spelling stays on the Column API).
    "st_area": """
        CREATE OR REPLACE TEMPORARY FUNCTION st_area(g ARRAY<ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>>) RETURNS DOUBLE RETURN element_at(transform(g, r -> abs((aggregate(transform(r, (a, i) -> CAST((a.x * element_at(r, ((i + 1) % size(r)) + 1).y - element_at(r, ((i + 1) % size(r)) + 1).x * a.y) AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) / 2.0))), 1) * 2 - aggregate(transform(g, r -> abs((aggregate(transform(r, (a, i) -> CAST((a.x * element_at(r, ((i + 1) % size(r)) + 1).y - element_at(r, ((i + 1) % size(r)) + 1).x * a.y) AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) / 2.0))), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)
    """,
    "st_perimeter": """
        CREATE OR REPLACE TEMPORARY FUNCTION st_perimeter(g ARRAY<ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>>) RETURNS DOUBLE RETURN aggregate(transform(g, r -> aggregate(transform(r, (a, i) -> CAST((sqrt((a.x - element_at(r, ((i + 1) % size(r)) + 1).x) * (a.x - element_at(r, ((i + 1) % size(r)) + 1).x) + (a.y - element_at(r, ((i + 1) % size(r)) + 1).y) * (a.y - element_at(r, ((i + 1) % size(r)) + 1).y))) AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)
    """,
    "st_centroid": """
        CREATE OR REPLACE TEMPORARY FUNCTION st_centroid(g ARRAY<ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>>) RETURNS STRUCT<x: DOUBLE, y: DOUBLE> RETURN named_struct('x', (aggregate(transform(g, (r, ri) -> (CASE WHEN ri = 0 THEN 1.0 ELSE -1.0 END) * (aggregate(transform(r, (a, i) -> CAST(((a.x + element_at(r, ((i + 1) % size(r)) + 1).x) * (a.x * element_at(r, ((i + 1) % size(r)) + 1).y - element_at(r, ((i + 1) % size(r)) + 1).x * a.y)) AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)) * signum((aggregate(transform(r, (a, i) -> CAST((a.x * element_at(r, ((i + 1) % size(r)) + 1).y - element_at(r, ((i + 1) % size(r)) + 1).x * a.y) AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) / 2.0)) / 6.0), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)) / st_area(g), 'y', (aggregate(transform(g, (r, ri) -> (CASE WHEN ri = 0 THEN 1.0 ELSE -1.0 END) * (aggregate(transform(r, (a, i) -> CAST(((a.y + element_at(r, ((i + 1) % size(r)) + 1).y) * (a.x * element_at(r, ((i + 1) % size(r)) + 1).y - element_at(r, ((i + 1) % size(r)) + 1).x * a.y)) AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)) * signum((aggregate(transform(r, (a, i) -> CAST((a.x * element_at(r, ((i + 1) % size(r)) + 1).y - element_at(r, ((i + 1) % size(r)) + 1).x * a.y) AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) / 2.0)) / 6.0), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)) / st_area(g))
    """,
    "st_contains": """
        CREATE OR REPLACE TEMPORARY FUNCTION st_contains(g ARRAY<ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>>, p STRUCT<x: DOUBLE, y: DOUBLE>) RETURNS BOOLEAN RETURN CAST(aggregate(transform(g, r -> aggregate(transform(r, (a, i) -> CAST((CASE WHEN ((a.y > p.y) != (element_at(r, ((i + 1) % size(r)) + 1).y > p.y)) AND (p.x < a.x + (element_at(r, ((i + 1) % size(r)) + 1).x - a.x) * (p.y - a.y) / (element_at(r, ((i + 1) % size(r)) + 1).y - a.y)) THEN 1.0 ELSE 0.0 END) AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) AS BIGINT) % 2 = 1
    """,
    "st_numrings": """
        CREATE OR REPLACE TEMPORARY FUNCTION st_numrings(g ARRAY<ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>>) RETURNS INT RETURN size(g)
    """,
    "st_npoints": """
        CREATE OR REPLACE TEMPORARY FUNCTION st_npoints(g ARRAY<ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>>) RETURNS INT RETURN CAST(aggregate(transform(g, r -> size(r)), 0, (acc, v) -> acc + v) AS INT)
    """,
    "st_length": """
        CREATE OR REPLACE TEMPORARY FUNCTION st_length(g ARRAY<ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>>) RETURNS DOUBLE RETURN aggregate(sequence(1, size(element_at(g, 1)) - 1), CAST(0.0 AS DOUBLE), (acc, i) -> acc + sqrt(pow(element_at(element_at(g, 1), i).x - element_at(element_at(g, 1), i + 1).x, 2) + pow(element_at(element_at(g, 1), i).y - element_at(element_at(g, 1), i + 1).y, 2)))
    """,
    "st_geomfromtext": r"""
        CREATE OR REPLACE TEMPORARY FUNCTION st_geomfromtext(wkt STRING) RETURNS ARRAY<ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>> RETURN
        transform(regexp_extract_all(wkt, '\\(([^()]+)\\)', 1),
            r -> transform(split(r, ','), s -> named_struct('x', CAST(element_at(split(trim(s), '\\s+'), 1) AS DOUBLE), 'y', CAST(element_at(split(trim(s), '\\s+'), 2) AS DOUBLE))))
    """,
    "st_astext": """
        CREATE OR REPLACE TEMPORARY FUNCTION st_astext(p STRUCT<x: DOUBLE, y: DOUBLE>) RETURNS STRING RETURN concat('POINT (', CAST(p.x AS STRING), ' ', CAST(p.y AS STRING), ')')
    """,
    "st_transform": """
        CREATE OR REPLACE TEMPORARY FUNCTION st_transform(p STRUCT<x: DOUBLE, y: DOUBLE>, srid INT) RETURNS STRUCT<x: DOUBLE, y: DOUBLE> RETURN CASE
        WHEN srid = 900913 THEN named_struct(
            'x', p.x * 111319.490778,
            'y', 6378136.99911 * ln(tan(0.00872664626 * p.y + 0.785398163397)))
        WHEN srid = 4326 THEN p
        ELSE named_struct(
            'x', CAST(raise_error(concat('ST_Transform: unsupported SRID ',
                 CAST(srid AS STRING), ' in the SQL form; the DataFrame API ',
                 'adds the EPSG transverse-Mercator table (UTM north/south, ',
                 'ETRS89 UTM, 27700, 2157, 2193)')) AS DOUBLE),
            'y', CAST(NULL AS DOUBLE))
    END
    """,
    "st_intersects": """
        CREATE OR REPLACE TEMPORARY FUNCTION st_intersects(a ARRAY<ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>>, b ARRAY<ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>>) RETURNS BOOLEAN RETURN size(st_intersection(a, b)) > 0
    """,
    "st_buffer": """
        CREATE OR REPLACE TEMPORARY FUNCTION st_buffer(p STRUCT<x: DOUBLE, y: DOUBLE>, radius DOUBLE) RETURNS ARRAY<ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>> RETURN array(transform(sequence(0, 31), i -> named_struct('x', p.x + radius * cos(2 * pi() * i / 32), 'y', p.y + radius * sin(2 * pi() * i / 32))))
    """,
    "st_startpoint": """
        CREATE OR REPLACE TEMPORARY FUNCTION st_startpoint(g ARRAY<ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>>) RETURNS STRUCT<x: DOUBLE, y: DOUBLE> RETURN element_at(element_at(g, 1), 1)
    """,
    "st_endpoint": """
        CREATE OR REPLACE TEMPORARY FUNCTION st_endpoint(g ARRAY<ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>>) RETURNS STRUCT<x: DOUBLE, y: DOUBLE> RETURN element_at(element_at(g, 1), size(element_at(g, 1)))
    """,
    "st_pointn": """
        CREATE OR REPLACE TEMPORARY FUNCTION st_pointn(g ARRAY<ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>>, n INT) RETURNS STRUCT<x: DOUBLE, y: DOUBLE> RETURN element_at(element_at(g, 1), n)
    """,
    "st_xmin": """
        CREATE OR REPLACE TEMPORARY FUNCTION st_xmin(g ARRAY<ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>>) RETURNS DOUBLE RETURN array_min(flatten(transform(g, r -> transform(r, q -> q.x))))
    """,
    "st_xmax": """
        CREATE OR REPLACE TEMPORARY FUNCTION st_xmax(g ARRAY<ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>>) RETURNS DOUBLE RETURN array_max(flatten(transform(g, r -> transform(r, q -> q.x))))
    """,
    "st_ymin": """
        CREATE OR REPLACE TEMPORARY FUNCTION st_ymin(g ARRAY<ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>>) RETURNS DOUBLE RETURN array_min(flatten(transform(g, r -> transform(r, q -> q.y))))
    """,
    "st_ymax": """
        CREATE OR REPLACE TEMPORARY FUNCTION st_ymax(g ARRAY<ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>>) RETURNS DOUBLE RETURN array_max(flatten(transform(g, r -> transform(r, q -> q.y))))
    """,
    "conv_4326_900913_y": """
        CREATE OR REPLACE TEMPORARY FUNCTION conv_4326_900913_y(y DOUBLE)
        RETURNS DOUBLE
        RETURN 6378136.99911 * ln(tan(0.00872664626 * y + 0.785398163397))
    """,
}


# Reference-parity predicate/accessor closeouts
# (java/calcite .../HeavyDBSqlOperatorTable.java registered names):
# ST_Within is argument-swapped ST_Contains; ST_Disjoint negates
# ST_Intersects; ST_Equals is the reference's own lowering
# "ST_Distance(g1, g2) <= 0.0" (RelAlgTranslatorGeo.cpp:1449, point
# form); ST_DFullyWithin is the max-distance band
# (ExtensionFunctionsGeo.hpp ST_DFullyWithin = ST_MaxDistance <= d);
# ST_IsEmpty / ST_IsValid on the array-of-rings representation —
# validity here is the basic structural check (nonempty, every ring
# holds >= 3 distinct vertices); full GEOS self-intersection validity
# is out of scope (COVERAGE.md); ST_NRings is the reference spelling
# of st_numrings; ST_IntersectsBox is the raw bounds-overlap test
# (ExtensionFunctionsGeo.hpp ST_IntersectsBox).
_GEO_SQL_FUNCS["st_within"] = """
    CREATE OR REPLACE TEMPORARY FUNCTION st_within(
        p STRUCT<x: DOUBLE, y: DOUBLE>,
        g ARRAY<ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>>)
    RETURNS BOOLEAN RETURN st_contains(g, p)
"""
_GEO_SQL_FUNCS["st_disjoint"] = """
    CREATE OR REPLACE TEMPORARY FUNCTION st_disjoint(
        a ARRAY<ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>>,
        b ARRAY<ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>>)
    RETURNS BOOLEAN RETURN NOT st_intersects(a, b)
"""
_GEO_SQL_FUNCS["st_equals"] = """
    CREATE OR REPLACE TEMPORARY FUNCTION st_equals(
        a STRUCT<x: DOUBLE, y: DOUBLE>, b STRUCT<x: DOUBLE, y: DOUBLE>)
    RETURNS BOOLEAN RETURN st_distance(a, b) <= 0.0
"""
_GEO_SQL_FUNCS["st_isempty"] = """
    CREATE OR REPLACE TEMPORARY FUNCTION st_isempty(
        g ARRAY<ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>>)
    RETURNS BOOLEAN
    RETURN g IS NULL OR aggregate(transform(g, r -> size(r)), 0,
                                  (acc, v) -> acc + v) = 0
"""
_GEO_SQL_FUNCS["st_isvalid"] = """
    CREATE OR REPLACE TEMPORARY FUNCTION st_isvalid(
        g ARRAY<ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>>)
    RETURNS BOOLEAN
    RETURN g IS NOT NULL AND size(g) > 0
           AND forall(g, r -> size(array_distinct(r)) >= 3)
"""
_GEO_SQL_FUNCS["st_nrings"] = """
    CREATE OR REPLACE TEMPORARY FUNCTION st_nrings(
        g ARRAY<ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>>)
    RETURNS INT RETURN size(g)
"""
_GEO_SQL_FUNCS["st_intersectsbox"] = """
    CREATE OR REPLACE TEMPORARY FUNCTION st_intersectsbox(
        xmin1 DOUBLE, ymin1 DOUBLE, xmax1 DOUBLE, ymax1 DOUBLE,
        xmin2 DOUBLE, ymin2 DOUBLE, xmax2 DOUBLE, ymax2 DOUBLE)
    RETURNS BOOLEAN
    RETURN xmin1 <= xmax2 AND xmax1 >= xmin2
           AND ymin1 <= ymax2 AND ymax1 >= ymin2
"""


# ST_MaxDistance(POINT, LINESTRING|POLYGON) — max cartesian distance
# from the point to the geometry's vertex set (the maximum over a
# segment is attained at one of its endpoints, so the vertex max IS
# the geometry max; ExtensionFunctionsGeo.hpp:3847-3930).
_GEO_SQL_FUNCS["st_maxdistance"] = """
    CREATE OR REPLACE TEMPORARY FUNCTION st_maxdistance(
        p STRUCT<x: DOUBLE, y: DOUBLE>,
        g ARRAY<ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>>)
    RETURNS DOUBLE
    RETURN aggregate(flatten(g), CAST(0.0 AS DOUBLE),
        (acc, q) -> greatest(acc,
            sqrt((p.x - q.x) * (p.x - q.x) + (p.y - q.y) * (p.y - q.y))))
"""

# Must register after st_maxdistance — the SQL body calls it.
_GEO_SQL_FUNCS["st_dfullywithin"] = """
    CREATE OR REPLACE TEMPORARY FUNCTION st_dfullywithin(
        p STRUCT<x: DOUBLE, y: DOUBLE>,
        g ARRAY<ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>>, d DOUBLE)
    RETURNS BOOLEAN RETURN st_maxdistance(p, g) <= d
"""

# ---------------------------------------------------------------------
# r11: full typed geometry dispatch (GeospatialTest.cpp GeoSpatial.Math
# — the reference's closed-form geo kernels over every geometry tag
# pair, ExtensionFunctionsGeo.hpp).  Each geometry rides as its
# array-of-rings form PLUS a kind tag (1 POINT, 2 MULTIPOINT,
# 3 LINESTRING, 4 MULTILINESTRING, 5 POLYGON, 6 MULTIPOLYGON); the
# dialect resolves the tag statically for literals and at runtime
# (geo_kind) for WKT string columns.
#
# Spark SQL scalar functions cannot be CALLED with lambda variables
# (the inliner loses the enclosing lambda scope), so every kernel that
# iterates segment/ring lambdas is built as ONE fully-inlined
# expression; the Python helpers below assemble those expressions so
# each geometric formula is written once.

def _pt_seg_sql(px, py, ax, ay, bx, by):
    """Point-(px,py) to segment-(a,b) distance (clamped projection)."""
    t = (f"greatest(CAST(0.0 AS DOUBLE), least(CAST(1.0 AS DOUBLE), "
         f"(({px}-{ax})*({bx}-{ax}) + ({py}-{ay})*({by}-{ay})) / "
         f"(({bx}-{ax})*({bx}-{ax}) + ({by}-{ay})*({by}-{ay}))))")
    gen = (f"sqrt(({px} - ({ax} + {t} * ({bx}-{ax})))"
           f" * ({px} - ({ax} + {t} * ({bx}-{ax})))"
           f" + ({py} - ({ay} + {t} * ({by}-{ay})))"
           f" * ({py} - ({ay} + {t} * ({by}-{ay}))))")
    degen = f"sqrt(({px}-{ax})*({px}-{ax}) + ({py}-{ay})*({py}-{ay}))"
    return (f"(CASE WHEN {ax} = {bx} AND {ay} = {by} THEN {degen} "
            f"ELSE {gen} END)")


def _orient_sql(px, py, qx, qy, rx, ry):
    return f"(({qx}-{px})*({ry}-{py}) - ({qy}-{py})*({rx}-{px}))"


def _seg_seg_sql(ax, ay, bx, by, cx, cy, dx, dy):
    """Segment-segment distance: 0 on proper interior crossing (strict
    orientation products); touches/collinear overlaps fall out of the
    four endpoint point-segment minima."""
    o1 = _orient_sql(ax, ay, bx, by, cx, cy)
    o2 = _orient_sql(ax, ay, bx, by, dx, dy)
    o3 = _orient_sql(cx, cy, dx, dy, ax, ay)
    o4 = _orient_sql(cx, cy, dx, dy, bx, by)
    return (f"(CASE WHEN {o1} * {o2} < 0 AND {o3} * {o4} < 0 "
            f"THEN CAST(0.0 AS DOUBLE) ELSE least("
            f"{_pt_seg_sql(cx, cy, ax, ay, bx, by)}, "
            f"{_pt_seg_sql(dx, dy, ax, ay, bx, by)}, "
            f"{_pt_seg_sql(ax, ay, cx, cy, dx, dy)}, "
            f"{_pt_seg_sql(bx, by, cx, cy, dx, dy)}) END)")


def _raycast_sql(g, px, py):
    """Even-odd point-in-ring-set (the st_contains formula inlined so
    it can sit under a lambda)."""
    nxt = "element_at(r9, ((i9 + 1) % size(r9)) + 1)"
    return (f"(CAST(aggregate(transform({g}, r9 -> aggregate(transform("
            f"r9, (a9, i9) -> CAST((CASE WHEN ((a9.y > {py}) != "
            f"({nxt}.y > {py})) AND ({px} < a9.x + ({nxt}.x - a9.x) * "
            f"({py} - a9.y) / ({nxt}.y - a9.y)) THEN 1.0 ELSE 0.0 END) "
            f"AS DOUBLE)), CAST(0.0 AS DOUBLE), (c9, v9) -> c9 + v9)), "
            f"CAST(0.0 AS DOUBLE), (c8, v8) -> c8 + v8) AS BIGINT) "
            f"% 2 = 1)")


def _ring_fan2_sql(r):
    """Signed double-area of ring `r` by fan decomposition from its
    first vertex (centroid_add_triangle, ExtensionFunctionsGeo.hpp
    :1654)."""
    return (f"(CASE WHEN size({r}) < 3 THEN CAST(0.0 AS DOUBLE) ELSE "
            f"aggregate(sequence(2, size({r}) - 1), CAST(0.0 AS DOUBLE),"
            f" (f2, i2) -> f2 + ((element_at({r}, i2).x - "
            f"element_at({r}, 1).x) * (element_at({r}, i2 + 1).y - "
            f"element_at({r}, 1).y) - (element_at({r}, i2 + 1).x - "
            f"element_at({r}, 1).x) * (element_at({r}, i2).y - "
            f"element_at({r}, 1).y))) END)")


def _ring_fancg_sql(r, c):
    """Fan-decomposition centroid numerator for coordinate `c`."""
    return (f"(CASE WHEN size({r}) < 3 THEN CAST(0.0 AS DOUBLE) ELSE "
            f"aggregate(sequence(2, size({r}) - 1), CAST(0.0 AS DOUBLE),"
            f" (f3, i3) -> f3 + ((element_at({r}, i3).x - "
            f"element_at({r}, 1).x) * (element_at({r}, i3 + 1).y - "
            f"element_at({r}, 1).y) - (element_at({r}, i3 + 1).x - "
            f"element_at({r}, 1).x) * (element_at({r}, i3).y - "
            f"element_at({r}, 1).y)) * (element_at({r}, 1).{c} + "
            f"element_at({r}, i3).{c} + element_at({r}, i3 + 1).{c})) "
            f"END)")


def _ring_area2_sql(r):
    """Signed shoelace double-area (wraparound form handles closed and
    unclosed WKT rings alike)."""
    nxt = f"element_at({r}, ((i4 + 1) % size({r})) + 1)"
    return (f"(aggregate(transform({r}, (a4, i4) -> CAST(a4.x * {nxt}.y"
            f" - {nxt}.x * a4.y AS DOUBLE)), CAST(0.0 AS DOUBLE), "
            f"(c4, v4) -> c4 + v4))")


_SEG_LEN = ("sqrt((s.bx-s.ax)*(s.bx-s.ax) + (s.by-s.ay)*(s.by-s.ay))")


def _is_hole_sql(g: str, r: str, ri: str) -> str:
    """Even-odd hole classification for the flat MULTIPOLYGON ring set
    (the WKT parse keeps rings in order but loses polygon grouping):
    ring `r` (0-based index `ri`) is an interior ring iff an ODD number
    of OTHER rings contain a probe vertex — disjoint exteriors nest
    in nothing (0), holes nest in their exterior (1), island-in-lake
    exteriors nest in two (even). Matches ST_Area_MultiPolygon's
    hole subtraction / exterior-only perimeter
    (ExtensionFunctionsGeo.hpp) without the reference's per-polygon
    ring counts (r11 advice: every ring was treated as exterior).

    Probes by MAJORITY VOTE over three spread vertices (1, 1+n/3,
    1+2n/3), not the first vertex alone: in tessellations a ring's
    first vertex often lies exactly ON a neighboring ring's boundary,
    where the raycast parity is arbitrary (r12 advice). A ring whose
    probe vertices ALL sit on other rings' boundaries (fully shared
    edges) remains arbitrary — documented as a semantic delta in
    COVERAGE.md."""
    def _vote(idx: str) -> str:
        inside = _raycast_sql(
            "array(q0)",
            f"element_at({r}, {idx}).x", f"element_at({r}, {idx}).y")
        return (f"(aggregate(transform({g}, (q0, q1) -> CAST(CASE WHEN "
                f"q1 != {ri} AND {inside} THEN 1 ELSE 0 END AS BIGINT)), "
                f"CAST(0 AS BIGINT), (h0, h1) -> h0 + h1) % 2)")

    v1 = _vote("1")
    v2 = _vote(f"(1 + CAST(size({r}) / 3 AS INT))")
    v3 = _vote(f"(1 + CAST(2 * size({r}) / 3 AS INT))")
    return f"((({v1}) + ({v2}) + ({v3})) >= 2)"


def _ring_perim_sql(r: str) -> str:
    """Closed perimeter of one ring, inlined (a SQL scalar function
    like geo_segments cannot take a lambda variable): wraparound
    consecutive-vertex distances — the wrap edge is degenerate when
    the WKT ring already repeats its first point."""
    nxt = f"element_at({r}, ((i6 + 1) % size({r})) + 1)"
    return (f"(aggregate(transform({r}, (p6, i6) -> sqrt("
            f"({nxt}.x - p6.x) * ({nxt}.x - p6.x) + "
            f"({nxt}.y - p6.y) * ({nxt}.y - p6.y))), "
            f"CAST(0.0 AS DOUBLE), (c6, v6) -> c6 + v6))")
_HAVERSINE_SEG = (
    "(2 * 6372797.560856 * asin(sqrt("
    "pow(sin((radians(s.by) - radians(s.ay)) / 2), 2)"
    " + cos(radians(s.ay)) * cos(radians(s.by))"
    "   * pow(sin((radians(s.bx) - radians(s.ax)) / 2), 2))))")

_GEO_SQL_FUNCS["geo_kind"] = """
    CREATE OR REPLACE TEMPORARY FUNCTION geo_kind(wkt STRING)
    RETURNS INT RETURN CASE
        WHEN upper(trim(wkt)) LIKE 'MULTIPOINT%' THEN 2
        WHEN upper(trim(wkt)) LIKE 'MULTILINESTRING%' THEN 4
        WHEN upper(trim(wkt)) LIKE 'MULTIPOLYGON%' THEN 6
        WHEN upper(trim(wkt)) LIKE 'POINT%' THEN 1
        WHEN upper(trim(wkt)) LIKE 'LINESTRING%' THEN 3
        WHEN upper(trim(wkt)) LIKE 'POLYGON%' THEN 5
        ELSE 0 END
"""

# flatten a ring set into segments; `closed` appends the wrap edge
# (degenerate when the WKT ring already repeats its first point); the
# open form appends a degenerate first-vertex segment to keep the
# branch types aligned (zero length, on-path — harmless everywhere)
_GEO_SQL_FUNCS["geo_segments"] = """
    CREATE OR REPLACE TEMPORARY FUNCTION geo_segments(
        g ARRAY<ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>>, closed BOOLEAN)
    RETURNS ARRAY<STRUCT<ax: DOUBLE, ay: DOUBLE, bx: DOUBLE, by: DOUBLE>>
    RETURN flatten(transform(g, r -> CASE
        WHEN size(r) < 2 THEN array(named_struct(
            'ax', element_at(r, 1).x, 'ay', element_at(r, 1).y,
            'bx', element_at(r, 1).x, 'by', element_at(r, 1).y))
        ELSE concat(
            transform(sequence(1, size(r) - 1), i -> named_struct(
                'ax', element_at(r, i).x, 'ay', element_at(r, i).y,
                'bx', element_at(r, i + 1).x, 'by',
                element_at(r, i + 1).y)),
            CASE WHEN closed THEN array(named_struct(
                'ax', element_at(r, size(r)).x,
                'ay', element_at(r, size(r)).y,
                'bx', element_at(r, 1).x, 'by', element_at(r, 1).y))
            ELSE array(named_struct(
                'ax', element_at(r, 1).x, 'ay', element_at(r, 1).y,
                'bx', element_at(r, 1).x, 'by', element_at(r, 1).y))
            END)
        END))
"""

# typed distance over any kind pair (ST_Distance_* matrix,
# ExtensionFunctionsGeo.hpp): 0 when an areal side contains a vertex
# of the other (even-odd over ALL rings — a point inside a hole is
# NOT contained and measures to the hole boundary); otherwise the
# minimum over the segment-pair cross product.  Boundary touches and
# edge crossings surface as 0 through the segment distance.
_GEO_SQL_FUNCS["st_distance_any"] = f"""
    CREATE OR REPLACE TEMPORARY FUNCTION st_distance_any(
        a ARRAY<ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>>, ka INT,
        b ARRAY<ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>>, kb INT)
    RETURNS DOUBLE RETURN CASE
        WHEN a IS NULL OR b IS NULL THEN CAST(NULL AS DOUBLE)
        WHEN ka = 0 OR kb = 0 OR size(flatten(a)) = 0
             OR size(flatten(b)) = 0 THEN CAST(NULL AS DOUBLE)
        WHEN ka >= 5 AND exists(flatten(b),
            v -> {_raycast_sql('a', 'v.x', 'v.y')})
            THEN CAST(0.0 AS DOUBLE)
        WHEN kb >= 5 AND exists(flatten(a),
            v -> {_raycast_sql('b', 'v.x', 'v.y')})
            THEN CAST(0.0 AS DOUBLE)
        ELSE aggregate(geo_segments(a, ka >= 5),
            CAST('Infinity' AS DOUBLE),
            (ac1, s) -> least(ac1, aggregate(geo_segments(b, kb >= 5),
                CAST('Infinity' AS DOUBLE),
                (ac2, t) -> least(ac2, {_seg_seg_sql(
                    's.ax', 's.ay', 's.bx', 's.by',
                    't.ax', 't.ay', 't.bx', 't.by')}))))
        END
"""

# boundary-inclusive intersects (the reference's ST_Intersects counts
# vertex/edge touches — GeoSpatial.Math corner-touch expectations)
_GEO_SQL_FUNCS["st_intersects_any"] = """
    CREATE OR REPLACE TEMPORARY FUNCTION st_intersects_any(
        a ARRAY<ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>>, ka INT,
        b ARRAY<ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>>, kb INT)
    RETURNS BOOLEAN RETURN st_distance_any(a, ka, b, kb) <= 0.0
"""

# ST_Length sums ALL member linestrings (ST_Length_MultiLineString,
# ExtensionFunctionsGeo.hpp:1211); non-linear kinds are 0
_GEO_SQL_FUNCS["st_length_any"] = f"""
    CREATE OR REPLACE TEMPORARY FUNCTION st_length_any(
        g ARRAY<ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>>, k INT)
    RETURNS DOUBLE RETURN CASE
        WHEN g IS NULL THEN CAST(NULL AS DOUBLE)
        WHEN k IN (3, 4) THEN aggregate(geo_segments(g, false),
            CAST(0.0 AS DOUBLE), (acc, s) -> acc + {_SEG_LEN})
        ELSE CAST(0.0 AS DOUBLE) END
"""

# ST_Perimeter counts ONLY exterior rings: ring 1 for POLYGON
# (ST_Perimeter_Polygon:1245); for MULTIPOLYGON every NON-HOLE ring
# (perimeter_multipolygon sums each polygon's exterior — hole rings
# classified even-odd, see _is_hole_sql)
_GEO_SQL_FUNCS["st_perimeter_any"] = f"""
    CREATE OR REPLACE TEMPORARY FUNCTION st_perimeter_any(
        g ARRAY<ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>>, k INT)
    RETURNS DOUBLE RETURN CASE
        WHEN g IS NULL THEN CAST(NULL AS DOUBLE)
        WHEN k = 5 THEN aggregate(geo_segments(slice(g, 1, 1), true),
            CAST(0.0 AS DOUBLE), (acc, s) -> acc + {_SEG_LEN})
        WHEN k = 6 THEN aggregate(transform(g, (r, ri) -> CASE
            WHEN {_is_hole_sql('g', 'r', 'ri')} THEN CAST(0.0 AS DOUBLE)
            ELSE {_ring_perim_sql('r')} END),
            CAST(0.0 AS DOUBLE), (c5, v5) -> c5 + v5)
        ELSE CAST(0.0 AS DOUBLE) END
"""

# ST_Area subtracts hole rings: ring 1 positive + holes negative for
# POLYGON (ST_Area_Polygon); per-ring even-odd sign for MULTIPOLYGON
# (ST_Area_MultiPolygon sums polygon areas, each exterior minus holes)
_GEO_SQL_FUNCS["st_area_any"] = f"""
    CREATE OR REPLACE TEMPORARY FUNCTION st_area_any(
        g ARRAY<ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>>, k INT)
    RETURNS DOUBLE RETURN CASE
        WHEN g IS NULL THEN CAST(NULL AS DOUBLE)
        WHEN k = 5 THEN abs({_ring_area2_sql('element_at(g, 1)')}) / 2.0
            - aggregate(slice(g, 2, greatest(0, size(g) - 1)),
                CAST(0.0 AS DOUBLE),
                (c5, r) -> c5 + abs({_ring_area2_sql('r')}) / 2.0)
        WHEN k = 6 THEN aggregate(transform(g, (r, ri) ->
            (CASE WHEN {_is_hole_sql('g', 'r', 'ri')}
                  THEN CAST(-1.0 AS DOUBLE)
                  ELSE CAST(1.0 AS DOUBLE) END)
            * abs({_ring_area2_sql('r')}) / 2.0),
            CAST(0.0 AS DOUBLE), (c5, v5) -> c5 + v5)
        ELSE CAST(0.0 AS DOUBLE) END
"""


def _len_centroid_sql(closed):
    """Segment-length-weighted midpoint centroid over geo_segments."""
    segs = f"geo_segments(g, {closed})"
    L = (f"aggregate({segs}, CAST(0.0 AS DOUBLE), "
         f"(acc, s) -> acc + {_SEG_LEN})")
    def w(c1, c2):
        return (f"aggregate({segs}, CAST(0.0 AS DOUBLE), (acc, s) -> "
                f"acc + {_SEG_LEN} * (s.{c1} + s.{c2}) / 2.0) / {L}")
    return L, (f"named_struct('x', {w('ax', 'bx')}, "
               f"'y', {w('ay', 'by')})")


def _fan_sign(k='k'):
    return (f"(CASE WHEN {k} = 5 AND ri > 0 THEN CAST(-1.0 AS DOUBLE) "
            f"ELSE CAST(1.0 AS DOUBLE) END)")


def _centroid_any_sql():
    """ST_Centroid dispatch (ExtensionFunctionsGeo.hpp:1490-1860):
    point/multipoint -> mean of all vertices; line kinds ->
    length-weighted midpoints with first-point fallback; areal kinds ->
    winding-normalized fan decomposition (ring 1 positive, POLYGON
    holes negative — the reference's importer canonicalizes winding,
    its kernel then signs by ring index), zero-area falls back to the
    CLOSED length centroid, then to ring first points."""
    a2 = (f"aggregate(transform(g, (r, ri) -> {_fan_sign()} * "
          f"abs({_ring_fan2_sql('r')})), CAST(0.0 AS DOUBLE), "
          f"(c6, v6) -> c6 + v6)")
    def cg(c):
        return (f"aggregate(transform(g, (r, ri) -> {_fan_sign()} * "
                f"signum({_ring_fan2_sql('r')}) * "
                f"{_ring_fancg_sql('r', c)}), CAST(0.0 AS DOUBLE), "
                f"(c7, v7) -> c7 + v7) / 3.0 / {a2}")
    l_open, c_open = _len_centroid_sql('false')
    l_closed, c_closed = _len_centroid_sql('true')
    first_pts = (
        "named_struct('x', aggregate(g, CAST(0.0 AS DOUBLE), "
        "(cp, r) -> cp + element_at(r, 1).x) / size(g), "
        "'y', aggregate(g, CAST(0.0 AS DOUBLE), "
        "(cp, r) -> cp + element_at(r, 1).y) / size(g))")
    mean_pts = (
        "named_struct('x', aggregate(flatten(g), CAST(0.0 AS DOUBLE), "
        "(cm, v) -> cm + v.x) / size(flatten(g)), "
        "'y', aggregate(flatten(g), CAST(0.0 AS DOUBLE), "
        "(cm, v) -> cm + v.y) / size(flatten(g)))")
    return f"""
    CREATE OR REPLACE TEMPORARY FUNCTION st_centroid_any(
        g ARRAY<ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>>, k INT)
    RETURNS STRUCT<x: DOUBLE, y: DOUBLE> RETURN CASE
        WHEN g IS NULL THEN CAST(NULL AS STRUCT<x: DOUBLE, y: DOUBLE>)
        WHEN k <= 2 THEN {mean_pts}
        WHEN k <= 4 THEN CASE WHEN {l_open} > 0 THEN {c_open}
                              ELSE {first_pts} END
        ELSE CASE WHEN {a2} != 0 THEN named_struct(
                      'x', {cg('x')}, 'y', {cg('y')})
                  WHEN {l_closed} > 0 THEN {c_closed}
                  ELSE {first_pts} END
        END
"""


_GEO_SQL_FUNCS["st_centroid_any"] = _centroid_any_sql()

# geos-backed ST_Equals for non-point geometries (GeospatialTest.cpp
# :2961): true geometric equality, decided here as mutual
# boundary-membership (every vertex of each side at distance 0 from
# the other side's segment set) plus equal area and equal boundary
# length — vertex-set reorderings, reversals, and collinear vertex
# insertions (the square-vs-pentagon pin) all compare equal, mirror
# shapes and subset shapes do not.  Point pairs keep the reference's
# own distance<=0 lowering (RelAlgTranslatorGeo.cpp:1449).
def _equals_any_sql():
    def on_boundary(side, segs_other):
        d = _pt_seg_sql('v.x', 'v.y', 's.ax', 's.ay', 's.bx', 's.by')
        return (f"forall(flatten({side}), v -> aggregate({segs_other}, "
                f"CAST('Infinity' AS DOUBLE), (ac, s) -> least(ac, {d}))"
                f" <= 0.0)")
    return f"""
    CREATE OR REPLACE TEMPORARY FUNCTION st_equals_any(
        a ARRAY<ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>>, ka INT,
        b ARRAY<ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>>, kb INT)
    RETURNS BOOLEAN RETURN CASE
        WHEN a IS NULL OR b IS NULL THEN CAST(NULL AS BOOLEAN)
        ELSE {on_boundary('a', 'geo_segments(b, kb >= 5)')}
         AND {on_boundary('b', 'geo_segments(a, ka >= 5)')}
         AND abs(st_area_any(a, ka) - st_area_any(b, kb)) < 1e-9
         AND abs(aggregate(geo_segments(a, ka >= 5),
                 CAST(0.0 AS DOUBLE), (acc, s) -> acc + {_SEG_LEN})
               - aggregate(geo_segments(b, kb >= 5),
                 CAST(0.0 AS DOUBLE), (acc, s) -> acc + {_SEG_LEN}))
             < 1e-9
        END
"""


_GEO_SQL_FUNCS["st_equals_any"] = _equals_any_sql()

# vertex-wise ring-set transform to web mercator (the SQL form's one
# supported target; the DataFrame API carries the EPSG table)
_GEO_SQL_FUNCS["st_transform_rings"] = """
    CREATE OR REPLACE TEMPORARY FUNCTION st_transform_rings(
        g ARRAY<ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>>, srid INT)
    RETURNS ARRAY<ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>> RETURN CASE
        WHEN srid = 4326 THEN g
        WHEN srid = 900913 THEN transform(g, r -> transform(r,
            p -> named_struct(
                'x', p.x * 111319.490778,
                'y', 6378136.99911
                     * ln(tan(0.00872664626 * p.y + 0.785398163397)))))
        ELSE array(array(named_struct(
            'x', CAST(raise_error(concat(
                'ST_Transform: unsupported SRID ',
                CAST(srid AS STRING), ' in the SQL form; the DataFrame ',
                'API adds the EPSG transverse-Mercator table (UTM ',
                'north/south, ETRS89 UTM, 27700, 2157, 2193)'))
                AS DOUBLE),
            'y', CAST(NULL AS DOUBLE)))) END
"""

# geodesic kernels (GEOGRAPHY surface): the reference's haversine with
# its exact 6372797.560856 m radius (ExtensionFunctions.hpp:433-446)
_GEO_SQL_FUNCS["st_distance_geog"] = """
    CREATE OR REPLACE TEMPORARY FUNCTION st_distance_geog(
        a STRUCT<x: DOUBLE, y: DOUBLE>, b STRUCT<x: DOUBLE, y: DOUBLE>)
    RETURNS DOUBLE RETURN distance_in_meters(a.x, a.y, b.x, b.y)
"""

_GEO_SQL_FUNCS["st_length_geog"] = f"""
    CREATE OR REPLACE TEMPORARY FUNCTION st_length_geog(
        g ARRAY<ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>>)
    RETURNS DOUBLE RETURN aggregate(geo_segments(g, false),
        CAST(0.0 AS DOUBLE), (acc, s) -> acc + {_HAVERSINE_SEG})
"""

_GEO_SQL_FUNCS["st_perimeter_geog"] = f"""
    CREATE OR REPLACE TEMPORARY FUNCTION st_perimeter_geog(
        g ARRAY<ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>>, k INT)
    RETURNS DOUBLE RETURN CASE
        WHEN k = 5 THEN aggregate(geo_segments(slice(g, 1, 1), true),
            CAST(0.0 AS DOUBLE), (acc, s) -> acc + {_HAVERSINE_SEG})
        ELSE aggregate(geo_segments(g, true), CAST(0.0 AS DOUBLE),
            (acc, s) -> acc + {_HAVERSINE_SEG})
        END
"""


def st_maxdistance(p: Column, g: Column) -> Column:
    """ST_MaxDistance(POINT, geometry) — Column form of the SQL
    function above."""
    return F.aggregate(
        F.flatten(g),
        F.lit(0.0),
        lambda acc, q: F.greatest(
            acc,
            F.sqrt(
                (p["x"] - q["x"]) * (p["x"] - q["x"])
                + (p["y"] - q["y"]) * (p["y"] - q["y"])
            ),
        ),
    )


def _wkb_le(geom_type: int, coords: list) -> bytes:
    import struct

    out = [b"\x01", struct.pack("<I", geom_type)]
    out += [struct.pack("<d", v) for v in coords]
    return b"".join(out)


def _make_wkb_udfs():
    """ST_AsBinary / ST_AsWkb exports (ExtensionFunctionsGeo.hpp
    ST_AsBinary/ST_AsWkb): standard little-endian WKB. IEEE-754 byte
    packing has no SQL builtin, so these are the one geo export family
    that runs as Arrow-batched pandas kernels (geometry-local,
    map-only)."""
    import struct

    import pandas as pd

    @F.pandas_udf("binary")
    def point_udf(s: pd.DataFrame) -> pd.Series:
        # a struct argument arrives as a DataFrame with the fields as
        # columns (Arrow struct -> pandas)
        return pd.Series(
            [
                None
                if pd.isna(x) or pd.isna(y)
                else _wkb_le(1, [float(x), float(y)])
                for x, y in zip(s["x"], s["y"])
            ]
        )

    @F.pandas_udf("binary")
    def line_udf(s: pd.Series) -> pd.Series:
        out = []
        for ring in s:
            if ring is None:
                out.append(None)
                continue
            pts = [(float(q["x"]), float(q["y"])) for q in ring]
            body = b"\x01" + struct.pack("<II", 2, len(pts))
            body += b"".join(struct.pack("<dd", x, y) for x, y in pts)
            out.append(body)
        return pd.Series(out)

    @F.pandas_udf("binary")
    def poly_udf(s: pd.Series) -> pd.Series:
        out = []
        for rings in s:
            if rings is None:
                out.append(None)
                continue
            body = b"\x01" + struct.pack("<II", 3, len(rings))
            for ring in rings:
                pts = [(float(q["x"]), float(q["y"])) for q in ring]
                if pts and pts[0] != pts[-1]:
                    pts.append(pts[0])
                body += struct.pack("<I", len(pts))
                body += b"".join(struct.pack("<dd", x, y) for x, y in pts)
            out.append(body)
        return pd.Series(out)

    return point_udf, line_udf, poly_udf


_WKB_UDFS: list = []


def _wkb_udfs():
    # created lazily: pandas_udf return-type parsing needs an active
    # session, which does not exist at import time
    if not _WKB_UDFS:
        _WKB_UDFS.extend(_make_wkb_udfs())
    return _WKB_UDFS


def st_aswkb_point(p: Column) -> Column:
    """WKB POINT (01 01000000 x y) — ST_AsBinary/ST_AsWkb."""
    return _wkb_udfs()[0](p)


def st_aswkb_linestring(line: Column) -> Column:
    """WKB LINESTRING (type 2) from one ring of points."""
    return _wkb_udfs()[1](line)


def st_aswkb_polygon(g: Column) -> Column:
    """WKB POLYGON (type 3); rings are closed on output as WKB
    requires."""
    return _wkb_udfs()[2](g)


def register_geo_functions(spark) -> None:
    import logging

    for name, ddl in _GEO_SQL_FUNCS.items():
        try:
            spark.sql(ddl)
        except Exception as exc:
            # SQL scalar UDFs unavailable -> DataFrame helpers still
            # work; log which function failed so a later
            # UNRESOLVED_ROUTINE is traceable to its cause.
            logging.getLogger(__name__).warning(
                "geo SQL function %s not registered: %s", name, exc
            )
    # WKB exports by name for SQL strings (ST_AsWkb is the reference's
    # alias of ST_AsBinary; per-type names because SQL scalar functions
    # cannot overload by geometry type)
    point_udf, line_udf, poly_udf = _wkb_udfs()
    spark.udf.register("st_asbinary", point_udf)
    spark.udf.register("st_aswkb", point_udf)
    spark.udf.register("st_asbinary_line", line_udf)
    spark.udf.register("st_asbinary_poly", poly_udf)
