"""r11 GeoSpatial.Math parity pins — the classes the repo-wide
constant-assertion comparator (scripts/constant_assertions_probe.py)
surfaced, each pinned with the reference's own expected values.

References: Tests/GeospatialTest.cpp GeoSpatial.Math (expectations
quoted per test), QueryEngine/ExtensionFunctionsGeo.hpp (the
ST_Distance_* matrix, ST_Length_MultiLineString:1211,
ST_Perimeter_Polygon:1245 exterior-only, ST_Centroid:1490 dispatch),
ExtensionFunctions.hpp:433 (haversine, radius 6372797.560856),
Tests/ExecuteTest.cpp Select.SampleRatio.
"""
import pytest


def _f(engine, sql):
    return engine.sql(sql).first()[0]


def test_distance_full_matrix(engine):
    # GeoSpatial.Math ST_Distance expectations (tolerance 0.01)
    cases = [
        ("'LINESTRING(-2 2, 2 2)', 'LINESTRING(4 2, 4 3)'", 2.0),
        ("'LINESTRING(-2 2, 2 2, 2 0)', 'LINESTRING(4 0, 0 -4, -4 0, "
         "0 4)'", 0.0),
        ("ST_GeomFromText('POINT(5 -1)'), ST_GeomFromText('POLYGON((2 2,"
         " -2 2, -2 -2, 2 -2, 2 2))')", 3.0),
        # point INSIDE the hole measures to the hole boundary
        ("ST_GeomFromText('POLYGON((2 2, -2 2, -2 -2, 2 -2, 2 2), "
         "(1 1, -1 1, -1 -1, 1 -1, 1 1))'), ST_GeomFromText("
         "'POINT(0.5 0.5)')", 0.5),
        ("'POLYGON((2 2, -2 2, -2 -2, 2 -2, 2 2), (1 1, -1 1, -1 -1, "
         "1 -1, 1 1))', 'POLYGON((4 2, 5 2, 5 3, 4 3, 4 2))'", 2.0),
        ("'POLYGON((0 0, 4 0, 4 4, 2 5, 0 4, 0 0), (1 1, 1 3, 2 4, 3 3,"
         " 3 1, 1 1))', 'POLYGON((5 5, 8 2, 8 4, 5 5))'", 1.4142),
    ]
    for args, want in cases:
        got = float(_f(engine, f"SELECT ST_Distance({args})"))
        assert abs(got - want) < 0.01, (args, got, want)


def test_length_multilinestring_sums_members(engine):
    # ST_Length_MultiLineString sums every member path
    got = float(_f(engine, "SELECT ST_Length('MULTILINESTRING((1 0, 0 1,"
                           " -1 0, 0 -1, 1 0),(2 2,2 3))')"))
    assert abs(got - 6.65685) < 0.0001


def test_perimeter_exterior_only(engine):
    # ST_Perimeter_Polygon measures ONLY the exterior ring
    got = float(_f(engine, "SELECT ST_Perimeter('POLYGON((1 0, 0 1, "
                           "-1 0, 0 -1, 1 0),(0.1 0, 0 0.1, -0.1 0, "
                           "0 -0.1, 0.1 0))')"))
    assert abs(got - 5.65685) < 0.0001


def test_intersects_boundary_inclusive(engine):
    # corner/vertex touches intersect; ST_Disjoint negates
    r = engine.sql(
        "SELECT ST_Intersects(ST_GeomFromText('POINT(1 1)'), "
        "ST_GeomFromText('LINESTRING(2 0, 0 2, -2 0, 0 -2)')) AS a, "
        "ST_Intersects(ST_GeomFromText('POLYGON((2 2, 0 1, -2 2, -2 0, "
        "2 0, 2 2))'), ST_GeomFromText('LINESTRING(3 3, 3 2, 2 2)')) "
        "AS b, ST_Disjoint(ST_GeomFromText('POLYGON((2 2, 0 1, -2 2, "
        "-2 0, 2 0, 2 2))'), ST_GeomFromText('LINESTRING(3 3, 3 2, "
        "2 2)')) AS c").first()
    assert r["a"] is True and r["b"] is True and r["c"] is False


def test_centroid_dispatch(engine):
    # multipoint mean-of-all; linestring length-weighted midpoints;
    # zero-area polygon falls back to the closed length centroid
    cases = [
        ("'POINT(0.8 0.8)', ST_Centroid('MULTIPOINT(0 0, 2 0, 2 2, "
         "0 2, 0 0)')", 0.0),
        ("'POINT(1.3333333 1)', ST_Centroid('LINESTRING(0 0, 2 0, 2 2,"
         " 0 2)')", 0.0),
        ("'POINT(1.0 1.0)', ST_Centroid('POLYGON((0 0, 2 2, 0 2, 2 0, "
         "0 0))')", 0.0),
        ("'POINT(0.166666666 0.933333333)', ST_Centroid('MULTIPOLYGON("
         "((1 0,2 1,2 0,1 0)),((-1 -1,2 2,-1 2,-1 -1)))')", 0.0),
        ("'POINT(1.585786 1.0)', ST_Centroid('MULTIPOLYGON(((0 0, 2 2,"
         " 0 2, 2 0, 0 0)),((3 0, 3 2, 3 1, 3 0)))')", 0.0),
    ]
    for args, want in cases:
        got = float(_f(engine, f"SELECT ST_Distance({args})"))
        assert abs(got - want) < 0.0001, (args, got)


def test_geography_geodesic(engine):
    # LA-Paris ~9105.6 km through every geography spelling, on the
    # reference's exact haversine radius (tolerance 10 km)
    for sql in (
        "SELECT ST_Distance(ST_GeogFromText('POINT(-118.4079 33.9434)',"
        " 4326), ST_GeogFromText('POINT(2.5559 49.0083)', 4326))",
        "SELECT ST_Distance(CastToGeography(ST_GeomFromText("
        "'POINT(-118.4079 33.9434)', 4326)), cast (ST_GeomFromText("
        "'POINT(2.5559 49.0083)', 4326) as geography))",
    ):
        assert abs(float(_f(engine, sql)) - 9105643.0) < 10000.0
    # geodesic DWithin band + the non-POINT geography reject
    r = engine.sql(
        "SELECT ST_DWithin(ST_GeogFromText('POINT(-118.4079 33.9434)', "
        "4326), ST_GeogFromText('POINT(2.5559 49.0083)', 4326), "
        "9500000.0) AS a, ST_DWithin(ST_GeogFromText("
        "'POINT(-118.4079 33.9434)', 4326), ST_GeogFromText("
        "'POINT(2.5559 49.0083)', 4326), 9000000.0) AS b").first()
    assert r["a"] is True and r["b"] is False
    with pytest.raises(Exception):
        engine.sql(
            "SELECT ST_DWithin(ST_GeogFromText('POLYGON((-118.4079 "
            "33.9434, -119.4079 32.9434, -117.4079 34.9434))', 4326), "
            "ST_GeogFromText('POINT(2.5559 49.0083)', 4326), 9000000.0)"
        ).collect()


def test_st_point_null_and_sample_ratio_null(engine):
    r = engine.sql(
        "SELECT ST_Point(1.0, CAST(NULL AS DOUBLE)) IS NULL AS a, "
        "ST_Point(CAST(NULL AS DOUBLE), 1.0) IS NULL AS b, "
        "sample_ratio(null) AS c").first()
    assert r["a"] is True and r["b"] is True and r["c"] is False


def test_st_equals_nonpoint(engine):
    # geos-backed ST_Equals (GeospatialTest.cpp:2961): reorderings,
    # reversals, and collinear-vertex insertions equal; mirrors do not
    r = engine.sql(
        "SELECT ST_Equals('POLYGON((0 0, 1 1, 1 0))', "
        "'POLYGON((0 0, 1 0, 1 1))') AS a, "
        "ST_Equals('LINESTRING(0 0, 1 1)', 'POINT(0 0)') AS b, "
        "ST_Equals('POLYGON((0 0, 1 1, 1 0))', "
        "'POLYGON((0 0, 1 1, 0 1))') AS c, "
        "ST_Equals('LINESTRING(0 0, 1 1)', 'LINESTRING(1 1, 0 0)') "
        "AS d, ST_Equals('POLYGON((0 0, 2 0, 2 2, 0 2))', "
        "'MULTIPOLYGON(((0 1, 0 2, 2 2, 2 0, 0 0)))') AS e").first()
    assert (r["a"], r["b"], r["c"], r["d"], r["e"]) == (
        True, False, False, True, True)


def test_geomfromtext_multipolygon_parse(engine):
    # the r11 comparator found nested-paren WKT silently corrupting
    # first/last coordinates (NULL x/y) — pin the parse
    g = _f(engine, "SELECT st_geomfromtext('MULTIPOLYGON(((1 0,2 1,"
                   "2 0,1 0)),((-1 -1,2 2,-1 2,-1 -1)))')")
    assert [[(p["x"], p["y"]) for p in ring] for ring in g] == [
        [(1.0, 0.0), (2.0, 1.0), (2.0, 0.0), (1.0, 0.0)],
        [(-1.0, -1.0), (2.0, 2.0), (-1.0, 2.0), (-1.0, -1.0)]]


def test_transform_rings_and_buffer_meters(engine):
    # ring-wise 900913 transform; 4326-tagged buffer radius in meters
    ymin = float(_f(engine, "SELECT ST_YMin(ST_Transform("
                            "ST_GeomFromText('LINESTRING (-118.4079 "
                            "33.9434, 2.5559 49.0083)', 4326), "
                            "900913))"))
    assert abs(ymin - 4021204.558) < 0.01  # GeospatialTest.cpp:2528
    r = engine.sql(
        "SELECT ST_Contains(ST_Buffer(ST_SetSRID(ST_Point(0, 0), 4326),"
        " 10.0), ST_SetSRID(ST_Point(0, 0), 4326)) AS a, "
        "ST_Contains(ST_Buffer(ST_SetSRID(ST_Point(0, 0), 4326), 10.0),"
        " ST_SetSRID(ST_Point(1, 0), 4326)) AS b").first()
    assert r["a"] is True and r["b"] is False


def test_multipolygon_hole_rings_area_perimeter(engine):
    """r11 advice: MULTIPOLYGON interior rings must subtract from
    ST_Area and be excluded from ST_Perimeter (ST_Area_MultiPolygon /
    perimeter_multipolygon sum per-polygon exterior-minus-holes) —
    rings classify even-odd, so island-in-lake nests stay correct."""
    mp = ("MULTIPOLYGON(((0 0,10 0,10 10,0 10,0 0),(2 2,4 2,4 4,2 4,"
          "2 2)),((20 0,21 0,21 1,20 1,20 0)))")
    assert float(_f(engine,
        f"SELECT ST_Area(ST_GeomFromText('{mp}'))")) == 97.0
    assert float(_f(engine,
        f"SELECT ST_Perimeter(ST_GeomFromText('{mp}'))")) == 44.0
    # disjoint no-hole multipolygon unchanged
    mp2 = "MULTIPOLYGON(((0 0,2 0,2 2,0 2,0 0)),((5 5,6 5,6 6,5 6,5 5)))"
    assert float(_f(engine,
        f"SELECT ST_Area(ST_GeomFromText('{mp2}'))")) == 5.0
    assert float(_f(engine,
        f"SELECT ST_Perimeter(ST_GeomFromText('{mp2}'))")) == 12.0
    # island-in-lake: the island's exterior nests in TWO rings (even)
    mp3 = ("MULTIPOLYGON(((0 0,10 0,10 10,0 10,0 0),(2 2,8 2,8 8,2 8,"
           "2 2)),((4 4,6 4,6 6,4 6,4 4)))")
    assert float(_f(engine,
        f"SELECT ST_Area(ST_GeomFromText('{mp3}'))")) == 68.0


def test_geo_junk_and_transform_guards(engine):
    """r11 advice: a non-geometry string column value yields NULL (not
    Infinity) from the distance kernels; ST_Transform raises on an
    unsupported SRID instead of silently returning NULL; a point-struct
    consumer reads through ST_Transform of a WKT point column."""
    spark = engine.spark
    spark.sql("DROP TABLE IF EXISTS geo_guard_pin")
    engine.sql("CREATE TABLE geo_guard_pin (w POINT, junk TEXT)")
    try:
        engine.sql("INSERT INTO geo_guard_pin VALUES ('POINT(1 0)', 'notgeo')")
        r = engine.sql(
            "SELECT ST_Distance(junk, 'POINT(0 0)') AS d, "
            "ST_X(ST_Transform(w, 900913)) AS x FROM geo_guard_pin"
        ).first()
        assert r["d"] is None
        assert abs(r["x"] - 111319.490778) < 1e-6
        with pytest.raises(Exception, match="unsupported SRID"):
            engine.sql(
                "SELECT ST_X(ST_Transform(w, 12345)) FROM geo_guard_pin"
            ).collect()
    finally:
        spark.sql("DROP TABLE IF EXISTS geo_guard_pin")


def test_geography_cast_pair_not_spliced(engine):
    """r11 advice: _strip_geog's CAST branch takes the same balanced-
    paren guard as ST_GeogFromText — a compound argument holding two
    CAST(.. AS GEOGRAPHY) sub-expressions must not splice a garbled
    inner geometry."""
    got = float(_f(engine,
        "SELECT ST_Distance(CAST('POINT(0 0)' AS GEOGRAPHY), "
        "CAST('POINT(0 1)' AS GEOGRAPHY))"))
    assert abs(got - 111226.3) < 0.5


def test_multipolygon_shared_vertex_tessellation(engine):
    """r12 advice: hole classification probed only each ring's FIRST
    vertex — when that vertex lies exactly ON a neighboring ring's
    boundary (tessellations share corners), the raycast parity is
    arbitrary and a touching exterior could be misclassified as a
    hole. Majority vote over three spread vertices fixes the
    shared-corner case."""
    # ring 2's first vertex (2,0) is a corner of ring 1; both are
    # exteriors — area must ADD, perimeter must include both
    mp = ("MULTIPOLYGON(((0 0,2 0,2 2,0 2,0 0)),"
          "((2 0,4 0,4 2,2 0)))")
    assert float(_f(engine,
        f"SELECT ST_Area(ST_GeomFromText('{mp}'))")) == 6.0
    # square + triangle sharing one corner, triangle first
    mp2 = ("MULTIPOLYGON(((2 0,4 0,4 2,2 0)),"
           "((0 0,2 0,2 2,0 2,0 0)))")
    assert float(_f(engine,
        f"SELECT ST_Area(ST_GeomFromText('{mp2}'))")) == 6.0
    # hole whose first vertex touches the exterior from inside still
    # classifies as a hole (majority of its vertices are interior)
    mp3 = ("MULTIPOLYGON(((0 0,10 0,10 10,0 10,0 0),"
           "(0 0,4 2,2 4,0 0)))")
    assert float(_f(engine,
        f"SELECT ST_Area(ST_GeomFromText('{mp3}'))")) == 94.0
