"""H3-shaped hexagonal geo-indexing functions.

Reference: QueryEngine/ExtensionFunctionsH3.hpp (H3_LonLatToCell /
H3_PointToCell / H3_CellToLon / H3_CellToLat / H3_CellToParent /
H3_IsValidCell / H3_CellToString / H3_StringToCell /
H3_CellToBoundary_WKT), which delegates to the Uber H3 C library
through Geospatial/H3Shim.cpp.

HONEST DELTA: an Uber-H3 cell id is defined by a 122-entry icosahedral
base-cell table plus aperture-7 digit rotations; without the h3 library
(not in this container) a bit-compatible reimplementation is not
reproducible, so cell ids here are ENGINE-LOCAL: a pointy-top axial hex
grid on the equirectangular lon/lat plane whose linear size shrinks by
1/sqrt(7) per resolution step — the same 0-15 resolution ladder and
~1/7-area-per-step progression as H3. Everything a user does WITH
cells — bucket, aggregate, roundtrip to centers, coarsen to parents,
draw boundaries, stringify — behaves the same; only the raw id values
differ from h3lib, and that is documented here and in COVERAGE.md.
Every function is one closed-form codegen'd expression with an exact
cross-engine oracle (no UDF anywhere); id packing uses only shifts and
masks, so 60-bit ids stay exact in both engines.

Cell id layout (mirrors H3's mode/res header idea):
  [bit 60] mode = 1
  [bits 56-59] resolution 0-15
  [bits 28-55] q axial coord + 2^26 offset (28-bit field)
  [bits 0-27]  r axial coord + 2^26 offset (28-bit field)
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

from heavydb_spark.functions.render import SQRT3, _ColB, _E, _SqlB

_MODE_BIT = 60
_RES_SHIFT = 56
_Q_SHIFT = 28
_OFF = 1 << 26
_FIELD_MASK = (1 << 28) - 1

# res-0 circumradius in degrees; each resolution divides the linear
# size by sqrt(7) => area by 7 (H3's aperture-7 progression).
_BASE_SIZE = 30.0
_SQRT7 = 7.0 ** 0.5


def _size(resolution: int) -> float:
    if not 0 <= int(resolution) <= 15:
        raise ValueError(
            f"H3_LonLatToCell: invalid resolution ({resolution})"
        )
    return _BASE_SIZE / _SQRT7 ** int(resolution)


class _ColI(_ColB):
    """Column backend + exact 64-bit shift/mask ops."""

    @staticmethod
    def shr(a, n: int):
        return F.shiftright(a.cast("long"), n)

    @staticmethod
    def mask(a, m: int):
        return a.cast("long").bitwiseAND(m)

    @staticmethod
    def tolong(a):
        return a.cast("long")

    @staticmethod
    def mkid(qf, rf, resolution: int):
        header = (1 << _MODE_BIT) | (int(resolution) << _RES_SHIFT)
        return (
            qf.cast("long") * F.lit(1 << _Q_SHIFT)
            + rf.cast("long")
            + F.lit(header)
        )


class _SqlI(_SqlB):
    """SQL-text backend + exact 64-bit shift/mask ops (`>>` and `&`
    exist in both Spark 4 SQL and DuckDB)."""

    @staticmethod
    def shr(a, n: int):
        return _E(f"CAST({a.s} AS BIGINT) >> {int(n)}")

    @staticmethod
    def mask(a, m: int):
        return _E(f"CAST({a.s} AS BIGINT) & {int(m)}")

    @staticmethod
    def tolong(a):
        return _E(f"CAST({a.s} AS BIGINT)")

    @staticmethod
    def mkid(qf, rf, resolution: int):
        header = (1 << _MODE_BIT) | (int(resolution) << _RES_SHIFT)
        return _E(
            f"CAST({qf.s} AS BIGINT) * {1 << _Q_SHIFT} "
            f"+ CAST({rf.s} AS BIGINT) + {header}"
        )


# --------------------------------------------------------------- formulas


def _axial_round(ops, qf, rf):
    """Cube-round fractional axial coords to the containing hex — the
    same largest-diff reprojection as the render hex bins
    (ExtensionFunctions.hpp:654-668)."""
    xf = qf
    zf = rf
    yf = -xf - zf
    rx, ry, rz = ops.round(xf), ops.round(yf), ops.round(zf)
    xd = ops.abs(rx - xf)
    yd = ops.abs(ry - yf)
    zd = ops.abs(rz - zf)
    cond_x = ops.and_(ops.gt(xd, yd), ops.gt(xd, zd))
    q = ops.where(cond_x, -ry - rz, rx)
    r = ops.where(cond_x, rz, ops.where(ops.gt(yd, zd), rz, -rx - ry))
    return q, r


def _lonlat_to_cell(ops, lon, lat, resolution: int):
    size = _size(resolution)
    qf = (lon * (SQRT3 / 3.0) - lat * (1.0 / 3.0)) / size
    rf = (lat * (2.0 / 3.0)) / size
    q, r = _axial_round(ops, qf, rf)
    return ops.mkid(q + float(_OFF), r + float(_OFF), resolution)


def _cell_res(ops, cell):
    return ops.mask(ops.shr(cell, _RES_SHIFT), 15)


def _cell_q(ops, cell):
    return ops.mask(ops.shr(cell, _Q_SHIFT), _FIELD_MASK) - _OFF


def _cell_r(ops, cell):
    return ops.mask(cell, _FIELD_MASK) - _OFF


def _cell_size_expr(ops, cell):
    """size = BASE * 7^(-res/2) as an expression of the stored res."""
    res = _cell_res(ops, cell)
    if ops is _ColI:
        return F.pow(F.lit(7.0), res * F.lit(-0.5)) * _BASE_SIZE
    return _E(f"power(7.0, {res.s} * -0.5) * {_BASE_SIZE!r}")


def _cell_to_lon(ops, cell):
    q = _cell_q(ops, cell)
    r = _cell_r(ops, cell)
    return (q * SQRT3 + r * (SQRT3 / 2.0)) * _cell_size_expr(ops, cell)


def _cell_to_lat(ops, cell):
    return _cell_r(ops, cell) * 1.5 * _cell_size_expr(ops, cell)


def _is_valid(ops, cell):
    mode = ops.mask(ops.shr(cell, _MODE_BIT), 1)
    lon = _cell_to_lon(ops, cell)
    lat = _cell_to_lat(ops, cell)
    in_lon = ops.and_(ops.le(-270.0 - lon, 0.0), ops.le(lon - 270.0, 0.0))
    in_lat = ops.and_(ops.le(-135.0 - lat, 0.0), ops.le(lat - 135.0, 0.0))
    return ops.and_(ops.gt(mode, 0.5), ops.and_(in_lon, in_lat))


# ------------------------------------------------------- public surface


def _colwrap(v):
    return v if isinstance(v, Column) else F.lit(float(v))


def _colwrap_cell(v):
    return v if isinstance(v, Column) else F.lit(int(v))


def h3_lonlat_to_cell(lon, lat, resolution: int) -> Column:
    """H3_LonLatToCell(lon, lat, res) -> BIGINT
    (ExtensionFunctionsH3.hpp:42-47)."""
    return _lonlat_to_cell(_ColI, _colwrap(lon), _colwrap(lat), resolution)


def h3_lonlat_to_cell_sql(lon: str, lat: str, resolution: int) -> str:
    return _lonlat_to_cell(_SqlI, _E(lon), _E(lat), resolution).s


def h3_point_to_cell(point: Column, resolution: int) -> Column:
    """H3_PointToCell(POINT, res) over the struct<x,y> point type
    (ExtensionFunctionsH3.hpp:26-36)."""
    return h3_lonlat_to_cell(point["x"], point["y"], resolution)


def h3_cell_to_lon(cell) -> Column:
    """H3_CellToLon(cell) -> DOUBLE (cell-center longitude)."""
    return _cell_to_lon(_ColI, _colwrap_cell(cell))


def h3_cell_to_lat(cell) -> Column:
    """H3_CellToLat(cell) -> DOUBLE (cell-center latitude)."""
    return _cell_to_lat(_ColI, _colwrap_cell(cell))


def h3_cell_to_lon_sql(cell: str) -> str:
    return _cell_to_lon(_SqlI, _E(cell)).s


def h3_cell_to_lat_sql(cell: str) -> str:
    return _cell_to_lat(_SqlI, _E(cell)).s


def h3_cell_to_parent(cell, resolution: int) -> Column:
    """H3_CellToParent(cell, res): the coarser cell containing this
    cell's center (H3's parent likewise covers the child center)."""
    return h3_lonlat_to_cell(
        h3_cell_to_lon(cell), h3_cell_to_lat(cell), resolution
    )


def h3_cell_to_parent_sql(cell: str, resolution: int) -> str:
    return h3_lonlat_to_cell_sql(
        h3_cell_to_lon_sql(cell), h3_cell_to_lat_sql(cell), resolution
    )


def h3_is_valid_cell(cell) -> Column:
    """H3_IsValidCell(cell): mode bit set and the decoded center lies
    in the (loose) coordinate range of the grid."""
    return _is_valid(_ColI, _colwrap_cell(cell))


def h3_is_valid_cell_sql(cell: str) -> str:
    return _is_valid(_SqlI, _E(cell)).s


def h3_cell_to_string(cell) -> Column:
    """H3_CellToString(cell) -> TEXT: 16-digit lowercase hex (the
    h3lib string form)."""
    return F.lower(F.lpad(F.hex(_colwrap_cell(cell)), 16, "0"))


def h3_string_to_cell(s) -> Column:
    """H3_StringToCell(hex) -> BIGINT."""
    s = s if isinstance(s, Column) else F.lit(str(s))
    return F.conv(s, 16, 10).cast("long")


def h3_cell_to_boundary_wkt(cell) -> Column:
    """H3_CellToBoundary_WKT(cell) -> POLYGON WKT of the hex (6
    vertices + closing vertex, 6dp) — parseable by st_geomfromtext."""
    c = _colwrap_cell(cell)
    lon = h3_cell_to_lon(c)
    lat = h3_cell_to_lat(c)
    size = _cell_size_expr(_ColI, c)
    pts = []
    for i in range(7):
        ang = math.pi / 180.0 * (60.0 * (i % 6) + 30.0)  # pointy-top
        vx = F.round(lon + size * math.cos(ang), 6)
        vy = F.round(lat + size * math.sin(ang), 6)
        pts.append(F.concat_ws(" ", vx.cast("string"), vy.cast("string")))
    return F.concat(
        F.lit("POLYGON (("), F.concat_ws(", ", *pts), F.lit("))")
    )


# ------------------------------------------------- SQL registration


def register_h3_functions(spark) -> None:
    """Register the H3_* family as Spark SQL scalar functions so the
    reference's H3 SQL runs through `engine.sql` (all codegen). The
    dynamic-resolution forms expand to a CASE over the 16 valid
    resolutions — still one codegen'd expression."""
    branches = " ".join(
        f"WHEN {r} THEN {h3_lonlat_to_cell_sql('lon', 'lat', r)}"
        for r in range(16)
    )
    parent_branches = " ".join(
        "WHEN {r} THEN {expr}".format(
            r=r,
            expr=h3_lonlat_to_cell_sql(
                "h3_celltolon(cell)", "h3_celltolat(cell)", r
            ),
        )
        for r in range(16)
    )
    stmts = [
        "CREATE OR REPLACE TEMPORARY FUNCTION h3_lonlattocell("
        "lon DOUBLE, lat DOUBLE, resolution INT) RETURNS BIGINT RETURN "
        f"CASE resolution {branches} "
        "ELSE CAST(raise_error('H3_LonLatToCell: invalid resolution') "
        "AS BIGINT) END",
        "CREATE OR REPLACE TEMPORARY FUNCTION h3_pointtocell("
        "p STRUCT<x: DOUBLE, y: DOUBLE>, resolution INT) RETURNS BIGINT "
        "RETURN h3_lonlattocell(p.x, p.y, resolution)",
        "CREATE OR REPLACE TEMPORARY FUNCTION h3_celltolon(cell BIGINT) "
        f"RETURNS DOUBLE RETURN {h3_cell_to_lon_sql('cell')}",
        "CREATE OR REPLACE TEMPORARY FUNCTION h3_celltolat(cell BIGINT) "
        f"RETURNS DOUBLE RETURN {h3_cell_to_lat_sql('cell')}",
        "CREATE OR REPLACE TEMPORARY FUNCTION h3_celltoparent("
        "cell BIGINT, resolution INT) RETURNS BIGINT RETURN "
        f"CASE resolution {parent_branches} "
        "ELSE CAST(raise_error('H3_CellToParent: invalid resolution') "
        "AS BIGINT) END",
        "CREATE OR REPLACE TEMPORARY FUNCTION h3_isvalidcell(cell BIGINT) "
        f"RETURNS BOOLEAN RETURN {h3_is_valid_cell_sql('cell')}",
        "CREATE OR REPLACE TEMPORARY FUNCTION h3_celltostring(cell BIGINT) "
        "RETURNS STRING RETURN lower(lpad(hex(cell), 16, '0'))",
        "CREATE OR REPLACE TEMPORARY FUNCTION h3_stringtocell(s STRING) "
        "RETURNS BIGINT RETURN CAST(conv(s, 16, 10) AS BIGINT)",
    ]
    for s in stmts:
        spark.sql(s)


def h3_cell_to_point(cell) -> Column:
    """H3_CellToPoint(cell) -> POINT (struct<x,y> center) — the
    geometry-typed variant (H3Runtime.cpp)."""
    c = _colwrap_cell(cell)
    return F.struct(
        h3_cell_to_lon(c).alias("x"), h3_cell_to_lat(c).alias("y")
    )


def h3_cell_to_boundary(cell) -> Column:
    """H3_CellToBoundary(cell) -> POLYGON (single closed hex ring in
    the engine's array-of-rings geometry type, H3Runtime.cpp)."""
    c = _colwrap_cell(cell)
    lon = h3_cell_to_lon(c)
    lat = h3_cell_to_lat(c)
    size = _cell_size_expr(_ColI, c)
    verts = []
    for i in range(6):
        ang = math.pi / 180.0 * (60.0 * i + 30.0)
        verts.append(
            F.struct(
                (lon + size * math.cos(ang)).alias("x"),
                (lat + size * math.sin(ang)).alias("y"),
            )
        )
    return F.array(F.array(*verts))
