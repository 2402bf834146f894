"""Replay the reference's CtasUpdateTest against the engine — the
SIXTH reference test file harvested into the comparator family (r12
verdict queue #2; ExecuteTest/TopKTest live in
scripts/reference_fixture_probe.py, StringFunctionsTest in
scripts/string_functions_probe.py, CorrelatedSubqueryTest in
scripts/correlated_subquery_probe.py, ArrayTest in
scripts/array_test_probe.py, the constants suites in
scripts/constant_assertions_probe.py).

Tests/CtasUpdateTest.cpp (3,973 lines) drives CTAS / ITAS / UPDATE
ingestion through per-type TestColumnDescriptor value generators and
asserts source==target (or canonical==updated) through C++ result
loops.  This harness transcribes the DEFAULT-build instantiations
(the non-RUN_ALL_TEST set, CtasUpdateTest.cpp:2241-2560):

- the MIXED_ALL vector (every scalar, array, fixed-length-array and
  geo descriptor in ONE table) through Ctas.CreateTableAsSelect
  (:1505), the WithLimit/ZeroLimit variants (:1550,:1559), the
  FRAGMENT_SIZE / SHARD KEY spellings (:1513,:1537) and
  Itas_P.InsertIntoTableFromSelect (:1842);
- the MIXED_VARLEN_WITHOUT_GEO vector through
  Update.UpdateColumnByColumn (:2119) and
  Update.UpdateFirstColumnByLiteral (:2228 -> body :1040);
- every fixed test: Ctas.SyntaxCheck (:1300), LiteralStringTest
  (:1411), ValidationCheck (:1441), GeoTest (:1449),
  CreateTableAsSelect_IfNotExists (:1495), Itas.SyntaxCheck (:1576),
  DifferentColumnNames (:1624), AllowDifferentFixedEncodings (:1682),
  SelectStar (:1732), Unsupported{BooleanCast,Geo,DateTime}
  (:1759,:1777,:1793), ItasOrderLimitOffset (:1953),
  Update.InvalidTextArrayAssignment (:2103),
  Export.ExportFromSelect (:2085).

The suite's own oracle is self-referential (ITAS_TARGET must equal
ITAS_SOURCE row for row; update_test must equal update_canonical), so
the replay compares engine-to-engine exactly as the reference does —
plus a transcription of each descriptor's check_column_value
(CtasUpdateTest.cpp:93-480) as a Python expected-value spot check on
the SOURCE rows, so a coercion bug that corrupts both tables the same
way still surfaces.

Step kinds and counters follow the correlated probe:
  ok            value compare matched (engine-vs-engine or
                engine-vs-transcribed-expected)
  noerr         reference asserts NO_THROW only — engine must not raise
  reject_parity reference rejects and the engine rejects too
  superset      reference rejects but the engine accepts with
                well-defined semantics — counted separately, each class
                documented in COVERAGE.md:
                  * encoding/precision strictness (ITAS between
                    FIXED(n) encodings, timestamp(0)->timestamp(3),
                    decimal scale change, dict vs none TEXT): storage
                    hints have no Spark analogue, the cast is lossless;
                  * ITAS source-type strictness (int/text/date ->
                    boolean/time/timestamp targets): the engine ITAS
                    path applies importer coercion semantics
                    (engine-wide documented delta);
                  * fixed-length array bounds on UPDATE (text[3] :=
                    ARRAY['one']): fixed lengths are storage bounds,
                    dropped like ENCODING.
  mism / err    real divergence — the probe exits 1.

Documented representation delta (not a step): Ctas.GeoTest's expected
strings include the reference's COMPRESSED(32) lossy coordinates
(:1470-1493); the engine stores uncompressed WKT, so GeoTest compares
source==target (the suite's own invariant) instead of the compressed
spellings.

Run: python scripts/ctas_update_probe.py
"""
import datetime as _dt
import decimal
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from heavydb_spark.engine import Engine

counts = {"ok": 0, "noerr": 0, "reject_parity": 0, "superset": 0,
          "mism": 0, "err": 0}
mismatches: list = []
errors: list = []
classified: list = []  # (kind, class, name, sql) for reject/superset audit


def canon_cell(v):
    if v is None:
        return "<null>"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, decimal.Decimal):
        return f"{float(v):.9g}"
    if isinstance(v, float):
        return f"{v:.6g}"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, (_dt.date, _dt.datetime)):
        return str(v)
    return str(v)


def canon_rows(rows):
    return [tuple(canon_cell(c) for c in r) for r in rows]


# ---------------------------------------------------------------------------
# TestColumnDescriptor transcriptions (CtasUpdateTest.cpp:33-700).
# value(row) returns the SQL literal the suite would write into an
# INSERT VALUES cell; expected(row) the Python value
# check_column_value would accept back.
# ---------------------------------------------------------------------------

class Desc:
    fixed_len = 0

    def skip(self, name):
        return False

    def update_value(self, row):
        return self.value(row)


class Num(Desc):
    """NumberColumnDescriptor (:58-132): row 0 null, else the row
    number; decimals scale by 10^scale in storage but read back as
    the plain value."""

    def __init__(self, definition, kind="int", scale=0):
        self.definition, self.kind, self.scale = definition, kind, scale

    def skip(self, name):
        if self.kind in ("decimal", "float", "double"):
            return name == "Array.UpdateColumnByLiteral"
        return False

    def value(self, row):
        return "null" if row == 0 else str(row)

    def expected(self, row):
        if row == 0:
            return None
        if self.kind == "float" or self.kind == "double":
            return float(row)
        if self.kind == "decimal":
            return decimal.Decimal(row)
        return row


class Bool(Desc):
    """BooleanColumnDescriptor (:134-190): QUOTED 'true'/'false'
    strings — the importer coerces them."""

    definition = "BOOLEAN"

    def skip(self, name):
        return name in ("UpdateColumnByLiteral", "Array.UpdateColumnByLiteral")

    def value(self, row):
        if row == 0:
            return "null"
        return "'true'" if row % 2 else "'false'"

    def expected(self, row):
        return None if row == 0 else bool(row % 2)


class Str(Desc):
    """StringColumnDescriptor (:192-252): 'prefix_row'."""

    def __init__(self, definition, prefix):
        self.definition, self.prefix = definition, prefix

    def skip(self, name):
        return name == "Array.UpdateColumnByLiteral"

    def value(self, row):
        return "null" if row == 0 else f"'{self.prefix}_{row}'"

    def expected(self, row):
        return None if row == 0 else f"{self.prefix}_{row}"


_FMT = {"%T": "%H:%M:%S", "%F": "%Y-%m-%d", "%F %T": "%Y-%m-%d %H:%M:%S"}


class DT(Desc):
    """DateTimeColumnDescriptor (:254-333): strftime(fmt,
    gmtime(offset + scale*row)); reads back as the stored epoch
    value (TIME: seconds of day int in this engine)."""

    def __init__(self, definition, kind, fmt, offset, scale):
        self.definition, self.kind = definition, kind
        self.fmt, self.offset, self.scale = fmt, offset, scale

    def skip(self, name):
        return name == "Array.UpdateColumnByLiteral"

    def _t(self, row):
        return self.offset + self.scale * row

    def value(self, row):
        if row == 0:
            return "null"
        s = _dt.datetime.fromtimestamp(
            self._t(row), _dt.timezone.utc).strftime(_FMT[self.fmt])
        return f"'{s}'"

    def expected(self, row):
        if row == 0:
            return None
        t = self._t(row)
        if self.kind == "time":
            return t % 86400
        if self.kind == "date":
            return _dt.date.fromtimestamp((t // 86400) * 86400)
        return _dt.datetime.fromtimestamp(
            t, _dt.timezone.utc).replace(tzinfo=None)


class Arr(Desc):
    """ArrayColumnDescriptor (:335-500): brace literals on INSERT,
    ARRAY[..] on UPDATE; fixed-length arrays window the element
    sequence; BOOLEAN elements offset by 1 (skip null); fixed-length
    TEXT arrays shift the row (fixupRowForDatatype)."""

    def __init__(self, element, fixed_len=0):
        self.element, self.fixed_len = element, fixed_len
        self.definition = element.definition + (
            f"[{fixed_len}]" if fixed_len else "[]")

    def skip(self, name):
        return self.element.skip("Array." + name)

    def _fixup_row(self, row):
        if self.fixed_len and self.element.definition in (
                "TEXT", "CHAR(100)", "VARCHAR(100)"):
            return row + 1
        return row

    def _elems(self, row):
        row = self._fixup_row(row)
        if row == 0:
            return None
        row -= 1
        i = 0
        off = 1 if self.element.definition == "BOOLEAN" else 0
        if self.fixed_len:
            i = row
            row += self.fixed_len
        return [j + off for j in range(i, row)]

    def _make(self, row, prefix, suffix):
        el = self._elems(row)
        if el is None:
            return "null"
        return prefix + ", ".join(
            self.element.value(j) for j in el) + suffix

    def value(self, row):
        return self._make(row, "{", "}")

    def update_value(self, row):
        return self._make(row, "ARRAY[", "]")

    def expected(self, row):
        el = self._elems(row)
        if el is None:
            return None
        return [self.element.expected(j) for j in el]


class Geo(Desc):
    """Geo descriptors (:502-700): WKT strings; participate in CTAS /
    ITAS (skip_test passes the 'CreateTableAsSelect' probe used by
    both bodies) but skip every Update body."""

    def __init__(self, definition, wkt_fn):
        self.definition, self._wkt = definition, wkt_fn

    def skip(self, name):
        return name != "CreateTableAsSelect"

    def value(self, row):
        return f"'{self._wkt(row)}'"

    def expected(self, row):
        return self._wkt(row)


def _wkt_point(row):
    return f"POINT ({row} 0)"


def _wkt_linestring(row):
    return "LINESTRING (0 0" + "".join(
        f",{row} 0" for _ in range(row + 1)) + ")"


def _wkt_polygon(row):
    r = row
    return (f"POLYGON ((0 {r},4 {r},4 {r + 4},0 {r + 4},0 {r}),"
            f"(1 {r + 1},1 {r + 2},2 {r + 2},2 {r + 1},1 {r + 1}))")


def _wkt_mpolygon(row):
    r = row
    return (f"MULTIPOLYGON (((0 {r},4 {r},4 {r + 4},0 {r + 4},0 {r}),"
            f"(1 {r + 1},1 {r + 2},2 {r + 2},2 {r + 1},1 {r + 1})))")


def _scalar_descs():
    """The MIXED_ALL scalar slice (CtasUpdateTest.cpp:2473-2536) in
    declaration order; the engine drops ENCODING so the FIXED
    variants exercise the same parse path the reference's do."""
    return [
        Str("TEXT ENCODING NONE", "STRING_NONE_BASE"),
        Bool(),
        Num("TINYINT"),
        Num("SMALLINT ENCODING FIXED(8)"),
        Num("SMALLINT"),
        Num("INTEGER ENCODING FIXED(8)"),
        Num("INTEGER ENCODING FIXED(16)"),
        Num("INTEGER"),
        Num("BIGINT ENCODING FIXED(8)"),
        Num("BIGINT ENCODING FIXED(16)"),
        Num("BIGINT ENCODING FIXED(32)"),
        Num("BIGINT"),
        Num("FLOAT", "float"),
        Num("DOUBLE", "double"),
        Num("NUMERIC(4) ENCODING FIXED(16)", "decimal"),
        Num("NUMERIC(9) ENCODING FIXED(32)", "decimal"),
        Num("NUMERIC(18)", "decimal"),
        Num("DECIMAL(4,2) ENCODING FIXED(16)", "decimal"),
        Num("DECIMAL(9,2) ENCODING FIXED(32)", "decimal"),
        Num("DECIMAL(18,9)", "decimal"),
        Str("TEXT ENCODING NONE", "TEXT_NONE"),
        Str("TEXT ENCODING DICT", "TEXT_DICT"),
        Str("TEXT ENCODING DICT(8)", "TEXT_DICT_8"),
        Str("TEXT ENCODING DICT(16)", "TEXT_DICT_16"),
        Str("TEXT", "TEXT"),
        Str("CHAR(100)", "CHAR"),
        Str("VARCHAR(100)", "VARCHAR"),
        DT("TIME ENCODING FIXED(32)", "time", "%T", 0, 1),
        DT("TIME", "time", "%T", 0, 1),
        DT("DATE ENCODING FIXED(16)", "date", "%F", 0, 160 * 60 * 100),
        DT("DATE", "date", "%F", 0, 160 * 60 * 100),
        DT("TIMESTAMP ENCODING FIXED(32)", "timestamp", "%F %T", 0,
           160 * 60 * 100),
        DT("TIMESTAMP", "timestamp", "%F %T", 0, 160 * 60 * 100),
    ]


def _array_descs():
    out = []
    for el, kinds in [
        (Bool(), None),
        (Num("TINYINT"), None),
        (Num("SMALLINT"), None),
        (Num("INTEGER"), None),
        (Num("BIGINT"), None),
        (Num("FLOAT", "float"), None),
        (Num("DOUBLE", "double"), None),
        (Num("NUMERIC(18)", "decimal"), None),
        (Num("DECIMAL(18,9)", "decimal"), None),
        (Str("TEXT", "TEXT"), None),
        (Str("CHAR(100)", "CHAR"), None),
        (Str("VARCHAR(100)", "VARCHAR"), None),
        (DT("TIME", "time", "%T", 0, 1), None),
        (DT("DATE", "date", "%F", 0, 160 * 60 * 100), None),
        (DT("TIMESTAMP", "timestamp", "%F %T", 0, 160 * 60 * 100), None),
    ]:
        out.append(Arr(el, 0))
        out.append(Arr(el, 3))
    return out


def _geo_descs():
    return [
        Geo("POINT", _wkt_point),
        Geo("LINESTRING", _wkt_linestring),
        Geo("POLYGON", _wkt_polygon),
        Geo("MULTIPOLYGON", _wkt_mpolygon),
    ]


# ---------------------------------------------------------------------------
# step helpers
# ---------------------------------------------------------------------------

def step_ok(name, cond, got=None, want=None, ctx=""):
    if cond:
        counts["ok"] += 1
    else:
        counts["mism"] += 1
        mismatches.append((name, ctx, got, want))


def step_noerr(eng, name, sql, ctx=""):
    try:
        eng.sql(sql)
        counts["noerr"] += 1
        return True
    except Exception as e:
        counts["mism"] += 1
        mismatches.append((name, ctx or sql[:160],
                           str(e).splitlines()[0][:160], "<no throw>"))
        return False


def step_ref_rejects(eng, name, sql, klass):
    """Reference ASSERT_ANY_THROWs; engine reject = parity, engine
    accept = engine-superset of class `klass` (documented)."""
    try:
        eng.sql(sql)
        counts["superset"] += 1
        classified.append(("superset", klass, name, sql[:120]))
        return True  # accepted — caller may need to restore state
    except Exception:
        counts["reject_parity"] += 1
        classified.append(("reject-parity", klass, name, sql[:120]))
        return False


def step_err(eng, name, sql, ctx=""):
    try:
        eng.sql(sql)
        counts["mism"] += 1
        mismatches.append((name, ctx or sql[:160], "<no throw>",
                           "<throws>"))
    except Exception:
        counts["reject_parity"] += 1
        classified.append(("reject-parity", "both-throw", name, sql[:120]))


def rows_of(eng, sql):
    return [tuple(r) for r in eng.sql(sql).collect()]


def compare_tables(eng, name, sql_a, sql_b, ctx=""):
    a, b = canon_rows(rows_of(eng, sql_a)), canon_rows(rows_of(eng, sql_b))
    step_ok(name, a == b,
            (len(a), a[:2]), (len(b), b[:2]), ctx or f"{sql_a} vs {sql_b}")


# ---------------------------------------------------------------------------
# fixed tests
# ---------------------------------------------------------------------------

def drop(eng, *tables):
    for t in tables:
        eng.sql(f"DROP TABLE IF EXISTS {t};")


def t_ctas_syntax(eng):
    """Ctas.SyntaxCheck (:1300): CTAS forms with embedded newlines /
    WITH options / TEMPORARY, and the duplicate-target reject.  The
    dictionary comp_param introspection block (:1363-1408) is storage
    metadata with no Spark analogue — the USE_SHARED_DICTIONARIES
    spellings are replayed as accept-steps only."""
    name = "Ctas.SyntaxCheck"
    drop(eng, "CTAS_SOURCE", "CTAS_SOURCE_WITH", "CTAS_SOURCE_TEXT",
         "CTAS_TARGET")
    step_noerr(eng, name, "CREATE TABLE CTAS_SOURCE (id int);")
    step_noerr(eng, name, "CREATE TABLE CTAS_SOURCE_WITH (id int);")
    ddl = "CREATE TABLE CTAS_TARGET AS SELECT \n * \r FROM CTAS_SOURCE;"
    step_noerr(eng, name, ddl)
    step_err(eng, name, ddl, "duplicate CTAS target must throw")
    step_noerr(eng, name, "DROP TABLE CTAS_TARGET;")
    ddl = "CREATE TEMPORARY TABLE CTAS_TARGET AS SELECT * FROM CTAS_SOURCE;"
    step_noerr(eng, name, ddl)
    step_err(eng, name, ddl, "duplicate TEMPORARY CTAS target must throw")
    step_noerr(eng, name, "DROP TABLE CTAS_TARGET;")
    for with_clause in (" WITH( FRAGMENT_SIZE=3 )", " WITH( MAX_CHUNK_SIZE=3 )"):
        ddl = ("CREATE TABLE CTAS_TARGET AS SELECT * \n FROM \r CTAS_SOURCE"
               + with_clause + ";")
        step_noerr(eng, name, ddl)
        step_err(eng, name, ddl, "duplicate CTAS target must throw")
        step_noerr(eng, name, "DROP TABLE CTAS_TARGET;")
    step_noerr(eng, name,
               "CREATE TABLE CTAS_TARGET AS SELECT * FROM CTAS_SOURCE_WITH"
               " WITH( MAX_CHUNK_SIZE=3 );")
    step_noerr(eng, name, "DROP TABLE CTAS_TARGET;")
    step_noerr(eng, name, "CREATE TABLE CTAS_SOURCE_TEXT (id text);")
    for with_clause in (" WITH( USE_SHARED_DICTIONARIES='FALSE' )", "",
                        " WITH( USE_SHARED_DICTIONARIES='TRUE' )"):
        step_noerr(eng, name,
                   "CREATE TABLE CTAS_TARGET AS SELECT * FROM "
                   "CTAS_SOURCE_TEXT" + with_clause + ";")
        step_noerr(eng, name, "DROP TABLE CTAS_TARGET;")
    drop(eng, "CTAS_SOURCE", "CTAS_SOURCE_WITH", "CTAS_SOURCE_TEXT")


def t_ctas_literal_string(eng):
    name = "Ctas.LiteralStringTest"  # :1411
    drop(eng, "CTAS_SOURCE", "CTAS_TARGET")
    step_noerr(eng, name, "CREATE TABLE CTAS_SOURCE (id int, val int);")
    for i in (1, 2, 3):
        step_noerr(eng, name, f"INSERT INTO CTAS_SOURCE VALUES({i},{i}); ")
    step_noerr(eng, name,
               "CREATE TABLE CTAS_TARGET AS select id, val, (case when "
               "val=1 then 'aa' else 'bb' end) as txt FROM CTAS_SOURCE;")
    for i, txt in ((1, "aa"), (2, "bb"), (3, "bb")):
        got = rows_of(eng, f"SELECT txt FROM CTAS_TARGET WHERE id={i};")
        step_ok(name, got == [(txt,)], got, [(txt,)], f"id={i}")
    drop(eng, "CTAS_SOURCE", "CTAS_TARGET")


def t_ctas_validation(eng):
    name = "Ctas.ValidationCheck"  # :1441
    drop(eng, "ctas_source", "ctas_target")
    step_noerr(eng, name,
               "CREATE TABLE ctas_source (id int, dd DECIMAL(17,2));")
    step_noerr(eng, name, "INSERT INTO ctas_source VALUES(1, 10000);")
    step_noerr(eng, name,
               "CREATE TABLE ctas_target AS SELECT id, CEIL(dd*10000) "
               "FROM ctas_source;")
    drop(eng, "ctas_source", "ctas_target")


def t_ctas_geo(eng):
    name = "Ctas.GeoTest"  # :1449
    drop(eng, "CTAS_SOURCE", "CTAS_TARGET")
    step_noerr(eng, name, "CREATE TABLE CTAS_SOURCE ("
               "pu GEOMETRY(POINT, 4326) ENCODING NONE, "
               "pc GEOMETRY(POINT, 4326) ENCODING COMPRESSED(32), "
               "lc GEOMETRY(LINESTRING, 4326), "
               "poly GEOMETRY(POLYGON), "
               "mpoly GEOMETRY(MULTIPOLYGON, 4326)"
               ");")
    step_noerr(eng, name, "INSERT INTO CTAS_SOURCE VALUES("
               "'POINT (-118.480499954187 34.2662998541567)', "
               "'POINT (-118.480499954187 34.2662998541567)', "
               "'LINESTRING (-118.480499954187 34.2662998541567, "
               "             -117.480499954187 35.2662998541567)', "
               "'POLYGON ((-118.480499954187 34.2662998541567, "
               "           -117.480499954187 35.2662998541567, "
               "           -110.480499954187 45.2662998541567))', "
               "'MULTIPOLYGON (((-118.480499954187 34.2662998541567, "
               "                 -117.480499954187 35.2662998541567, "
               "                 -110.480499954187 45.2662998541567)))' "
               "); ")
    if step_noerr(eng, name,
                  "CREATE TABLE CTAS_TARGET AS select * FROM CTAS_SOURCE;"):
        compare_tables(eng, name, "SELECT * FROM CTAS_SOURCE;",
                       "SELECT * FROM CTAS_TARGET;")
    drop(eng, "CTAS_SOURCE", "CTAS_TARGET")


def t_ctas_if_not_exists(eng):
    name = "Ctas.CreateTableAsSelect_IfNotExists"  # :1495
    drop(eng, "CTAS_SOURCE", "CTAS_TARGET")
    step_noerr(eng, name, "CREATE TABLE CTAS_SOURCE(a INT);")
    step_noerr(eng, name, "CREATE TABLE CTAS_TARGET(a INT);")
    step_err(eng, name,
             "CREATE TABLE CTAS_TARGET AS (SELECT * FROM CTAS_SOURCE);")
    step_noerr(eng, name,
               "CREATE TABLE IF NOT EXISTS CTAS_TARGET AS "
               "(SELECT * FROM CTAS_SOURCE);")
    drop(eng, "CTAS_SOURCE", "CTAS_TARGET")


def _build_source(eng, name, table, descs, n_rows, tail=")",
                  create_head=None):
    """create_itas_tables analogue (:739-783): id int + one column per
    descriptor, n_rows rows — batched into one multi-row INSERT (the
    same VALUES coercion path, 25x fewer Spark jobs)."""
    cols = ", ".join(f"col_{i} {d.definition}"
                     for i, d in enumerate(descs))
    head = create_head or f"CREATE TABLE {table} "
    if not step_noerr(eng, name, f"{head}(id int, {cols}{tail};"):
        return False
    rows = []
    for row in range(n_rows):
        cells = ", ".join(d.value(row) for d in descs)
        rows.append(f"({row}, {cells})")
    return step_noerr(eng, name,
                      f"INSERT INTO {table} VALUES {', '.join(rows)};")


def _spot_check_source(eng, name, table, descs, rows_to_check):
    """check_column_value transcription: the SOURCE rows must hold
    the descriptor's expected values (catches a coercion bug that
    corrupts source and target identically)."""
    data = {r[0]: r for r in rows_of(eng, f"SELECT * FROM {table};")}
    for row in rows_to_check:
        got = data.get(row)
        if got is None:
            step_ok(name, False, None, f"row {row}", f"{table} row missing")
            continue
        for i, d in enumerate(descs):
            want = d.expected(row)
            g = canon_cell(got[1 + i])
            w = canon_cell(want)
            step_ok(name, g == w, g, w,
                    f"{table}.col_{i} ({d.definition}) row {row}")


def t_ctas_create_as_select(eng, descs, label, tail=")", n_rows=25,
                            ctas_sql=None, n_check=None):
    """runCtasTest (:700-738 + :1505): build source, CTAS, compare."""
    name = f"Ctas.CreateTableAsSelect[{label}]"
    descs = [d for d in descs if not d.skip("CreateTableAsSelect")]
    drop(eng, "CTAS_SOURCE", "CTAS_TARGET")
    if not _build_source(eng, name, "CTAS_SOURCE", descs, n_rows, tail):
        return
    _spot_check_source(eng, name, "CTAS_SOURCE", descs,
                       [0, 1, n_rows - 1] if n_rows else [])
    sql = ctas_sql or "CREATE TABLE CTAS_TARGET AS SELECT * FROM CTAS_SOURCE;"
    if not step_noerr(eng, name, sql):
        return
    n = n_rows if n_check is None else n_check
    got_n = rows_of(eng, "SELECT COUNT(*) FROM CTAS_TARGET;")[0][0]
    step_ok(name, got_n == n, got_n, n, "CTAS row count")
    if n_check is None:
        compare_tables(eng, name,
                       "SELECT * FROM CTAS_SOURCE ORDER BY id;",
                       "SELECT * FROM CTAS_TARGET ORDER BY id;")
    drop(eng, "CTAS_SOURCE", "CTAS_TARGET")


def t_itas_syntax(eng):
    """Itas.SyntaxCheck (:1576): arity mismatches throw on both
    engines; the encoding/precision strictness rejects
    (timestamp(0)->timestamp(3), dict vs none TEXT, decimal scale)
    are engine-superset accepts — ENCODING is dropped, the casts are
    sound."""
    name = "Itas.SyntaxCheck"
    star = "INSERT INTO ITAS_TARGET SELECT * FROM ITAS_SOURCE;"
    cases = [
        (star, "(id int, val int)", "(id int)", "throws"),
        (star, "(id int)", "(id int, val int)", "throws"),
        (star, "(id int)", "(id int encoding FIXED(8))", "ok"),
        (star, "(id int encoding FIXED(8))", "(id int)", "ok"),
        (star, "(id int, val timestamp(0))", "(id int, val timestamp(3))",
         "superset"),
        (star, "(id int, val text encoding none)", "(id int, val text)",
         "superset"),
        (star, "(id int, val decimal(10,2))", "(id int, val decimal(10,3))",
         "superset"),
        ("INSERT INTO ITAS_TARGET SELECT id FROM ITAS_SOURCE;",
         "(id int, val int)", "(id int)", "ok"),
        ("INSERT INTO ITAS_TARGET(id) SELECT id FROM ITAS_SOURCE;",
         "(id int)", "(id int, val int)", "ok"),
        ("INSERT INTO ITAS_TARGET(id2) SELECT id FROM ITAS_SOURCE;",
         "(id int)", "(id2 int, val int)", "ok"),
        (star, "(id int)", "(id2 int)", "ok"),
    ]
    for sql, src, dst, expect in cases:
        drop(eng, "ITAS_SOURCE", "ITAS_TARGET")
        step_noerr(eng, name, f"CREATE TABLE ITAS_SOURCE {src};")
        step_noerr(eng, name, f"CREATE TABLE ITAS_TARGET {dst};")
        if expect == "throws":
            step_err(eng, name, sql, f"{src} -> {dst}")
        elif expect == "superset":
            step_ref_rejects(eng, name, sql, "encoding-precision")
        else:
            step_noerr(eng, name, sql, f"{src} -> {dst}")
    drop(eng, "ITAS_SOURCE", "ITAS_TARGET")


def t_itas_different_column_names(eng):
    name = "Itas.DifferentColumnNames"  # :1624
    drop(eng, "ITAS_SOURCE")
    step_noerr(eng, name, "CREATE TABLE ITAS_SOURCE (id int, val int);")
    for i in (1, 2, 3):
        step_noerr(eng, name,
                   f"INSERT INTO ITAS_SOURCE VALUES({i},{i * 10}); ")
    blocks = [
        ("INSERT INTO ITAS_TARGET SELECT id, val FROM ITAS_SOURCE;",
         [(1, 10), (2, 20), (3, 30)]),
        ("INSERT INTO ITAS_TARGET (target_id, target_val) SELECT id, val "
         "FROM ITAS_SOURCE;", [(1, 10), (2, 20), (3, 30)]),
        ("INSERT INTO ITAS_TARGET (target_val, target_id) SELECT val, id "
         "FROM ITAS_SOURCE;", [(1, 10), (2, 20), (3, 30)]),
        ("INSERT INTO ITAS_TARGET (target_id, target_val) SELECT val, id "
         "FROM ITAS_SOURCE;", [(10, 1), (20, 2), (30, 3)]),
        ("INSERT INTO ITAS_TARGET (target_val, target_id) SELECT id, val "
         "FROM ITAS_SOURCE;", [(10, 1), (20, 2), (30, 3)]),
    ]
    for sql, checks in blocks:
        drop(eng, "ITAS_TARGET")
        step_noerr(eng, name,
                   "CREATE TABLE ITAS_TARGET (target_id int, target_val int);")
        if not step_noerr(eng, name, sql):
            continue
        for tid, tval in checks:
            got = rows_of(eng, "SELECT target_val FROM ITAS_TARGET WHERE "
                               f"target_id={tid};")
            step_ok(name, got == [(tval,)], got, [(tval,)], sql[:100])
    drop(eng, "ITAS_SOURCE", "ITAS_TARGET")


def t_itas_allow_different_encodings(eng):
    name = "Itas.AllowDifferentFixedEncodings"  # :1682
    pairs = [
        ("(id int, val int)", "(id int, val bigint)"),
        ("(id int, val bigint)", "(id int, val bigint encoding fixed(8))"),
        ("(id int, val timestamp)",
         "(id int, val timestamp encoding fixed(32))"),
        ("(id int, val time)", "(id int, val time encoding fixed(32))"),
        ("(id int, val date)", "(id int, val date encoding fixed(16))"),
        ("(id int, val decimal(17, 2))", "(id int, val decimal( 5, 2))"),
    ]
    for src, dst in pairs:
        drop(eng, "ITAS_SOURCE", "ITAS_TARGET")
        step_noerr(eng, name, f"CREATE TABLE ITAS_SOURCE {src};")
        step_noerr(eng, name, f"CREATE TABLE ITAS_TARGET {dst};")
        step_noerr(eng, name,
                   "INSERT INTO ITAS_TARGET SELECT * FROM ITAS_SOURCE;",
                   f"{src} -> {dst}")
    drop(eng, "ITAS_SOURCE", "ITAS_TARGET")


def t_itas_select_star(eng):
    name = "Itas.SelectStar"  # :1732
    drop(eng, "ITAS_SOURCE_1", "ITAS_SOURCE_2", "ITAS_TARGET")
    step_noerr(eng, name, "CREATE TABLE ITAS_SOURCE_1 (id int);")
    step_noerr(eng, name, "CREATE TABLE ITAS_SOURCE_2 (id int, val int);")
    step_noerr(eng, name, "CREATE TABLE ITAS_TARGET (id int, val int);")
    step_noerr(eng, name, "INSERT INTO ITAS_SOURCE_1 VALUES(1); ")
    step_noerr(eng, name, "INSERT INTO ITAS_SOURCE_2 VALUES(1, 2); ")
    step_noerr(eng, name,
               "INSERT INTO ITAS_TARGET SELECT ITAS_SOURCE_1.*, "
               "ITAS_SOURCE_2.val FROM ITAS_SOURCE_1 JOIN ITAS_SOURCE_2 on "
               "ITAS_SOURCE_1.id = ITAS_SOURCE_2.id;")
    drop(eng, "ITAS_SOURCE_1", "ITAS_SOURCE_2", "ITAS_TARGET")


def t_itas_unsupported(eng):
    """Itas.Unsupported{BooleanCast,Geo,DateTime} (:1759,:1777,:1793):
    the reference ITAS REJECTS these source->target type pairs even
    though its importer would coerce the same spellings; the engine
    applies importer coercion uniformly (documented engine-wide
    delta) so accepts are counted engine-superset.  The NO_THROW
    companions must still pass."""
    name = "Itas.Unsupported*"
    specs = [
        ("(id boolean)", "(id int, str text, val timestamp(3), g point)",
         ["id", "str", "val", "g"],
         [("INSERT INTO ITAS_TARGET (SELECT CAST(id AS boolean) "
           "FROM ITAS_SOURCE);")]),
        ("(p point)", "(id int, str text, val timestamp(3), g linestring)",
         ["id", "str", "val", "g"], []),
        ("(t time)", "(id int, str text, val timestamp(3), d date)",
         ["id", "str", "val", "d"], []),
        ("(t date)", "(id int, str text, val timestamp(3), d time)",
         ["id", "str", "val", "d"], []),
        ("(t timestamp)", "(id int, str text, val timestamp(3), d date)",
         ["id", "str", "val", "d"],
         [("INSERT INTO ITAS_TARGET (SELECT CAST(val AS TIMESTAMP) "
           "FROM ITAS_SOURCE);")]),
    ]
    for dst, src, reject_cols, noerrs in specs:
        drop(eng, "ITAS_SOURCE", "ITAS_TARGET")
        step_noerr(eng, name, f"CREATE TABLE ITAS_TARGET {dst};")
        step_noerr(eng, name, f"CREATE TABLE ITAS_SOURCE {src};")
        for col in reject_cols:
            step_ref_rejects(
                eng, name,
                f"INSERT INTO ITAS_TARGET (SELECT {col} FROM ITAS_SOURCE);",
                "itas-source-type-strictness")
        for sql in noerrs:
            step_noerr(eng, name, sql)
    drop(eng, "ITAS_SOURCE", "ITAS_TARGET")


def t_itas_insert_from_select(eng, descs, label):
    """itasTestBody (:784-1040) with the MIXED vector: build source,
    create an identically-shaped target, ITAS, compare."""
    name = f"Itas.InsertIntoTableFromSelect[{label}]"
    descs = [d for d in descs if not d.skip("CreateTableAsSelect")]
    drop(eng, "ITAS_SOURCE", "ITAS_TARGET")
    n_rows = 25
    if not _build_source(eng, name, "ITAS_SOURCE", descs, n_rows):
        return
    cols = ", ".join(f"col_{i} {d.definition}" for i, d in enumerate(descs))
    if not step_noerr(eng, name,
                      f"CREATE TABLE ITAS_TARGET (id int, {cols});"):
        return
    if not step_noerr(eng, name,
                      "INSERT INTO ITAS_TARGET SELECT * FROM ITAS_SOURCE;"):
        return
    compare_tables(eng, name, "SELECT * FROM ITAS_SOURCE ORDER BY id;",
                   "SELECT * FROM ITAS_TARGET ORDER BY id;")
    drop(eng, "ITAS_SOURCE", "ITAS_TARGET")


def t_itas_order_limit_offset(eng):
    name = "Itas.ItasOrderLimitOffset"  # :1953
    drop(eng, "ITAS_SOURCE", "ITAS_TARGET")
    step_noerr(eng, name, "CREATE TABLE ITAS_TARGET (t int);")
    step_noerr(eng, name,
               "CREATE TABLE ITAS_SOURCE (s1 int, s2 int, s3 int) "
               "with (fragment_size = 4);")
    mx = 100
    rows = ", ".join(f"({i}, {mx - i}, {2 * mx + i})" for i in range(mx))
    step_noerr(eng, name, f"INSERT INTO ITAS_SOURCE VALUES {rows};")
    step_noerr(eng, name,
               "INSERT INTO ITAS_TARGET (SELECT s1 FROM ITAS_SOURCE "
               "ORDER BY s2);")
    got = rows_of(eng, "SELECT * FROM ITAS_TARGET ORDER BY t LIMIT 10;")
    want = [(i,) for i in range(10)]
    step_ok(name, got == want, got, want, "ORDER BY s2 full insert")
    step_noerr(eng, name, "DELETE FROM ITAS_TARGET;")
    step_noerr(eng, name,
               "INSERT INTO ITAS_TARGET (SELECT s2 FROM ITAS_SOURCE "
               "ORDER BY s2 DESC LIMIT 4);")
    got = rows_of(eng, "SELECT * FROM ITAS_TARGET ORDER BY t;")
    want = [(mx - 3,), (mx - 2,), (mx - 1,), (mx,)]
    step_ok(name, got == want, got, want, "DESC LIMIT 4")
    step_noerr(eng, name, "DELETE FROM ITAS_TARGET;")
    step_noerr(eng, name,
               "INSERT INTO ITAS_TARGET (SELECT s1 FROM ITAS_SOURCE "
               "ORDER BY s3 LIMIT 6 OFFSET 62);")
    got = rows_of(eng, "SELECT * FROM ITAS_TARGET ORDER BY t;")
    want = [(62,), (63,), (64,), (65,), (66,), (67,)]
    step_ok(name, got == want, got, want, "LIMIT 6 OFFSET 62")
    drop(eng, "ITAS_SOURCE", "ITAS_TARGET")


def t_update_column_by_column(eng, descs, label):
    """Update.UpdateColumnByColumn (:2119): col_dst_i = col_src_i with
    no WHERE; dst must equal src afterwards."""
    name = f"Update.UpdateColumnByColumn[{label}]"
    descs = [d for d in descs if not d.skip("UpdateColumnByColumn")]
    drop(eng, "update_test")
    cols = ", ".join(
        f"col_src_{i} {d.definition}, col_dst_{i} {d.definition}"
        for i, d in enumerate(descs))
    step_noerr(eng, name,
               f"CREATE TABLE update_test(id int, {cols}) "
               "WITH (fragment_size=3);")
    n_rows = 10
    rows = []
    for row in range(n_rows):
        cells = ", ".join(f"{d.value(row)}, {d.value(row + 1)}"
                          for d in descs)
        rows.append(f"({row}, {cells})")
    step_noerr(eng, name,
               f"INSERT INTO update_test VALUES {', '.join(rows)};")
    sets = ", ".join(f" col_dst_{i}=col_src_{i}"
                     for i in range(len(descs)))
    if not step_noerr(eng, name, f"UPDATE update_test set {sets};"):
        drop(eng, "update_test")
        return
    src_cols = ", ".join(f"col_src_{i}" for i in range(len(descs)))
    dst_cols = ", ".join(f"col_dst_{i}" for i in range(len(descs)))
    compare_tables(eng, name,
                   f"SELECT id, {src_cols} FROM update_test ORDER BY id;",
                   f"SELECT id, {dst_cols} FROM update_test ORDER BY id;")
    drop(eng, "update_test")


def t_update_first_column_by_literal(eng, descs, label):
    """Update.UpdateFirstColumnByLiteral (:2228 -> body :1040):
    canonical table vs per-row literal updates of column 0 only."""
    name = f"Update.UpdateFirstColumnByLiteral[{label}]"
    if descs[0].skip("UpdateColumnByLiteral"):
        return
    drop(eng, "update_canonical", "update_test")
    cols = ", ".join(f"col_dst_{i} {d.definition}"
                     for i, d in enumerate(descs))
    for t in ("update_canonical", "update_test"):
        step_noerr(eng, name,
                   f"CREATE TABLE {t}(id int, {cols}) "
                   "WITH (fragment_size=3);")
    n_rows = 10
    canon, test = [], []
    for row in range(n_rows):
        canon_cells = ", ".join(d.value(row) for d in descs)
        test_cells = ", ".join(
            (d.value(row + 1) if i == 0 else d.value(row))
            for i, d in enumerate(descs))
        canon.append(f"({row}, {canon_cells})")
        test.append(f"({row}, {test_cells})")
    step_noerr(eng, name,
               f"INSERT INTO update_canonical VALUES {', '.join(canon)};")
    step_noerr(eng, name,
               f"INSERT INTO update_test VALUES {', '.join(test)};")
    for row in range(n_rows):
        step_noerr(eng, name,
                   f"UPDATE update_test set col_dst_0="
                   f"{descs[0].update_value(row)} WHERE id={row};")
    compare_tables(eng, name,
                   "SELECT * FROM update_canonical ORDER BY id;",
                   "SELECT * FROM update_test ORDER BY id;")
    drop(eng, "update_canonical", "update_test")


def t_update_invalid_text_array(eng):
    """Update.InvalidTextArrayAssignment (:2103): fixed-length text[3]
    rejects wrong-length ARRAY assignments in the reference; the
    engine drops fixed lengths (storage bound) so accepts are
    engine-superset — state is restored after each accept so the
    suite's own count check stays meaningful."""
    name = "Update.InvalidTextArrayAssignment"
    drop(eng, "arr")
    step_noerr(eng, name, "CREATE TABLE arr (id int, ia text[3]);")
    step_noerr(eng, name,
               "INSERT INTO arr VALUES(1 , ARRAY[null,null,null]);")
    step_noerr(eng, name, "INSERT INTO arr VALUES(0 , null);")
    step_noerr(eng, name, "UPDATE arr set ia = NULL;")
    for bad in ("ARRAY[]", "ARRAY[null]", "ARRAY['one']",
                "ARRAY['one', 'two', 'three', 'four']"):
        if step_ref_rejects(eng, name, f"UPDATE arr set ia = {bad};",
                            "fixed-array-bounds"):
            eng.sql("UPDATE arr set ia = NULL;")  # restore for the count
    got = rows_of(eng, "SELECT COUNT(*) FROM arr WHERE ia IS NULL;")
    step_ok(name, got == [(2,)], got, [(2,)], "null count after rejects")
    step_noerr(eng, name, "INSERT INTO arr VALUES(2, ARRAY['a','b','c']);")
    got = rows_of(eng, "SELECT * FROM arr WHERE ia IS NOT NULL;")
    want = [(2, ["a", "b", "c"])]
    step_ok(name, canon_rows(got) == canon_rows(want), got, want,
            "non-null row")
    drop(eng, "arr")


def t_export_from_select(eng):
    name = "Export.ExportFromSelect"  # :2085 -> body :2000
    drop(eng, "EXPORT_SOURCE")
    step_noerr(eng, name, "CREATE TABLE EXPORT_SOURCE ( id int, val int );")
    n = 25
    rows = ", ".join(f"({i},{i})" for i in range(n))
    step_noerr(eng, name, f"INSERT INTO EXPORT_SOURCE VALUES {rows};")
    out = os.path.join(tempfile.mkdtemp(prefix="ctas_probe_"),
                       "export.csv")
    step_noerr(eng, name,
               f"COPY (SELECT * FROM EXPORT_SOURCE) TO '{out}' "
               "with (header='false', quoted='false');")
    exported = []
    if os.path.isdir(out):
        for f in os.listdir(out):
            if f.endswith(".csv") or f.startswith("part-"):
                with open(os.path.join(out, f)) as fh:
                    exported += [ln.strip() for ln in fh if ln.strip()]
    elif os.path.exists(out):
        with open(out) as fh:
            exported = [ln.strip() for ln in fh if ln.strip()]
    want = sorted(f"{i},{i}" for i in range(n))
    step_ok(name, sorted(exported) == want,
            sorted(exported)[:4], want[:4], "exported csv rows")
    drop(eng, "EXPORT_SOURCE")


def main():
    eng = Engine.local(
        master=os.environ.get("SPARK_GRAFT_MASTER", "local[8]"),
        shuffle_partitions=8,
    )
    scalars = _scalar_descs()
    arrays = _array_descs()
    geos = _geo_descs()
    mixed_all = scalars + arrays + geos
    # MIXED_VARLEN_WITHOUT_GEO (:2541): varlen text + every non-fp
    # array family
    varlen_without_geo = [Str("TEXT ENCODING NONE", "STRING_NONE_BASE")]
    for el in (Bool(), Num("TINYINT"), Num("SMALLINT"), Num("INTEGER"),
               Num("BIGINT"), Num("NUMERIC(18)", "decimal"),
               Str("TEXT", "TEXT"),
               DT("TIME", "time", "%T", 0, 1),
               DT("DATE", "date", "%F", 0, 160 * 60 * 100),
               DT("TIMESTAMP", "timestamp", "%F %T", 0, 160 * 60 * 100)):
        varlen_without_geo.append(Arr(el, 0))
        varlen_without_geo.append(Arr(el, 3))

    t_ctas_syntax(eng)
    t_ctas_literal_string(eng)
    t_ctas_validation(eng)
    t_ctas_geo(eng)
    t_ctas_if_not_exists(eng)
    t_ctas_create_as_select(eng, mixed_all, "MIXED_ALL")
    t_ctas_create_as_select(
        eng, mixed_all, "MIXED_ALL_FRAGMENTS",
        tail=") WITH (FRAGMENT_SIZE=3)")
    t_ctas_create_as_select(
        eng, mixed_all, "MIXED_ALL_SHARDED",
        tail=", SHARD KEY (id)) WITH (FRAGMENT_SIZE=3, shard_count = 4)")
    t_ctas_create_as_select(
        eng, mixed_all, "MIXED_ALL_LIMIT",
        ctas_sql="CREATE TABLE CTAS_TARGET AS SELECT * FROM CTAS_SOURCE "
                 "ORDER BY id LIMIT 20;", n_check=20)
    t_ctas_create_as_select(
        eng, mixed_all, "MIXED_ALL_ZERO_LIMIT", n_rows=5,
        ctas_sql="CREATE TABLE CTAS_TARGET AS SELECT * FROM CTAS_SOURCE "
                 "ORDER BY id LIMIT 0;", n_check=0)
    t_itas_syntax(eng)
    t_itas_different_column_names(eng)
    t_itas_allow_different_encodings(eng)
    t_itas_select_star(eng)
    t_itas_unsupported(eng)
    t_itas_insert_from_select(eng, mixed_all, "MIXED_ALL")
    t_itas_order_limit_offset(eng)
    t_update_column_by_column(eng, varlen_without_geo,
                              "MIXED_VARLEN_WITHOUT_GEO")
    t_update_first_column_by_literal(eng, varlen_without_geo,
                                     "MIXED_VARLEN_WITHOUT_GEO")
    t_update_invalid_text_array(eng)
    t_export_from_select(eng)

    total = sum(counts.values())
    print(f"\n{counts['ok']} match + {counts['noerr']} no-throw + "
          f"{counts['reject_parity']} reject-parity + "
          f"{counts['superset']} engine-superset, "
          f"{counts['mism']} mismatch, {counts['err']} harness-err "
          f"of {total} steps")
    print("\n== MISMATCHES ==")
    for nm, ctx, g, w in mismatches:
        print(f"[{nm}] {ctx}\n  got  {g}\n  want {w}")
    print("\n== HARNESS ERRORS ==")
    for nm, e, sql in errors:
        print(f"[{nm}] {e} :: {sql}")
    print("\n== REJECT/SUPERSET AUDIT ==")
    for kind, klass, nm, sql in classified:
        print(f"{kind:14s} {klass:28s} [{nm}] {sql}")
    eng.spark.stop()
    sys.exit(1 if (counts["mism"] or counts["err"]) else 0)


if __name__ == "__main__":
    main()
