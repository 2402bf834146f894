"""Replay the reference's StringFunctionsTest expectations against the
engine — the second reference test file harvested into the
comparator family (r9 verdict queue #4; ExecuteTest is covered by
scripts/reference_fixture_probe.py).

Tests/StringFunctionsTest.cpp drives ~350 `sqlAndCompareResult(sql,
{{row}, ...})` assertions whose EXPECTED VALUES ARE INLINE — no
SQLite/DuckDB oracle needed.  This script:

1. rebuilds the four suite fixtures (string_function_test_people,
   string_function_test_countries, numeric_to_string_test,
   text_enc_test) by executing the suite's own setup INSERTs
   (StringFunctionsTest.cpp:52-155) through DuckDB (encoding clauses
   and storage options stripped) and copying the rows into Spark temp
   views — the same duck->spark copy recipe the fixture probe uses;
2. harvests every statically-resolvable sqlAndCompareResult call
   (skipping DISABLED_ tests and tests whose queries touch tables
   created mid-test);
3. runs each query through the engine dialect and compares with the
   harvested expected rows.

Comparison is ordered when the query carries a top-level ORDER BY
(as the reference's helper asserts), set-based otherwise (the
reference then leans on storage order, which a distributed engine
does not define).  TIME columns compare as seconds-of-day (the
engine's TIME representation).  Floats compare at 1e-6 relative
tolerance, mirroring sqlAndCompareResult's EXPECT_FLOAT_EQ.

r10 standing result: 292 match / 0 mismatch of 295 harvested (1
engine reject: ORDER BY rowid — the documented rowid class; 2
documented deltas: LEN(NULL)'s int32-sentinel leak, timestamp/int
COALESCE).  The tool's first run surfaced the seven StringOps parity
classes fixed in r10 (COVERAGE.md).

Run: python scripts/string_functions_probe.py
"""
import datetime as _dt
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from heavydb_spark.engine import Engine
from heavydb_spark.session import get_spark

REF = os.environ.get('SPARK_GRAFT_REFERENCE', '/root/reference')
FIXTURES = ('string_function_test_people', 'string_function_test_countries',
            'numeric_to_string_test', 'text_enc_test')

_CSTR_RE = re.compile(r'R?"((?:[^"\\]|\\.)*)"')


def _cstr(chunk):
    return "".join(
        m.group(1).replace('\\"', '"').replace("\\\\", "\\")
        for m in _CSTR_RE.finditer(chunk))


def _src():
    return open(REF + '/Tests/StringFunctionsTest.cpp').read()


def setup_commands():
    """The suite's own SetUpTestSuite DDL+INSERT strings."""
    src = _src()
    body = src[src.index('SetUpTestSuite'):src.index('TearDownTestSuite')]
    out = []
    for m in re.finditer(r'((?:"(?:[^"\\]|\\.)*"\s*)+)[,}]', body):
        stmt = _cstr(m.group(1)).strip().rstrip(';')
        if re.match(r'(?i)(drop|create|insert)\b', stmt):
            out.append(stmt)
    return out


def _strip_heavy_ddl(stmt):
    """Make the suite's CREATE TABLEs DuckDB-runnable: drop encoding
    clauses and storage options (storage detail only)."""
    stmt = re.sub(r'(?i)\s+encoding\s+\w+(\s*\(\s*\d+\s*\))?', '', stmt)
    stmt = re.sub(r'(?i)\s*with\s*\(fragment_size\s*=\s*\d+\)', '', stmt)
    return stmt


def harvest():
    """(test_name, sql, expected_rows) for each statically-resolvable
    sqlAndCompareResult; expected cell grammar: "str", int64_t(n),
    i(n), double(x), float(x), True/False, Null/kNull, array(...)."""
    src = _src()
    tests = re.split(r'\bTEST_P\(\s*(\w+)\s*,\s*(\w+)\s*\)', src)
    # tests = [prefix, suite, name, body, suite, name, body, ...]
    out, skipped = [], 0
    # expected block: {{row}, {row}, ...}; a row's cells may contain
    # quoted strings with braces (JSON expectations) but no nested
    # braces outside strings
    row_pat = r'\{(?:[^{}"]|"(?:[^"\\]|\\.)*")*\}'
    call_re = re.compile(
        r'sqlAndCompareResult\(\s*((?:R?"(?:[^"\\]|\\.)*"\s*)+),\s*'
        r'(\{\s*(?:' + row_pat + r'\s*,\s*)*' + row_pat + r'\s*,?\s*\})'
        r'\s*\)\s*;', re.DOTALL)
    # compiled test-only UDFs loaded from the reference's test shared
    # library (not product surface)
    test_udfs = re.compile(
        r'(?i)\b(?:udf_identity|text_encoding_(?:none|dict)_\w+)\s*\(')
    for k in range(1, len(tests) - 2, 3):
        suite, name, body = tests[k], tests[k + 1], tests[k + 2]
        if name.startswith('DISABLED_'):
            continue
        local_tables = set(
            t.lower() for t in re.findall(
                r'(?i)create\s+table\s+(?:if\s+not\s+exists\s+)?(\w+)',
                body))
        # tests that mutate the shared fixtures mid-test (UPDATE/
        # INSERT/DELETE through sql(...)) — their later assertions
        # depend on state this static harvest doesn't replay
        mutates = re.search(
            r'(?i)sql\(\s*R?"(?:\s|\\n)*(?:update|insert|delete)\b',
            body) is not None
        for m in call_re.finditer(body):
            sql = _cstr(m.group(1)).strip().rstrip(';')
            if not sql.lower().startswith('select'):
                skipped += 1
                continue
            # TRIM's '<chars>' FROM <expr> is an intra-call FROM,
            # not a table reference — neutralize before extraction
            tsql = re.sub(
                r"(?i)\b(trim\s*\(\s*(?:both\s+|leading\s+|"
                r"trailing\s+)?'[^']*'\s+)from\b", r"\1", sql)
            tabs = set(t.lower() for t in re.findall(
                r'\b(?:FROM|JOIN)\s+([A-Za-z_]\w*)', tsql, re.IGNORECASE))
            if (tabs - set(FIXTURES) or tabs & local_tables or mutates
                    or test_udfs.search(sql)):
                skipped += 1
                continue
            exp = _parse_expected(m.group(2))
            if exp is None:
                skipped += 1
                continue
            out.append((f"{suite}.{name}", sql, exp))
    return out, skipped


def _parse_expected(block):
    """Parse {{cell, ...}, ...} into python rows, or None if a cell is
    not statically resolvable (variables, helper calls we don't know)."""
    block = re.sub(r'//[^\n]*', '', block)  # strip comments
    inner = block.strip()
    assert inner.startswith('{') and inner.endswith('}')
    inner = inner[1:-1]
    rows, pos = [], 0
    row_re = re.compile(r'\{((?:[^{}"]|"(?:[^"\\]|\\.)*"|\{[^{}]*\})*)\}')
    for rm in row_re.finditer(inner):
        cells = _split_cells(rm.group(1))
        row = []
        for c in cells:
            v = _parse_cell(c.strip())
            if v is _UNPARSED:
                return None
            row.append(v)
        rows.append(tuple(row))
    return rows


_UNPARSED = object()


def _split_cells(s):
    out, depth, start, in_str = [], 0, 0, False
    i = 0
    while i < len(s):
        ch = s[i]
        if in_str:
            if ch == '\\':
                i += 2
                continue
            if ch == '"':
                in_str = False
        elif ch == '"':
            in_str = True
        elif ch in '({':
            depth += 1
        elif ch in ')}':
            depth -= 1
        elif ch == ',' and depth == 0:
            out.append(s[start:i])
            start = i + 1
        i += 1
    tail = s[start:]
    if tail.strip():
        out.append(tail)
    return out


def _parse_cell(c):
    if not c:
        return _UNPARSED
    if c in ('Null', 'kNull', 'NULL_BIGINT', 'NULL_DOUBLE'):
        return None
    if c in ('True', 'true'):
        return True
    if c in ('False', 'false'):
        return False
    m = re.match(r'^(?:int64_t|i)\(\s*(-?\d+)\s*\)$', c)
    if m:
        return int(m.group(1))
    m = re.match(r'^(?:double|float)\(\s*(-?[\d.eE+]+)\s*\)$', c)
    if m:
        return float(m.group(1))
    # one or more ADJACENT C++ string literals (source-level
    # concatenation, possibly split across lines)
    m = re.match(r'^(?:"(?:[^"\\]|\\.)*"\s*)+$', c, re.DOTALL)
    if m:
        return _cstr(c)
    m = re.match(r'^array\(\s*(.*)\s*\)$', c, re.DOTALL)
    if m:
        elems = []
        for e in _split_cells(m.group(1)):
            v = _parse_cell(e.strip())
            if v is _UNPARSED:
                return _UNPARSED
            elems.append(v)
        return elems
    if re.match(r'^-?\d+$', c):
        return int(c)
    if re.match(r'^-?\d*\.\d+$', c):
        return float(c)
    return _UNPARSED


# Adjudicated accept-edge deltas (each documented in COVERAGE.md): the
# assertion's EXPECTED value leaks a reference internal rather than
# describing portable semantics.
_DELTAS = [
    # LENGTH/LEN of a NULL none-encoded string: the reference leaks its
    # inline int32 null sentinel (-2147483648) as a plain value; this
    # engine returns clean NULL (the engine-wide NULL-not-sentinel
    # stance).
    (re.compile(r"(?i)^select\s+len\(zip_plus_4\)"),
     "LEN(NULL) leaks the int32 null sentinel in the reference"),
    # COALESCE(TRY_CAST(x AS TIMESTAMP), -1): the reference coalesces a
    # timestamp with an int because timestamps ARE int64 internally;
    # Spark's analyzer correctly rejects the mixed types.
    (re.compile(r"(?i)coalesce\(try_cast\(.*as timestamp\),\s*-1\)"),
     "timestamp/int COALESCE relies on the reference's int64 "
     "timestamp representation"),
]


def _documented_delta(sql):
    for pat, reason in _DELTAS:
        if pat.search(sql):
            return reason
    return None


def canon_cell(v):
    if v is None:
        return '<null>'
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        return f"{v:.6g}"
    if isinstance(v, _dt.datetime):
        s = v.strftime('%Y-%m-%d %H:%M:%S')
        if v.microsecond:
            s += f".{v.microsecond:06d}".rstrip('0')
        return s
    if isinstance(v, _dt.date):
        return str(v)
    if isinstance(v, _dt.time):
        return str(v.hour * 3600 + v.minute * 60 + v.second)
    if isinstance(v, list):
        return '[' + ','.join(canon_cell(x) for x in v) + ']'
    import decimal
    if isinstance(v, decimal.Decimal):
        return f"{float(v):.6g}"
    return str(v)


def canon_row(r):
    return tuple(canon_cell(v) for v in r)


def main():
    spark = get_spark(master='local[8]', shuffle_partitions=4,
                      extra_conf={'spark.ui.showConsoleProgress': 'false'})
    eng = Engine(spark).attach('/root/testdata/sf0.001')

    con = duckdb.connect()
    for stmt in setup_commands():
        con.execute(_strip_heavy_ddl(stmt))
    for t in FIXTURES:
        raw = con.execute(f"SELECT * FROM {t}").fetchall()
        # TIME -> seconds-of-day (engine TIME representation);
        # DuckDB declared logical types map onto Spark types
        schema_bits = []
        for cname, lt in con.execute(
                "SELECT column_name, data_type "
                "FROM information_schema.columns WHERE table_name=? "
                "ORDER BY ordinal_position", [t]).fetchall():
            lt = lt.upper()
            spark_t = {
                'TINYINT': 'TINYINT', 'SMALLINT': 'SMALLINT',
                'INTEGER': 'INT', 'BIGINT': 'BIGINT',
                'FLOAT': 'FLOAT', 'REAL': 'FLOAT', 'DOUBLE': 'DOUBLE',
                'VARCHAR': 'STRING', 'TIME': 'BIGINT',
                'TIMESTAMP': 'TIMESTAMP', 'DATE': 'DATE',
                'BOOLEAN': 'BOOLEAN',
            }.get(lt.split('(')[0], 'STRING')
            if lt.startswith('DECIMAL'):
                spark_t = 'DECIMAL' + lt[len('DECIMAL'):]
            schema_bits.append(f"`{cname}` {spark_t}")
        conv = [tuple(
            (v.hour * 3600 + v.minute * 60 + v.second)
            if isinstance(v, _dt.time) and not isinstance(v, _dt.datetime)
            else v for v in r) for r in raw]
        spark.createDataFrame(conv, ", ".join(schema_bits)) \
            .createOrReplaceTempView(t)

    cases, skipped = harvest()
    print(f"{len(cases)} harvested assertions ({skipped} skipped: "
          "non-SELECT / mid-test tables / mutating tests / test-lib "
          "UDFs / unresolvable cells)", file=sys.stderr)
    ok = mism = err = delta = 0
    mismatches, errors = [], []
    for tname, sql, exp in cases:
        reason = _documented_delta(sql)
        if reason:
            delta += 1
            print(f"  documented delta [{tname}]: {reason}",
                  file=sys.stderr)
            continue
        try:
            rows = [tuple(r) for r in eng.sql(sql).collect()]
        except Exception as e:
            err += 1
            errors.append((tname, str(e).splitlines()[0][:160], sql[:160]))
            continue
        got = [canon_row(r) for r in rows]
        want = [canon_row(r) for r in exp]
        ordered = re.search(r'(?i)\border\s+by\b', sql) is not None
        match = got == want if ordered else sorted(got) == sorted(want)
        if match:
            ok += 1
        else:
            mism += 1
            mismatches.append((tname, sql, got[:3], want[:3]))
    print(f"\n{ok} match, {mism} mismatch, {err} engine-err, "
          f"{delta} documented-delta of {len(cases)}")
    print("\n== MISMATCHES ==")
    for tname, sql, g, w in mismatches:
        print(f"[{tname}] {sql[:180]}\n  got  {g}\n  want {w}")
    print("\n== ENGINE ERRORS ==")
    for tname, e, sql in errors:
        print(f"[{tname}] {e} :: {sql}")
    spark.stop()
    sys.exit(1 if mism else 0)


if __name__ == '__main__':
    main()
