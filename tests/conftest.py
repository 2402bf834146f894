"""Shared fixtures: one SparkSession per test session + DuckDB oracle.

Mirrors the reference's SQLiteComparator harness
(Tests/ExecuteTest.cpp:314, compare_impl :385) with DuckDB as oracle.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="session")
def spark():
    from heavydb_spark.session import get_spark

    s = get_spark(app_name="heavydb_spark_tests", master="local[8]",
                  shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def engine(spark):
    from heavydb_spark.engine import Engine

    return Engine(spark).attach(SF_DIR)


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def canonical(rows, ndigits=6):
    """Canonicalize result rows for cross-engine comparison: floats
    rounded, everything stringified, row order insensitive."""
    out = []
    for row in rows:
        vals = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("nan")
                else:
                    vals.append(f"{round(v, ndigits):.{ndigits}f}")
            elif v is None:
                vals.append("<null>")
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


def compare_query(spark, ddb, name: str, sf_dir: str = SF_DIR):
    """Run catalog query `name` on Spark and its oracle on DuckDB and
    assert canonical equality (schema names + values)."""
    from heavydb_spark.queries import ORACLES, QUERIES

    sdf = QUERIES[name](spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = [c.lower() for c in sdf.columns]

    ores = ddb.sql(ORACLES[name])
    orows = ores.fetchall()
    ocols = [c.lower() for c in ores.columns]

    assert sorted(scols) == sorted(ocols), (
        f"{name}: column mismatch spark={scols} oracle={ocols}"
    )
    # align column order by name before canonicalizing
    sidx = [scols.index(c) for c in sorted(scols)]
    oidx = [ocols.index(c) for c in sorted(ocols)]
    s_c = canonical([[r[i] for i in sidx] for r in srows])
    o_c = canonical([[r[i] for i in oidx] for r in orows])
    assert len(s_c) == len(o_c), (
        f"{name}: row count spark={len(s_c)} oracle={len(o_c)}"
    )
    mism = [
        (a, b) for a, b in zip(s_c, o_c) if a != b
    ]
    assert not mism, f"{name}: {len(mism)} row mismatches; first: {mism[:3]}"
