"""Extended-seed sweep of every randomized differential generator —
the repeatable bug hunt behind the committed seed ranges.

The committed pytest ranges (tests/test_randomized.py) run per-CI at
fixed seeds; this script replays the SAME generators and the SAME
oracle recipes over an arbitrary seed span, so each round can shake the
space for silent-wrongness regressions without growing the suite. The
r8 run (seeds 100-300 per family, ~1,370 cases) found one generator
bug (GROUPING SETS projecting GROUPING() of a never-grouped dim) and
zero engine defects.

Run: python scripts/seed_sweep.py [start] [end] [sf_dir]
"""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
    ),
)

import duckdb  # noqa: E402

START = int(sys.argv[1]) if len(sys.argv) > 1 else 100
END = int(sys.argv[2]) if len(sys.argv) > 2 else 300
SF_DIR = sys.argv[3] if len(sys.argv) > 3 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"
)
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> None:
    from tests.conftest import canonical

    import tests.test_randomized as tr
    from heavydb_spark import dialect
    from heavydb_spark.engine import Engine
    from heavydb_spark.session import get_spark

    spark = get_spark(app_name="seed_sweep", master="local[8]",
                      shuffle_partitions=8,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    engine = Engine(spark).attach(SF_DIR)
    ddb = duckdb.connect()
    for t in TABLES:
        ddb.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    fails: list[tuple[str, str]] = []

    def check(name: str, engine_sql: str, oracle_sql: str) -> None:
        try:
            srows = [tuple(r) for r in engine.sql(engine_sql).collect()]
            orows = ddb.sql(oracle_sql).fetchall()
            if canonical(srows) != canonical(orows):
                fails.append((name, engine_sql))
                print(f"FAIL {name}: {engine_sql[:200]}")
        except Exception as exc:  # noqa: BLE001 — report, keep sweeping
            fails.append((name, str(exc)[:200]))
            print(f"ERR  {name}: {str(exc)[:200]}")

    span = range(START, END)
    half = range(START, START + (END - START) // 2)

    # identical-text families: the same string runs on both engines
    for name, gen, seeds in [
        ("filter_agg", tr.generate_sql, span),
        ("join", tr.generate_join_sql, half),
        ("window", tr.generate_window_sql, half),
        ("setop", tr.generate_setop_sql, half),
        ("subquery", tr.generate_subquery_sql, half),
        ("grouping", tr.generate_grouping_sql, half),
    ]:
        for s in seeds:
            sql = gen(s)
            check(f"{name}:{s}", sql, sql)
        print(f"# {name}: done")

    # scalar: mirror the engine's int-division dialect contract on the
    # oracle (the committed test's recipe — DuckDB // is trunc like DIV)
    for s in span:
        sql = tr.generate_scalar_sql(s)
        ddb_sql = dialect._rewrite_int_division(
            sql, engine._type_resolver(sql)
        ).replace(" DIV ", " // ")
        check(f"scalar:{s}", sql, ddb_sql)
    print("# scalar: done")

    # paired-oracle family: shorthand window frames
    for s in half:
        esql, osql = tr.generate_shorthand_frame_pair(s)
        check(f"frame:{s}", esql, osql)
    print("# frame: done")

    # array constructors: engine + DuckDB must both equal the
    # generator's Python-computed value
    for s in span:
        rng = random.Random(91_000 + s)
        expr, expected = tr._array_expr(rng, 3)
        if "[" not in expr:
            expr = f"ARRAY[{expr}, {expected}][1]"
        sql = f"SELECT {expr} AS e"
        try:
            got = engine.sql(sql).first()["e"]
            dgot = ddb.sql(sql).fetchall()[0][0]
            if got != expected or dgot != expected:
                fails.append((f"array:{s}", sql))
                print(f"FAIL array:{s}: {sql} -> {got}/{dgot} != {expected}")
        except Exception as exc:  # noqa: BLE001
            fails.append((f"array:{s}", str(exc)[:200]))
            print(f"ERR  array:{s}: {str(exc)[:150]}")
    print("# array: done")

    # datetime-cast chains vs the exact DateTimeParser port (r9): the
    # oracle is the port itself — DuckDB cannot parse the reference's
    # format family. One 250-string corpus per sampled seed.
    import tests.test_datetime_cast_sql as tdc

    for s in range(START, START + max(1, min(8, END - START))):
        bad = tdc.check_fuzz_corpus(spark, tdc._fuzz_corpus(s, 250))
        if bad:
            fails.append((f"dtcast:{s}", str(bad[:3])[:200]))
            print(f"FAIL dtcast:{s}: {bad[:3]}")
    print("# dtcast: done")

    # DML cell coercion (r12): INSERT VALUES / UPDATE SET cells through
    # the cast-coercion corpus; Python-model oracle with schema-class
    # assertions (the class every reference-test comparator missed).
    for s in range(START, START + max(1, min(40, END - START))):
        bad = tr.run_dml_coercion_case(engine, s)
        if bad:
            fails.append((f"dmlcoerce:{s}", str(bad[:3])[:200]))
            print(f"FAIL dmlcoerce:{s}: {bad[:3]}")
    print("# dmlcoerce: done")

    print(f"\n{len(fails)} failures over seeds [{START}, {END}) at {SF_DIR}")
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
