#!/usr/bin/env python
"""Replay named catalog queries against their DuckDB oracles.

Usage: python scripts/oracle_check.py [--sf DIR] query [query ...]
       python scripts/oracle_check.py --all            # every oracled query

The exact conftest compare_query recipe (canonical sort/round/stringify)
over any fixture dir — the local stand-in for the driver's correctness
check, used to prove restructured queries compute identical results.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tests"),
)


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if args and args[0] == "--sf":
        sf_dir = args[1]
        args = args[2:]

    import duckdb

    os.environ["SPARK_GRAFT_TEST_SF_DIR"] = sf_dir
    import conftest  # tests/conftest.py — reads SF_DIR at import

    conftest.SF_DIR = sf_dir

    from heavydb_spark.queries import ORACLES, QUERIES
    from heavydb_spark.session import get_spark

    names = list(args)
    if names == ["--all"]:
        names = [n for n in QUERIES if n in ORACLES]

    spark = get_spark(app_name="oracle_check", master="local[8]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in conftest.TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failed = []
    for name in names:
        try:
            conftest.compare_query(spark, con, name, sf_dir)
            print(f"OK   {name}")
        except AssertionError as e:
            failed.append(name)
            print(f"FAIL {name}: {str(e)[:300]}")
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"ERR  {name}: {type(e).__name__} {str(e)[:300]}")
    print(f"\n{len(names) - len(failed)}/{len(names)} green @ {sf_dir}")
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
