"""One-off audit: find oracle queries whose DuckDB result dtypes differ
from the Spark result dtypes (the driver's value hash is type-sensitive
via pandas conversion — DuckDB HUGEINT becomes float64/object and flips
the hash even when values are identical).

Run: python scripts/audit_oracle_types.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main():
    from heavydb_spark.queries import ORACLES, QUERIES
    from heavydb_spark.session import get_spark

    spark = get_spark(app_name="oracle_type_audit", master="local[8]",
                      shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    bad = []
    for name in sorted(ORACLES):
        try:
            sdf = QUERIES[name](spark, SF_DIR).toPandas()
            odf = con.sql(ORACLES[name]).df()
        except Exception as e:  # noqa: BLE001
            bad.append((name, f"ERROR {e}"))
            continue
        s_t = {c.lower(): str(d) for c, d in sdf.dtypes.items()}
        o_t = {c.lower(): str(d) for c, d in odf.dtypes.items()}
        if set(s_t) != set(o_t):
            bad.append((name, f"cols spark={sorted(s_t)} duck={sorted(o_t)}"))
            continue
        diffs = {
            c: (s_t[c], o_t[c]) for c in s_t if s_t[c] != o_t[c]
        }
        if diffs:
            bad.append((name, str(diffs)))
    print(f"checked {len(ORACLES)} oracles; {len(bad)} dtype mismatches")
    for name, msg in bad:
        print(f"  {name}: {msg}")
    spark.stop()


if __name__ == "__main__":
    main()
