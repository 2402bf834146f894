#!/usr/bin/env python
"""Capture .explain("formatted") for every bench head into plans/r13/.

Usage: python scripts/capture_plans.py before|after [query ...]

Writes plans/r13/<query>_<tag>.txt (the optimization-round evidence the
judge diffs against code claims). Driver-side only: builds each
DataFrame and formats its plan; no job executes except the handful of
builders that fetch a literal (e.g. the ANN query vector memo).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("PLANS_ROUND", "r14"),
)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])

    from bench import BENCH_QUERIES
    from heavydb_spark.queries import QUERIES
    from heavydb_spark.session import get_spark

    spark = get_spark(app_name=f"capture_plans_{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT_DIR, exist_ok=True)

    targets = [(bid, q) for bid, q in BENCH_QUERIES.items()
               if not only or q in only or bid in only]
    bench_names = set(BENCH_QUERIES.values())
    # catalog queries named explicitly but not in the bench map — the
    # optimization evidence covers every touched query, not just heads
    targets += [("--", q) for q in sorted(only)
                if q in QUERIES and q not in bench_names
                and q not in BENCH_QUERIES]
    for bench_id, qname in targets:
        df = QUERIES[qname](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT_DIR, f"{qname}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {bench_id} = {qname} @ {SF_DIR} [{tag}]\n")
            fh.write(plan)
        n_ex = plan.count("Exchange")
        print(f"{bench_id} {qname}: {n_ex} Exchange -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
