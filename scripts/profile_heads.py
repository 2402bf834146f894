#!/usr/bin/env python
"""Per-stage profile of bench heads via the Spark UI REST API.

Usage: python scripts/profile_heads.py [bench_id|query ...]

Runs each head exactly like bench.py (observe + noop sink), once cold
and once warm, then dumps per-stage duration / task count / shuffle
bytes from the local UI REST endpoint — the guide §1/§7 empirical loop
without a browser. Diagnostic tool only; not part of the bench contract.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    only = set(sys.argv[1:])

    from bench import BENCH_QUERIES
    from heavydb_spark.queries import QUERIES
    from heavydb_spark.session import get_spark

    spark = get_spark(
        app_name="profile_heads", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def stages():
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
        ) as r:
            return json.loads(r.read())

    def run(fn):
        out = fn(spark, SF_DIR)
        t0 = time.perf_counter()
        out.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for bench_id, qname in BENCH_QUERIES.items():
        if only and qname not in only and bench_id not in only:
            continue
        fn = QUERIES[qname]
        seen = {s["stageId"] for s in stages()}
        cold = run(fn)
        mid = {s["stageId"] for s in stages()} - seen
        warm = run(fn)
        allst = stages()
        warm_ids = {s["stageId"] for s in allst} - seen - mid
        print(f"\n### {bench_id} {qname}: cold {cold:.3f}s warm {warm:.3f}s")
        rows = [s for s in allst if s["stageId"] in warm_ids]
        rows.sort(key=lambda s: -(s.get("executorRunTime") or 0))
        for s in rows:
            dur = (s.get("executorRunTime") or 0) / 1000.0
            print(
                f"  stage {s['stageId']:>4} tasks={s['numCompleteTasks']:>3}"
                f" execRun={dur:7.3f}s"
                f" shufR={s.get('shuffleReadBytes', 0):>9}"
                f" shufW={s.get('shuffleWriteBytes', 0):>9}"
                f" in={s.get('inputBytes', 0):>9}"
                f" | {s.get('name', '')[:70]}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
