#!/usr/bin/env python
"""Interleaved in-session A/B of the spread-exchange sizing forms:

  pinned  — r13 form, count = defaultParallelism
  nocount — repartition with no count (AQE byte-coalescing allowed);
            REJECTED r14: AQE collapsed the fuzzy-join variant
            explode to ONE task (2 s -> 10 s) — kept here so the
            negative result stays reproducible
  final   — HEAD form, count = max(cores, shuffle.partitions)

Usage: python scripts/ab_depin.py [reps]

Times each affected bench head with the noop sink, alternating
variants inside ONE JVM (the only credible regime on a host with
4-5% steal).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 4

HEADS = [
    "text_quality",
    "dedup_span_rewrite",
    "dedup_boilerplate_segments",
    "dedup_shared_run",
    "text_source_divergence",
    "join_fuzzy_names",
]


def main() -> None:
    from pyspark.sql import functions as F

    from heavydb_spark.operators import dedup, text
    from heavydb_spark.queries import QUERIES, datapipe, util
    from heavydb_spark.session import get_spark

    spark = get_spark(app_name="ab_depin")
    spark.sparkContext.setLogLevel("ERROR")

    def pinned_spread(df, key_col):
        n = df.sparkSession.sparkContext.defaultParallelism
        return df.repartition(n, F.col(key_col))

    def pinned_range_spread(df, *key_cols):
        n = df.sparkSession.sparkContext.defaultParallelism
        return df.repartitionByRange(n, *[F.col(c) for c in key_cols])

    def nocount_spread(df, key_col):
        return df.repartition(F.col(key_col))

    def nocount_range_spread(df, *key_cols):
        return df.repartitionByRange(*[F.col(c) for c in key_cols])

    VARIANTS = {
        "pinned": (pinned_spread, pinned_spread, pinned_range_spread),
        "nocount": (nocount_spread, nocount_spread, nocount_range_spread),
        "final": (dedup._spread, text._doc_spread, util.range_spread),
    }

    def use(variant: str) -> None:
        sp, dsp, rsp = VARIANTS[variant]
        dedup._spread = sp
        text._doc_spread = dsp
        util.range_spread = rsp
        # datapipe imports range_spread BY NAME — patch it there too
        datapipe.range_spread = rsp

    def run(qname: str) -> float:
        t0 = time.perf_counter()
        QUERIES[qname](spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    order = list(VARIANTS)
    results: dict[tuple[str, str], list[float]] = {}
    for qname in HEADS:
        for variant in order:  # warm each once, discard
            use(variant)
            run(qname)
        for _ in range(REPS):
            for variant in order:
                use(variant)
                dt = run(qname)
                results.setdefault((qname, variant), []).append(dt)
    use("final")

    print(f"\n== results (sf={SF_DIR}, reps={REPS}, alternating) ==")
    for qname in HEADS:
        parts = []
        for variant in order:
            v = results[(qname, variant)]
            parts.append(
                f"{variant} {min(v):.3f}/{sorted(v)[len(v) // 2]:.3f}"
            )
        print(f"{qname:30s} min/med  " + "  ".join(parts))

    # runtime partition evidence for one range + one hash site
    for variant in order:
        use(variant)
        df = QUERIES["text_quality"](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        plan = df._jdf.queryExecution().executedPlan().toString()
        lines = [
            ln.strip()
            for ln in plan.splitlines()
            if "AQEShuffleRead" in ln or "Exchange" in ln
        ]
        print(f"\n-- text_quality {variant}: exchanges/shuffle-reads --")
        for ln in lines[:8]:
            print("  ", ln[:120])
    use("final")
    spark.stop()


if __name__ == "__main__":
    main()
