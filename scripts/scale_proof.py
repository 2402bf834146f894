#!/usr/bin/env python
"""Scale-proof run: execute the heaviest bench heads at 10x bench scale.

Builds a 10x blow-up of the sf0.1 fixture (fact tables replicated with
shifted keys — the time-partitioned-growth shape: facts grow 10x, dims
stay fixed) under .scale_sf1/, runs B13 (minhash dedup), B17 (bbox
join) and B19 (TPC-H Q21) once each after a warm-up of the scan, and
reports wall time plus total shuffle read/write bytes per query from
the Spark status store. Evidence for BASELINE.md's 100x-design section;
not part of the driver bench.

Usage: python scripts/scale_proof.py [--keep] [Bxx_head ...]
(named heads restrict the run — e.g. a new head's first 10x row —
default is every listed head)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".scale_sf1")
COPIES = int(os.environ.get("SCALE_COPIES", "10"))


def build_scaled(spark) -> None:
    from pyspark.sql import functions as F

    from heavydb_spark.catalog import load_table

    os.makedirs(OUT, exist_ok=True)

    def explode_copies(df, shift_cols, text_col=None):
        """Union COPIES shifted copies in ONE plan: cross join with a
        copy-index range, shift keys by copy * (max+1)."""
        mx = {c: df.agg(F.max(c)).first()[0] + 1 for c in shift_cols}
        copies = spark.range(COPIES).withColumnRenamed("id", "__copy")
        out = df.crossJoin(F.broadcast(copies))
        for c in shift_cols:
            out = out.withColumn(c, F.col(c) + F.col("__copy") * F.lit(mx[c]))
        if text_col:
            out = out.withColumn(
                text_col,
                F.concat(F.col(text_col), F.lit(" c"),
                         F.col("__copy").cast("string")),
            )
        return out.drop("__copy")

    plans = {
        "documents": (["doc_id"], "text"),
        "customer": (["c_custkey"], None),
        "orders": (["o_orderkey"], None),
        "lineitem": (["l_orderkey"], None),
        # events grow as more USERS over the same time range (user_id
        # shifted per copy) — so time-bucketed windows get 10x fatter
        # buckets and per-supplier/user frames get probed for skew
        "events": (["event_id", "user_id"], None),
    }
    for name, (shift, text_col) in plans.items():
        df = load_table(spark, SRC, name)
        explode_copies(df, shift, text_col).repartition(32).write.mode(
            "overwrite"
        ).parquet(os.path.join(OUT, f"{name}.parquet"))
    # embeddings copied unscaled: no scale head reads it, but SQL-path
    # heads attach() the full fixture set
    for name in ("nation", "region", "supplier", "part", "embeddings"):
        shutil.copy(
            os.path.join(SRC, f"{name}.parquet"),
            os.path.join(OUT, f"{name}.parquet"),
        )


def shuffle_totals(spark) -> tuple[int, int]:
    store = spark.sparkContext._jsc.sc().statusStore()
    jvm = spark._jvm
    gw = spark.sparkContext._gateway
    stages = store.stageList(
        jvm.java.util.ArrayList(), False, False,
        gw.new_array(jvm.double, 0), jvm.java.util.ArrayList(),
    )
    rd = wr = 0
    for i in range(stages.size()):
        s = stages.apply(i)
        rd += s.shuffleReadBytes()
        wr += s.shuffleWriteBytes()
    return rd, wr


def main() -> None:
    from heavydb_spark.queries import QUERIES
    from heavydb_spark.session import get_spark

    spark = get_spark(master="local[32]", shuffle_partitions=64,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    t0 = time.time()
    if not os.path.exists(os.path.join(OUT, "lineitem.parquet")):
        build_scaled(spark)
    print(f"# scaled data ready in {time.time() - t0:.1f}s", file=sys.stderr)

    # One-time session setup (SQL function registration + fixture
    # attach) happens before any head is timed — otherwise the first
    # SQL-path head absorbs ~10 s of setup that isn't query work.
    from heavydb_spark.engine import Engine

    Engine(spark).attach(OUT)

    heads = {
        "B13_dedup_minhash": "dedup_minhash_lsh",
        "B17_bbox_join": "geo_bbox_join",
        "B19_tpch_q21": "tpch_q21_waiting_supplier",
        "B20_corpus_report": "pipe_corpus_report",
        "B21_pixel_bins": "render_pixel_bins",
        # window-heavy heads (r5 verdict #6): the op class most likely
        # to hide partition skew — B09's frame partitions on 20
        # suppliers whose groups grow 10x; B12's tumbling buckets get
        # 10x fatter over the same time range
        "B09_window_moving_avg": "window_moving_avg",
        "B12_stream_window": "stream_tumbling_window",
        # r6 heads: grouping-sets rollup + rank; wide-CTE self-join
        "B22_rollup_rank": "tpcds_q67_rollup_rank",
        "B23_cross_year": "tpcds_q64_cross_year_sales",
        # r6 late heads. B24's scaled input is adversarial BY
        # CONSTRUCTION: the 10 shifted copies differ only in a trailing
        # token, so every doc shares its full run with its 9 copies and
        # the TRUE answer grows ~C(10,2)-fold — output-driven growth,
        # the hot-shingle case the operator's max_df cap exists for.
        "B24_shared_run": "dedup_shared_run",
        "B25_lm_perplexity": "text_lm_perplexity",
        # late-r6 head: the span-removal REWRITE under the same
        # adversarial 10x copies — dup occurrences grow ~10x per gram
        # but the plan stays linear (O(k·window) covered rows per
        # gram, never an occurrence-pair join)
        "B26_span_rewrite": "dedup_span_rewrite",
        # end-of-r6 head: boilerplate-segment removal under the same
        # adversarial copies — every segment's distinct-doc count
        # crosses the min_docs threshold via its 10 shifted copies'
        # shared prefix segments, so removals GROW superlinearly while
        # the plan stays linear (disjoint segments, left-anti, no
        # occurrence-pair join)
        "B27_boilerplate": "dedup_boilerplate_segments",
        # final-r6 heads. B28: events scale as 10x USERS over the same
        # time range — per-user as-of groups stay the same size, there
        # are 10x more of them; the union+window must stay one shuffle.
        # B29 is adversarial BY CONSTRUCTION (same class as B24): the
        # 10 copies keep IDENTICAL c_names, so every name gains 9 exact
        # twins and the TRUE pair count grows ~C(10,2)-fold — the
        # hot-variant case the operator's collapse-exact-dups-first
        # guidance exists for; growth here is output-driven, not plan
        # waste. B30: 10x docs, same vocabulary shape — the token-keyed
        # join and per-source agg must scale with corpus size.
        "B28_asof_join": "join_asof_backward",
        "B29_fuzzy_join": "join_fuzzy_names",
        "B30_source_divergence": "text_source_divergence",
    }
    wanted = [a for a in sys.argv[1:] if not a.startswith("--")]
    if wanted:
        heads = {k: v for k, v in heads.items() if k in wanted}
    results = {}
    for bid, qname in heads.items():
        time.sleep(1.0)  # let the async status listener settle
        rd0, wr0 = shuffle_totals(spark)
        t = time.time()
        # Same forcing recipe as bench.py: Observation over a noop
        # write executes the complete plan — count-only plans lose 1:1
        # operators and aggregate values, and a top-level agg would
        # eliminate a terminal global sort
        out = QUERIES[qname](spark, OUT)
        from pyspark.sql import Observation
        from pyspark.sql import functions as SF

        obs = Observation()
        out.observe(
            obs,
            SF.count(SF.lit(1)).alias("n"),
            SF.sum(SF.hash(*out.columns).cast("long")).alias("h"),
        ).write.format("noop").mode("overwrite").save()
        n = obs.get["n"]
        dt = time.time() - t
        time.sleep(1.0)
        rd1, wr1 = shuffle_totals(spark)
        results[bid] = {
            "sec": round(dt, 2),
            "rows": n,
            "shuffle_read_mb": round((rd1 - rd0) / 1e6, 1),
            "shuffle_write_mb": round((wr1 - wr0) / 1e6, 1),
        }
        print(f"# {bid}: {dt:.2f}s rows={n} "
              f"shW={results[bid]['shuffle_write_mb']}MB", file=sys.stderr)
    print(json.dumps({"scale": "10x-bench (sf1-equivalent facts)",
                      "copies": COPIES, "results": results}))
    spark.stop()
    if "--keep" not in sys.argv:
        shutil.rmtree(OUT, ignore_errors=True)


if __name__ == "__main__":
    main()
