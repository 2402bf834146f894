#!/usr/bin/env python
"""Settle the B24/B27 r13-change standing (r13 verdict item 2).

B24 dedup_shared_run: r13 changed the shingle key from ONE struct
column (h1, h2) to TWO flat primitive columns. The driver's single
cold run read 0.66x while the builder's warm A/B read faster; this
script re-measures the two forms interleaved in one JVM (and is also
run once per variant order across fresh JVMs for a cold reading).

B27 dedup_boilerplate_segments: r13 repartitioned the occurrence side
on doc before the (broadcast) anti join so join + reassembly groupBy
share one exchange. Variants: r12 form (no repartition), r13/HEAD
form.

Usage: python scripts/ab_b24_b27.py [reps] [b24|b27|both]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 5
WHICH = sys.argv[2] if len(sys.argv) > 2 else "both"


def shared_run_struct(df, id_col, text_col, window=8):
    """The r12 form of shared_run_pairs: ONE struct shingle column."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from heavydb_spark.operators.dedup import _spread

    tokens = F.split(F.trim(F.col(text_col)), r"\s+")
    k = F.greatest(F.size(tokens) - (window - 1), F.lit(0))
    zipped = F.arrays_zip(
        *[F.slice(tokens, j + 1, k).alias(f"t{j}") for j in range(window)]
    )
    shingle_text = F.concat_ws(
        " ", *[F.col(f"s.t{j}") for j in range(window)]
    )
    shingle = F.struct(
        F.xxhash64(shingle_text).alias("h1"),
        F.crc32(shingle_text).alias("h2"),
    )
    pos_rows = (
        _spread(df, id_col)
        .select(
            F.col(id_col).alias("doc"),
            F.posexplode(zipped).alias("pos", "s"),
        )
        .select("doc", "pos", shingle.alias("shingle"))
        .localCheckpoint(eager=False)
    )
    dist = pos_rows.select("doc", "shingle").distinct().localCheckpoint(
        eager=False
    )
    sizes = dist.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = dist.alias("a"), dist.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("shared_windows"))
    )
    p, q = pos_rows.alias("p"), dist.alias("q")
    matched = p.join(
        q,
        (F.col("p.shingle") == F.col("q.shingle"))
        & (F.col("p.doc") != F.col("q.doc")),
    ).select(
        F.col("p.doc").alias("src"),
        F.col("q.doc").alias("dst"),
        F.col("p.pos").alias("pos"),
    )
    w = Window.partitionBy("src", "dst").orderBy("pos")
    streaks = (
        matched.withColumn("grp", F.col("pos") - F.row_number().over(w))
        .groupBy("src", "dst", "grp")
        .agg(F.count(F.lit(1)).alias("run_len"))
        .groupBy("src", "dst")
        .agg(F.max("run_len").alias("max_streak"))
    )
    sym = (
        streaks.select(
            F.least("src", "dst").alias("doc_a"),
            F.greatest("src", "dst").alias("doc_b"),
            "max_streak",
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.max("max_streak").alias("streak"))
    )
    sa = sizes.withColumnRenamed("doc", "doc_a").withColumnRenamed(
        "n_sh", "n_a"
    )
    sb = sizes.withColumnRenamed("doc", "doc_b").withColumnRenamed(
        "n_sh", "n_b"
    )
    return (
        inter.join(sym, ["doc_a", "doc_b"])
        .join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "shared_windows",
            (F.col("streak") + F.lit(window - 1)).alias(
                "longest_run_tokens"
            ),
            F.round(
                F.col("shared_windows") / F.least("n_a", "n_b"), 6
            ).alias("containment"),
        )
    )


def boilerplate_r12(df, id_col, text_col, seg=6, min_docs=3):
    """The r12 form: plain anti join on seg (no doc repartition, no
    broadcast hint), transform-lambda reassembly."""
    from pyspark.sql import functions as F

    from heavydb_spark.operators.dedup import _spread

    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = _spread(df, id_col).select(
        F.col(id_col).alias("doc"), toks.alias("toks")
    ).localCheckpoint(eager=False)
    nseg = F.ceil(F.size("toks") / F.lit(seg)).cast("int")
    segs = F.when(
        F.size("toks") <= 0, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.greatest(nseg, F.lit(1))),
            lambda i: F.concat_ws(
                " ", F.slice("toks", (i - F.lit(1)) * seg + 1, seg)
            ),
        )
    )
    occ = base.select("doc", F.posexplode(segs).alias("spos", "seg"))
    boiler = (
        occ.groupBy("seg")
        .agg(F.count_distinct("doc").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("seg")
    )
    kept = occ.join(boiler, "seg", "left_anti")
    rebuilt = kept.groupBy("doc").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("spos", "seg"))),
                lambda s: s["seg"],
            ),
        ).alias("clean_text"),
    )
    totals = base.select(
        "doc",
        F.size("toks").alias("n_orig_tokens"),
        F.when(F.size("toks") <= 0, F.lit(0)).otherwise(nseg).alias(
            "n_segs"
        ),
    )
    return (
        totals.join(rebuilt, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.when(
                F.col("clean_text").isNull() | (F.col("clean_text") == ""),
                F.lit(0),
            )
            .otherwise(F.size(F.split(F.col("clean_text"), r"\s+")))
            .cast("long")
            .alias("n_tokens"),
            (F.col("n_segs") - F.coalesce("n_kept", F.lit(0)))
            .cast("long")
            .alias("n_removed_segments"),
        )
    )


def main() -> None:
    from heavydb_spark.catalog import load_table
    from heavydb_spark.operators import dedup
    from heavydb_spark.session import get_spark

    spark = get_spark(app_name="ab_b24_b27")
    spark.sparkContext.setLogLevel("ERROR")
    d = load_table(spark, SF_DIR, "documents")

    cases = {}
    if WHICH in ("b24", "both"):
        cases["B24_shared_run"] = {
            "struct_r12": lambda: shared_run_struct(
                d, "doc_id", "text", window=8
            ).orderBy("doc_a", "doc_b"),
            "flat_r13": lambda: dedup.shared_run_pairs(
                d, "doc_id", "text", window=8
            ).orderBy("doc_a", "doc_b"),
        }
    if WHICH in ("b27", "both"):
        cases["B27_boilerplate"] = {
            "plain_r12": lambda: boilerplate_r12(
                d, "doc_id", "text", seg=6, min_docs=3
            ).orderBy("doc_id"),
            "aligned_r13": lambda: dedup.remove_boilerplate_segments(
                d, "doc_id", "text", seg=6, min_docs=3
            ).orderBy("doc_id"),
        }

    def run(build) -> float:
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for case, variants in cases.items():
        order = list(variants)
        res: dict[str, list[float]] = {v: [] for v in order}
        for v in order:  # warm, discard
            run(variants[v])
        for rep in range(REPS):
            seq = order if rep % 2 == 0 else order[::-1]
            for v in seq:
                res[v].append(round(run(variants[v]), 3))
        print(f"== {case} (sf={SF_DIR}, reps={REPS}, alternating)")
        for v in order:
            t = res[v]
            print(
                f"  {v:12s} {t} min {min(t):.3f} med"
                f" {sorted(t)[len(t) // 2]:.3f}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
