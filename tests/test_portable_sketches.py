"""Portable-hash sketch variants: the cross-engine-checkable SimHash /
MinHash+LSH forms (operators/dedup.py portable_token_hash*) — the SQL
text and the Spark expression must agree value for value, and the
sketches must recover planted near-duplicates."""

import duckdb
import pytest
from pyspark.sql import functions as F

from heavydb_spark.operators import dedup


def test_portable_token_hash_matches_sql(spark):
    """Spark expression vs DuckDB SQL text on assorted tokens."""
    toks = ["hello", "a", "", "spark graft rocks", "x" * 80, "Zz09 ~"]
    df = spark.createDataFrame([(t,) for t in toks], "t string")
    got = {
        r["t"]: (r["h0"], r["h7"])
        for r in df.select(
            "t",
            dedup.portable_token_hash(F.col("t"), 0).alias("h0"),
            dedup.portable_token_hash(F.col("t"), 7).alias("h7"),
        ).collect()
    }
    con = duckdb.connect()
    for t in toks:
        lit = "'" + t.replace("'", "''") + "'"
        h0, h7 = con.execute(
            f"SELECT {dedup.portable_token_hash_sql(lit, 0)}, "
            f"{dedup.portable_token_hash_sql(lit, 7)}"
        ).fetchone()
        assert got[t] == (h0, h7), t
        assert 0 <= h0 < 2**31


def test_portable_token_hash62_range_and_determinism(spark):
    df = spark.createDataFrame([("abc",), ("abd",)], "t string")
    rows = df.select(
        dedup.portable_token_hash62(F.col("t")).alias("h")
    ).collect()
    hs = [r["h"] for r in rows]
    assert hs[0] != hs[1]
    assert all(0 <= h < 2**62 for h in hs)


def test_simhash_portable_identical_docs_collide(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),
            (3, "totally different words entirely unrelated content"),
        ],
        "doc_id long, text string",
    )
    fps = {
        r["doc"]: r["simhash"]
        for r in dedup.simhash64(
            df, "doc_id", "text", token_hash=dedup.portable_token_hash62
        ).collect()
    }
    assert fps[1] == fps[2]
    assert fps[1] != fps[3]
    pairs = dedup.simhash_neardup_pairs(
        df, "doc_id", "text", max_hamming=3,
        token_hash=dedup.portable_token_hash62,
    ).collect()
    assert [(p["doc_a"], p["doc_b"], p["hamming"]) for p in pairs] == [
        (1, 2, 0)
    ]


def test_minhash_portable_recovers_planted_neardups(spark):
    base = "one two three four five six seven eight nine ten " * 3
    perturbed = base.replace("five", "5", 1)
    rows = [(1, base), (2, base), (3, perturbed),
            (4, "completely unrelated corpus of other tokens here " * 3)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in dedup.minhash_dedup_pairs_portable(
            df, "doc_id", "text", threshold=0.3
        ).collect()
    }
    assert got[(1, 2)] == 1.0            # identical docs: every perm agrees
    assert (1, 4) not in got and (2, 4) not in got and (3, 4) not in got
    if (1, 3) in got:                     # near-dup: high but < 1
        assert 0.3 <= got[(1, 3)] < 1.0


def test_simhash_skips_empty_documents(spark):
    """Empty/whitespace-only text yields no tokens — the doc gets no
    fingerprint on either engine (the portable oracle filters t <> '')."""
    df = spark.createDataFrame(
        [(1, "real words here"), (2, "   "), (3, "")],
        "doc_id long, text string",
    )
    fps = dedup.simhash64(
        df, "doc_id", "text", token_hash=dedup.portable_token_hash62
    ).collect()
    assert [r["doc"] for r in fps] == [1]
