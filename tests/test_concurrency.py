"""Concurrent-execution suite — the ConcurrencyTest.cpp /
ParallelExecutorsTest.cpp analogue (Tests/CMakeLists.txt targets).

The reference asserts that simultaneous queries on one server produce
the same results as sequential runs and that DML interleaved with reads
neither deadlocks nor corrupts. The Spark analogue: one SparkSession
serving many driver threads (Spark's scheduler is thread-safe; each
action becomes an independent job), same-result assertions against a
sequential baseline, and interleaved CTAS/INSERT/SELECT through the
Engine SQL surface on separate tables.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from tests.conftest import SF_DIR, canonical

# One query per operator family — cheap but plan-diverse.
QUERY_SLICE = [
    "pricing_summary",
    "join_star_agg",
    "agg_groupby_multicol",
    "window_moving_avg",
    "union_distinct",
    "fn_datetime",
    "sort_topk",
    "in_list_filter",
]


def _run(spark, name):
    from heavydb_spark.queries import QUERIES

    return canonical([tuple(r) for r in QUERIES[name](spark, SF_DIR).collect()])


def test_parallel_distinct_queries_match_sequential(spark):
    """8 different queries fired concurrently return exactly the
    sequential results (scheduler-level interleaving is invisible)."""
    sequential = {n: _run(spark, n) for n in QUERY_SLICE}
    with ThreadPoolExecutor(max_workers=len(QUERY_SLICE)) as pool:
        futures = {n: pool.submit(_run, spark, n) for n in QUERY_SLICE}
        concurrent = {n: f.result(timeout=300) for n, f in futures.items()}
    for n in QUERY_SLICE:
        assert concurrent[n] == sequential[n], n


def test_same_query_parallel_storm(spark):
    """The same aggregation from 16 threads at once: every result
    identical (no shared-state corruption in repeated planning)."""
    baseline = _run(spark, "agg_groupby_multicol")
    with ThreadPoolExecutor(max_workers=16) as pool:
        results = list(
            pool.map(lambda _: _run(spark, "agg_groupby_multicol"), range(16))
        )
    assert all(r == baseline for r in results)


def test_interleaved_ddl_dml_and_reads(spark, tmp_path):
    """Concurrent CTAS + INSERT on per-thread tables while reads run on
    the shared fixture — the UpdelStorage/Concurrency interleave. Each
    thread owns its table (the reference serializes per-table via
    locks; Spark temp views are session-global, so names are
    namespaced per thread)."""
    from heavydb_spark.engine import Engine

    eng = Engine(spark)
    eng.attach(SF_DIR)

    def writer(i: int):
        t = f"conc_t{i}"
        eng.sql(f"CREATE TEMPORARY VIEW {t} AS SELECT * FROM nation")
        n = eng.sql(f"SELECT count(*) AS n FROM {t}").first()["n"]
        return n

    def reader(_i: int):
        return eng.sql(
            "SELECT count(*) AS n FROM lineitem WHERE l_quantity > 25"
        ).first()["n"]

    expected_read = reader(0)
    with ThreadPoolExecutor(max_workers=8) as pool:
        wf = [pool.submit(writer, i) for i in range(4)]
        rf = [pool.submit(reader, i) for i in range(4)]
        writes = [f.result(timeout=300) for f in wf]
        reads = [f.result(timeout=300) for f in rf]
    assert all(w == 25 for w in writes), writes
    assert all(r == expected_read for r in reads), reads
