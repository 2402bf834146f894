"""Import/export surface: COPY FROM/TO CSV, regex source, external table
(ImportExportTest.cpp / ForeignTableDmlTest.cpp analogues)."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from heavydb_spark.sources import copy_io
from tests.conftest import SF_DIR


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="src_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_csv_roundtrip(spark, tmpdir):
    """COPY TO csv → COPY FROM csv preserves rows + values."""
    nation = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    out = os.path.join(tmpdir, "nation_csv")
    copy_io.copy_to_csv(nation, out, delimiter="|")
    back = copy_io.copy_from_csv(spark, out, delimiter="|")
    assert back.count() == nation.count()
    assert set(back.columns) == set(nation.columns)
    orig = {tuple(r) for r in nation.collect()}
    rt = {tuple(r) for r in back.collect()}
    assert orig == rt


def test_copy_from_regex(spark, tmpdir):
    """REGEX_PARSED_FILE source (SourceType.h:31)."""
    log = os.path.join(tmpdir, "app.log")
    with open(log, "w") as f:
        f.write("2024-01-01 INFO starting up\n")
        f.write("2024-01-02 WARN low memory\n")
        f.write("2024-01-03 ERROR crash imminent\n")
    df = copy_io.copy_from_regex(
        spark, log, r"^(\S+) (\S+) (.*)$", ["d", "level", "msg"]
    )
    rows = {tuple(r) for r in df.collect()}
    assert ("2024-01-02", "WARN", "low memory") in rows
    assert len(rows) == 3


def test_external_table(spark, tmpdir):
    """Foreign table (FSI) analogue: query-in-place without import."""
    spark.sql("DROP TABLE IF EXISTS region_ext")
    src = os.path.join(tmpdir, "region")
    spark.read.parquet(f"{SF_DIR}/region.parquet").write.parquet(src)
    copy_io.create_external_table(spark, "region_ext", src)
    assert spark.table("region_ext").count() == 5
    spark.sql("DROP TABLE region_ext")


def test_parquet_partitioned_export(spark, tmpdir):
    """COPY TO with PARTITION BY — the layout that enables partition
    pruning at scale."""
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    out = os.path.join(tmpdir, "orders_part")
    copy_io.copy_to_parquet(orders, out, partition_by=["o_orderstatus"])
    statuses = [
        p for p in os.listdir(out) if p.startswith("o_orderstatus=")
    ]
    assert len(statuses) >= 2
    back = spark.read.parquet(out)
    assert back.count() == orders.count()
    # partition-pruned read touches a single directory
    one = back.filter(back["o_orderstatus"] == "F")
    from heavydb_spark.plans.checks import plan_string

    assert "o_orderstatus" in plan_string(one)


def test_copy_from_geo_csv(spark, tmp_path):
    """Geo CSV import: WKT column parsed to typed geometry during COPY
    (SourceType.h:29 geo file source; WKT interchange form)."""
    from pyspark.sql import functions as F

    from heavydb_spark.functions import geo
    from heavydb_spark.sources import copy_io

    p = tmp_path / "shapes.csv"
    p.write_text(
        'id,geom\n'
        '1,"POLYGON ((0 0, 4 0, 4 4, 0 4))"\n'
        '2,"POLYGON ((0 0, 2 0, 2 2, 0 2), (0.5 0.5, 1 0.5, 1 1, 0.5 1))"\n'
    )
    df = copy_io.copy_from_geo_csv(spark, str(p), geo_col="geom")
    rows = {
        r.id: r.a
        for r in df.select(
            "id", geo.st_area(F.col("geom")).alias("a")
        ).collect()
    }
    assert rows == {1: 16.0, 2: 3.75}

    q = tmp_path / "pts.csv"
    q.write_text('id,geom\n1,"POINT (3 4)"\n')
    pts = copy_io.copy_from_geo_csv(
        spark, str(q), geo_col="geom", geo_type="point"
    )
    r = pts.select(
        geo.st_distance(
            F.col("geom"), geo.st_point(F.lit(0.0), F.lit(0.0))
        ).alias("d")
    ).first()
    assert r.d == 5.0


def test_copy_from_jdbc_wiring(spark):
    """JDBC (ODBC-analogue) source: reader construction validates
    options; an actual connection fails fast without a driver — the
    gate is explicit, not a silent stub."""
    import pytest

    from heavydb_spark.sources.copy_io import copy_from_jdbc

    with pytest.raises(ValueError):
        copy_from_jdbc(
            spark, "jdbc:postgresql://h/db", "t", partition_column="id"
        )
    with pytest.raises(Exception):  # no driver in container
        copy_from_jdbc(spark, "jdbc:postgresql://h/db", "t").count()


def test_point_cloud_decoder_is_gated():
    """The LAS binary decoder requires laspy (absent here) and must say
    so, not silently fake data."""
    import pytest as _pytest

    from heavydb_spark.sources.pointcloud import _decode_las

    with _pytest.raises(NotImplementedError, match="laspy"):
        _decode_las("/tmp/tile.las")


def test_point_cloud_load_and_metadata(spark):
    """Synthetic tiles: per-file fan-out yields exactly the closed-form
    lattice, the bbox crop filters, and metadata bounds agree with the
    decoded points; 4326 bounds round-trip back to the source corner
    within series accuracy."""
    from heavydb_spark.functions.geo import utm_from_wgs84
    from heavydb_spark.sources.pointcloud import (
        load_point_cloud,
        point_cloud_metadata,
        synth_params,
        synthetic_decoder,
    )
    from pyspark.sql import functions as F

    files = ["synth://0", "synth://7"]
    pts = load_point_cloud(spark, files, decoder=synthetic_decoder)
    n0, n7 = synth_params(0)["n_points"], synth_params(7)["n_points"]
    assert pts.count() == n0 + n7
    cropped = load_point_cloud(
        spark, files, 400000.0, 400010.0, 5000000.0, 5000100.0,
        decoder=synthetic_decoder,
    )
    # x in {400000, 400005, 400010} (i%20 in 0..2), all 10 rows of file 0
    assert cropped.count() == 30

    m = {r.file_path: r for r in
         point_cloud_metadata(spark, files, decoder=synthetic_decoder).collect()}
    assert m["synth://0"].num_points == n0
    assert m["synth://7"].source_x_min == synth_params(7)["x0"]
    assert m["synth://7"].source_x_max == synth_params(7)["x0"] + 95.0
    # inverse-transformed corner maps back onto the source corner
    back = (
        spark.range(1)
        .select(
            utm_from_wgs84(
                F.lit(m["synth://0"].x_min_4326),
                F.lit(m["synth://0"].y_min_4326),
                32,
            ).alias("p")
        )
        .first()
        .p
    )
    assert abs(back.x - m["synth://0"].source_x_min) < 1e-3
    assert abs(back.y - m["synth://0"].source_y_min) < 1e-3


def test_point_cloud_partial_bbox_rejected(spark):
    import pytest as _pytest

    from heavydb_spark.sources.pointcloud import (
        load_point_cloud,
        synthetic_decoder,
    )

    with _pytest.raises(ValueError, match="x_min/x_max/y_min/y_max"):
        load_point_cloud(
            spark, ["synth://0"], x_min=0.0, x_max=10.0,
            decoder=synthetic_decoder,
        )


def test_copy_statement_roundtrip(engine, tmp_path):
    """COPY (query) TO 'path' / COPY t FROM 'path' SQL statements
    (ParserNode.h:1464,1823; ImportExportTest.cpp:227,5090): export a
    query result, re-import it into an attached view, and check the
    row counts the statements report."""
    out = str(tmp_path / "nations_out")
    r = engine.sql(
        f"COPY (SELECT n_nationkey, n_name FROM nation "
        f"WHERE n_nationkey < 10) TO '{out}' WITH (header='true')"
    ).first()
    assert r["rows_exported"] == 10

    # re-import: target view gains the 10 rows (copy-on-write union)
    before = engine.sql("SELECT count(*) AS c FROM nation").first()["c"]
    engine.sql("CREATE OR REPLACE TEMPORARY VIEW nation_copy AS "
               "SELECT n_nationkey, n_name FROM nation")
    r2 = engine.sql(
        f"COPY nation_copy FROM '{out}' WITH (header='true')"
    ).first()
    assert r2["rows_loaded"] == 10
    after = engine.sql("SELECT count(*) AS c FROM nation_copy").first()["c"]
    assert after == before + 10


def test_copy_statement_parquet_and_errors(engine, tmp_path):
    pq = str(tmp_path / "exp.parquet")
    r = engine.sql(
        f"COPY (SELECT r_regionkey, r_name FROM region) TO '{pq}' "
        f"WITH (file_type='parquet')"
    ).first()
    assert r["rows_exported"] == 5

    engine.sql("CREATE OR REPLACE TEMPORARY VIEW region_copy AS "
               "SELECT r_regionkey, r_name FROM region")
    r2 = engine.sql(f"COPY region_copy FROM '{pq}'").first()
    assert r2["rows_loaded"] == 5
    assert (
        engine.sql("SELECT count(*) AS c FROM region_copy").first()["c"] == 10
    )

    import pytest as _pytest

    with _pytest.raises(ValueError, match="not found"):
        engine.sql(f"COPY no_such_table FROM '{pq}'")


def test_copy_from_arrow_roundtrip(engine, tmp_path):
    """Arrow surface round trip: sql_arrow export -> IPC file ->
    copy_from_arrow ingest (ArrowIpcIntegrationTest.cpp shape)."""
    import pyarrow as pa
    import pyarrow.ipc as ipc

    from heavydb_spark.sources.copy_io import copy_from_arrow

    tbl = engine.sql_arrow(
        "SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey"
    )
    p = str(tmp_path / "nations.arrow")
    with ipc.new_file(p, tbl.schema) as w:
        w.write_table(tbl)
    back = copy_from_arrow(engine.spark, p)
    assert back.count() == 25
    assert [r["n_nationkey"] for r in back.orderBy("n_nationkey").take(3)] == [0, 1, 2]

    # stream-format files decode through the fallback path
    ps = str(tmp_path / "nations_stream.arrow")
    with ipc.new_stream(ps, tbl.schema) as w:
        w.write_table(tbl)
    assert copy_from_arrow(engine.spark, ps).count() == 25


def test_create_dataframe_statement(engine, tmp_path):
    """CREATE DATAFRAME t (cols) FROM 'path' (ddlParser.ftl:1613
    SqlCreateDataframe): file-backed read-only table with a declared
    HeavyDB-typed schema; re-reads see file changes (file-backed
    semantics)."""
    p = tmp_path / "df_src.csv"
    p.write_text("1|alpha|2.5\n2|beta|3.5\n")
    engine.sql(
        f"CREATE DATAFRAME df_t (id BIGINT, name TEXT, v DOUBLE) "
        f"FROM '{p}' WITH (DELIMITER='|')"
    )
    rows = engine.sql(
        "SELECT id, name, v FROM df_t ORDER BY id"
    ).collect()
    assert [(r["id"], r["name"], r["v"]) for r in rows] == [
        (1, "alpha", 2.5), (2, "beta", 3.5),
    ]
    # file-backed: appended rows appear on re-read
    p.write_text("1|alpha|2.5\n2|beta|3.5\n3|gamma|4.5\n")
    assert engine.sql("SELECT count(*) AS c FROM df_t").first()["c"] == 3
    engine.spark.catalog.dropTempView("df_t")
