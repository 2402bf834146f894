"""COPY FROM / COPY TO — import/export surface (SURVEY.md §2.1).

Reference: ImportExport/Importer.cpp (delimited import, 6k LoC),
SourceType.h:27-36 (CSV/Parquet/regex/geo/raster/ODBC), QueryExporterCSV
.cpp (COPY TO). Spark-first: `spark.read`/`df.write` already implement
parallel parse, type coercion, compression — this module maps HeavyDB
COPY options onto reader/writer options and adds the regex-parsed-file
source (regexp_extract over spark.read.text).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# HeavyDB COPY option → Spark CSV reader option
# (ImportExport/CopyParams defaults: delimiter ',', header true, quote '"')
_CSV_OPTION_MAP = {
    "delimiter": "sep",
    "quote": "quote",
    "escape": "escape",
    "header": "header",
    "null_str": "nullValue",
    "line_delimiter": "lineSep",
}


def copy_from_csv(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    **copy_params,
) -> DataFrame:
    """COPY <table> FROM '<path>' WITH (...) — CSV/TSV import.

    DATE/TIMESTAMP columns in an explicit schema parse with the
    reference's multi-format DateTimeParser family (the importer
    routes every datetime cell through StringToDatum -> dateTimeParse,
    ImportExport/Importer.cpp:561-622): the cells read as strings and
    convert through the JVM-native chains in
    functions/datetime_parse.py — distributed, codegen-able, zero
    UDFs — so '10/09/99', '21-Jun-15 2:15:16 PM', epoch-seconds
    strings etc. load exactly as the reference loads them.  Pass
    datetime_parse='spark' to keep Spark's CSV reader parsing
    (ISO + dateFormat/timestampFormat options) instead."""
    reader = spark.read.format("csv")
    opts = {"header": "true", "inferSchema": "true"}
    dt_mode = str(copy_params.pop("datetime_parse", "heavy")).lower()
    for k, v in copy_params.items():
        opts[_CSV_OPTION_MAP.get(k, k)] = str(v).lower() if isinstance(v, bool) else v
    if schema:
        struct = _as_struct(schema)
        dt_cols = (
            {
                f.name: f.dataType.simpleString()
                for f in struct.fields
                if f.dataType.simpleString() in ("date", "timestamp")
            }
            if struct is not None and dt_mode == "heavy"
            else {}
        )
        if dt_cols:
            from pyspark.sql import types as T

            from heavydb_spark.functions import datetime_parse as dtp

            read_schema = T.StructType(
                [
                    T.StructField(
                        f.name,
                        T.StringType() if f.name in dt_cols else f.dataType,
                        True,
                    )
                    for f in struct.fields
                ]
            )
            opts.pop("inferSchema", None)
            df = reader.schema(read_schema).options(**opts).load(path)
            cols = []
            for f in struct.fields:
                kind = dt_cols.get(f.name)
                ref = f"`{f.name}`"
                if kind == "date":
                    cols.append(F.expr(dtp.sql_parse_date(ref)).alias(f.name))
                elif kind == "timestamp":
                    cols.append(
                        F.expr(dtp.sql_parse_timestamp(ref)).alias(f.name)
                    )
                else:
                    cols.append(F.col(f.name))
            return df.select(*cols)
        reader = reader.schema(schema)
        opts.pop("inferSchema", None)
    return reader.options(**opts).load(path)


def _as_struct(schema):
    """Normalize a DDL string or StructType schema to StructType
    (None when the DDL doesn't parse — caller falls back to handing
    the schema to the reader untouched)."""
    from pyspark.sql import types as T

    if isinstance(schema, T.StructType):
        return schema
    try:
        return T.StructType.fromDDL(schema)
    except Exception:
        return None


def copy_from_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def copy_from_regex(
    spark: SparkSession, path: str, line_regex: str, columns: list[str]
) -> DataFrame:
    """REGEX_PARSED_FILE source (SourceType.h:31): one capture group per
    column, applied to each line of a text file."""
    lines = spark.read.text(path)
    return lines.select(
        *[
            F.regexp_extract(F.col("value"), line_regex, i + 1).alias(col)
            for i, col in enumerate(columns)
        ]
    )


def copy_from_geo_csv(
    spark: SparkSession,
    path: str,
    geo_col: str = "geom",
    geo_type: str = "polygon",
    **copy_params,
) -> DataFrame:
    """COPY FROM with source_type='geo_file' (SourceType.h:29,
    ImportExport geo import path for delimited WKT): a CSV whose
    `geo_col` holds WKT is parsed into the typed geometry
    representation (struct point / array-of-rings polygon) so every
    ST_* operator applies directly. Parsing is Column expressions —
    distributed, no GDAL dependency (shapefile/geodatabase containers
    are out of scope; WKT/CSV is the interchange form)."""
    from heavydb_spark.functions import geo

    df = copy_from_csv(spark, path, **copy_params)
    parser = {
        "point": geo.st_geomfromtext_point,
        "polygon": geo.st_geomfromtext_polygon,
    }[geo_type]
    return df.withColumn(geo_col, parser(F.col(geo_col)))


def copy_to_csv(df: DataFrame, path: str, **copy_params) -> None:
    """COPY (query) TO '<path>' (QueryExporterCSV.cpp)."""
    opts = {"header": "true"}
    for k, v in copy_params.items():
        opts[_CSV_OPTION_MAP.get(k, k)] = str(v).lower() if isinstance(v, bool) else v
    df.write.mode("overwrite").options(**opts).csv(path)


def copy_to_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def create_external_table(
    spark: SparkSession, name: str, path: str, fmt: str = "parquet"
) -> None:
    """Foreign/FSI table analogue (DataMgr/ForeignStorage/*): query in
    place without import — Spark external table."""
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {name} USING {fmt} LOCATION '{path}'"
    )


def ctas(spark: SparkSession, name: str, query: str, fmt: str = "parquet") -> None:
    """CREATE TABLE AS SELECT (DBHandler.cpp:6680 CTAS dispatch)."""
    spark.sql(f"CREATE TABLE {name} USING {fmt} AS {query}")


def insert_into(spark: SparkSession, name: str, query: str) -> None:
    """INSERT INTO ... SELECT (ITAS, DBHandler.cpp:6680)."""
    spark.sql(f"INSERT INTO {name} {query}")


def copy_from_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **options,
) -> DataFrame:
    """COPY FROM an external database (ImportExport/SourceType.h:27-36
    kOdbc) via Spark's native JDBC source — the Spark-idiomatic ODBC
    analogue. With a numeric `partition_column` + bounds, the read
    fans out to `num_partitions` parallel range queries (the scale
    path — a single-connection read is a bottleneck at any size).
    Predicates and column pruning push down into the remote database
    through the JDBC source.

    No database (or JDBC driver jar) ships in this container, so the
    wiring is exercised by tests only up to reader construction; a
    real deployment passes e.g. url='jdbc:postgresql://...',
    options=dict(user=..., password=..., driver=...).
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError(
                "partition_column requires lower_bound and upper_bound"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def copy_from_arrow(spark: SparkSession, path: str) -> DataFrame:
    """Arrow IPC file/stream ingest (the load_table_binary_arrow file
    form — DBHandler.cpp load_table_binary_arrow;
    Tests/ArrowIpcIntegrationTest.cpp): read a .arrow / .feather IPC
    file via pyarrow and hand the batches to Spark. The IPC decode is
    driver-side (client-supplied payloads are client-sized, as in the
    reference's Thrift path); large datasets belong in parquet."""
    import pyarrow as pa
    import pyarrow.ipc as ipc

    try:
        with pa.memory_map(path) as source:
            table = ipc.open_file(source).read_all()
    except pa.ArrowInvalid:
        with open(path, "rb") as f:
            table = ipc.open_stream(f).read_all()
    return spark.createDataFrame(table.to_pandas())
