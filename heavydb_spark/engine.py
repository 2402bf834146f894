"""Engine — the `sql_execute` / QueryRunner analogue.

Reference lifecycle (SURVEY.md §3): Thrift sql_execute → Calcite parse/plan
→ RelAlg DAG → LLVM JIT → kernels → reduce. In this engine the entire
pipeline is `spark.sql(...)`: ANTLR parse, Catalyst analyze/optimize,
Tungsten whole-stage codegen, shuffle-based reduce. What remains for us is
the session/catalog surface and the dialect delta — exactly this class.

    engine = Engine.local()                      # or Engine(spark)
    engine.attach("/root/testdata/sf0.01")       # register fixture views
    df = engine.sql("SELECT ... FROM lineitem")  # HeavyDB-dialect SQL
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from heavydb_spark import catalog, dialect
from heavydb_spark.functions import register_all
from heavydb_spark.session import apply_runtime_conf, get_spark


class Engine:
    def __init__(self, spark: SparkSession):
        self.spark = apply_runtime_conf(spark)
        register_all(self.spark)

    @classmethod
    def local(cls, **kwargs) -> "Engine":
        return cls(get_spark(**kwargs))

    # -- catalog ---------------------------------------------------------
    def attach(self, sf_dir: str) -> "Engine":
        """Register the driver fixture tables as temp views."""
        catalog.register_views(self.spark, sf_dir)
        return self

    def table(self, name: str) -> DataFrame:
        return self.spark.table(name)

    # -- entry point A/C analogue (DBHandler.cpp:1285 / QueryRunner.cpp) -
    def sql(self, query: str) -> DataFrame:
        """Run a HeavyDB-dialect SQL statement; returns a DataFrame."""
        return self.spark.sql(dialect.rewrite(query))

    # -- entry point B analogue (sql_execute_df, DBHandler.cpp:1457) -----
    def sql_arrow(self, query: str):
        """Execute and return an Arrow table (Arrow IPC result surface)."""
        return self.sql(query).toArrow()

    def stop(self) -> None:
        self.spark.stop()
