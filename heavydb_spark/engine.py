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

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from heavydb_spark import catalog, dialect
from heavydb_spark.functions import register_all
from heavydb_spark.session import apply_runtime_conf, get_spark

# DML statement shapes (DBHandler.cpp:6626 sql_execute_impl dispatches
# UPDATE/DELETE off the main SELECT path; ParserWrapper.h:91). The engine
# applies them as copy-on-write view replacement (operators/mutation.py).
_UPDATE_RE = re.compile(
    r"^\s*UPDATE\s+(\w+)\s+SET\s+(.*?)(?:\s+WHERE\s+(.+?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DELETE_RE = re.compile(
    r"^\s*DELETE\s+FROM\s+(\w+)(?:\s+WHERE\s+(.+?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)


def _split_assignments(set_clause: str) -> dict[str, str]:
    """Split `a = e1, b = e2` on top-level commas only."""
    parts, depth, cur = [], 0, []
    for ch in set_clause:
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    out = {}
    for p in parts:
        name, expr = p.split("=", 1)
        out[name.strip()] = expr.strip()
    return out


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

    def register_model(
        self, name: str, intercept: float, coefs: list[float]
    ) -> "Engine":
        """Register a linear model for ML_PREDICT('name', f1, ...) SQL
        (the CREATE MODEL / ML_PREDICT surface; the model is inlined
        into the expression at rewrite time, MLPredictCodegen.cpp
        analogue)."""
        dialect.register_model(name, intercept, coefs)
        return self

    # -- entry point A/C analogue (DBHandler.cpp:1285 / QueryRunner.cpp) -
    def sql(self, query: str) -> DataFrame:
        """Run a HeavyDB-dialect SQL statement; returns a DataFrame.

        SELECT/DDL pass through the dialect shim to `spark.sql`;
        UPDATE/DELETE run as copy-on-write view replacement
        (executeUpdate/executeDelete, RelAlgExecutor.cpp:2163,:2327)
        and return a one-row `rows_affected` DataFrame.
        """
        m = _UPDATE_RE.match(query)
        if m:
            return self._dml_update(m.group(1), m.group(2), m.group(3))
        m = _DELETE_RE.match(query)
        if m:
            return self._dml_delete(m.group(1), m.group(2))
        return self.spark.sql(dialect.rewrite(query))

    def _dml_update(self, table: str, set_clause: str, where: str | None) -> DataFrame:
        from heavydb_spark.operators.mutation import update_projection

        df = self.spark.table(table)
        cond = F.expr(dialect.rewrite(where)) if where else F.lit(True)
        assignments = {
            k: F.expr(dialect.rewrite(v))
            for k, v in _split_assignments(set_clause).items()
        }
        affected = df.filter(cond).count()
        # The post-image plan binds to the underlying scan (not the view
        # name), so replacing the view is not self-referential.
        update_projection(df, cond, assignments).createOrReplaceTempView(table)
        return self.spark.range(1).select(F.lit(affected).alias("rows_affected"))

    def _dml_delete(self, table: str, where: str | None) -> DataFrame:
        from heavydb_spark.operators.mutation import delete_filter

        df = self.spark.table(table)
        cond = F.expr(dialect.rewrite(where)) if where else F.lit(True)
        affected = df.filter(cond).count()
        delete_filter(df, cond).createOrReplaceTempView(table)
        return self.spark.range(1).select(F.lit(affected).alias("rows_affected"))

    # -- entry point B analogue (sql_execute_df, DBHandler.cpp:1457) -----
    def sql_arrow(self, query: str):
        """Execute and return an Arrow table (Arrow IPC result surface)."""
        return self.sql(query).toArrow()

    def explain(self, query: str, mode: str = "formatted") -> str:
        """EXPLAIN surface (reference: EXPLAIN / EXPLAIN CALCITE
        statements, ParserWrapper.h) — returns the physical plan."""
        df = self.sql(query)
        return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), mode
        )

    def stop(self) -> None:
        self.spark.stop()
