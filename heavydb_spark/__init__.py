"""heavydb_spark — a PySpark-native analytics engine with the query surface
of heavyai/heavydb (reference: /root/reference, read-only).

Architecture: idiomatic Spark. The engine is a thin, declarative layer —
SparkSession management + fixture catalog (`catalog`), a SQL dialect shim
(`dialect`) covering HeavyDB-isms Spark SQL lacks 1:1, a function registry
(`functions`), composed DataFrame operators (`operators`), and Structured
Streaming extensions (`streaming`). Catalyst/Tungsten do the heavy lifting
(plan optimization, codegen, shuffle) — see SURVEY.md §3-4 for the mapping
from the reference's RelAlgExecutor/NativeCodegen pipeline.
"""

from heavydb_spark.engine import Engine
from heavydb_spark.session import get_spark

__all__ = ["Engine", "get_spark"]
__version__ = "0.1.0"
