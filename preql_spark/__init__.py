"""preql_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of erezsh/Preql.

Architecture (SURVEY.md §7): a thin Python front-end (catalog + FK
metadata + fluent Table API) that emits plain PySpark DataFrame /
Column expressions. Catalyst does all optimization; actions
(``collect``/``show``/``write``) are the only point of execution.

This is a brand-new Spark-first design, not a port of the reference's
SQL-string interpreter. Reference parity targets are cited per-module
as ``/root/reference/<file>:<line>``.
"""

from preql_spark.engine import Engine, connect
from preql_spark.table import Table, desc, exclude
from preql_spark.exprs import this

__all__ = ["Engine", "connect", "Table", "desc", "exclude", "this"]

__version__ = "0.1.0"
