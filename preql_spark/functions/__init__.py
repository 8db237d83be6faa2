"""Function library — SURVEY.md §2.4 (aggregates) + §2.8 (scalars).

Everything here is a composition of JVM-side ``pyspark.sql.functions``
(whole-stage-codegen friendly); no Python UDFs in this module.
"""

from preql_spark.functions.scalar import *  # noqa: F401,F403
from preql_spark.functions.aggregate import *  # noqa: F401,F403
