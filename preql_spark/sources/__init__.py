from preql_spark.sources.mutable import MutableTable, transaction

__all__ = ["MutableTable", "transaction"]
