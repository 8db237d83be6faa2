from preql_spark.sources.mutable import MutableTable

__all__ = ["MutableTable"]
