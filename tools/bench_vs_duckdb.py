"""Differential throughput: each headline bench query timed on the
PySpark engine vs DuckDB executing the SAME oracle SQL over the same
parquet files (best-of-3, warm).  DuckDB stands in for "the reference
on its best single-node backend" — the reference compiles to SQL and
delegates all execution (SURVEY §0), so this is the apples-to-apples
throughput comparison BASELINE.md asks for.

Usage: python tools/bench_vs_duckdb.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    import duckdb
    import __spark_entry__ as entry
    from bench import BENCH_QUERIES
    from preql_spark.engine import default_session

    spark = default_session("bench_vs_duckdb")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entry.queries(), entry.oracle_sql()
    rows = []
    for name in BENCH_QUERIES:
        df = qs[name](spark, sf_dir)
        t_spark = min(_t(lambda: df.write.format("noop")
                         .mode("overwrite").save()) for _ in range(3))
        if name in oracles:
            sql = oracles[name]
            t_duck = min(_t(lambda: con.execute(sql).fetchall())
                         for _ in range(3))
        else:
            t_duck = None
        rows.append({"query": name, "spark_s": round(t_spark, 4),
                     "duckdb_s": round(t_duck, 4) if t_duck else None,
                     "ratio": round(t_spark / t_duck, 2) if t_duck else None})
    print(json.dumps({"sf_dir": sf_dir, "rows": rows}, indent=2))


def _t(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
