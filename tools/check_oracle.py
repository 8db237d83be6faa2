"""Local differential checker mimicking the driver's t2 gate:
runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` on DuckDB over the same parquet dir, compares
row-count, schema (column names), and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")


def normalize(rows: list[dict]) -> list[tuple]:
    out = []
    import numpy as np
    for r in rows:
        vals = []
        for k in sorted(r):
            v = r[k]
            if isinstance(v, np.ndarray):
                v = v.tolist()
            if isinstance(v, np.generic):
                v = v.item()
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 6)
            elif hasattr(v, "isoformat"):
                v = v.isoformat()
            if isinstance(v, list):
                v = tuple(round(x, 6) if isinstance(x, float) else x for x in v)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    import __spark_entry__ as entry
    from preql_spark.engine import default_session

    spark = default_session("oracle_check", cpus=16)

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = [r.asDict(recursive=True) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(srows)} rows")
            continue
        try:
            cur = con.execute(oracles[name])
            dcols_raw = [d[0] for d in cur.description]
            drows = [dict(zip(dcols_raw, row)) for row in cur.fetchall()]
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
            failed.append(name)
            continue
        scols = sorted(sdf.columns)
        dcols = sorted(dcols_raw)
        if scols != dcols:
            print(f"FAIL {name}: schema mismatch spark={scols} duckdb={dcols}")
            failed.append(name)
            continue
        if len(srows) != len(drows):
            print(f"FAIL {name}: rowcount spark={len(srows)} duckdb={len(drows)}")
            failed.append(name)
            continue
        ns, nd = normalize(srows), normalize(drows)
        if ns != nd:
            bad = next((i, a, b) for i, (a, b) in enumerate(zip(ns, nd)) if a != b)
            print(f"FAIL {name}: value mismatch at sorted-row {bad[0]}:\n  spark={bad[1]}\n  duck ={bad[2]}")
            failed.append(name)
            continue
        print(f"OK   {name}: {len(srows)} rows")
    print(f"\n{len(failed)} failed / {len([n for n in qs if not only or n in only])} checked")
    if failed:
        print("failed:", failed)
        sys.exit(1)


if __name__ == "__main__":
    main()
