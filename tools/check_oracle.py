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


def _spark_kind(dt) -> str:
    from pyspark.sql import types as T
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "ts"
    if isinstance(dt, T.ArrayType):
        return "list"
    if isinstance(dt, T.StructType):
        return "struct"
    if isinstance(dt, T.BinaryType):
        return "bin"
    return f"other:{dt.simpleString()}"


def _duck_kind(t: str) -> str:
    """Map a DuckDB type name to the same kind lattice — with the
    exact-compare hazards (HUGEINT, DECIMAL) kept distinct, because
    the driver's value hash sees them as different objects (int128 /
    Decimal) even when the numbers are equal.  DuckDB sum(BIGINT)
    returns HUGEINT; bare ``x * 1.0`` is DECIMAL — both must be CAST
    in oracle SQL."""
    t = t.upper()
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT"):
        return "int"
    if t in ("HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER",
             "USMALLINT", "UTINYINT"):
        return "hugeint"
    if t.startswith("DECIMAL"):
        return "decimal"
    if t in ("FLOAT", "DOUBLE", "REAL"):
        return "float"
    if t == "BOOLEAN":
        return "bool"
    if t == "VARCHAR":
        return "str"
    if t == "DATE":
        return "date"
    if t.startswith("TIMESTAMP"):
        return "ts"
    if t.endswith("[]") or t.startswith("LIST") or t.startswith("ARRAY"):
        return "list"
    if t.startswith("STRUCT"):
        return "struct"
    if t == "BLOB":
        return "bin"
    return f"other:{t}"


def dtype_mismatches(sdf, rel) -> list[str]:
    """Column-level kind divergences Spark vs DuckDB that survive
    value rounding but break the driver's exact hash."""
    skinds = {f.name: _spark_kind(f.dataType) for f in sdf.schema.fields}
    bad = []
    for col, t in zip(rel.columns, rel.types):
        dk = _duck_kind(str(t))
        sk = skinds.get(col)
        if sk is None:
            continue
        if dk == sk:
            continue
        # int vs ts/date etc. are definite; int-vs-float also definite
        bad.append(f"{col}: spark={sk} duckdb={dk}({t})")
    return bad


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
            rel = con.sql(oracles[name])
            dcols_raw = list(rel.columns)
            drows = [dict(zip(dcols_raw, row)) for row in rel.fetchall()]
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
        kinds_bad = dtype_mismatches(sdf, rel)
        if kinds_bad:
            print(f"FAIL {name}: dtype kind mismatch (driver-hash hazard): "
                  + "; ".join(kinds_bad))
            failed.append(name)
            continue
        # the DRIVER's canonicalizer hashes cells through pandas
        # factorize — list/struct cells raise `unhashable type` there
        # (burned in r6: q141/q146).  Serialize arrays to strings.
        nested = [f.name for f in sdf.schema.fields
                  if _spark_kind(f.dataType) in ("list", "struct")]
        if nested:
            print(f"FAIL {name}: nested output column(s) "
                  f"{nested} — driver hash cannot canonicalize "
                  "list/struct cells; serialize to string")
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
