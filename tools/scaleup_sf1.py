"""sf1-equivalent (10x) scale-up experiment for the HEADLINE queries.

VERDICT r3 item 6: measure how every headline query scales from sf0.1
to an sf1-equivalent corpus, and record the scaling exponent.  There
is no driver-generated sf1 fixture, so the copy is built by 10x
replication of sf0.1 with shifted keys (constant dup/near-dup/match
rates — the same protocol as tools/scaleup_x4.py): FACT tables
(lineitem, orders, customer, events, documents, embeddings) replicate
10x with consistent key shifts on both sides of every join; DIM
tables (region, nation, supplier, part) are copied unchanged, which
is the realistic shape (facts grow, dims don't).  Event timestamps
shift by +40 days per replica so time-bucketed operators see 10x the
buckets, not 10x the rows per bucket.

Timing: best-of-3 with the noop sink on local[32]; the clock starts
BEFORE query construction so iterative operators (k-means, SemDeDup,
connected components) pay their driver-coordinated rounds inside the
measurement.  The reported exponent is alpha = log10(t_10x / t_1x),
the alpha in t ~ c * n^alpha fit through the two scales (1.0 = linear,
< 1.0 = sub-linear; a 10x wall-clock ratio on 10x rows is linear).
Caveat of any two-point fit at these absolute sizes: fixed per-query
overheads (~0.1 s planning/codegen) bias small queries DOWNWARD, so
read alpha as an upper-bound check ("nothing super-linear"), not a
precise asymptote.

Usage: python tools/scaleup_sf1.py [build|run|all] (default all)
Emits one JSON line per query plus a summary JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sf1_x10"
REPLICAS = 10
SHIFT = 10_000_000

FACTS = {
    # table -> (key columns to shift, timestamp column to stagger or None)
    "documents": (["doc_id"], None),
    "embeddings": (["vec_id"], None),
    "orders": (["o_orderkey", "o_custkey"], None),
    "customer": (["c_custkey"], None),
    "lineitem": (["l_orderkey"], None),
    "events": (["event_id", "user_id"], "ts"),
}
DIMS = ["region", "nation", "supplier", "part"]


def build(spark):
    from pyspark.sql import functions as F
    for name, (keys, ts_col) in FACTS.items():
        df = spark.read.parquet(os.path.join(SRC, f"{name}.parquet"))
        parts = [df]
        for r in range(1, REPLICAS):
            rep = df
            for k in keys:
                rep = rep.withColumn(k, F.col(k) + r * SHIFT)
            if ts_col is not None:
                rep = rep.withColumn(
                    ts_col, F.col(ts_col) + F.make_interval(
                        days=F.lit(40 * r)))
            parts.append(rep)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(32).write.mode("overwrite") \
           .parquet(os.path.join(DST, f"{name}.parquet"))
        print("built", name, flush=True)
    for name in DIMS:
        src = os.path.join(SRC, f"{name}.parquet")
        dst = os.path.join(DST, f"{name}.parquet")
        if os.path.isdir(src):
            shutil.copytree(src, dst, dirs_exist_ok=True)
        else:
            shutil.copyfile(src, dst)
        print("copied dim", name, flush=True)


def run(spark, only=()):
    import math

    import __spark_entry__ as entry
    from bench import BENCH_QUERIES

    qs = entry.queries()

    def t(fn, sf_dir) -> float:
        # clearCache per rep (r15): operators with internal persists
        # (q64/q99/q137/q209) must rebuild their caches inside the
        # measured rep at BOTH scales or alpha reads cache-hit noise
        best = float("inf")
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    rows = {}
    for name in (list(only) or BENCH_QUERIES):
        try:
            t1 = t(qs[name], SRC)
            t10 = t(qs[name], DST)
            alpha = round(math.log10(max(t10, 1e-4) / max(t1, 1e-4)), 3)
            rows[name] = {"t_sf01": t1, "t_sf1": t10,
                          "ratio": round(t10 / t1, 2) if t1 else -1,
                          "alpha": alpha}
            print(json.dumps({"query": name, **rows[name]}), flush=True)
        except Exception as e:  # noqa: BLE001 - isolate per query
            rows[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
            print(json.dumps({"query": name, **rows[name]}), flush=True)
    ok = {n: r for n, r in rows.items() if "alpha" in r}
    print(json.dumps({
        "metric": "sf1_scaleup",
        "n": len(ok),
        "worst": max((r["alpha"] for r in ok.values()), default=None),
        "median": sorted(r["alpha"] for r in ok.values())[len(ok) // 2]
        if ok else None,
        "queries": rows,
    }), flush=True)


def main():
    from preql_spark.engine import default_session
    spark = default_session("scaleup_sf1")
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    if mode in ("build", "all") or not os.path.isdir(DST):
        build(spark)
    if mode in ("run", "all"):
        run(spark, only=sys.argv[2:])


if __name__ == "__main__":
    main()
