"""4x scale-up experiment for the round-3b operators.

Protocol (same as the earlier headline/round-3 experiments recorded in
SCALE.md): replicate the sf0.1 tables 4x with shifted primary keys
(constant dup/near-dup rates), write as 32 parquet files, then time
each operator best-of-3 with the noop sink on local[32] — once on the
original fixtures, once on the 4x copy.  Sub-linear wall-clock growth
on 4x rows is the property under test (no super-linear shuffle or
skew blow-ups).

Usage: python tools/scaleup_x4.py [build|run]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sf0.1_x4"

TABLES = {
    # table -> columns to shift per replica so keys stay unique
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "lineitem": ["l_orderkey"],
}
SHIFT = 10_000_000


def build(spark):
    from pyspark.sql import functions as F
    for name, keys in TABLES.items():
        df = spark.read.parquet(os.path.join(SRC, f"{name}.parquet"))
        parts = [df]
        for r in range(1, 4):
            rep = df
            for k in keys:
                rep = rep.withColumn(k, F.col(k) + r * SHIFT)
            parts.append(rep)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(32).write.mode("overwrite") \
           .parquet(os.path.join(DST, f"{name}.parquet"))
        print("built", name)


def queries(spark, sf_dir):
    from pyspark.sql import functions as F

    from preql_spark.operators.bloom import bloom_semi_join
    from preql_spark.operators.cluster import kmeans, semdedup
    from preql_spark.operators.dedup import chunk_dedup, corpus_overlap
    from preql_spark.operators.history import scd2_history, snapshot_diff
    from preql_spark.operators.text import (cap_per_domain, llr_importance,
                                            quantile_bucketize)

    def rd(name):
        return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))

    docs, emb = rd("documents"), rd("embeddings")
    orders, cust, li = rd("orders"), rd("customer"), rd("lineitem")

    return {
        "kmeans": lambda: kmeans(emb, k=8, iters=2)[0],
        "semdedup": lambda: semdedup(emb, tau=0.45, k=8, iters=2),
        "chunk_dedup": lambda: chunk_dedup(docs, chunk=3),
        "domain_cap": lambda: cap_per_domain(
            docs, "source", 5, [F.col("n_chars").desc(), F.col("doc_id")]),
        "scd2": lambda: scd2_history(
            orders, ["o_custkey"], "o_orderdate",
            ["o_orderpriority"], ["o_orderkey"]),
        "llr": lambda: llr_importance(
            docs, F.col("source").isin("src0", "src1", "src2", "src3")),
        "bloom_semi": lambda: bloom_semi_join(
            li, "l_orderkey",
            orders.filter(F.col("o_totalprice") > 400000), "o_orderkey"),
        "overlap": lambda: corpus_overlap(
            docs.filter(F.col("doc_id") % 2 == 0),
            docs.filter(F.col("doc_id") % 3 == 0)),
        "snapshot_diff": lambda: snapshot_diff(
            cust.select("c_custkey", "c_acctbal"),
            cust.select("c_custkey", "c_acctbal")
                .filter(F.col("c_custkey") % 97 != 0), ["c_custkey"]),
        "bucketize": lambda: quantile_bucketize(orders, "o_totalprice", 8),
    }


def run(spark):
    def t(make):
        # t0 before make(): the iterative operators (kmeans/semdedup)
        # run driver-coordinated jobs during construction — that IS
        # part of the operator's cost and must be inside the clock
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            make().write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    for sf_dir in (SRC, DST):
        print("==", sf_dir)
        for name, make in queries(spark, sf_dir).items():
            print(f"  {name}: {t(make)} s", flush=True)


def main():
    from preql_spark.engine import default_session
    spark = default_session("scaleup_x4")
    mode = sys.argv[1] if len(sys.argv) > 1 else "run"
    if mode == "build":
        build(spark)
    else:
        if not os.path.isdir(DST):
            build(spark)
        run(spark)


if __name__ == "__main__":
    main()
