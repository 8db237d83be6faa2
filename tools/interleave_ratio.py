"""10x interleaved engine-vs-twin timing for ONE bench query — the
committed noise protocol (PLANS.md q99 note): pre-warm both sides,
then time engine/twin strictly alternated in one noise window so a
scheduler/GC drift hits both sides equally.  Usage:

    python tools/interleave_ratio.py q64_tfidf_top_terms [sf_dir] [n]

Prints the per-run times, min/min and median/median ratios, and
re-confirms the physical plans match in-run.
"""
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "entry", "/root/repo/__spark_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    import bench_twins
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "16g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    eng_fn = m.queries()[name]
    twin_fn = getattr(bench_twins, name)

    e0, t0 = eng_fn(spark, sf_dir), twin_fn(spark, sf_dir)
    # the bench's canonical normalizer (expr ids, helper aliases,
    # lambda vars, truncation points, scratch-dir scan locations) —
    # a weaker local copy mis-reported q217's per-run scratch state
    # dirs as a plan mismatch
    same = (bench_twins.normalized_plan(e0)
            == bench_twins.normalized_plan(t0))
    print(f"plan_match in-run: {same}")
    # warm both sides (JIT, code cache, file listing, page cache)
    for _ in range(2):
        eng_fn(spark, sf_dir).count()
        twin_fn(spark, sf_dir).count()

    es, ts = [], []
    for i in range(n):
        st = time.perf_counter()
        eng_fn(spark, sf_dir).count()
        es.append(time.perf_counter() - st)
        st = time.perf_counter()
        twin_fn(spark, sf_dir).count()
        ts.append(time.perf_counter() - st)
    print("engine:", " ".join(f"{x:.3f}" for x in es))
    print("twin:  ", " ".join(f"{x:.3f}" for x in ts))
    print(f"min/min ratio: {min(es) / min(ts):.3f}")
    print(f"median/median ratio: "
          f"{statistics.median(es) / statistics.median(ts):.3f}")


if __name__ == "__main__":
    main()
