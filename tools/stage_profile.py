"""Per-stage empirical profile of one bench query (guide §1.1/§7.1).

Runs a single ``__spark_entry__`` query with the Spark UI enabled,
executes it via the noop sink, then dumps every completed stage's
wall-clock, task count, input/shuffle bytes and records from the UI
REST API — the "which stage is slow" loop without a browser.

Usage: python tools/stage_profile.py <query> [sf_dir] [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName(f"stage_profile_{name}")
             .config("spark.sql.shuffle.partitions", str(cpus))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
             .config("spark.sql.optimizer.runtime.bloomFilter.enabled",
                     "true")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.ui.enabled", "true")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
             .config("spark.sql.warehouse.dir", "/tmp/preql_spark_warehouse")
             .config("spark.driver.extraJavaOptions",
                     "-Dderby.system.home=/tmp/preql_spark_derby")
             .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    import __spark_entry__ as entry
    qs = entry.queries()

    walls = []
    for i in range(runs):
        spark.sparkContext.setJobDescription(f"{name} run {i}")
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        t_construct = time.perf_counter() - t0
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t_exec = time.perf_counter() - t1
        walls.append((t_construct, t_exec))
        print(f"run {i}: construct {t_construct:.3f}s exec {t_exec:.3f}s")

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    url = f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    stages = json.loads(urllib.request.urlopen(url).read())
    stages.sort(key=lambda s: -(s.get("executorRunTime") or 0))
    print(f"\n{'stage':>6} {'wall_ms':>8} {'taskT_ms':>9} {'tasks':>5} "
          f"{'in_MB':>8} {'sh_r_MB':>8} {'sh_w_MB':>8}  name")
    for s in stages[:40]:
        sub = s.get("submissionTime")
        comp = s.get("completionTime")
        wall = "-"
        if sub and comp:
            from datetime import datetime
            fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
            try:
                wall = round((datetime.strptime(comp[:-3], fmt[:-2])
                              - datetime.strptime(sub[:-3], fmt[:-2])
                              ).total_seconds() * 1000)
            except ValueError:
                wall = "-"
        print(f"{s['stageId']:>6} {wall!s:>8} "
              f"{s.get('executorRunTime', 0):>9} "
              f"{s.get('numCompleteTasks', 0):>5} "
              f"{s.get('inputBytes', 0)/1e6:>8.1f} "
              f"{s.get('shuffleReadBytes', 0)/1e6:>8.1f} "
              f"{s.get('shuffleWriteBytes', 0)/1e6:>8.1f}  "
              f"{s.get('name', '')[:60]}")
    total_exec = sum(e for _, e in walls)
    print(f"\nbest exec {min(e for _, e in walls):.3f}s  "
          f"best construct {min(c for c, _ in walls):.3f}s  "
          f"({runs} runs, total exec {total_exec:.3f}s)")


if __name__ == "__main__":
    main()
