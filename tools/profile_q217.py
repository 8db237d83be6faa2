"""Phase-level profile of the q217 streaming construct: where does a
construct+execute run spend its wall?  Phases: source write, each
ingest call (split into guard/schema/run_id driver work vs stream
lifecycle), report noop.  Run: python tools/profile_q217.py [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from preql_spark.engine import default_session
    import __spark_entry__ as entry
    from preql_spark.streaming import stream as S

    spark = default_session("profile_q217")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # monkey-patch phase timers around the guard helpers
    acc = {}

    def timed(name, fn):
        def wrap(*a, **kw):
            t0 = time.perf_counter()
            try:
                return fn(*a, **kw)
            finally:
                acc[name] = acc.get(name, 0.0) + time.perf_counter() - t0
        return wrap

    S_orig = dict(
        _guard_stranded=S._guard_stranded,
        _gate_fingerprint_guard=S._gate_fingerprint_guard,
        _source_schema=S._source_schema,
        _ingest_run_id=S._ingest_run_id,
    )
    for n, f in S_orig.items():
        setattr(S, n, timed(n, f))

    # time the stream lifecycle: wrap DataStreamWriter.start+await via
    # patching awaitTermination is awkward; instead time the whole
    # ingest call and subtract the guard phases.
    ing_orig = S.incremental_gate_rate_ingest

    def ing(*a, **kw):
        t0 = time.perf_counter()
        r = ing_orig(*a, **kw)
        acc["ingest_call_total"] = acc.get("ingest_call_total", 0.0) + \
            time.perf_counter() - t0
        return r
    S.incremental_gate_rate_ingest = ing

    import preql_spark.streaming.stream  # noqa: F401

    qs = entry.queries()
    for rep in range(reps):
        acc.clear()
        t0 = time.perf_counter()
        df = qs["q217_gate_rate_ingest"](spark, sf_dir)
        t_construct = time.perf_counter() - t0
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t_report = time.perf_counter() - t0
        total = t_construct + t_report
        guards = sum(acc.get(k, 0.0) for k in S_orig)
        stream_side = acc.get("ingest_call_total", 0.0) - guards
        src_write = t_construct - acc.get("ingest_call_total", 0.0)
        print(f"rep{rep}: total={total:.3f} construct={t_construct:.3f} "
              f"report_noop={t_report:.3f}")
        print(f"  src_writes+misc={src_write:.3f} "
              f"ingest_calls={acc.get('ingest_call_total', 0.0):.3f} "
              f"(guards={guards:.3f}: " +
              ", ".join(f"{k}={acc.get(k, 0.0):.3f}" for k in S_orig) +
              f"; stream_lifecycle+sinks={stream_side:.3f})")


if __name__ == "__main__":
    main()
