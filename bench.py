"""Benchmark runner — times the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line.

Each query executes fully via the ``noop`` sink (computes everything,
collects nothing — measures engine throughput, not driver transfer).

Each query runs three times and the best time is reported: the reference's
baseline numbers (BASELINE.md) are averages of 1000 warm in-process
iterations, so steady-state is the comparable measurement — the first
run pays one-time parquet footer reads and whole-stage-codegen
compilation that the reference's methodology also excludes.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "q01_pricing_summary",   # grouped agg battery on fact table
    "q04_revenue_by_nation", # 4-table FK join + agg + sort
    "q05_region_order_stats",# join chain with broadcast dims
    "q06_forecast_revenue",  # pushdown filter + scalar agg
    "q16_casts",             # wide per-row expression projection
    "q25_window_rank",       # partitioned window
    "q38_neardup_minhash",   # MinHash-LSH near-dup (text pipeline)
    "q40_cosine_topk",       # brute-force vector top-k
    "q44_sessionize",        # stateful event sessionization
    "q45_tumbling_window",   # time-bucket aggregation
    "q64_tfidf_top_terms",   # explode + multi-agg + window top-k (text)
    "q75_pack_sequences",    # bucketed-window token packing
    "q78_interval_join",     # bucketized range join (no BNLJ)
    "q95_repetition_metrics",# Gopher repetition gates (narrow hashed shuffles)
    "q99_lm_perplexity",     # bigram-LM quality scores (vocab-bounded joins)
    "q102_chunk_dedup",      # unit dedup + doc reassembly (text shuffles)
    "q106_bloom_semi_join",  # bloom-pruned fact⋈dim semi join
    "q114_curation_pipeline",# composed gate→dedup→decontam→cap chain
    "q100_kmeans",           # Lloyd k-means (driver centroids, scan-local argmin)
    "q101_semdedup",         # cluster-local semantic dedup (SemDeDup)
    "q73_dedup_canonical",   # MinHash-LSH -> connected components -> canonical
    "q137_duplicate_spans",  # substring-level dup spans (gram hash + interval merge)
    "q138_pq_adc_topk",      # product-quantization ADC top-k (8-byte codes)
    "q145_hybrid_search",    # RRF fusion of BM25 + cosine retrieval legs
    "q185_weighted_pagerank",# iterative Pregel loop (graph family)
    "q209_curation_pipeline",# end-to-end curation capstone (6 stages)
    "q215_gopher_quality_gate",  # Gopher gate (one scan-local Project)
    "q217_gate_rate_ingest",  # streaming keep-rate ingest (two waves)
    "q221_classifier_gate",  # Arrow mapInPandas model gate (one pass)
    "q218_curation_ingest",  # streaming sidecar materialization (two waves)
]

# iterative queries whose localCheckpoints materialize at construction
# — timed construct+execute per run so the loop cost is measured (and
# an in-loop driver-action regression is visible), not just the final
# post-checkpoint stage.  q217 is construct-per-run for the streaming
# analogue: its two availableNow ingests over fresh scratch dirs ARE
# the work; a prebuilt report frame would time only the state agg.
CONSTRUCT_EACH_RUN = {"q185_weighted_pagerank", "q209_curation_pipeline",
                      "q217_gate_rate_ingest", "q218_curation_ingest"}

# r15 (VERDICT r14 item 3): queries whose OPERATORS persist an internal
# reuse frame (q137 grams, tf_idf doc_term, q99 bigrams) previously
# served that subtree from the InMemoryRelation built in the untimed
# warm run — the timed reps measured "compute zero times", not the
# production "compute once, consume twice".  They are now timed
# construct-per-rep with spark.catalog.clearCache() before EACH side's
# construct (see time_fn/time_fn_pair), so every timed rep rebuilds
# and re-registers its own cache from the parquet inputs.  The clear
# also stops CacheManager plan-matching from re-serving one rep's (or
# one SIDE's — engine vs twin plans canonicalize equal) cache to the
# next.  Methodology change is additions-only and documented in
# OPTIMIZATION_r15.md; r14 walls for these queries are NOT comparable.
CACHE_REBASE = {"q64_tfidf_top_terms", "q99_lm_perplexity",
                "q137_duplicate_spans"}


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from preql_spark.engine import default_session
    import __spark_entry__ as entry

    spark = default_session("preql_spark_bench")
    # warm the JVM/executor pool so q1 doesn't pay startup
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    from bench_twins import TWINS, normalized_plan

    def run_once(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    def time_df(df) -> float:
        # best-of-5: the first bench query in a fresh JVM keeps
        # hitting deeper JIT tiers for ~5 runs, which best-of-3 reads
        # as a spurious engine-vs-twin gap (both sides converge to the
        # same time with more iterations; plans are equal)
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            run_once(df)
            best = min(best, time.perf_counter() - t0)
        return best

    def time_fn(fn, sf_dir) -> float:
        # CONSTRUCT-per-run timing for iterative/checkpointed queries:
        # their localCheckpoints materialize at construction, so
        # re-running a prebuilt frame only times the final stage and
        # would hide an in-loop regression (e.g. a reintroduced
        # driver collect).  Both engine and twin time the same way,
        # so the ratio stays apples-to-apples.
        best = float("inf")
        for _ in range(3):
            spark.catalog.clearCache()   # r15: no cross-rep cache serving
            t0 = time.perf_counter()
            run_once(fn(spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        return best

    def time_pair(eng_df, twin_df) -> tuple[float, float]:
        # INTERLEAVED engine/twin timing (E,T,E,T,... best-of-5 each):
        # the two sides share a physical plan, so any wall-clock gap
        # is machine noise — sequential best-of-5s sample DIFFERENT
        # noise windows and can fabricate a ±0.3 "ratio" on a 0.4 s
        # query (the r9 q99 incident: 1.396 sequential, 1.005
        # interleaved — see PLANS.md).  Interleaving makes both
        # best-ofs draw from the same window, so the ratio measures
        # the plans, not the scheduler.
        be = bt = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            run_once(eng_df)
            be = min(be, time.perf_counter() - t0)
            t0 = time.perf_counter()
            run_once(twin_df)
            bt = min(bt, time.perf_counter() - t0)
        return be, bt

    def time_fn_pair(efn, tfn, sf_dir) -> tuple[float, float]:
        # the interleaved flavor of time_fn (construct+execute per
        # run, for the CONSTRUCT_EACH_RUN iterative queries)
        be = bt = float("inf")
        for _ in range(3):
            spark.catalog.clearCache()   # r15: each side rebuilds its own
            t0 = time.perf_counter()
            run_once(efn(spark, sf_dir))
            be = min(be, time.perf_counter() - t0)
            spark.catalog.clearCache()   # ... cache from parquet inputs
            t0 = time.perf_counter()
            run_once(tfn(spark, sf_dir))
            bt = min(bt, time.perf_counter() - t0)
        return be, bt

    qs = entry.queries()
    timings: dict[str, float] = {}
    hand: dict[str, float] = {}
    ratio: dict[str, float] = {}
    plan_match: dict[str, bool] = {}
    errors: dict[str, str] = {}
    # Per-query failure isolation (round-2 lesson: one broken twin
    # aborted the whole run and the round shipped zero perf numbers).
    # Engine and twin sides fail independently: a dead twin still
    # yields the engine timing, and vice versa.  Always exits 0 with
    # one parseable JSON line.
    for name in BENCH_QUERIES:
        eng_df = twin_df = None
        # construct + warm BOTH sides before timing EITHER: the two
        # sides usually share the identical physical plan, so whoever
        # runs second would otherwise inherit a hotter JIT (measured
        # as a spurious 1.3× "overhead" on the first bench query).
        try:
            eng_df = qs[name](spark, sf_dir)
            run_once(eng_df)  # warm untimed (codegen/footer costs)
        except Exception as e:  # noqa: BLE001 - isolate per query
            errors[name] = f"engine: {type(e).__name__}: {e}"[:500]
        # hand-authored PySpark twin: measures the engine layer's
        # overhead over the plan you'd write by hand (the reference's
        # "within 1-5% of hand-written SQL" claim, measured).  Plan
        # equality (physical plan modulo expression ids) is the strong
        # form of the claim; the wall-clock ratio backs it up.
        try:
            twin_df = TWINS[name](spark, sf_dir)
            run_once(twin_df)
        except Exception as e:  # noqa: BLE001
            errors[name] = (errors.get(name, "") +
                            f" twin: {type(e).__name__}: {e}"[:500]).strip()
        if eng_df is not None and twin_df is not None:
            # both sides alive: interleave so the ratio samples one
            # noise window (see time_pair); falls through to the
            # independent paths below only on a timing exception
            try:
                be, bt = (time_fn_pair(qs[name], TWINS[name], sf_dir)
                          if (name in CONSTRUCT_EACH_RUN
                              or name in CACHE_REBASE)
                          else time_pair(eng_df, twin_df))
                timings[name] = round(be, 4)
                hand[name] = round(bt, 4)
            except Exception as e:  # noqa: BLE001
                errors[name] = (errors.get(name, "") +
                                f" timing: {type(e).__name__}:"
                                f" {e}"[:500]).strip()
        if name not in timings and eng_df is not None:
            try:
                timings[name] = round(
                    time_fn(qs[name], sf_dir)
                    if (name in CONSTRUCT_EACH_RUN
                        or name in CACHE_REBASE) else time_df(eng_df), 4)
            except Exception as e:  # noqa: BLE001
                errors[name] = (errors.get(name, "") +
                                f" engine: {type(e).__name__}: {e}"[:500]).strip()
        if name not in hand and twin_df is not None:
            try:
                hand[name] = round(
                    time_fn(TWINS[name], sf_dir)
                    if (name in CONSTRUCT_EACH_RUN
                        or name in CACHE_REBASE) else time_df(twin_df), 4)
            except Exception as e:  # noqa: BLE001
                errors[name] = (errors.get(name, "") +
                                f" twin: {type(e).__name__}: {e}"[:500]).strip()
        if eng_df is not None and twin_df is not None:
            try:
                plan_match[name] = \
                    normalized_plan(eng_df) == normalized_plan(twin_df)
            except Exception as e:  # noqa: BLE001
                errors[name] = (errors.get(name, "") +
                                f" plan: {type(e).__name__}: {e}"[:300]).strip()
        if name in timings and name in hand:
            ratio[name] = round(timings[name] / hand[name], 3) \
                if hand[name] else 1.0

    total = round(sum(timings.values()), 4)
    # hand total over the queries timed on BOTH sides, so the aggregate
    # ratio compares like with like even under partial failure
    both = [n for n in timings if n in hand]
    hand_total = round(sum(hand[n] for n in both), 4)
    eng_both_total = round(sum(timings[n] for n in both), 4)
    line = json.dumps({
        "metric": "headline_queries_total_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "hand_twin_secs": hand,
        "engine_over_hand_ratio": ratio,
        "engine_over_hand_total": round(eng_both_total / hand_total, 3)
        if hand_total else 1.0,
        "plan_match": plan_match,
        "errors": errors,
        "n_queries": len(BENCH_QUERIES),
        "n_timed": len(timings),
        "sf": sf,
    })
    print(line)
    # full per-query history, committed: the driver's recorded stdout
    # tail truncates, so round-over-round wall comparisons would
    # otherwise rest on a shrinking shared key set (r11 verdict note).
    # Suite-invoked runs (tiny fixtures) stay out of the log — only
    # real bench invocations are history
    if "PYTEST_CURRENT_TEST" in os.environ:
        return
    try:
        import datetime
        stamped = json.dumps({"ts": datetime.datetime.now(
            datetime.timezone.utc).isoformat(timespec="seconds"),
            **json.loads(line)})
        with open(os.path.join(os.path.dirname(
                os.path.abspath(__file__)), "BENCHLOG.jsonl"), "a") as f:
            f.write(stamped + "\n")
    except OSError:
        pass                      # read-only checkout: stdout suffices


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001 - emit parseable JSON, exit 0
        import traceback
        traceback.print_exc(file=sys.stderr)
        print(json.dumps({
            "metric": "headline_queries_total_wall_seconds",
            "value": -1.0, "unit": "sec", "queries": {},
            "errors": {"__harness__": f"{type(e).__name__}: {e}"[:500]},
        }))
    sys.exit(0)
