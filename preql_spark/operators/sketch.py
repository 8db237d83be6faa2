"""Mergeable-sketch rollups — pre-aggregated distinct counts.

The pattern: aggregate once at fine granularity (e.g. per day per
source) into MERGEABLE HLL sketch state (Apache DataSketches, built
into Spark as ``hll_sketch_agg``/``hll_union_agg``), persist the
binary sketches, and answer coarser distinct-count questions later by
UNIONING sketches — kilobytes per group — instead of re-scanning the
raw corpus.  This is how a 100 TB/day pipeline serves "distinct users
this month" without a monthly shuffle of raw ids: 30 daily sketch
rows per group merge in milliseconds, and sketch union is EXACT with
respect to the sketch algorithm (merging daily sketches gives
bit-identical estimates to sketching the whole month directly —
tested).

No reference equivalent (Preql has count_distinct only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_rollup(df: DataFrame, group_cols: list[str], value_col: str,
               lg_k: int = 12, sketch_col: str = "hll") -> DataFrame:
    """Per-group HLL sketch state over ``value_col`` — one partial-agg
    shuffle; the output rows carry ~2^lg_k bytes of mergeable state
    each (lg_k 12 ≈ 1.6% relative error)."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias(sketch_col))


def hll_merge(sketches: DataFrame, group_cols: list[str],
              sketch_col: str = "hll") -> DataFrame:
    """Merge fine-grained sketches up to coarser groups (drop
    dimensions from ``group_cols``): the monthly-from-daily rollup,
    touching only sketch rows."""
    return sketches.groupBy(*group_cols).agg(
        F.hll_union_agg(sketch_col).alias(sketch_col))


def hll_estimate(sketches: DataFrame,
                 sketch_col: str = "hll",
                 out_col: str = "n_distinct") -> DataFrame:
    """Distinct-count estimates from sketch state (scan-local)."""
    return sketches.withColumn(
        out_col, F.hll_sketch_estimate(sketch_col)).drop(sketch_col)


def frequent_items(df: DataFrame, col: str, phi: float,
                   capacity: int | None = None) -> DataFrame:
    """EXACT phi-frequent items — every value whose count is
    >= ceil(phi * n) over n non-null rows — via mergeable Misra-Gries
    summaries plus an exact verify recount, as ``(item, cnt)``.

    Why not a plain groupBy?  A full ``groupBy(col).count()``
    shuffles one partial row per DISTINCT value per partition — at
    100 TB with billions of distinct n-grams that shuffle dwarfs the
    answer.  Here each partition emits at most ``capacity`` summary
    rows (batched Misra-Gries: merging a batch's value_counts then
    subtracting the (capacity+1)-th largest residual destroys
    >= capacity+1 units of mass per unit subtracted, so per-partition
    undercount <= n_p/(capacity+1)); with the default
    ``capacity = ceil(2/phi)`` an averaging argument guarantees every
    globally-phi-frequent item survives in at least one partition's
    summary.  The exact recount then scans once more, semi-joined to
    the broadcast candidate set, so the only corpus-wide shuffle
    carries candidate rows only.  Result is EXACT — the sketch only
    bounds the candidate set, it never decides a count.

    Driver traffic: the scalar n (one row) and the candidate set via
    broadcast (<= capacity x partitions rows).  The MG state lives
    per-partition and is capacity-bounded — Arrow batches stream
    through it."""
    import math

    from pyspark.sql import types as T

    from preql_spark.operators.text import ensure_parallelism
    if not 0.0 < phi < 1.0:
        raise ValueError(f"phi must be in (0, 1), got {phi}")
    cap = int(capacity) if capacity is not None else int(math.ceil(2.0 / phi))
    if cap < 1:
        raise ValueError(f"capacity must be >= 1, got {cap}")
    base = ensure_parallelism(df.select(F.col(col).alias("item")))
    item_t = base.schema["item"].dataType
    schema = T.StructType([T.StructField("item", item_t),
                           T.StructField("est", T.LongType())])

    def kern(batches):
        import numpy as np
        import pandas as pd
        counts: dict = {}
        total = 0
        for pdf in batches:
            s = pdf["item"].dropna()
            total += len(s)
            for item, c in s.value_counts().items():
                counts[item] = counts.get(item, 0) + int(c)
            if len(counts) > cap:
                vals = np.sort(np.fromiter(counts.values(),
                                           dtype=np.int64))
                cstar = int(vals[-(cap + 1)])
                counts = {k: v - cstar for k, v in counts.items()
                          if v > cstar}
        yield pd.DataFrame({"item": list(counts) + [None],
                            "est": list(counts.values()) + [total]})

    # summaries persist across the two consumers (the scalar n and
    # the candidate set in the returned plan) — cap*partitions rows,
    # kilobytes; scoped to this call, LRU-evicted like the other
    # operator-local persists (dedup shingles, IVF assignments)
    summ = base.mapInPandas(kern, schema).persist()
    n = summ.filter(F.col("item").isNull()) \
            .agg(F.sum("est")).collect()[0][0] or 0
    if n == 0:
        summ.unpersist(blocking=False)
        return base.groupBy(F.col("item")) \
                   .agg(F.count(F.lit(1)).alias("cnt")).limit(0)
    t = int(math.ceil(phi * float(n)))
    cand = summ.filter(F.col("item").isNotNull()) \
               .select("item").distinct()
    return (base.join(F.broadcast(cand), "item", "leftsemi")
            .groupBy("item").agg(F.count(F.lit(1)).alias("cnt"))
            .filter(F.col("cnt") >= F.lit(t)))
