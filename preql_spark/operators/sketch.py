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


def quantile_rollup(df: DataFrame, group_cols: list[str],
                    value_col: str, qs: list[float],
                    approx: bool = False,
                    accuracy: int = 10000) -> DataFrame:
    """Multi-level quantile report — per-(all group_cols) groups PLUS
    every coarser prefix level up to the grand total — in ONE shuffle
    pass via ROLLUP, as ``(group_cols..., n, p<q>...)`` with NULLs
    marking the aggregated-out dimensions (the standard ROLLUP
    shape).

    Why ROLLUP instead of one query per level: each level re-scans
    and re-shuffles the corpus; ROLLUP computes all of them from one
    partial-agg pass.  ``approx=True`` switches the percentile
    aggregate to Spark's mergeable ``percentile_approx`` (GK-style
    summary state, bounded memory per group regardless of group
    size) — the 100 TB path, where exact per-group percentile's
    collected-values buffer is only safe for bounded groups.  The
    exact path is the oracle-gradeable one (DuckDB ``quantile_cont``
    mirrors Spark's exact ``percentile`` interpolation — the q08
    precedent)."""
    if isinstance(group_cols, str):
        group_cols = [group_cols]
    if isinstance(qs, float):
        qs = [qs]
    if not group_cols:
        raise ValueError("quantile_rollup needs at least one group col")
    if not qs:
        raise ValueError("quantile_rollup needs at least one quantile")
    exprs = [F.count(F.lit(1)).alias("n")]
    seen: dict[str, int] = {}
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile {q} outside [0, 1]")
        name = f"p{int(round(q * 100)):02d}"
        # near-equal quantiles (0.5 and 0.501) collide on the rounded
        # label — suffix repeats so the output schema stays unique
        seen[name] = seen.get(name, 0) + 1
        if seen[name] > 1:
            name = f"{name}_{seen[name]}"
        agg = (F.percentile_approx(value_col, F.lit(q), F.lit(accuracy))
               if approx else F.percentile(value_col, F.lit(q)))
        exprs.append(agg.alias(name))
    return df.rollup(*group_cols).agg(*exprs)


def mg_summaries(base: DataFrame, cap: int) -> DataFrame:
    """Per-partition batched Misra-Gries summaries over
    ``base('item')``: at most ``cap`` ``(item, est)`` rows per
    partition plus one ``(NULL, n_p)`` row carrying the partition's
    non-null item count.  Merging a batch's value_counts then
    subtracting the (cap+1)-th largest residual destroys
    >= cap+1 units of mass per unit subtracted, so the per-partition
    undercount is <= n_p/(cap+1) — the mergeable-summaries bound
    (Agarwal et al., PODS 2012) that :func:`frequent_items` and the
    streaming ingest both build their candidate guarantee on."""
    from pyspark.sql import types as T

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

    return base.mapInPandas(kern, schema)


def mg_merge(counts: dict, incoming, cap: int) -> dict:
    """Merge ``(item, est)`` pairs into a Misra-Gries count dict and
    re-prune to ``cap`` entries (subtract the (cap+1)-th largest) —
    the driver-side merge step for kilobyte-scale summary state.
    Returns the merged dict; total undercount stays <= n/(cap+1)
    because every unit subtracted destroys >= cap+1 units of mass."""
    for item, est in incoming:
        counts[item] = counts.get(item, 0) + int(est)
    if len(counts) > cap:
        vals = sorted(counts.values())
        cstar = vals[-(cap + 1)]
        counts = {k: v - cstar for k, v in counts.items() if v > cstar}
    return counts


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

    from preql_spark.operators.text import ensure_parallelism
    if not 0.0 < phi < 1.0:
        raise ValueError(f"phi must be in (0, 1), got {phi}")
    cap = int(capacity) if capacity is not None else int(math.ceil(2.0 / phi))
    if cap < 1:
        raise ValueError(f"capacity must be >= 1, got {cap}")
    base = ensure_parallelism(df.select(F.col(col).alias("item")))
    # summaries persist only across the two collects below (the
    # scalar n and the candidate set — <= cap*partitions rows,
    # kilobytes); the candidate set is materialized into a LITERAL
    # frame so the returned lazy plan holds no reference to the
    # cached partitions, and summ is unpersisted before returning —
    # repeated calls cannot accumulate cached partitions.
    summ = mg_summaries(base, cap).persist()
    try:
        n = summ.filter(F.col("item").isNull()) \
                .agg(F.sum("est")).collect()[0][0] or 0
        if n == 0:
            return base.groupBy(F.col("item")) \
                       .agg(F.count(F.lit(1)).alias("cnt")).limit(0)
        cand_rows = [(r["item"],) for r in
                     summ.filter(F.col("item").isNotNull())
                         .select("item").distinct().collect()]
    finally:
        summ.unpersist(blocking=False)
    t = int(math.ceil(phi * float(n)))
    from pyspark.sql import types as T
    cand = df.sparkSession.createDataFrame(
        cand_rows,
        T.StructType([T.StructField("item",
                                    df.schema[col].dataType)]))
    return (base.join(F.broadcast(cand), "item", "leftsemi")
            .groupBy("item").agg(F.count(F.lit(1)).alias("cnt"))
            .filter(F.col("cnt") >= F.lit(t)))


# ---- t-digest: mergeable quantile sketch over CONTINUOUS domains ----------
# The exact histogram state (quantile_rollup / the q158 streaming
# ingest) needs a discrete value domain; the t-digest (Dunning's
# merging digest, k1 scale function) bounds state at ~delta centroids
# per group for ANY real-valued metric, merges associatively enough
# for wave-by-wave ingestion, and keeps tail quantiles tight.  All
# kernels are deterministic (stable sorts, fixed fold order), so the
# same input always yields the same digest.

def _td_k(q: float, delta: float) -> float:
    import math
    q = max(0.0, min(1.0, q))
    return delta / (2.0 * math.pi) * math.asin(2.0 * q - 1.0)


def _td_compress(means, weights, delta: float):
    """Greedy left-to-right centroid merge under the k1 scale bound —
    the core of the merging t-digest.  Deterministic: stable
    mean-sort, fixed fold order, incremental weighted means."""
    import numpy as np
    means = np.asarray(means, dtype="float64")
    weights = np.asarray(weights, dtype="float64")
    if means.size == 0:
        return means, weights
    order = np.argsort(means, kind="stable")
    m, w = means[order], weights[order]
    total = float(w.sum())
    out_m: list = []
    out_w: list = []
    cur_m, cur_w = float(m[0]), float(w[0])
    w_before = 0.0
    for i in range(1, m.size):
        q0 = w_before / total
        q2 = (w_before + cur_w + float(w[i])) / total
        if _td_k(q2, delta) - _td_k(q0, delta) <= 1.0:
            nw = cur_w + float(w[i])
            cur_m += (float(m[i]) - cur_m) * (float(w[i]) / nw)
            cur_w = nw
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            w_before += cur_w
            cur_m, cur_w = float(m[i]), float(w[i])
    out_m.append(cur_m)
    out_w.append(cur_w)
    return (np.asarray(out_m, dtype="float64"),
            np.asarray(out_w, dtype="float64"))


def _td_schema(df: DataFrame, group_cols: list[str]):
    from pyspark.sql import types as T
    return T.StructType(
        [df.schema[c] for c in group_cols]
        + [T.StructField("means", T.ArrayType(T.DoubleType())),
           T.StructField("weights", T.ArrayType(T.DoubleType())),
           T.StructField("vmin", T.DoubleType()),
           T.StructField("vmax", T.DoubleType()),
           T.StructField("n", T.LongType())])


def tdigest(df: DataFrame, group_cols: list[str] | str,
            value_col: str, delta: float = 100.0) -> DataFrame:
    """Per-group t-digest of ``value_col`` — ``(group..., means,
    weights, vmin, vmax, n)`` with at most ~2*delta centroids.

    Scale shape: the textbook two-level sketch build — an Arrow
    ``mapInPandas`` pass compresses each batch's values into partial
    digests (scan-local, memory bounded by the Arrow batch), then ONE
    group-keyed shuffle of digest rows (never raw values) merges
    them.  At 100 TB the shuffle carries |groups| x batches x ~delta
    centroids — kilobytes per group — and the state is persistable
    and re-mergeable (:func:`tdigest_merge`,
    ``streaming.incremental_tdigest_ingest``).  NULL values are
    ignored; empty groups vanish (SQL aggregate semantics)."""
    import pandas as pd

    if isinstance(group_cols, str):
        group_cols = [group_cols]
    if delta < 10:
        raise ValueError(f"delta must be >= 10, got {delta}")
    d = float(delta)
    gcols = list(group_cols)
    vcol = value_col
    schema = _td_schema(df, gcols)

    def _partials(it):
        import numpy as np
        for pdf in it:
            if not len(pdf):
                continue
            pdf = pdf[pdf[vcol].notna()]
            if not len(pdf):
                continue
            out = []
            for key, grp in pdf.groupby(gcols, sort=True,
                                        dropna=False):
                v = np.sort(grp[vcol].to_numpy(dtype="float64"),
                            kind="stable")
                m, w = _td_compress(v, np.ones_like(v), d)
                key = key if isinstance(key, tuple) else (key,)
                out.append((*key, list(m), list(w),
                            float(v[0]), float(v[-1]), int(v.size)))
            yield pd.DataFrame(out, columns=[*gcols, "means",
                                             "weights", "vmin",
                                             "vmax", "n"])

    partials = (df.select(*gcols, vcol)
                .mapInPandas(_partials, schema=schema))
    # the final stage IS the rollup merge — one kernel, two callers
    return tdigest_merge(partials, gcols, delta=d)


def tdigest_merge(digests: DataFrame,
                  group_cols: list[str] | str,
                  delta: float = 100.0) -> DataFrame:
    """Merge digest rows up to coarser groups (drop dimensions from
    ``group_cols``) — the monthly-from-daily rollup, touching only
    sketch rows; same output shape as :func:`tdigest`."""
    import pandas as pd

    if isinstance(group_cols, str):
        group_cols = [group_cols]
    gcols = list(group_cols)
    d = float(delta)
    schema = _td_schema(digests, gcols)

    def _merge(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np
        m = np.concatenate([np.asarray(x, dtype="float64")
                            for x in pdf["means"]])
        w = np.concatenate([np.asarray(x, dtype="float64")
                            for x in pdf["weights"]])
        mm, ww = _td_compress(m, w, d)
        return pd.DataFrame(
            [(*[pdf[c].iloc[0] for c in gcols], list(mm), list(ww),
              float(pdf["vmin"].min()), float(pdf["vmax"].max()),
              int(pdf["n"].sum()))],
            columns=[*gcols, "means", "weights", "vmin", "vmax", "n"])

    return digests.groupBy(*gcols).applyInPandas(_merge,
                                                 schema=schema)


def tdigest_quantiles(digests: DataFrame,
                      group_cols: list[str] | str,
                      qs: tuple = (0.5, 0.9)) -> DataFrame:
    """Quantile estimates from digest rows — ``(group..., pXX...)``.
    The standard interpolation: cumulative centroid midpoints anchor
    a piecewise-linear CDF clamped to [vmin, vmax].  Runs as one
    narrow Arrow pass over the (tiny) digest table."""
    import pandas as pd
    from pyspark.sql import types as T

    if isinstance(group_cols, str):
        group_cols = [group_cols]
    gcols = list(group_cols)
    # near-equal quantiles collide on the rounded p-label -> _N
    # suffix (the quantile_rollup naming contract), so the output
    # schema never carries duplicate field names
    pnames: list = []
    for q in qs:
        base = f"p{int(round(q * 100)):02d}"
        name, i = base, 1
        while name in pnames:
            i += 1
            name = f"{base}_{i}"
        pnames.append(name)
    qvals = [float(q) for q in qs]
    schema = T.StructType(
        [digests.schema[c] for c in gcols]
        + [T.StructField(p, T.DoubleType()) for p in pnames])

    def _est(it):
        import numpy as np
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                m = np.asarray(r.means, dtype="float64")
                w = np.asarray(r.weights, dtype="float64")
                cum = np.cumsum(w) - w / 2.0
                xs = np.concatenate(([0.0], cum, [float(r.n)]))
                ys = np.concatenate(([r.vmin], m, [r.vmax]))
                ests = [float(np.interp(q * r.n, xs, ys))
                        for q in qvals]
                rows.append((*[getattr(r, c) for c in gcols], *ests))
            yield pd.DataFrame(rows, columns=[*gcols, *pnames])

    return digests.mapInPandas(_est, schema=schema)
