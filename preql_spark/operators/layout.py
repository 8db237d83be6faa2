"""Physical-layout operators: Z-order (Morton) interleaving and
join-key skew diagnostics.

Z-ordering is the standard multi-dimensional data-skipping layout
(Delta/Iceberg `OPTIMIZE ZORDER BY`): interleaving the bits of several
sort keys gives a 1-D order in which ranges of EVERY key map to few
contiguous file spans, so min/max footer stats prune scans on any of
the interleaved columns — not just the leading sort key.  Here the
Morton code is a pure codegen'd Column expression; writing is a
range-partitioned sort on it (the same one global-sort shuffle a plain
sorted write costs).

No reference equivalent (Preql's `add_index` delegates to the target
database's B-tree indexes, sql_interface).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: list, bits: int = 16) -> Column:
    """Morton interleave of ``len(cols)`` non-negative integer columns
    into one BIGINT: bit i of column j lands at position
    ``i * n_cols + j``.  ``bits`` low bits of each column are used
    (values are masked, not rejected — callers bucketize/clamp first
    for wider domains).  Pure shift/and/or arithmetic — whole-stage
    codegen, no shuffle, and mirrorable verbatim in SQL oracles."""
    n = len(cols)
    if not 1 <= n * bits <= 63:
        raise ValueError("n_cols * bits must fit a signed BIGINT")
    out = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        col = (c if isinstance(c, Column) else F.col(c)).cast("long")
        for i in range(bits):
            out = out.bitwiseOR(
                F.shiftleft(F.shiftright(col, i).bitwiseAND(F.lit(1)),
                            i * n + j))
    return out


def skew_report(df: DataFrame, key, top: int = 20) -> DataFrame:
    """Join/agg-key skew diagnostic: the ``top`` heaviest keys with
    their share of all rows and the multiple of a perfectly uniform
    key's load.  One partial-agg shuffle on the key + a top-k
    (TakeOrdered — no global sort); totals ride a broadcast 1-row
    frame so the report is a single lazy plan.

    Reading it: ``x_uniform`` >> 1 on the biggest keys means a plain
    shuffle join will straggle — salt those keys
    (:func:`preql_spark.operators.skew.salted_join`) or rely on AQE
    skew-split, and re-check."""
    k = key if isinstance(key, Column) else F.col(key)
    counts = df.select(k.alias("key")).groupBy("key") \
        .agg(F.count(F.lit(1)).alias("n_rows"))
    totals = F.broadcast(counts.agg(
        F.sum("n_rows").alias("__total"),
        F.count(F.lit(1)).alias("__nkeys")))
    return (counts.crossJoin(totals)
            .select("key", "n_rows",
                    (F.col("n_rows") / F.col("__total")).alias("share"),
                    (F.col("n_rows") * F.col("__nkeys") / F.col("__total"))
                    .alias("x_uniform"))
            .orderBy(F.col("n_rows").desc(), F.col("key"))
            .limit(top))


def join_cardinality(left: DataFrame, left_key, right: DataFrame,
                     right_key) -> DataFrame:
    """Pre-flight equi-join cardinality report — EXACT output-row
    count and worst-key blow-up, from the two key-count tables joined
    (never the payloads): one partial-agg pass per side + a
    count-table join, so you learn a join's cost at key-cardinality
    price before shuffling terabytes of rows.

    One row out: ``(n_left, n_right, n_out, max_key_out,
    amplification)`` where ``n_out`` = exact inner-join output rows,
    ``max_key_out`` = the single hottest key's contribution, and
    ``amplification`` = n_out / max(n_left, n_right) (> 1 means the
    join multiplies rows — the m:n fan-out smell).  Pair with
    :func:`skew_report` to decide salting."""
    lk = left_key if isinstance(left_key, Column) else F.col(left_key)
    rk = right_key if isinstance(right_key, Column) else F.col(right_key)
    lc = left.select(lk.alias("key")).groupBy("key") \
        .agg(F.count(F.lit(1)).alias("__nl"))
    rc = right.select(rk.alias("key")).groupBy("key") \
        .agg(F.count(F.lit(1)).alias("__nr"))
    per_key = lc.join(rc, "key").select(
        "key", (F.col("__nl") * F.col("__nr")).alias("__out"))
    totals_l = F.broadcast(left.agg(F.count(F.lit(1)).alias("__tl")))
    totals_r = F.broadcast(right.agg(F.count(F.lit(1)).alias("__tr")))
    return (per_key.agg(F.coalesce(F.sum("__out"), F.lit(0)).alias("n_out"),
                        F.coalesce(F.max("__out"), F.lit(0))
                        .alias("max_key_out"))
            .crossJoin(totals_l).crossJoin(totals_r)
            .select(F.col("__tl").alias("n_left"),
                    F.col("__tr").alias("n_right"),
                    "n_out", "max_key_out",
                    (F.col("n_out")
                     / F.greatest("__tl", "__tr").cast("double"))
                    .alias("amplification")))
