"""Portable Bloom-filter runtime join pruning.

Spark's own runtime bloom pruning (`BloomFilterAggregate`, behind
``spark.sql.optimizer.runtime.bloomFilter.enabled``) is an optimizer
rewrite whose aggregate is not exposed as a public SQL function, so
this module builds the same structure from public primitives: the
build side explodes ``n_hashes`` seeded xxhash64 bit positions,
``bit_or``-aggregates them into 64-bit words, and folds the words into
ONE row holding a word-indexed map (``n_bits/8`` bytes).  The filter
rides a broadcast — there is no driver-side collect.  The probe side
tests all k bits scan-locally: pure codegen against the broadcast row,
no shuffle of the probe table.

False positives only, never false negatives — so composing with the
exact join afterwards (:func:`bloom_semi_join`) returns exactly the
semi-join result while only bloom-surviving rows reach the join
shuffle.  At 100 TB this is the "petabyte fact ⋈ selective dim"
accelerator for when the dim is too big to broadcast whole but its
key *set* fits a few MB of bloom bits.

No reference equivalent (Preql delegates join strategy entirely to
the target database).
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bloom_build(build: DataFrame, key: str, n_bits: int = 1 << 20,
                n_hashes: int = 3) -> DataFrame:
    """One-row DataFrame ``(__bloom: array<bigint>)`` — a DENSE
    ``n_bits/64``-word bitmap with the build side's key set hashed in.
    ``key`` is a column name on ``build``.

    Dense array, not a map, on purpose: Spark's map ``element_at`` is
    a linear scan of the entries (O(words) per probe — measured 2.7 s
    vs 0.9 s on the q106 bench), while array ``element_at`` is O(1)
    indexing.  Zero-fill for unset words comes from a right join
    against ``spark.range(n_words)`` — n_words rows, trivially
    broadcast by AQE.  Cost: one scan + one (word, bits) partial-agg
    shuffle of at most n_words rows regardless of corpus size.

    ``n_bits`` must be a multiple of 64: a partial last word would be
    dropped by the ``range(n_words)`` zero-fill (build) while the
    probe still indexes into it — silent false NEGATIVES, breaking
    the semi-join exactness contract."""
    if n_bits % 64 != 0 or n_bits <= 0:
        raise ValueError(
            f"n_bits must be a positive multiple of 64, got {n_bits}; "
            "a partial trailing word would drop bit positions on the "
            "build side and yield false negatives")
    n_words = n_bits // 64
    pos = build.select(F.explode(F.array(*[
        F.pmod(F.xxhash64(F.col(key), F.lit(i)), F.lit(n_bits))
        for i in range(n_hashes)])).alias("__pos"))
    words = (pos.select(
        F.shiftright(F.col("__pos"), 6).alias("__word"),
        F.expr("shiftleft(1L, CAST(__pos % 64 AS INT))").alias("__mask"))
        .groupBy("__word").agg(F.bit_or("__mask").alias("__bits")))
    dense = (build.sparkSession.range(n_words)
             .withColumnRenamed("id", "__word")
             .join(words, "__word", "left")
             .select("__word", F.coalesce("__bits", F.lit(0)).alias("__bits")))
    return dense.agg(
        F.transform(F.array_sort(F.collect_list(
            F.struct("__word", "__bits"))), lambda s: s["__bits"])
        .alias("__bloom"))


def bloom_probe(probe: DataFrame, bloom: DataFrame, key: str,
                n_bits: int = 1 << 20, n_hashes: int = 3) -> DataFrame:
    """Rows of ``probe`` whose ``key`` passes the bloom (superset of
    the true matches).  The broadcast 1-row cross join keeps the test
    scan-local; each of the k bit probes is one O(1) array index +
    AND."""
    if n_bits % 64 != 0 or n_bits <= 0:
        raise ValueError(
            f"n_bits must be a positive multiple of 64, got {n_bits} "
            "(must match bloom_build's)")
    out = probe.crossJoin(F.broadcast(bloom))
    tests = [F.expr(
        f"(element_at(__bloom, CAST(shiftright("
        f"pmod(xxhash64({key}, {i}), {n_bits}), 6) AS INT) + 1)"
        f" & shiftleft(1L, CAST(pmod(xxhash64({key}, {i}), {n_bits})"
        f" % 64 AS INT))) != 0L")
        for i in range(n_hashes)]
    return out.filter(functools.reduce(lambda a, b: a & b, tests)) \
              .drop("__bloom")


def bloom_semi_join(probe: DataFrame, probe_key: str, build: DataFrame,
                    build_key: str, n_bits: int = 1 << 20,
                    n_hashes: int = 3) -> DataFrame:
    """Exact LEFT SEMI join, bloom-accelerated: the probe side is
    bloom-pruned scan-locally BEFORE the join shuffle, then the real
    left-semi join removes the false positives.  Result is identical
    to ``probe.join(build, on=key, how='left_semi')`` — only the
    shuffle volume changes."""
    keys = build.select(F.col(build_key).alias("__bk")).distinct()
    bloom = bloom_build(keys, "__bk", n_bits, n_hashes)
    pruned = bloom_probe(probe, bloom, probe_key, n_bits, n_hashes)
    return pruned.join(keys, F.col(probe_key) == F.col("__bk"),
                       "left_semi")
