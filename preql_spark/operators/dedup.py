"""Deduplication operators — exact and near-duplicate, designed for
100 TB document corpora.

Scale architecture:
- exact: one hash-partitioned shuffle on the fingerprint; keep-min-id
  via partial aggregation (no window over the full table).
- MinHash+LSH: shingle → N minhashes → B bands; candidate pairs come
  from an equi-join on (band, band-hash) buckets, i.e. O(candidates)
  not O(n²); exact Jaccard verifies candidates. Banding bounds bucket
  width, and a frequency cap drops degenerate buckets (boilerplate
  shingles) the way production pipelines do.
- SimHash: 60-bit signature via higher-order array functions (all
  JVM-side); hamming-ball candidate search by signature band keys.
- n-gram Jaccard: shingle-explode + equi-join on shingle with a
  document-frequency cap on join fan-out.

All hashes use the md5-based :func:`portable_hash` so results are
engine-portable (same values on DuckDB for differential testing).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from preql_spark.operators.text import portable_hash, tokens, fingerprint


# ---- exact -----------------------------------------------------------------

def dedup_exact(df: DataFrame, id_col: str, text_col: str = "text",
                normalize: bool = True) -> DataFrame:
    """Keep the min-id row per distinct (normalized) text.
    One shuffle on the fingerprint; survivors joined back by id so the
    full row survives without shipping text through the aggregate."""
    key = fingerprint(text_col) if normalize else F.md5(F.col(text_col))
    winners = (df.select(F.col(id_col), key.alias("__fp"))
               .groupBy("__fp").agg(F.min(id_col).alias(id_col))
               .select(id_col))
    return df.join(winners, id_col, "left_semi")


# ---- shingling -------------------------------------------------------------

def token_shingles(col, k: int = 3) -> Column:
    """Distinct k-token shingles (word n-grams) as strings."""
    t = tokens(col)
    n = F.size(t)
    return F.array_distinct(F.transform(
        F.sequence(F.lit(0), F.greatest(n - k, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(t, i + 1, k))))


def char_shingles(col, k: int = 8) -> Column:
    """Distinct k-char shingles."""
    c = col if isinstance(col, Column) else F.col(col)
    n = F.length(c)
    return F.array_distinct(F.transform(
        F.sequence(F.lit(1), F.greatest(n - k + 1, F.lit(1))),
        lambda i: F.substring(c, i, k)))


# ---- MinHash + LSH ---------------------------------------------------------

def _seeded_hash(seed: int):
    # NB: must be a 1-arg lambda — F.transform treats a 2-arg lambda
    # as (element, index), which would silently shadow the seed.
    return lambda s: portable_hash(F.concat(s, F.lit(f"#{seed}")))


def minhash_signature(shingles: Column, n_hashes: int = 16) -> Column:
    """Array of ``n_hashes`` minima of seeded portable hashes over the
    shingle set — the standard MinHash signature, entirely JVM-side."""
    return F.array(*[
        F.array_min(F.transform(shingles, _seeded_hash(i)))
        for i in range(n_hashes)])


def minhash_lsh_pairs(df: DataFrame, id_col: str, text_col: str = "text",
                      n_hashes: int = 16, bands: int = 8,
                      shingle_k: int = 3,
                      threshold: float = 0.7,
                      max_bucket: int = 200) -> DataFrame:
    """Near-duplicate pairs via MinHash banding + exact-Jaccard verify.

    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.
    ``max_bucket`` caps degenerate LSH buckets (at scale a hot bucket
    means boilerplate; production pipelines drop or re-band them).
    """
    rows_per_band = n_hashes // bands
    sh = df.select(F.col(id_col).alias("__id"),
                   token_shingles(text_col, shingle_k).alias("__sh"))
    sh = sh.withColumn("__sig", minhash_signature(F.col("__sh"), n_hashes))

    # band keys: (band index, hash of that band's signature slice)
    banded = sh.select(
        "__id", "__sh",
        F.posexplode(F.array(*[
            F.hash(F.slice("__sig", b * rows_per_band + 1, rows_per_band))
            for b in range(bands)])).alias("__band", "__bkey"))

    # candidate pairs: equi-join within (band, bucket) — never O(n^2)
    bucket_sizes = banded.groupBy("__band", "__bkey").count() \
        .filter(F.col("count") <= max_bucket).drop("count")
    banded = banded.join(bucket_sizes, ["__band", "__bkey"], "left_semi")
    a = banded.alias("a")
    b = banded.alias("b")
    cands = (a.join(b, (F.col("a.__band") == F.col("b.__band"))
                    & (F.col("a.__bkey") == F.col("b.__bkey"))
                    & (F.col("a.__id") < F.col("b.__id")))
             .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"),
                     F.col("a.__sh").alias("sh_a"), F.col("b.__sh").alias("sh_b"))
             .dropDuplicates(["id_a", "id_b"]))

    # exact Jaccard verify on the candidate set
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (cands.select("id_a", "id_b",
                         (inter / union).cast("double").alias("jaccard"))
            .filter(F.col("jaccard") >= threshold))


# ---- SimHash ---------------------------------------------------------------

def simhash(col, bits: int = 60) -> Column:
    """SimHash signature: per-token portable hash, ±1 vote per bit,
    sign of the vote sum becomes the bit.  Pure higher-order array
    functions — no shuffle, no Python."""
    t = tokens(col)
    votes = F.aggregate(
        t,
        F.array_repeat(F.lit(0), bits),
        lambda acc, tok: F.zip_with(
            acc,
            F.array(*[F.when(F.shiftright(portable_hash(tok), b) % 2 == 1,
                             F.lit(1)).otherwise(F.lit(-1))
                      for b in range(bits)]),
            lambda x, y: x + y))
    powers = F.array(*[F.lit(1 << b).cast("long") for b in range(bits)])
    return F.aggregate(
        F.zip_with(votes, powers,
                   lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("long"))),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x)


def hamming_distance(a: Column, b: Column) -> Column:
    """Popcount of XOR — distance between simhash signatures."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_pairs(df: DataFrame, id_col: str, text_col: str = "text",
                  max_distance: int = 6, bands: int = 4) -> DataFrame:
    """Near-dup pairs by simhash: band the 60-bit signature into
    ``bands`` 15-bit keys (pigeonhole: distance<=bands-1 guarantees a
    shared band; wider distances still mostly collide), equi-join per
    band, verify by hamming distance."""
    bits_per = 60 // bands
    sig = df.select(F.col(id_col).alias("__id"),
                    simhash(text_col).alias("__sig"))
    banded = sig.select(
        "__id", "__sig",
        F.posexplode(F.array(*[
            (F.shiftright("__sig", b * bits_per) % (2 ** bits_per))
            for b in range(bands)])).alias("__band", "__bkey"))
    a, b = banded.alias("a"), banded.alias("b")
    return (a.join(b, (F.col("a.__band") == F.col("b.__band"))
                   & (F.col("a.__bkey") == F.col("b.__bkey"))
                   & (F.col("a.__id") < F.col("b.__id")))
            .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"),
                    hamming_distance(F.col("a.__sig"), F.col("b.__sig"))
                    .alias("distance"))
            .dropDuplicates(["id_a", "id_b"])
            .filter(F.col("distance") <= max_distance))


# ---- exact n-gram Jaccard (brute via shingle join) -------------------------

def ngram_jaccard_pairs(df: DataFrame, id_col: str, text_col: str = "text",
                        k: int = 3, threshold: float = 0.7,
                        max_doc_freq: int | None = None) -> DataFrame:
    """Exact Jaccard similarity pairs via shingle-explode + equi-join.
    ``max_doc_freq`` drops shingles appearing in more than that many
    docs (stopword shingles explode the join at scale)."""
    sh = (df.select(F.col(id_col).alias("__id"),
                    F.explode(token_shingles(text_col, k)).alias("__s")))
    if max_doc_freq is not None:
        keep = sh.groupBy("__s").count() \
            .filter(F.col("count") <= max_doc_freq).drop("count")
        sh = sh.join(keep, "__s", "left_semi")
    sizes = sh.groupBy("__id").agg(F.count(F.lit(1)).alias("__n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (a.join(b, (F.col("a.__s") == F.col("b.__s"))
                    & (F.col("a.__id") < F.col("b.__id")))
             .groupBy(F.col("a.__id").alias("id_a"),
                      F.col("b.__id").alias("id_b"))
             .agg(F.count(F.lit(1)).alias("__i")))
    sa = sizes.select(F.col("__id").alias("id_a"), F.col("__n").alias("__na"))
    sb = sizes.select(F.col("__id").alias("id_b"), F.col("__n").alias("__nb"))
    return (inter.join(sa, "id_a").join(sb, "id_b")
            .select("id_a", "id_b",
                    (F.col("__i") / (F.col("__na") + F.col("__nb") - F.col("__i")))
                    .cast("double").alias("jaccard"))
            .filter(F.col("jaccard") >= threshold))
