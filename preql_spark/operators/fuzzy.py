"""Fuzzy string matching: all-pairs edit-distance join without the
n² cross join.

``fuzzy_pairs`` finds every pair of rows whose strings are within
Levenshtein distance ``max_dist`` using the q-gram prefix-filter
blocking of ED-Join (Xiao, Wang, Lin — VLDB 2008, public):

- strings within edit distance d share at least
  ``max(|s1|,|s2|) - q + 1 - q*d`` positional q-grams (each edit
  destroys at most q grams of the longer string's ``|s|-q+1``);
- order every string's gram BAG by one global total order
  (ascending gram frequency, then gram, then occurrence index) and
  keep only the first ``q*d + 1`` tokens (the PREFIX): any pair
  meeting the overlap bound must share a prefix token, so joining on
  prefix tokens loses nothing (PPJoin prefix lemma on (gram, occ)
  tokens);
- candidates are verified with an exact thresholded
  ``levenshtein(s1, s2, d)`` — built-in, JVM-side.

Pairs where BOTH strings are shorter than ``q*(d+1)`` (the overlap
bound vacuous — includes strings with no grams at all) instead meet
through a length-band block (length keys l-d..l), which is bounded
because those strings live in finitely many short-length buckets.

Scale shape: the expensive object is never all-pairs — it is
|prefix tokens| ≈ (q*d+1)*n rows through one gram-keyed join, and
the rarest-first ordering makes hot grams (shared prefixes like
"Customer#0000...") drop out of signatures, which is exactly what
defeats the n² blowup a naive gram join suffers on common-prefix
corpora.  The reference has no fuzzy matching at all (closest is
``LIKE``); this is beyond-reference surface for entity dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fuzzy_pairs(df: DataFrame, id_col: str, str_col: str,
                max_dist: int, q: int = 2) -> DataFrame:
    """All pairs ``(id1, id2, dist)`` with
    ``levenshtein(s1, s2) = dist <= max_dist`` and ``id1 < id2``.
    NULL strings never match; exact-duplicate strings match at
    dist 0.  Exact and complete — the blocking only prunes pairs the
    distance bound already excludes."""
    if max_dist < 0:
        raise ValueError(f"max_dist must be >= 0, got {max_dist}")
    if q < 2:
        raise ValueError(f"q must be >= 2, got {q}")
    d = int(max_dist)
    base = (df.select(F.col(id_col).alias("id"),
                      F.col(str_col).cast("string").alias("s"))
            .filter(F.col("s").isNotNull())
            .withColumn("l", F.length("s")))
    short_max = q * (d + 1)          # both-below-this pairs go band-side

    # ---- gram path: pairs with max(l1, l2) >= q*(d+1) ------------------
    grams = (base.filter(F.col("l") >= q)
             .select("id", "l", F.posexplode(F.transform(
                 F.sequence(F.lit(1), F.col("l") - q + 1),
                 lambda i: F.col("s").substr(i, F.lit(q))))
                 .alias("pos", "g")))
    occ_w = Window.partitionBy("id", "g").orderBy("pos")
    grams = grams.withColumn("occ", F.row_number().over(occ_w))
    freq = grams.groupBy("g").agg(F.count(F.lit(1)).alias("__f"))
    sig_w = Window.partitionBy("id").orderBy("__f", "g", "occ")
    # length rides the signature rows so the band filter |l1-l2| <= d
    # (any pair within ED d satisfies it) prunes candidates INSIDE the
    # gram join — before the distinct shuffle and the string
    # join-backs, which is where candidate volume hurts at scale
    sig = (grams.join(freq, "g")
           .withColumn("__r", F.row_number().over(sig_w))
           .filter(F.col("__r") <= q * d + 1)
           .select("id", "g", "occ", "l"))
    cand = (sig.alias("a").join(
        sig.alias("b"),
        (F.col("a.g") == F.col("b.g"))
        & (F.col("a.occ") == F.col("b.occ"))
        & (F.col("a.id") < F.col("b.id"))
        & (F.abs(F.col("a.l") - F.col("b.l")) <= d))
        .select(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
        .distinct())
    s1 = base.select(F.col("id").alias("id1"), F.col("s").alias("s1"),
                     F.col("l").alias("l1"))
    s2 = base.select(F.col("id").alias("id2"), F.col("s").alias("s2"),
                     F.col("l").alias("l2"))
    lev = F.levenshtein("s1", "s2", d)
    gram_pairs = (cand.join(s1, "id1").join(s2, "id2")
                  .filter((F.abs(F.col("l1") - F.col("l2")) <= d)
                          & (F.greatest("l1", "l2") >= short_max)
                          & (lev >= 0))
                  .select("id1", "id2", lev.alias("dist")))

    # ---- band path: pairs with BOTH l < q*(d+1) ------------------------
    # the join produces each unordered pair in the shorter-on-the-left
    # orientation only, so ids normalize with least/greatest AFTER the
    # match (an id1 < id2 join predicate would drop pairs where the
    # shorter string has the larger id); equal lengths match in both
    # orientations and dedup through the final distinct
    shorts = base.filter(F.col("l") < short_max)
    left = shorts.select(F.col("id").alias("__aid"),
                         F.col("s").alias("s1"),
                         F.col("l").alias("__key"))
    right = (shorts.select(
        F.col("id").alias("__bid"), F.col("s").alias("s2"),
        F.explode(F.sequence(F.greatest(F.col("l") - d, F.lit(0)),
                             F.col("l"))).alias("__key")))
    short_pairs = (left.join(right, "__key")
                   .filter(F.col("__aid") != F.col("__bid"))
                   .select(F.least("__aid", "__bid").alias("id1"),
                           F.greatest("__aid", "__bid").alias("id2"),
                           F.levenshtein("s1", "s2", d).alias("dist"))
                   .filter(F.col("dist") >= 0)
                   .distinct())
    return gram_pairs.unionByName(short_pairs) \
        .select("id1", "id2", F.col("dist").cast("int").alias("dist"))
