"""Skew mitigation — explicit salting for hot join keys.

AQE's skew-join splitting (on by default in ``default_session``)
handles sort-merge skew at runtime, but it cannot help when the build
side must replicate (a medium dimension too big to broadcast joining a
fact table whose key distribution is power-law).  ``salted_join``
spreads each hot key over ``salt`` sub-partitions: the skewed side gets
a deterministic per-row salt, the other side is replicated ``salt``
ways, and the equi-join runs on (key, salt) — the hot key's rows now
land on ``salt`` different reducers instead of one straggler.

No reference equivalent (Preql delegates physical join strategy to the
backend DB); this is the Spark-first scale path for §2.3 joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(skewed: DataFrame, other: DataFrame, on: str | list[str],
                how: str = "inner", salt: int = 16) -> DataFrame:
    """Equi-join with the skewed side salted over ``salt`` buckets.

    ``skewed`` is the side with hot keys (usually the fact table);
    ``other`` is replicated ``salt`` ways (its row count multiplies —
    keep it the smaller side).  Result equals
    ``skewed.join(other, on, how)`` for inner/left joins.

    The salt is ``xxhash64`` of the whole skewed row (mod salt):
    deterministic, uniformly spread, and independent of the join key —
    rows sharing a hot key scatter across reducers.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    overlap = set(skewed.columns) & (set(other.columns) - set(keys))
    if overlap:
        raise ValueError(f"ambiguous non-key columns: {sorted(overlap)}")

    s = skewed.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]),
                         F.lit(salt)).cast("int"))
    o = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    out = s.join(o, keys + ["__salt"], how)
    return out.drop("__salt")
