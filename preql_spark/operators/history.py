"""Slowly-changing-dimension (type 2) history building.

A large-scale pipeline staple with no reference equivalent (Preql's
DML surface is type-1 overwrite only, `preql/core/pql_objects.py`
update/delete): given a change log of attribute observations per key,
produce the versioned dimension — one row per (key, attribute-run)
with ``valid_from`` / ``valid_to`` validity bounds and an
``is_current`` flag, collapsing consecutive observations whose
attributes did not change.

Plan shape: both window passes (change detection, then validity
bounds) partition on the business key — ONE shuffle total, since the
second window reuses the first's partitioning (Catalyst recognizes the
child distribution and plans no second exchange).  Per-key state is a
running lag/lead, never a buffered partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(df: DataFrame, key_cols: list[str], ts_col: str,
                 attr_cols: list[str],
                 tiebreak_cols: list[str] | None = None) -> DataFrame:
    """Collapse a change log into SCD2 validity ranges.

    ``tiebreak_cols`` must make (key, ts, tiebreak) a total order when
    one key can have several observations at the same timestamp —
    without it the collapse is nondeterministic.  Null-safe attribute
    comparison: a NULL->NULL "change" is not a change.

    Returns ``key_cols + attr_cols + (valid_from, valid_to,
    is_current)`` where ``valid_to`` is NULL on the open version.
    """
    order = [F.col(ts_col), *map(F.col, tiebreak_cols or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    attrs = F.struct(*[F.col(a) for a in attr_cols])
    seq = df.withColumn("__rn", F.row_number().over(w)) \
            .withColumn("__prev", F.lag(attrs).over(w))
    changed = (F.col("__rn") == 1) | ~attrs.eqNullSafe(F.col("__prev"))
    vers = seq.filter(changed).drop("__rn", "__prev")
    w2 = Window.partitionBy(*key_cols).orderBy(*order)
    return (vers.select(*key_cols, *attr_cols,
                        F.col(ts_col).alias("valid_from"),
                        F.lead(ts_col).over(w2).alias("valid_to"))
            .withColumn("is_current", F.col("valid_to").isNull()))


def scd2_current(history: DataFrame) -> DataFrame:
    """The type-1 view of an SCD2 table — a pushdown-friendly filter."""
    return history.filter(F.col("is_current")).drop("valid_to", "is_current")


def scd2_as_of(history: DataFrame, ts) -> DataFrame:
    """Point-in-time snapshot: versions valid at ``ts`` (a literal or
    Column).  Scan-local range predicate — partition-prunable when the
    history is stored partitioned on valid_from date."""
    t = ts if hasattr(ts, "cast") else F.lit(ts).cast("timestamp")
    return history.filter((F.col("valid_from") <= t)
                          & (F.col("valid_to").isNull()
                             | (F.col("valid_to") > t)))


def snapshot_diff(old: DataFrame, new: DataFrame, key_cols: list[str],
                  compare_cols: list[str] | None = None) -> DataFrame:
    """CDC between two table snapshots: one full outer join on the
    business key, classifying every key as inserted / deleted /
    changed / unchanged (null-safe struct comparison over
    ``compare_cols``, default = all non-key columns of ``new``).

    Returns ``key_cols + (change_type, __old, __new)`` where __old /
    __new are structs of the compared columns (null on the missing
    side).  At scale this is one co-partitioned shuffle join; two
    snapshots written bucketed on the key diff with ZERO exchanges.
    """
    cc = compare_cols or [c for c in new.columns if c not in key_cols]
    o = old.select(*key_cols, F.struct(*cc).alias("__old"))
    n = new.select(*key_cols, F.struct(*cc).alias("__new"))
    j = o.join(n, key_cols, "full_outer")
    ct = (F.when(F.col("__old").isNull(), F.lit("inserted"))
          .when(F.col("__new").isNull(), F.lit("deleted"))
          .when(~F.col("__old").eqNullSafe(F.col("__new")),
                F.lit("changed"))
          .otherwise(F.lit("unchanged")))
    return j.select(*key_cols, ct.alias("change_type"), "__old", "__new")
