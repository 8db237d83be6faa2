"""As-of (time-ordered) join — match each left row to the most recent
right row with the same key and time <= left time.

Not in the reference (no time-series ops); implemented Spark-first as
the union + last_value(ignoreNulls) window trick: one shuffle on
(key), a single sort by (key, time), no Python.  This scales linearly
— the classic alternative (per-key pandas merge_asof via cogroup) pays
the Arrow boundary; the window form stays in Tungsten.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, key: str,
              left_time: str, right_time: str,
              right_cols: list[str] | None = None,
              direction: str = "backward") -> DataFrame:
    """Returns left columns + requested right columns from the as-of
    match (nulls when no earlier right row exists).

    ``direction='backward'``: most recent right with rt <= lt.
    ``direction='forward'``: earliest right with rt >= lt.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (key, right_time)]

    lt = left.select(
        F.col(key).alias("__k"), F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in left.columns if c not in (key,)],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in right_cols])
    rt = right.select(
        F.col(key).alias("__k"), F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in (key,)],
        *[F.col(c).alias(f"__r_{c}") for c in right_cols])

    u = lt.unionByName(rt)
    if direction == "backward":
        # right rows sort before left rows at equal time → rt <= lt matches
        w = (Window.partitionBy("__k")
             .orderBy(F.col("__t"), F.col("__is_left"))
             .rowsBetween(Window.unboundedPreceding, 0))
        filled = [F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__f_{c}")
                  for c in right_cols]
    else:
        w = (Window.partitionBy("__k")
             .orderBy(F.col("__t").desc(), F.col("__is_left"))
             .rowsBetween(Window.unboundedPreceding, 0))
        filled = [F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__f_{c}")
                  for c in right_cols]

    out = (u.select("*", *filled)
           .filter(F.col("__is_left") == 1)
           .select(F.col("__k").alias(key),
                   *[F.col(c) for c in left.columns if c != key],
                   *[F.col(f"__f_{c}").alias(c) for c in right_cols]))
    return out


def debounce(df: DataFrame, keys: list[str], ts_col: str,
             window_s: float, tiebreak_cols: list[str] | None = None)\
        -> DataFrame:
    """Time-windowed dedup (telemetry debounce): per key, an event
    survives only if it starts a new burst — i.e. it is the FIRST
    event of each gap-delimited session, where consecutive events
    closer than ``window_s`` seconds chain into one burst.  Retries,
    double-clicks, and sensor chatter collapse to one row each.

    One shuffle on the key; the burst boundary is a lag + running-sum
    window pair sharing that partitioning (the q44 sessionize shape).
    ``tiebreak_cols`` make same-timestamp ordering deterministic."""
    order = [F.col(ts_col), *map(F.col, tiebreak_cols or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    # NTZ can't cast straight to double; go through TIMESTAMP (wall-
    # clock-preserving under the engine's pinned UTC session timezone)
    tsd = F.col(ts_col).cast("timestamp").cast("double")
    gap = tsd - F.lag(tsd).over(w)
    new_burst = (gap.isNull() | (gap > window_s)).cast("long")
    wb = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (df.withColumn("__nb", new_burst)
            .withColumn("__burst", F.sum("__nb").over(wb))
            .withColumn("__rn", F.row_number().over(
                Window.partitionBy(*keys, "__burst").orderBy(*order)))
            .filter(F.col("__rn") == 1)
            .drop("__nb", "__burst", "__rn"))
