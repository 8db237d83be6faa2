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
