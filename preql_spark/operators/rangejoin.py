"""Interval (range) join — point-in-interval matching at scale.

The reference has no range joins (SURVEY.md §2.3 "not present");
Spark executes a raw ``ts >= start AND ts < end`` join condition as a
broadcast-nested-loop — O(|events| × |intervals|) comparisons, the
classic scale cliff.  ``interval_join`` lowers it to an EQUI-join by
time-bucketing: each interval is exploded onto the fixed-width buckets
it covers, events carry their single bucket, the join runs hash-on-
bucket(+keys), and the exact range predicate filters within buckets.
Cost: O(|events| + |intervals| × spread + |candidates|), where spread
= interval length / bucket width (pick a bucket near the typical
interval length to keep it small).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(events: DataFrame, intervals: DataFrame,
                  ts_col: str = "ts", start_col: str = "start",
                  end_col: str = "end", bucket_s: int = 3600,
                  keys: list[str] | None = None) -> DataFrame:
    """Inner-join rows of ``events`` to every interval containing
    their timestamp (start inclusive, end exclusive), optionally also
    matching on equality ``keys``.  Each matching pair is produced
    exactly once: an event lives in one bucket, and an interval
    appears at most once per bucket."""
    keys = keys or []
    ebkt = F.floor(F.unix_timestamp(F.col(ts_col)) / bucket_s)
    lb = events.withColumn("__bkt", ebkt)
    span = F.sequence(
        F.floor(F.unix_timestamp(F.col(start_col)) / bucket_s),
        F.floor(F.unix_timestamp(F.col(end_col)) / bucket_s))
    rb = intervals.withColumn("__bkt", F.explode(span))
    on = ["__bkt"] + keys
    return (lb.join(rb, on)
            .filter((F.col(ts_col) >= F.col(start_col))
                    & (F.col(ts_col) < F.col(end_col)))
            .drop("__bkt"))
