"""Data-quality expectation checks — the validation gate a pipeline
runs before publishing a table (null-rate, uniqueness, value ranges,
referential integrity), as ONE lazy plan producing a small report
frame ``(rule, violations)``.

Plan shape: the column rules (not-null, range) fold into a single
global aggregate over one scan; each uniqueness rule is one
distinct-count aggregate; each foreign-key rule is one left-anti join
against the dimension's key projection.  The report is a unionByName
of 1-row frames — at 100 TB the cost is one pass per rule *family*,
never per row, and the output is rule-count rows.

No reference equivalent (Preql validates nothing beyond column types
at insert); standard lakehouse practice (dbt tests / Deequ / Great
Expectations) re-expressed as plain DataFrame algebra.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def validation_report(df: DataFrame,
                      not_null: list[str] | None = None,
                      unique: list[str] | None = None,
                      ranges: dict | None = None,
                      fk: list[tuple] | None = None) -> DataFrame:
    """Report frame with one row per rule:

    - ``not_null=[col,...]`` — violations = rows where col IS NULL
    - ``unique=[col,...]`` — violations = rows beyond the first per
      value (n - n_distinct; null counts as a value)
    - ``ranges={col: (lo, hi)}`` — violations = non-null rows outside
      [lo, hi]
    - ``fk=[(col, dim_df, dim_col), ...]`` — violations = rows whose
      col has no match in dim (nulls are not violations, like SQL FK)

    Rule names are ``kind:col`` strings; a clean table reports all
    zeros (assert on ``violations`` in CI, or gate the publish).
    """
    spark = df.sparkSession
    reports: list[DataFrame] = []

    scan_aggs, scan_names = [], []
    for c in (not_null or []):
        scan_aggs.append(F.sum(F.col(c).isNull().cast("long"))
                         .alias(f"not_null:{c}"))
        scan_names.append(f"not_null:{c}")
    for c, (lo, hi) in (ranges or {}).items():
        bad = (F.col(c) < lo) | (F.col(c) > hi)
        scan_aggs.append(F.sum(F.coalesce(bad.cast("long"), F.lit(0)))
                         .alias(f"range:{c}"))
        scan_names.append(f"range:{c}")
    if scan_aggs:
        one = df.agg(*scan_aggs)
        rows = F.array(*[F.struct(F.lit(n).alias("rule"),
                                  F.coalesce(F.col(f"`{n}`"), F.lit(0))
                                  .alias("violations"))
                         for n in scan_names])
        reports.append(one.select(F.explode(rows).alias("__r"))
                       .select("__r.*"))

    for c in (unique or []):
        reports.append(df.agg(
            (F.count(F.lit(1))
             - F.count_distinct(F.coalesce(F.col(c).cast("string"),
                                           F.lit("\0null"))))
            .alias("violations"))
            .select(F.lit(f"unique:{c}").alias("rule"), "violations"))

    for col, dim, dim_col in (fk or []):
        keys = dim.select(F.col(dim_col).alias(col)).distinct()
        missing = (df.select(col).filter(F.col(col).isNotNull())
                   .join(keys, col, "left_anti"))
        reports.append(missing.agg(F.count(F.lit(1)).alias("violations"))
                       .select(F.lit(f"fk:{col}").alias("rule"),
                               "violations"))

    if not reports:
        return spark.createDataFrame([], "rule string, violations long")
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


def expect_clean(df: DataFrame, **rules) -> None:
    """Assert-style gate: raises ``ValueError`` listing every violated
    rule.  Runs the report (one action)."""
    bad = [(r.rule, r.violations)
           for r in validation_report(df, **rules).collect()
           if r.violations]
    if bad:
        raise ValueError("validation failed: "
                         + ", ".join(f"{n} ({v} rows)" for n, v in bad))
