"""Declarative data-quality expectations over DataFrames.

The reference ships two ad-hoc DQ gates (non-empty check and column-list
equality, ``pyspark.py:22-39`` — covered by q73); this module generalizes
them into a small expectations engine: each check yields one
``(check_name, violations)`` row and the suite unions them into a single
report DataFrame.

Scale design: ROW-LEVEL checks (null rate, accepted values, range bounds)
are fused into ONE aggregate pass over the table — ``sum(CASE WHEN bad)``
counters computed side by side in a single scan, then unpivoted — so N
row checks cost one job, not N. Aggregation-level checks (key uniqueness,
referential integrity) each need their own shuffle by nature (group-by /
anti-join) and are appended as separate 1-row aggregates. At 100 TB the
row-check pass is a pure map-side reduction; the RI anti-join broadcasts
the parent keys when the parent is a dimension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fused_row_checks(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """Run row-level violation predicates in a single scan.

    ``checks`` maps check name -> Column that is TRUE when the row
    VIOLATES the expectation. Returns (check_name, violations).
    """
    counters = [
        F.sum(F.when(pred, F.lit(1)).otherwise(F.lit(0))).alias(name)
        for name, pred in checks.items()
    ]
    wide = df.agg(*counters)
    return wide.unpivot([], list(checks), "check_name", "violations")


def unique_check(df: DataFrame, name: str, cols: list[str]) -> DataFrame:
    """Count keys that appear more than once (violations = dup keys)."""
    dups = (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > 1)
    )
    return dups.agg(
        F.lit(name).alias("check_name"),
        F.count(F.lit(1)).alias("violations"),
    )


def ri_check(
    child: DataFrame, parent: DataFrame, fk: str, pk: str, name: str
) -> DataFrame:
    """Referential integrity: child rows whose FK has no parent PK."""
    orphans = child.join(
        parent.select(F.col(pk).alias(fk)).dropDuplicates(), on=fk, how="left_anti"
    )
    return orphans.agg(
        F.lit(name).alias("check_name"),
        F.count(F.lit(1)).alias("violations"),
    )


def quality_report(parts: list[DataFrame]) -> DataFrame:
    """Union check results and flag pass/fail, ordered by check name."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "check_name",
        F.col("violations").cast("long").alias("violations"),
        (F.col("violations") == 0).alias("passed"),
    ).orderBy("check_name")
