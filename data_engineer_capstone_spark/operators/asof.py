"""As-of join (SURVEY.md §7.8): for every left row, the most recent right
row with the same key and right.ts <= left.ts.

Spark has no built-in as-of join. The scalable construction is the
union-timeline trick: tag both sides, union, and take
``last(right_value) IGNORE NULLS`` over a per-key window ordered by
(ts, side) — one shuffle on the key, no range self-join, no point-lookup
loop. This is exactly how a 1000-executor engine wants it: state per key
is a running scalar, and the sort is the window sort it would do anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """As-of (backward) join. Right rows sort before left rows at equal
    timestamps, so an exact tie matches (<= semantics, like DuckDB ASOF).
    """
    value_cols = value_cols or [right_ts]
    l_tagged = left.withColumn("_side", F.lit(1)).withColumn("_ats", F.col(left_ts))
    r_proj = [F.col(on), F.col(right_ts).alias("_ats"), F.lit(0).alias("_side")] + [
        F.col(c).alias(f"{c}{suffix}") for c in value_cols
    ]
    r_tagged = right.select(*r_proj)
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy("_ats", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"_f_{c}")
            for c in value_cols
        ],
    )
    out = filled.where(F.col("_side") == 1)
    for c in value_cols:
        out = out.drop(f"{c}{suffix}").withColumnRenamed(f"_f_{c}", f"{c}{suffix}")
    return out.drop("_side", "_ats")
