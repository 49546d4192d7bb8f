"""Time-series operators over event tables: bucketed resampling with
gap-fill (dense time grid + forward fill).

Spark has no native gap-fill (TimescaleDB's time_bucket_gapfill /
locf): it composes from builtins — bucket aggregation, per-key
``sequence()`` grid expansion, and ``last(..., ignorenulls)`` over an
ordered window. Everything stays in codegen; no Python.

Scale notes: the grid explode multiplies rows by (range/step) per key —
bound the time range or step accordingly (the grid is O(keys × slots),
independent of event count). The forward-fill window shuffles once on the
key; each key's slots sort within its partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def time_bucket(ts: Column | str, seconds: int) -> Column:
    """Floor a timestamp to a fixed bucket width (UTC-session arithmetic,
    deterministic; equals DuckDB's time_bucket for divisor widths)."""
    secs = F.unix_timestamp(ts)
    return F.timestamp_seconds((secs - secs % seconds)).cast("timestamp_ntz")


def gap_fill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    agg: Column,
    bucket_seconds: int = 300,
) -> DataFrame:
    """Dense per-key time grid with forward-filled aggregate.

    Returns (key, slot, slot_value, filled): one row per ``bucket_seconds``
    slot between each key's first and last event — slots with no events
    carry NULL slot_value and the last observed value in ``filled``
    (last-observation-carried-forward).
    """
    slot = time_bucket(ts_col, bucket_seconds).alias("slot")
    b = df.groupBy(F.col(key_col), slot).agg(agg.alias("slot_value"))
    grid = (
        b.groupBy(key_col)
        .agg(F.min("slot").alias("mn"), F.max("slot").alias("mx"))
        .select(
            key_col,
            F.explode(
                F.expr(f"sequence(mn, mx, interval {bucket_seconds} seconds)")
            ).alias("slot"),
        )
    )
    j = grid.join(b, [key_col, "slot"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("slot")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        key_col,
        "slot",
        "slot_value",
        F.last("slot_value", ignorenulls=True).over(w).alias("filled"),
    )
