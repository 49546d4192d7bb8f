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
    direction: str = "backward",
    tolerance=None,
) -> DataFrame:
    """As-of join, ``direction`` ∈ {'backward', 'forward'}.

    backward: most recent right row with right.ts <= left.ts (tie matches —
    right rows sort before left at equal timestamps, like DuckDB ASOF).
    forward: earliest right row with right.ts >= left.ts (tie matches) —
    the "next quote/reading after the event" lookup; same one-shuffle
    union-timeline plan, with the window frame flipped to the FOLLOWING
    side and ``first(... ignorenulls)`` instead of ``last``.

    ``tolerance`` (pandas merge_asof semantics): a maximum allowed gap —
    matches farther than it are nulled out. Compared with the column
    type's native ``-``: pass ``F.expr("INTERVAL 10 MINUTES")`` for
    timestamps, a number for numeric ts. Zero extra shuffles: the matched
    right timestamp already rides the fill window; the gap check is a
    row-local projection after it.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    back = direction == "backward"
    value_cols = value_cols or [right_ts]
    # the gap check needs the matched right timestamp even when the caller
    # didn't ask for it — carry it through the same fill window
    if tolerance is not None and right_ts not in value_cols:
        value_cols = [*value_cols, right_ts]
        drop_rts = True
    else:
        drop_rts = False
    # side ordering makes the exact tie land inside the frame either way:
    # backward → right first (0,1); forward → right after left (1,0 via -1)
    r_side = 0 if back else 2
    l_tagged = left.withColumn("_side", F.lit(1)).withColumn("_ats", F.col(left_ts))
    r_proj = [F.col(on), F.col(right_ts).alias("_ats"), F.lit(r_side).alias("_side")] + [
        F.col(c).alias(f"{c}{suffix}") for c in value_cols
    ]
    r_tagged = right.select(*r_proj)
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    base = Window.partitionBy(on).orderBy("_ats", "_side")
    if back:
        w = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        fill = {
            c: F.last(f"{c}{suffix}", ignorenulls=True).over(w) for c in value_cols
        }
    else:
        w = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        fill = {
            c: F.first(f"{c}{suffix}", ignorenulls=True).over(w) for c in value_cols
        }
    filled = unioned.select(
        "*", *[expr.alias(f"_f_{c}") for c, expr in fill.items()]
    )
    out = filled.where(F.col("_side") == 1)
    for c in value_cols:
        out = out.drop(f"{c}{suffix}").withColumnRenamed(f"_f_{c}", f"{c}{suffix}")
    if tolerance is not None:
        matched_rts = F.col(f"{right_ts}{suffix}")
        gap = (
            (F.col("_ats") - matched_rts) if back else (matched_rts - F.col("_ats"))
        )
        ok = gap <= tolerance
        for c in value_cols:
            out = out.withColumn(
                f"{c}{suffix}",
                F.when(ok, F.col(f"{c}{suffix}")),
            )
        if drop_rts:
            out = out.drop(f"{right_ts}{suffix}")
    return out.drop("_side", "_ats")
