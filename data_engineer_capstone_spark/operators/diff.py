"""Table diff: reconcile two versions of a keyed table.

The data-management primitive behind regression gates and CDC backfills:
one full-outer join on the key, null-safe column comparison for change
detection. At 100 TB both sides shuffle on the key once (or zero times if
the versions are bucketed on it — `sources/sinks.py:write_bucketed`);
the comparison itself is a codegen'd row-local expression.

Change detection uses a null-safe equality conjunction over the compared
columns rather than a row-hash: hashing would require canonical string
formatting of every type (float repr differs across engines), while
`<=>` is exact on the native representation.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Per-key diff status: 'added' (only in new), 'removed' (only in
    old), 'changed' (present in both, any compared column differs).
    Unchanged rows are dropped — the output is the (small) changeset."""
    cols = compare_cols or [c for c in old.columns if c != key and c in new.columns]
    o = old.select(key, *cols).alias("o")
    n = new.select(key, *cols).alias("n")
    joined = o.join(n, F.col(f"o.{key}").eqNullSafe(F.col(f"n.{key}")), "full_outer")
    same: Column = reduce(
        lambda a, b: a & b,
        [F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}")) for c in cols],
    )
    status = (
        F.when(F.col(f"o.{key}").isNull(), F.lit("added"))
        .when(F.col(f"n.{key}").isNull(), F.lit("removed"))
        .when(~same, F.lit("changed"))
    )
    return (
        joined.select(
            F.coalesce(F.col(f"o.{key}"), F.col(f"n.{key}")).alias(key),
            status.alias("status"),
        )
        .where(F.col("status").isNotNull())
    )
