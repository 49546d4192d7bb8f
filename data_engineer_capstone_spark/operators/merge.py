"""SCD Type-2 merge: apply a change batch to a versioned dimension.

Spark core has no MERGE INTO (that's a table-format feature — Delta/
Iceberg); the relational decomposition is two joins and a union, all
hash-partitionable on the business key:

  1. rows whose key appears in the change batch get their open version
     CLOSED (valid_to := effective date),
  2. the change batch INSERTS a new open version per key,
  3. untouched rows pass through.

At 100 TB the change batch is usually small relative to the dimension —
Catalyst broadcasts it into step 1's join, so the dimension is scanned
once with zero shuffle; the output is written partition-aligned with the
dimension's key partitioning. The same shape extends to SCD1 (overwrite)
by dropping the close step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_merge(
    dim: DataFrame,
    changes: DataFrame,
    key: str,
    effective: str = "effective_date",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Apply `changes` (one row per key: new attribute values + an
    `effective` date column) to an SCD2 `dim` whose open versions have
    NULL `valid_to`. Attribute columns are every non-key, non-validity
    column shared by both frames. Closed history rows are immutable."""
    attrs = [
        c for c in dim.columns if c not in (key, valid_from, valid_to)
    ]
    chg = changes.select(
        key, *[c for c in attrs if c in changes.columns], effective
    )
    chg_keys = chg.select(key, F.col(effective).alias("_eff"))
    open_rows = dim.where(F.col(valid_to).isNull())
    closed_rows = dim.where(F.col(valid_to).isNotNull())
    # 1. close the currently-open version of every changed key
    closed_now = (
        open_rows.join(chg_keys, on=key, how="inner")  # change batches can
        # be arbitrarily large — AQE decides broadcast vs shuffle
        .withColumn(valid_to, F.col("_eff"))
        .drop("_eff")
    )
    # 2. untouched open versions pass through
    untouched = open_rows.join(chg_keys, on=key, how="left_anti")
    # 3. the change batch becomes the new open versions
    inserted = chg.select(
        key,
        *attrs,
        F.col(effective).alias(valid_from),
        F.lit(None).cast(dim.schema[valid_to].dataType).alias(valid_to),
    )
    cols = dim.columns
    return (
        closed_rows.select(*cols)
        .unionByName(closed_now.select(*cols))
        .unionByName(untouched.select(*cols))
        .unionByName(inserted.select(*cols))
    )
