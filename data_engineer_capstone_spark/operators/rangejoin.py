"""Banded range join: all pairs within a value band of each other.

Spark has no range-join optimization (Databricks' range-join hint is
proprietary); a naive ``|a.v - b.v| <= band`` theta join plans as
BroadcastNestedLoopJoin — O(n²) and a non-starter at scale. The classic
fix is **bin bucketing**: quantize the value into band-width bins, join on
the EQUI key (partition_key, bin) with one side replicated to its
neighboring bins, then apply the exact band predicate. Every qualifying
pair differs by at most one bin, so each pair is produced exactly once —
no post-dedup needed.

At 100 TB: the equi-join shuffles on (key, bin) — hash-partitionable,
AQE-skew-splittable — and the replication factor is a constant 3. Fan-out
per bucket is bounded by data density within one band-width, the same
bound the answer itself has (an output-linear algorithm).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def banded_pairs(
    df: DataFrame,
    key: str,
    value: Column,
    id_col: str,
    band: int,
) -> DataFrame:
    """Self range join: (key, id_a, id_b, gap) for all intra-key pairs with
    ``|value_a - value_b| <= band`` and id_a < id_b. ``value`` must be an
    integral column expression (e.g. epoch seconds)."""
    base = df.select(
        F.col(key).alias("_k"), F.col(id_col).alias("_id"), value.alias("_v")
    ).withColumn("_bin", F.floor(F.col("_v") / band))
    probe = base.alias("a")
    build = (
        base.withColumn("_nb", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("_bin", F.col("_bin") + F.col("_nb"))
        .drop("_nb")
        .alias("b")
    )
    return (
        probe.join(
            build,
            (F.col("a._k") == F.col("b._k"))
            & (F.col("a._bin") == F.col("b._bin"))
            & (F.col("a._id") < F.col("b._id"))
            & (F.abs(F.col("a._v") - F.col("b._v")) <= band),
        )
        .select(
            F.col("a._k").alias(key),
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.abs(F.col("a._v") - F.col("b._v")).alias("gap"),
        )
    )
