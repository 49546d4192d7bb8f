"""Table sinks (SURVEY.md §2.1 S6-S7): partitioned / unpartitioned writes.

Generalizes the reference's ``write()`` (pyspark.py:306-322): format +
mode + optional ``partitionBy``, with two scale guards the reference
lacks:

- ``repartition(*partition_cols)`` before ``partitionBy``: without it,
  every upstream task writes a file into every output partition —
  tasks × partitions files (the small-file explosion that makes a 100 TB
  lake unreadable). Repartitioned, exactly one task owns each partition's
  rows. For skewed partition keys pass ``salt_files > 1`` to spread one
  hot partition's rows over that many writer tasks/files
  (AQE cannot rebalance a partitionBy write on its own).
- ``maxRecordsPerFile`` caps runaway single files inside a partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_table(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
    salt_files: int = 1,
    max_records_per_file: int | None = None,
    dynamic_overwrite: bool = False,
) -> None:
    """Write ``df`` to ``path`` as a (possibly partitioned) table.

    ``dynamic_overwrite=True`` + ``mode='overwrite'`` replaces ONLY the
    partitions present in ``df`` and leaves the rest of the table intact —
    the incremental daily-load pattern (the reference's aspirational daily
    cadence, README.md:24-27): reprocess one day/partition without
    rewriting (or losing) 100 TB of history. Default (static) overwrite
    truncates the whole table first.
    """
    out = df
    if partition_by:
        if salt_files > 1:
            # Explicit numPartitions pins the shuffle (AQE would otherwise
            # coalesce small salted partitions back together, un-salting
            # the write); each (partition value, salt) pair hashes to its
            # own task, so a hot partition gets up to salt_files writers.
            n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))
            out = (
                df.withColumn("_salt", (F.rand(seed=0) * salt_files).cast("int"))
                .repartition(n, *[F.col(c) for c in partition_by], F.col("_salt"))
                .drop("_salt")
            )
        else:
            out = df.repartition(*partition_by)
    writer = out.write.format(fmt).mode(mode)
    if dynamic_overwrite:
        writer = writer.option("partitionOverwriteMode", "dynamic")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_by: list[str],
    n_buckets: int,
    sort_by: list[str] | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Write an external bucketed (+optionally sorted) table.

    Bucketing is the pre-pay-the-shuffle move for 100 TB joins: two tables
    bucketed by the same key into the same bucket count join with NO
    exchange on either side — the shuffle happened once at write time and
    is amortized over every subsequent join/aggregation on that key.
    ``sort_by`` additionally pre-sorts within buckets so sort-merge joins
    skip their sort. Bucketed metadata lives in the session catalog
    (``saveAsTable``); the data itself is plain parquet at ``path``.
    """
    writer = (
        df.write.format(fmt)
        .mode(mode)
        .option("path", path)
        .bucketBy(n_buckets, *bucket_by)
    )
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)
