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
) -> None:
    """Write ``df`` to ``path`` as a (possibly partitioned) table."""
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
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)
