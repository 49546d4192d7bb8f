"""Table-maintenance operators: small-file compaction and sort clustering.

The 100 TB failure mode these exist for: a streaming or frequently-run
batch writer leaves thousands of KB-sized files per partition; every
downstream scan then pays listing + open + footer overhead per file, and
min/max pruning is useless because each file spans the whole key range.

- ``compact``: rewrite a parquet directory into size-targeted files
  (repartition by computed file count → write to a staging dir → atomic
  swap). On object stores / production lakes this job belongs to a
  transactional table format (the OPTIMIZE pattern) — the swap here is the
  plain-filesystem equivalent, correct for single-writer maintenance
  windows, which is what the reference's pipeline has.
- ``cluster_by``: range-repartition + sort-within-partitions on the
  clustering key before write, so each output file owns a disjoint key
  range — parquet footer min/max then lets scans SKIP whole files for
  selective predicates (verified from the footers in
  tests/test_maintenance.py). The one-dimension version of what Z-ordering
  gives multi-column predicates.

No counterpart in the reference (it writes once and never maintains —
`/root/reference/scripts/pyspark.py` write-side is a single partitionBy
write); this is extension surface for the long-lived-lake use case.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


def compact(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Rewrite ``path`` (a parquet directory) into ceil(size/target) files.

    Returns {"files_before", "files_after", "bytes"}. The rewrite is one
    narrow job: a round-robin repartition to the target file count (no key
    assumptions — use ``cluster_by`` when a sort order should survive).
    """
    files_before = [
        f for f in os.listdir(path) if f.endswith(".parquet")
    ]
    total = sum(os.path.getsize(os.path.join(path, f)) for f in files_before)
    n_out = max(1, -(-total // target_file_bytes))  # ceil
    staging = f"{path.rstrip('/')}_compact_{uuid.uuid4().hex[:8]}"
    spark.read.parquet(path).repartition(n_out).write.parquet(staging)
    old = f"{path.rstrip('/')}_old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(staging, path)
    shutil.rmtree(old)
    files_after = [f for f in os.listdir(path) if f.endswith(".parquet")]
    return {
        "files_before": len(files_before),
        "files_after": len(files_after),
        "bytes": total,
    }


def cluster_by(
    df: DataFrame, path: str, cluster_cols: list[str], n_files: int
) -> None:
    """Write ``df`` as ``n_files`` parquet files whose ``cluster_cols``
    ranges are DISJOINT: range-repartition assigns each file a key slice,
    the within-partition sort tightens row-group stats inside it. Scans
    filtering on the clustering key prune at file granularity via footer
    min/max (and at row-group granularity inside files)."""
    (
        df.repartitionByRange(n_files, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.parquet(path)
    )
