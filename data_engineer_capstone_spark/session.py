"""SparkSession factory.

Local-mode defaults are tuned for the test harness (local[N], one JVM), but
every knob is chosen so the same plan shapes survive a 1000-executor cluster:

- AQE on (runtime partition coalescing, skew-join splitting, dynamic join
  strategy switch) — at 100 TB the static shuffle-partition guess is always
  wrong; AQE re-plans from actual map output sizes.
- ``spark.sql.shuffle.partitions`` defaults to the local core count; on a
  real cluster AQE's coalescing makes the initial number mostly a ceiling.
- UTC session timezone — timestamp semantics must not depend on the host.
- Arrow enabled — every pandas-UDF boundary is Arrow-batched.
- ``spark.sql.legacy.parquet.nanosAsLong`` — the driver's ``events`` table
  carries parquet TIMESTAMP(NANOS) which Spark refuses by default; we read
  nanos as long and convert to timestamp in the catalog (see catalog.py).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "data_engineer_capstone_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession."""
    cpus = default_parallelism()
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.warehouse.dir", "/tmp/spark_graft_warehouse")
        # ContextCleaner only deletes reliable-checkpoint files when this is
        # true (default false), and it reads the conf at context creation —
        # so it is set here, not in materialize(). Without it the ~90
        # materialize() sites (incl. per-round checkpoints inside CC/BFS/
        # k-truss loops) accumulate unbounded data under
        # SPARK_GRAFT_CHECKPOINT_DIR in SPARK_GRAFT_CHECKPOINT=reliable runs.
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
