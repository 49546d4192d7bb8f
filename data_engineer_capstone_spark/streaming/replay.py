"""File-source replay harness for Structured Streaming queries.

The driver's `events` table is a single parquet file; streaming queries
replay it through the file source with `Trigger.AvailableNow` so results
are deterministic and comparable to a batch oracle (SURVEY.md §2.8).

Two replay shapes:

- ``single_batch``: the whole table in one micro-batch — used for window
  aggregations whose semantics don't depend on inter-batch watermark
  movement (Q80-Q82, Q84).
- ``two_batch``: a deterministic split (event_id mod 5) across two files
  processed one-per-micro-batch (``maxFilesPerTrigger=1``) so the
  watermark computed after batch 0 genuinely drops late rows arriving in
  batch 1 (Q83). File order is pinned via distinct mtimes.

Scale note: in production this same code points `readStream` at an
arriving-files directory or Kafka source; `availableNow` is also the
recommended backfill trigger at scale (process everything, bounded per
micro-batch, then stop).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..materialize import materialize
from ..catalog import load_table

# ts is declared TIMESTAMP (LTZ): watermarks reject TIMESTAMP_NTZ, and under
# the engine's pinned UTC session timezone the wall-clock values are
# identical to the NTZ batch reads the oracles see.
_EVENTS_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"


def _prep_dir(spark: SparkSession, sf_dir: str, n_batches: int) -> str:
    """Materialize the events table as n chronologically-interleaved parquet
    files (batch i = rows with event_id % 5 semantics, see below) under a
    deterministic per-(sf_dir, n) staging path; reused across calls."""
    tag = os.path.basename(os.path.normpath(sf_dir))
    root = os.path.join("/tmp", "spark_graft_stream", f"{tag}_b{n_batches}")
    done = os.path.join(root, "_READY")
    if os.path.exists(done):
        return os.path.join(root, "data")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(os.path.join(root, "data"), exist_ok=True)
    ev = load_table(spark, sf_dir, "events")
    if n_batches == 1:
        parts = [ev]
    else:
        # batch i = event_id % n. Every batch spans the full time range, so
        # from batch 2 on, most rows are late w.r.t. the watermark set by
        # earlier batches — state for their windows is already evicted and
        # they are genuinely dropped. (Eviction lags one batch: the
        # watermark applied at the end of batch i derives from the max
        # event time of batches 0..i-1, which is why a 2-batch replay
        # never drops anything.)
        parts = [ev.filter(F.col("event_id") % n_batches == i) for i in range(n_batches)]
    for i, part in enumerate(parts):
        staging = os.path.join(root, f"_stage{i}")
        part.coalesce(1).write.mode("overwrite").parquet(staging)
        src = [f for f in os.listdir(staging) if f.endswith(".parquet")][0]
        dst = os.path.join(root, "data", f"batch-{i:03d}.parquet")
        shutil.copyfile(os.path.join(staging, src), dst)
        os.utime(dst, (1_700_000_000 + i * 100, 1_700_000_000 + i * 100))
        shutil.rmtree(staging)
    with open(done, "w") as f:
        f.write("ok")
    return os.path.join(root, "data")


def read_stream(spark: SparkSession, sf_dir: str, n_batches: int = 1) -> DataFrame:
    path = _prep_dir(spark, sf_dir, n_batches)
    reader = (
        spark.readStream.schema(_EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    return reader


def run_to_table(
    stream_df: DataFrame, output_mode: str, state_partitions: int | None = 8
) -> DataFrame:
    """Run a streaming plan to completion (availableNow) into a memory sink
    and return the result as a batch DataFrame.

    ``state_partitions`` sizes the stateful exchange. Unlike batch shuffles
    (where AQE coalesces at runtime), a streaming query's state-partition
    count is FIXED at checkpoint creation and each partition carries real
    per-micro-batch overhead (an HDFSBackedStateStore instance, delta +
    snapshot files, maintenance work) — so it must be sized to expected
    state rows, not inherited from the batch shuffle default. Measured here:
    the tumbling-window agg over 100k events runs 6-10 s with 32 state
    partitions and ~1.2 s with 8 (batch floor 1.24 s) — the 5× gap is pure
    per-partition state-store fixed cost. At cluster scale set
    SPARK_GRAFT_STREAM_SHUFFLE to executor-count × cores (state rows per
    partition stay bounded; repartitioning state later requires a new
    checkpoint). ``None`` keeps the session's shuffle setting.
    """
    spark = stream_df.sparkSession
    env = os.environ.get("SPARK_GRAFT_STREAM_SHUFFLE")
    if env:
        state_partitions = int(env)
    name = f"stream_{uuid.uuid4().hex[:12]}"
    key = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key)
    if state_partitions is not None:
        spark.conf.set(key, str(state_partitions))
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set(key, old)
    # Pin the (small — windowed/keyed aggregate) result and release the
    # memory sink's table: without this every call leaves a stream_<uuid>
    # temp view holding its rows in driver memory for the session's life
    # (the q263 leak class, in-memory flavor).
    out = spark.table(name).transform(materialize)
    spark.catalog.dropTempView(name)
    return out
