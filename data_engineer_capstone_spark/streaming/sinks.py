"""Streaming sinks beyond the memory sink (SURVEY.md §2.8).

The replay harness (replay.py) lands results in a memory sink because the
correctness gate wants a batch-comparable DataFrame. Production streams
land somewhere durable; this module provides the two shapes that matter:

- ``run_to_files``: the exactly-once file sink. The checkpoint directory
  carries the source offsets AND the sink's file-commit log, so a restart
  resumes from the last committed micro-batch and readers never see
  partial output — at scale this is the landing path for a continuously
  arriving event firehose (parquet, partitioned by event date/hour).
- ``run_foreach_batch``: escape hatch for sinks Spark has no native
  connector for (JDBC upserts, multi-sink fan-out, MERGE). The function
  receives a *batch* DataFrame per micro-batch, so the whole batch
  DataFrame/SQL surface (joins, dedup, overwrite modes) applies. Spark
  guarantees at-least-once delivery here; dedup/idempotence must come
  from ``batch_id`` (passed to the callback) or an idempotent target.

Both run with ``Trigger.AvailableNow`` by default — deterministic
drain-everything-then-stop, the recommended backfill/test trigger; pass
``available_now=False`` plus a processing-time trigger for a long-lived
stream.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def run_to_files(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    available_now: bool = True,
) -> None:
    """Drain a streaming plan into an exactly-once file sink.

    File sinks only support append output, so the plan must be
    append-capable (stateless transforms, or watermarked aggregations
    whose windows can close). Rerunning with the same ``checkpoint`` and
    no new source data is a no-op — the offset log already covers every
    input file.
    """
    writer = (
        stream_df.writeStream.format(fmt)
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
    else:  # pragma: no cover - long-lived mode, not exercised in tests
        writer.start()


def run_foreach_batch(
    stream_df: DataFrame,
    fn: Callable[[DataFrame, int], None],
    checkpoint: str,
    output_mode: str = "append",
    available_now: bool = True,
) -> None:
    """Drain a streaming plan through ``foreachBatch(fn)``.

    ``fn(batch_df, batch_id)`` runs on the driver once per micro-batch
    with a batch DataFrame; writes it performs execute as normal batch
    jobs. ``batch_id`` is stable across restarts for a replayed batch —
    the idempotence key for at-least-once sinks.
    """
    writer = (
        stream_df.writeStream.foreachBatch(fn)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
    else:  # pragma: no cover - long-lived mode, not exercised in tests
        writer.start()
