"""Streaming infrastructure: durable sinks and the state-store surface.

Complements test_queries' q80-q87 (which check streaming RESULTS against
batch oracles): here we check the delivery machinery itself — exactly-once
file-sink resume, foreachBatch fan-out with stable batch ids, and that the
RocksDB state store actually engages and agrees with the default provider.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from data_engineer_capstone_spark.streaming.replay import read_stream, run_to_table
from data_engineer_capstone_spark.streaming.sinks import run_foreach_batch, run_to_files
from data_engineer_capstone_spark.streaming.state import (
    ROCKSDB_PROVIDER,
    rocksdb_state_store,
)

SF = "/root/testdata/sf0.001"


def test_file_sink_exactly_once_resume(spark, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    proj = read_stream(spark, SF, 2).select("event_id", "event_type")
    run_to_files(proj, out, ckpt)
    expected = spark.read.parquet(os.path.join(SF, "events.parquet")).count()
    first = spark.read.parquet(out)
    assert first.count() == expected
    n_files = len(glob.glob(os.path.join(out, "*.parquet")))

    # Same checkpoint, no new source files: the offset log already covers
    # every input, so the rerun must commit nothing.
    run_to_files(read_stream(spark, SF, 2).select("event_id", "event_type"), out, ckpt)
    assert spark.read.parquet(out).count() == expected
    assert len(glob.glob(os.path.join(out, "*.parquet"))) == n_files


def test_file_sink_partitioned(spark, tmp_path):
    out = str(tmp_path / "out")
    proj = read_stream(spark, SF, 1).select("event_id", "event_type")
    run_to_files(proj, out, str(tmp_path / "ckpt"), partition_by=["event_type"])
    types = [os.path.basename(p) for p in glob.glob(os.path.join(out, "event_type=*"))]
    assert len(types) >= 2  # hive-style partition dirs materialized
    back = spark.read.parquet(out)
    expected = spark.read.parquet(os.path.join(SF, "events.parquet")).count()
    assert back.count() == expected


def test_foreach_batch_fanout_and_batch_ids(spark, tmp_path):
    """One foreachBatch callback lands each micro-batch in TWO sinks; batch
    ids arrive 0..n-1 and the union of batches equals the source."""
    a_dir, b_dir = str(tmp_path / "a"), str(tmp_path / "b")
    seen_ids: list[int] = []

    def fan_out(batch_df, batch_id: int) -> None:
        seen_ids.append(batch_id)
        batch_df.persist()
        batch_df.write.mode("append").parquet(a_dir)
        batch_df.groupBy("event_type").agg(
            F.count("*").alias("n")
        ).withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(b_dir)
        batch_df.unpersist()

    proj = read_stream(spark, SF, 2).select("event_id", "event_type")
    run_foreach_batch(proj, fan_out, str(tmp_path / "ckpt"))

    assert sorted(seen_ids) == [0, 1]
    expected = spark.read.parquet(os.path.join(SF, "events.parquet")).count()
    assert spark.read.parquet(a_dir).count() == expected
    per_batch = spark.read.parquet(b_dir)
    assert per_batch.agg(F.sum("n")).collect()[0][0] == expected
    assert {r.batch_id for r in per_batch.select("batch_id").distinct().collect()} == {0, 1}


def test_rocksdb_state_store_engages_and_agrees(spark):
    """The same stateful dedup under RocksDB: provider conf in force while
    the query runs, results identical to the default provider, conf
    restored afterwards."""

    def dedup_keys() -> set:
        s = read_stream(spark, SF, 1).withWatermark("ts", "10 minutes")
        d = s.dropDuplicatesWithinWatermark(["user_id", "event_type"]).select(
            "user_id", "event_type"
        )
        return {(r.user_id, r.event_type) for r in run_to_table(d, "append").collect()}

    baseline = dedup_keys()
    with rocksdb_state_store(spark):
        assert (
            spark.conf.get("spark.sql.streaming.stateStore.providerClass")
            == ROCKSDB_PROVIDER
        )
        under_rocksdb = dedup_keys()
    assert under_rocksdb == baseline
    # conf restored after the block
    assert (
        spark.conf.get(
            "spark.sql.streaming.stateStore.providerClass", "default"
        )
        != ROCKSDB_PROVIDER
    )


def test_transform_with_state_gated(spark, sf_dir):
    """transformWithStateInPandas surface: runs when protobuf exists,
    raises the documented gate error otherwise (this container lacks it)."""
    from data_engineer_capstone_spark.streaming.replay import (
        read_stream,
        run_to_table,
    )
    from data_engineer_capstone_spark.streaming.stateful import (
        running_max_tws,
        tws_available,
    )

    s = read_stream(spark, sf_dir, 2)
    if not tws_available():
        import pytest

        with pytest.raises(NotImplementedError):
            running_max_tws(s)
        return
    out = run_to_table(running_max_tws(s), "update").collect()
    assert len(out) > 0
