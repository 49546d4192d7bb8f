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


def test_q263_cleans_its_tmp_state(spark):
    """ADVICE r4: q263 leaked a /tmp/spark_graft_rollup/<uuid> per run;
    after the query returns (result pinned via localCheckpoint) the run
    directory must be gone and the result must still be collectable."""
    import glob

    from data_engineer_capstone_spark.plans import get_queries

    before = set(glob.glob("/tmp/spark_graft_rollup/*"))
    df = get_queries()["q263_stream_rollup_maintenance"](spark, SF)
    after = set(glob.glob("/tmp/spark_graft_rollup/*"))
    assert after - before == set(), f"leaked run dirs: {after - before}"
    assert df.count() > 0  # still readable after the rmtree


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


def test_session_window_gap_boundary_lockstep(spark):
    """q82's oracle is SURVEY §7.7's trickiest (gaps-and-islands in DuckDB
    vs Spark session_window). Property: perturb event times around ±gap/2
    and the two stay in lockstep — especially AT the gap boundary, where
    Spark keeps an event at exactly last+gap in the SAME session, so the
    oracle's new-session rule must be STRICT `delta > gap` (this test
    caught the `>=` variant: real event timestamps never land on the exact
    boundary, so the q82 driver gate alone could not). Batch
    session_window has identical semantics to the streamed one, so the
    property runs batch-side for speed."""
    import datetime

    import duckdb
    import pandas as pd
    from hypothesis import given, settings, strategies as st

    GAP_MIN = 10
    base = datetime.datetime(2024, 1, 1)

    @settings(max_examples=15, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=2),        # user
                st.integers(min_value=0, max_value=12),       # half-gap steps
                st.integers(min_value=-1, max_value=1),       # ±1 min jitter
            ),
            min_size=1,
            max_size=25,
        )
    )
    def check(evts):
        rows = [
            (u, base + datetime.timedelta(minutes=steps * GAP_MIN / 2 + jit))
            for u, steps, jit in evts
        ]
        sdf = spark.createDataFrame(rows, "user_id long, ts timestamp")
        got = {
            (r.user_id, r.session_start, r.last_ts, r.n)
            for r in sdf.groupBy(
                F.session_window("ts", f"{GAP_MIN} minutes").alias("win"), "user_id"
            )
            .agg(F.count(F.lit(1)).alias("n"), F.max("ts").alias("last_ts"))
            .select(
                "user_id", F.col("win.start").alias("session_start"), "last_ts", "n"
            )
            .collect()
        }
        pdf = pd.DataFrame(rows, columns=["user_id", "ts"])
        con = duckdb.connect()
        con.register("ev", pdf)
        want = {
            (int(u), s, e, int(n))
            for u, s, e, n in con.execute(f"""
                WITH seq AS (
                    SELECT user_id, ts,
                           LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
                    FROM ev),
                flagged AS (
                    SELECT user_id, ts,
                           CASE WHEN prev IS NULL
                                  OR ts - prev > INTERVAL {GAP_MIN} MINUTE
                                THEN 1 ELSE 0 END AS ns
                    FROM seq),
                numbered AS (
                    SELECT user_id, ts,
                           SUM(ns) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS sid
                    FROM flagged)
                SELECT user_id, MIN(ts), MAX(ts), COUNT(*)
                FROM numbered GROUP BY user_id, sid
            """).fetchall()
        }
        assert got == want, f"session mismatch\nspark={sorted(got)}\nduck={sorted(want)}"

    check()


def test_dynamic_gap_session_boundary(spark):
    """q354's dynamic-gap oracle break rule must be STRICT: an event at
    exactly the previous interval's end (prev_ts + gap(prev)) merges into
    the session; one microsecond later splits. Direct probe of both
    sides of the boundary, per gap type."""
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (1, base, "purchase"),                                      # gap 30m
        (1, base + datetime.timedelta(minutes=30), "click"),        # AT edge
        (2, base, "purchase"),
        (2, base + datetime.timedelta(minutes=30, microseconds=1), "click"),
        (3, base, "click"),                                         # gap 10m
        (3, base + datetime.timedelta(minutes=10), "click"),        # AT edge
        (4, base, "click"),
        (4, base + datetime.timedelta(minutes=10, microseconds=1), "click"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    gap = F.when(F.col("event_type") == "purchase", F.lit("30 minutes")).otherwise(
        F.lit("10 minutes")
    )
    n_sessions = {
        r.user_id: r.n
        for r in df.groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert n_sessions == {1: 1, 2: 2, 3: 1, 4: 2}
