"""Structured Streaming surface (SURVEY.md §2.9 Q80-Q84): event-time
tumbling/sliding/session windows, watermark late-drop, stateful dedup —
each executed as a real streaming query (file-source replay, availableNow
trigger, memory sink) and oracle-checked against batch-equivalent DuckDB
SQL over the same `events` table.

The reference has no streaming (SURVEY §2.8 — it is a batch EMR job); this
is the engine's generalization of its daily-cadence scenario
(/root/reference/README.md:24-27) to incremental processing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..materialize import materialize
from ..streaming.replay import read_stream, run_to_table
from ._util import DEC
from .registry import query

_EV_TS = "CAST(ts AS TIMESTAMP)"
_BUCKET5 = f"time_bucket(INTERVAL 5 MINUTE, {_EV_TS})"


def _money_sum_stream(col: str, alias: str):
    return F.round(
        F.sum((F.floor(F.col(col) * 10000 + F.lit(0.5)) / 10000).cast(DEC)), 2
    ).cast("double").alias(alias)


_SQL_MONEY = (
    "CAST(ROUND(SUM(CAST(floor(value * 10000 + 0.5) / 10000 AS DECIMAL(18,4))), 2) "
    "AS DOUBLE) AS sum_value"
)


@query(
    "q80_stream_tumbling",
    oracle=f"""
    SELECT {_BUCKET5} AS win_start,
           {_BUCKET5} + INTERVAL 5 MINUTE AS win_end,
           event_type, COUNT(*) AS n, {_SQL_MONEY}
    FROM events
    GROUP BY win_start, event_type
    ORDER BY win_start, event_type
    """,
)
def q80(spark: SparkSession, sf: str) -> DataFrame:
    """Tumbling 5-minute event-time counts per type (streaming, complete
    mode; oracle = batch time_bucket aggregation)."""
    s = read_stream(spark, sf, 1)
    agg = s.groupBy(F.window("ts", "5 minutes").alias("win"), "event_type").agg(
        F.count(F.lit(1)).alias("n"), _money_sum_stream("value", "sum_value")
    )
    out = run_to_table(agg, "complete")
    return out.select(
        F.col("win.start").alias("win_start"),
        F.col("win.end").alias("win_end"),
        "event_type",
        "n",
        "sum_value",
    ).orderBy("win_start", "event_type")


@query(
    "q81_stream_sliding",
    oracle=f"""
    SELECT ws AS win_start, ws + INTERVAL 10 MINUTE AS win_end,
           event_type, COUNT(*) AS n
    FROM (SELECT {_BUCKET5} - to_minutes(5 * k) AS ws, event_type
          FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k))
    GROUP BY ws, event_type
    ORDER BY win_start, event_type
    """,
)
def q81(spark: SparkSession, sf: str) -> DataFrame:
    """Sliding 10-minute windows every 5 minutes (each event lands in two
    windows; oracle expands via the two shifted buckets)."""
    s = read_stream(spark, sf, 1)
    agg = s.groupBy(
        F.window("ts", "10 minutes", "5 minutes").alias("win"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    out = run_to_table(agg, "complete")
    return out.select(
        F.col("win.start").alias("win_start"),
        F.col("win.end").alias("win_end"),
        "event_type",
        "n",
    ).orderBy("win_start", "event_type")


@query(
    "q82_stream_session",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, {_EV_TS} AS t,
               LAG({_EV_TS}) OVER (PARTITION BY user_id ORDER BY {_EV_TS}, event_id)
                 AS prev_t
        FROM events
    ),
    flagged AS (
        -- STRICT >: Spark's session_window keeps an event arriving at
        -- exactly last+gap in the SAME session (verified by the boundary
        -- property test in tests/test_streaming_infra.py); >= here would
        -- disagree on measure-zero deltas real event data never hits
        SELECT user_id, t,
               CASE WHEN prev_t IS NULL OR t - prev_t > INTERVAL 10 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM seq
    ),
    numbered AS (
        SELECT user_id, t,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM flagged
    )
    SELECT user_id, MIN(t) AS session_start, MAX(t) AS last_ts, COUNT(*) AS n
    FROM numbered GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
)
def q82(spark: SparkSession, sf: str) -> DataFrame:
    """Session windows (gap 10 min) per user via F.session_window; the
    oracle is the classic gaps-and-islands rewrite (SURVEY §7.7 — the
    trickiest oracle to keep in lockstep; Spark's session end is
    last_event+gap, so we emit last_ts=max(ts) instead of window.end)."""
    s = read_stream(spark, sf, 1)
    agg = s.groupBy(
        F.session_window("ts", "10 minutes").alias("win"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n"), F.max("ts").alias("last_ts"))
    out = run_to_table(agg, "complete")
    return out.select(
        "user_id",
        F.col("win.start").alias("session_start"),
        "last_ts",
        "n",
    ).orderBy("user_id", "session_start")


@query(
    "q83_stream_watermark_latedrop",
    oracle=f"""
    WITH m AS (
        SELECT max({_EV_TS}) FILTER (WHERE event_id % 3 = 0)
                 - INTERVAL 10 MINUTE AS w1,
               max({_EV_TS}) FILTER (WHERE event_id % 3 IN (0, 1))
                 - INTERVAL 10 MINUTE AS w2
        FROM events
    ),
    kept AS (
        SELECT {_BUCKET5} AS ws, event_type
        FROM events, m
        WHERE event_id % 3 IN (0, 1)
           OR {_BUCKET5} + INTERVAL 5 MINUTE > m.w1
    )
    SELECT ws AS win_start, ws + INTERVAL 5 MINUTE AS win_end, event_type,
           COUNT(*) AS n
    FROM kept, m
    WHERE ws + INTERVAL 5 MINUTE <= m.w2
    GROUP BY ws, event_type
    ORDER BY win_start, event_type
    """,
)
def q83(spark: SparkSession, sf: str) -> DataFrame:
    """Watermark late-drop: 3-batch replay (event_id mod 3), 10-minute
    watermark, append mode. Batch-2 rows whose window state was evicted at
    the end of batch 1 (window_end <= max_ts(batch 0) - 10min) are dropped;
    windows are emitted once the watermark passes their end. The oracle
    replicates exactly that timeline: admitted = batches 0-1 plus batch-2
    rows with window_end > W1; emitted = windows with end <= W2."""
    s = read_stream(spark, sf, 3).withWatermark("ts", "10 minutes")
    agg = s.groupBy(F.window("ts", "5 minutes").alias("win"), "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    out = run_to_table(agg, "append")
    return out.select(
        F.col("win.start").alias("win_start"),
        F.col("win.end").alias("win_end"),
        "event_type",
        "n",
    ).orderBy("win_start", "event_type")


@query(
    "q84_stream_dedup",
    oracle="""
    SELECT DISTINCT user_id, event_type FROM events
    ORDER BY user_id, event_type
    """,
)
def q84(spark: SparkSession, sf: str) -> DataFrame:
    """Stateful streaming dedup: dropDuplicatesWithinWatermark on
    (user_id, event_type) — the first-seen row per key is emitted; the
    deterministic projection is the key set itself."""
    s = read_stream(spark, sf, 1).withWatermark("ts", "10 minutes")
    dedup = s.dropDuplicatesWithinWatermark(["user_id", "event_type"]).select(
        "user_id", "event_type"
    )
    out = run_to_table(dedup, "append")
    return out.dropDuplicates().orderBy("user_id", "event_type")


@query(
    "q86_stream_stream_join",
    oracle=f"""
    SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
           CAST(date_diff('second', {_EV_TS.replace('ts', 'c.ts')},
                          {_EV_TS.replace('ts', 'p.ts')}) AS BIGINT)
             AS secs_to_purchase
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 10 MINUTE
    ORDER BY click_id, purchase_id
    """,
)
def q86(spark: SparkSession, sf: str) -> DataFrame:
    """Stream-stream inner join: click→purchase attribution per user
    within 10 minutes. Both sides carry watermarks and the join condition
    time-bounds the buffered state (the requirement for state cleanup in a
    production stream-stream join); a single-batch replay makes the result
    equal to the batch join, which is the oracle."""
    clicks = (
        read_stream(spark, sf, 1)
        .where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "10 minutes")
    )
    purchases = (
        read_stream(spark, sf, 1)
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "10 minutes")
    )
    joined = clicks.join(
        purchases,
        [
            clicks.user_id == purchases.user_id,
            F.col("p_ts") > F.col("c_ts"),
            F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 10 MINUTES"),
        ],
    ).select(
        "click_id",
        "purchase_id",
        clicks.user_id.alias("user_id"),
        (F.unix_timestamp("p_ts") - F.unix_timestamp("c_ts")).alias(
            "secs_to_purchase"
        ),
    )
    out = run_to_table(joined, "append")
    return out.orderBy("click_id", "purchase_id")


@query(
    "q87_stream_static_join",
    oracle="""
    SELECT e.event_id, e.user_id, c.c_mktsegment, e.event_type
    FROM events e JOIN customer c ON c.c_custkey = e.user_id
    WHERE e.event_type IN ('signup', 'purchase')
    ORDER BY e.event_id
    """,
)
def q87(spark: SparkSession, sf: str) -> DataFrame:
    """Stream-static join: streaming events enriched against a static
    dimension (broadcast per micro-batch, no streaming state at all —
    the cheapest join shape in Structured Streaming and the default for
    dimension enrichment at scale)."""
    from ..catalog import load_table

    s = read_stream(spark, sf, 1).where(
        F.col("event_type").isin("signup", "purchase")
    )
    dim = load_table(spark, sf, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    # Stream-static dim enrichment: no forced broadcast — the planner
    # broadcasts customer while its stats fit the threshold (true at every
    # test SF); at 100 TB the static side joins shuffled per micro-batch
    # instead of OOMing every executor with a forced hint.
    joined = s.join(dim, "user_id").select(
        "event_id", "user_id", "c_mktsegment", "event_type"
    )
    out = run_to_table(joined, "append")
    return out.orderBy("event_id")


@query(
    "q85_stream_stateful_running_count",
    oracle="""
    SELECT user_id, cum_events FROM (
        SELECT user_id, COUNT(*) AS cum_events
        FROM events WHERE event_id % 2 = 0 GROUP BY user_id
        UNION ALL
        SELECT t.user_id, t.total AS cum_events
        FROM (SELECT user_id, COUNT(*) AS total FROM events GROUP BY user_id) t
        JOIN (SELECT DISTINCT user_id FROM events WHERE event_id % 2 = 1) b1
          USING (user_id)
    ) ORDER BY user_id, cum_events
    """,
)
def q85(spark: SparkSession, sf: str) -> DataFrame:
    """Custom stateful operator: applyInPandasWithState running count per
    user across a 2-batch replay (batch i = event_id % 2). Each batch in
    which a user appears emits the cumulative count so far — the batch-1
    emission equals the user's TOTAL only because state carried the batch-0
    count. Oracle reconstructs both emissions per user."""
    from ..streaming.stateful import running_count

    s = read_stream(spark, sf, 2)
    out = run_to_table(running_count(s, "user_id"), "update")
    return out.orderBy("user_id", "cum_events")


# --------------------------------------- foreachBatch rollup maintenance ---
@query(
    "q263_stream_rollup_maintenance",
    oracle=f"""
    SELECT event_type, COUNT(*) AS n, {_SQL_MONEY}
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def q263(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming rollup MAINTENANCE: the production loop that keeps a
    standing aggregate table current as micro-batches arrive —
    ``foreachBatch`` aggregates each batch alone (O(batch) work) and
    merges the partial into the persisted rollup by full-outer join
    (count += n, exact decimal sum += s), writing a new table version
    per batch. The events table replays as 4 chronologically-interleaved
    micro-batches; the final standing table must equal the from-scratch
    batch aggregate (the oracle) — proving base ⊕ batch-partials ≡
    recompute for ANY batch slicing, the q235 IVM argument driven by a
    real streaming query.

    Scale shape: per batch, one O(batch) aggregate + one O(groups)
    broadcast merge + one O(groups) write — the 100 TB base is never
    rescanned; versioned directories give readers snapshot isolation
    (the poor man's table format, documented honestly: production would
    use Delta/Iceberg MERGE here)."""
    import os
    import shutil
    import uuid

    from ..streaming.replay import read_stream
    from ..streaming.sinks import run_foreach_batch

    root = os.path.join("/tmp", "spark_graft_rollup", uuid.uuid4().hex[:12])
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    state = {"version": 0}

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        part = batch_df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.floor(F.col("value") * 10000 + F.lit(0.5)) / 10000).cast(DEC))
            .alias("sum_dec"),
        )
        v = state["version"]
        if v == 0:
            merged = part
        else:
            prev = batch_df.sparkSession.read.parquet(os.path.join(root, f"v{v}"))
            merged = (
                prev.join(part, "event_type", "full_outer")
                .select(
                    "event_type",
                    (
                        F.coalesce(prev["n"], F.lit(0))
                        + F.coalesce(part["n"], F.lit(0))
                    ).alias("n"),
                    (
                        F.coalesce(prev["sum_dec"], F.lit(0).cast(DEC))
                        + F.coalesce(part["sum_dec"], F.lit(0).cast(DEC))
                    ).alias("sum_dec"),
                )
            )
        merged.write.mode("overwrite").parquet(os.path.join(root, f"v{v + 1}"))
        state["version"] = v + 1

    try:
        stream = read_stream(spark, sf, 4)
        run_foreach_batch(
            stream, merge_batch, checkpoint=os.path.join(root, "_ckpt")
        )
        # Pin the (tiny, O(groups)) standing table in executor storage so
        # the run's /tmp directory can be removed before returning —
        # without this, every run leaked a /tmp/spark_graft_rollup/<uuid>.
        final = spark.read.parquet(
            os.path.join(root, f"v{state['version']}")
        ).transform(materialize)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return final.select(
        "event_type",
        "n",
        F.round(F.col("sum_dec"), 2).cast("double").alias("sum_value"),
    ).orderBy("event_type")


# ------------------------------------------------------ streaming OHLC ----
# zero-padded (epoch_us, event_id) — lexicographic order == arrival order,
# so first/last become arg_min/arg_max (streaming-legal declarative aggs)
_OHLC_KEY_SQL = (
    f"lpad(CAST(epoch_us({_EV_TS}) AS VARCHAR), 20, '0') || "
    "lpad(CAST(event_id AS VARCHAR), 10, '0')"
)
_BUCKET1H = f"time_bucket(INTERVAL 1 HOUR, {_EV_TS})"


@query(
    "q288_stream_ohlc",
    oracle=f"""
    WITH t AS (
        SELECT {_BUCKET1H} AS win_start, event_type, value,
               {_OHLC_KEY_SQL} AS k
        FROM events
    )
    SELECT win_start, win_start + INTERVAL 1 HOUR AS win_end, event_type,
           arg_min(value, k) AS open_v,
           MAX(value) AS high_v,
           MIN(value) AS low_v,
           arg_max(value, k) AS close_v,
           {_SQL_MONEY.replace('AS sum_value', 'AS volume')},
           COUNT(*) AS n
    FROM t GROUP BY win_start, event_type
    ORDER BY win_start, event_type
    """,
)
def q288(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming OHLC bars — q277's resample running INCREMENTALLY over
    an event-time tumbling window. Batch OHLC leans on row_number to pick
    open/close; streaming state cannot hold ordered rows, so first/last
    are re-expressed as min_by/max_by over a zero-padded (epoch_us,
    event_id) string key — order-insensitive, mergeable aggregates that
    fold arriving rows into O(1) state per (window, series) regardless of
    arrival order (the retracting-sort alternative is unbounded state).
    That re-expression is exactly how a 100 TB streaming rollup must
    store "first/last": as arg-extremes over a total order, never as
    position. Oracle = the same bars computed batch over the full replay."""
    s = read_stream(spark, sf, 1)
    key = F.concat(
        F.lpad(F.unix_micros(F.col("ts").cast("timestamp")).cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 10, "0"),
    )
    agg = (
        s.withColumn("k", key)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.min_by("value", "k").alias("open_v"),
            F.max("value").alias("high_v"),
            F.min("value").alias("low_v"),
            F.max_by("value", "k").alias("close_v"),
            _money_sum_stream("value", "volume"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    out = run_to_table(agg, "complete")
    return out.select(
        F.col("win.start").alias("win_start"),
        F.col("win.end").alias("win_end"),
        "event_type", "open_v", "high_v", "low_v", "close_v", "volume", "n",
    ).orderBy("win_start", "event_type")


# ----------------------------------- stream-static incremental dedup ---
@query(
    "q329_stream_incremental_dedup",
    oracle="""
    SELECT s.user_id, s.event_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM events s
    WHERE s.event_id % 2 = 1
      AND NOT EXISTS (SELECT 1 FROM events c
                      WHERE c.event_id % 2 = 0
                        AND c.user_id = s.user_id
                        AND c.event_type = s.event_type)
    GROUP BY s.user_id, s.event_type
    ORDER BY s.user_id, s.event_type
    """,
)
def q329(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming incremental dedup against a STANDING corpus — the
    ingest shape of q114 (batch incremental dedup) as a Structured
    Streaming query, and the stream-static join form q87 does not
    cover: a LEFT ANTI join from the stream onto the static
    already-seen key set, so only never-seen (user, type) pairs
    survive, then a streaming aggregate counts arrivals per novel
    pair. The standing corpus (rows with even event_id) stays a plain
    batch table re-read per micro-batch — at 100 TB this is the
    signature/membership table an LLM-ingest pipeline maintains, and
    the anti join probes it with the micro-batch only (no streaming
    state for the join; state exists only in the O(novel-pairs)
    aggregation). Oracle = the equivalent batch NOT EXISTS."""
    from ..catalog import load_table

    stream = read_stream(spark, sf, 1).where(F.col("event_id") % 2 == 1)
    seen = (
        load_table(spark, sf, "events")
        .where(F.col("event_id") % 2 == 0)
        .select("user_id", "event_type")
        .distinct()
    )
    novel = stream.join(seen, ["user_id", "event_type"], "left_anti")
    agg = novel.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    out = run_to_table(agg, "complete")
    return out.orderBy("user_id", "event_type")


# ------------------------------------ stream-stream LEFT OUTER join ---
@query(
    "q333_stream_stream_left_outer",
    oracle=f"""
    WITH c AS (
        SELECT event_id AS click_id, user_id, {_EV_TS} AS c_ts
        FROM events WHERE event_type = 'click'
    ),
    p AS (
        SELECT event_id AS purchase_id, user_id AS p_user, {_EV_TS} AS p_ts
        FROM events WHERE event_type = 'purchase'
    ),
    wm AS (
        SELECT date_trunc('millisecond',
                   LEAST((SELECT MAX(c_ts) FROM c),
                         (SELECT MAX(p_ts) FROM p)))
               - INTERVAL 10 MINUTE AS w
    ),
    matched AS (
        SELECT c.click_id, p.purchase_id, c.user_id,
               CAST(date_diff('second', c.c_ts, p.p_ts) AS BIGINT)
                 AS secs_to_purchase
        FROM c JOIN p
          ON c.user_id = p.p_user
         AND p.p_ts > c.c_ts AND p.p_ts <= c.c_ts + INTERVAL 10 MINUTE
    ),
    unmatched AS (
        SELECT c.click_id, CAST(NULL AS BIGINT) AS purchase_id, c.user_id,
               CAST(NULL AS BIGINT) AS secs_to_purchase
        FROM c CROSS JOIN wm
        WHERE NOT EXISTS (
            SELECT 1 FROM p
            WHERE p.p_user = c.user_id
              AND p.p_ts > c.c_ts AND p.p_ts <= c.c_ts + INTERVAL 10 MINUTE
        )
          AND c.c_ts + INTERVAL 10 MINUTE < wm.w
    )
    SELECT * FROM (SELECT * FROM matched UNION ALL SELECT * FROM unmatched)
    ORDER BY click_id, purchase_id NULLS FIRST
    """,
)
def q333(spark: SparkSession, sf: str) -> DataFrame:
    """Stream-stream LEFT OUTER join — the state-eviction-emitting form
    q86 (inner) does not cover: matched click→purchase pairs emit on
    match, and a click with NO purchase within 10 minutes emits with
    nulls only once the watermark proves no future match can arrive
    and its buffered state is evicted. The oracle encodes Spark's
    actual late-bound semantics, verified empirically: the global
    watermark is the MIN over both sides' (ms-truncated max event time
    − 10 min), and an unmatched click flushes iff
    ``c_ts + 10min < watermark`` — clicks newer than that are still in
    state when the availableNow replay ends and are correctly absent.
    At 100 TB this bounded-state contract is exactly why the time
    bound on the join condition is mandatory: per-key state is
    O(events in the watermark horizon), not O(stream)."""
    clicks = (
        read_stream(spark, sf, 1)
        .where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "10 minutes")
    )
    purchases = (
        read_stream(spark, sf, 1)
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "10 minutes")
    )
    j = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 10 MINUTES")),
        "left_outer",
    )
    out = run_to_table(j, "append")
    return out.select(
        "click_id",
        "purchase_id",
        "user_id",
        (F.unix_timestamp("p_ts") - F.unix_timestamp("c_ts"))
        .cast("long")
        .alias("secs_to_purchase"),
    ).orderBy("click_id", F.col("purchase_id").asc_nulls_first())


# ------------------------------------- dynamic-gap session windows ----
@query(
    "q354_dynamic_gap_sessions",
    oracle=f"""
    WITH ev AS (
        SELECT user_id, event_id, epoch_us({_EV_TS}) AS t_us,
               epoch_us({_EV_TS})
               + CASE WHEN event_type = 'purchase'
                      THEN 1800000000 ELSE 600000000 END AS end_us
        FROM events
    ),
    flagged AS (
        SELECT user_id, t_us, end_us,
               -- STRICT >: an event at exactly the running max interval
               -- end merges into the session (pinned by the dynamic-gap
               -- boundary probe in tests/test_streaming_infra.py, matching
               -- q82's fixed-gap boundary contract)
               CASE WHEN MAX(end_us) OVER (
                        PARTITION BY user_id ORDER BY t_us, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    IS NULL
                 OR t_us > MAX(end_us) OVER (
                        PARTITION BY user_id ORDER BY t_us, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               THEN 1 ELSE 0 END AS new_s
        FROM ev
    ),
    sess AS (
        SELECT user_id, t_us, end_us,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY t_us, end_us
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    )
    SELECT user_id, CAST(MIN(t_us) AS BIGINT) AS session_start_us,
           CAST(MAX(end_us) AS BIGINT) AS session_end_us,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM sess GROUP BY user_id, sid
    ORDER BY user_id, session_start_us
    """,
)
def q354(spark: SparkSession, sf: str) -> DataFrame:
    """DYNAMIC-gap session windows — ``F.session_window`` with a
    per-row gap expression (purchases hold a session open 30 minutes,
    everything else 10), the API q82's fixed-gap form doesn't reach:
    a session's extent depends on WHICH events it contains, so the
    engine must merge per-event intervals [ts, ts+gap(event)), not
    apply one timeout. The oracle replays the same semantics as the
    q153 interval-merge idiom (session break iff the event starts
    STRICTLY after the running MAX of previous interval ends — an
    event landing exactly at the gap edge MERGES, the boundary
    contract q82's fixed-gap property test pinned, re-verified for
    the dynamic form by the boundary probe in
    tests/test_streaming_infra.py) entirely in exact microsecond
    integers. Batch
    ``session_window`` is one hash-partition + in-partition sort per
    user; the same expression drops into the streaming form with
    watermark-driven state eviction."""
    from ..catalog import load_table

    ev = load_table(spark, sf, "events").select(
        "user_id",
        F.col("ts").cast("timestamp").alias("ts"),
        F.when(F.col("event_type") == "purchase", F.lit("30 minutes"))
        .otherwise(F.lit("10 minutes"))
        .alias("gap"),
    )
    out = ev.groupBy(
        F.session_window("ts", F.col("gap")).alias("win"), "user_id"
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    return out.select(
        "user_id",
        F.unix_micros(F.col("win.start")).alias("session_start_us"),
        F.unix_micros(F.col("win.end")).alias("session_end_us"),
        "n_events",
    ).orderBy("user_id", "session_start_us")


# ------------------------------ STREAMED dynamic-gap sessions ---------
def _dynamic_session_sql() -> str:
    """Shared by q354 (batch) and q355 (streamed, complete mode): the
    two must land on the identical session set."""
    return f"""
    WITH ev AS (
        SELECT user_id, event_id, epoch_us({_EV_TS}) AS t_us,
               epoch_us({_EV_TS})
               + CASE WHEN event_type = 'purchase'
                      THEN 1800000000 ELSE 600000000 END AS end_us
        FROM events
    ),
    flagged AS (
        SELECT user_id, t_us, end_us,
               CASE WHEN MAX(end_us) OVER (
                        PARTITION BY user_id ORDER BY t_us, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    IS NULL
                 OR t_us > MAX(end_us) OVER (
                        PARTITION BY user_id ORDER BY t_us, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               THEN 1 ELSE 0 END AS new_s
        FROM ev
    ),
    sess AS (
        SELECT user_id, t_us, end_us,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY t_us, end_us
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    )
    SELECT user_id, CAST(MIN(t_us) AS BIGINT) AS session_start_us,
           CAST(MAX(end_us) AS BIGINT) AS session_end_us,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM sess GROUP BY user_id, sid
    ORDER BY user_id, session_start_us
    """


@query("q355_stream_dynamic_sessions", oracle=_dynamic_session_sql())
def q355(spark: SparkSession, sf: str) -> DataFrame:
    """q354's dynamic-gap sessions executed as a REAL streaming query
    (file replay, complete mode, session-window state store) — the
    batch/stream parity certification for the dynamic-gap form, same
    oracle as q354 verbatim. Complete mode emits every session at
    termination, so the streamed state machine must reconstruct
    exactly the batch interval merge; per-key session state merges
    in the store when a new event's interval overlaps, which is the
    stateful-operator path the batch plan never exercises."""
    s = read_stream(spark, sf, 1).select(
        "user_id",
        F.col("ts").cast("timestamp").alias("ts"),
        F.when(F.col("event_type") == "purchase", F.lit("30 minutes"))
        .otherwise(F.lit("10 minutes"))
        .alias("gap"),
    )
    agg = s.groupBy(
        F.session_window("ts", F.col("gap")).alias("win"), "user_id"
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    out = run_to_table(agg, "complete")
    return out.select(
        "user_id",
        F.unix_micros(F.col("win.start")).alias("session_start_us"),
        F.unix_micros(F.col("win.end")).alias("session_end_us"),
        "n_events",
    ).orderBy("user_id", "session_start_us")


# --------------------- chained stateful: window aggs -> stream join ---
@query(
    "q356_windowed_stream_join",
    oracle=f"""
    WITH m AS (
        SELECT date_trunc('millisecond', MAX({_EV_TS}))
               - INTERVAL 10 MINUTE AS wm
        FROM events
    ),
    c AS (
        SELECT time_bucket(INTERVAL 1 HOUR, {_EV_TS}) AS w,
               CAST(COUNT(*) AS BIGINT) AS n_clicks
        FROM events WHERE event_type = 'click'
        GROUP BY w
    ),
    p AS (
        SELECT time_bucket(INTERVAL 1 HOUR, {_EV_TS}) AS w,
               CAST(COUNT(*) AS BIGINT) AS n_purchases
        FROM events WHERE event_type = 'purchase'
        GROUP BY w
    )
    SELECT CAST(epoch_us(c.w) AS BIGINT) AS win_start_us,
           c.n_clicks, p.n_purchases,
           CAST(p.n_purchases * 1000000 // c.n_clicks AS BIGINT)
             AS conversion_ppm
    FROM c JOIN p ON p.w = c.w CROSS JOIN m
    WHERE c.w + INTERVAL 1 HOUR <= m.wm
    ORDER BY win_start_us
    """,
)
def q356(spark: SparkSession, sf: str) -> DataFrame:
    """CHAINED stateful streaming operators — two windowed aggregates
    joined stream-to-stream on the window (hourly click volume vs
    purchase volume → conversion ppm), the multi-stateful-operator
    pipeline Spark only allows since 3.5 (one watermark drives both
    aggs AND the join's state eviction). Append mode means only
    FINALIZED windows flow into the join, so the oracle is the batch
    twin restricted to windows whose end the final watermark passed
    (ms-truncated max event time − 10 min, the q333-verified rule).
    At 100 TB this replaces the land-then-join batch detour: one
    pipeline, state bounded by watermark horizon on both operators."""
    clicks = (
        read_stream(spark, sf, 1)
        .select(F.col("ts").cast("timestamp").alias("ts"), "event_type")
        .withWatermark("ts", "10 minutes")
        .where(F.col("event_type") == "click")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_clicks"))
    )
    purchases = (
        read_stream(spark, sf, 1)
        .select(F.col("ts").cast("timestamp").alias("ts"), "event_type")
        .withWatermark("ts", "10 minutes")
        .where(F.col("event_type") == "purchase")
        .groupBy(F.window("ts", "1 hour").alias("w2"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_purchases"))
    )
    j = clicks.join(purchases, clicks.w == purchases.w2, "inner")
    out = run_to_table(j, "append")
    return out.select(
        F.unix_micros(F.col("w.start")).alias("win_start_us"),
        "n_clicks",
        "n_purchases",
        F.expr(
            "CAST(n_purchases * 1000000 div n_clicks AS BIGINT)"
        ).alias("conversion_ppm"),
    ).orderBy("win_start_us")
