"""Window-function surface (SURVEY.md §2.9 Q40-Q44).

Scale notes: every window here partitions on a real key (nation, customer,
status) so the single shuffle is by that key and state stays bounded per
partition; no global-ordering window without a partition key appears except
over provably tiny inputs (q44's NTILE partitions by status first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ._util import DEC, _dec4, _sql_dec4, round_det, sql_round_det
from .registry import query


@query(
    "q40_row_number_topk",
    oracle="""
    SELECT c_nationkey, c_custkey, c_acctbal, rn FROM (
        SELECT c_nationkey, c_custkey, c_acctbal,
               ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                  ORDER BY c_acctbal DESC, c_custkey) AS rn
        FROM customer)
    WHERE rn <= 3 ORDER BY c_nationkey, rn
    """,
)
def q40(spark: SparkSession, sf: str) -> DataFrame:
    """Top-3 customers per nation by balance via ROW_NUMBER."""
    c = load_table(spark, sf, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), "c_custkey")
    return (
        c.select("c_nationkey", "c_custkey", "c_acctbal", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
        .orderBy("c_nationkey", "rn")
    )


@query(
    "q41_rank_dense_rank",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_nationkey,
           RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_nationkey) AS rnk,
           DENSE_RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_nationkey) AS drnk
    FROM customer ORDER BY c_mktsegment, c_custkey
    """,
)
def q41(spark: SparkSession, sf: str) -> DataFrame:
    """RANK vs DENSE_RANK with real ties (low-cardinality order key)."""
    c = load_table(spark, sf, "customer")
    w = W.partitionBy("c_mktsegment").orderBy("c_nationkey")
    return c.select(
        "c_mktsegment",
        "c_custkey",
        "c_nationkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    ).orderBy("c_mktsegment", "c_custkey")


@query(
    "q42_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           LAG(o_orderdate) OVER w AS prev_date,
           LEAD(o_orderdate) OVER w AS next_date,
           datediff('day', CAST(LAG(o_orderdate) OVER w AS DATE),
                    CAST(o_orderdate AS DATE)) AS gap_days
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
)
def q42(spark: SparkSession, sf: str) -> DataFrame:
    """LAG/LEAD deltas over each customer's order timeline."""
    o = load_table(spark, sf, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        prev.alias("prev_date"),
        F.lead("o_orderdate").over(w).alias("next_date"),
        F.datediff(F.to_date("o_orderdate"), F.to_date(prev)).alias("gap_days"),
    ).orderBy("o_custkey", "o_orderdate", "o_orderkey")


@query(
    "q43_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
             AS running_spend,
           COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_so_far
    FROM orders ORDER BY o_custkey, o_orderkey
    """,
)
def q43(spark: SparkSession, sf: str) -> DataFrame:
    """Running sum/count: ROWS UNBOUNDED PRECEDING → CURRENT ROW frame.
    Decimal accumulator keeps the running value exact at any frame length."""
    o = load_table(spark, sf, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum(F.col("o_totalprice").cast(DEC)).over(w), 2)
        .cast("double")
        .alias("running_spend"),
        F.count(F.lit(1)).over(w).alias("n_so_far"),
    ).orderBy("o_custkey", "o_orderkey")


@query(
    "q44_sliding_frame_ntile",
    oracle="""
    SELECT o_orderstatus, o_orderkey,
           floor(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
               PARTITION BY o_orderstatus ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
             / LEAST(COUNT(*) OVER (
               PARTITION BY o_orderstatus ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 3) * 100 + 0.5) / 100
             AS avg3,
           NTILE(4) OVER (PARTITION BY o_orderstatus
                          ORDER BY o_totalprice, o_orderkey) AS quartile
    FROM orders ORDER BY o_orderstatus, o_orderkey
    """,
)
def q44(spark: SparkSession, sf: str) -> DataFrame:
    """Sliding 3-row mean (exact decimal numerator / window count) + NTILE(4)."""
    o = load_table(spark, sf, "orders")
    frame = (
        W.partitionBy("o_orderstatus")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, W.currentRow)
    )
    wq = W.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderstatus",
        "o_orderkey",
        round_det(
            F.sum(F.col("o_totalprice").cast(DEC)).over(frame).cast("double")
            / F.least(F.count(F.lit(1)).over(frame), F.lit(3))
        ).alias("avg3"),
        F.ntile(4).over(wq).alias("quartile"),
    ).orderBy("o_orderstatus", "o_orderkey")


@query(
    "q117_sessionize",
    oracle="""
    WITH o AS (
        SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
               CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec
        FROM events),
    f AS (
        SELECT user_id, ts,
               CASE WHEN LAG(sec) OVER w IS NULL OR sec - LAG(sec) OVER w > 1800
                    THEN 1 ELSE 0 END AS is_new
        FROM o WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (
        SELECT user_id, ts,
               CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM f)
    SELECT user_id, session_id, MIN(ts) AS session_start,
           MAX(ts) AS session_end, COUNT(*) AS n_events
    FROM s GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
)
def q117(spark: SparkSession, sf: str) -> DataFrame:
    """Batch sessionization (gaps-and-islands): a session breaks when the
    per-user gap exceeds 30 minutes; sessions are numbered in time order.

    The batch twin of q82's streaming session window (reference: event
    sessionization over the activity stream). Two windows over the SAME
    (user_id, ts) partitioning/order — one shuffle, the second window
    reuses the sort. Gap math is whole-second integer subtraction so the
    break predicate is engine-exact.
    """
    ev = load_table(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.col("ts").cast("timestamp").cast("long")  # NTZ->LTZ (UTC session)->epoch sec
    cum = W.partitionBy("user_id").orderBy("ts").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return (
        ev.select("user_id", "ts", F.lag(sec).over(w).alias("prev_sec"), sec.alias("sec"))
        .select(
            "user_id",
            "ts",
            F.when(
                F.col("prev_sec").isNull()
                | (F.col("sec") - F.col("prev_sec") > 1800),
                1,
            )
            .otherwise(0)
            .alias("is_new"),
        )
        .select("user_id", "ts", F.sum("is_new").over(cum).alias("session_id"))
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id", "session_id")
    )


@query(
    "q120_time_range_window",
    oracle=f"""
    SELECT event_id, user_id,
           CAST(ROUND(SUM({_sql_dec4("value")}) OVER (
                PARTITION BY user_id
                ORDER BY CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
                RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
           AS roll_1h
    FROM events ORDER BY event_id
    """,
)
def q120(spark: SparkSession, sf: str) -> DataFrame:
    """Trailing 1-hour per-user rolling sum via a time-RANGE window frame.

    ``rangeBetween`` on epoch seconds — the frame is defined by the ORDER
    value, not row counts, so co-timed events land in the same frame
    regardless of tie order (row frames would be nondeterministic here).
    Exact decimal partials keep the rolling sum engine-identical.
    """
    ev = load_table(spark, sf, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").cast("timestamp").cast("long"))
        .rangeBetween(-3600, W.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum(_dec4(F.col("value"))).over(w), 2)
        .cast("double")
        .alias("roll_1h"),
    ).orderBy("event_id")


@query(
    "q129_window_kit2",
    oracle="""
    SELECT c_nationkey, c_custkey,
           floor(PERCENT_RANK() OVER w * 1e6 + 0.5) / 1e6 AS pr,
           floor(CUME_DIST() OVER w * 1e6 + 0.5) / 1e6 AS cd,
           NTH_VALUE(c_acctbal, 2) OVER
               (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS second_bal,
           LAST_VALUE(c_custkey) OVER
               (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS last_custkey
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    ORDER BY c_nationkey, c_custkey
    """,
)
def q129(spark: SparkSession, sf: str) -> DataFrame:
    """Ranking-kit completion: PERCENT_RANK / CUME_DIST / NTH_VALUE /
    LAST_VALUE (SURVEY.md §2.5 window family; reference has no windows).

    Determinism: the partition ORDER BY (acctbal DESC, custkey) is a total
    order, so percent_rank == (row_number-1)/(n-1) and cume_dist == rn/n —
    single IEEE divisions, identical in any engine; the floor-trick rounds
    them to 6 digits anyway. NTH/LAST_VALUE use the full-partition ROWS
    frame (the default RANGE..CURRENT ROW frame would make NTH_VALUE
    prefix-dependent). At scale this is one shuffle on c_nationkey with
    an in-partition sort — no global sort."""
    c = load_table(spark, sf, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), "c_custkey")
    wf = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return c.select(
        "c_nationkey",
        "c_custkey",
        round_det(F.percent_rank().over(w), 6).alias("pr"),
        round_det(F.cume_dist().over(w), 6).alias("cd"),
        F.nth_value("c_acctbal", 2).over(wf).alias("second_bal"),
        F.last("c_custkey").over(wf).alias("last_custkey"),
    ).orderBy("c_nationkey", "c_custkey")


@query(
    "q173_locf",
    oracle="""
    SELECT event_id, user_id,
           last_value(nullif(CAST(floor(value * 100 + 0.5) AS BIGINT), 0)
                      IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS filled_cents
    FROM events ORDER BY event_id
    """,
)
def q173(spark: SparkSession, sf: str) -> DataFrame:
    """LOCF (last observation carried forward): per-user readings with a
    simulated sensor dropout (zero cents -> NULL) filled from the most
    recent non-null value — IGNORE NULLS over a running frame.

    This is THE sparse-to-dense repair for telemetry: one shuffle on
    user_id, running frame state is a single value, and rows before the
    first observation stay NULL (no lookahead — the causal fill). Spark's
    ``last(col, ignorenulls=True)`` == SQL ``LAST_VALUE ... IGNORE
    NULLS``; q112's gap-fill composes this with the q134 spine when the
    missing rows don't exist at all rather than being null."""
    ev = load_table(spark, sf, "events")
    cents = F.nullif(
        F.floor(F.col("value") * 100 + 0.5).cast("long"), F.lit(0).cast("long")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.last(cents, ignorenulls=True).over(w).alias("filled_cents"),
    ).orderBy("event_id")


@query(
    "q174_contribution",
    oracle="""
    WITH seg AS (
        SELECT n_regionkey, c_nationkey, COUNT(*) AS n
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_regionkey, c_nationkey)
    SELECT n_regionkey, c_nationkey, n,
           floor(CAST(n AS DOUBLE)
                 / CAST(SUM(n) OVER (PARTITION BY n_regionkey) AS DOUBLE)
                 * 1e6 + 0.5) / 1e6 AS share_of_region,
           floor(CAST(SUM(n) OVER (PARTITION BY n_regionkey) AS DOUBLE)
                 / CAST(SUM(n) OVER () AS DOUBLE) * 1e6 + 0.5) / 1e6
               AS region_share_of_total
    FROM seg ORDER BY n_regionkey, c_nationkey
    """,
)
def q174(spark: SparkSession, sf: str) -> DataFrame:
    """Contribution analysis: each nation's share of its region and each
    region's share of the total — the percent-of-parent rollup every BI
    layer asks for.

    The windows run over the PRE-AGGREGATED (region, nation) counts
    (25 rows), so the empty-partition global window — normally a
    scale red flag — is over provably bounded input; the raw table is
    touched by exactly one hash aggregate. Integer counts divide in one
    pinned float order; floor-trick rounding."""
    c = load_table(spark, sf, "customer")
    n = load_table(spark, sf, "nation")
    seg = (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_regionkey", "c_nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wr = W.partitionBy("n_regionkey")
    wall = W.partitionBy()
    region_tot = F.sum("n").over(wr).cast("double")
    grand_tot = F.sum("n").over(wall).cast("double")
    return seg.select(
        "n_regionkey",
        "c_nationkey",
        "n",
        round_det(F.col("n").cast("double") / region_tot, 6).alias(
            "share_of_region"
        ),
        round_det(region_tot / grand_tot, 6).alias("region_share_of_total"),
    ).orderBy("n_regionkey", "c_nationkey")


@query(
    "q175_new_vs_returning",
    oracle="""
    WITH first_seen AS (
        SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS w0
        FROM events GROUP BY user_id),
    active AS (
        SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
        FROM events)
    SELECT a.wk,
           CAST(count_if(a.wk = f.w0) AS BIGINT) AS new_users,
           CAST(count_if(a.wk <> f.w0) AS BIGINT) AS returning_users,
           CAST(SUM(count_if(a.wk = f.w0)) OVER (ORDER BY a.wk
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_acquired
    FROM active a JOIN first_seen f USING (user_id)
    GROUP BY a.wk ORDER BY a.wk
    """,
)
def q175(spark: SparkSession, sf: str) -> DataFrame:
    """Weekly growth accounting: actives split into new vs returning by
    first-seen week, plus the cumulative acquisition curve.

    Same reduce-before-join shape as q148's cohorts (first-seen and
    distinct user-weeks both shrink to user granularity before the
    user_id-partitioned join); the cumulative window then runs over the
    weekly aggregate — a handful of rows — so the global ordering window
    is bounded, never over raw events."""
    ev = load_table(spark, sf, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("w0")
    )
    active = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("wk")
    ).distinct()
    weekly = (
        active.join(first_seen, "user_id")
        .groupBy("wk")
        .agg(
            F.count_if(F.col("wk") == F.col("w0")).alias("new_users"),
            F.count_if(F.col("wk") != F.col("w0")).alias("returning_users"),
        )
    )
    wcum = W.orderBy("wk").rowsBetween(W.unboundedPreceding, W.currentRow)
    return weekly.select(
        "wk",
        "new_users",
        "returning_users",
        F.sum("new_users").over(wcum).alias("cum_acquired"),
    ).orderBy("wk")


# ------------------------------------------------------ MoM growth ---------
@query(
    "q260_mom_revenue_growth",
    oracle=f"""
    WITH m AS (
        SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
               CAST(ROUND(SUM({_sql_dec4('o_totalprice')}), 2) AS DOUBLE)
                   AS revenue
        FROM orders GROUP BY month
    )
    SELECT month, revenue,
           CAST(floor((revenue / lag(revenue) OVER (ORDER BY month) - 1)
                      * 1000000 + 0.5) AS BIGINT) AS growth_q
    FROM m ORDER BY month
    """,
)
def q260(spark: SparkSession, sf: str) -> DataFrame:
    """Month-over-month revenue growth — the warehouse KPI query every
    BI layer runs: monthly totals, then the lag-1 percent change.

    Scale shape: the aggregate reduces the fact table to O(months) rows
    FIRST (mergeable decimal partials, one hash shuffle), so the
    partitionless lag window runs over a few dozen rows — the q175
    bounded-window argument, never a window over raw facts. Exactness:
    the monthly revenues are decimal-summed then rounded identically in
    both engines, so the growth division is one IEEE op on identical
    machine numbers, quantized at 1e-6; the first month's growth is NULL
    by lag semantics on both sides."""
    o = load_table(spark, sf, "orders")
    dec = (F.floor(F.col("o_totalprice") * 10000 + F.lit(0.5)) / 10000).cast(DEC)
    m = (
        o.groupBy(
            F.to_date(F.date_trunc("month", F.col("o_orderdate"))).alias("month")
        )
        .agg(F.round(F.sum(dec), 2).cast("double").alias("revenue"))
    )
    w = W.orderBy("month")
    growth = (F.col("revenue") / F.lag("revenue").over(w) - 1)
    return m.select(
        "month",
        "revenue",
        F.floor(growth * 1000000 + F.lit(0.5)).cast("long").alias("growth_q"),
    ).orderBy("month")


# -------------------------------------------- view->purchase attribution ---
@query(
    "q265_conversion_attribution",
    oracle="""
    WITH seq AS (
        SELECT event_id, user_id, ts, event_type,
               last_value(CASE WHEN event_type = 'view'
                               THEN epoch_us(ts) END IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS last_view_us
        FROM events
    )
    SELECT event_id, user_id,
           epoch_us(ts) - last_view_us AS lag_us
    FROM seq
    WHERE event_type = 'purchase' AND last_view_us IS NOT NULL
    ORDER BY event_id
    """,
)
def q265(spark: SparkSession, sf: str) -> DataFrame:
    """Last-touch conversion attribution WITHOUT a join: for every
    purchase, microseconds since the same user's most recent PRIOR view —
    the conditional-LOCF shape (q173's gap-fill generalized to a
    cross-event-type carry): ``last_value(CASE WHEN view THEN ts END)
    IGNORE NULLS`` over the user's ordered history, frame ending at
    1 PRECEDING so a view and purchase sharing a timestamp never
    self-attribute.

    The naive formulation is an as-of self-join of purchases against
    views (two scans, a range join); the window form is ONE user_id
    shuffle over one scan with O(1) carried state per row — at 100 TB
    that's the difference between a skew-prone range join and a plain
    partitioned window. Purchases with no prior view drop (unattributable
    — the honest contract). All-integer microsecond arithmetic."""
    ev = load_table(spark, sf, "events")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    last_view = F.last(
        F.when(F.col("event_type") == "view", ts_us), ignorenulls=True
    ).over(w)
    return (
        ev.select(
            "event_id",
            "user_id",
            "ts",
            "event_type",
            last_view.alias("last_view_us"),
        )
        .where(
            (F.col("event_type") == "purchase")
            & F.col("last_view_us").isNotNull()
        )
        .select(
            "event_id",
            "user_id",
            (ts_us - F.col("last_view_us")).alias("lag_us"),
        )
        .orderBy("event_id")
    )


# ------------------------------------------- session depth / bounce rate ---
@query(
    "q269_session_depth_bounce",
    oracle="""
    WITH o AS (
        SELECT user_id, event_id,
               CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec,
               ts
        FROM events),
    f AS (
        SELECT user_id, ts,
               CASE WHEN LAG(sec) OVER w IS NULL OR sec - LAG(sec) OVER w > 1800
                    THEN 1 ELSE 0 END AS is_new
        FROM o WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (
        SELECT user_id,
               CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM f),
    per AS (
        SELECT user_id, session_id, COUNT(*) AS depth
        FROM s GROUP BY user_id, session_id)
    SELECT depth, COUNT(*) AS n_sessions,
           CAST(floor(COUNT(*) * 1000000.0
                      / SUM(COUNT(*)) OVER () + 0.5) AS BIGINT) AS share_q
    FROM per GROUP BY depth ORDER BY depth
    """,
)
def q269(spark: SparkSession, sf: str) -> DataFrame:
    """Session-depth distribution (and with it the bounce rate — the
    depth-1 row's share): q117's gaps-and-islands sessionization reduced
    to the product-analytics report every web team reads. Plan: the two
    session windows share ONE user_id shuffle, the per-session count is a
    hash aggregate, and the share window runs over the O(distinct depths)
    aggregate — never over events."""
    ev = load_table(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    sec = F.col("ts").cast("timestamp").cast("long")
    cum = W.partitionBy("user_id").orderBy("ts").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    sess = (
        ev.select("user_id", "ts", F.lag(sec).over(w).alias("prev_sec"), sec.alias("sec"))
        .select(
            "user_id",
            "ts",
            F.when(
                F.col("prev_sec").isNull()
                | (F.col("sec") - F.col("prev_sec") > 1800),
                1,
            )
            .otherwise(0)
            .alias("is_new"),
        )
        .select("user_id", F.sum("is_new").over(cum).alias("session_id"))
    )
    per = sess.groupBy("user_id", "session_id").agg(F.count(F.lit(1)).alias("depth"))
    dist = per.groupBy("depth").agg(F.count(F.lit(1)).alias("n_sessions"))
    share = F.floor(
        F.col("n_sessions") * 1000000.0 / F.sum("n_sessions").over(W.orderBy())
        + F.lit(0.5)
    ).cast("long")
    return dist.select("depth", "n_sessions", share.alias("share_q")).orderBy("depth")


# --------------------------------------- log2 inter-arrival histogram ------
@query(
    "q270_arrival_log2_histogram",
    oracle="""
    WITH seq AS (
        SELECT event_type,
               epoch_us(CAST(ts AS TIMESTAMP))
                 - LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        FROM events),
    b AS (
        SELECT event_type,
               CASE WHEN gap_us <= 0 THEN 0
                    ELSE length(bin(gap_us)) - 1 END AS log2_bucket
        FROM seq WHERE gap_us IS NOT NULL)
    SELECT event_type, log2_bucket, COUNT(*) AS n
    FROM b GROUP BY event_type, log2_bucket
    ORDER BY event_type, log2_bucket
    """,
)
def q270(spark: SparkSession, sf: str) -> DataFrame:
    """Inter-arrival-time histogram in power-of-two microsecond buckets —
    the latency/cadence distribution every ops dashboard draws. The
    bucket is floor(log2(gap)) computed EXACTLY as integer bit width
    (length of the binary representation − 1) on both engines — no libm
    log in the contract, the q258 trick one more time. One user_id
    shuffle for the lag, one hash aggregate over (type, bucket)."""
    ev = load_table(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = (us - F.lag(us).over(w)).alias("gap_us")
    b = (
        ev.select("event_type", gap)
        .where(F.col("gap_us").isNotNull())
        .select(
            "event_type",
            F.when(F.col("gap_us") <= 0, F.lit(0))
            .otherwise(F.length(F.bin(F.col("gap_us"))) - 1)
            .alias("log2_bucket"),
        )
    )
    return (
        b.groupBy("event_type", "log2_bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type", "log2_bucket")
    )


# ------------------------------------------------ linear interpolation -----
@query(
    "q272_linear_interpolation",
    oracle="""
    WITH o AS (
        SELECT user_id, event_id,
               epoch_us(CAST(ts AS TIMESTAMP)) AS t,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc,
               event_id % 7 = 0 AS missing
        FROM events
    ),
    nb AS (
        SELECT user_id, event_id, t, missing,
               last_value(CASE WHEN NOT missing THEN vc END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY t, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS v0,
               last_value(CASE WHEN NOT missing THEN t END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY t, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS t0,
               first_value(CASE WHEN NOT missing THEN vc END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY t, event_id
                         ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS v1,
               first_value(CASE WHEN NOT missing THEN t END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY t, event_id
                         ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS t1
        FROM o
    )
    SELECT user_id, event_id,
           CAST(floor((v0 + (v1 - v0) * ((t - t0) / (t1 - t0))) * 10000 + 0.5)
                AS BIGINT) AS interp_q
    FROM nb
    WHERE missing AND v0 IS NOT NULL AND v1 IS NOT NULL AND t1 > t0
    ORDER BY user_id, event_id
    """,
)
def q272(spark: SparkSession, sf: str) -> DataFrame:
    """True LINEAR interpolation of missing sensor readings (not LOCF —
    q173 carries the last value; this reconstructs the straight line
    between the surrounding readings, the standard gap repair for
    irregular telemetry). Readings at event_id % 7 == 0 are
    deterministically masked as missing; each gets
    v0 + (v1 − v0)·(t − t0)/(t1 − t0) from its nearest non-missing
    neighbors. Exactness: values quantize to integer cents and times to
    integer micros BEFORE the one pinned-order IEEE expression (bigint
    division → double fraction, one multiply, one add), quantized at
    1e-4 cents — both engines execute the identical float sequence.
    Boundary gaps (no neighbor on one side) drop — the honest contract.

    Plan: FOUR ignore-nulls windows over the SAME (user_id, t) partition
    order — one shuffle, one sort, all four frames ride it."""
    ev = load_table(spark, sf, "events")
    t = F.unix_micros(F.col("ts").cast("timestamp"))
    vc = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    missing = F.col("event_id") % 7 == 0
    o = ev.select(
        "user_id", "event_id", t.alias("t"), vc.alias("vc"),
        missing.alias("missing"),
    )
    w = W.partitionBy("user_id").orderBy("t", "event_id")
    back = w.rowsBetween(W.unboundedPreceding, -1)
    fwd = w.rowsBetween(1, W.unboundedFollowing)
    nm_v = F.when(~F.col("missing"), F.col("vc"))
    nm_t = F.when(~F.col("missing"), F.col("t"))
    nb = o.select(
        "user_id", "event_id", "t", "missing",
        F.last(nm_v, ignorenulls=True).over(back).alias("v0"),
        F.last(nm_t, ignorenulls=True).over(back).alias("t0"),
        F.first(nm_v, ignorenulls=True).over(fwd).alias("v1"),
        F.first(nm_t, ignorenulls=True).over(fwd).alias("t1"),
    )
    interp = F.col("v0") + (F.col("v1") - F.col("v0")) * (
        (F.col("t") - F.col("t0")) / (F.col("t1") - F.col("t0"))
    )
    return (
        nb.where(
            F.col("missing")
            & F.col("v0").isNotNull()
            & F.col("v1").isNotNull()
            & (F.col("t1") > F.col("t0"))
        )
        .select(
            "user_id",
            "event_id",
            F.floor(interp * 10000 + F.lit(0.5)).cast("long").alias("interp_q"),
        )
        .orderBy("user_id", "event_id")
    )


# ---------------------------------------------------- cohort LTV curve -----
@query(
    "q275_cohort_ltv_curve",
    oracle="""
    WITH first_seen AS (
        SELECT user_id,
               CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort
        FROM events GROUP BY user_id
    ),
    rev AS (
        SELECT f.cohort,
               CAST(date_diff('week',
                    CAST(f.cohort AS TIMESTAMP),
                    date_trunc('week', e.ts)) AS BIGINT) AS age_weeks,
               CAST(floor(e.value * 100 + 0.5) AS BIGINT) AS cents
        FROM events e JOIN first_seen f USING (user_id)
        WHERE e.event_type = 'purchase'
    ),
    cell AS (
        SELECT cohort, age_weeks, CAST(SUM(cents) AS BIGINT) AS rev_cents
        FROM rev GROUP BY cohort, age_weeks
    )
    SELECT cohort, age_weeks, rev_cents,
           CAST(SUM(rev_cents) OVER (PARTITION BY cohort ORDER BY age_weeks
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_rev_cents
    FROM cell ORDER BY cohort, age_weeks
    """,
)
def q275(spark: SparkSession, sf: str) -> DataFrame:
    """Cohort LTV curve: cumulative purchase revenue by signup-week
    cohort and week-age — the growth-analytics matrix behind every
    payback-period decision (q148's retention counts, upgraded to money).
    Plan: first-seen reduces events to user granularity BEFORE the join
    (the q175 reduce-before-join shape), revenue cells aggregate to
    O(cohorts × ages) rows, and the cumulative window runs per cohort
    over that bounded matrix. Money is exact integer cents throughout."""
    ev = load_table(spark, sf, "events")
    wk = lambda c: F.to_date(F.date_trunc("week", c))  # noqa: E731
    first_seen = ev.groupBy("user_id").agg(wk(F.min("ts")).alias("cohort"))
    rev = (
        ev.where(F.col("event_type") == "purchase")
        .join(first_seen, "user_id")
        .select(
            "cohort",
            F.floor(
                F.datediff(wk(F.col("ts")), F.col("cohort")) / 7
            ).cast("long").alias("age_weeks"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        )
    )
    cell = rev.groupBy("cohort", "age_weeks").agg(
        F.sum("cents").cast("long").alias("rev_cents")
    )
    cum = (
        W.partitionBy("cohort")
        .orderBy("age_weeks")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return cell.select(
        "cohort", "age_weeks", "rev_cents",
        F.sum("rev_cents").over(cum).cast("long").alias("cum_rev_cents"),
    ).orderBy("cohort", "age_weeks")


# ------------------------------------------------ CUSUM change point ----
@query(
    "q298_cusum_changepoint",
    oracle="""
    WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM orders GROUP BY day
    ),
    c AS (
        SELECT day, cents,
               CAST(SUM(cents) OVER (ORDER BY day
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS prefix,
               CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS t,
               CAST(SUM(cents) OVER () AS BIGINT) AS total,
               CAST(COUNT(*) OVER () AS BIGINT) AS n
        FROM daily
    )
    SELECT day, cents,
           n * prefix - t * total AS cusum_scaled,
           ABS(n * prefix - t * total) = MAX(ABS(n * prefix - t * total)) OVER ()
             AS is_changepoint
    FROM c ORDER BY day
    """,
)
def q298(spark: SparkSession, sf: str) -> DataFrame:
    """CUSUM change-point detection on the daily revenue series — the
    classic 'did the metric shift, and when' screen (deploy regressions,
    pipeline breaks, demand shifts): the cumulative sum of deviations
    from the series mean peaks at the most likely change point. Kept
    EXACT by clearing the denominator — CUSUM_t = Σ(x_i − total/n)
    is reported scaled by n as n·prefix_t − t·total, pure BIGINT, so no
    float mean ever enters and the argmax cannot move on a rounding ulp.
    The raw table reduces to O(days) rows in one hash aggregate FIRST;
    every window (prefix, total, max) then runs over that bounded series
    — the q175/q260 bounded-global-window argument. Magnitude check:
    n·prefix ≤ days²·daily_cents, far under int64 for decades of days."""
    o = load_table(spark, sf, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        ).alias("cents")
    )
    w_ord = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    w_all = W.orderBy()
    c = daily.select(
        "day",
        "cents",
        F.sum("cents").over(w_ord).alias("prefix"),
        F.row_number().over(W.orderBy("day")).cast("long").alias("t"),
        F.sum("cents").over(w_all).alias("total"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    scaled = F.col("n") * F.col("prefix") - F.col("t") * F.col("total")
    return c.select(
        "day",
        "cents",
        scaled.alias("cusum_scaled"),
        (F.abs(scaled) == F.max(F.abs(scaled)).over(w_all)).alias(
            "is_changepoint"
        ),
    ).orderBy("day")


# ------------------------------------------- point-in-time features ----
@query(
    "q301_point_in_time_features",
    oracle="""
    WITH rows_u AS (
        SELECT user_id, event_id, epoch_us(ts) // 1000000 AS sec,
               CASE event_type WHEN 'purchase' THEN 2 ELSE 1 END AS kind_rank,
               CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS is_view,
               CASE WHEN event_type = 'click'
                    THEN CAST(floor(value * 100 + 0.5) AS BIGINT) END AS click_cents
        FROM events WHERE event_type IN ('purchase', 'click', 'view')
    ),
    w AS (
        SELECT user_id, event_id, kind_rank,
               CAST(SUM(is_view) OVER (PARTITION BY user_id ORDER BY sec
                    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS n_views_1h,
               LAST_VALUE(click_cents IGNORE NULLS) OVER (
                    PARTITION BY user_id ORDER BY sec, kind_rank, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS last_click_cents
        FROM rows_u
    )
    SELECT user_id, event_id, n_views_1h, last_click_cents
    FROM w WHERE kind_rank = 2
    ORDER BY user_id, event_id
    """,
)
def q301(spark: SparkSession, sf: str) -> DataFrame:
    """Point-in-time feature enrichment — the feature-store correctness
    pattern: every training label (purchase) picks up (a) the user's most
    recent click amount at-or-before label time and (b) the view count in
    the trailing hour, with NO future leakage. Instead of one as-of join
    per feature (N shuffles, N skew surfaces), labels and feature events
    UNION into one per-user timeline and every feature is a window over
    it: the trailing count is a RANGE frame on epoch seconds, the
    last-value an IGNORE NULLS running fold with a (sec, kind, id) total
    order that puts same-instant feature rows BEFORE the label (inclusive
    at-label-time semantics, pinned deterministically). One user_id
    shuffle serves every feature — the shape that holds at 100 TB where
    per-feature as-of joins multiply. Same-second ties inside the RANGE
    frame are all included, so tie handling is order-free on both
    engines."""
    ev = load_table(spark, sf, "events").where(
        F.col("event_type").isin("purchase", "click", "view")
    )
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    sec = ((us - us % 1_000_000) / 1_000_000).cast("long")
    rows_u = ev.select(
        "user_id",
        "event_id",
        sec.alias("sec"),
        F.when(F.col("event_type") == "purchase", 2).otherwise(1).alias("kind_rank"),
        (F.col("event_type") == "view").cast("int").alias("is_view"),
        F.when(
            F.col("event_type") == "click",
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"),
        ).alias("click_cents"),
    )
    w_range = (
        W.partitionBy("user_id").orderBy("sec").rangeBetween(-3600, 0)
    )
    w_rows = (
        W.partitionBy("user_id")
        .orderBy("sec", "kind_rank", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    w = rows_u.select(
        "user_id",
        "event_id",
        "kind_rank",
        F.sum("is_view").over(w_range).cast("long").alias("n_views_1h"),
        F.last("click_cents", ignorenulls=True).over(w_rows).alias(
            "last_click_cents"
        ),
    )
    return (
        w.where(F.col("kind_rank") == 2)
        .select("user_id", "event_id", "n_views_1h", "last_click_cents")
        .orderBy("user_id", "event_id")
    )


# ------------------------------------------------------ SLO burn rate ----
SLO_PPM = 250_000  # alert when trailing error share exceeds 25% in BOTH windows


@query(
    "q306_slo_burn_rate",
    oracle=f"""
    WITH m AS (
        SELECT epoch_us(ts) // 60000000 AS minute,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(*) FILTER (event_type = 'error') AS BIGINT) AS n_err
        FROM events GROUP BY minute
    ),
    w AS (
        SELECT minute, n, n_err,
               CAST(SUM(n) OVER (ORDER BY minute
                    RANGE BETWEEN 59 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_1h,
               CAST(SUM(n_err) OVER (ORDER BY minute
                    RANGE BETWEEN 59 PRECEDING AND CURRENT ROW) AS BIGINT) AS e_1h,
               CAST(SUM(n) OVER (ORDER BY minute
                    RANGE BETWEEN 359 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_6h,
               CAST(SUM(n_err) OVER (ORDER BY minute
                    RANGE BETWEEN 359 PRECEDING AND CURRENT ROW) AS BIGINT) AS e_6h
        FROM m
    )
    SELECT minute, n, n_err,
           (e_1h * 1000000) // n_1h AS err_ppm_1h,
           (e_6h * 1000000) // n_6h AS err_ppm_6h,
           (e_1h * 1000000) // n_1h > {SLO_PPM}
               AND (e_6h * 1000000) // n_6h > {SLO_PPM} AS burn_alert
    FROM w ORDER BY minute
    """,
)
def q306(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-window SLO burn-rate alerting — the SRE error-budget
    pattern: alert only when the trailing error share breaches the
    threshold in BOTH a short (1 h) and a long (6 h) window, so spikes
    don't page but sustained burns do. The raw stream reduces to
    per-MINUTE (n, n_err) pairs in one hash aggregate FIRST — O(minutes)
    rows — and every trailing window is a RANGE frame over that bounded
    series (the q298 reduce-then-window argument; a year is ~526k
    minutes, still one executor's work). Ratios are scaled integer
    floor-divisions of exact counts. In production the same query runs
    incrementally: the per-minute aggregate is the persisted grain
    (q209/q263 mergeability), and the window pass re-reads only the
    trailing 6 h of it."""
    ev = load_table(spark, sf, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    minute = ((us - us % 60_000_000) / 60_000_000).cast("long")
    m = ev.groupBy(minute.alias("minute")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("event_type") == "error").cast("long")).alias("n_err"),
    )
    def trail(col, mins):
        return F.sum(col).over(
            W.orderBy("minute").rangeBetween(-(mins - 1), 0)
        )
    w = m.select(
        "minute", "n", "n_err",
        trail(F.col("n"), 60).alias("n_1h"),
        trail(F.col("n_err"), 60).alias("e_1h"),
        trail(F.col("n"), 360).alias("n_6h"),
        trail(F.col("n_err"), 360).alias("e_6h"),
    )

    def ppm(e, n):
        num = e * 1_000_000
        return ((num - num % n) / n).cast("long")

    p1, p6 = ppm(F.col("e_1h"), F.col("n_1h")), ppm(F.col("e_6h"), F.col("n_6h"))
    return w.select(
        "minute", "n", "n_err",
        p1.alias("err_ppm_1h"),
        p6.alias("err_ppm_6h"),
        ((p1 > SLO_PPM) & (p6 > SLO_PPM)).alias("burn_alert"),
    ).orderBy("minute")


# -------------------------------------------- sequence pattern matching ----
@query(
    "q311_sequence_pattern",
    oracle="""
    WITH l AS (
        SELECT user_id, upper(substr(event_type, 1, 1)) AS letter,
               ts, event_id
        FROM events
    ),
    s AS (
        SELECT user_id,
               string_agg(letter, '' ORDER BY ts, event_id) AS seq,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM l GROUP BY user_id
    )
    SELECT user_id, n_events,
           regexp_matches(seq, 'V[^E]*C[^E]*P') AS clean_funnel,
           regexp_matches(seq, 'EE') AS error_burst,
           regexp_matches(seq, '^S') AS signup_first
    FROM s ORDER BY user_id
    """,
)
def q311(spark: SparkSession, sf: str) -> DataFrame:
    """Event-sequence pattern matching — the MATCH_RECOGNIZE / CEP
    feature SQL engines bolt on and Spark lacks natively, re-expressed
    as regex over a per-key ORDERED event-letter string: does the user
    have a view→click→purchase chain untouched by errors, a
    back-to-back error burst, a signup-first lifecycle. One groupBy
    collapses each user's history into a compact string (one char per
    event — a year of heavy use is a few KB), then every pattern is a
    row-local regex — adding patterns costs zero extra shuffles, versus
    one self-join per step in the join-based funnel encoding (q147).
    Ordering inside the aggregate is pinned by (ts, event_id) on both
    engines. The regexes stay in the POSIX-common subset (character
    classes, anchors, star) where Java and RE2 semantics agree —
    backrefs/lookarounds are banned in the oracle contract."""
    ev = load_table(spark, sf, "events")
    l = ev.select(
        "user_id",
        F.upper(F.substring("event_type", 1, 1)).alias("letter"),
        "ts",
        "event_id",
    )
    seq = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("ts", "event_id", "letter"))),
            lambda x: x["letter"],
        ),
        "",
    )
    s = l.groupBy("user_id").agg(
        seq.alias("seq"), F.count(F.lit(1)).alias("n_events")
    )
    return s.select(
        "user_id",
        "n_events",
        F.col("seq").rlike("V[^E]*C[^E]*P").alias("clean_funnel"),
        F.col("seq").rlike("EE").alias("error_burst"),
        F.col("seq").rlike("^S").alias("signup_first"),
    ).orderBy("user_id")


# ---------------------------------------- multi-touch attribution ----
@query(
    "q312_position_attribution",
    oracle="""
    WITH e AS (
        SELECT user_id, event_id, ts, event_type,
               CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 END)
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS journey
        FROM events WHERE event_type IN ('view', 'click', 'purchase')
    ),
    conv AS (
        SELECT user_id, journey, event_id AS conversion_event_id
        FROM e WHERE event_type = 'purchase'
    ),
    t AS (
        SELECT user_id, journey, event_id AS touch_event_id,
               CAST(ROW_NUMBER() OVER (PARTITION BY user_id, journey
                    ORDER BY ts, event_id) AS BIGINT) AS pos,
               CAST(COUNT(*) OVER (PARTITION BY user_id, journey) AS BIGINT) AS k
        FROM e WHERE event_type IN ('view', 'click')
    )
    SELECT t.user_id, conversion_event_id, touch_event_id, pos, k,
           CASE
             WHEN k = 1 THEN 1000000
             WHEN k = 2 THEN 500000
             WHEN pos = 1 OR pos = k THEN 400000
             ELSE 200000 // (k - 2)
                  + CASE WHEN pos - 1 <= 200000 % (k - 2) THEN 1 ELSE 0 END
           END AS weight_ppm
    FROM t JOIN conv ON conv.user_id = t.user_id AND conv.journey = t.journey
    ORDER BY t.user_id, conversion_event_id, pos
    """,
)
def q312(spark: SparkSession, sf: str) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution — q265's
    last-touch upgraded to the model marketers actually run: within each
    conversion journey (the touches since the user's previous purchase),
    first and last touch earn 40% each and the middles share 20%. The
    weights are EXACT integer ppm via largest-remainder apportionment
    (floor share + the first ``200000 mod (k−2)`` middles get +1), so
    every journey's weights sum to exactly 1,000,000 — no float drift
    across millions of journeys, and revenue×weight stays pure integer
    arithmetic downstream. Journey assignment is one cumulative-count
    window (purchases strictly before the row); position and size are
    journey-partitioned windows; the conversion attach is a keyed join.
    Touches after the final purchase drop out via the join (open
    journeys — attributable when their conversion arrives, the
    incremental story). One user shuffle end-to-end."""
    ev = load_table(spark, sf, "events").where(
        F.col("event_type").isin("view", "click", "purchase")
    )
    w_prev = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    e = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.coalesce(
            F.sum((F.col("event_type") == "purchase").cast("long")).over(w_prev),
            F.lit(0),
        ).alias("journey"),
    )
    conv = e.where(F.col("event_type") == "purchase").select(
        "user_id", "journey", F.col("event_id").alias("conversion_event_id")
    )
    w_j = W.partitionBy("user_id", "journey")
    t = e.where(F.col("event_type").isin("view", "click")).select(
        "user_id",
        "journey",
        F.col("event_id").alias("touch_event_id"),
        F.row_number().over(w_j.orderBy("ts", "event_id")).cast("long").alias("pos"),
        F.count(F.lit(1)).over(w_j).alias("k"),
    )
    k, pos = F.col("k"), F.col("pos")
    mid_n = k - 2
    mid_base = ((F.lit(200_000) - F.lit(200_000) % mid_n) / mid_n).cast("long")
    mid_rem = F.lit(200_000) % mid_n
    weight = (
        F.when(k == 1, 1_000_000)
        .when(k == 2, 500_000)
        .when((pos == 1) | (pos == k), 400_000)
        .otherwise(mid_base + F.when(pos - 1 <= mid_rem, 1).otherwise(0))
    )
    return (
        t.join(conv, ["user_id", "journey"])
        .select(
            "user_id",
            "conversion_event_id",
            "touch_event_id",
            "pos",
            "k",
            weight.cast("long").alias("weight_ppm"),
        )
        .orderBy("user_id", "conversion_event_id", "pos")
    )


# ------------------------------------------------ trailing leaderboard ----
LB_WINDOW_D = 7
LB_K = 3


@query(
    "q320_trailing_leaderboard",
    oracle=f"""
    WITH daily AS (
        SELECT l_partkey, CAST(l_shipdate AS DATE) AS day,
               CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents
        FROM lineitem GROUP BY l_partkey, day
    ),
    contrib AS (
        SELECT l_partkey, day + CAST(off AS INTEGER) AS lb_day, cents
        FROM daily, unnest(range({LB_WINDOW_D})) t(off)
    ),
    bounds AS (SELECT MAX(CAST(l_shipdate AS DATE)) AS max_day FROM lineitem),
    scored AS (
        SELECT lb_day, l_partkey, CAST(SUM(cents) AS BIGINT) AS trail_cents
        FROM contrib, bounds WHERE lb_day <= max_day
        GROUP BY lb_day, l_partkey
    ),
    ranked AS (
        SELECT lb_day, l_partkey, trail_cents,
               ROW_NUMBER() OVER (PARTITION BY lb_day
                                  ORDER BY trail_cents DESC, l_partkey) AS rk
        FROM scored
    )
    SELECT lb_day, rk, l_partkey, trail_cents
    FROM ranked WHERE rk <= {LB_K}
    ORDER BY lb_day, rk
    """,
)
def q320(spark: SparkSession, sf: str) -> DataFrame:
    """Daily top-{k} leaderboard over a trailing {w}-day revenue window —
    the trending-products board, computed WITHOUT densifying the
    (day × part) matrix and WITHOUT per-part gap-aware frames: each
    day's (part, revenue) row EXPLODES into the {w} future leaderboard
    days it influences, and one hash aggregate keyed on (leaderboard
    day, part) rebuilds every trailing sum — a part with sales 3 days
    ago ranks today even though it has no row today, the case sparse
    window frames silently drop. Fan-out is a fixed ×{w} on the DAILY
    aggregate (already corpus-reduced), the ranking window partitions
    by day, and exact integer cents carry the ordering. This
    contribute-to-future-windows explode is the general sliding-window-
    aggregate shape when windows are short and data is sparse; long
    windows flip to prefix-sum differences (q298's machinery)."""
    li = load_table(spark, sf, "lineitem")
    daily = li.groupBy(
        "l_partkey", F.to_date("l_shipdate").alias("day")
    ).agg(
        F.sum(
            F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
        ).alias("cents")
    )
    bounds = li.agg(F.max(F.to_date("l_shipdate")).alias("max_day"))
    contrib = daily.select(
        "l_partkey",
        "cents",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(LB_WINDOW_D - 1)),
                lambda off: F.date_add(F.col("day"), off),
            )
        ).alias("lb_day"),
    )
    scored = (
        contrib.crossJoin(F.broadcast(bounds))
        .where(F.col("lb_day") <= F.col("max_day"))
        .groupBy("lb_day", "l_partkey")
        .agg(F.sum("cents").alias("trail_cents"))
    )
    rk = F.row_number().over(
        W.partitionBy("lb_day").orderBy(
            F.col("trail_cents").desc(), "l_partkey"
        )
    )
    return (
        scored.select("lb_day", rk.alias("rk"), "l_partkey", "trail_cents")
        .where(F.col("rk") <= LB_K)
        .orderBy("lb_day", "rk")
    )


q320.__doc__ = q320.__doc__.format(k=LB_K, w=LB_WINDOW_D)


# --------------------------------------- run-length encoding of streams ---
@query(
    "q368_event_runs_rle",
    oracle="""
    WITH s AS (
        SELECT user_id, event_type, event_id,
               LAG(event_type) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) AS prev
        FROM events
    ),
    f AS (
        SELECT user_id, event_type, event_id,
               CASE WHEN prev IS NULL OR prev <> event_type
                    THEN 1 ELSE 0 END AS brk
        FROM s
    ),
    r AS (
        SELECT user_id, event_type, event_id,
               SUM(brk) OVER (PARTITION BY user_id
                    ORDER BY event_id ROWS UNBOUNDED PRECEDING) AS run_id
        FROM f
    ),
    runs AS (
        SELECT user_id, run_id, MIN(event_type) AS event_type,
               CAST(COUNT(*) AS BIGINT) AS run_len
        FROM r GROUP BY user_id, run_id
    ),
    top AS (
        SELECT user_id, event_type, run_len,
               ROW_NUMBER() OVER (PARTITION BY user_id
                    ORDER BY run_len DESC, event_type) AS rn
        FROM runs
    ),
    agg AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_runs,
               CAST(SUM(run_len) AS BIGINT) AS n_events
        FROM runs GROUP BY user_id
    )
    SELECT a.user_id, a.n_runs, a.n_events,
           t.run_len AS longest_run, t.event_type AS longest_run_type,
           CAST(a.n_runs * 1000000 // a.n_events AS BIGINT)
               AS compression_ppm
    FROM agg a JOIN top t ON a.user_id = t.user_id AND t.rn = 1
    ORDER BY a.user_id
    """,
)
def q368(spark: SparkSession, sf: str) -> DataFrame:
    """Run-length encoding of per-user event streams: consecutive
    same-type events collapse to (type, length) runs — the islands
    construction with a VALUE-CHANGE boundary where q117/q354 break on
    time gaps (the docstring names those cousins deliberately; the
    boundary predicate is the only difference in the plan). Per user
    the report carries the run count, the longest run (ties broken to
    the alphabetically first type via rank, no composite arg-max),
    and the RLE compression ratio in exact ppm — the statistic that
    decides whether a repetitive telemetry stream is worth
    run-encoding at the storage layer.

    Ordering contract: runs break on (ts, event_id) order but the
    running boundary-sum rides event_id alone — valid because
    event_id is a total order consistent with ts in this dataset, and
    the oracle pins the same contract. Scale: two partitioned windows
    (lag, running sum) + two hash aggregates, all on the user key —
    one shuffle, mergeable partials, nothing global."""
    ev = load_table(spark, sf, "events")
    wl = W.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "user_id",
        "event_type",
        "event_id",
        F.lag("event_type").over(wl).alias("prev"),
    )
    f = s.select(
        "user_id",
        "event_type",
        "event_id",
        F.when(
            F.col("prev").isNull() | (F.col("prev") != F.col("event_type")), 1
        )
        .otherwise(0)
        .alias("brk"),
    )
    wr = (
        W.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    r = f.select(
        "user_id", "event_type", "event_id", F.sum("brk").over(wr).alias("run_id")
    )
    runs = r.groupBy("user_id", "run_id").agg(
        F.min("event_type").alias("event_type"),
        F.count(F.lit(1)).cast("long").alias("run_len"),
    )
    wt = W.partitionBy("user_id").orderBy(F.desc("run_len"), "event_type")
    top = runs.select(
        "user_id", "event_type", "run_len", F.row_number().over(wt).alias("rn")
    ).where(F.col("rn") == 1)
    agg = runs.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_runs"),
        F.sum("run_len").cast("long").alias("n_events"),
    )
    return (
        agg.join(top, "user_id")
        .select(
            "user_id",
            "n_runs",
            "n_events",
            F.col("run_len").alias("longest_run"),
            F.col("event_type").alias("longest_run_type"),
            F.expr("CAST(n_runs * 1000000 div n_events AS BIGINT)").alias(
                "compression_ppm"
            ),
        )
        .orderBy("user_id")
    )


# ---------------------------------------- peak concurrent sessions -------
CONCURRENCY_GAP_US = 30 * 60 * 1_000_000


@query(
    "q373_peak_concurrency",
    oracle=f"""
    WITH e AS (
        SELECT user_id, epoch_us(ts) AS t
        FROM events
    ),
    s AS (
        SELECT user_id, t,
               CASE WHEN t - LAG(t) OVER (PARTITION BY user_id ORDER BY t)
                         > {CONCURRENCY_GAP_US}
                         OR LAG(t) OVER (PARTITION BY user_id ORDER BY t)
                            IS NULL
                    THEN 1 ELSE 0 END AS brk
        FROM e
    ),
    g AS (
        SELECT user_id, t,
               SUM(brk) OVER (PARTITION BY user_id ORDER BY t
                    ROWS UNBOUNDED PRECEDING) AS sid
        FROM s
    ),
    sess AS (
        SELECT user_id, sid, MIN(t) AS st, MAX(t) + 1 AS en
        FROM g GROUP BY user_id, sid
    ),
    bounds AS (
        SELECT user_id, sid, st AS t, 1 AS delta FROM sess
        UNION ALL
        SELECT user_id, sid, en AS t, -1 AS delta FROM sess
    ),
    run AS (
        SELECT t, delta,
               CAST(SUM(delta) OVER (ORDER BY t, delta, user_id, sid
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS active
        FROM bounds
    ),
    byday AS (
        SELECT t // 86400000000 AS day, t, delta, active,
               ROW_NUMBER() OVER (PARTITION BY t // 86400000000
                    ORDER BY active DESC, t) AS rn
        FROM run
    )
    SELECT day,
           CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_starts,
           CAST(MAX(active) AS BIGINT) AS peak_active,
           CAST(MIN(CASE WHEN rn = 1 THEN t END) AS BIGINT) AS peak_at_us
    FROM byday GROUP BY day ORDER BY day
    """,
)
def q373(spark: SparkSession, sf: str) -> DataFrame:
    """Peak concurrent sessions per day — the capacity-planning number
    (max simultaneously-active sessions and the microsecond it was
    hit), computed by the classic +1/−1 boundary sweep: 30-minute-gap
    sessions (q117's islands, cited) emit a +1 at start and a −1 just
    after end, and concurrency is the RUNNING SUM over the global
    time-ordered boundary stream. q153 merges intervals to measure
    COVERED time and q276 joins overlapping intervals pairwise;
    neither answers "how many at once?", which is what capacity
    planning asks.

    The boundary stream is data-scale (2 rows per session), so the
    global running sum rides `refops.distributed_cumsum` — one range
    exchange, per-partition windows, literal-map offsets — never a
    partitionless window (the oracle's global window is exactly the
    plan this replaces). Ordering pins (t, delta, user, sid) so an
    end at the same microsecond as a start decrements FIRST —
    touching intervals don't double-count. Daily peaks + first
    peak-time are a per-day rank over the bounded per-day boundary
    rows."""
    from ..functions.refops import distributed_cumsum

    ev = load_table(spark, sf, "events")
    e = ev.select(
        "user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("t")
    )
    wu = W.partitionBy("user_id").orderBy("t")
    s = e.select(
        "user_id",
        "t",
        F.when(
            F.lag("t").over(wu).isNull()
            | ((F.col("t") - F.lag("t").over(wu)) > CONCURRENCY_GAP_US),
            1,
        )
        .otherwise(0)
        .alias("brk"),
    )
    wr = W.partitionBy("user_id").orderBy("t").rowsBetween(
        W.unboundedPreceding, 0
    )
    g = s.select("user_id", "t", F.sum("brk").over(wr).alias("sid"))
    sess = g.groupBy("user_id", "sid").agg(
        F.min("t").alias("st"), (F.max("t") + 1).alias("en")
    )
    bounds = sess.select(
        "user_id", "sid", F.col("st").alias("t"), F.lit(1).alias("delta")
    ).unionByName(
        sess.select(
            "user_id", "sid", F.col("en").alias("t"), F.lit(-1).alias("delta")
        )
    )
    run = distributed_cumsum(
        bounds, ["t", "delta", "user_id", "sid"], "delta", name="active"
    )
    byday = run.select(
        F.expr("t div 86400000000").alias("day"), "t", "delta", "active"
    )
    wd = W.partitionBy("day").orderBy(F.desc("active"), "t")
    ranked = byday.select(
        "day", "t", "delta", "active", F.row_number().over(wd).alias("rn")
    )
    return (
        ranked.groupBy("day")
        .agg(
            F.sum((F.col("delta") == 1).cast("int")).cast("long").alias("n_starts"),
            F.max("active").cast("long").alias("peak_active"),
            F.min(F.when(F.col("rn") == 1, F.col("t"))).cast("long").alias("peak_at_us"),
        )
        .orderBy("day")
    )
