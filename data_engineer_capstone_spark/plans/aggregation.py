"""Aggregation surface (SURVEY.md §2.9 Q30-Q36): hash aggregation with
map-side partials, HAVING, rollup/cube/grouping sets, distinct aggregates,
min/max over strings and dates.

Scale notes: every groupBy here compiles to partial + final HashAggregate —
the map-side combine keeps the shuffle proportional to group count, not row
count. Money aggregates use exact decimal sums (_util) so results are
independent of partition merge order — mandatory for a 1000-executor run to
match a single-node oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..materialize import materialize
from ..catalog import load_table
from ._util import literal_frame, money_avg, money_sum, round_det, sql_money_avg, sql_money_sum
from .registry import query


@query(
    "q30_tpch_q1_agg",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_money_sum('l_quantity', 'sum_qty')},
           {sql_money_sum('l_extendedprice', 'sum_base_price')},
           {sql_money_sum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
           {sql_money_sum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
           {sql_money_avg('l_quantity', 'avg_qty')},
           {sql_money_avg('l_extendedprice', 'avg_price')},
           COUNT(*) AS count_order,
           COUNT(DISTINCT l_orderkey) AS distinct_orders
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-06-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q30(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1-shape pricing summary: the flagship aggregation query.

    Filter sits on the scan (parquet row-group pushdown on l_shipdate).
    The distinct count is computed as its own narrow dedup + count and
    joined back, NOT as ``countDistinct`` inside the main agg: Spark plans
    a single distinct-agg by keying the first partial aggregate on
    (group keys, distinct key), which shuffles every partial sum keyed by
    l_orderkey — a shuffle proportional to the DATA size (measured 80 MiB
    at sf0.1, larger than the table). Split, the main agg shuffles ~group
    count rows and the dedup shuffles only 3 narrow columns; the final
    join is 6×6 rows (AQE broadcasts it). That is the shape that survives
    100 TB.
    """
    li = load_table(spark, sf, "lineitem")
    lif = li.filter(
        F.col("l_shipdate") <= F.lit("2001-06-01").cast("timestamp_ntz")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    main = lif.groupBy("l_returnflag", "l_linestatus").agg(
        money_sum(F.col("l_quantity"), "sum_qty"),
        money_sum(F.col("l_extendedprice"), "sum_base_price"),
        money_sum(disc_price, "sum_disc_price"),
        money_sum(charge, "sum_charge"),
        money_avg(F.col("l_quantity"), "avg_qty"),
        money_avg(F.col("l_extendedprice"), "avg_price"),
        F.count(F.lit(1)).alias("count_order"),
    )
    distinct = (
        lif.select("l_returnflag", "l_linestatus", "l_orderkey")
        .dropDuplicates()
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count("l_orderkey").alias("distinct_orders"))
    )
    return main.join(distinct, ["l_returnflag", "l_linestatus"]).orderBy(
        "l_returnflag", "l_linestatus"
    )


@query(
    "q31_having",
    oracle=f"""
    SELECT c_nationkey, COUNT(*) AS n_cust,
           {sql_money_avg('c_acctbal', 'avg_bal')}
    FROM customer
    GROUP BY c_nationkey
    HAVING COUNT(*) >= 40
    ORDER BY c_nationkey
    """,
)
def q31(spark: SparkSession, sf: str) -> DataFrame:
    """HAVING: filter on an aggregate after grouping."""
    c = load_table(spark, sf, "customer")
    return (
        c.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            money_avg(F.col("c_acctbal"), "avg_bal"),
        )
        .filter(F.col("n_cust") >= 40)
        .orderBy("c_nationkey")
    )


@query(
    "q32_rollup",
    oracle=f"""
    SELECT n_regionkey, n_nationkey,
           GROUPING(n_regionkey) * 2 + GROUPING(n_nationkey) AS grp,
           COUNT(*) AS n_cust,
           {sql_money_sum('c_acctbal', 'sum_bal')}
    FROM customer JOIN nation ON n_nationkey = c_nationkey
    GROUP BY ROLLUP(n_regionkey, n_nationkey)
    ORDER BY grp, n_regionkey NULLS LAST, n_nationkey NULLS LAST
    """,
)
def q32(spark: SparkSession, sf: str) -> DataFrame:
    """GROUP BY ROLLUP with GROUPING() disambiguation."""
    c = load_table(spark, sf, "customer")
    n = load_table(spark, sf, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .rollup("n_regionkey", "n_nationkey")
        .agg(
            F.grouping_id().alias("grp"),
            F.count(F.lit(1)).alias("n_cust"),
            money_sum(F.col("c_acctbal"), "sum_bal"),
        )
        .select("n_regionkey", "n_nationkey", "grp", "n_cust", "sum_bal")
        .orderBy(
            "grp",
            F.col("n_regionkey").asc_nulls_last(),
            F.col("n_nationkey").asc_nulls_last(),
        )
    )


@query(
    "q33_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS grp,
           COUNT(*) AS n,
           {sql_money_sum('l_quantity', 'sum_qty')}
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    ORDER BY grp, l_returnflag NULLS LAST, l_linestatus NULLS LAST
    """,
)
def q33(spark: SparkSession, sf: str) -> DataFrame:
    """GROUP BY CUBE over the lineitem status flags."""
    li = load_table(spark, sf, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("grp"),
            F.count(F.lit(1)).alias("n"),
            money_sum(F.col("l_quantity"), "sum_qty"),
        )
        .select("l_returnflag", "l_linestatus", "grp", "n", "sum_qty")
        .orderBy(
            "grp",
            F.col("l_returnflag").asc_nulls_last(),
            F.col("l_linestatus").asc_nulls_last(),
        )
    )


@query(
    "q34_grouping_sets",
    oracle=f"""
    SELECT c_mktsegment, c_nationkey,
           GROUPING(c_mktsegment) * 2 + GROUPING(c_nationkey) AS grp,
           COUNT(*) AS n,
           {sql_money_sum('c_acctbal', 'sum_bal')}
    FROM customer
    GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
    ORDER BY grp, c_mktsegment NULLS LAST, c_nationkey NULLS LAST
    """,
)
def q34(spark: SparkSession, sf: str) -> DataFrame:
    """GROUPING SETS via the SQL surface (registered temp view)."""
    load_table(spark, sf, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_mktsegment, c_nationkey,
               GROUPING(c_mktsegment) * 2 + GROUPING(c_nationkey) AS grp,
               COUNT(*) AS n,
               ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_bal
        FROM customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
        ORDER BY grp, c_mktsegment NULLS LAST, c_nationkey NULLS LAST
        """
    )


@query(
    "q35_distinct_count_per_group",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_custs,
           COUNT(DISTINCT o_orderpriority) AS n_prios
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def q35(spark: SparkSession, sf: str) -> DataFrame:
    """Multiple distinct aggregates per group (expand + two-phase agg)."""
    o = load_table(spark, sf, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_custs"),
            F.countDistinct("o_orderpriority").alias("n_prios"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "q36_minmax_strings_dates",
    oracle="""
    SELECT c_mktsegment,
           MIN(c_name) AS min_name, MAX(c_name) AS max_name,
           MIN(o_orderdate) AS min_date, MAX(o_orderdate) AS max_date
    FROM customer JOIN orders ON o_custkey = c_custkey
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def q36(spark: SparkSession, sf: str) -> DataFrame:
    """min/max over strings and dates (binary-comparable orderings)."""
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.min("c_name").alias("min_name"),
            F.max("c_name").alias("max_name"),
            F.min("o_orderdate").alias("min_date"),
            F.max("o_orderdate").alias("max_date"),
        )
        .orderBy("c_mktsegment")
    )


@query("q107_approx_sketches")  # approximate by design: rows-only; error
# bounds asserted against exact values in tests/test_operators.py
def q107(spark: SparkSession, sf: str) -> DataFrame:
    """Sketch aggregates — the 100 TB substitutes for their exact forms:
    HyperLogLog++ distinct counts (constant memory vs a full distinct
    shuffle) and GK approximate percentiles (one pass, no global sort).
    Deliberately NOT oracle-checked: sketch internals differ across
    engines; correctness is an error-bound property, tested in pytest."""
    li = load_table(spark, sf, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
            F.percentile_approx("l_extendedprice", [0.5, 0.95], 10000).alias(
                "price_p50_p95"
            ),
            F.count(F.lit(1)).alias("n"),
        )
        # Scalar projections, not the raw array: the driver canonicalizer
        # sorts result frames pandas-side and chokes on unhashable lists, so
        # every registered query must emit flat top-level columns.
        .select(
            "l_returnflag",
            "approx_orders",
            F.element_at("price_p50_p95", 1).alias("price_p50"),
            F.element_at("price_p50_p95", 2).alias("price_p95"),
            "n",
        )
        .orderBy("l_returnflag")
    )


@query(
    "q119_corr_cov",
    oracle="""
    WITH t AS (
        SELECT l_returnflag,
               -- (19,4): forces DuckDB's int128 decimal kernels; the VALUES
               -- are identical to the Spark side's DECIMAL(12,4), which is
               -- all the hash compare needs
               CAST(floor((l_quantity) * 10000 + 0.5) / 10000 AS DECIMAL(19,4)) AS x,
               CAST(floor((l_extendedprice) * 10000 + 0.5) / 10000 AS DECIMAL(19,4)) AS y
        FROM lineitem),
    g AS (
        SELECT l_returnflag, COUNT(*) AS n_rows,
               SUM(x) AS sx, SUM(y) AS sy,
               SUM(x*x) AS sxx, SUM(y*y) AS syy, SUM(x*y) AS sxy
        FROM t GROUP BY l_returnflag)
    SELECT l_returnflag, n_rows,
           floor(((CAST(n_rows AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  / sqrt((CAST(n_rows AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                         * (CAST(n_rows AS DOUBLE) * CAST(syy AS DOUBLE)
                            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))
                 * 1000000 + 0.5) / 1000000 AS corr_qty_price,
           floor(((CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n_rows AS DOUBLE))
                  / (CAST(n_rows AS DOUBLE) - 1))
                 * 100 + 0.5) / 100 AS covar_qty_price
    FROM g ORDER BY l_returnflag
    """,
)
def q119(spark: SparkSession, sf: str) -> DataFrame:
    """Pearson correlation + sample covariance per return flag, computed
    from EXACT decimal moment sums (n, Σx, Σy, Σx², Σy², Σxy).

    ``F.corr``/``F.covar_samp`` accumulate doubles in partition order —
    nondeterministic across engines AND across runs at scale. Moment sums
    over DECIMAL are associative/exact, keep map-side partial aggregation,
    and the final scalar formula is evaluated in one deterministic float
    order on both engines. Same single-shuffle plan as a plain groupBy.
    """
    li = load_table(spark, sf, "lineitem")

    # DECIMAL(12,4): wide enough to hold the floor-trick-rounded inputs
    # exactly, narrow enough that x*y stays in both engines' decimal
    # multiply range (DuckDB overflows (18,4)×(18,4)).
    def dec12(c):
        return (F.floor(c * 10000 + F.lit(0.5)) / 10000).cast("decimal(12,4)")

    x, y = dec12(F.col("l_quantity")), dec12(F.col("l_extendedprice"))
    g = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    nd = F.col("n_rows").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxxd, syyd, sxyd = (
        F.col("sxx").cast("double"),
        F.col("syy").cast("double"),
        F.col("sxy").cast("double"),
    )
    corr = (nd * sxyd - sxd * syd) / F.sqrt(
        (nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd)
    )
    covar = (sxyd - sxd * syd / nd) / (nd - F.lit(1).cast("double"))
    return g.select(
        "l_returnflag",
        "n_rows",
        round_det(corr, 6).alias("corr_qty_price"),
        round_det(covar, 2).alias("covar_qty_price"),
    ).orderBy("l_returnflag")


@query(
    "q125_histogram",
    oracle="""
    SELECT event_type,
           LEAST(CAST(floor(value / 25) AS BIGINT), 15) AS bucket,
           COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(floor(value * 10000 + 0.5) / 10000
                AS DECIMAL(18,4))), 2) AS DOUBLE) AS bucket_sum
    FROM events
    GROUP BY event_type, bucket
    ORDER BY event_type, bucket
    """,
)
def q125(spark: SparkSession, sf: str) -> DataFrame:
    """Fixed-width histogram of event values per type (25-wide buckets,
    top-capped): the binning expression is plain floor-division (identical
    IEEE ops in any engine — DuckDB lacks width_bucket), so the histogram
    is a single partial+final hash aggregate on (type, bucket) — a
    constant-cardinality shuffle regardless of input size. This is the
    scale pattern for any distribution profile: never sort, never window;
    quantize and count."""
    ev = load_table(spark, sf, "events")
    bucket = F.least(F.floor(F.col("value") / 25).cast("long"), F.lit(15).cast("long"))
    return (
        ev.groupBy("event_type", bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            money_sum(F.col("value"), "bucket_sum"),
        )
        .orderBy("event_type", "bucket")
    )


@query(
    "q127_argmax_per_group",
    oracle="""
    SELECT c_nationkey, c_custkey AS top_custkey, c_acctbal AS top_acctbal
    FROM (
        SELECT c_nationkey, c_custkey, c_acctbal,
               ROW_NUMBER() OVER (PARTITION BY c_nationkey
                    ORDER BY c_acctbal DESC, c_custkey) AS rn
        FROM customer)
    WHERE rn = 1 ORDER BY c_nationkey
    """,
)
def q127(spark: SparkSession, sf: str) -> DataFrame:
    """Top-1 per group WITHOUT a window: ``max_by`` ordered by a struct
    (balance DESC, custkey ASC via negation) — a single partial+final hash
    aggregate. The window formulation (the oracle uses it) sorts every
    group's full row set; the agg formulation carries ONE candidate row
    per (map task, group) through the shuffle — the right plan when you
    want only the argmax of 100 TB. Ties break deterministically on the
    lower custkey."""
    cust = load_table(spark, sf, "customer")
    best = F.max_by(
        F.struct(F.col("c_custkey"), F.col("c_acctbal")),
        F.struct(F.col("c_acctbal"), (-F.col("c_custkey")).alias("nk")),
    )
    return (
        cust.groupBy("c_nationkey")
        .agg(best.alias("best"))
        .select(
            "c_nationkey",
            F.col("best.c_custkey").alias("top_custkey"),
            F.col("best.c_acctbal").alias("top_acctbal"),
        )
        .orderBy("c_nationkey")
    )


@query(
    "q130_mode_per_group",
    oracle="""
    SELECT c_nationkey, c_mktsegment AS mode_seg, cnt AS mode_cnt FROM (
        SELECT c_nationkey, c_mktsegment, cnt,
               ROW_NUMBER() OVER (PARTITION BY c_nationkey
                    ORDER BY cnt DESC, c_mktsegment) AS rn
        FROM (SELECT c_nationkey, c_mktsegment, COUNT(*) AS cnt
              FROM customer GROUP BY c_nationkey, c_mktsegment))
    WHERE rn = 1 ORDER BY c_nationkey
    """,
)
def q130(spark: SparkSession, sf: str) -> DataFrame:
    """Per-group mode (most frequent value) with deterministic tie-break
    (smallest segment string among the max-count ties).

    Two hash aggregates, zero windows: count per (group, value), then
    ``min_by`` ordered by (-count, value) — lexicographic struct order
    gives count DESC then value ASC. The oracle's window formulation
    sorts every group; the agg formulation shuffles only the distinct
    (nation, segment) pairs (bounded: 25×5) then reduces — at 100 TB the
    second shuffle's cardinality is |groups|·|distinct values|, not
    |rows|."""
    c = load_table(spark, sf, "customer")
    counts = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    best = F.min_by(
        F.struct(F.col("c_mktsegment"), F.col("cnt")),
        F.struct((-F.col("cnt")).alias("neg"), F.col("c_mktsegment")),
    )
    return (
        counts.groupBy("c_nationkey")
        .agg(best.alias("best"))
        .select(
            "c_nationkey",
            F.col("best.c_mktsegment").alias("mode_seg"),
            F.col("best.cnt").alias("mode_cnt"),
        )
        .orderBy("c_nationkey")
    )


@query(
    "q137_exact_percentiles",
    oracle="""
    SELECT c_mktsegment,
           floor(quantile_cont(c_acctbal, 0.25) * 1e4 + 0.5) / 1e4 AS p25,
           floor(quantile_cont(c_acctbal, 0.50) * 1e4 + 0.5) / 1e4 AS p50,
           floor(quantile_cont(c_acctbal, 0.75) * 1e4 + 0.5) / 1e4 AS p75
    FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def q137(spark: SparkSession, sf: str) -> DataFrame:
    """Exact linear-interpolated percentiles (p25/p50/p75) per segment.

    Both engines use the SQL-standard ``(n-1)*p`` linear interpolation;
    the floor-trick rounds to 4 digits to absorb the 1-ulp difference
    between their interpolation formulas. Scale note: EXACT percentiles
    materialize every group's values in the aggregation buffer — fine for
    5 segments, wrong for high-cardinality groups at 100 TB, where the
    scale path is ``approx_percentile`` (KLL/GK sketch, mergeable
    partials — error-bound-tested in q107). This query exists because
    "exact median" is a real operator users reach for."""
    c = load_table(spark, sf, "customer")
    cols = [
        round_det(F.percentile(F.col("c_acctbal"), p), 4).alias(a)
        for p, a in [(0.25, "p25"), (0.50, "p50"), (0.75, "p75")]
    ]
    return c.groupBy("c_mktsegment").agg(*cols).orderBy("c_mktsegment")


@query(
    "q141_share_of_total",
    oracle=f"""
    WITH per_nation AS (
        SELECT s_nationkey, {sql_money_sum("l_extendedprice * (1 - l_discount)", "value")}
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        GROUP BY s_nationkey),
    total AS (
        SELECT {sql_money_sum("l_extendedprice * (1 - l_discount)", "tot")}
        FROM lineitem)
    SELECT s_nationkey, value,
           floor(value / tot * 1e6 + 0.5) / 1e6 AS share
    FROM per_nation, total
    WHERE floor(value / tot * 1e6 + 0.5) / 1e6 > 0.04
    ORDER BY s_nationkey
    """,
)
def q141(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q11 shape: per-group revenue as a SHARE of the global total,
    filtered by a threshold on that share.

    The global total is a 1-row aggregate cross-joined (broadcast) onto
    the 25-row per-nation aggregate — the fact table is scanned twice but
    shuffled only as pre-aggregated partials; never join the raw rows to
    the scalar. Both the group sums and the total go through exact
    DECIMAL(18,4) partials, and the share is floor-trick-rounded BEFORE
    the threshold comparison so the predicate is engine-identical."""
    li = load_table(spark, sf, "lineitem")
    sup = load_table(spark, sf, "supplier")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_nation = (
        li.join(sup, li["l_suppkey"] == sup["s_suppkey"])  # supplier scales
        # with SF — no forced broadcast; AQE picks broadcast while it fits
        .groupBy("s_nationkey")
        .agg(money_sum(rev, "value"))
    )
    total = li.agg(money_sum(rev, "tot"))
    share = round_det(F.col("value") / F.col("tot"), 6)
    return (
        per_nation.crossJoin(F.broadcast(total))
        .select("s_nationkey", "value", share.alias("share"))
        .filter(F.col("share") > 0.04)
        .orderBy("s_nationkey")
    )


@query(
    "q142_count_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey)
    GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
)
def q142(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of per-customer order counts,
    including the zero bucket (customers with no orders survive the LEFT
    join; COUNT(o_orderkey) ignores the null).

    Two-level aggregation: the first shuffles on c_custkey (same key as
    the join, so AQE coalesces join+agg into one exchange), the second
    shuffles the tiny (count -> customers) histogram. The heavy join is
    the place skew shows up at 100 TB — a mega-customer inflates one
    task; the mitigation is salting the join key (operators/skew.py)
    because the count is reassembled correctly by the second agg."""
    c = load_table(spark, sf, "customer").select("c_custkey")
    o = load_table(spark, sf, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "q143_sorted_string_agg",
    oracle="""
    SELECT c_nationkey,
           string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment)
               AS segments,
           COUNT(DISTINCT c_mktsegment) AS n_segments
    FROM customer GROUP BY c_nationkey ORDER BY c_nationkey
    """,
)
def q143(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic string aggregation: the distinct values per group,
    sorted, joined with a comma (LISTAGG/string_agg semantics).

    ``collect_set`` alone is partition-order-nondeterministic — the
    ``array_sort`` before ``array_join`` is what makes the result a
    value, not an accident. Scale note: collect_set state is bounded by
    the distinct-value count (5 segments here); for unbounded domains
    aggregate a capped top-k first (q124) — never collect_list raw 100 TB
    strings into one group buffer."""
    c = load_table(spark, sf, "customer")
    return (
        c.groupBy("c_nationkey")
        .agg(
            F.array_join(
                F.array_sort(F.collect_set("c_mktsegment")), ","
            ).alias("segments"),
            F.count_distinct(F.col("c_mktsegment")).alias("n_segments"),
        )
        .orderBy("c_nationkey")
    )


@query(
    "q151_group_by_all",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
               AS total
    FROM orders GROUP BY ALL
    ORDER BY o_orderstatus, o_orderpriority
    """,
)
def q151(spark: SparkSession, sf: str) -> DataFrame:
    """GROUP BY ALL: the engine infers the grouping keys from the
    non-aggregate select items — same SQL text runs on Spark 4 and
    DuckDB. Purely sugar over the same partial/final hash aggregate;
    registered because a migrating user's queries will contain it."""
    load_table(spark, sf, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
                   AS total
        FROM orders GROUP BY ALL
        ORDER BY o_orderstatus, o_orderpriority
        """
    )


@query(
    "q152_weighted_avg",
    oracle=f"""
    SELECT p_brand, num, den, floor(num / den * 1e6 + 0.5) / 1e6 AS wavg
    FROM (SELECT p_brand,
                 {sql_money_sum("l_extendedprice * (1 - l_discount)", "num")},
                 {sql_money_sum("l_quantity", "den")}
          FROM lineitem JOIN part ON l_partkey = p_partkey
          GROUP BY p_brand)
    ORDER BY p_brand
    """,
)
def q152(spark: SparkSession, sf: str) -> DataFrame:
    """Quantity-weighted average discounted price per brand: exact decimal
    numerator AND denominator (a raw double SUM(l_quantity) would be
    partition-order-dependent), single float division at the end,
    floor-trick rounded. One equi-join (part scales with SF, so AQE decides
    broadcast vs shuffle from runtime stats) + one hash aggregate — the
    weighted-mean partials (sum of w·x, sum of w) are mergeable, which is
    what makes this a constant-state 100 TB aggregate."""
    li = load_table(spark, sf, "lineitem")
    p = load_table(spark, sf, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    out = (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand")
        .agg(money_sum(rev, "num"), money_sum(F.col("l_quantity"), "den"))
    )
    return out.select(
        "p_brand",
        "num",
        "den",
        round_det(F.col("num") / F.col("den"), 6).alias("wavg"),
    ).orderBy("p_brand")


@query(
    "q160_boolean_aggregates",
    oracle="""
    SELECT event_type,
           CAST(count_if(value > 100) AS BIGINT) AS n_big,
           bool_and(value >= 0) AS all_nonneg,
           bool_or(value > 400) AS any_huge,
           CAST(COUNT(*) - count_if(value > 100) AS BIGINT) AS n_small
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def q160(spark: SparkSession, sf: str) -> DataFrame:
    """Boolean aggregates: count_if / bool_and / bool_or — predicate
    rollups (identical function names on Spark 4 and DuckDB).

    These are the assertion primitives behind the DQ engine (q139 is
    count_if in disguise); bool_and/bool_or partials are single bits, so
    a fleet-wide invariant check over 100 TB shuffles one boolean per
    (map task, group)."""
    ev = load_table(spark, sf, "events")
    n_big = F.count_if(F.col("value") > 100)
    return (
        ev.groupBy("event_type")
        .agg(
            n_big.alias("n_big"),
            F.bool_and(F.col("value") >= 0).alias("all_nonneg"),
            F.bool_or(F.col("value") > 400).alias("any_huge"),
            (F.count(F.lit(1)) - n_big).alias("n_small"),
        )
        .orderBy("event_type")
    )


@query(
    "q163_chi_square",
    oracle="""
    WITH obs AS (SELECT c_nationkey, c_mktsegment, COUNT(*) AS n
                 FROM customer GROUP BY c_nationkey, c_mktsegment),
         rt AS (SELECT c_nationkey, SUM(n) AS r FROM obs GROUP BY c_nationkey),
         ct AS (SELECT c_mktsegment, SUM(n) AS c FROM obs GROUP BY c_mktsegment),
         tot AS (SELECT SUM(n) AS t FROM obs)
    SELECT o.c_nationkey,
           floor(SUM(CAST(floor(
               ((CAST(o.n AS DOUBLE)
                 - CAST(rt.r AS DOUBLE) * CAST(ct.c AS DOUBLE) / CAST(tot.t AS DOUBLE))
                * (CAST(o.n AS DOUBLE)
                 - CAST(rt.r AS DOUBLE) * CAST(ct.c AS DOUBLE) / CAST(tot.t AS DOUBLE)))
               / (CAST(rt.r AS DOUBLE) * CAST(ct.c AS DOUBLE) / CAST(tot.t AS DOUBLE))
               * 1e6 + 0.5) AS BIGINT))
               / 1e6 * 1e6 + 0.5) / 1e6 AS chi2
    FROM obs o
    JOIN rt ON o.c_nationkey = rt.c_nationkey
    JOIN ct ON o.c_mktsegment = ct.c_mktsegment
    CROSS JOIN tot
    GROUP BY o.c_nationkey ORDER BY o.c_nationkey
    """,
)
def q163(spark: SparkSession, sf: str) -> DataFrame:
    """Chi-square independence contributions per nation over the
    (nation × segment) contingency table — the categorical-drift test a
    data-curation pipeline runs between corpus snapshots.

    Expected counts come from row/column/grand totals — three tiny
    aggregates of the already-aggregated observation table, broadcast
    back (never a window over the raw rows). Each cell's (obs-exp)²/exp
    is a deterministic double expression QUANTIZED to integer micro-units
    before the per-nation sum, so the cross-partition addition is exact
    bigint — same trick as q154/q156; one final /1e6."""
    c = load_table(spark, sf, "customer")
    obs = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n")
    )
    rt = obs.groupBy("c_nationkey").agg(F.sum("n").alias("r"))
    ct = obs.groupBy("c_mktsegment").agg(F.sum("n").alias("c"))
    tot = obs.agg(F.sum("n").alias("t"))
    j = (
        obs.join(F.broadcast(rt), "c_nationkey")
        .join(F.broadcast(ct), "c_mktsegment")
        .crossJoin(F.broadcast(tot))
    )
    exp = (
        F.col("r").cast("double")
        * F.col("c").cast("double")
        / F.col("t").cast("double")
    )
    dev = F.col("n").cast("double") - exp
    contrib_micro = F.floor(dev * dev / exp * 1e6 + 0.5).cast("long")
    return (
        j.groupBy("c_nationkey")
        .agg(round_det(F.sum(contrib_micro) / 1e6, 6).alias("chi2"))
        .orderBy("c_nationkey")
    )


@query(
    "q164_regression_slope",
    oracle="""
    WITH t AS (
        SELECT user_id,
               CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS x,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
        FROM events),
    g AS (
        SELECT user_id, COUNT(*) AS n,
               SUM(x) AS sx, SUM(y) AS sy,
               SUM(x * x) AS sxx, SUM(x * y) AS sxy
        FROM t GROUP BY user_id)
    SELECT user_id, n,
           floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 * 1e6 + 0.5) / 1e6 AS slope_cents_per_hr,
           floor((CAST(sy AS DOUBLE)
                  - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * CAST(sx AS DOUBLE))
                 / CAST(n AS DOUBLE) * 1e4 + 0.5) / 1e4 AS intercept_cents
    FROM g ORDER BY user_id
    """,
)
def q164(spark: SparkSession, sf: str) -> DataFrame:
    """Per-user least-squares trend (slope + intercept) of value over
    time — the streaming-drift / sensor-trend regression, one pass.

    ``regr_slope`` exists in both engines but accumulates doubles in
    partition order; instead the inputs quantize to integers (hours,
    cents) so the five moment sums are exact bigint in any merge order,
    and the closed-form slope/intercept evaluate in one pinned float
    sequence (q119's recipe). Map-side combine keeps the shuffle at one
    row per (task, user)."""
    ev = load_table(spark, sf, "events")
    t = ev.select(
        "user_id",
        F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 3_600_000_000)
        .cast("long")
        .alias("x"),
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("y"),
    )
    g = t.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxxd, sxyd = F.col("sxx").cast("double"), F.col("sxy").cast("double")
    slope = (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd)
    intercept = (syd - slope * sxd) / nd
    return g.select(
        "user_id",
        "n",
        round_det(slope, 6).alias("slope_cents_per_hr"),
        round_det(intercept, 4).alias("intercept_cents"),
    ).orderBy("user_id")


@query(
    "q169_median_abs_deviation",
    oracle="""
    WITH med AS (
        SELECT c_mktsegment,
               quantile_cont(c_acctbal, 0.5) AS m
        FROM customer GROUP BY c_mktsegment)
    SELECT c.c_mktsegment,
           floor(med.m * 1e4 + 0.5) / 1e4 AS median_bal,
           floor(quantile_cont(abs(c.c_acctbal - med.m), 0.5) * 1e4 + 0.5)
               / 1e4 AS mad
    FROM customer c JOIN med ON c.c_mktsegment = med.c_mktsegment
    GROUP BY c.c_mktsegment, med.m ORDER BY c.c_mktsegment
    """,
)
def q169(spark: SparkSession, sf: str) -> DataFrame:
    """Median absolute deviation per segment — the robust spread measure
    (outliers move stddev, not MAD; pair with q165's z-gate when the
    data is heavy-tailed).

    Two exact-percentile passes: the per-group median (5 rows) broadcasts
    back, then the median of absolute deviations. The |x - m| inputs are
    identical doubles on both engines (m is the shared unrounded median),
    so the second interpolation matches bit-for-bit before the 4-digit
    floor-round. Exact medians materialize group values (q137's caveat):
    bounded group count here; sketch path otherwise."""
    c = load_table(spark, sf, "customer")
    med = c.groupBy("c_mktsegment").agg(
        F.percentile(F.col("c_acctbal"), 0.5).alias("m")
    )
    j = c.join(F.broadcast(med), "c_mktsegment")
    return (
        j.groupBy("c_mktsegment", "m")
        .agg(
            F.percentile(F.abs(F.col("c_acctbal") - F.col("m")), 0.5).alias(
                "mad_raw"
            )
        )
        .select(
            "c_mktsegment",
            round_det(F.col("m"), 4).alias("median_bal"),
            round_det(F.col("mad_raw"), 4).alias("mad"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "q170_lag1_autocorr",
    oracle="""
    WITH s AS (
        SELECT user_id,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS y,
               LEAD(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS y1
        FROM events),
    g AS (
        SELECT user_id, COUNT(*) AS n,
               SUM(y) AS sx, SUM(y1) AS sy,
               SUM(y * y) AS sxx, SUM(y1 * y1) AS syy, SUM(y * y1) AS sxy
        FROM s WHERE y1 IS NOT NULL GROUP BY user_id)
    SELECT user_id, n,
           floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                 * 1e6 + 0.5) / 1e6 AS acf1
    FROM g ORDER BY user_id
    """,
)
def q170(spark: SparkSession, sf: str) -> DataFrame:
    """Lag-1 autocorrelation of each user's value series — the
    is-this-signal-or-noise statistic for event streams (a near-zero acf1
    says shuffling-safe; high acf1 says sessionize first).

    LEAD pairs each reading with its successor (one shuffle on user_id,
    total order ties broken by event_id), then Pearson over the pairs via
    exact integer-cent moment sums — q119's recipe applied to a
    self-lagged series. Window + aggregate share the same partitioning,
    so the whole statistic costs one exchange."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf, "events")
    y = F.floor(F.col("value") * 100 + 0.5).cast("long")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "user_id", y.alias("y"), F.lead(y).over(w).alias("y1")
    ).filter(F.col("y1").isNotNull())
    g = s.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sx"),
        F.sum("y1").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("sxx"),
        F.sum(F.col("y1") * F.col("y1")).alias("syy"),
        F.sum(F.col("y") * F.col("y1")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxxd, syyd, sxyd = (
        F.col("sxx").cast("double"),
        F.col("syy").cast("double"),
        F.col("sxy").cast("double"),
    )
    acf1 = (nd * sxyd - sxd * syd) / F.sqrt(
        (nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd)
    )
    return g.select("user_id", "n", round_det(acf1, 6).alias("acf1")).orderBy(
        "user_id"
    )


@query(
    "q171_entropy",
    oracle="""
    WITH obs AS (SELECT c_nationkey, c_mktsegment, COUNT(*) AS n
                 FROM customer GROUP BY c_nationkey, c_mktsegment),
         rt AS (SELECT c_nationkey, SUM(n) AS r FROM obs GROUP BY c_nationkey)
    SELECT obs.c_nationkey,
           floor(SUM(CAST(floor(
               -(CAST(obs.n AS DOUBLE) / CAST(rt.r AS DOUBLE))
               * ln(CAST(obs.n AS DOUBLE) / CAST(rt.r AS DOUBLE))
               * 1e9 + 0.5) AS BIGINT)) / 1e9 * 1e6 + 0.5) / 1e6 AS entropy
    FROM obs JOIN rt ON obs.c_nationkey = rt.c_nationkey
    GROUP BY obs.c_nationkey ORDER BY obs.c_nationkey
    """,
)
def q171(spark: SparkSession, sf: str) -> DataFrame:
    """Shannon entropy of each nation's segment distribution (nats) —
    the diversity/drift metric for categorical columns (a collapsing
    entropy between corpus snapshots means a source went monocultural;
    compare q163's chi-square for the paired test).

    Works entirely on the pre-aggregated (nation, segment) counts; the
    -p·ln(p) terms are deterministic doubles quantized to nano-units
    before the cross-segment sum, so partition order can't wiggle the
    result. Cost: two tiny aggregates and a broadcast join — the raw
    table is scanned once."""
    c = load_table(spark, sf, "customer")
    obs = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n")
    )
    rt = obs.groupBy("c_nationkey").agg(F.sum("n").alias("r"))
    j = obs.join(F.broadcast(rt), "c_nationkey")
    p = F.col("n").cast("double") / F.col("r").cast("double")
    term_nano = F.floor(-p * F.log(p) * 1e9 + 0.5).cast("long")
    return (
        j.groupBy("c_nationkey")
        .agg(round_det(F.sum(term_nano) / 1e9, 6).alias("entropy"))
        .orderBy("c_nationkey")
    )


# ---------------------------------------------------- Benford DQ check -----
@query(
    "q273_benford_check",
    oracle="""
    WITH d AS (
        SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                                AS VARCHAR), 1, 1) AS BIGINT) AS digit
        FROM orders WHERE o_totalprice > 0
    )
    SELECT digit, COUNT(*) AS n,
           CAST(floor(COUNT(*) * 1000000.0 / SUM(COUNT(*)) OVER () + 0.5)
                AS BIGINT) AS share_q
    FROM d GROUP BY digit ORDER BY digit
    """,
)
def q273(spark: SparkSession, sf: str) -> DataFrame:
    """Benford first-significant-digit distribution — the classic
    fabricated-data / broken-ingest screen (organic monetary amounts
    follow log-uniform digit shares; a uniform or spiked distribution
    flags synthetic or truncated data). The digit is extracted through
    exact integer cents → string head, so no float log anywhere; one
    hash aggregate, share window over the 9-row result."""
    o = load_table(spark, sf, "orders").where(F.col("o_totalprice") > 0)
    digit = F.substring(
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").cast("string"),
        1, 1,
    ).cast("long")
    from pyspark.sql import Window as W

    d = o.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n")
    )
    share = F.floor(
        F.col("n") * 1000000.0 / F.sum("n").over(W.orderBy()) + F.lit(0.5)
    ).cast("long")
    return d.select("digit", "n", share.alias("share_q")).orderBy("digit")


# ----------------------------------------------------------- OHLC bars ----
@query(
    "q277_ohlc_bars",
    oracle=f"""
    WITH t AS (
        SELECT event_type, date_trunc('hour', ts) AS bar, value,
               ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                  ORDER BY ts, event_id) AS rn_a,
               ROW_NUMBER() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                  ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM events
    )
    SELECT event_type, bar,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open_v,
           MAX(value) AS high_v,
           MIN(value) AS low_v,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close_v,
           {sql_money_sum('value', 'volume')},
           COUNT(*) AS n
    FROM t GROUP BY event_type, bar ORDER BY event_type, bar
    """,
)
def q277(spark: SparkSession, sf: str) -> DataFrame:
    """OHLC candlestick downsampling — the canonical time-series
    resample (metrics rollup, market bars, sensor decimation): per
    (series, hour-bucket), first value (open), max (high), min (low),
    last value (close), exact-decimal volume, and count. First/last are
    minted by row_number over the BUCKET-partitioned window with a total
    (ts, event_id) tiebreak — never a partitionless window — then folded
    into the same hash aggregate as min/max/sum, so the whole resample is
    one shuffle on the (series, bucket) key it groups by. At 100 TB the
    bucket key bounds every window partition to one bar's rows; volume
    rides the repo's DECIMAL(18,4) rule so partial-sum order cannot move
    the hash."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf, "events").select(
        "event_type",
        F.date_trunc("hour", "ts").alias("bar"),
        "value", "ts", "event_id",
    )
    by_bar = W.partitionBy("event_type", "bar")
    t = ev.select(
        "event_type", "bar", "value",
        F.row_number().over(by_bar.orderBy("ts", "event_id")).alias("rn_a"),
        F.row_number()
        .over(by_bar.orderBy(F.col("ts").desc(), F.col("event_id").desc()))
        .alias("rn_d"),
    )
    return (
        t.groupBy("event_type", "bar")
        .agg(
            F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open_v"),
            F.max("value").alias("high_v"),
            F.min("value").alias("low_v"),
            F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close_v"),
            money_sum(F.col("value"), "volume"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type", "bar")
    )


# ------------------------------------------------- join-key skew report ----
SKEW_TOP = 20


@query(
    "q289_key_skew_report",
    oracle=f"""
    WITH per_key AS (
        SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id
    ),
    tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS total, COUNT(*) AS n_keys
        FROM per_key
    )
    SELECT user_id, n,
           (n * 1000000) // total AS share_ppm,
           (n * n_keys * 1000) // total AS x_mean_q
    FROM per_key, tot
    ORDER BY n DESC, user_id LIMIT {SKEW_TOP}
    """,
)
def q289(spark: SparkSession, sf: str) -> DataFrame:
    """Join-key skew report — the diagnostic run BEFORE a big join to
    decide whether q229's salting or AQE skew-split is needed: the {t}
    hottest keys with absolute count, parts-per-million share, and
    multiple-of-mean (scaled ×1000). One hash aggregate over the key, a
    1-row totals broadcast, and a TakeOrdered top-{t} — no global sort,
    no second scan. All ratios are scaled integer floor-divisions of
    exact counts, so the report is engine-stable. At 100 TB this runs as
    a cheap pre-flight on the same scan that feeds the join (or on a
    sampled partition set with counts scaled up — documented variant)."""
    ev = load_table(spark, sf, "events")
    per_key = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    tot = per_key.agg(
        F.sum("n").alias("total"), F.count(F.lit(1)).alias("n_keys")
    )

    def idiv(a, b):
        return ((a - a % b) / b).cast("long")

    share = F.col("n") * 1_000_000
    xmean = F.col("n") * F.col("n_keys") * 1000
    return (
        per_key.crossJoin(F.broadcast(tot))
        .select(
            "user_id",
            "n",
            idiv(share, F.col("total")).alias("share_ppm"),
            idiv(xmean, F.col("total")).alias("x_mean_q"),
        )
        .orderBy(F.col("n").desc(), "user_id")
        .limit(SKEW_TOP)
    )


q289.__doc__ = q289.__doc__.format(t=SKEW_TOP)


# ------------------------------------------- grouped 2-feature OLS fit ----
@query(
    "q291_grouped_ols",
    oracle="""
    WITH r AS (
        SELECT event_type,
               CAST(hour(ts) AS BIGINT) AS x1,
               CAST(day(ts) AS BIGINT) AS x2,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
        FROM events
    ),
    s AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x1) AS BIGINT) AS sx1,
               CAST(SUM(x2) AS BIGINT) AS sx2,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x1 * x1) AS BIGINT) AS s11,
               CAST(SUM(x1 * x2) AS BIGINT) AS s12,
               CAST(SUM(x2 * x2) AS BIGINT) AS s22,
               CAST(SUM(x1 * y) AS BIGINT) AS s1y,
               CAST(SUM(x2 * y) AS BIGINT) AS s2y
        FROM r GROUP BY event_type
    ),
    c AS (
        SELECT event_type, n, sx1, sx2, sy,
               CAST(n * s11 - sx1 * sx1 AS DOUBLE) AS a11,
               CAST(n * s12 - sx1 * sx2 AS DOUBLE) AS a12,
               CAST(n * s22 - sx2 * sx2 AS DOUBLE) AS a22,
               CAST(n * s1y - sx1 * sy AS DOUBLE) AS b1v,
               CAST(n * s2y - sx2 * sy AS DOUBLE) AS b2v
        FROM s
    ),
    fit AS (
        SELECT event_type, n,
               (b1v * a22 - b2v * a12) / (a11 * a22 - a12 * a12) AS beta1,
               (b2v * a11 - b1v * a12) / (a11 * a22 - a12 * a12) AS beta2,
               sx1, sx2, sy
        FROM c
    )
    SELECT event_type, n,
           CAST(floor((CAST(sy AS DOUBLE) - beta1 * sx1 - beta2 * sx2) / n
                      * 1000000 + 0.5) AS BIGINT) AS beta0_q,
           CAST(floor(beta1 * 1000000 + 0.5) AS BIGINT) AS beta1_q,
           CAST(floor(beta2 * 1000000 + 0.5) AS BIGINT) AS beta2_q
    FROM fit ORDER BY event_type
    """,
)
def q291(spark: SparkSession, sf: str) -> DataFrame:
    """Grouped multiple regression (2 features + intercept) by CLOSED-FORM
    normal equations over sufficient statistics — the pattern that makes
    distributed OLS/ridge one aggregation pass instead of an iterative
    solver: per group, nine EXACT integer sums (y pre-quantized to cents,
    features are small calendar ints), then the 2×2 centered system is
    solved by Cramer in DOUBLE — int64→double conversion and the fixed
    arithmetic tree are identical IEEE in both engines, so determinism
    survives without needing the (overflow-prone) all-integer determinant.
    One shuffle keyed on the group; sufficient stats are mergeable, so
    the same query runs as map-side partials at 100 TB and the solve
    touches only O(groups) rows. q164's single-feature slope is the
    degenerate case; more features = bigger (still tiny) per-group
    matrix, same plan."""
    ev = load_table(spark, sf, "events")
    r = ev.select(
        "event_type",
        F.hour("ts").cast("long").alias("x1"),
        F.dayofmonth("ts").cast("long").alias("x2"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("y"),
    )
    s = r.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x1").alias("sx1"),
        F.sum("x2").alias("sx2"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum(F.col("x1") * F.col("y")).alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).alias("s2y"),
    )
    n, sx1, sx2, sy = F.col("n"), F.col("sx1"), F.col("sx2"), F.col("sy")
    a11 = (n * F.col("s11") - sx1 * sx1).cast("double")
    a12 = (n * F.col("s12") - sx1 * sx2).cast("double")
    a22 = (n * F.col("s22") - sx2 * sx2).cast("double")
    b1v = (n * F.col("s1y") - sx1 * sy).cast("double")
    b2v = (n * F.col("s2y") - sx2 * sy).cast("double")
    det = a11 * a22 - a12 * a12
    beta1 = (b1v * a22 - b2v * a12) / det
    beta2 = (b2v * a11 - b1v * a12) / det
    beta0 = (sy.cast("double") - beta1 * sx1 - beta2 * sx2) / n
    q = lambda x: F.floor(x * 1_000_000 + F.lit(0.5)).cast("long")  # noqa: E731
    return s.select(
        "event_type",
        "n",
        q(beta0).alias("beta0_q"),
        q(beta1).alias("beta1_q"),
        q(beta2).alias("beta2_q"),
    ).orderBy("event_type")


# ------------------------------------------- Neyman sample allocation ----
NEYMAN_BUDGET = 1000


@query(
    "q308_neyman_allocation",
    oracle=f"""
    WITH r AS (
        SELECT event_type,
               CAST(floor(value + 0.5) AS BIGINT) AS y
        FROM events
    ),
    s AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_h,
               CAST(SUM(y) AS BIGINT) AS s1,
               CAST(SUM(y * y) AS BIGINT) AS s2
        FROM r GROUP BY event_type
    ),
    w AS (
        SELECT event_type, n_h,
               n_h * sqrt(CAST(n_h * s2 - s1 * s1 AS DOUBLE)
                          / (n_h * (n_h - 1))) AS wgt
        FROM s
    ),
    q AS (
        SELECT event_type, n_h, wgt,
               {NEYMAN_BUDGET} * wgt / SUM(wgt) OVER () AS quota
        FROM w
    ),
    b AS (
        SELECT event_type, n_h, wgt, quota,
               CAST(floor(quota) AS BIGINT) AS base,
               quota - floor(quota) AS rem,
               CAST({NEYMAN_BUDGET} - SUM(CAST(floor(quota) AS BIGINT)) OVER ()
                    AS BIGINT) AS leftover,
               ROW_NUMBER() OVER (ORDER BY quota - floor(quota) DESC,
                                  event_type) AS rk
        FROM q
    )
    SELECT event_type, n_h,
           CAST(floor(wgt * 1000000 + 0.5) AS BIGINT) AS weight_q,
           base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS n_alloc
    FROM b ORDER BY event_type
    """,
)
def q308(spark: SparkSession, sf: str) -> DataFrame:
    """Neyman-optimal stratified sample allocation + largest-remainder
    apportionment — the survey-sampling / eval-set design step: a budget
    of {b} samples splits across strata proportional to N_h·σ_h (high-
    variance strata earn more), then fractional quotas become integers
    by floor + largest-remainder so the allocations sum EXACTLY to the
    budget (naive rounding drifts). Determinism chain: per-stratum
    variance numerators are exact BIGINT (n·Σy² − (Σy)²), sqrt is
    IEEE-exactly-rounded (the one libm-adjacent function that is safe
    cross-engine), quotas are fixed IEEE trees of identical operands,
    and remainder ties break on the stratum name. All windows run over
    the O(strata) aggregate. The same query sizes per-slice eval sets
    (q292) and per-domain curation quotas (q227's complement: variance-
    aware instead of equalizing)."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf, "events")
    r = ev.select(
        "event_type", F.floor(F.col("value") + F.lit(0.5)).cast("long").alias("y")
    )
    s = r.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_h"),
        F.sum("y").alias("s1"),
        F.sum(F.col("y") * F.col("y")).alias("s2"),
    )
    n_h, s1, s2 = F.col("n_h"), F.col("s1"), F.col("s2")
    wgt = n_h * F.sqrt(
        (n_h * s2 - s1 * s1).cast("double") / (n_h * (n_h - 1))
    )
    w = s.select("event_type", "n_h", wgt.alias("wgt"))
    w_all = W.orderBy()
    quota = NEYMAN_BUDGET * F.col("wgt") / F.sum("wgt").over(w_all)
    q = w.select("event_type", "n_h", "wgt", quota.alias("quota"))
    base = F.floor("quota").cast("long")
    b = q.select(
        "event_type", "n_h", "wgt", "quota",
        base.alias("base"),
        (F.col("quota") - F.floor("quota")).alias("rem"),
        (NEYMAN_BUDGET - F.sum(base).over(w_all)).alias("leftover"),
        F.row_number()
        .over(W.orderBy((F.col("quota") - F.floor("quota")).desc(), "event_type"))
        .alias("rk"),
    )
    return b.select(
        "event_type",
        "n_h",
        F.floor(F.col("wgt") * 1_000_000 + F.lit(0.5)).cast("long").alias("weight_q"),
        (
            F.col("base")
            + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
        ).alias("n_alloc"),
    ).orderBy("event_type")


q308.__doc__ = q308.__doc__.format(b=NEYMAN_BUDGET)


# ---------------------------------------- two-sample KS drift statistic ----
@query(
    "q309_ks_two_sample",
    oracle="""
    WITH r AS (
        SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS x,
               CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g1,
               CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS g2
        FROM events WHERE event_type IN ('click', 'view')
    ),
    g AS (
        SELECT x, CAST(SUM(g1) AS BIGINT) AS d1, CAST(SUM(g2) AS BIGINT) AS d2
        FROM r GROUP BY x
    ),
    c AS (
        SELECT x,
               CAST(SUM(d1) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c1,
               CAST(SUM(d2) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c2,
               CAST(SUM(d1) OVER () AS BIGINT) AS n1,
               CAST(SUM(d2) OVER () AS BIGINT) AS n2
        FROM g
    )
    SELECT CAST(MAX(ABS(c1 * n2 - c2 * n1)) AS BIGINT) AS d_num,
           MAX(n1) AS n1, MAX(n2) AS n2,
           CAST(floor(CAST(MAX(ABS(c1 * n2 - c2 * n1)) AS DOUBLE)
                      / (MAX(n1) * MAX(n2)) * 1000000 + 0.5) AS BIGINT) AS d_q
    FROM c
    """,
)
def q309(spark: SparkSession, sf: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between the click and view
    value distributions — the standard drift / A-A test for 'did this
    feature's distribution change': D = max_x |F₁(x) − F₂(x)|, computed
    EXACTLY by cross-multiplying the integer ECDF counts (|c₁n₂ − c₂n₁|,
    pure BIGINT — the division by n₁n₂ happens once, at the end, on the
    integer max). Shape: one hash aggregate to per-value (d₁, d₂)
    deltas, cumulative counts over the DISTINCT-value series, one max.
    The running sums here ride a bounded global window (cent-quantized
    support ≤ 49k distinct values regardless of row count); unbounded
    supports swap in `distributed_cumsum` unchanged (the q307 pattern).
    The same query with group = yesterday/today is the feature-drift
    gate a training pipeline runs before every retrain — and the exact-D
    contract means alert thresholds are reproducible across engines."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf, "events").where(
        F.col("event_type").isin("click", "view")
    )
    r = ev.select(
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("x"),
        (F.col("event_type") == "click").cast("long").alias("g1"),
        (F.col("event_type") == "view").cast("long").alias("g2"),
    )
    g = r.groupBy("x").agg(F.sum("g1").alias("d1"), F.sum("g2").alias("d2"))
    w_ord = W.orderBy("x").rowsBetween(W.unboundedPreceding, 0)
    w_all = W.orderBy()
    c = g.select(
        "x",
        F.sum("d1").over(w_ord).alias("c1"),
        F.sum("d2").over(w_ord).alias("c2"),
        F.sum("d1").over(w_all).alias("n1"),
        F.sum("d2").over(w_all).alias("n2"),
    )
    dev = F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1"))
    agg = c.agg(
        F.max(dev).alias("d_num"),
        F.max("n1").alias("n1"),
        F.max("n2").alias("n2"),
    )
    d_q = F.floor(
        F.col("d_num").cast("double") / (F.col("n1") * F.col("n2")) * 1_000_000
        + F.lit(0.5)
    ).cast("long")
    return agg.select("d_num", "n1", "n2", d_q.alias("d_q"))


# ------------------------------------- deterministic half-sample CI ----
HS_REPLICAS = 32


def _hs_oracle() -> str:
    from .extensions import _H64

    gate = _H64.format(x="CAST(event_id AS VARCHAR) || ':' || CAST({b} AS VARCHAR)")
    cols = ",\n               ".join(
        f"CAST(SUM(y) FILTER ({gate.format(b=b)} % 2 = 1) AS BIGINT) AS s{b},\n"
        f"               CAST(COUNT(*) FILTER ({gate.format(b=b)} % 2 = 1) AS BIGINT) AS c{b}"
        for b in range(HS_REPLICAS)
    )
    means = ", ".join(
        f"CAST(s{b} AS DOUBLE) / c{b}" for b in range(HS_REPLICAS)
    )
    return f"""
    WITH r AS (
        SELECT event_id, CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
        FROM events
    ),
    s AS (
        SELECT CAST(SUM(y) AS BIGINT) AS tot, CAST(COUNT(*) AS BIGINT) AS n,
               {cols}
        FROM r
    ),
    m AS (
        SELECT tot, n, [{means}] AS ms, CAST(tot AS DOUBLE) / n AS mu
        FROM s
    )
    SELECT n,
           CAST(floor(mu * 1000 + 0.5) AS BIGINT) AS mean_mcents,
           CAST(floor(
               sqrt(list_sum(list_transform(ms, x -> (x - mu) * (x - mu)))
                    / {HS_REPLICAS}) * 1000 + 0.5) AS BIGINT) AS se_mcents
    FROM m
    """


@query("q313_halfsample_ci", oracle=_hs_oracle())
def q313(spark: SparkSession, sf: str) -> DataFrame:
    """Uncertainty for a 100 TB mean WITHOUT distributional assumptions:
    {b} deterministic half-sample replicates (row ∈ replicate b iff
    md5(event_id, b) is odd — reproducible, re-shard-stable, never
    rand()), each replicate's mean an exact-integer sum ratio, and the
    standard error the spread of the replicate means around the full
    mean (the random-group / balanced-half-sample estimator survey
    statistics uses). ALL {b} replicate sums accumulate in ONE pass as
    FILTER aggregates — no data explosion, no second scan; the replicate
    fan-out costs {b} conditional adds per row, which whole-stage
    codegen vectorizes. Floats appear only in the final 1-row
    means/variance arithmetic (fixed IEEE tree, sqrt exactly rounded),
    so the interval is engine-exact. The same shape bootstraps any
    linear statistic — sums, ratios, per-group means — by swapping the
    inner aggregate."""
    from ..functions.text import h64

    ev = load_table(spark, sf, "events")
    r = ev.select(
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("y"),
    )
    aggs = [
        F.sum("y").alias("tot"),
        F.count(F.lit(1)).alias("n"),
    ]
    for b in range(HS_REPLICAS):
        gate = (
            h64(
                F.concat_ws(
                    ":", F.col("event_id").cast("string"), F.lit(str(b))
                )
            )
            % 2
            == 1
        )
        aggs.append(F.sum(F.when(gate, F.col("y"))).alias(f"s{b}"))
        aggs.append(F.sum(gate.cast("long")).alias(f"c{b}"))
    s = r.agg(*aggs)
    ms = F.array(
        *[
            F.col(f"s{b}").cast("double") / F.col(f"c{b}")
            for b in range(HS_REPLICAS)
        ]
    )
    mu = F.col("tot").cast("double") / F.col("n")
    m = s.select("n", mu.alias("mu"), ms.alias("ms"))
    var = (
        F.aggregate(
            F.transform("ms", lambda x: (x - F.col("mu")) * (x - F.col("mu"))),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / HS_REPLICAS
    )
    return m.select(
        "n",
        F.floor(F.col("mu") * 1000 + F.lit(0.5)).cast("long").alias("mean_mcents"),
        F.floor(F.sqrt(var) * 1000 + F.lit(0.5)).cast("long").alias("se_mcents"),
    )


q313.__doc__ = q313.__doc__.format(b=HS_REPLICAS)


# ----------------------------------------------------- seasonal index ----
@query(
    "q314_seasonal_index",
    oracle="""
    WITH r AS (
        SELECT event_type, dayofweek(ts) + 1 AS dow,  -- Spark: Sunday = 1
               CAST(floor(value + 0.5) AS BIGINT) AS y
        FROM events
    ),
    d AS (
        SELECT event_type, dow,
               CAST(SUM(y) AS BIGINT) AS s_dow, CAST(COUNT(*) AS BIGINT) AS n_dow
        FROM r GROUP BY event_type, dow
    ),
    t AS (
        SELECT event_type,
               CAST(SUM(s_dow) AS BIGINT) AS s_all,
               CAST(SUM(n_dow) AS BIGINT) AS n_all
        FROM d GROUP BY event_type
    )
    SELECT d.event_type, dow, n_dow,
           (s_dow * n_all * 1000000) // (n_dow * s_all) AS index_ppm
    FROM d JOIN t ON t.event_type = d.event_type
    ORDER BY d.event_type, dow
    """,
)
def q314(spark: SparkSession, sf: str) -> DataFrame:
    """Day-of-week seasonal index per series — the multiplicative
    seasonality profile (index > 1e6 ppm ⇒ that weekday runs hot) that
    feeds deseasonalized anomaly detection and capacity planning. The
    index is the ratio of two means computed WITHOUT any float mean:
    cross-multiplied exact integer sums, ``(Σ_dow · n_all · 10⁶) //
    (n_dow · Σ_all)`` — one floor division of exact BIGINTs (values
    pre-quantized to whole units so the 10⁶ scaling keeps int64
    headroom to ~10⁹ rows/series; cents would need DECIMAL(38)).
    Two tiny hash aggregates (series×7, then series) and a broadcast
    join — the full profile costs one scan at any scale."""
    ev = load_table(spark, sf, "events")
    r = ev.select(
        "event_type",
        F.dayofweek("ts").alias("dow"),
        F.floor(F.col("value") + F.lit(0.5)).cast("long").alias("y"),
    )
    d = r.groupBy("event_type", "dow").agg(
        F.sum("y").alias("s_dow"), F.count(F.lit(1)).alias("n_dow")
    )
    t = d.groupBy("event_type").agg(
        F.sum("s_dow").alias("s_all"), F.sum("n_dow").alias("n_all")
    )
    num = F.col("s_dow") * F.col("n_all") * 1_000_000
    den = F.col("n_dow") * F.col("s_all")
    return (
        d.join(F.broadcast(t), "event_type")
        .select(
            "event_type",
            "dow",
            "n_dow",
            ((num - num % den) / den).cast("long").alias("index_ppm"),
        )
        .orderBy("event_type", "dow")
    )


# ----------------------------------------------- time-decay popularity ----
DECAY_CAP = 40  # max halvings (2^40 underflows any realistic cents value)


@query(
    "q315_decayed_popularity",
    oracle=f"""
    WITH ref AS (SELECT MAX(l_shipdate) AS ref_ts FROM lineitem),
    r AS (
        SELECT l_partkey,
               CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
               LEAST({DECAY_CAP}, date_diff('day', l_shipdate, ref_ts) // 30)
                 AS age
        FROM lineitem, ref
    ),
    s AS (
        SELECT l_partkey,
               CAST(SUM(CAST(floor(cents / power(2, age)) AS BIGINT))
                    AS BIGINT) AS decayed,
               CAST(SUM(cents) AS BIGINT) AS raw_cents
        FROM r GROUP BY l_partkey
    )
    SELECT l_partkey, decayed, raw_cents
    FROM s ORDER BY decayed DESC, l_partkey LIMIT 20
    """,
)
def q315(spark: SparkSession, sf: str) -> DataFrame:
    """Half-life popularity ranking — trending-item selection where each
    contribution halves per 30 days of age: weight = cents / 2^age,
    EXACT because dividing a binary float by a power of two only shifts
    the exponent (floor then recovers the integer a bit-shift would
    give) — the integer-exact alternative to exp(-λ·age) decay, which
    would put libm in the ranking. Age caps at {c} halvings (past that
    the weight is 0 for any realistic amount). One scan + one part-keyed
    aggregate + TakeOrdered top-20; the 1-row reference timestamp
    broadcasts. Re-ranking tomorrow only re-ages the exponent — the
    score is a sum of per-row terms, so incremental maintenance keeps
    per-part partial sums per age bucket and re-shifts them (the q209
    mergeability argument)."""
    li = load_table(spark, sf, "lineitem")
    ref = li.agg(F.max("l_shipdate").alias("ref_ts"))
    r = li.crossJoin(F.broadcast(ref)).select(
        "l_partkey",
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
        F.least(
            F.lit(DECAY_CAP),
            F.floor(F.datediff(F.col("ref_ts"), F.col("l_shipdate")) / 30).cast(
                "long"
            ),
        ).alias("age"),
    )
    decayed = F.floor(F.col("cents") / F.pow(F.lit(2.0), F.col("age"))).cast(
        "long"
    )
    s = r.groupBy("l_partkey").agg(
        F.sum(decayed).alias("decayed"), F.sum("cents").alias("raw_cents")
    )
    return s.orderBy(F.col("decayed").desc(), "l_partkey").limit(20)


q315.__doc__ = q315.__doc__.format(c=DECAY_CAP)


# -------------------------------------------- mutual information -----
_MI_US_DAY = 86_400_000_000


@query(
    "q328_mutual_information",
    oracle=f"""
    WITH ev AS (
        SELECT event_type AS g,
               CAST(floor(value / 10) AS BIGINT) AS vb,
               (epoch_us(ts)//{_MI_US_DAY} + 4) % 7 AS dow
        FROM events WHERE value IS NOT NULL
    ),
    joint AS (SELECT g, vb, dow, CAST(COUNT(*) AS BIGINT) AS n
              FROM ev GROUP BY g, vb, dow),
    mx AS (SELECT g, vb, CAST(SUM(n) AS BIGINT) AS n
           FROM joint GROUP BY g, vb),
    my AS (SELECT g, dow, CAST(SUM(n) AS BIGINT) AS n
           FROM joint GROUP BY g, dow),
    mt AS (SELECT g, CAST(SUM(n) AS BIGINT) AS n FROM joint GROUP BY g),
    terms AS (
        SELECT j.g,
               CAST(floor(
                   (CAST(j.n AS DOUBLE) / CAST(t.n AS DOUBLE))
                   * ln((CAST(j.n AS DOUBLE) * CAST(t.n AS DOUBLE))
                        / (CAST(x.n AS DOUBLE) * CAST(y.n AS DOUBLE)))
                   * 1e9 + 0.5) AS BIGINT) AS q
        FROM joint j
        JOIN mx x ON x.g = j.g AND x.vb = j.vb
        JOIN my y ON y.g = j.g AND y.dow = j.dow
        JOIN mt t ON t.g = j.g
    )
    SELECT g AS event_type,
           floor(CAST(SUM(q) AS BIGINT) / 1e9 * 1e6 + 0.5) / 1e6 AS mi
    FROM terms GROUP BY g ORDER BY event_type
    """,
)
def q328(spark: SparkSession, sf: str) -> DataFrame:
    """Mutual information I(value-bin; day-of-week) per event type —
    the feature-relevance / dependence score (0 = independent) that
    complements chi-square (q163, a test) and entropy (q171, a
    marginal): MI quantifies HOW MUCH knowing the weekday tells you
    about the metric. Same scale discipline as q171: the raw stream
    reduces to the joint-count contingency table first (one hash
    aggregate over the bounded (type, value-bin, weekday) support);
    marginals and totals are re-aggregates of that table; each
    p·ln(p·n/(px·py)) term is a deterministic double quantized to
    nano-units BEFORE the cross-cell sum so partition order cannot
    wiggle the result. Weekday is pure integer arithmetic on the
    epoch day (no timezone functions), identical cross-engine."""
    ev = (
        load_table(spark, sf, "events")
        .where(F.col("value").isNotNull())
        .select(
            F.col("event_type").alias("g"),
            F.floor(F.col("value") / 10).cast("long").alias("vb"),
            F.expr(
                f"(unix_micros(cast(ts as timestamp)) div {_MI_US_DAY} + 4) % 7"
            ).alias("dow"),
        )
    )
    joint = ev.groupBy("g", "vb", "dow").agg(F.count(F.lit(1)).alias("n"))
    joint = joint.transform(materialize)  # reused by 3 re-aggregates
    mx = joint.groupBy("g", "vb").agg(F.sum("n").alias("nx"))
    my = joint.groupBy("g", "dow").agg(F.sum("n").alias("ny"))
    mt = joint.groupBy("g").agg(F.sum("n").alias("nt"))
    j = (
        joint.join(F.broadcast(mx), ["g", "vb"])
        .join(F.broadcast(my), ["g", "dow"])
        .join(F.broadcast(mt), "g")
    )
    term = (
        F.col("n").cast("double") / F.col("nt").cast("double")
    ) * F.log(
        (F.col("n").cast("double") * F.col("nt").cast("double"))
        / (F.col("nx").cast("double") * F.col("ny").cast("double"))
    )
    q = F.floor(term * 1e9 + F.lit(0.5)).cast("long")
    return (
        j.select("g", q.alias("q"))
        .groupBy("g")
        .agg(round_det(F.sum("q") / 1e9, 6).alias("mi"))
        .select(F.col("g").alias("event_type"), "mi")
        .orderBy("event_type")
    )


# --------------------------------------------- CUPED variance reduction ----
CUPED_SPLIT_DAY = 15
_CUPED_US_DAY = 86_400_000_000


def _cuped_sql() -> str:
    return f"""
    WITH ev AS (
        SELECT user_id, event_type,
               epoch_us(ts)//{_CUPED_US_DAY} AS d,
               CAST(floor(COALESCE(value, 0) * 100 + 0.5) AS BIGINT) AS cents
        FROM events
    ),
    base AS (SELECT MIN(d) AS d0 FROM ev),
    per_user AS (
        SELECT event_type, user_id,
               CAST(SUM(CASE WHEN d - base.d0 < {CUPED_SPLIT_DAY}
                             THEN cents ELSE 0 END) AS BIGINT) AS x,
               CAST(SUM(CASE WHEN d - base.d0 >= {CUPED_SPLIT_DAY}
                             THEN cents ELSE 0 END) AS BIGINT) AS y
        FROM ev CROSS JOIN base
        GROUP BY event_type, user_id
    ),
    m AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(y * y) AS BIGINT) AS syy,
               CAST(SUM(x * y) AS BIGINT) AS sxy
        FROM per_user GROUP BY event_type
    )
    SELECT event_type, n,
           floor((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                 * 1e6 + 0.5) / 1e6 AS theta,
           CAST(floor((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                      * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                      / ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                         * (CAST(n AS DOUBLE) * syy
                            - CAST(sy AS DOUBLE) * sy))
                      * 1000000 + 0.5) AS BIGINT) AS var_reduction_ppm
    FROM m WHERE CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx > 0
            AND CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy > 0
    ORDER BY event_type
    """


@query("q348_cuped_variance_reduction", oracle=_cuped_sql())
def q348(spark: SparkSession, sf: str) -> DataFrame:
    """CUPED (controlled-experiment using pre-experiment data) — the
    industry-standard A/B variance-reduction technique: per user, the
    pre-period metric x (first {s} corpus days) predicts the
    experiment-period metric y, and the adjusted metric y − θ(x − x̄)
    with θ = cov(x,y)/var(x) removes the predictable between-user
    variance. The achieved reduction has the closed form
    corr(x,y)² = cov²/(var·var), so ONE pass of exact integer moment
    sums (cents-quantized, the q119/q206 discipline) yields both θ and
    the realized reduction in ppm — no second pass over adjusted
    values, no float accumulation anywhere before the final identical
    double expressions. Per event type: one per-user hash aggregate,
    one moment aggregate. Degenerate (zero-variance) groups are
    excluded by contract."""
    ev = load_table(spark, sf, "events").select(
        "user_id",
        "event_type",
        F.expr(
            f"unix_micros(cast(ts as timestamp)) div {_CUPED_US_DAY}"
        ).alias("d"),
        F.floor(F.coalesce(F.col("value"), F.lit(0)) * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    base = ev.agg(F.min("d").alias("d0"))
    pre = F.col("d") - F.col("d0") < CUPED_SPLIT_DAY
    per_user = (
        ev.crossJoin(F.broadcast(base))
        .groupBy("event_type", "user_id")
        .agg(
            F.sum(F.when(pre, F.col("cents")).otherwise(F.lit(0)))
            .cast("long")
            .alias("x"),
            F.sum(F.when(~pre, F.col("cents")).otherwise(F.lit(0)))
            .cast("long")
            .alias("y"),
        )
    )
    m = per_user.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    cov_n = nd * F.col("sxy") - sxd * F.col("sy")
    varx_n = nd * F.col("sxx") - sxd * F.col("sx")
    vary_n = nd * F.col("syy") - syd * F.col("sy")
    return (
        m.where((varx_n > 0) & (vary_n > 0))
        .select(
            "event_type",
            "n",
            round_det(cov_n / varx_n, 6).alias("theta"),
            F.floor(cov_n * cov_n / (varx_n * vary_n) * 1_000_000 + F.lit(0.5))
            .cast("long")
            .alias("var_reduction_ppm"),
        )
        .orderBy("event_type")
    )


q348.__doc__ = q348.__doc__.format(s=CUPED_SPLIT_DAY)


# ------------------------------------- propensity-style caliper matching --
MATCH_CALIPER = 2


def _caliper_sql() -> str:
    return f"""
    WITH ev AS (
        SELECT user_id, event_type,
               epoch_us(ts)//{_CUPED_US_DAY} AS d,
               CAST(floor(COALESCE(value, 0) * 100 + 0.5) AS BIGINT) AS cents
        FROM events
    ),
    base AS (SELECT MIN(d) AS d0 FROM ev),
    per_user AS (
        SELECT user_id,
               CAST(COUNT(*) FILTER (
                   WHERE d - base.d0 < {CUPED_SPLIT_DAY}) AS BIGINT) AS score,
               CAST(SUM(CASE WHEN d - base.d0 >= {CUPED_SPLIT_DAY}
                             THEN cents ELSE 0 END) AS BIGINT) AS y,
               MAX(CASE WHEN event_type = 'purchase'
                        AND d - base.d0 < {CUPED_SPLIT_DAY}
                        THEN 1 ELSE 0 END) AS treated
        FROM ev CROSS JOIN base GROUP BY user_id
    ),
    t AS (SELECT user_id, score, y FROM per_user WHERE treated = 1),
    c AS (SELECT user_id, score, y FROM per_user WHERE treated = 0),
    cand AS (
        SELECT t.user_id AS tid, t.y AS ty, c.user_id AS cid, c.y AS cy,
               abs(t.score - c.score) AS dist
        FROM t JOIN c ON abs(t.score - c.score) <= {MATCH_CALIPER}
    ),
    best AS (
        SELECT tid, ty, cid, cy FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY tid ORDER BY dist, cid) AS rn
            FROM cand)
        WHERE rn = 1
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM t) AS n_treated,
           CAST(COUNT(*) AS BIGINT) AS n_matched,
           CAST((SUM(ty) - SUM(cy)) * 1000 // COUNT(*) AS BIGINT)
             AS att_millicents
    FROM best
    """


@query("q349_caliper_matching", oracle=_caliper_sql())
def q349(spark: SparkSession, sf: str) -> DataFrame:
    """Propensity-style CALIPER MATCHING — the observational-causal
    estimator: each treated user (made a purchase in the pre-period)
    is matched with replacement to the nearest control on a pre-period
    activity score within caliper ±{c}, and the average treatment
    effect on the treated (ATT) is the mean post-period outcome gap
    over matched pairs. Determinism: matching ties break (distance,
    control id) via ROW_NUMBER — classic greedy matching is
    order-dependent; this contract is not. Scale shape: the candidate
    space is generated through an EQUI-join key — treated users
    explode to their {w} caliper buckets and join controls on the
    bucket (the q122/q236 banding pattern), so no score-cross-score
    nested loop; selection is a per-treated window over the bounded
    caliper candidates, and the ATT is one exact integer aggregate
    (truncating division verified identical cross-engine)."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf, "events").select(
        "user_id",
        "event_type",
        F.expr(
            f"unix_micros(cast(ts as timestamp)) div {_CUPED_US_DAY}"
        ).alias("d"),
        F.floor(F.coalesce(F.col("value"), F.lit(0)) * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    base = ev.agg(F.min("d").alias("d0"))
    pre = F.col("d") - F.col("d0") < CUPED_SPLIT_DAY
    per_user = (
        ev.crossJoin(F.broadcast(base))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(pre, 1).otherwise(0)).cast("long").alias("score"),
            F.sum(F.when(~pre, F.col("cents")).otherwise(F.lit(0)))
            .cast("long")
            .alias("y"),
            F.max(
                F.when(
                    (F.col("event_type") == "purchase") & pre, 1
                ).otherwise(0)
            ).alias("treated"),
        )
        .transform(materialize)  # feeds both arms
    )
    t = per_user.where(F.col("treated") == 1).select(
        F.col("user_id").alias("tid"),
        F.col("score").alias("ts_"),
        F.col("y").alias("ty"),
    )
    c = per_user.where(F.col("treated") == 0).select(
        F.col("user_id").alias("cid"),
        F.col("score").alias("cs"),
        F.col("y").alias("cy"),
    )
    t_buckets = t.select(
        "tid",
        "ts_",
        "ty",
        F.explode(
            F.array(
                *[
                    (F.col("ts_") + F.lit(k)).alias("b")
                    for k in range(-MATCH_CALIPER, MATCH_CALIPER + 1)
                ]
            )
        ).alias("b"),
    )
    cand = t_buckets.join(c, F.col("b") == F.col("cs")).select(
        "tid",
        "ty",
        "cid",
        "cy",
        F.abs(F.col("ts_") - F.col("cs")).alias("dist"),
    )
    wv = W.partitionBy("tid").orderBy("dist", "cid")
    best = (
        cand.withColumn("rn", F.row_number().over(wv))
        .where(F.col("rn") == 1)
        .select("tid", "ty", "cid", "cy")
    )
    n_t = t.agg(F.count(F.lit(1)).cast("long").alias("n_treated"))
    return (
        best.agg(
            F.count(F.lit(1)).cast("long").alias("n_matched"),
            F.expr(
                "CAST((SUM(ty) - SUM(cy)) * 1000 div COUNT(*) AS BIGINT)"
            ).alias("att_millicents"),
        )
        .crossJoin(F.broadcast(n_t))
        .select("n_treated", "n_matched", "att_millicents")
    )


q349.__doc__ = q349.__doc__.format(c=MATCH_CALIPER, w=2 * MATCH_CALIPER + 1)


# ------------------------------------------ difference-in-differences -----
def _did_sql() -> str:
    return f"""
    WITH ev AS (
        SELECT user_id, event_type,
               epoch_us(ts)//{_CUPED_US_DAY} AS d,
               CAST(floor(COALESCE(value, 0) * 100 + 0.5) AS BIGINT) AS cents
        FROM events
    ),
    base AS (SELECT MIN(d) AS d0 FROM ev),
    per_user AS (
        SELECT user_id,
               CAST(SUM(CASE WHEN d - base.d0 < {CUPED_SPLIT_DAY}
                             THEN cents ELSE 0 END) AS BIGINT) AS y_pre,
               CAST(SUM(CASE WHEN d - base.d0 >= {CUPED_SPLIT_DAY}
                             THEN cents ELSE 0 END) AS BIGINT) AS y_post,
               MAX(CASE WHEN event_type = 'purchase'
                        AND d - base.d0 < {CUPED_SPLIT_DAY}
                        THEN 1 ELSE 0 END) AS treated
        FROM ev CROSS JOIN base GROUP BY user_id
    ),
    cells AS (
        SELECT treated, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y_pre) AS BIGINT) AS s_pre,
               CAST(SUM(y_post) AS BIGINT) AS s_post
        FROM per_user GROUP BY treated
    ),
    wide AS (
        SELECT MAX(CASE WHEN treated = 1 THEN n END) AS n_t,
               MAX(CASE WHEN treated = 1 THEN s_pre END) AS st_pre,
               MAX(CASE WHEN treated = 1 THEN s_post END) AS st_post,
               MAX(CASE WHEN treated = 0 THEN n END) AS n_c,
               MAX(CASE WHEN treated = 0 THEN s_pre END) AS sc_pre,
               MAX(CASE WHEN treated = 0 THEN s_post END) AS sc_post
        FROM cells
    )
    SELECT n_t AS n_treated, n_c AS n_control,
           CAST((st_post - st_pre) * 1000 // n_t AS BIGINT)
             AS treated_delta_millicents,
           CAST((sc_post - sc_pre) * 1000 // n_c AS BIGINT)
             AS control_delta_millicents,
           CAST((st_post - st_pre) * 1000 // n_t
                - (sc_post - sc_pre) * 1000 // n_c AS BIGINT)
             AS did_millicents
    FROM wide
    """


@query("q350_difference_in_differences", oracle=_did_sql())
def q350(spark: SparkSession, sf: str) -> DataFrame:
    """Difference-in-differences — the third leg of the causal suite
    (q348 CUPED, q349 matching): treated = purchased in the
    pre-period, and the effect estimate is the treated group's
    pre→post outcome change minus the control group's, which nets out
    any shared time trend the single-group before/after comparison
    would absorb. The whole estimator is 2×2 cells of exact
    cent-integer sums — one per-user hash aggregate, one 2-row cell
    aggregate, one pivot row — with every reported delta an exact
    truncating integer division (pinned contract, verified identical
    cross-engine). Parallel-trends is an assumption, not a
    computation; the q327 expanding-window machinery is the placebo
    harness for testing it."""
    ev = load_table(spark, sf, "events").select(
        "user_id",
        "event_type",
        F.expr(
            f"unix_micros(cast(ts as timestamp)) div {_CUPED_US_DAY}"
        ).alias("d"),
        F.floor(F.coalesce(F.col("value"), F.lit(0)) * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    base = ev.agg(F.min("d").alias("d0"))
    pre = F.col("d") - F.col("d0") < CUPED_SPLIT_DAY
    per_user = (
        ev.crossJoin(F.broadcast(base))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(pre, F.col("cents")).otherwise(F.lit(0)))
            .cast("long")
            .alias("y_pre"),
            F.sum(F.when(~pre, F.col("cents")).otherwise(F.lit(0)))
            .cast("long")
            .alias("y_post"),
            F.max(
                F.when(
                    (F.col("event_type") == "purchase") & pre, 1
                ).otherwise(0)
            ).alias("treated"),
        )
    )
    cells = per_user.groupBy("treated").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y_pre").cast("long").alias("s_pre"),
        F.sum("y_post").cast("long").alias("s_post"),
    )
    wide = cells.agg(
        F.max(F.when(F.col("treated") == 1, F.col("n"))).alias("n_t"),
        F.max(F.when(F.col("treated") == 1, F.col("s_pre"))).alias("st_pre"),
        F.max(F.when(F.col("treated") == 1, F.col("s_post"))).alias("st_post"),
        F.max(F.when(F.col("treated") == 0, F.col("n"))).alias("n_c"),
        F.max(F.when(F.col("treated") == 0, F.col("s_pre"))).alias("sc_pre"),
        F.max(F.when(F.col("treated") == 0, F.col("s_post"))).alias("sc_post"),
    )
    td = F.expr("CAST((st_post - st_pre) * 1000 div n_t AS BIGINT)")
    cd = F.expr("CAST((sc_post - sc_pre) * 1000 div n_c AS BIGINT)")
    return wide.select(
        F.col("n_t").alias("n_treated"),
        F.col("n_c").alias("n_control"),
        td.alias("treated_delta_millicents"),
        cd.alias("control_delta_millicents"),
        (td - cd).cast("long").alias("did_millicents"),
    )


# ------------------------------------------------- uplift by decile -------
def _uplift_sql() -> str:
    return f"""
    WITH ev AS (
        SELECT user_id, event_type,
               epoch_us(ts)//{_CUPED_US_DAY} AS d,
               CAST(floor(COALESCE(value, 0) * 100 + 0.5) AS BIGINT) AS cents
        FROM events
    ),
    base AS (SELECT MIN(d) AS d0 FROM ev),
    per_user AS (
        SELECT user_id,
               CAST(COUNT(*) FILTER (
                   WHERE d - base.d0 < {CUPED_SPLIT_DAY}) AS BIGINT) AS score,
               CAST(SUM(CASE WHEN d - base.d0 >= {CUPED_SPLIT_DAY}
                             THEN cents ELSE 0 END) AS BIGINT) AS y,
               MAX(CASE WHEN event_type = 'purchase'
                        AND d - base.d0 < {CUPED_SPLIT_DAY}
                        THEN 1 ELSE 0 END) AS treated
        FROM ev CROSS JOIN base GROUP BY user_id
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM per_user),
    ranked AS (
        SELECT p.*, ROW_NUMBER() OVER (ORDER BY score, user_id) AS r
        FROM per_user p
    ),
    dec AS (
        SELECT treated, y,
               1 + (10 * (r - 1)) // n.n AS decile
        FROM ranked CROSS JOIN n
    )
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(COUNT(*) FILTER (WHERE treated = 1) AS BIGINT) AS n_treated,
           CAST(COUNT(*) FILTER (WHERE treated = 0) AS BIGINT) AS n_control,
           CAST(CASE WHEN COUNT(*) FILTER (WHERE treated = 1) > 0
                THEN SUM(y) FILTER (WHERE treated = 1) * 1000
                     // COUNT(*) FILTER (WHERE treated = 1) END AS BIGINT)
             AS treated_mean_millicents,
           CAST(CASE WHEN COUNT(*) FILTER (WHERE treated = 0) > 0
                THEN SUM(y) FILTER (WHERE treated = 0) * 1000
                     // COUNT(*) FILTER (WHERE treated = 0) END AS BIGINT)
             AS control_mean_millicents
    FROM dec GROUP BY decile ORDER BY decile
    """


@query("q353_uplift_deciles", oracle=_uplift_sql())
def q353(spark: SparkSession, sf: str) -> DataFrame:
    """Uplift-by-decile report — effect HETEROGENEITY on top of the
    causal suite (q348-q350): users ranked by the pre-period activity
    score, cut into exact global deciles, and each decile reports
    treated vs control post-period means so targeting teams see WHERE
    the effect concentrates. The global decile rank is the
    q247-class problem — a partitionless ROW_NUMBER over data-scale
    users is exactly what the plan audit bans — so ranks come from
    ``distributed_cumsum``'s range-exchange machinery (range
    repartition + partition-local window + literal-map offsets), and
    decile = 1 + 10·(rank−1) div n. All reported means are exact
    truncating integer divisions; empty cells stay NULL by pinned
    contract (the oracle's global ROW_NUMBER is the semantic spec,
    not the plan)."""
    from ..functions.refops import distributed_cumsum

    ev = load_table(spark, sf, "events").select(
        "user_id",
        "event_type",
        F.expr(
            f"unix_micros(cast(ts as timestamp)) div {_CUPED_US_DAY}"
        ).alias("d"),
        F.floor(F.coalesce(F.col("value"), F.lit(0)) * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    base = ev.agg(F.min("d").alias("d0"))
    pre = F.col("d") - F.col("d0") < CUPED_SPLIT_DAY
    per_user = (
        ev.crossJoin(F.broadcast(base))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(pre, 1).otherwise(0)).cast("long").alias("score"),
            F.sum(F.when(~pre, F.col("cents")).otherwise(F.lit(0)))
            .cast("long")
            .alias("y"),
            F.max(
                F.when(
                    (F.col("event_type") == "purchase") & pre, 1
                ).otherwise(0)
            ).alias("treated"),
        )
        .withColumn("one", F.lit(1).cast("long"))
    )
    ranked = distributed_cumsum(
        per_user, ["score", "user_id"], "one", name="_cum", rank_name="r"
    )
    n = per_user.agg(F.count(F.lit(1)).cast("long").alias("n"))
    dec = ranked.crossJoin(F.broadcast(n)).select(
        "treated",
        "y",
        (1 + F.expr("(10 * (r - 1)) div n")).cast("long").alias("decile"),
    )
    t_n = F.sum(F.when(F.col("treated") == 1, 1).otherwise(0)).cast("long")
    c_n = F.sum(F.when(F.col("treated") == 0, 1).otherwise(0)).cast("long")
    t_s = F.sum(F.when(F.col("treated") == 1, F.col("y")).otherwise(F.lit(0)))
    c_s = F.sum(F.when(F.col("treated") == 0, F.col("y")).otherwise(F.lit(0)))
    return (
        dec.groupBy("decile")
        .agg(
            t_n.alias("n_treated"),
            c_n.alias("n_control"),
            t_s.alias("_ts"),
            c_s.alias("_cs"),
        )
        .select(
            "decile",
            "n_treated",
            "n_control",
            F.when(
                F.col("n_treated") > 0,
                F.expr("CAST(_ts * 1000 div n_treated AS BIGINT)"),
            ).alias("treated_mean_millicents"),
            F.when(
                F.col("n_control") > 0,
                F.expr("CAST(_cs * 1000 div n_control AS BIGINT)"),
            ).alias("control_mean_millicents"),
        )
        .orderBy("decile")
    )


# ------------------------------------------ 1-D Wasserstein (EMD) drift ---
def _emd_sql() -> str:
    return """
    WITH r AS (
        SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS x,
               CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g1,
               CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS g2
        FROM events WHERE event_type IN ('click', 'view')
    ),
    g AS (
        SELECT x, CAST(SUM(g1) AS BIGINT) AS d1, CAST(SUM(g2) AS BIGINT) AS d2
        FROM r GROUP BY x
    ),
    c AS (
        SELECT x,
               CAST(SUM(d1) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS c1,
               CAST(SUM(d2) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS c2,
               CAST(SUM(d1) OVER () AS BIGINT) AS n1,
               CAST(SUM(d2) OVER () AS BIGINT) AS n2,
               LEAD(x) OVER (ORDER BY x) AS nx
        FROM g
    ),
    s AS (
        SELECT CAST(SUM(ABS(c1 * n2 - c2 * n1) * (nx - x)) AS BIGINT)
                 AS emd_num,
               MAX(n1) AS n1, MAX(n2) AS n2
        FROM c WHERE nx IS NOT NULL
    )
    SELECT emd_num, n1, n2,
           CAST(emd_num // (n1 * n2) * 1000
                + (emd_num % (n1 * n2)) * 1000 // (n1 * n2) AS BIGINT)
             AS emd_millicents
    FROM s
    """


@query("q359_wasserstein_drift", oracle=_emd_sql())
def q359(spark: SparkSession, sf: str) -> DataFrame:
    """1-D Wasserstein distance (earth-mover's) between the click and
    view value distributions — the drift metric that, unlike q309's KS
    (max CDF gap, location-sensitive only), integrates the WHOLE CDF
    gap weighted by how far mass must move: EMD = Σ |F1−F2|·Δx over
    the support. Every term is exact: cross-scaled cumulative counts
    (|c1·n2 − c2·n1|, no division) times the exact cent-width to the
    next support point, summed in BIGINT; the reported millicent
    distance splits the division into quotient and remainder so
    nothing overflows and nothing floats. Same scale shape as q309:
    one hash aggregate to the cent support, cumulative windows over
    the bounded support table (GLOBAL_WINDOW_OK class), a 1-row
    summary."""
    r = (
        load_table(spark, sf, "events")
        .where(F.col("event_type").isin("click", "view"))
        .select(
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("x"),
            F.when(F.col("event_type") == "click", 1).otherwise(0).alias("g1"),
            F.when(F.col("event_type") == "view", 1).otherwise(0).alias("g2"),
        )
    )
    g = r.groupBy("x").agg(
        F.sum("g1").cast("long").alias("d1"),
        F.sum("g2").cast("long").alias("d2"),
    )
    from pyspark.sql import Window as W

    w_cum = W.orderBy("x").rowsBetween(W.unboundedPreceding, 0)
    w_all = W.orderBy("x").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    c = g.select(
        "x",
        F.sum("d1").over(w_cum).cast("long").alias("c1"),
        F.sum("d2").over(w_cum).cast("long").alias("c2"),
        F.sum("d1").over(w_all).cast("long").alias("n1"),
        F.sum("d2").over(w_all).cast("long").alias("n2"),
        F.lead("x").over(W.orderBy("x")).alias("nx"),
    )
    s = c.where(F.col("nx").isNotNull()).agg(
        F.sum(
            F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1"))
            * (F.col("nx") - F.col("x"))
        )
        .cast("long")
        .alias("emd_num"),
        F.max("n1").alias("n1"),
        F.max("n2").alias("n2"),
    )
    return s.select(
        "emd_num",
        "n1",
        "n2",
        F.expr(
            "CAST(emd_num div (n1 * n2) * 1000"
            " + (emd_num % (n1 * n2)) * 1000 div (n1 * n2) AS BIGINT)"
        ).alias("emd_millicents"),
    )


# ------------------------------------------- Theil-Sen robust trend -------
@query(
    "q361_theil_sen_slope",
    oracle="""
    WITH d AS (
        SELECT user_id,
               CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day,
               CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events GROUP BY user_id, day
    ),
    p AS (
        SELECT a.user_id,
               CAST(floor(CAST((b.cents - a.cents) * 1000000 AS DOUBLE)
                          / (b.day - a.day)) AS BIGINT) AS slope_q
        FROM d a JOIN d b
          ON a.user_id = b.user_id AND b.day > a.day
    ),
    r AS (
        SELECT user_id, slope_q,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY slope_q)
                   AS rn,
               COUNT(*) OVER (PARTITION BY user_id) AS n_pairs
        FROM p
    )
    SELECT r.user_id,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM d
            WHERE d.user_id = r.user_id) AS n_days,
           CAST(n_pairs AS BIGINT) AS n_pairs,
           slope_q AS ts_slope_q
    FROM r WHERE rn = (n_pairs + 1) // 2
    ORDER BY user_id
    """,
)
def q361(spark: SparkSession, sf: str) -> DataFrame:
    """Theil-Sen robust trend per user — the MEDIAN of all pairwise
    day-over-day slopes of daily spend, the standard robust twin of
    q164's least-squares slope (one corrupted day drags OLS arbitrarily
    far; Theil-Sen tolerates ~29% outliers). Docstring names the
    cousin: q164 fits the same (day, cents) series by closed-form OLS
    moments; this query ranks the pairwise-slope distribution instead.

    Exactness: inputs quantize to integer (day index, summed cents), so
    every pairwise slope is one IEEE division of exact integers — both
    engines' correctly-rounded doubles agree bit-for-bit — floored to a
    1e-6 grid; the median is the LOWER median (rank ``(n+1) div 2``),
    selected by rank so no float averaging of middle elements.

    Scale shape: the pair space is (days choose 2) PER USER — bounded
    by the calendar window (≤ 435 pairs per user-month), never
    O(events²): events first collapse to one row per (user, day) via a
    hash aggregate, and the self-join is an equi-join on user_id whose
    per-key fan-out is calendar-bounded. Median selection is a
    per-user window over those bounded pairs, not a global sort."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf, "events")
    d = (
        ev.select(
            "user_id",
            F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000)
            .cast("long")
            .alias("day"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c"),
        )
        .groupBy("user_id", "day")
        .agg(F.sum("c").cast("long").alias("cents"))
    )
    a = d.alias("a")
    b = d.alias("b")
    pairs = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("b.day") > F.col("a.day")),
    ).select(
        F.col("a.user_id").alias("user_id"),
        F.floor(
            ((F.col("b.cents") - F.col("a.cents")) * 1_000_000).cast("double")
            / (F.col("b.day") - F.col("a.day"))
        )
        .cast("long")
        .alias("slope_q"),
    )
    wr = W.partitionBy("user_id").orderBy("slope_q")
    wc = W.partitionBy("user_id")
    ranked = pairs.select(
        "user_id",
        "slope_q",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n_pairs"),
    )
    n_days = d.groupBy("user_id").agg(F.count(F.lit(1)).cast("long").alias("n_days"))
    med = ranked.where(
        F.col("rn") == F.floor((F.col("n_pairs") + 1) / 2).cast("long")
    )
    return (
        med.join(n_days, "user_id")
        .select(
            "user_id",
            "n_days",
            F.col("n_pairs").cast("long").alias("n_pairs"),
            F.col("slope_q").alias("ts_slope_q"),
        )
        .orderBy("user_id")
    )


# ------------------------------------ raking (IPF) survey reweighting -----
@query(
    "q369_raking_ipf",
    oracle="""
    WITH cells AS (
        SELECT c.c_mktsegment AS segment, o.o_orderpriority AS priority,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY segment, priority
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM cells),
    rs AS (SELECT segment, CAST(SUM(n) AS BIGINT) AS s_r
           FROM cells GROUP BY segment),
    w1 AS (
        SELECT c.segment, c.priority, c.n,
               CAST(floor(CAST(c.n AS DOUBLE) * CAST(t.nn AS DOUBLE)
                          / (5.0 * CAST(r.s_r AS DOUBLE)) * 1000000.0)
                    AS BIGINT) AS w1q
        FROM cells c JOIN rs r ON c.segment = r.segment, tot t
    ),
    cs AS (SELECT priority, CAST(SUM(w1q) AS BIGINT) AS s_c
           FROM w1 GROUP BY priority),
    w2 AS (
        SELECT w.segment, w.priority, w.n, w.w1q,
               CAST(floor(CAST(w.w1q AS DOUBLE)
                          * (CAST(t.nn AS DOUBLE) * 1000000.0)
                          / (5.0 * CAST(c.s_c AS DOUBLE))) AS BIGINT) AS w2q
        FROM w1 w JOIN cs c ON w.priority = c.priority, tot t
    ),
    rg AS (SELECT segment, CAST(SUM(w2q) AS BIGINT) AS s2_r
           FROM w2 GROUP BY segment)
    SELECT w.segment, w.priority, w.n,
           w.w1q AS w1_ppm, w.w2q AS w2_ppm,
           CAST(5 * g.s2_r - CAST(t.nn AS BIGINT) * 1000000 AS BIGINT)
               AS row_gap_scaled
    FROM w2 w JOIN rg g ON w.segment = g.segment, tot t
    ORDER BY w.segment, w.priority
    """,
)
def q369(spark: SparkSession, sf: str) -> DataFrame:
    """Raking (iterative proportional fitting) of the (segment ×
    priority) contingency table to uniform target margins — the survey
    post-stratification weighting every analytics team eventually
    ships: scale cell weights so row margins hit target (round 1),
    then column margins (round 2, which perturbs the rows again; the
    reported row_gap is exactly that residual, the quantity IPF drives
    to zero as rounds continue). Weights live on an exact ppm integer
    grid from round 1 onward, so the cross-cell re-sums that feed each
    round are BIGINT — associative in any partition order — and every
    float step is one pinned IEEE sequence on exact integer inputs,
    identical in both engines; the residual gap is reported exactly
    (scaled ×5, so the N/5 rational target never floats).

    Scale: ONE data-scale hash aggregate (orders⋈customer → 25
    cells); every subsequent margin sum, rescale, and gap is
    arithmetic on the bounded cell table with 1-row/5-row broadcast
    joins. More raking rounds cost zero additional passes over data."""
    orders = load_table(spark, sf, "orders")
    cust = load_table(spark, sf, "customer")
    cells = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .transform(materialize)
    )
    tot = cells.agg(F.sum("n").cast("long").alias("nn"))
    rs = cells.groupBy("segment").agg(F.sum("n").cast("long").alias("s_r"))
    w1 = (
        cells.join(F.broadcast(rs), "segment")
        .crossJoin(F.broadcast(tot))
        .select(
            "segment",
            "priority",
            "n",
            "nn",
            F.floor(
                F.col("n").cast("double")
                * F.col("nn").cast("double")
                / (F.lit(5.0) * F.col("s_r").cast("double"))
                * F.lit(1000000.0)
            )
            .cast("long")
            .alias("w1q"),
        )
    )
    cs = w1.groupBy("priority").agg(F.sum("w1q").cast("long").alias("s_c"))
    w2 = w1.join(F.broadcast(cs), "priority").select(
        "segment",
        "priority",
        "n",
        "nn",
        "w1q",
        F.floor(
            F.col("w1q").cast("double")
            * (F.col("nn").cast("double") * F.lit(1000000.0))
            / (F.lit(5.0) * F.col("s_c").cast("double"))
        )
        .cast("long")
        .alias("w2q"),
    )
    rg = w2.groupBy("segment").agg(F.sum("w2q").cast("long").alias("s2_r"))
    return (
        w2.join(F.broadcast(rg), "segment")
        .select(
            "segment",
            "priority",
            "n",
            F.col("w1q").alias("w1_ppm"),
            F.col("w2q").alias("w2_ppm"),
            (F.lit(5) * F.col("s2_r") - F.col("nn") * F.lit(1000000))
            .cast("long")
            .alias("row_gap_scaled"),
        )
        .orderBy("segment", "priority")
    )


# ----------------------------------------- rank-biased overlap (RBO) ------
RBO_K = 50
RBO_P = 0.9
# per-depth weights (1-p)·p^(d-1)/d on a 1e12 integer grid, minted ONCE
# host-side (no engine evaluates pow — the no-libm rule); suffix sums give
# each common item's TOTAL contribution from the depth it first appears in
# both prefixes: sum_{d>=m} w_d, m = max(rank_a, rank_b).
_RBO_W = [
    round((1 - RBO_P) * RBO_P ** (d - 1) / d * 1e12) for d in range(1, RBO_K + 1)
]
_RBO_SUFFIX = [sum(_RBO_W[d:]) for d in range(RBO_K)]


def _rbo_sql() -> str:
    vals = ", ".join(f"({d + 1}, {s})" for d, s in enumerate(_RBO_SUFFIX))
    return f"""
    WITH rev AS (
        SELECT l_partkey AS partkey,
               CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS v
        FROM lineitem GROUP BY l_partkey
    ),
    qty AS (
        SELECT l_partkey AS partkey,
               CAST(SUM(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT)
                   AS v
        FROM lineitem GROUP BY l_partkey
    ),
    ra AS (
        SELECT partkey, ROW_NUMBER() OVER (ORDER BY v DESC, partkey) AS r
        FROM rev QUALIFY r <= {RBO_K}
    ),
    rb AS (
        SELECT partkey, ROW_NUMBER() OVER (ORDER BY v DESC, partkey) AS r
        FROM qty QUALIFY r <= {RBO_K}
    ),
    common AS (
        SELECT ra.partkey, greatest(ra.r, rb.r) AS m
        FROM ra JOIN rb ON ra.partkey = rb.partkey
    ),
    s AS (
        SELECT c.partkey, w.sw
        FROM common c JOIN (VALUES {vals}) w(d, sw) ON w.d = c.m
    )
    SELECT CAST({RBO_K} AS BIGINT) AS k,
           CAST(COUNT(*) AS BIGINT) AS n_common,
           CAST(COALESCE(SUM(sw), 0) // 1000000 AS BIGINT) AS rbo_ppm
    FROM s
    """


@query("q370_rank_biased_overlap", oracle=_rbo_sql())
def q370(spark: SparkSession, sf: str) -> DataFrame:
    """Rank-biased overlap (RBO@{k}, p={p}) between the revenue top-{k}
    and quantity top-{k} part rankings — the TOP-WEIGHTED agreement
    measure that completes the ranking family: q326's Spearman treats
    every rank equally and q325's RRF FUSES lists; RBO answers "do the
    two rankings agree where it matters — at the top?", the question a
    relevance regression gate actually asks.

    The geometric depth weights (1−p)p^(d−1)/d are minted once
    host-side on a 1e12 integer grid (no engine pow — the q363
    discipline), and the depth sum collapses analytically: an item in
    both prefixes first counts at depth m = max(rank_a, rank_b) and
    contributes every deeper depth, i.e. exactly the precomputed
    SUFFIX weight at m — so the whole statistic is one equi-join of
    two 50-row lists + a literal-map lookup + one BIGINT sum. No
    per-depth explode, no float ever.

    Scale: two part-key hash aggregates (catalog-bounded) feed two
    TakeOrdered-{k} lists; everything after is O(k). The rank windows
    run over the {k}-row LIMIT frames (q325 class)."""
    li = load_table(spark, sf, "lineitem")
    rev = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.sum(F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long"))
        .cast("long")
        .alias("v")
    )
    qty = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.sum(F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long"))
        .cast("long")
        .alias("v")
    )
    from pyspark.sql import Window as W

    def topk(df: DataFrame) -> DataFrame:
        lim = df.orderBy(F.desc("v"), "partkey").limit(RBO_K)
        return lim.select(
            "partkey",
            F.row_number().over(W.orderBy(F.desc("v"), "partkey")).alias("r"),
        )

    ra, rb = topk(rev).alias("ra"), topk(qty).alias("rb")
    suffix_map = F.create_map(
        *[F.lit(x) for d, s in enumerate(_RBO_SUFFIX) for x in (d + 1, s)]
    )
    common = ra.join(rb, F.col("ra.partkey") == F.col("rb.partkey")).select(
        F.greatest(F.col("ra.r"), F.col("rb.r")).alias("m")
    )
    return common.select(suffix_map[F.col("m")].alias("sw")).agg(
        F.lit(RBO_K).cast("long").alias("k"),
        F.count(F.lit(1)).cast("long").alias("n_common"),
        F.expr("CAST(coalesce(SUM(sw), 0) div 1000000 AS BIGINT)").alias(
            "rbo_ppm"
        ),
    )


q370.__doc__ = q370.__doc__.format(k=RBO_K, p=RBO_P)


# ------------------------------------- forecast backtest (seasonal naive) --
@query(
    "q371_forecast_backtest",
    oracle="""
    WITH d AS (
        SELECT event_type,
               CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day,
               CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events GROUP BY event_type, day
    ),
    j AS (
        SELECT a.event_type, a.day, a.cents AS actual, f.cents AS fcst
        FROM d a JOIN d f
          ON a.event_type = f.event_type AND f.day = a.day - 7
    ),
    t AS (
        SELECT event_type, actual, fcst,
               ABS(fcst - actual) AS ae,
               CASE WHEN ABS(fcst) + ABS(actual) = 0 THEN 0
                    ELSE (ABS(fcst - actual) * 2000000)
                         // (ABS(fcst) + ABS(actual)) END AS smape_t
        FROM j
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(ae) * 1000 // COUNT(*) AS BIGINT) AS mae_millicents,
           CAST(SUM(smape_t) // COUNT(*) AS BIGINT) AS smape_ppm,
           CAST(SUM(fcst - actual) AS BIGINT) AS bias_cents
    FROM t GROUP BY event_type ORDER BY event_type
    """,
)
def q371(spark: SparkSession, sf: str) -> DataFrame:
    """Forecast backtest for the seasonal-naive baseline (ŷ_d = actual
    value one week earlier) on per-type daily revenue — the evaluation
    harness every forecasting pipeline needs BEFORE any model ships:
    seasonal-naive is the no-skill floor (M-competition practice), and
    a model that can't beat its MAE/sMAPE has no business in
    production. Completes the time-series family as its EVALUATOR:
    q314 builds the seasonal index, q262/q298 smooth and changepoint —
    none of them score a forecast.

    Calendar honesty: the lag is a self-JOIN on (type, day−7), not a
    LAG(7) window — a missing day must yield no forecast, not the
    value from 7 ROWS back. Exactness: daily cents are integer sums;
    MAE (millicents), sMAPE (ppm, per-day integer terms so the mean
    is order-free), and signed bias are all BIGINT floor arithmetic —
    no float anywhere.

    Scale: one hash aggregate to (type, day) — calendar-bounded — and
    a keyed self-join + final aggregate on that bounded table. The
    data-scale pass is the first aggregate only."""
    ev = load_table(spark, sf, "events")
    d = (
        ev.select(
            "event_type",
            F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000)
            .cast("long")
            .alias("day"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("c"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("c").cast("long").alias("cents"))
    )
    a, f = d.alias("a"), d.alias("f")
    j = a.join(
        f,
        (F.col("a.event_type") == F.col("f.event_type"))
        & (F.col("f.day") == F.col("a.day") - 7),
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.col("a.cents").alias("actual"),
        F.col("f.cents").alias("fcst"),
    )
    ae = F.abs(F.col("fcst") - F.col("actual"))
    denom = F.abs(F.col("fcst")) + F.abs(F.col("actual"))
    t = j.select(
        "event_type",
        "actual",
        "fcst",
        ae.alias("ae"),
        F.when(denom == 0, F.lit(0))
        .otherwise(F.expr("(ABS(fcst - actual) * 2000000) div (ABS(fcst) + ABS(actual))"))
        .cast("long")
        .alias("smape_t"),
    )
    return (
        t.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.expr("CAST(SUM(ae) * 1000 div COUNT(*) AS BIGINT)").alias(
                "mae_millicents"
            ),
            F.expr("CAST(SUM(smape_t) div COUNT(*) AS BIGINT)").alias("smape_ppm"),
            F.sum(F.col("fcst") - F.col("actual")).cast("long").alias("bias_cents"),
        )
        .orderBy("event_type")
    )


# ------------------------------- seat apportionment (Hamilton vs D'Hondt) --
APPORTION_SEATS = 1000
_DH_Q = 10**12  # quotient grid: (votes * 1e12) div k, exact BIGINT both engines


@query(
    "q375_apportionment",
    oracle=f"""
    WITH v AS (
        SELECT n.n_name, CAST(COUNT(*) AS BIGINT) AS votes
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    ),
    tot AS (SELECT CAST(SUM(votes) AS BIGINT) AS vt FROM v),
    ham AS (
        SELECT n_name, votes,
               ({APPORTION_SEATS} * votes) // vt AS base,
               ({APPORTION_SEATS} * votes) % vt AS rem
        FROM v CROSS JOIN tot
    ),
    lv AS (SELECT CAST({APPORTION_SEATS} - SUM(base) AS BIGINT) AS leftover
           FROM ham),
    hseats AS (
        SELECT n_name, votes,
               CAST(base + CASE WHEN ROW_NUMBER() OVER
                        (ORDER BY rem DESC, n_name) <= leftover
                    THEN 1 ELSE 0 END AS BIGINT) AS hamilton_seats
        FROM ham CROSS JOIN lv
    ),
    quot AS (
        SELECT n_name, (votes * {_DH_Q}) // k.k AS q, k.k
        FROM v CROSS JOIN (SELECT unnest(range(1, {APPORTION_SEATS} + 1)) AS k) k
    ),
    dh AS (
        SELECT n_name, ROW_NUMBER() OVER (ORDER BY q DESC, n_name, k) AS rn
        FROM quot
    ),
    dseats AS (
        SELECT n_name, CAST(COUNT(*) AS BIGINT) AS dhondt_seats
        FROM dh WHERE rn <= {APPORTION_SEATS} GROUP BY n_name
    )
    SELECT h.n_name, h.votes, h.hamilton_seats,
           CAST(COALESCE(d.dhondt_seats, 0) AS BIGINT) AS dhondt_seats,
           CAST(h.hamilton_seats - COALESCE(d.dhondt_seats, 0) AS BIGINT)
               AS seat_diff
    FROM hseats h LEFT JOIN dseats d ON h.n_name = d.n_name
    ORDER BY h.n_name
    """,
)
def q375(spark: SparkSession, sf: str) -> DataFrame:
    """Proportional seat apportionment of {s} budget slots across nations
    by order volume, computed under BOTH classic methods side by side:
    Hamilton (largest remainder — floor quota, leftovers to the biggest
    remainders) and D'Hondt (highest averages — the k-th seat costs
    votes/k, top {s} quotients win). The per-nation seat_diff column IS
    the apportionment-paradox report: the two methods disagree on small
    parties by design, and a capacity planner dividing shard budgets,
    sampling quotas (q308 Neyman is the variance-weighted cousin; q369
    raking adjusts WEIGHTS, this allocates INDIVISIBLE units) or ad
    slots needs to see where. Every division rides an exact integer
    grid: Hamilton on (S*v) div/mod V, D'Hondt on (v*1e12) div k —
    deterministic floor division in both engines, ties pinned by name
    then seat index.

    Scale: ONE data-scale pass (orders⋈customer keyed join → nation
    hash agg); everything after lives on the 25-row nation table — the
    D'Hondt quotient explosion is 25×{s} bounded rows (GLOBAL_WINDOW_OK
    class), the total and leftover are 1-row broadcast scalars."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf, "orders").select("o_custkey")
    c = load_table(spark, sf, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf, "nation").select("n_nationkey", "n_name")
    v = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).cast("long").alias("votes"))
    )
    tot = v.agg(F.sum("votes").cast("long").alias("vt"))
    ham = v.crossJoin(F.broadcast(tot)).select(
        "n_name",
        "votes",
        F.expr(f"({APPORTION_SEATS} * votes) div vt").alias("base"),
        F.expr(f"({APPORTION_SEATS} * votes) % vt").alias("rem"),
    )
    lv = ham.agg(
        (F.lit(APPORTION_SEATS) - F.sum("base")).cast("long").alias("leftover")
    )
    wr = W.orderBy(F.desc("rem"), "n_name")
    hseats = (
        ham.crossJoin(F.broadcast(lv))
        .select(
            "n_name",
            "votes",
            (
                F.col("base")
                + F.when(F.row_number().over(wr) <= F.col("leftover"), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("hamilton_seats"),
        )
    )
    quot = v.select(
        "n_name",
        F.explode(F.sequence(F.lit(1), F.lit(APPORTION_SEATS))).alias("k"),
        "votes",
    ).select(
        "n_name", F.expr(f"(votes * {_DH_Q}) div k").alias("q"), "k"
    )
    wd = W.orderBy(F.desc("q"), "n_name", "k")
    dseats = (
        quot.select("n_name", F.row_number().over(wd).alias("rn"))
        .where(F.col("rn") <= APPORTION_SEATS)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).cast("long").alias("dhondt_seats"))
    )
    return (
        hseats.join(dseats, "n_name", "left")
        .select(
            "n_name",
            "votes",
            "hamilton_seats",
            F.coalesce("dhondt_seats", F.lit(0)).cast("long").alias("dhondt_seats"),
            (
                F.col("hamilton_seats") - F.coalesce("dhondt_seats", F.lit(0))
            )
            .cast("long")
            .alias("seat_diff"),
        )
        .orderBy("n_name")
    )


q375.__doc__ = q375.__doc__.format(s=APPORTION_SEATS)


# ----------------------------- market concentration (HHI + CR4) per region --
_CR_SALTS = 64  # two-phase top-k fan-in: per-(region, salt) top-4 candidates


@query(
    "q379_market_concentration",
    oracle="""
    WITH rev AS (
        SELECT l_suppkey,
               CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100
                                   + 0.5) AS BIGINT)) AS BIGINT) AS cents
        FROM lineitem GROUP BY l_suppkey
    ),
    geo AS (
        SELECT rv.l_suppkey, rv.cents, s.s_name, r.r_name
        FROM rev rv
        JOIN supplier s ON rv.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
    ),
    tot AS (
        SELECT r_name, CAST(SUM(cents) AS BIGINT) AS rtot,
               CAST(COUNT(*) AS BIGINT) AS n_suppliers
        FROM geo GROUP BY r_name
    ),
    sh AS (
        SELECT g.r_name, g.cents, g.s_name,
               (g.cents * 1000000) // t.rtot AS share_ppm,
               ROW_NUMBER() OVER (PARTITION BY g.r_name
                    ORDER BY g.cents DESC, g.l_suppkey) AS rk
        FROM geo g JOIN tot t ON g.r_name = t.r_name
    )
    SELECT t.r_name, t.n_suppliers, t.rtot AS revenue_cents,
           CAST(SUM(s.share_ppm * s.share_ppm) // 1000000 AS BIGINT)
               AS hhi_ppm,
           CAST(SUM(CASE WHEN s.rk <= 4 THEN s.cents ELSE 0 END)
                * 1000000 // t.rtot AS BIGINT) AS cr4_ppm,
           MIN(CASE WHEN s.rk = 1 THEN s.s_name END) AS top_supplier
    FROM sh s JOIN tot t ON s.r_name = t.r_name
    GROUP BY t.r_name, t.n_suppliers, t.rtot
    ORDER BY t.r_name
    """,
)
def q379(spark: SparkSession, sf: str) -> DataFrame:
    """Market-concentration report per region: Herfindahl-Hirschman
    index (sum of squared supplier revenue shares — the antitrust
    screen; >2500 points = highly concentrated, here on a ppm grid) and
    CR4 (top-4 concentration ratio), plus the leading supplier. q310's
    Gini measures INEQUALITY of the whole distribution; HHI/CR4 measure
    CONCENTRATION at the top — the two answer different regulatory
    questions and share no machinery. Shares ride the exact integer ppm
    grid (cents*1e6 div region_total) so the squared sum is pure BIGINT
    arithmetic in both engines.

    Scale: supplier revenue is one hash agg on l_suppkey; dims broadcast.
    The only rank is top-4-per-region over just 5 regions — a
    hot-partition window at 100 TB — so the plan runs the SALTED
    two-phase top-k: per-(region, salt-64) top-4 candidates first
    (parallel across 320 partitions), then the true top-4 over the
    ≤1280-row candidate table; any global top-4 row is top-4 in its salt
    bucket, so the phases are lossless. HHI itself needs no rank — share
    arithmetic after a 5-row broadcast of region totals."""
    from pyspark.sql import Window as W

    from ..functions.text import h64

    li = load_table(spark, sf, "lineitem")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            F.floor(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
                + F.lit(0.5)
            ).cast("long")
        )
        .cast("long")
        .alias("cents")
    )
    s = load_table(spark, sf, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    n = load_table(spark, sf, "nation").select("n_nationkey", "n_regionkey")
    r = load_table(spark, sf, "region").select("r_regionkey", "r_name")
    geo = (
        rev.join(s, rev.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("l_suppkey", "cents", "s_name", "r_name")
    )
    tot = geo.groupBy("r_name").agg(
        F.sum("cents").cast("long").alias("rtot"),
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
    )
    salt = F.pmod(h64(F.col("l_suppkey").cast("string")), F.lit(_CR_SALTS))
    w1 = W.partitionBy("r_name", "_salt").orderBy(
        F.desc("cents"), "l_suppkey"
    )
    cand = (
        geo.withColumn("_salt", salt)
        .withColumn("_rk1", F.row_number().over(w1))
        .where(F.col("_rk1") <= 4)
        .drop("_rk1", "_salt")
    )
    w2 = W.partitionBy("r_name").orderBy(F.desc("cents"), "l_suppkey")
    top4 = (
        cand.withColumn("rk", F.row_number().over(w2))
        .where(F.col("rk") <= 4)
        .groupBy("r_name")
        .agg(
            F.sum("cents").cast("long").alias("top4_cents"),
            F.min(F.when(F.col("rk") == 1, F.col("s_name"))).alias(
                "top_supplier"
            ),
        )
    )
    sh = geo.join(F.broadcast(tot), "r_name").select(
        "r_name", F.expr("(cents * 1000000) div rtot").alias("share_ppm")
    )
    hhi = sh.groupBy("r_name").agg(
        F.expr("CAST(SUM(share_ppm * share_ppm) div 1000000 AS BIGINT)").alias(
            "hhi_ppm"
        )
    )
    return (
        tot.join(hhi, "r_name")
        .join(top4, "r_name")
        .select(
            "r_name",
            "n_suppliers",
            F.col("rtot").alias("revenue_cents"),
            "hhi_ppm",
            F.expr("CAST(top4_cents * 1000000 div rtot AS BIGINT)").alias(
                "cr4_ppm"
            ),
            "top_supplier",
        )
        .orderBy("r_name")
    )


# --------------------------- Hellinger / Bhattacharyya distribution drift --
@query(
    "q384_hellinger_drift",
    oracle="""
    WITH ev AS (
        SELECT event_type AS g,
               CAST(floor(value * 100 + 0.5) AS BIGINT) // 100 AS bin,
               CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day
        FROM events WHERE value IS NOT NULL
    ),
    mid AS (SELECT (MIN(day) + MAX(day) + 1) // 2 AS m FROM ev),
    cells AS (
        SELECT g, bin,
               CAST(COUNT(*) FILTER (WHERE day < m) AS BIGINT) AS n1,
               CAST(COUNT(*) FILTER (WHERE day >= m) AS BIGINT) AS n2
        FROM ev CROSS JOIN mid GROUP BY g, bin
    ),
    terms AS (
        SELECT g, n1, n2,
               CAST(floor(sqrt(CAST(n1 * n2 AS DOUBLE)) * 1000000000 + 0.5)
                    AS BIGINT) AS q
        FROM cells
    ),
    s AS (
        SELECT g, CAST(SUM(n1) AS BIGINT) AS na, CAST(SUM(n2) AS BIGINT) AS nb,
               CAST(COUNT(*) AS BIGINT) AS n_bins,
               CAST(SUM(q) AS BIGINT) AS sq
        FROM terms GROUP BY g
    ),
    f AS (
        SELECT g, na, nb, n_bins,
               (CAST(sq AS DOUBLE) / 1e9) / sqrt(CAST(na * nb AS DOUBLE))
                   AS bc
        FROM s
    )
    SELECT g AS event_type, na AS n_first, nb AS n_second, n_bins,
           floor(bc * 1000000000 + 0.5) / 1000000000 AS bhattacharyya,
           floor(sqrt(greatest(0.0, 1.0 - bc)) * 1000000000 + 0.5)
               / 1000000000 AS hellinger
    FROM f ORDER BY event_type
    """,
)
def q384(spark: SparkSession, sf: str) -> DataFrame:
    """Hellinger distance (and Bhattacharyya coefficient) per event type
    between the first and second half of the observation window — the
    BIN-BASED drift metric completing the drift family: q309's KS reads
    the max CDF gap, q359's Wasserstein the transport cost; Hellinger
    is bounded [0,1], symmetric, and — unlike both — built from
    per-bin terms sqrt(p_i·q_i), so partial per-bin counts MERGE
    (q209's contract) and the metric can be maintained incrementally
    where KS/Wasserstein need the full sorted support. It is also the
    log-free drift score: PSI/KL blow up on empty bins, Hellinger
    handles them natively (sqrt(0·q) = 0).

    Cross-engine exactness: per-bin terms are sqrt(n1·n2) — BIGINT
    product, one IEEE-exact sqrt — quantized to 1e-9 BIGINT units
    BEFORE the sum (q328's discipline: float sums are order-dependent,
    integer sums are not); the normalization divides once by
    sqrt(na·nb) with a pinned op sequence, and outputs round on the
    same 1e-9 grid. The day split point is (min+max+1)/2 computed from
    the data, a 1-row broadcast.

    Scale: one hash aggregate to the (type, dollar-bin) support, a
    1-row scalar broadcast, one final per-type aggregate. Nothing
    data-scale after the first groupBy."""
    ev = load_table(spark, sf, "events").where(F.col("value").isNotNull())
    e = ev.select(
        F.col("event_type").alias("g"),
        F.expr(
            "CAST(floor(value * 100 + 0.5) AS BIGINT) div 100"
        ).alias("bin"),
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(86_400_000_000)
        )
        .cast("long")
        .alias("day"),
    )
    mid = e.agg(
        F.expr("CAST((MIN(day) + MAX(day) + 1) div 2 AS BIGINT)").alias("m")
    )
    cells = (
        e.crossJoin(F.broadcast(mid))
        .groupBy("g", "bin")
        .agg(
            F.sum(F.when(F.col("day") < F.col("m"), 1).otherwise(0))
            .cast("long")
            .alias("n1"),
            F.sum(F.when(F.col("day") >= F.col("m"), 1).otherwise(0))
            .cast("long")
            .alias("n2"),
        )
    )
    terms = cells.select(
        "g",
        "n1",
        "n2",
        F.floor(
            F.sqrt((F.col("n1") * F.col("n2")).cast("double")) * F.lit(1e9)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("q"),
    )
    s = terms.groupBy("g").agg(
        F.sum("n1").cast("long").alias("na"),
        F.sum("n2").cast("long").alias("nb"),
        F.count(F.lit(1)).cast("long").alias("n_bins"),
        F.sum("q").cast("long").alias("sq"),
    )
    bc = (F.col("sq").cast("double") / F.lit(1e9)) / F.sqrt(
        (F.col("na") * F.col("nb")).cast("double")
    )
    return s.select(
        F.col("g").alias("event_type"),
        F.col("na").alias("n_first"),
        F.col("nb").alias("n_second"),
        "n_bins",
        (F.floor(bc * F.lit(1e9) + F.lit(0.5)) / F.lit(1e9)).alias(
            "bhattacharyya"
        ),
        (
            F.floor(
                F.sqrt(F.greatest(F.lit(0.0), F.lit(1.0) - bc)) * F.lit(1e9)
                + F.lit(0.5)
            )
            / F.lit(1e9)
        ).alias("hellinger"),
    ).orderBy("event_type")


# ----------------------------- lead-lag cross-correlation of daily series --
XCORR_MAX_LAG = 3


@query(
    "q385_lead_lag_xcorr",
    oracle=f"""
    WITH d AS (
        SELECT event_type AS g,
               CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day,
               CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                   AS c
        FROM events WHERE value IS NOT NULL GROUP BY g, day
    ),
    bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM d),
    spine AS (
        SELECT t.g, s.day
        FROM (SELECT DISTINCT g FROM d) t,
             (SELECT unnest(range(lo, hi + 1)) AS day FROM bounds) s
    ),
    s AS (
        SELECT spine.g, spine.day, CAST(COALESCE(d.c, 0) AS BIGINT) AS c
        FROM spine LEFT JOIN d ON d.g = spine.g AND d.day = spine.day
    ),
    lags AS (SELECT unnest(range(-{XCORR_MAX_LAG}, {XCORR_MAX_LAG} + 1))
                 AS lag),
    p AS (
        SELECT a.g AS ga, b.g AS gb, l.lag, a.c AS x, b.c AS y
        FROM s a CROSS JOIN lags l
        JOIN s b ON b.g > a.g AND b.day = a.day + l.lag
    ),
    m AS (
        SELECT ga, gb, lag, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(y * y) AS BIGINT) AS syy,
               CAST(SUM(x * y) AS BIGINT) AS sxy
        FROM p GROUP BY ga, gb, lag
    ),
    f AS (
        SELECT ga, gb, lag, n,
               CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                         * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) <= 0
                    THEN CAST(0 AS BIGINT)
                    ELSE CAST(floor(
                        (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                        / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                               * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                                  - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                        * 1e6 + 0.5) AS BIGINT) END AS q
        FROM m
    )
    SELECT ga AS type_a, gb AS type_b, lag, n AS n_days,
           CAST(q AS DOUBLE) / 1e6 AS xcorr,
           CAST(CASE WHEN ROW_NUMBER() OVER (PARTITION BY ga, gb
                         ORDER BY q DESC, lag) = 1
                THEN 1 ELSE 0 END AS BIGINT) AS is_best
    FROM f ORDER BY type_a, type_b, lag
    """,
)
def q385(spark: SparkSession, sf: str) -> DataFrame:
    """Lead-lag cross-correlation between daily revenue series of every
    event-type pair, at lags −{L}..+{L} — "which metric LEADS which",
    the ops-analytics question q170's lag-1 AUTOcorrelation (one series
    against itself) and q119's Pearson (paired columns, no shift)
    cannot answer. Series are gap-filled to zero on the full day spine
    so a missing day shifts nothing silently; the best lag per pair is
    flagged by ranking the QUANTIZED correlation (BIGINT 1e-6 units) —
    ranking the raw double would hang tie-breaks on ulps.

    Cross-engine exactness: q170's recipe — integer-cent moment sums
    (exact in any aggregation order), then ONE pinned double formula
    per (pair, lag), floor-quantized; zero-variance series short to 0
    explicitly. Scale: everything after the one data-scale hash
    aggregate (type, day) lives on the bounded types×days table — the
    lag explosion, shifted self-join, and rank are all
    O(types²·days·lags)."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf, "events").where(F.col("value").isNotNull())
    d = ev.groupBy(
        F.col("event_type").alias("g"),
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(86_400_000_000)
        )
        .cast("long")
        .alias("day"),
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"))
        .cast("long")
        .alias("c")
    ).transform(materialize)
    bounds = d.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = (
        d.select("g")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "g", F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("day")
        )
    )
    s = (
        spine.join(d, ["g", "day"], "left")
        .select("g", "day", F.coalesce("c", F.lit(0)).cast("long").alias("c"))
        .transform(materialize)
    )
    lags = spark.range(-XCORR_MAX_LAG, XCORR_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    a = s.select(F.col("g").alias("ga"), F.col("day").alias("da"), F.col("c").alias("x"))
    b = s.select(F.col("g").alias("gb"), F.col("day").alias("db"), F.col("c").alias("y"))
    p = (
        a.crossJoin(F.broadcast(lags))
        .join(
            b,
            (F.col("gb") > F.col("ga"))
            & (F.col("db") == F.col("da") + F.col("lag")),
        )
    )
    m = p.groupBy("ga", "gb", "lag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    nd = F.col("n").cast("double")
    vx = nd * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col(
        "sx"
    ).cast("double")
    vy = nd * F.col("syy").cast("double") - F.col("sy").cast("double") * F.col(
        "sy"
    ).cast("double")
    cov = nd * F.col("sxy").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sy").cast("double")
    q = (
        F.when(vx * vy <= 0, F.lit(0).cast("long"))
        .otherwise(
            F.floor(cov / F.sqrt(vx * vy) * F.lit(1e6) + F.lit(0.5)).cast(
                "long"
            )
        )
        .alias("q")
    )
    f = m.select("ga", "gb", "lag", "n", q)
    wb = W.partitionBy("ga", "gb").orderBy(F.desc("q"), "lag")
    return (
        f.select(
            F.col("ga").alias("type_a"),
            F.col("gb").alias("type_b"),
            "lag",
            F.col("n").alias("n_days"),
            (F.col("q").cast("double") / F.lit(1e6)).alias("xcorr"),
            F.when(F.row_number().over(wb) == 1, 1)
            .otherwise(0)
            .cast("long")
            .alias("is_best"),
        )
        .orderBy("type_a", "type_b", "lag")
    )


q385.__doc__ = q385.__doc__.format(L=XCORR_MAX_LAG)


# ------------------------- changepoint localization (binary segmentation) --
@query(
    "q390_binary_segmentation",
    oracle="""
    WITH d AS (
        SELECT event_type AS g,
               CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day,
               CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                   AS y
        FROM events WHERE value IS NOT NULL GROUP BY g, day
    ),
    r AS (
        SELECT g, day, y,
               ROW_NUMBER() OVER (PARTITION BY g ORDER BY day) AS k,
               SUM(y) OVER (PARTITION BY g ORDER BY day
                    ROWS UNBOUNDED PRECEDING) AS s,
               COUNT(*) OVER (PARTITION BY g) AS n,
               SUM(y) OVER (PARTITION BY g) AS st
        FROM d
    ),
    gains AS (
        SELECT g, day, k, n, s, st,
               (s * s) // k + ((st - s) * (st - s)) // (n - k) AS gain,
               ROW_NUMBER() OVER (PARTITION BY g ORDER BY
                    (s * s) // k + ((st - s) * (st - s)) // (n - k) DESC,
                    k) AS rk
        FROM r WHERE k < n
    )
    SELECT g AS event_type, CAST(n AS BIGINT) AS n_days,
           CAST(k AS BIGINT) AS split_after_rank, day AS last_left_day,
           CAST(s // k AS BIGINT) AS mean_left_cents,
           CAST((st - s) // (n - k) AS BIGINT) AS mean_right_cents,
           CAST(gain AS BIGINT) AS gain_q
    FROM gains WHERE rk = 1 ORDER BY event_type
    """,
)
def q390(spark: SparkSession, sf: str) -> DataFrame:
    """Changepoint LOCALIZATION by one binary-segmentation round: per
    event type, the split of the daily-revenue series that maximizes
    the between-segment gain S_l²/n_l + S_r²/n_r (equivalently
    minimizes total SSE, since ΣY² is split-invariant) — "WHERE did
    the level shift", the complement of q298's CUSUM "DID it shift".
    Full binary segmentation recurses on each side; the registered,
    oracle-checkable form is the first (deepest-signal) split — the
    q374/q386 single-round contract.

    Determinism: the objective is pinned as the floor-quantized
    integer gain (S²  div n per side, cents² units) — both engines
    compute the identical argmax with ties to the earliest split;
    comparing exact rationals would need per-pair cross
    multiplication, and comparing doubles would hang the argmax on
    ulps. Means are integer division on the cent grid.

    Scale: one data-scale hash aggregate to (type, day); prefix sums
    and the argmax rank are windows PARTITIONED BY type over the
    bounded day support (q326's argument) — nothing global, nothing
    per-event after the first shuffle."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf, "events").where(F.col("value").isNotNull())
    d = ev.groupBy(
        F.col("event_type").alias("g"),
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(86_400_000_000)
        )
        .cast("long")
        .alias("day"),
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"))
        .cast("long")
        .alias("y")
    )
    wo = W.partitionBy("g").orderBy("day")
    wa = W.partitionBy("g")
    r = d.select(
        "g",
        "day",
        F.row_number().over(wo).cast("long").alias("k"),
        F.sum("y").over(wo.rowsBetween(W.unboundedPreceding, 0)).alias("s"),
        F.count(F.lit(1)).over(wa).cast("long").alias("n"),
        F.sum("y").over(wa).alias("st"),
    ).where(F.col("k") < F.col("n"))
    gain = F.expr("(s * s) div k + ((st - s) * (st - s)) div (n - k)")
    wg = W.partitionBy("g").orderBy(F.desc(gain), "k")
    return (
        r.select(
            "g",
            "day",
            "k",
            "n",
            "s",
            "st",
            gain.alias("gain"),
            F.row_number().over(wg).alias("rk"),
        )
        .where(F.col("rk") == 1)
        .select(
            F.col("g").alias("event_type"),
            F.col("n").alias("n_days"),
            F.col("k").alias("split_after_rank"),
            F.col("day").alias("last_left_day"),
            F.expr("CAST(s div k AS BIGINT)").alias("mean_left_cents"),
            F.expr("CAST((st - s) div (n - k) AS BIGINT)").alias(
                "mean_right_cents"
            ),
            F.col("gain").cast("long").alias("gain_q"),
        )
        .orderBy("event_type")
    )


# -------------------------- price-volume-mix revenue bridge ----------------
PVM_M0 = "2001-06-01"
PVM_M1 = "2001-07-01"


@query(
    "q407_price_volume_mix",
    oracle=f"""
    WITH li AS (
        SELECT p.p_brand,
               CASE WHEN date_trunc('month', o.o_orderdate)
                         = DATE '{PVM_M0}' THEN 0 ELSE 1 END AS per,
               CAST(floor(l.l_quantity + 0.5) AS BIGINT) AS qty,
               CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100
                          + 0.5) AS BIGINT) AS cents
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE date_trunc('month', o.o_orderdate)
              IN (DATE '{PVM_M0}', DATE '{PVM_M1}')
    ),
    g AS (
        SELECT p_brand,
               CAST(SUM(CASE WHEN per = 0 THEN qty ELSE 0 END) AS BIGINT)
                   AS q0,
               CAST(SUM(CASE WHEN per = 0 THEN cents ELSE 0 END) AS BIGINT)
                   AS r0,
               CAST(SUM(CASE WHEN per = 1 THEN qty ELSE 0 END) AS BIGINT)
                   AS q1,
               CAST(SUM(CASE WHEN per = 1 THEN cents ELSE 0 END) AS BIGINT)
                   AS r1
        FROM li GROUP BY p_brand
    ),
    fx AS (
        SELECT p_brand, q0, r0, q1, r1, r1 - r0 AS delta,
               CASE WHEN q0 = 0 OR q1 = 0 THEN CAST(0 AS BIGINT)
                    ELSE r1 - (q1 * r0) // q0 END AS price_eff,
               CASE WHEN q0 = 0 THEN CAST(0 AS BIGINT)
                    ELSE ((q1 - q0) * r0) // q0 END AS volume_eff
        FROM g
    )
    SELECT p_brand, q0, q1, r0 AS rev0_cents, r1 AS rev1_cents,
           CAST(delta AS BIGINT) AS delta_cents,
           price_eff AS price_effect_cents,
           volume_eff AS volume_effect_cents,
           CAST(delta - price_eff - volume_eff AS BIGINT)
               AS mix_residual_cents
    FROM fx ORDER BY p_brand
    """,
)
def q407(spark: SparkSession, sf: str) -> DataFrame:
    """Price-volume-mix revenue bridge between two months, per part
    brand — the CFO-grade decomposition of ΔRevenue into "we charged
    more" (price effect: q1·Δp̄), "we sold more" (volume effect:
    Δq·p̄0), and the mix/new/discontinued residual — which q260's MoM
    growth rates and q174's contribution shares do not separate. The
    bridge CLOSES EXACTLY by construction: effects are floor-quantized
    on the cent grid and the residual absorbs the remainder, so
    delta = price + volume + mix holds row-for-row (the accountant's
    requirement, pinned by the driver hash). Brands absent from a
    month route the whole delta to the residual (new/discontinued —
    the standard convention).

    Scale: one three-way keyed join (lineitem⋈orders filtered to two
    months — partition pruning at 100 TB — ⋈part dims), one hash
    aggregate to the brand×period grain; all bridge arithmetic is
    row-local integer math on the bounded brand table."""
    li = load_table(spark, sf, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long").alias("qty"),
        F.floor(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
            + F.lit(0.5)
        )
        .cast("long")
        .alias("cents"),
    )
    o = load_table(spark, sf, "orders").select(
        "o_orderkey", F.trunc("o_orderdate", "month").alias("m")
    ).where(F.col("m").isin(PVM_M0, PVM_M1))
    p = load_table(spark, sf, "part").select("p_partkey", "p_brand")
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select(
            "p_brand",
            F.when(F.col("m") == PVM_M0, 0).otherwise(1).alias("per"),
            "qty",
            "cents",
        )
    )
    g = j.groupBy("p_brand").agg(
        F.sum(F.when(F.col("per") == 0, F.col("qty")).otherwise(0))
        .cast("long")
        .alias("q0"),
        F.sum(F.when(F.col("per") == 0, F.col("cents")).otherwise(0))
        .cast("long")
        .alias("r0"),
        F.sum(F.when(F.col("per") == 1, F.col("qty")).otherwise(0))
        .cast("long")
        .alias("q1"),
        F.sum(F.when(F.col("per") == 1, F.col("cents")).otherwise(0))
        .cast("long")
        .alias("r1"),
    )
    price_eff = F.expr(
        "CASE WHEN q0 = 0 OR q1 = 0 THEN CAST(0 AS BIGINT)"
        " ELSE r1 - (q1 * r0) div q0 END"
    )
    volume_eff = F.expr(
        "CASE WHEN q0 = 0 THEN CAST(0 AS BIGINT)"
        " ELSE ((q1 - q0) * r0) div q0 END"
    )
    return (
        g.select(
            "p_brand",
            "q0",
            "q1",
            F.col("r0").alias("rev0_cents"),
            F.col("r1").alias("rev1_cents"),
            (F.col("r1") - F.col("r0")).cast("long").alias("delta_cents"),
            price_eff.cast("long").alias("price_effect_cents"),
            volume_eff.cast("long").alias("volume_effect_cents"),
            (
                (F.col("r1") - F.col("r0")) - price_eff - volume_eff
            )
            .cast("long")
            .alias("mix_residual_cents"),
        )
        .orderBy("p_brand")
    )


# -------------------- portmanteau autocorrelation (Ljung-Box Q) ------------
LB_MAX_LAG = 5
LB_CRIT_Q12 = 11_070_000_000_000  # chi2(5 df, p=0.05) = 11.070 on the 1e12 grid


def _ljung_box_sql() -> str:
    from ._util import sql_round_det

    lag_cte = """
    p{k} AS (
        SELECT a.g, a.x AS x, b.x AS y
        FROM s a JOIN s b ON a.g = b.g AND b.day = a.day + {k}
    ),
    m{k} AS (
        SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(y * y) AS BIGINT) AS syy,
               CAST(SUM(x * y) AS BIGINT) AS sxy
        FROM p{k} GROUP BY g
    ),
    r{k} AS (
        SELECT g,
               CASE WHEN (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                         * (CAST(n AS DOUBLE) * syy
                            - CAST(sy AS DOUBLE) * sy) <= 0
                    THEN CAST(0 AS BIGINT)
                    ELSE CAST(floor(
                        (CAST(n AS DOUBLE) * sxy
                         - CAST(sx AS DOUBLE) * sy)
                        / sqrt((CAST(n AS DOUBLE) * sxx
                                - CAST(sx AS DOUBLE) * sx)
                               * (CAST(n AS DOUBLE) * syy
                                  - CAST(sy AS DOUBLE) * sy))
                        * 1e6 + 0.5) AS BIGINT) END AS rq
        FROM m{k}
    )"""
    ctes = ",".join(
        lag_cte.format(k=k) for k in range(1, LB_MAX_LAG + 1)
    )
    rho_cols = ", ".join(
        f"CAST(r{k}.rq AS DOUBLE) / 1e6 AS rho{k}" for k in range(1, LB_MAX_LAG + 1)
    )
    q_terms = " + ".join(
        f"r{k}.rq * r{k}.rq // (nn.n - {k})" for k in range(1, LB_MAX_LAG + 1)
    )
    joins = " ".join(
        f"JOIN r{k} ON r{k}.g = nn.g" for k in range(1, LB_MAX_LAG + 1)
    )
    return f"""
    WITH d AS (
        SELECT event_type AS g,
               CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day,
               CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                   AS c
        FROM events WHERE value IS NOT NULL GROUP BY g, day
    ),
    bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM d),
    spine AS (
        SELECT t.g, s.day
        FROM (SELECT DISTINCT g FROM d) t,
             (SELECT unnest(range(lo, hi + 1)) AS day FROM bounds) s
    ),
    s AS (
        SELECT spine.g, spine.day, CAST(COALESCE(d.c, 0) AS BIGINT) AS x
        FROM spine LEFT JOIN d ON d.g = spine.g AND d.day = spine.day
    ),
    nn AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n FROM s GROUP BY g),
    {ctes}
    SELECT nn.g AS event_type, nn.n AS n_days, {rho_cols},
           CAST(nn.n * (nn.n + 2) * ({q_terms}) AS BIGINT) AS q_stat_q12,
           CAST(CASE WHEN nn.n * (nn.n + 2) * ({q_terms})
                          > {LB_CRIT_Q12}
                THEN 0 ELSE 1 END AS BIGINT) AS white_noise
    FROM nn {joins}
    ORDER BY event_type
    """


@query("q408_ljung_box_portmanteau", oracle=_ljung_box_sql())
def q408(spark: SparkSession, sf: str) -> DataFrame:
    """Portmanteau white-noise test (Ljung-Box form) on each type's
    daily-revenue series: Pearson autocorrelations at lags 1..{K} and
    Q = n(n+2)·Σ ρ²_k/(n−k) against the χ²({K}) 5% gate — "is there ANY
    serial structure left", the residual-diagnostic every forecasting
    loop (q371's backtest) runs before trusting a model, and the
    whole-series complement of q170 (per-user lag-1 only) and q385
    (CROSS-type lags only — its gb > ga join never pairs a series with
    itself). Gap-filled day spine so lag alignment is calendar-true.

    Cross-engine: q170's recipe per lag — integer-cent moments, one
    pinned double formula, floor to 1e-6 — then the Q statistic is
    PURE INTEGER arithmetic on the quantized ρ's (per-term
    ρq²/(n−k) floor-divided, scaled n(n+2)), with the χ² critical
    value as an integer constant on the same 1e-12 grid. Scale: one
    hash aggregate to (type, day); the {K} lag self-joins and moment
    aggregates all run on the bounded types×days table."""
    from pyspark.sql import Window as W  # noqa: F401  (parity with family)

    ev = load_table(spark, sf, "events").where(F.col("value").isNotNull())
    d = ev.groupBy(
        F.col("event_type").alias("g"),
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(86_400_000_000)
        )
        .cast("long")
        .alias("day"),
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"))
        .cast("long")
        .alias("c")
    ).transform(materialize)
    bounds = d.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    s = (
        d.select("g")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "g", F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("day")
        )
        .join(d, ["g", "day"], "left")
        .select("g", "day", F.coalesce("c", F.lit(0)).cast("long").alias("x"))
        .transform(materialize)
    )
    nn = s.groupBy("g").agg(F.count(F.lit(1)).cast("long").alias("n"))

    def rho(k: int) -> DataFrame:
        b = s.select(
            F.col("g").alias("gb"), F.col("day").alias("db"), F.col("x").alias("y")
        )
        m = (
            s.join(
                b,
                (F.col("gb") == F.col("g"))
                & (F.col("db") == F.col("day") + k),
            )
            .groupBy("g")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("x").cast("long").alias("sx"),
                F.sum("y").cast("long").alias("sy"),
                F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
                F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
                F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
            )
        )
        nd = F.col("n").cast("double")
        vx = nd * F.col("sxx").cast("double") - F.col("sx").cast(
            "double"
        ) * F.col("sx").cast("double")
        vy = nd * F.col("syy").cast("double") - F.col("sy").cast(
            "double"
        ) * F.col("sy").cast("double")
        cov = nd * F.col("sxy").cast("double") - F.col("sx").cast(
            "double"
        ) * F.col("sy").cast("double")
        rq = (
            F.when(vx * vy <= 0, F.lit(0).cast("long"))
            .otherwise(
                F.floor(cov / F.sqrt(vx * vy) * F.lit(1e6) + F.lit(0.5)).cast(
                    "long"
                )
            )
        )
        return m.select("g", rq.alias(f"rq{k}"))

    out = nn
    for k in range(1, LB_MAX_LAG + 1):
        out = out.join(rho(k), "g")
    q_terms = " + ".join(
        f"rq{k} * rq{k} div (n - {k})" for k in range(1, LB_MAX_LAG + 1)
    )
    qs = F.expr(f"CAST(n * (n + 2) * ({q_terms}) AS BIGINT)")
    return out.select(
        F.col("g").alias("event_type"),
        F.col("n").alias("n_days"),
        *[
            (F.col(f"rq{k}").cast("double") / F.lit(1e6)).alias(f"rho{k}")
            for k in range(1, LB_MAX_LAG + 1)
        ],
        qs.alias("q_stat_q12"),
        F.when(qs > LB_CRIT_Q12, 0).otherwise(1).cast("long").alias(
            "white_noise"
        ),
    ).orderBy("event_type")


q408.__doc__ = q408.__doc__.format(K=LB_MAX_LAG)


# -------------------- covariate shift: density-ratio weights + ESS ---------
@query(
    "q409_covariate_shift_ess",
    oracle="""
    WITH ev AS (
        SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) // 5000 AS bin,
               CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day
        FROM events WHERE value IS NOT NULL
    ),
    mid AS (SELECT (MIN(day) + MAX(day) + 1) // 2 AS m FROM ev),
    c AS (
        SELECT bin,
               CAST(COUNT(*) FILTER (WHERE day < m) AS BIGINT) AS n_old,
               CAST(COUNT(*) FILTER (WHERE day >= m) AS BIGINT) AS n_new
        FROM ev CROSS JOIN mid GROUP BY bin
    ),
    t AS (SELECT CAST(SUM(n_old) AS BIGINT) AS so,
                 CAST(SUM(n_new) AS BIGINT) AS sn FROM c),
    w AS (
        SELECT bin, n_old, n_new,
               CASE WHEN n_old = 0 THEN CAST(0 AS BIGINT)
                    ELSE LEAST((n_new * so * 1000000) // (n_old * sn),
                               100000000) END AS w_ppm
        FROM c CROSS JOIN t
    ),
    agg AS (
        SELECT CAST(SUM(n_old * w_ppm) AS BIGINT) AS sw,
               CAST(SUM(n_old * w_ppm * w_ppm) AS BIGINT) AS sw2,
               CAST(SUM(CASE WHEN n_old = 0 THEN n_new ELSE 0 END)
                    AS BIGINT) AS uncovered_new
        FROM w
    ),
    f AS (
        SELECT t.so, t.sn, agg.uncovered_new, agg.sw, agg.sw2,
               CASE WHEN agg.sw2 // 1000000 = 0 THEN CAST(0 AS BIGINT)
                    ELSE (agg.sw // 1000) * (agg.sw // 1000)
                         // (agg.sw2 // 1000000) END AS ess
        FROM t CROSS JOIN agg
    )
    SELECT f.so AS n_old, f.sn AS n_new,
           CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_bins,
           f.uncovered_new,
           CAST(f.sw // 1000000 AS BIGINT) AS sum_w,
           CAST(f.ess AS BIGINT) AS ess,
           CAST(CASE WHEN f.so = 0 THEN 0
                ELSE f.ess * 1000000 // f.so END AS BIGINT) AS ess_ppm
    FROM f
    """,
)
def q409(spark: SparkSession, sf: str) -> DataFrame:
    """Covariate-shift audit with importance weights and effective
    sample size: bin the metric, form the density-ratio weight
    w(bin) = p_new/p_old on an exact ppm grid, and report
    ESS = (Σw)²/Σw² over the OLD sample — the retraining-trigger
    number: reweighting old data to match the new distribution is
    viable while ESS stays near n_old and hopeless when a few bins
    carry all the mass (Kish's formula; ESS_ppm is the fraction
    retained). q384/q309/q359 SCORE drift; this answers the next
    question — "can I fix it by reweighting, or must I resample?" —
    plus uncovered_new counts mass in bins old data never saw (no
    weight can repair those). Weights are CLIPPED at 100x (standard
    clipped importance sampling — an unclipped rare-bin ratio would
    both overflow the integer grid and dominate ESS). All integer:
    ratio and ESS are div arithmetic on BIGINT counts, no float
    anywhere.

    Scale: one hash aggregate to the bounded bin support, one 1-row
    split broadcast, one final aggregate — q384's exact plan shape
    with a different statistic on top."""
    ev = load_table(spark, sf, "events").where(F.col("value").isNotNull())
    e = ev.select(
        F.expr(
            "CAST(floor(value * 100 + 0.5) AS BIGINT) div 5000"
        ).alias("bin"),
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(86_400_000_000)
        )
        .cast("long")
        .alias("day"),
    )
    mid = e.agg(
        F.expr("CAST((MIN(day) + MAX(day) + 1) div 2 AS BIGINT)").alias("m")
    )
    c = (
        e.crossJoin(F.broadcast(mid))
        .groupBy("bin")
        .agg(
            F.sum(F.when(F.col("day") < F.col("m"), 1).otherwise(0))
            .cast("long")
            .alias("n_old"),
            F.sum(F.when(F.col("day") >= F.col("m"), 1).otherwise(0))
            .cast("long")
            .alias("n_new"),
        )
        .transform(materialize)
    )
    t = c.agg(
        F.sum("n_old").cast("long").alias("so"),
        F.sum("n_new").cast("long").alias("sn"),
        F.count(F.lit(1)).cast("long").alias("n_bins"),
    )
    w = c.crossJoin(F.broadcast(t)).select(
        "n_old",
        "n_new",
        # weights clipped at 100x (1e8 ppm): standard clipped importance
        # sampling — an unclipped rare-bin ratio makes w² overflow BIGINT
        # and would dominate ESS anyway
        F.expr(
            "CASE WHEN n_old = 0 THEN CAST(0 AS BIGINT)"
            " ELSE LEAST((n_new * so * 1000000) div (n_old * sn),"
            " CAST(100000000 AS BIGINT)) END"
        ).alias("w_ppm"),
    )
    agg = w.agg(
        F.sum(F.col("n_old") * F.col("w_ppm")).cast("long").alias("sw"),
        F.sum(F.col("n_old") * F.col("w_ppm") * F.col("w_ppm"))
        .cast("long")
        .alias("sw2"),
        F.sum(F.when(F.col("n_old") == 0, F.col("n_new")).otherwise(0))
        .cast("long")
        .alias("uncovered_new"),
    )
    return (
        t.crossJoin(F.broadcast(agg))
        .select(
            F.col("so").alias("n_old"),
            F.col("sn").alias("n_new"),
            "n_bins",
            "uncovered_new",
            F.expr("CAST(sw div 1000000 AS BIGINT)").alias("sum_w"),
            # ESS on reduced units: sw² overflows BIGINT directly (sw is
            # already on the ppm grid), so the ratio runs as
            # (sw/1e3)² / (sw2/1e6) — identical floor sequence both engines
            F.expr(
                "CAST(CASE WHEN sw2 div 1000000 = 0 THEN 0"
                " ELSE (sw div 1000) * (sw div 1000) div (sw2 div 1000000)"
                " END AS BIGINT)"
            ).alias("ess"),
            F.expr(
                "CAST(CASE WHEN sw2 div 1000000 = 0 OR so = 0 THEN 0"
                " ELSE ((sw div 1000) * (sw div 1000) div (sw2 div 1000000))"
                " * 1000000 div so END AS BIGINT)"
            ).alias("ess_ppm"),
        )
    )


# ------------------- nested percentiles (fleet p of per-user p95) ----------
NESTED_PCTS = (50, 90, 95, 99)


@query(
    "q410_nested_percentiles",
    oracle=f"""
    WITH e AS (
        SELECT user_id, event_id,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events WHERE value IS NOT NULL
    ),
    r AS (
        SELECT user_id, cents,
               ROW_NUMBER() OVER (PARTITION BY user_id
                    ORDER BY cents, event_id) AS rk,
               COUNT(*) OVER (PARTITION BY user_id) AS nu
        FROM e
    ),
    up95 AS (
        SELECT user_id, cents AS p95_cents
        FROM r WHERE rk = (95 * nu + 99) // 100
    ),
    g AS (
        SELECT p95_cents,
               ROW_NUMBER() OVER (ORDER BY p95_cents, user_id) AS gr
        FROM up95
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users FROM up95),
    p AS (SELECT unnest(ARRAY{list(NESTED_PCTS)}) AS pct)
    SELECT CAST(p.pct AS BIGINT) AS pct,
           g.p95_cents AS fleet_value_cents, n.n_users
    FROM p CROSS JOIN n
    JOIN g ON g.gr = (p.pct * n.n_users + 99) // 100
    ORDER BY pct
    """,
)
def q410(spark: SparkSession, sf: str) -> DataFrame:
    """Nested percentiles: the fleet p50/p90/p95/p99 of PER-USER p95
    event values — the SLO statistic that actually matters for
    user-perceived latency/spend ("95% of each user's events are under
    X; what X covers 99% of USERS?"), which q137's flat percentiles
    (pooling all events) systematically understate for heavy users:
    pooling weights users by event count, nesting weights them
    equally. Both levels are exact rank selection (ceil(p·n/100), ties
    to id) — percentile_disc semantics at user grain and fleet grain.

    Scale: level 1 is a window PARTITIONED BY user (millions of small
    partitions — the good kind); level 2's global rank over the
    per-user table rides `deterministic_id(fact_scale=True)` (the
    oracle's partitionless ROW_NUMBER is the shape it replaces);
    percentile picks are a 4-row broadcast join."""
    from pyspark.sql import Window as W
    from ..functions.refops import deterministic_id

    ev = load_table(spark, sf, "events").where(F.col("value").isNotNull())
    e = ev.select(
        "user_id",
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    wu = W.partitionBy("user_id").orderBy("cents", "event_id")
    wn = W.partitionBy("user_id")
    r = e.select(
        "user_id",
        "cents",
        F.row_number().over(wu).alias("rk"),
        F.count(F.lit(1)).over(wn).alias("nu"),
    )
    up95 = r.where(
        F.col("rk") == F.expr("(95 * nu + 99) div 100")
    ).select("user_id", F.col("cents").alias("p95_cents"))
    g = deterministic_id(
        up95, ["p95_cents", "user_id"], name="gr", fact_scale=True
    )
    n = up95.agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    p = literal_frame(spark, [(x,) for x in NESTED_PCTS], "pct int")
    return (
        g.crossJoin(F.broadcast(n))
        .join(
            F.broadcast(p),
            F.col("gr") == F.expr("(pct * n_users + 99) div 100"),
        )
        .select(
            F.col("pct").cast("long").alias("pct"),
            F.col("p95_cents").alias("fleet_value_cents"),
            "n_users",
        )
        .orderBy("pct")
    )


# ---------------------- day-of-week seasonal strength ----------------------
@query(
    "q412_seasonal_strength",
    oracle="""
    WITH d AS (
        SELECT event_type AS g,
               CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day,
               CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                   AS c
        FROM events WHERE value IS NOT NULL GROUP BY g, day
    ),
    bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM d),
    s AS (
        SELECT sp.g, sp.day, (sp.day + 4) % 7 AS dow,
               CAST(COALESCE(d.c, 0) AS BIGINT) AS x
        FROM (SELECT t.g, u.day
              FROM (SELECT DISTINCT g FROM d) t,
                   (SELECT unnest(range(lo, hi + 1)) AS day FROM bounds) u) sp
        LEFT JOIN d ON d.g = sp.g AND d.day = sp.day
    ),
    tot AS (
        SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(x * x) AS BIGINT) AS sq
        FROM s GROUP BY g
    ),
    dw AS (
        SELECT g, dow, CAST(COUNT(*) AS BIGINT) AS nd,
               CAST(SUM(x) AS BIGINT) AS sd
        FROM s GROUP BY g, dow
    ),
    bt AS (
        SELECT g,
               CAST(SUM((sd * sd) // nd) AS BIGINT) AS between_q,
               MIN(CASE WHEN rn = 1 THEN dow END) AS peak_dow
        FROM (SELECT g, dow, nd, sd,
                     ROW_NUMBER() OVER (PARTITION BY g
                          ORDER BY sd * 1000 // nd DESC, dow) AS rn
              FROM dw)
        GROUP BY g
    )
    SELECT t.g AS event_type, t.n AS n_days,
           CAST(bt.peak_dow AS BIGINT) AS peak_dow,
           CAST(CASE WHEN CAST(t.sq AS DOUBLE)
                          - CAST(t.sx AS DOUBLE) * t.sx / t.n <= 0 THEN 0
                ELSE floor(greatest(0.0,
                     (CAST(bt.between_q AS DOUBLE)
                      - CAST(t.sx AS DOUBLE) * t.sx / t.n)
                     / (CAST(t.sq AS DOUBLE)
                        - CAST(t.sx AS DOUBLE) * t.sx / t.n))
                     * 1000000 + 0.5) END AS BIGINT) AS strength_ppm
    FROM tot t JOIN bt ON bt.g = t.g
    ORDER BY event_type
    """,
)
def q412(spark: SparkSession, sf: str) -> DataFrame:
    """Day-of-week seasonal STRENGTH per event type — the fraction of
    daily-revenue variance explained by the weekly pattern (Hyndman's
    seasonal-strength statistic, the between/total variance ratio of
    the dow-means model) plus the peak day: the one number that says
    whether q314's seasonal indices are signal or noise, whether
    q371's seasonal-naive baseline is even the right baseline, and
    whether q390's changepoint should be sought in the deseasonalized
    series. Gap-filled spine so every week contributes 7 days.

    Cross-engine: integer moment sums (n, Σx, Σx², per-dow Σx) feed
    ONE pinned double formula floored to ppm (the q326 recipe); the
    peak day ranks on the exact millicent mean grid with dow
    tie-break. Scale: one hash aggregate to (type, day), two bounded
    aggregates over it, windows over ≤7 rows per type."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf, "events").where(F.col("value").isNotNull())
    d = ev.groupBy(
        F.col("event_type").alias("g"),
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(86_400_000_000)
        )
        .cast("long")
        .alias("day"),
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long"))
        .cast("long")
        .alias("c")
    ).transform(materialize)
    bounds = d.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    s = (
        d.select("g")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "g", F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("day")
        )
        .join(d, ["g", "day"], "left")
        .select(
            "g",
            ((F.col("day") + 4) % 7).alias("dow"),
            F.coalesce("c", F.lit(0)).cast("long").alias("x"),
        )
    )
    tot = s.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sq"),
    )
    dw = s.groupBy("g", "dow").agg(
        F.count(F.lit(1)).cast("long").alias("nd"),
        F.sum("x").cast("long").alias("sd"),
    )
    wr = W.partitionBy("g").orderBy(
        F.desc(F.expr("sd * 1000 div nd")), "dow"
    )
    bt = (
        dw.select(
            "g",
            "dow",
            # per-term INTEGER quantization before the sum: a float SUM
            # over the dow terms would be partial-order-dependent (the
            # q328 discipline); (sd² div nd) loses <1 unit per term
            F.expr("(sd * sd) div nd").alias("braw_q"),
            F.row_number().over(wr).alias("rn"),
        )
        .groupBy("g")
        .agg(
            F.sum("braw_q").cast("long").alias("between_q"),
            F.min(F.when(F.col("rn") == 1, F.col("dow"))).alias("peak_dow"),
        )
    )
    sst = F.col("sq").cast("double") - F.col("sx").cast("double") * F.col(
        "sx"
    ) / F.col("n")
    ssb = F.col("between_q").cast("double") - F.col("sx").cast(
        "double"
    ) * F.col("sx") / F.col("n")
    strength = F.when(sst <= 0, F.lit(0).cast("long")).otherwise(
        F.floor(
            F.greatest(F.lit(0.0), ssb / sst) * F.lit(1e6) + F.lit(0.5)
        ).cast("long")
    )
    return (
        tot.join(bt, "g")
        .select(
            F.col("g").alias("event_type"),
            F.col("n").alias("n_days"),
            F.col("peak_dow").cast("long").alias("peak_dow"),
            strength.alias("strength_ppm"),
        )
        .orderBy("event_type")
    )
