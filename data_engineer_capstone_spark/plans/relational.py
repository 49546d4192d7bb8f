"""Relational core: scans, projection, filters, the full join family,
sorts/limits, and set operations (SURVEY.md §2.9 Q1-Q4, Q20-Q27, Q50-Q56).

Every query is a declarative DataFrame plan: filters and projections sit
directly on the parquet scan so Catalyst pushes them into the reader
(PushedFilters / ReadSchema), dimension joins are explicitly broadcast
(reference J1 pattern, `/root/reference/scripts/pyspark.py:359-373` — tiny
code-lookup dims joined to a large fact), and large-large joins shuffle on
their equi-keys where AQE can re-plan them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ._util import literal_frame, money_sum, round_det, sql_money_sum, sql_round_det
from .registry import query


# ---------------------------------------------------------------- scans ----
@query(
    "q01_full_scan",
    oracle="SELECT * FROM region ORDER BY r_regionkey",
)
def q01(spark: SparkSession, sf: str) -> DataFrame:
    """Full scan + total order (S5/P1, ref pyspark.py:222,67)."""
    return load_table(spark, sf, "region").orderBy("r_regionkey")


@query(
    "q02_projection_arithmetic",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           {sql_round_det('l_extendedprice * (1 - l_discount)')} AS rev
    FROM lineitem ORDER BY l_orderkey, l_linenumber
    """,
)
def q02(spark: SparkSession, sf: str) -> DataFrame:
    """Projection + row-level arithmetic; scan reads only 4 columns (P2/P3)."""
    li = load_table(spark, sf, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        round_det(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    ).orderBy("l_orderkey", "l_linenumber")


@query(
    "q03_predicates",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1999-12-31'
      AND o_orderstatus IN ('O', 'F')
      AND (o_orderpriority LIKE '%HIGH%' OR o_totalprice > 200000)
      AND o_custkey IS NOT NULL
    ORDER BY o_orderkey
    """,
)
def q03(spark: SparkSession, sf: str) -> DataFrame:
    """Compound predicates: AND/OR, BETWEEN on dates, IN, LIKE, IS NULL (F1-kit)."""
    o = load_table(spark, sf, "orders")
    return (
        o.filter(
            F.col("o_orderdate").between("1996-01-01", "1999-12-31")
            & F.col("o_orderstatus").isin("O", "F")
            & (F.col("o_orderpriority").like("%HIGH%") | (F.col("o_totalprice") > 200000))
            & F.col("o_custkey").isNotNull()
        )
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
        .orderBy("o_orderkey")
    )


@query(
    "q04_compound_gate",
    oracle="""
    SELECT * FROM customer
    WHERE length(c_mktsegment) > 0 AND c_mktsegment IN ('BUILDING', 'MACHINERY')
    ORDER BY c_custkey
    """,
)
def q04(spark: SparkSession, sf: str) -> DataFrame:
    """[R] The reference's row-alignment gate F1: length + set membership
    conjunction (ref pyspark.py:280-286)."""
    c = load_table(spark, sf, "customer")
    return c.filter(
        (F.length("c_mktsegment") > 0) & F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    ).orderBy("c_custkey")


# ---------------------------------------------------------------- joins ----
@query(
    "q20_broadcast_code_lookup",
    oracle="""
    SELECT c_custkey, c_name, n_name AS nation_name
    FROM customer JOIN nation ON n_nationkey = c_nationkey
    ORDER BY c_custkey
    """,
)
def q20(spark: SparkSession, sf: str) -> DataFrame:
    """[R] Code-lookup join J1 (ref pyspark.py:359-373): tiny dim inner-joined
    to the fact, key columns dropped after. Explicit broadcast — at 100 TB a
    25-row nation table must never shuffle the fact side."""
    c = load_table(spark, sf, "customer")
    n = load_table(spark, sf, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "inner")
        .select("c_custkey", "c_name", F.col("n_name").alias("nation_name"))
        .orderBy("c_custkey")
    )


@query(
    "q21_star_join_revenue",
    oracle=f"""
    SELECT c_mktsegment,
           {sql_money_sum('l_extendedprice * (1 - l_discount)', 'revenue')},
           COUNT(*) AS n_lines
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def q21(spark: SparkSession, sf: str) -> DataFrame:
    """3-way star join + grouped revenue. lineitem⋈orders shuffles on the
    orderkey. customer scales with the fact tables, so it carries NO forced
    broadcast hint: AQE's dynamic join selection broadcasts it when runtime
    stats fit under the threshold (true at every test SF) and falls back to
    a shuffled hash join at 100 TB, where a forced hint would OOM."""
    li = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "q22_left_outer_null_probe",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer LEFT JOIN orders ON o_custkey = c_custkey
    WHERE o_orderkey IS NULL
    ORDER BY c_custkey
    """,
)
def q22(spark: SparkSession, sf: str) -> DataFrame:
    """Left outer join + null probe: customers with no orders."""
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .filter(F.col("o_orderkey").isNull())
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "q23_full_outer",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey
    FROM customer FULL JOIN orders ON o_custkey = c_custkey
    ORDER BY c_custkey, o_orderkey
    """,
)
def q23(spark: SparkSession, sf: str) -> DataFrame:
    """Full outer join (covers the right-outer case by symmetry)."""
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "full")
        .select("c_custkey", "c_name", "o_orderkey")
        .orderBy("c_custkey", "o_orderkey")
    )


@query(
    "q24_left_semi",
    oracle="""
    SELECT s_suppkey, s_name FROM supplier s
    WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s.s_suppkey
                  AND l_quantity > 45)
    ORDER BY s_suppkey
    """,
)
def q24(spark: SparkSession, sf: str) -> DataFrame:
    """Left semi join (EXISTS): suppliers with any high-quantity shipment."""
    s = load_table(spark, sf, "supplier")
    li = load_table(spark, sf, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        s.join(li, s.s_suppkey == li.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@query(
    "q25_left_anti",
    oracle="""
    SELECT p_partkey, p_name FROM part p
    WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p.p_partkey
                      AND l_quantity > 45)
    ORDER BY p_partkey
    """,
)
def q25(spark: SparkSession, sf: str) -> DataFrame:
    """Left anti join (NOT EXISTS): parts never shipped in high quantity."""
    p = load_table(spark, sf, "part")
    li = load_table(spark, sf, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        p.join(li, p.p_partkey == li.l_partkey, "left_anti")
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")
    )


@query(
    "q26_range_join",
    oracle="""
    SELECT o_orderkey, band
    FROM orders
    JOIN (VALUES ('low', 0.0, 50000.0), ('mid', 50000.0, 150000.0),
                 ('high', 150000.0, 1e12)) AS bands(band, lo, hi)
      ON o_totalprice >= lo AND o_totalprice < hi
    ORDER BY o_orderkey, band
    """,
)
def q26(spark: SparkSession, sf: str) -> DataFrame:
    """Non-equi (range/theta) join: orders banded by price range. The band
    table is a literal — broadcast nested-loop, the only sane physical plan
    for a theta join against a 3-row side at any scale."""
    o = load_table(spark, sf, "orders")
    bands = literal_frame(
        spark,
        [("low", 0.0, 50000.0), ("mid", 50000.0, 150000.0), ("high", 150000.0, 1e12)],
        "band string, lo double, hi double",
    )
    return (
        o.join(
            F.broadcast(bands),
            (o.o_totalprice >= bands.lo) & (o.o_totalprice < bands.hi),
        )
        .select("o_orderkey", "band")
        .orderBy("o_orderkey", "band")
    )


@query(
    "q27_cross_join",
    oracle="""
    SELECT a.r_name AS r1, b.r_name AS r2
    FROM region a CROSS JOIN region b
    ORDER BY r1, r2
    """,
)
def q27(spark: SparkSession, sf: str) -> DataFrame:
    """Bounded cross join."""
    r = load_table(spark, sf, "region")
    a = r.select(F.col("r_name").alias("r1"))
    b = r.select(F.col("r_name").alias("r2"))
    return a.crossJoin(b).orderBy("r1", "r2")


# ------------------------------------------------------- sorts / limits ----
@query(
    "q50_multi_col_sort_nulls",
    oracle="""
    SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg, c_acctbal
    FROM customer
    ORDER BY seg NULLS LAST, c_acctbal DESC, c_custkey
    """,
)
def q50(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-column ORDER BY with NULLS FIRST/LAST (nulls derived via nullif)."""
    c = load_table(spark, sf, "customer")
    return c.select(
        "c_custkey",
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg"),
        "c_acctbal",
    ).orderBy(F.col("seg").asc_nulls_last(), F.col("c_acctbal").desc(), "c_custkey")


@query(
    "q51_topk_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
)
def q51(spark: SparkSession, sf: str) -> DataFrame:
    """Top-k after a total order. Spark plans this as TakeOrderedAndProject —
    a per-partition top-k plus a tiny driver merge, no global sort at scale."""
    o = load_table(spark, sf, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@query(
    "q52_expr_sort",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           {sql_round_det('l_extendedprice * (1 - l_discount)')} AS rev
    FROM lineitem
    ORDER BY rev DESC, l_orderkey, l_linenumber LIMIT 50
    """,
)
def q52(spark: SparkSession, sf: str) -> DataFrame:
    """ORDER BY computed expression DESC with tie-break + LIMIT."""
    li = load_table(spark, sf, "lineitem")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            round_det(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
        )
        .orderBy(F.col("rev").desc(), "l_orderkey", "l_linenumber")
        .limit(50)
    )


# ------------------------------------------------------------- set ops ----
@query(
    "q53_union_all_vs_distinct",
    oracle="""
    SELECT 'union_all' AS which, COUNT(*) AS n FROM (
        SELECT c_nationkey AS k FROM customer UNION ALL SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'union_distinct' AS which, COUNT(*) AS n FROM (
        SELECT c_nationkey AS k FROM customer UNION SELECT s_nationkey FROM supplier)
    ORDER BY which
    """,
)
def q53(spark: SparkSession, sf: str) -> DataFrame:
    """UNION ALL vs UNION(distinct) row counts."""
    c = load_table(spark, sf, "customer").select(F.col("c_nationkey").alias("k"))
    s = load_table(spark, sf, "supplier").select(F.col("s_nationkey").alias("k"))
    ua = c.unionAll(s).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("union_all").alias("which"), "n"
    )
    ud = c.union(s).distinct().agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("union_distinct").alias("which"), "n"
    )
    return ua.unionByName(ud).orderBy("which")


@query(
    "q54_intersect_except",
    oracle="""
    SELECT 'intersect' AS op, k FROM (
        SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'except' AS op, k FROM (
        SELECT c_nationkey AS k FROM customer EXCEPT SELECT s_nationkey FROM supplier)
    ORDER BY op, k
    """,
)
def q54(spark: SparkSession, sf: str) -> DataFrame:
    """INTERSECT / EXCEPT on projected nation keys."""
    c = load_table(spark, sf, "customer").select(F.col("c_nationkey").alias("k"))
    s = load_table(spark, sf, "supplier").select(F.col("s_nationkey").alias("k"))
    inter = c.intersect(s).select(F.lit("intersect").alias("op"), "k")
    exc = c.subtract(s).select(F.lit("except").alias("op"), "k")
    return inter.unionByName(exc).orderBy("op", "k")


@query(
    "q55_select_distinct",
    oracle="""
    SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
    ORDER BY o_orderstatus, o_orderpriority
    """,
)
def q55(spark: SparkSession, sf: str) -> DataFrame:
    """[R] Full-row dedup on a projection (A1, ref pyspark.py:178,197,222 —
    `dropDuplicates()` = distinct hash-agg with map-side partials)."""
    o = load_table(spark, sf, "orders")
    return (
        o.select("o_orderstatus", "o_orderpriority")
        .dropDuplicates()
        .orderBy("o_orderstatus", "o_orderpriority")
    )


@query(
    "q56_union_alignment",
    oracle="""
    SELECT s_suppkey, s_name, CAST(NULL AS DOUBLE) AS s_acctbal FROM supplier
    UNION ALL
    SELECT s_suppkey, CAST(NULL AS VARCHAR) AS s_name, s_acctbal FROM supplier
    ORDER BY s_suppkey, s_name NULLS LAST
    """,
)
def q56(spark: SparkSession, sf: str) -> DataFrame:
    """[R] Union-alignment U2 (ref _fill_missing_columns pyspark.py:388-413):
    disjoint projections unioned by NAME with typed null fill —
    `unionByName(allowMissingColumns=True)` replaces the reference's
    26-line positional-union helper."""
    s = load_table(spark, sf, "supplier")
    left = s.select("s_suppkey", "s_name")
    right = s.select("s_suppkey", "s_acctbal")
    return left.unionByName(right, allowMissingColumns=True).orderBy(
        "s_suppkey", F.col("s_name").asc_nulls_last()
    )


@query(
    "q57_pivot",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS F,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS O,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS P
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def q57(spark: SparkSession, sf: str) -> DataFrame:
    """Pivot: order counts per priority × status. Explicit pivot values —
    without them Spark runs an extra distinct job to discover columns (a
    full pass of the data at scale) and the output schema becomes
    data-dependent."""
    o = load_table(spark, sf, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .orderBy("o_orderpriority")
    )


@query(
    "q58_unpivot",
    oracle="""
    SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value
    FROM part
    UNION ALL
    SELECT p_partkey, 'p_retailprice', p_retailprice FROM part
    ORDER BY p_partkey, metric
    """,
)
def q58(spark: SparkSession, sf: str) -> DataFrame:
    """Unpivot (melt): wide numeric columns to (metric, value) rows —
    the native `unpivot` expands rows inside codegen (an Expand node),
    no shuffle beyond the final sort."""
    p = load_table(spark, sf, "part")
    return (
        p.select(
            "p_partkey",
            F.col("p_size").cast("double").alias("p_size"),
            "p_retailprice",
        )
        .unpivot("p_partkey", ["p_size", "p_retailprice"], "metric", "value")
        .orderBy("p_partkey", "metric")
    )


@query(
    "q118_scalar_subquery",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(floor((l_extendedprice) * 10000 + 0.5) / 10000
                AS DECIMAL(18,4))), 2) AS DOUBLE) AS small_qty_revenue,
           COUNT(*) AS n_rows
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23'
      AND l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                          FROM lineitem l2
                          WHERE l2.l_partkey = l.l_partkey
                            AND l2.l_partkey IN (SELECT p_partkey FROM part
                                                 WHERE p_brand = 'Brand#23'))
    """,
)
def q118(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from small-quantity orders, threshold = a
    CORRELATED SCALAR SUBQUERY (0.2 × the part's average quantity).

    Expressed as SQL so Catalyst's decorrelation does the planning: the
    subquery rewrites to an aggregate on l_partkey joined back to the
    filtered fact — at scale that is one partial-agg shuffle on partkey
    (map-side combined), never a per-row subquery execution. The IN filter
    inside the subquery hand-pushes the brand predicate (Catalyst does not
    infer it), so the inner aggregate scans only the brand's partkeys
    instead of the full fact — the difference between O(brand slice) and
    O(100 TB) on the inner shuffle. l_quantity is integral, so AVG over
    doubles is order-exact; revenue goes through the decimal path.
    """
    from ..catalog import register_views

    register_views(spark, sf, ("lineitem", "part"))
    return spark.sql(
        """
        SELECT CAST(ROUND(SUM(CAST(floor((l_extendedprice) * 10000 + 0.5) / 10000
                    AS DECIMAL(18,4))), 2) AS DOUBLE) AS small_qty_revenue,
               COUNT(*) AS n_rows
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#23'
          AND l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                              FROM lineitem l2
                              WHERE l2.l_partkey = l.l_partkey
                                AND l2.l_partkey IN (SELECT p_partkey FROM part
                                                     WHERE p_brand = 'Brand#23'))
        """
    )


@query(
    "q121_antijoin_scalar_avg",
    oracle="""
    WITH thr AS (
        SELECT CAST(SUM(CAST(floor(c_acctbal * 10000 + 0.5) / 10000
                    AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_bal
        FROM customer WHERE c_acctbal > 0)
    SELECT c_mktsegment, COUNT(*) AS n_cust,
           CAST(ROUND(SUM(CAST(floor(c_acctbal * 10000 + 0.5) / 10000
                AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_bal
    FROM customer c, thr
    WHERE c.c_acctbal > thr.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
)
def q121(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q22 shape: wealthy customers (balance above the positive-balance
    global average — an uncorrelated scalar subquery) who have NO orders
    (NOT EXISTS → left anti join), rolled up per market segment.

    The scalar aggregate reduces to ONE row broadcast into the filter (no
    per-row subquery); the anti join shuffles on o_custkey only after the
    balance filter has cut the build side. The threshold is derived from an
    exact decimal sum so the > comparison is engine-identical; the raw
    c_acctbal comparand is never rounded.
    """
    cust = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders")
    thr = (
        cust.where(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum((F.floor(F.col("c_acctbal") * 10000 + F.lit(0.5)) / 10000)
                      .cast("decimal(18,4)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_bal")
        )
    )
    return (
        cust.crossJoin(F.broadcast(thr))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders.select("o_custkey"), F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            money_sum(F.col("c_acctbal"), "total_bal"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "q122_banded_range_join",
    oracle="""
    WITH e AS (
        SELECT user_id, event_id,
               CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec
        FROM events)
    SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
           abs(a.sec - b.sec) AS gap
    FROM e a JOIN e b
      ON a.user_id = b.user_id AND a.event_id < b.event_id
     AND abs(a.sec - b.sec) <= 300
    ORDER BY a.user_id, id_a, id_b
    """,
)
def q122(spark: SparkSession, sf: str) -> DataFrame:
    """Range join: per-user event pairs within 300 seconds of each other,
    via bin bucketing (`operators/rangejoin.py`) — an EQUI join on
    (user, 300s-bin) with 3× one-sided replication, never the O(n²)
    BroadcastNestedLoopJoin a raw theta join would plan. The oracle
    brute-forces the theta join (fine at oracle scale)."""
    from ..operators.rangejoin import banded_pairs

    ev = load_table(spark, sf, "events")
    return banded_pairs(
        ev,
        key="user_id",
        value=F.col("ts").cast("timestamp").cast("long"),
        id_col="event_id",
        band=300,
    ).select(
        "user_id",
        F.col("id_a"),
        F.col("id_b"),
        "gap",
    ).orderBy("user_id", "id_a", "id_b")


@query(
    "q128_table_diff",
    oracle="""
    WITH newv AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 10 = 3 THEN c_acctbal + 50.0
                    ELSE c_acctbal END AS c_acctbal,
               c_mktsegment
        FROM customer WHERE c_custkey % 10 != 7
        UNION ALL
        SELECT c_custkey + 10000000, c_acctbal, c_mktsegment
        FROM customer WHERE c_custkey % 10 = 1)
    SELECT COALESCE(o.c_custkey, n.c_custkey) AS c_custkey,
           CASE WHEN o.c_custkey IS NULL THEN 'added'
                WHEN n.c_custkey IS NULL THEN 'removed'
                WHEN NOT (o.c_acctbal IS NOT DISTINCT FROM n.c_acctbal
                          AND o.c_mktsegment IS NOT DISTINCT FROM n.c_mktsegment)
                  THEN 'changed' END AS status
    FROM customer o FULL OUTER JOIN newv n ON o.c_custkey = n.c_custkey
    WHERE CASE WHEN o.c_custkey IS NULL THEN 'added'
               WHEN n.c_custkey IS NULL THEN 'removed'
               WHEN NOT (o.c_acctbal IS NOT DISTINCT FROM n.c_acctbal
                         AND o.c_mktsegment IS NOT DISTINCT FROM n.c_mktsegment)
                 THEN 'changed' END IS NOT NULL
    ORDER BY c_custkey
    """,
)
def q128(spark: SparkSession, sf: str) -> DataFrame:
    """Table diff (`operators/diff.py`): reconcile two versions of the
    customer table — every 10th key (…7) dropped, (…3) balance-bumped,
    (…1) re-added under a new key — into an added/removed/changed
    changeset. One full-outer join on the key; change detection is a
    null-safe equality conjunction (exact on native types — no row-hash
    string formatting, which is not engine-portable for floats)."""
    from ..operators.diff import table_diff

    cust = load_table(spark, sf, "customer")
    new = (
        cust.where(F.col("c_custkey") % 10 != 7)
        .withColumn(
            "c_acctbal",
            F.when(F.col("c_custkey") % 10 == 3, F.col("c_acctbal") + 50.0)
            .otherwise(F.col("c_acctbal")),
        )
        .unionByName(
            cust.where(F.col("c_custkey") % 10 == 1)
            .withColumn("c_custkey", F.col("c_custkey") + 10000000)
        )
    )
    return table_diff(
        cust, new, key="c_custkey", compare_cols=["c_acctbal", "c_mktsegment"]
    ).orderBy("c_custkey")


@query(
    "q131_fuzzy_levenshtein_join",
    oracle="""
    SELECT a.n_name AS name_a, b.n_name AS name_b,
           levenshtein(a.n_name, b.n_name) AS dist
    FROM nation a JOIN nation b
      ON a.n_nationkey < b.n_nationkey
     AND abs(length(a.n_name) - length(b.n_name)) <= 2
    WHERE levenshtein(a.n_name, b.n_name) <= 2
    ORDER BY name_a, name_b
    """,
)
def q131(spark: SparkSession, sf: str) -> DataFrame:
    """Fuzzy self-join: name pairs within Levenshtein distance 2, with a
    length-band blocking predicate evaluated BEFORE the O(n·m) distance.

    Scale pattern for fuzzy matching: never run edit distance on the full
    cross product. Block first on a cheap necessary condition — here
    ``|len(a)-len(b)| <= d`` (edit distance >= length difference) — so the
    quadratic distance runs only on surviving candidate pairs. On a real
    corpus the blocker is an equi-join on a key (length bucket, first
    char, phonetic code, or an LSH bucket as in q92) so Spark hashes
    instead of nested-looping; the dim side here is 25 rows → broadcast
    nested loop is the right plan and AQE picks it."""
    n = load_table(spark, sf, "nation").select("n_nationkey", "n_name")
    a = n.alias("a")
    b = n.alias("b")
    dist = F.levenshtein(F.col("a.n_name"), F.col("b.n_name"))
    return (
        a.join(
            b,
            (F.col("a.n_nationkey") < F.col("b.n_nationkey"))
            & (
                F.abs(F.length(F.col("a.n_name")) - F.length(F.col("b.n_name")))
                <= 2
            ),
        )
        .filter(dist <= 2)
        .select(
            F.col("a.n_name").alias("name_a"),
            F.col("b.n_name").alias("name_b"),
            dist.alias("dist"),
        )
        .orderBy("name_a", "name_b")
    )


@query(
    "q132_null_safe_join",
    oracle="""
    WITH l AS (SELECT nullif(c_mktsegment, 'BUILDING') AS seg_key,
                      COUNT(*) AS n_all
               FROM customer GROUP BY 1),
         r AS (SELECT nullif(c_mktsegment, 'BUILDING') AS seg_key,
                      COUNT(*) AS n_pos
               FROM customer WHERE c_acctbal > 0 GROUP BY 1)
    SELECT l.seg_key, l.n_all, r.n_pos
    FROM l JOIN r ON l.seg_key IS NOT DISTINCT FROM r.seg_key
    ORDER BY l.seg_key NULLS FIRST
    """,
)
def q132(spark: SparkSession, sf: str) -> DataFrame:
    """Null-safe equi join (``<=>`` / IS NOT DISTINCT FROM): the NULL
    bucket on both sides matches itself instead of vanishing.

    A plain equi join silently drops every row whose key is NULL — the
    classic bug when joining on a derived / sparse key. Spark's
    ``eqNullSafe`` stays a hash join (NULL hashes to a normal bucket), so
    this costs the same shuffle as ``=``; it is NOT a fallback to a
    nested-loop theta join. At 100 TB the thing to watch is NULL-key
    skew: if most rows have a NULL key, that one bucket is a hot
    partition — pre-aggregate per side (as here) or salt it."""
    c = load_table(spark, sf, "customer")
    key = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_key")
    left = c.select(key).groupBy("seg_key").agg(F.count(F.lit(1)).alias("n_all"))
    right = (
        c.filter(F.col("c_acctbal") > 0)
        .select(key)
        .groupBy("seg_key")
        .agg(F.count(F.lit(1)).alias("n_pos"))
    )
    return (
        left.join(right, left["seg_key"].eqNullSafe(right["seg_key"]))
        .select(left["seg_key"].alias("seg_key"), "n_all", "n_pos")
        .orderBy(F.col("seg_key").asc_nulls_first())
    )


@query(
    "q133_recursive_hierarchy",
    oracle="""
    WITH RECURSIVE up AS (
        SELECT c_custkey AS custkey, c_custkey AS anc, 0 AS depth
        FROM customer
        UNION ALL
        SELECT u.custkey, CAST(floor(u.anc / 10) AS BIGINT) AS anc,
               u.depth + 1 AS depth
        FROM up u WHERE u.anc >= 10
    )
    SELECT custkey, MAX(depth) AS depth_to_root,
           MAX(CASE WHEN anc < 10 THEN anc END) AS root_key
    FROM up GROUP BY custkey ORDER BY custkey
    """,
)
def q133(spark: SparkSession, sf: str) -> DataFrame:
    """Recursive CTE (Spark 4 ``WITH RECURSIVE``): walk a synthetic
    manager chain ``key -> floor(key/10)`` up to its single-digit root,
    returning per-customer depth and root.

    This is the iterative-closure operator the reference cannot express
    at all (SURVEY.md §2.3 lists no recursion); Spark 4 executes it as a
    loop of self-union steps driven by the engine, one shuffle per level,
    terminating when the step produces no rows — depth here is bounded by
    digit count (log10 of the key space), so 100 TB of keys still means
    ~7 rounds, not row-count rounds. The same shape handles org charts,
    BOM explosion, and filesystem-path closure."""
    load_table(spark, sf, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        WITH RECURSIVE up AS (
            SELECT c_custkey AS custkey, c_custkey AS anc, 0 AS depth
            FROM customer
            UNION ALL
            SELECT u.custkey, CAST(floor(u.anc / 10) AS BIGINT) AS anc,
                   u.depth + 1 AS depth
            FROM up u WHERE u.anc >= 10
        )
        SELECT custkey, MAX(depth) AS depth_to_root,
               MAX(CASE WHEN anc < 10 THEN anc END) AS root_key
        FROM up GROUP BY custkey ORDER BY custkey
        """
    )


@query(
    "q134_date_spine",
    oracle="""
    WITH b AS (SELECT min(CAST(o_orderdate AS DATE)) AS lo,
                      max(CAST(o_orderdate AS DATE)) AS hi FROM orders),
         spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE
                          AS day FROM b),
         daily AS (SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS n
                   FROM orders GROUP BY 1)
    SELECT spine.day, COALESCE(daily.n, 0) AS n_orders
    FROM spine LEFT JOIN daily ON spine.day = daily.d
    ORDER BY day
    """,
)
def q134(spark: SparkSession, sf: str) -> DataFrame:
    """Calendar date spine: generate every day between min and max order
    date (``sequence`` + ``explode``) and left-join daily counts so
    zero-activity days appear explicitly.

    The spine derives from a 1-row global aggregate, so it is always a
    single tiny partition no matter the fact size — it broadcasts to the
    left-join against the pre-aggregated daily counts (cardinality =
    distinct days, not rows). The fact table is reduced FIRST; joining
    raw facts to a spine and then grouping would shuffle the full 100 TB
    against a dimension of a few thousand rows."""
    o = load_table(spark, sf, "orders").select(
        F.col("o_orderdate").cast("date").alias("d")
    )
    bounds = o.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("day")
    )
    daily = o.groupBy("d").agg(F.count(F.lit(1)).alias("n"))
    return (
        spine.join(daily, spine["day"] == daily["d"], "left")
        .select("day", F.coalesce(F.col("n"), F.lit(0).cast("long")).alias("n_orders"))
        .orderBy("day")
    )


@query(
    "q157_tuple_semi_join",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderpriority, o_totalprice
    FROM orders o
    WHERE o_totalprice <= 400000
      AND EXISTS (SELECT 1 FROM orders b
                  WHERE b.o_totalprice > 400000
                    AND b.o_custkey = o.o_custkey
                    AND b.o_orderpriority = o.o_orderpriority)
    ORDER BY o_orderkey
    """,
)
def q157(spark: SparkSession, sf: str) -> DataFrame:
    """Composite-tuple semi join: small orders sharing (customer,
    priority) with at least one >400k order — Spark's ``(a, b) IN
    (SELECT ...)`` multi-column subquery syntax.

    Catalyst rewrites the tuple-IN to a LeftSemi hash join on both
    columns — one shuffle keyed on the pair, the probe side deduped by
    the semi semantics (no row explosion however many big orders match).
    DuckDB lacks tuple-IN, so the oracle states the identical relation
    with EXISTS — which is also what you write when any key column is
    nullable (IN's three-valued logic vs join semantics)."""
    load_table(spark, sf, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_orderpriority, o_totalprice
        FROM orders
        WHERE o_totalprice <= 400000
          AND (o_custkey, o_orderpriority) IN
              (SELECT o_custkey, o_orderpriority FROM orders
               WHERE o_totalprice > 400000)
        ORDER BY o_orderkey
        """
    )


@query(
    "q158_bag_set_ops",
    oracle="""
    SELECT n_key, COUNT(*) AS multiplicity FROM (
        SELECT c_nationkey AS n_key FROM customer
        EXCEPT ALL
        SELECT s_nationkey FROM supplier)
    GROUP BY n_key ORDER BY n_key
    """,
)
def q158(spark: SparkSession, sf: str) -> DataFrame:
    """Bag (multiset) set ops: EXCEPT ALL keeps multiplicities —
    max(count_left - count_right, 0) copies per value — unlike the
    row-collapsing EXCEPT of q54.

    Spark plans exceptAll/intersectAll as a counted aggregate + generate
    (sum +1/-1 per side, replicate the surplus), NOT a join — one shuffle
    on the value, state O(distinct values). The multiplicity aggregate on
    top makes the result order-free for hashing and is also what you'd
    ship at 100 TB (the expanded bag is an intermediate, not an
    answer)."""
    c = load_table(spark, sf, "customer").select(
        F.col("c_nationkey").alias("n_key")
    )
    s = load_table(spark, sf, "supplier").select(
        F.col("s_nationkey").alias("n_key")
    )
    return (
        c.exceptAll(s)
        .groupBy("n_key")
        .agg(F.count(F.lit(1)).alias("multiplicity"))
        .orderBy("n_key")
    )


@query(
    "q159_lateral_aggregate",
    oracle="""
    SELECT n.n_nationkey, n.n_name, l.mx, l.nc
    FROM nation n, LATERAL (
        SELECT max(c.c_acctbal) AS mx, count(*) AS nc
        FROM customer c WHERE c.c_nationkey = n.n_nationkey) l
    ORDER BY n.n_nationkey
    """,
)
def q159(spark: SparkSession, sf: str) -> DataFrame:
    """LATERAL correlated aggregate: per nation, the max customer balance
    and customer count computed by a subquery that references the outer
    row — same SQL text on Spark 4 and DuckDB.

    Catalyst decorrelates the lateral into a groupBy(c_nationkey)
    aggregate left-joined back to nation (DomainJoin rewrite) — per-row
    re-execution never happens; the plan is identical to writing the
    join by hand, which is the guarantee that makes LATERAL safe on a
    100 TB inner table. The LEFT join from decorrelation keeps nations
    with zero customers (count=0, max NULL) — exactly SQL's lateral
    semantics for an aggregate subquery."""
    load_table(spark, sf, "nation").createOrReplaceTempView("nation")
    load_table(spark, sf, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT n.n_nationkey, n.n_name, l.mx, l.nc
        FROM nation n, LATERAL (
            SELECT max(c.c_acctbal) AS mx, count(*) AS nc
            FROM customer c WHERE c.c_nationkey = n.n_nationkey) l
        ORDER BY n.n_nationkey
        """
    )


@query(
    "q172_pareto_frontier",
    oracle="""
    SELECT p.p_partkey, p.p_size, p.p_retailprice
    FROM part p
    WHERE NOT EXISTS (
        SELECT 1 FROM part q
        WHERE q.p_retailprice <= p.p_retailprice
          AND q.p_size <= p.p_size
          AND (q.p_retailprice < p.p_retailprice OR q.p_size < p.p_size))
    ORDER BY p.p_partkey
    """,
)
def q172(spark: SparkSession, sf: str) -> DataFrame:
    """Pareto frontier (skyline): parts no other part beats on BOTH price
    and size — multi-objective shortlisting (cheapest-and-smallest here;
    best-quality-per-token in a curation pipeline).

    Expressed as a theta anti-join, mirroring the NOT EXISTS oracle;
    at this dim-table size the broadcast nested loop is fine. The 100 TB
    shape is sort-based: order by (price, size), keep rows whose size
    beats the running min over strictly-cheaper rows — one range-
    partitioned sort instead of O(n²) dominance tests — or grid-bucket
    the two axes and prune whole cells dominated by another cell's
    corner. Ties are kept (identical pairs do not strictly dominate each
    other), which the sort formulation must special-case — hence the
    join formulation as the semantic reference."""
    p = load_table(spark, sf, "part").select(
        "p_partkey", "p_size", "p_retailprice"
    )
    q = p.select(
        F.col("p_size").alias("q_size"),
        F.col("p_retailprice").alias("q_price"),
    )
    dominated = (
        (F.col("q_price") <= F.col("p_retailprice"))
        & (F.col("q_size") <= F.col("p_size"))
        & (
            (F.col("q_price") < F.col("p_retailprice"))
            | (F.col("q_size") < F.col("p_size"))
        )
    )
    return p.join(q, dominated, "left_anti").orderBy("p_partkey")


# ------------------------------------------- referential-integrity audit ----
# (child_table, fk_col, parent_table, pk_col) — the full TPC-H-ish FK graph
_FK_EDGES = (
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
)


@query(
    "q285_referential_integrity",
    oracle="\nUNION ALL\n".join(
        f"""
        SELECT '{c}.{fk}->{p}.{pk}' AS edge,
               (SELECT COUNT(*) FROM {c}) AS n_child,
               (SELECT COUNT(*) FROM {c}
                WHERE {fk} IS NOT NULL AND NOT EXISTS
                      (SELECT 1 FROM {p} WHERE {p}.{pk} = {c}.{fk})) AS n_orphans,
               (SELECT COUNT(*) FROM {c} WHERE {fk} IS NULL) AS n_null_fk
        """
        for c, fk, p, pk in _FK_EDGES
    )
    + "\nORDER BY edge",
)
def q285(spark: SparkSession, sf: str) -> DataFrame:
    """Referential-integrity audit over the warehouse's whole FK graph —
    the data-quality gate every ingest should run before publishing a
    snapshot: per relationship, child row count, orphan count (non-null
    FK with no parent), and null-FK count. Each edge is one left join of
    the child against the DISTINCT parent keys (the dedup makes the probe
    side minimal and the null-detect unambiguous), folded into a single
    aggregate — counting via SUM(parent IS NULL) instead of an anti-join
    keeps it to ONE pass over each child. The seven 1-row results
    union into the report. At 100 TB each edge is an independent keyed
    join — schedule them concurrently; small parents broadcast."""
    parts = []
    for c, fk, p, pk in _FK_EDGES:
        child = load_table(spark, sf, c)
        parent = load_table(spark, sf, p).select(
            F.col(pk).alias("__pk")
        ).distinct()
        joined = child.select(F.col(fk).alias("__fk")).join(
            parent, F.col("__fk") == F.col("__pk"), "left"
        )
        parts.append(
            joined.agg(
                F.lit(f"{c}.{fk}->{p}.{pk}").alias("edge"),
                F.count(F.lit(1)).alias("n_child"),
                F.sum(
                    (
                        F.col("__fk").isNotNull() & F.col("__pk").isNull()
                    ).cast("long")
                ).alias("n_orphans"),
                F.sum(F.col("__fk").isNull().cast("long")).alias("n_null_fk"),
            )
        )
    out = parts[0]
    for df in parts[1:]:
        out = out.unionByName(df)
    return out.orderBy("edge")


# --------------------------------------- late-dimension park-and-replay ----
@query(
    "q302_late_dimension_replay",
    oracle="""
    SELECT c.c_custkey, n.n_name AS nation_name
    FROM customer c LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey
    ORDER BY c.c_custkey
    """,
)
def q302(spark: SparkSession, sf: str) -> DataFrame:
    """Late-arriving-dimension handling, certified lossless: facts that
    miss the dimension at ingest time are PARKED, not dropped or
    null-joined-and-forgotten, and a later replay against the updated
    dimension resolves them. Simulated here: phase 1 joins customers
    against a dimension snapshot missing nations >= 15 (the late rows);
    misses park; phase 2 replays the parked rows against the full
    dimension; the union of both phases is hash-proven EQUAL to joining
    the complete dimension directly — no loss, no duplication, which is
    the invariant the park-and-replay pattern must keep while letting
    on-time facts publish without waiting. Both phases are keyed
    broadcast joins; parked volume is the miss rate, so the replay is
    O(late rows) — at 100 TB you re-drive a parking lot, not the fact
    table."""
    cust = load_table(spark, sf, "customer").select("c_custkey", "c_nationkey")
    dim_full = load_table(spark, sf, "nation").select("n_nationkey", "n_name")
    dim_v1 = dim_full.where(F.col("n_nationkey") < 15)  # pre-update snapshot
    phase1 = cust.join(
        F.broadcast(dim_v1), cust["c_nationkey"] == dim_v1["n_nationkey"], "left"
    )
    matched1 = phase1.where(F.col("n_nationkey").isNotNull()).select(
        "c_custkey", F.col("n_name").alias("nation_name")
    )
    parked = phase1.where(F.col("n_nationkey").isNull()).select(
        "c_custkey", "c_nationkey"
    )
    replay = parked.join(
        F.broadcast(dim_full),
        parked["c_nationkey"] == dim_full["n_nationkey"],
        "left",
    ).select("c_custkey", F.col("n_name").alias("nation_name"))
    return matched1.unionByName(replay).orderBy("c_custkey")


# ------------------------------------------- hierarchy subtree rollup ----
@query(
    "q304_subtree_rollup",
    oracle="""
    WITH RECURSIVE r AS (
        SELECT c_custkey AS custkey,
               CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
        FROM customer
    ),
    up AS (
        SELECT custkey, custkey AS anc, cents FROM r
        UNION ALL
        SELECT custkey, anc // 10 AS anc, cents FROM up WHERE anc >= 10
    )
    SELECT anc, CAST(COUNT(*) AS BIGINT) AS n_desc,
           CAST(SUM(cents) AS BIGINT) AS cents_total
    FROM up GROUP BY anc ORDER BY anc
    """,
)
def q304(spark: SparkSession, sf: str) -> DataFrame:
    """Subtree rollup over the q133 hierarchy (org-chart totals, BOM
    cost rollup, filesystem du): every node's descendant count and
    balance total. The oracle walks the manager chain with a recursive
    CTE; the Spark plan exploits that THIS hierarchy's ancestor set is
    CLOSED-FORM (digit prefixes: floor(key/10^i)) — each row explodes
    into its ≤ log₁₀(keyspace) ancestors ROW-LOCALLY and one hash
    aggregate keyed on the ancestor does the rollup. That
    explode-then-aggregate shape is the general 100 TB answer whenever
    the ancestor path is materializable per row (path-enumeration /
    closure-table designs); only a truly dynamic parent chain needs
    q133's iterative self-union, and even then the rollup runs on the
    closure output, never per-level accumulations. Exact integer cents
    throughout."""
    cust = load_table(spark, sf, "customer")
    r = cust.select(
        F.col("c_custkey").alias("custkey"),
        F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    ancs = F.filter(
        F.transform(
            F.sequence(F.lit(0), F.lit(7)),
            lambda i: (F.col("custkey") / F.pow(F.lit(10.0), i)).cast("long"),
        ),
        # every positive prefix, plus the node itself (custkey 0 exists)
        lambda a, i: (a >= 1) | (i == 0),
    )
    return (
        r.select(F.explode(ancs).alias("anc"), "cents")
        .groupBy("anc")
        .agg(
            F.count(F.lit(1)).alias("n_desc"),
            F.sum("cents").alias("cents_total"),
        )
        .orderBy("anc")
    )
