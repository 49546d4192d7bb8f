"""TPC-H shape completion (q183-q199): the classic decision-support join /
subquery shapes not already covered by the declared surface (Q1/Q11/Q13/Q17/
Q22 shapes live in aggregation.py and relational.py). Together with those,
all 22 TPC-H query *shapes* are expressible on this engine.

The testdata star schema (TESTDATA.md) has no ``partsupp`` table and no
commit/receipt dates or ship modes on ``lineitem``, so each query keeps the
canonical TPC-H *plan shape* (the join graph, subquery structure, and
aggregate pattern that exercise the optimizer) while substituting available
columns: the part-supplier relation is derived as ``SELECT DISTINCT
l_partkey, l_suppkey FROM lineitem``, "late" is ``l_shipdate > o_orderdate
+ 30 days``, and supply-cost is proxied by ``0.5 * p_retailprice``.

Scale notes (SCALE.md conventions):
- tiny dims (region, nation) are broadcast explicitly; fact-fact joins
  shuffle on their equi keys and AQE re-plans skew;
- every money aggregate routes through exact DECIMAL(18,4) partials
  (_util.money_sum) so partition-order float addition cannot diverge from
  the single-threaded oracle;
- ratio-of-sums (Q8/Q14 shapes) divides two decimal sums cast to double and
  floor-rounds — bit-identical in any engine;
- the Q16 shape counts distinct suppliers via dedup-then-count (two
  hash aggs, O(groups) shuffle) rather than an inline count(distinct)
  whose first partial keys by groups x suppliers (see scale note on q30).

Reference parity: the reference declares no TPC-H suite, but its join and
subquery machinery (J1-J5, SQ1-SQ2 in SURVEY.md §2.3) is exactly what
these shapes exercise; Q17/Q22 shapes were already required verbatim
(`/root/reference/scripts/pyspark.py:359-373` join patterns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ._util import (
    _dec4,
    _sql_dec4,
    money_sum,
    round_det,
    sql_money_sum,
    sql_round_det,
)
from .registry import query


def _rev(pre: str = "") -> F.Column:
    return F.col(f"{pre}l_extendedprice") * (1 - F.col(f"{pre}l_discount"))


_SQL_REV = "l_extendedprice * (1 - l_discount)"


# ------------------------------------------------------------ Q2 shape ----
@query(
    "q183_tpch_q2_min_cost_supplier",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    elig AS (
        SELECT p_partkey, s_suppkey, s_acctbal, s_name, n_name
        FROM part
        JOIN ps ON l_partkey = p_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        JOIN region ON r_regionkey = n_regionkey
        WHERE r_name = 'EUROPE' AND p_size = 15
    )
    SELECT p_partkey, s_suppkey, s_acctbal, s_name, n_name
    FROM elig e
    WHERE s_acctbal = (SELECT MIN(s_acctbal) FROM elig m
                       WHERE m.p_partkey = e.p_partkey)
    ORDER BY p_partkey, s_suppkey
    """,
)
def q183(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q2 shape: min-per-group correlated subquery (decorrelated to
    an aggregate + equi join — what Catalyst produces for the correlated
    form). The part-supplier relation is derived from lineitem (no
    partsupp table); min(s_acctbal) stands in for min(ps_supplycost).
    MIN over doubles is order-insensitive, so the double equality against
    the oracle's correlated MIN is exact."""
    ps = (
        load_table(spark, sf, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    part = load_table(spark, sf, "part").filter(F.col("p_size") == 15)
    supp = load_table(spark, sf, "supplier")
    nat = load_table(spark, sf, "nation")
    reg = load_table(spark, sf, "region").filter(F.col("r_name") == "EUROPE")
    elig = (
        part.join(ps, ps.l_partkey == part.p_partkey)
        .join(supp, supp.s_suppkey == ps.l_suppkey)
        .join(F.broadcast(nat), nat.n_nationkey == supp.s_nationkey)
        .join(F.broadcast(reg), reg.r_regionkey == nat.n_regionkey)
        .select("p_partkey", "s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    mins = elig.groupBy("p_partkey").agg(F.min("s_acctbal").alias("min_bal"))
    return (
        elig.join(mins, "p_partkey")  # per-part agg scales with part — AQE
        # broadcasts while small, shuffled hash join beyond the threshold
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .select("p_partkey", "s_suppkey", "s_acctbal", "s_name", "n_name")
        .orderBy("p_partkey", "s_suppkey")
    )


# ------------------------------------------------------------ Q3 shape ----
@query(
    "q184_tpch_q3_shipping_priority",
    oracle=f"""
    SELECT o_orderkey, o_orderdate, {sql_money_sum(_SQL_REV, "rev")}
    FROM customer
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1999-01-01'
      AND l_shipdate > TIMESTAMP '1999-01-01'
    GROUP BY o_orderkey, o_orderdate
    ORDER BY rev DESC, o_orderkey LIMIT 10
    """,
)
def q184(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q3 shape: segment-filtered 3-way join, grouped revenue,
    top-10 (TakeOrderedAndProject — no full sort). The date predicates
    push into both parquet scans; the customer side is reduced ~5x before
    the join."""
    cust = load_table(spark, sf, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf, "orders").filter(
        F.col("o_orderdate") < "1999-01-01"
    )
    li = load_table(spark, sf, "lineitem").filter(F.col("l_shipdate") > "1999-01-01")
    return (
        cust.join(orders, orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(money_sum(_rev(), "rev"))
        .orderBy(F.desc("rev"), "o_orderkey")
        .limit(10)
    )


# ------------------------------------------------------------ Q4 shape ----
@query(
    "q185_tpch_q4_late_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q185(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS decorrelated to a left-semi join with a
    non-equi residual ("late" = shipped >30 days after order — the
    testdata has no commit/receipt dates). The semi join keys on
    l_orderkey so the shuffle is the equi key; the date comparison rides
    along as the join residual."""
    o = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ------------------------------------------------------------ Q5 shape ----
@query(
    "q186_tpch_q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name, {sql_money_sum(_SQL_REV, "revenue")}
    FROM customer
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name ORDER BY revenue DESC, n_name
    """,
)
def q186(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join with the local-supplier cross-constraint
    (c_nationkey = s_nationkey rides the supplier join as a residual).
    nation/region broadcast; the three fact joins shuffle on their keys."""
    cust = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load_table(spark, sf, "lineitem")
    supp = load_table(spark, sf, "supplier")
    nat = load_table(spark, sf, "nation")
    reg = load_table(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    return (
        cust.join(orders, orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("n_name")
        .agg(money_sum(_rev(), "revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


# ------------------------------------------------------------ Q6 shape ----
@query(
    "q187_tpch_q6_revenue_forecast",
    oracle=f"""
    SELECT {sql_money_sum("l_extendedprice * l_discount", "revenue")}
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q187(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate — every predicate reaches
    the parquet reader (PushedFilters), the projection reads 4 columns,
    and the single global sum is a two-stage partial/final decimal agg."""
    li = load_table(spark, sf, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(money_sum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"))


# ------------------------------------------------------------ Q7 shape ----
@query(
    "q188_tpch_q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INT) AS l_year,
           {sql_money_sum(_SQL_REV, "revenue")}
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q188(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume — two broadcast joins against
    the same dimension under different roles, with the disjunctive
    nation-pair predicate evaluated after both are attached."""
    supp = load_table(spark, sf, "supplier")
    li = load_table(spark, sf, "lineitem").filter(
        F.col("l_shipdate").between("1996-01-01", "1997-12-31")
    )
    orders = load_table(spark, sf, "orders")
    cust = load_table(spark, sf, "customer")
    n1 = load_table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        supp.join(li, li.l_suppkey == supp.s_suppkey)
        .join(orders, orders.o_orderkey == li.l_orderkey)
        .join(cust, cust.c_custkey == orders.o_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year")
        )
        .agg(money_sum(_rev(), "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ------------------------------------------------------------ Q8 shape ----
@query(
    "q189_tpch_q8_market_share",
    oracle=f"""
    WITH all_nations AS (
        SELECT CAST(year(o_orderdate) AS INT) AS o_year,
               {_sql_dec4(_SQL_REV)} AS volume,
               n2.n_name AS supp_nation
        FROM part
        JOIN lineitem ON l_partkey = p_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region ON r_regionkey = n1.n_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'AMERICA' AND p_type = 'LARGE'
          AND o_orderdate BETWEEN TIMESTAMP '1996-01-01'
                              AND TIMESTAMP '1997-12-31'
    )
    SELECT o_year,
           {sql_round_det(
               "CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume "
               "ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) "
               "/ CAST(SUM(volume) AS DOUBLE)", 6)} AS mkt_share
    FROM all_nations GROUP BY o_year ORDER BY o_year
    """,
)
def q189(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q8 shape: market share as a ratio of conditional sums — an
    8-relation join where the customer side fixes the market (region) and
    the supplier side supplies the share dimension. Both sums are exact
    decimals; the division is one double op, floor-rounded to 6 digits
    identically in both engines."""
    part = load_table(spark, sf, "part").filter(F.col("p_type") == "LARGE")
    li = load_table(spark, sf, "lineitem")
    supp = load_table(spark, sf, "supplier")
    orders = load_table(spark, sf, "orders").filter(
        F.col("o_orderdate").between("1996-01-01", "1997-12-31")
    )
    cust = load_table(spark, sf, "customer")
    n1 = load_table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_reg")
    )
    n2 = load_table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    reg = load_table(spark, sf, "region").filter(F.col("r_name") == "AMERICA")
    vol = _dec4(_rev())
    zero = F.lit(0).cast("decimal(18,4)")
    num = F.sum(
        F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(zero)
    ).cast("double")
    den = F.sum(vol).cast("double")
    return (
        part.join(li, li.l_partkey == part.p_partkey)
        .join(supp, supp.s_suppkey == li.l_suppkey)
        .join(orders, orders.o_orderkey == li.l_orderkey)
        .join(cust, cust.c_custkey == orders.o_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(reg), F.col("r_regionkey") == F.col("n1_reg"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(round_det(num / den, 6).alias("mkt_share"))
        .orderBy("o_year")
    )


# ------------------------------------------------------------ Q9 shape ----
@query(
    "q190_tpch_q9_product_profit",
    oracle=f"""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
           {sql_money_sum(
               "l_extendedprice * (1 - l_discount) "
               "- 0.5 * p_retailprice * l_quantity", "profit")}
    FROM part
    JOIN lineitem ON l_partkey = p_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY 1, 2
    ORDER BY nation, o_year DESC
    """,
)
def q190(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier-nation per year. Supply cost is
    proxied as 0.5 * p_retailprice (no partsupp table); the LIKE filter on
    p_name is the classic non-selective part filter that forces the join
    order decision onto the optimizer."""
    part = load_table(spark, sf, "part").filter(F.col("p_name").like("%red%"))
    li = load_table(spark, sf, "lineitem")
    supp = load_table(spark, sf, "supplier")
    orders = load_table(spark, sf, "orders")
    nat = load_table(spark, sf, "nation")
    profit = _rev() - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        part.join(li, li.l_partkey == part.p_partkey)
        .join(supp, supp.s_suppkey == li.l_suppkey)
        .join(orders, orders.o_orderkey == li.l_orderkey)
        .join(F.broadcast(nat), nat.n_nationkey == supp.s_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(money_sum(profit, "profit"))
        .orderBy("nation", F.desc("o_year"))
    )


# ----------------------------------------------------------- Q10 shape ----
@query(
    "q191_tpch_q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, c_acctbal, n_name,
           {sql_money_sum(_SQL_REV, "revenue")}
    FROM customer
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON n_nationkey = c_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def q191(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q10 shape: lost-revenue ranking — quarter window on orders,
    returnflag filter pushed to the lineitem scan, top-20 customers via
    TakeOrderedAndProject."""
    cust = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    li = load_table(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    nat = load_table(spark, sf, "nation")
    return (
        cust.join(orders, orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nat), nat.n_nationkey == cust.c_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(money_sum(_rev(), "revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# ----------------------------------------------------------- Q12 shape ----
@query(
    "q192_tpch_q12_shipping_delay_priority",
    oracle="""
    SELECT CASE WHEN datediff('day', o_orderdate, l_shipdate) <= 30 THEN 'FAST'
                WHEN datediff('day', o_orderdate, l_shipdate) <= 90 THEN 'MEDIUM'
                ELSE 'SLOW' END AS delay_bucket,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY delay_bucket ORDER BY delay_bucket
    """,
)
def q192(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q12 shape: conditional-count pivot over a derived category
    (shipping-delay bucket stands in for l_shipmode, which the testdata
    lacks). Two CASE sums in one hash aggregate — one pass, no pivot
    discovery step."""
    orders = load_table(spark, sf, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(delay <= 30, "FAST").when(delay <= 90, "MEDIUM").otherwise("SLOW")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy(bucket.alias("delay_bucket"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("delay_bucket")
    )


# ----------------------------------------------------------- Q14 shape ----
@query(
    "q193_tpch_q14_promo_revenue",
    oracle=f"""
    SELECT {sql_round_det(
        "100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN "
        + _sql_dec4(_SQL_REV)
        + " ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) "
        "/ CAST(SUM(" + _sql_dec4(_SQL_REV) + ") AS DOUBLE)", 6)} AS promo_pct
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01'
      AND l_shipdate < TIMESTAMP '1997-04-01'
    """,
)
def q193(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue percentage — ratio of a conditional
    decimal sum to the total, one month of lineitem joined to part.
    The part join is the canonical broadcast candidate (part is ~1/30 of
    lineitem); at 100 TB it exceeds the broadcast threshold and AQE picks
    the shuffle side."""
    li = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-03-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    part = load_table(spark, sf, "part").select("p_partkey", "p_type")
    vol = _dec4(_rev())
    zero = F.lit(0).cast("decimal(18,4)")
    num = F.sum(F.when(F.col("p_type") == "PROMO", vol).otherwise(zero)).cast("double")
    den = F.sum(vol).cast("double")
    return (
        li.join(part, part.p_partkey == li.l_partkey)
        .agg(round_det(F.lit(100.0) * num / den, 6).alias("promo_pct"))
    )


# ----------------------------------------------------------- Q15 shape ----
@query(
    "q194_tpch_q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no, {sql_money_sum(_SQL_REV, "total_revenue")}
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q194(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q15 shape: view + uncorrelated scalar-subquery max, joined
    back. The revenue view is computed once and reused for both the max
    and the final filter (same DataFrame object → Spark reuses the
    shuffle stage); the scalar max joins as a broadcast."""
    li = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        money_sum(_rev(), "total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("max_rev"))
    supp = load_table(spark, sf, "supplier")
    return (
        supp.join(revenue, revenue.supplier_no == supp.s_suppkey)
        .join(F.broadcast(mx), F.col("total_revenue") == F.col("max_rev"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# ----------------------------------------------------------- Q16 shape ----
@query(
    "q195_tpch_q16_supplier_part_counts",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p_brand, p_type, p_size, COUNT(*) AS supplier_cnt
    FROM (
        SELECT DISTINCT p_brand, p_type, p_size, l_suppkey
        FROM ps
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#1'
          AND p_size IN (1, 5, 10, 15, 20, 25)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                WHERE s_acctbal < 0)
    )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q195(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per (brand, type, size)
    with a NOT-IN exclusion (left anti join on the complaint-supplier
    set). The count(distinct) is expressed as dedup-then-count — two
    O(groups)-shuffle hash aggs instead of one partial agg keyed by
    groups x suppliers (scale note: q30 measured 2x on this split)."""
    ps = (
        load_table(spark, sf, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    part = load_table(spark, sf, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25)
    )
    bad = load_table(spark, sf, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    pairs = (
        ps.join(part, part.p_partkey == ps.l_partkey)
        .join(bad, ps.l_suppkey == bad.s_suppkey, "left_anti")  # supplier-
        # proportional subset: no forced hint, AQE decides
        .select("p_brand", "p_type", "p_size", "l_suppkey")
        .distinct()
    )
    return (
        pairs.groupBy("p_brand", "p_type", "p_size")
        .agg(F.count(F.lit(1)).alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# ----------------------------------------------------------- Q18 shape ----
@query(
    "q196_tpch_q18_large_volume_customers",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
           SUM(l_quantity) AS sum_qty
    FROM customer
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING SUM(l_quantity) > 200)
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
)
def q196(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q18 shape: IN over a grouped-HAVING subquery, decorrelated to
    a left-semi join against the qualifying order keys. l_quantity values
    are small integers stored as doubles, so SUM is exact in any
    partition order — no decimal detour needed."""
    li = load_table(spark, sf, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 200)
        .select("l_orderkey")
    )
    orders = load_table(spark, sf, "orders").join(
        big.withColumnRenamed("l_orderkey", "bk"),
        F.col("o_orderkey") == F.col("bk"),
        "left_semi",
    )
    cust = load_table(spark, sf, "customer")
    return (
        cust.join(orders, orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


# ----------------------------------------------------------- Q19 shape ----
@query(
    "q197_tpch_q19_disjunctive_predicates",
    oracle=f"""
    SELECT {sql_money_sum(_SQL_REV, "revenue")}
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 11 AND 20
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 21 AND 40
           AND l_quantity BETWEEN 20 AND 50)
    """,
)
def q197(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q19 shape: three OR'd conjunct groups mixing columns from both
    join sides. Catalyst extracts the common single-side disjuncts
    (p_brand IN (...), l_quantity <= 50) and pushes them below the join
    while the cross-side residual stays in the join condition."""
    li = load_table(spark, sf, "lineitem")
    part = load_table(spark, sf, "part")
    j = li.join(part, part.p_partkey == li.l_partkey)
    b = F.col("p_brand")
    sz = F.col("p_size")
    q = F.col("l_quantity")
    cond = (
        ((b == "Brand#1") & sz.between(1, 10) & q.between(1, 20))
        | ((b == "Brand#2") & sz.between(11, 20) & q.between(10, 30))
        | ((b == "Brand#3") & sz.between(21, 40) & q.between(20, 50))
    )
    return j.filter(cond).agg(money_sum(_rev(), "revenue"))


# ----------------------------------------------------------- Q20 shape ----
@query(
    "q198_tpch_q20_promo_suppliers",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier JOIN nation ON n_nationkey = s_nationkey
    WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
      AND s_suppkey IN (
          SELECT l_suppkey
          FROM lineitem JOIN part ON p_partkey = l_partkey
          WHERE p_type = 'PROMO'
            AND l_shipdate >= TIMESTAMP '1997-01-01'
            AND l_shipdate < TIMESTAMP '1998-01-01'
          GROUP BY l_suppkey HAVING SUM(l_quantity) > 100)
    ORDER BY s_suppkey
    """,
)
def q198(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q20 shape: nested semi join — suppliers in a nation set whose
    shipped volume of PROMO parts in the year clears a HAVING threshold.
    The inner aggregate reduces lineitem to a per-supplier row before the
    semi join, so the outer join is vs O(suppliers) rows."""
    supp = load_table(spark, sf, "supplier")
    nat = load_table(spark, sf, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
    )
    part = load_table(spark, sf, "part").filter(F.col("p_type") == "PROMO")
    li = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    qualifying = (
        li.join(part, part.p_partkey == li.l_partkey)  # part-proportional
        # filtered dim — AQE decides broadcast vs shuffle
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 100)
        .select("l_suppkey")
    )
    return (
        supp.join(F.broadcast(nat), nat.n_nationkey == supp.s_nationkey)
        .join(qualifying, qualifying.l_suppkey == supp.s_suppkey, "left_semi")
        # supplier-scale agg — no forced hint
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


# ----------------------------------------------------------- Q21 shape ----
@query(
    "q199_tpch_q21_waiting_suppliers",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON l1.l_suppkey = s_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 30 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o3.o_orderdate + INTERVAL 30 DAY)
    GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 10
    """,
)
def q199(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q21 shape: the only-late-supplier anti-correlation — a semi
    join (some OTHER supplier on the order) stacked with an anti join (no
    OTHER supplier was late). Both decorrelate to orderkey-keyed joins
    with a suppkey<> residual; "late" is shipped >30 days after the
    order date."""
    supp = load_table(spark, sf, "supplier")
    orders = load_table(spark, sf, "orders").filter(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    l1 = (
        li.join(orders, orders.o_orderkey == li.l_orderkey)
        .filter(late)
        .select("l_orderkey", "l_suppkey")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    l3 = l1.select(F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3"))
    waiting = (
        l1.join(
            l2,
            (F.col("k2") == F.col("l_orderkey")) & (F.col("s2") != F.col("l_suppkey")),
            "left_semi",
        ).join(
            l3,
            (F.col("k3") == F.col("l_orderkey")) & (F.col("s3") != F.col("l_suppkey")),
            "left_anti",
        )
    )
    return (
        waiting.join(supp, supp.s_suppkey == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )
