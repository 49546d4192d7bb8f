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
from ._util import DEC, round_det, sql_round_det
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
