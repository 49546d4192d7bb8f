"""Scale-pattern family (q208-q211): the aggregation idioms that make
100 TB rollups tractable, each demonstrated as a registered query.

- q208: mergeable HLL sketches — the only sane way to count distincts
  across re-aggregation levels at scale (exact distinct does not merge;
  sketches do). Approximate by design → rows-only oracle + an
  error-bound pytest against the exact count (tests/test_operators.py).
- q209: incremental rollup — daily partial aggregates merged to monthly,
  hash-proven equal to aggregating the base table directly. This is the
  mergeability contract (SUM of SUMs, SUM of COUNTs, MIN of MINs, AVG
  from merged sums) that incremental/streaming pipelines rely on.
- q210: equi-depth histogram via NTILE — the complement of q125's
  fixed-width histogram; deterministic via a total order tiebreak.
- q211: partial-aggregation pushdown below a join — pre-aggregating
  lineitem to order grain before joining orders, hash-proven equal to
  the join-then-aggregate plan the oracle runs. At scale this shrinks
  the join's probe side from O(lineitems) to O(orders).

Reference parity: the reference aggregates only at final grain
(`/root/reference/scripts/pyspark.py` single-level groupBys); the
merge/pushdown patterns here are the extension surface that makes those
same aggregates incremental and join-efficient at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..materialize import materialize
from ..catalog import load_table
from ._util import DEC, _dec4, _sql_dec4, literal_frame, money_sum, ntile_from_rank, sql_money_sum
from .registry import query


# --------------------------------------------------- mergeable sketches ----
@query("q208_hll_sketch_union", oracle=None)
def q208(spark: SparkSession, sf: str) -> DataFrame:
    """Distinct users per event type via mergeable HLL sketches: daily
    hll_sketch_agg partials, hll_union_agg across days, then estimate.
    The daily grain is the re-aggregation level a 100 TB pipeline would
    persist — sketch bytes merge associatively, so monthly/yearly
    distincts come from unioning stored partials instead of re-scanning
    raw data. Approximate by design: rows-only driver check; the 5%%
    error bound vs exact distinct is asserted in pytest."""
    ev = load_table(spark, sf, "events")
    daily = ev.groupBy(
        F.col("event_type"), F.to_date("ts").alias("day")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    return (
        daily.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("distinct_users_est")
        )
        .orderBy("event_type")
    )


# --------------------------------------------------- incremental rollup ----
@query(
    "q209_incremental_rollup_merge",
    oracle=f"""
    SELECT date_trunc('month', l_shipdate) AS month, l_returnflag,
           {sql_money_sum("l_extendedprice", "total")},
           COUNT(*) AS n,
           MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty
    FROM lineitem
    GROUP BY month, l_returnflag
    ORDER BY month, l_returnflag
    """,
)
def q209(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental rollup: daily partial aggregates (the persisted grain)
    merged up to monthly. The oracle aggregates the base table directly —
    the hash match IS the proof that the merge functions (SUM of decimal
    SUMs, SUM of COUNTs, MIN of MINs, MAX of MAXs) reproduce the direct
    plan, which is what lets a pipeline reprocess one day instead of the
    whole table. Decimal partials stay unrounded until the final merge."""
    li = load_table(spark, sf, "lineitem")
    daily = li.groupBy(
        F.to_date("l_shipdate").alias("day"), F.col("l_returnflag")
    ).agg(
        F.sum(_dec4(F.col("l_extendedprice"))).alias("sum_dec"),
        F.count(F.lit(1)).alias("n"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )
    return (
        daily.groupBy(
            F.trunc(F.col("day"), "month").alias("month"), F.col("l_returnflag")
        )
        .agg(
            F.round(F.sum("sum_dec"), 2).cast("double").alias("total"),
            F.sum("n").alias("n"),
            F.min("min_qty").alias("min_qty"),
            F.max("max_qty").alias("max_qty"),
        )
        .orderBy("month", "l_returnflag")
    )


# ------------------------------------------------- equi-depth histogram ----
@query(
    "q210_equi_depth_histogram",
    oracle="""
    WITH tiled AS (
        SELECT o_totalprice,
               NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
        FROM orders
    )
    SELECT decile, COUNT(*) AS n,
           MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
    FROM tiled GROUP BY decile ORDER BY decile
    """,
)
def q210(spark: SparkSession, sf: str) -> DataFrame:
    """Equi-depth (decile) histogram of order totals: NTILE over a total
    order (o_orderkey tiebreak), then per-bucket count/min/max. The
    complement of q125's fixed-width histogram: equal mass, data-driven
    bounds. The global NTILE is the exact-contract variant; the scale
    path is registered as q218: same oracle, no global window."""
    o = load_table(spark, sf, "orders")
    tiled = o.select(
        "o_totalprice",
        F.ntile(10).over(W.orderBy("o_totalprice", "o_orderkey")).alias("decile"),
    )
    return (
        tiled.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
        .orderBy("decile")
    )


# ----------------------------------- equi-depth histogram, scale path ----
@query(
    "q218_equi_depth_histogram_distributed",
    oracle="""
    WITH tiled AS (
        SELECT o_totalprice,
               NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
        FROM orders
    )
    SELECT decile, COUNT(*) AS n,
           MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
    FROM tiled GROUP BY decile ORDER BY decile
    """,
)
def q218(spark: SparkSession, sf: str) -> DataFrame:
    """q210's scale twin: identical output (the oracle IS q210's NTILE
    SQL), but no partitionless window anywhere in the plan. Global rank is
    minted with the zipWithIndex shape (range-repartition on the sort key,
    per-partition row_number, broadcast prefix-sum offsets —
    `functions/refops.py:deterministic_id(fact_scale=True)`), then the
    decile comes from `_util.ntile_from_rank`, the exact NTILE closed form
    over (rank, total): with q = n div 10 and r = n mod 10 the first r
    buckets hold q+1 rows. (The earlier ``floor((rank-1)*k/n)+1`` form was
    NOT NTILE — it only matched because every test SF's order count is
    divisible by 10; round-2 ADVICE medium finding, regression-tested at a
    non-divisible count in tests/test_refops.py.) The total is a one-row
    broadcast. Every stage is bounded by a partition, so the same plan
    histograms a 100 TB column; the cheaper-but-approximate alternative
    (approx_percentile cut points + bin join) trades the exact-count
    contract away and is documented, not registered."""
    from ..functions.refops import deterministic_id

    o = load_table(spark, sf, "orders").select("o_totalprice", "o_orderkey")
    ranked = deterministic_id(
        o, ["o_totalprice", "o_orderkey"], name="rnk", fact_scale=True
    )
    total = ranked.agg(F.count(F.lit(1)).alias("n_tot"))
    return (
        ranked.crossJoin(F.broadcast(total))
        .select(
            "o_totalprice",
            ntile_from_rank(F.col("rnk"), F.col("n_tot"), 10).alias("decile"),
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
        .orderBy("decile")
    )


# -------------------------------------------- pre-agg below join proof ----
@query(
    "q211_preagg_below_join",
    oracle=f"""
    SELECT c_custkey, {sql_money_sum("l_extendedprice * (1 - l_discount)", "revenue")}
    FROM customer
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY c_custkey
    ORDER BY c_custkey
    """,
)
def q211(spark: SparkSession, sf: str) -> DataFrame:
    """Partial-aggregation pushdown: lineitem is pre-aggregated to order
    grain BEFORE joining orders/customer, then the order-grain partials
    merge per customer. The oracle runs the naive join-then-aggregate
    plan — the hash match proves the rewrite. At 100 TB the pushdown
    joins O(orders) pre-summed rows instead of O(lineitems), cutting the
    join shuffle by the average order width; Catalyst does not do this
    rewrite itself (it needs the aggregate-join commute), so it's an
    explicit plan choice. Decimal partials keep the merge exact."""
    li = load_table(spark, sf, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(_dec4(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
            "rev_dec"
        )
    )
    orders = load_table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf, "customer").select("c_custkey")
    return (
        cust.join(orders, orders.o_custkey == cust.c_custkey)
        .join(per_order, per_order.l_orderkey == orders.o_orderkey)
        .groupBy("c_custkey")
        .agg(F.round(F.sum("rev_dec"), 2).cast("double").alias("revenue"))
        .orderBy("c_custkey")
    )


# ----------------------------------------------------------- CDC apply ----
@query(
    "q215_cdc_latest_wins",
    oracle="""
    WITH log AS (
        SELECT o_orderkey AS k, 'I' AS op, 1 AS op_ts, o_totalprice AS price
        FROM orders
        UNION ALL
        SELECT o_orderkey, 'U', 2, o_totalprice + 10.0
        FROM orders WHERE o_orderkey % 5 = 0
        UNION ALL
        SELECT o_orderkey, 'D', 3, NULL
        FROM orders WHERE o_orderkey % 11 = 0
    ),
    latest AS (
        SELECT k, op, price,
               ROW_NUMBER() OVER (PARTITION BY k ORDER BY op_ts DESC) AS rn
        FROM log
    )
    SELECT k AS o_orderkey, price AS final_price
    FROM latest WHERE rn = 1 AND op <> 'D'
    ORDER BY o_orderkey
    """,
)
def q215(spark: SparkSession, sf: str) -> DataFrame:
    """CDC latest-wins apply: a change log (inserts, updates for every 5th
    key, deletes for every 11th — synthesized deterministically from
    orders) collapsed to final table state. ROW_NUMBER by op timestamp
    descending per key picks the winning op; deletes drop the key. This
    is the compaction step a CDC ingestion pipeline runs per batch; at
    scale the log is partitioned by key so the window sort touches each
    key's handful of ops, not the table. Ties are impossible by
    construction (distinct op_ts per op type)."""
    o = load_table(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    ins = o.select(
        F.col("o_orderkey").alias("k"), F.lit("I").alias("op"),
        F.lit(1).alias("op_ts"), F.col("o_totalprice").alias("price"),
    )
    upd = o.filter(F.col("o_orderkey") % 5 == 0).select(
        F.col("o_orderkey").alias("k"), F.lit("U").alias("op"),
        F.lit(2).alias("op_ts"), (F.col("o_totalprice") + 10.0).alias("price"),
    )
    dele = o.filter(F.col("o_orderkey") % 11 == 0).select(
        F.col("o_orderkey").alias("k"), F.lit("D").alias("op"),
        F.lit(3).alias("op_ts"), F.lit(None).cast("double").alias("price"),
    )
    log = ins.unionAll(upd).unionAll(dele)
    w = W.partitionBy("k").orderBy(F.desc("op_ts"))
    return (
        log.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "D"))
        .select(F.col("k").alias("o_orderkey"), F.col("price").alias("final_price"))
        .orderBy("o_orderkey")
    )


# ------------------------------------------------------ inverted index ----
@query(
    "q216_inverted_index",
    oracle="""
    WITH tok AS (
        SELECT DISTINCT doc_id,
               unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
        FROM documents
    )
    SELECT token, COUNT(*) AS df,
           array_to_string((list_sort(list(doc_id)))[1:10], ',') AS postings
    FROM tok GROUP BY token ORDER BY token
    """,
)
def q216(spark: SparkSession, sf: str) -> DataFrame:
    """Inverted-index construction: distinct (doc, token) pairs, then per
    token the document frequency and the first 10 postings in sorted doc
    order. sort_array(collect_list) makes the posting arrays
    deterministic regardless of partition arrival order; at scale the
    postings stay bounded (top-10) while df is the full count — the
    shape a BM25 retriever (q168) consumes. One explode + one hash
    aggregate keyed by token. The postings ship as a comma-joined string:
    top-level arrays crash the driver's pandas canonicalizer (the q107
    round-1 lesson), so list-shaped results serialize at the query edge."""
    from ..functions.text import words

    docs = load_table(spark, sf, "documents")
    tok = docs.select(
        "doc_id", F.explode(words(F.col("text"))).alias("token")
    ).distinct()
    return (
        tok.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.array_join(
                F.slice(F.sort_array(F.collect_list("doc_id")), 1, 10), ","
            ).alias("postings"),
        )
        .orderBy("token")
    )


# --------------------------------------------------- FILTER-clause kit ----
@query(
    "q217_aggregate_filter_clause",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(*) AS n,
           COUNT(*) FILTER (WHERE l_quantity > 25) AS big_qty_n,
           CAST(ROUND(SUM({_sql_dec4("l_extendedprice")})
               FILTER (WHERE l_discount > 0.05), 2) AS DOUBLE) AS disc_rev,
           COUNT(DISTINCT l_suppkey) FILTER (WHERE l_tax > 0.04) AS taxed_supps
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def q217(spark: SparkSession, sf: str) -> DataFrame:
    """ANSI aggregate FILTER clause, run through the SQL front end: four
    differently-filtered aggregates over one scan (the alternative —
    four self-joined subqueries — scans four times). Catalyst compiles
    FILTER to the same conditional partials a CASE WHEN would produce;
    the one caveat is the DISTINCT aggregate, which still triggers the
    expand-based distinct plan — at scale that one would be split out
    per the q30 pattern (SCALE.md §4). The decimal partial stays exact
    through the SUM, then rounds and casts to DOUBLE at the query edge:
    raw DECIMAL output is driver-hostile typing (pandas renders DuckDB
    DECIMAL as float64 but Spark DECIMAL as decimal.Decimal objects —
    the same latent class as the r3 HUGEINT reds)."""
    load_table(spark, sf, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(f"""
        SELECT l_returnflag,
               COUNT(*) AS n,
               COUNT(*) FILTER (WHERE l_quantity > 25) AS big_qty_n,
               CAST(ROUND(SUM({{dec}}) FILTER (WHERE l_discount > 0.05), 2)
                    AS DOUBLE) AS disc_rev,
               COUNT(DISTINCT l_suppkey) FILTER (WHERE l_tax > 0.04) AS taxed_supps
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """.format(dec="CAST(floor(l_extendedprice * 10000 + 0.5) / 10000 AS DECIMAL(18,4))"))


# --------------------------------------------------- salted hot-key agg ----
@query(
    "q222_salted_hot_key_agg",
    oracle=f"""
    WITH keyed AS (
        SELECT CASE WHEN event_id % 2 = 0 THEN 'hot' ELSE event_type END AS k,
               value
        FROM events
    )
    SELECT k, COUNT(*) AS n,
           {sql_money_sum('value', 'total')},
           MIN(value) AS lo, MAX(value) AS hi
    FROM keyed GROUP BY k ORDER BY k
    """,
)
def q222(spark: SparkSession, sf: str) -> DataFrame:
    """Salted two-phase aggregation for a pathologically hot key (half the
    table shares one group). Phase 1 aggregates on (key, salt) — the hot
    group's state spreads over 16 reducers instead of one; phase 2 merges
    the 16 partials per key. The oracle runs the direct single-phase GROUP
    BY — the hash match proves the decomposition (mergeable partials:
    decimal SUM of SUMs, SUM of COUNTs, MIN/MAX of MINs/MAXs).

    When it matters: Spark's partial (map-side) aggregation already
    absorbs most skew for algebraic aggregates, but the REDUCE side still
    funnels each key's partials to one task — fine at 16 partials/key,
    fatal when per-key state is large (collect_list, exact distinct) or
    when AQE skew handling is unavailable (it does not split skewed
    AGGREGATE partitions, only joins). The salt is deterministic
    (md5-derived), so the plan stays reproducible."""
    from ..functions.text import h64

    ev = load_table(spark, sf, "events")
    keyed = ev.select(
        F.when(F.col("event_id") % 2 == 0, F.lit("hot"))
        .otherwise(F.col("event_type"))
        .alias("k"),
        "value",
        (h64(F.col("event_id").cast("string")) % 16).alias("_salt"),
    )
    partial = keyed.groupBy("k", "_salt").agg(
        F.count(F.lit(1)).alias("n_p"),
        F.sum(_dec4(F.col("value"))).alias("sum_p"),
        F.min("value").alias("lo_p"),
        F.max("value").alias("hi_p"),
    )
    return (
        partial.groupBy("k")
        .agg(
            F.sum("n_p").alias("n"),
            F.round(F.sum("sum_p"), 2).cast("double").alias("total"),
            F.min("lo_p").alias("lo"),
            F.max("hi_p").alias("hi"),
        )
        .orderBy("k")
    )


# ------------------------------------------------------ salted hot-key join --
@query(
    "q229_salted_hot_key_join",
    oracle=f"""
    WITH keyed AS (
        SELECT CASE WHEN l_orderkey % 2 = 0 THEN 1 ELSE l_partkey END AS k,
               l_orderkey, l_extendedprice
        FROM lineitem
    )
    SELECT p.p_brand, COUNT(*) AS n,
           {sql_money_sum("keyed.l_extendedprice", "total")}
    FROM keyed JOIN part p ON keyed.k = p.p_partkey
    GROUP BY p.p_brand ORDER BY p.p_brand
    """,
)
def q229(spark: SparkSession, sf: str) -> DataFrame:
    """Salted equi-join for a pathologically hot join key (half the fact
    rows remapped onto ONE part key — the skew AQE's splitter handles for
    sort-merge joins but salting must handle when the join is
    shuffled-hash or the engine predates AQE). The fact side gets a
    DETERMINISTIC hash salt in [0,16), the dim side is exploded 16x, and
    the join runs on (key, salt) so the hot key's rows land on 16 tasks
    (operators/skew.py:salted_join with salt_src — rand() salting would
    also be row-count-correct but not oracle-pinnable). The oracle runs
    the plain unsalted join + GROUP BY; the hash match proves the salt is
    a partitioning artifact only."""
    from ..operators.skew import salted_join

    li = load_table(spark, sf, "lineitem").select(
        F.when(F.col("l_orderkey") % 2 == 0, F.lit(1))
        .otherwise(F.col("l_partkey"))
        .alias("p_partkey"),
        "l_orderkey",
        "l_extendedprice",
    )
    pt = load_table(spark, sf, "part").select("p_partkey", "p_brand")
    joined = salted_join(
        li, pt, on=["p_partkey"], n_salts=16, salt_src=F.col("l_orderkey")
    )
    return (
        joined.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            money_sum(F.col("l_extendedprice"), "total"),
        )
        .orderBy("p_brand")
    )


# ------------------------------------ incremental view maintenance (IVM) --
@query(
    "q235_ivm_delta_aggregate",
    oracle=f"""
    WITH final AS (
        SELECT event_type, value FROM events
        WHERE event_id % 89 <> 0                 -- deletes
        UNION ALL
        SELECT event_type, value * 2 FROM events -- updates: new image
        WHERE event_id % 97 = 0 AND event_id % 89 <> 0
    ),
    adjusted AS (
        -- an update retracts the old image: final = base - old + new,
        -- expressed here as (all survivors) minus (old images of updated)
        SELECT event_type, value FROM final
        EXCEPT ALL
        SELECT event_type, value FROM events
        WHERE event_id % 97 = 0 AND event_id % 89 <> 0
    )
    SELECT event_type, COUNT(*) AS n,
           {sql_money_sum("value", "total")}
    FROM adjusted GROUP BY event_type ORDER BY event_type
    """,
)
def q235(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental view maintenance under retractions — the pattern that
    keeps a standing aggregate current WITHOUT rescanning the 100 TB base:
    a CDC delta stream of (+1 insert, -1 retraction) rows is aggregated
    alone and MERGED into the base aggregate (count += Σsign,
    sum += Σ sign·value — exact decimal, so retraction is lossless).

    Deterministic CDC synthesis: event_id % 89 == 0 → DELETE (one -1 row);
    event_id % 97 == 0 (and not deleted) → UPDATE value→2·value (a -1 old
    image + a +1 new image). The Spark side NEVER touches the base table
    beyond the initial aggregate — the delta plan is O(changes); the
    oracle recomputes the final state from scratch, so the hash match
    proves base ⊕ deltas ≡ recompute. Groups whose count reaches zero are
    dropped (the retraction-completeness edge)."""
    ev = load_table(spark, sf, "events")
    base_agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(_dec4(F.col("value"))).alias("sum_dec"),
    )
    is_del = F.col("event_id") % 89 == 0
    is_upd = (F.col("event_id") % 97 == 0) & ~is_del
    deletes = ev.where(is_del).select(
        "event_type", F.lit(-1).alias("sign"), F.col("value")
    )
    upd_old = ev.where(is_upd).select(
        "event_type", F.lit(-1).alias("sign"), F.col("value")
    )
    upd_new = ev.where(is_upd).select(
        "event_type", F.lit(1).alias("sign"), (F.col("value") * 2).alias("value")
    )
    deltas = deletes.unionByName(upd_old).unionByName(upd_new)
    delta_agg = deltas.groupBy("event_type").agg(
        F.sum("sign").alias("dn"),
        F.sum(
            F.when(F.col("sign") == 1, _dec4(F.col("value"))).otherwise(
                -_dec4(F.col("value"))
            )
        ).alias("dsum"),
    )
    merged = (
        base_agg.join(delta_agg, "event_type", "full_outer")
        .select(
            "event_type",
            (F.coalesce("n", F.lit(0)) + F.coalesce("dn", F.lit(0))).alias("n"),
            (
                F.coalesce(F.col("sum_dec"), F.lit(0).cast(DEC))
                + F.coalesce(F.col("dsum"), F.lit(0).cast(DEC))
            ).alias("sum_dec"),
        )
        .where(F.col("n") > 0)
    )
    return merged.select(
        "event_type",
        "n",
        F.round(F.col("sum_dec"), 2).cast("double").alias("total"),
    ).orderBy("event_type")


# -------------------------------------------------- MERGE op matrix --------
@query(
    "q264_merge_matrix",
    oracle="""
    WITH target AS (
        SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey % 3 <> 0
    ),
    source AS (
        SELECT c_custkey, c_acctbal + 1000 AS new_bal, 'U' AS op
        FROM customer WHERE c_custkey % 3 <> 0 AND c_custkey % 7 = 0
        UNION ALL
        SELECT c_custkey, NULL, 'D'
        FROM customer
        WHERE c_custkey % 3 <> 0 AND c_custkey % 7 <> 0 AND c_custkey % 13 = 0
        UNION ALL
        SELECT c_custkey, c_acctbal + 500, 'I'
        FROM customer WHERE c_custkey % 3 = 0 AND c_custkey % 5 = 0
    )
    SELECT t.c_custkey AS c_custkey,
           CASE WHEN s.op = 'U' THEN s.new_bal ELSE t.c_acctbal END
               AS c_acctbal,
           CASE WHEN s.op = 'U' THEN 'updated' ELSE 'kept' END AS row_src
    FROM target t LEFT JOIN source s USING (c_custkey)
    WHERE s.op IS NULL OR s.op <> 'D'
    UNION ALL
    SELECT c_custkey, new_bal, 'inserted' FROM source WHERE op = 'I'
    ORDER BY c_custkey
    """,
)
def q264(spark: SparkSession, sf: str) -> DataFrame:
    """The full MERGE INTO operation matrix (WHEN MATCHED THEN UPDATE /
    WHEN MATCHED THEN DELETE / WHEN NOT MATCHED THEN INSERT) in one pass
    — Spark core has no MERGE statement (a table-format feature), so this
    is the relational decomposition every lakehouse MERGE compiles to:
    ONE outer join of target and change batch on the key, a row-local
    CASE for the action, and a union of the insert arm. Change batch
    synthesized deterministically (update keys %7, delete keys %13 with
    update-precedence, insert keys from outside the target).

    Scale shape: the change batch is small relative to the dimension —
    Catalyst broadcasts it into the join, so the 100 TB target is scanned
    once with ZERO shuffle and written back partition-aligned; the insert
    arm is O(changes). Complements q126 (SCD2 versioning) and q215
    (CDC latest-wins): this is the in-place op matrix."""
    c = load_table(spark, sf, "customer").select("c_custkey", "c_acctbal")
    target = c.where(F.col("c_custkey") % 3 != 0)
    upd = (
        c.where((F.col("c_custkey") % 3 != 0) & (F.col("c_custkey") % 7 == 0))
        .select(
            "c_custkey",
            (F.col("c_acctbal") + 1000).alias("new_bal"),
            F.lit("U").alias("op"),
        )
    )
    dele = (
        c.where(
            (F.col("c_custkey") % 3 != 0)
            & (F.col("c_custkey") % 7 != 0)
            & (F.col("c_custkey") % 13 == 0)
        )
        .select(
            "c_custkey",
            F.lit(None).cast("double").alias("new_bal"),
            F.lit("D").alias("op"),
        )
    )
    ins = (
        c.where((F.col("c_custkey") % 3 == 0) & (F.col("c_custkey") % 5 == 0))
        .select(
            "c_custkey",
            (F.col("c_acctbal") + 500).alias("new_bal"),
            F.lit("I").alias("op"),
        )
    )
    source = upd.unionByName(dele).unionByName(ins)
    merged = (
        target.join(F.broadcast(source), "c_custkey", "left")
        .where(F.col("op").isNull() | (F.col("op") != "D"))
        .select(
            "c_custkey",
            F.when(F.col("op") == "U", F.col("new_bal"))
            .otherwise(F.col("c_acctbal"))
            .alias("c_acctbal"),
            F.when(F.col("op") == "U", F.lit("updated"))
            .otherwise(F.lit("kept"))
            .alias("row_src"),
        )
    )
    inserted = ins.select(
        "c_custkey",
        F.col("new_bal").alias("c_acctbal"),
        F.lit("inserted").alias("row_src"),
    )
    return merged.unionByName(inserted).orderBy("c_custkey")


# ---------------------------------------------------- table checksums ------
@query(
    "q267_table_checksum",
    oracle="""
    SELECT l_orderkey % 16 AS bucket,
           COUNT(*) AS n,
           CAST(bit_xor(CAST(('0x' || substr(md5(
               CAST(l_orderkey AS VARCHAR) || '|' ||
               CAST(l_linenumber AS VARCHAR) || '|' ||
               CAST(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                    AS VARCHAR)
           ), 1, 15)) AS BIGINT)) AS BIGINT) AS xor_fingerprint
    FROM lineitem GROUP BY bucket ORDER BY bucket
    """,
)
def q267(spark: SparkSession, sf: str) -> DataFrame:
    """Per-bucket table checksums — the anti-entropy primitive for
    replica/copy verification at 100 TB: every row hashes its canonical
    representation (key columns + cent-quantized money) and the bucket
    fingerprint is the XOR of the row hashes — ORDER-INDEPENDENT and
    mergeable (XOR is associative+commutative), so two 100 TB copies
    compare by exchanging 16 rows, and a divergent bucket localizes the
    diff to 1/16 of the data (recurse to bisect). One hash aggregate,
    partial XOR on the map side; contrast q128's row-level table diff,
    which ships data — this ships fingerprints.

    The XOR trick's honest caveat, documented: a DOUBLED row cancels out
    (XOR of a value with itself is 0), which is why n rides along — count
    divergence catches multiplicity, XOR catches content."""
    from ..functions.text import h64

    li = load_table(spark, sf, "lineitem")
    row_repr = F.concat_ws(
        "|",
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .cast("string"),
    )
    return (
        li.groupBy((F.col("l_orderkey") % 16).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(h64(row_repr)).alias("xor_fingerprint"),
        )
        .orderBy("bucket")
    )


# ------------------------------------------- grid-bucketed interval join ----
VIEW_DUR_S = 7200
CLICK_DUR_S = 3600
GRID_W_S = 1800


@query(
    "q276_interval_overlap_join",
    oracle=f"""
    WITH v AS (
        SELECT user_id, event_id AS view_id,
               epoch_us(ts) // 1000000 AS vs,
               epoch_us(ts) // 1000000 + {VIEW_DUR_S} AS ve
        FROM events WHERE event_type = 'view'
    ),
    c AS (
        SELECT user_id, event_id AS click_id,
               epoch_us(ts) // 1000000 AS cs,
               epoch_us(ts) // 1000000 + {CLICK_DUR_S} AS ce
        FROM events WHERE event_type = 'click'
    )
    SELECT v.user_id, view_id, click_id,
           least(ve, ce) - greatest(vs, cs) AS overlap_s
    FROM v JOIN c ON v.user_id = c.user_id AND vs < ce AND cs < ve
    ORDER BY view_id, click_id
    """,
)
def q276(spark: SparkSession, sf: str) -> DataFrame:
    """Interval-overlap join via fixed-grid decomposition — the scale
    pattern for "which intervals intersect" (ad attribution, session
    stitching, sensor co-occurrence). The naive plan is a per-user theta
    join (the oracle's formulation — O(n·m) per user, a BNLJ at scale).
    Here each interval explodes into the {w}-second grid cells it covers
    (≤ ceil(dur/w)+1 slim rows), candidates come from an equi-join on
    (user_id, grid_cell) — any overlapping pair shares the cell containing
    the overlap's start, so recall is exact — and the precise ``a.start <
    b.end AND b.start < a.end`` predicate verifies candidates. A pair can
    share several cells, so a dropDuplicates on the pair key dedupes
    before output. Grid width trades explode fan-out against candidate
    precision; co-partitioning both sides by (user, cell) keeps the join
    shuffle-local at 100 TB."""
    ev = load_table(spark, sf, "events")

    def intervals(etype: str, idc: str, dur: int, s: str, e: str) -> DataFrame:
        us = F.unix_micros(F.col("ts").cast("timestamp"))
        # exact floor division of sub-2^53 longs (see _util._idiv)
        epoch = ((us - us % 1_000_000) / 1_000_000).cast("long")
        return (
            ev.where(F.col("event_type") == etype)
            .select(
                "user_id",
                F.col("event_id").alias(idc),
                epoch.alias(s),
                (epoch + dur).alias(e),
            )
        )

    def cells(df: DataFrame, s: str, e: str) -> DataFrame:
        lo = ((F.col(s) - F.col(s) % GRID_W_S) / GRID_W_S).cast("long")
        hi = (
            ((F.col(e) - 1) - (F.col(e) - 1) % GRID_W_S) / GRID_W_S
        ).cast("long")
        return df.withColumn("cell", F.explode(F.sequence(lo, hi)))

    v = cells(intervals("view", "view_id", VIEW_DUR_S, "vs", "ve"), "vs", "ve")
    c = cells(
        intervals("click", "click_id", CLICK_DUR_S, "cs", "ce"), "cs", "ce"
    )
    pairs = (
        v.join(c, ["user_id", "cell"])
        .where((F.col("vs") < F.col("ce")) & (F.col("cs") < F.col("ve")))
        .dropDuplicates(["view_id", "click_id"])
    )
    return pairs.select(
        "user_id",
        "view_id",
        "click_id",
        (
            F.least("ve", "ce") - F.greatest("vs", "cs")
        ).alias("overlap_s"),
    ).orderBy("view_id", "click_id")


q276.__doc__ = q276.__doc__.format(w=GRID_W_S)


# ---------------------------------------------- sampled estimation (AQP) ----
SAMPLE_PCT = 5  # hash-gated sample: pmod(h64(key), 100) < 5


@query(
    "q294_sampled_estimate",
    oracle=f"""
    WITH base AS (
        SELECT l_returnflag,
               CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
               CAST(('0x' || substr(md5('s:' || CAST(l_orderkey AS VARCHAR) || ':'
                     || CAST(l_linenumber AS VARCHAR)), 1, 15)) AS BIGINT) % 100
                 AS gate
        FROM lineitem
    ),
    agg AS (
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n_exact,
               CAST(SUM(cents) AS BIGINT) AS cents_exact,
               CAST(COUNT(*) FILTER (gate < {SAMPLE_PCT}) AS BIGINT) AS n_sample,
               CAST(COALESCE(SUM(cents) FILTER (gate < {SAMPLE_PCT}), 0) AS BIGINT)
                 AS cents_sample
        FROM base GROUP BY l_returnflag
    )
    SELECT l_returnflag, n_exact, n_sample,
           cents_sample * {100 // SAMPLE_PCT} AS cents_est,
           cents_exact,
           CAST(floor(ABS(CAST(cents_sample * {100 // SAMPLE_PCT} - cents_exact
                               AS DOUBLE)) / cents_exact * 1000000 + 0.5) AS BIGINT)
             AS rel_err_ppm
    FROM agg ORDER BY l_returnflag
    """,
)
def q294(spark: SparkSession, sf: str) -> DataFrame:
    """Approximate-query-processing by DETERMINISTIC hash sampling, with
    the error audited in the same pass: a {p}%% sample gated on a row-key
    hash (never rand() — membership is stable across runs, engines, and
    re-shards, so estimates are reproducible and debuggable), the
    scaled-up estimate, the exact total, and the realized relative error
    in ppm. One aggregate computes both sides via FILTER — in production
    the exact branch is dropped and the estimate costs {p}%% of the scan
    (with columnar storage + a persisted sample table, far less). The
    audit shape is the point: every AQP rollout should ship this
    two-sided query at small scale to calibrate the error budget before
    trusting samples at 100 TB. Integer cents keep both sides exact."""
    from ..functions.text import h64

    li = load_table(spark, sf, "lineitem")
    key = F.concat_ws(
        ":",
        F.lit("s"),
        F.col("l_orderkey").cast("string"),
        F.col("l_linenumber").cast("string"),
    )
    # mirror the oracle's plain % (h64 is nonnegative, so % == pmod)
    base = li.select(
        "l_returnflag",
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
        (h64(key) % 100).alias("gate"),
    )
    in_sample = F.col("gate") < SAMPLE_PCT
    agg = base.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.sum("cents").alias("cents_exact"),
        F.sum(in_sample.cast("long")).alias("n_sample"),
        F.coalesce(
            F.sum(F.when(in_sample, F.col("cents"))), F.lit(0)
        ).alias("cents_sample"),
    )
    est = F.col("cents_sample") * (100 // SAMPLE_PCT)
    err = F.floor(
        F.abs((est - F.col("cents_exact")).cast("double"))
        / F.col("cents_exact")
        * 1_000_000
        + F.lit(0.5)
    ).cast("long")
    return agg.select(
        "l_returnflag",
        "n_exact",
        "n_sample",
        est.alias("cents_est"),
        "cents_exact",
        err.alias("rel_err_ppm"),
    ).orderBy("l_returnflag")


q294.__doc__ = q294.__doc__.format(p=SAMPLE_PCT)


# ------------------------------------------------ cascade purge audit ----
PURGE_PCT = 2  # deterministic stand-in for an erasure-request list


@query(
    "q295_cascade_purge_audit",
    oracle=f"""
    WITH del_cust AS (
        SELECT c_custkey FROM customer
        WHERE CAST(('0x' || substr(md5('del:' || CAST(c_custkey AS VARCHAR)), 1, 15))
                   AS BIGINT) % 100 < {PURGE_PCT}
    ),
    del_orders AS (
        SELECT o_orderkey FROM orders
        WHERE EXISTS (SELECT 1 FROM del_cust d WHERE d.c_custkey = o_custkey)
    ),
    rows AS (
        SELECT 'customer' AS tbl,
               (SELECT COUNT(*) FROM del_cust) AS n_purged,
               (SELECT COUNT(*) FROM customer) AS n_total
        UNION ALL
        SELECT 'orders',
               (SELECT COUNT(*) FROM del_orders),
               (SELECT COUNT(*) FROM orders)
        UNION ALL
        SELECT 'lineitem',
               (SELECT COUNT(*) FROM lineitem
                WHERE EXISTS (SELECT 1 FROM del_orders d
                              WHERE d.o_orderkey = l_orderkey)),
               (SELECT COUNT(*) FROM lineitem)
    )
    SELECT tbl, n_purged, n_total,
           (n_purged * 1000000) // n_total AS share_ppm
    FROM rows ORDER BY tbl
    """,
)
def q295(spark: SparkSession, sf: str) -> DataFrame:
    """Right-to-be-forgotten CASCADE audit — the pre-flight every privacy
    purge runs before rewriting 100 TB: an erasure set of customers (a
    deterministic hash gate stands in for the request list) propagated
    down the FK graph (customer → orders → lineitem), reporting rows to
    purge and corpus share per table. Each hop is a LEFT SEMI join on the
    FK — the erasure set and its order expansion broadcast while small;
    at scale the semi joins stay keyed and the audit costs one scan per
    affected table. The numbers drive the actual purge strategy:
    share_ppm decides between partition-rewrite (clustered victims) and
    merge-on-read deletion vectors (scattered victims)."""
    from ..functions.text import h64

    cust = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders")
    li = load_table(spark, sf, "lineitem")
    del_cust = cust.where(
        h64(F.concat(F.lit("del:"), F.col("c_custkey").cast("string"))) % 100
        < PURGE_PCT
    ).select("c_custkey")
    del_orders = orders.join(
        del_cust, orders["o_custkey"] == del_cust["c_custkey"], "left_semi"
    ).select("o_orderkey")
    del_li = li.join(
        del_orders, li["l_orderkey"] == del_orders["o_orderkey"], "left_semi"
    )

    def report(tbl: str, purged: DataFrame, total: DataFrame) -> DataFrame:
        n_p = purged.agg(F.count(F.lit(1)).alias("n_purged"))
        n_t = total.agg(F.count(F.lit(1)).alias("n_total"))
        share = F.col("n_purged") * 1_000_000
        return (
            n_p.crossJoin(n_t)
            .select(
                F.lit(tbl).alias("tbl"),
                "n_purged",
                "n_total",
                ((share - share % F.col("n_total")) / F.col("n_total"))
                .cast("long")
                .alias("share_ppm"),
            )
        )

    out = (
        report("customer", del_cust, cust)
        .unionByName(report("orders", del_orders, orders))
        .unionByName(report("lineitem", del_li, li))
    )
    return out.orderBy("tbl")


# ----------------------------------------------- time-travel consistency ----
@query(
    "q296_time_travel_consistency",
    oracle="""
    SELECT 'v0' AS snapshot, event_type, COUNT(*) AS n,
           CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
    FROM events WHERE day(ts) <= 15
    GROUP BY event_type
    UNION ALL
    SELECT 'latest', event_type, COUNT(*) AS n,
           CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
    FROM events
    GROUP BY event_type
    ORDER BY snapshot, event_type
    """,
)
def q296(spark: SparkSession, sf: str) -> DataFrame:
    """Snapshot-isolation certification for the versioned-table facility
    (`sources/versioned.py`, the Delta-style commit log): the first half
    of the month commits as v0, the rest appends as v1, then BOTH
    ``read_version(v0)`` and the latest snapshot aggregate — and the
    oracle recomputes both aggregates straight from the raw table with
    the same day split. The hash match proves (a) time travel returns
    exactly the pre-append rows, untouched by the later commit, and (b)
    the append is lossless — the immutable-data-files + manifest-commit
    design doing its job. This is the reproducibility primitive training
    pipelines key on ("train on the corpus AS OF v0"); at 100 TB the
    only extra cost of versioning is manifest bookkeeping, since data
    files are written once either way."""
    import shutil
    import tempfile

    from ..sources.versioned import commit, read_version

    ev = load_table(spark, sf, "events")
    tdir = tempfile.mkdtemp(prefix="spark_graft_tt_")

    def agg(df: DataFrame, tag: str) -> DataFrame:
        return (
            df.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
                ).alias("cents"),
            )
            .select(F.lit(tag).alias("snapshot"), "event_type", "n", "cents")
        )

    try:
        commit(ev.where(F.dayofmonth("ts") <= 15), tdir)
        commit(ev.where(F.dayofmonth("ts") > 15), tdir)  # append -> v1
        v0 = agg(read_version(spark, tdir, 0), "v0")
        latest = agg(read_version(spark, tdir), "latest")
        # pin the tiny (2 × event_type) result so the temp table can be
        # removed before returning (was leaking one spark_graft_tt_* copy
        # of events per run — the q263 leak class)
        out = v0.unionByName(latest).transform(materialize)
    finally:
        shutil.rmtree(tdir, ignore_errors=True)
    return out.orderBy("snapshot", "event_type")


# ------------------------------------------------- reshard move audit ----
OLD_SHARDS = 16
NEW_SHARDS = 20
RING = 1 << 16


@query(
    "q318_reshard_plan",
    oracle=f"""
    WITH h AS (
        SELECT CAST(('0x' || substr(md5('shard:' || CAST(o_orderkey AS VARCHAR)), 1, 15))
                    AS BIGINT) % {RING} AS pos
        FROM orders
    ),
    tok AS (
        SELECT s,
               CAST(('0x' || substr(md5('node:' || CAST(s AS VARCHAR)), 1, 15))
                    AS BIGINT) % {RING} AS t
        FROM range({NEW_SHARDS}) r(s)
    ),
    ring AS (
        SELECT pos,
               arg_min(s, (t - pos + {RING}) % {RING})
                   FILTER (s < {OLD_SHARDS}) AS old_s,
               arg_min(s, (t - pos + {RING}) % {RING}) AS new_s
        FROM h, tok GROUP BY pos
    ),
    strat AS (
        SELECT 'mod' AS strategy,
               CAST(SUM(CASE WHEN pos % {OLD_SHARDS} <> pos % {NEW_SHARDS}
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_moved,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM h
        UNION ALL
        SELECT 'ring',
               CAST(SUM(CASE WHEN old_s <> new_s THEN 1 ELSE 0 END) AS BIGINT),
               CAST(COUNT(*) AS BIGINT)
        FROM (SELECT r.* FROM h JOIN ring r USING (pos))
    )
    SELECT strategy, n_moved, n,
           (n_moved * 1000000) // n AS moved_ppm
    FROM strat ORDER BY strategy
    """,
)
def q318(spark: SparkSession, sf: str) -> DataFrame:
    """Reshard migration audit — before growing a sharded store from
    {o} to {n} shards, measure how many rows each assignment strategy
    moves: naive ``hash mod shards`` reassigns nearly everything (the
    residues of two different divisors rarely agree — measured ~80%
    here), while CONSISTENT HASHING (each shard owns the ring arc
    before its token; new shards only claim slivers from their
    neighbors) moves (n−o)/n ≈ 20% in EXPECTATION — measured ~35% here
    because 20 single tokens leave high arc-size variance; virtual
    nodes (more token rows per shard, same query) tighten it toward
    the expectation. Assignment = the token
    minimizing the clockwise distance ``(tok − pos) mod ring`` — an
    arg-min over the O(shards) broadcast token table, so the audit is
    one scan + a tiny broadcast join; everything is integer ring
    arithmetic, engine-exact. The ppm pair is the number that decides
    whether resharding is an online change or a cluster-wide
    migration (production adds virtual nodes for arc balance — same
    query, more token rows)."""
    from ..functions.text import h64

    o = load_table(spark, sf, "orders")
    pos = (
        h64(F.concat(F.lit("shard:"), F.col("o_orderkey").cast("string")))
        % RING
    )
    h = o.select(pos.alias("pos"))
    spark_range = spark.range(NEW_SHARDS).select(
        F.col("id").alias("s"),
        (h64(F.concat(F.lit("node:"), F.col("id").cast("string"))) % RING).alias(
            "t"
        ),
    )
    dist = (F.col("t") - F.col("pos") + RING) % RING
    ring = (
        h.join(F.broadcast(spark_range), F.lit(True))
        .groupBy("pos")
        .agg(
            F.min(
                F.when(F.col("s") < OLD_SHARDS, F.struct(dist.alias("d"), F.col("s")))
            )["s"].alias("old_s"),
            F.min(F.struct(dist.alias("d"), F.col("s")))["s"].alias("new_s"),
        )
    )
    mod = h.agg(
        F.lit("mod").alias("strategy"),
        F.sum(
            ((F.col("pos") % OLD_SHARDS) != (F.col("pos") % NEW_SHARDS)).cast("long")
        ).alias("n_moved"),
        F.count(F.lit(1)).alias("n"),
    )
    rng = (
        h.join(ring, "pos")
        .agg(
            F.lit("ring").alias("strategy"),
            F.sum((F.col("old_s") != F.col("new_s")).cast("long")).alias("n_moved"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    out = mod.unionByName(rng)
    share = F.col("n_moved") * 1_000_000
    return out.select(
        "strategy",
        "n_moved",
        "n",
        ((share - share % F.col("n")) / F.col("n")).cast("long").alias("moved_ppm"),
    ).orderBy("strategy")


q318.__doc__ = q318.__doc__.format(o=OLD_SHARDS, n=NEW_SHARDS)


# ------------------------------------------------ bloom segment index ----
BLOOM_BITS = 1020  # 17 words x 60 usable bits (2^60 stays in BIGINT)
BLOOM_K = 3
BLOOM_WORD = 60


def _bloom_sql() -> str:
    from .extensions import _H64

    def hq(i: int, key: str) -> str:
        return (
            _H64.format(x=f"'b{i}:' || CAST({key} AS VARCHAR)")
            + f" % {BLOOM_BITS}"
        )

    build_rows = "\n        UNION ALL ".join(
        f"SELECT c_nationkey AS seg, {hq(i, 'c_custkey')} AS bit FROM customer"
        for i in range(BLOOM_K)
    )
    probe_rows = "\n        UNION ALL ".join(
        f"SELECT c_custkey AS probe_id, (c_nationkey + 1) % 25 AS seg,"
        f" {hq(i, 'c_custkey')} AS bit FROM customer"
        for i in range(BLOOM_K)
    )
    return f"""
    WITH build AS ({build_rows}),
    bits AS (
        SELECT seg, bit // {BLOOM_WORD} AS word,
               CAST(bit_or(CAST(floor(power(2, bit % {BLOOM_WORD})) AS BIGINT))
                    AS BIGINT) AS w
        FROM build GROUP BY seg, word
    ),
    probes AS ({probe_rows}),
    hits AS (
        SELECT probe_id, p.seg,
               CASE WHEN b.w IS NOT NULL AND
                         (b.w & CAST(floor(power(2, bit % {BLOOM_WORD})) AS BIGINT)) <> 0
                    THEN 1 ELSE 0 END AS hit
        FROM probes p LEFT JOIN bits b
          ON b.seg = p.seg AND b.word = p.bit // {BLOOM_WORD}
    ),
    verdicts AS (
        SELECT probe_id, seg,
               CASE WHEN SUM(hit) = {BLOOM_K} THEN 1 ELSE 0 END AS pos
        FROM hits GROUP BY probe_id, seg
    ),
    fill AS (
        SELECT seg, CAST(SUM(bit_count(w)) AS BIGINT) AS n_set_bits
        FROM bits GROUP BY seg
    )
    SELECT v.seg, CAST(COUNT(*) AS BIGINT) AS n_probes,
           CAST(SUM(pos) AS BIGINT) AS n_false_pos,
           (CAST(SUM(pos) AS BIGINT) * 1000000) // COUNT(*) AS fpr_ppm,
           f.n_set_bits
    FROM verdicts v JOIN fill f ON f.seg = v.seg
    GROUP BY v.seg, f.n_set_bits ORDER BY v.seg
    """


@query("q319_bloom_segment_index", oracle=_bloom_sql())
def q319(spark: SparkSession, sf: str) -> DataFrame:
    """Bloom-filter segment index built ENTIRELY with declarative
    bitwise aggregation — the membership-pruning structure that turns a
    100 TB semi-join into a broadcast bitmap probe (skip a segment
    unless all k bloom bits hit): per nation, member keys hash into
    {k} positions of a {b}-bit filter stored as {w} BIGINT words via
    ``bit_or`` (mergeable! partial filters OR together, so the build is
    map-side); probes check their {k} (word, mask) pairs against the
    broadcast bitmap. Every probe here targets a nation the customer is
    NOT in, so every positive is a FALSE positive — the query measures
    the realized FPR per segment alongside the fill factor (set-bit
    count via ``bit_count``), which is exactly the sizing feedback a
    bloom-pruned join needs. Masks are ``floor(2^bit)`` with bit < 60
    (exponent-exact doubles), all else integer bitwise — engine-exact."""
    from ..functions.text import h64

    cust = load_table(spark, sf, "customer")

    def hashed(i: int, tag_seg):
        return cust.select(
            tag_seg.alias("seg"),
            F.col("c_custkey").alias("probe_id"),
            (
                h64(
                    F.concat(
                        F.lit(f"b{i}:"), F.col("c_custkey").cast("string")
                    )
                )
                % BLOOM_BITS
            ).alias("bit"),
        )

    mask = F.floor(F.pow(F.lit(2.0), F.col("bit") % BLOOM_WORD)).cast("long")
    word = ((F.col("bit") - F.col("bit") % BLOOM_WORD) / BLOOM_WORD).cast("long")

    build = hashed(0, F.col("c_nationkey"))
    for i in range(1, BLOOM_K):
        build = build.unionByName(hashed(i, F.col("c_nationkey")))
    bits = (
        build.select("seg", word.alias("word"), mask.alias("m"))
        .groupBy("seg", "word")
        .agg(F.bit_or("m").alias("w"))
    )

    target = (F.col("c_nationkey") + 1) % 25
    probes = hashed(0, target)
    for i in range(1, BLOOM_K):
        probes = probes.unionByName(hashed(i, target))
    p = probes.select("probe_id", "seg", word.alias("word"), mask.alias("m"))
    hits = p.join(F.broadcast(bits), ["seg", "word"], "left").select(
        "probe_id",
        "seg",
        F.when(
            F.col("w").isNotNull() & (F.col("w").bitwiseAND(F.col("m")) != 0), 1
        )
        .otherwise(0)
        .alias("hit"),
    )
    verdicts = hits.groupBy("probe_id", "seg").agg(
        (F.sum("hit") == BLOOM_K).cast("long").alias("pos")
    )
    fill = bits.groupBy("seg").agg(F.sum(F.bit_count("w")).alias("n_set_bits"))
    agg = verdicts.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n_probes"), F.sum("pos").alias("n_false_pos")
    )
    fpr = F.col("n_false_pos") * 1_000_000
    return (
        agg.join(F.broadcast(fill), "seg")
        .select(
            "seg",
            "n_probes",
            "n_false_pos",
            ((fpr - fpr % F.col("n_probes")) / F.col("n_probes"))
            .cast("long")
            .alias("fpr_ppm"),
            "n_set_bits",
        )
        .orderBy("seg")
    )


q319.__doc__ = q319.__doc__.format(k=BLOOM_K, b=BLOOM_BITS, w=BLOOM_BITS // BLOOM_WORD)


# ------------------------------------------------- count-min sketch ----
CMS_ROWS = 4
CMS_W = 256
CMS_TOP = 20


def _cms_sql() -> str:
    from .extensions import _H64

    def hq(i: int) -> str:
        return (
            _H64.format(x=f"'cms{i}:' || CAST(user_id AS VARCHAR)")
            + f" % {CMS_W}"
        )

    build = "\n        UNION ALL ".join(
        f"SELECT {i} AS r, {hq(i)} AS c FROM events" for i in range(CMS_ROWS)
    )
    probe = "\n        UNION ALL ".join(
        f"SELECT user_id, {i} AS r, {hq(i)} AS c FROM hot"
        for i in range(CMS_ROWS)
    )
    return f"""
    WITH cells AS ({build}),
    cms AS (
        SELECT r, c, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM cells GROUP BY r, c
    ),
    exact AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_n
        FROM events GROUP BY user_id
    ),
    hot AS (
        SELECT user_id, exact_n FROM exact
        ORDER BY exact_n DESC, user_id LIMIT {CMS_TOP}
    ),
    probes AS ({probe}),
    est AS (
        SELECT p.user_id, CAST(MIN(m.cnt) AS BIGINT) AS est_n
        FROM probes p JOIN cms m ON m.r = p.r AND m.c = p.c
        GROUP BY p.user_id
    )
    SELECT h.user_id, h.exact_n, e.est_n,
           e.est_n - h.exact_n AS overestimate
    FROM hot h JOIN est e ON e.user_id = h.user_id
    ORDER BY h.exact_n DESC, h.user_id
    """


@query("q322_count_min_sketch", oracle=_cms_sql())
def q322(spark: SparkSession, sf: str) -> DataFrame:
    """Count-Min sketch frequency estimation — the streaming heavy-hitter
    counter whose memory is FIXED ({r}×{w} integers) no matter how many
    distinct keys flow through: every event increments one counter per
    hash row, and a key's estimate is the MIN across its {r} counters
    (always ≥ truth; collisions only inflate). Like q290/q319, the
    md5-derived sketch is DETERMINISTIC, so this approximate structure
    carries a full value-hash oracle — the report shows the hottest {t}
    keys with exact count, estimate, and realized overestimate, which is
    the calibration a production CMS (top-k dashboards, rate limiting)
    ships with. Build = one hash aggregate over {r} exploded cells per
    row, MERGEABLE by cell-wise addition (partial sketches sum — the
    q209 argument), probe = a {r}-row equi-join per key against the
    broadcast 1k-cell sketch."""
    from ..functions.text import h64

    ev = load_table(spark, sf, "events")

    def cells(df: DataFrame, cols: list) -> DataFrame:
        out = None
        for i in range(CMS_ROWS):
            c = (
                h64(
                    F.concat(
                        F.lit(f"cms{i}:"), F.col("user_id").cast("string")
                    )
                )
                % CMS_W
            )
            part = df.select(*cols, F.lit(i).alias("r"), c.alias("c"))
            out = part if out is None else out.unionByName(part)
        return out

    cms = (
        cells(ev, [])
        .groupBy("r", "c")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_n"))
    hot = exact.orderBy(F.col("exact_n").desc(), "user_id").limit(CMS_TOP)
    probes = cells(hot, ["user_id"])
    est = (
        probes.join(F.broadcast(cms), ["r", "c"])
        .groupBy("user_id")
        .agg(F.min("cnt").alias("est_n"))
    )
    return (
        hot.join(est, "user_id")
        .select(
            "user_id",
            "exact_n",
            "est_n",
            (F.col("est_n") - F.col("exact_n")).alias("overestimate"),
        )
        .orderBy(F.col("exact_n").desc(), "user_id")
    )


q322.__doc__ = q322.__doc__.format(r=CMS_ROWS, w=CMS_W, t=CMS_TOP)


# --------------------------------------------- functional dependencies ----
FD_CANDIDATES = (
    ("part", "p_partkey", "p_name"),
    ("part", "p_brand", "p_type"),
    ("part", "p_type", "p_size"),
    ("customer", "c_custkey", "c_mktsegment"),
    ("customer", "c_nationkey", "c_mktsegment"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("nation", "n_nationkey", "n_regionkey"),
)


def _fd_sql() -> str:
    arms = "\n        UNION ALL ".join(
        f"""SELECT '{t}.{lhs}->{rhs}' AS candidate,
               CAST(COUNT(*) AS BIGINT) AS n_groups,
               CAST(COUNT(*) FILTER (WHERE d > 1) AS BIGINT) AS violating
        FROM (SELECT {lhs}, COUNT(DISTINCT {rhs}) AS d
              FROM {t} GROUP BY {lhs})"""
        for (t, lhs, rhs) in FD_CANDIDATES
    )
    return f"""
    SELECT candidate, n_groups, violating, violating = 0 AS holds
    FROM ({arms})
    ORDER BY candidate
    """


@query("q323_fd_discovery", oracle=_fd_sql())
def q323(spark: SparkSession, sf: str) -> DataFrame:
    """Functional-dependency discovery (Metanome/profiling-style): for
    each candidate FD ``lhs -> rhs`` report how many lhs groups exist,
    how many VIOLATE (``>1`` distinct rhs), and whether the dependency
    holds — the schema-inference primitive behind key detection,
    normalization advice, and DQ contracts. Each candidate is one
    ``groupBy(lhs).agg(countDistinct(rhs))`` over a 2-column projection:
    Catalyst plans the distinct as a partial-deduped two-phase hash
    aggregate, so every arm is combiner-friendly and the unioned result
    is O(candidates) rows. At 100 TB candidate arms share scans per
    table (same pruned 2-3 column read) and nothing ever widens past
    (lhs, rhs). Extension surface beyond the reference's fixed-schema
    pipeline (`/root/reference/scripts/pyspark.py` trusts its schemas;
    this derives them)."""
    arms = []
    for t, lhs, rhs in FD_CANDIDATES:
        g = (
            load_table(spark, sf, t)
            .groupBy(lhs)
            .agg(F.countDistinct(rhs).alias("d"))
        )
        arms.append(
            g.agg(
                F.lit(f"{t}.{lhs}->{rhs}").alias("candidate"),
                F.count(F.lit(1)).alias("n_groups"),
                F.count(F.when(F.col("d") > 1, 1)).alias("violating"),
            )
        )
    out = arms[0]
    for a in arms[1:]:
        out = out.unionByName(a)
    return out.select(
        "candidate",
        "n_groups",
        "violating",
        (F.col("violating") == 0).alias("holds"),
    ).orderBy("candidate")


# --------------------------------------------- reciprocal rank fusion ----
RRF_K = 60
RRF_TOPN = 100
RRF_OUT = 25
_RRF_Q = 10**12


def _rrf_sql() -> str:
    vocab = "list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+'))"
    return f"""
    WITH base AS (
        SELECT doc_id, n_chars, CAST(len({vocab}) AS BIGINT) AS n_vocab
        FROM documents
    ),
    la AS (SELECT doc_id,
                  CAST(ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id)
                       AS BIGINT) AS r
           FROM (SELECT doc_id, n_chars FROM base
                 ORDER BY n_chars DESC, doc_id LIMIT {RRF_TOPN})),
    lb AS (SELECT doc_id,
                  CAST(ROW_NUMBER() OVER (ORDER BY n_vocab DESC, doc_id)
                       AS BIGINT) AS r
           FROM (SELECT doc_id, n_vocab FROM base
                 ORDER BY n_vocab DESC, doc_id LIMIT {RRF_TOPN})),
    fused AS (
        SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
               CAST(COALESCE({_RRF_Q} // ({RRF_K} + a.r), 0)
                  + COALESCE({_RRF_Q} // ({RRF_K} + b.r), 0)
                  AS BIGINT) AS rrf_q,
               a.r AS rank_chars, b.r AS rank_vocab
        FROM la a FULL OUTER JOIN lb b ON a.doc_id = b.doc_id
    )
    SELECT doc_id, rrf_q, rank_chars, rank_vocab
    FROM fused ORDER BY rrf_q DESC, doc_id LIMIT {RRF_OUT}
    """


@query("q325_rrf_fusion", oracle=_rrf_sql())
def q325(spark: SparkSession, sf: str) -> DataFrame:
    """Reciprocal-rank fusion — the hybrid-retrieval combiner (BM25 list
    + ANN list -> one ranking) — over two exact document rankings
    (char-length and distinct-vocab proxies for the two retrievers).
    The scale contract of real RRF is encoded exactly: each retriever
    contributes a BOUNDED top-{n} candidate list (TakeOrdered, no
    global sort of the corpus), ranks are assigned by a window over
    that O({n})-row list only, and the fusion is a full-outer equi-join
    of the two slim lists. The 1/(k+rank) weight is quantized to exact
    integer units via ppm-style floor division ({q} div (k+rank)) so
    the fused order is bit-stable cross-engine (no libm, no float
    sums — the q312 apportionment discipline)."""
    from ..functions.text import words

    docs = load_table(spark, sf, "documents")
    base = docs.select(
        "doc_id",
        "n_chars",
        F.size(F.array_distinct(words("text"))).cast("long").alias("n_vocab"),
    )

    def ranked(col: str, out: str) -> DataFrame:
        top = (
            base.select("doc_id", col)
            .orderBy(F.col(col).desc(), "doc_id")
            .limit(RRF_TOPN)
        )
        w = W.orderBy(F.col(col).desc(), "doc_id")
        return top.select(
            "doc_id", F.row_number().over(w).cast("long").alias(out)
        )

    la = ranked("n_chars", "ra")
    lb = ranked("n_vocab", "rb")
    fused = la.join(lb, "doc_id", "full_outer")
    score = (
        F.coalesce(F.expr(f"{_RRF_Q} div ({RRF_K} + ra)"), F.lit(0))
        + F.coalesce(F.expr(f"{_RRF_Q} div ({RRF_K} + rb)"), F.lit(0))
    ).cast("long")
    return (
        fused.select(
            "doc_id",
            score.alias("rrf_q"),
            F.col("ra").alias("rank_chars"),
            F.col("rb").alias("rank_vocab"),
        )
        .orderBy(F.col("rrf_q").desc(), "doc_id")
        .limit(RRF_OUT)
    )


q325.__doc__ = q325.__doc__.format(n=RRF_TOPN, q=_RRF_Q)


# --------------------------------------------- Spearman rank drift ----
_US_PER_DAY = 86_400_000_000


def _spearman_sql() -> str:
    def rank_cte(key: str) -> str:
        return f"""(
        SELECT g, {key},
               2*(CAST(SUM(c) OVER (PARTITION BY g ORDER BY {key})
                       AS BIGINT) - c) + c + 1 AS r
        FROM (SELECT g, {key}, CAST(COUNT(*) AS BIGINT) AS c
              FROM ev GROUP BY g, {key}))"""

    rho = (
        "(CAST(n AS DOUBLE)*sxy - CAST(sx AS DOUBLE)*sy)"
        " / (sqrt(CAST(n AS DOUBLE)*sxx - CAST(sx AS DOUBLE)*sx)"
        " * sqrt(CAST(n AS DOUBLE)*syy - CAST(sy AS DOUBLE)*sy))"
    )
    from ._util import sql_round_det

    return f"""
    WITH ev AS (
        SELECT event_type AS g,
               CAST(floor(value*100 + 0.5) AS BIGINT) AS vq,
               epoch_us(ts)//{_US_PER_DAY} AS d
        FROM events WHERE value IS NOT NULL
    ),
    rx AS {rank_cte("vq")},
    ry AS {rank_cte("d")},
    j AS (SELECT e.g, x.r AS rx, y.r AS ry
          FROM ev e
          JOIN rx x ON x.g = e.g AND x.vq = e.vq
          JOIN ry y ON y.g = e.g AND y.d = e.d),
    s AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(rx) AS BIGINT) AS sx,
                 CAST(SUM(ry) AS BIGINT) AS sy,
                 CAST(SUM(rx*rx) AS BIGINT) AS sxx,
                 CAST(SUM(ry*ry) AS BIGINT) AS syy,
                 CAST(SUM(rx*ry) AS BIGINT) AS sxy
          FROM j GROUP BY g)
    SELECT g AS event_type, n, {sql_round_det(rho, 9)} AS spearman
    FROM s ORDER BY event_type
    """


@query("q326_spearman_drift", oracle=_spearman_sql())
def q326(spark: SparkSession, sf: str) -> DataFrame:
    """Exact per-group Spearman rank correlation between metric value
    and event day — "is this metric drifting monotonically over time",
    the rank-based complement of Pearson (q119) that is robust to
    outliers and nonlinearity. Scale shape: NO data-scale window
    anywhere — tie-averaged ranks (2× units keep them integral) come
    from hash aggregates over the BOUNDED supports (cent-quantized
    values; days), cumulated by a window over the O(groups×support)
    aggregate only (the q309 ECDF discipline), then joined back to
    rows via slim broadcastable rank tables. Moments are exact BIGINT
    sums; the final rho is one identical double formula per group
    (sqrt is IEEE-exactly-rounded — the q308 rule), floor-quantized to
    9 digits."""
    from ._util import round_det

    ev = (
        load_table(spark, sf, "events")
        .where(F.col("value").isNotNull())
        .select(
            F.col("event_type").alias("g"),
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("long")
            .alias("vq"),
            F.expr(
                f"unix_micros(cast(ts as timestamp)) div {_US_PER_DAY}"
            ).alias("d"),
        )
        .transform(materialize)  # reused: two rank builds + join base
    )

    def ranks(key: str, out: str) -> DataFrame:
        cnt = ev.groupBy("g", key).agg(F.count(F.lit(1)).alias("c"))
        w = W.partitionBy("g").orderBy(key)
        return cnt.select(
            "g",
            key,
            (
                2 * (F.sum("c").over(w) - F.col("c")) + F.col("c") + 1
            ).alias(out),
        )

    j = ev.join(ranks("vq", "rx"), ["g", "vq"]).join(
        ranks("d", "ry"), ["g", "d"]
    )
    s = j.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).alias("syy"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    rho = (nd * F.col("sxy") - sxd * F.col("sy")) / (
        F.sqrt(nd * F.col("sxx") - sxd * F.col("sx"))
        * F.sqrt(nd * F.col("syy") - syd * F.col("sy"))
    )
    return s.select(
        F.col("g").alias("event_type"),
        "n",
        round_det(rho, 9).alias("spearman"),
    ).orderBy("event_type")


# ------------------------------------ deterministic HLL (oracle-backed) ----
HLL_M = 64  # registers (p = 6)
HLL_RHO_CAP = 30  # cap so 2^(CAP-reg) sums stay exact BIGINT
# alpha_64 * m^2 = 0.709 * 4096 = 2904.064, carried as 2904064 / 1000
HLL_ALPHA_M2_SCALED = 2904064


def _hll_sql() -> str:
    from .extensions import _H64

    h = _H64.format(x="'hll:' || CAST(user_id AS VARCHAR)")
    return f"""
    WITH hashed AS (
        SELECT {h} AS h FROM events
    ),
    rho AS (
        SELECT h % {HLL_M} AS bucket,
               LEAST(CASE WHEN h // {HLL_M} = 0 THEN {HLL_RHO_CAP}
                          ELSE bit_count(((h // {HLL_M}) & -(h // {HLL_M})) - 1) + 1
                     END, {HLL_RHO_CAP}) AS rho
        FROM hashed
    ),
    regs AS (
        SELECT s.bucket, CAST(COALESCE(MAX(r.rho), 0) AS BIGINT) AS reg
        FROM (SELECT unnest(range({HLL_M})) AS bucket) s
        LEFT JOIN rho r ON r.bucket = s.bucket
        GROUP BY s.bucket
    ),
    est AS (
        SELECT CAST(
            ({HLL_ALPHA_M2_SCALED} * (CAST(1 AS BIGINT) << {HLL_RHO_CAP}))
            // (1000 * SUM(CAST(1 AS BIGINT) << ({HLL_RHO_CAP} - reg)))
            AS BIGINT) AS est_raw
        FROM regs
    ),
    exact AS (
        SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
        FROM events
    )
    SELECT r.bucket, r.reg, e.est_raw, x.exact_distinct,
           CAST((e.est_raw - x.exact_distinct) * 10000
                // x.exact_distinct AS BIGINT) AS err_bps
    FROM regs r CROSS JOIN est e CROSS JOIN exact x
    ORDER BY r.bucket
    """


@query("q331_hll_registers_deterministic", oracle=_hll_sql())
def q331(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic HyperLogLog, oracle-backed end to end — the
    value-hash twin of q208's native ``hll_sketch_agg`` (which is
    rows-only because Spark's sketch bytes have no DuckDB twin). The
    registers are built from the shared md5 hash family: bucket = low
    6 bits, rho = trailing-zero count of the remaining 54 bits + 1
    via ``bit_count((v & -v) - 1)`` (pure integer ops, bit-identical
    across engines), capped at {cap} so the harmonic-mean denominator
    sums EXACTLY in BIGINT as ``2^({cap} - reg)`` terms — the raw HLL
    estimate then comes out of one integer division, no libm anywhere.
    Scale shape: ONE duplicate-insensitive hash aggregate
    (groupBy(bucket).max(rho)) whose map-side partials ARE mergeable
    sub-sketches — union of 100 TB worth of shards is a 64-row
    bucket-wise MAX, the q209 mergeability contract applied to
    distinct-counting. The 64-row register table joins the 1-row
    estimate/exact scalars by broadcast."""
    from ..functions.text import h64

    ev = load_table(spark, sf, "events")
    h = h64(F.concat(F.lit("hll:"), F.col("user_id").cast("string")))
    hashed = ev.select(h.alias("h"))
    v = F.expr(f"h div {HLL_M}")
    rho = F.least(
        F.when(v == 0, F.lit(HLL_RHO_CAP)).otherwise(
            F.bit_count(v.bitwiseAND(-v) - F.lit(1)) + F.lit(1)
        ),
        F.lit(HLL_RHO_CAP),
    )
    got = (
        hashed.select((F.col("h") % HLL_M).alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("mrho"))
    )
    spine = spark.range(HLL_M).select(F.col("id").alias("bucket"))
    regs = (
        spine.join(got, "bucket", "left")
        .select(
            "bucket",
            F.coalesce(F.col("mrho"), F.lit(0)).cast("long").alias("reg"),
        )
        .transform(materialize)  # read twice: estimate + output
    )
    est = regs.agg(
        F.expr(
            f"CAST({HLL_ALPHA_M2_SCALED} * CAST(shiftleft(1L, {HLL_RHO_CAP}) AS BIGINT)"
            f" div (1000 * SUM(CAST(shiftleft(1L, {HLL_RHO_CAP} - reg) AS BIGINT)))"
            " AS BIGINT)"
        ).alias("est_raw")
    )
    exact = ev.agg(
        F.countDistinct("user_id").cast("long").alias("exact_distinct")
    )
    return (
        regs.crossJoin(F.broadcast(est))
        .crossJoin(F.broadcast(exact))
        .select(
            "bucket",
            "reg",
            "est_raw",
            "exact_distinct",
            F.expr(
                "CAST((est_raw - exact_distinct) * 10000"
                " div exact_distinct AS BIGINT)"
            ).alias("err_bps"),
        )
        .orderBy("bucket")
    )


q331.__doc__ = q331.__doc__.format(cap=HLL_RHO_CAP)


# ------------------------------------------- frequent-itemset pair mining --
MINSUP_ITEM = 30
MINSUP_PAIR = 3


def _itemsets_sql() -> str:
    return f"""
    WITH b AS (
        SELECT DISTINCT l_orderkey AS k, l_partkey AS i FROM lineitem
    ),
    nb AS (SELECT CAST(COUNT(DISTINCT k) AS BIGINT) AS n_baskets FROM b),
    sup AS (
        SELECT i, CAST(COUNT(*) AS BIGINT) AS s FROM b GROUP BY i
    ),
    fi AS (SELECT i, s FROM sup WHERE s >= {MINSUP_ITEM}),
    fb AS (SELECT b.k, b.i FROM b JOIN fi ON fi.i = b.i),
    pairs AS (
        SELECT a.i AS item_a, c.i AS item_b, CAST(COUNT(*) AS BIGINT) AS pair_sup
        FROM fb a JOIN fb c ON a.k = c.k AND a.i < c.i
        GROUP BY a.i, c.i
    )
    SELECT p.item_a, p.item_b, p.pair_sup,
           fa.s AS sup_a, fc.s AS sup_b,
           CAST(p.pair_sup * nb.n_baskets * 1000000
                // (fa.s * fc.s) AS BIGINT) AS lift_ppm
    FROM pairs p
    JOIN fi fa ON fa.i = p.item_a
    JOIN fi fc ON fc.i = p.item_b
    CROSS JOIN nb
    WHERE p.pair_sup >= {MINSUP_PAIR}
    ORDER BY p.pair_sup DESC, p.item_a, p.item_b
    """


@query("q332_frequent_itemset_pairs", oracle=_itemsets_sql())
def q332(spark: SparkSession, sf: str) -> DataFrame:
    """Frequent-2-itemset mining with the Apriori pruning that q203
    (association rules) does NOT apply — q203 generates EVERY
    co-occurring pair and filters on pair support afterwards, which is
    the right reference semantics but leaves the O(sum basket²) pair
    space intact; here item supports come from ONE hash aggregate,
    items below minsup={mi} are dropped BEFORE pair generation (the
    anti-monotonicity bound — an infrequent item cannot appear in a
    frequent pair), and only the surviving slim (basket, item) rows
    self-join on the basket key — the same
    generate-through-an-equi-join-key discipline as the dedup
    families' prefix filter (q243 vs q91). Second difference: q203's
    confidence/lift are rounded double divisions; lift here is exact
    integer ppm (pair_sup·n_baskets·1e6 div sup_a·sup_b), so the
    rule-strength column hash-matches with no float boundary."""
    b = (
        load_table(spark, sf, "lineitem")
        .select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("i"))
        .distinct()
        .transform(materialize)  # read for supports AND pair join
    )
    nb = b.agg(F.countDistinct("k").cast("long").alias("n_baskets"))
    sup = b.groupBy("i").agg(F.count(F.lit(1)).cast("long").alias("s"))
    fi = sup.where(F.col("s") >= MINSUP_ITEM).transform(materialize)
    fb = b.join(F.broadcast(fi.select("i")), "i")
    fa = fb.select(F.col("k"), F.col("i").alias("item_a"))
    fc = fb.select(F.col("k"), F.col("i").alias("item_b"))
    pairs = (
        fa.join(fc, "k")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("long").alias("pair_sup"))
        .where(F.col("pair_sup") >= MINSUP_PAIR)
    )
    return (
        pairs.join(
            F.broadcast(fi.select(F.col("i").alias("item_a"), F.col("s").alias("sup_a"))),
            "item_a",
        )
        .join(
            F.broadcast(fi.select(F.col("i").alias("item_b"), F.col("s").alias("sup_b"))),
            "item_b",
        )
        .crossJoin(F.broadcast(nb))
        .select(
            "item_a",
            "item_b",
            "pair_sup",
            "sup_a",
            "sup_b",
            F.expr(
                "CAST(pair_sup * n_baskets * 1000000"
                " div (sup_a * sup_b) AS BIGINT)"
            ).alias("lift_ppm"),
        )
        .orderBy(F.col("pair_sup").desc(), "item_a", "item_b")
    )


q332.__doc__ = q332.__doc__.format(mi=MINSUP_ITEM)


# ----------------------------------------------- skyline (Pareto frontier) --
def _skyline_sql() -> str:
    return """
    WITH pts AS (
        SELECT p_partkey, p_size,
               CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS cents
        FROM part
    )
    SELECT a.p_partkey, a.p_size, a.cents
    FROM pts a
    WHERE NOT EXISTS (
        SELECT 1 FROM pts d
        WHERE d.p_size >= a.p_size AND d.cents <= a.cents
          AND (d.p_size > a.p_size OR d.cents < a.cents)
    )
    ORDER BY a.p_size, a.cents, a.p_partkey
    """


@query("q334_skyline_pareto", oracle=_skyline_sql())
def q334(spark: SparkSession, sf: str) -> DataFrame:
    """2-D skyline (Pareto frontier), the registered 100 TB twin that
    q172's docstring promises ("the 100 TB shape is sort-based ... one
    range-partitioned sort instead of O(n²) dominance tests"): q172
    keeps the theta anti-join as the semantic reference at dim-table
    size; here the dominance test is replaced by ONE hash aggregate to
    per-size minimum price (O(distinct sizes) rows — ~50 for TPC-H), a
    suffix-minimum over that bounded table (whitelisted
    bounded-support window), and a broadcast semi-join back to the
    base points — objective directions (maximize p_size, minimize
    price) flipped from q172 so both variants are covered. A point
    survives iff its price equals its size's minimum AND beats every
    strictly larger size's minimum; the tie case q172's docstring
    flags as the sort formulation's trap is handled exactly (equal
    points share the per-size minimum and both survive). Prices
    compared as exact cents (BIGINT); oracle = the n² NOT EXISTS."""
    pts = load_table(spark, sf, "part").select(
        "p_partkey",
        "p_size",
        F.floor(F.col("p_retailprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    per_size = pts.groupBy("p_size").agg(F.min("cents").alias("m"))
    w = (
        W.orderBy(F.col("p_size").desc())
        .rowsBetween(W.unboundedPreceding, -1)
    )
    frontier = (
        per_size.withColumn("suffix_min", F.min("m").over(w))
        .where(
            F.col("suffix_min").isNull() | (F.col("m") < F.col("suffix_min"))
        )
        .select("p_size", F.col("m").alias("cents"))
    )
    return (
        pts.join(F.broadcast(frontier), ["p_size", "cents"], "left_semi")
        .select("p_partkey", "p_size", "cents")
        .orderBy("p_size", "cents", "p_partkey")
    )


# ------------------------------------------ MAD-based robust outliers -----
def _mad_sql() -> str:
    return """
    WITH base AS (
        SELECT event_type AS t,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        FROM events WHERE value IS NOT NULL
    ),
    sup AS (
        SELECT t, cents, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM base GROUP BY t, cents
    ),
    tot AS (SELECT t, CAST(SUM(cnt) AS BIGINT) AS n FROM sup GROUP BY t),
    med AS (
        SELECT s.t, MIN(s.cents) AS med_cents
        FROM (SELECT t, cents, SUM(cnt) OVER (PARTITION BY t ORDER BY cents)
                     AS cum FROM sup) s
        JOIN tot ON tot.t = s.t
        WHERE s.cum >= (tot.n + 1) // 2
        GROUP BY s.t
    ),
    devsup AS (
        SELECT sup.t, abs(sup.cents - med.med_cents) AS dev,
               CAST(SUM(sup.cnt) AS BIGINT) AS cnt
        FROM sup JOIN med ON med.t = sup.t
        GROUP BY sup.t, abs(sup.cents - med.med_cents)
    ),
    mad AS (
        SELECT d.t, MIN(d.dev) AS mad_cents
        FROM (SELECT t, dev, SUM(cnt) OVER (PARTITION BY t ORDER BY dev)
                     AS cum FROM devsup) d
        JOIN tot ON tot.t = d.t
        WHERE d.cum >= (tot.n + 1) // 2
        GROUP BY d.t
    )
    SELECT tot.t AS event_type, tot.n, med.med_cents, mad.mad_cents,
           CAST(COALESCE(SUM(ds.cnt) FILTER (
               WHERE ds.dev > 3 * mad.mad_cents), 0) AS BIGINT) AS n_outliers
    FROM tot
    JOIN med ON med.t = tot.t
    JOIN mad ON mad.t = tot.t
    JOIN devsup ds ON ds.t = tot.t
    GROUP BY tot.t, tot.n, med.med_cents, mad.mad_cents
    ORDER BY tot.t
    """


@query("q337_mad_outliers", oracle=_mad_sql())
def q337(spark: SparkSession, sf: str) -> DataFrame:
    """Robust outlier detection via MAD — the integer-exact,
    support-collapsed scale twin of q169 (which computes MAD by
    float-interpolated ``quantile_cont`` and materializes group values,
    a caveat its docstring records): per event type, the exact lower
    median of cent-quantized values, the exact lower median of
    absolute deviations from it, and — new over q169 — the count of
    points beyond the 3×MAD fence, the actionable outlier gate. Scale
    shape: the raw table collapses to its (type, cents) SUPPORT by one
    hash aggregate first, so both median passes run cumulative windows
    over bounded distinct-value tables, never over data-scale rows
    (the q309 bounded-cent-support discipline); deviations
    re-aggregate the support, not the raw rows. Lower median (rank
    ceil(n/2)) is the pinned contract so even-count groups stay
    integer-exact with no interpolation anywhere."""
    base = (
        load_table(spark, sf, "events")
        .where(F.col("value").isNotNull())
        .select(
            F.col("event_type").alias("t"),
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("long")
            .alias("cents"),
        )
    )
    sup = (
        base.groupBy("t", "cents")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .transform(materialize)  # feeds totals, median, deviations
    )
    tot = sup.groupBy("t").agg(F.sum("cnt").cast("long").alias("n"))
    wt = W.partitionBy("t").orderBy("cents")
    med = (
        sup.withColumn("cum", F.sum("cnt").over(wt))
        .join(tot, "t")
        .where(F.col("cum") >= F.expr("(n + 1) div 2"))
        .groupBy("t")
        .agg(F.min("cents").alias("med_cents"))
    )
    devsup = (
        sup.join(F.broadcast(med), "t")
        .groupBy("t", F.abs(F.col("cents") - F.col("med_cents")).alias("dev"))
        .agg(F.sum("cnt").cast("long").alias("cnt"))
        .transform(materialize)  # feeds the MAD pass and the fence
    )
    wd = W.partitionBy("t").orderBy("dev")
    mad = (
        devsup.withColumn("cum", F.sum("cnt").over(wd))
        .join(tot, "t")
        .where(F.col("cum") >= F.expr("(n + 1) div 2"))
        .groupBy("t")
        .agg(F.min("dev").alias("mad_cents"))
    )
    fence = (
        devsup.join(F.broadcast(mad), "t")
        .groupBy("t", "mad_cents")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("dev") > 3 * F.col("mad_cents"), F.col("cnt")
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("n_outliers")
        )
    )
    return (
        tot.join(med, "t")
        .join(fence, "t")
        .select(
            F.col("t").alias("event_type"),
            "n",
            "med_cents",
            "mad_cents",
            "n_outliers",
        )
        .orderBy("event_type")
    )


# ------------------------------------ per-group deterministic HLL ---------
def _hll_group_sql() -> str:
    from .extensions import _H64

    h = _H64.format(x="'hll:' || CAST(user_id AS VARCHAR)")
    shift = f"CAST(1 AS BIGINT) << ({HLL_RHO_CAP} - reg)"
    return f"""
    WITH rho AS (
        SELECT event_type AS g, h % {HLL_M} AS bucket,
               LEAST(CASE WHEN h // {HLL_M} = 0 THEN {HLL_RHO_CAP}
                          ELSE bit_count(((h // {HLL_M}) & -(h // {HLL_M})) - 1) + 1
                     END, {HLL_RHO_CAP}) AS rho
        FROM (SELECT event_type, {h} AS h FROM events)
    ),
    regs AS (
        SELECT g, bucket, MAX(rho) AS reg FROM rho GROUP BY g, bucket
    ),
    est AS (
        SELECT g,
               CAST(({HLL_ALPHA_M2_SCALED}
                     * (CAST(1 AS BIGINT) << {HLL_RHO_CAP}))
                    // (1000 * (SUM({shift})
                        + ({HLL_M} - COUNT(*))
                          * (CAST(1 AS BIGINT) << {HLL_RHO_CAP})))
                    AS BIGINT) AS est_raw
        FROM regs GROUP BY g
    ),
    exact AS (
        SELECT event_type AS g,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
        FROM events GROUP BY event_type
    )
    SELECT e.g AS event_type, e.est_raw, x.exact_distinct,
           CAST((e.est_raw - x.exact_distinct) * 10000
                // x.exact_distinct AS BIGINT) AS err_bps
    FROM est e JOIN exact x ON x.g = e.g
    ORDER BY event_type
    """


@query("q340_hll_by_group", oracle=_hll_group_sql())
def q340(spark: SparkSession, sf: str) -> DataFrame:
    """q331's deterministic HLL applied at the grain a 100 TB rollup
    actually uses — one sketch PER DIMENSION CELL (distinct users per
    event type), the exact shape of rows-only q208 but value-hash
    oracle-backed end to end. The whole query is two hash aggregates:
    (group, bucket) → max rho, then group → harmonic sum folded with
    the empty-register correction computed arithmetically ((m − #present)
    empty buckets contribute 2^cap each), so no bucket spine join is
    needed at all. The per-group register partials remain mergeable
    sub-sketches — re-aggregating event-type sketches to an all-types
    sketch is a bucket-wise MAX, never a rescan."""
    from ..functions.text import h64

    ev = load_table(spark, sf, "events")
    h = h64(F.concat(F.lit("hll:"), F.col("user_id").cast("string")))
    hashed = ev.select(F.col("event_type").alias("g"), h.alias("h"))
    v = F.expr(f"h div {HLL_M}")
    rho = F.least(
        F.when(v == 0, F.lit(HLL_RHO_CAP)).otherwise(
            F.bit_count(v.bitwiseAND(-v) - F.lit(1)) + F.lit(1)
        ),
        F.lit(HLL_RHO_CAP),
    )
    regs = (
        hashed.select("g", (F.col("h") % HLL_M).alias("bucket"), rho.alias("rho"))
        .groupBy("g", "bucket")
        .agg(F.max("rho").alias("reg"))
    )
    est = regs.groupBy("g").agg(
        F.expr(
            f"CAST({HLL_ALPHA_M2_SCALED} * CAST(shiftleft(1L, {HLL_RHO_CAP}) AS BIGINT)"
            f" div (1000 * (SUM(CAST(shiftleft(1L, {HLL_RHO_CAP} - reg) AS BIGINT))"
            f" + ({HLL_M} - COUNT(*)) * CAST(shiftleft(1L, {HLL_RHO_CAP}) AS BIGINT)))"
            " AS BIGINT)"
        ).alias("est_raw")
    )
    exact = ev.groupBy(F.col("event_type").alias("g")).agg(
        F.countDistinct("user_id").cast("long").alias("exact_distinct")
    )
    return (
        est.join(exact, "g")
        .select(
            F.col("g").alias("event_type"),
            "est_raw",
            "exact_distinct",
            F.expr(
                "CAST((est_raw - exact_distinct) * 10000"
                " div exact_distinct AS BIGINT)"
            ).alias("err_bps"),
        )
        .orderBy("event_type")
    )


# ------------------------------------ inclusion-dependency discovery ------
IND_CANDIDATES = (
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("events", "user_id", "customer", "c_custkey"),
    ("part", "p_size", "nation", "n_nationkey"),
)


def _ind_sql() -> str:
    arms = "\n    UNION ALL ".join(
        f"""SELECT '{ta}.{ca} <= {tb}.{cb}' AS candidate,
               CAST(COUNT(*) AS BIGINT) AS n_distinct,
               CAST(COUNT(*) FILTER (WHERE b.v IS NOT NULL) AS BIGINT)
                 AS n_contained
        FROM (SELECT DISTINCT {ca} AS v FROM {ta}) a
        LEFT JOIN (SELECT DISTINCT {cb} AS v FROM {tb}) b ON b.v = a.v"""
        for (ta, ca, tb, cb) in IND_CANDIDATES
    )
    return f"""
    SELECT candidate, n_distinct, n_contained,
           CAST(n_contained * 1000000 // n_distinct AS BIGINT)
             AS containment_ppm,
           n_contained = n_distinct AS holds
    FROM ({arms})
    ORDER BY candidate
    """


@query("q357_inclusion_dependencies", oracle=_ind_sql())
def q357(spark: SparkSession, sf: str) -> DataFrame:
    """Inclusion-dependency discovery (the FOREIGN-KEY complement of
    q323's functional dependencies, per Metanome-style profiling):
    for each candidate column pair A ⊆ B, how many of A's distinct
    values exist in B — containment 1.0 means A is FK-shaped into B,
    partial containment exposes orphaned keys (the row-level version
    is q285's referential-integrity audit; this is the
    schema-discovery view over a candidate catalog that includes true
    FKs, a plausible-but-partial pair, and an accidental-overlap
    decoy). Per candidate: ONE distinct aggregate on each side and a
    keyed left join of the two distinct sets — O(distinct values)
    shuffle, never row-scale; candidates are config-bounded as in all
    profiling families."""
    from functools import reduce

    arms = []
    for ta, ca, tb, cb in IND_CANDIDATES:
        a = load_table(spark, sf, ta).select(F.col(ca).alias("v")).distinct()
        b = (
            load_table(spark, sf, tb)
            .select(F.col(cb).alias("v"))
            .distinct()
            .withColumn("_hit", F.lit(1))
        )
        arm = a.join(b, "v", "left").agg(
            F.lit(f"{ta}.{ca} <= {tb}.{cb}").alias("candidate"),
            F.count(F.lit(1)).cast("long").alias("n_distinct"),
            F.count("_hit").cast("long").alias("n_contained"),
        )
        arms.append(arm)
    out = reduce(lambda x, y: x.unionByName(y), arms)
    return out.select(
        "candidate",
        "n_distinct",
        "n_contained",
        F.expr(
            "CAST(n_contained * 1000000 div n_distinct AS BIGINT)"
        ).alias("containment_ppm"),
        (F.col("n_contained") == F.col("n_distinct")).alias("holds"),
    ).orderBy("candidate")


# ------------------------------------------ set-intersection (UpSet) ------
def _upset_sql() -> str:
    return """
    WITH flags AS (
        SELECT user_id,
               MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS f_view,
               MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS f_click,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                 AS f_purchase
        FROM events GROUP BY user_id
    )
    SELECT CAST(f_view AS BIGINT) AS has_view,
           CAST(f_click AS BIGINT) AS has_click,
           CAST(f_purchase AS BIGINT) AS has_purchase,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM flags
    WHERE f_view + f_click + f_purchase > 0
    GROUP BY f_view, f_click, f_purchase
    ORDER BY has_view, has_click, has_purchase
    """


@query("q358_set_overlap_upset", oracle=_upset_sql())
def q358(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-set overlap (UpSet-plot backing data): the 2³−1 exclusive
    intersection cells of the view/click/purchase audiences — the
    audience-overlap question Venn counts answer badly past two sets
    (every user lands in EXACTLY one cell, so cells sum to the union,
    unlike pairwise-intersection reports that double-count). Plan:
    membership flags collapse per user in ONE hash aggregate
    (MAX-of-CASE — duplicate-insensitive, mergeable partials), then
    the cell histogram is a second aggregate over the 8-row flag
    space. Generalizes to k sets as k flag columns, still two
    aggregates; at 100 TB the per-user flag pass is the only
    data-scale stage."""
    ev = load_table(spark, sf, "events")
    flags = ev.groupBy("user_id").agg(
        *[
            F.max(
                F.when(F.col("event_type") == t, 1).otherwise(0)
            ).alias(f"f_{t}")
            for t in ("view", "click", "purchase")
        ]
    )
    return (
        flags.where(
            F.col("f_view") + F.col("f_click") + F.col("f_purchase") > 0
        )
        .groupBy(
            F.col("f_view").cast("long").alias("has_view"),
            F.col("f_click").cast("long").alias("has_click"),
            F.col("f_purchase").cast("long").alias("has_purchase"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy("has_view", "has_click", "has_purchase")
    )


# ------------------------------ FIFO allocation via cumsum intervals ------
@query(
    "q364_fifo_allocation",
    oracle="""
    WITH base AS (
        SELECT l_partkey AS partkey, l_returnflag, l_shipdate, l_orderkey,
               l_linenumber,
               CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty,
               CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
        FROM lineitem
    ),
    sup AS (
        SELECT partkey, qty,
               CAST(floor(CAST(cents * 1000 AS DOUBLE) / qty) AS BIGINT)
                   AS unit_mc,
               CAST(SUM(qty) OVER (PARTITION BY partkey
                    ORDER BY l_shipdate, l_orderkey, l_linenumber
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS hi
        FROM base WHERE l_returnflag = 'R'
    ),
    dem AS (
        SELECT partkey, qty,
               CAST(SUM(qty) OVER (PARTITION BY partkey
                    ORDER BY l_shipdate, l_orderkey, l_linenumber
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS hi
        FROM base WHERE l_returnflag <> 'R'
    ),
    pairs AS (
        SELECT s.partkey,
               least(s.hi, d.hi) - greatest(s.hi - s.qty, d.hi - d.qty)
                   AS alloc,
               s.unit_mc
        FROM sup s JOIN dem d
          ON s.partkey = d.partkey
         AND s.hi - s.qty < d.hi AND d.hi - d.qty < s.hi
    ),
    m AS (
        SELECT partkey, CAST(SUM(alloc) AS BIGINT) AS matched_qty,
               CAST(SUM(alloc * unit_mc) AS BIGINT) AS cogs_millicents
        FROM pairs GROUP BY partkey
    ),
    st AS (SELECT partkey, CAST(SUM(qty) AS BIGINT) AS supply_qty
           FROM base WHERE l_returnflag = 'R' GROUP BY partkey),
    dt AS (SELECT partkey, CAST(SUM(qty) AS BIGINT) AS demand_qty
           FROM base WHERE l_returnflag <> 'R' GROUP BY partkey)
    SELECT COALESCE(st.partkey, dt.partkey) AS partkey,
           CAST(COALESCE(st.supply_qty, 0) AS BIGINT) AS supply_qty,
           CAST(COALESCE(dt.demand_qty, 0) AS BIGINT) AS demand_qty,
           CAST(COALESCE(m.matched_qty, 0) AS BIGINT) AS matched_qty,
           CAST(COALESCE(dt.demand_qty, 0) - COALESCE(m.matched_qty, 0)
                AS BIGINT) AS backlog_qty,
           CAST(COALESCE(m.cogs_millicents, 0) AS BIGINT) AS cogs_millicents
    FROM st FULL OUTER JOIN dt ON st.partkey = dt.partkey
    LEFT JOIN m ON COALESCE(st.partkey, dt.partkey) = m.partkey
    ORDER BY partkey
    """,
)
def q364(spark: SparkSession, sf: str) -> DataFrame:
    """FIFO inventory allocation — the classic "impossible in SQL"
    sequential matcher (each demand row consumes the OLDEST remaining
    supply lots), expressed with zero sequential state: per part,
    supply lots and demand rows each get a cumulative-quantity
    interval [hi−qty, hi) in ship order, and FIFO allocation is
    exactly the pairwise INTERSECTION of those two monotone interval
    chains — ``min(hi) − max(lo)`` over an interval-overlap equi-join
    on partkey. Returned stock ('R' lines, in shipdate order) forms
    the lot chain; every other line is demand; allocated cost carries
    the lot's exact unit millicents, so COGS is integer end to end.

    Scale shape: both cumsums are windows PARTITIONED by part (no
    global window), and because the two interval chains are monotone
    within a part, the overlap join's output is LINEAR — at most
    (n_supply + n_demand − 1) pairs per part, never the O(n·m)
    rectangle (each pair advances at least one chain; the classic
    merge argument). The join itself is a keyed equi-join on partkey
    with a residual range predicate — co-partitioned, no broadcast of
    anything data-scale. Companion shapes: q276 (interval OVERLAP
    join, time axis), q300 (running clamp), q153 (interval union) —
    none of them ALLOCATE one chain against another."""
    li = load_table(spark, sf, "lineitem")
    base = li.select(
        F.col("l_partkey").alias("partkey"),
        "l_returnflag",
        "l_shipdate",
        "l_orderkey",
        "l_linenumber",
        F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long").alias("qty"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    w = (
        W.partitionBy("partkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    sup = (
        base.where(F.col("l_returnflag") == "R")
        .select(
            "partkey",
            "qty",
            F.floor((F.col("cents") * 1000).cast("double") / F.col("qty"))
            .cast("long")
            .alias("unit_mc"),
            F.sum("qty").over(w).cast("long").alias("hi"),
        )
    )
    dem = (
        base.where(F.col("l_returnflag") != "R")
        .select("partkey", "qty", F.sum("qty").over(w).cast("long").alias("hi"))
    )
    s, d = sup.alias("s"), dem.alias("d")
    pairs = s.join(
        d,
        (F.col("s.partkey") == F.col("d.partkey"))
        & (F.col("s.hi") - F.col("s.qty") < F.col("d.hi"))
        & (F.col("d.hi") - F.col("d.qty") < F.col("s.hi")),
    ).select(
        F.col("s.partkey").alias("partkey"),
        (
            F.least(F.col("s.hi"), F.col("d.hi"))
            - F.greatest(
                F.col("s.hi") - F.col("s.qty"), F.col("d.hi") - F.col("d.qty")
            )
        ).alias("alloc"),
        F.col("s.unit_mc").alias("unit_mc"),
    )
    m = pairs.groupBy("partkey").agg(
        F.sum("alloc").cast("long").alias("matched_qty"),
        F.sum(F.col("alloc") * F.col("unit_mc")).cast("long").alias("cogs_millicents"),
    )
    st = (
        base.where(F.col("l_returnflag") == "R")
        .groupBy("partkey")
        .agg(F.sum("qty").cast("long").alias("supply_qty"))
    )
    dt = (
        base.where(F.col("l_returnflag") != "R")
        .groupBy("partkey")
        .agg(F.sum("qty").cast("long").alias("demand_qty"))
    )
    out = (
        st.join(dt, "partkey", "full_outer")
        .join(m, "partkey", "left")
        .select(
            "partkey",
            F.coalesce("supply_qty", F.lit(0)).cast("long").alias("supply_qty"),
            F.coalesce("demand_qty", F.lit(0)).cast("long").alias("demand_qty"),
            F.coalesce("matched_qty", F.lit(0)).cast("long").alias("matched_qty"),
            (
                F.coalesce("demand_qty", F.lit(0))
                - F.coalesce("matched_qty", F.lit(0))
            )
            .cast("long")
            .alias("backlog_qty"),
            F.coalesce("cogs_millicents", F.lit(0))
            .cast("long")
            .alias("cogs_millicents"),
        )
        .orderBy("partkey")
    )
    return out



# ------------------------------ Merkle range diff (hierarchical checksums) --
MERKLE_LEAF_W = 256  # orderkeys per leaf range
MERKLE_FANOUT = 16  # leaves per mid-level node


def _merkle_sql() -> str:
    from .extensions import _H64

    h = _H64.format(x="CAST(o_orderkey AS VARCHAR) || '|' || CAST(cents AS VARCHAR)")
    base = """
        SELECT o_orderkey,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) {mod} AS cents
        FROM orders {pred}
    """
    v1 = base.format(mod="", pred="")
    v2 = base.format(
        mod="+ CASE WHEN o_orderkey % 991 = 3 THEN 1 ELSE 0 END",
        pred="WHERE o_orderkey % 997 <> 0",
    )
    return f"""
    WITH v1 AS ({v1}), v2 AS ({v2}),
    l1 AS (
        SELECT o_orderkey // {MERKLE_LEAF_W} AS leaf,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(bit_xor({h}) AS BIGINT) AS dig
        FROM v1 GROUP BY leaf
    ),
    l2 AS (
        SELECT o_orderkey // {MERKLE_LEAF_W} AS leaf,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(bit_xor({h}) AS BIGINT) AS dig
        FROM v2 GROUP BY leaf
    ),
    m1 AS (SELECT leaf // {MERKLE_FANOUT} AS mid, SUM(n) AS n,
                  bit_xor(dig) AS dig FROM l1 GROUP BY mid),
    m2 AS (SELECT leaf // {MERKLE_FANOUT} AS mid, SUM(n) AS n,
                  bit_xor(dig) AS dig FROM l2 GROUP BY mid),
    dm AS (
        SELECT COALESCE(m1.mid, m2.mid) AS mid
        FROM m1 FULL OUTER JOIN m2 ON m1.mid = m2.mid
        WHERE m1.mid IS NULL OR m2.mid IS NULL
           OR m1.n <> m2.n OR m1.dig <> m2.dig
    ),
    counts AS (
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM
                    (SELECT leaf FROM l1 UNION SELECT leaf FROM l2))
                   AS total_leaves,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM
                    (SELECT mid FROM m1 UNION SELECT mid FROM m2))
                   AS total_mids,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM dm) AS diverged_mids,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM
                    (SELECT leaf FROM l1 UNION SELECT leaf FROM l2) u
                WHERE u.leaf // {MERKLE_FANOUT} IN (SELECT mid FROM dm))
                   AS scanned_leaves
    )
    SELECT COALESCE(l1.leaf, l2.leaf) AS leaf,
           CAST(COALESCE(l1.leaf, l2.leaf) * {MERKLE_LEAF_W} AS BIGINT)
               AS key_lo,
           CAST((COALESCE(l1.leaf, l2.leaf) + 1) * {MERKLE_LEAF_W} - 1
               AS BIGINT) AS key_hi,
           CAST(COALESCE(l1.n, 0) AS BIGINT) AS n_v1,
           CAST(COALESCE(l2.n, 0) AS BIGINT) AS n_v2,
           c.total_leaves, c.scanned_leaves, c.total_mids, c.diverged_mids
    FROM l1 FULL OUTER JOIN l2 ON l1.leaf = l2.leaf
    CROSS JOIN counts c
    WHERE COALESCE(l1.leaf, l2.leaf) // {MERKLE_FANOUT}
              IN (SELECT mid FROM dm)
      AND (l1.leaf IS NULL OR l2.leaf IS NULL
           OR l1.n <> l2.n OR l1.dig <> l2.dig)
    ORDER BY leaf
    """


@query("q376_merkle_range_diff", oracle=_merkle_sql())
def q376(spark: SparkSession, sf: str) -> DataFrame:
    """Merkle-style hierarchical range diff between two table versions —
    q267's per-bucket checksum primitive actually RECURSED: leaf digests
    (256-key ranges) roll up to mid-level digests (16 leaves each);
    version comparison descends only into diverged mid nodes, and the
    output is the diverged LEAF ranges plus the localization accounting
    (scanned_leaves vs total_leaves — the O(diff·log) win over q128's
    full row diff). v2 is a deterministic CDC mutation of orders
    (delete keys ≡0 mod 997, +1 cent where ≡3 mod 991), so the expected
    divergence set is pinned. Digests are XOR of the shared md5 row
    hash — order-independent, mergeable (mid = XOR of leaves, proving
    the rollup is one re-aggregation, not a rescan); row counts ride
    along because XOR cancels doubled rows (q267's documented caveat).

    Scale: two hash aggregates per version (leaf, then mid — the mid
    agg runs on O(keys/256) rows); the diverged-mid set is broadcast
    back as a semi-join filter, so the leaf comparison ships only
    ranges already known bad. At 100 TB the mid/root levels are what
    two replicas exchange — KBs, not the table."""
    from ..functions.text import h64

    o = load_table(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    v1 = o.select("o_orderkey", cents.alias("cents"))
    v2 = o.where(F.col("o_orderkey") % 997 != 0).select(
        "o_orderkey",
        (
            cents
            + F.when(F.col("o_orderkey") % 991 == 3, 1).otherwise(0)
        ).alias("cents"),
    )

    def leaf_digest(df: DataFrame) -> DataFrame:
        row = F.concat_ws(
            "|", F.col("o_orderkey").cast("string"), F.col("cents").cast("string")
        )
        return (
            df.groupBy(
                (F.col("o_orderkey") / MERKLE_LEAF_W)
                .cast("long")
                .alias("leaf")
            )
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.bit_xor(h64(row)).cast("long").alias("dig"),
            )
            .transform(materialize)
        )

    l1, l2 = leaf_digest(v1), leaf_digest(v2)

    def mid_digest(leaf_df: DataFrame) -> DataFrame:
        return leaf_df.groupBy(
            (F.col("leaf") / MERKLE_FANOUT).cast("long").alias("mid")
        ).agg(F.sum("n").alias("n"), F.bit_xor("dig").alias("dig"))

    m1, m2 = mid_digest(l1), mid_digest(l2)
    j = m1.alias("a").join(
        m2.alias("b"), F.col("a.mid") == F.col("b.mid"), "full_outer"
    )
    dm = j.where(
        F.col("a.mid").isNull()
        | F.col("b.mid").isNull()
        | (F.col("a.n") != F.col("b.n"))
        | (F.col("a.dig") != F.col("b.dig"))
    ).select(F.coalesce(F.col("a.mid"), F.col("b.mid")).alias("mid"))
    all_leaves = (
        l1.select("leaf").union(l2.select("leaf")).distinct()
        .transform(materialize)
    )
    counts = (
        all_leaves.agg(F.count(F.lit(1)).cast("long").alias("total_leaves"))
        .crossJoin(
            F.broadcast(
                all_leaves.select(
                    (F.col("leaf") / MERKLE_FANOUT).cast("long").alias("mid")
                )
                .distinct()
                .agg(F.count(F.lit(1)).cast("long").alias("total_mids"))
            )
        )
        .crossJoin(
            F.broadcast(dm.agg(F.count(F.lit(1)).cast("long").alias("diverged_mids")))
        )
        .crossJoin(
            F.broadcast(
                all_leaves.join(
                    dm,
                    (F.col("leaf") / MERKLE_FANOUT).cast("long") == dm.mid,
                    "left_semi",
                ).agg(F.count(F.lit(1)).cast("long").alias("scanned_leaves"))
            )
        )
    )
    lj = l1.alias("x").join(
        l2.alias("y"), F.col("x.leaf") == F.col("y.leaf"), "full_outer"
    )
    leaf_col = F.coalesce(F.col("x.leaf"), F.col("y.leaf"))
    return (
        lj.select(
            leaf_col.alias("leaf"),
            F.coalesce(F.col("x.n"), F.lit(0)).cast("long").alias("n_v1"),
            F.coalesce(F.col("y.n"), F.lit(0)).cast("long").alias("n_v2"),
            F.col("x.n").alias("_n1"),
            F.col("y.n").alias("_n2"),
            F.col("x.dig").alias("_d1"),
            F.col("y.dig").alias("_d2"),
        )
        .join(
            F.broadcast(dm),
            (F.col("leaf") / MERKLE_FANOUT).cast("long") == dm.mid,
            "left_semi",
        )
        .where(
            F.col("_n1").isNull()
            | F.col("_n2").isNull()
            | (F.col("_n1") != F.col("_n2"))
            | (F.col("_d1") != F.col("_d2"))
        )
        .crossJoin(F.broadcast(counts))
        .select(
            "leaf",
            (F.col("leaf") * MERKLE_LEAF_W).cast("long").alias("key_lo"),
            ((F.col("leaf") + 1) * MERKLE_LEAF_W - 1).cast("long").alias("key_hi"),
            "n_v1",
            "n_v2",
            "total_leaves",
            "scanned_leaves",
            "total_mids",
            "diverged_mids",
        )
        .orderBy("leaf")
    )


# ------------------------------- Kendall tau-b (bounded-support y axis) ----
def _kendall_sql() -> str:
    from ._util import sql_round_det

    c_cols = ", ".join(
        f"CAST(COUNT(*) FILTER (WHERE y = {v}) AS BIGINT) AS c{v}"
        for v in range(1, 6)
    )
    k_cols = ", ".join(f"SUM(c{v}) OVER w AS k{v}" for v in range(1, 6))
    p_cols = ", ".join(f"k{v} - c{v} AS p{v}" for v in range(1, 6))
    conc = "c2*p1 + c3*(p1+p2) + c4*(p1+p2+p3) + c5*(p1+p2+p3+p4)"
    disc = "c1*(p2+p3+p4+p5) + c2*(p3+p4+p5) + c3*(p4+p5) + c4*p5"
    m_cols = ", ".join(f"CAST(SUM(c{v}) AS BIGINT) AS m{v}" for v in range(1, 6))
    t2 = " + ".join(f"m{v}*(m{v}-1)" for v in range(1, 6))
    tau = (
        "(CAST(conc AS DOUBLE) - CAST(disc AS DOUBLE))"
        " / sqrt((CAST(n0 AS DOUBLE) - CAST(t1 AS DOUBLE))"
        " * (CAST(n0 AS DOUBLE) - CAST(t2 AS DOUBLE)))"
    )
    return f"""
    WITH o AS (
        SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS x,
               CAST(substr(o_orderpriority, 1, 1) AS INT) AS y
        FROM orders
    ),
    px AS (SELECT x, CAST(COUNT(*) AS BIGINT) AS nx, {c_cols}
           FROM o GROUP BY x),
    cm AS (SELECT *, {k_cols} FROM px
           WINDOW w AS (ORDER BY x ROWS UNBOUNDED PRECEDING)),
    t AS (SELECT nx, c1, c2, c3, c4, c5, {p_cols} FROM cm),
    s AS (SELECT CAST(SUM(nx) AS BIGINT) AS n,
                 CAST(SUM({conc}) AS BIGINT) AS conc,
                 CAST(SUM({disc}) AS BIGINT) AS disc,
                 CAST(SUM(nx * (nx - 1)) // 2 AS BIGINT) AS t1,
                 {m_cols}
          FROM t),
    f AS (SELECT n, conc, disc, t1,
                 CAST(({t2}) // 2 AS BIGINT) AS t2,
                 CAST(n * (n - 1) // 2 AS BIGINT) AS n0
          FROM s)
    SELECT n, conc AS n_concordant, disc AS n_discordant,
           t1 AS ties_x, t2 AS ties_y,
           {sql_round_det(tau, 9)} AS tau_b
    FROM f
    """


@query("q378_kendall_tau", oracle=_kendall_sql())
def q378(spark: SparkSession, sf: str) -> DataFrame:
    """Exact Kendall tau-b between order value (cent grid) and order
    priority — the pair-concordance complement of q326's Spearman (rank
    correlation): Spearman measures monotone association via rank
    covariance, tau-b via concordant-minus-discordant PAIRS, and the
    two disagree exactly when association is driven by a few extreme
    ranks. Naive tau is O(n²) pair counting; this plan is O(n log n)
    because the y axis has BOUNDED support (5 priorities): walking the
    x axis in order with one running count per y value, every row's
    concordant/discordant partners are prefix-sum lookups — the
    classic inversion-count-by-value trick, here as 5 parallel prefix
    sums minted from ONE `distributed_cumsum` range exchange (the
    multi-column API exists for exactly this shape). Tie terms (t1 =
    x-ties, t2 = y-ties) are plain aggregates; the only float ops are
    the final IEEE-exact sqrt/divide, pinned by round_det(9) like
    q326. BIGINT-safe to ~4e9 rows (n² in the denominator); beyond
    that the closed form moves to DOUBLE — documented, not hit at any
    test SF.

    Scale: one hash agg to the distinct-cents grain, one range
    exchange for all 5 prefix columns, one final 1-row aggregate. No
    partitionless window anywhere (the oracle's WINDOW w is the shape
    distributed_cumsum replaces)."""
    from ..functions.refops import distributed_cumsum
    from ._util import round_det

    o = load_table(spark, sf, "orders").select(
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("x"),
        F.substring("o_orderpriority", 1, 1).cast("int").alias("y"),
    )
    px = o.groupBy("x").agg(
        F.count(F.lit(1)).cast("long").alias("nx"),
        *[
            F.sum(F.when(F.col("y") == v, 1).otherwise(0))
            .cast("long")
            .alias(f"c{v}")
            for v in range(1, 6)
        ],
    )
    cm = distributed_cumsum(
        px,
        ["x"],
        [f"c{v}" for v in range(1, 6)],
        [f"k{v}" for v in range(1, 6)],
    )
    t = cm.select(
        "nx",
        *[F.col(f"c{v}") for v in range(1, 6)],
        *[(F.col(f"k{v}") - F.col(f"c{v}")).alias(f"p{v}") for v in range(1, 6)],
    )
    conc = (
        F.col("c2") * F.col("p1")
        + F.col("c3") * (F.col("p1") + F.col("p2"))
        + F.col("c4") * (F.col("p1") + F.col("p2") + F.col("p3"))
        + F.col("c5")
        * (F.col("p1") + F.col("p2") + F.col("p3") + F.col("p4"))
    )
    disc = (
        F.col("c1")
        * (F.col("p2") + F.col("p3") + F.col("p4") + F.col("p5"))
        + F.col("c2") * (F.col("p3") + F.col("p4") + F.col("p5"))
        + F.col("c3") * (F.col("p4") + F.col("p5"))
        + F.col("c4") * F.col("p5")
    )
    s = t.agg(
        F.sum("nx").cast("long").alias("n"),
        F.sum(conc).cast("long").alias("conc"),
        F.sum(disc).cast("long").alias("disc"),
        F.expr("CAST(SUM(nx * (nx - 1)) div 2 AS BIGINT)").alias("t1"),
        *[F.sum(f"c{v}").cast("long").alias(f"m{v}") for v in range(1, 6)],
    )
    t2_expr = " + ".join(f"m{v} * (m{v} - 1)" for v in range(1, 6))
    f = s.select(
        "n",
        "conc",
        "disc",
        "t1",
        F.expr(f"CAST(({t2_expr}) div 2 AS BIGINT)").alias("t2"),
        F.expr("CAST(n * (n - 1) div 2 AS BIGINT)").alias("n0"),
    )
    tau = (F.col("conc").cast("double") - F.col("disc").cast("double")) / F.sqrt(
        (F.col("n0").cast("double") - F.col("t1").cast("double"))
        * (F.col("n0").cast("double") - F.col("t2").cast("double"))
    )
    return f.select(
        "n",
        F.col("conc").alias("n_concordant"),
        F.col("disc").alias("n_discordant"),
        F.col("t1").alias("ties_x"),
        F.col("t2").alias("ties_y"),
        round_det(tau, 9).alias("tau_b"),
    )

# --------------------------- KMV (k-minimum-values) theta sketch set ops ---
KMV_K = 256
KMV_M = 1 << 40  # hash space after fold: h64 % 2^40, BIGINT-safe products


def _kmv_sql() -> str:
    from .extensions import _H64

    h = _H64.format(x="'kmv:' || CAST(o_custkey AS VARCHAR)")

    def sk(pred: str, tag: str) -> str:
        return f"""
    {tag}_h AS (
        SELECT DISTINCT {h} % {KMV_M} AS h FROM orders WHERE {pred}
    ),
    {tag}_s AS (SELECT h FROM {tag}_h ORDER BY h LIMIT {KMV_K}),
    {tag}_t AS (
        SELECT CAST(CASE WHEN COUNT(*) < {KMV_K} THEN {KMV_M}
                         ELSE MAX(h) END AS BIGINT) AS theta,
               CAST(CASE WHEN COUNT(*) < {KMV_K} THEN COUNT(*)
                         ELSE ({KMV_K} - 1) * {KMV_M} // MAX(h) END
                    AS BIGINT) AS est
        FROM {tag}_s
    )"""

    return f"""
    WITH {sk("o_orderpriority = '1-URGENT'", "a")},
    {sk("o_orderpriority = '5-LOW'", "b")},
    th AS (
        SELECT CAST(LEAST(a_t.theta, b_t.theta) AS BIGINT) AS theta
        FROM a_t, b_t
    ),
    d AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_below
        FROM a_s, th
        WHERE a_s.h < th.theta
          AND a_s.h NOT IN (SELECT h FROM b_s)
    ),
    dd AS (
        SELECT CAST(d.n_below * {KMV_M} // th.theta AS BIGINT) AS est_diff
        FROM d, th
    ),
    ex AS (
        SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_a,
               CAST(COUNT(DISTINCT CASE WHEN o_custkey NOT IN (
                       SELECT o_custkey FROM orders
                       WHERE o_orderpriority = '5-LOW')
                    THEN o_custkey END) AS BIGINT) AS exact_diff
        FROM orders WHERE o_orderpriority = '1-URGENT'
    ),
    exb AS (
        SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_b
        FROM orders WHERE o_orderpriority = '5-LOW'
    )
    SELECT CAST({KMV_K} AS BIGINT) AS k,
           ex.exact_a, a_t.est AS est_a,
           CAST((a_t.est - ex.exact_a) * 10000 // ex.exact_a AS BIGINT)
               AS err_a_bps,
           exb.exact_b, b_t.est AS est_b,
           ex.exact_diff, dd.est_diff,
           CAST(CASE WHEN ex.exact_diff = 0 THEN 0
                     ELSE (dd.est_diff - ex.exact_diff) * 10000
                          // ex.exact_diff END AS BIGINT) AS err_diff_bps
    FROM a_t, b_t, ex, exb, dd
    """


@query("q380_kmv_theta_anotb", oracle=_kmv_sql())
def q380(spark: SparkSession, sf: str) -> DataFrame:
    """KMV / theta-sketch distinct counting with SET-DIFFERENCE algebra,
    oracle-backed end to end: the k={k} minimum hash values of each set
    (urgent-order customers A, low-priority customers B) form mergeable
    sketches; theta = min of the two k-th minima, and |A∖B| is estimated
    from A-sketch entries below theta absent from B's sketch — valid
    because below the SHARED theta both sketches are complete hash sets.
    q331's deterministic HLL counts ONE set; registers cannot express
    difference or intersection — set algebra is exactly why production
    systems (DataSketches) pair HLL with theta sketches. Same md5 hash
    family, folded to 2^40 so every estimator product stays BIGINT; the
    whole estimate is integer arithmetic — deterministic in both
    engines, the (k-1)·M/h_(k) classic KMV estimator. The exact counts
    ride along and the error lands in basis points, so the driver hash
    pins BOTH the sketch mechanics and the estimate quality.

    Scale: per set one distinct-aggregate on the hash then a
    TakeOrdered-{k} (no global sort materializes); sketches are {k}-row
    tables from there on — the anti-join, thetas, and estimators all
    run on broadcast-sized inputs. Sketch unions/monthly rollups would
    merge by re-sorting 2k rows — the mergeability contract of q209,
    for distincts."""
    from ..functions.text import h64

    o = load_table(spark, sf, "orders").select("o_custkey", "o_orderpriority")

    def sketch(pred) -> tuple[DataFrame, DataFrame]:
        hs = (
            o.where(pred)
            .select(
                (
                    F.pmod(
                        h64(
                            F.concat(
                                F.lit("kmv:"),
                                F.col("o_custkey").cast("string"),
                            )
                        ),
                        F.lit(KMV_M),
                    )
                ).alias("h")
            )
            .distinct()
        )
        sk = hs.orderBy("h").limit(KMV_K).transform(materialize)
        st = sk.agg(
            F.when(F.count(F.lit(1)) < KMV_K, F.lit(KMV_M))
            .otherwise(F.max("h"))
            .cast("long")
            .alias("theta"),
            F.when(F.count(F.lit(1)) < KMV_K, F.count(F.lit(1)))
            .otherwise(
                F.expr(f"({KMV_K} - 1) * CAST({KMV_M} AS BIGINT) div MAX(h)")
            )
            .cast("long")
            .alias("est"),
        )
        return sk, st

    a_s, a_t = sketch(F.col("o_orderpriority") == "1-URGENT")
    b_s, b_t = sketch(F.col("o_orderpriority") == "5-LOW")
    th = (
        a_t.select(F.col("theta").alias("ta"))
        .crossJoin(F.broadcast(b_t.select(F.col("theta").alias("tb"))))
        .select(F.least("ta", "tb").alias("theta"))
    )
    nb = (
        a_s.join(b_s, "h", "left_anti")
        .crossJoin(F.broadcast(th))
        .where(F.col("h") < F.col("theta"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_below"))
    )
    dd = nb.crossJoin(F.broadcast(th)).select(
        F.expr(
            f"CAST(n_below * CAST({KMV_M} AS BIGINT) div theta AS BIGINT)"
        ).alias("est_diff")
    )
    a_keys = o.where(F.col("o_orderpriority") == "1-URGENT").select(
        "o_custkey"
    ).distinct()
    b_keys = o.where(F.col("o_orderpriority") == "5-LOW").select(
        "o_custkey"
    ).distinct()
    ex = a_keys.agg(
        F.count(F.lit(1)).cast("long").alias("exact_a")
    ).crossJoin(
        F.broadcast(
            a_keys.join(b_keys, "o_custkey", "left_anti").agg(
                F.count(F.lit(1)).cast("long").alias("exact_diff")
            )
        )
    )
    exb = b_keys.agg(F.count(F.lit(1)).cast("long").alias("exact_b"))
    return (
        a_t.select(F.col("est").alias("est_a"))
        .crossJoin(F.broadcast(b_t.select(F.col("est").alias("est_b"))))
        .crossJoin(F.broadcast(ex))
        .crossJoin(F.broadcast(exb))
        .crossJoin(F.broadcast(dd))
        .select(
            F.lit(KMV_K).cast("long").alias("k"),
            "exact_a",
            "est_a",
            F.expr(
                "CAST((est_a - exact_a) * 10000 div exact_a AS BIGINT)"
            ).alias("err_a_bps"),
            "exact_b",
            "est_b",
            "exact_diff",
            "est_diff",
            F.expr(
                "CAST(CASE WHEN exact_diff = 0 THEN 0"
                " ELSE (est_diff - exact_diff) * 10000 div exact_diff"
                " END AS BIGINT)"
            ).alias("err_diff_bps"),
        )
    )


q380.__doc__ = q380.__doc__.format(k=KMV_K)


# ------------------------- CM-sketch join-size estimation (AGM primitive) --
CMJ_ROWS = 4
CMJ_W = 256


def _cm_joinsize_sql() -> str:
    from .extensions import _H64

    def hq(i: int) -> str:
        return (
            _H64.format(x=f"'cms{i}:' || CAST(user_id AS VARCHAR)")
            + f" % {CMJ_W}"
        )

    build_a = "\n        UNION ALL ".join(
        f"SELECT {i} AS r, {hq(i)} AS c FROM events"
        f" WHERE event_type = 'view'"
        for i in range(CMJ_ROWS)
    )
    build_b = "\n        UNION ALL ".join(
        f"SELECT {i} AS r, {hq(i)} AS c FROM events"
        f" WHERE event_type = 'purchase'"
        for i in range(CMJ_ROWS)
    )
    return f"""
    WITH ca AS (SELECT r, c, CAST(COUNT(*) AS BIGINT) AS n
                FROM ({build_a}) GROUP BY r, c),
    cb AS (SELECT r, c, CAST(COUNT(*) AS BIGINT) AS n
           FROM ({build_b}) GROUP BY r, c),
    ip AS (SELECT ca.r, CAST(SUM(ca.n * cb.n) AS BIGINT) AS est
           FROM ca JOIN cb ON ca.r = cb.r AND ca.c = cb.c
           GROUP BY ca.r),
    est AS (SELECT CAST(MIN(est) AS BIGINT) AS est_join
            FROM ip),
    ex AS (
        SELECT CAST(SUM(v.n * p.n) AS BIGINT) AS exact_join
        FROM (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n FROM events
              WHERE event_type = 'view' GROUP BY user_id) v
        JOIN (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n FROM events
              WHERE event_type = 'purchase' GROUP BY user_id) p
          ON v.user_id = p.user_id
    )
    SELECT CAST({CMJ_ROWS} AS BIGINT) AS rows_d,
           CAST({CMJ_W} AS BIGINT) AS width_w,
           ex.exact_join, est.est_join,
           CAST((est.est_join - ex.exact_join) * 1000000
                // ex.exact_join AS BIGINT) AS overestimate_ppm
    FROM ex CROSS JOIN est
    """


@query("q382_cm_join_size", oracle=_cm_joinsize_sql())
def q382(spark: SparkSession, sf: str) -> DataFrame:
    """Join-size estimation from Count-Min sketches — the cardinality-
    estimation primitive a cost-based planner needs BEFORE running a
    join at 100 TB: |A ⋈ B| on a key equals the inner product of the
    two key-frequency vectors, and the CM estimate is min over hash
    rows of the per-row sketch inner products (upper-biased, like the
    point estimate). q322 uses the SAME sketch for point frequency;
    this is its second classic application — two fixed {r}×{w} integer
    arrays predict the join size without touching either fact side
    again. The join here (view-events ⋈ purchase-events on user) is
    many-to-many and skew-prone — exactly where planners misestimate
    and AQE (q229/q222) has to rescue the plan at runtime; a sketch
    kept per partition-key column makes the estimate free at compile
    time. Deterministic end to end: the shared md5 hash family and
    integer counters make the ESTIMATE itself oracle-pinned, not just
    the exact answer.

    Scale: building each sketch is one hash aggregate to {r}×{w}
    bounded cells (mergeable — partials XOR-free integer sums); the
    inner product is a {r}×{w}-row equi-join. The exact join size
    rides along from per-user count aggregates (never materializing
    the pair blowup)."""
    from .extensions import _H64  # noqa: F401  (oracle twin documented)
    from ..functions.text import h64

    ev = load_table(spark, sf, "events").select("user_id", "event_type")

    def sketch(etype: str) -> DataFrame:
        side = ev.where(F.col("event_type") == etype)
        cells = side.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("r"),
                            F.pmod(
                                h64(
                                    F.concat(
                                        F.lit(f"cms{i}:"),
                                        F.col("user_id").cast("string"),
                                    )
                                ),
                                F.lit(CMJ_W),
                            ).alias("c"),
                        )
                        for i in range(CMJ_ROWS)
                    ]
                )
            ).alias("e")
        ).select("e.r", "e.c")
        return cells.groupBy("r", "c").agg(
            F.count(F.lit(1)).cast("long").alias("n")
        )

    ca, cb = sketch("view"), sketch("purchase")
    est = (
        ca.alias("a")
        .join(
            cb.alias("b"),
            (F.col("a.r") == F.col("b.r")) & (F.col("a.c") == F.col("b.c")),
        )
        .groupBy(F.col("a.r"))
        .agg(F.sum(F.col("a.n") * F.col("b.n")).cast("long").alias("ip"))
        .agg(F.min("ip").cast("long").alias("est_join"))
    )
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("nv"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("np"))
    )
    ex = (
        v.join(p, "user_id")
        .agg(F.sum(F.col("nv") * F.col("np")).cast("long").alias("exact_join"))
    )
    return (
        ex.crossJoin(F.broadcast(est))
        .select(
            F.lit(CMJ_ROWS).cast("long").alias("rows_d"),
            F.lit(CMJ_W).cast("long").alias("width_w"),
            "exact_join",
            "est_join",
            F.expr(
                "CAST((est_join - exact_join) * 1000000 div exact_join"
                " AS BIGINT)"
            ).alias("overestimate_ppm"),
        )
    )


q382.__doc__ = q382.__doc__.format(r=CMJ_ROWS, w=CMJ_W)


# ---------------------- out-of-orderness / watermark-delay audit ----------
WM_PCTS = (50, 95, 99, 100)


@query(
    "q392_watermark_lag_audit",
    oracle=f"""
    WITH e AS (
        SELECT event_id, epoch_us(ts) AS t FROM events
    ),
    w AS (
        SELECT event_id, t,
               (MAX(t) OVER (ORDER BY event_id ROWS UNBOUNDED PRECEDING)
                   - t) // 1000 AS lateness
        FROM e
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM w),
    g AS (SELECT lateness, CAST(COUNT(*) AS BIGINT) AS c
          FROM w GROUP BY lateness),
    cum AS (
        SELECT lateness,
               CAST(SUM(c) OVER (ORDER BY lateness
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        FROM g
    ),
    thr AS (SELECT unnest(ARRAY{list(WM_PCTS)}) AS pct),
    pick AS (
        SELECT t.pct, MIN(c.lateness) AS delay_ms
        FROM thr t CROSS JOIN n
        JOIN cum c ON c.cum * 100 >= t.pct * n.n
        GROUP BY t.pct
    )
    SELECT CAST(p.pct AS BIGINT) AS pct,
           CAST(p.delay_ms AS BIGINT) AS delay_ms,
           CAST(c.cum * 1000000 // n.n AS BIGINT) AS captured_ppm
    FROM pick p
    JOIN cum c ON c.lateness = p.delay_ms
    CROSS JOIN n
    ORDER BY pct
    """,
)
def q392(spark: SparkSession, sf: str) -> DataFrame:
    """Watermark-delay audit: how out-of-order does the event stream
    actually arrive, and what watermark delay would capture 50/95/99/
    100% of events? Arrival order is the ingestion sequence (event_id);
    the running MAX of event time over arrival IS the watermark, and
    cummax − event_time each event's lateness — the exact distribution
    q83's `withWatermark` delay should be read off, measured instead
    of guessed (pick the p99 row: that delay loses 1% of events; the
    p100 row is the lossless delay and its cost in state retention).

    Scale: the global prefix-max rides the new `distributed_cummax`
    (range exchange on arrival key + per-partition window + greatest
    with the literal prefix-of-partition-maxes — max is associative,
    so the cross-partition combine is exact like cumsum's), never a
    partitionless window; the lateness CDF is a hash aggregate +
    `distributed_cumsum` over the lateness support, which is quantized
    to a 1 ms grid (`(wm − t) div 1000` on both engines) so the support
    is genuinely bounded — distinct grid cells ≤ max-skew-in-ms, not
    O(rows), at any data scale; threshold picks are a 4-row broadcast."""
    from ..functions.refops import distributed_cummax, distributed_cumsum

    ev = load_table(spark, sf, "events").select(
        "event_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("t")
    )
    w = distributed_cummax(ev, ["event_id"], "t", name="wm").select(
        F.expr("(wm - t) div 1000").alias("lateness")
    )
    n = w.agg(F.count(F.lit(1)).cast("long").alias("n"))
    g = w.groupBy("lateness").agg(F.count(F.lit(1)).cast("long").alias("c"))
    cum = distributed_cumsum(g, ["lateness"], "c", name="cum")
    thr = literal_frame(spark, [(p,) for p in WM_PCTS], "pct int")
    pick = (
        cum.crossJoin(F.broadcast(thr))
        .crossJoin(F.broadcast(n))
        .where(F.col("cum") * 100 >= F.col("pct").cast("long") * F.col("n"))
        .groupBy("pct")
        .agg(
            F.min(F.struct("lateness", "cum", "n")).alias("s"),
        )
        .select(
            F.col("pct").cast("long").alias("pct"),
            F.col("s.lateness").cast("long").alias("delay_ms"),
            F.expr("CAST(s.cum * 1000000 div s.n AS BIGINT)").alias(
                "captured_ppm"
            ),
        )
    )
    return pick.orderBy("pct")


# ----------------------------- profile diff (data-contract check) ---------
def _profile_diff_sql() -> str:
    cols = [
        ("o_orderkey", "CAST(o_orderkey AS VARCHAR)"),
        ("o_custkey", "CAST(o_custkey AS VARCHAR)"),
        ("o_totalprice_cents",
         "CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS VARCHAR)"),
        ("o_orderpriority", "o_orderpriority"),
    ]

    def prof(src: str, tag: str) -> str:
        arms = "\n            UNION ALL ".join(
            f"""SELECT '{name}' AS col,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(*) FILTER (WHERE {expr} IS NULL) AS BIGINT)
                   AS nulls,
               CAST(COUNT(DISTINCT {expr}) AS BIGINT) AS nd
            FROM {src}"""
            for name, expr in cols
        )
        return f"{tag} AS MATERIALIZED ({arms})"

    return f"""
    WITH v1 AS MATERIALIZED (SELECT * FROM orders),
    v2 AS MATERIALIZED (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               o_totalprice + CASE WHEN o_orderkey % 991 = 3
                                   THEN 0.01 ELSE 0 END AS o_totalprice,
               o_orderdate,
               CASE WHEN o_orderkey % 499 = 7 THEN NULL
                    ELSE o_orderpriority END AS o_orderpriority
        FROM orders WHERE o_orderkey % 997 <> 0
    ),
    {prof("v1", "p1")},
    {prof("v2", "p2")}
    SELECT p1.col,
           p1.n AS n_v1, p2.n AS n_v2,
           p1.nulls AS nulls_v1, p2.nulls AS nulls_v2,
           p1.nd AS distinct_v1, p2.nd AS distinct_v2,
           CAST((p2.n - p1.n) * 1000000 // p1.n AS BIGINT) AS row_delta_ppm,
           CAST((p2.nd - p1.nd) * 1000000 // p1.nd AS BIGINT)
               AS distinct_delta_ppm,
           CASE WHEN p1.nulls = 0 AND p2.nulls > 0 THEN 'break'
                WHEN ABS((p2.n - p1.n) * 1000000 // p1.n) > 500
                     OR ABS((p2.nd - p1.nd) * 1000000 // p1.nd) > 1000
                THEN 'drift' ELSE 'pass' END AS status
    FROM p1 JOIN p2 ON p1.col = p2.col
    ORDER BY p1.col
    """


@query("q394_profile_diff_contract", oracle=_profile_diff_sql())
def q394(spark: SparkSession, sf: str) -> DataFrame:
    """Data-contract check between two table versions: per-column
    profile (rows, nulls, exact distincts) diffed with ppm deltas and
    a pinned verdict — 'break' when a column that was null-free gains
    nulls (the contract violation that silently breaks downstream NOT
    NULL assumptions), 'drift' past ppm thresholds, else 'pass'. This
    is the CI gate for data: q246 profiles ONE version, q128 ships
    row diffs, q376 localizes WHERE bytes changed — this says whether
    the new version still honors the schema contract, in one bounded
    report. v2 is the deterministic CDC mutation (q376's deletes and
    cent bumps, plus nulled priorities at keys ≡7 mod 499) so every
    verdict class is exercised.

    Scale: one aggregate pass per version per column — counts and
    exact COUNT(DISTINCT) (hash-agg'd per column; sketch twin q208
    where exactness can yield); everything after is a 4-row join. At
    a 100-column table the per-column arms are one generated plan,
    still two passes over the data."""
    o = load_table(spark, sf, "orders")
    v1 = o
    v2 = o.where(F.col("o_orderkey") % 997 != 0).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        (
            F.col("o_totalprice")
            + F.when(F.col("o_orderkey") % 991 == 3, 0.01).otherwise(0.0)
        ).alias("o_totalprice"),
        "o_orderdate",
        F.when(F.col("o_orderkey") % 499 == 7, F.lit(None)).otherwise(
            F.col("o_orderpriority")
        ).alias("o_orderpriority"),
    )
    cols = [
        ("o_orderkey", F.col("o_orderkey").cast("string")),
        ("o_custkey", F.col("o_custkey").cast("string")),
        (
            "o_totalprice_cents",
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("long")
            .cast("string"),
        ),
        ("o_orderpriority", F.col("o_orderpriority")),
    ]

    def prof(df: DataFrame) -> DataFrame:
        out = None
        for name, expr in cols:
            arm = df.select(expr.alias("x")).agg(
                F.lit(name).alias("col"),
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum(F.col("x").isNull().cast("int"))
                .cast("long")
                .alias("nulls"),
                F.countDistinct("x").cast("long").alias("nd"),
            )
            out = arm if out is None else out.unionByName(arm)
        return out

    p1 = prof(v1).alias("a")
    p2 = prof(v2).alias("b")
    j = p1.join(F.broadcast(p2), F.col("a.col") == F.col("b.col"))
    row_delta = F.expr("(b.n - a.n) * 1000000 div a.n")
    nd_delta = F.expr("(b.nd - a.nd) * 1000000 div a.nd")
    status = (
        F.when((F.col("a.nulls") == 0) & (F.col("b.nulls") > 0), "break")
        .when(
            (F.abs(row_delta) > 500) | (F.abs(nd_delta) > 1000), "drift"
        )
        .otherwise("pass")
    )
    return j.select(
        F.col("a.col").alias("col"),
        F.col("a.n").alias("n_v1"),
        F.col("b.n").alias("n_v2"),
        F.col("a.nulls").alias("nulls_v1"),
        F.col("b.nulls").alias("nulls_v2"),
        F.col("a.nd").alias("distinct_v1"),
        F.col("b.nd").alias("distinct_v2"),
        row_delta.cast("long").alias("row_delta_ppm"),
        nd_delta.cast("long").alias("distinct_delta_ppm"),
        status.alias("status"),
    ).orderBy("col")


# ------------------------- consistent-hashing ring (key-movement audit) ----
CH_NODES = 8
CH_VNODES = 32
CH_M = 1 << 40
CH_REMOVED = "node5"


def _ring(exclude: str | None = None) -> tuple[list[int], list[str]]:
    """Host-side ring derivation with the SAME md5 formula both engines
    use (`_H64` twin): hashlib md5 of 'ring:<node>:<v>', first 15 hex
    chars as an integer, mod 2^40. Bounded (nodes×vnodes) and pinned —
    the literal-array lookup keeps per-key work row-local."""
    import hashlib

    pts = []
    for n in range(CH_NODES):
        name = f"node{n}"
        if exclude is not None and name == exclude:
            continue
        for v in range(CH_VNODES):
            h = int(hashlib.md5(f"ring:{name}:{v}".encode()).hexdigest()[:15], 16)
            pts.append((h % CH_M, name))
    pts.sort()
    return [p for p, _ in pts], [n for _, n in pts]


def _ch_sql() -> str:
    from .extensions import _H64

    kh = _H64.format(x="'key:' || CAST(o_orderkey AS VARCHAR)") + f" % {CH_M}"

    def ring_cte(tag: str, exclude: str | None) -> str:
        pred = "" if exclude is None else f"WHERE name <> '{exclude}'"
        h = _H64.format(
            x="'ring:' || name || ':' || CAST(v AS VARCHAR)"
        )
        return f"""
    {tag}_vn AS (
        SELECT name, v, {h} % {CH_M} AS pt
        FROM (SELECT 'node' || CAST(unnest(range({CH_NODES})) AS VARCHAR)
                  AS name) n,
             (SELECT unnest(range({CH_VNODES})) AS v) vv
        {pred}
    ),
    {tag} AS (
        SELECT list(pt ORDER BY pt) AS pts, list(name ORDER BY pt) AS owners
        FROM {tag}_vn
    )"""

    def owner(tag: str) -> str:
        return (
            f"{tag}.owners[(len(list_filter({tag}.pts, x -> x < kh))"
            f" % len({tag}.pts)) + 1]"
        )

    return f"""
    WITH {ring_cte("r1", None)},
    {ring_cte("r2", CH_REMOVED)},
    k AS (SELECT {kh} AS kh FROM orders),
    asg AS (
        SELECT {owner("r1")} AS before_node, {owner("r2")} AS after_node
        FROM k CROSS JOIN r1 CROSS JOIN r2
    ),
    mv AS (
        SELECT CAST(COUNT(*) FILTER (WHERE before_node <> after_node)
                    AS BIGINT) AS moved,
               CAST(COUNT(*) AS BIGINT) AS total
        FROM asg
    ),
    pern AS (
        SELECT 'node' || CAST(unnest(range({CH_NODES})) AS VARCHAR) AS node
    )
    SELECT p.node,
           CAST(COALESCE(b.n, 0) AS BIGINT) AS keys_before,
           CAST(COALESCE(a.n, 0) AS BIGINT) AS keys_after,
           CAST(COALESCE(a.n, 0) - COALESCE(b.n, 0) AS BIGINT) AS delta,
           mv.moved, CAST(mv.moved * 1000000 // mv.total AS BIGINT)
               AS moved_ppm
    FROM pern p
    LEFT JOIN (SELECT before_node, COUNT(*) AS n FROM asg
               GROUP BY before_node) b ON b.before_node = p.node
    LEFT JOIN (SELECT after_node, COUNT(*) AS n FROM asg
               GROUP BY after_node) a ON a.after_node = p.node
    CROSS JOIN mv
    ORDER BY p.node
    """


@query("q398_consistent_hashing", oracle=_ch_sql())
def q398(spark: SparkSession, sf: str) -> DataFrame:
    """Consistent-hashing ring with {v} virtual nodes per storage node —
    the key-placement primitive under every distributed store and
    shuffle service — audited through a node loss: per-node key load
    before and after removing {r}, plus the moved-key fraction. The
    theorem under test (and pinned by the driver hash): ONLY keys
    owned by the removed node move (moved == its keys_before; every
    other delta ≥ 0), the property naive `hash mod N` placement
    catastrophically lacks (it moves ~(N−1)/N of ALL keys). q318's
    reshard plan moves whole range shards; this is the hash-ring
    alternative with per-key granularity.

    Scale: the ring is bounded ({n}×{v} points), derived host-side
    with the engines' shared md5 formula and embedded as SORTED
    LITERAL ARRAYS; each key's owner is then a row-local
    size(filter(pts, p < kh)) successor lookup — O(ring) arithmetic
    inside codegen, NO join, no row amplification (the broadcast
    non-equi join alternative would materialize ring/2 rows per key
    before aggregating). Per-node loads are one hash aggregate."""
    from ..functions.text import h64

    pts1, own1 = _ring(None)
    pts2, own2 = _ring(CH_REMOVED)
    o = load_table(spark, sf, "orders").select(
        F.pmod(
            h64(F.concat(F.lit("key:"), F.col("o_orderkey").cast("string"))),
            F.lit(CH_M),
        ).alias("kh")
    )

    def owner_col(pts: list[int], owners: list[str]):
        pa = F.array(*[F.lit(p) for p in pts])
        oa = F.array(*[F.lit(n) for n in owners])
        idx = F.size(F.filter(pa, lambda x: x < F.col("kh")))
        return F.element_at(oa, (idx % F.lit(len(pts))) + 1)

    asg = o.select(
        owner_col(pts1, own1).alias("before_node"),
        owner_col(pts2, own2).alias("after_node"),
    ).transform(materialize)
    mv = asg.agg(
        F.sum((F.col("before_node") != F.col("after_node")).cast("int"))
        .cast("long")
        .alias("moved"),
        F.count(F.lit(1)).cast("long").alias("total"),
    )
    pern = literal_frame(
        spark, [(f"node{i}",) for i in range(CH_NODES)], "node string"
    )
    b = asg.groupBy(F.col("before_node").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("nb")
    )
    a = asg.groupBy(F.col("after_node").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("na")
    )
    return (
        pern.join(F.broadcast(b), "node", "left")
        .join(F.broadcast(a), "node", "left")
        .crossJoin(F.broadcast(mv))
        .select(
            "node",
            F.coalesce("nb", F.lit(0)).cast("long").alias("keys_before"),
            F.coalesce("na", F.lit(0)).cast("long").alias("keys_after"),
            (F.coalesce("na", F.lit(0)) - F.coalesce("nb", F.lit(0)))
            .cast("long")
            .alias("delta"),
            "moved",
            F.expr("CAST(moved * 1000000 div total AS BIGINT)").alias(
                "moved_ppm"
            ),
        )
        .orderBy("node")
    )


q398.__doc__ = q398.__doc__.format(v=CH_VNODES, r=CH_REMOVED, n=CH_NODES)


# --------------------------- positional phrase search ----------------------
PHRASES = (("table", "hash"), ("customer", "join"))


def _phrase_sql() -> str:
    arms = "\n        UNION ALL ".join(
        f"SELECT '{a} {b}' AS phrase, '{a}' AS w1, '{b}' AS w2"
        for a, b in PHRASES
    )
    return f"""
    WITH t AS (
        SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w
        FROM documents
    ),
    tok AS (
        SELECT doc_id,
               unnest([{{'pos': i, 'tok': w[i]}}
                       for i in range(1, len(w) + 1)], recursive := true)
        FROM t
    ),
    ph AS ({arms})
    SELECT ph.phrase, a.doc_id AS doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_matches,
           CAST(MIN(a.pos) AS BIGINT) AS first_pos
    FROM ph
    JOIN tok a ON a.tok = ph.w1
    JOIN tok b ON b.doc_id = a.doc_id AND b.tok = ph.w2
              AND b.pos = a.pos + 1
    GROUP BY ph.phrase, a.doc_id
    ORDER BY phrase, a.doc_id
    """


@query("q400_phrase_search", oracle=_phrase_sql())
def q400(spark: SparkSession, sf: str) -> DataFrame:
    """Positional phrase search: exact adjacent-token phrase matches per
    document from a POSITIONAL inverted index — the search-engine
    primitive q216's document-level postings cannot answer (df tells
    you both words occur; only positions prove they occur ADJACENT).
    Per (phrase, doc): match count and first position — the fields a
    snippet generator consumes. The classic postings-intersection
    plan: each phrase word's postings list equi-joins on (doc,
    pos+1) — never a scan of the text at query time.

    Scale: tokenize+posexplode is one row-local pass building the
    (token, doc, pos) index (persistable/bucketable by token at
    100 TB); each phrase is a keyed self-join of two postings slices
    — the selective word's postings bound the work, and a phrase
    cache keyed by (w1, w2) makes repeats free. Zero Python, zero
    regex at match time."""
    from ..functions.text import words

    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    tok = docs.select(
        "doc_id", F.posexplode(words(F.col("text"))).alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    tok = tok.transform(materialize)
    ph = literal_frame(
        spark,
        [(f"{a} {b}", a, b) for a, b in PHRASES],
        "phrase string, w1 string, w2 string",
    )
    a = tok.join(F.broadcast(ph), tok.tok == F.col("w1")).select(
        "phrase", "w2", "doc_id", "pos"
    )
    b = tok.select(
        F.col("doc_id").alias("doc_b"),
        F.col("pos").alias("pos_b"),
        F.col("tok").alias("tok_b"),
    )
    return (
        a.join(
            b,
            (F.col("doc_id") == F.col("doc_b"))
            & (F.col("pos_b") == F.col("pos") + 1)
            & (F.col("tok_b") == F.col("w2")),
        )
        .groupBy("phrase", "doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_matches"),
            F.min("pos").cast("long").alias("first_pos"),
        )
        .orderBy("phrase", "doc_id")
    )


# ------------------------------- bitemporal AS OF (valid + tx time) --------
@query(
    "q405_bitemporal_asof",
    oracle="""
    WITH bi AS (
        SELECT c_custkey, DATE '2020-01-01' AS valid_from,
               DATE '2020-01-02' AS tx_from,
               CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents
        FROM customer
        UNION ALL
        SELECT c_custkey, DATE '2020-01-01', DATE '2024-02-01',
               CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) + 777
        FROM customer WHERE c_custkey % 3 = 0
        UNION ALL
        SELECT c_custkey, DATE '2024-06-01', DATE '2024-06-02',
               CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) * 2
        FROM customer WHERE c_custkey % 5 = 0
    ),
    pick AS (
        SELECT c_custkey, tx_cut, bal_cents,
               ROW_NUMBER() OVER (PARTITION BY c_custkey, tx_cut
                    ORDER BY valid_from DESC, tx_from DESC) AS rn
        FROM bi
        CROSS JOIN (SELECT unnest([DATE '2024-03-01', DATE '2025-01-01'])
                        AS tx_cut)
        WHERE valid_from <= DATE '2024-07-01' AND tx_from <= tx_cut
    ),
    p AS (SELECT c_custkey, tx_cut, bal_cents FROM pick WHERE rn = 1)
    SELECT a.c_custkey,
           a.bal_cents AS bal_known_2024_03,
           b.bal_cents AS bal_known_2025_01,
           CAST(CASE WHEN a.bal_cents <> b.bal_cents THEN 1 ELSE 0 END
                AS BIGINT) AS restated
    FROM p a JOIN p b ON a.c_custkey = b.c_custkey
    WHERE a.tx_cut = DATE '2024-03-01' AND b.tx_cut = DATE '2025-01-01'
    ORDER BY a.c_custkey
    """,
)
def q405(spark: SparkSession, sf: str) -> DataFrame:
    """Bitemporal AS OF: "what balance was effective on valid-date V, as
    the system KNEW it at transaction-time T" — the two-clock query
    behind every financial restatement audit, which the registry's
    single-clock members cannot answer (q296 replays TRANSACTION time
    only, q301 joins VALID time only, q126 versions one axis). The
    deterministic bitemporal dim carries an original load, a late
    CORRECTION recorded 2024-02 for keys ≡0 mod 3 (same validity,
    newer knowledge), and a genuine NEW VALID PERIOD for keys ≡0 mod
    5; querying the same V under two knowledge cutoffs exposes exactly
    the corrected keys as restated — the driver hash pins both
    readings and the restatement set. Resolution rule pinned: max
    valid_from ≤ V, then max tx_from ≤ T (rank, no composite arg-max).

    Scale: the dim is row-local unions of the customer scan; each
    cutoff's pick is one rank over the per-key version group
    (partitioned window, ≤3 rows per key); the restatement compare is
    a self-join on the key. At a billion-key dim the same plan holds —
    versions-per-key stays bounded."""
    c = load_table(spark, sf, "customer").select(
        "c_custkey",
        F.floor(F.col("c_acctbal") * 100 + F.lit(0.5))
        .cast("long")
        .alias("bal0"),
    )
    bi = (
        c.select(
            "c_custkey",
            F.lit("2020-01-01").cast("date").alias("valid_from"),
            F.lit("2020-01-02").cast("date").alias("tx_from"),
            F.col("bal0").alias("bal_cents"),
        )
        .unionByName(
            c.where(F.col("c_custkey") % 3 == 0).select(
                "c_custkey",
                F.lit("2020-01-01").cast("date").alias("valid_from"),
                F.lit("2024-02-01").cast("date").alias("tx_from"),
                (F.col("bal0") + 777).alias("bal_cents"),
            )
        )
        .unionByName(
            c.where(F.col("c_custkey") % 5 == 0).select(
                "c_custkey",
                F.lit("2024-06-01").cast("date").alias("valid_from"),
                F.lit("2024-06-02").cast("date").alias("tx_from"),
                (F.col("bal0") * 2).alias("bal_cents"),
            )
        )
    )
    cuts = literal_frame(
        spark, [("2024-03-01",), ("2025-01-01",)], "tx_cut string"
    ).select(F.col("tx_cut").cast("date").alias("tx_cut"))
    wp = W.partitionBy("c_custkey", "tx_cut").orderBy(
        F.desc("valid_from"), F.desc("tx_from")
    )
    pick = (
        bi.where(F.col("valid_from") <= F.lit("2024-07-01").cast("date"))
        .crossJoin(F.broadcast(cuts))
        .where(F.col("tx_from") <= F.col("tx_cut"))
        .select(
            "c_custkey",
            "tx_cut",
            "bal_cents",
            F.row_number().over(wp).alias("rn"),
        )
        .where(F.col("rn") == 1)
        .transform(materialize)
    )
    a = pick.where(F.col("tx_cut") == F.lit("2024-03-01").cast("date")).select(
        "c_custkey", F.col("bal_cents").alias("bal_known_2024_03")
    )
    b = pick.where(F.col("tx_cut") == F.lit("2025-01-01").cast("date")).select(
        "c_custkey", F.col("bal_cents").alias("bal_known_2025_01")
    )
    return (
        a.join(b, "c_custkey")
        .select(
            "c_custkey",
            "bal_known_2024_03",
            "bal_known_2025_01",
            F.when(
                F.col("bal_known_2024_03") != F.col("bal_known_2025_01"), 1
            )
            .otherwise(0)
            .cast("long")
            .alias("restated"),
        )
        .orderBy("c_custkey")
    )


# ---------------------------- backfill-range planner -----------------------
BACKFILL_MIN_EVENTS = 60  # a (type, day) partition below this needs a refill


@query(
    "q406_backfill_plan",
    oracle=f"""
    WITH d AS (
        SELECT event_type,
               CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY event_type, day
    ),
    bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM d),
    spine AS (
        SELECT t.event_type, s.day
        FROM (SELECT DISTINCT event_type FROM d) t,
             (SELECT unnest(range(lo, hi + 1)) AS day FROM bounds) s
    ),
    gaps AS (
        SELECT sp.event_type, sp.day,
               CAST(COALESCE(d.n, 0) AS BIGINT) AS n
        FROM spine sp LEFT JOIN d
          ON d.event_type = sp.event_type AND d.day = sp.day
        WHERE COALESCE(d.n, 0) < {BACKFILL_MIN_EVENTS}
    ),
    isl AS (
        SELECT event_type, day, n,
               day - ROW_NUMBER() OVER (PARTITION BY event_type
                    ORDER BY day) AS grp
        FROM gaps
    )
    SELECT event_type,
           CAST(MIN(day) AS BIGINT) AS range_start_day,
           CAST(MAX(day) AS BIGINT) AS range_end_day,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(n) AS BIGINT) AS rows_present,
           CAST(COUNT(*) * {BACKFILL_MIN_EVENTS} - SUM(n) AS BIGINT)
               AS rows_short
    FROM isl GROUP BY event_type, grp
    ORDER BY event_type, range_start_day
    """,
)
def q406(spark: SparkSession, sf: str) -> DataFrame:
    """Backfill-range planner: per event type, the CONTIGUOUS day ranges
    whose partitions are missing or underfilled (< {k} rows) — the
    work-order a backfill orchestrator actually consumes (one job per
    range, not per day), with the row deficit per range for capacity
    planning. Completes the gap family: q166 lists missing scalar IDs,
    q112 FILLS value gaps, q134 mints the spine — none plans REPAIR
    WORK; and the ranges come from the islands construction (day −
    row_number is constant within a consecutive run) that q117/q354
    apply to sessions, here applied to the calendar.

    Scale: one hash aggregate to (type, day), a bounded spine
    anti/left join (types×days), and the islands window runs
    partitioned by type over the bounded day support — the q326
    argument. Output is O(ranges), ready to feed a job scheduler."""
    ev = load_table(spark, sf, "events")
    d = ev.groupBy(
        "event_type",
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(86_400_000_000)
        )
        .cast("long")
        .alias("day"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n")).transform(materialize)
    bounds = d.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = (
        d.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("day"),
        )
    )
    gaps = (
        spine.join(d, ["event_type", "day"], "left")
        .select(
            "event_type", "day", F.coalesce("n", F.lit(0)).cast("long").alias("n")
        )
        .where(F.col("n") < BACKFILL_MIN_EVENTS)
    )
    wi = W.partitionBy("event_type").orderBy("day")
    isl = gaps.select(
        "event_type",
        "day",
        "n",
        (F.col("day") - F.row_number().over(wi)).alias("grp"),
    )
    return (
        isl.groupBy("event_type", "grp")
        .agg(
            F.min("day").cast("long").alias("range_start_day"),
            F.max("day").cast("long").alias("range_end_day"),
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.sum("n").cast("long").alias("rows_present"),
            (F.count(F.lit(1)) * BACKFILL_MIN_EVENTS - F.sum("n"))
            .cast("long")
            .alias("rows_short"),
        )
        .drop("grp")
        .orderBy("event_type", "range_start_day")
    )


q406.__doc__ = q406.__doc__.format(k=BACKFILL_MIN_EVENTS)
