"""Scalar-function surface (SURVEY.md §2.9 Q60-Q68): strings, dates, math,
conditionals, arrays, map/struct access, JSON extraction — all JVM-side
``pyspark.sql.functions`` builtins inside whole-stage codegen; zero Python
UDFs anywhere on this path.

Reference semantics reproduced natively:
- E5 canonicalizer `lower(regexp_replace(c, ' ', '_'))`
  (ref pyspark.py:349-356) — q60.
- E6/E7 split+index `split(c, ',')[0]` (ref pyspark.py:269-272) — q61.
- UA2 SAS-epoch date `1960-01-01 + n days` (ref pyspark.py:376-385,
  README.md:102-103) — q62, as a native date_add, not a Python UDF.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import query

SAS_EPOCH = datetime.date(1960, 1, 1)


@query(
    "q60_string_kit",
    oracle="""
    SELECT c_custkey,
           lower(replace(c_name, ' ', '_')) AS canon,
           trim(c_mktsegment) AS seg_trim,
           substr(c_name, 1, 8) AS name8,
           concat(c_mktsegment, '#', c_name) AS tagged,
           length(c_name) AS name_len,
           lpad(CAST(c_nationkey AS VARCHAR), 4, '0') AS nk_pad,
           upper(c_mktsegment) AS seg_upper
    FROM customer ORDER BY c_custkey
    """,
)
def q60(spark: SparkSession, sf: str) -> DataFrame:
    """[R] String kit incl. the reference canonicalizer E5."""
    c = load_table(spark, sf, "customer")
    return c.select(
        "c_custkey",
        F.lower(F.regexp_replace("c_name", " ", "_")).alias("canon"),
        F.trim("c_mktsegment").alias("seg_trim"),
        F.substring("c_name", 1, 8).alias("name8"),
        F.concat("c_mktsegment", F.lit("#"), "c_name").alias("tagged"),
        F.length("c_name").alias("name_len"),
        F.lpad(F.col("c_nationkey").cast("string"), 4, "0").alias("nk_pad"),
        F.upper("c_mktsegment").alias("seg_upper"),
    ).orderBy("c_custkey")


@query(
    "q61_split_index",
    oracle="""
    SELECT p_partkey,
           str_split(p_name, ' ')[1] AS first_tok,
           str_split(p_name, ' ')[2] AS second_tok,
           len(str_split(p_name, ' ')) AS n_toks
    FROM part ORDER BY p_partkey
    """,
)
def q61(spark: SparkSession, sf: str) -> DataFrame:
    """[R] split + array index (E6/E7; DuckDB lists are 1-based — dialect
    adapter is just the +1 in the oracle)."""
    p = load_table(spark, sf, "part")
    toks = F.split("p_name", " ")
    return p.select(
        "p_partkey",
        toks.getItem(0).alias("first_tok"),
        toks.getItem(1).alias("second_tok"),
        F.size(toks).alias("n_toks"),
    ).orderBy("p_partkey")


@query(
    "q62_sas_epoch_date",
    oracle="""
    SELECT event_id,
           DATE '1960-01-01' + CAST(user_id AS INT) AS sas_date
    FROM events ORDER BY event_id
    """,
)
def q62(spark: SparkSession, sf: str) -> DataFrame:
    """[R] UA2 replacement: SAS epoch (days since 1960-01-01) as a native
    date_add — the reference's Python UDF (pyspark.py:376-385) eliminated."""
    e = load_table(spark, sf, "events")
    return e.select(
        "event_id",
        F.date_add(F.lit(SAS_EPOCH), F.col("user_id").cast("int")).alias("sas_date"),
    ).orderBy("event_id")


@query(
    "q63_date_kit",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS yr, month(o_orderdate) AS mo,
           day(o_orderdate) AS dom,
           CAST(o_orderdate AS DATE) + 30 AS plus30,
           datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS since_95,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(extract(quarter FROM o_orderdate) AS INT) AS qtr,
           CAST(isodow(o_orderdate) - 1 AS INT) AS wd_iso0
    FROM orders ORDER BY o_orderkey
    """,
)
def q63(spark: SparkSession, sf: str) -> DataFrame:
    """Date kit; weekday as ISO number 0=Monday (SURVEY §7.3 — never the
    locale-dependent date_format 'E' of ref pyspark.py:202,248,294)."""
    o = load_table(spark, sf, "orders")
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.date_add(d, 30).alias("plus30"),
        F.datediff(d, F.lit(datetime.date(1995, 1, 1))).alias("since_95"),
        F.last_day(d).alias("month_end"),
        F.quarter("o_orderdate").alias("qtr"),
        F.weekday("o_orderdate").cast("int").alias("wd_iso0"),
    ).orderBy("o_orderkey")


@query(
    "q64_math_kit",
    oracle="""
    SELECT p_partkey,
           floor(p_retailprice * 10 + 0.5) / 10 AS price1,
           ABS(p_size - 25) AS dist25,
           CAST(CEIL(p_retailprice) AS BIGINT) AS ceil_p,
           CAST(FLOOR(p_retailprice) AS BIGINT) AS floor_p,
           p_size % 5 AS size_mod5,
           CAST(POWER(p_size, 2) AS DOUBLE) AS size_sq,
           CAST(SIGN(p_size - 25) AS DOUBLE) AS side
    FROM part ORDER BY p_partkey
    """,
)
def q64(spark: SparkSession, sf: str) -> DataFrame:
    """Math kit: round/abs/ceil/floor/mod/power/sign."""
    p = load_table(spark, sf, "part")
    return p.select(
        "p_partkey",
        (F.floor(F.col("p_retailprice") * 10 + 0.5) / 10).alias("price1"),
        F.abs(F.col("p_size") - 25).alias("dist25"),
        F.ceil("p_retailprice").alias("ceil_p"),
        F.floor("p_retailprice").alias("floor_p"),
        (F.col("p_size") % 5).alias("size_mod5"),
        F.pow("p_size", 2).alias("size_sq"),
        F.signum(F.col("p_size") - 25).alias("side"),
    ).orderBy("p_partkey")


@query(
    "q65_conditional_kit",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'rich' END AS tier,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
           greatest(c_acctbal, 0.0) AS bal_floor0,
           least(c_nationkey, 10) AS nk_cap10
    FROM customer ORDER BY c_custkey
    """,
)
def q65(spark: SparkSession, sf: str) -> DataFrame:
    """Conditionals: CASE WHEN, coalesce, nullif, greatest/least."""
    c = load_table(spark, sf, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("rich")
        .alias("tier"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg_or_other"
        ),
        F.greatest("c_acctbal", F.lit(0.0)).alias("bal_floor0"),
        F.least("c_nationkey", F.lit(10)).alias("nk_cap10"),
    ).orderBy("c_custkey")


@query(
    "q66_array_kit",
    oracle="""
    SELECT p_partkey, elem, n_elems, has14
    FROM (
        SELECT p_partkey,
               unnest([p_size, p_size * 2, 7]) AS elem,
               len([p_size, p_size * 2, 7]) AS n_elems,
               list_contains([p_size, p_size * 2, 7], 14) AS has14
        FROM part)
    ORDER BY p_partkey, elem
    """,
)
def q66(spark: SparkSession, sf: str) -> DataFrame:
    """Array kit: construct, size, contains, explode/unnest."""
    p = load_table(spark, sf, "part")
    arr = F.array(F.col("p_size"), F.col("p_size") * 2, F.lit(7))
    return (
        p.select(
            "p_partkey",
            F.explode(arr).alias("elem"),
            F.size(arr).alias("n_elems"),
            F.array_contains(arr, 14).alias("has14"),
        )
        .orderBy("p_partkey", "elem")
    )


@query(
    "q67_map_struct_kit",
    oracle="""
    SELECT p_partkey,
           map_extract(map(['sz', 'dbl'], [p_size, p_size * 2]), 'sz')[1] AS m_sz,
           struct_pack(b := p_brand, s := p_size).b AS st_brand
    FROM part ORDER BY p_partkey
    """,
)
def q67(spark: SparkSession, sf: str) -> DataFrame:
    """Map/struct literals + field access, extracted back to scalars."""
    p = load_table(spark, sf, "part")
    m = F.create_map(
        F.lit("sz"), F.col("p_size"), F.lit("dbl"), F.col("p_size") * 2
    )
    st = F.struct(F.col("p_brand").alias("b"), F.col("p_size").alias("s"))
    return p.select(
        "p_partkey",
        m.getItem("sz").alias("m_sz"),
        st.getField("b").alias("st_brand"),
    ).orderBy("p_partkey")


@query(
    "q68_json_kit",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_int
    FROM events ORDER BY event_id
    """,
)
def q68(spark: SparkSession, sf: str) -> DataFrame:
    """JSON extraction over the events payload column (get_json_object vs
    DuckDB json_extract_string — dialect adapter in the oracle only)."""
    e = load_table(spark, sf, "events")
    k = F.get_json_object("props", "$.k")
    return e.select(
        "event_id",
        k.alias("k_str"),
        k.cast("int").alias("k_int"),
    ).orderBy("event_id")


@query(
    "q69_from_json_typed",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k,
           json_extract_string(props, '$.missing') IS NULL AS missing_is_null
    FROM events ORDER BY event_id
    """,
)
def q69(spark: SparkSession, sf: str) -> DataFrame:
    """from_json with an explicit schema — the scale-right JSON path:
    the column parses ONCE into a typed struct (get_json_object re-parses
    the string per extraction); missing fields surface as typed nulls
    instead of inference surprises."""
    e = load_table(spark, sf, "events")
    parsed = F.from_json("props", "k int, missing string")
    return e.select(
        "event_id",
        parsed.getField("k").alias("k"),
        parsed.getField("missing").isNull().alias("missing_is_null"),
    ).orderBy("event_id")


@query(
    "q135_hof_array_kit",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           len(arr) AS arr_sz,
           list_reduce(arr, (a, b) -> a + b) AS tot,
           len(list_filter(list_transform(arr, x -> x * 2),
                           x -> x % 4 = 0)) AS n_evens,
           list_reduce(list_transform(list_zip(arr, list_reverse(arr)),
                                      t -> t[1] + t[2]),
                       (a, b) -> a + b) AS zsum
    FROM (SELECT l_orderkey, l_linenumber,
                 generate_series(1, CAST(l_orderkey % 5 + 1 AS INT)) AS arr
          FROM lineitem)
    ORDER BY l_orderkey, l_linenumber
    """,
)
def q135(spark: SparkSession, sf: str) -> DataFrame:
    """Higher-order array functions: transform / filter / aggregate /
    zip_with over a per-row generated integer array.

    All four lambdas run inside Catalyst (``ArrayTransform`` etc.), not
    Python — no serialization boundary, full codegen, so per-row array
    work scales with the scan. Integer arrays keep the fold
    engine-identical (float folds would depend on accumulation order —
    see the determinism rules). DuckDB's list_* twins are 1-indexed in
    ``t[1]``/``t[2]`` struct access; semantics are otherwise identical."""
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_linenumber")
    arr = F.sequence(F.lit(1), (F.col("l_orderkey") % 5 + 1).cast("int"))
    base = li.withColumn("arr", arr)
    tot = F.aggregate(
        F.col("arr"), F.lit(0), lambda acc, x: acc + x
    )
    n_evens = F.size(
        F.filter(
            F.transform(F.col("arr"), lambda x: x * 2), lambda x: x % 4 == 0
        )
    )
    zsum = F.aggregate(
        F.zip_with(F.col("arr"), F.reverse(F.col("arr")), lambda a, b: a + b),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return base.select(
        "l_orderkey",
        "l_linenumber",
        F.size("arr").alias("arr_sz"),
        tot.alias("tot"),
        n_evens.alias("n_evens"),
        zsum.alias("zsum"),
    ).orderBy("l_orderkey", "l_linenumber")


@query(
    "q136_regexp_kit",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(text, '[a-z]+')) AS n_tokens,
           len(regexp_extract_all(text, '\\bscan\\b')) AS n_scan,
           regexp_extract(text, '\\b(s[a-z]+)', 1) AS first_s_word,
           length(regexp_replace(text, '[aeiou]', '', 'g')) AS devoweled_len
    FROM documents ORDER BY doc_id
    """,
)
def q136(spark: SparkSession, sf: str) -> DataFrame:
    """Regexp kit: regexp_count / regexp_extract / global regexp_replace
    with word-boundary patterns over the document corpus.

    Patterns stay in the RE2/Java-regex common subset (character
    classes, ``\\b``, one capture group) so both engines agree; Spark's
    regexp functions compile once per task and run JVM-side inside
    codegen. Note DuckDB ``regexp_replace`` needs the explicit ``'g'``
    flag to match Spark's replace-all semantics — a classic silent
    cross-engine mismatch."""
    d = load_table(spark, sf, "documents").select("doc_id", "text")
    return d.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit("[a-z]+")).alias("n_tokens"),
        F.regexp_count(F.col("text"), F.lit(r"\bscan\b")).alias("n_scan"),
        F.regexp_extract(F.col("text"), r"\b(s[a-z]+)", 1).alias("first_s_word"),
        F.length(F.regexp_replace(F.col("text"), "[aeiou]", "")).alias(
            "devoweled_len"
        ),
    ).orderBy("doc_id")


@query(
    "q140_bitwise_kit",
    oracle="""
    SELECT event_type,
           bit_and(a) AS band, bit_or(a) AS bor, bit_xor(a) AS bxor,
           CAST(SUM(bit_count(a & b)) AS BIGINT) AS bits_total,
           CAST(SUM(xor(a, b)) AS BIGINT) AS xor_sum,
           CAST(SUM((a << 2) | (b >> 1)) AS BIGINT) AS shift_sum
    FROM (SELECT event_type,
                 event_id % 256 AS a, user_id % 256 AS b
          FROM events)
    GROUP BY event_type ORDER BY event_type
    """,
)
def q140(spark: SparkSession, sf: str) -> DataFrame:
    """Bitwise kit: &, |, ^, shifts, popcount, and the bit_and/or/xor
    aggregates — the flag-mask toolbox (permission bits, bloom-filter
    words, feature flags).

    All pure integer codegen expressions; the aggregates are mergeable
    partials (bitwise ops are associative+commutative) so the plan is a
    standard partial/final hash aggregate — the same shape that lets a
    1000-executor cluster AND together 100 TB of bitmap words with one
    constant-size shuffle."""
    ev = load_table(spark, sf, "events").select(
        "event_type",
        (F.col("event_id") % 256).alias("a"),
        (F.col("user_id") % 256).alias("b"),
    )
    return (
        ev.groupBy("event_type")
        .agg(
            F.bit_and(F.col("a")).alias("band"),
            F.bit_or(F.col("a")).alias("bor"),
            F.bit_xor(F.col("a")).alias("bxor"),
            F.sum(F.bit_count(F.col("a").bitwiseAND(F.col("b")))).alias(
                "bits_total"
            ),
            F.sum(F.col("a").bitwiseXOR(F.col("b"))).alias("xor_sum"),
            F.sum(
                F.shiftleft(F.col("a"), 2).bitwiseOR(F.shiftright(F.col("b"), 1))
            ).alias("shift_sum"),
        )
        .orderBy("event_type")
    )


@query(
    "q144_date_trunc_kit",
    oracle="""
    SELECT o_orderkey,
           CAST(date_trunc('week', o_orderdate) AS DATE) AS week_start,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           CAST(extract(quarter FROM o_orderdate) AS INT) AS qtr,
           CAST(extract(isodow FROM o_orderdate) - 1 AS INT) AS wd,
           datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
               AS days_since
    FROM orders ORDER BY o_orderkey
    """,
)
def q144(spark: SparkSession, sf: str) -> DataFrame:
    """Calendar-bucketing kit: date_trunc to week/month, quarter, Monday-
    based weekday, day offset from a fixed epoch.

    Cross-engine gotchas this query pins down: Spark ``date_trunc``
    returns TIMESTAMP (cast to DATE on both sides); weekday numbering
    differs everywhere (Spark ``dayofweek`` is 1=Sunday, DuckDB ``dow``
    is 0=Sunday) — the portable choice is Monday=0, Spark ``weekday()``
    == DuckDB ``isodow - 1``. All pure codegen; date_trunc is THE
    partition-bucketing function for time-partitioned 100 TB layouts
    (write partitioned by month_start, prune scans by the same expr)."""
    o = load_table(spark, sf, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_trunc("week", d).cast("date").alias("week_start"),
        F.date_trunc("month", d).cast("date").alias("month_start"),
        F.quarter(d).alias("qtr"),
        F.weekday(d).alias("wd"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since"
        ),
    ).orderBy("o_orderkey")


@query(
    "q149_map_kit",
    oracle="""
    SELECT c_nationkey, c_mktsegment AS seg, cnt * 2 AS v2
    FROM (SELECT c_nationkey, c_mktsegment, COUNT(*) AS cnt
          FROM customer GROUP BY c_nationkey, c_mktsegment)
    WHERE cnt * 2 > 4
    ORDER BY c_nationkey, seg
    """,
)
def q149(spark: SparkSession, sf: str) -> DataFrame:
    """Map-typed column kit: map_from_entries / transform_values /
    map_filter / explode-back-to-rows.

    The per-nation segment->count map is built from a SORTED entry list
    (collect_list alone is partition-order-nondeterministic; the sort
    makes the map construction a value). transform_values and map_filter
    are Catalyst higher-order functions — no Python boundary. The oracle
    never builds a map at all: it states the same relation row-wise,
    which is exactly the point — map columns are a LAYOUT choice (one row
    per group, O(distinct values) entries), not different semantics, and
    the gate proves the round-trip loses nothing."""
    c = load_table(spark, sf, "customer")
    counts = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    m = counts.groupBy("c_nationkey").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("c_mktsegment", "cnt")))
        ).alias("m")
    )
    filtered = m.select(
        "c_nationkey",
        F.map_filter(
            F.transform_values(F.col("m"), lambda k, v: v * 2),
            lambda k, v: v > 4,
        ).alias("mf"),
    )
    return (
        filtered.select("c_nationkey", F.explode("mf").alias("seg", "v2"))
        .orderBy("c_nationkey", "seg")
    )


@query(
    "q161_try_kit",
    oracle="""
    SELECT event_id,
           TRY_CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
           TRY_CAST(event_type AS INT) AS bad_int,
           CAST(floor(value) AS BIGINT)
               / NULLIF(CAST(floor(value) AS BIGINT) % 7, 0) AS try_div
    FROM events ORDER BY event_id
    """,
)
def q161(spark: SparkSession, sf: str) -> DataFrame:
    """Error-safe evaluation kit: TRY_CAST returns NULL instead of
    failing the job; try_divide nulls division by zero.

    On one executor a bad row kills a task; at 1000 executors bad rows
    are a certainty and a fail-fast cast kills the whole 100 TB job on
    row one — the try_* family turns poison rows into NULLs you can
    quarantine (route through q139's expectations to count them).
    Spark's try_divide == DuckDB's ``x / NULLIF(y, 0)`` (DuckDB division
    already yields NULL on zero; the NULLIF spelling keeps the intent
    explicit and portable)."""
    ev = load_table(spark, sf, "events")
    fv = F.floor(F.col("value")).cast("long")
    return ev.select(
        "event_id",
        F.get_json_object(F.col("props"), "$.k").try_cast("int").alias("k_int"),
        F.col("event_type").try_cast("int").alias("bad_int"),
        F.try_divide(fv, fv % 7).alias("try_div"),
    ).orderBy("event_id")


@query(
    "q162_string_kit2",
    oracle="""
    SELECT c_custkey,
           translate(c_name, 'Cusstomer#', 'KQWWXYZ@--') AS xlate,
           repeat(left(c_name, 2), 2) AS rep2,
           instr(c_name, '#') AS hash_pos,
           right(c_name, 3) AS tail3,
           ascii(c_name) AS first_code,
           chr(65 + CAST(c_custkey % 26 AS INT)) AS cycle_chr,
           reverse(c_name) AS rev,
           split_part(c_name, '#', 2) AS after_hash
    FROM customer ORDER BY c_custkey
    """,
)
def q162(spark: SparkSession, sf: str) -> DataFrame:
    """String kit 2: translate / repeat / instr / left / right / ascii /
    chr / reverse / split_part — completing the scalar string surface
    beyond q60's canonicalizer.

    All codegen'd JVM string ops, no UDFs. Dialect notes pinned by the
    gate: Spark ``char()`` == DuckDB ``chr()``; Spark ``substring_index``
    == DuckDB ``split_part`` for positive indices; ``instr`` is 1-based
    (0 = absent) in both."""
    c = load_table(spark, sf, "customer")
    name = F.col("c_name")
    return c.select(
        "c_custkey",
        F.translate(name, "Cusstomer#", "KQWWXYZ@--").alias("xlate"),
        F.repeat(F.substring(name, 1, 2), 2).alias("rep2"),
        F.instr(name, "#").alias("hash_pos"),
        F.substring(name, -3, 3).alias("tail3"),
        F.ascii(name).alias("first_code"),
        F.char(F.lit(65) + (F.col("c_custkey") % 26).cast("int")).alias(
            "cycle_chr"
        ),
        F.reverse(name).alias("rev"),
        F.substring_index(name, "#", -1).alias("after_hash"),
    ).orderBy("c_custkey")


@query(
    "q176_variant_json",
    oracle="""
    SELECT event_id,
           TRY_CAST(json_extract_string(props, '$.k') AS INT) AS k,
           TRY_CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_mod,
           CASE WHEN TRY_CAST(json_extract_string(props, '$.k') AS INT) IS NULL
                THEN NULL ELSE 'int' END AS k_kind
    FROM events ORDER BY event_id
    """,
)
def q176(spark: SparkSession, sf: str) -> DataFrame:
    """Semi-structured VARIANT (Spark 4): parse_json once into the binary
    variant encoding, then typed ``variant_get`` path extraction.

    Against 100 TB of ragged JSON this is the schema-on-read answer:
    VARIANT parses each document ONCE at ingest (columnar binary,
    shreddable in parquet) and every downstream path access is a cheap
    typed probe — where get_json_object (q68) re-parses the string per
    expression. schema_of_variant drives drift detection; the NULL-on-
    missing semantics match TRY_CAST. DuckDB has no variant type, so the
    oracle states the same relation over its JSON functions."""
    ev = load_table(spark, sf, "events")
    v = F.parse_json(F.col("props"))
    k = F.variant_get(v, "$.k", "int")
    return ev.select(
        "event_id",
        k.alias("k"),
        (k % 10).alias("k_mod"),
        F.when(k.isNull(), F.lit(None).cast("string"))
        .otherwise(F.lit("int"))
        .alias("k_kind"),
    ).orderBy("event_id")


@query(
    "q177_collated_compare",
    oracle="""
    SELECT c_nationkey,
           CAST(count_if(lower(CASE WHEN c_custkey % 2 = 0
                               THEN lower(c_mktsegment)
                               ELSE c_mktsegment END) = 'building')
               AS BIGINT) AS n_building_ci,
           CAST(count_if((CASE WHEN c_custkey % 2 = 0
                          THEN lower(c_mktsegment)
                          ELSE c_mktsegment END) = 'building')
               AS BIGINT) AS n_building_cs
    FROM customer GROUP BY c_nationkey ORDER BY c_nationkey
    """,
)
def q177(spark: SparkSession, sf: str) -> DataFrame:
    """String collations (Spark 4): case-insensitive comparison via
    ``COLLATE UTF8_LCASE`` on a mixed-case column (half the rows
    lowercased), against the case-sensitive default.

    Collation travels with the TYPE, so every comparison, join key, and
    GROUP BY on the column honors it engine-wide — the principled
    replacement for wrapping lower() around both sides of every
    predicate (which blocks predicate pushdown statistics and gets
    forgotten on one side). DuckDB spells the same semantics with
    lower(); counts must agree."""
    c = load_table(spark, sf, "customer")
    mixed = F.when(
        F.col("c_custkey") % 2 == 0, F.lower(F.col("c_mktsegment"))
    ).otherwise(F.col("c_mktsegment"))
    ci = F.collate(mixed, "UTF8_LCASE")
    return (
        c.groupBy("c_nationkey")
        .agg(
            F.count_if(ci == F.lit("building")).alias("n_building_ci"),
            F.count_if(mixed == F.lit("building")).alias("n_building_cs"),
        )
        .orderBy("c_nationkey")
    )


@query(
    "q179_listagg_ansi",
    oracle="""
    SELECT o_orderstatus,
           string_agg(DISTINCT o_orderpriority, '|' ORDER BY o_orderpriority)
               AS prios
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def q179(spark: SparkSession, sf: str) -> DataFrame:
    """ANSI LISTAGG ... WITHIN GROUP (Spark 4) — the standard spelling of
    q143's sorted string aggregation; registered so migrated SQL runs
    verbatim. The WITHIN GROUP order clause is what makes the result a
    value rather than a partition-order accident."""
    load_table(spark, sf, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus,
               listagg(DISTINCT o_orderpriority, '|')
                   WITHIN GROUP (ORDER BY o_orderpriority) AS prios
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
        """
    )


@query(
    "q180_pipe_syntax",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
               AS total
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def q180(spark: SparkSession, sf: str) -> DataFrame:
    """SQL pipe syntax (Spark 4): the |> operator chain — each stage is a
    complete, independently-checkable table transform, in execution
    order, instead of SQL's inside-out clause nesting.

    Compiles to the identical plan as the clause form (the oracle is
    that form), so there is zero runtime cost to the readability; the
    AGGREGATE ... GROUP BY stage still plans partial+final hash
    aggregation with the decimal money discipline. Registered so piped
    queries from migrating users run verbatim."""
    load_table(spark, sf, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        FROM orders
        |> WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        |> AGGREGATE COUNT(*) AS n,
                     CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2)
                          AS DOUBLE) AS total
           GROUP BY o_orderstatus
        |> ORDER BY o_orderstatus
        """
    )


@query(
    "q181_from_xml",
    oracle="""
    SELECT c_custkey, c_mktsegment AS seg_x,
           CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents
    FROM customer ORDER BY c_custkey
    """,
)
def q181(spark: SparkSession, sf: str) -> DataFrame:
    """XML ingestion (Spark 4 from_xml): round-trip each row through an
    XML document and re-extract typed fields with a declared schema.

    The XML feed is synthesized from the row (this container has no XML
    fixtures), so the oracle simply states the pre-serialization values
    — the gate proves extraction is lossless. from_xml is the escape
    hatch for the enterprise-feed sources the reference's CSV/JSON/SAS
    readers (SURVEY §2.1) don't cover; like VARIANT (q176) it parses
    once into a struct, and malformed documents yield NULL structs to
    quarantine via q139 rather than killing the job."""
    c = load_table(spark, sf, "customer")
    xml = F.concat(
        F.lit("<rec><seg>"),
        F.col("c_mktsegment"),
        F.lit("</seg><bal>"),
        F.floor(F.col("c_acctbal") * 100 + 0.5).cast("long").cast("string"),
        F.lit("</bal></rec>"),
    )
    parsed = F.from_xml(xml, "seg STRING, bal BIGINT")
    return c.select(
        "c_custkey",
        parsed.getField("seg").alias("seg_x"),
        parsed.getField("bal").alias("bal_cents"),
    ).orderBy("c_custkey")


@query(
    "q182_interval_arithmetic",
    oracle="""
    SELECT event_id,
           CAST(ts AS TIMESTAMP) + INTERVAL 90 MINUTE AS plus90m,
           CAST(ts AS TIMESTAMP) - INTERVAL 1 DAY AS minus1d,
           CAST((epoch_us(CAST(ts AS TIMESTAMP) + INTERVAL 90 MINUTE)
                 - epoch_us(CAST(ts AS TIMESTAMP) - INTERVAL 1 DAY))
                / 60000000 AS BIGINT) AS span_minutes
    FROM events ORDER BY event_id
    """,
)
def q182(spark: SparkSession, sf: str) -> DataFrame:
    """Day-time INTERVAL arithmetic: shift timestamps by typed intervals
    and measure the span in minutes — the SLA/windowing offset kit.

    Interval literals are typed values (not second-counts), so +90
    minutes is exact at any precision and the plan stays codegen.
    The span division is integer microseconds — deterministic. DuckDB
    and Spark agree on day-time interval semantics; month intervals
    (calendar-dependent length) are the cross-engine trap, which is why
    the kit pins day-time units and q144 handles calendar bucketing."""
    ev = load_table(spark, sf, "events")
    ts = F.col("ts").cast("timestamp")
    plus90 = ts + F.expr("INTERVAL 90 MINUTE")
    minus1d = ts - F.expr("INTERVAL 1 DAY")
    span = (
        (F.unix_micros(plus90) - F.unix_micros(minus1d)) / 60_000_000
    ).cast("long")
    return ev.select(
        "event_id",
        plus90.alias("plus90m"),
        minus1d.alias("minus1d"),
        span.alias("span_minutes"),
    ).orderBy("event_id")


# ----------------------------------- SQL UDFs (declarative, inlined) -------
@query(
    "q387_sql_udf_kit",
    oracle="""
    SELECT l_returnflag,
           CASE WHEN CAST(floor(l_quantity + 0.5) AS BIGINT) < 10
                THEN 'small'
                WHEN CAST(floor(l_quantity + 0.5) AS BIGINT) < 30
                THEN 'mid' ELSE 'bulk' END AS qty_band,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100
                               + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM lineitem
    GROUP BY l_returnflag, qty_band
    ORDER BY l_returnflag, qty_band
    """,
)
def q387(spark: SparkSession, sf: str) -> DataFrame:
    """SQL UDFs (CREATE TEMPORARY FUNCTION ... RETURN expr) — the
    DECLARATIVE user-function surface added in Spark 4: the body is a
    SQL expression, so Catalyst inlines it into the calling plan and
    the whole query stays in whole-stage codegen — zero Python
    workers, zero serialization, unlike q103's pandas UDF (the
    escape hatch for logic SQL can't express). This is the right
    first tool for shared business logic (a revenue formula, a
    banding rule) reused across hundreds of queries: one definition,
    engine-optimized everywhere, and portable — the oracle runs the
    same expressions inlined, which is exactly what Catalyst does.

    The kit registers a money formula (discounted revenue on the
    exact cent grid) and a CASE banding rule, then aggregates through
    both. Scale: indistinguishable from writing the expressions
    inline — one hash aggregate, functions evaluated row-local inside
    codegen; `.explain` shows no BatchEvalPython/ArrowEvalPython
    node (asserted in tests/test_operators.py)."""
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION disc_rev_cents("
        "price DOUBLE, disc DOUBLE) RETURNS BIGINT "
        "RETURN CAST(floor(price * (1 - disc) * 100 + 0.5) AS BIGINT)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION qty_band(q BIGINT) "
        "RETURNS STRING RETURN CASE WHEN q < 10 THEN 'small' "
        "WHEN q < 30 THEN 'mid' ELSE 'bulk' END"
    )
    load_table(spark, sf, "lineitem").createOrReplaceTempView(
        "_q387_lineitem"
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               qty_band(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS qty_band,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(disc_rev_cents(l_extendedprice, l_discount))
                    AS BIGINT) AS revenue_cents
        FROM _q387_lineitem
        GROUP BY l_returnflag, qty_band(CAST(floor(l_quantity + 0.5)
                                             AS BIGINT))
        ORDER BY l_returnflag, qty_band
        """
    )
