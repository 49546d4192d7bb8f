"""Unit + property tests for the refops vocabulary (SURVEY.md §5)."""

from __future__ import annotations

import datetime

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_engineer_capstone_spark.functions import refops


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).head()[0]


def test_clean_string(spark):
    df = spark.createDataFrame([("El Salvador",), ("UNITED STATES",), (None,)], "s string")
    out = [r[0] for r in df.select(refops.clean_string("s")).collect()]
    assert out == ["el_salvador", "united_states", None]


def test_abbreviate_state_matches_reference_semantics(spark):
    # leading space stripped, full names mapped, misses pass through intact
    rows = [(" CALIFORNIA",), (" NEW YORK",), (" PUERTO RICO",), (" CA",), (None,)]
    df = spark.createDataFrame(rows, "s string")
    out = [r[0] for r in df.select(refops.abbreviate_state("s")).collect()]
    assert out == ["CA", "NY", " PUERTO RICO", " CA", None]


def test_sas_epoch_null_and_zero_default(spark):
    df = spark.createDataFrame([(20567,), (0,), (None,)], "d int")
    out = [r[0] for r in df.select(refops.sas_epoch_to_date("d")).collect()]
    assert out[0] == datetime.date(1960, 1, 1) + datetime.timedelta(days=20567)
    assert out[1] == datetime.date(1960, 1, 1)
    assert out[2] == datetime.date(1960, 1, 1)  # reference: null -> epoch


@settings(max_examples=30, deadline=None)
@given(st.integers(min_value=-30000, max_value=30000))
def test_sas_epoch_roundtrip(spark, days):
    d = _one(spark, refops.sas_epoch_to_date(F.lit(days)))
    assert (d - datetime.date(1960, 1, 1)).days == days


def test_union_align_never_reorders_or_retypes(spark):
    a = spark.createDataFrame([(1, "x")], "id int, name string")
    b = spark.createDataFrame([(2, 3.5)], "id int, score double")
    out = refops.union_align([a, b])
    assert out.columns == ["id", "name", "score"]
    assert dict(out.dtypes) == {"id": "int", "name": "string", "score": "double"}
    rows = {tuple(r) for r in out.collect()}
    assert rows == {(1, "x", None), (2, None, 3.5)}


def test_conform_schema_casts_and_orders(spark):
    df = spark.createDataFrame([("7", "3.5", "x")], "a string, b string, c string")
    schema = T.StructType(
        [
            T.StructField("c", T.StringType(), True),
            T.StructField("a", T.LongType(), False),
            T.StructField("b", T.DoubleType(), True),
        ]
    )
    out = refops.conform_schema(df, schema)
    assert out.columns == ["c", "a", "b"]
    assert tuple(out.head()) == ("x", 7, 3.5)


def test_conform_schema_missing_column_fails(spark):
    df = spark.createDataFrame([(1,)], "a int")
    schema = T.StructType([T.StructField("zzz", T.IntegerType(), True)])
    with pytest.raises(Exception):
        refops.conform_schema(df, schema).collect()


def test_deterministic_id_stable_and_unique(spark):
    df = spark.createDataFrame(
        [("b", 2), ("a", 1), ("a", None), ("c", 3)], "k string, v int"
    )
    out1 = {(r.k, r.v): r.id for r in refops.deterministic_id(df, ["k", "v"]).collect()}
    out2 = {
        (r.k, r.v): r.id
        for r in refops.deterministic_id(df.repartition(7), ["k", "v"]).collect()
    }
    assert out1 == out2  # stable under partitioning changes
    assert sorted(out1.values()) == [1, 2, 3, 4]
    assert out1[("a", None)] == 1  # nulls first


def test_code_lookup_inner_drops_and_left_keeps(spark):
    dim = spark.createDataFrame([(1, "US"), (2, "MX")], "code int, label string")
    fact = spark.createDataFrame([(10, 1), (11, 2), (12, 9)], "id int, c int")
    inner = refops.code_lookup(dim, fact, {"label": "country"}, "c")
    assert {(r.id, r.country) for r in inner.collect()} == {(10, "US"), (11, "MX")}
    left = refops.code_lookup(dim, fact, {"label": "country"}, "c", how="left")
    assert {(r.id, r.country) for r in left.collect()} == {
        (10, "US"),
        (11, "MX"),
        (12, None),
    }


def test_dedup_idempotent(spark):
    df = spark.createDataFrame([(1, "a"), (1, "a"), (2, "b")], "id int, s string")
    once = df.dropDuplicates()
    twice = once.dropDuplicates()
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_data_quality_checks(spark):
    schema = T.StructType(
        [T.StructField("a", T.IntegerType(), True), T.StructField("b", T.StringType(), True)]
    )
    good = spark.createDataFrame([(1, "x")], schema)
    res = refops.data_quality_checks(good, schema)
    assert res == {"non_empty": True, "cols_match": True, "types_match": True}
    empty = spark.createDataFrame([], schema)
    assert not refops.data_quality_checks(empty, schema)["non_empty"]
    wrong_order = good.select("b", "a")
    assert not refops.data_quality_checks(wrong_order, schema)["cols_match"]


def test_deterministic_id_fact_scale_matches_global(spark):
    """The partition-offset (zipWithIndex-shape) id plan must mint EXACTLY
    the ids of the global-window plan: same (key → id) pairing, 1..n dense,
    regardless of input partitioning."""
    from pyspark.sql import functions as F

    rows = [(f"k{i:04d}", i % 7) for i in range(997)]
    df = spark.createDataFrame(rows, "k string, v int").repartition(13)
    a = refops.deterministic_id(df, ["k"], fact_scale=False)
    b = refops.deterministic_id(df, ["k"], fact_scale=True)
    got_a = {(r.k, r.id) for r in a.collect()}
    got_b = {(r.k, r.id) for r in b.collect()}
    assert got_a == got_b
    ids = sorted(r.id for r in b.collect())
    assert ids == list(range(1, 998))
    # distributed plan has no partitionless window
    plan = b._jdf.queryExecution().executedPlan().toString()
    assert "rowsBetween" not in plan  # sanity: plan string renders


def test_deterministic_id_fact_scale_releases_scaffolding(spark):
    """fact_scale ids must not leave the ranged scaffolding cached (round-2
    ADVICE: the old form persisted it and never released — q205 mints ids
    three times per run, so three cached tables accumulated per execution).
    The output is an eager localCheckpoint (lineage cut — re-running it can
    never resample partition boundaries) and the scaffolding persist is
    released before the function returns, so the returned plan reads the
    checkpoint, not an InMemoryTableScan, and the only storage delta per
    LIVE result is its own checkpoint (reclaimed by ContextCleaner when the
    caller drops the DataFrame)."""
    jsc = spark.sparkContext._jsc
    before = jsc.getPersistentRDDs().size()
    df = spark.createDataFrame([(f"k{i}",) for i in range(300)], "k string")
    out = refops.deterministic_id(df, ["k"], fact_scale=True)
    assert out.count() == 300
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" not in plan, "scaffolding persist leaked into output"
    assert "ExistingRDD" in plan, "output is not lineage-truncated"
    # one checkpoint for the live result; the ranged persist is gone
    assert jsc.getPersistentRDDs().size() <= before + 1


def test_deterministic_id_fact_scale_empty(spark):
    df = spark.createDataFrame([], "k string, v int")
    out = refops.deterministic_id(df, ["k"], fact_scale=True)
    assert out.count() == 0


def test_deterministic_id_fact_scale_nulls_ordering(spark):
    """fact_scale ids must respect the nulls_first/nulls_last contract of
    the global-window path (repartitionByRange must receive the same
    SortOrder, not default to NULLS FIRST)."""
    rows = [("b",), (None,), ("a",), (None,), ("c",)]
    df = spark.createDataFrame(rows, "k string").repartition(3)
    for nf in (True, False):
        a = refops.deterministic_id(df, ["k"], nulls_first=nf, fact_scale=False)
        b = refops.deterministic_id(df, ["k"], nulls_first=nf, fact_scale=True)
        pairs_a = sorted((r.k or "", r.id) for r in a.collect())
        pairs_b = sorted((r.k or "", r.id) for r in b.collect())
        assert pairs_a == pairs_b, f"nulls_first={nf}"


def test_with_quality_observation_rides_main_action(spark):
    """DQ metrics via observe(): computed by the SAME job as the caller's
    action — job count must not grow vs the bare action."""
    sc = spark.sparkContext
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c")], "id int, v string"
    )
    observed, obs = refops.with_quality_observation(df, "dq1", not_null=["v"])
    sc.setJobGroup("obs-dq", "observe dq", interruptOnCancel=False)
    try:
        n = observed.count()
    finally:
        sc.setJobGroup("", "")
    assert n == 3
    assert obs.get == {"n_rows": 3, "nulls_v": 1}
    jobs = sc.statusTracker().getJobIdsForGroup("obs-dq")
    assert len(jobs) <= 2, f"observation spawned extra jobs: {len(jobs)}"


def test_ntile_from_rank_matches_sql_ntile_all_residues(spark):
    """The exact-NTILE closed form must agree with Spark's NTILE window for
    EVERY residue n mod k — including the n ≡ 2 (mod 4) and n mod 10 ∈
    {2..8} counts where the old Bresenham form diverged (round-2 ADVICE
    high/medium findings: q205 at sf0.01 has 150 users, 150 % 4 == 2)."""
    from pyspark.sql import Window as W

    from data_engineer_capstone_spark.plans._util import ntile_from_rank

    for k, ns in ((4, [1, 2, 3, 5, 6, 150, 151]), (10, [7, 12, 153, 155, 158])):
        for n in ns:
            df = spark.range(1, n + 1).select(
                F.col("id").alias("rank"), F.lit(n).alias("n_tot")
            )
            got = {
                r["rank"]: r["b"]
                for r in df.select(
                    "rank", ntile_from_rank(F.col("rank"), F.col("n_tot"), k).alias("b")
                ).collect()
            }
            want = {
                r["rank"]: r["b"]
                for r in df.select(
                    "rank", F.ntile(k).over(W.orderBy("rank")).alias("b")
                ).collect()
            }
            assert got == want, f"k={k} n={n}: closed form != SQL NTILE"


def _opt_plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_family4_width_gate_equivalence(spark, monkeypatch):
    """SCALE_100TB.md Family 4, enforced (VERDICT r9 ask #2): past
    OFFSET_MAP_MAX_WIDTH the rank/prefix machinery must swap its plan
    map-literal offset lookup for a broadcast equi-join on _pid — same
    values, no literal, no driver collect. Forced here by shrinking the
    threshold below the session's 8 shuffle partitions (the q229
    salted-join equivalence pattern) over data with nulls, an all-null
    key band, and negative values."""
    rows = []
    for k in range(1, 61):
        v = None if (k % 7 == 0 or 20 <= k <= 29) else (k * 3) % 17 - 5
        w = None if 40 <= k <= 49 else k % 5
        rows.append((k, v, w))
    df = spark.createDataFrame(rows, "k int, v int, w int")

    def gated(fn):
        monkeypatch.setattr(refops, "OFFSET_MAP_MAX_WIDTH", 2)
        try:
            return fn()
        finally:
            monkeypatch.setattr(refops, "OFFSET_MAP_MAX_WIDTH", 65_536)

    # --- deterministic_id: literal, gated, and the global-window twin ---
    lit_id = {r.k: r.id for r in refops.deterministic_id(df, ["k"], fact_scale=True).collect()}
    g_df = gated(lambda: refops.deterministic_id(df, ["k"], fact_scale=True))
    gat_id = {r.k: r.id for r in g_df.collect()}
    glob_id = {r.k: r.id for r in refops.deterministic_id(df, ["k"], fact_scale=False).collect()}
    assert lit_id == gat_id == glob_id
    assert "map(" not in _opt_plan(g_df) and "Join" in _opt_plan(g_df)
    # empty input still analyzes and returns empty on the gated path
    assert gated(lambda: refops.deterministic_id(df.limit(0), ["k"], fact_scale=True)).count() == 0

    # --- distributed_cumsum: multi-column + rank, null-transparency ---
    def cums():
        return {
            r.k: (r.cv, r.cw, r.rk)
            for r in refops.distributed_cumsum(
                df, ["k"], ["v", "w"], ["cv", "cw"], rank_name="rk"
            ).collect()
        }

    lit_cs = cums()
    gat_cs = gated(cums)
    assert lit_cs == gat_cs
    # reference: partitionless window twin
    from pyspark.sql import Window as W

    wref = W.orderBy("k").rowsBetween(W.unboundedPreceding, 0)
    ref = {
        r.k: (r.cv, r.cw, r.rk)
        for r in df.select(
            "k",
            F.sum("v").over(wref).cast("long").alias("cv"),
            F.sum("w").over(wref).cast("long").alias("cw"),
            F.row_number().over(W.orderBy("k")).cast("long").alias("rk"),
        ).collect()
    }
    assert gat_cs == ref

    # --- distributed_cummax ---
    lit_cm = {r.k: r.cm for r in refops.distributed_cummax(df, ["k"], "v", "cm").collect()}
    gat_cm = gated(
        lambda: {r.k: r.cm for r in refops.distributed_cummax(df, ["k"], "v", "cm").collect()}
    )
    ref_cm = {
        r.k: r.cm for r in df.select("k", F.max("v").over(wref).alias("cm")).collect()
    }
    assert lit_cm == gat_cm == ref_cm


def test_cumsum_rejects_non_integral_value_column(spark):
    """Integral-value contract (round 10): both cumsum paths compute
    running totals in long, and fractional columns would be truncated
    DIFFERENTLY by the literal and wide paths (the organic-width audit,
    artifacts/family4_organic_trigger_r10.log). The guard must fail
    loudly at the call site; integral columns pass untouched."""
    import pytest

    from data_engineer_capstone_spark.functions.refops import distributed_cumsum

    df = spark.range(10).select(
        F.col("id"), (F.col("id") / 2.0).alias("frac"),
        F.col("id").cast("decimal(10,2)").alias("dec"),
    )
    for bad in ("frac", "dec"):
        with pytest.raises(TypeError, match="integral-value contract"):
            distributed_cumsum(df, ["id"], bad, name="c")
    out = distributed_cumsum(df, ["id"], "id", name="c")
    rows = {r["id"]: r["c"] for r in out.collect()}
    assert rows[9] == sum(range(10))
    # ADVICE r10 #5: a value column absent from the frame must raise the
    # operator's own ValueError, not defer to a downstream analysis error
    with pytest.raises(ValueError, match="not in frame"):
        distributed_cumsum(df, ["id"], "nope", name="c")
    # ...and duplicate column names must not let a fractional twin hide
    # behind an integral one of the same name
    dup = df.select("id", F.col("id").alias("v"), (F.col("id") / 2.0).alias("v"))
    with pytest.raises(TypeError, match="integral-value contract"):
        distributed_cumsum(dup, ["id"], "v", name="c")
