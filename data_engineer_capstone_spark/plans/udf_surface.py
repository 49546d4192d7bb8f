"""UDF / UDAF / UDTF surface queries (SURVEY.md §2.7): the registered
Python-function escape hatch, exercised through SQL (registration makes
the functions visible to ``spark.sql``) and oracle-checked like every
other query.

Exemplar choices are deliberately determinism-safe: integer outputs
(token counts, positions) and exact-integer-sum ratios (weighted mean),
so the Arrow/pandas path can hash-match DuckDB without tolerance.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.udfs import register_exemplars
from .registry import query


def _docs_view(spark: SparkSession, sf: str) -> str:
    """Register documents as a uniquely-named temp view + the exemplar
    functions; returns the view name."""
    register_exemplars(spark)
    name = f"docs_{uuid.uuid4().hex[:10]}"
    load_table(spark, sf, "documents").createOrReplaceTempView(name)
    return name


@query(
    "q103_udf_scalar_pandas",
    oracle="""
    SELECT doc_id, len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_tokens
    FROM documents ORDER BY doc_id
    """,
)
def q103(spark: SparkSession, sf: str) -> DataFrame:
    """Scalar pandas UDF (Arrow-vectorized) registered for SQL: token
    count per document."""
    v = _docs_view(spark, sf)
    return spark.sql(
        f"SELECT doc_id, tok_count(text) AS n_tokens FROM {v} ORDER BY doc_id"
    )


@query(
    "q104_udaf_grouped_agg",
    oracle="""
    SELECT lang, source,
           CAST(SUM(n_chars * (1 + doc_id % 7)) AS DOUBLE)
             / SUM(1 + doc_id % 7) AS w_chars
    FROM documents
    GROUP BY lang, source
    ORDER BY lang, source
    """,
)
def q104(spark: SparkSession, sf: str) -> DataFrame:
    """UDAF (grouped-agg pandas UDF): per-(lang, source) weighted mean of
    n_chars, weight 1 + doc_id % 7. Exact int64 sums inside the UDF keep
    the quotient partition-order independent. (Spark disallows mixing a
    grouped-agg pandas UDF with built-in aggregates in one agg, so the
    UDAF is the only aggregate here.)"""
    v = _docs_view(spark, sf)
    return spark.sql(
        f"""
        SELECT lang, source,
               weighted_mean(n_chars, 1 + doc_id % 7) AS w_chars
        FROM {v}
        GROUP BY lang, source
        ORDER BY lang, source
        """
    )


@query(
    "q105_udtf_lateral",
    oracle="""
    WITH w AS (
        SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
        FROM documents WHERE doc_id < 100
    )
    SELECT doc_id, i - 1 AS pos, ws[i] || ' ' || ws[i + 1] AS gram
    FROM w, UNNEST(range(1, len(ws))) AS t(i)
    ORDER BY doc_id, pos
    """,
)
def q105(spark: SparkSession, sf: str) -> DataFrame:
    """Python UDTF in LATERAL position: per-document word bigrams with
    positions (a table function joined laterally against its input row)."""
    v = _docs_view(spark, sf)
    return spark.sql(
        f"""
        SELECT d.doc_id, t.pos, t.gram
        FROM {v} d, LATERAL bigrams(d.text) t
        WHERE d.doc_id < 100
        ORDER BY d.doc_id, t.pos
        """
    )


@query(
    "q111_grouped_map_zscore",
    oracle="""
    WITH s AS (
        SELECT lang, COUNT(*) AS n, SUM(n_chars) AS sm, SUM(n_chars * n_chars) AS sq
        FROM documents GROUP BY lang
    )
    SELECT d.doc_id, d.lang,
           floor((d.n_chars - CAST(s.sm AS DOUBLE) / s.n)
                 / sqrt((s.sq - CAST(s.sm AS DOUBLE) * s.sm / s.n) / s.n)
                 * 1000000 + 0.5) / 1000000 AS z_chars
    FROM documents d JOIN s USING (lang)
    ORDER BY d.doc_id
    """,
)
def q111(spark: SparkSession, sf: str) -> DataFrame:
    """Grouped-map applyInPandas (the remaining vectorized-Python shape):
    per-language z-score normalization of n_chars. The pandas function
    sees one full group per call; moments use exact int64 sums so the
    doubles that reach the (order-fixed) scalar math are identical to the
    oracle's, and the result is floor-rounded for cross-engine hashing.

    Scale note: one shuffle on the group key; memory is bounded by the
    LARGEST group — for billion-row groups compute moments with a native
    agg + broadcast join instead (this query is the API demonstration)."""
    import pandas as pd

    docs = load_table(spark, sf, "documents").select("doc_id", "lang", "n_chars")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["n_chars"].astype("int64")
        n = len(x)
        sm = int(x.sum())
        sq = int((x * x).sum())
        mean = sm / n
        # float-op order mirrors the oracle exactly: double(sm) * sm / n
        sd = ((sq - float(sm) * sm / n) / n) ** 0.5
        import numpy as np

        z = np.floor((x - mean) / sd * 1000000 + 0.5) / 1000000
        return pd.DataFrame(
            {"doc_id": pdf["doc_id"], "lang": pdf["lang"], "z_chars": z}
        )

    return (
        docs.groupBy("lang")
        .applyInPandas(zscore, schema="doc_id bigint, lang string, z_chars double")
        .orderBy("doc_id")
    )


@query(
    "q233_udf_map_in_arrow",
    oracle="""
    SELECT doc_id, len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_tokens
    FROM documents ORDER BY doc_id
    """,
)
def q233(spark: SparkSession, sf: str) -> DataFrame:
    """``mapInArrow`` exemplar — the zero-copy tier below the pandas UDFs
    (q103-q105): RecordBatches stream straight from the JVM through
    pyarrow.compute kernels, no pandas materialization. Token counting via
    ``pc.count_substring_regex`` over lower-cased text (RE2, same
    char-class semantics as the engine's WORD_RE), so the output is
    integer-exact against q103's oracle. Use this tier when the Python
    work is itself Arrow-kernel-shaped (regex counts, casts, takes);
    pandas only pays off once you need its algorithms."""
    import pyarrow as pa
    import pyarrow.compute as pc

    docs = load_table(spark, sf, "documents").select("doc_id", "text")

    def count_tokens(batches):
        for batch in batches:
            n = pc.count_substring_regex(
                pc.utf8_lower(batch.column("text")), pattern="[a-z0-9]+"
            )
            yield pa.RecordBatch.from_arrays(
                [batch.column("doc_id"), pc.cast(n, pa.int64())],
                ["doc_id", "n_tokens"],
            )

    return docs.mapInArrow(
        count_tokens, schema="doc_id long, n_tokens long"
    ).orderBy("doc_id")


# ----------------------------------------------------------- EWMA ----------
@query(
    "q262_ewma_sequential_state",
    oracle="""
    WITH RECURSIVE seq AS (
        SELECT user_id, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS rn
        FROM events WHERE value IS NOT NULL
    ),
    r AS (
        SELECT user_id, event_id, rn, value AS ewma FROM seq WHERE rn = 1
        UNION ALL
        SELECT s.user_id, s.event_id, s.rn, 0.25 * s.value + 0.75 * r.ewma
        FROM r JOIN seq s ON s.user_id = r.user_id AND s.rn = r.rn + 1
    )
    SELECT user_id, event_id,
           CAST(floor(ewma * 1000000 + 0.5) AS BIGINT) AS ewma_q
    FROM r ORDER BY user_id, event_id
    """,
)
def q262(spark: SparkSession, sf: str) -> DataFrame:
    """Exponentially weighted moving average per user (alpha = 0.25) —
    the genuinely SEQUENTIAL per-key state no window frame can express
    (each output depends on the full prior chain), implemented the way a
    distributed engine must: ``applyInPandas`` with one ordered pass per
    key. The oracle is a recursive CTE computing the identical chain.

    Exactness: alpha = 0.25 and 1-alpha = 0.75 are exact binary
    fractions, and both engines evaluate the same
    ``(0.25*x) + (0.75*prev)`` float64 op sequence in the same order, so
    the chains agree bit-for-bit; output quantizes at 1e-6. Nulls are
    filtered on both sides (the q240 pinned-null-contract rule).

    Scale shape: ONE shuffle on user_id; executor memory is bounded by
    the largest single key's history (the honest constraint of any
    sequential-state op — the same bound applyInPandasWithState carries
    in streaming (q85), where this exact computation runs incrementally
    instead of over history)."""
    import numpy as np
    import pandas as pd

    ev = (
        load_table(spark, sf, "events")
        .where(F.col("value").isNotNull())
        .select("user_id", "event_id", "ts", "value")
    )

    def ewma(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        x = pdf["value"].to_numpy(dtype="float64")
        out = np.empty_like(x)
        prev = 0.0
        for i in range(len(x)):
            prev = x[i] if i == 0 else (0.25 * x[i]) + (0.75 * prev)
            out[i] = prev
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "event_id": pdf["event_id"],
                "ewma_q": np.floor(out * 1000000 + 0.5).astype("int64"),
            }
        )

    return (
        ev.groupBy("user_id")
        .applyInPandas(ewma, schema="user_id bigint, event_id bigint, ewma_q bigint")
        .orderBy("user_id", "event_id")
    )


# ------------------------------------------------ pandas-on-Spark tier ----
@query(
    "q297_pandas_api_tier",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS cents,
           CAST(MAX(o_custkey) AS BIGINT) AS max_cust
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def q297(spark: SparkSession, sf: str) -> DataFrame:
    """The pandas-API-on-Spark tier (`pyspark.pandas`) — the migration
    surface that lets a pandas codebase run distributed without a
    rewrite: the same groupby/agg written in pandas idiom, executed as a
    Catalyst plan underneath (``pandas_api()`` / ``to_spark()`` are
    zero-copy plan wrappers, NOT a driver collect — the explain output
    is an ordinary hash aggregate). Integer-cents quantization happens
    BEFORE the pandas-API boundary so the sum is exact. Kept to one
    query deliberately: the engine's native surface is the DataFrame
    API; this certifies interop, not a second implementation."""
    o = load_table(spark, sf, "orders").select(
        "o_orderstatus",
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    pdf = o.pandas_api()
    out = pdf.groupby("o_orderstatus").agg(
        n=("o_custkey", "count"),
        cents=("cents", "sum"),
        max_cust=("o_custkey", "max"),
    )
    sdf = out.reset_index().to_spark()
    return sdf.select(
        "o_orderstatus",
        F.col("n").cast("long").alias("n"),
        F.col("cents").cast("long").alias("cents"),
        F.col("max_cust").cast("long").alias("max_cust"),
    ).orderBy("o_orderstatus")


# ------------------------------------------------ clamped running balance --
@query(
    "q300_clamped_balance",
    oracle="""
    WITH RECURSIVE seq AS (
        SELECT user_id, event_id,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE -1 END
                 * CAST(floor(value * 100 + 0.5) AS BIGINT) AS delta,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS rn
        FROM events WHERE event_type IN ('purchase', 'error')
    ),
    r AS (
        SELECT user_id, event_id, rn,
               GREATEST(CAST(0 AS BIGINT), delta) AS bal
        FROM seq WHERE rn = 1
        UNION ALL
        SELECT s.user_id, s.event_id, s.rn,
               GREATEST(CAST(0 AS BIGINT), r.bal + s.delta)
        FROM r JOIN seq s ON s.user_id = r.user_id AND s.rn = r.rn + 1
    )
    SELECT user_id, event_id, bal AS balance_cents
    FROM r ORDER BY user_id, event_id
    """,
)
def q300(spark: SparkSession, sf: str) -> DataFrame:
    """Zero-clamped running balance per user (credits = purchases,
    debits = errors, balance never below zero) — inventory stock,
    prepaid credit, token-bucket rate limiting. The clamp makes the
    recurrence NON-ASSOCIATIVE: ``max(0, prev + delta)`` cannot be
    rewritten as any window aggregate over prefix sums (a windowed
    ``greatest(0, sum)`` forgets how much of a past overdraft was
    forgiven), so like q262 this is the honest sequential-state class —
    ``applyInPandas``, one ordered int64 pass per key, recursive-CTE
    oracle computing the identical chain. All-integer cents: no float
    enters at all, so cross-engine agreement is trivial. ONE user_id
    shuffle; executor memory bounds at the largest key's history, and
    the streaming form is the same fold in applyInPandasWithState."""
    import numpy as np
    import pandas as pd

    ev = (
        load_table(spark, sf, "events")
        .where(F.col("event_type").isin("purchase", "error"))
        .select(
            "user_id",
            "event_id",
            "ts",
            (
                F.when(F.col("event_type") == "purchase", 1).otherwise(-1)
                * F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
            ).alias("delta"),
        )
    )

    def clamped(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        d = pdf["delta"].to_numpy(dtype="int64")
        out = np.empty_like(d)
        bal = 0
        for i in range(len(d)):
            bal = max(0, bal + int(d[i]))
            out[i] = bal
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "event_id": pdf["event_id"],
                "balance_cents": out,
            }
        )

    return (
        ev.groupBy("user_id")
        .applyInPandas(
            clamped, schema="user_id bigint, event_id bigint, balance_cents bigint"
        )
        .orderBy("user_id", "event_id")
    )


# ----------------------------------------- cogrouped applyInPandas ----
@query(
    "q330_cogroup_pandas",
    oracle="""
    WITH o AS (
        SELECT o_custkey AS user_id,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               MAX(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                   AS max_total_cents
        FROM orders GROUP BY o_custkey
    ),
    e AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY user_id
    )
    SELECT COALESCE(o.user_id, e.user_id) AS user_id,
           COALESCE(o.n_orders, 0) AS n_orders,
           COALESCE(e.n_events, 0) AS n_events,
           o.max_total_cents
    FROM o FULL OUTER JOIN e ON e.user_id = o.user_id
    ORDER BY user_id
    """,
)
def q330(spark: SparkSession, sf: str) -> DataFrame:
    """Cogrouped ``applyInPandas`` — the last pandas-UDF API surface
    (scalar q103, grouped-agg q104, UDTF q105, grouped-map q111,
    mapInArrow q233, and now cogroup): both tables shuffle ONCE on the
    key and each (orders-group, events-group) pair lands in one Arrow
    batch, the per-key merge the join would otherwise re-shuffle to do
    (in Spark source: FlatMapCoGroupsInPandas). Exemplar is
    determinism-safe per the module contract: counts + an integer
    cents max, so the Arrow path hash-matches the batch FULL OUTER
    oracle. Keys missing from either side arrive as an empty pandas
    frame — exercised and null-checked."""
    import pandas as pd

    orders = (
        load_table(spark, sf, "orders")
        .select(
            F.col("o_custkey").alias("user_id"),
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("long")
            .alias("cents"),
        )
    )
    events = load_table(spark, sf, "events").select("user_id")

    def merge(key: tuple, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_orders": [len(left)],
                "n_events": [len(right)],
                "max_total_cents": [
                    int(left["cents"].max()) if len(left) else None
                ],
            }
        )

    out = (
        orders.groupby("user_id")
        .cogroup(events.groupby("user_id"))
        .applyInPandas(
            merge,
            schema=(
                "user_id bigint, n_orders bigint, "
                "n_events bigint, max_total_cents bigint"
            ),
        )
    )
    return out.orderBy("user_id")


# ------------------------------------------------ grouped applyInArrow ----
@query(
    "q352_apply_in_arrow",
    oracle="""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(floor(COALESCE(value, 0) * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS sum_cents,
           CAST(MAX(event_id) AS BIGINT) AS max_event_id
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def q352(spark: SparkSession, sf: str) -> DataFrame:
    """Grouped ``applyInArrow`` — the zero-copy sibling of grouped-map
    ``applyInPandas`` (q111) and the grouped counterpart of
    ``mapInArrow`` (q233), closing the Arrow-native API surface: each
    event-type group arrives as a ``pyarrow.Table`` (no pandas
    conversion, no index materialization — the fastest Python hop
    Spark offers), and the exemplar reduces it with pyarrow compute
    kernels to one summary row. Determinism-safe per the module
    contract: counts, an exact integer cent sum, and a max id, so the
    Arrow path hash-matches the plain SQL aggregate oracle. ONE
    shuffle on the group key; at 100 TB this is the escape hatch for
    group-wise Python logic that pandas overhead would dominate."""
    import pyarrow as pa
    import pyarrow.compute as pc

    ev = load_table(spark, sf, "events").select(
        "event_type",
        "event_id",
        F.floor(F.coalesce(F.col("value"), F.lit(0)) * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )

    def summarize(table: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": [table.column("event_type")[0].as_py()],
                "n": pa.array([table.num_rows], pa.int64()),
                "sum_cents": pa.array(
                    [pc.sum(table.column("cents")).as_py() or 0], pa.int64()
                ),
                "max_event_id": pa.array(
                    [pc.max(table.column("event_id")).as_py()], pa.int64()
                ),
            }
        )

    out = ev.groupBy("event_type").applyInArrow(
        summarize,
        schema=(
            "event_type string, n bigint, sum_cents bigint, "
            "max_event_id bigint"
        ),
    )
    return out.orderBy("event_type")
