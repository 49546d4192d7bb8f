"""LLM-data-pipeline extension queries (SURVEY.md §2.9 Q90-Q92 family,
expanded): dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding-cosine), similarity search (brute-force + LSH ANN), text
analysis (language ID, quality, token counts, fingerprints), multimodal
binary plumbing, and the as-of join.

Oracle policy: everything with deterministic cross-engine semantics gets a
full DuckDB oracle — including MinHash (both engines derive the same
60-bit hashes from md5 hex, so signatures match bit-for-bit). The LSH ANN
path is approximate-by-design → rows-only here, recall-tested against the
brute-force baseline in tests/test_operators.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.text import (
    LANG_STOPWORDS,
    detect_language,
    fingerprint,
    h64,
    quality_score,
    shingles,
    word_count,
    words,
)
from ..operators.asof import asof_join
from ..operators.dedup import (
    exact_dedup_groups,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from ..operators.multimodal import with_binary_payload
from ..operators.similarity import brute_force_topk, cosine_pairs, lsh_ann_topk
from .registry import query

# DuckDB fragments mirroring functions/text.py exactly
_WORDS = "regexp_extract_all(lower({c}), '[a-z0-9]+')"
_H64 = "CAST(('0x' || substr(md5({x}), 1, 15)) AS BIGINT)"


def _sql_shingles(col: str, k: int = 3) -> str:
    """Distinct word k-grams (empty list below k words) — mirrors
    text.shingles."""
    w = _WORDS.format(c=col)
    return (
        f"CASE WHEN len({w}) >= {k} THEN list_distinct("
        f"[list_aggregate(({w})[i:i+{k - 1}], 'string_agg', ' ') "
        f"for i in range(1, len({w}) - {k - 2})]) "
        f"ELSE [] END"
    )


# ------------------------------------------------------------------ dedup --
@query(
    "q90_exact_dedup",
    oracle="""
    SELECT doc_id, md5(text) AS content_hash,
           MIN(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id,
           COUNT(*) OVER (PARTITION BY md5(text)) AS group_size
    FROM documents ORDER BY doc_id
    """,
)
def q90(spark: SparkSession, sf: str) -> DataFrame:
    """Exact dedup via content-hash groups (one shuffle on md5(text))."""
    docs = load_table(spark, sf, "documents")
    return exact_dedup_groups(docs).select(
        "doc_id", "content_hash", "canonical_id", "group_size"
    ).orderBy("doc_id")


@query(
    "q91_ngram_jaccard_dedup",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id, {_sql_shingles('text')} AS sh FROM documents
    ),
    sized AS (SELECT doc_id, sh, len(sh) AS n FROM sh WHERE len(sh) > 0)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           floor(len(list_intersect(a.sh, b.sh)) * 1.0
                 / (a.n + b.n - len(list_intersect(a.sh, b.sh)))
                 * 1000000 + 0.5) / 1000000 AS jaccard
    FROM sized a JOIN sized b ON a.doc_id < b.doc_id
    WHERE floor(len(list_intersect(a.sh, b.sh)) * 1.0
                / (a.n + b.n - len(list_intersect(a.sh, b.sh)))
                * 1000000 + 0.5) / 1000000 >= 0.8
    ORDER BY doc_a, doc_b
    """,
)
def q91(spark: SparkSession, sf: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs (threshold 0.8) via the
    inverted-index join — no O(n²) pair space on the Spark side; the
    oracle brute-forces the cross join (fine at oracle scale)."""
    docs = load_table(spark, sf, "documents")
    return ngram_jaccard_pairs(docs, threshold=0.8).orderBy("doc_a", "doc_b")


def _minhash_ctes(n_perm: int = 16, band_rows: int = 4, src: str = "documents") -> str:
    """The MinHash-LSH pipeline as a CTE block (shared by the q92 pairs
    oracle, the q108 clustering oracle, and the q113 curation oracle —
    ``src`` is the (doc_id, text) relation to shingle)."""
    mins = ",\n           ".join(
        "list_min(list_transform(sh, s -> {h})) AS m{i}".format(
            h=_H64.format(x=f"'{i}:' || s"), i=i
        )
        for i in range(n_perm)
    )
    sig_list = ", ".join(f"m{i}" for i in range(n_perm))
    n_bands = n_perm // band_rows
    band_selects = "\n        UNION ALL ".join(
        "SELECT doc_id, {b} AS band, {key} AS key FROM sig".format(
            b=b,
            key=" || ',' || ".join(
                f"CAST(sig[{b * band_rows + r + 1}] AS VARCHAR)" for r in range(band_rows)
            ),
        )
        for b in range(n_bands)
    )
    return f"""sh0 AS (SELECT doc_id, {_sql_shingles('text')} AS sh FROM {src}),
    shd AS (SELECT doc_id, sh FROM sh0 WHERE len(sh) > 0),
    sigparts AS (
        SELECT doc_id, sh, {mins}
        FROM shd
    ),
    sig AS (SELECT doc_id, sh, [{sig_list}] AS sig FROM sigparts),
    bands AS (
        {band_selects}
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    ),
    verified AS (
        SELECT c.doc_a, c.doc_b,
               floor(len(list_intersect(x.sh, y.sh)) * 1.0
                     / (len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh)))
                     * 1000000 + 0.5) / 1000000 AS jaccard
        FROM cand c
        JOIN shd x ON x.doc_id = c.doc_a
        JOIN shd y ON y.doc_id = c.doc_b
    )"""


def _minhash_oracle(n_perm: int = 16, band_rows: int = 4, threshold: float = 0.8) -> str:
    return f"""
    WITH {_minhash_ctes(n_perm, band_rows)}
    SELECT doc_a, doc_b, jaccard FROM verified
    WHERE jaccard >= {threshold}
    ORDER BY doc_a, doc_b
    """


@query("q92_minhash_lsh_dedup", oracle=_minhash_oracle())
def q92(spark: SparkSession, sf: str) -> DataFrame:
    """MinHash(16 perms)+LSH(4-row bands) candidate pairs, exact-verified at
    jaccard >= 0.8. The oracle recomputes the identical salted-md5
    signatures, so the candidate sets match bit-for-bit."""
    docs = load_table(spark, sf, "documents")
    return minhash_lsh_pairs(
        docs, k=3, n_perm=16, band_rows=4, threshold=0.8
    ).orderBy("doc_a", "doc_b")


@query(
    "q108_near_dup_clusters",
    oracle=f"""
    WITH RECURSIVE {_minhash_ctes()},
    pairs AS (SELECT doc_a, doc_b FROM verified WHERE jaccard >= 0.8),
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    ),
    comp AS (
        SELECT src AS doc_id, LEAST(src, MIN(dst)) AS canonical_id
        FROM reach GROUP BY src
    ),
    labeled AS (
        SELECT d.doc_id, COALESCE(c.canonical_id, d.doc_id) AS canonical_id
        FROM documents d LEFT JOIN comp c USING (doc_id)
    )
    SELECT doc_id, canonical_id,
           COUNT(*) OVER (PARTITION BY canonical_id) AS cluster_size
    FROM labeled ORDER BY doc_id
    """,
)
def q108(spark: SparkSession, sf: str) -> DataFrame:
    """Near-dup CLUSTERS from MinHash pairs: iterative min-label
    propagation (connected components) picks the smallest doc_id as each
    cluster's canonical — the step that turns pair detection into actual
    dedup. Spark side is the distributed label-propagation loop; the
    oracle computes the same components via a recursive transitive-closure
    CTE (fine at oracle scale, unusable at 100 TB — which is the point)."""
    from pyspark.sql import Window

    from ..operators.dedup import connected_components

    docs = load_table(spark, sf, "documents")
    pairs = minhash_lsh_pairs(docs, k=3, n_perm=16, band_rows=4, threshold=0.8)
    labels = connected_components(pairs, docs)
    return (
        docs.join(labels, docs.doc_id == labels.id, "left")
        .select(
            "doc_id",
            F.coalesce("label", F.col("doc_id")).alias("canonical_id"),
        )
        .withColumn(
            "cluster_size",
            F.count(F.lit(1)).over(Window.partitionBy("canonical_id")),
        )
        .orderBy("doc_id")
    )


def _simhash_oracle(bits: int = 16) -> str:
    sums = ", ".join(
        f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}"
        for b in range(bits)
    )
    packed = " + ".join(f"CASE WHEN b{b} >= 0 THEN {2 ** b} ELSE 0 END" for b in range(bits))
    return f"""
    WITH w AS (
        SELECT doc_id, unnest(list_distinct({_WORDS.format(c='text')})) AS word
        FROM documents
    ),
    h AS (SELECT doc_id, {_H64.format(x='word')} AS h FROM w),
    votes AS (SELECT doc_id, {sums} FROM h GROUP BY doc_id)
    SELECT doc_id, CAST({packed} AS BIGINT) AS simhash FROM votes ORDER BY doc_id
    """


@query("q93_simhash", oracle=_simhash_oracle())
def q93(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash signatures (16-bit oracle variant; 64-bit in production)."""
    docs = load_table(spark, sf, "documents")
    return simhash(docs, bits=16).select("doc_id", "simhash").orderBy("doc_id")


# ------------------------------------------------------------- similarity --
@query(
    "q94_cosine_topk",
    oracle="""
    SELECT query_id, candidate_id, cos_sim, rank FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS candidate_id,
               floor(list_dot_product(CAST(q.embedding AS DOUBLE[]),
                                      CAST(c.embedding AS DOUBLE[]))
                     / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]),
                                              CAST(q.embedding AS DOUBLE[])))
                        * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]),
                                                CAST(c.embedding AS DOUBLE[]))))
                     * 1000000 + 0.5) / 1000000 AS cos_sim,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                   ORDER BY floor(list_dot_product(CAST(q.embedding AS DOUBLE[]),
                                      CAST(c.embedding AS DOUBLE[]))
                     / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]),
                                              CAST(q.embedding AS DOUBLE[])))
                        * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]),
                                                CAST(c.embedding AS DOUBLE[]))))
                     * 1000000 + 0.5) / 1000000 DESC, c.vec_id) AS rank
        FROM embeddings q JOIN embeddings c ON c.vec_id >= 10
        WHERE q.vec_id < 10)
    WHERE rank <= 5
    ORDER BY query_id, rank
    """,
)
def q94(spark: SparkSession, sf: str) -> DataFrame:
    """Brute-force top-5 cosine neighbors for the first 10 vectors against
    the rest — the exact ANN baseline."""
    emb = load_table(spark, sf, "embeddings")
    return brute_force_topk(
        emb.filter(F.col("vec_id") < 10), emb.filter(F.col("vec_id") >= 10), k=5
    ).orderBy("query_id", "rank")


@query(
    "q95_embedding_near_dup",
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           floor(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                  CAST(b.embedding AS DOUBLE[]))
                 / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                          CAST(a.embedding AS DOUBLE[])))
                    * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),
                                            CAST(b.embedding AS DOUBLE[]))))
                 * 1000000 + 0.5) / 1000000 AS cos_sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE floor(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                 CAST(b.embedding AS DOUBLE[]))
                / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                         CAST(a.embedding AS DOUBLE[])))
                   * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),
                                           CAST(b.embedding AS DOUBLE[]))))
                * 1000000 + 0.5) / 1000000 >= 0.45
    ORDER BY id_a, id_b
    """,
)
def q95(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (threshold 0.45 on this
    corpus — chosen to produce a non-trivial result set)."""
    emb = load_table(spark, sf, "embeddings")
    return cosine_pairs(emb, threshold=0.45).orderBy("id_a", "id_b")


@query("q96_ann_lsh")  # approximate by design: rows-only check; recall tested in pytest
def q96(spark: SparkSession, sf: str) -> DataFrame:
    """LSH-bucketed ANN (random hyperplanes via seeded numpy in
    mapInPandas): the 100TB-scale path for similarity search."""
    emb = load_table(spark, sf, "embeddings")
    return lsh_ann_topk(
        emb.filter(F.col("vec_id") < 10), emb.filter(F.col("vec_id") >= 10),
        dim=64, k=5, n_planes=4, n_tables=8,
    ).orderBy("query_id", "rank")


@query("q106_ann_ivf")  # approximate by design: rows-only; recall tested in pytest
def q106(spark: SparkSession, sf: str) -> DataFrame:
    """IVF ANN (sampled-centroid inverted file, equi-join on list_id):
    the second scale path for similarity search — candidate volume is the
    probed fraction (n_probe/n_lists) of the data instead of LSH's
    bucket-collision volume."""
    from ..operators.similarity import ivf_ann_topk

    emb = load_table(spark, sf, "embeddings")
    return ivf_ann_topk(
        emb.filter(F.col("vec_id") < 10), emb.filter(F.col("vec_id") >= 10),
        dim=64, k=5, n_lists=8, n_probe=3,
    ).orderBy("query_id", "rank")


# ---------------------------------------------------------- text analysis --
_STOP_SQL = {
    lg: "[" + ", ".join(f"'{w}'" for w in ws_) + "]"
    for lg, ws_ in LANG_STOPWORDS.items()
}


@query(
    "q97_langid",
    oracle=f"""
    WITH hits AS (
        SELECT doc_id, lang,
               len(list_intersect(list_distinct({_WORDS.format(c='text')}),
                                  {_STOP_SQL['de']})) AS h_de,
               len(list_intersect(list_distinct({_WORDS.format(c='text')}),
                                  {_STOP_SQL['en']})) AS h_en,
               len(list_intersect(list_distinct({_WORDS.format(c='text')}),
                                  {_STOP_SQL['es']})) AS h_es,
               len(list_intersect(list_distinct({_WORDS.format(c='text')}),
                                  {_STOP_SQL['fr']})) AS h_fr
        FROM documents
    )
    SELECT doc_id, lang AS labeled_lang,
           CASE WHEN greatest(h_de, h_en, h_es, h_fr) <= 0 THEN 'und'
                WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr THEN 'de'
                WHEN h_en >= h_es AND h_en >= h_fr THEN 'en'
                WHEN h_es >= h_fr THEN 'es'
                ELSE 'fr' END AS pred_lang
    FROM hits ORDER BY doc_id
    """,
)
def q97(spark: SparkSession, sf: str) -> DataFrame:
    """Heuristic language ID (stopword-hit argmax, deterministic
    tie-break) next to the dataset's own label."""
    docs = load_table(spark, sf, "documents")
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        detect_language("text").alias("pred_lang"),
    ).orderBy("doc_id")


@query(
    "q98_text_stats",
    oracle=f"""
    SELECT doc_id,
           len({_WORDS.format(c='text')}) AS n_words,
           len(list_distinct({_WORDS.format(c='text')})) AS n_distinct,
           len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9 ]')) AS n_tokens,
           floor(CAST(len(list_distinct({_WORDS.format(c='text')})) AS DOUBLE)
                 / len({_WORDS.format(c='text')}) * 1000000 + 0.5) / 1000000
             AS distinct_ratio,
           n_chars
    FROM documents ORDER BY doc_id
    """,
)
def q98(spark: SparkSession, sf: str) -> DataFrame:
    """Token counting: whitespace words, distinct words, BPE-ish regex
    tokens (words + punctuation marks), type/token ratio."""
    docs = load_table(spark, sf, "documents")
    w = words("text")
    toks = F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+|[^a-z0-9 ]"), 0)
    return docs.select(
        "doc_id",
        F.size(w).alias("n_words"),
        F.size(F.array_distinct(w)).alias("n_distinct"),
        F.size(toks).alias("n_tokens"),
        (
            F.floor(
                F.size(F.array_distinct(w)).cast("double") / F.size(w) * 1000000
                + F.lit(0.5)
            )
            / 1000000
        ).alias("distinct_ratio"),
        "n_chars",
    ).orderBy("doc_id")


@query(
    "q99_quality_score",
    oracle=f"""
    WITH base AS (
        SELECT doc_id,
               length(text) AS nc,
               len({_WORDS.format(c='text')}) AS nw,
               length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS alnum
        FROM documents
    )
    SELECT doc_id,
           CAST((CASE WHEN nw >= 5 AND nw <= 100000 THEN 1 ELSE 0 END
               + CASE WHEN nw > 0 AND (alnum * 10.0 / nw) >= 25
                       AND (alnum * 10.0 / nw) <= 120 THEN 1 ELSE 0 END
               + CASE WHEN nc > 0 AND (alnum * 100.0 / nc) >= 60 THEN 1 ELSE 0 END)
             AS DOUBLE) / 3 AS quality
    FROM base ORDER BY doc_id
    """,
)
def q99(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic text-quality heuristic (length / word-shape /
    alphanumeric-density votes)."""
    docs = load_table(spark, sf, "documents")
    return docs.select("doc_id", quality_score("text").alias("quality")).orderBy("doc_id")


@query(
    "q100_fingerprint",
    oracle="""
    SELECT doc_id,
           list_min([md5(substr(text, i, 8))
                     for i in range(1, greatest(length(text) - 7, 1) + 1)])
             AS fingerprint
    FROM documents ORDER BY doc_id
    """,
)
def q100(spark: SparkSession, sf: str) -> DataFrame:
    """Rolling-hash document fingerprint: min md5 over char 8-grams
    (1-sample winnowing sketch)."""
    docs = load_table(spark, sf, "documents")
    return docs.select("doc_id", fingerprint("text").alias("fingerprint")).orderBy("doc_id")


# ----------------------------------------------------- asof / multimodal  --
@query(
    "q101_asof_join",
    oracle="""
    SELECT e.event_id, CAST(e.ts AS TIMESTAMP) AS ts,
           CAST(p.ts AS TIMESTAMP) AS purchase_ts,
           epoch_us(CAST(e.ts AS TIMESTAMP)) - epoch_us(CAST(p.ts AS TIMESTAMP))
             AS gap_us
    FROM (SELECT * FROM events WHERE event_type = 'error') e
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON e.user_id = p.user_id AND p.ts <= e.ts
    ORDER BY e.event_id
    """,
)
def q101(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join: for each error event, the same user's most recent
    purchase at-or-before it (union-timeline + last IGNORE NULLS window —
    Spark has no asof builtin; DuckDB's native ASOF JOIN is the oracle)."""
    ev = load_table(spark, sf, "events")
    errors = ev.filter(F.col("event_type") == "error")
    purchases = ev.filter(F.col("event_type") == "purchase")
    joined = asof_join(errors, purchases, on="user_id", value_cols=["ts"])
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    p_us = F.unix_micros(F.col("ts_asof").cast("timestamp"))
    return joined.select(
        "event_id",
        "ts",
        F.col("ts_asof").alias("purchase_ts"),
        (ts_us - p_us).alias("gap_us"),
    ).orderBy("event_id")


@query(
    "q102_multimodal_meta",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS byte_len,
           sha256(text) AS sha256,
           lower(hex(encode(substr(text, 1, 4)))) AS magic
    FROM documents ORDER BY doc_id
    """,
)
def q102(spark: SparkSession, sf: str) -> DataFrame:
    """Multimodal binary plumbing: opaque payload column + typed metadata
    (byte length, content hash, magic prefix). The decode/feature stages
    are mapInPandas operators (operators/multimodal.py), exercised in
    tests; this query checks the binary-column semantics cross-engine."""
    docs = load_table(spark, sf, "documents")
    return with_binary_payload(docs).select(
        "doc_id", "byte_len", "sha256", "magic"
    ).orderBy("doc_id")


# ------------------------------------------------- training-data curation --
@query(
    "q109_train_eval_split",
    oracle=f"""
    WITH h AS (
        SELECT doc_id, lang, {_H64.format(x="'split:' || CAST(doc_id AS VARCHAR)")} % 100
                 AS bucket
        FROM documents
    )
    SELECT doc_id, lang, bucket,
           CASE WHEN bucket < 90 THEN 'train'
                WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split
    FROM h ORDER BY doc_id
    """,
)
def q109(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic train/val/test split (90/5/5) by salted content-key
    hash — NOT rand(): the assignment is a pure function of doc_id, so it
    is stable across runs, engines, partitionings and re-shards (the
    property a training pipeline needs so eval never leaks into train
    when data is re-processed). Changing the salt re-splits."""
    docs = load_table(spark, sf, "documents")
    bucket = h64(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))) % 100
    return docs.select(
        "doc_id",
        "lang",
        bucket.alias("bucket"),
        F.when(bucket < 90, "train")
        .when(bucket < 95, "val")
        .otherwise("test")
        .alias("split"),
    ).orderBy("doc_id")


@query(
    "q110_sequence_packing",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, lang, len({_WORDS.format(c='text')}) AS n_tokens
        FROM documents
    ),
    packed AS (
        SELECT doc_id, lang, n_tokens,
               CAST(floor((SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           - n_tokens) / 2048) AS BIGINT) AS pack_id
        FROM t
    )
    SELECT lang, pack_id, COUNT(*) AS n_docs, SUM(n_tokens) AS pack_tokens
    FROM packed GROUP BY lang, pack_id
    ORDER BY lang, pack_id
    """,
)
def q110(spark: SparkSession, sf: str) -> DataFrame:
    """Sequence packing for training batches: documents (per language, in
    deterministic doc_id order) are assigned to ~2048-token packs by
    windowed cumulative token count — pack_id = floor(tokens-before/
    budget). One shuffle (the per-lang window); the greedy first-fit of a
    single-node packer is traded for a deterministic, distributable rule
    that overflows a pack by at most one document."""
    from pyspark.sql import Window

    docs = load_table(spark, sf, "documents")
    t = docs.select("doc_id", "lang", word_count("text").alias("n_tokens"))
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = t.withColumn(
        "pack_id",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / 2048).cast("long"),
    )
    return (
        packed.groupBy("lang", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("pack_tokens"),
        )
        .orderBy("lang", "pack_id")
    )


@query(
    "q112_gap_fill",
    oracle="""
    WITH b AS (
        SELECT user_id, time_bucket(INTERVAL 5 MINUTE, CAST(ts AS TIMESTAMP)) AS slot,
               CAST(ROUND(SUM(CAST(floor(value * 10000 + 0.5) / 10000
                                   AS DECIMAL(18,4))), 2) AS DOUBLE) AS slot_value
        FROM events WHERE user_id < 5 GROUP BY 1, 2
    ),
    r AS (SELECT user_id, min(slot) AS mn, max(slot) AS mx FROM b GROUP BY 1),
    grid AS (
        SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 5 MINUTE)) AS slot
        FROM r
    ),
    j AS (SELECT g.user_id, g.slot, b.slot_value
          FROM grid g LEFT JOIN b USING (user_id, slot))
    SELECT user_id, slot, slot_value,
           LAST_VALUE(slot_value IGNORE NULLS) OVER (PARTITION BY user_id
               ORDER BY slot ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS filled
    FROM j ORDER BY user_id, slot
    """,
)
def q112(spark: SparkSession, sf: str) -> DataFrame:
    """Time-series gap-fill (resample + LOCF): dense 5-minute grid per
    user between first and last event, money-summed value per slot,
    missing slots forward-filled — Spark lacks a native gapfill, so the
    operator composes bucket-agg + sequence-explode grid + last(ignore
    nulls) window (operators/timeseries.py), all inside codegen."""
    from ..operators.timeseries import gap_fill
    from ._util import _dec4

    ev = load_table(spark, sf, "events").filter(F.col("user_id") < 5)
    agg = F.round(F.sum(_dec4(F.col("value"))), 2).cast("double")
    return gap_fill(ev, "user_id", "ts", agg, 300).orderBy("user_id", "slot")


# The q97 langid + q99 quality expressions as reusable SQL fragments for
# the curation oracle (identical text to those oracles).
def _scored_cte(src: str = "documents") -> str:
    hits = ",\n               ".join(
        f"len(list_intersect(list_distinct({_WORDS.format(c='text')}), "
        f"{_STOP_SQL[lg]})) AS h_{lg}"
        for lg in sorted(_STOP_SQL)
    )
    return f"""raw AS (
        SELECT doc_id, text,
               length(text) AS nc,
               len({_WORDS.format(c='text')}) AS nw,
               length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS alnum,
               {hits}
        FROM {src}
    ),
    scored AS (
        SELECT doc_id, text, nw AS n_tokens,
               CASE WHEN greatest(h_de, h_en, h_es, h_fr) <= 0 THEN 'und'
                    WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr THEN 'de'
                    WHEN h_en >= h_es AND h_en >= h_fr THEN 'en'
                    WHEN h_es >= h_fr THEN 'es'
                    ELSE 'fr' END AS pred_lang,
               CAST((CASE WHEN nw >= 5 AND nw <= 100000 THEN 1 ELSE 0 END
                   + CASE WHEN nw > 0 AND (alnum * 10.0 / nw) >= 25
                           AND (alnum * 10.0 / nw) <= 120 THEN 1 ELSE 0 END
                   + CASE WHEN nc > 0 AND (alnum * 100.0 / nc) >= 60 THEN 1 ELSE 0 END)
                 AS DOUBLE) / 3 AS quality
        FROM raw
    )"""


@query(
    "q113_curation_pipeline",
    oracle=f"""
    WITH RECURSIVE {_scored_cte()},
    gated AS (
        SELECT * FROM scored WHERE quality >= 0.66 AND pred_lang <> 'und'
    ),
    exact AS (
        SELECT doc_id, text, pred_lang, quality, n_tokens FROM (
            SELECT g.*, MIN(doc_id) OVER (PARTITION BY md5(text)) AS canon
            FROM gated g
        ) WHERE doc_id = canon
    ),
    {_minhash_ctes(src="exact")},
    pairs AS (SELECT doc_a, doc_b FROM verified WHERE jaccard >= 0.8),
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    ),
    comp AS (
        SELECT src AS doc_id, LEAST(src, MIN(dst)) AS canonical_id
        FROM reach GROUP BY src
    )
    SELECT e.doc_id, e.pred_lang, e.quality, e.n_tokens,
           CASE WHEN {_H64.format(x="'split:' || CAST(e.doc_id AS VARCHAR)")} % 100 < 90
                  THEN 'train'
                WHEN {_H64.format(x="'split:' || CAST(e.doc_id AS VARCHAR)")} % 100 < 95
                  THEN 'val' ELSE 'test' END AS split
    FROM exact e LEFT JOIN comp c USING (doc_id)
    WHERE COALESCE(c.canonical_id, e.doc_id) = e.doc_id
    ORDER BY e.doc_id
    """,
)
def q113(spark: SparkSession, sf: str) -> DataFrame:
    """The flagship training-data pipeline: language-ID → quality gate →
    exact dedup → MinHash near-dup cluster dedup (canonical survivors
    only) → deterministic split assignment — one lazy DataFrame flow
    (operators/curation.py) with cheap columnar gates ahead of the
    shuffling dedup stages. The oracle composes the same stages from the
    q97/q99/q92/q108/q109 fragments."""
    from ..operators.curation import curate

    docs = load_table(spark, sf, "documents")
    return curate(docs).orderBy("doc_id")


@query(
    "q114_incremental_dedup",
    oracle=f"""
    WITH RECURSIVE corpus AS (
        SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 0
    ),
    batch AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0),
    newx AS (
        SELECT b.* FROM batch b
        WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE md5(c.text) = md5(b.text))
    ),
    bexact AS (
        SELECT doc_id, text FROM (
            SELECT n.*, MIN(doc_id) OVER (PARTITION BY md5(text)) AS canon
            FROM newx n
        ) WHERE doc_id = canon
    ),
    un AS (SELECT * FROM corpus UNION ALL SELECT * FROM bexact),
    {_minhash_ctes(src="un")},
    pairs AS (SELECT doc_a, doc_b FROM verified WHERE jaccard >= 0.8),
    drop1 AS (
        SELECT DISTINCT CASE WHEN doc_a % 5 = 0 THEN doc_a ELSE doc_b END AS doc_id
        FROM pairs WHERE (doc_a % 5 = 0) <> (doc_b % 5 = 0)
    ),
    kept AS (
        SELECT * FROM bexact WHERE doc_id NOT IN (SELECT doc_id FROM drop1)
    ),
    bpairs AS (
        SELECT doc_a, doc_b FROM pairs
        WHERE doc_a % 5 = 0 AND doc_b % 5 = 0
          AND doc_a IN (SELECT doc_id FROM kept)
          AND doc_b IN (SELECT doc_id FROM kept)
    ),
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM bpairs
        UNION SELECT doc_b, doc_a FROM bpairs
    ),
    reach(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    ),
    comp AS (
        SELECT src AS doc_id, LEAST(src, MIN(dst)) AS canonical_id
        FROM reach GROUP BY src
    )
    SELECT k.doc_id FROM kept k LEFT JOIN comp c USING (doc_id)
    WHERE COALESCE(c.canonical_id, k.doc_id) = k.doc_id
    ORDER BY k.doc_id
    """,
)
def q114(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental dedup: a new batch (doc_id % 5 = 0) deduped against the
    standing corpus (the rest) — exact-hash anti-join, within-batch exact
    canonical, MinHash cross-check vs corpus, then within-batch clustering.
    History is never re-deduped; cost is O(batch + corpus-probe), the only
    shape that works for a daily increment on a 100 TB corpus."""
    from ..operators.dedup import incremental_dedup

    docs = load_table(spark, sf, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    return incremental_dedup(batch, corpus).select("doc_id").orderBy("doc_id")


@query(
    "q115_stratified_sample",
    oracle=f"""
    WITH rates(lang, keep_per_mille) AS (
        VALUES ('en', 200), ('de', 500), ('fr', 500), ('es', 800), ('und', 0)
    )
    SELECT d.doc_id, d.lang
    FROM documents d JOIN rates r ON r.lang = d.lang
    WHERE {_H64.format(x="'sample:' || CAST(d.doc_id AS VARCHAR)")} % 1000
            < r.keep_per_mille
    ORDER BY d.doc_id
    """,
)
def q115(spark: SparkSession, sf: str) -> DataFrame:
    """Stratified downsampling with per-stratum rates (corpus rebalancing:
    keep 20% of English, 50% of German/French, 80% of Spanish) —
    deterministic hash gate per doc, NOT sampleBy/rand(): membership is a
    pure function of doc_id, so reprocessing or resharding the corpus
    yields the identical sample (and the join against the rates dim is a
    broadcast)."""
    rates = spark.createDataFrame(
        [("en", 200), ("de", 500), ("fr", 500), ("es", 800), ("und", 0)],
        "lang string, keep_per_mille int",
    )
    docs = load_table(spark, sf, "documents")
    gate = h64(F.concat(F.lit("sample:"), F.col("doc_id").cast("string"))) % 1000
    return (
        docs.join(F.broadcast(rates), "lang")
        .filter(gate < F.col("keep_per_mille"))
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


@query(
    "q116_corpus_report",
    oracle=f"""
    WITH RECURSIVE {_scored_cte()},
    gated AS (
        SELECT * FROM scored WHERE quality >= 0.66 AND pred_lang <> 'und'
    ),
    exact AS (
        SELECT doc_id, text, pred_lang, quality, n_tokens FROM (
            SELECT g.*, MIN(doc_id) OVER (PARTITION BY md5(text)) AS canon
            FROM gated g
        ) WHERE doc_id = canon
    ),
    {_minhash_ctes(src="exact")},
    pairs AS (SELECT doc_a, doc_b FROM verified WHERE jaccard >= 0.8),
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs
    ),
    reach(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    ),
    comp AS (
        SELECT src AS doc_id, LEAST(src, MIN(dst)) AS canonical_id
        FROM reach GROUP BY src
    ),
    curated AS (
        SELECT e.doc_id, e.pred_lang, e.n_tokens,
               CASE WHEN {_H64.format(x="'split:' || CAST(e.doc_id AS VARCHAR)")} % 100 < 90
                      THEN 'train'
                    WHEN {_H64.format(x="'split:' || CAST(e.doc_id AS VARCHAR)")} % 100 < 95
                      THEN 'val' ELSE 'test' END AS split
        FROM exact e LEFT JOIN comp c USING (doc_id)
        WHERE COALESCE(c.canonical_id, e.doc_id) = e.doc_id
    )
    SELECT pred_lang, split,
           GROUPING(pred_lang) * 2 + GROUPING(split) AS grp,
           COUNT(*) AS n_docs, SUM(n_tokens) AS total_tokens
    FROM curated
    GROUP BY ROLLUP(pred_lang, split)
    ORDER BY grp, pred_lang NULLS LAST, split NULLS LAST
    """,
)
def q116(spark: SparkSession, sf: str) -> DataFrame:
    """The corpus report: token/document counts by language × split with
    rollup subtotals over the CURATED corpus (q113's output) — the
    dashboard aggregation a data team runs after every curation pass;
    demonstrates operator composition (curation flow feeding a multi-level
    aggregate) as one lazy plan."""
    from ..operators.curation import curate

    cur = curate(load_table(spark, sf, "documents"))
    return (
        cur.rollup("pred_lang", "split")
        .agg(
            F.grouping_id().alias("grp"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .select("pred_lang", "split", "grp", "n_docs", "total_tokens")
        .orderBy(
            "grp",
            F.col("pred_lang").asc_nulls_last(),
            F.col("split").asc_nulls_last(),
        )
    )


@query(
    "q123_window_distinct_count",
    oracle="""
    WITH e AS (
        SELECT event_id, user_id, event_type,
               CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec
        FROM events)
    SELECT e.event_id, e.user_id,
           (SELECT COUNT(DISTINCT e2.event_type) FROM e e2
            WHERE e2.user_id = e.user_id
              AND e2.sec BETWEEN e.sec - 3600 AND e.sec) AS types_1h
    FROM e ORDER BY event_id
    """,
)
def q123(spark: SparkSession, sf: str) -> DataFrame:
    """Distinct count over a trailing time window: per event, how many
    distinct event types the user produced in the preceding hour.

    Spark windows cannot take COUNT(DISTINCT); the scalable construction is
    ``size(collect_set(...))`` over a time-RANGE frame — per-key state is
    bounded by the window's distinct values (here: a handful of type
    strings), not its row count, and it rides the same single
    (user, time-order) shuffle every other per-user window uses. The
    oracle brute-forces a correlated subquery (fine at oracle scale)."""
    ev = load_table(spark, sf, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").cast("timestamp").cast("long"))
        .rangeBetween(-3600, W.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.size(F.collect_set("event_type").over(w)).alias("types_1h"),
    ).orderBy("event_id")


@query(
    "q124_token_topk",
    oracle="""
    SELECT t.token, COUNT(*) AS n
    FROM documents d,
         UNNEST(regexp_extract_all(lower(d.text), '[A-Za-z0-9]+', 0)) AS t(token)
    GROUP BY t.token
    ORDER BY n DESC, t.token LIMIT 20
    """,
)
def q124(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus-wide token frequency top-20 — the canonical 100 TB wordcount.

    explode(words) → groupBy(token) compiles to partial+final HashAggregate:
    the shuffle carries one row per (map task, token) — vocabulary-sized,
    not corpus-sized. The global top-20 is a TakeOrderedAndProject (per
    -partition heap + driver merge of 20-row heads), never a full sort.
    Ties at the cut line break by token text, so the result set is exact
    and deterministic in both engines."""
    docs = load_table(spark, sf, "documents")
    return (
        docs.select(F.explode(words("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(20)
    )


@query(
    "q126_scd2_merge",
    oracle="""
    WITH dim AS (
        SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
               DATE '2020-01-01' AS valid_from, CAST(NULL AS DATE) AS valid_to
        FROM customer),
    chg AS (
        SELECT c_custkey, c_name, c_nationkey, c_acctbal + 100.0 AS c_acctbal,
               'MOVED' AS c_mktsegment, DATE '2024-06-01' AS eff
        FROM customer WHERE c_custkey % 7 = 0)
    SELECT d.c_custkey, d.c_name, d.c_nationkey, d.c_acctbal, d.c_mktsegment,
           d.valid_from,
           CASE WHEN d.c_custkey % 7 = 0 THEN DATE '2024-06-01' END AS valid_to
    FROM dim d
    UNION ALL
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment, eff, NULL
    FROM chg
    ORDER BY c_custkey, valid_from
    """,
)
def q126(spark: SparkSession, sf: str) -> DataFrame:
    """SCD Type-2 MERGE (`operators/merge.py`): a change batch (every 7th
    customer moves segment and gains balance) applied to a versioned
    customer dimension — open versions closed at the effective date, new
    open versions appended, history immutable. Two broadcast joins + a
    union; the dimension is scanned once with zero shuffle. This is the
    MERGE INTO decomposition for engines without a transactional table
    format."""
    from ..operators.merge import scd2_merge

    cust = load_table(spark, sf, "customer")
    dim = cust.withColumn("valid_from", F.to_date(F.lit("2020-01-01"))).withColumn(
        "valid_to", F.lit(None).cast("date")
    )
    changes = (
        cust.where(F.col("c_custkey") % 7 == 0)
        .withColumn("c_acctbal", F.col("c_acctbal") + 100.0)
        .withColumn("c_mktsegment", F.lit("MOVED"))
        .withColumn("effective_date", F.to_date(F.lit("2024-06-01")))
    )
    return scd2_merge(dim, changes, key="c_custkey").orderBy(
        "c_custkey", "valid_from"
    )
