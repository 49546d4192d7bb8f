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

from ..materialize import materialize
from ..sizing import expansion_partitions
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
    ngram_containment_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_pairs,
)
from ..operators.multimodal import with_binary_payload
from ..operators.similarity import (
    brute_force_topk,
    cosine_pairs,
    cosine_pairs_lsh,
    lsh_ann_topk,
)
from ._util import literal_frame
from .registry import query

# DuckDB fragments mirroring functions/text.py exactly
_WORDS = "regexp_extract_all(lower({c}), '[a-z0-9]+')"
_H64 = "CAST(('0x' || substr(md5({x}), 1, 15)) AS BIGINT)"
_H32 = "CAST(('0x' || substr(md5({x}), 1, 8)) AS BIGINT)"


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


# Brute-force exact-Jaccard oracle — shared by q91 (inverted-index plan)
# and q243 (prefix-filtered plan, plans/training_data.py): both must land
# on the identical pair set.
JACCARD_PAIRS_ORACLE = f"""
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
    """


@query("q91_ngram_jaccard_dedup", oracle=JACCARD_PAIRS_ORACLE)
def q91(spark: SparkSession, sf: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs (threshold 0.8) via the
    inverted-index join — no O(n²) pair space on the Spark side; the
    oracle brute-forces the cross join (fine at oracle scale)."""
    docs = load_table(spark, sf, "documents")
    return ngram_jaccard_pairs(docs, threshold=0.8).orderBy("doc_a", "doc_b")


@query(
    "q256_ngram_containment",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id, {_sql_shingles('text')} AS sh FROM documents
    ),
    sized AS (SELECT doc_id, sh, len(sh) AS n FROM sh WHERE len(sh) > 0),
    pairs AS (
        SELECT a.doc_id AS id_lo, b.doc_id AS id_hi, a.n AS n_lo, b.n AS n_hi,
               len(list_intersect(a.sh, b.sh)) AS inter
        FROM sized a JOIN sized b ON a.doc_id < b.doc_id
        WHERE len(list_intersect(a.sh, b.sh)) > 0
    ),
    directed AS (
        SELECT id_lo AS doc_small, id_hi AS doc_big,
               floor(inter * 1.0 / n_lo * 1000000 + 0.5) / 1000000 AS containment
        FROM pairs
        UNION ALL
        SELECT id_hi, id_lo,
               floor(inter * 1.0 / n_hi * 1000000 + 0.5) / 1000000
        FROM pairs
    )
    SELECT doc_small, doc_big, containment FROM directed
    WHERE containment >= 0.7 ORDER BY doc_small, doc_big
    """,
)
def q256(spark: SparkSession, sf: str) -> DataFrame:
    """Directed n-gram CONTAINMENT near-dup pairs (threshold 0.7) —
    the asymmetric relation Jaccard misses: a short document quoted
    inside a long one has tiny Jaccard (union dominated by the long
    side) but containment ≈ 1; this is the sub-document duplication
    (quoted posts, syndicated bodies, boilerplate wrappers) a training
    corpus dedup pass must catch. Same inverted shingle-index equi-join
    plan as q91 (one hash shuffle, no O(n²) stage); the oracle
    brute-forces the pair space (fine at oracle scale)."""
    docs = load_table(spark, sf, "documents")
    return ngram_containment_pairs(docs, threshold=0.7).orderBy(
        "doc_small", "doc_big"
    )


def _minhash_ctes(n_perm: int = 16, band_rows: int = 4, src: str = "documents") -> str:
    """The MinHash-LSH pipeline as a CTE block (shared by the q92 pairs
    oracle, the q108 clustering oracle, and the q113 curation oracle —
    ``src`` is the (doc_id, text) relation to shingle). Mirrors the affine
    one-base-hash construction (functions/text.py:minhash_consts) the
    Spark side computes via explode + grouped min."""
    from ..functions.text import MINHASH_P, minhash_consts

    base = f"({_H32.format(x='s')} % {MINHASH_P})"
    mins = ",\n           ".join(
        "list_min(list_transform(sh, s -> ({a} * {base} + {b}) % {p})) AS m{i}".format(
            a=minhash_consts(i)[0], b=minhash_consts(i)[1], base=base,
            p=MINHASH_P, i=i,
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


def _clusters_oracle() -> str:
    """Near-dup clusters via recursive transitive closure — shared by q108
    (label-propagation CC) and q223 (large-star/small-star CC): both Spark
    algorithms must land on the identical component labeling."""
    return f"""
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
    """


@query("q108_near_dup_clusters", oracle=_clusters_oracle())
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
# Exact brute-force top-5 cosine for the 10 query vectors — the shared
# oracle for q94 (brute force) and the exhaustive-config ANN certifications
# q253/q254 (ANN machinery dialed so the approximation is lossless).
_BRUTE_TOPK_ORACLE = """
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
"""


@query("q94_cosine_topk", oracle=_BRUTE_TOPK_ORACLE)
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


@query("q228_ann_ivf_pq")  # approximate by design: rows-only; equality-to-IVF + recall pytest
def q228(spark: SparkSession, sf: str) -> DataFrame:
    """IVF-PQ ANN (operators/similarity.py:ivf_pq_ann_topk): the
    compressed third scale path — coarse inverted-file probing as q106,
    candidates scored from 8 PQ code bytes via ADC lookup tables, ADC
    top-4k exact-rescored from re-fetched true vectors. At 100 TB the
    probed exchange ships ints instead of dim floats (~16x lighter);
    correctness pinned by the near-lossless-equals-IVF pytest."""
    from ..operators.similarity import ivf_pq_ann_topk

    emb = load_table(spark, sf, "embeddings")
    return ivf_pq_ann_topk(
        emb.filter(F.col("vec_id") < 10), emb.filter(F.col("vec_id") >= 10),
        dim=64, k=5, n_lists=8, n_probe=3, m_sub=8, n_codes=16, refine=8,
    ).orderBy("query_id", "rank")


@query("q253_ann_ivf_exhaustive", oracle=_BRUTE_TOPK_ORACLE)
def q253(spark: SparkSession, sf: str) -> DataFrame:
    """IVF ANN at the exhaustive configuration (``n_probe = n_lists``):
    every query probes every inverted list, so the candidate equi-join
    covers the full candidate set and the exact cosine re-rank reduces to
    brute force — the SAME training/assignment/equi-join machinery as
    q106, certified against the exact q94 oracle. This converts the
    rows-only check on the approximate path into a hash-verified row:
    if the IVF plumbing dropped, duplicated, or mis-scored a candidate,
    the exhaustive config would diverge from brute force and fail here."""
    from ..operators.similarity import ivf_ann_topk

    emb = load_table(spark, sf, "embeddings")
    return ivf_ann_topk(
        emb.filter(F.col("vec_id") < 10), emb.filter(F.col("vec_id") >= 10),
        dim=64, k=5, n_lists=8, n_probe=8,
    ).orderBy("query_id", "rank")


@query("q254_ann_ivf_pq_exhaustive", oracle=_BRUTE_TOPK_ORACLE)
def q254(spark: SparkSession, sf: str) -> DataFrame:
    """IVF-PQ ANN at the exhaustive configuration: ``n_probe = n_lists``
    (all lists probed) and ``refine*k`` ≥ the candidate count (every ADC
    shortlist covers all candidates, so the exact-refine stage rescoring
    true vectors reduces to brute force regardless of PQ quantization
    error). Certifies the full encode → ADC lookup → shortlist → refine
    machinery against the exact q94 oracle. refine=400 covers ≤ 2000
    candidates — the registered-test-scale bound (sf ≤ 0.1; at larger SF
    this config is NOT exhaustive and the q228 recall contract applies)."""
    from ..operators.similarity import ivf_pq_ann_topk

    emb = load_table(spark, sf, "embeddings")
    return ivf_pq_ann_topk(
        emb.filter(F.col("vec_id") < 10), emb.filter(F.col("vec_id") >= 10),
        dim=64, k=5, n_lists=8, n_probe=8, m_sub=8, n_codes=16, refine=400,
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
    SELECT lang, pack_id, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
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
    rates = literal_frame(
        spark,
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
           COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
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


def _zorder_sql_terms(x: str, y: str, nbits: int) -> str:
    """Morton-interleave SQL expression shared by both engines' dialects."""
    terms = []
    for i in range(nbits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


@query(
    "q138_zorder_key",
    oracle=f"""
    SELECT p_partkey, x, y, {_zorder_sql_terms("x", "y", 6)} AS zkey
    FROM (SELECT p_partkey, p_size AS x,
                 CAST(floor((p_retailprice - 900) / 2) AS INT) AS y
          FROM part)
    ORDER BY zkey, p_partkey
    """,
)
def q138(spark: SparkSession, sf: str) -> DataFrame:
    """Z-order (Morton) clustering key: interleave the bits of two
    dimension columns so a single sort co-locates rows that are close in
    BOTH dimensions.

    This is the data-layout operator behind multi-dimensional file
    clustering (Delta/Iceberg OPTIMIZE ZORDER): writing 100 TB sorted by
    zkey means a range predicate on EITHER x or y prunes most files,
    where a lexicographic (x, y) sort only prunes on x. The key is pure
    integer bit arithmetic (shift/mask/or) — whole-stage codegen, no UDF;
    the sort itself is the same range-partitioned exchange as any ORDER
    BY. 6 bits per dimension here; widen to 21+21 bits for real keys."""
    p = load_table(spark, sf, "part").select(
        "p_partkey",
        F.col("p_size").alias("x"),
        F.floor((F.col("p_retailprice") - 900) / 2).cast("int").alias("y"),
    )
    zkey = F.lit(0)
    for i in range(6):
        zkey = zkey + F.shiftleft(F.shiftright(F.col("x"), i).bitwiseAND(F.lit(1)), 2 * i)
        zkey = zkey + F.shiftleft(F.shiftright(F.col("y"), i).bitwiseAND(F.lit(1)), 2 * i + 1)
    return p.select("p_partkey", "x", "y", zkey.alias("zkey")).orderBy(
        "zkey", "p_partkey"
    )


@query(
    "q139_quality_report",
    oracle="""
    WITH rowv AS (
        SELECT
            COUNT(*) FILTER (WHERE c_name IS NULL) AS customer_name_nonnull,
            COUNT(*) FILTER (WHERE c_mktsegment NOT IN
                ('BUILDING','MACHINERY','AUTOMOBILE','HOUSEHOLD','FURNITURE'))
                AS customer_segment_accepted,
            COUNT(*) FILTER (WHERE c_acctbal < -1000 OR c_acctbal > 100000)
                AS customer_acctbal_range
        FROM customer),
    uniq AS (
        SELECT COUNT(*) AS v FROM (
            SELECT c_custkey FROM customer
            GROUP BY c_custkey HAVING COUNT(*) > 1)),
    ri AS (
        SELECT COUNT(*) AS v FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey))
    SELECT check_name, violations, violations = 0 AS passed FROM (
        SELECT 'customer_name_nonnull' AS check_name,
               customer_name_nonnull AS violations FROM rowv
        UNION ALL
        SELECT 'customer_segment_accepted', customer_segment_accepted FROM rowv
        UNION ALL
        SELECT 'customer_acctbal_range', customer_acctbal_range FROM rowv
        UNION ALL
        SELECT 'customer_key_unique', v FROM uniq
        UNION ALL
        SELECT 'orders_customer_ri', v FROM ri)
    ORDER BY check_name
    """,
)
def q139(spark: SparkSession, sf: str) -> DataFrame:
    """Data-quality expectations suite (operators/quality.py): row-level
    checks fused into ONE scan, plus uniqueness and referential-integrity
    checks, unioned into a (check_name, violations, passed) report.

    Generalizes the reference's two ad-hoc DQ gates (pyspark.py:22-39,
    covered by q73) into a declarative engine. The three row checks cost
    a single map-side aggregate pass regardless of how many predicates
    are registered; the RI anti-join broadcasts the customer keys."""
    from ..operators.quality import (
        fused_row_checks,
        quality_report,
        ri_check,
        unique_check,
    )

    cust = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders")
    segs = ["BUILDING", "MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "FURNITURE"]
    rowp = fused_row_checks(
        cust,
        {
            "customer_name_nonnull": F.col("c_name").isNull(),
            "customer_segment_accepted": ~F.col("c_mktsegment").isin(segs),
            "customer_acctbal_range": (F.col("c_acctbal") < -1000)
            | (F.col("c_acctbal") > 100000),
        },
    )
    return quality_report(
        [
            rowp,
            unique_check(cust, "customer_key_unique", ["c_custkey"]),
            ri_check(orders, cust, "o_custkey", "c_custkey", "orders_customer_ri"),
        ]
    )


@query(
    "q145_deterministic_reservoir",
    oracle=f"""
    SELECT c_nationkey, c_custkey, rk FROM (
        SELECT c_nationkey, c_custkey,
               ROW_NUMBER() OVER (PARTITION BY c_nationkey
                    ORDER BY {_H64.format(x="'rsv:' || CAST(c_custkey AS VARCHAR)")},
                             c_custkey) AS rk
        FROM customer)
    WHERE rk <= 3 ORDER BY c_nationkey, rk
    """,
)
def q145(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic per-group 'reservoir' sample: k rows per group chosen
    by ranking a salted hash of the row key — a uniform-ish draw that is
    REPLAYABLE (same rows every run, any partitioning, any engine).

    rand()-based sampling can't be oracle-checked and changes under
    retries/speculation; hash-gating is how the curation pipeline draws
    all its samples (q109/q115). One shuffle on the group key; the
    hash-rank window keeps only k rows per group, so the output is tiny
    regardless of input scale. For very hot groups, pre-filter with
    ``h64 % m < m·(k·fudge/|group|)`` before the window to avoid sorting
    the full group."""
    c = load_table(spark, sf, "customer")
    hv = h64(F.concat(F.lit("rsv:"), F.col("c_custkey").cast("string")))
    w = W.partitionBy("c_nationkey").orderBy(hv, "c_custkey")
    return (
        c.select("c_nationkey", "c_custkey", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 3)
        .orderBy("c_nationkey", "rk")
    )


@query(
    "q146_salted_agg_equivalence",
    oracle="""
    SELECT l_returnflag,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def q146(spark: SparkSession, sf: str) -> DataFrame:
    """Skew-mitigation correctness proof: revenue per return flag computed
    through the SALTED two-stage aggregation (operators/skew.py
    salted_sum), hash-checked against the plain one-stage oracle.

    l_returnflag has 3 values — at 100 TB that is the worst-case skewed
    aggregation (3 reducers own everything). The salted path spreads each
    flag over 16 sub-groups, then regroups 48 exact decimal partials.
    The oracle is the PLAIN group-by: passing the gate proves salting is
    algebraically invisible, which is the property that makes it safe to
    turn on for any hot-key sum."""
    from ._util import _dec4
    from ..operators.skew import salted_sum

    li = load_table(spark, sf, "lineitem")
    rev = _dec4(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    sid = F.concat(
        F.col("l_orderkey").cast("string"),
        F.lit(":"),
        F.col("l_linenumber").cast("string"),
    )
    out = salted_sum(li, ["l_returnflag"], rev, sid, "rev_exact", n_salts=16)
    return out.select(
        "l_returnflag",
        F.round(F.col("rev_exact"), 2).cast("double").alias("revenue"),
    ).orderBy("l_returnflag")


@query(
    "q147_funnel",
    oracle="""
    WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
               WHERE event_type = 'view' GROUP BY user_id),
         c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
               JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
               WHERE e.event_type = 'click' GROUP BY e.user_id),
         p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
               JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
               WHERE e.event_type = 'purchase' GROUP BY e.user_id)
    SELECT step, users FROM (
        SELECT 'step1_view' AS step, COUNT(*) AS users FROM v
        UNION ALL SELECT 'step2_click', COUNT(*) FROM c
        UNION ALL SELECT 'step3_purchase', COUNT(*) FROM p)
    ORDER BY step
    """,
)
def q147(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered funnel: users who viewed, then clicked AFTER the first
    view, then purchased AFTER the first qualifying click.

    Each stage is a per-user min-timestamp aggregate joined to the next
    event type with a strict time predicate — all shuffles are on
    user_id, so AQE reuses one partitioning across the chain; stage
    outputs shrink monotonically (classic funnel), so later joins get
    cheaper, and the per-user state is one timestamp, never the event
    list. The event-sequence alternative (collect_list + UDF) would haul
    every event into a group buffer — this formulation is the 100 TB
    shape."""
    ev = load_table(spark, sf, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    counts = [
        v.agg(F.lit("step1_view").alias("step"), F.count(F.lit(1)).alias("users")),
        c.agg(F.lit("step2_click").alias("step"), F.count(F.lit(1)).alias("users")),
        p.agg(F.lit("step3_purchase").alias("step"), F.count(F.lit(1)).alias("users")),
    ]
    out = counts[0]
    for part in counts[1:]:
        out = out.unionByName(part)
    return out.orderBy("step")


@query(
    "q148_retention_cohorts",
    oracle="""
    WITH f AS (SELECT user_id,
                      CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
               FROM events GROUP BY user_id),
         a AS (SELECT DISTINCT user_id,
                      CAST(date_trunc('week', ts) AS DATE) AS wk
               FROM events)
    SELECT cohort_week,
           CAST(floor(datediff('day', cohort_week, wk) / 7.0) AS INT) AS week_n,
           COUNT(*) AS users
    FROM a JOIN f USING (user_id)
    GROUP BY cohort_week, week_n ORDER BY cohort_week, week_n
    """,
)
def q148(spark: SparkSession, sf: str) -> DataFrame:
    """Retention cohort triangle: users grouped by first-activity week,
    counted in each subsequent active week.

    Both inputs reduce BEFORE the join: first-seen week per user (one
    min) and the distinct (user, week) activity set — so the join moves
    |users| + |user-weeks| rows, not raw events, and shares the user_id
    partitioning. ``COUNT(*)`` suffices after the join because the
    activity side is already distinct per (user, week) — a COUNT(DISTINCT)
    there would re-do dedup work the plan has already paid for."""
    ev = load_table(spark, sf, "events")
    f = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    a = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("wk")
    ).distinct()
    week_n = F.floor(F.datediff(F.col("wk"), F.col("cohort_week")) / 7.0).cast("int")
    return (
        a.join(f, "user_id")
        .groupBy("cohort_week", week_n.alias("week_n"))
        .agg(F.count(F.lit(1)).alias("users"))
        .orderBy("cohort_week", "week_n")
    )


@query(
    "q150_posexplode_tokens",
    oracle=f"""
    SELECT s.doc_id, u.i - 1 AS pos, s.toks[u.i] AS tok
    FROM (SELECT doc_id, {_WORDS.format(c='text')} AS toks FROM documents) s,
         unnest(generate_series(1, len(s.toks))) AS u(i)
    ORDER BY doc_id, pos
    """,
)
def q150(spark: SparkSession, sf: str) -> DataFrame:
    """posexplode: flatten the token array WITH its 0-based position —
    the tokenize step every sequence pipeline starts from (position is
    what lets downstream packing/windowing reconstruct order after the
    shuffle; see q110 sequence packing).

    Generates |tokens| rows from |docs| rows map-side — no shuffle at
    all until the final presentation sort; at 100 TB you'd keep it
    unsorted and let the consumer partition by doc_id. DuckDB lacks WITH
    ORDINALITY, so the oracle reconstructs positions by unnesting an
    index series and 1-based-subscripting the array — same relation."""
    d = load_table(spark, sf, "documents")
    return (
        d.select("doc_id", F.posexplode(words(F.col("text"))).alias("pos", "tok"))
        .orderBy("doc_id", "pos")
    )


@query(
    "q153_merge_intervals",
    oracle="""
    WITH iv AS (
        SELECT user_id, event_id,
               epoch_us(ts) AS s,
               epoch_us(ts) + (CAST(floor(value) AS BIGINT) + 1) * 60000000
                   AS e
        FROM events),
    flagged AS (
        SELECT user_id, s, e,
               CASE WHEN MAX(e) OVER (PARTITION BY user_id ORDER BY s, e, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                         IS NULL
                    OR s > MAX(e) OVER (PARTITION BY user_id ORDER BY s, e, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    THEN 1 ELSE 0 END AS new_island
        FROM iv),
    islands AS (
        SELECT user_id, s, e,
               SUM(new_island) OVER (PARTITION BY user_id ORDER BY s, e
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        FROM flagged),
    merged AS (
        SELECT user_id, island, MIN(s) AS lo, MAX(e) AS hi
        FROM islands GROUP BY user_id, island)
    SELECT user_id, COUNT(*) AS n_islands,
           CAST(SUM(hi - lo) AS BIGINT) AS covered_us
    FROM merged GROUP BY user_id ORDER BY user_id
    """,
)
def q153(spark: SparkSession, sf: str) -> DataFrame:
    """Overlapping-interval merge (gaps-and-islands): per user, events
    become [start, start + (floor(value)+1) minutes] intervals; touching/
    overlapping intervals merge, and we report island count + total
    covered microseconds.

    The merge is the cumulative-max trick: an interval starts a new
    island iff its start exceeds the max end seen so far; a running sum
    of that flag numbers the islands. Everything is bigint epoch-micros
    arithmetic over ONE shuffle on user_id (every window and both
    aggregates share the partitioning), ties broken by a total order —
    the distributed form of the classic sort-and-sweep, with per-user
    state bounded by one row. Generalizes q117's gap-only sessionize to
    arbitrary-length intervals."""
    ev = load_table(spark, sf, "events")
    iv = ev.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("s"),
        ((F.floor(F.col("value")).cast("long") + 1) * 60_000_000).alias("dur"),
    ).select("user_id", "event_id", "s", (F.col("s") + F.col("dur")).alias("e"))
    wprev = (
        W.partitionBy("user_id")
        .orderBy("s", "e", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    wrun = (
        W.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    prev_max = F.max("e").over(wprev)
    flagged = iv.select(
        "user_id",
        "s",
        "e",
        F.when(prev_max.isNull() | (F.col("s") > prev_max), 1)
        .otherwise(0)
        .alias("new_island"),
    )
    islands = flagged.select(
        "user_id", "s", "e", F.sum("new_island").over(wrun).alias("island")
    )
    merged = islands.groupBy("user_id", "island").agg(
        F.min("s").alias("lo"), F.max("e").alias("hi")
    )
    return (
        merged.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_islands"),
            F.sum(F.col("hi") - F.col("lo")).alias("covered_us"),
        )
        .orderBy("user_id")
    )


@query(
    "q154_time_weighted_avg",
    oracle="""
    WITH seq AS (
        SELECT user_id,
               CAST(floor(value * 100 + 0.5) AS BIGINT) AS v_cents,
               epoch_us(ts) AS s,
               LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) AS nxt
        FROM events)
    SELECT user_id,
           CAST(SUM(nxt - s) AS BIGINT) AS total_dur_us,
           floor(SUM(v_cents * (nxt - s))
                 / (100.0 * SUM(nxt - s)) * 1e6 + 0.5) / 1e6 AS twa
    FROM seq WHERE nxt IS NOT NULL
    GROUP BY user_id ORDER BY user_id
    """,
)
def q154(spark: SparkSession, sf: str) -> DataFrame:
    """Time-weighted average (IoT/finance): each reading holds until the
    next one, so its weight is the duration it was current; the average
    is sum(value·dur)/sum(dur), last open reading excluded.

    Determinism at scale: the float value is scaled to integer cents and
    the duration is integer microseconds, so the big SUMs are exact
    bigint arithmetic in any partition order; one float division at the
    end. One shuffle on user_id covers the LEAD window and the aggregate.
    This is the step-function integral every sensor-rollup pipeline
    computes — the naive avg(value) is wrong whenever sampling is
    irregular."""
    from ._util import round_det

    ev = load_table(spark, sf, "events")
    # s == epoch micros of ts (oracle orders by ts): same total order
    w = W.partitionBy("user_id").orderBy("s", "event_id")
    seq = ev.select(
        "user_id",
        "event_id",
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("v_cents"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("s"),
    ).withColumn("nxt", F.lead("s").over(w))
    dur = F.col("nxt") - F.col("s")
    agg = (
        seq.filter(F.col("nxt").isNotNull())
        .groupBy("user_id")
        .agg(
            F.sum(dur).alias("total_dur_us"),
            F.sum(F.col("v_cents") * dur).alias("ws"),
        )
    )
    return agg.select(
        "user_id",
        "total_dur_us",
        round_det(F.col("ws") / (F.lit(100.0) * F.col("total_dur_us")), 6).alias(
            "twa"
        ),
    ).orderBy("user_id")


@query(
    "q155_l2_normalize",
    oracle="""
    SELECT vec_id,
           floor(sqrt(list_reduce(
                list_transform(embedding,
                               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                (a, b) -> a + b)) * 1e6 + 0.5) / 1e6 AS l2_norm,
           floor(CAST(embedding[1] AS DOUBLE)
                 / sqrt(list_reduce(
                      list_transform(embedding,
                                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                      (a, b) -> a + b)) * 1e6 + 0.5) / 1e6 AS c0_unit
    FROM embeddings ORDER BY vec_id
    """,
)
def q155(spark: SparkSession, sf: str) -> DataFrame:
    """L2 norm + unit-normalized first component per embedding — the
    preprocessing step in front of every cosine-similarity operator
    (q94-q96): normalize once, then cosine is a plain dot product.

    The squared-sum is a SEQUENTIAL left fold over the array (Spark
    ``aggregate`` with 0.0 init, DuckDB ``list_reduce`` seeded by the
    first element — identical because 0.0+x == x in IEEE), so the float
    additions happen in one defined order on both engines: bit-exact
    without decimal detours. Per-row, zero shuffle, codegen end-to-end;
    at 100 TB this runs at scan speed."""
    from ._util import round_det

    emb = load_table(spark, sf, "embeddings")
    sq_sum = F.aggregate(
        F.transform(
            F.col("embedding"),
            lambda x: x.cast("double") * x.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = F.sqrt(sq_sum)
    return emb.select(
        "vec_id",
        round_det(norm, 6).alias("l2_norm"),
        round_det(
            F.element_at(F.col("embedding"), 1).cast("double") / norm, 6
        ).alias("c0_unit"),
    ).orderBy("vec_id")


@query(
    "q156_label_centroids",
    oracle="""
    SELECT label, u.i - 1 AS pos,
           floor(SUM(CAST(floor(CAST(e.embedding[u.i] AS DOUBLE) * 1e9 + 0.5)
                          AS BIGINT))
                 / (1e9 * COUNT(*)) * 1e6 + 0.5) / 1e6 AS centroid
    FROM embeddings e,
         unnest(generate_series(1, len(e.embedding))) AS u(i)
    GROUP BY label, pos ORDER BY label, pos
    """,
)
def q156(spark: SparkSession, sf: str) -> DataFrame:
    """Per-label centroid, element-wise — the k-means/IVF training step
    (q106's coarse quantizer is seeded by exactly this computation).

    Cross-engine float summation is tamed by quantizing each component to
    an integer (×1e9, floor-trick) BEFORE the group sum: bigint partials
    are exact in any partition order, one double division at the end.
    The shape is posexplode → hash-agg on (label, pos): the shuffle
    carries |labels|·dim pre-summed rows from the map-side combine, not
    |vectors|·dim — mean aggregation is fully partial-aggregatable, the
    property that makes distributed k-means feasible at all."""
    from ._util import round_det

    emb = load_table(spark, sf, "embeddings")
    comps = emb.select(
        "label", F.posexplode(F.col("embedding")).alias("pos", "x")
    ).select(
        "label",
        "pos",
        F.floor(F.col("x").cast("double") * 1e9 + 0.5).cast("long").alias("q"),
    )
    return (
        comps.groupBy("label", "pos")
        .agg(
            round_det(
                F.sum("q") / (F.lit(1e9) * F.count(F.lit(1))), 6
            ).alias("centroid")
        )
        .orderBy("label", "pos")
    )


@query(
    "q165_zscore_outliers",
    oracle="""
    WITH t AS (SELECT event_id, event_type,
                      CAST(floor(value * 100 + 0.5) AS BIGINT) AS yc
               FROM events),
    g AS (SELECT event_type, COUNT(*) AS n, SUM(yc) AS sy,
                 SUM(yc * yc) AS syy
          FROM t GROUP BY event_type)
    SELECT t.event_id, t.event_type,
           floor((CAST(t.yc AS DOUBLE) - CAST(g.sy AS DOUBLE) / CAST(g.n AS DOUBLE))
                 / sqrt((CAST(g.syy AS DOUBLE)
                         - CAST(g.sy AS DOUBLE) * CAST(g.sy AS DOUBLE)
                           / CAST(g.n AS DOUBLE))
                        / (CAST(g.n AS DOUBLE) - 1))
                 * 1e4 + 0.5) / 1e4 AS z
    FROM t JOIN g ON t.event_type = g.event_type
    WHERE abs((CAST(t.yc AS DOUBLE) - CAST(g.sy AS DOUBLE) / CAST(g.n AS DOUBLE))
              / sqrt((CAST(g.syy AS DOUBLE)
                      - CAST(g.sy AS DOUBLE) * CAST(g.sy AS DOUBLE)
                        / CAST(g.n AS DOUBLE))
                     / (CAST(g.n AS DOUBLE) - 1))) > 1.5
    ORDER BY t.event_id
    """,
)
def q165(spark: SparkSession, sf: str) -> DataFrame:
    """Z-score outlier filter: events more than 1.5 sample standard
    deviations from their type's mean — the numeric data-cleaning gate.

    Group stats come from exact integer-cent moment sums (one hash agg,
    5 rows) broadcast back onto the stream — two scans, zero windows, so
    100 TB flows map-side except the tiny stats shuffle. Mean/std/z are
    evaluated in one pinned float order on both engines; the threshold
    compares the UNROUNDED z (rounding first would flip borderline rows
    differently than the oracle)."""
    from ._util import round_det

    ev = load_table(spark, sf, "events")
    t = ev.select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("yc"),
    )
    g = t.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("yc").alias("sy"),
        F.sum(F.col("yc") * F.col("yc")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    syd, syyd = F.col("sy").cast("double"), F.col("syy").cast("double")
    mean = syd / nd
    std = F.sqrt((syyd - syd * syd / nd) / (nd - 1))
    z = (F.col("yc").cast("double") - mean) / std
    return (
        t.join(F.broadcast(g), "event_type")
        .filter(F.abs(z) > 1.5)
        .select("event_id", "event_type", round_det(z, 4).alias("z"))
        .orderBy("event_id")
    )


@query(
    "q166_missing_ids",
    oracle="""
    WITH present AS (SELECT event_id FROM events WHERE event_id % 97 <> 0),
         b AS (SELECT min(event_id) AS lo, max(event_id) AS hi FROM present),
         spine AS (SELECT unnest(generate_series(lo, hi)) AS id FROM b)
    SELECT spine.id AS missing_id
    FROM spine LEFT JOIN present ON spine.id = present.event_id
    WHERE present.event_id IS NULL
    ORDER BY missing_id
    """,
)
def q166(spark: SparkSession, sf: str) -> DataFrame:
    """Completeness audit: find every id missing from a supposedly-dense
    sequence (a simulated 1-in-97 loss), by anti-joining a generated id
    spine against the observed ids.

    The window formulation (global LAG over event_id) needs a TOTAL
    ordering — an empty PARTITION BY that funnels 100 TB through one
    task. The spine anti-join is the distributed shape: the spine
    explodes from a 1-row min/max aggregate (q134's pattern), the anti
    join hash-partitions on id, and every stage parallelizes. Spine
    cardinality = id range; for sparse ranges, switch to per-bucket
    count-vs-span reconciliation first and spine only the bad buckets."""
    ev = load_table(spark, sf, "events")
    present = ev.filter(F.col("event_id") % 97 != 0).select("event_id")
    bounds = present.agg(
        F.min("event_id").alias("lo"), F.max("event_id").alias("hi")
    )
    spine = bounds.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("missing_id")
    )
    return (
        spine.join(
            present, spine["missing_id"] == present["event_id"], "left_anti"
        ).orderBy("missing_id")
    )


_CENTROID_SQL = """
    cent AS (
        SELECT label, u.i - 1 AS pos,
               floor(SUM(CAST(floor(CAST(e.embedding[u.i] AS DOUBLE) * 1e9 + 0.5)
                              AS BIGINT))
                     / (1e9 * COUNT(*)) * 1e6 + 0.5) / 1e6 AS centroid
        FROM embeddings e,
             unnest(generate_series(1, len(e.embedding))) AS u(i)
        GROUP BY label, pos),
    carr AS (
        SELECT label AS clabel, list(centroid ORDER BY pos) AS cvec
        FROM cent GROUP BY label)
"""


@query(
    "q167_kmeans_assign_step",
    oracle=f"""
    WITH {_CENTROID_SQL},
    dist AS (
        SELECT e.vec_id, c.clabel,
               list_reduce(
                   list_transform(
                       list_zip(list_transform(e.embedding,
                                               x -> CAST(x AS DOUBLE)),
                                c.cvec),
                       t -> (t[1] - t[2]) * (t[1] - t[2])),
                   (a, b) -> a + b) AS d
        FROM embeddings e CROSS JOIN carr c),
    best AS (
        SELECT vec_id, clabel, d,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, clabel) AS rn
        FROM dist)
    SELECT clabel AS new_label, COUNT(*) AS n_assigned,
           floor(SUM(CAST(floor(d * 1e6 + 0.5) AS BIGINT)) / COUNT(*) / 1e6
                 * 1e6 + 0.5) / 1e6 AS avg_dist
    FROM best WHERE rn = 1
    GROUP BY clabel ORDER BY clabel
    """,
)
def q167(spark: SparkSession, sf: str) -> DataFrame:
    """One k-means assignment step: every embedding goes to its nearest
    label centroid (squared L2), reporting the new cluster sizes and mean
    distance — the inner loop of distributed k-means / IVF training
    (q106's coarse quantizer is trained by iterating exactly this).

    The 10 centroid vectors (from q156's exact integer-quantized means)
    BROADCAST to a nested-loop against the embeddings — at 100 TB the
    vectors stream map-side against k in-memory centroids, the only
    shuffle being the final k-row count; that is why k-means scales: the
    assignment is embarrassingly parallel and the update is a bounded
    aggregate. Distances are per-row sequential float folds (order-
    defined, q155), argmin ties break on label, and the mean distance
    quantizes to micro-units before summing."""
    from ._util import round_det

    emb = load_table(spark, sf, "embeddings")
    comps = emb.select(
        "label", F.posexplode(F.col("embedding")).alias("pos", "x")
    ).select(
        "label",
        "pos",
        F.floor(F.col("x").cast("double") * 1e9 + 0.5).cast("long").alias("q"),
    )
    cent = comps.groupBy("label", "pos").agg(
        round_det(F.sum("q") / (F.lit(1e9) * F.count(F.lit(1))), 6).alias(
            "centroid"
        )
    )
    carr = cent.groupBy(F.col("label").alias("clabel")).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "centroid"))),
            lambda s: s.centroid,
        ).alias("cvec")
    )
    ed = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    d = F.aggregate(
        F.zip_with(ed, F.col("cvec"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, s: acc + s,
    )
    dist = emb.crossJoin(F.broadcast(carr)).select(
        "vec_id", "clabel", d.alias("d")
    )
    w = W.partitionBy("vec_id").orderBy("d", "clabel")
    best = dist.select(
        "vec_id", "clabel", "d", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") == 1)
    dq = F.floor(F.col("d") * 1e6 + 0.5).cast("long")
    return (
        best.groupBy(F.col("clabel").alias("new_label"))
        .agg(
            F.count(F.lit(1)).alias("n_assigned"),
            round_det(F.sum(dq) / F.count(F.lit(1)) / 1e6, 6).alias("avg_dist"),
        )
        .orderBy("new_label")
    )


@query(
    "q168_bm25",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {_WORDS.format(c='text')} AS toks FROM documents),
    dl AS (SELECT doc_id, len(toks) AS dl FROM toks),
    stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM dl),
    tf AS (
        SELECT t.doc_id, u.tok AS term, COUNT(*) AS tf
        FROM toks t, unnest(t.toks) AS u(tok)
        WHERE u.tok IN ('scan', 'merge', 'spark')
        GROUP BY t.doc_id, u.tok),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    scored AS (
        SELECT tf.doc_id,
               CAST(floor(
                   ln((CAST(stats.n_docs AS DOUBLE) - CAST(df.df AS DOUBLE) + 0.5)
                      / (CAST(df.df AS DOUBLE) + 0.5) + 1.0)
                   * (CAST(tf.tf AS DOUBLE) * 2.2)
                   / (CAST(tf.tf AS DOUBLE)
                      + 1.2 * (0.25 + 0.75 * CAST(dl.dl AS DOUBLE)
                               / (CAST(stats.sum_dl AS DOUBLE)
                                  / CAST(stats.n_docs AS DOUBLE))))
                   * 1e6 + 0.5) AS BIGINT) AS c_micro
        FROM tf
        JOIN dl ON tf.doc_id = dl.doc_id
        JOIN df ON tf.term = df.term
        CROSS JOIN stats)
    SELECT doc_id, SUM(c_micro) / 1e6 AS bm25
    FROM scored GROUP BY doc_id ORDER BY doc_id
    """,
)
def q168(spark: SparkSession, sf: str) -> DataFrame:
    """BM25 relevance of every document against the query terms
    (scan, merge, spark) — the lexical-retrieval scorer used to mine
    training data (and the baseline hybrid-search pairs with q94's
    dense cosine).

    k1=1.2, b=0.75. All corpus statistics (doc count, avg doc length,
    per-term document frequency) are tiny aggregates broadcast back; the
    heavy side is one explode + hash-agg per (doc, matched term) —
    vocabulary-bounded because the IN filter prunes at the explode, the
    same shape as q124's top-k. Per-term contributions are evaluated in
    one pinned float order, quantized to micro-units, and summed exactly
    per doc (cross-term addition order must not matter at 1000
    executors)."""
    from ._util import round_det

    d = load_table(spark, sf, "documents")
    toks = d.select("doc_id", words(F.col("text")).alias("toks"))
    dl = toks.select("doc_id", F.size("toks").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    tf = (
        toks.select("doc_id", F.explode("toks").alias("term"))
        .filter(F.col("term").isin("scan", "merge", "spark"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    j = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(stats))
    )
    nd = F.col("n_docs").cast("double")
    dfd = F.col("df").cast("double")
    tfd = F.col("tf").cast("double")
    dld = F.col("dl").cast("double")
    avgdl = F.col("sum_dl").cast("double") / nd
    idf = F.log((nd - dfd + 0.5) / (dfd + 0.5) + 1.0)
    contrib = idf * (tfd * 2.2) / (tfd + 1.2 * (0.25 + 0.75 * dld / avgdl))
    c_micro = F.floor(contrib * 1e6 + 0.5).cast("long")
    return (
        j.select("doc_id", c_micro.alias("c_micro"))
        .groupBy("doc_id")
        .agg((F.sum("c_micro") / 1e6).alias("bm25"))
        .orderBy("doc_id")
    )


@query(
    "q178_approx_top_k",
    oracle=f"""
    SELECT tok AS item, COUNT(*) AS cnt
    FROM (SELECT unnest({_WORDS.format(c='text')}) AS tok FROM documents)
    GROUP BY tok
    ORDER BY cnt DESC, item
    LIMIT 10
    """,
)
def q178(spark: SparkSession, sf: str) -> DataFrame:
    """approx_top_k (Spark 4): frequent-items sketch over the token
    stream, exploded back to (item, count) rows.

    With maxItemsTracked (10k) >= the distinct-token count the sketch is
    EXACT — which is what the oracle gate proves here; past that bound it
    degrades gracefully into a mergeable heavy-hitters summary, the
    100 TB replacement for q124's exact explode+agg when the vocabulary
    is unbounded (URLs, user-ids). The whole corpus reduces to one
    constant-size sketch per partition, merged on the driver. The sketch
    k exceeds the vocabulary so it returns every token exactly; the
    deterministic (count DESC, item) sort + LIMIT happens OUTSIDE the
    sketch — equal counts straddling a sketch-side k boundary would
    otherwise pick an engine-dependent survivor (bitten at sf0.01:
    rank 10/11 tie)."""
    d = load_table(spark, sf, "documents")
    toks = d.select(F.explode(words(F.col("text"))).alias("tok"))
    sk = toks.agg(
        F.expr("approx_top_k(tok, 100, 10000)").alias("topk")
    )
    return (
        sk.select(F.explode("topk").alias("e"))
        .select(F.col("e.item").alias("item"), F.col("e.count").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "item")
        .limit(10)
    )


# ------------------------------------------------- curation signals 2 -----
@query(
    "q212_repetition_score",
    oracle=f"""
    WITH w AS (SELECT doc_id, {_WORDS.format(c='text')} AS ws FROM documents),
    g AS (
        SELECT doc_id, len(ws) - 2 AS total_3grams,
               len(list_distinct([list_aggregate(ws[i:i+2], 'string_agg', ' ')
                                  for i in range(1, len(ws) - 1)])) AS uniq_3grams
        FROM w WHERE len(ws) >= 3
    )
    SELECT doc_id, total_3grams, uniq_3grams,
           floor((1.0 - CAST(uniq_3grams AS DOUBLE) / total_3grams) * 1000000
                 + 0.5) / 1000000 AS rep_ratio
    FROM g
    ORDER BY rep_ratio DESC, doc_id LIMIT 20
    """,
)
def q212(spark: SparkSession, sf: str) -> DataFrame:
    """Within-document repetition score (Gopher-style quality signal): the
    fraction of word 3-grams that are duplicates of an earlier 3-gram in
    the same document, 1 - distinct/total. Entirely per-row array math —
    no shuffle until the final top-k — so the signal costs one scan at
    any scale. High scorers are the templated/spammy docs a curation
    pipeline drops before training."""
    from ._util import round_det

    docs = load_table(spark, sf, "documents")
    w = words(F.col("text"))
    grams = shingles(F.col("text"), k=3, distinct=False)
    scored = docs.select(
        "doc_id",
        (F.size(w) - 2).alias("total_3grams"),
        F.size(F.array_distinct(grams)).alias("uniq_3grams"),
    ).filter(F.size(w) >= 3)
    rep = F.lit(1.0) - F.col("uniq_3grams").cast("double") / F.col("total_3grams")
    return (
        scored.select(
            "doc_id",
            "total_3grams",
            "uniq_3grams",
            round_det(rep, 6).alias("rep_ratio"),
        )
        .orderBy(F.desc("rep_ratio"), "doc_id")
        .limit(20)
    )


@query(
    "q213_boilerplate_shingles",
    oracle=f"""
    WITH g AS (
        SELECT doc_id, unnest({_sql_shingles('text', 4)}) AS sh
        FROM documents
    )
    SELECT sh AS shingle, COUNT(DISTINCT doc_id) AS n_docs
    FROM g GROUP BY sh HAVING COUNT(DISTINCT doc_id) >= 3
    ORDER BY n_docs DESC, shingle LIMIT 20
    """,
)
def q213(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus boilerplate detection (the C4 line-dedup analog for
    unstructured text): word 4-gram shingles appearing in >= 3 distinct
    documents — headers, templates, license blurbs. Shingles are distinct
    per doc before the count, so the aggregate keys on (shingle) with
    one count per contributing doc; at scale the explode feeds a single
    hash aggregate and the >= 5 filter prunes the long tail before the
    top-k. A removal pass would anti-join docs against these shingles."""
    docs = load_table(spark, sf, "documents")
    g = docs.select(
        "doc_id", F.explode(shingles(F.col("text"), k=4)).alias("shingle")
    )
    return (
        g.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= 3)
        .orderBy(F.desc("n_docs"), "shingle")
        .limit(20)
    )


@query(
    "q214_decontamination",
    oracle=f"""
    WITH split AS (
        SELECT doc_id, text,
               {_H64.format(x="'split:' || CAST(doc_id AS VARCHAR)")} % 100 AS bucket
        FROM documents
    ),
    tr AS (SELECT doc_id, unnest({_sql_shingles('text', 5)}) AS sh
           FROM split WHERE bucket < 90),
    te AS (SELECT doc_id, unnest({_sql_shingles('text', 5)}) AS sh
           FROM split WHERE bucket >= 95)
    SELECT tr.doc_id AS train_doc_id,
           COUNT(DISTINCT tr.sh) AS shared_5grams,
           COUNT(DISTINCT te.doc_id) AS test_docs_hit
    FROM tr JOIN te ON te.sh = tr.sh
    GROUP BY tr.doc_id
    ORDER BY shared_5grams DESC, train_doc_id LIMIT 25
    """,
)
def q214(spark: SparkSession, sf: str) -> DataFrame:
    """Train/test decontamination (GPT-3-style n-gram overlap): flag
    training documents sharing any word 5-gram with the held-out test
    split (q109's deterministic hash split, so the check is stable across
    engines and re-runs). The shingle equi-join keys on the 8-gram — at
    100 TB the test side is small enough to broadcast after distinct, so
    contamination screening costs one scan of the train corpus. Flagged
    docs would be dropped (or the eval re-drawn) before training."""
    docs = load_table(spark, sf, "documents")
    bucket = h64(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))) % 100
    split = docs.select("doc_id", "text", bucket.alias("bucket"))
    tr = split.filter(F.col("bucket") < 90).select(
        F.col("doc_id").alias("train_doc_id"),
        F.explode(shingles(F.col("text"), k=5)).alias("sh"),
    )
    te = split.filter(F.col("bucket") >= 95).select(
        F.col("doc_id").alias("test_doc_id"),
        F.explode(shingles(F.col("text"), k=5)).alias("sh"),
    )
    return (
        tr.join(te, "sh")  # test-split shingles are doc-scale — no forced
        # hint; the shingle equi-join shuffles both sides at 100 TB
        .groupBy("train_doc_id")
        .agg(
            F.countDistinct("sh").alias("shared_5grams"),
            F.countDistinct("test_doc_id").alias("test_docs_hit"),
        )
        .orderBy(F.desc("shared_5grams"), "train_doc_id")
        .limit(25)
    )


# ------------------------------------------------- round-2 curation adds --
_COS = """
    floor(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                           CAST(b.embedding AS DOUBLE[]))
          / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                   CAST(a.embedding AS DOUBLE[])))
             * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[]))))
          * 1000000 + 0.5) / 1000000
"""


@query(
    "q219_semantic_dedup_onehop",
    oracle=f"""
    WITH p AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE {_COS} >= 0.45
    ),
    sym AS (
        SELECT id_a AS id, id_b AS nb FROM p
        UNION ALL
        SELECT id_b, id_a FROM p
    ),
    m AS (SELECT id, MIN(nb) AS min_nb FROM sym GROUP BY id)
    SELECT e.vec_id,
           LEAST(e.vec_id, COALESCE(m.min_nb, e.vec_id)) AS canonical_id,
           (LEAST(e.vec_id, COALESCE(m.min_nb, e.vec_id)) < e.vec_id) AS is_dup
    FROM embeddings e LEFT JOIN m ON e.vec_id = m.id
    ORDER BY e.vec_id
    """,
)
def q219(spark: SparkSession, sf: str) -> DataFrame:
    """SemDeDup-style semantic dedup, one-hop contract: every vector's
    canonical is the smallest id among itself and its cosine-similar
    (≥ 0.45) neighbors. One hop — not transitive closure — is exactly
    SQL-expressible, so the oracle pins it; the transitive variant is the
    same pairs fed to connected_components (q108's machinery). Scale: the
    pair generation here reuses the exact cosine_pairs baseline (bounded
    corpora); at 100 TB swap in the LSH/IVF candidate join (q96/q106) and
    keep this min-neighbor reduction — one groupBy shuffle of O(pairs)."""
    emb = load_table(spark, sf, "embeddings")
    p = cosine_pairs(emb, threshold=0.45)
    # symmetrize with a row-local explode of the pair rows — a self-union
    # re-executes the entire upstream pair pipeline per branch
    sym = (
        p.select(
            F.explode(
                F.array(
                    F.struct(F.col("id_a").alias("id"), F.col("id_b").alias("nb")),
                    F.struct(F.col("id_b").alias("id"), F.col("id_a").alias("nb")),
                )
            ).alias("e")
        )
        .select("e.id", "e.nb")
    )
    mins = sym.groupBy("id").agg(F.min("nb").alias("min_nb"))
    canonical = F.least(F.col("vec_id"), F.coalesce("min_nb", F.col("vec_id")))
    return (
        emb.select("vec_id")
        .join(mins, emb.vec_id == mins.id, "left")
        .select(
            "vec_id",
            canonical.alias("canonical_id"),
            (canonical < F.col("vec_id")).alias("is_dup"),
        )
        .orderBy("vec_id")
    )


@query(
    "q220_unigram_surprisal",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest({_WORDS.format(c="text")}) AS w FROM documents
    ),
    freq AS (SELECT w, COUNT(*) AS cnt FROM tok GROUP BY w),
    tot AS (SELECT COUNT(*) AS n_tot FROM tok),
    s AS (
        SELECT t.doc_id,
               CAST(floor(ln(CAST(n_tot AS DOUBLE) / cnt) * 1000000 + 0.5)
                    AS BIGINT) AS su
        FROM tok t JOIN freq USING (w) CROSS JOIN tot
    )
    SELECT doc_id, COUNT(*) AS n_tokens,
           CAST(floor(SUM(su) * 1.0 / COUNT(*) + 0.5) AS BIGINT)
               AS avg_surprisal_micro
    FROM s GROUP BY doc_id ORDER BY doc_id
    """,
)
def q220(spark: SparkSession, sf: str) -> DataFrame:
    """Unigram-LM quality score (the KenLM-perplexity proxy a curation
    pipeline runs when no external model is allowed): token surprisal
    -ln p(w) against the corpus's own unigram distribution, averaged per
    document — low = boilerplate/repetitive, high = rare-token noise.

    Determinism across engines: each token's surprisal is quantized to
    integer micro-nats BEFORE summing (float addition is not associative;
    long addition is), and the final mean is one double division + one
    quantization. Scale shape: token stream → vocab-keyed equi-join with
    the frequency table (both sides shuffle on the word — the frequency
    side is vocab-sized, NOT forced broadcast), corpus total is a one-row
    broadcast, then one groupBy(doc) with mergeable (sum, count) partials."""
    docs = load_table(spark, sf, "documents")
    toks = docs.select("doc_id", F.explode(words("text")).alias("w"))
    freq = toks.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    tot = toks.agg(F.count(F.lit(1)).alias("n_tot"))
    su = F.floor(
        F.log(F.col("n_tot").cast("double") / F.col("cnt")) * 1000000 + F.lit(0.5)
    ).cast("long")
    return (
        toks.join(freq, "w")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", su.alias("su"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.floor(F.sum("su") / F.count(F.lit(1)) + F.lit(0.5))
            .cast("long")
            .alias("avg_surprisal_micro"),
        )
        .orderBy("doc_id")
    )


# ------------------------------------------------- round-3 dedup twins --
@query("q224_semantic_dedup_lsh")
def q224(spark: SparkSession, sf: str) -> DataFrame:
    """q219's registered SCALE TWIN (round-2 VERDICT next #1): the same
    one-hop semantic-dedup contract — canonical = min id among self and
    cosine-similar (≥ 0.45) neighbors — but the pair generation is the
    hyperplane-LSH bucketed join (`cosine_pairs_lsh`), not the O(n²)
    BroadcastNestedLoopJoin baseline. Plan: slim (id, table, bucket) rows
    through a keyed equi-join, distinct candidates, candidate-bounded
    vector re-fetch, exact cosine verify, then the identical min-neighbor
    reduction.

    Registered rows-only, not oracle-pinned: the corpus's qualifying pairs
    all sit in the 0.45-0.55 cosine band (measured), where the LSH s-curve
    P = 1-(1-(1-θ/π)^4)^16 ≈ 0.97 per pair — hash-equality with q219's
    exact oracle would assert data luck, not the operator's contract.
    The honest contract is pinned instead by tests/test_operators.py:
    emitted pairs are a SUBSET of the exact pairs with identical scores
    (LSH never invents a pair — exact verify), recall ≥ a measured floor
    on the seeded deterministic config, and the one-hop reduction agrees
    with q219 on every vector whose pair set survived bucketing."""
    emb = load_table(spark, sf, "embeddings")
    p = cosine_pairs_lsh(emb, dim=64, threshold=0.45, n_planes=4, n_tables=16)
    # symmetrize with a row-local explode of the pair rows — a self-union
    # re-executes the entire upstream pair pipeline per branch
    sym = (
        p.select(
            F.explode(
                F.array(
                    F.struct(F.col("id_a").alias("id"), F.col("id_b").alias("nb")),
                    F.struct(F.col("id_b").alias("id"), F.col("id_a").alias("nb")),
                )
            ).alias("e")
        )
        .select("e.id", "e.nb")
    )
    mins = sym.groupBy("id").agg(F.min("nb").alias("min_nb"))
    canonical = F.least(F.col("vec_id"), F.coalesce("min_nb", F.col("vec_id")))
    return (
        emb.select("vec_id")
        .join(mins, emb.vec_id == mins.id, "left")
        .select(
            "vec_id",
            canonical.alias("canonical_id"),
            (canonical < F.col("vec_id")).alias("is_dup"),
        )
        .orderBy("vec_id")
    )


def _simhash_pairs_oracle(bits: int = 16, max_hamming: int = 3) -> str:
    sums = ", ".join(
        f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS b{b}"
        for b in range(bits)
    )
    packed = " + ".join(
        f"CASE WHEN b{b} >= 0 THEN {2 ** b} ELSE 0 END" for b in range(bits)
    )
    return f"""
    WITH w AS (
        SELECT doc_id, unnest(list_distinct({_WORDS.format(c='text')})) AS word
        FROM documents
    ),
    h AS (SELECT doc_id, {_H64.format(x='word')} AS h FROM w),
    votes AS (SELECT doc_id, {sums} FROM h GROUP BY doc_id),
    s AS (SELECT doc_id, CAST({packed} AS BIGINT) AS simhash FROM votes)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM s a JOIN s b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
    ORDER BY doc_a, doc_b
    """


@query("q225_simhash_pairs", oracle=_simhash_pairs_oracle())
def q225(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash near-dup PAIRS (hamming ≤ 3 over 16-bit signatures) — the
    join that completes the simhash family (round-2 VERDICT missing #1).
    Spark generates candidates with the pigeonhole block equi-join
    (`operators/dedup.py:simhash_pairs` — 4 blocks, hamming ≤ 3 forces one
    equal block) and exact-verifies with bit_count(XOR); the oracle brute-
    forces all pairs with the same bit_count predicate, so the hash match
    proves the block join loses nothing — exactness by pigeonhole, not
    luck."""
    docs = load_table(spark, sf, "documents")
    return (
        simhash_pairs(docs, bits=16, max_hamming=3)
        .select("doc_a", "doc_b", F.col("hamming").cast("int").alias("hamming"))
        .orderBy("doc_a", "doc_b")
    )


@query(
    "q221_asof_forward",
    oracle="""
    SELECT e.event_id, CAST(e.ts AS TIMESTAMP) AS ts,
           (SELECT MIN(CAST(p.ts AS TIMESTAMP)) FROM events p
            WHERE p.event_type = 'purchase' AND p.user_id = e.user_id
              AND p.ts >= e.ts) AS next_purchase_ts
    FROM events e
    WHERE e.event_type = 'error'
    ORDER BY e.event_id
    """,
)
def q221(spark: SparkSession, sf: str) -> DataFrame:
    """Forward as-of join: for each error event, the same user's EARLIEST
    purchase at-or-after it ("did the error precede a purchase, and when")
    — q101's mirror. Same one-shuffle union-timeline plan with the window
    frame flipped to FOLLOWING + first IGNORE NULLS
    (operators/asof.py:direction='forward'); the oracle is the correlated
    min-subquery DuckDB decorrelates itself."""
    ev = load_table(spark, sf, "events")
    errors = ev.filter(F.col("event_type") == "error")
    purchases = ev.filter(F.col("event_type") == "purchase")
    joined = asof_join(
        errors, purchases, on="user_id", value_cols=["ts"], direction="forward"
    )
    return joined.select(
        "event_id",
        "ts",
        F.col("ts_asof").cast("timestamp").alias("next_purchase_ts"),
    ).orderBy("event_id")


@query("q223_near_dup_clusters_star", oracle=_clusters_oracle())
def q223(spark: SparkSession, sf: str) -> DataFrame:
    """q108's O(log n)-rounds twin: identical clustering contract (same
    oracle — recursive transitive closure), computed with the
    large-star/small-star alternation (Kiveris et al. SoCC'14) instead of
    min-label propagation. Convergence is independent of component
    diameter, so this is the variant to reach for when near-dup graphs
    chain (boilerplate templates linking long document runs); q108's loop
    is O(diameter) rounds and wins on small dense clusters. Oracle-pinning
    BOTH proves the two distributed algorithms agree with each other and
    with the sequential closure."""
    from pyspark.sql import Window

    from ..operators.dedup import connected_components_star

    docs = load_table(spark, sf, "documents")
    pairs = minhash_lsh_pairs(docs, k=3, n_perm=16, band_rows=4, threshold=0.8)
    labels = connected_components_star(pairs, docs)
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


@query(
    "q226_pii_redaction",
    oracle="""
    WITH synth AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@mail-' || source || '.com or '
                    || lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0')
                    || '-' || lpad(CAST((doc_id * 3) % 10000 AS VARCHAR), 4, '0')
                    || ' ssn 123-45-6789' AS s1
        FROM documents
    ),
    st AS (
        SELECT doc_id,
               len(regexp_extract_all(s1, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}')) AS n_emails,
               regexp_replace(s1, '[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}', '<EMAIL>', 'g') AS s2
        FROM synth
    ),
    st2 AS (
        SELECT doc_id, n_emails,
               len(regexp_extract_all(s2, '\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b')) AS n_ssns,
               regexp_replace(s2, '\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b', '<SSN>', 'g') AS s3
        FROM st
    )
    SELECT doc_id,
           regexp_replace(s3, '\\b[0-9]{3}-[0-9]{4}\\b', '<PHONE>', 'g') AS redacted,
           n_emails, n_ssns,
           len(regexp_extract_all(s3, '\\b[0-9]{3}-[0-9]{4}\\b')) AS n_phones
    FROM st2 ORDER BY doc_id
    """,
)
def q226(spark: SparkSession, sf: str) -> DataFrame:
    """PII redaction over the corpus (functions/text.py:redact_pii): emails
    → SSNs → phones replaced by typed tokens, with per-category match
    counts. The synthetic corpus contains no organic PII, so the query
    first WEAVES a deterministic PII line per document out of its own
    columns (id/source) — both engines synthesize the identical string, so
    the oracle verifies real replacements, not a no-op. Pure regexp
    Catalyst expressions; the redaction order contract is documented on
    the operator."""
    from ..functions.text import redact_pii

    docs = load_table(spark, sf, "documents")
    synth = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail-"),
        F.col("source"),
        F.lit(".com or "),
        F.lpad(((F.col("doc_id") * 7) % 10000).cast("string"), 4, "0"),
        F.lit("-"),
        F.lpad(((F.col("doc_id") * 3) % 10000).cast("string"), 4, "0"),
        F.lit(" ssn 123-45-6789"),
    )
    r = redact_pii(synth)
    return docs.select("doc_id", r.alias("_r")).select(
        "doc_id",
        F.col("_r.redacted").alias("redacted"),
        F.col("_r.n_emails").alias("n_emails"),
        F.col("_r.n_ssns").alias("n_ssns"),
        F.col("_r.n_phones").alias("n_phones"),
    ).orderBy("doc_id")


@query(
    "q227_domain_mix_sample",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, source, len({_WORDS.format(c="text")}) AS n_tokens
        FROM documents
    ),
    tot AS (SELECT source, SUM(n_tokens) AS dom_total FROM t GROUP BY source),
    m AS (SELECT MIN(dom_total) AS min_total FROM tot)
    SELECT t.doc_id, t.source, t.n_tokens
    FROM t JOIN tot USING (source) CROSS JOIN m
    WHERE ({_H64.format(x="'mix:' || CAST(doc_id AS VARCHAR)")} % 10000) * tot.dom_total
          < m.min_total * 10000
    ORDER BY doc_id
    """,
)
def q227(spark: SparkSession, sf: str) -> DataFrame:
    """Equalizing domain mixer (operators/mixing.py): every source domain
    deterministically downsampled to ~the smallest domain's token count
    via a salted int64 hash gate — the corpus-assembly step between
    curation and packing. O(#domains) aggregate broadcast back; no
    per-domain window, no rand(), membership reproducible on any
    re-shard."""
    from ..operators.mixing import domain_mix_sample

    docs = load_table(spark, sf, "documents")
    return domain_mix_sample(docs).orderBy("doc_id")


@query(
    "q230_asof_tolerance",
    oracle="""
    SELECT e.event_id, CAST(e.ts AS TIMESTAMP) AS ts,
           (SELECT MAX(CAST(p.ts AS TIMESTAMP)) FROM events p
            WHERE p.event_type = 'purchase' AND p.user_id = e.user_id
              AND p.ts <= e.ts
              AND CAST(p.ts AS TIMESTAMP) >= CAST(e.ts AS TIMESTAMP) - INTERVAL 10 MINUTE)
             AS prior_purchase_ts
    FROM events e
    WHERE e.event_type = 'error'
    ORDER BY e.event_id
    """,
)
def q230(spark: SparkSession, sf: str) -> DataFrame:
    """Tolerance-bounded as-of join (pandas merge_asof semantics): the most
    recent purchase per user at-or-before each error, but only within a
    10-minute gap — staler matches are nulled. Same one-shuffle
    union-timeline plan as q101/q221; the gap check is a row-local
    projection on the matched timestamp that already rides the fill
    window (operators/asof.py tolerance param). Oracle: the windowed
    correlated MAX (the most-recent match is in-window iff any match is)."""
    ev = load_table(spark, sf, "events")
    errors = ev.filter(F.col("event_type") == "error")
    purchases = ev.filter(F.col("event_type") == "purchase")
    joined = asof_join(
        errors, purchases, on="user_id", value_cols=["ts"],
        tolerance=F.expr("INTERVAL 10 MINUTES"),
    )
    return joined.select(
        "event_id", "ts",
        F.col("ts_asof").cast("timestamp").alias("prior_purchase_ts"),
    ).orderBy("event_id")


# exact integer logit of the hashed linear classifier, shared by q231
# (the gate) and q287 (its calibration table)
_LOGIT_SQL = f"""CAST(COALESCE(list_sum([
               ({_H32.format(x=f"'w:' || CAST({_H32.format(x='w')} % 1024 AS VARCHAR)")} % 101) - 50
               for w in {_WORDS.format(c="text")}
           ]), 0) AS BIGINT)"""


def _hashed_logit():
    from ..functions.text import h32

    def weight(w):
        bucket = h32(w) % 1024
        return (h32(F.concat(F.lit("w:"), bucket.cast("string"))) % 101) - 50

    return F.aggregate(
        words("text"), F.lit(0).cast("long"), lambda acc, w: acc + weight(w)
    )


@query(
    "q231_hashed_linear_classifier",
    oracle=f"""
    SELECT doc_id,
           {_LOGIT_SQL} AS logit,
           {_LOGIT_SQL} > 0 AS keep
    FROM documents ORDER BY doc_id
    """,
)
def q231(spark: SparkSession, sf: str) -> DataFrame:
    """Hashed-feature linear text classifier — the fasttext-style quality
    gate shape every large corpus pipeline runs, with the ML swapped for
    determinism: words hash into 1024 feature buckets, each bucket carries
    a pseudo-random INTEGER weight derived from the same md5 family both
    engines share, and the document score is the exact integer logit sum
    (no floats, no sigmoid — the keep decision thresholds the logit, so
    the oracle matches bit-for-bit). The real-model path is identical plan
    shape with a broadcast weight map; scoring is one HOF fold per row —
    whole-stage codegen, zero shuffles before the sort."""
    docs = load_table(spark, sf, "documents")
    logit = _hashed_logit()
    return docs.select(
        "doc_id", logit.alias("logit"), (logit > 0).alias("keep")
    ).orderBy("doc_id")


@query(
    "q232_fim_transform",
    oracle=f"""
    WITH cuts AS (
        SELECT doc_id, text, len(text) AS n,
               1 + {_H64.format(x="'fim1:' || CAST(doc_id AS VARCHAR)")}
                   % GREATEST(len(text), 1) AS c1,
               1 + {_H64.format(x="'fim2:' || CAST(doc_id AS VARCHAR)")}
                   % GREATEST(len(text), 1) AS c2
        FROM documents
    )
    SELECT doc_id,
           substr(text, 1, LEAST(c1, c2) - 1) AS prefix,
           substr(text, LEAST(c1, c2), GREATEST(c1, c2) - LEAST(c1, c2)) AS middle,
           substr(text, GREATEST(c1, c2), n) AS suffix
    FROM cuts ORDER BY doc_id
    """,
)
def q232(spark: SparkSession, sf: str) -> DataFrame:
    """Fill-in-the-middle (FIM) training transform: each document split
    into (prefix, middle, suffix) at two DETERMINISTIC hash-derived cut
    points (pure function of doc_id — stable across runs/shards, the
    q109 argument; production swaps the hash for a seeded per-epoch salt).
    Pure substring arithmetic, row-local, zero shuffles; reassembling
    prefix||middle||suffix is the identity, asserted in pytest."""
    docs = load_table(spark, sf, "documents")
    n = F.length("text")
    c1 = 1 + h64(F.concat(F.lit("fim1:"), F.col("doc_id").cast("string"))) % F.greatest(n, F.lit(1))
    c2 = 1 + h64(F.concat(F.lit("fim2:"), F.col("doc_id").cast("string"))) % F.greatest(n, F.lit(1))
    lo, hi = F.least(c1, c2), F.greatest(c1, c2)
    return docs.select(
        "doc_id",
        F.substring("text", F.lit(1), lo - 1).alias("prefix"),
        F.substring("text", lo, hi - lo).alias("middle"),
        F.substring("text", hi, n).alias("suffix"),
    ).orderBy("doc_id")


def _er_oracle() -> str:
    """Entity-resolution closure oracle: the same deterministic dirty-entity
    synthesis, blocked Levenshtein pairing, and recursive transitive
    closure as the Spark plan (q108's closure pattern over a different
    pair generator)."""
    return """
    WITH RECURSIVE base AS (
        SELECT c_custkey AS eid,
               c_name || ' ' || substr(md5(c_name), 1, 6) AS s
        FROM customer
    ),
    ents AS (
        SELECT eid, s FROM base
        UNION ALL
        SELECT eid + 1000000, s || 'x' FROM base
        UNION ALL
        SELECT eid + 2000000, substr(s, 1, len(s) - 1) || '#' FROM base
    ),
    pairs AS (
        SELECT a.eid AS src, b.eid AS dst
        FROM ents a JOIN ents b
          ON substr(a.s, 1, 20) = substr(b.s, 1, 20)
         AND a.eid < b.eid
         AND levenshtein(a.s, b.s) <= 2
    ),
    edges AS (
        SELECT src, dst FROM pairs UNION SELECT dst, src FROM pairs
    ),
    reach(src, dst) AS (
        SELECT src, dst FROM edges
        UNION
        SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    ),
    comp AS (
        SELECT src AS eid, LEAST(src, MIN(dst)) AS canonical_id
        FROM reach GROUP BY src
    )
    SELECT e.eid, COALESCE(c.canonical_id, e.eid) AS canonical_id,
           COUNT(*) OVER (PARTITION BY COALESCE(c.canonical_id, e.eid))
             AS cluster_size
    FROM ents e LEFT JOIN comp c USING (eid)
    ORDER BY eid
    """


@query("q234_entity_resolution", oracle=_er_oracle())
def q234(spark: SparkSession, sf: str) -> DataFrame:
    """Entity resolution end-to-end — the MDM workload composed from the
    engine's own pieces: deterministic dirty-entity synthesis (each
    customer spawns two corrupted variants: one appended char, one
    replaced tail char — the md5 suffix makes DISTINCT entities ≥ 6 edits
    apart so the threshold cannot cross-merge), prefix BLOCKING (the
    O(n²) pair space shrinks to per-block candidates on an equi-join
    key — same bucketing argument as every dedup family here), exact
    Levenshtein scoring at ≤ 2 on candidates only, and
    large-star/small-star connected components for the transitive
    cluster. Oracle replays the identical synthesis + pairing with a
    recursive closure, so the hash match pins blocking, scoring, and
    clustering at once."""
    from ..operators.dedup import connected_components_star

    cust = load_table(spark, sf, "customer")
    base = cust.select(
        F.col("c_custkey").alias("eid"),
        F.concat(
            F.col("c_name"), F.lit(" "), F.substring(F.md5("c_name"), 1, 6)
        ).alias("s"),
    )
    v1 = base.select((F.col("eid") + 1000000).alias("eid"), F.concat("s", F.lit("x")).alias("s"))
    v2 = base.select(
        (F.col("eid") + 2000000).alias("eid"),
        F.concat(F.expr("substring(s, 1, length(s) - 1)"), F.lit("#")).alias("s"),
    )
    ents = base.unionByName(v1).unionByName(v2).transform(materialize)
    blocked = ents.withColumn("blk", F.substring("s", 1, 20))
    a, b = blocked.alias("a"), blocked.alias("b")
    pairs = (
        a.join(b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.eid") < F.col("b.eid")))
        .where(F.levenshtein(F.col("a.s"), F.col("b.s")) <= 2)
        .select(F.col("a.eid").alias("doc_a"), F.col("b.eid").alias("doc_b"))
    )
    labels = connected_components_star(pairs, ents, id_col="eid")
    out = ents.join(labels, ents.eid == labels.id, "left").select(
        "eid", F.coalesce("label", F.col("eid")).alias("canonical_id")
    )
    return out.withColumn(
        "cluster_size", F.count(F.lit(1)).over(W.partitionBy("canonical_id"))
    ).orderBy("eid")


_PT_X = _H64.format(x="'x:' || CAST(event_id AS VARCHAR)") + " % 10000 / 100.0"
_PT_Y = _H64.format(x="'y:' || CAST(event_id AS VARCHAR)") + " % 10000 / 100.0"


@query(
    "q236_spatial_grid_join",
    oracle=f"""
    WITH pts AS (
        SELECT event_id AS pid, {_PT_X} AS x, {_PT_Y} AS y
        FROM events WHERE event_id % 10 = 0
    )
    SELECT a.pid AS id_a, b.pid AS id_b,
           CAST(floor(((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y))
                      * 1000000 + 0.5) AS BIGINT) AS d2_q
    FROM pts a JOIN pts b
      ON a.pid < b.pid
     AND (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 1.0
    ORDER BY id_a, id_b
    """,
)
def q236(spark: SparkSession, sf: str) -> DataFrame:
    """Spatial distance join via grid bucketing — the geohash pattern that
    turns an O(n²) within-radius search into an equi-join: points land in
    r-sized grid cells, the probe side explodes into its 3×3 cell
    neighborhood (9 slim rows/point — any pair within r shares one of
    them, so the candidate set is provably complete), candidates equi-join
    on the cell key and only then pay the exact distance check. The oracle
    brute-forces all pairs; hash equality proves the neighborhood join
    loses nothing. Coordinates are hash-synthesized (no geo columns in the
    testdata); distances are row-local IEEE expressions evaluated in the
    same operation order in both engines, quantized at 1e-6 in the output.
    At scale the cell key is the shuffle key (AQE splits dense cells); the
    same plan with lat/lon → (floor(lat/r), floor(lon/r)) cells is the
    production spatial join."""
    ev = load_table(spark, sf, "events").where(F.col("event_id") % 10 == 0)
    x = h64(F.concat(F.lit("x:"), F.col("event_id").cast("string"))) % 10000 / 100.0
    y = h64(F.concat(F.lit("y:"), F.col("event_id").cast("string"))) % 10000 / 100.0
    pts = ev.select(
        F.col("event_id").alias("pid"), x.alias("x"), y.alias("y"),
        F.floor(x).alias("cx"), F.floor(y).alias("cy"),
    )
    neigh = pts.select(
        F.col("pid").alias("pa"), F.col("x").alias("xa"), F.col("y").alias("ya"),
        F.explode(
            F.array(*[
                F.struct(
                    (F.col("cx") + dx).alias("gx"), (F.col("cy") + dy).alias("gy")
                )
                for dx in (-1, 0, 1) for dy in (-1, 0, 1)
            ])
        ).alias("cell"),
    ).select("pa", "xa", "ya", F.col("cell.gx").alias("gx"), F.col("cell.gy").alias("gy"))
    d2 = (F.col("xa") - F.col("x")) * (F.col("xa") - F.col("x")) + (
        F.col("ya") - F.col("y")
    ) * (F.col("ya") - F.col("y"))
    return (
        neigh.join(
            pts,
            (F.col("gx") == F.col("cx")) & (F.col("gy") == F.col("cy"))
            & (F.col("pa") < F.col("pid")),
        )
        .where(d2 <= 1.0)
        .select(
            F.col("pa").alias("id_a"),
            F.col("pid").alias("id_b"),
            F.floor(d2 * 1000000 + F.lit(0.5)).cast("long").alias("d2_q"),
        )
        .orderBy("id_a", "id_b")
    )


@query(
    "q266_langid_confusion",
    oracle=f"""
    WITH RECURSIVE {_scored_cte()},
    lab AS (SELECT doc_id, lang FROM documents)
    SELECT l.lang AS labeled_lang, s.pred_lang,
           COUNT(*) AS n,
           CAST(floor(COUNT(*) * 1000000.0
                      / SUM(COUNT(*)) OVER (PARTITION BY l.lang) + 0.5)
                AS BIGINT) AS row_share_q
    FROM lab l JOIN scored s USING (doc_id)
    GROUP BY l.lang, s.pred_lang
    ORDER BY labeled_lang, pred_lang
    """,
)
def q266(spark: SparkSession, sf: str) -> DataFrame:
    """Language-ID confusion matrix: declared label × heuristic
    prediction with per-label row shares — the calibration report run
    before trusting a language gate in a curation pipeline (q97 emits the
    per-doc predictions; this is the aggregate view a data team actually
    reads). Plan: one row-local prediction pass + one (label, pred) hash
    aggregate; the row-share window runs over the ≤ |langs|² aggregate,
    never over documents."""
    docs = load_table(spark, sf, "documents")
    cm = (
        docs.select(F.col("lang").alias("labeled_lang"), detect_language("text").alias("pred_lang"))
        .groupBy("labeled_lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    share = F.floor(
        F.col("n") * 1000000.0
        / F.sum("n").over(W.partitionBy("labeled_lang"))
        + F.lit(0.5)
    ).cast("long")
    return cm.select(
        "labeled_lang", "pred_lang", "n", share.alias("row_share_q")
    ).orderBy("labeled_lang", "pred_lang")


def _leakage_safe_split_oracle() -> str:
    return f"""
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
           CASE WHEN {_H64.format(x="'lsplit:' || CAST(canonical_id AS VARCHAR)")} % 100 < 90
                  THEN 'train'
                WHEN {_H64.format(x="'lsplit:' || CAST(canonical_id AS VARCHAR)")} % 100 < 95
                  THEN 'val' ELSE 'test' END AS split
    FROM labeled ORDER BY doc_id
    """


@query("q268_leakage_safe_split", oracle=_leakage_safe_split_oracle())
def q268(spark: SparkSession, sf: str) -> DataFrame:
    """Leakage-safe train/val/test split: the split key is the NEAR-DUP
    CLUSTER's canonical id, not the document id — so two near-duplicate
    documents can never land in different splits (the train/test
    contamination q109's plain hash split cannot rule out, and the step
    every serious pretraining pipeline runs between dedup and sharding).
    Plan: MinHash-LSH pairs → distributed connected components (q108's
    machinery) → salted-hash split of the CANONICAL id, 90/5/5. The
    straddle count is structurally zero because split is a pure function
    of the cluster label — pinned by pytest, while the oracle hash-checks
    the full per-doc assignment against a recursive-closure recompute."""
    from ..operators.dedup import connected_components

    docs = load_table(spark, sf, "documents")
    pairs = minhash_lsh_pairs(docs, k=3, n_perm=16, band_rows=4, threshold=0.8)
    labels = connected_components(pairs, docs)
    canon = F.coalesce("label", F.col("doc_id"))
    bucket = h64(F.concat(F.lit("lsplit:"), canon.cast("string"))) % 100
    return (
        docs.join(labels, docs.doc_id == labels.id, "left")
        .select(
            "doc_id",
            canon.alias("canonical_id"),
            F.when(bucket < 90, "train")
            .when(bucket < 95, "val")
            .otherwise("test")
            .alias("split"),
        )
        .orderBy("doc_id")
    )


# ------------------------------------------------- boilerplate removal ----
BP_K = 4  # shingle width (words)
BP_MIN_DOCS = 3  # shingles in >= this many distinct docs are boilerplate


@query(
    "q280_boilerplate_strip",
    oracle=f"""
    WITH w AS (
        SELECT doc_id, {_WORDS.format(c='text')} AS ws FROM documents
    ),
    base AS (SELECT doc_id, ws, len(ws) AS n FROM w),
    sh AS (
        SELECT doc_id, p, array_to_string(ws[p:p + {BP_K - 1}], ' ') AS s
        FROM (
            SELECT doc_id, ws, unnest(range(1, n - {BP_K - 2})) AS p
            FROM base WHERE n >= {BP_K}
        )
    ),
    bp AS (
        SELECT s FROM (SELECT DISTINCT doc_id, s FROM sh)
        GROUP BY s HAVING COUNT(*) >= {BP_MIN_DOCS}
    ),
    cov AS (
        SELECT doc_id, list(p) AS starts
        FROM sh JOIN bp USING (s) GROUP BY doc_id
    ),
    r AS (
        SELECT b.doc_id, b.ws, b.n, coalesce(c.starts, []) AS st
        FROM base b LEFT JOIN cov c ON b.doc_id = c.doc_id
    ),
    kept AS (
        SELECT doc_id, ws, n,
               list_filter(range(1, n + 1),
                   w -> len(list_filter(st,
                        s -> s <= w AND w <= s + {BP_K - 1})) = 0) AS keep
        FROM r
    )
    SELECT doc_id, n AS n_words,
           n - len(keep) AS n_removed,
           coalesce(
               array_to_string(list_transform(keep, w -> ws[w]), ' '), ''
           ) AS clean_text
    FROM kept ORDER BY doc_id
    """,
)
def q280(spark: SparkSession, sf: str) -> DataFrame:
    """Boilerplate REMOVAL — the rewrite pass q213 only detects: every
    word position covered by a corpus-boilerplate {k}-gram occurrence
    (shingle in >= {m} distinct docs — headers, templates, license
    blurbs) is stripped, and the cleaned text plus removal counts come
    back per document. Shape: positional shingles explode row-locally;
    the boilerplate set is one hash aggregate over DISTINCT (doc,
    shingle); covered START positions return to their doc through a
    shingle-keyed equi-join + per-doc collect; the final strip is a pure
    row-local filter (position w survives iff no collected start s has
    s <= w <= s+{j}), so the expensive membership test never touches the
    words themselves. At 100 TB the boilerplate set is tiny relative to
    the corpus (df >= {m} head shingles) — broadcast it; everything else
    is map-side."""
    docs = load_table(spark, sf, "documents")
    w = words("text")
    base = docs.select(
        "doc_id", w.alias("ws"), F.size(w).alias("n")
    )
    # positional (non-distinct) shingles, 1-based start p
    sh_arr = F.transform(
        F.sequence(F.lit(1), F.col("n") - (BP_K - 1)),
        lambda p: F.concat_ws(" ", F.slice("ws", p, BP_K)),
    )
    # the positional shingle relation feeds BOTH the boilerplate-set
    # aggregate and the coverage join — materialize once (one-pass rule)
    sh = (
        base.where(F.col("n") >= BP_K)
        .select("doc_id", F.posexplode(sh_arr).alias("p0", "s"))
        .select("doc_id", (F.col("p0") + 1).alias("p"), "s")
        .transform(materialize)
    )
    bp = (
        sh.select("doc_id", "s")
        .distinct()
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= BP_MIN_DOCS)
        .select("s")
    )
    cov = (
        sh.join(bp, "s")
        .groupBy("doc_id")
        .agg(F.collect_set("p").alias("starts"))
    )
    r = base.join(cov, "doc_id", "left").select(
        "doc_id",
        "ws",
        "n",
        F.coalesce(
            F.col("starts"), F.array().cast("array<integer>")
        ).alias("st"),
    )
    keep = F.filter(
        F.sequence(F.lit(1), F.col("n")),
        lambda pos: F.size(
            F.filter(
                "st", lambda s: (s <= pos) & (pos <= s + (BP_K - 1))
            )
        )
        == 0,
    )
    return (
        r.where(F.col("n") >= 1)
        .select(
            "doc_id",
            F.col("n").alias("n_words"),
            (F.col("n") - F.size(keep)).alias("n_removed"),
            F.array_join(
                F.transform(keep, lambda pos: F.element_at("ws", pos)), " "
            ).alias("clean_text"),
        )
        .orderBy("doc_id")
    )


q280.__doc__ = q280.__doc__.format(k=BP_K, m=BP_MIN_DOCS, j=BP_K - 1)


# ----------------------------------------------- classifier calibration ----
CAL_BIN_W = 100  # logit units per calibration bin


@query(
    "q287_calibration_table",
    oracle=f"""
    WITH scored AS (
        SELECT {_LOGIT_SQL} AS logit,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
        FROM documents
    ),
    binned AS (
        SELECT CAST(floor(CAST(logit AS DOUBLE) / {CAL_BIN_W}) AS BIGINT) AS bin,
               pos
        FROM scored
    )
    SELECT bin, COUNT(*) AS n, CAST(SUM(pos) AS BIGINT) AS n_pos,
           (CAST(SUM(pos) AS BIGINT) * 1000000) // COUNT(*) AS pos_rate_q
    FROM binned GROUP BY bin ORDER BY bin
    """,
)
def q287(spark: SparkSession, sf: str) -> DataFrame:
    """Calibration / reliability table for the q231 hashed classifier —
    the model-eval companion to q252's AUC: logits bucket into
    fixed-width bins and each bin reports observed positive rate (label:
    lang = 'en'). A well-calibrated score shows monotone rates across
    bins; a flat line means the gate carries no signal for the label.
    Fixed-width binning (not quantile) keeps the whole query one hash
    aggregate with exact integer arithmetic end-to-end — logit is q231's
    exact BIGINT fold, the bin is floor of one IEEE division, and the
    rate is scaled integer floor-division — so the table is bit-stable
    cross-engine and trivially mergeable across shards (counts add),
    which is what lets a 100 TB eval run as map-side partials. Quantile
    bins at scale: mint ranks via q218's machinery, same downstream."""
    docs = load_table(spark, sf, "documents")
    logit = _hashed_logit()
    pos = (F.col("lang") == "en").cast("long")
    binned = docs.select(
        F.floor(logit / CAL_BIN_W).cast("long").alias("bin"), pos.alias("pos")
    )
    n = F.count(F.lit(1))
    n_pos = F.sum("pos")
    num = n_pos * 1_000_000
    return (
        binned.groupBy("bin")
        .agg(
            n.alias("n"),
            n_pos.alias("n_pos"),
            ((num - num % n) / n).cast("long").alias("pos_rate_q"),
        )
        .orderBy("bin")
    )


@query("q299_ann_lsh_exhaustive", oracle=_BRUTE_TOPK_ORACLE)
def q299(spark: SparkSession, sf: str) -> DataFrame:
    """LSH ANN at the exhaustive configuration (``n_planes = 0``, one
    table): zero hyperplanes put every vector in bucket 0, the
    (table, bucket) join covers the full candidate set, and the exact
    cosine re-rank reduces to brute force — the SAME bucketing /
    collision-dedup / re-rank machinery as q96, certified against the
    exact q94 oracle. Completes the exhaustive-config certification trio
    (q253 IVF, q254 IVF-PQ, now LSH): each approximate family's plumbing
    has one hash-verified row, so only the probabilistic recall itself
    remains pytest-bounded rather than oracle-pinned."""
    emb = load_table(spark, sf, "embeddings")
    return lsh_ann_topk(
        emb.filter(F.col("vec_id") < 10), emb.filter(F.col("vec_id") >= 10),
        dim=64, k=5, n_planes=0, n_tables=1,
    ).orderBy("query_id", "rank")


# ------------------------------------------ matryoshka truncation eval ----
MATRYOSHKA_PREFIX = 16
MATRYOSHKA_K = 5


def _mat_rank_sql(vec_expr: str, alias: str) -> str:
    dot = f"list_dot_product({vec_expr.format(t='a')}, {vec_expr.format(t='b')})"
    na = f"sqrt(list_dot_product({vec_expr.format(t='a')}, {vec_expr.format(t='a')}))"
    nb = f"sqrt(list_dot_product({vec_expr.format(t='b')}, {vec_expr.format(t='b')}))"
    return f"""
    {alias} AS (
        SELECT query_id, candidate_id FROM (
            SELECT a.vec_id AS query_id, b.vec_id AS candidate_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY a.vec_id
                       ORDER BY floor({dot} / ({na} * {nb}) * 1000000 + 0.5) DESC,
                                b.vec_id) AS rnk
            FROM emb a JOIN emb b ON a.vec_id < 10 AND b.vec_id >= 10
        ) WHERE rnk <= {MATRYOSHKA_K}
    )"""


@query(
    "q305_matryoshka_overlap",
    oracle=f"""
    WITH emb AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    {_mat_rank_sql("{t}.v", "full_k")},
    {_mat_rank_sql("{t}.v[1:" + str(MATRYOSHKA_PREFIX) + "]", "pre_k")}
    SELECT q.query_id,
           CAST(COALESCE(o.n, 0) AS BIGINT) AS overlap_k
    FROM (SELECT DISTINCT query_id FROM full_k) q
    LEFT JOIN (
        SELECT f.query_id, COUNT(*) AS n
        FROM full_k f JOIN pre_k p
          ON f.query_id = p.query_id AND f.candidate_id = p.candidate_id
        GROUP BY f.query_id
    ) o ON o.query_id = q.query_id
    ORDER BY q.query_id
    """,
)
def q305(spark: SparkSession, sf: str) -> DataFrame:
    """Matryoshka-truncation retrieval eval: how much of the exact
    full-dimension top-{k} survives when vectors are truncated to their
    first {p} components — the measurement that decides whether a
    matryoshka-trained embedding can serve its cheap prefix tier (4×
    less compute/storage per comparison) without a recall cliff. Both
    rankings are EXACT brute-force cosines (quantized, candidate-id
    tiebreak), so even though the operator evaluates an approximation,
    the overlap@k itself is deterministic and hash-verified — the q290
    argument again. Bounded-baseline pair space by declared design
    (10 queries, q94's class); at corpus scale both tiers ride the ANN
    family (q96/q106/q228) and this query becomes their offline eval.
    sqrt is IEEE-exactly-rounded (unlike ln/exp), so the norm math is
    engine-stable."""
    emb = load_table(spark, sf, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    c = emb.where(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("candidate_id"), F.col("v").alias("cv")
    )

    def topk(qcol, ccol) -> DataFrame:
        dot = F.aggregate(
            F.zip_with(qcol, ccol, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        nrm = lambda col: F.sqrt(  # noqa: E731
            F.aggregate(
                F.transform(col, lambda x: x * x),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
        cos_q = F.floor(dot / (nrm(qcol) * nrm(ccol)) * 1_000_000 + F.lit(0.5))
        pairs = q.join(F.broadcast(c), F.lit(True)).select(
            "query_id", "candidate_id", cos_q.alias("cos_q")
        )
        rnk = F.row_number().over(
            W.partitionBy("query_id").orderBy(
                F.col("cos_q").desc(), "candidate_id"
            )
        )
        return (
            pairs.select("query_id", "candidate_id", rnk.alias("rnk"))
            .where(F.col("rnk") <= MATRYOSHKA_K)
            .select("query_id", "candidate_id")
        )

    pre = lambda col: F.slice(col, 1, MATRYOSHKA_PREFIX)  # noqa: E731
    full_k = topk(F.col("qv"), F.col("cv"))
    pre_k = topk(pre(F.col("qv")), pre(F.col("cv")))
    inter = (
        full_k.join(pre_k, ["query_id", "candidate_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    base = full_k.select("query_id").distinct()
    return (
        base.join(inter, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("overlap_k"),
        )
        .orderBy("query_id")
    )


q305.__doc__ = q305.__doc__.format(k=MATRYOSHKA_K, p=MATRYOSHKA_PREFIX)


# --------------------------------------- sorted-neighborhood blocking ----
SNM_W = 4  # window width: candidates are rank-neighbors within W-1


@query(
    "q316_sorted_neighborhood_pairs",
    oracle=f"""
    WITH base AS (
        SELECT c_custkey AS eid,
               c_name || ' ' || substr(md5(c_name), 1, 6) AS s
        FROM customer
    ),
    ents AS (
        SELECT eid, s FROM base
        UNION ALL
        SELECT eid + 1000000, s || 'x' FROM base
        UNION ALL
        SELECT eid + 2000000, substr(s, 1, len(s) - 1) || '#' FROM base
    ),
    ranked AS (
        SELECT eid, s,
               CAST(ROW_NUMBER() OVER (ORDER BY s, eid) AS BIGINT) AS r
        FROM ents
    )
    SELECT LEAST(a.eid, b.eid) AS doc_a, GREATEST(a.eid, b.eid) AS doc_b,
           CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
    FROM ranked a JOIN ranked b
      ON b.r - a.r BETWEEN 1 AND {SNM_W - 1}
     AND levenshtein(a.s, b.s) <= 2
    ORDER BY doc_a, doc_b
    """,
)
def q316(spark: SparkSession, sf: str) -> DataFrame:
    """Sorted-neighborhood dedup (SNM) — the THIRD candidate-blocking
    family alongside hash/prefix blocking (q234) and LSH (q92/q224):
    sort the corpus on a locality-preserving key and compare only rows
    within a width-{w} sliding rank window. Recall depends on sort-key
    locality (the classic SNM trade — multi-pass with different keys in
    production); the oracle replays the identical window, so the hash
    pins the blocking exactly. Scale shape: global rank via the
    zipWithIndex machinery (`deterministic_id(fact_scale=True)` — range
    exchange, never a partitionless window), then rank-neighbor
    candidates come from an EQUI-join: the lower row emits its
    rank-bucket and the next (buckets of width {w}−1 cover every pair
    within the window), the higher row emits its own bucket, and the
    1 ≤ Δrank ≤ {w}−1 predicate trims the bucket cross — O(n·{w})
    candidates total, no theta join. Same dirty-entity corpus as q234
    so the two blocking strategies are directly comparable."""
    from ..functions.refops import deterministic_id

    cust = load_table(spark, sf, "customer")
    base = cust.select(
        F.col("c_custkey").alias("eid"),
        F.concat(
            F.col("c_name"), F.lit(" "), F.substring(F.md5("c_name"), 1, 6)
        ).alias("s"),
    )
    v1 = base.select(
        (F.col("eid") + 1000000).alias("eid"), F.concat("s", F.lit("x")).alias("s")
    )
    v2 = base.select(
        (F.col("eid") + 2000000).alias("eid"),
        F.concat(F.expr("substring(s, 1, length(s) - 1)"), F.lit("#")).alias("s"),
    )
    ents = base.unionByName(v1).unionByName(v2)
    ranked = deterministic_id(ents, ["s", "eid"], name="r", fact_scale=True)
    width = SNM_W - 1
    bkt = ((F.col("r") - F.col("r") % width) / width).cast("long")
    lo = ranked.select(
        F.col("eid").alias("eid_a"), F.col("s").alias("s_a"),
        F.col("r").alias("r_a"),
        F.explode(F.array(bkt, bkt + 1)).alias("bkt"),
    )
    hi = ranked.select(
        F.col("eid").alias("eid_b"), F.col("s").alias("s_b"),
        F.col("r").alias("r_b"), bkt.alias("bkt"),
    )
    delta = F.col("r_b") - F.col("r_a")
    dist = F.levenshtein(F.col("s_a"), F.col("s_b"))
    return (
        lo.join(hi, "bkt")
        .where((delta >= 1) & (delta <= width) & (dist <= 2))
        .select(
            F.least("eid_a", "eid_b").alias("doc_a"),
            F.greatest("eid_a", "eid_b").alias("doc_b"),
            dist.cast("long").alias("dist"),
        )
        .orderBy("doc_a", "doc_b")
    )


q316.__doc__ = q316.__doc__.format(w=SNM_W)


# ------------------------------------------- blocking-strategy bake-off ----
@query(
    "q321_blocking_recall_report",
    oracle=f"""
    WITH base AS (
        SELECT c_custkey AS eid,
               c_name || ' ' || substr(md5(c_name), 1, 6) AS s
        FROM customer
    ),
    ents AS (
        SELECT eid, s FROM base
        UNION ALL
        SELECT eid + 1000000, s || 'x' FROM base
        UNION ALL
        SELECT eid + 2000000, substr(s, 1, len(s) - 1) || '#' FROM base
    ),
    truth AS (
        SELECT CAST(COUNT(*) AS BIGINT) * 3 AS n_true FROM base
    ),
    prefix_pairs AS (
        SELECT a.eid AS ea, b.eid AS eb
        FROM ents a JOIN ents b
          ON substr(a.s, 1, 20) = substr(b.s, 1, 20)
         AND a.eid < b.eid AND levenshtein(a.s, b.s) <= 2
    ),
    ranked AS (
        SELECT eid, s,
               CAST(ROW_NUMBER() OVER (ORDER BY s, eid) AS BIGINT) AS r
        FROM ents
    ),
    snm_pairs AS (
        SELECT LEAST(a.eid, b.eid) AS ea, GREATEST(a.eid, b.eid) AS eb
        FROM ranked a JOIN ranked b
          ON b.r - a.r BETWEEN 1 AND {SNM_W - 1}
         AND levenshtein(a.s, b.s) <= 2
    ),
    rep AS (
        SELECT 'prefix' AS strategy,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               CAST(SUM(CASE WHEN ea % 1000000 = eb % 1000000
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_true_found
        FROM prefix_pairs
        UNION ALL
        SELECT 'snm', CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN ea % 1000000 = eb % 1000000
                             THEN 1 ELSE 0 END) AS BIGINT)
        FROM snm_pairs
    )
    SELECT strategy, n_pairs, n_true_found, n_true,
           (n_true_found * 1000000) // n_true AS recall_ppm,
           CASE WHEN n_pairs > 0
                THEN (n_true_found * 1000000) // n_pairs END AS precision_ppm
    FROM rep, truth ORDER BY strategy
    """,
)
def q321(spark: SparkSession, sf: str) -> DataFrame:
    """Blocking-strategy bake-off — the evaluation report a dedup
    platform runs before picking its candidate generator: prefix
    blocking (q234's) and sorted-neighborhood (q316's) over the SAME
    dirty-entity corpus, scored against DERIVABLE ground truth (the
    synthesis makes each entity's 3 variants share ``eid mod 10⁶``, so
    true-pair recall and pair precision are exact counts, no labeling
    needed). This closes the dedup story: four candidate generators
    (prefix/hash q234, LSH q92, SimHash q225, SNM q316) + one harness
    that says which to use per corpus. Both pair pipelines are the
    certified keyed-join shapes; the report adds two tiny aggregates
    and a 1-row truth broadcast. On THIS synthetic corpus both score
    perfect recall/precision by construction (tail-only corruptions
    keep the 20-char prefix and the sort adjacency); real corpora with
    head typos differentiate them — which is exactly what the report
    exists to surface."""
    from ..functions.refops import deterministic_id

    cust = load_table(spark, sf, "customer")
    base = cust.select(
        F.col("c_custkey").alias("eid"),
        F.concat(
            F.col("c_name"), F.lit(" "), F.substring(F.md5("c_name"), 1, 6)
        ).alias("s"),
    )
    v1 = base.select(
        (F.col("eid") + 1000000).alias("eid"), F.concat("s", F.lit("x")).alias("s")
    )
    v2 = base.select(
        (F.col("eid") + 2000000).alias("eid"),
        F.concat(F.expr("substring(s, 1, length(s) - 1)"), F.lit("#")).alias("s"),
    )
    ents = base.unionByName(v1).unionByName(v2).transform(materialize)
    truth = base.agg((F.count(F.lit(1)) * 3).alias("n_true"))

    blocked = ents.withColumn("blk", F.substring("s", 1, 20))
    a, b = blocked.alias("a"), blocked.alias("b")
    prefix_pairs = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk")) & (F.col("a.eid") < F.col("b.eid")),
        )
        .where(F.levenshtein(F.col("a.s"), F.col("b.s")) <= 2)
        .select(F.col("a.eid").alias("ea"), F.col("b.eid").alias("eb"))
    )

    ranked = deterministic_id(ents, ["s", "eid"], name="r", fact_scale=True)
    width = SNM_W - 1
    bkt = ((F.col("r") - F.col("r") % width) / width).cast("long")
    lo = ranked.select(
        F.col("eid").alias("eid_a"), F.col("s").alias("s_a"),
        F.col("r").alias("r_a"),
        F.explode(F.array(bkt, bkt + 1)).alias("bkt"),
    )
    hi = ranked.select(
        F.col("eid").alias("eid_b"), F.col("s").alias("s_b"),
        F.col("r").alias("r_b"), bkt.alias("bkt"),
    )
    delta = F.col("r_b") - F.col("r_a")
    snm_pairs = (
        lo.join(hi, "bkt")
        .where(
            (delta >= 1)
            & (delta <= width)
            & (F.levenshtein(F.col("s_a"), F.col("s_b")) <= 2)
        )
        .select(
            F.least("eid_a", "eid_b").alias("ea"),
            F.greatest("eid_a", "eid_b").alias("eb"),
        )
    )

    def report(name: str, pairs: DataFrame) -> DataFrame:
        is_true = (F.col("ea") % 1000000 == F.col("eb") % 1000000).cast("long")
        return pairs.agg(
            F.lit(name).alias("strategy"),
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(is_true).alias("n_true_found"),
        )

    rep = report("prefix", prefix_pairs).unionByName(report("snm", snm_pairs))
    rec = F.col("n_true_found") * 1_000_000
    prec = F.col("n_true_found") * 1_000_000
    return (
        rep.crossJoin(F.broadcast(truth))
        .select(
            "strategy",
            "n_pairs",
            "n_true_found",
            "n_true",
            ((rec - rec % F.col("n_true")) / F.col("n_true"))
            .cast("long")
            .alias("recall_ppm"),
            F.when(
                F.col("n_pairs") > 0,
                ((prec - prec % F.col("n_pairs")) / F.col("n_pairs")).cast("long"),
            ).alias("precision_ppm"),
        )
        .orderBy("strategy")
    )


# ------------------------------------------- golden-record survivorship ----
def _survivorship_sql() -> str:
    return """
    WITH recs AS (
        SELECT c_custkey AS cluster, c_custkey * 10 AS eid, 'crm' AS src,
               1 AS prio, c_name AS name,
               CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents,
               c_mktsegment AS seg
        FROM customer
        UNION ALL
        SELECT c_custkey, c_custkey * 10 + 1, 'web', 3,
               c_name || '-x',
               CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) - 100,
               CAST(NULL AS VARCHAR)
        FROM customer
        UNION ALL
        SELECT c_custkey, c_custkey * 10 + 2, 'import', 2,
               substr(c_name, 1, 8),
               CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
                 + CASE WHEN c_custkey % 3 = 0 THEN 150 ELSE 0 END,
               c_mktsegment
        FROM customer
    ),
    best_name AS (
        SELECT cluster, name FROM (
            SELECT cluster, name, ROW_NUMBER() OVER (
                PARTITION BY cluster
                ORDER BY length(name) DESC, name, eid) AS rn
            FROM recs)
        WHERE rn = 1
    ),
    best_seg AS (
        SELECT cluster, seg FROM (
            SELECT cluster, seg, ROW_NUMBER() OVER (
                PARTITION BY cluster ORDER BY prio, eid) AS rn
            FROM recs WHERE seg IS NOT NULL)
        WHERE rn = 1
    ),
    agg AS (
        SELECT cluster, CAST(MAX(cents) AS BIGINT) AS golden_cents,
               CAST(COUNT(*) AS BIGINT) AS n_sources
        FROM recs GROUP BY cluster
    )
    SELECT a.cluster, bn.name AS golden_name, a.golden_cents,
           bs.seg AS golden_seg, a.n_sources
    FROM agg a
    JOIN best_name bn ON bn.cluster = a.cluster
    LEFT JOIN best_seg bs ON bs.cluster = a.cluster
    ORDER BY a.cluster
    """


@query("q343_golden_record_survivorship", oracle=_survivorship_sql())
def q343(spark: SparkSession, sf: str) -> DataFrame:
    """Golden-record SURVIVORSHIP — the merge-rule stage that follows
    entity resolution (clusters here are taken as given, keyed by the
    synthesized variants' shared custkey; producing them from dirty
    data is q234/q108's job): three deterministic source records per
    entity (CRM master, web signup with a decorated name, a NULL
    segment and a stale balance, and a truncated import feed) survive
    into one golden row under pinned, deterministic rules — longest
    name (ties: lexicographic, then eid), MAX balance, first non-null
    segment by source priority (crm > import > web). Each rule is
    either one hash aggregate or a per-cluster window over the BOUNDED
    per-entity record group (3 rows), so the whole MDM merge is
    shuffle-proportional to records, never entities². Rule choices are
    the industry-standard recency/length/priority trio, each encoded
    so the result value-hash-matches."""
    c = load_table(spark, sf, "customer")
    cents = F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long")
    r0 = c.select(
        F.col("c_custkey").alias("cluster"),
        (F.col("c_custkey") * 10).alias("eid"),
        F.lit("crm").alias("src"),
        F.lit(1).alias("prio"),
        F.col("c_name").alias("name"),
        cents.alias("cents"),
        F.col("c_mktsegment").alias("seg"),
    )
    r1 = c.select(
        F.col("c_custkey").alias("cluster"),
        (F.col("c_custkey") * 10 + 1).alias("eid"),
        F.lit("web").alias("src"),
        F.lit(3).alias("prio"),
        F.concat(F.col("c_name"), F.lit("-x")).alias("name"),
        (cents - 100).alias("cents"),
        F.lit(None).cast("string").alias("seg"),
    )
    r2 = c.select(
        F.col("c_custkey").alias("cluster"),
        (F.col("c_custkey") * 10 + 2).alias("eid"),
        F.lit("import").alias("src"),
        F.lit(2).alias("prio"),
        F.substring(F.col("c_name"), 1, 8).alias("name"),
        (
            cents
            + F.when(F.col("c_custkey") % 3 == 0, F.lit(150)).otherwise(
                F.lit(0)
            )
        ).alias("cents"),
        F.col("c_mktsegment").alias("seg"),
    )
    recs = r0.unionByName(r1).unionByName(r2).transform(materialize)
    wn = W.partitionBy("cluster").orderBy(
        F.length("name").desc(), "name", "eid"
    )
    best_name = (
        recs.withColumn("rn", F.row_number().over(wn))
        .where(F.col("rn") == 1)
        .select("cluster", F.col("name").alias("golden_name"))
    )
    ws = W.partitionBy("cluster").orderBy("prio", "eid")
    best_seg = (
        recs.where(F.col("seg").isNotNull())
        .withColumn("rn", F.row_number().over(ws))
        .where(F.col("rn") == 1)
        .select("cluster", F.col("seg").alias("golden_seg"))
    )
    agg = recs.groupBy("cluster").agg(
        F.max("cents").cast("long").alias("golden_cents"),
        F.count(F.lit(1)).cast("long").alias("n_sources"),
    )
    return (
        agg.join(best_name, "cluster")
        .join(best_seg, "cluster", "left")
        .select(
            "cluster", "golden_name", "golden_cents", "golden_seg", "n_sources"
        )
        .orderBy("cluster")
    )


# --------------------------------------- multi-signal dedup agreement ----
def _signal_agreement_sql() -> str:
    emb_pair = """
        SELECT a.vec_id AS pa, b.vec_id AS pb
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE floor(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[]))
                    / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                             CAST(a.embedding AS DOUBLE[])))
                       * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),
                                               CAST(b.embedding AS DOUBLE[]))))
                    * 1000000 + 0.5) / 1000000 >= 0.45
    """
    return f"""
    WITH {_minhash_ctes()},
    tp AS (SELECT doc_a AS pa, doc_b AS pb FROM verified
           WHERE jaccard >= 0.8),
    ep AS ({emb_pair}),
    j AS (SELECT COALESCE(tp.pa, ep.pa) AS pa, COALESCE(tp.pb, ep.pb) AS pb,
                 tp.pa IS NOT NULL AS in_text, ep.pa IS NOT NULL AS in_emb
          FROM tp FULL OUTER JOIN ep ON tp.pa = ep.pa AND tp.pb = ep.pb)
    SELECT CAST(COUNT(*) FILTER (WHERE in_text) AS BIGINT) AS n_text_pairs,
           CAST(COUNT(*) FILTER (WHERE in_emb) AS BIGINT) AS n_emb_pairs,
           CAST(COUNT(*) FILTER (WHERE in_text AND in_emb) AS BIGINT)
             AS n_both,
           CAST(CASE WHEN COUNT(*) = 0 THEN 0
                ELSE COUNT(*) FILTER (WHERE in_text AND in_emb) * 1000000
                     // COUNT(*) END AS BIGINT) AS jaccard_ppm
    FROM j
    """


@query("q344_dedup_signal_agreement", oracle=_signal_agreement_sql())
def q344(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-signal dedup AGREEMENT report: before a 100 TB pipeline
    deletes data, it cross-checks its duplicate signals — here the
    lexical signal (q92's MinHash-LSH verified pairs at Jaccard ≥ 0.8)
    against the semantic signal (q95's cosine pairs at ≥ 0.45, same id
    domain) — and ships the overlap as counts plus the exact pair-set
    Jaccard in integer ppm. Low agreement flags near-dups one signal
    systematically misses (templated text with different topics, or
    paraphrases with no shingle overlap). Plan: both pair generators
    are the already-certified candidate-bounded joins; the comparison
    itself is one FULL OUTER equi-join on the (a, b) pair key and one
    aggregate — O(pairs), never O(corpus²)."""
    from ..operators.similarity import cosine_pairs

    docs = load_table(spark, sf, "documents")
    emb = load_table(spark, sf, "embeddings")
    tp = minhash_lsh_pairs(
        docs, k=3, n_perm=16, band_rows=4, threshold=0.8
    ).select(F.col("doc_a").alias("pa"), F.col("doc_b").alias("pb"))
    ep = cosine_pairs(emb, threshold=0.45).select(
        F.col("id_a").alias("pa"), F.col("id_b").alias("pb")
    )
    j = tp.withColumn("in_text", F.lit(True)).join(
        ep.withColumn("in_emb", F.lit(True)), ["pa", "pb"], "full_outer"
    )
    both = F.sum(
        F.when(F.col("in_text") & F.col("in_emb"), 1).otherwise(0)
    ).cast("long")
    return j.agg(
        F.sum(F.when(F.col("in_text"), 1).otherwise(0))
        .cast("long")
        .alias("n_text_pairs"),
        F.sum(F.when(F.col("in_emb"), 1).otherwise(0))
        .cast("long")
        .alias("n_emb_pairs"),
        both.alias("n_both"),
        F.when(F.count(F.lit(1)) == 0, F.lit(0).cast("long"))
        .otherwise(
            F.expr(
                "CAST(SUM(CASE WHEN in_text AND in_emb THEN 1 ELSE 0 END)"
                " * 1000000 div COUNT(*) AS BIGINT)"
            )
        )
        .alias("jaccard_ppm"),
    )


# ----------------------------------------------- readability scoring ------
def _readability_sql() -> str:
    w = f"len({_WORDS.format(c='text')})"
    s = "GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1)"
    y = "len(regexp_extract_all(lower(text), '[aeiouy]+'))"
    return f"""
    WITH counts AS (
        SELECT doc_id, CAST({w} AS BIGINT) AS n_words,
               CAST({s} AS BIGINT) AS n_sentences,
               CAST({y} AS BIGINT) AS n_syllables
        FROM documents
    )
    SELECT doc_id, n_words, n_sentences, n_syllables,
           CAST(206835 - (1015 * n_words) // n_sentences
                       - (84600 * n_syllables) // n_words AS BIGINT)
             AS flesch_milli
    FROM counts WHERE n_words > 0
    ORDER BY doc_id
    """


@query("q347_readability", oracle=_readability_sql())
def q347(spark: SparkSession, sf: str) -> DataFrame:
    """Flesch reading-ease per document — the classic readability gate
    corpus-curation pipelines run next to q99's quality score (very low
    scores flag machine-generated or degenerate text; very high ones
    flag trivial/listicle content). Counts are pure row-local regex
    extractions (words via the shared token regex, sentences via
    terminal-punctuation runs clamped to ≥ 1, syllables via vowel-group
    runs — the standard dictionary-free approximation), and the score
    is pinned as EXACT integer milli-points (206.835 − 1.015·w/s −
    84.6·y/w scaled ×1000 with integer division) so there is no float
    boundary at all. One scan, zero shuffles before the ORDER BY."""
    docs = load_table(spark, sf, "documents")
    n_words = F.size(words("text")).cast("long")
    n_sent = F.greatest(
        F.size(F.regexp_extract_all("text", F.lit("[.!?]+"), 0)), F.lit(1)
    ).cast("long")
    n_syll = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit("[aeiouy]+"), 0)
    ).cast("long")
    counts = docs.select(
        "doc_id",
        n_words.alias("n_words"),
        n_sent.alias("n_sentences"),
        n_syll.alias("n_syllables"),
    ).where(F.col("n_words") > 0)
    return counts.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        F.expr(
            "CAST(206835 - (1015 * n_words) div n_sentences"
            " - (84600 * n_syllables) div n_words AS BIGINT)"
        ).alias("flesch_milli"),
    ).orderBy("doc_id")


# ------------------------------------------- dedup savings accounting -----
def _dedup_savings_sql() -> str:
    w = f"len({_WORDS.format(c='text')})"
    return f"""
    WITH d AS (
        SELECT doc_id, md5(text) AS h, CAST({w} AS BIGINT) AS toks
        FROM documents
    ),
    g AS (
        SELECT h, CAST(COUNT(*) AS BIGINT) AS sz,
               CAST(MIN(doc_id) AS BIGINT) AS canon,
               CAST(SUM(toks) AS BIGINT) AS toks_all,
               CAST(MIN_BY(toks, doc_id) AS BIGINT) AS toks_canon
        FROM d GROUP BY h
    )
    SELECT CAST(SUM(sz) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(sz - 1) AS BIGINT) AS n_dups,
           CAST(SUM(toks_all) AS BIGINT) AS tokens_total,
           CAST(SUM(toks_all - toks_canon) AS BIGINT) AS tokens_saved,
           CAST(SUM(toks_all - toks_canon) * 1000000
                // GREATEST(SUM(toks_all), 1) AS BIGINT) AS savings_ppm
    FROM g
    """


@query("q351_dedup_savings_report", oracle=_dedup_savings_sql())
def q351(spark: SparkSession, sf: str) -> DataFrame:
    """Dedup SAVINGS accounting — the number a data-curation review
    actually asks for: if exact dedup (q90's content-hash groups,
    min-doc_id canonical) ran today, how many documents and how many
    training tokens would it remove, absolutely and in ppm of the
    corpus? One hash aggregate to groups (carrying size, canonical id,
    and the canonical's token count via MIN_BY/min-struct — duplicate
    groups keep the canonical's tokens, shed the rest), one summary
    aggregate. At 100 TB this is the dry-run gate run BEFORE the
    destructive dedup job, off the same hash shuffle that job would
    use."""
    d = load_table(spark, sf, "documents").select(
        "doc_id",
        F.md5("text").alias("h"),
        F.size(words("text")).cast("long").alias("toks"),
    )
    g = d.groupBy("h").agg(
        F.count(F.lit(1)).cast("long").alias("sz"),
        F.min("doc_id").cast("long").alias("canon"),
        F.sum("toks").cast("long").alias("toks_all"),
        F.min(F.struct("doc_id", "toks"))["toks"]
        .cast("long")
        .alias("toks_canon"),
    )
    return g.agg(
        F.sum("sz").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(F.col("sz") - 1).cast("long").alias("n_dups"),
        F.sum("toks_all").cast("long").alias("tokens_total"),
        F.sum(F.col("toks_all") - F.col("toks_canon"))
        .cast("long")
        .alias("tokens_saved"),
        F.expr(
            "CAST(SUM(toks_all - toks_canon) * 1000000"
            " div GREATEST(SUM(toks_all), 1) AS BIGINT)"
        ).alias("savings_ppm"),
    )


# ----------------------------------------- classifier agreement (kappa) ---
def _kappa_sql() -> str:
    w = _WORDS.format(c="text")
    hits = ", ".join(
        f"len(list_intersect(list_distinct({w}), {_STOP_SQL[lg]})) AS h_{lg}"
        for lg in ("de", "en", "es", "fr")
    )
    return f"""
    WITH hits AS (
        SELECT doc_id, lang, {hits} FROM documents
    ),
    preds AS (
        SELECT lang AS labeled,
               CASE WHEN greatest(h_de, h_en, h_es, h_fr) <= 0 THEN 'und'
                    WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr
                      THEN 'de'
                    WHEN h_en >= h_es AND h_en >= h_fr THEN 'en'
                    WHEN h_es >= h_fr THEN 'es'
                    ELSE 'fr' END AS pred
        FROM hits
    ),
    cells AS (
        SELECT labeled, pred, CAST(COUNT(*) AS BIGINT) AS c
        FROM preds GROUP BY labeled, pred
    ),
    rm AS (SELECT labeled AS k, CAST(SUM(c) AS BIGINT) AS r FROM cells
           GROUP BY labeled),
    cm AS (SELECT pred AS k, CAST(SUM(c) AS BIGINT) AS m FROM cells
           GROUP BY pred),
    s AS (
        SELECT (SELECT CAST(SUM(c) AS BIGINT) FROM cells) AS n,
               (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) FROM cells
                WHERE labeled = pred) AS agree,
               (SELECT CAST(SUM(rm.r * cm.m) AS BIGINT)
                FROM rm JOIN cm ON cm.k = rm.k) AS pe_num
    )
    SELECT n, agree, pe_num,
           CAST((agree * n - pe_num) * 1000000
                // (n * n - pe_num) AS BIGINT) AS kappa_ppm
    FROM s
    """


@query("q360_cohens_kappa", oracle=_kappa_sql())
def q360(spark: SparkSession, sf: str) -> DataFrame:
    """Cohen's kappa between the heuristic language classifier (q97's
    stopword argmax) and the dataset's own labels — chance-corrected
    agreement, the metric that exposes a classifier whose raw accuracy
    merely mirrors the label prior (κ = (p_o − p_e)/(1 − p_e), p_e
    from the marginal products). Everything is exact integer
    arithmetic: the confusion matrix is one hash aggregate, marginals
    re-aggregate its ≤ |langs|² cells, and κ is reported as one
    truncating integer division in ppm — the cross-scaled
    (agree·n − Σrm·cm) / (n² − Σrm·cm) form never materializes a
    float. Companion to q266's confusion matrix and q287's
    calibration table in the model-evaluation kit."""
    docs = load_table(spark, sf, "documents")
    preds = docs.select(
        F.col("lang").alias("labeled"),
        detect_language("text").alias("pred"),
    )
    cells = preds.groupBy("labeled", "pred").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    ).transform(materialize)  # feeds totals, diagonal, both marginals
    rm = cells.groupBy(F.col("labeled").alias("k")).agg(
        F.sum("c").cast("long").alias("r")
    )
    cm = cells.groupBy(F.col("pred").alias("k")).agg(
        F.sum("c").cast("long").alias("m")
    )
    n = cells.agg(F.sum("c").cast("long").alias("n"))
    agree = cells.where(F.col("labeled") == F.col("pred")).agg(
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("agree")
    )
    pe = (
        rm.join(cm, "k")
        .agg(F.sum(F.col("r") * F.col("m")).cast("long").alias("pe_num"))
    )
    return (
        n.crossJoin(F.broadcast(agree))
        .crossJoin(F.broadcast(pe))
        .select(
            "n",
            "agree",
            "pe_num",
            F.expr(
                "CAST((agree * n - pe_num) * 1000000"
                " div (n * n - pe_num) AS BIGINT)"
            ).alias("kappa_ppm"),
        )
    )


# ------------------------------------ k-anonymity / l-diversity audit -----
K_ANON = 5


@query(
    "q366_k_anonymity_audit",
    oracle=f"""
    WITH q AS (
        SELECT c_mktsegment AS segment, c_nationkey,
               CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
               CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
        FROM customer
    ),
    cls AS (
        SELECT segment, c_nationkey, bal_band,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT cents) AS BIGINT) AS l_div
        FROM q GROUP BY segment, c_nationkey, bal_band
    )
    SELECT segment,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(SUM(CASE WHEN n < {K_ANON} THEN 1 ELSE 0 END) AS BIGINT)
               AS unsafe_classes,
           CAST(SUM(n) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN n < {K_ANON} THEN n ELSE 0 END) AS BIGINT)
               AS suppressed_rows,
           CAST(SUM(CASE WHEN n < {K_ANON} THEN n ELSE 0 END) * 1000000
                // SUM(n) AS BIGINT) AS suppressed_ppm,
           CAST(COALESCE(MIN(CASE WHEN n >= {K_ANON} THEN l_div END), 0)
                AS BIGINT) AS min_l_safe
    FROM cls GROUP BY segment ORDER BY segment
    """,
)
def q366(spark: SparkSession, sf: str) -> DataFrame:
    """k-anonymity / l-diversity release audit — the privacy gate a
    governed data release runs BEFORE publishing: quasi-identifiers
    (segment, nation, $1k balance band) partition customers into
    equivalence classes; any class smaller than k={k} re-identifies its
    members and must be suppressed or generalized. Per segment the
    audit reports class counts, the suppression cost of enforcing k
    (rows lost, exact ppm), and the worst l-DIVERSITY among the classes
    that survive — a k-anonymous class whose sensitive value (exact
    balance) is constant still leaks it; min_l_safe = 1 is that alarm.
    Complements q226, which masks PII *within* text; this gate decides
    whether the STRUCTURED release is publishable at all.

    Scale: two hash aggregates (rows → classes → segments), both with
    mergeable partials; the distinct-sensitive count rides the first
    aggregate's key space. No joins, no windows, nothing driver-side —
    the same audit at 100 TB is the same two shuffles."""
    cust = load_table(spark, sf, "customer")
    q = cust.select(
        F.col("c_mktsegment").alias("segment"),
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_band"),
        F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    cls = q.groupBy("segment", "c_nationkey", "bal_band").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.countDistinct("cents").cast("long").alias("l_div"),
    )
    unsafe = F.when(F.col("n") < K_ANON, F.col("n")).otherwise(F.lit(0))
    return (
        cls.groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.sum((F.col("n") < K_ANON).cast("int")).cast("long").alias("unsafe_classes"),
            F.sum("n").cast("long").alias("n_rows"),
            F.sum(unsafe).cast("long").alias("suppressed_rows"),
            F.expr(
                f"CAST(SUM(CASE WHEN n < {K_ANON} THEN n ELSE 0 END) * 1000000"
                " div SUM(n) AS BIGINT)"
            ).alias("suppressed_ppm"),
            F.coalesce(
                F.min(F.when(F.col("n") >= K_ANON, F.col("l_div"))), F.lit(0)
            )
            .cast("long")
            .alias("min_l_safe"),
        )
        .orderBy("segment")
    )


q366.__doc__ = q366.__doc__.format(k=K_ANON)



# --------------------------------- constrained (deadline) funnel ----------
FUNNEL_DEADLINE_US = 72 * 3600 * 1_000_000  # 72h per-step conversion window


@query(
    "q377_constrained_funnel",
    oracle=f"""
    WITH v AS (
        SELECT user_id, MIN(epoch_us(ts)) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2, MIN(v.t1) AS t1
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click'
          AND epoch_us(e.ts) > v.t1
          AND epoch_us(e.ts) <= v.t1 + {FUNNEL_DEADLINE_US}
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(epoch_us(e.ts)) AS t3, MIN(c.t2) AS t2
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase'
          AND epoch_us(e.ts) > c.t2
          AND epoch_us(e.ts) <= c.t2 + {FUNNEL_DEADLINE_US}
        GROUP BY e.user_id
    ),
    n0 AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n FROM events),
    s1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v),
    s2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(COALESCE(SUM(t2 - t1), 0) AS BIGINT) AS sd FROM c),
    s3 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(COALESCE(SUM(t3 - t2), 0) AS BIGINT) AS sd FROM p)
    SELECT * FROM (
        SELECT 'step1_view' AS step, s1.n AS users,
               CASE WHEN n0.n = 0 THEN 0
                    ELSE s1.n * 1000000 // n0.n END AS conv_ppm,
               CAST(0 AS BIGINT) AS mean_delay_us
        FROM s1 CROSS JOIN n0
        UNION ALL
        SELECT 'step2_click', s2.n,
               CASE WHEN s1.n = 0 THEN 0 ELSE s2.n * 1000000 // s1.n END,
               CASE WHEN s2.n = 0 THEN 0 ELSE s2.sd // s2.n END
        FROM s2 CROSS JOIN s1
        UNION ALL
        SELECT 'step3_purchase', s3.n,
               CASE WHEN s2.n = 0 THEN 0 ELSE s3.n * 1000000 // s2.n END,
               CASE WHEN s3.n = 0 THEN 0 ELSE s3.sd // s3.n END
        FROM s3 CROSS JOIN s2)
    ORDER BY step
    """,
)
def q377(spark: SparkSession, sf: str) -> DataFrame:
    """Deadline-constrained funnel — q147's ordered funnel with the
    per-step conversion WINDOW every real product funnel has (click
    within 72h of first view, purchase within 72h of the qualifying
    click), plus per-step conversion ppm and mean step latency. q147
    counts eventual converters; this counts converters WITHIN SLA —
    the number growth teams actually report — and a user whose click
    lands after the deadline drops even if a later click exists
    (greedy first-qualifying-event semantics, pinned in both engines).

    Scale: identical shuffle discipline to q147 — every stage is a
    per-user min-timestamp aggregate joined forward on user_id, one
    reused partitioning, per-user state one timestamp; stage outputs
    shrink monotonically. The step report is three 1-row aggregates
    chained by broadcast (the conversion denominators), never a
    data-scale crossing."""
    ev = load_table(spark, sf, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    v = (
        ev.filter(F.col("event_type") == "view")
        .select("user_id", us.alias("tu"))
        .groupBy("user_id")
        .agg(F.min("tu").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", us.alias("tu"))
        .join(v, "user_id")
        .filter(
            (F.col("tu") > F.col("t1"))
            & (F.col("tu") <= F.col("t1") + F.lit(FUNNEL_DEADLINE_US))
        )
        .groupBy("user_id")
        .agg(F.min("tu").alias("t2"), F.min("t1").alias("t1"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", us.alias("tu"))
        .join(c.select("user_id", "t2"), "user_id")
        .filter(
            (F.col("tu") > F.col("t2"))
            & (F.col("tu") <= F.col("t2") + F.lit(FUNNEL_DEADLINE_US))
        )
        .groupBy("user_id")
        .agg(F.min("tu").alias("t3"), F.min("t2").alias("t2"))
    )
    n0 = ev.agg(F.countDistinct("user_id").cast("long").alias("n0"))
    s1 = v.agg(F.count(F.lit(1)).cast("long").alias("n1"))
    s2 = c.agg(
        F.count(F.lit(1)).cast("long").alias("n2"),
        F.coalesce(F.sum(F.col("t2") - F.col("t1")), F.lit(0))
        .cast("long")
        .alias("sd2"),
    )
    s3 = p.agg(
        F.count(F.lit(1)).cast("long").alias("n3"),
        F.coalesce(F.sum(F.col("t3") - F.col("t2")), F.lit(0))
        .cast("long")
        .alias("sd3"),
    )
    row = (
        s1.crossJoin(F.broadcast(n0))
        .crossJoin(F.broadcast(s2))
        .crossJoin(F.broadcast(s3))
    )
    return row.selectExpr(
        """stack(3,
            'step1_view', n1,
            CASE WHEN n0 = 0 THEN CAST(0 AS BIGINT)
                 ELSE n1 * 1000000 div n0 END,
            CAST(0 AS BIGINT),
            'step2_click', n2,
            CASE WHEN n1 = 0 THEN CAST(0 AS BIGINT)
                 ELSE n2 * 1000000 div n1 END,
            CASE WHEN n2 = 0 THEN CAST(0 AS BIGINT) ELSE sd2 div n2 END,
            'step3_purchase', n3,
            CASE WHEN n2 = 0 THEN CAST(0 AS BIGINT)
                 ELSE n3 * 1000000 div n2 END,
            CASE WHEN n3 = 0 THEN CAST(0 AS BIGINT) ELSE sd3 div n3 END
        ) AS (step, users, conv_ppm, mean_delay_us)"""
    ).orderBy("step")


# ------------------------------ z-order locality / layout pruning audit ----
ZL_FILE_ROWS = 64  # simulated parquet file size (rows per file)


def _zorder_locality_sql() -> str:
    z = _zorder_sql_terms("x", "y", 6)
    return f"""
    WITH base AS (
        SELECT p_partkey, p_size AS x,
               CAST(floor((p_retailprice - 900) / 2) AS INT) AS y
        FROM part
    ),
    keyed AS (SELECT p_partkey, x, y, {z} AS zkey FROM base),
    zlay AS (
        SELECT x, y,
               (ROW_NUMBER() OVER (ORDER BY zkey, p_partkey) - 1)
                   // {ZL_FILE_ROWS} AS f
        FROM keyed
    ),
    llay AS (
        SELECT x, y,
               (ROW_NUMBER() OVER (ORDER BY x, y, p_partkey) - 1)
                   // {ZL_FILE_ROWS} AS f
        FROM keyed
    ),
    tagged AS (
        SELECT 'zorder' AS layout, x, y, f FROM zlay
        UNION ALL SELECT 'lexicographic', x, y, f FROM llay
    ),
    preds AS (
        SELECT layout, 'x_band' AS predicate, f,
               CAST(COUNT(*) FILTER (WHERE x BETWEEN 10 AND 19) AS BIGINT)
                   AS hits
        FROM tagged GROUP BY layout, f
        UNION ALL
        SELECT layout, 'y_band', f,
               CAST(COUNT(*) FILTER (WHERE y BETWEEN 10 AND 19) AS BIGINT)
        FROM tagged GROUP BY layout, f
    )
    SELECT layout, predicate,
           CAST(COUNT(*) AS BIGINT) AS files_total,
           CAST(COUNT(*) FILTER (WHERE hits > 0) AS BIGINT) AS files_touched,
           CAST(SUM(hits) AS BIGINT) AS rows_matched,
           CAST(COUNT(*) FILTER (WHERE hits > 0) * 1000000
                // COUNT(*) AS BIGINT) AS touched_ppm
    FROM preds GROUP BY layout, predicate
    ORDER BY layout, predicate
    """


@query("q383_zorder_locality_audit", oracle=_zorder_locality_sql())
def q383(spark: SparkSession, sf: str) -> DataFrame:
    """Layout A/B audit for multi-dimensional clustering: simulate
    {n}-row files under q138's z-order key versus a lexicographic
    (x, y) sort, then measure how many files a single-dimension band
    predicate actually touches in each layout. This is the number that
    justifies (or rejects) an OPTIMIZE ZORDER run before anyone pays
    for the rewrite: lexicographic prunes beautifully on the leading
    column and not at all on the trailing one; z-order prunes BOTH at
    ~sqrt cost — and the report shows exactly that asymmetry as
    touched_ppm per (layout, predicate). q138 mints the key; q319/q267
    audit value- and content-level skipping; this audits the LAYOUT,
    the remaining piece of the data-skipping stack.

    Scale: the file id is a global rank — minted by
    `deterministic_id(fact_scale=True)` (range exchange + partition-
    local windows + literal-map offsets), never a partitionless window
    over data-scale rows (the oracle's ROW_NUMBER() OVER (ORDER BY) is
    exactly the shape it replaces); per-(layout, file) hit counts and
    the final report are two bounded hash aggregates."""
    from ..functions.refops import deterministic_id

    p = load_table(spark, sf, "part").select(
        "p_partkey",
        F.col("p_size").alias("x"),
        F.floor((F.col("p_retailprice") - 900) / 2).cast("int").alias("y"),
    )
    zkey = F.lit(0)
    for i in range(6):
        zkey = zkey + F.shiftleft(
            F.shiftright(F.col("x"), i).bitwiseAND(F.lit(1)), 2 * i
        )
        zkey = zkey + F.shiftleft(
            F.shiftright(F.col("y"), i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
    keyed = p.withColumn("zkey", zkey).transform(materialize)

    def layout(df: DataFrame, order: list[str], tag: str) -> DataFrame:
        ranked = deterministic_id(df, order, name="rid", fact_scale=True)
        return ranked.select(
            F.lit(tag).alias("layout"),
            "x",
            "y",
            F.expr(f"CAST((rid - 1) div {ZL_FILE_ROWS} AS BIGINT)").alias("f"),
        )

    tagged = layout(keyed, ["zkey", "p_partkey"], "zorder").unionByName(
        layout(keyed, ["x", "y", "p_partkey"], "lexicographic")
    )
    preds = None
    for pname, col, lo, hi in [
        ("x_band", "x", 10, 19),
        ("y_band", "y", 10, 19),
    ]:
        g = tagged.groupBy("layout", "f").agg(
            F.sum(
                F.when(F.col(col).between(lo, hi), 1).otherwise(0)
            )
            .cast("long")
            .alias("hits")
        ).select("layout", F.lit(pname).alias("predicate"), "f", "hits")
        preds = g if preds is None else preds.unionByName(g)
    return (
        preds.groupBy("layout", "predicate")
        .agg(
            F.count(F.lit(1)).cast("long").alias("files_total"),
            F.sum((F.col("hits") > 0).cast("int"))
            .cast("long")
            .alias("files_touched"),
            F.sum("hits").cast("long").alias("rows_matched"),
            F.expr(
                "CAST(SUM(CASE WHEN hits > 0 THEN 1 ELSE 0 END) * 1000000"
                " div COUNT(*) AS BIGINT)"
            ).alias("touched_ppm"),
        )
        .orderBy("layout", "predicate")
    )


q383.__doc__ = q383.__doc__.format(n=ZL_FILE_ROWS)


# -------------------------- small-cell suppression (disclosure control) ----
SDC_K = 12  # primary suppression threshold for published cells


@query(
    "q386_cell_suppression",
    oracle=f"""
    WITH cells AS (
        SELECT n.n_name, c.c_mktsegment AS seg,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name, seg
    ),
    p1 AS (
        SELECT *, CASE WHEN cnt < {SDC_K} THEN 1 ELSE 0 END AS prim
        FROM cells
    ),
    rowstat AS (
        SELECT *, SUM(prim) OVER (PARTITION BY n_name) AS row_supp,
               ROW_NUMBER() OVER (PARTITION BY n_name, prim
                    ORDER BY cnt, seg) AS rr
        FROM p1
    ),
    p2 AS (
        SELECT n_name, seg, cnt, prim,
               CASE WHEN prim = 0 AND row_supp = 1 AND rr = 1
                    THEN 1 ELSE 0 END AS rowc
        FROM rowstat
    ),
    colstat AS (
        SELECT *, SUM(prim + rowc) OVER (PARTITION BY seg) AS col_supp,
               ROW_NUMBER() OVER (PARTITION BY seg, prim + rowc
                    ORDER BY cnt, n_name) AS cr
        FROM p2
    ),
    p3 AS (
        SELECT n_name, seg, cnt, prim, rowc,
               CASE WHEN prim = 0 AND rowc = 0 AND col_supp = 1 AND cr = 1
                    THEN 1 ELSE 0 END AS colc
        FROM colstat
    )
    SELECT n_name, seg AS c_mktsegment, cnt AS n_customers,
           CASE WHEN prim = 1 THEN 'suppressed_primary'
                WHEN rowc = 1 THEN 'suppressed_row_comp'
                WHEN colc = 1 THEN 'suppressed_col_comp'
                ELSE 'published' END AS status
    FROM p3 ORDER BY n_name, c_mktsegment
    """,
)
def q386(spark: SparkSession, sf: str) -> DataFrame:
    """Small-cell suppression for a published nation×segment count table
    — the statistical-disclosure-control step every census/health
    agency runs before releasing aggregates: cells under k={k} are
    primary-suppressed, and because a row (or column) with exactly ONE
    suppressed cell lets the marginal total reveal it, one round of
    complementary suppression hides the smallest surviving cell in
    each singly-suppressed row, then column. q366 audits MICRODATA
    k-anonymity (can a released row be re-identified); this protects
    the AGGREGATE release — the two halves of a disclosure-control
    pipeline. Real SDC iterates row/column rounds to a fixed point;
    the registered, oracle-checkable form is the first full round —
    the q374 single-round contract.

    Deterministic: suppression picks rank on (count, name) — no
    arbitrary engine choice survives. Scale: one hash aggregate to the
    25×5 cell table; every window is partitioned by nation or segment
    over bounded cells. At a 10^6-cell release the same plan holds —
    windows stay keyed, nothing global."""
    c = load_table(spark, sf, "customer").select("c_nationkey", "c_mktsegment")
    n = load_table(spark, sf, "nation").select("n_nationkey", "n_name")
    cells = (
        c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", F.col("c_mktsegment").alias("seg"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    p1 = cells.withColumn(
        "prim", F.when(F.col("cnt") < SDC_K, 1).otherwise(0)
    )
    wrow = W.partitionBy("n_name")
    wrr = W.partitionBy("n_name", "prim").orderBy("cnt", "seg")
    p2 = (
        p1.withColumn("row_supp", F.sum("prim").over(wrow))
        .withColumn("rr", F.row_number().over(wrr))
        .withColumn(
            "rowc",
            F.when(
                (F.col("prim") == 0)
                & (F.col("row_supp") == 1)
                & (F.col("rr") == 1),
                1,
            ).otherwise(0),
        )
        .drop("row_supp", "rr")
    )
    wcol = W.partitionBy("seg")
    wcr = W.partitionBy("seg", (F.col("prim") + F.col("rowc"))).orderBy(
        "cnt", "n_name"
    )
    p3 = (
        p2.withColumn(
            "col_supp", F.sum(F.col("prim") + F.col("rowc")).over(wcol)
        )
        .withColumn("cr", F.row_number().over(wcr))
        .withColumn(
            "colc",
            F.when(
                (F.col("prim") == 0)
                & (F.col("rowc") == 0)
                & (F.col("col_supp") == 1)
                & (F.col("cr") == 1),
                1,
            ).otherwise(0),
        )
    )
    status = (
        F.when(F.col("prim") == 1, "suppressed_primary")
        .when(F.col("rowc") == 1, "suppressed_row_comp")
        .when(F.col("colc") == 1, "suppressed_col_comp")
        .otherwise("published")
    )
    return p3.select(
        "n_name",
        F.col("seg").alias("c_mktsegment"),
        F.col("cnt").alias("n_customers"),
        status.alias("status"),
    ).orderBy("n_name", "c_mktsegment")


q386.__doc__ = q386.__doc__.format(k=SDC_K)


# ----------------------------- Shapley-value marketing attribution --------
SHAP_WINDOW_US = 48 * 3600 * 1_000_000  # exposure window before 1st purchase


@query(
    "q391_shapley_attribution",
    oracle=f"""
    WITH p AS (
        SELECT user_id, MIN(epoch_us(ts)) AS t FROM events
        WHERE event_type = 'purchase' GROUP BY user_id
    ),
    x AS (
        SELECT DISTINCT e.user_id, e.event_type
        FROM events e JOIN p ON e.user_id = p.user_id
        WHERE e.event_type IN ('view', 'click', 'signup')
          AND epoch_us(e.ts) < p.t
          AND epoch_us(e.ts) >= p.t - {SHAP_WINDOW_US}
    ),
    s AS (
        SELECT user_id,
               CAST(MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                    AS INT) AS v,
               CAST(MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    AS INT) AS c,
               CAST(MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                    AS INT) AS g
        FROM x GROUP BY user_id
    ),
    n AS (
        SELECT
            CAST(COUNT(*) AS BIGINT) AS total,
            CAST(COUNT(*) FILTER (WHERE v=1 AND c=0 AND g=0) AS BIGINT) AS nv,
            CAST(COUNT(*) FILTER (WHERE v=0 AND c=1 AND g=0) AS BIGINT) AS nc,
            CAST(COUNT(*) FILTER (WHERE v=0 AND c=0 AND g=1) AS BIGINT) AS ng,
            CAST(COUNT(*) FILTER (WHERE v=1 AND c=1 AND g=0) AS BIGINT) AS nvc,
            CAST(COUNT(*) FILTER (WHERE v=1 AND c=0 AND g=1) AS BIGINT) AS nvg,
            CAST(COUNT(*) FILTER (WHERE v=0 AND c=1 AND g=1) AS BIGINT) AS ncg,
            CAST(COUNT(*) FILTER (WHERE v=1 AND c=1 AND g=1) AS BIGINT) AS nvcg
        FROM s
    ),
    phi AS (
        SELECT total,
               6*nv + 3*nvc + 3*nvg + 2*nvcg AS p_view,
               6*nc + 3*nvc + 3*ncg + 2*nvcg AS p_click,
               6*ng + 3*nvg + 3*ncg + 2*nvcg AS p_signup,
               nv + nvc + nvg + nvcg AS e_view,
               nc + nvc + ncg + nvcg AS e_click,
               ng + nvg + ncg + nvcg AS e_signup
        FROM n
    )
    SELECT channel, exposed_converters,
           CAST(phi6 AS BIGINT) AS phi6,
           CAST(phi6 * 1000000 // 6 AS BIGINT) AS phi_micro,
           CAST(phi6 * 1000000 // (6 * total) AS BIGINT) AS share_ppm
    FROM (
        SELECT total, 'click' AS channel, e_click AS exposed_converters,
               p_click AS phi6 FROM phi
        UNION ALL
        SELECT total, 'signup', e_signup, p_signup FROM phi
        UNION ALL
        SELECT total, 'view', e_view, p_view FROM phi)
    ORDER BY channel
    """,
)
def q391(spark: SparkSession, sf: str) -> DataFrame:
    """Shapley-value conversion attribution over the three marketing
    channels (view/click/signup exposure in the 48h before a user's
    first purchase) — the game-theoretic, order-free credit split that
    q265's last-touch and q312's position rules approximate: each
    channel's credit is its average marginal contribution across all
    3! coalition orderings, computed in closed form from the 7
    exact-exposure-set converter counts. With characteristic v(S) =
    converters whose exposure set ⊆ S, the formula collapses to
    φ6_i = 6·n_own + 3·(each pair containing i) + 2·n_all — exact
    integers in 1/6-conversion units (Σφ6 = 6·total: efficiency holds
    by construction, and the driver hash pins it). Converters with no
    exposure in the window cancel out of every marginal and are
    excluded; the q374 single-configuration contract.

    Scale: one keyed join (events⋈first-purchase) and one per-user
    aggregate; the subset census is a single 8-counter row, the
    Shapley arithmetic row-local on it. Channels beyond ~10 need
    sampled permutations — documented boundary, not hit here."""
    ev = load_table(spark, sf, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    p = (
        ev.where(F.col("event_type") == "purchase")
        .select("user_id", us.alias("tu"))
        .groupBy("user_id")
        .agg(F.min("tu").alias("t"))
    )
    x = (
        ev.where(F.col("event_type").isin("view", "click", "signup"))
        .select("user_id", "event_type", us.alias("tu"))
        .join(p, "user_id")
        .where(
            (F.col("tu") < F.col("t"))
            & (F.col("tu") >= F.col("t") - F.lit(SHAP_WINDOW_US))
        )
        .select("user_id", "event_type")
        .distinct()
    )
    s = x.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("v"),
        F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("c"),
        F.max(F.when(F.col("event_type") == "signup", 1).otherwise(0)).alias("g"),
    )

    def cnt(vv: int, cc: int, gg: int):
        return F.sum(
            F.when(
                (F.col("v") == vv) & (F.col("c") == cc) & (F.col("g") == gg), 1
            ).otherwise(0)
        ).cast("long")

    n = s.agg(
        F.count(F.lit(1)).cast("long").alias("total"),
        cnt(1, 0, 0).alias("nv"),
        cnt(0, 1, 0).alias("nc"),
        cnt(0, 0, 1).alias("ng"),
        cnt(1, 1, 0).alias("nvc"),
        cnt(1, 0, 1).alias("nvg"),
        cnt(0, 1, 1).alias("ncg"),
        cnt(1, 1, 1).alias("nvcg"),
    )
    phi = n.selectExpr(
        "total",
        "6*nv + 3*nvc + 3*nvg + 2*nvcg AS p_view",
        "6*nc + 3*nvc + 3*ncg + 2*nvcg AS p_click",
        "6*ng + 3*nvg + 3*ncg + 2*nvcg AS p_signup",
        "nv + nvc + nvg + nvcg AS e_view",
        "nc + nvc + ncg + nvcg AS e_click",
        "ng + nvg + ncg + nvcg AS e_signup",
    )
    return (
        phi.selectExpr(
            """stack(3,
                'click', e_click, p_click,
                'signup', e_signup, p_signup,
                'view', e_view, p_view
            ) AS (channel, exposed_converters, phi6)""",
            "total",
        )
        .selectExpr(
            "channel",
            "CAST(exposed_converters AS BIGINT) AS exposed_converters",
            "CAST(phi6 AS BIGINT) AS phi6",
            "CAST(phi6 * 1000000 div 6 AS BIGINT) AS phi_micro",
            "CAST(phi6 * 1000000 div (6 * total) AS BIGINT) AS share_ppm",
        )
        .orderBy("channel")
    )


# --------------------------- winnowing fingerprints (MOSS) ----------------
WIN_K = 8  # k-gram length (chars)
WIN_W = 4  # winnowing window (k-gram hashes per window)
WIN_SHARED_T = 5  # report pairs sharing at least this many fingerprints
WIN_CHUNK = 1024  # hot posting-list chunk rows: one pair task ≤ ~CHUNK² pairs


def _chunked_posting_pairs(
    e: DataFrame, n_part: int, chunk: int = WIN_CHUNK
) -> DataFrame:
    """Unordered co-posting pairs (doc_a < doc_b per shared key) from a
    posting list ``(doc_id, fp)`` with every key's pair space split
    across tasks — the HOT arm of ``_posting_pairs_skew_split``.

    Triangular chunking: rows of each posting list get a contiguous
    chunk index (``row_number() over fp`` ordered by doc_id, ``chunk``
    rows each), the LEFT arm replicates a row of chunk ``ca`` to every
    target chunk ``tc ∈ [ca, n_chunks)``, the RIGHT arm to every source
    chunk ``sc ∈ [0, cb]``, and the join key becomes the full
    ``(fp, chunk, chunk)`` triple — so a df-D list spreads over
    C(C+1)/2 tasks of ≤ chunk² pairs each (C = ⌈D/chunk⌉) instead of
    one D²/2 task. Pair-set equivalence to the naive self-join: chunks
    are contiguous in doc_id order, so a pair a < b has
    chunk(a) ≤ chunk(b); orientation (left=a, right=b) matches the key
    exactly once, and the only double-match (diagonal chunks) is killed
    by the same ``doc_a < doc_b`` filter the naive join uses. Pinned by
    tests against the naive join on a crafted hot-key corpus."""
    wfp = W.partitionBy("fp").orderBy("doc_id")
    ec = (
        e.repartition(n_part, "fp")
        .withColumn(
            "ck",
            ((F.row_number().over(wfp) - F.lit(1)) / F.lit(chunk)).cast("int"),
        )
        .withColumn("nck", F.max("ck").over(W.partitionBy("fp")))
    )
    a = (
        ec.withColumn(
            "tc", F.explode(F.sequence(F.col("ck"), F.col("nck")))
        )
        .select(
            F.col("doc_id").alias("doc_a"),
            "fp",
            F.col("ck").alias("c_lo"),
            F.col("tc").alias("c_hi"),
        )
        .repartition(n_part, "fp", "c_lo", "c_hi")
    )
    b = (
        ec.withColumn("sc", F.explode(F.sequence(F.lit(0), F.col("ck"))))
        .select(
            F.col("doc_id").alias("doc_b"),
            "fp",
            F.col("sc").alias("c_lo"),
            F.col("ck").alias("c_hi"),
        )
        .repartition(n_part, "fp", "c_lo", "c_hi")
        .hint("shuffle_hash")
    )
    return (
        a.join(b, ["fp", "c_lo", "c_hi"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
    )


def _posting_pairs_skew_split(
    e: DataFrame, hist: DataFrame, n_part: int, chunk: int = WIN_CHUNK
) -> DataFrame:
    """Co-posting pairs with guide-§2.5 hot-key special-casing:
    shuffle-join the cold keys exactly as before, triangular-chunk ONLY
    the hot posting lists (df > ``chunk``), union the two pair streams.

    Why the split instead of chunking everything: chunking un-gated was
    a measured NON-win at sf0.1 (9.29 → 11.75 s noop-sink on the q397
    pair+aggregate path) — the window/replication overhead is paid on
    EVERY posting row while the straggler it fixes (max-task 2.70 s vs
    0.96 s median on the 127-task pair stage) does not gate a stage
    that wide. Hot lists are the q397 skew class partitioning cannot
    split (one join key = one task; AQE skew handling cannot divide a
    single key): at corpus scale a boilerplate fingerprint with df ≫
    chunk would put df²/2 pairs on one task — THOSE lists, and only
    those, pay the chunk machinery; everything else takes the naive
    single-exchange path unchanged. The hot list (keys of the already-
    materialized df histogram with df > chunk) is tiny and broadcasts
    into an anti/semi pair on the posting stream — no extra shuffle of
    the postings; each pair lands in exactly one arm (its key is hot or
    cold), so the union is a partition of the naive join's output
    (pinned by tests on a crafted hot-key corpus)."""
    hot = F.broadcast(hist.where(F.col("c") > chunk).select("fp"))
    e_cold = e.join(hot, "fp", "left_anti").repartition(n_part, "fp")
    a = e_cold.select(F.col("doc_id").alias("doc_a"), "fp")
    # SHUFFLE_HASH: the pair expansion feeds only the shared-count
    # aggregate — sorting it is the round-6 q335-class waste (measured
    # 40-47 s -> 13-18 s at sf0.1 for this query); both arms share the
    # explicit fp-partitioning, so the join adds no exchange beyond the
    # one slim posting-list repartition
    b = e_cold.select(F.col("doc_id").alias("doc_b"), "fp").hint("shuffle_hash")
    cold_pairs = (
        a.join(b, "fp")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
    )
    e_hot = e.join(hot, "fp", "left_semi")
    hot_pairs = _chunked_posting_pairs(e_hot, n_part, chunk)
    return cold_pairs.unionByName(hot_pairs)


@query(
    "q397_winnowing_pairs",
    oracle=f"""
    WITH h AS (
        SELECT doc_id,
               [{_H64.format(x="substr(text, i, {k})").format(k=WIN_K)}
                for i in range(1, greatest(length(text) - {WIN_K - 1}, 1) + 1)]
                   AS hs
        FROM documents
    ),
    w AS (
        SELECT doc_id,
               list_distinct([list_min(hs[i:i+{WIN_W - 1}])
                   for i in range(1, greatest(len(hs) - {WIN_W - 1}, 1) + 1)])
                   AS fps
        FROM h
    ),
    e AS (SELECT doc_id, unnest(fps) AS fp FROM w),
    p AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(COUNT(*) AS BIGINT) AS shared_fps
        FROM e a JOIN e b ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY doc_a, doc_b
    )
    SELECT doc_a, doc_b, shared_fps
    FROM p WHERE shared_fps >= {WIN_SHARED_T}
    ORDER BY doc_a, doc_b
    """,
)
def q397(spark: SparkSession, sf: str) -> DataFrame:
    """Winnowing fingerprints (the MOSS plagiarism-detection algorithm):
    hash every {k}-char gram, slide a {w}-hash window, keep each
    window's MINIMUM — the selected set is guaranteed to share a
    fingerprint with any copy that overlaps ≥ w+k−1 characters
    (winnowing's coverage theorem), unlike q92's MinHash which bounds
    SIMILARITY, not guaranteed substring detection. q100 keeps one
    global min (a 1-sample sketch); this keeps the full winnowed set
    and reports document pairs sharing ≥ {t} fingerprints — the
    shared-boilerplate / copied-passage detector (q213 scores
    boilerplate per SHINGLE frequency; this localizes which PAIRS
    share verbatim runs). Keeping only the hash (not its position)
    makes the window tie rule irrelevant — the set contract is pinned
    without robust-winnowing's rightmost-tie clause.

    Scale: per-document work is two row-local HOFs (hash array, then
    window minima via slice — zero Python); pair generation is the
    inverted-index equi-join on fingerprint (q91's shape), never
    doc×doc. A hot fingerprint (corpus-wide boilerplate) fans out like
    any hot shingle — its pair space is split across tasks by the
    triangular chunking in ``_chunked_posting_pairs`` (round 12), and
    the q91 df-cap guard remains the recall-lossy remedy when even the
    chunked pair VOLUME is unaffordable at corpus scale."""
    from ..functions.text import h64
    from ..operators.dedup import _spread

    # the winnowing pass hashes every k-gram of every document (~54M h64
    # evaluations at sf0.1) — _spread it off the single-row-group scan
    # task like every other signature pass in operators/dedup.py
    docs = _spread(load_table(spark, sf, "documents"), ["doc_id", "text"])
    n_pos = F.greatest(F.length("text") - (WIN_K - 1), F.lit(1))
    hs = F.transform(
        F.sequence(F.lit(1), n_pos),
        lambda i: h64(F.col("text").substr(i, F.lit(WIN_K))),
    )
    h = docs.select("doc_id", hs.alias("hs"))
    n_win = F.greatest(F.size("hs") - (WIN_W - 1), F.lit(1))
    fps = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), n_win),
            lambda i: F.array_min(F.slice(F.col("hs"), i, WIN_W)),
        )
    )
    # the winnowed posting list is probed three times (df histogram +
    # both join arms) and the HOF fingerprint pass is the scan-side
    # cost — derive it once. Exchange sizing (round 7, the q242 lesson
    # applied to the inverted-index family): the pair stream is
    # Σ df(df-1)/2 — 102.9M pairs from 539k postings at sf0.1 — but AQE
    # coalesces the join and aggregate exchanges by BYTES (the postings
    # are slim), which put ~100 CPU-core-seconds of pair hashing on 8
    # tasks. Compute the exact pair count from the df histogram (O(1)
    # scalar on the materialized posting list) and run the fingerprint
    # join and the (doc_a, doc_b) aggregate at pairs/750k partitions.
    # Round 12: the hot-fingerprint straggler (max df 3,859 -> 7.4M
    # pairs from ONE posting list — producer-side expansion skew that
    # fp-partitioning cannot split) is special-cased by
    # _posting_pairs_skew_split: posting lists with df > WIN_CHUNK are
    # triangular-chunked so their pair space spreads over
    # ⌈df/WIN_CHUNK⌉·(⌈df/WIN_CHUNK⌉+1)/2 tasks of ≤ WIN_CHUNK² pairs;
    # sub-chunk lists (the overwhelming majority) keep the naive
    # single-exchange path. The df histogram that already sizes the
    # exchanges is materialized so the hot-key list derives from it
    # without re-aggregating the postings.
    e = materialize(h.select("doc_id", F.explode(fps).alias("fp")))
    hist = materialize(
        e.groupBy("fp").agg(F.count(F.lit(1)).alias("c"))
    )
    n_pairs = (
        hist.agg(F.sum(F.col("c") * (F.col("c") - F.lit(1)) / 2).alias("p"))
        .collect()[0][0]
    )
    n_part = expansion_partitions(spark, n_pairs)
    return (
        _posting_pairs_skew_split(e, hist, n_part)
        # the explicit (doc_a, doc_b) repartition IS the aggregate's
        # exchange — per-task hash-agg state bounded at ~750k pair rows
        .repartition(n_part, "doc_a", "doc_b")
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared_fps"))
        .where(F.col("shared_fps") >= WIN_SHARED_T)
        .orderBy("doc_a", "doc_b")
    )


q397.__doc__ = q397.__doc__.format(k=WIN_K, w=WIN_W, t=WIN_SHARED_T)


# ----------------------- sample-ratio-mismatch (SRM) experiment guard ------
# chi-square GoF vs 50/50 collapses to (O0-O1)^2/n — exact rational,
# carried in 1e-9 units; 3.841 (chi2_1df, p=0.05) is the standard gate
SRM_CRIT_Q9 = 3_841_000_000


@query(
    "q401_srm_check",
    oracle=f"""
    WITH a AS (
        SELECT DISTINCT user_id,
               {_H64.format(x="'exp1:' || CAST(user_id AS VARCHAR)")} % 2
                   AS bucket
        FROM events
    ),
    d AS (
        SELECT CAST(floor(epoch_us(e.ts) / 86400000000) AS BIGINT) AS day,
               a.bucket, e.user_id
        FROM events e JOIN a ON e.user_id = a.user_id
    ),
    g AS (
        SELECT day,
               CAST(COUNT(DISTINCT CASE WHEN bucket = 0 THEN user_id END)
                    AS BIGINT) AS n0,
               CAST(COUNT(DISTINCT CASE WHEN bucket = 1 THEN user_id END)
                    AS BIGINT) AS n1
        FROM d GROUP BY day
    )
    SELECT day, n0, n1,
           CAST((n0 - n1) * (n0 - n1) * 1000000000 // (n0 + n1) AS BIGINT)
               AS chi2_q9,
           CAST(CASE WHEN (n0 - n1) * (n0 - n1) * 1000000000
                          // (n0 + n1) > {SRM_CRIT_Q9}
                THEN 1 ELSE 0 END AS BIGINT) AS srm_flag
    FROM g ORDER BY day
    """,
)
def q401(spark: SparkSession, sf: str) -> DataFrame:
    """Sample-ratio-mismatch guard — the FIRST health check any A/B
    readout must pass (an unbalanced split means broken assignment or
    differential logging, and every downstream stat in q206/q348-q350
    is garbage): daily distinct users per hash-assigned bucket, and
    the 1-df chi-square goodness-of-fit against the designed 50/50,
    which collapses algebraically to (n0−n1)²/n — EXACT rational,
    carried in 1e-9 integer units with the standard 3.841 (p=0.05)
    gate as an integer constant. No libm, no approximation: the one
    experimentation statistic that needs no float at all. Assignment
    is the shared md5 hash (deterministic, the q109/q268 split
    family), so the driver hash pins assignment AND verdict.

    Scale: one distinct-aggregate for assignment, one keyed join back
    to events, one (day, bucket) distinct-count aggregate — the q30
    two-level distinct discipline; the chi-square is row-local on the
    O(days) table."""
    from ..functions.text import h64

    ev = load_table(spark, sf, "events").select("user_id", "ts")
    a = (
        ev.select("user_id")
        .distinct()
        .select(
            "user_id",
            F.pmod(
                h64(F.concat(F.lit("exp1:"), F.col("user_id").cast("string"))),
                F.lit(2),
            ).alias("bucket"),
        )
    )
    d = ev.join(a, "user_id").select(
        F.floor(
            F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(86_400_000_000)
        )
        .cast("long")
        .alias("day"),
        "bucket",
        "user_id",
    )
    g = d.groupBy("day").agg(
        F.countDistinct(
            F.when(F.col("bucket") == 0, F.col("user_id"))
        )
        .cast("long")
        .alias("n0"),
        F.countDistinct(
            F.when(F.col("bucket") == 1, F.col("user_id"))
        )
        .cast("long")
        .alias("n1"),
    )
    chi2 = F.expr(
        "CAST((n0 - n1) * (n0 - n1) * 1000000000 div (n0 + n1) AS BIGINT)"
    )
    return g.select(
        "day",
        "n0",
        "n1",
        chi2.alias("chi2_q9"),
        F.when(chi2 > SRM_CRIT_Q9, 1).otherwise(0).cast("long").alias(
            "srm_flag"
        ),
    ).orderBy("day")


# ------------------- expected calibration error (ECE) ----------------------
ECE_TEMP = 300  # temperature: logit/T before the sigmoid (pinned constant)


@query(
    "q411_expected_calibration_error",
    oracle=f"""
    WITH scored AS (
        SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
               CAST(floor(1.0 / (1.0 + exp(-(CAST({{logit}} AS DOUBLE)
                    / {ECE_TEMP}))) * 1000000000 + 0.5) AS BIGINT)
                   AS conf_q9
        FROM documents
    ),
    b AS (
        SELECT LEAST(conf_q9 // 100000000, 9) AS bin, pos, conf_q9
        FROM scored
    ),
    g AS (
        SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(pos) AS BIGINT) AS n_pos,
               CAST(SUM(conf_q9) AS BIGINT) AS sum_conf
        FROM b GROUP BY bin
    ),
    w AS (
        SELECT bin, n, n_pos,
               CAST(n_pos * 1000000 // n AS BIGINT) AS acc_ppm,
               CAST(sum_conf // (n * 1000) AS BIGINT) AS conf_ppm
        FROM g
    ),
    e AS (
        SELECT CAST(SUM(n * ABS(acc_ppm - conf_ppm)) // SUM(n) AS BIGINT)
            AS ece_ppm
        FROM w
    )
    SELECT w.bin, w.n, w.n_pos, w.acc_ppm, w.conf_ppm,
           CAST(ABS(w.acc_ppm - w.conf_ppm) AS BIGINT) AS gap_ppm,
           e.ece_ppm
    FROM w CROSS JOIN e
    ORDER BY w.bin
    """.format(logit="{logit}").format(logit=_LOGIT_SQL),
)
def q411(spark: SparkSession, sf: str) -> DataFrame:
    """Expected calibration error of the q231 hashed classifier (label:
    lang = 'en'), temperature-scaled (logit/{t}) to a sigmoid
    confidence: per confidence decile the observed accuracy vs mean
    stated confidence, and ECE = Σ (n_b/N)·|acc_b − conf_b| — THE
    one-number calibration metric modern eval suites report. q287
    tables raw-logit reliability; this converts to the probability
    scale where the gap is actionable, and q395's isotonic fit is the
    REPAIR once ECE is too high — gate → table → score → fix, the
    full calibration workflow. The per-document sigmoid is the only
    libm op and is floor-quantized to 1e-9 BEFORE any aggregation
    (q328's per-term discipline); everything after is integer ppm
    arithmetic, ECE included.

    Scale: one row-local scoring pass (the logit is q231's exact
    integer HOF fold — zero Python), one hash aggregate to ≤10
    confidence bins, one 1-row ECE broadcast."""
    docs = load_table(spark, sf, "documents")
    logit = _hashed_logit()
    conf = F.floor(
        F.lit(1.0)
        / (F.lit(1.0) + F.exp(-(logit.cast("double") / F.lit(ECE_TEMP))))
        * F.lit(1e9)
        + F.lit(0.5)
    ).cast("long")
    b = docs.select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
        conf.alias("conf_q9"),
    ).select(
        F.least(F.expr("conf_q9 div 100000000"), F.lit(9)).alias("bin"),
        "pos",
        "conf_q9",
    )
    g = b.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("pos").cast("long").alias("n_pos"),
        F.sum("conf_q9").cast("long").alias("sum_conf"),
    )
    w = g.select(
        "bin",
        "n",
        "n_pos",
        F.expr("CAST(n_pos * 1000000 div n AS BIGINT)").alias("acc_ppm"),
        F.expr("CAST(sum_conf div (n * 1000) AS BIGINT)").alias("conf_ppm"),
    ).transform(materialize)
    e = w.agg(
        F.expr(
            "CAST(SUM(n * ABS(acc_ppm - conf_ppm)) div SUM(n) AS BIGINT)"
        ).alias("ece_ppm")
    )
    return (
        w.crossJoin(F.broadcast(e))
        .select(
            "bin",
            "n",
            "n_pos",
            "acc_ppm",
            "conf_ppm",
            F.abs(F.col("acc_ppm") - F.col("conf_ppm"))
            .cast("long")
            .alias("gap_ppm"),
            "ece_ppm",
        )
        .orderBy("bin")
    )


q411.__doc__ = q411.__doc__.format(t=ECE_TEMP)
