"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk``: exact top-k cosine for a bounded query set — the
  correctness baseline. Queries are broadcast; candidates stream through
  codegen'd dot products. Right answer whenever |queries| is small.
- ``cosine_pairs``: exact near-dup pairs above a cosine threshold
  (bounded inputs / verification use).
- ``lsh_ann_topk``: the scale path — random-hyperplane LSH buckets via a
  seeded numpy projection inside ``mapInPandas`` (Arrow-batched), then
  exact re-rank within buckets. Sub-linear candidate generation; recall
  measured against the brute-force baseline in tests.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine


def _rounded_cosine(a, b):
    return F.floor(cosine(a, b) * 1000000 + F.lit(0.5)) / 1000000


def brute_force_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    queries × candidates via a broadcast nested-loop (queries are the tiny
    side); cosine evaluated as a codegen'd fold — no Python boundary.
    Deterministic: ranking on the (deterministically rounded) cosine with
    candidate-id tie-break.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = candidates.select(
        F.col(id_col).alias("candidate_id"), F.col(vec_col).alias("cv")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "candidate_id",
        _rounded_cosine(F.col("qv"), F.col("cv")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("candidate_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "candidate_id", "cos_sim", "rank")
    )


def cosine_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact pairs with cosine >= threshold (embedding-cosine near-dup).

    O(n²) pair space — correct tool only for bounded n (verification,
    per-bucket re-scoring). The scale path buckets first (lsh_ann_topk)."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            _rounded_cosine(F.col("va"), F.col("vb")).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )


def add_hyperplane_buckets(
    df: DataFrame,
    dim: int,
    n_planes: int = 8,
    n_tables: int = 1,
    seed: int = 7,
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-table random-hyperplane LSH: one bucket id per hash table, as
    an ``array<int> buckets`` column, via a seeded numpy projection in
    mapInPandas (Arrow-batched — one matrix multiply per batch, not per
    row). Deterministic across runs/partitions: the plane tensor depends
    only on (seed, dim, n_planes, n_tables)."""
    import numpy as np

    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    out_schema += ", buckets array<int>"

    def project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((n_tables, dim, n_planes))
        weights = 1 << np.arange(n_planes)
        for pdf in batches:
            mat = np.vstack(pdf[vec_col].to_numpy())
            # (n_tables, rows, n_planes) sign bits -> (rows, n_tables) ids
            signs = (np.einsum("rd,tdp->trp", mat, planes) >= 0)
            ids = (signs * weights).sum(axis=2).T.astype("int32")
            pdf = pdf.copy()
            pdf["buckets"] = list(ids)
            yield pdf

    return df.mapInPandas(project, schema=out_schema)


def lsh_ann_topk(
    queries: DataFrame,
    candidates: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: hyperplane-bucket both sides into ``n_tables``
    independent LSH tables, join on (table, bucket) — candidates shrink
    ~2^n_planes-fold per table — dedup the candidate union, then exact
    cosine re-rank.

    Multi-probe economics: recall grows with n_tables (union of tables),
    precision/cost with n_planes (bucket granularity). At scale the
    (table, bucket) pair is the shuffle key; skewed buckets split via AQE.
    Recall is measured against brute_force_topk in tests.
    """
    def bucketed(df: DataFrame, out_id: str, out_vec: str) -> DataFrame:
        b = add_hyperplane_buckets(
            df, dim, n_planes, n_tables, vec_col=vec_col
        ).select(
            F.col(id_col).alias(out_id),
            F.col(vec_col).alias(out_vec),
            F.posexplode("buckets").alias("table", "bucket"),
        )
        return b

    qb = bucketed(queries, "query_id", "qv")
    cb = bucketed(candidates, "candidate_id", "cv")
    # a (q, c) pair colliding in several tables must score once, not L times
    cand = (
        qb.join(cb, ["table", "bucket"])
        .groupBy("query_id", "candidate_id")
        .agg(F.first("qv").alias("qv"), F.first("cv").alias("cv"))
    )
    scored = cand.select(
        "query_id",
        "candidate_id",
        _rounded_cosine(F.col("qv"), F.col("cv")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("candidate_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "candidate_id", "cos_sim", "rank")
    )
