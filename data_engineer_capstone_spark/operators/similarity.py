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
from ..materialize import materialize


def _rounded_cosine(a, b):
    return F.floor(cosine(a, b) * 1000000 + F.lit(0.5)) / 1000000


# Bounded-use contract for the collect-and-broadcast GEMM interiors
# (cosine_pairs' bounded side, brute_force_topk's query side), made
# EXECUTABLE in round 12 (VERDICT r11 ask #5 / ADVICE r11 #1 — the
# OFFSET_MAP_MAX_WIDTH precedent): the old BroadcastNestedLoopJoin failed
# at Spark's 8 GB / 512M-row broadcast cap with an executor-side error;
# the GEMM swap moved the same bound to a driver collect whose overrun
# would be a guardless driver OOM. The cap below is checked BEFORE
# collecting, with a short-circuiting ``limit(cap+1).count()`` probe (the
# probe job stops producing rows at cap+1, so an over-bound caller fails
# in seconds, not after materializing its input). 8M rows × 64-dim
# float64 ≈ 4 GB of matrix — inside the old broadcast envelope; callers
# with a genuinely larger exact workload belong on the bucketed scale
# paths (lsh_ann_topk / ivf_*), which never collect.
BOUNDED_SIDE_MAX_ROWS = 8_000_000


def _check_bounded_side(df: DataFrame, id_col: str, operator: str) -> None:
    probe = df.select(id_col).limit(BOUNDED_SIDE_MAX_ROWS + 1).count()
    if probe > BOUNDED_SIDE_MAX_ROWS:
        raise ValueError(
            f"{operator}: bounded side exceeds BOUNDED_SIDE_MAX_ROWS="
            f"{BOUNDED_SIDE_MAX_ROWS} rows; the collect-and-broadcast GEMM "
            "interior is for bounded exact workloads — use the bucketed "
            "scale path (lsh_ann_topk / ivf_ann_topk) instead"
        )


def _batch_rounded_cosine(
    df: DataFrame, a_col: str, b_col: str, keep: list[str],
    out_col: str = "cos_sim",
) -> DataFrame:
    """Rounded cosine per row-pair as whole-Arrow-batch numpy einsum
    reductions — the vectorized twin of ``_rounded_cosine`` (round 12,
    guide §4.2; the q224 verify-kernel template applied to the ANN
    rescore paths). The Catalyst form evaluates one interpreted
    ``zip_with``/``aggregate`` HOF dot per row (CodegenFallback — every
    element visit interpreted, the cost class the round-11 GEMM swaps
    measured at ~20x); this computes each batch's dots and norms as
    three einsum passes and applies the identical
    ``floor(x*1e6+0.5)/1e6`` rounding.

    Null contract: a null vector on either side emits a NULL score —
    the ROW is kept, exactly as the expression form kept it. A ZERO
    NORM is the one divergence: the ANSI expression form (Spark 4
    default) raises DIVIDE_BY_ZERO, while this kernel scores the row
    NULL (the non-ANSI / DuckDB semantics) — strictly more permissive,
    identical on every non-degenerate corpus (no registered embedding
    table carries a zero vector; pinned by the tri-SF oracle hashes).
    Only the ``keep`` columns cross the Arrow boundary alongside
    the two vectors (guide §4.1). Summation-order note: einsum's dot
    accumulation order differs from the HOF fold's strict
    left-to-right; a pre-rounding value exactly on a 1e-6 boundary
    could round differently — the same (tiny, documented) tolerance
    class as the round-11 GEMM interiors, pinned by the tri-SF oracle
    hashes and the ANN determinism/recall pytest."""
    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    out_schema = ", ".join(f"{c} {fields[c]}" for c in keep)
    out_schema += f", {out_col} double"

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np  # executor-side import

        for pdf in batches:
            if not len(pdf):
                continue
            ok = (pdf[a_col].notna() & pdf[b_col].notna()).to_numpy()
            sims = np.full(len(pdf), np.nan)
            if ok.any():
                va = np.array(list(pdf[a_col][ok]), dtype=np.float64)
                vb = np.array(list(pdf[b_col][ok]), dtype=np.float64)
                dots = np.einsum("ij,ij->i", va, vb)
                na = np.sqrt(np.einsum("ij,ij->i", va, va))
                nb = np.sqrt(np.einsum("ij,ij->i", vb, vb))
                with np.errstate(divide="ignore", invalid="ignore"):
                    s = dots / (na * nb)
                sims[ok] = np.floor(s * 1_000_000 + 0.5) / 1_000_000
            out = pdf[keep].copy()
            finite = np.isfinite(sims)
            if finite.all():
                out[out_col] = sims
            else:  # degenerate rows: NULL score, row kept (Catalyst parity)
                col = sims.astype(object)
                col[~finite] = None
                out[out_col] = col
            yield out

    return df.select(*keep, a_col, b_col).mapInPandas(score, out_schema)


def brute_force_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    Round-11 interior (the §A `cosine_pairs` GEMM pattern, completing the
    embedding family): the bounded QUERY side is collected once and
    broadcast as a float64 matrix + norms — the same bound the previous
    plan's `F.broadcast(queries)` nested loop already implied — and each
    Arrow batch of the streamed candidate side scores against it as one
    chunked ``block @ Q.T`` GEMM with the identical
    ``floor(x*1e6+0.5)/1e6`` rounding, replacing the per-pair interpreted
    `zip_with`/`aggregate` dot (CodegenFallback, O(|q|·|c|·dim)
    interpreted element visits).

    Correctness shape: the kernel emits only each batch's per-query
    top-k under the EXACT final ordering (rounded cosine desc,
    candidate_id asc — `np.lexsort` on the same composite key), and the
    pre-existing global window re-ranks the union. Global top-k under a
    total order is always contained in the union of per-batch top-k, so
    the result is identical to scoring every pair — while the window's
    input shrinks from |q|·|c| rows to at most |q|·k per batch.
    Null id/vector rows are excluded exactly as the old join dropped
    them (null join column / null cosine never ranked in the top k of a
    non-degenerate corpus; pinned by the q94 oracle tri-SF). Round 12
    (ADVICE r11): the bounded-collect contract is an executable guard
    (``_check_bounded_side``), non-finite scores (zero-norm degenerate
    vectors — the old Catalyst path scored them NULL, which desc-sorts
    LAST) are masked out of the per-batch top-k instead of letting
    numpy's NaN float win Spark's desc ordering, and the norm division
    is the single-step ``d / (|a|·|b|)`` matching the Catalyst
    expression tree.
    """
    import numpy as np

    from .dedup import _spread

    _check_bounded_side(queries, id_col, "brute_force_topk")
    qrows = [
        r for r in queries.select(id_col, vec_col).collect()
        if r[0] is not None and r[1] is not None
    ]
    spark = queries.sparkSession
    qid_dt = queries.schema[id_col].dataType.simpleString()
    cid_dt = candidates.schema[id_col].dataType.simpleString()
    out_schema = f"query_id {qid_dt}, candidate_id {cid_dt}, cos_sim double"
    if not qrows:
        return spark.createDataFrame([], out_schema + ", rank int")
    q_ids = np.array([r[0] for r in qrows])
    q_mat = np.array([r[1] for r in qrows], dtype=np.float64)
    q_norms = np.sqrt((q_mat * q_mat).sum(axis=1))
    bc = spark.sparkContext.broadcast((q_ids, q_mat, q_norms))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np  # executor-side import

        ids_q, mat_q, norms_q = bc.value
        # chunk so the (rows × |q|) score block stays ~64 MB regardless of
        # the query-side bound (the cosine_pairs memory contract)
        step = max(1, 8_000_000 // max(1, len(ids_q)))
        for pdf in batches:
            pdf = pdf[pdf[id_col].notna() & pdf[vec_col].notna()]
            if not len(pdf):
                continue
            c_ids_all = pdf[id_col].to_numpy()
            c_mat_all = np.array(list(pdf[vec_col]), dtype=np.float64)
            c_norms_all = np.sqrt((c_mat_all * c_mat_all).sum(axis=1))
            for lo in range(0, len(c_ids_all), step):
                c_ids = c_ids_all[lo : lo + step]
                c_mat = c_mat_all[lo : lo + step]
                c_norms = c_norms_all[lo : lo + step]
                sims = c_mat @ mat_q.T
                with np.errstate(divide="ignore", invalid="ignore"):
                    sims /= c_norms[:, None] * norms_q[None, :]
                sims = np.floor(sims * 1_000_000 + 0.5) / 1_000_000
                qs, cs, ss = [], [], []
                for j in range(len(ids_q)):
                    col = sims[:, j]
                    # zero-norm rows score NaN/inf where Catalyst scored
                    # NULL (desc-sorts last, never top-k in a corpus with
                    # >= k finite scores) — mask them so numpy's NaN can't
                    # outrank every finite double in Spark's ordering
                    fin = np.nonzero(np.isfinite(col))[0]
                    take = min(k, len(fin))
                    # identical composite order to the global window:
                    # rounded cosine DESC, candidate id ASC
                    order = fin[np.lexsort((c_ids[fin], -col[fin]))][:take]
                    qs.append(np.full(take, ids_q[j]))
                    cs.append(c_ids[order])
                    ss.append(col[order])
                yield pd.DataFrame(
                    {
                        "query_id": np.concatenate(qs),
                        "candidate_id": np.concatenate(cs),
                        "cos_sim": np.concatenate(ss),
                    }
                )

    # the candidate side streams through the kernel — spread it so the
    # GEMM isn't serialized onto the scan's (possibly single) input split
    c = _spread(candidates, [id_col, vec_col])
    scored = c.mapInPandas(score, out_schema)
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
    per-bucket re-scoring). The scale path buckets first (lsh_ann_topk).

    Round-11 interior (SCALE.md §15, measured round 10): the bounded side
    is collected ONCE and broadcast as a float64 matrix; each Arrow batch
    of the spread side scores against it as a single ``block @ M.T`` GEMM,
    with the identical ``floor(x*1e6 + 0.5)/1e6`` rounding. This replaces
    the BroadcastNestedLoopJoin whose per-pair dot was an interpreted
    zip_with/aggregate HOF (CodegenFallback — ~41 CPU-s at sf0.1 on q95's
    2M pairs, growing quadratically with the bound; the GEMM twin measured
    0.85 s FLAT at 2k→8k vectors with identical rounded result sets,
    tools/experiment_gemm_cosine.py). The collect is not new driver
    exposure: the bounded-use contract is unchanged — the broadcast IS the
    bound, exactly like the queries-side ``F.broadcast`` in
    ``brute_force_topk``. Equivalence is pinned by
    tests/test_maintenance.py::test_gemm_cosine_twin_matches_hof_path and
    by the family's oracle rows (q95/q219/q344 hash-verified tri-SF).

    Numeric contract: float64 end to end; the numpy GEMM's summation
    order differs from the HOF fold's strict left-to-right, but no
    1e-6-rounded score moved on any SF (the same tolerance class the
    DuckDB oracle — its own sum order — certifies every round).
    Null rows (id or vector) are excluded on both sides, exactly as the
    old join dropped them (null join key / null cos_sim never passed the
    threshold filter). Round 12 (ADVICE r11): the bounded-collect
    contract is an executable guard (``_check_bounded_side``),
    non-finite scores (zero-norm degenerate vectors — NULL under
    Catalyst, which never passes the threshold) are masked, and the norm
    division is the single-step ``d / (|a|·|b|)`` matching the Catalyst
    expression tree."""
    import numpy as np

    from .dedup import _spread

    _check_bounded_side(df, id_col, "cosine_pairs")
    rows = [
        r for r in df.select(id_col, vec_col).collect()
        if r[0] is not None and r[1] is not None
    ]
    id_dt = df.schema[id_col].dataType.simpleString()
    out_schema = f"id_a {id_dt}, id_b {id_dt}, cos_sim double"
    spark = df.sparkSession
    if not rows:
        return spark.createDataFrame([], out_schema)
    b_ids = np.array([r[0] for r in rows])
    b_mat = np.array([r[1] for r in rows], dtype=np.float64)
    b_norms = np.sqrt((b_mat * b_mat).sum(axis=1))
    bc = spark.sparkContext.broadcast((b_ids, b_mat, b_norms))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np  # executor-side import

        ids_b, mat_b, norms_b = bc.value
        # chunk so the (rows × n) score block stays ~64 MB regardless of
        # the bound — per-task memory must not scale with the batch size
        step = max(1, 8_000_000 // max(1, len(ids_b)))
        for pdf in batches:
            pdf = pdf[pdf[id_col].notna() & pdf[vec_col].notna()]
            if not len(pdf):
                continue
            a_ids_all = pdf[id_col].to_numpy()
            a_mat_all = np.array(list(pdf[vec_col]), dtype=np.float64)
            a_norms_all = np.sqrt((a_mat_all * a_mat_all).sum(axis=1))
            for lo in range(0, len(a_ids_all), step):
                a_ids = a_ids_all[lo : lo + step]
                a_mat = a_mat_all[lo : lo + step]
                a_norms = a_norms_all[lo : lo + step]
                sims = a_mat @ mat_b.T
                with np.errstate(divide="ignore", invalid="ignore"):
                    sims /= a_norms[:, None] * norms_b[None, :]
                sims = np.floor(sims * 1_000_000 + 0.5) / 1_000_000
                # isfinite: a zero-norm +inf must not pass the threshold
                # (Catalyst scored it NULL — dropped); NaN compares False
                ai, bi = np.nonzero(
                    (a_ids[:, None] < ids_b[None, :])
                    & (sims >= threshold)
                    & np.isfinite(sims)
                )
                if not len(ai):
                    continue
                yield pd.DataFrame(
                    {
                        "id_a": a_ids[ai],
                        "id_b": ids_b[bi],
                        "cos_sim": sims[ai, bi],
                    }
                )

    spread = _spread(df, [id_col, vec_col])
    return spread.mapInPandas(score, out_schema)


def cosine_pairs_lsh(
    df: DataFrame,
    dim: int,
    threshold: float,
    n_planes: int = 4,
    n_tables: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Bucketed cosine near-dup pairs — the scale twin of ``cosine_pairs``
    (round-2 VERDICT next #1): hyperplane-LSH buckets replace the O(n²)
    pair space with per-(table, bucket) equi-join candidates, which are
    then EXACT cosine-verified — same schema and per-pair scores as
    ``cosine_pairs``, minus pairs that collide in no table (the LSH
    s-curve: P(candidate) = 1-(1-(1-θ/π)^n_planes)^n_tables; recall is
    measured against the exact baseline in tests).

    Scale shape mirrors minhash_lsh_pairs: the bucket join ships only slim
    (id, table, bucket) rows — n_tables per vector, never the embedding
    array; candidate pairs are distinct-ed and the vectors re-fetched by a
    candidate-bounded equi-join, O(candidates) not O(corpus). Skewed
    buckets split via AQE; a degenerate mega-bucket is bounded the q92 way
    (cap candidates per bucket) if a corpus ever needs it.
    """
    from .dedup import _spread

    # out_cols=[id_col]: the slim index consumes only (id, buckets) — the
    # embedding must not round-trip the Arrow boundary (round 11, §4.1)
    bucketed = add_hyperplane_buckets(
        _spread(df, [id_col, vec_col]), dim, n_planes, n_tables,
        vec_col=vec_col, out_cols=[id_col],
    )
    # materialize: both self-join sides read these slim rows, and without
    # the lineage cut each side re-executes the Arrow bucket projection
    # (the executed plan showed TWO MapInPandas blocks — round-7 q224
    # profile); n_tables small ints per vector, so the checkpoint is tiny
    slim = materialize(
        bucketed.select(
            F.col(id_col).alias("did"),
            F.posexplode("buckets").alias("table", "bucket"),
        )
    )
    a, b = slim.alias("a"), slim.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.table") == F.col("b.table"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.did") < F.col("b.did")),
        )
        .select(F.col("a.did").alias("id_a"), F.col("b.did").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    # Round-11 verify interior (SCALE.md §15 per-bucket GEMM finding,
    # generalized to the candidate stream): the exact verify used to
    # evaluate one zip_with/aggregate HOF dot per candidate pair —
    # CodegenFallback, interpreted per element, ~2M candidate dots at
    # sf0.1 (the bucket census read median-125/max-214 buckets, squarely
    # in the vectorized-win regime). The fetch joins are unchanged
    # (candidate-bounded equi-joins, O(candidates) not O(corpus)); only
    # the scoring kernel leaves Catalyst: one Arrow pass computes the
    # whole batch's dots/norms as three numpy einsum reductions. Scores
    # carry the identical floor(x*1e6+0.5)/1e6 rounding; no 1e-6-rounded
    # score moved on any SF (same tolerance class the subset/recall
    # pytest and the q219 one-hop agreement pin).
    # NOTE (round-7, measured, still binding): an unrolled codegen dot
    # (`dot_unrolled`) was tried here and was 3.5× WORSE — the 64-term
    # element_at tree overflowed the codegen method budget. The numpy
    # kernel leaves Catalyst entirely instead of inflating its tree.
    vecs = df.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("v"),
    )
    pair_vecs = (
        cand.join(
            vecs.select("vid", F.col("v").alias("va")),
            cand.id_a == F.col("vid"),
        )
        .drop("vid")
        .join(
            vecs.select("vid", F.col("v").alias("vb")),
            cand.id_b == F.col("vid"),
        )
        .drop("vid")
        .select("id_a", "id_b", "va", "vb")
    )
    id_dt = df.schema[id_col].dataType.simpleString()

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np  # executor-side import

        for pdf in batches:
            if not len(pdf):
                continue
            va = np.array(list(pdf["va"]), dtype=np.float64)
            vb = np.array(list(pdf["vb"]), dtype=np.float64)
            dots = np.einsum("ij,ij->i", va, vb)
            na = np.sqrt(np.einsum("ij,ij->i", va, va))
            nb = np.sqrt(np.einsum("ij,ij->i", vb, vb))
            sims = np.floor(dots / (na * nb) * 1_000_000 + 0.5) / 1_000_000
            keep = sims >= threshold
            if not keep.any():
                continue
            yield pd.DataFrame(
                {
                    "id_a": pdf["id_a"].to_numpy()[keep],
                    "id_b": pdf["id_b"].to_numpy()[keep],
                    "cos_sim": sims[keep],
                }
            )

    return pair_vecs.mapInPandas(
        verify, f"id_a {id_dt}, id_b {id_dt}, cos_sim double"
    )


def add_hyperplane_buckets(
    df: DataFrame,
    dim: int,
    n_planes: int = 8,
    n_tables: int = 1,
    seed: int = 7,
    vec_col: str = "embedding",
    out_cols: list[str] | None = None,
) -> DataFrame:
    """Multi-table random-hyperplane LSH: one bucket id per hash table, as
    an ``array<int> buckets`` column, via a seeded numpy projection in
    mapInPandas (Arrow-batched — one matrix multiply per batch, not per
    row). Deterministic across runs/partitions: the plane tensor depends
    only on (seed, dim, n_planes, n_tables).

    ``out_cols`` (round 11, guide §4.1 column-width rule): the columns to
    carry through the Arrow boundary alongside ``buckets``. Default keeps
    every input column (the lsh_ann_topk shape, which re-reads the
    vectors downstream); callers that only consume ids+buckets pass the
    id column alone so the dim-float embedding array does not make a
    pointless Python round trip — the bucket projection stage is
    worker-wait-bound (census: 67 core-s occupied vs 3.8 CPU-s), and the
    payload width is the wait."""
    import numpy as np

    keep = [f for f in df.schema.fields if out_cols is None or f.name in out_cols]
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in keep)
    out_schema += ", buckets array<int>"
    keep_names = [f.name for f in keep]

    def project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((n_tables, dim, n_planes))
        weights = 1 << np.arange(n_planes)
        for pdf in batches:
            mat = np.vstack(pdf[vec_col].to_numpy())
            # (n_tables, rows, n_planes) sign bits -> (rows, n_tables) ids
            signs = (np.einsum("rd,tdp->trp", mat, planes) >= 0)
            ids = (signs * weights).sum(axis=2).T.astype("int32")
            out = pdf[keep_names].copy()
            out["buckets"] = list(ids)
            yield out

    return df.mapInPandas(project, schema=out_schema)


def train_ivf_centroids(
    candidates: DataFrame,
    dim: int,
    n_lists: int = 16,
    n_iters: int = 5,
    sample_size: int = 4096,
    seed: int = 7,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Train IVF coarse centroids on a bounded sample (numpy Lloyd
    iterations on the driver — the FAISS approach: train small, assign
    big). Deterministic: seeded init on an id-ordered sample, fixed
    iteration count, ties to the lowest centroid index. Returns an
    (n_lists, dim) float64 ndarray of L2-normalized centroids."""
    import numpy as np

    sample = (
        candidates.select(id_col, vec_col).orderBy(id_col).limit(sample_size).collect()
    )
    x = np.vstack([r[1] for r in sample]).astype("float64")
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=min(n_lists, len(x)), replace=False)]
    for _ in range(n_iters):
        sims = x @ cent.T
        assign = sims.argmax(axis=1)
        for j in range(len(cent)):
            members = x[assign == j]
            if len(members):
                m = members.sum(axis=0)
                cent[j] = m / max(np.linalg.norm(m), 1e-12)
    return cent


def _assign_lists(
    df: DataFrame, centroids, n_probe: int, out_id: str, out_vec: str,
    id_col: str, vec_col: str,
) -> DataFrame:
    """mapInPandas: nearest n_probe centroid ids per vector (spherical
    assignment — argmax dot on normalized vectors), exploded to one row
    per (vector, list)."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cent = np.asarray(centroids)
        for pdf in batches:
            mat = np.vstack(pdf[vec_col].to_numpy()).astype("float64")
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            sims = mat @ cent.T
            top = np.argsort(-sims, axis=1, kind="stable")[:, :n_probe]
            yield pd.DataFrame(
                {
                    out_id: pdf[id_col].repeat(top.shape[1]).to_numpy(),
                    out_vec: pdf[vec_col].repeat(top.shape[1]).to_numpy(),
                    "list_id": top.astype("int32").ravel(),
                }
            )

    return df.mapInPandas(
        run, schema=f"{out_id} bigint, {out_vec} array<float>, list_id int"
    )


def ivf_ann_topk(
    queries: DataFrame,
    candidates: DataFrame,
    dim: int,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: candidates are inverted-file-partitioned by
    nearest centroid (1 list each); each query probes its ``n_probe``
    nearest lists; exact cosine re-rank within the probed union.

    Scale shape: centroid training touches a bounded sample; assignment is
    one Arrow-batched pass over each side; the candidate join is an
    EQUI-join on list_id (shuffle ∝ probed fraction ≈ n_probe/n_lists of
    the data, not O(n²)). Skewed lists (hub vectors) split via AQE.
    """
    cent = train_ivf_centroids(
        candidates, dim, n_lists=n_lists, id_col=id_col, vec_col=vec_col
    )
    cl = _assign_lists(candidates, cent, 1, "candidate_id", "cv", id_col, vec_col)
    ql = _assign_lists(queries, cent, n_probe, "query_id", "qv", id_col, vec_col)
    # round 12: probed-list rescore via the batched einsum kernel instead
    # of one interpreted HOF dot per (query, candidate) row — guide §4.2;
    # join shape (equi-join on list_id) unchanged
    scored = _batch_rounded_cosine(
        ql.join(cl, "list_id"), "qv", "cv", ["query_id", "candidate_id"]
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("candidate_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "candidate_id", "cos_sim", "rank")
    )


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
    # round 12: candidate rescore via the batched einsum kernel instead of
    # one interpreted HOF dot per collision pair — guide §4.2; bucket join
    # and collision dedup unchanged
    scored = _batch_rounded_cosine(
        cand, "qv", "cv", ["query_id", "candidate_id"]
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("candidate_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "candidate_id", "cos_sim", "rank")
    )


def train_pq_codebooks(
    candidates: DataFrame,
    dim: int,
    m_sub: int = 8,
    n_codes: int = 32,
    n_iters: int = 5,
    sample_size: int = 4096,
    seed: int = 7,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Train product-quantization codebooks on a bounded sample (numpy
    Lloyd iterations per subspace on the driver — train small, encode big,
    like ``train_ivf_centroids``). The vector is split into ``m_sub``
    contiguous subspaces of dim/m_sub; each gets an independent
    ``n_codes``-entry codebook. Deterministic: seeded init over an
    id-ordered sample, fixed iterations, stable argmin. Returns an
    (m_sub, n_codes, dim//m_sub) float64 ndarray."""
    import numpy as np

    assert dim % m_sub == 0, "dim must divide into m_sub subspaces"
    dsub = dim // m_sub
    sample = (
        candidates.select(id_col, vec_col).orderBy(id_col).limit(sample_size).collect()
    )
    x = np.vstack([r[1] for r in sample]).astype("float64")
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    books = np.empty((m_sub, n_codes, dsub))
    for s in range(m_sub):
        xs = x[:, s * dsub : (s + 1) * dsub]
        k = min(n_codes, len(xs))
        cent = xs[rng.choice(len(xs), size=k, replace=False)].copy()
        for _ in range(n_iters):
            d2 = ((xs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for j in range(k):
                members = xs[assign == j]
                if len(members):
                    cent[j] = members.mean(axis=0)
        books[s, :k] = cent
        if k < n_codes:  # degenerate tiny sample: pad with the first code
            books[s, k:] = cent[0]
    return books


def ivf_pq_ann_topk(
    queries: DataFrame,
    candidates: DataFrame,
    dim: int,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    m_sub: int = 8,
    n_codes: int = 32,
    refine: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ approximate top-k — the compressed scale path (the standard
    FAISS ``IVFx,PQy`` shape): coarse inverted-file partitioning exactly as
    ``ivf_ann_topk``, but candidates inside each list are scored from
    their ``m_sub``-byte PQ codes via ADC (asymmetric distance: the query
    stays exact; each subspace contributes a codebook lookup), then the
    ADC top ``refine*k`` per query are EXACT-rescored from re-fetched true
    vectors and the final top-k re-ranked.

    Why this exists next to ivf_ann_topk: at 100 TB the candidate side's
    vectors dominate the shuffle (dim floats/row through the list_id
    exchange). PQ codes are dim/dsub ints — with dim=64, m_sub=8 that is
    8 small ints vs 64 floats (~16×) through every exchange and in the
    probed-list scan; full vectors are touched only for the
    O(refine·k·|queries|) refine set, fetched by a candidate-bounded
    equi-join. Training is bounded-sample driver numpy; encoding and ADC
    are Arrow-batched mapInPandas; everything between is keyed equi-joins
    — no all-pairs stage anywhere.

    Determinism: seeded training, stable assignment, integer-rounded ADC
    scores with (adc, candidate_id) ordering, exact rounded cosine at
    refine — two runs return identical rows (pinned by pytest alongside
    the recall floor vs brute_force_topk).
    """
    import numpy as np

    cent = train_ivf_centroids(
        candidates, dim, n_lists=n_lists, id_col=id_col, vec_col=vec_col
    )
    books = train_pq_codebooks(
        candidates, dim, m_sub=m_sub, n_codes=n_codes,
        id_col=id_col, vec_col=vec_col,
    )
    dsub = dim // m_sub

    # --- encode candidates: (candidate_id, list_id, codes) — the slim form
    cl = _assign_lists(candidates, cent, 1, "candidate_id", "cv", id_col, vec_col)

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bk = np.asarray(books)
        for pdf in batches:
            mat = np.vstack(pdf["cv"].to_numpy()).astype("float64")
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            codes = np.empty((len(mat), bk.shape[0]), dtype="int32")
            for s in range(bk.shape[0]):
                xs = mat[:, s * dsub : (s + 1) * dsub]
                d2 = ((xs[:, None, :] - bk[s][None, :, :]) ** 2).sum(axis=2)
                codes[:, s] = d2.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "candidate_id": pdf["candidate_id"].to_numpy(),
                    "list_id": pdf["list_id"].to_numpy(),
                    "codes": list(codes),
                }
            )

    enc = cl.mapInPandas(
        encode, schema="candidate_id bigint, list_id int, codes array<int>"
    )

    ql = _assign_lists(queries, cent, n_probe, "query_id", "qv", id_col, vec_col)
    joined = ql.join(enc, "list_id")

    # --- ADC scoring: per batch, LUT[q][s][code] = qv_s · book[s][code];
    # score = sum_s LUT lookups. Integer-rounded for stable ordering.
    def adc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bk = np.asarray(books)  # (m, codes, dsub)
        for pdf in batches:
            if not len(pdf):
                continue
            qmat = np.vstack(pdf["qv"].to_numpy()).astype("float64")
            qmat /= np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
            qsub = qmat.reshape(len(qmat), bk.shape[0], dsub)  # (r, m, dsub)
            lut = np.einsum("rmd,mcd->rmc", qsub, bk)  # (r, m, codes)
            codes = np.vstack(pdf["codes"].to_numpy())  # (r, m)
            rows = np.arange(len(qmat))[:, None]
            subs = np.arange(bk.shape[0])[None, :]
            scores = lut[rows, subs, codes].sum(axis=1)
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].to_numpy(),
                    "candidate_id": pdf["candidate_id"].to_numpy(),
                    "adc": np.floor(scores * 1_000_000 + 0.5).astype("int64"),
                }
            )

    scored = joined.mapInPandas(
        adc, schema="query_id bigint, candidate_id bigint, adc bigint"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc").desc(), F.col("candidate_id")
    )
    shortlist = (
        scored.withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= refine * k)
        .select("query_id", "candidate_id")
    )

    # --- exact refine: true vectors only for the shortlist (bounded fetch)
    qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    cv = candidates.select(
        F.col(id_col).alias("candidate_id"), F.col(vec_col).alias("cv")
    )
    # round 12: the exact-refine rescore runs the batched einsum kernel
    # instead of one interpreted HOF dot per shortlist row — guide §4.2;
    # the candidate-bounded fetch joins are unchanged
    exact = _batch_rounded_cosine(
        shortlist.join(F.broadcast(qv), "query_id").join(cv, "candidate_id"),
        "qv", "cv", ["query_id", "candidate_id"],
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("candidate_id")
    )
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("query_id", "candidate_id", "cos_sim", "rank")
    )
