"""Round-11 candidate experiment: GEMM-backed cosine pair scoring.

Question: the brute `cosine_pairs` path (operators/similarity.py:70) and
the LSH verify path both evaluate the per-pair dot as a zip_with/aggregate
HOF — CodegenFallback, interpreted per element. Round 9 moved the norms
out of the pair loop (q95 CPU 88->41 s at sf0.1); the remaining cost IS
the interpreted dot. Would an Arrow-batched numpy GEMM twin (broadcast
normalized matrix, block @ M.T per batch) (a) produce IDENTICAL rounded
scores and (b) win enough wall/CPU to justify a plan change?

This experiment does NOT touch any registered query: it builds the twin
inline, runs both on the sf0.1 embeddings table, hash-compares the full
rounded result sets, and times both. Output: one JSON line.

Run: python tools/experiment_gemm_cosine.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections.abc import Iterator

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_engineer_capstone_spark.catalog import load_table  # noqa: E402
from data_engineer_capstone_spark.operators.similarity import (  # noqa: E402
    cosine_pairs,
)
from data_engineer_capstone_spark.session import get_spark  # noqa: E402

THRESHOLD = 0.45  # the q95 contract


def gemm_cosine_pairs(spark, emb, threshold):
    """GEMM twin: same output contract as cosine_pairs (id_a < id_b,
    cos_sim = floor(dot/(na*nb)*1e6 + 0.5)/1e6 >= threshold).

    The full (id, vec) matrix rides a Spark broadcast variable in
    float64; each Arrow batch of the spread side computes one
    block @ M.T. Bounded-n contract unchanged (the broadcast is the
    explicit bound, exactly like the queries-side broadcast in
    brute_force_topk).
    """
    rows = emb.select("vec_id", "embedding").collect()  # bounded-n contract
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))
    bc = spark.sparkContext.broadcast((ids, mat, norms))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        b_ids, b_mat, b_norms = bc.value
        for pdf in batches:
            a_ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            a_mat = np.array(list(pdf["embedding"]), dtype=np.float64)
            sims = a_mat @ b_mat.T
            sims /= np.sqrt((a_mat * a_mat).sum(axis=1))[:, None]
            sims /= b_norms[None, :]
            sims = np.floor(sims * 1_000_000 + 0.5) / 1_000_000
            ai, bi = np.nonzero(
                (a_ids[:, None] < b_ids[None, :]) & (sims >= threshold)
            )
            yield pd.DataFrame(
                {
                    "id_a": a_ids[ai],
                    "id_b": b_ids[bi],
                    "cos_sim": sims[ai, bi],
                }
            )

    from data_engineer_capstone_spark.operators.dedup import _spread

    spread = _spread(emb, ["vec_id", "embedding"])
    return spread.mapInPandas(
        score, "id_a long, id_b long, cos_sim double"
    )


def canon(df):
    rows = df.select("id_a", "id_b", "cos_sim").orderBy("id_a", "id_b").collect()
    return [(r["id_a"], r["id_b"], round(r["cos_sim"], 6)) for r in rows]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark(app_name="experiment-gemm-cosine")
    emb = load_table(spark, sf_dir, "embeddings")

    out = {"sf_dir": sf_dir, "threshold": THRESHOLD}
    for name, build in (
        ("hof", lambda: cosine_pairs(emb, threshold=THRESHOLD)),
        ("gemm", lambda: gemm_cosine_pairs(spark, emb, THRESHOLD)),
    ):
        build().count()  # warm-up
        t0 = time.time()
        res = canon(build())
        out[f"{name}_wall_s"] = round(time.time() - t0, 3)
        out[f"{name}_rows"] = len(res)
        out[f"{name}_set"] = res

    a, b = out.pop("hof_set"), out.pop("gemm_set")
    out["identical"] = a == b
    if not out["identical"]:
        sa, sb = set(a), set(b)
        out["only_hof"] = sorted(sa - sb)[:5]
        out["only_gemm"] = sorted(sb - sa)[:5]
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
