"""End-to-end training-corpus curation: the composition the individual
LLM-pipeline operators exist for.

    language-ID -> quality gate -> exact dedup -> near-dup cluster dedup
    -> deterministic split assignment

One DataFrame flow, lazy until the caller acts. Stage order is the cost
order: cheap columnar filters (langid, quality) shrink the corpus BEFORE
the shuffling stages (exact dedup: one hash shuffle; MinHash clustering:
band join + label propagation) — at 100 TB the early gates typically drop
half the data and pay for themselves immediately.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..materialize import materialize
from ..functions.text import detect_language, h64, quality_score, word_count
from .dedup import connected_components, exact_dedup_groups, minhash_lsh_pairs

# Production-at-scale preset (VERDICT r9 ask #5). The operator DEFAULTS
# stay exact/uncapped — that is the oracle-pinned correctness contract
# (q113 and the dedup-family oracles recompute the same uncapped
# semantics) — but SCALE_100TB.md declares the caps MANDATORY at corpus
# scale, where one boilerplate mega-bucket turns the band self-join
# quadratic. ``curate(..., profile=SCALE_PROFILE)`` is the 100 TB
# posture; pass a modified copy to tune.
SCALE_PROFILE: dict = {
    # MinHash banding hot-bucket cap (operators/dedup.py:minhash_lsh_pairs):
    # band keys shared by more docs than this are dropped BEFORE the
    # self-join (pairs stay exact-verified — the cap only loses
    # candidates, never admits false positives); enabling it also turns
    # on the (c3) expansion-sized candidate join and, with a
    # ``drop_observation``, the dropped-row counter that rides the band
    # materialization job.
    "max_bucket_size": 64,
    # shingle document-frequency cap for the n-gram Jaccard family
    # (operators/dedup.py:ngram_jaccard_pairs ``df_cap``): stopword-like
    # shingles above this df generate quadratic candidates for near-zero
    # Jaccard gain. Carried in the preset for callers composing that
    # family; curate()'s own near-dup stage is MinHash-based.
    "df_cap": 10_000,
    # streaming twins (incremental dedup, q329-style) keep their state
    # off-heap and incrementally checkpointed at 100 TB key cardinality
    "state_store_conf": {
        "spark.sql.streaming.stateStore.providerClass":
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
    },
}


def curate(
    docs: DataFrame,
    quality_min: float = 0.66,
    jaccard_threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    profile: dict | None = None,
    drop_observation=None,
) -> DataFrame:
    """Curate a document corpus into a dedup'd, split-assigned training set.

    Returns (doc_id, pred_lang, quality, n_tokens, split) for surviving
    documents: identified language, above the quality floor, canonical
    representative of both its exact-hash group and its MinHash near-dup
    cluster, with a deterministic 90/5/5 split.

    ``profile=None`` (default) is the exact, uncapped, oracle-pinned
    contract. ``profile=SCALE_PROFILE`` applies the production caps; pass
    an ``Observation`` as ``drop_observation`` to count capped-away band
    rows on the SAME job that materializes the band table — no extra pass
    (tests/test_operators.py pins this). The profile's
    ``state_store_conf`` is documentation for the session owner, never
    applied here (ADVICE r10 #2 — see the NOTE below).
    """
    scored = docs.select(
        id_col,
        text_col,
        detect_language(text_col).alias("pred_lang"),
        quality_score(text_col).alias("quality"),
        word_count(text_col).alias("n_tokens"),
    )
    gated = scored.filter(
        (F.col("quality") >= quality_min) & (F.col("pred_lang") != "und")
    )

    # Materialize the gated+exact-deduped corpus ONCE: it feeds the MinHash
    # candidate pipeline, the components' vertex set, and the final
    # canonical join — without the checkpoint the langid/quality/window
    # lineage re-executes per consumer (and per label-prop round).
    # At 100 TB: SPARK_GRAFT_CHECKPOINT=reliable (materialize.py) or an
    # intermediate table.
    exact = exact_dedup_groups(gated, text_col=text_col, id_col=id_col).filter(
        F.col(id_col) == F.col("canonical_id")
    ).select(
        id_col, text_col, "pred_lang", "quality", "n_tokens"
    ).transform(materialize)

    if drop_observation is not None and not (
        profile and profile.get("max_bucket_size")
    ):
        # Fail loudly (ADVICE r10 #3): without a profile/cap the metrics
        # node is never attached to any job, so a caller who later reads
        # Observation.get would block indefinitely.
        raise ValueError(
            "drop_observation requires a profile with max_bucket_size — "
            "without the cap no drop counter rides any job"
        )
    # NOTE (ADVICE r10 #2): the state_store_conf entries in a profile are
    # session posture, deliberately NOT applied here — a batch operator
    # mutating shared SparkSession conf outlives the call and leaks into
    # unrelated streaming queries. Callers own the session posture: apply
    # SCALE_PROFILE["state_store_conf"] at session build (get_spark
    # extra_conf) or around the streaming twin they run.
    pairs = minhash_lsh_pairs(
        exact,
        threshold=jaccard_threshold,
        max_bucket_size=(profile or {}).get("max_bucket_size"),
        drop_observation=drop_observation,
    )
    labels = connected_components(pairs, exact, id_col=id_col)
    canonical = exact.join(
        labels, exact[id_col] == labels.id, "left"
    ).filter(
        F.coalesce(F.col("label"), F.col(id_col)) == F.col(id_col)
    )

    bucket = h64(F.concat(F.lit("split:"), F.col(id_col).cast("string"))) % 100
    return canonical.select(
        id_col,
        "pred_lang",
        "quality",
        "n_tokens",
        F.when(bucket < 90, "train")
        .when(bucket < 95, "val")
        .otherwise("test")
        .alias("split"),
    )
