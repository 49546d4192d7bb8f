"""Domain-mixing downsampler for training-corpus assembly.

A pretraining corpus is assembled from heterogeneous domains (web crawl,
code, reference text, ...) whose raw sizes are wildly skewed; the mixing
step downsamples each domain to a target token share BEFORE tokenization
and packing. Two properties matter at 100 TB:

- **Deterministic**: the keep/drop decision is a pure function of the
  document id (salted hash gate), never ``rand()`` — stable across runs,
  engines, partitionings and re-shards, so a re-processed corpus keeps
  byte-identical membership (the q109 split-stability argument).
- **Distributed**: per-domain totals are an O(#domains) aggregate that is
  broadcast back; no window ever partitions by domain (which would funnel
  a whole domain's rows through one task — the classic skew trap when one
  domain is 90% of the corpus).

No reference counterpart (the reference has no corpus tooling); this is
part of the engine's LLM-pipeline extension surface alongside
operators/curation.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import h64, word_count


def domain_mix_sample(
    df: DataFrame,
    domain_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 10_000,
    salt: str = "mix",
) -> DataFrame:
    """Equalizing domain mixer: downsample every domain to (approximately)
    the SMALLEST domain's token count.

    Per domain d with token total T_d, keep a document iff

        (h64(salt:id) % buckets) * T_d  <  min_d(T_d) * buckets

    i.e. an expected keep-fraction of min_total/T_d, decided by a salted
    integer hash gate. The predicate is pure int64 arithmetic — no float
    division, so Spark and a SQL oracle agree exactly on membership.
    Overflow bound: buckets * max(T_d) must stay below 2^63 — at
    buckets=10^4 that allows ~9·10^14 tokens per domain (a ~3.6 PB text
    domain) before the comparison needs a wider bucket scheme.

    Plan shape: one map pass for token counts, one O(#domains) groupBy,
    the tiny totals frame joined back BROADCAST, and a scalar min via a
    one-row broadcast cross join. No per-domain windows, no skew exposure:
    the only shuffle over the corpus is none at all — the gate is applied
    map-side under the broadcasted totals.

    Sampling is Bernoulli per document (expected fraction, not exact
    quota): an exact per-domain token quota needs a global sort + running
    sum per domain; the hash gate is one pass, re-shard-stable, and the
    relative error at corpus scale is O(1/sqrt(docs_per_domain)).
    """
    spark = df.sparkSession
    toks = df.select(
        F.col(id_col),
        F.col(domain_col).alias("_dom"),
        word_count(text_col).alias("n_tokens"),
    )
    totals = toks.groupBy("_dom").agg(F.sum("n_tokens").alias("_dom_total"))
    min_total = totals.agg(F.min("_dom_total").alias("_min_total"))
    gate = h64(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))) % buckets
    return (
        toks.join(F.broadcast(totals), "_dom")
        .crossJoin(F.broadcast(min_total))
        .where(gate * F.col("_dom_total") < F.col("_min_total") * buckets)
        .select(F.col(id_col), F.col("_dom").alias(domain_col), "n_tokens")
    )
