"""State-store configuration surface (SURVEY.md §2.8 scale notes).

The default state store (HDFSBackedStateStoreProvider) keeps every key's
state as JVM heap objects — fine for small keyspaces, but a 100 TB/day
stream with hundreds of millions of live keys (sessions, dedup hashes)
blows the heap and makes GC pauses the latency floor. The RocksDB
provider (bundled with Spark since 3.2) keeps state off-heap in an
embedded LSM store with incremental changelog checkpointing, so state
size is bounded by local disk, not executor memory.

``rocksdb_state_store`` flips the session to RocksDB for queries started
inside the ``with`` block; the provider is captured per-query at start,
so already-running queries are unaffected.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import SparkSession

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

# Changelog checkpointing uploads per-batch deltas instead of full RocksDB
# snapshots — the difference between O(state) and O(changed keys) of
# checkpoint I/O per micro-batch.
ROCKSDB_CONF: dict[str, str] = {
    "spark.sql.streaming.stateStore.providerClass": ROCKSDB_PROVIDER,
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
}


@contextmanager
def rocksdb_state_store(spark: SparkSession) -> Iterator[None]:
    """Run queries started inside the block on the RocksDB state store."""
    prior: dict[str, str | None] = {}
    for k, v in ROCKSDB_CONF.items():
        try:
            prior[k] = spark.conf.get(k)
        except Exception:
            prior[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, old in prior.items():
            if old is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, old)
