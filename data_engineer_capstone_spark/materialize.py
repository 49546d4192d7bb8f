"""Lineage-cutting materialization with a fault-tolerance knob.

Iterative and multi-probe operators (connected-components hops, MinHash
signature reuse, range-exchange offset jobs, oriented-edge wedge joins)
re-read an intermediate frame several times; each such site materializes it
once and truncates lineage so Catalyst doesn't recompute — or, in loops,
exponentially re-expand — the upstream plan.

Locally ``localCheckpoint(eager=True)`` is the right tool: blocks live in
executor storage, no disk round-trip. On a real multi-executor cluster the
truncated lineage of a localCheckpoint is unrecoverable after executor
loss — a 1000-executor job that loses one machine mid-loop fails outright.
Production runs therefore need ``DataFrame.checkpoint()`` against a
reliable directory every executor can reach (HDFS / object store).

``materialize(df)`` is the single switch every call site routes through:

- ``SPARK_GRAFT_CHECKPOINT=local`` (default): ``localCheckpoint(eager=True)``
  — correct and fastest for the local[N] harness.
- ``SPARK_GRAFT_CHECKPOINT=reliable``: ``df.checkpoint(eager=True)`` after
  pointing ``SparkContext.setCheckpointDir`` at
  ``SPARK_GRAFT_CHECKPOINT_DIR``. The dir is REQUIRED in reliable mode and
  on a cluster must be a shared-filesystem URI (``hdfs://…``, ``s3a://…``);
  a driver-local path would silently break multi-node recovery, so there
  is deliberately no default.

Both modes return an eagerly-materialized DataFrame with identical
contents and truncated lineage — the downstream plan shapes (post-
checkpoint stats unknown → static SMJ unless AQE re-plans) are the same,
which is why one pytest oracle run under ``reliable`` certifies the mode
for the whole call-site family (see
``tests/test_operators.py::test_reliable_checkpoint_mode_cc_oracle``).

The env var is read per call, not cached, so tests can flip modes inside
one long-lived session.

Retention: reliable-checkpoint files are deleted by ContextCleaner only
when ``spark.cleaner.referenceTracking.cleanCheckpoints=true`` — a
context-creation-time conf, so ``session.get_spark()`` sets it
unconditionally (harmless when no RDD checkpoints exist). Sessions built
OUTSIDE ``get_spark()`` that run reliable mode must either set that conf
themselves or clean ``SPARK_GRAFT_CHECKPOINT_DIR`` externally after the
job: each of the ~90 call sites writes a checkpoint per invocation
(per-round inside the CC/BFS/k-truss loops), so an uncleaned long run
accumulates unboundedly. The final checkpoint of a still-referenced frame
survives either way — cleanup is GC-driven, not eager.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

# checkpoint roots already applied, keyed by Spark application id —
# setCheckpointDir appends a fresh UUID subdir on every call, so we only
# re-issue it when the configured root actually changes.
_APPLIED_ROOTS: dict[str, str] = {}


def _ensure_checkpoint_dir(df: DataFrame) -> None:
    root = os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR")
    if not root:
        raise ValueError(
            "SPARK_GRAFT_CHECKPOINT=reliable requires "
            "SPARK_GRAFT_CHECKPOINT_DIR to point at a directory every "
            "executor can reach (hdfs://…, s3a://…, or a local path in "
            "single-machine mode)."
        )
    sc = df.sparkSession.sparkContext
    app_id = sc.applicationId
    if _APPLIED_ROOTS.get(app_id) != root or sc.getCheckpointDir() is None:
        sc.setCheckpointDir(root)
        _APPLIED_ROOTS[app_id] = root


def materialize(df: DataFrame) -> DataFrame:
    """Eagerly materialize ``df`` and truncate its lineage.

    Chain-friendly: ``df.transform(materialize)`` or ``materialize(df)``.
    """
    mode = os.environ.get("SPARK_GRAFT_CHECKPOINT", "local").lower()
    if mode == "reliable":
        _ensure_checkpoint_dir(df)
        return df.checkpoint(eager=True)
    if mode != "local":
        raise ValueError(
            f"SPARK_GRAFT_CHECKPOINT={mode!r} — expected 'local' or "
            "'reliable'"
        )
    return df.localCheckpoint(eager=True)
