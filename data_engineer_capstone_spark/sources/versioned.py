"""Versioned parquet tables with time travel — a minimal Delta-style
commit log over a plain directory.

Why this exists at 100 TB: overwriting a lake table in place destroys the
ability to (a) reproduce yesterday's training run, (b) diff snapshots
(q128), (c) roll back a bad ingest, and (d) maintain incremental views
(q235) — all of which key off *immutable snapshots*. Transactional table
formats solve this with a manifest log; this module is the same design
reduced to its core so the mechanics are visible and testable:

- data files are IMMUTABLE: every commit writes its rows into a fresh
  ``data/<uuid>/`` directory and never touches earlier files;
- a snapshot is a JSON manifest ``_log/v{N}.json`` listing exactly the
  data directories visible at version N (append = previous list + new,
  overwrite = new only);
- the manifest write IS the commit point: readers resolve a version by
  reading one small JSON, so a crashed writer leaves only an orphaned
  (invisible, vacuumable) data directory, never a torn table;
- time travel = read the file list of an older manifest;
- ``vacuum`` deletes data directories no retained manifest references.

Single-writer by design (like ``operators/maintenance.compact``): real
multi-writer logs need an atomic rename / CAS on the log entry, which is
exactly what the production table formats add on top of this layout.

No counterpart in the reference (it writes each output once —
`/root/reference/scripts/pyspark.py:306-322` plain overwrite writes);
extension surface for the long-lived-lake use case.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

_LOG = "_log"
_DATA = "data"


def _log_dir(table_dir: str) -> str:
    return os.path.join(table_dir, _LOG)


def versions(table_dir: str) -> list[int]:
    """Committed versions, ascending (empty for a nonexistent table)."""
    d = _log_dir(table_dir)
    if not os.path.isdir(d):
        return []
    out = []
    for f in os.listdir(d):
        if f.startswith("v") and f.endswith(".json"):
            out.append(int(f[1:-5]))
    return sorted(out)


def _manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(_log_dir(table_dir), f"v{version}.json")


def _read_manifest(table_dir: str, version: int) -> dict:
    with open(_manifest_path(table_dir, version)) as f:
        return json.load(f)


def commit(df: DataFrame, table_dir: str, mode: str = "append") -> int:
    """Write ``df`` as a new immutable snapshot; returns the new version.

    ``mode='append'``: the new snapshot sees all previous data plus this
    commit's rows. ``mode='overwrite'``: the new snapshot sees only this
    commit's rows — earlier files stay on disk for time travel until
    ``vacuum``.
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"unknown commit mode: {mode}")
    os.makedirs(_log_dir(table_dir), exist_ok=True)
    vs = versions(table_dir)
    prev_dirs: list[str] = []
    if vs and mode == "append":
        prev_dirs = _read_manifest(table_dir, vs[-1])["data_dirs"]
    new_dir = os.path.join(_DATA, uuid.uuid4().hex)
    df.write.parquet(os.path.join(table_dir, new_dir))
    version = (vs[-1] + 1) if vs else 0
    manifest = {
        "version": version,
        "mode": mode,
        "data_dirs": prev_dirs + [new_dir],
    }
    # the manifest write is the commit point: write-then-rename so a
    # reader never observes a half-written JSON
    tmp = _manifest_path(table_dir, version) + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, _manifest_path(table_dir, version))
    return version


def read_version(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Snapshot read: latest when ``version`` is None, else time travel."""
    vs = versions(table_dir)
    if not vs:
        raise FileNotFoundError(f"no committed versions under {table_dir}")
    v = vs[-1] if version is None else version
    if v not in vs:
        raise FileNotFoundError(f"version {v} not in {vs}")
    dirs = _read_manifest(table_dir, v)["data_dirs"]
    paths = [os.path.join(table_dir, d) for d in dirs]
    return spark.read.parquet(*paths)


def vacuum(table_dir: str, retain_versions: int = 1) -> dict:
    """Delete data dirs unreferenced by the ``retain_versions`` newest
    manifests (and drop the older manifests) — the storage-reclaim half
    of the contract: time travel works until you vacuum, never after."""
    if retain_versions < 1:
        raise ValueError(
            f"retain_versions must be >= 1, got {retain_versions} "
            "(a Python slice [-0:] would silently retain everything)"
        )
    vs = versions(table_dir)
    if not vs:
        return {"removed_dirs": 0, "removed_manifests": 0}
    keep_vs = vs[-retain_versions:]
    keep_dirs: set[str] = set()
    for v in keep_vs:
        keep_dirs.update(_read_manifest(table_dir, v)["data_dirs"])
    data_root = os.path.join(table_dir, _DATA)
    removed = 0
    if os.path.isdir(data_root):
        for d in os.listdir(data_root):
            rel = os.path.join(_DATA, d)
            if rel not in keep_dirs:
                shutil.rmtree(os.path.join(data_root, d))
                removed += 1
    dropped = 0
    for v in vs:
        if v not in keep_vs:
            os.remove(_manifest_path(table_dir, v))
            dropped += 1
    return {"removed_dirs": removed, "removed_manifests": dropped}
