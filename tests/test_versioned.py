"""Versioned-table facility (sources/versioned.py): commit log, time
travel, crash-orphan invisibility, vacuum reclamation."""

from __future__ import annotations

import os

import pytest

from data_engineer_capstone_spark.sources.versioned import (
    commit,
    read_version,
    vacuum,
    versions,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id", "id * 2 AS v")


def test_append_overwrite_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "tbl")
    v0 = commit(_df(spark, 0, 10), t)               # 0..9
    v1 = commit(_df(spark, 10, 15), t)              # + 10..14
    v2 = commit(_df(spark, 100, 103), t, mode="overwrite")  # only 100..102
    assert (v0, v1, v2) == (0, 1, 2)
    assert versions(t) == [0, 1, 2]
    assert sorted(r.id for r in read_version(spark, t, 0).collect()) == list(range(10))
    assert read_version(spark, t, 1).count() == 15
    # overwrite snapshot sees only its own rows...
    assert sorted(r.id for r in read_version(spark, t).collect()) == [100, 101, 102]
    # ...but time travel to the pre-overwrite snapshot still works
    assert read_version(spark, t, 1).count() == 15
    with pytest.raises(FileNotFoundError):
        read_version(spark, t, 99)


def test_orphaned_data_dir_is_invisible_and_vacuumable(spark, tmp_path):
    t = str(tmp_path / "tbl")
    commit(_df(spark, 0, 5), t)
    # simulate a writer that crashed after its data write but BEFORE the
    # manifest commit point: write a data dir with no manifest entry
    orphan = str(tmp_path / "tbl/data/deadbeefcafe")
    _df(spark, 900, 910).write.parquet(orphan)
    assert read_version(spark, t).count() == 5  # torn write invisible
    stats = vacuum(t)
    assert stats["removed_dirs"] == 1
    assert not os.path.exists(orphan)
    assert read_version(spark, t).count() == 5


def test_vacuum_drops_time_travel_but_keeps_latest(spark, tmp_path):
    t = str(tmp_path / "tbl")
    commit(_df(spark, 0, 10), t)
    commit(_df(spark, 50, 53), t, mode="overwrite")
    stats = vacuum(t, retain_versions=1)
    assert stats == {"removed_dirs": 1, "removed_manifests": 1}
    assert versions(t) == [1]
    assert sorted(r.id for r in read_version(spark, t).collect()) == [50, 51, 52]
    with pytest.raises(FileNotFoundError):
        read_version(spark, t, 0)


def test_append_after_vacuum_continues_version_chain(spark, tmp_path):
    t = str(tmp_path / "tbl")
    commit(_df(spark, 0, 4), t)
    commit(_df(spark, 4, 8), t)
    vacuum(t, retain_versions=1)
    v = commit(_df(spark, 8, 12), t)
    assert v == 2
    assert read_version(spark, t).count() == 12


def test_vacuum_rejects_nonpositive_retain(spark, tmp_path):
    """ADVICE r4: retain_versions=0 silently retained everything
    (vs[-0:] is the whole list); 0 and negatives must raise."""
    t = str(tmp_path / "tbl")
    commit(_df(spark, 0, 4), t)
    for bad in (0, -1):
        with pytest.raises(ValueError):
            vacuum(t, retain_versions=bad)
    # the table is untouched by the rejected calls
    assert read_version(spark, t).count() == 4
