"""Guards against doc/registry drift (VERDICT r4 ask #5: the README's
query counts drifted twice during round 4) and against rotation-table
mistakes in ``__spark_entry__.py`` (names that fell out of the registry,
duplicates across the verified tuples, or a rotation that drops queries).
"""

from __future__ import annotations

import os
import re

from data_engineer_capstone_spark.plans import get_oracles, get_queries

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_readme_counts_match_registry():
    with open(os.path.join(_ROOT, "README.md")) as f:
        text = f.read()
    m = re.search(
        r"(\d+) of the (\d+) registered queries carry a DuckDB oracle", text
    )
    assert m, "README count sentence not found — keep it or update this test"
    assert int(m.group(2)) == len(get_queries()), (
        f"README says {m.group(2)} registered queries, "
        f"registry has {len(get_queries())}"
    )
    assert int(m.group(1)) == len(get_oracles()), (
        f"README says {m.group(1)} oracle-backed queries, "
        f"registry has {len(get_oracles())}"
    )


def test_rotation_tables_consistent():
    import __spark_entry__ as entry

    reg = get_queries()
    verified = (
        entry._DRIVER_VERIFIED_R1_R2
        + entry._DRIVER_VERIFIED_R3
        + entry._DRIVER_VERIFIED_R4
        + entry._DRIVER_VERIFIED_R5
        + entry._DRIVER_VERIFIED_R6
        + entry._DRIVER_VERIFIED_R7
        + entry._DRIVER_VERIFIED_R8
    )
    # every verified name must still exist in the registry
    missing = [n for n in verified if n not in reg]
    assert not missing, f"verified names missing from registry: {missing}"
    # no duplicates across the verified tuples
    assert len(verified) == len(set(verified))
    # the rotation is a permutation of the registry (nothing dropped/added)
    rotated = entry.queries()
    assert set(rotated) == set(reg)
    assert len(rotated) == len(reg)
    # the never-driver-checked SURVEY §2.9 declared core leads the rotation
    head = list(rotated)[: len(reg) - len(verified)]
    core_in_head = [
        n for n in head if entry._CORE_LO <= entry._qnum(n) <= entry._CORE_HI
    ]
    assert head[: len(core_in_head)] == core_in_head, (
        "declared-core q63-q116 names must front the rotation"
    )


def test_verified_r5_matches_driver_record():
    """_DRIVER_VERIFIED_R5 must be exactly the CORRECTNESS_r05.json sample
    (folding in a name the driver never checked would skip its turn)."""
    import json

    import __spark_entry__ as entry

    path = os.path.join(_ROOT, "CORRECTNESS_r05.json")
    with open(path) as f:
        record = json.load(f)
    assert set(entry._DRIVER_VERIFIED_R5) == set(record)


def test_verified_r6_matches_driver_record():
    """_DRIVER_VERIFIED_R6 must be exactly the CORRECTNESS_r06.json sample."""
    import json

    import __spark_entry__ as entry

    path = os.path.join(_ROOT, "CORRECTNESS_r06.json")
    with open(path) as f:
        record = json.load(f)
    assert set(entry._DRIVER_VERIFIED_R6) == set(record)


def test_verified_r7_matches_driver_record():
    """_DRIVER_VERIFIED_R7 must be exactly the CORRECTNESS_r07.json sample."""
    import json

    import __spark_entry__ as entry

    path = os.path.join(_ROOT, "CORRECTNESS_r07.json")
    with open(path) as f:
        record = json.load(f)
    assert set(entry._DRIVER_VERIFIED_R7) == set(record)


def test_verified_r8_matches_driver_record():
    """_DRIVER_VERIFIED_R8 must be exactly the CORRECTNESS_r08.json sample."""
    import json

    import __spark_entry__ as entry

    path = os.path.join(_ROOT, "CORRECTNESS_r08.json")
    with open(path) as f:
        record = json.load(f)
    assert set(entry._DRIVER_VERIFIED_R8) == set(record)


def test_rotation_head_is_final_r9_block():
    """VERDICT r8 ask #8: the r9 driver sample must actually consume the
    final never-checked block — q384 leads the rotation head and the head
    is exactly the 29 names q384..q412 in numeric order."""
    import __spark_entry__ as entry

    rotated = list(entry.queries())
    assert rotated[0].startswith("q384_"), (
        f"rotation head is {rotated[0]}, expected the q384 block to lead"
    )
    head = rotated[:29]
    nums = [entry._qnum(n) for n in head]
    assert nums == sorted(nums) and nums[0] == 384 and nums[-1] == 412, (
        f"head must be the q384..q412 block in order, got {head}"
    )
    # nothing never-driver-checked remains beyond the head
    verified = set(
        entry._DRIVER_VERIFIED_R1_R2 + entry._DRIVER_VERIFIED_R3
        + entry._DRIVER_VERIFIED_R4 + entry._DRIVER_VERIFIED_R5
        + entry._DRIVER_VERIFIED_R6 + entry._DRIVER_VERIFIED_R7
        + entry._DRIVER_VERIFIED_R8
    )
    assert all(n in verified for n in rotated[29:]), (
        "every name past the head must already be driver-verified"
    )


def test_bench_names_exist_in_registry():
    """A renamed/retired query must not silently break the driver's bench
    run — every name bench.py references has to resolve in the registry."""
    prev = os.environ.get("SPARK_GRAFT_TABLE_CACHE")
    import bench  # sets SPARK_GRAFT_TABLE_CACHE=off as an import side effect

    if prev is None:
        os.environ.pop("SPARK_GRAFT_TABLE_CACHE", None)
    else:
        os.environ["SPARK_GRAFT_TABLE_CACHE"] = prev

    reg = get_queries()
    missing = [n for n in bench.HEADLINE if n not in reg]
    missing += [n for n in bench.PIPELINE_COMPOSITE if n not in reg]
    assert not missing, f"bench names missing from registry: {missing}"
    known = set(bench.HEADLINE) | set(bench.PIPELINE_COMPOSITE)
    stray = [n for n in bench.COUNT_ONLY if n not in known]
    assert not stray, f"bench option sets reference untimed names: {stray}"


def test_bench_keys_match_r8_record():
    """VERDICT r8 ask #5: BENCH_r09 vs BENCH_r08 must be like-for-like —
    the bench key set is pinned to the keys the round-8 record reported."""
    import json

    prev = os.environ.get("SPARK_GRAFT_TABLE_CACHE")
    import bench

    if prev is None:
        os.environ.pop("SPARK_GRAFT_TABLE_CACHE", None)
    else:
        os.environ["SPARK_GRAFT_TABLE_CACHE"] = prev

    with open(os.path.join(_ROOT, "BENCH_r08.json")) as f:
        recorded = set(json.load(f)["parsed"]["queries"])
    # the PIPELINE_COMPOSITE trio reports as the single pipeline_q70_q72 key
    current = set(bench.HEADLINE) | {"pipeline_q70_q72"}
    assert current == recorded, (
        f"bench keys drifted vs BENCH_r08: +{current - recorded} "
        f"-{recorded - current}"
    )
