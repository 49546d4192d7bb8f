"""Golden end-to-end hashes (SURVEY.md §5): the star-schema pipeline
outputs over the checked-in fixtures are pinned byte-for-byte.

The oracle tests (test_queries.py) prove Spark == DuckDB *today*; these
prove the semantics never drift from what round 1 shipped — a refactor
that changes results in BOTH engines identically (e.g. an id-ordering
change) passes the oracle but fails here.

If a change is INTENTIONAL, update the hash with:
    python -m tests.test_golden   # prints current hashes
"""

from __future__ import annotations

import hashlib

import pytest

GOLDEN = {
    "q70_visitor_pipeline": (4863, "064958b37b045413"),
    "q71_worker_pipeline": (2478, "68e273614d333ac1"),
    "q72_time_fact_accumulation": (7541, "b7d49a15377b10ac"),
}


def _fingerprint(df) -> tuple[int, str]:
    cols = sorted(df.columns)
    rows = sorted(tuple(str(r[c]) for c in cols) for r in df.collect())
    return len(rows), hashlib.sha256(repr(rows).encode()).hexdigest()[:16]


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_golden(spark, sf_dir, name):
    from data_engineer_capstone_spark.plans import get_queries

    # pipeline queries read the checked-in fixtures; sf_dir is unused by
    # them but part of the query signature
    got = _fingerprint(get_queries()[name](spark, sf_dir))
    assert got == GOLDEN[name], f"{name}: output drifted from golden {GOLDEN[name]} -> {got}"


if __name__ == "__main__":
    import sys

    sys.path.insert(0, ".")
    from data_engineer_capstone_spark.plans import get_queries
    from data_engineer_capstone_spark.session import get_spark

    spark = get_spark(app_name="golden")
    for name in sorted(GOLDEN):
        df = get_queries()[name](spark, "/root/testdata/sf0.01")
        print(name, _fingerprint(df))
