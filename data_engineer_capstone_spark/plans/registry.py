"""Query registry.

Each declared query (SURVEY.md §2.9) registers a callable
``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) the equivalent
DuckDB oracle SQL. The driver's correctness gate runs both sides at sf0.01
and hash-compares sorted rows with columns sorted by name — so every
computed column is aliased identically on both sides.

Determinism rules (SURVEY.md §2.9 preamble):
- money math goes through exact DECIMAL(18,4) sums before rounding, so the
  result does not depend on partition-wise float addition order;
- no locale-dependent or nondeterministic functions in oracle-checked
  queries;
- every query carries a total ORDER BY (the driver sorts rows anyway, but a
  total order keeps ties deterministic for LIMIT queries).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a declared query; ``oracle`` is DuckDB SQL or None for
    non-SQL-expressible operators (driver then records a rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def get_queries() -> dict[str, QueryFn]:
    return dict(QUERIES)


def get_oracles() -> dict[str, str]:
    return dict(ORACLES)
