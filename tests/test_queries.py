"""Every oracle-backed declared query hash-matches DuckDB at the smoke SF.

This is the local mirror of the driver's t2 gate (CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import pytest

from data_engineer_capstone_spark.plans import get_oracles, get_queries
from tests.oracle import compare

QUERIES = get_queries()
ORACLES = get_oracles()
ORACLE_BACKED = sorted(n for n in QUERIES if n in ORACLES)


@pytest.mark.parametrize("name", ORACLE_BACKED)
def test_oracle_match(spark, sf_dir, name):
    res = compare(spark, name, QUERIES[name], ORACLES[name], sf_dir)
    assert res["cols_match"], f"{name}: column mismatch {res['spark_cols']} vs {res['duckdb_cols']}"
    assert res["rows_match"], f"{name}: rowcount {res['spark_rows']} vs {res['duckdb_rows']}"
    assert res["hash_match"], f"{name}: value hash mismatch: {res.get('first_diff')}"


def test_rows_only_queries_run(spark, sf_dir):
    """Queries without an oracle must still execute and return a schema.

    Also asserts every top-level column is a flat scalar type: the driver's
    canonicalizer sorts the collected result pandas-side and crashes on
    unhashable array/map/struct cells (the q107 round-1 red row). Nested
    data belongs behind ``element_at``/field projections at the query edge.
    """
    from pyspark.sql.types import ArrayType, MapType, StructType

    for name in sorted(set(QUERIES) - set(ORACLES)):
        df = QUERIES[name](spark, sf_dir)
        assert df.columns, f"{name}: no columns"
        nested = [f.name for f in df.schema.fields
                  if isinstance(f.dataType, (ArrayType, MapType, StructType))]
        assert not nested, f"{name}: driver-hostile nested columns {nested}"
        assert df.count() >= 0
