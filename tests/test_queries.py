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


def test_no_hugeint_oracle_columns(sf_dir):
    """No oracle may emit a HUGEINT/UHUGEINT output column.

    The driver fetches DuckDB results via pandas, which renders HUGEINT as
    float64; its canonicalizer then compares ``290.0`` against Spark's
    ``290`` and the value hash diverges even though both engines computed
    the same number (the r3 q160/q175/q231 reds — DuckDB's ``count_if``,
    ``SUM(BIGINT)`` and ``list_sum`` all widen to HUGEINT). Every such
    expression must be wrapped in ``CAST(... AS BIGINT)`` in the oracle.

    Why plain nullable BIGINT/INTEGER columns are NOT in this class
    (audited round 4 across all 257 oracles — q32/q42/q71-class columns
    floatify in pandas too, yet those queries are driver-GREEN): pandas
    renders NULL-bearing int columns as float64 on BOTH sides — the
    driver converts the Spark result through pandas as well — and when
    the values match, the nulls sit in the same rows, so the
    floatification is symmetric and the hashes agree. HUGEINT is the
    asymmetric case: it floatifies with no nulls at all, while the Spark
    twin stays int64.
    """
    import duckdb as _duckdb
    import os as _os

    from data_engineer_capstone_spark.catalog import TABLES

    con = _duckdb.connect()
    for t in TABLES:
        path = _os.path.join(sf_dir, f"{t}.parquet")
        if _os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    offenders = {}
    for name, sql in ORACLES.items():
        desc = con.execute(f"DESCRIBE ({sql.rstrip().rstrip(';')})").fetchall()
        hug = [
            (col, typ) for col, typ, *_ in desc if "HUGEINT" in typ.upper()
        ]
        if hug:
            offenders[name] = hug
    assert not offenders, f"driver-hostile HUGEINT oracle columns: {offenders}"


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
