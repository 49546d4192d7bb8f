"""Local replica of the driver's correctness gate.

Runs a registered Spark query and its DuckDB oracle SQL on the same parquet
tables, then compares row count, column-name set, and an order-insensitive
value hash (columns sorted by name, rows sorted, values canonicalized).
This mirrors the CORRECTNESS_r{N}.json check so regressions surface in
pytest before the driver sees them.
"""

from __future__ import annotations

import datetime
import hashlib
import math
import os
from decimal import Decimal

import duckdb

from data_engineer_capstone_spark.catalog import TABLES


def _canon(v: object) -> str:
    """Driver-strict canonicalization.

    Deliberately does NOT normalize integral floats to ints: the driver's
    canonicalizer compares ``290.0`` (pandas float64, e.g. from a DuckDB
    HUGEINT or a nullable-int column) against Spark's ``290`` as UNEQUAL
    (the r3 q160/q175/q231 reds). Keeping the same strictness here means
    an int-vs-float type divergence between a query and its oracle fails
    locally before the driver ever sees it; oracle output typing is
    additionally guarded by the DESCRIBE sweep in test_queries.py.
    """
    if v is None:
        return "\\N"
    if isinstance(v, bool):
        return "T" if v else "F"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, Decimal):
        f = float(v)
        return _canon(f)
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def rows_fingerprint(columns: list[str], rows: list[tuple]) -> tuple[int, str]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    canon_rows = sorted(
        "\x01".join(_canon(row[i]) for i in order) for row in rows
    )
    h = hashlib.sha256("\x02".join(canon_rows).encode()).hexdigest()
    return len(rows), h


def run_duckdb(sql: str, sf_dir: str) -> tuple[list[str], list[tuple]]:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def compare(spark, name: str, fn, oracle: str, sf_dir: str) -> dict:
    from pyspark.sql.types import ArrayType, MapType, StructType

    sdf = fn(spark, sf_dir)
    # the DRIVER's canonicalizer (unlike this one) pandas-sorts the raw
    # result and dies on unhashable array/map/struct cells — forbid them at
    # the query edge so the stronger harness can never crash (q107 lesson)
    nested = [f.name for f in sdf.schema.fields
              if isinstance(f.dataType, (ArrayType, MapType, StructType))]
    assert not nested, f"{name}: driver-hostile nested result columns {nested}"
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    d_cols, d_rows = run_duckdb(oracle, sf_dir)
    s_n, s_hash = rows_fingerprint(s_cols, s_rows)
    d_n, d_hash = rows_fingerprint(d_cols, d_rows)
    result = {
        "name": name,
        "rows_match": s_n == d_n,
        "cols_match": sorted(s_cols) == sorted(d_cols),
        "hash_match": s_hash == d_hash,
        "spark_rows": s_n,
        "duckdb_rows": d_n,
        "spark_cols": sorted(s_cols),
        "duckdb_cols": sorted(d_cols),
    }
    if not result["hash_match"] and result["cols_match"] and s_n == d_n:
        # locate first differing row for debugging
        order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
        s_sorted = sorted("\x01".join(_canon(r[i]) for i in order) for r in s_rows)
        d_order = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
        d_sorted = sorted("\x01".join(_canon(r[i]) for i in d_order) for r in d_rows)
        for i, (a, b) in enumerate(zip(s_sorted, d_sorted)):
            if a != b:
                result["first_diff"] = {"idx": i, "spark": a[:400], "duckdb": b[:400]}
                break
    return result
