"""Local replica of the per-round correctness check the build driver runs.

Smoke-runs ``entry()`` at sf0.001, then for every ``queries()`` entry at the
driver's t2 SF: runs the Spark side and (when an oracle exists) checks column
set + row count against DuckDB. With ``--hash`` it applies the FULL
driver-strict comparison instead (columns sorted by name, rows sorted,
floats canonicalized — ``tests/oracle.py:compare``, the same contract
``tests/test_queries.py`` enforces at the pytest smoke SF): slower
(~8 min vs ~5 min at sf0.01 on local[32]) but it catches value-level
divergence that only appears at the larger SF, e.g. BIGINT overflow in an
oracle expression (the q402 class).

    python tools/driver_sim.py [sf_dir] [--hash]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from data_engineer_capstone_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--hash"]
    full_hash = "--hash" in sys.argv[1:]
    if args and args[0] == "--sf":  # optional flag form of the positional
        args = args[1:]
    sf = args[0] if args else "/root/testdata/sf0.01"
    spark = get_spark(app_name="driver-sim", shuffle_partitions=8)
    print("entry rows:", len(E.entry(spark).collect()), flush=True)
    qs, osql = E.queries(), E.oracle_sql()
    failed = []
    if full_hash:
        import time

        from tests.oracle import compare

        for name in sorted(qs):
            t0 = time.time()
            try:
                if name not in osql:
                    n = qs[name](spark, sf).count()  # rows-only by design
                    print(
                        f"OK   {name} rows-only n={n} "
                        f"{time.time() - t0:.2f}s",
                        flush=True,
                    )
                    continue
                r = compare(spark, name, qs[name], osql[name], sf)
                ok = r["cols_match"] and r["rows_match"] and r["hash_match"]
                if not ok:
                    raise AssertionError(str(r.get("first_diff"))[:200])
                print(
                    f"OK   {name} n={r['spark_rows']} "
                    f"{time.time() - t0:.2f}s",
                    flush=True,
                )
            except Exception as ex:
                failed.append((name, str(ex)[:200]))
                print(f"FAIL {name}: {str(ex)[:200]}", flush=True)
        print(
            f"driver-sim[--hash] {'OK' if not failed else 'FAILED'} "
            f"{len(qs)} queries, {len(failed)} failures",
            flush=True,
        )
        return 1 if failed else 0
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    for name in sorted(qs):
        try:
            sdf = qs[name](spark, sf)
            if name in osql:
                cur = con.execute(osql[name])
                cols = sorted(d[0] for d in cur.description)
                assert sorted(sdf.columns) == cols, f"cols {sorted(sdf.columns)} != {cols}"
                n_oracle = len(cur.fetchall())
                n_spark = sdf.count()
                assert n_spark == n_oracle, f"rows {n_spark} != {n_oracle}"
            else:
                sdf.count()
        except Exception as ex:  # keep going; report all failures at once
            failed.append((name, str(ex)[:200]))
            print(f"FAIL {name}: {str(ex)[:200]}", flush=True)
    print(f"driver-sim {'OK' if not failed else 'FAILED'} "
          f"{len(qs)} queries, {len(failed)} failures", flush=True)
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
