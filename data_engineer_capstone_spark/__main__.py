"""CLI entry point: build the star-schema lake end-to-end.

The reference's equivalent is its spark-submit EMR step
(pyspark.py:478-486) — whose argparse driver has a latent
``Namespace + str`` TypeError (SURVEY §3.1) and is not replicated.

    python -m data_engineer_capstone_spark \
        --fixtures fixtures/ --out /tmp/lake --format parquet --weekday iso

Flow: session -> build_all (persisted conformed dims) -> quality gates
(non-empty + schema/type equality per table; exit 1 on any failure) ->
partitioned writes per the reference's partition specs.
"""

from __future__ import annotations

import argparse
import json
import sys

from .pipeline.build import FIXTURES_DIR, build_all, run_quality_gates, write_lake
from .session import get_spark


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="data_engineer_capstone_spark")
    p.add_argument("--fixtures", default=FIXTURES_DIR, help="raw input directory")
    p.add_argument("--out", required=True, help="output lake directory")
    p.add_argument("--format", default="parquet", choices=["parquet", "csv", "json", "orc"])
    p.add_argument(
        "--weekday",
        default="abbrev",
        choices=["abbrev", "iso"],
        help="weekday encoding: 'abbrev' = reference semantics (locale-pinned "
        "'mon'...), 'iso' = deterministic 0-6 (documented fix, SURVEY §7.3)",
    )
    p.add_argument("--skip-write", action="store_true", help="gates only, no write")
    args = p.parse_args(argv)

    spark = get_spark(app_name="capstone-etl")
    tables = build_all(spark, fixtures=args.fixtures, weekday=args.weekday)
    gates = run_quality_gates(tables, weekday=args.weekday)
    print(json.dumps(gates, indent=2))
    if not all(all(checks.values()) for checks in gates.values()):
        print("quality gates FAILED", file=sys.stderr)
        return 1
    if not args.skip_write:
        write_lake(tables, args.out, fmt=args.format)
        print(f"lake written to {args.out}")
    for df in tables.values():
        df.unpersist()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
