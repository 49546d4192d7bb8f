"""Runtime shuffle-volume audit over the bench headline set (or any list).

`tools/audit_plans.py` checks the STATIC plan (exchange counts, red-flag
operators); this tool measures what actually moved: per-query shuffle
read/write bytes, input bytes, and memory/disk spill, summed over the
stages each query executed, via the Spark status REST API. Bytes are a
property of the plan + data (stable run-to-run, unlike wall time), so one
run per query is the signal — this is the number the "minimize shuffles"
rule in SCALE.md is about, measured instead of asserted.

Usage:
    python tools/shuffle_audit.py [--sf /root/testdata/sf0.1] \
        [--out artifacts/shuffle_audit_sf0.1.json] [names ...]

Interpretation guide (SCALE.md §"Audit trail"): shuffle_write is the
volume a query pushes into exchanges (wedge/pair expansions show up here —
expected for the blocking families, the point is the expansion is bounded);
spill > 0 at bench SF means a partition didn't fit its task's memory and
would need more partitions (or AQE skew splitting) at scale. Shuffle and
spill bytes come from the shuffle manager and are exact; inputBytes relies
on local-FS statistics that under-report under the vectorized parquet
reader, so treat it as a floor, not a measurement.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_engineer_capstone_spark.plans import get_queries  # noqa: E402
from data_engineer_capstone_spark.session import get_spark  # noqa: E402

METRICS = (
    "inputBytes",
    "shuffleReadBytes",
    "shuffleWriteBytes",
    "memoryBytesSpilled",
    "diskBytesSpilled",
)


def _bench_headline() -> list[str]:
    """The bench.py HEADLINE list, imported so the sets can't drift."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    return list(bench.HEADLINE)


def _stages(ui: str, app_id: str) -> dict[tuple[int, int], dict]:
    url = f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=30) as resp:
        rows = json.load(resp)
    return {(r["stageId"], r["attemptId"]): r for r in rows}


def _fmt(n: int) -> str:
    for unit in ("B", "KiB", "MiB", "GiB"):
        if abs(n) < 1024 or unit == "GiB":
            return f"{n:8.1f} {unit}" if unit != "B" else f"{n:8d} B  "
        n /= 1024.0
    return str(n)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="query names (default: bench HEADLINE)")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default=None, help="write the JSON report here")
    args = ap.parse_args()

    names = args.names or [n for n in _bench_headline() if n != "pipeline_q70_q72"]
    # measured bytes must be the real scan, not the small-file persist cache
    os.environ.setdefault("SPARK_GRAFT_TABLE_CACHE", "off")
    spark = get_spark(
        app_name="shuffle_audit",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4049"},
    )
    sc = spark.sparkContext
    ui, app_id = sc.uiWebUrl, sc.applicationId
    registry = get_queries()

    report: dict[str, dict] = {}
    seen = set(_stages(ui, app_id))
    for name in names:
        if name not in registry:
            print(f"{name}: not in registry, skipped", file=sys.stderr)
            continue
        df = registry[name](spark, args.sf)
        # count() executes the full plan without shipping wide rows to the
        # driver (the bench.py COUNT_ONLY rationale, applied to all —
        # driver-side collect bytes are not shuffle behavior)
        df.count()
        after = _stages(ui, app_id)
        new = [after[k] for k in after.keys() - seen]
        seen = set(after)
        report[name] = {m: int(sum(s.get(m, 0) for s in new)) for m in METRICS}
        report[name]["stages"] = len(new)

    order = sorted(report, key=lambda n: -report[n]["shuffleWriteBytes"])
    hdr = f"{'query':36s} {'stages':>6} {'input':>12} {'shuf_read':>12} {'shuf_write':>12} {'spill_mem':>12} {'spill_disk':>12}"
    print(hdr)
    for n in order:
        r = report[n]
        print(
            f"{n[:36]:36s} {r['stages']:6d} {_fmt(r['inputBytes']):>12s}"
            f" {_fmt(r['shuffleReadBytes']):>12s} {_fmt(r['shuffleWriteBytes']):>12s}"
            f" {_fmt(r['memoryBytesSpilled']):>12s} {_fmt(r['diskBytesSpilled']):>12s}"
        )
    total_spill = sum(r["memoryBytesSpilled"] + r["diskBytesSpilled"] for r in report.values())
    print(f"\ntotal spill across {len(report)} queries: {total_spill} bytes")
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"sf": args.sf, "queries": report}, f, indent=1, sort_keys=True)
        print(f"wrote {args.out}")
    spark.stop()


if __name__ == "__main__":
    main()
