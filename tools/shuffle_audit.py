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
import time
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
    # core-time, summed over tasks: executorRunTime is wall-on-core ms,
    # executorCpuTime is ns. Unlike the query's driver-side wall clock,
    # these divide out scheduling gaps and are far more stable under
    # shared-VM load — the drift-investigation protocol's preferred
    # signal (see the BASELINE.md round-7 cold-container note: wall
    # readings moved 2x run-to-run while plans and bytes were identical).
    "executorRunTime",
    "executorCpuTime",
)

# --skew: flag stages whose slowest task ran this many times longer than
# the median task. Only stages with enough tasks for a meaningful
# distribution (and enough total time to matter) are considered.
SKEW_MIN_TASKS = 8
SKEW_MIN_STAGE_MS = 2000


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


def _stages_settled(
    ui: str,
    app_id: str,
    seen: set,
    polls: int = 25,
    interval: float = 0.2,
    stable_needed: int = 10,
) -> tuple[dict[tuple[int, int], dict], str]:
    """Poll the completed-stage set until it is stable AND has grown.

    The status store is fed by an async listener bus, so stages can
    register after the query's action returns; a single immediate poll
    would attribute those late stages to the NEXT query and silently drop
    the final query's (ADVICE r7 finding #1). Stable = two consecutive
    polls return the same key set after at least one stage new vs ``seen``
    has appeared; bounded at ``polls`` rounds so a genuinely stage-free
    query (cached/metadata-only plan) can't hang the audit.

    Returns ``(stages, status)`` with status one of (ADVICE r9 #1 — the
    r8 boolean conflated the two non-growth cases with trusted growth):

    - ``"grew"``: stabilized after at least one stage new vs ``seen``
      appeared — the only status whose stage attribution is trusted.
    - ``"stage_free"``: stable with NO growth for ``stable_needed``
      consecutive polls (~2 s; raised from the r8 value of 5/~1.2 s so
      the no-growth wait exceeds any listener-bus lag observed in the r7
      investigation). Either a genuinely stage-free query or a listener
      bus slower than the window — callers must surface the zero-stage
      attribution rather than flag the row trustworthy.
    - ``"bound_hit"``: the poll bound elapsed without stabilizing; late
      stages may misattribute to the next query's row.

    ``main()`` records ``settled = (status == "grew")`` plus the raw
    status, so a stage-producing query whose stages registered late can
    no longer masquerade as a settled zero-stage row.
    """
    prev = _stages(ui, app_id)
    stable = 0
    for _ in range(polls):
        time.sleep(interval)
        cur = _stages(ui, app_id)
        if set(cur) == set(prev):
            if set(cur) - seen:
                return cur, "grew"
            stable += 1
            if stable >= stable_needed:
                return cur, "stage_free"
        else:
            stable = 0
        prev = cur
    return prev, "bound_hit"


def _stage_skew(ui: str, app_id: str, stage: dict) -> dict | None:
    """Per-task distribution for one completed stage.

    The DATA-skew signal is bytes per task (shuffle read/write max vs
    median) — it is a property of the partitioning and the key
    distribution, reproducible run-to-run. Task RUN-TIME max/median is
    reported too but is load-sensitive on a shared VM (a 7.8x time
    ratio measured on this repo's q242 under load collapsed to 1.5x on
    a calm box with byte ratios of 1.0) — treat time ratios as skew
    only when the byte ratio agrees.
    """
    sid, att = stage["stageId"], stage["attemptId"]
    url = (
        f"{ui}/api/v1/applications/{app_id}/stages/{sid}/{att}/taskSummary"
        f"?quantiles=0.5,1.0"
    )
    try:
        with urllib.request.urlopen(url, timeout=30) as resp:
            summ = json.load(resp)
    except Exception:
        return None
    med, mx = summ.get("executorRunTime", [0, 0])
    if not med:
        return None
    ratios = {}
    clamped = {}
    flags = []
    for label, path in (
        ("read", ("shuffleReadMetrics", "readBytes")),
        ("write", ("shuffleWriteMetrics", "writeBytes")),
    ):
        q = summ.get(path[0], {}).get(path[1])
        if not q:
            continue
        med_b, max_b = q[0], q[-1]
        if med_b > 1024:
            ratios[label] = round(max_b / med_b, 2)
        elif max_b > 1024 * 1024:
            # median task under the 1 KiB noise floor while one task
            # carries MiBs — the MOST skewed shape; a true ratio would
            # divide by ~0. Keep the clamped max/1KiB figure in its OWN
            # bucket (ADVICE r8: it is bytes-over-noise-floor, not a
            # max/median ratio — mixing units let a 2 MiB single-task
            # stage outrank a true 100x skew on a 10 GiB stage). Flagged
            # rows rank first as a class; see the sort keys below.
            clamped[label] = round(max_b / 1024.0, 2)
            flags.append(f"{label}:median~0")
    return {
        "stageId": sid,
        "numTasks": stage["numTasks"],
        "medianTaskMs": int(med),
        "maxTaskMs": int(mx),
        "ratio": round(mx / med, 2),
        "bytesRatio": max(ratios.values()) if ratios else None,
        "bytesRatios": ratios,
        "clampedRatios": clamped,
        "flags": flags,
    }


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
    ap.add_argument(
        "--skew",
        action="store_true",
        help="also fetch per-stage task-time quantiles and report each "
        "query's worst max/median straggler ratio (stages with >= "
        f"{SKEW_MIN_TASKS} tasks and >= {SKEW_MIN_STAGE_MS} ms total)",
    )
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
        after, status = _stages_settled(ui, app_id, seen)
        new = [after[k] for k in after.keys() - seen]
        seen = set(after)
        report[name] = {m: int(sum(s.get(m, 0) for s in new)) for m in METRICS}
        report[name]["stages"] = len(new)
        # ADVICE r8+r9: only growth-settled attribution is trusted; a
        # stage_free or bound_hit row's stages may leak into the next row
        report[name]["settled"] = status == "grew"
        report[name]["settle_status"] = status
        if args.skew:
            worst = None
            for s in new:
                if (
                    s["numTasks"] < SKEW_MIN_TASKS
                    or s.get("executorRunTime", 0) < SKEW_MIN_STAGE_MS
                ):
                    continue
                sk = _stage_skew(ui, app_id, s)
                # rank by the reproducible signal (bytes), fall back to
                # time; median~0 flagged stages rank first AS A CLASS —
                # their clamped figure is bytes-over-noise-floor, not a
                # max/median ratio, so it never competes numerically with
                # true ratios (ADVICE r8)
                key = lambda d: (  # noqa: E731
                    bool(d["flags"]),
                    max(d["clampedRatios"].values(), default=0),
                    d["bytesRatio"] or 0,
                    d["ratio"],
                )
                if sk and (worst is None or key(sk) > key(worst)):
                    worst = sk
            report[name]["worst_skew"] = worst

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
    if args.skew:
        print(f"\n{'query':36s} {'core_s':>7} {'cpu_s':>7}  worst straggler stage")
        skey = lambda n: (  # noqa: E731
            bool((report[n].get("worst_skew") or {}).get("flags")),
            max(
                (
                    (report[n].get("worst_skew") or {}).get("clampedRatios")
                    or {}
                ).values(),
                default=0,
            ),
            (report[n].get("worst_skew") or {}).get("bytesRatio") or 0,
            (report[n].get("worst_skew") or {}).get("ratio", 0),
        )
        for n in sorted(report, key=skey, reverse=True):
            r = report[n]
            w = r.get("worst_skew")
            detail = (
                f"stage {w['stageId']} ({w['numTasks']} tasks): "
                f"bytes max/med = {w['bytesRatio']}x {w['bytesRatios']}"
                + (
                    f" clamped(max/1KiB) = {w['clampedRatios']}"
                    if w.get("clampedRatios")
                    else ""
                )
                + f"{' [' + ','.join(w['flags']) + ']' if w.get('flags') else ''}, "
                f"time {w['maxTaskMs']}/{w['medianTaskMs']} ms = {w['ratio']}x"
                if w
                else "no qualifying stage"
            )
            print(
                f"{n[:36]:36s} {r['executorRunTime']/1000:7.1f} "
                f"{r['executorCpuTime']/1e9:7.1f}  {detail}"
            )
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"sf": args.sf, "queries": report}, f, indent=1, sort_keys=True)
        print(f"wrote {args.out}")
    spark.stop()


if __name__ == "__main__":
    main()
