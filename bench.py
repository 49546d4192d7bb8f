"""BENCH harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Protocol (BASELINE.md): per query, 1 warm-up run + 3 timed runs, median
reported; value = sum of medians across the headline set. Timing includes
the full action (collect of aggregate results / count for wide outputs) but
not session startup.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_engineer_capstone_spark.plans import get_queries
from data_engineer_capstone_spark.session import get_spark

HEADLINE = [
    "q21_star_join_revenue",
    "q30_tpch_q1_agg",
    "q40_row_number_topk",
    "q02_projection_arithmetic",
    "q43_running_sum",
]
# Wide results: don't collect millions of rows to the driver; count() still
# executes the full plan.
COUNT_ONLY = {"q02_projection_arithmetic", "q43_running_sum"}


def run_one(spark, fn, name: str, sf_dir: str) -> float:
    times = []
    for i in range(4):
        t0 = time.time()
        df = fn(spark, sf_dir)
        if name in COUNT_ONLY:
            df.count()
        else:
            df.collect()
        times.append(time.time() - t0)
    return statistics.median(times[1:])


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bench")
    registry = get_queries()
    per_query: dict[str, float] = {}
    for name in HEADLINE:
        if name not in registry:
            continue
        per_query[name] = round(run_one(spark, registry[name], name, sf_dir), 3)
    total = round(sum(per_query.values()), 3)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "sf": float(sf) if sf else sf_dir,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
