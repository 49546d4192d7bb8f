"""q242 cn-aggregate experiment (round 12, VERDICT r11 ask #6).

Round 7 measured that letting the (a, b) common-neighbor aggregate do
map-side partial aggregation (plain groupBy) was a loss vs the explicit
``repartition(n_part, a, b)`` + groupBy shape the engine ships: the wedge
stream's duplicates of one (a, b) pair originate from DIFFERENT src
partitions, so per-map-task dedup is poor and the partial hash table is
pure overhead. That measurement predates Spark 4.1 — this script re-runs
it on the current engine so the decision carries current evidence.

Variants, each driven by a noop sink (guide §1.4), fresh comparison in
ONE session (the wedge inputs are materialized once so only the
aggregate shape differs):

  shipped   repartition(n_part, a, b) + groupBy     (exchange carries the
            raw wedge stream once; partial+final collapse post-shuffle)
  partial   groupBy(a, b) at shuffle.partitions = n_part (map-side
            partial aggregation before the exchange)

Usage:  python tools/experiment_q242_agg.py [--runs 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = (
        SparkSession.builder.appName("experiment-q242-agg")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from data_engineer_capstone_spark.materialize import materialize
    from data_engineer_capstone_spark.plans.training_data import _edges
    from data_engineer_capstone_spark.sizing import expansion_partitions

    edges = materialize(_edges(spark, args.sf))
    und = edges.select(
        F.explode(
            F.array(
                F.struct(F.col("a").alias("src"), F.col("b").alias("dst")),
                F.struct(F.col("b").alias("src"), F.col("a").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    wedge_est = (
        und.groupBy("src")
        .agg(F.count(F.lit(1)).alias("d"))
        .agg(F.sum(F.col("d") * (F.col("d") - F.lit(1)) / 2).alias("w"))
        .collect()[0][0]
    )
    n_part = expansion_partitions(spark, wedge_est)
    print(f"wedges={wedge_est} n_part={n_part}")
    und = materialize(und.repartition(n_part, "src"))
    x, y = und.alias("x"), und.hint("shuffle_hash").alias("y")
    pairs = x.join(
        y, (F.col("x.src") == F.col("y.src")) & (F.col("x.dst") < F.col("y.dst"))
    ).select(F.col("x.dst").alias("a"), F.col("y.dst").alias("b"))

    shipped = (
        pairs.repartition(n_part, "a", "b")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    partial = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("common"))

    for tag, df in (("shipped", shipped), ("partial", partial)):
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"q242-agg-{tag}-{i}")
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            print(f"{tag} run{i}: {time.time() - t0:.2f}s", flush=True)
            spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
