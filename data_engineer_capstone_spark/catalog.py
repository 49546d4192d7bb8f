"""Table catalog: load driver testdata parquet and register temp views.

The driver's tables (TESTDATA.md) are: region nation customer supplier part
orders lineitem events documents embeddings — one parquet file each under a
scale-factor directory.

Scale notes (100 TB): the loader is a thin veneer over ``spark.read.parquet``
so every downstream query keeps full predicate pushdown / column pruning /
partition pruning against the files. Nothing is collected or materialized
here. The one normalization — the ``events`` nanosecond-timestamp column —
is a single projected expression that stays inside whole-stage codegen.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a DataFrame.

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS,false); with
    ``spark.sql.legacy.parquet.nanosAsLong=true`` it arrives as a long of
    nanoseconds. We convert with integer division (``div`` — double math
    would lose precision above 2^53 ns) to microseconds, matching DuckDB's
    ``CAST(ts AS TIMESTAMP)`` truncation, and cast to TIMESTAMP_NTZ to match
    how Spark reads the other tables' ms timestamps.
    """
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts", F.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")
        )
    return df


def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    """Register every testdata table as a temp view for the SQL surface."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
