"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference ETL application (ZeDespo/data_engineer_capstone,
surveyed in SURVEY.md).

Architecture: DataFrame/SQL-first. Every operator is expressed as a
declarative Spark plan so Catalyst/Tungsten/AQE pick the physical strategy;
Python UDFs appear only where built-ins genuinely cannot express the
semantics, and then only as Arrow-batched pandas UDFs.

Layout:
- ``session``    – SparkSession factory (AQE on, UTC, tuned for local[N]).
- ``catalog``    – testdata table loader / temp-view registration.
- ``functions``  – scalar vocabulary: reference ETL ops re-expressed as
                   native expressions (refops), text analysis, vector math.
- ``operators``  – relational + LLM-pipeline operators: dedup family,
                   similarity search, as-of/range joins, multimodal plumbing.
- ``sources``    – schema-enforcing readers and partitioned parquet writers.
- ``plans``      – the declared query surface (SURVEY.md §2.9) as a registry
                   of (spark, sf_dir) -> DataFrame callables + DuckDB oracle SQL.
- ``streaming``  – Structured Streaming queries (tumbling/sliding/session
                   windows, watermark late-drop) with batch-equivalent oracles.
- ``pipeline``   – the reference star-schema ETL rebuilt Spark-first.
"""

__version__ = "0.1.0"
