"""Cast-enforcing readers (SURVEY.md §2.1 S1-S5).

Reference behavior being generalized:

- S1-S3: ``spark.read.csv(path, header=True)`` with no schema — every
  column lands as a string (pyspark.py:177,195,265,277), silently
  defeating the declared schemas. Our ``csv_source`` takes the declared
  ``StructType`` and passes it to the reader, so type errors surface at
  scan time and the parquet-style pushdown/pruning machinery sees real
  types.
- S4: ``spark.read.json(multiLine=True)`` for pretty-printed JSON lookup
  dims (pyspark.py:217-219). JSON schemas are inferred by a separate scan
  job; at scale pass ``schema=`` to skip the inference pass entirely.
- S5: parquet, self-describing (pyspark.py:222).

Every reader returns a plain DataFrame — a lazy scan node; no action is
triggered here (except JSON inference when no schema is given), so
filters/projections applied downstream still push into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PERMISSIVE, DROPMALFORMED, FAILFAST = "PERMISSIVE", "DROPMALFORMED", "FAILFAST"


def conform(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Project+cast a DataFrame onto a declared schema (order, names, types).

    The type-enforcing replacement for the reference's
    ``make_empty_df(schema).union(df)`` conformance idiom
    (pyspark.py:159-167,182), which only aligns column order and lets
    Spark's set-op coercion silently widen declared ints to strings
    (SURVEY §1.2). A cast is a codegen-stage expression — no shuffle, no
    extra pass.
    """
    return df.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
    )


def csv_source(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
    mode: str = PERMISSIVE,
    **options: str,
) -> DataFrame:
    """CSV scan with optional declared schema (S1-S3 generalized).

    With ``schema=None`` this matches the reference's all-strings read
    (header names only). With a schema, parsing is typed at the scan and
    ``mode`` picks the malformed-row policy (PERMISSIVE null-fills,
    DROPMALFORMED filters, FAILFAST raises) — the reference's post-hoc
    row-alignment filter (pyspark.py:280-286) becomes a reader concern.
    """
    reader = spark.read.options(header=str(header).lower(), mode=mode, **options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.csv(path)


def json_source(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    multiline: bool = True,
    **options: str,
) -> DataFrame:
    """JSON scan (S4). ``multiline=True`` for pretty-printed arrays (the
    reference's lookup dims); pass ``schema`` to skip the inference job —
    at 100 TB an inference pass is a full extra read of the data."""
    reader = spark.read.options(multiLine=str(multiline).lower(), **options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def parquet_source(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """Parquet scan (S5); optional ``conform`` onto a declared schema.

    Parquet is self-describing, so the schema here is a *contract check*
    plus column pruning: the resulting scan reads only the declared
    columns (ReadSchema), and mismatched types fail at analysis instead of
    producing silently-coerced output.
    """
    df = spark.read.parquet(path)
    return conform(df, schema) if schema is not None else df


def orc_source(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """ORC scan. Like parquet, ORC is columnar and self-describing with
    stripe-level min/max statistics, so predicate pushdown and column
    pruning apply the same way; the optional schema is the same
    contract-check + pruning hook as ``parquet_source``."""
    df = spark.read.orc(path)
    return conform(df, schema) if schema is not None else df


def avro_source(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """Avro scan — row-oriented ingest format (Kafka archive dumps, etc.).

    Requires the external ``spark-avro`` connector
    (``org.apache.spark:spark-avro``), which is not bundled with the
    pip distribution of Spark; when absent we raise a clear error instead
    of Spark's generic "Failed to find data source". Avro is row-major, so
    column pruning does not reduce I/O the way it does for parquet/ORC —
    at scale, land Avro once and convert to parquet before analytics.
    """
    try:
        df = spark.read.format("avro").load(path)
    except Exception as exc:  # pragma: no cover - connector-dependent
        if "avro" in str(exc).lower() or "data source" in str(exc).lower():
            raise ModuleNotFoundError(
                "spark-avro connector not on the classpath; add "
                "org.apache.spark:spark-avro_2.13 via spark.jars.packages"
            ) from exc
        raise
    return conform(df, schema) if schema is not None else df


def fixed_width_source(
    spark: SparkSession,
    path: str,
    colspecs: list[tuple[str, int, int]],
    schema: T.StructType | None = None,
    trim: bool = True,
) -> DataFrame:
    """Fixed-width text scan (mainframe/legacy extract layout — the
    format family next to the reference's SAS fixed-layout data,
    `/root/reference/scripts/parse_immigration_sas.py`).

    ``colspecs`` is ``[(name, start, length), ...]`` with 1-based
    ``start`` (the layout-sheet convention). Each record is one text
    line; columns are carved with ``substring`` — pure Catalyst
    expressions, so the whole parse stays in whole-stage codegen (no
    Python in the row path) and splits parallelize like any text scan
    at 100 TB. ``trim`` strips the space padding; a declared ``schema``
    is applied with ``try_cast`` so malformed numerics become NULL (the
    PERMISSIVE analog — ANSI mode would otherwise fail the whole scan
    on one bad record)."""
    lines = spark.read.text(path)
    cols = []
    for name, start, length in colspecs:
        c = F.substring(F.col("value"), start, length)
        if trim:
            c = F.trim(c)
        cols.append(c.alias(name))
    df = lines.select(*cols)
    if schema is not None:
        df = df.select(
            *[
                F.col(f.name).try_cast(f.dataType).alias(f.name)
                for f in schema.fields
            ]
        )
    return df
