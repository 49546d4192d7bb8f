"""UDF / UDAF / UDTF registration surface (SURVEY.md §2.7).

The reference's two row-at-a-time Python UDFs (pyspark.py:325-347,376-385)
were replaced with native expressions (functions/refops.py) — UDFs are the
slow path and never the default. This module is the *capability*: when a
user genuinely needs Python, registration goes through here and lands on
the Arrow-vectorized variants, never row-at-a-time pickling:

- scalar      → ``pandas_udf`` (Arrow batch in, batch out; stays usable
                from both the DataFrame API and SQL via ``spark.udf``)
- aggregate   → grouped-agg ``pandas_udf`` (the UDAF surface; whole-group
                Series in, scalar out)
- table       → Python UDTF class (``spark.udtf.register``; usable in SQL
                ``FROM``/``LATERAL`` position)

Scale notes: a scalar pandas UDF breaks whole-stage codegen at its
boundary but transfers Arrow record batches, ~10-100× cheaper than
pickled rows. A grouped-agg pandas UDF materializes ONE GROUP per call on
one executor — fine for bounded groups (per-key stats), wrong for
pathological single-key skew; prefer native partial aggregates when the
math allows. UDTFs evaluate per-row on executors with Arrow transfer.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Iterator

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf, udtf


def register_scalar(
    spark: SparkSession, name: str, fn: Callable, return_type: str
) -> None:
    """Register a vectorized (Arrow) scalar function for DataFrame + SQL use.

    ``fn`` takes/returns ``pandas.Series`` (one Arrow batch at a time).
    """
    spark.udf.register(name, pandas_udf(fn, return_type))


def register_grouped_agg(
    spark: SparkSession, name: str, fn: Callable, return_type: str
) -> None:
    """Register a UDAF as a grouped-agg pandas UDF: ``fn`` receives each
    group's full column(s) as Series and returns one scalar. The UDF type
    is inferred from ``fn``'s annotations (Series... -> scalar ⇒ grouped
    agg), so ``fn`` must be type-hinted."""
    spark.udf.register(name, pandas_udf(fn, return_type))


def register_table_function(
    spark: SparkSession, name: str, cls: type, return_type: str
) -> None:
    """Register a Python UDTF (SQL FROM / LATERAL position); ``return_type``
    is the emitted row schema, e.g. ``"pos int, gram string"``."""
    spark.udtf.register(name, udtf(cls, returnType=return_type))


# --------------------------------------------------------------- exemplars --
_TOKEN = re.compile(r"[a-z0-9]+")


def token_count(text: pd.Series) -> pd.Series:
    """Vectorized token counter (mirrors functions/text.py `words`)."""
    return text.fillna("").str.lower().str.findall(_TOKEN).str.len().astype("int32")


def weighted_mean(v: pd.Series, w: pd.Series) -> float:
    """UDAF exemplar: weighted mean. Sums are exact int64 when the inputs
    are integral, so the result is partition-order independent."""
    num = int((v.astype("int64") * w.astype("int64")).sum())
    den = int(w.astype("int64").sum())
    return num / den if den else float("nan")


class Bigrams:
    """UDTF exemplar: word bigrams with positions.

    eval() yields (pos, gram) per input row — the SQL-visible lateral
    expansion Spark's builtin posexplode can't produce without first
    materializing the array column.
    """

    def eval(self, text: str | None) -> Iterator[tuple[int, str]]:
        ws = _TOKEN.findall((text or "").lower())
        for i in range(len(ws) - 1):
            yield i, ws[i] + " " + ws[i + 1]


def register_exemplars(spark: SparkSession) -> None:
    register_scalar(spark, "tok_count", token_count, "int")
    register_grouped_agg(spark, "weighted_mean", weighted_mean, "double")
    register_table_function(spark, "bigrams", Bigrams, "pos int, gram string")
