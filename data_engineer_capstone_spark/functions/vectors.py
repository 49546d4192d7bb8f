"""Vector math over ``array<float>`` embedding columns as native Catalyst
expressions (zip_with + aggregate) — JVM-side, no Python boundary.

Used by the similarity-search operators. At 100 TB the dot products run
inside codegen per row-pair; the expensive part is pair generation, which
the operators control (brute-force for small query sets, LSH buckets for
the scale path).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
