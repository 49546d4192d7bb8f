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


def dot_unrolled(a: Column, b: Column, dim: int) -> Column:
    """``dot()`` with the fold unrolled to an explicit element_at sum.

    zip_with/aggregate are CodegenFallback — every evaluation interprets
    the lambda per element and allocates the zipped intermediate array,
    which dominates pair-verify stages that evaluate millions of dots
    (round-7 q224 profile). The unrolled form is a plain codegen'd
    expression tree: no lambda, no allocation, whole-stage compiled.

    Bit-identical to ``dot()`` by construction: the same per-element
    ``cast("double")`` products, added strictly left-to-right — the
    fold's ``((0.0+p1)+p2)+…`` equals ``(p1+p2)+…`` exactly in IEEE
    doubles (0.0+x == x for every x, and for x == -0.0 the difference
    can only surface as the sign of an all-zero dot, which the floor
    rounding collapses anyway). Requires a statically-known ``dim`` —
    the embedding tables' contract."""
    import functools

    terms = [
        F.element_at(a, i).cast("double") * F.element_at(b, i).cast("double")
        for i in range(1, dim + 1)
    ]
    return functools.reduce(lambda x, y: x + y, terms)
