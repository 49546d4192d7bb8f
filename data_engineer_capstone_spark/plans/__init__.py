"""Declared query surface (SURVEY.md §2.9) as a registry.

Importing this package imports every query module, which populates
``registry.QUERIES`` via the ``@query`` decorator.
"""

from . import (  # noqa: F401
    registry,
    relational,
    aggregation,
    windows,
    scalars,
    pipeline,
    streaming_queries,
    extensions,
    udf_surface,
    tpch_shapes,
    graph_behavior,
    scale_patterns,
    training_data,
)

from .registry import QUERIES, get_queries, get_oracles  # noqa: F401
