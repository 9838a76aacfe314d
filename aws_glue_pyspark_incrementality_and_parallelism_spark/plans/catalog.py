"""Assemble the full query catalog.

Importing this module imports every operator module, which registers its
queries into ``REGISTRY`` via the ``@query`` decorator.
"""

from __future__ import annotations

from ..operators import (  # noqa: F401
    dedup,
    graph,
    layout,
    multimodal,
    queries_aggregates,
    queries_analytics,
    queries_functions,
    queries_joins,
    queries_quality,
    queries_reports,
    queries_sessions,
    queries_setops,
    queries_tpch,
    queries_tpch2,
    queries_udf,
    queries_windows,
    similarity,
    skew,
    text,
)

from .registry import REGISTRY, QuerySpec  # noqa: F401


def all_queries():
    return {name: spec.fn for name, spec in REGISTRY.items()}


def all_oracles():
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
