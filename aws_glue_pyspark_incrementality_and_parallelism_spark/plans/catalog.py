"""Assemble the full query catalog.

Importing this module imports every operator module, which registers its
queries into ``REGISTRY`` via the ``@query`` decorator.
"""

from __future__ import annotations

# Import order matters: the driver's correctness pass walks the registry in
# registration order and stops after ~50 queries (round 1 recorded exactly 50),
# so modules whose queries still lack a driver verdict go FIRST and modules
# already driver-verified go LAST. Round 2 front-loads the reference core —
# reports/joins/TPC-H/windows fill the first 51 slots. Future rounds should
# rotate the front of this list (setops/functions/analytics/sessions/quality/
# udf next) until every query has a recorded driver verdict.
from ..operators import (  # noqa: F401
    queries_reports,
    queries_joins,
    queries_tpch,
    queries_tpch2,
    queries_windows,
    queries_setops,
    queries_functions,
    queries_analytics,
    queries_sessions,
    queries_quality,
    queries_udf,
    similarity,
    skew,
    text,
    graph,
    queries_aggregates,
    dedup,
    layout,
    multimodal,
    queries_scrub,
)

from .registry import REGISTRY, QuerySpec  # noqa: F401


def all_queries():
    return {name: spec.fn for name, spec in REGISTRY.items()}


def all_oracles():
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
