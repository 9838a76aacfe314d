"""Query registry — the driver-facing catalog of every implemented operator.

Each entry pairs a PySpark implementation ``fn(spark, sf_dir) ->
DataFrame`` with an equivalent ANSI-SQL oracle string that DuckDB runs on
the same parquet tables (driver contract, /root/repo/__spark_entry__.py).
Column names/aliases MUST match between the two sides — the driver's
compare sorts columns by name before hashing values.

Oracle-less entries (``oracle=None``) would get a weaker rows-only
driver check; since round 3 every registered query carries an oracle —
hash/float scale paths emit deterministic verification surfaces
(exact counts + pinned invariants) alongside their scale computation.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, "QuerySpec"] = {}


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``name`` with its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=(fn.__doc__ or "").strip())
        return fn

    return deco
