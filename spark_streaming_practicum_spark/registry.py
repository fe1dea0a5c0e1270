"""Query registry — the single source of truth behind ``__spark_entry__.py``.

Each operator family module registers its queries at import time with the
``@query`` decorator, pairing the Spark implementation with the DuckDB
oracle SQL (or ``oracle=None`` for non-SQL-expressible ops, which the
driver checks rows-only).

Contract notes (driver compares by sorted column NAME + value hash):
- every computed/aggregate column is aliased identically in Spark and SQL;
- float aggregates are rounded in BOTH systems so summation order can't
  flip the hash;
- LIMIT queries carry a total ORDER BY (ties broken by a key column).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None → rows-only check
    doc: str = ""


_REGISTRY: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a (spark_fn, oracle_sql) pair under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QueryDef(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def all_queries() -> dict[str, QueryDef]:
    """Import every operator module (side effect: registration) and return the registry."""
    # Imports are local to avoid cycles and keep module import cheap.
    from .operators import (  # noqa: F401
        advanced,
        aggregations,
        analytics,
        balancing,
        curation,
        dedup,
        evalmetrics,
        features,
        governance,
        graph,
        ingestion,
        joins,
        ml,
        modern_sql,
        multimodal,
        recsys,
        retrieval,
        scalar_extra,
        scalar_fns,
        setops,
        similarity,
        sort_topk,
        spatial,
        stateful_stream,
        streaming_equiv,
        text,
        timeseries,
        topics,
        tokenizer,
        tpch_extra,
        training,
        udfs,
        web_curation,
        windows,
    )

    return dict(_REGISTRY)
