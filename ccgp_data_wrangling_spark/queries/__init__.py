"""Query registry.

Every implemented operator from SURVEY.md §2 (and the beyond-reference
LLM-pipeline operators) is demonstrated by at least one named query
over the benchmark tables. Each entry pairs:

* a Spark callable ``(spark, sf_dir) -> DataFrame``
* an equivalent DuckDB oracle SQL string (or ``None`` for ops that
  are genuinely not SQL-expressible — those get a rows-only check).

Column names are aliased identically on both sides; float outputs are
rounded identically on both sides so order-insensitive value hashing
is stable across engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# name -> (spark_fn, oracle_sql | None)
_REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def register(name: str, oracle: str | None):
    """Decorator: add a query + its DuckDB oracle to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = (fn, oracle)
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return {k: v[0] for k, v in _REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {k: v[1] for k, v in _REGISTRY.items() if v[1] is not None}


_LOADED = False


def _load_all() -> None:
    """Import all query modules (registration side effect)."""
    global _LOADED
    if _LOADED:
        return
    from ccgp_data_wrangling_spark.queries import (  # noqa: F401
        connector_queries,
        corpus_quality,
        curation_e2e,
        domain,
        events,
        llm_ops,
        llm_scale,
        merge_queries,
        pipeline_ops,
        relational,
    )

    _LOADED = True
