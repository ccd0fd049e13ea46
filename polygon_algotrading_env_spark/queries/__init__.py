"""Query registry — the engine's declared operator-coverage corpus.

Every operator row in SURVEY.md §2 is realized as a named query over the
driver fixture tables, with (where SQL-expressible) an equivalent ANSI-SQL
oracle string that DuckDB runs on the same parquet files. The verification
driver hash-compares the two result sets (row count + schema + order-
insensitive value hash), so:

- every computed column is aliased identically in the Spark code and SQL;
- double-typed aggregates are rounded identically on both sides (partial
  aggregation order differs between engines at the last ulp);
- results involving ``events.ts`` (nanosecond parquet) expose epoch-millis
  bigints or bucket boundaries rather than raw nanosecond timestamps, since
  Spark truncates to microseconds while DuckDB keeps nanos.

Registration is decorator-based; submodules group the corpus by SURVEY §2
section.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB-runnable SQL; None → rows-only check
    headline: bool  # included in bench.py's timed suite


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, headline: bool = False):
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, headline=headline)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle}


def headline_queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in REGISTRY.items() if spec.headline}


# Populate the registry (import order defines display order).
from polygon_algotrading_env_spark.queries import (  # noqa: E402,F401
    relational,
    aggregates,
    joins,
    windows,
    timeseries,
    text,
    vectors,
    extended,
    sessions,
    reshape,
)
