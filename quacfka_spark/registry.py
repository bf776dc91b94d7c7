"""Declared-query registry.

Every operator from SURVEY.md §2 that the driver verifies is registered
here as a (spark_fn, oracle_sql) pair:

- ``spark_fn(spark, sf_dir) -> DataFrame`` — the PySpark implementation.
- ``oracle_sql`` — equivalent SQL DuckDB runs on the same parquet views;
  ``None`` for non-SQL-expressible ops (driver then records a weaker
  rows-only check).

Column names are aliased identically on both sides (the driver sorts
columns by name before hashing values).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: Callable
    oracle: str | None
    doc: str = ""


QUERIES: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator registering a declared query."""

    def deco(fn: Callable) -> Callable:
        QUERIES[name] = QueryDef(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from quacfka_spark.operators import (  # noqa: F401
        chains,
        dedup,
        extensions,
        multimodal,
        relational,
        relational_ext,
        similarity,
        streaming_batch,
        text,
    )


def get_queries() -> dict[str, Callable]:
    _load_all()
    return {name: q.fn for name, q in QUERIES.items()}


def get_oracles() -> dict[str, str]:
    _load_all()
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
