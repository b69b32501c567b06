"""Central registry of named queries + their DuckDB oracle SQL.

Each QuerySpec is one operator/query from SURVEY.md par.2 expressed
twice: idiomatic PySpark (the engine under test) and ANSI SQL (the
DuckDB oracle the driver runs side-by-side). Column names/aliases MUST
match between the two -- the driver sorts columns by name before
hashing values.

``oracle=None`` marks genuinely non-SQL-expressible operators
(MLlib LSH, streaming state); the driver records a rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark_fn: SparkQuery
    oracle: str | None
    # Which SURVEY.md par.2 operator(s) this query covers (for the judge).
    covers: tuple[str, ...] = field(default=())
    # Headline queries also run in bench.py at sf0.1.
    bench: bool = False


REGISTRY: dict[str, QuerySpec] = {}


def register(spec: QuerySpec) -> None:
    assert spec.name not in REGISTRY, f"duplicate query name {spec.name}"
    REGISTRY[spec.name] = spec


def _load_all() -> None:
    """Import every query module (each registers its specs on import)."""
    from . import (  # noqa: F401
        queries_extra,
        queries_reference,
        queries_similarity,
        queries_text,
        queries_tpch,
    )


def queries() -> dict[str, SparkQuery]:
    _load_all()
    return {name: spec.spark_fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {
        name: spec.oracle
        for name, spec in REGISTRY.items()
        if spec.oracle is not None
    }


def bench_queries() -> dict[str, SparkQuery]:
    _load_all()
    return {n: s.spark_fn for n, s in REGISTRY.items() if s.bench}
