"""Query registry + pipeline composition."""

from .registry import REGISTRY, QuerySpec, queries, oracle_sql  # noqa: F401
