"""Exact (engine-portable) aggregation over fixed-decimal doubles.

Problem: SUM/AVG over doubles is order-dependent (IEEE addition is not
associative), so Spark's parallel partial aggregation and DuckDB's
sequential sum can differ in the last bits -- enough to fail an exact
value-hash comparison between the engine and its oracle.

Solution: every numeric test column is fixed-decimal (2 dp, verified in
FIXTURES.md data), so we aggregate exactly in scaled integers
(`sum(cast(round(x*scale) as bigint))`) and convert to double ONCE at
the end. Integer sums are exact and the final int->double conversion +
division are deterministic IEEE ops, so Spark and the oracle agree
bit-for-bit regardless of partitioning.

Each helper has a Spark and a SQL form generated from the same formula
shape -- keep them in lockstep.

This is also a sane 100 TB pattern: long-sum aggregation is cheaper
than decimal128 and immune to float drift across retries/partitionings.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def exact_sum(col: str, scale: int = 100) -> Column:
    """SUM(x) where x has <= log10(scale) decimals; exact."""
    return F.sum(F.round(F.col(col) * scale).cast("long")) / float(scale)


def exact_sum_sql(col: str, scale: int = 100) -> str:
    return f"SUM(CAST(ROUND(({col}) * {scale}) AS BIGINT)) / {scale}.0"


def exact_avg(col: str, scale: int = 100) -> Column:
    """AVG(x), null-skipping, exact for fixed-decimal x."""
    return (
        F.sum(F.round(F.col(col) * scale).cast("long")) / float(scale)
    ) / F.count(F.col(col))


def exact_avg_sql(col: str, scale: int = 100) -> str:
    return (
        f"(SUM(CAST(ROUND(({col}) * {scale}) AS BIGINT)) / {scale}.0)"
        f" / COUNT({col})"
    )
