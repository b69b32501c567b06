"""Derivation operators: date parts (P2/P3) and Beaufort-scale
bucketing (U1).

U1 is the reference's only Python UDF (`wind_strength`, ETL.py:80-104,
applied row-at-a-time at ETL.py:107). Here it is a chained CASE WHEN --
pure Catalyst expressions inside whole-stage codegen, no Python
round-trip, vectorized over columnar batches. Thresholds are the
Beaufort bounds from ETL.py:81-102.

Null semantics decision (SURVEY.md par.2a U1): null input -> null
output. The reference's literal code would fall through every
comparison and return 'Violent Storm' for NaN -- an artifact of broken
code, documented as a deliberate deviation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (upper_bound_inclusive, label) -- ETL.py:81-102.
BEAUFORT_BOUNDS: list[tuple[float, str]] = [
    (1.5, "Calm"),
    (3.3, "Light Air"),
    (5.4, "Light Breeze"),
    (7.9, "Gentle Breeze"),
    (10.7, "Moderate Breeze"),
    (13.8, "Fresh Breeze"),
    (17.1, "Strong Breeze"),
    (20.7, "Near Gale"),
    (24.4, "Gale"),
    (28.4, "Strong Gale"),
    (32.6, "Storm"),
]
BEAUFORT_TOP = "Violent Storm"


def beaufort(col: Column | str) -> Column:
    """Wind-speed -> 12 ordinal categories as a codegen'd CASE chain."""
    c = F.col(col) if isinstance(col, str) else col
    expr = None
    for bound, label in BEAUFORT_BOUNDS:
        clause = (c <= bound, F.lit(label))
        expr = F.when(*clause) if expr is None else expr.when(*clause)
    # `when` chains yield null when the input is null (no branch matches
    # and `otherwise` is guarded), which is the documented null->null
    # semantics; non-null inputs above the last bound get the top label.
    return expr.otherwise(F.when(c.isNotNull(), F.lit(BEAUFORT_TOP)))


def beaufort_sql(col_sql: str) -> str:
    """The same bucketing as ANSI SQL (for oracle parity checks)."""
    whens = "\n".join(
        f"WHEN {col_sql} <= {bound} THEN '{label}'"
        for bound, label in BEAUFORT_BOUNDS
    )
    return (
        f"CASE WHEN {col_sql} IS NULL THEN NULL\n{whens}\n"
        f"ELSE '{BEAUFORT_TOP}' END"
    )


def with_wind_strength(
    df: DataFrame, speed_col: str, output_col: str = "wind_strength"
) -> DataFrame:
    return df.withColumn(output_col, beaufort(speed_col))


def with_date_parts(
    df: DataFrame,
    ts_col: str,
    date_col: str = "date",
    month_col: str = "month",
) -> DataFrame:
    """Derive date (P2, ETL.py:65) and month 1-12 (P3, ETL.py:66)."""
    return df.withColumn(date_col, F.to_date(F.col(ts_col))).withColumn(
        month_col, F.month(F.col(ts_col))
    )
