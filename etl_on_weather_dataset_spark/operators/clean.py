"""Cleaning operators: timestamp coercion (P1), dedup (D1/D2), median
imputation (I1).

Reference parity notes (SURVEY.md par.2a):
- P1 `pd.to_datetime(..., errors='coerce', utc=True)` (ETL.py:57) ->
  `try_to_timestamp` (null on unparseable) under a UTC session tz.
- D1 `df.drop_duplicates()` (ETL.py:58) -> `dropDuplicates()`.
- I1 `fillna(median)` over critical columns (ETL.py:61-62; literally a
  no-op in the reference -- we implement the intent). Exact
  interpolated median (`percentile(c, 0.5)`) to match pandas/DuckDB;
  `approx=True` switches to `percentile_approx` for the 100 TB path
  where a full sort-based exact percentile is not worth it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def coerce_timestamp(
    df: DataFrame,
    col: str,
    fmt: str | None = None,
    output_col: str | None = None,
) -> DataFrame:
    """Parse a string column to timestamp; unparseable -> null (P1).

    With ``fmt=None`` Spark applies cast semantics (ISO-ish formats),
    matching pandas' default-dateutil parse closely enough for the
    engine's sources; pass an explicit pattern for fixed-format feeds
    (the real weather CSV uses "yyyy-MM-dd HH:mm:ss.SSS xx").
    """
    out = output_col or col
    expr = (
        F.try_to_timestamp(F.col(col), F.lit(fmt))
        if fmt is not None
        else F.try_to_timestamp(F.col(col))
    )
    return df.withColumn(out, expr)


def dedup_exact(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """Full-row (D1) or subset (D2) distinct.

    Scale note: this is a hash-aggregate shuffle on all (or subset)
    columns. Map-side partial aggregation already collapses local
    duplicates before the shuffle, so the network cost is proportional
    to the *distinct* row count per partition, not the input.
    """
    return df.dropDuplicates(list(subset)) if subset else df.dropDuplicates()


def median_expr(col: str, approx: bool = False) -> Column:
    """Interpolated median (pandas semantics: median([1,2,3,4]) = 2.5)."""
    if approx:
        return F.percentile_approx(F.col(col), F.lit(0.5))
    return F.percentile(F.col(col), F.lit(0.5))


def impute_median(
    df: DataFrame, cols: Sequence[str], approx: bool = False
) -> DataFrame:
    """Fill nulls in ``cols`` with each column's median (I1).

    One LAZY plan, no driver-side collect: all medians come from a
    single 1-row aggregate that is cross-joined back (Catalyst plans a
    broadcast nested loop of the single row -- the scalar-subquery
    shape), and the fill is a codegen'd coalesce. Keeping it lazy means
    no extra synchronous job and the optimizer sees the whole pipeline.
    At 100 TB prefer ``approx=True``: percentile_approx is a
    single-pass mergeable sketch, exact percentile sorts.
    """
    if not cols:
        return df
    meds = df.agg(
        *[median_expr(c, approx).alias(f"__med_{i}")
          for i, c in enumerate(cols)]
    )
    filled = df.crossJoin(F.broadcast(meds))
    for i, c in enumerate(cols):
        filled = filled.withColumn(
            c, F.coalesce(F.col(c), F.col(f"__med_{i}"))
        )
    return filled.drop(*[f"__med_{i}" for i in range(len(cols))])


def winsorize(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    lo_q: float = 0.01,
    hi_q: float = 0.99,
    approx: bool = False,
) -> DataFrame:
    """Clip ``value_col`` into its per-group [lo_q, hi_q] percentile
    band (winsorization) -- the standard heavy-tail guard before
    means/scalers, so one fat-fingered 1e9 reading cannot drag a
    group's statistics.

    Adds ``{value}_w`` (clipped), ``{value}_lo`` / ``{value}_hi``
    (the exact interpolated per-group bounds -- same
    percentile/quantile_cont parity class as median_impute and
    mad_outliers), and ``{value}_clip`` (-1 clipped low, +1 clipped
    high, 0 untouched). One groupBy for the bounds, broadcast back,
    one projection; nulls pass through unclipped (null stays null,
    clip flag 0).

    ``approx=True`` switches the bounds to percentile_approx -- the
    single-pass mergeable sketch for the 100 TB path where the exact
    per-group sort is not worth it (same dial as impute_median).
    """
    keys = list(group_cols)
    pf = F.percentile_approx if approx else F.percentile
    bounds = df.groupBy(*keys).agg(
        pf(F.col(value_col), F.lit(lo_q)).alias(f"{value_col}_lo"),
        pf(F.col(value_col), F.lit(hi_q)).alias(f"{value_col}_hi"),
    )
    v, lo, hi = (
        F.col(value_col),
        F.col(f"{value_col}_lo"),
        F.col(f"{value_col}_hi"),
    )
    return (
        df.join(F.broadcast(bounds), keys)
        .withColumn(
            f"{value_col}_w",
            # explicit null guard: Spark's least/greatest SKIP nulls
            # (a null value would silently clip to the lower bound)
            F.when(v.isNull(), F.lit(None).cast("double"))
            .otherwise(F.least(F.greatest(v, lo), hi)),
        )
        .withColumn(
            f"{value_col}_clip",
            F.when(v < lo, F.lit(-1))
            .when(v > hi, F.lit(1))
            .otherwise(F.lit(0)),
        )
    )
