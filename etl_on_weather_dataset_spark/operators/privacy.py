"""Privacy / re-identification audits for training-data governance.

Reference parity: the reference ETL (`/root/reference/ETL.py:29-288`)
ships rows to an RDBMS with no release gate; a pipeline exporting
100 TB of user-derived data needs the standard disclosure checks
before any export. Two classic measures, both pure relational
aggregation (Sweeney's k-anonymity; Machanavajjhala's l-diversity):

- **k-anonymity**: every combination of quasi-identifier values
  (nation, segment, coarse balance band, ...) must be shared by at
  least k rows, or the rows are re-identifiable by linking those
  columns to an external dataset.
- **l-diversity**: within each quasi-identifier class, the SENSITIVE
  column must take at least l distinct values, or membership in the
  class leaks the sensitive value even when k holds.

Shapes at 100 TB: one hash aggregation on the quasi-identifier tuple
(map-side partial combine, |classes| intermediate rows -- bounded by
the quasi key-space, not the row count) followed by a constant-width
global fold. Suppression is the same aggregate joined back as a
filter; the class-size relation is small enough to broadcast whenever
the quasi key-space is (its size is the PRODUCT of per-column
cardinalities, known ahead of time).

No UDFs anywhere -- every expression is codegen'd, and the DuckDB
oracle twin is the same two-level GROUP BY, so the audit is
driver-attestable bit-for-bit (integer outputs only; ratios as ppm
via integer division per the repo's exactness discipline).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def class_sizes(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str | None = None,
) -> DataFrame:
    """Per-quasi-identifier-class size (and sensitive diversity).

    One hash aggregate: ``quasi_cols* , class_n [, l_distinct]``.
    NULL quasi values form their own class (SQL GROUP BY semantics,
    identical in the oracle).
    """
    aggs = [F.count(F.lit(1)).alias("class_n")]
    if sensitive_col is not None:
        aggs.append(
            F.countDistinct(F.col(sensitive_col)).alias("l_distinct")
        )
    return df.groupBy(*quasi_cols).agg(*aggs)


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: list[str],
    k: int,
    sensitive_col: str | None = None,
    l: int = 2,
) -> DataFrame:
    """One-row disclosure audit over the quasi-identifier columns.

    Columns (all integers; shares as ppm by integer division):
      n_rows, n_classes, min_class_size (the dataset's actual
      k-anonymity), classes_below_k, rows_below_k, rows_below_k_ppm,
      and with ``sensitive_col``: min_l_diversity, classes_below_l.

    ``rows_below_k`` is exactly the row count suppression would
    delete -- the audit and the repair quote the same number.
    """
    sizes = class_sizes(df, quasi_cols, sensitive_col)
    below = F.col("class_n") < k
    aggs = [
        F.sum("class_n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.min("class_n").cast("long").alias("min_class_size"),
        F.sum(below.cast("long")).cast("long").alias("classes_below_k"),
        F.sum(F.when(below, F.col("class_n")).otherwise(F.lit(0)))
        .cast("long").alias("rows_below_k"),
    ]
    if sensitive_col is not None:
        aggs += [
            F.min("l_distinct").cast("long").alias("min_l_diversity"),
            F.sum((F.col("l_distinct") < l).cast("long")).cast("long")
            .alias("classes_below_l"),
        ]
    out = sizes.agg(*aggs)
    return out.withColumn(
        "rows_below_k_ppm",
        F.expr("rows_below_k * 1000000 div n_rows"),
    )


def suppress_below_k(
    df: DataFrame, quasi_cols: list[str], k: int
) -> DataFrame:
    """Drop every row whose quasi-identifier class has < k members --
    the minimal-suppression release of ``df`` at anonymity level k.

    Class sizes are |key-space|-bounded, so the filter join is a
    broadcast whenever the quasi key-space is small (the usual case:
    generalized columns have deliberately few values); Spark's
    autoBroadcastJoinThreshold decides from actual size at runtime.
    Null-safe on the class key: NULL quasi values grouped above must
    match back here, so the join uses <=> semantics via a null-safe
    condition.
    """
    keep = (
        class_sizes(df, quasi_cols)
        .filter(F.col("class_n") >= k)
        .select(*[F.col(c).alias(f"__k_{c}") for c in quasi_cols])
    )
    cond: Column | None = None
    for c in quasi_cols:
        term = F.col(c).eqNullSafe(F.col(f"__k_{c}"))
        cond = term if cond is None else cond & term
    return df.join(keep, cond, "left_semi")


def k_anonymity_report_sql(
    table_sql: str,
    quasi_cols: list[str],
    k: int,
    sensitive_col: str | None = None,
    l: int = 2,
) -> str:
    """DuckDB twin of :func:`k_anonymity_report` (same two-level
    aggregate; every output CAST to BIGINT -- HUGEINT discipline)."""
    q = ", ".join(quasi_cols)
    l_sel = ""
    if sensitive_col is not None:
        l_sel = f""",
               CAST(MIN(l_distinct) AS BIGINT) AS min_l_diversity,
               CAST(SUM(CASE WHEN l_distinct < {l} THEN 1 ELSE 0 END)
                    AS BIGINT) AS classes_below_l"""
    l_inner = (
        f", COUNT(DISTINCT {sensitive_col}) AS l_distinct"
        if sensitive_col is not None else ""
    )
    return f"""
        WITH sizes AS (
            SELECT {q}, COUNT(*) AS class_n{l_inner}
            FROM ({table_sql}) GROUP BY {q}
        ),
        audit AS (
            SELECT CAST(SUM(class_n) AS BIGINT) AS n_rows,
                   CAST(COUNT(*) AS BIGINT) AS n_classes,
                   CAST(MIN(class_n) AS BIGINT) AS min_class_size,
                   CAST(SUM(CASE WHEN class_n < {k} THEN 1 ELSE 0 END)
                        AS BIGINT) AS classes_below_k,
                   CAST(SUM(CASE WHEN class_n < {k} THEN class_n
                            ELSE 0 END) AS BIGINT) AS rows_below_k{l_sel}
            FROM sizes
        )
        SELECT *, rows_below_k * 1000000 // n_rows AS rows_below_k_ppm
        FROM audit
    """
