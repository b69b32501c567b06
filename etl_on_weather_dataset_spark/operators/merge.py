"""Upsert / MERGE and SCD2 history patterns (no Delta required).

Spark without a transactional table format has no MERGE INTO; the
standard emulation (and the v1 path recommended by every lakehouse
migration guide) is:

- upsert:  updated-or-new rows UNION rows of the target whose key has
           no update (anti-join).
- SCD2:    keep every version with [valid_from, valid_to) ranges
           derived from a lead() window over version timestamps.

Both are pure shuffles on the merge key. At 100 TB the target side
reads partition-pruned (merge keys usually cluster in recent
partitions) and the rewrite is per-partition -- the same shape Delta
executes under the hood.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame, updates: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """updates win on key collision; unmatched target rows survive;
    brand-new update keys are inserted. Schemas must match."""
    keys = list(keys)
    untouched = target.join(
        updates.select(*keys).dropDuplicates(), on=keys, how="left_anti"
    )
    return untouched.unionByName(updates)


def scd2_history(
    versions: DataFrame,
    keys: Sequence[str],
    version_ts: str,
    far_future: str = "2200-01-01 00:00:00",
) -> DataFrame:
    """Slowly-changing-dimension type 2: every version row gets
    [valid_from, valid_to) and an is_current flag. valid_to of the
    latest version is the far-future sentinel, chosen within the ns-timestamp range so Arrow
    and pandas conversions never overflow (half-open ranges make
    point-in-time lookups a simple BETWEEN)."""
    keys = list(keys)
    w = Window.partitionBy(*keys).orderBy(F.col(version_ts).asc())
    nxt = F.lead(version_ts).over(w)
    return (
        versions.withColumn("valid_from", F.col(version_ts))
        .withColumn(
            "valid_to",
            F.coalesce(nxt, F.lit(far_future).cast("timestamp")),
        )
        .withColumn("is_current", nxt.isNull())
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Change-data-capture between two snapshots of the same table:
    one row per changed key with ``change_type`` in
    ('insert', 'delete', 'update'), carrying both images
    (``old_*`` / ``new_*`` for the compared columns).

    The lakehouse "table_changes()" primitive computed from plain
    snapshots: a single full-outer equi-join on the key, null-safe
    column comparison (``<=>``) so NULL -> value and value -> NULL
    count as updates rather than vanishing. One shuffle on the key;
    at 100 TB both sides bucket by key and the join co-locates.
    Unchanged rows are filtered BEFORE any wide projection ships, so
    the output is |changes|-sized, not |table|-sized.

    ``keys`` must be non-null (primary-key semantics) -- the SQL twin
    detects absence by key-nullness.
    """
    keys = list(keys)
    cols = list(compare_cols) if compare_cols is not None else [
        c for c in new.columns if c not in keys
    ]
    o = old.select(
        *keys, *[F.col(c).alias(f"old_{c}") for c in cols],
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *keys, *[F.col(c).alias(f"new_{c}") for c in cols],
        F.lit(True).alias("__in_new"),
    )
    joined = o.join(n, keys, "full_outer")
    same = None
    for c in cols:
        eq = F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
        same = eq if same is None else (same & eq)
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("insert"))
        .when(F.col("__in_new").isNull(), F.lit("delete"))
        .otherwise(F.lit("update"))
    )
    out = joined.withColumn("change_type", change)
    if same is not None:
        out = out.filter(
            (F.col("change_type") != "update") | ~same
        )
    return out.select(
        *keys, "change_type",
        *[f"old_{c}" for c in cols], *[f"new_{c}" for c in cols],
    )


def snapshot_diff_sql(
    old_sql: str,
    new_sql: str,
    keys: Sequence[str],
    compare_cols: Sequence[str],
) -> str:
    """DuckDB twin of :func:`snapshot_diff` (same null-safe compare
    via IS NOT DISTINCT FROM)."""
    keys = list(keys)
    cols = list(compare_cols)
    key_sel = ", ".join(
        f"COALESCE(o.{k}, n.{k}) AS {k}" for k in keys
    )
    old_sel = ", ".join(f"o.{c} AS old_{c}" for c in cols)
    new_sel = ", ".join(f"n.{c} AS new_{c}" for c in cols)
    on = " AND ".join(f"o.{k} = n.{k}" for k in keys)
    any_k = keys[0]
    same = " AND ".join(
        f"(o.{c} IS NOT DISTINCT FROM n.{c})" for c in cols
    )
    return f"""
        SELECT {key_sel},
               CASE WHEN o.{any_k} IS NULL THEN 'insert'
                    WHEN n.{any_k} IS NULL THEN 'delete'
                    ELSE 'update' END AS change_type,
               {old_sel}, {new_sel}
        FROM ({old_sql}) o FULL OUTER JOIN ({new_sql}) n ON {on}
        WHERE o.{any_k} IS NULL OR n.{any_k} IS NULL
           OR NOT ({same})
    """
