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
