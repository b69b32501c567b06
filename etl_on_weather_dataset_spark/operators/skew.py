"""Skew mitigation: salting for hot keys (brief: "skewed keys hurt;
salting for skew").

AQE's skew-join splitting handles most cases at runtime; salting is
the explicit, plan-level tool for the two shapes AQE can't fix:

- a grouped aggregation where one key holds a large share of all rows
  (one reducer does all the work even after AQE splits partitions),
- a shuffle join where one key's rows exceed a single task's memory.

`salted_aggregate` runs algebraic aggregates in two phases: partial
aggregate on (keys, salt) -- spreading a hot key over `buckets`
reducers -- then final merge on keys. Correct for any algebraic
aggregate (sum/count/min/max and anything built from them).

`salted_broadcast_of_skewed_join` joins a big skewed side against a
small side by salting the big side and replicating the small side per
salt value -- an explicit replicated join for when the small side is
just over the broadcast threshold.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def with_salt(df: DataFrame, buckets: int, salt_on: str) -> DataFrame:
    """Deterministic salt derived from a high-cardinality column (NOT
    rand(): retries/speculative tasks must agree on the salt)."""
    return df.withColumn(
        SALT_COL, F.pmod(F.xxhash64(F.col(salt_on)), F.lit(buckets))
    )


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: dict[str, Column],
    final_aggs: dict[str, Column],
    salt_on: str,
    buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``salt_on`` must be a high-cardinality column (an id), NOT the
    group key: rows of one hot key need DIFFERENT salts to spread.

    partial_aggs: alias -> aggregate over raw rows (per keys+salt).
    final_aggs:   alias -> aggregate over the partial columns (per keys).

    Example (count + sum):
        salted_aggregate(df, ["k"],
            {"n": F.count(F.lit(1)), "s": F.sum("v")},
            {"n": F.sum("n"), "s": F.sum("s")},
            salt_on="id")
    """
    keys = list(keys)
    salted = with_salt(df, buckets, salt_on)
    partial = salted.groupBy(*keys, SALT_COL).agg(
        *[c.alias(a) for a, c in partial_aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[c.alias(a) for a, c in final_aggs.items()]
    )


def salted_join_small(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_on: str,
    buckets: int = 16,
) -> DataFrame:
    """Equi-join a skewed big side with a small side by salting: the
    big side gets a deterministic salt, the small side is exploded
    x`buckets` (one copy per salt value), and the join key becomes
    (on, salt) -- a hot key now spreads over `buckets` tasks.

    Cost: small side replicated `buckets` times through the shuffle --
    only worth it when one key dominates and the small side is too big
    to broadcast outright. ``salt_on`` must be a high-cardinality
    column of the big side (an id), not the join key.
    """
    big_s = with_salt(big, buckets, salt_on)
    small_s = small.withColumn(
        SALT_COL,
        F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)).cast("array<long>")),
    )
    return big_s.join(small_s, on=[on, SALT_COL]).drop(SALT_COL)


def ensure_parallel_scan(df: DataFrame, *hash_cols: str) -> DataFrame:
    """Hash-repartition ``df`` to the cluster's default parallelism
    when its backing FILE scan has fewer splits than cores -- the
    under-parallel-input guard in front of heavy per-row compute
    (shingling, n-gram explodes, codec decodes).

    A small parquet (one sub-128MB file) scans as a single split, and
    a corpus-grain explode downstream then runs on ONE task however
    many cores exist -- the round-11 flagship's dominant stage
    (SCALE.md: 9.2s -> 3.7s measured on the minhash shingle path).
    At 100 TB inputs carry >> cores splits and this is a no-op.

    The probe is ``inputFiles()`` -- a pure file-listing metadata
    read. NEVER ``df.rdd.getNumPartitions()``, which under AQE
    materializes upstream query stages at plan-construction time.
    Non-file inputs (views, memory relations) return [] and skip the
    repartition; a derived plan over few files may repartition
    redundantly, which costs one small exchange, never a job. Hash
    (not round-robin) partitioning, so no determinism sort is needed
    under task retry.
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:  # noqa: BLE001 -- probe is best-effort
        files = []
    if files and len(files) < par:
        return df.repartition(par, *[F.col(c) for c in hash_cols])
    return df
