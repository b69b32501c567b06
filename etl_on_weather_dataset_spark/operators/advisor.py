"""Join-strategy advisor: size a join WITHOUT running it.

At 100 TB the expensive mistake is discovering mid-job that a join
should have been broadcast, salted, or feared (fan-out explosion).
This operator produces the optimizer-style pre-flight report from
O(sketch)-cost inputs:

- exact side cardinalities (one map-side-combined count each),
- the CMS inner-product join-size estimate (operators/bloom.py
  ``cms_join_size_estimate`` -- one-sided: est >= true),
- per-side heavy-hitter shares (the skew_diagnostics_events shape),
- a recommendation from an identical integer CASE chain in both
  engines:

    min side small enough      -> 'broadcast'
    top key owns too much      -> 'salted_shuffle'
    otherwise                  -> 'shuffle_hash'

  plus ``fanout_ppm`` = est_join_size * 1e6 div max(side) -- a value
  far above 1e6 means the join multiplies rows and downstream
  operators should expect the blow-up.

Everything but the strategy string is integer (micro/ppm surfaces),
so the DuckDB twin reproduces the report bit-for-bit and the driver
hash pins the advisor itself, not just a smoke run. Thresholds are
explicit parameters: they encode cluster capacity (broadcast memory,
tolerable reducer imbalance), not data facts.

Overflow note: ppm products cap the supported est_join_size at
~9.2e12 rows (BIGINT / 1e6); beyond that, widen to DECIMAL(38,0)
the way cms_join_size_estimate already does internally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bloom import build_count_min, cms_join_size_estimate


def _strategy_case(broadcast_rows: int, skew_ppm: int) -> str:
    """The decision chain, shared verbatim with the oracle twin."""
    return (
        f"CASE WHEN LEAST(n_left, n_right) <= {broadcast_rows} "
        "THEN 'broadcast' "
        f"WHEN GREATEST(left_top_share_ppm, right_top_share_ppm) "
        f">= {skew_ppm} THEN 'salted_shuffle' "
        "ELSE 'shuffle_hash' END"
    )


def _side_stats(df: DataFrame, key: str, prefix: str) -> DataFrame:
    """(n_<p>... one row): rows, distinct keys, top-key share ppm --
    one map-side-combined aggregate pass over (key, cnt)."""
    per_key = (
        df.filter(F.col(key).isNotNull())
        .groupBy(F.col(key).alias("k"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return per_key.agg(
        F.sum("cnt").alias(f"n_{prefix}"),
        F.count(F.lit(1)).alias(f"{prefix}_keys"),
        F.max("cnt").alias(f"{prefix}_max_key_rows"),
    ).withColumn(
        f"{prefix}_top_share_ppm",
        F.expr(f"{prefix}_max_key_rows * 1000000 div n_{prefix}"),
    )


def join_advice(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    width: int = 4096,
    depth: int = 4,
    broadcast_rows: int = 100_000,
    skew_ppm: int = 200_000,
) -> DataFrame:
    """One-row pre-flight report for ``left JOIN right ON key``:
    (n_left, n_right, left_keys, right_keys, left_max_key_rows,
    right_max_key_rows, left_top_share_ppm, right_top_share_ppm,
    est_join_size, fanout_ppm, strategy). Cost: two per-key
    aggregates + two sketch builds + one sketch-sized join -- never
    the data join itself."""
    ls = _side_stats(left, left_key, "left")
    rs = _side_stats(right, right_key, "right")
    cms_l = build_count_min(
        left.select(F.col(left_key).alias("k")), "k", width, depth
    )
    cms_r = build_count_min(
        right.select(F.col(right_key).alias("k")), "k", width, depth
    )
    est = cms_join_size_estimate(cms_l, cms_r, depth=depth)
    return (
        ls.crossJoin(F.broadcast(rs))
        .crossJoin(F.broadcast(est))
        .withColumn(
            "fanout_ppm",
            F.expr("est_join_size * 1000000"
                   " div GREATEST(n_left, n_right)"),
        )
        .withColumn(
            "strategy", F.expr(_strategy_case(broadcast_rows, skew_ppm))
        )
    )


def join_advice_sql(
    left_sql: str,
    right_sql: str,
    left_key: str,
    right_key: str,
    width: int = 4096,
    depth: int = 4,
    broadcast_rows: int = 100_000,
    skew_ppm: int = 200_000,
) -> str:
    """DuckDB twin: same per-key aggregates, same CMS CTEs (renamed
    cms_a/cms_b), same inner-product MIN, same CASE chain."""
    from .bloom import cms_join_size_sql, cms_sql

    cms_a = cms_sql(
        f"SELECT {left_key} AS k FROM ({left_sql}) WHERE"
        f" {left_key} IS NOT NULL", "k", width, depth,
    ).replace("src AS", "src_a AS").replace(
        "cms AS", "cms_a AS"
    ).replace("FROM src", "FROM src_a")
    cms_b = cms_sql(
        f"SELECT {right_key} AS k FROM ({right_sql}) WHERE"
        f" {right_key} IS NOT NULL", "k", width, depth,
    ).replace("src AS", "src_b AS").replace(
        "cms AS", "cms_b AS"
    ).replace("FROM src", "FROM src_b")
    est_inner = cms_join_size_sql(depth=depth)
    case = _strategy_case(broadcast_rows, skew_ppm)
    return f"""
        WITH {cms_a},
        {cms_b},
        lstats AS (
            SELECT CAST(SUM(cnt) AS BIGINT) AS n_left,
                   COUNT(*) AS left_keys,
                   CAST(MAX(cnt) AS BIGINT) AS left_max_key_rows,
                   CAST(MAX(cnt) AS BIGINT) * 1000000
                       // CAST(SUM(cnt) AS BIGINT)
                       AS left_top_share_ppm
            FROM (
                SELECT {left_key}, COUNT(*) AS cnt FROM ({left_sql})
                WHERE {left_key} IS NOT NULL GROUP BY {left_key}
            )
        ),
        rstats AS (
            SELECT CAST(SUM(cnt) AS BIGINT) AS n_right,
                   COUNT(*) AS right_keys,
                   CAST(MAX(cnt) AS BIGINT) AS right_max_key_rows,
                   CAST(MAX(cnt) AS BIGINT) * 1000000
                       // CAST(SUM(cnt) AS BIGINT)
                       AS right_top_share_ppm
            FROM (
                SELECT {right_key}, COUNT(*) AS cnt FROM ({right_sql})
                WHERE {right_key} IS NOT NULL GROUP BY {right_key}
            )
        ),
        est AS ({est_inner})
        SELECT n_left, n_right, left_keys, right_keys,
               left_max_key_rows, right_max_key_rows,
               left_top_share_ppm, right_top_share_ppm,
               est_join_size,
               est_join_size * 1000000
                   // GREATEST(n_left, n_right) AS fanout_ppm,
               {case} AS strategy
        FROM lstats CROSS JOIN rstats CROSS JOIN est
    """
