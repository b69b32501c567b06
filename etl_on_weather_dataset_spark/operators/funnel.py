"""Product-analytics operators over an event stream: ordered funnels
and cohort retention.

- ``funnel_counts``: how many users completed step 1, then step 2
  STRICTLY after step 1, then step 3 strictly after step 2, ... (the
  ordered-sequence semantics real funnel tools implement -- a user
  who did B before A has not completed the A->B funnel). Completion
  times are the chained minima s_1 = min ts(step1), s_i = min
  ts(step_i with ts > s_{i-1}); the strict inequality makes the
  result independent of how simultaneous events are ordered.
- ``cohort_retention``: group users by first-seen period (cohort) and
  count how many were active again k periods later.

Scale shapes:
- the funnel needs each user's events in time order. Rather than a
  per-user sort + lag chain (a window per step), each user's
  (ts, type) pairs are collected into one array (single shuffle on
  user_id, map-side partial), sorted in-row, and folded ONCE with a
  step-machine: the fold keeps the earliest timestamp at which each
  prefix of the funnel is complete. Per-user state is one tiny array
  however many events the user has; no second shuffle, no window.
- retention is two aggregates and an equi-join on (user, cohort) --
  all map-side-combinable.

Engine-invariance: timestamps compare exactly, and the strict-
inequality chaining is tie-order independent, so the Spark single-pass
fold and the oracle's chained per-step minima provably compute the
same completion times.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_counts(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """One row per funnel step: (step, event_type, n_users) where
    n_users completed steps 1..i in order."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    if len(set(steps)) != len(steps):
        raise ValueError("funnel steps must be distinct event types")
    n = len(steps)
    events = df.filter(F.col(type_col).isin(steps)).select(
        F.col(user_col).alias("u"),
        F.struct(
            F.col(ts_col).alias("ts"), F.col(type_col).alias("et")
        ).alias("e"),
    )
    per_user = events.groupBy("u").agg(
        F.sort_array(F.collect_list("e")).alias("es")
    )
    # fold over the time-sorted events: acc[i] = chained completion
    # time s_{i+1}. Step i advances on the first event of its type
    # with ts STRICTLY greater than the previous step's completion
    # (ts > null is null-safe false, so the prev-done check is
    # implied). Processing in ascending ts order makes that first
    # event the minimum, i.e. exactly the chained-minima definition.
    init = F.array(*[F.lit(None).cast("timestamp") for _ in steps])

    def step_fold(acc, e):
        out = acc
        for i in reversed(range(n)):
            prev_ok = (
                F.lit(True) if i == 0
                else e["ts"] > acc[i - 1]
            )
            out = F.when(
                (e["et"] == steps[i])
                & acc[i].isNull()
                & prev_ok,
                F.concat(
                    F.slice(acc, 1, i),
                    F.array(e["ts"]),
                    F.slice(acc, i + 2, n - i - 1),
                ),
            ).otherwise(out)
        return out

    done = per_user.select(
        F.aggregate(F.col("es"), init, step_fold).alias("acc")
    )
    counts = done.agg(*[
        F.coalesce(
            F.sum(F.col("acc")[i].isNotNull().cast("long")),
            F.lit(0).cast("long"),
        ).alias(f"_s{i}")
        for i in range(n)
    ])
    rows = F.array(*[
        F.struct(
            F.lit(i + 1).alias("step"),
            F.lit(steps[i]).alias("event_type"),
            F.col(f"_s{i}").alias("n_users"),
        )
        for i in range(n)
    ])
    return counts.select(F.explode(rows).alias("r")).select("r.*")


def funnel_counts_sql(
    table: str,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> str:
    """DuckDB twin: the chained per-step minima (provably equal to the
    Spark fold under the strict-inequality semantics)."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    if len(set(steps)) != len(steps):
        raise ValueError("funnel steps must be distinct event types")
    n = len(steps)
    ctes = [
        f"""u0 AS (
            SELECT {user_col} AS u, MIN({ts_col}) AS s
            FROM {table} WHERE {type_col} = '{steps[0]}'
            GROUP BY {user_col}
        )"""
    ]
    for i in range(1, n):
        ctes.append(f"""u{i} AS (
            SELECT e.{user_col} AS u, MIN(e.{ts_col}) AS s
            FROM {table} e JOIN u{i - 1} p ON e.{user_col} = p.u
            WHERE e.{type_col} = '{steps[i]}' AND e.{ts_col} > p.s
            GROUP BY e.{user_col}
        )""")
    selects = "\n        UNION ALL\n".join(
        f"""        SELECT {i + 1} AS step, '{steps[i]}' AS event_type,
               CAST(COUNT(*) AS BIGINT) AS n_users FROM u{i}"""
        for i in range(n)
    )
    return f"""
        WITH {", ".join(ctes)}
{selects}
    """


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """(cohort, period_offset, n_users): users whose FIRST event fell
    in ``cohort`` and who were active again ``period_offset`` periods
    later (offset 0 = the cohort size itself)."""
    active = df.select(
        F.col(user_col).alias("u"),
        F.date_trunc(period, F.col(ts_col)).alias("p"),
    ).distinct()
    first = active.groupBy("u").agg(F.min("p").alias("cohort"))
    joined = active.join(first, "u")
    offset_expr = {
        "week": (F.datediff("p", "cohort") / 7).cast("long"),
        "day": F.datediff("p", "cohort").cast("long"),
        "month": (
            (F.year("p") - F.year("cohort")) * 12
            + (F.month("p") - F.month("cohort"))
        ).cast("long"),
    }[period]
    return (
        joined.select("u", "cohort", offset_expr.alias("period_offset"))
        .distinct()
        .groupBy("cohort", "period_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def cohort_retention_sql(
    table: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> str:
    offset = {
        "week": "CAST(datediff('day', cohort, p) / 7 AS BIGINT)",
        "day": "CAST(datediff('day', cohort, p) AS BIGINT)",
        "month": (
            "CAST((year(p) - year(cohort)) * 12"
            " + (month(p) - month(cohort)) AS BIGINT)"
        ),
    }[period]
    return f"""
        WITH active AS (
            SELECT DISTINCT {user_col} AS u,
                   date_trunc('{period}', {ts_col}) AS p
            FROM {table}
        ), cohorts AS (
            SELECT u, MIN(p) AS cohort FROM active GROUP BY u
        )
        SELECT cohort, period_offset, COUNT(*) AS n_users
        FROM (
            SELECT DISTINCT a.u, f.cohort, {offset} AS period_offset
            FROM active a JOIN cohorts f ON a.u = f.u
        )
        GROUP BY cohort, period_offset
    """
