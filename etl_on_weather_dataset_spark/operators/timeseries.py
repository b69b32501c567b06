"""Time-series regularization: gap filling, LOCF, linear interpolation.

The hypertable workflow (TimescaleDB's time_bucket_gapfill / locf /
interpolate, re-expressed in pure DataFrame ops):

1. bucket observations to a fixed step (epoch-floor projection);
2. build the dense scaffold: every (key, bucket) in the global time
   range -- keys x sequence(), a broadcast-friendly cross join;
3. left-join observations onto the scaffold;
4. fill: counts -> 0, values -> last-observation-carried-forward
   (window last(ignorenulls)) and/or linear interpolation between the
   surrounding non-null observations (prev/next value + timestamp via
   past/future windows).

Scale: the scaffold is |keys| x |buckets| rows -- generated, never
shuffled at observation grain; the only shuffles are the bucket
aggregate and the per-key window sort. All arithmetic is integer
epochs + one deterministic float formula, so a SQL oracle reproduces
results bit-for-bit (after fixed rounding).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

INTERP_DECIMALS = 6


def time_bucket(ts: Column | str, step_seconds: int) -> Column:
    """Floor a timestamp to a fixed step (epoch-aligned)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.timestamp_seconds(
        F.floor(F.unix_timestamp(c) / step_seconds).cast("long")
        * step_seconds
    )


def fill_gaps(
    observations: DataFrame,
    key_cols: Sequence[str],
    bucket_col: str,
    value_col: str,
    count_col: str | None = None,
    step_seconds: int = 3600,
) -> DataFrame:
    """Densify a bucketed series and fill missing values.

    ``observations`` has one row per (keys, bucket) with ``value_col``
    (nullable after the join) and optionally ``count_col``. Returns the
    dense frame with:
      - ``{count_col}`` -> 0 on generated rows,
      - ``{value_col}_locf`` -> last non-null value at or before,
      - ``{value_col}_interp`` -> linear interpolation between the
        surrounding non-null observations (null at the edges).
    """
    keys = list(key_cols)
    bounds = observations.agg(
        F.min(bucket_col).alias("__lo"), F.max(bucket_col).alias("__hi")
    )
    key_domain = observations.select(*keys).distinct()
    scaffold = key_domain.crossJoin(F.broadcast(bounds)).select(
        *keys,
        F.explode(
            F.sequence(
                F.unix_timestamp("__lo"),
                F.unix_timestamp("__hi"),
                F.lit(step_seconds),
            )
        ).alias("__e"),
    ).select(*keys, F.timestamp_seconds("__e").alias(bucket_col))

    dense = scaffold.join(observations, [*keys, bucket_col], "left")

    past = (
        Window.partitionBy(*keys)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    future = (
        Window.partitionBy(*keys)
        .orderBy(bucket_col)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    v = F.col(value_col)
    e = F.unix_timestamp(bucket_col)
    obs_ts = F.when(v.isNotNull(), e)
    prev_v = F.last(v, ignorenulls=True).over(past)
    prev_t = F.last(obs_ts, ignorenulls=True).over(past)
    next_v = F.first(v, ignorenulls=True).over(future)
    next_t = F.first(obs_ts, ignorenulls=True).over(future)
    # Round via explicit scaling (round(x*1e6)/1e6), NOT F.round(x, 6):
    # Spark's round(x, d) rounds the double's shortest decimal repr
    # while DuckDB rounds the scaled float -- for a value sitting on
    # the rounding grid (e.g. exactly ...6875) they disagree by one
    # final digit. Scaling first makes both engines round the SAME
    # scaled double the same way.
    raw = prev_v + (next_v - prev_v) * (e - prev_t) / (next_t - prev_t)
    scale = float(10 ** INTERP_DECIMALS)
    interp = F.when(v.isNotNull(), v).otherwise(
        F.round(raw * scale) / scale
    )
    out = dense.withColumn(f"{value_col}_locf", prev_v).withColumn(
        f"{value_col}_interp", interp
    )
    if count_col is not None:
        out = out.withColumn(
            count_col, F.coalesce(F.col(count_col), F.lit(0))
        )
    return out.drop(value_col)


def fill_gaps_sql(
    obs_sql: str,
    key_cols: Sequence[str],
    bucket_col: str,
    value_col: str,
    count_col: str | None = None,
    step_seconds: int = 3600,
) -> str:
    """DuckDB twin of fill_gaps over an observation CTE ``obs_sql``
    that yields (keys..., bucket_col, value_col[, count_col])."""
    keys = ", ".join(key_cols)
    count_sel = (
        f"COALESCE(o.{count_col}, 0) AS {count_col}," if count_col else ""
    )
    return f"""
        WITH obs AS (
            {obs_sql}
        ), bounds AS (
            SELECT epoch(MIN({bucket_col}))::BIGINT AS lo,
                   epoch(MAX({bucket_col}))::BIGINT AS hi
            FROM obs
        ), scaffold AS (
            SELECT k.*, make_timestamp(e * 1000000) AS {bucket_col}
            FROM (SELECT DISTINCT {keys} FROM obs) k
            CROSS JOIN (
                SELECT unnest(range(lo, hi + 1, {step_seconds})) AS e
                FROM bounds
            )
        ), dense AS (
            SELECT s.*, {count_sel}
                   o.{value_col} AS v
            FROM scaffold s
            LEFT JOIN obs o USING ({keys}, {bucket_col})
        )
        SELECT * EXCLUDE (v),
               last_value(v IGNORE NULLS) OVER past AS {value_col}_locf,
               CASE WHEN v IS NOT NULL THEN v ELSE
                   ROUND((
                       last_value(v IGNORE NULLS) OVER past
                       + (first_value(v IGNORE NULLS) OVER future
                          - last_value(v IGNORE NULLS) OVER past)
                       * (epoch({bucket_col})::BIGINT
                          - last_value(CASE WHEN v IS NOT NULL THEN
                                epoch({bucket_col})::BIGINT END
                                IGNORE NULLS) OVER past)
                       / (first_value(CASE WHEN v IS NOT NULL THEN
                                epoch({bucket_col})::BIGINT END
                                IGNORE NULLS) OVER future
                          - last_value(CASE WHEN v IS NOT NULL THEN
                                epoch({bucket_col})::BIGINT END
                                IGNORE NULLS) OVER past)
                   ) * CAST({10 ** INTERP_DECIMALS} AS DOUBLE))
                   / CAST({10 ** INTERP_DECIMALS} AS DOUBLE)
               END AS {value_col}_interp
        FROM dense
        WINDOW past AS (PARTITION BY {keys} ORDER BY {bucket_col}
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW),
               future AS (PARTITION BY {keys} ORDER BY {bucket_col}
                          ROWS BETWEEN CURRENT ROW
                          AND UNBOUNDED FOLLOWING)
    """


# --- rolling z-score anomaly detection --------------------------------------

def rolling_zscore(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    value_col: str,
    window_rows: int = 20,
    threshold: float = 3.0,
    value_scale: int = 100,
) -> DataFrame:
    """Flag points that deviate > ``threshold`` sigma from their own
    trailing window (previous ``window_rows`` rows per key, current row
    EXCLUDED so the candidate can't mask itself).

    Engine-exact: the window sums run over scaled BIGINTs (sum and
    sum-of-squares are exact integers), and mean/variance/z are derived
    from those integers with one fixed float expression -- identical
    IEEE ops on identical inputs, so a SQL oracle agrees bit-for-bit,
    including on borderline threshold flips. Rows with fewer than
    ``window_rows`` predecessors get ``z = NULL, is_anomaly = false``
    (no partial-window guesses); zero-variance windows likewise.

    Scale: one shuffle on ``key_col`` + a per-key sort -- the same
    shape as any per-entity window; no state beyond the frame, so AQE
    handles skewed keys. For keys too hot for one task, pre-split by
    time range first (the operator is trailing-window local).

    Columns added: ``z`` (double), ``is_anomaly`` (boolean).
    """
    v_c = F.round(F.col(value_col) * value_scale).cast("long")
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, tiebreak_col)
        .rowsBetween(-window_rows, -1)
    )
    s1 = F.sum(v_c).over(w)
    s2 = F.sum(v_c * v_c).over(w)
    n = F.count(v_c).over(w)
    mean = s1.cast("double") / window_rows
    var = s2.cast("double") / window_rows - mean * mean
    z = (v_c.cast("double") - mean) / F.sqrt(var)
    full = n == window_rows
    return df.withColumn(
        "z", F.when(full & (var > 0), z)
    ).withColumn(
        "is_anomaly", F.coalesce(F.abs(F.col("z")) > threshold, F.lit(False))
    )


def rolling_zscore_sql(
    table: str,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    value_col: str,
    window_rows: int = 20,
    threshold: float = 3.0,
    value_scale: int = 100,
) -> str:
    """DuckDB twin of :func:`rolling_zscore` (same formula shape)."""
    frame = (
        f"PARTITION BY {key_col} ORDER BY {ts_col}, {tiebreak_col} "
        f"ROWS BETWEEN {window_rows} PRECEDING AND 1 PRECEDING"
    )
    return f"""
        SELECT *,
               CASE WHEN n = {window_rows} AND var > 0
                    THEN (CAST(v_c AS DOUBLE) - mean) / SQRT(var)
               END AS z,
               COALESCE(ABS((CAST(v_c AS DOUBLE) - mean) / SQRT(var))
                        > {threshold}
                        AND n = {window_rows} AND var > 0,
                        FALSE) AS is_anomaly
        FROM (
            SELECT *,
                   CAST(s1 AS DOUBLE) / {window_rows} AS mean,
                   CAST(s2 AS DOUBLE) / {window_rows}
                     - (CAST(s1 AS DOUBLE) / {window_rows})
                       * (CAST(s1 AS DOUBLE) / {window_rows}) AS var
            FROM (
                SELECT *,
                       CAST(ROUND({value_col} * {value_scale}) AS BIGINT)
                           AS v_c,
                       SUM(CAST(ROUND({value_col} * {value_scale})
                                AS BIGINT)) OVER ({frame}) AS s1,
                       SUM(CAST(ROUND({value_col} * {value_scale})
                                AS BIGINT)
                           * CAST(ROUND({value_col} * {value_scale})
                                  AS BIGINT)) OVER ({frame}) AS s2,
                       COUNT(*) OVER ({frame}) AS n
                FROM {table}
            ) sums
        ) stats
    """


# --- OHLC (open/high/low/close) bucket rollup ---------------------------------

def ohlc(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    value_col: str,
    bucket_col: Column | str | None = None,
) -> DataFrame:
    """Candlestick rollup per (key, bucket): first/max/min/last value.

    open/close use ``min_by``/``max_by`` over the (ts, tiebreak)
    struct -- deterministic even with equal timestamps, no window sort
    over the raw stream. One shuffle (the groupBy); high/low/open/
    close all come from the same grouped pass.
    """
    bucket = (
        F.to_date(ts_col) if bucket_col is None
        else (F.col(bucket_col) if isinstance(bucket_col, str) else bucket_col)
    )
    order = F.struct(F.col(ts_col), F.col(tiebreak_col))
    return (
        df.groupBy(F.col(key_col).alias("key"), bucket.alias("bucket"))
        .agg(
            F.min_by(value_col, order).alias("open"),
            F.max(value_col).alias("high"),
            F.min(value_col).alias("low"),
            F.max_by(value_col, order).alias("close"),
            F.count(F.lit(1)).alias("n_ticks"),
        )
    )


def ohlc_sql(
    table: str,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    value_col: str,
) -> str:
    """DuckDB twin (daily buckets): first/last via row_number over the
    same (ts, tiebreak) order."""
    return f"""
        SELECT key, bucket,
               MAX(CASE WHEN rn_a = 1 THEN {value_col} END) AS open,
               MAX({value_col}) AS high,
               MIN({value_col}) AS low,
               MAX(CASE WHEN rn_d = 1 THEN {value_col} END) AS close,
               COUNT(*) AS n_ticks
        FROM (
            SELECT {key_col} AS key, CAST({ts_col} AS DATE) AS bucket,
                   {value_col}, 
                   ROW_NUMBER() OVER (
                       PARTITION BY {key_col}, CAST({ts_col} AS DATE)
                       ORDER BY {ts_col}, {tiebreak_col}) AS rn_a,
                   ROW_NUMBER() OVER (
                       PARTITION BY {key_col}, CAST({ts_col} AS DATE)
                       ORDER BY {ts_col} DESC, {tiebreak_col} DESC) AS rn_d
            FROM {table}
        ) t
        GROUP BY key, bucket
    """


# --- time-weighted average (TimescaleDB time_weight parity) -------------------

def time_weighted_avg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    value_col: str,
    value_scale: int = 100,
) -> DataFrame:
    """LOCF time-weighted mean per (key, day): each observation holds
    its value until the next one (or day end), and contributes
    value * held_seconds.

    Exact: weights are integer epoch-second gaps, values scaled
    bigints -- the weighted sum is an exact integer, so partial
    aggregation order can't shift the result; the single final
    division is deterministic.

    Plan: one per-key window (lead) + one grouped sum -- the same
    two-exchange shape as any sessionization; no scaffold join needed
    because weighting happens at observation grain.
    """
    day = F.to_date(ts_col)
    epoch = F.unix_timestamp(F.col(ts_col))
    day_end = F.unix_timestamp(F.date_add(day, 1).cast("timestamp"))
    w = Window.partitionBy(key_col, day).orderBy(ts_col, tiebreak_col)
    nxt = F.lead(epoch).over(w)
    dt = F.coalesce(nxt, day_end) - epoch
    v_c = F.round(F.col(value_col) * value_scale).cast("long")
    return (
        df.select(
            F.col(key_col).alias("key"), day.alias("bucket"),
            (v_c * dt).alias("wv"), dt.alias("dt"),
        )
        .groupBy("key", "bucket")
        .agg(
            (
                F.sum("wv").cast("double")
                / F.sum("dt").cast("double") / value_scale
            ).alias("twap"),
            F.sum("dt").alias("held_seconds"),
            F.count(F.lit(1)).alias("n_obs"),
        )
    )


def time_weighted_avg_sql(
    table: str,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    value_col: str,
    value_scale: int = 100,
) -> str:
    """DuckDB twin of :func:`time_weighted_avg` (same integer gaps).

    FLOOR(epoch(ts)), not epoch(ts)::BIGINT: DuckDB's double->bigint
    cast ROUNDS while Spark's unix_timestamp TRUNCATES fractional
    seconds -- without the floor the two engines disagree by 1s on
    sub-second timestamps."""
    return f"""
        SELECT key, bucket,
               CAST(SUM(wv) AS DOUBLE) / CAST(SUM(dt) AS DOUBLE)
                   / {value_scale} AS twap,
               CAST(SUM(dt) AS BIGINT) AS held_seconds,
               COUNT(*) AS n_obs
        FROM (
            SELECT {key_col} AS key,
                   CAST({ts_col} AS DATE) AS bucket,
                   CAST(ROUND({value_col} * {value_scale}) AS BIGINT)
                   * (COALESCE(
                          LEAD(CAST(FLOOR(epoch({ts_col})) AS BIGINT)) OVER w,
                          epoch((CAST({ts_col} AS DATE)
                                 + INTERVAL 1 DAY)::TIMESTAMP)::BIGINT)
                      - CAST(FLOOR(epoch({ts_col})) AS BIGINT)) AS wv,
                   (COALESCE(
                        LEAD(CAST(FLOOR(epoch({ts_col})) AS BIGINT)) OVER w,
                        epoch((CAST({ts_col} AS DATE)
                               + INTERVAL 1 DAY)::TIMESTAMP)::BIGINT)
                    - CAST(FLOOR(epoch({ts_col})) AS BIGINT)) AS dt
            FROM {table}
            WINDOW w AS (
                PARTITION BY {key_col}, CAST({ts_col} AS DATE)
                ORDER BY {ts_col}, {tiebreak_col})
        ) seg
        GROUP BY key, bucket
    """


# --- CUSUM change-point detection ------------------------------------------------


def cusum_daily(
    df: DataFrame,
    ts_col: str = "ts",
    cents_col: str = "cents",
    burn_in_days: int = 10,
    slack_ppm: int = 250_000,
    h_mult: int = 2,
) -> DataFrame:
    """Two-sided CUSUM over daily totals: WHEN did the level shift?

    The drift tier (KS, KL, rolling z-score) answers "are these two
    windows different"; CUSUM localizes the change-point by
    accumulating deviations from a burn-in baseline:

        spos_t = max(0, spos_{t-1} + s_t*1e6 - n_t*(mu + k))
        sneg_t = max(0, sneg_{t-1} + n_t*(mu - k) - s_t*1e6)

    with ``mu = (burn-in cents)*1e6 div (burn-in events)`` (micro-
    cents per event), slack ``k = mu*slack_ppm div 1e6`` and alarm
    threshold ``h_mult * mu * (burn-in events div burn_in_days)``
    (h_mult average burn-in days' worth of deviation). Every quantity
    is a BIGINT derived by truncating division -- identical in Spark
    (``div``) and DuckDB (``//``) -- so the recursion is exact in
    both engines: the Spark fold (``F.aggregate`` over the day-sorted
    array) and the oracle's recursive CTE cannot disagree.

    Output per day: (day, n_events, sum_cents, cusum_pos, cusum_neg,
    alarm_pos, alarm_neg), ordered by day.

    Scale shape: the heavy lift is the daily rollup -- one map-side-
    combinable aggregate from event grain to |days| rows. The
    non-associative CUSUM recursion then runs over the |days|-row
    series folded INSIDE one array on one row (bounded coordination:
    ten years of days is 3.7k structs, same discipline as the
    ordered-fold/EWMA tier); nothing at event grain ever sorts or
    collects. Overflow ceiling: s_t*1e6 must fit a BIGINT, i.e.
    daily totals below ~9e12 cents -- ANSI mode fails loud past it.
    """
    day = F.col(ts_col).cast("date")
    daily = df.groupBy(day.alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col(cents_col).cast("long")).cast("long").alias("s"),
    )
    return cusum_from_daily(
        daily, burn_in_days=burn_in_days, slack_ppm=slack_ppm,
        h_mult=h_mult,
    )


def cusum_from_daily(
    daily: DataFrame,
    burn_in_days: int = 10,
    slack_ppm: int = 250_000,
    h_mult: int = 2,
) -> DataFrame:
    """The CUSUM recursion over an ALREADY-ROLLED-UP daily frame
    ``(day, n, s)`` -- exposed separately so day-2 pipelines can feed
    it from the persistent rollup store (daily batches landed by
    ``incremental_rollup``) instead of re-scanning event grain; same
    exact-integer semantics as :func:`cusum_daily`.

    Fail-loud degenerate-input guard: the burn-in window must carry
    at least ``burn_in_days`` events in total. An empty frame would
    hit ``g * 1e6 div NULL`` and silently null out the series; a
    burn-in with fewer events than days makes ``d div burn_in_days``
    zero, so ``thresh = 0`` and EVERY positive deviation alarms --
    both are caller errors, rejected with a clear message instead
    (module fail-loud discipline; same pattern as
    ``neyman_weights``'s 2^52 guard)."""
    rn_w = Window.orderBy("day")
    ranked = daily.withColumn("rn", F.row_number().over(rn_w))
    params = (
        ranked.filter(F.col("rn") <= burn_in_days)
        .agg(
            F.sum("s").cast("long").alias("g"),
            F.sum("n").cast("long").alias("d_raw"),
        )
        .select(
            "g",
            F.when(
                F.col("d_raw").isNotNull()
                & (F.col("d_raw") >= burn_in_days),
                F.col("d_raw"),
            ).otherwise(
                F.expr(
                    "raise_error('cusum_from_daily: burn-in window"
                    " has fewer events than burn_in_days (empty"
                    " frame, or < 1 event/day on average) -- mu and"
                    " thresh would be degenerate (thresh=0 alarms on"
                    " every positive deviation); feed a longer"
                    " burn-in or lower burn_in_days')"
                ).cast("long")
            ).alias("d"),
        )
        .select(
            F.expr("g * 1000000 div d").alias("mu"),
            F.expr(
                f"(g * 1000000 div d) * {slack_ppm} div 1000000"
            ).alias("k"),
            F.expr(
                f"{h_mult} * (g * 1000000 div d)"
                f" * (d div {burn_in_days})"
            ).alias("thresh"),
        )
    )
    one = (
        daily.crossJoin(F.broadcast(params))
        .agg(
            F.sort_array(
                F.collect_list(F.struct("day", "n", "s"))
            ).alias("days"),
            F.first("mu").alias("mu"),
            F.first("k").alias("k"),
            F.first("thresh").alias("thresh"),
        )
    )
    acc_t = (
        "array<struct<day:date,n:bigint,s:bigint,"
        "spos:bigint,sneg:bigint>>"
    )
    folded = one.select(
        "thresh",
        F.expr(f"""
            aggregate(
                days,
                cast(array() as {acc_t}),
                (acc, e) -> array_append(acc, named_struct(
                    'day', e.day, 'n', e.n, 's', e.s,
                    'spos', greatest(cast(0 as bigint),
                        (case when size(acc) = 0 then cast(0 as bigint)
                              else element_at(acc, size(acc)).spos end)
                        + e.s * 1000000 - e.n * (mu + k)),
                    'sneg', greatest(cast(0 as bigint),
                        (case when size(acc) = 0 then cast(0 as bigint)
                              else element_at(acc, size(acc)).sneg end)
                        + e.n * (mu - k) - e.s * 1000000)))
            )
        """).alias("series"),
    )
    row = folded.select("thresh", F.explode("series").alias("e"))
    return row.select(
        F.col("e.day").alias("day"),
        F.col("e.n").alias("n_events"),
        F.col("e.s").alias("sum_cents"),
        F.col("e.spos").alias("cusum_pos"),
        F.col("e.sneg").alias("cusum_neg"),
        (F.col("e.spos") > F.col("thresh")).alias("alarm_pos"),
        (F.col("e.sneg") > F.col("thresh")).alias("alarm_neg"),
    ).orderBy("day")


def cusum_daily_sql(
    table_sql: str,
    ts_col: str = "ts",
    cents_col: str = "cents",
    burn_in_days: int = 10,
    slack_ppm: int = 250_000,
    h_mult: int = 2,
) -> str:
    """DuckDB twin of :func:`cusum_daily` -- the same integer
    recursion as a recursive CTE over the day index. Assumes the
    same valid-input contract the engine arm enforces (burn-in
    events >= burn_in_days); on degenerate input the engine arm
    raises before the oracle would ever be consulted."""
    return f"""
        WITH RECURSIVE daily AS (
            SELECT CAST({ts_col} AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST({cents_col} AS BIGINT)) AS BIGINT)
                       AS s
            FROM ({table_sql}) GROUP BY 1
        ), ranked AS (
            SELECT day, n, s,
                   ROW_NUMBER() OVER (ORDER BY day) AS rn
            FROM daily
        ), params AS (
            SELECT (g * 1000000 // d) AS mu,
                   (g * 1000000 // d) * {slack_ppm} // 1000000 AS k,
                   {h_mult} * (g * 1000000 // d)
                       * (d // {burn_in_days}) AS thresh
            FROM (SELECT CAST(SUM(s) AS BIGINT) AS g,
                         CAST(SUM(n) AS BIGINT) AS d
                  FROM ranked WHERE rn <= {burn_in_days})
        ), cusum AS (
            SELECT r.rn, r.day, r.n, r.s,
                   GREATEST(CAST(0 AS BIGINT),
                            r.s * 1000000 - r.n * (p.mu + p.k))
                       AS spos,
                   GREATEST(CAST(0 AS BIGINT),
                            r.n * (p.mu - p.k) - r.s * 1000000)
                       AS sneg
            FROM ranked r, params p WHERE r.rn = 1
            UNION ALL
            SELECT r.rn, r.day, r.n, r.s,
                   GREATEST(CAST(0 AS BIGINT),
                            c.spos + r.s * 1000000
                            - r.n * (p.mu + p.k)) AS spos,
                   GREATEST(CAST(0 AS BIGINT),
                            c.sneg + r.n * (p.mu - p.k)
                            - r.s * 1000000) AS sneg
            FROM cusum c
            JOIN ranked r ON r.rn = c.rn + 1
            CROSS JOIN params p
        )
        SELECT c.day, c.n AS n_events, c.s AS sum_cents,
               c.spos AS cusum_pos, c.sneg AS cusum_neg,
               c.spos > p.thresh AS alarm_pos,
               c.sneg > p.thresh AS alarm_neg
        FROM cusum c, params p
        ORDER BY day
    """


# --- per-key OLS trend slope --------------------------------------------------------


def trend_slope_by_key(
    df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    cents_col: str = "cents",
) -> DataFrame:
    """Per-key ordinary-least-squares trend of daily totals: the
    "is this series drifting up or down, and how fast" number a
    monitoring dashboard puts next to the CUSUM alarm (CUSUM
    localizes WHEN; the slope quantifies HOW FAST).

    Exact-integer discipline: with x = day index RECENTERED to each
    key's first day (keeps every cross-moment small: x <= series
    length, so n * sum(x^2) stays far from the BIGINT edge) and
    y = exact daily cent totals,

        slope_num = n * sum(xy) - sum(x) * sum(y)      -- cents/day
        slope_den = n * sum(x^2) - sum(x)^2

    both plain BIGINTs; slope_milli_cents_per_day = sign-split
    truncating division of 1000 * num by den (negative slopes are
    legal, so the quotient is computed on |num| and re-signed --
    the cohens_kappa rule). Keys with a single day have den = 0:
    slope NULL (undefined, loudly visible), not 0 (flat is a claim).

    Scale shape: one map-side-combinable rollup to (key, day) grain,
    one second aggregate to |keys| rows carrying the five cross
    moments. No window, no sort.
    """
    day = F.datediff(
        F.col(ts_col).cast("date"), F.lit("1970-01-01").cast("date")
    ).cast("long")
    daily = (
        df.groupBy(F.col(key_col).alias("key"), day.alias("d"))
        .agg(F.sum(F.col(cents_col).cast("long")).alias("y"))
    )
    base = daily.groupBy("key").agg(F.min("d").alias("d0"))
    m = (
        daily.join(base, "key")
        .select("key", (F.col("d") - F.col("d0")).alias("x"), "y")
        .groupBy("key")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.sum("x").cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        )
    )
    return m.select(
        F.col("key").alias(key_col),
        "n_days",
        F.expr("n_days * sxy - sx * sy").alias("slope_num"),
        F.expr("n_days * sxx - sx * sx").alias("slope_den"),
        F.expr("""
            CASE WHEN n_days * sxx - sx * sx = 0 THEN NULL
                 ELSE sign(n_days * sxy - sx * sy)
                      * (abs(n_days * sxy - sx * sy) * 1000
                         div (n_days * sxx - sx * sx))
            END
        """).cast("long").alias("slope_milli_cents_per_day"),
    )


def trend_slope_by_key_sql(
    table: str,
    key_col: str,
    ts_col: str = "ts",
    cents_expr: str = "cents",
) -> str:
    """DuckDB twin of :func:`trend_slope_by_key` (same recentered
    cross moments, same sign-split division)."""
    return f"""
        WITH daily AS (
            SELECT {key_col} AS key,
                   CAST(date_diff('day', DATE '1970-01-01',
                        CAST({ts_col} AS DATE)) AS BIGINT) AS d,
                   CAST(SUM(CAST({cents_expr} AS BIGINT)) AS BIGINT)
                       AS y
            FROM ({table})
            GROUP BY 1, 2
        ), m AS (
            SELECT key,
                   CAST(COUNT(*) AS BIGINT) AS n_days,
                   CAST(SUM(d - d0) AS BIGINT) AS sx,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM((d - d0) * y) AS BIGINT) AS sxy,
                   CAST(SUM((d - d0) * (d - d0)) AS BIGINT) AS sxx
            FROM (
                SELECT *, MIN(d) OVER (PARTITION BY key) AS d0
                FROM daily
            )
            GROUP BY key
        )
        SELECT key AS {key_col}, n_days,
               n_days * sxy - sx * sy AS slope_num,
               n_days * sxx - sx * sx AS slope_den,
               CAST(CASE WHEN n_days * sxx - sx * sx = 0 THEN NULL
                    ELSE CAST(sign(n_days * sxy - sx * sy) AS BIGINT)
                         * (abs(n_days * sxy - sx * sy) * 1000
                            // (n_days * sxx - sx * sx))
               END AS BIGINT) AS slope_milli_cents_per_day
        FROM m
    """


# --- AR(1) persistence coefficient (round-11) --------------------------------------

# Aggregate-level overflow refusal bound for ar1_by_key: with the
# guard n_pairs^2 * mx^2 <= 2^51 every cross moment stays <= 2^51,
# |num| <= 2^52, and |num| * 1000 <= 2^62 -- all safely inside BIGINT
# in both engines (DuckDB would error on overflow, Spark would WRAP
# silently; the shared fail-loud guard fires before either happens).
_AR1_GUARD = 2_251_799_813_685_248  # 2^51
_AR1_ROW_MAX = 3_037_000_499  # floor(sqrt(2^63)): per-row square bound


def ar1_by_key(
    df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    cents_col: str = "cents",
    unit_cents: int = 100,
) -> DataFrame:
    """Per-key AR(1) persistence of daily totals: the OLS coefficient
    of y_t on y_{t-1} over CONSECUTIVE days -- the momentum dial next
    to trend_slope_by_key (the slope says where the series drifts;
    phi says how strongly today echoes yesterday: phi near 1000 milli
    = persistent level shifts, near 0 = memoryless noise, negative =
    mean-reverting oscillation). Same monitoring family as CUSUM/EWMA.

    Semantics: daily totals in ``unit_cents`` units (truncating
    division -- the unit is the caller's scale dial: cents at small
    corpora, dollars by default, k$ when daily volume grows; the
    guard below REFUSES rather than rounds when the unit is too fine
    for the volume). Only day pairs with d_t - d_{t-1} == 1 enter the
    regression -- a gap is missing evidence, not a lag-1 pair.
    Recentering by the key's min daily total keeps every moment small
    without changing the slope.

    Exact-integer discipline: BIGINT cross moments; sign-split
    truncating division (negative phi is legal -- the cohens_kappa
    rule); keys with no consecutive-day pair or zero lag variance get
    phi NULL (undefined, loudly visible), not 0. Fail-loud overflow
    guards at both grains (``_AR1_ROW_MAX`` per row, ``_AR1_GUARD``
    per key) fire identically in both engines BEFORE Spark's silent
    BIGINT wrap or DuckDB's HUGEINT promotion could diverge.

    Scale shape: one map-side-combinable rollup to (key, day) grain,
    one window pass per key over |days| rows (lag + min), one second
    aggregate to |keys| rows. No corpus-grain window, no join.
    """
    day = F.datediff(
        F.col(ts_col).cast("date"), F.lit("1970-01-01").cast("date")
    ).cast("long")
    daily = (
        df.groupBy(F.col(key_col).alias("key"), day.alias("d"))
        .agg(F.expr(
            f"CAST(sum(CAST({cents_col} AS BIGINT)) DIV {unit_cents}"
            " AS BIGINT)"
        ).alias("y"))
    )
    w = Window.partitionBy("key").orderBy("d")
    w_all = (
        Window.partitionBy("key")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    lagged = daily.select(
        "key", "d", "y",
        F.lag("d").over(w).alias("d_prev"),
        F.lag("y").over(w).alias("y_prev"),
        F.min("y").over(w_all).alias("m"),
    )
    row_guard = (
        f"CASE WHEN y - m >= {_AR1_ROW_MAX}"
        f" OR y_prev - m >= {_AR1_ROW_MAX}"
        " THEN CAST(raise_error('ar1_by_key: recentered daily total"
        " reaches sqrt(2^63) -- raise unit_cents') AS BIGINT)"
        " ELSE 1 END"
    )
    adj = F.expr(
        f"CASE WHEN d_prev IS NOT NULL AND d - d_prev = 1"
        f" THEN {row_guard} ELSE 0 END"
    )
    pairs = lagged.select(
        "key",
        adj.alias("adj"),
        (F.col("y") - F.col("m")).alias("yc"),
        (F.col("y_prev") - F.col("m")).alias("yp"),
    )
    m = pairs.groupBy("key").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("adj").cast("long").alias("n_pairs"),
        F.sum(F.expr("adj * yp")).cast("long").alias("sx"),
        F.sum(F.expr("adj * yc")).cast("long").alias("sy"),
        F.sum(F.expr("adj * yp * yc")).cast("long").alias("sxy"),
        F.sum(F.expr("adj * yp * yp")).cast("long").alias("sxx"),
        F.max(F.expr("adj * greatest(yp, yc)")).cast("long").alias("mx"),
    )
    guard = (
        f"CASE WHEN mx > 0 AND n_pairs * n_pairs >"
        f" {_AR1_GUARD} DIV (mx * mx)"
        " THEN CAST(raise_error('ar1_by_key: n_pairs^2 * mx^2 exceeds"
        " 2^51 -- raise unit_cents') AS BIGINT) ELSE 1 END"
    )
    return m.select(
        F.col("key").alias(key_col),
        "n_days", "n_pairs",
        F.expr(f"{guard} * (n_pairs * sxy - sx * sy)").cast("long")
        .alias("ar1_num"),
        F.expr("n_pairs * sxx - sx * sx").cast("long").alias("ar1_den"),
        F.expr("""
            CASE WHEN n_pairs * sxx - sx * sx <= 0 THEN NULL
                 ELSE sign(n_pairs * sxy - sx * sy)
                      * (abs(n_pairs * sxy - sx * sy) * 1000
                         div (n_pairs * sxx - sx * sx))
            END
        """).cast("long").alias("phi_milli"),
    )


def ar1_by_key_sql(
    table: str,
    key_col: str,
    ts_col: str = "ts",
    cents_expr: str = "cents",
    unit_cents: int = 100,
) -> str:
    """DuckDB twin of :func:`ar1_by_key` (same adjacency rule, same
    recentred moments, same sign-split division and fail-loud
    guards)."""
    return f"""
        WITH daily AS (
            SELECT {key_col} AS key,
                   CAST(date_diff('day', DATE '1970-01-01',
                        CAST({ts_col} AS DATE)) AS BIGINT) AS d,
                   CAST(CAST(SUM(CAST({cents_expr} AS BIGINT))
                        AS BIGINT) // {unit_cents} AS BIGINT) AS y
            FROM ({table})
            GROUP BY 1, 2
        ), lagged AS (
            SELECT key, d, y,
                   LAG(d) OVER (PARTITION BY key ORDER BY d) AS d_prev,
                   LAG(y) OVER (PARTITION BY key ORDER BY d) AS y_prev,
                   MIN(y) OVER (PARTITION BY key) AS m
            FROM daily
        ), pairs AS (
            SELECT key,
                   CASE WHEN d_prev IS NOT NULL AND d - d_prev = 1
                        THEN CASE WHEN y - m >= {_AR1_ROW_MAX}
                                  OR y_prev - m >= {_AR1_ROW_MAX}
                             THEN CAST(error('ar1_by_key: recentered'
                                  ' daily total reaches sqrt(2^63) --'
                                  ' raise unit_cents') AS BIGINT)
                             ELSE 1 END
                        ELSE 0 END AS adj,
                   y - m AS yc, y_prev - m AS yp
            FROM lagged
        ), m AS (
            SELECT key,
                   CAST(COUNT(*) AS BIGINT) AS n_days,
                   CAST(SUM(adj) AS BIGINT) AS n_pairs,
                   CAST(SUM(adj * yp) AS BIGINT) AS sx,
                   CAST(SUM(adj * yc) AS BIGINT) AS sy,
                   CAST(SUM(adj * yp * yc) AS BIGINT) AS sxy,
                   CAST(SUM(adj * yp * yp) AS BIGINT) AS sxx,
                   CAST(MAX(adj * GREATEST(yp, yc)) AS BIGINT) AS mx
            FROM pairs GROUP BY key
        )
        SELECT key AS {key_col}, n_days, n_pairs,
               CAST(CASE WHEN mx > 0 AND n_pairs * n_pairs >
                         {_AR1_GUARD} // (mx * mx)
                    THEN CAST(error('ar1_by_key: n_pairs^2 * mx^2'
                         ' exceeds 2^51 -- raise unit_cents')
                         AS BIGINT)
                    ELSE 1 END
                    * (n_pairs * sxy - sx * sy) AS BIGINT) AS ar1_num,
               CAST(n_pairs * sxx - sx * sx AS BIGINT) AS ar1_den,
               CAST(CASE WHEN n_pairs * sxx - sx * sx <= 0 THEN NULL
                    ELSE CAST(sign(n_pairs * sxy - sx * sy) AS BIGINT)
                         * (abs(n_pairs * sxy - sx * sy) * 1000
                            // (n_pairs * sxx - sx * sx))
               END AS BIGINT) AS phi_milli
        FROM m
    """


# --- day-of-week seasonality (round-12) ----------------------------------------

def weekday_seasonality(
    df: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Day-of-week seasonality profile per key -- the baseline every
    traffic-anomaly monitor needs before it can alarm: a Tuesday dip
    is drift, a Sunday dip is Sunday. Emits, per (key, dow), exact
    event counts, exact value sums (micros), and the seasonality
    index ``1e6 * 7 * n_dow / n_key`` in ppm (1e6 = perfectly flat;
    2e6 = this weekday carries twice its fair share).

    dow convention: Spark ``dayofweek`` (1=Sunday..7), matched in the
    twin by DuckDB ``dayofweek() + 1`` (the date_scalar_functions
    precedent). Values quantize to exact micros via
    ``floor(v * 1e6 + 0.5)`` -- the same double arithmetic in both
    engines, so the BIGINT sums compare exactly; a fail-loud guard on
    (n, max|micros|) refuses before any silently-wrapped sum is read
    (the ar1_by_key discipline). The index uses truncating division
    of non-negative BIGINTs (identical in both engines).

    Scale shape: one projection + one map-combinable aggregate to the
    |keys x 7| relation; the per-key total is a window over that tiny
    relation, never the event grain.
    """
    per = df.filter(
        F.col(type_col).isNotNull() & F.col(ts_col).isNotNull()
    ).select(
        F.col(type_col).alias("event_type"),
        F.dayofweek(F.to_date(ts_col)).cast("int").alias("dow"),
        F.floor(F.col(value_col).cast("double") * 1_000_000 + F.lit(0.5))
        .cast("long").alias("v_micros"),
    )
    agg = per.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("v_micros").cast("long").alias("sum_value_micros"),
        F.max(F.abs(F.col("v_micros"))).cast("long").alias("max_abs"),
    )
    w = Window.partitionBy("event_type")
    tot = F.sum("n_events").over(w).cast("long")
    # overflow refusal from always-safe aggregates: |sum| <= n * max
    # stays in BIGINT iff n <= 2^62 div max (division, so the guard
    # itself cannot wrap); Spark would wrap silently, DuckDB errors
    guard = (
        "CASE WHEN max_abs > 0 AND n_events >"
        " 4611686018427387904 DIV max_abs"
        " THEN CAST(raise_error('weekday_seasonality: value sum"
        " may exceed BIGINT -- bucket values or pre-aggregate"
        " upstream') AS BIGINT) ELSE 1 END"
    )
    return agg.select(
        "event_type", "dow", "n_events",
        (F.expr(guard) * F.col("sum_value_micros"))
        .cast("long").alias("sum_value_micros"),
        tot.alias("n_type_events"),
    ).select(
        "event_type", "dow", "n_events", "sum_value_micros",
        "n_type_events",
        F.expr(
            "CAST(n_events * 7000000 DIV n_type_events AS BIGINT)"
        ).alias("seasonality_idx_ppm"),
    )


def weekday_seasonality_sql(
    table: str,
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> str:
    """DuckDB twin of :func:`weekday_seasonality` (same micros
    quantization, same guard, dayofweek()+1 convention bridge)."""
    return f"""
        WITH per AS (
            SELECT {type_col} AS event_type,
                   CAST(dayofweek(CAST({ts_col} AS DATE)) + 1
                        AS INTEGER) AS dow,
                   CAST(floor(CAST({value_col} AS DOUBLE) * 1000000
                              + 0.5) AS BIGINT) AS v_micros
            FROM {table}
            WHERE {type_col} IS NOT NULL AND {ts_col} IS NOT NULL
        ), agg AS (
            SELECT event_type, dow,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(v_micros) AS BIGINT) AS sum_value_micros,
                   CAST(MAX(abs(v_micros)) AS BIGINT) AS max_abs
            FROM per GROUP BY 1, 2
        ), tot AS (
            SELECT event_type, dow, n_events,
                   CASE WHEN max_abs > 0 AND n_events >
                            4611686018427387904 // max_abs
                        THEN CAST(error('weekday_seasonality: value'
                             || ' sum may exceed BIGINT -- bucket'
                             || ' values or pre-aggregate upstream')
                             AS BIGINT)
                        ELSE 1 END * sum_value_micros
                       AS sum_value_micros,
                   CAST(SUM(n_events) OVER (PARTITION BY event_type)
                        AS BIGINT) AS n_type_events
            FROM agg
        )
        SELECT event_type, dow, n_events,
               CAST(sum_value_micros AS BIGINT) AS sum_value_micros,
               n_type_events,
               CAST(n_events * 7000000 // n_type_events AS BIGINT)
                   AS seasonality_idx_ppm
        FROM tot
    """
