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
- ``funnel_counts`` collects each user's (ts, type) pairs into one
  array (single shuffle on user_id, map-side partial), sorts in-row,
  and folds ONCE with a step machine -- the fewest-jobs shape, but
  the per-user array is O(that user's step events), so a whale user
  (hundreds of millions of events) concentrates in one row.
  ``funnel_counts_via_joins`` is the whale-safe twin: n chained
  aggregate+join levels, never materializing a per-user array --
  identical results by construction (both compute the chained
  minima), pick by data shape.
- retention is two aggregates and an equi-join on (user, cohort) --
  all map-side-combinable.

Engine-invariance: timestamps compare exactly, and the strict-
inequality chaining is tie-order independent, so the Spark single-pass
fold and the oracle's chained per-step minima provably compute the
same completion times.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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


def funnel_counts_via_joins(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Whale-safe funnel: the chained minima as n aggregate+join
    levels (the oracle's shape) -- no per-user arrays, so a single
    user with millions of events stays distributed. Output is
    identical to funnel_counts."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    if len(set(steps)) != len(steps):
        raise ValueError("funnel steps must be distinct event types")
    ev = df.select(
        F.col(user_col).alias("u"),
        F.col(ts_col).alias("ts"),
        F.col(type_col).alias("et"),
    )
    levels = [
        ev.filter(F.col("et") == steps[0])
        .groupBy("u")
        .agg(F.min("ts").alias("s"))
    ]
    for step in steps[1:]:
        prev = levels[-1].select("u", F.col("s").alias("prev_s"))
        levels.append(
            ev.filter(F.col("et") == step)
            .join(prev, "u")
            .filter(F.col("ts") > F.col("prev_s"))
            .groupBy("u")
            .agg(F.min("ts").alias("s"))
        )
    counts = [
        lvl.agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(i + 1).alias("step"),
            F.lit(steps[i]).alias("event_type"),
            F.col("n").alias("n_users"),
        )
        for i, lvl in enumerate(levels)
    ]
    out = counts[0]
    for c in counts[1:]:
        out = out.unionAll(c)
    return out


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


def transition_matrix(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    state_col: str = "event_type",
    tiebreak_col: str = "event_id",
    start_state: str | None = "__start__",
) -> DataFrame:
    """First-order Markov transition matrix over per-key event
    sequences: for every consecutive (src -> dst) pair in each key's
    timeline, the transition count and the row-normalized probability
    as ppm (``p_ppm = n * 1e6 div src_total`` -- integer division,
    the repo's engine-exact ratio form).

    ``start_state`` (default ``"__start__"``) adds a virtual source
    for each key's FIRST event, so the matrix doubles as the
    next-event prior from a cold start; pass None to drop it.

    Determinism: ordering ties on ``ts_col`` are broken by
    ``tiebreak_col``, so both engines walk the identical sequence.

    Scale shape: one window pass partitioned by key (single shuffle,
    whale keys cost O(their events) but never an array
    materialization), then a groupBy bounded by |states|^2 rows and a
    window over that constant-size relation for row totals. No UDFs.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    seq = df.select(
        F.lag(state_col).over(w).alias("src_raw"),
        F.col(state_col).alias("dst"),
    )
    if start_state is None:
        seq = seq.filter(F.col("src_raw").isNotNull())
        src = F.col("src_raw")
    else:
        src = F.coalesce(F.col("src_raw"), F.lit(start_state))
    counts = (
        seq.select(src.alias("src"), "dst")
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("n_transitions"))
    )
    totals = Window.partitionBy("src")
    return counts.select(
        "src", "dst", "n_transitions",
        F.sum("n_transitions").over(totals).cast("long")
        .alias("src_total"),
    ).select(
        "src", "dst", "n_transitions", "src_total",
        F.expr("n_transitions * 1000000 div src_total").alias("p_ppm"),
    )


def transition_matrix_sql(
    table: str,
    key_col: str = "user_id",
    ts_col: str = "ts",
    state_col: str = "event_type",
    tiebreak_col: str = "event_id",
    start_state: str | None = "__start__",
) -> str:
    """DuckDB twin of :func:`transition_matrix` (same window + two
    aggregates; BIGINT outputs, integer-division ppm)."""
    if start_state is None:
        src = "src_raw"
        flt = "WHERE src_raw IS NOT NULL"
    else:
        src = f"COALESCE(src_raw, '{start_state}')"
        flt = ""
    return f"""
        WITH seq AS (
            SELECT LAG({state_col}) OVER (
                       PARTITION BY {key_col}
                       ORDER BY {ts_col}, {tiebreak_col}) AS src_raw,
                   {state_col} AS dst
            FROM {table}
        ),
        counts AS (
            SELECT {src} AS src, dst,
                   CAST(COUNT(*) AS BIGINT) AS n_transitions
            FROM seq {flt} GROUP BY 1, 2
        )
        SELECT src, dst, n_transitions,
               CAST(SUM(n_transitions) OVER (PARTITION BY src)
                    AS BIGINT) AS src_total,
               n_transitions * 1000000
                   // CAST(SUM(n_transitions) OVER (PARTITION BY src)
                           AS BIGINT) AS p_ppm
        FROM counts
    """


# --- context-window assembly (session history -> training examples) -----------


def assemble_context_windows(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    tiebreak_col: str = "event_id",
    gap_seconds: int = 1800,
    max_turns: int = 5,
) -> DataFrame:
    """Assemble each key's session history into one training example
    per session: the chronologically-ordered turn sequence, truncated
    to the LAST ``max_turns`` turns (the context-window budget --
    recency-keep, the standard chat-history policy).

    Output per session: ``key, session_start, n_events, n_kept,
    context`` (turns joined with ``' -> '``) and ``context_fp`` (md5)
    so a hash attests the exact assembled sequence, not just counts.

    Determinism: ordering ties on ``ts_col`` break on
    ``tiebreak_col``; sessions cut at ``gap_seconds`` of inactivity
    (same lag+cumsum discipline as ``sessionize_batch``).

    Scale shape: one window pass partitioned by key (the
    sessionization tag), one groupBy(key, session) whose collected
    arrays are bounded by session length -- never a key's whole
    history in one array unless it IS one session. No UDFs.
    """
    from pyspark.sql.window import Window

    base = df.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("ts"),
        F.col(event_col).alias("turn"),
        F.col(tiebreak_col).alias("tb"),
    )
    w = Window.partitionBy("key").orderBy("ts", "tb")
    gap = F.unix_timestamp(F.col("ts")) - F.unix_timestamp(
        F.lag("ts").over(w)
    )
    tagged = base.withColumn(
        "session_id",
        F.sum(
            F.when(
                gap.isNull() | (gap > gap_seconds), F.lit(1)
            ).otherwise(F.lit(0))
        ).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per_session = tagged.groupBy("key", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("ts", "tb", "turn"))),
            lambda s: s.turn,
        ).alias("turns"),
    )
    kept = F.slice(
        F.col("turns"),
        F.greatest(F.lit(1), (F.size("turns") - max_turns + 1)),
        max_turns,
    )
    return per_session.select(
        "key", "session_start", "n_events",
        F.size(kept).cast("long").alias("n_kept"),
        F.array_join(kept, " -> ").alias("context"),
        F.md5(F.array_join(kept, " -> ")).alias("context_fp"),
    )


def assemble_context_windows_sql(
    table: str = "events",
    key_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    tiebreak_col: str = "event_id",
    gap_seconds: int = 1800,
    max_turns: int = 5,
) -> str:
    """DuckDB twin of :func:`assemble_context_windows` (same
    lag+cumsum sessionization, ordered list aggregation, tail
    slice).

    Gap arithmetic uses ``FLOOR(epoch(ts))`` -- DuckDB's bare
    ``epoch()`` keeps fractional seconds while Spark's
    ``unix_timestamp`` drops them, so sub-second timestamps would
    otherwise place session boundaries differently between engines
    (same whole-second discipline as timeseries.py).
    """
    return f"""
        WITH gaps AS (
            SELECT {key_col} AS key, {ts_col} AS ts,
                   {event_col} AS turn, {tiebreak_col} AS tb,
                   CAST(FLOOR(epoch({ts_col})) AS BIGINT)
                   - CAST(FLOOR(epoch(LAG({ts_col}) OVER (
                       PARTITION BY {key_col}
                       ORDER BY {ts_col}, {tiebreak_col}))) AS BIGINT)
                       AS gap
            FROM {table}
        ), tagged AS (
            SELECT key, ts, turn, tb,
                   SUM(CASE WHEN gap IS NULL OR gap > {gap_seconds}
                            THEN 1 ELSE 0 END) OVER (
                       PARTITION BY key ORDER BY ts, tb
                       ROWS UNBOUNDED PRECEDING) AS session_id
            FROM gaps
        ), per_session AS (
            SELECT key, session_id,
                   MIN(ts) AS session_start,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   list(turn ORDER BY ts, tb) AS turns
            FROM tagged GROUP BY key, session_id
        )
        SELECT key, session_start, n_events,
               CAST(len(list_slice(turns,
                   greatest(1, len(turns) - {max_turns} + 1),
                   len(turns))) AS BIGINT) AS n_kept,
               array_to_string(list_slice(turns,
                   greatest(1, len(turns) - {max_turns} + 1),
                   len(turns)), ' -> ') AS context,
               md5(array_to_string(list_slice(turns,
                   greatest(1, len(turns) - {max_turns} + 1),
                   len(turns)), ' -> ')) AS context_fp
        FROM per_session
    """


# --- marketing-style touch attribution ----------------------------------------


def last_touch_attribution(
    df: DataFrame,
    conversion_type: str = "purchase",
    touch_types: tuple[str, ...] = ("view", "click"),
    lookback_seconds: int = 7 * 86400,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    direct_label: str = "direct",
) -> DataFrame:
    """Credit each conversion to the user's LAST touch event strictly
    before it and within ``lookback_seconds`` (last-touch attribution,
    the default model of every web-analytics stack). Conversions with
    no qualifying touch are credited to ``direct_label``.

    Output: one row per channel with ``n_conversions`` (BIGINT),
    ``value_cents`` (conversion value credited, cents BIGINT) and
    ``sum_lag_us`` (total touch-to-conversion latency in micros; NULL
    for the direct bucket).

    Semantics are tie-order independent: "last" means the touch with
    the greatest epoch-micros strictly below the conversion's; two
    touches at the SAME microsecond break to the lexicographically
    greatest channel name (struct max), so the result does not depend
    on physical row order in either engine.

    Scale shape: ONE shuffle, on ``user_col`` -- the attribution is a
    window aggregate (``max(struct(us, channel))`` over a RANGE frame
    ``[us - lookback, us - 1]``), never a touches x conversions join.
    The naive self-join (which the DuckDB oracle runs) is O(touches x
    conversions) per user and dies on whale users; the window pass is
    O(user history) and partitions by user regardless of fan-in. The
    final channel rollup is |channels| rows.
    """
    from pyspark.sql.window import Window

    wanted = [conversion_type, *touch_types]
    base = df.filter(F.col(type_col).isin(wanted)).select(
        F.col(user_col).alias("u"),
        F.unix_micros(F.col(ts_col)).alias("us"),
        F.col(type_col).alias("et"),
        F.round(F.col(value_col) * 100).cast("long").alias("cents"),
    )
    touch = F.when(
        F.col("et").isin(list(touch_types)),
        F.struct(F.col("us").alias("tus"), F.col("et").alias("ch")),
    )
    w = (
        Window.partitionBy("u")
        .orderBy("us")
        .rangeBetween(-lookback_seconds * 1_000_000, -1)
    )
    attributed = (
        base.withColumn("lt", F.max(touch).over(w))
        .filter(F.col("et") == conversion_type)
        .select(
            F.coalesce(F.col("lt.ch"), F.lit(direct_label)).alias(
                "channel"
            ),
            "cents",
            (F.col("us") - F.col("lt.tus")).alias("lag_us"),
        )
    )
    return attributed.groupBy("channel").agg(
        F.count(F.lit(1)).cast("long").alias("n_conversions"),
        F.sum("cents").alias("value_cents"),
        F.sum("lag_us").alias("sum_lag_us"),
    )


def last_touch_attribution_sql(
    table: str = "events",
    conversion_type: str = "purchase",
    touch_types: tuple[str, ...] = ("view", "click"),
    lookback_seconds: int = 7 * 86400,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    direct_label: str = "direct",
    tiebreak_col: str = "event_id",
) -> str:
    """DuckDB twin of :func:`last_touch_attribution` as the naive
    per-user touches-x-conversions join + pick-latest (ROW_NUMBER
    ordered ``us DESC, ch DESC`` = the Spark struct-max tie rule).
    The join form is the oracle precisely BECAUSE it is the shape the
    engine refuses to run at scale -- equal answers attest the
    window rewrite."""
    touches = ", ".join(f"'{t}'" for t in touch_types)
    lb_us = lookback_seconds * 1_000_000
    return f"""
        WITH conv AS (
            SELECT {tiebreak_col} AS cid, {user_col} AS u,
                   epoch_us({ts_col}) AS us,
                   CAST(ROUND({value_col} * 100) AS BIGINT) AS cents
            FROM {table} WHERE {type_col} = '{conversion_type}'
        ), touch AS (
            SELECT {user_col} AS u, epoch_us({ts_col}) AS tus,
                   {type_col} AS ch
            FROM {table} WHERE {type_col} IN ({touches})
        ), ranked AS (
            SELECT c.cid, c.cents, t.ch, c.us - t.tus AS lag_us,
                   ROW_NUMBER() OVER (
                       PARTITION BY c.cid
                       ORDER BY t.tus DESC, t.ch DESC) AS rn
            FROM conv c LEFT JOIN touch t
              ON t.u = c.u AND t.tus >= c.us - {lb_us} AND t.tus < c.us
        )
        SELECT COALESCE(ch, '{direct_label}') AS channel,
               CAST(COUNT(*) AS BIGINT) AS n_conversions,
               CAST(SUM(cents) AS BIGINT) AS value_cents,
               CAST(SUM(lag_us) AS BIGINT) AS sum_lag_us
        FROM ranked WHERE rn = 1
        GROUP BY 1
    """


# --- time-decay (multi-touch) attribution ------------------------------------------

_DAY_US = 86_400 * 1_000_000


def time_decay_attribution(
    df: DataFrame,
    conversion_type: str = "purchase",
    touch_types: tuple[str, ...] = ("view", "click"),
    lookback_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    direct_label: str = "direct",
) -> DataFrame:
    """Multi-touch attribution with exponential time decay: every
    touch in the ``lookback_days`` window before a conversion earns
    credit proportional to ``2^-age_days`` (credit halves per day of
    age -- the standard time-decay model, here with day-granular
    integer weights so the split is EXACT, not float).

    Per conversion, channel ``c``'s share is

        share_ppm(c) = wsum_c * 1e6 div sum_c' wsum_c',
        wsum_c = sum_d 2^(lookback_days - 1 - d) * touches(c, age d)

    -- all BIGINTs, identical in both engines. Conversions with no
    in-window touch land in ``direct_label`` with full 1e6 credit.

    Output per channel: n_touched (conversions where the channel
    earned credit), share_ppm_sum (total ppm credit -- sums to
    ~1e6 * n_conversions across channels, short only truncation
    remainders), value_micro (cents * share_ppm, micro-cent credit).

    Scale shape: ONE shuffle on ``user_col``; the per-conversion
    per-channel weighted touch counts are ``lookback_days`` RANGE
    frames over the user's event stream (day-bucketed ages), so the
    engine never materializes the touches x conversions pair relation
    the DuckDB oracle deliberately runs. |channels| x |days| window
    aggregates share one sort; the rollup is |channels| rows.
    """
    from pyspark.sql.window import Window

    wanted = [conversion_type, *touch_types]
    base = df.filter(F.col(type_col).isin(wanted)).select(
        F.col(user_col).alias("u"),
        F.unix_micros(F.col(ts_col)).alias("us"),
        F.col(type_col).alias("et"),
        F.round(F.col(value_col) * 100).cast("long").alias("cents"),
    )
    win = Window.partitionBy("u").orderBy("us")
    cnt_cols = {}
    for d in range(lookback_days):
        # age-day bucket d = touches with floor((us-tus)/day) == d,
        # strictly before the conversion: tus in
        # (us-(d+1)*day, us-d*day], i.e. offsets [-(d+1)*day+1,
        # -d*day] with the d=0 upper bound capped at -1 (same
        # microsecond excluded). A closed lower bound at
        # -(d+1)*day would claim the exact (d+1)-day-old touch for
        # bucket d while the oracle's floor-division age puts it in
        # bucket d+1 -- and the lookback boundary touch (age ==
        # lookback_days exactly) must be OUT in both engines.
        frame = win.rangeBetween(
            -(d + 1) * _DAY_US + 1,
            -d * _DAY_US if d > 0 else -1,
        )
        for c in touch_types:
            cnt_cols[f"n_{c}_{d}"] = F.sum(
                F.when(F.col("et") == c, F.lit(1)).otherwise(F.lit(0))
            ).over(frame)
    conv = (
        base.select("*", *[v.alias(k) for k, v in cnt_cols.items()])
        .filter(F.col("et") == conversion_type)
    )
    wsums = {
        c: sum(
            (
                F.coalesce(F.col(f"n_{c}_{d}"), F.lit(0))
                * F.lit(1 << (lookback_days - 1 - d))
            )
            for d in range(lookback_days)
        ).cast("long")
        for c in touch_types
    }
    conv = conv.select(
        "cents", *[w.alias(f"w_{c}") for c, w in wsums.items()]
    )
    total = sum(F.col(f"w_{c}") for c in touch_types).cast("long")
    conv = conv.withColumn("w_total", total)
    per_channel = [
        conv.filter(F.col(f"w_{c}") > 0).select(
            F.lit(c).alias("channel"),
            F.expr(f"w_{c} * 1000000 div w_total").alias("share_ppm"),
            "cents",
        )
        for c in touch_types
    ]
    direct = conv.filter(F.col("w_total") == 0).select(
        F.lit(direct_label).alias("channel"),
        F.lit(1_000_000).cast("long").alias("share_ppm"),
        "cents",
    )
    credits = direct
    for p in per_channel:
        credits = credits.unionByName(p)
    return credits.groupBy("channel").agg(
        F.count(F.lit(1)).cast("long").alias("n_touched"),
        F.sum("share_ppm").cast("long").alias("share_ppm_sum"),
        F.sum(F.col("cents") * F.col("share_ppm"))
        .cast("long").alias("value_micro"),
    )


def time_decay_attribution_sql(
    table: str = "events",
    conversion_type: str = "purchase",
    touch_types: tuple[str, ...] = ("view", "click"),
    lookback_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    direct_label: str = "direct",
    tiebreak_col: str = "event_id",
) -> str:
    """DuckDB twin of :func:`time_decay_attribution` as the explicit
    touches-x-conversions pair join with the same day-bucketed
    integer weights -- the shape the engine's window rewrite exists
    to avoid; equal answers attest the rewrite."""
    touches = ", ".join(f"'{t}'" for t in touch_types)
    lb_us = lookback_days * _DAY_US
    return f"""
        WITH conv AS (
            SELECT {tiebreak_col} AS cid, {user_col} AS u,
                   epoch_us({ts_col}) AS us,
                   CAST(ROUND({value_col} * 100) AS BIGINT) AS cents
            FROM {table} WHERE {type_col} = '{conversion_type}'
        ), touch AS (
            SELECT {user_col} AS u, epoch_us({ts_col}) AS tus,
                   {type_col} AS ch
            FROM {table} WHERE {type_col} IN ({touches})
        ), pair AS (
            SELECT c.cid, c.cents, t.ch,
                   CAST(1 AS BIGINT) << ({lookback_days} - 1
                       - CAST((c.us - t.tus) // {_DAY_US} AS BIGINT))
                       AS w
            FROM conv c JOIN touch t
              ON t.u = c.u AND t.tus > c.us - {lb_us}
                 AND t.tus < c.us
        ), per_conv_channel AS (
            SELECT cid, ANY_VALUE(cents) AS cents, ch,
                   CAST(SUM(w) AS BIGINT) AS w_ch
            FROM pair GROUP BY cid, ch
        ), per_conv AS (
            SELECT cid, CAST(SUM(w_ch) AS BIGINT) AS w_total
            FROM per_conv_channel GROUP BY cid
        ), credits AS (
            SELECT pc.ch AS channel,
                   pc.w_ch * 1000000 // t.w_total AS share_ppm,
                   pc.cents
            FROM per_conv_channel pc JOIN per_conv t USING (cid)
            UNION ALL
            SELECT '{direct_label}', CAST(1000000 AS BIGINT), cents
            FROM conv WHERE cid NOT IN (SELECT cid FROM per_conv)
        )
        SELECT channel,
               CAST(COUNT(*) AS BIGINT) AS n_touched,
               CAST(SUM(share_ppm) AS BIGINT) AS share_ppm_sum,
               CAST(SUM(cents * share_ppm) AS BIGINT) AS value_micro
        FROM credits GROUP BY channel
    """


# --- time-to-convert quantiles (round-11) --------------------------------------------

def time_to_convert(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    from_event: str = "view",
    to_event: str = "purchase",
    bucket_seconds: int = 60,
    quantiles: tuple[int, ...] = (50, 90),
) -> DataFrame:
    """Latency distribution of the conversion funnel's money edge:
    per user, seconds from FIRST ``from_event`` to the first
    ``to_event`` AT OR AFTER it, summarized as exact order-statistic
    quantiles -- the "median time to purchase / p90" row every
    funnel dashboard pairs with funnel_counts' completion counts
    (counts say how many convert; this says how long conversion
    takes, and a drifting p90 is an early funnel-health alarm).

    Semantics: >= (not >) on the conversion timestamp -- an atomic
    view+purchase at the same tick counts as an instant conversion,
    matching the at-or-after reading of "converted after seeing".
    Users without a ``from_event`` are out of denominator; users
    with one but no subsequent ``to_event`` count as non-converted.

    Exact-integer discipline: deltas are computed in exact epoch
    MICROsecond BIGINTs (unix_micros / epoch_us -- a seconds cast
    would truncate in Spark but round through a DOUBLE in DuckDB on
    sub-second timestamps) and floored to seconds by integer
    division; quantile
    q_p is the SMALLEST bucketed delta whose cumulative count
    reaches p% of converters (type-1 order statistic, 100*cum >=
    p*n -- no interpolation, no ceil idiom needed); the mean is a
    truncating division of the exact second total. Deltas bucket to
    ``bucket_seconds`` so the quantile relation is VALUE-COUNT
    grain: |distinct buckets| is bounded by the observation window,
    not the user count (minutes by default -- the dashboard unit).

    Scale shape: two map-side-combinable per-user aggregates joined
    on the shuffle key (no row-grain window, no sort at corpus
    grain), then windows over the bounded bucket relation.
    """
    from pyspark.sql.window import Window

    from .text import _ratio_ppm_expr

    first_from = (
        df.filter(F.col(event_col) == from_event)
        .groupBy(F.col(key_col).alias("k"))
        .agg(F.min(F.col(ts_col)).alias("v_ts"))
    )
    conv = (
        df.filter(F.col(event_col) == to_event)
        .select(F.col(key_col).alias("k"), F.col(ts_col).alias("p_ts"))
        .join(first_from, "k")
        .filter(F.col("p_ts") >= F.col("v_ts"))
        .groupBy("k")
        .agg(
            # exact integer MICROseconds in both engines (unix_micros
            # here, epoch_us in the twin): every testdata timestamp
            # carries a sub-second part, and a seconds cast truncates
            # in Spark but rounds through a DOUBLE epoch in DuckDB
            (
                F.unix_micros(F.min("p_ts"))
                - F.unix_micros(F.min("v_ts"))
            ).alias("delta_us")
        )
        .select(F.expr("delta_us DIV 1000000").alias("delta_s"))
    )
    vc = conv.groupBy(
        F.expr(f"delta_s DIV {bucket_seconds}").alias("m")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.sum("delta_s").cast("long").alias("sum_s"),
    )
    w_cum = Window.orderBy("m").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = vc.select(
        "m", "sum_s",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_all).alias("n"),
    )
    qcols = [
        F.min(
            F.when(
                F.expr(f"100 * cum >= {int(p)} * n"), F.col("m")
            )
        ).cast("long").alias(f"p{int(p)}_bucket")
        for p in quantiles
    ]
    agg = cum.agg(
        F.max("n").cast("long").alias("n_converted"),
        F.sum("sum_s").cast("long").alias("total_seconds"),
        *qcols,
    )
    base = first_from.agg(
        F.count(F.lit(1)).cast("long").alias("n_from_users")
    )
    return base.crossJoin(F.broadcast(agg)).select(
        "n_from_users",
        F.coalesce("n_converted", F.lit(0)).cast("long")
        .alias("n_converted"),
        F.expr(_ratio_ppm_expr(
            "COALESCE(n_converted, 0)", "n_from_users",
            "time_to_convert",
        )).cast("long").alias("conversion_ppm"),
        F.expr(
            "CASE WHEN COALESCE(n_converted, 0) = 0 THEN NULL"
            " ELSE total_seconds DIV n_converted END"
        ).cast("long").alias("mean_seconds"),
        *[
            F.col(f"p{int(p)}_bucket").alias(f"p{int(p)}_bucket")
            for p in quantiles
        ],
    )


def time_to_convert_sql(
    table: str,
    key_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    from_event: str = "view",
    to_event: str = "purchase",
    bucket_seconds: int = 60,
    quantiles: tuple[int, ...] = (50, 90),
) -> str:
    """DuckDB twin of :func:`time_to_convert` (same at-or-after rule,
    same type-1 bucketed quantiles, same guarded ratios)."""
    from .text import _ratio_ppm_sql

    qcols = ",\n               ".join(
        f"CAST(MIN(CASE WHEN 100 * cum >= {int(p)} * n THEN m END)"
        f" AS BIGINT) AS p{int(p)}_bucket"
        for p in quantiles
    )
    qnames = ", ".join(f"p{int(p)}_bucket" for p in quantiles)
    return f"""
        WITH first_from AS (
            SELECT {key_col} AS k, MIN({ts_col}) AS v_ts
            FROM {table} WHERE {event_col} = '{from_event}'
            GROUP BY 1
        ), conv AS (
            SELECT k,
                   CAST(delta_us // 1000000 AS BIGINT) AS delta_s
            FROM (
                SELECT e.{key_col} AS k,
                       epoch_us(MIN(e.{ts_col}))
                       - epoch_us(MIN(f.v_ts)) AS delta_us
                FROM {table} e
                JOIN first_from f ON e.{key_col} = f.k
                WHERE e.{event_col} = '{to_event}'
                  AND e.{ts_col} >= f.v_ts
                GROUP BY 1
            )
        ), vc AS (
            SELECT CAST(delta_s // {bucket_seconds} AS BIGINT) AS m,
                   CAST(COUNT(*) AS BIGINT) AS c,
                   CAST(SUM(delta_s) AS BIGINT) AS sum_s
            FROM conv GROUP BY 1
        ), cum AS (
            SELECT m, sum_s,
                   CAST(SUM(c) OVER (ORDER BY m
                        ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS BIGINT) AS cum,
                   CAST(SUM(c) OVER () AS BIGINT) AS n
            FROM vc
        ), agg AS (
            SELECT CAST(MAX(n) AS BIGINT) AS n_converted,
                   CAST(SUM(sum_s) AS BIGINT) AS total_seconds,
               {qcols}
            FROM cum
        ), base AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_from_users
            FROM first_from
        )
        SELECT n_from_users,
               CAST(COALESCE(n_converted, 0) AS BIGINT) AS n_converted,
               {_ratio_ppm_sql(
                   "COALESCE(n_converted, 0)", "n_from_users",
                   "time_to_convert",
               )} AS conversion_ppm,
               CAST(CASE WHEN COALESCE(n_converted, 0) = 0 THEN NULL
                    ELSE total_seconds // n_converted END AS BIGINT)
                   AS mean_seconds,
               {qnames}
        FROM base CROSS JOIN agg
    """


# --- RFM segmentation (round-12) ----------------------------------------------------

def rfm_segments(
    orders: DataFrame,
    cust_col: str = "o_custkey",
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
    n_tiles: int = 5,
    scale: int = 100,
) -> DataFrame:
    """Recency/Frequency/Monetary quintile segmentation -- the
    classic customer-base partition (Hughes 1994) every retention /
    re-engagement pipeline starts from, and the label a curation
    pipeline joins back to weight a customer's interaction data.

    Per customer: recency_days (last order to the table's anchor =
    global max order date), frequency (order count), monetary in
    exact fixed-point units (``FLOOR(x * scale + 0.5)`` per order --
    the benford_digit_audit snap). Each metric is cut into
    ``n_tiles`` quantile tiles with NTILE over a fully tie-broken
    order (metric, then customer key -- both engines implement
    SQL-standard NTILE: earlier buckets take the remainder rows), so
    tile 1 is always the best tile: most recent / most frequent /
    highest spend. Output: one row per occupied (r, f, m) cell with
    customer count and exact total / trunc-div mean monetary units.

    Scale shape: the per-customer rollup is one map-side-combinable
    groupBy over the fact table; the three NTILE windows then run on
    the CUSTOMER-grain relation (dimension-sized -- |customers|, not
    |orders|), and the final cell aggregate shuffles <= n_tiles^3
    rows. The windows are global single-sort by construction
    (quantile tiles need global position); at petabyte customer
    counts the same cuts come from approx percentile bounds instead
    -- that variant is approx_percentile_bound's territory. BIGINT
    headroom: cell sums of money-scale fixed-point units reach 2^63
    only past ~9e16 currency units per cell, orders of magnitude
    above a 100 TB TPC-H total (and ANSI mode raises, never wraps).
    """
    units = F.floor(
        F.col(amount_col).cast("double") * scale + F.lit(0.5)
    ).cast("long")
    anchor = orders.agg(
        F.max(F.to_date(date_col)).alias("anchor_date")
    )
    per_cust = (
        orders.groupBy(F.col(cust_col).alias("cust"))
        .agg(
            F.max(F.to_date(date_col)).alias("last_date"),
            F.count(F.lit(1)).cast("long").alias("frequency"),
            F.sum(units).cast("long").alias("monetary_units"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "cust",
            F.datediff("anchor_date", "last_date")
            .cast("long").alias("recency_days"),
            "frequency", "monetary_units",
        )
    )
    r_w = Window.orderBy(F.col("recency_days").asc(), F.col("cust"))
    f_w = Window.orderBy(F.col("frequency").desc(), F.col("cust"))
    m_w = Window.orderBy(
        F.col("monetary_units").desc(), F.col("cust")
    )
    tiled = per_cust.select(
        "cust", "monetary_units",
        F.ntile(n_tiles).over(r_w).alias("r_tile"),
        F.ntile(n_tiles).over(f_w).alias("f_tile"),
        F.ntile(n_tiles).over(m_w).alias("m_tile"),
    )
    return (
        tiled.groupBy("r_tile", "f_tile", "m_tile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("monetary_units").cast("long")
            .alias("total_units"),
        )
        .select(
            "r_tile", "f_tile", "m_tile", "n_customers",
            "total_units",
            F.expr("total_units div n_customers")
            .cast("long").alias("mean_units"),
        )
    )


def rfm_segments_sql(
    table: str,
    cust_col: str = "o_custkey",
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
    n_tiles: int = 5,
    scale: int = 100,
) -> str:
    """DuckDB twin of :func:`rfm_segments` (same fixed-point snap,
    same anchor, same tie-broken NTILE cuts, same trunc-div mean --
    total_units is non-negative here, so ``//`` == ``div``)."""
    return f"""
        WITH per_cust AS (
            SELECT {cust_col} AS cust,
                   MAX(CAST({date_col} AS DATE)) AS last_date,
                   CAST(COUNT(*) AS BIGINT) AS frequency,
                   CAST(SUM(CAST(FLOOR(
                       CAST({amount_col} AS DOUBLE) * {scale} + 0.5
                   ) AS BIGINT)) AS BIGINT) AS monetary_units
            FROM {table}
            GROUP BY 1
        ), anchor AS (
            SELECT MAX(CAST({date_col} AS DATE)) AS anchor_date
            FROM {table}
        ), tiled AS (
            SELECT cust, monetary_units,
                   NTILE({n_tiles}) OVER (ORDER BY
                       date_diff('day', last_date, anchor_date) ASC,
                       cust) AS r_tile,
                   NTILE({n_tiles}) OVER (ORDER BY
                       frequency DESC, cust) AS f_tile,
                   NTILE({n_tiles}) OVER (ORDER BY
                       monetary_units DESC, cust) AS m_tile
            FROM per_cust, anchor
        )
        SELECT r_tile, f_tile, m_tile,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(monetary_units) AS BIGINT) AS total_units,
               CAST(SUM(monetary_units) // COUNT(*) AS BIGINT)
                   AS mean_units
        FROM tiled
        GROUP BY 1, 2, 3
    """


# --- discrete-time survival: KM hazard table (round-12) ------------------------------

def km_hazard_daily(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    from_event: str = "view",
    to_event: str = "purchase",
) -> DataFrame:
    """Discrete-time Kaplan-Meier hazard table for first-view ->
    first-purchase conversion -- the survival-analysis reading of the
    funnel (Kaplan & Meier 1958): time_to_convert reports quantiles
    over CONVERTERS only; this table carries the right-censored mass
    (users who had not converted by the observation horizon), which
    is what makes retention/conversion curves honest.

    Per user with >= 1 ``from_event``: birth = first view; converters
    get an event at day T = (first at-or-after purchase - birth)
    (exact micros, trunc-div to whole days -- time_to_convert's
    at-or-after rule); everyone else is censored at day
    C = (horizon - birth), horizon = the table's max timestamp. A
    user who converts on their censor day counts as an event
    (standard events-before-censoring tie rule). Output one row per
    occupied day: n_at_risk (users with T or C >= day, by the
    top-down cumulative identity n_t = N - cum(d_s + c_s | s < t)),
    n_events, n_censored, hazard_ppm = n_events * 1e6 div n_at_risk
    (positive operands; n_at_risk >= n_events + n_censored >= 1 on
    every emitted row, so the division never sees zero). The KM
    survival curve is the running product of (1 - hazard); the table
    ships the exact integer ingredients rather than a float product
    (engine-portable; a reader folds it in one pass over |days|).

    Scale shape: ONE map-combinable per-user aggregate over the fact
    table (first view, first qualifying purchase), one broadcast of
    the 1-row horizon, a |users|-row day bucketing, a |days|-row
    count, and the cumulative window over |days| (bounded by the
    calendar, not the data). Nothing row-grain survives the first
    aggregate.
    """
    us = F.unix_micros(F.col(ts_col))
    per_user = (
        events.groupBy(F.col(key_col).alias("k"))
        .agg(
            F.min(
                F.when(F.col(event_col) == from_event, us)
            ).alias("v_us"),
        )
        .filter(F.col("v_us").isNotNull())
    )
    # first purchase AT-OR-AFTER the first view (a purchase before
    # any view does not qualify -- time_to_convert's rule), via a
    # conditional min over the per-user-joined fact rows
    horizon = events.agg(F.max(us).alias("h_us"))
    qual = (
        events.select(
            F.col(key_col).alias("k"), us.alias("e_us"),
            F.col(event_col).alias("ev"),
        )
        .join(per_user.select("k", "v_us"), "k")
        .filter(
            (F.col("ev") == to_event) & (F.col("e_us") >= F.col("v_us"))
        )
        .groupBy("k")
        .agg(F.min("e_us").alias("p_us"))
    )
    DAY_US = 86_400_000_000
    rows = (
        per_user.join(qual, "k", "left")
        .crossJoin(F.broadcast(horizon))
        .select(
            F.when(
                F.col("p_us").isNotNull(),
                F.expr(f"(p_us - v_us) div {DAY_US}"),
            ).otherwise(
                F.expr(f"(h_us - v_us) div {DAY_US}"),
            ).cast("long").alias("day"),
            F.col("p_us").isNotNull().alias("is_event"),
        )
    )
    per_day = rows.groupBy("day").agg(
        F.sum(F.col("is_event").cast("long")).cast("long")
        .alias("n_events"),
        F.sum((~F.col("is_event")).cast("long")).cast("long")
        .alias("n_censored"),
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, -1
    )
    total = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        per_day.withColumn(
            "n_at_risk",
            (
                F.sum(F.col("n_events") + F.col("n_censored")).over(total)
                - F.coalesce(
                    F.sum(F.col("n_events") + F.col("n_censored")).over(w),
                    F.lit(0),
                )
            ).cast("long"),
        )
        .select(
            "day", "n_at_risk", "n_events", "n_censored",
            F.expr("n_events * 1000000 div n_at_risk")
            .cast("long").alias("hazard_ppm"),
        )
    )


def km_hazard_daily_sql(
    table: str,
    key_col: str = "user_id",
    ts_col: str = "ts",
    event_col: str = "event_type",
    from_event: str = "view",
    to_event: str = "purchase",
) -> str:
    """DuckDB twin of :func:`km_hazard_daily` (epoch_us parity, same
    at-or-after rule, same censoring, same cumulative risk set)."""
    return f"""
        WITH per_user AS (
            SELECT {key_col} AS k,
                   MIN(CASE WHEN {event_col} = '{from_event}'
                       THEN epoch_us({ts_col}) END) AS v_us
            FROM {table}
            GROUP BY 1
            HAVING MIN(CASE WHEN {event_col} = '{from_event}'
                       THEN epoch_us({ts_col}) END) IS NOT NULL
        ), horizon AS (
            SELECT MAX(epoch_us({ts_col})) AS h_us FROM {table}
        ), qual AS (
            SELECT e.{key_col} AS k,
                   MIN(epoch_us(e.{ts_col})) AS p_us
            FROM {table} e JOIN per_user u ON e.{key_col} = u.k
            WHERE e.{event_col} = '{to_event}'
              AND epoch_us(e.{ts_col}) >= u.v_us
            GROUP BY 1
        ), rows_ AS (
            SELECT CASE WHEN q.p_us IS NOT NULL
                        THEN (q.p_us - u.v_us) // 86400000000
                        ELSE (h.h_us - u.v_us) // 86400000000
                   END AS day,
                   q.p_us IS NOT NULL AS is_event
            FROM per_user u LEFT JOIN qual q USING (k), horizon h
        ), per_day AS (
            SELECT day,
                   CAST(SUM(CASE WHEN is_event THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_events,
                   CAST(SUM(CASE WHEN is_event THEN 0 ELSE 1 END)
                        AS BIGINT) AS n_censored
            FROM rows_ GROUP BY 1
        )
        SELECT day,
               CAST(SUM(n_events + n_censored) OVER ()
                    - COALESCE(SUM(n_events + n_censored) OVER (
                          ORDER BY day
                          ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0)
                    AS BIGINT) AS n_at_risk,
               n_events, n_censored,
               CAST(n_events * 1000000 // (
                    SUM(n_events + n_censored) OVER ()
                    - COALESCE(SUM(n_events + n_censored) OVER (
                          ORDER BY day
                          ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0))
                    AS BIGINT) AS hazard_ppm
        FROM per_day
    """
