"""Join operators.

The reference's single join (J1, ETL.py:109-113) is a left equi-join of
a daily aggregate against distinct per-observation triples -- an
intentional fan-out back to observation grain. In Spark this is a plain
`join(on=key, how='left')`; the interesting part is strategy:

- the aggregate side is one row per group -- small -- so we hint
  `broadcast()` when the caller says the build side is dimension-sized;
- otherwise we leave strategy to Catalyst + AQE (shuffle hash / SMJ,
  skew-split at runtime).

Never force a broadcast of an unbounded side: at 100 TB "daily agg"
over decades x stations can exceed driver memory; `auto` trusts AQE's
runtime statistics instead of our guess.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def left_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str] | str,
    broadcast_side: str = "auto",
) -> DataFrame:
    """Left equi-join with optional explicit broadcast of one side.

    broadcast_side: 'auto' (let Catalyst/AQE decide), 'left', 'right'.
    """
    if broadcast_side == "left":
        left = F.broadcast(left)
    elif broadcast_side == "right":
        right = F.broadcast(right)
    on = [on] if isinstance(on, str) else list(on)
    return left.join(right, on=on, how="left")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str,
    right_value_cols: Sequence[str],
    left_id_col: str,
) -> DataFrame:
    """As-of join: for each left row, the latest right row of the same
    key with right.ts <= left.ts (inclusive).

    Spark has no native as-of join; the scalable re-expression is the
    union-and-carry-forward pattern (one shuffle on the key, no range
    explosion -- compare pandas merge_asof, which is single-node):

      1. tag left rows side=1, right rows side=0;
      2. union; window over (key) ordered by (ts, side, tiebreak);
      3. `last(right_value, ignoreNulls)` carries the most recent
         right values forward onto every left row;
      4. keep side=1 rows.

    Ties (equal ts) resolve right-before-left, i.e. 'at or before'.
    State per partition is one row of carried values -- O(1) memory,
    streaming-friendly, and the window sort is the only cost beyond
    the key shuffle. At 100 TB: partition count on the key bounds
    parallelism; no broadcast, no range-bucket blowup.
    """
    lcols = left.columns
    tagged_l = left.select(
        *lcols,
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in right_value_cols],
    )
    tagged_r = right.select(
        *[
            F.col(c) if c in (on, ts_col) else F.lit(None).cast(
                left.schema[c].dataType
            ).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in right_value_cols],
    )
    unioned = tagged_l.unionByName(tagged_r)
    from pyspark.sql import Window

    # Ordering must be a total order on BOTH sides: left rows tiebreak
    # on their id; right rows (null id) tiebreak on their carried
    # values, otherwise duplicate (key, ts) right rows would make the
    # carried value engine-arbitrary (largest value wins, ascending
    # order + last()). Keep in lockstep with the oracle SQL.
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_col).asc(), F.col("__side").asc(),
                 F.col(left_id_col).asc_nulls_first(),
                 *[F.col(f"__r_{c}").asc_nulls_first()
                   for c in right_value_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *lcols,
        "__side",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in right_value_cols
        ],
    )
    return carried.filter(F.col("__side") == 1).drop("__side")


def fanout_join_daily(
    daily_agg: DataFrame,
    observations: DataFrame,
    date_col: str,
    detail_cols: Sequence[str],
) -> DataFrame:
    """J1: daily aggregate <-left join- distinct observation details.

    Reproduces ETL.py:109-113: the right side is the deduplicated
    (date, *detail) projection (P4+D2, ETL.py:110); joining fans each
    daily row out to one row per distinct detail tuple.
    """
    right = observations.select(date_col, *detail_cols).dropDuplicates()
    # Strategy: a left-outer join can only broadcast its non-preserved
    # (right) side, which here is the big observation-grain side -- so
    # no hint. AQE picks a shuffled-hash join building the tiny
    # aggregate side at runtime, which is the plan we want.
    return daily_agg.join(right, on=date_col, how="left")
