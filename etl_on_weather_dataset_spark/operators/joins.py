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
