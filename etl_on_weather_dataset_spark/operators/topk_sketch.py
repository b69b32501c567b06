"""Mergeable heavy-hitters sketch (Misra-Gries / space-saving family).

The sketch trio (HLL distinct, CMS point frequency, quantile
histogram) answers "how many / how often / how spread"; this answers
the remaining daily question at 100 TB: WHICH items dominate -- top
domains, top tokens, top users -- without paying a full groupBy
shuffle over the raw item grain.

Algorithm (Misra-Gries 1982, merge analysis Agarwal et al.,
"Mergeable Summaries", PODS 2012): each Arrow batch is counted
exactly (bounded by the batch size), then COMPRESSED to k counters by
deducting d_b = the (k+1)-th largest count from every kept item and
dropping the rest (every dropped item's count is <= d_b, so the
deduction covers it too). Summing compressed counters across batches
gives, for EVERY item,

    est(item) <= true(item) <= est(item) + sum_b d_b,

and since at least k+1 items reach d_b in a batch of n_b rows,
d_b <= floor(n_b / (k+1)), so the total error bound never exceeds
N/(k+1) REGARDLESS of partitioning: any item with true count >
N/(k+1) is guaranteed present among the candidates. Those inequalities
are partitioning-INVARIANT even though est itself is not -- which is
exactly what the oracle contract hashes (the established
guarantee-flag pattern of the bloom/simhash tiers).

Scale shape: one ``mapInPandas`` pass (Arrow-batched, per-batch state
= one bounded value_counts), then a groupBy over candidate grain only
-- k x n_batches rows, not N -- plus a broadcastable one-row error
total. The raw item grain is never shuffled.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mg_sketch(df: DataFrame, item_col: str, k: int) -> DataFrame:
    """Per-batch Misra-Gries summaries: rows ``(item, est, err)``.

    Item rows carry ``err = 0``; each batch that deducted emits one
    meta row ``(NULL, 0, d_b)``. Summing ``est`` per item and ``err``
    overall reconstructs the merged sketch (see module docstring).
    """
    if k < 1:
        raise ValueError("mg_sketch needs k >= 1")

    def compress(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vc = pdf["item"].dropna().value_counts()
            if len(vc) == 0:
                continue
            if len(vc) > k:
                d = int(vc.iloc[k])
                kept = vc.iloc[:k] - d
                kept = kept[kept > 0]
            else:
                d = 0
                kept = vc
            out = pd.DataFrame({
                "item": kept.index.astype(str),
                "est": kept.to_numpy(dtype="int64"),
            })
            out["err"] = 0
            if d:
                out = pd.concat(
                    [out, pd.DataFrame(
                        {"item": [None], "est": [0], "err": [d]}
                    )],
                    ignore_index=True,
                )
            yield out

    return df.select(
        F.col(item_col).cast("string").alias("item")
    ).mapInPandas(compress, "item string, est long, err long")


def heavy_hitters(df: DataFrame, item_col: str, k: int) -> DataFrame:
    """Merged candidates with the global error bound:
    ``(item, est_lo, err_bound)`` where ``est_lo <= true <= est_lo +
    err_bound`` for candidates and ``true <= err_bound`` for any
    absent item. ``err_bound <= N/(k+1)`` for any partitioning."""
    sk = mg_sketch(df, item_col, k)
    cands = (
        sk.filter(F.col("item").isNotNull())
        .groupBy("item")
        .agg(F.sum("est").cast("long").alias("est_lo"))
    )
    err = sk.agg(
        F.coalesce(F.sum("err"), F.lit(0)).cast("long")
        .alias("err_bound")
    )
    return cands.crossJoin(F.broadcast(err))
