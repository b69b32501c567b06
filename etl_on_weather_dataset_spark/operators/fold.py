"""Bounded-memory exact ordered fold per key (the EWMA scale path).

A non-associative recurrence (e.g. integer EWMA ``e_n = (v_n + e_{n-1})
div 2`` -- truncation defeats re-association) must be folded in event
order. The obvious Spark shape -- ``collect_list`` + ``sort_array`` +
``aggregate`` -- is correct but binds per-task memory to the hottest
key's row count: one whale key on a 100 TB events table OOMs its task
(round-6 verdict, "What's wrong" #1).

This module implements the fold as a sorted-stream pass instead:

1. hash-repartition by key (all rows of a key meet in one partition);
2. ``sortWithinPartitions(key, order)`` -- Spark's external sort
   spills, so the sort itself is bounded;
3. ``mapInPandas`` over the sorted stream: Arrow hands the UDF an
   ITERATOR of bounded batches (``spark.sql.execution.arrow.
   maxRecordsPerBatch``, default 10k rows); the fold carries O(1)
   state -- (current key, count, accumulator) -- across batch
   boundaries and emits one row per key when the key changes.

Per-task memory = one Arrow batch + O(1) carry, independent of any
key's row count. A whale key still folds sequentially in one task
(inherent: the recurrence is a chain), but it can no longer OOM.

The fold callable runs per element in Python -- this is the exact
path for non-associative semantics, not a bulk-analytics hot path;
associative reductions belong in ``groupBy().agg()``.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator, Sequence
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as S

if TYPE_CHECKING:  # pandas only needed executor-side
    import pandas as pd


def ordered_fold_stream(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    fold: Callable[[int, int], int],
    out_col: str = "fold_value",
    count_col: str = "n_events",
) -> DataFrame:
    """Fold ``value_col`` (long) per key in ``order_cols`` order.

    The fold seeds with each key's FIRST value, then applies
    ``fold(acc, v)`` to every subsequent value -- matching DuckDB's
    ``list_reduce(list(v ORDER BY ...), fold)``. Returns one row per
    key: ``(*key_cols, count_col, out_col)``, both longs.

    ``order_cols`` must be a total order within each key (include a
    unique tiebreaker) or the fold result is nondeterministic.
    """
    keys = list(key_cols)
    order = list(order_cols)
    key_fields = [df.schema[k] for k in keys]
    out_schema = S.StructType(
        key_fields
        + [
            S.StructField(count_col, S.LongType(), False),
            S.StructField(out_col, S.LongType(), True),
        ]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        # O(1) carry across Arrow batches: the partition stream is
        # sorted, so exactly one key is ever "open" at a time.
        cur_key: tuple | None = None
        cur_n = 0
        cur_acc = 0
        done_keys: list[tuple] = []
        done_n: list[int] = []
        done_acc: list[int] = []

        def flush() -> "pd.DataFrame":
            out = pd.DataFrame(
                {
                    **{
                        k: [t[i] for t in done_keys]
                        for i, k in enumerate(keys)
                    },
                    count_col: pd.Series(done_n, dtype="int64"),
                    out_col: pd.Series(done_acc, dtype="int64"),
                }
            )
            done_keys.clear()
            done_n.clear()
            done_acc.clear()
            return out

        for pdf in batches:
            key_arrays = [pdf[k].to_numpy() for k in keys]
            values = pdf[value_col].to_numpy()
            for i in range(len(pdf)):
                row_key = tuple(a[i] for a in key_arrays)
                v = int(values[i])
                if row_key == cur_key:
                    cur_acc = fold(cur_acc, v)
                    cur_n += 1
                else:
                    if cur_key is not None:
                        done_keys.append(cur_key)
                        done_n.append(cur_n)
                        done_acc.append(cur_acc)
                    cur_key, cur_n, cur_acc = row_key, 1, v
            if done_keys:
                yield flush()
        if cur_key is not None:
            done_keys.append(cur_key)
            done_n.append(cur_n)
            done_acc.append(cur_acc)
            yield flush()

    ordered = (
        df.select(*keys, *order, value_col)
        .repartition(*[F.col(k) for k in keys])
        .sortWithinPartitions(*keys, *order)
    )
    return ordered.mapInPandas(run, schema=out_schema)
