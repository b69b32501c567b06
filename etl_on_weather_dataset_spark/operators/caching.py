"""Central ledger for operator-internal persisted DataFrames.

Operators like ``ngram_jaccard_pairs`` and ``minhash_lsh_pairs``
materialize an index (shingle table, TF features, minhash signatures)
with ``persist()`` because both sides of their self-join scan it --
measured 4-6x wins. But a lazy operator cannot unpersist after "the"
consuming action (it does not know when the caller is done), and LRU
eviction only kicks in under memory pressure while disk blocks linger,
so cached blocks would otherwise accumulate across the many registry
queries one session runs (parity suite, driver, bench).

The fix is a module-level ledger: operators register every persisted
intermediate via :func:`persisted`, and session owners (bench.py
between queries, the pytest parity harness between cases, any user
batch loop) call :func:`release_all` at their natural "query is done"
boundary. One place to audit, one call to clean.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_TRACKED: list[DataFrame] = []


def persisted(
    df: DataFrame,
    level: StorageLevel = StorageLevel.MEMORY_AND_DISK,
) -> DataFrame:
    """persist() + register on the ledger for later release_all()."""
    df = df.persist(level)
    _TRACKED.append(df)
    return df


def untrack(df: DataFrame) -> None:
    """Remove a frame the operator already unpersisted itself (e.g.
    per-round label frames in dedup_components)."""
    try:
        _TRACKED.remove(df)
    except ValueError:
        pass


def release_all(blocking: bool = False) -> int:
    """Unpersist every tracked frame; returns how many were released."""
    n = 0
    while _TRACKED:
        _TRACKED.pop().unpersist(blocking)
        n += 1
    return n
