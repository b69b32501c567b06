"""Preference-data construction (RLHF / DPO reward-pair mining).

A preference dataset is built from groups of scored candidate
responses: per prompt group, the best-scored candidate becomes
``chosen`` and the worst becomes ``rejected``, with the score margin
recorded so trainers can weight or filter pairs. The reference has no
such surface (single weather CSV, ETL.py:25-46); this module is part
of the mandated LLM-pipeline extension tier (BASELINE.json).

Scale shape: ONE groupBy aggregate over the candidate relation --
chosen/rejected are struct-ordered MIN/MAX, so the map side combines
to |groups| rows before the exchange and no window ever sees row
grain. Scores follow the repo's exact-integer discipline
(functions/exact.py): ppm/scaled-long comparisons, so Spark and the
DuckDB twin cannot disagree on a margin boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def preference_pairs(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    score_col: str,
    scale: int = 1000,
    min_margin_scaled: int = 0,
) -> DataFrame:
    """Per group: (chosen_id, rejected_id, margin_scaled,
    n_candidates) where chosen is the max-score candidate (tie -> min
    id) and rejected the min-score candidate (tie -> max id), both
    fully deterministic.

    Tie-break directions are deliberately OPPOSITE so a group whose
    candidates all score equally still yields a well-defined
    (min-id, max-id) pair; such zero-margin pairs are then dropped
    whenever ``min_margin_scaled >= 1`` (the normal setting -- a
    preference pair with no preference teaches nothing). Groups with a
    single candidate never emit a pair.

    Aggregation-only (no window): chosen = MAX over the struct
    (score_scaled, -id), rejected = MIN over (score_scaled, -id) --
    struct comparison is lexicographic in both engines, and negating
    the id flips the tie direction exactly where each side needs it.

    Rounding precondition (round-8 advice): score * scale goes
    through F.round / ROUND, and the two engines round HALF-cases
    differently (Spark HALF_UP on the shortest decimal repr; DuckDB
    on the binary double) -- the exact divergence class
    profile_drift_orders documents. Cross-engine determinism at a
    margin boundary therefore holds only when score * scale is
    exactly representable in binary (e.g. scores that are multiples
    of 1/8 with scale a power-of-two multiple, or integer scores).
    The registered query and the property suite restrict inputs to
    eighths for exactly this reason; callers with arbitrary float
    scores should pre-scale to an integer score column instead of
    relying on round parity.
    """
    v = F.round(F.col(score_col) * scale).cast("long")
    neg_id = (-F.col(id_col)).cast("long")
    out = (
        df.select(*group_cols, v.alias("v"), neg_id.alias("nid"))
        .groupBy(*group_cols)
        .agg(
            F.max(F.struct(F.col("v"), F.col("nid"))).alias("mx"),
            F.min(F.struct(F.col("v"), F.col("nid"))).alias("mn"),
            F.count(F.lit(1)).cast("long").alias("n_candidates"),
        )
        .select(
            *group_cols,
            (-F.col("mx.nid")).cast("long").alias("chosen_id"),
            (-F.col("mn.nid")).cast("long").alias("rejected_id"),
            (F.col("mx.v") - F.col("mn.v")).cast("long")
            .alias("margin_scaled"),
            "n_candidates",
        )
        .filter(
            (F.col("n_candidates") >= 2)
            & (F.col("margin_scaled") >= min_margin_scaled)
        )
    )
    return out


def preference_pairs_sql(
    table_sql: str,
    group_cols: list[str],
    id_col: str,
    score_col: str,
    scale: int = 1000,
    min_margin_scaled: int = 0,
    select: str | None = None,
) -> str:
    """DuckDB twin of :func:`preference_pairs` (same struct-ordered
    min/max tie-break via ordered FIRST aggregates)."""
    groups = ", ".join(group_cols)
    sel = select or groups
    return f"""
        SELECT {sel}, chosen_id, rejected_id, margin_scaled,
               n_candidates
        FROM (
            SELECT {groups},
                   FIRST({id_col} ORDER BY v DESC, {id_col} ASC)
                       AS chosen_id,
                   FIRST({id_col} ORDER BY v ASC, {id_col} DESC)
                       AS rejected_id,
                   CAST(MAX(v) - MIN(v) AS BIGINT) AS margin_scaled,
                   CAST(COUNT(*) AS BIGINT) AS n_candidates
            FROM (
                SELECT {groups}, {id_col},
                       CAST(ROUND({score_col} * {scale}) AS BIGINT)
                           AS v
                FROM ({table_sql})
            )
            GROUP BY {groups}
        )
        WHERE n_candidates >= 2
          AND margin_scaled >= {min_margin_scaled}
    """
