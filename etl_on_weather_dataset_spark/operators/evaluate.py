"""Model evaluation for training-data pipelines: exact ROC-AUC +
confusion/PR metrics as ONE distributed pass (north-star par.2b —
the eval leg of the in-engine classifier tier, operators/classify.py).

Why in-engine: a curation pipeline that trains or applies quality
classifiers (classify.py) needs to measure them on held-out data at
the same scale the scores were produced — shipping 100 TB of scores
to sklearn is not a plan. ROC-AUC is the Mann–Whitney U statistic,
which is a pure aggregation problem:

    AUC = U / (n_pos * n_neg),
    U   = #{(p, n) pairs: s_p > s_n} + 0.5 * #{s_p = s_n}

Grouping rows by DISTINCT score first collapses the pairwise double
sum to a single cumulative sum over the (much smaller) per-score
relation: with ``pos_s``/``neg_s`` the class counts at score ``s``
and ``neg_below(s)`` the negatives at strictly smaller scores,

    2U = sum_s pos_s * (2 * neg_below(s) + neg_s)

— everything stays in exact BIGINTs (``two_u`` is emitted raw so the
oracle comparison never touches a float; the ppm ratios are integer
``div``). Ties are handled exactly (the ``+ neg_s`` term), not by
perturbation.

Scale shape: one map-side-combinable ``groupBy(score)`` shuffle over
the data, then ONE window cumulative sum over the distinct-score
relation, then a global one-row aggregate. The window is
unpartitioned, but it runs on |distinct scores| rows — for
integer-milli logits that is bounded by the score domain, not the
corpus (millions of rows at worst, one executor's work). For
truly unbounded score domains, pre-bucket scores into the histogram
sketch (operators/histogram.py) and run the same formula over bins —
that is the O(bins) approximate path; this module is the exact one.

The per-score class-count relation is also the report's MERGEABLE
sufficient statistic (counts sum per score), so evaluation joins the
sketch family: :func:`eval_store_ingest` folds scored batches into
the versioned rollup store (exactly-once, replay-safe, time-travel)
and :func:`eval_store_report` reads the full report off the store in
O(distinct scores) — a continuously-updated model dashboard that
never rescans a batch.

Overflow bound: ``two_u <= 2 * n_pos * n_neg`` and ``auc_ppm``
multiplies by 1e6, so exactness holds while
``n_pos * n_neg < 2^63 / 2e6`` (~ 4.6e12 — i.e. a balanced sample of
~4M rows). Beyond that, evaluate per stratum and average, or use the
histogram path; a silent wrap cannot happen under ANSI mode (Spark
errors) and the driver data is far below the bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PPM = 1_000_000


def binary_eval(
    scored: DataFrame,
    label_col: str = "y",
    score_col: str = "score",
    threshold: int = 0,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Exact binary-classifier report from (label, score) rows — one
    row total, or one row per group with ``group_cols`` (per-segment
    model quality: AUC by source, by language, by shard...).

    ``label_col`` is 0/1 int; ``score_col`` an integer score (e.g.
    classify.py's exact ``logit_milli``) — integer scores keep every
    comparison engine-portable. Predicted positive iff
    ``score > threshold``.

    Output (all BIGINT): [group...,] n_pos, n_neg, two_u, auc_ppm,
    tp, fp, fn, tn, precision_ppm, recall_ppm, f1_ppm.
    Zero denominators (no predicted/actual positives, or a
    single-class group) report 0, not an error, so the report row
    always exists.

    Grouped evaluation also fixes the one scale caveat of the global
    report: the cumulative-sum window partitions by group, so no
    single-partition window remains in the plan.
    """
    y = F.col(label_col).cast("long")
    groups = list(group_cols or [])
    per_score = scored.groupBy(
        *groups, F.col(score_col).alias("score")
    ).agg(
        F.sum(y).alias("pos_s"),
        (F.count(F.lit(1)) - F.sum(y)).alias("neg_s"),
    )
    return binary_eval_from_counts(
        per_score, threshold=threshold, group_cols=groups
    )


def binary_eval_from_counts(
    per_score: DataFrame,
    threshold: int = 0,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """The report from a ([group...,] score, pos_s, neg_s) class-count
    relation — binary_eval's sufficient statistic. Exposed separately
    because the relation is MERGEABLE (sum per score), which makes the
    whole evaluation incremental: fold batches into a persistent count
    store (:func:`eval_store_ingest`) and read AUC/confusion off it
    in O(distinct scores), like the HLL/CMS/histogram sketches."""
    groups = list(group_cols or [])
    w = Window.partitionBy(*groups).orderBy("score").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per_score.withColumn(
        "neg_below", F.sum("neg_s").over(w) - F.col("neg_s")
    )
    pred_pos = F.col("score") > F.lit(threshold)
    aggs = [
        F.sum("pos_s").alias("n_pos"),
        F.sum("neg_s").alias("n_neg"),
        F.sum(
            F.col("pos_s")
            * (F.lit(2) * F.col("neg_below") + F.col("neg_s"))
        ).alias("two_u"),
        F.sum(F.when(pred_pos, F.col("pos_s")).otherwise(0)).alias("tp"),
        F.sum(F.when(pred_pos, F.col("neg_s")).otherwise(0)).alias("fp"),
        F.sum(F.when(~pred_pos, F.col("pos_s")).otherwise(0)).alias("fn"),
        F.sum(F.when(~pred_pos, F.col("neg_s")).otherwise(0)).alias("tn"),
    ]
    agg = cum.groupBy(*groups).agg(*aggs) if groups else cum.agg(*aggs)

    def ratio(num_expr: str, den_expr: str) -> F.Column:
        # integer ppm with a zero-denominator guard; operands are
        # non-negative so Spark div == DuckDB // (floor) exactly
        return F.expr(
            f"CASE WHEN {den_expr} = 0 THEN CAST(0 AS BIGINT) "
            f"ELSE ({num_expr}) * {PPM} div ({den_expr}) END"
        )

    return agg.select(
        *groups,
        "n_pos",
        "n_neg",
        "two_u",
        ratio("two_u", "2 * n_pos * n_neg").alias("auc_ppm"),
        "tp",
        "fp",
        "fn",
        "tn",
        ratio("tp", "tp + fp").alias("precision_ppm"),
        ratio("tp", "tp + fn").alias("recall_ppm"),
        ratio("2 * tp", "2 * tp + fp + fn").alias("f1_ppm"),
    )


def eval_store_ingest(
    spark,
    scored_batch: DataFrame,
    store_path: str,
    batch_id: str,
    label_col: str = "y",
    score_col: str = "score",
    keep_versions: int | None = None,
) -> DataFrame:
    """Fold one batch of (label, score) rows into a PERSISTENT
    evaluation store — the incremental twin of :func:`binary_eval`.

    The store is the versioned rollup store keyed on ``score`` with
    the 0/1 label as the value (scale 1): per score, ``n_rows`` is
    the class total and ``sum_c`` the positive count, so the exactly-
    once machinery (marker-last commit, batch replay ledger,
    keep-last-N vacuum, time travel) is inherited verbatim from
    operators/rollup_store.py. Replayed ``batch_id``s are no-ops —
    call from a foreachBatch sink with the namespaced streaming batch
    id for an always-current eval dashboard over an at-least-once
    stream.
    """
    from .rollup_store import incremental_rollup

    batch = scored_batch.select(
        F.col(score_col).alias("score"),
        F.col(label_col).cast("long").alias("__y"),
    )
    return incremental_rollup(
        spark, batch, store_path, batch_id,
        key_cols=["score"], value_col="__y", value_scale=1,
        keep_versions=keep_versions,
    )


def eval_store_report(
    spark,
    store_path: str,
    threshold: int = 0,
    version: int | None = None,
) -> DataFrame:
    """The full binary_eval report straight off the persistent store
    — no rescan of any scored batch, ever: the read is O(distinct
    scores) rows. ``version`` pins a time-travel read ("the model's
    AUC as of batch N")."""
    from .rollup_store import read_rollup

    agg, _, _ = read_rollup(spark, store_path, version=version)
    if agg is None:
        raise ValueError(f"no committed eval store at {store_path}")
    per_score = agg.select(
        "score",
        F.col("sum_c").alias("pos_s"),
        (F.col("n_rows") - F.col("sum_c")).alias("neg_s"),
    )
    return binary_eval_from_counts(per_score, threshold=threshold)


def binary_eval_sql(
    scored_sql: str,
    label_col: str = "y",
    score_col: str = "score",
    threshold: int = 0,
    group_cols: list[str] | None = None,
) -> str:
    """DuckDB twin of :func:`binary_eval` over a ([group...,] label,
    score) subquery. Same distinct-score cumulative-sum formulation;
    every SUM is CAST to BIGINT (DuckDB SUM(BIGINT) promotes to
    HUGEINT, which the driver hash rejects) and the ppm ratios use
    ``//`` on non-negative operands, matching Spark ``div``
    truncation."""
    groups = list(group_cols or [])
    gsel = "".join(f"{g}, " for g in groups)
    gby = ("GROUP BY " + ", ".join(groups)) if groups else ""
    gby_score = "GROUP BY " + ", ".join([*groups, score_col])
    part = ("PARTITION BY " + ", ".join(groups) + " ") if groups else ""
    return f"""
        WITH scored AS ({scored_sql}),
        per_score AS (
            SELECT {gsel}{score_col} AS score,
                   CAST(SUM({label_col}) AS BIGINT) AS pos_s,
                   CAST(COUNT(*) - SUM({label_col}) AS BIGINT) AS neg_s
            FROM scored {gby_score}
        ),
        cum AS (
            SELECT {gsel}score, pos_s, neg_s,
                   CAST(SUM(neg_s) OVER (
                       {part}ORDER BY score
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) - neg_s AS BIGINT) AS neg_below
            FROM per_score
        ),
        agg AS (
            SELECT {gsel}CAST(SUM(pos_s) AS BIGINT) AS n_pos,
                   CAST(SUM(neg_s) AS BIGINT) AS n_neg,
                   CAST(SUM(pos_s * (2 * neg_below + neg_s))
                        AS BIGINT) AS two_u,
                   CAST(SUM(CASE WHEN score > {threshold}
                            THEN pos_s ELSE 0 END) AS BIGINT) AS tp,
                   CAST(SUM(CASE WHEN score > {threshold}
                            THEN neg_s ELSE 0 END) AS BIGINT) AS fp,
                   CAST(SUM(CASE WHEN score <= {threshold}
                            THEN pos_s ELSE 0 END) AS BIGINT) AS fn,
                   CAST(SUM(CASE WHEN score <= {threshold}
                            THEN neg_s ELSE 0 END) AS BIGINT) AS tn
            FROM cum {gby}
        )
        SELECT {gsel}n_pos, n_neg, two_u,
               CASE WHEN n_pos * n_neg = 0 THEN CAST(0 AS BIGINT)
                    ELSE two_u * {PPM} // (2 * n_pos * n_neg)
               END AS auc_ppm,
               tp, fp, fn, tn,
               CASE WHEN tp + fp = 0 THEN CAST(0 AS BIGINT)
                    ELSE tp * {PPM} // (tp + fp) END AS precision_ppm,
               CASE WHEN tp + fn = 0 THEN CAST(0 AS BIGINT)
                    ELSE tp * {PPM} // (tp + fn) END AS recall_ppm,
               CASE WHEN 2 * tp + fp + fn = 0 THEN CAST(0 AS BIGINT)
                    ELSE 2 * tp * {PPM} // (2 * tp + fp + fn)
               END AS f1_ppm
        FROM agg
    """


def calibration_bins(
    scored: DataFrame,
    lo: int,
    hi: int,
    n_bins: int = 10,
    label_col: str = "y",
    score_col: str = "score",
) -> DataFrame:
    """Reliability-diagram data: fixed-width integer score bins over
    [lo, hi) with per-bin size, positive count, exact score sum, and
    the positive rate in ppm — a calibrated model has pos_rate rise
    with the bin. One aggregation pass; fixed-width (not ntile)
    binning because quantile bins over tied scores are order-
    dependent, while ``(score - lo) * n_bins div (hi - lo)`` with a
    clamp is a pure engine-portable integer expression (same recipe
    as the histogram sketch). Output all-BIGINT."""
    span = hi - lo
    bin_expr = (
        f"CAST(least({n_bins - 1}, greatest(0, "
        f"(CAST({score_col} AS BIGINT) - {lo}) * {n_bins} div {span}"
        f")) AS BIGINT)"
    )
    y = F.col(label_col).cast("long")
    return (
        scored.groupBy(F.expr(bin_expr).alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(y).alias("n_pos"),
            F.sum(F.col(score_col).cast("long")).alias("score_sum"),
        )
        .select(
            "bin",
            "n_rows",
            "n_pos",
            "score_sum",
            F.expr(f"n_pos * {PPM} div n_rows").alias("pos_rate_ppm"),
        )
        .orderBy("bin")
    )


def calibration_bins_sql(
    scored_sql: str,
    lo: int,
    hi: int,
    n_bins: int = 10,
    label_col: str = "y",
    score_col: str = "score",
) -> str:
    """DuckDB twin of :func:`calibration_bins` (same clamp-then-bin
    integer expression; ``//`` matches ``div`` on the non-negative
    clamped operand)."""
    span = hi - lo
    bin_expr = (
        f"CAST(least({n_bins - 1}, greatest(0, "
        f"(CAST({score_col} AS BIGINT) - {lo}) * {n_bins} // {span}"
        f")) AS BIGINT)"
    )
    return f"""
        WITH scored AS ({scored_sql}),
        binned AS (
            SELECT {bin_expr} AS bin,
                   COUNT(*) AS n_rows,
                   CAST(SUM({label_col}) AS BIGINT) AS n_pos,
                   CAST(SUM(CAST({score_col} AS BIGINT))
                        AS BIGINT) AS score_sum
            FROM scored GROUP BY 1
        )
        SELECT bin, n_rows, n_pos, score_sum,
               n_pos * {PPM} // n_rows AS pos_rate_ppm
        FROM binned ORDER BY bin
    """


# --- ranking metrics (MRR / NDCG@k) --------------------------------------------
#
# The eval leg of the RETRIEVAL tier (operators/retrieval.py BM25/RRF,
# operators/similarity.py ANN): given per-query ranked candidates with
# binary relevance, score the ranking itself. Exact-integer
# discipline: the per-rank discount 1/log2(r+1) is snapped to
# MICRO-units at codegen time (python round() bakes LITERALS into the
# plan -- no libm crosses an engine boundary at runtime), so DCG sums,
# MRR reciprocals and every ratio are BIGINT arithmetic that two
# engines cannot disagree on.


def _dcg_weights_micro(k: int) -> list[int]:
    """round(1e6 / log2(r+1)) for r = 1..k -- plan-time constants."""
    import math

    return [round(PPM / math.log2(r + 1)) for r in range(1, k + 1)]


def _weight_case(k: int, rank_sql: str) -> str:
    """Shared-dialect CASE mapping rank -> micro discount weight."""
    whens = " ".join(
        f"WHEN {r} THEN {w}"
        for r, w in enumerate(_dcg_weights_micro(k), start=1)
    )
    return f"(CASE {rank_sql} {whens} ELSE 0 END)"


def _idcg_case(k: int, m_sql: str) -> str:
    """Shared-dialect CASE mapping #relevant (capped at k) -> ideal
    DCG in micro-units (prefix sums of the weight table)."""
    acc, whens = 0, []
    for r, w in enumerate(_dcg_weights_micro(k), start=1):
        acc += w
        whens.append(f"WHEN {r} THEN {acc}")
    return f"(CASE {m_sql} {' '.join(whens)} ELSE 0 END)"


def ranking_metrics(
    ranked: DataFrame,
    query_col: str = "query_id",
    rank_col: str = "rk",
    rel_col: str = "rel",
    k: int = 10,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """One-row ranking report over per-query ranked candidates.

    Input: one row per (query, candidate) with a 1-based ``rank_col``
    and binary ``rel_col``. Candidates ranked beyond ``k`` are
    ignored (the serving cutoff). Denominator convention:
    ``n_queries`` counts only queries with >= 1 candidate IN the top
    k -- a query whose candidates all rank beyond k drops out of the
    relation (and the means) entirely, rather than contributing a
    zero row. Callers scoring every ISSUED query must left-join their
    query universe in first (a zero-contribution row per missing
    query); the metrics here are over served-within-cutoff queries.
    Output columns (all exact ints):

    - ``n_queries``, ``n_with_rel`` (queries with >= 1 relevant in
      the top k);
    - ``hits_at_1`` (first candidate relevant);
    - ``mrr_ppm``: mean reciprocal rank of the first relevant
      candidate, micro-scaled then integer-div by n_queries;
    - ``mean_ndcg_ppm``: per-query NDCG@k (micro DCG over the snapped
      discount table, ideal DCG from the prefix-sum CASE over
      min(#relevant, k)), ppm-scaled, integer-div by n_queries.

    ``group_cols`` (columns of ``ranked``, constant per query)
    produce one report row per segment instead of one global row --
    per-lang/source retrieval quality, the grouped-AUC discipline.

    Scale shape: one filter + one groupBy(query) with map-side
    combine + one global one-row aggregate; the discount tables are
    plan constants. Queries with zero relevant candidates contribute
    0 to both means (the standard convention), keeping the means
    comparable across corpora with different label coverage.
    """
    groups = list(group_cols or [])
    topk = ranked.filter(F.col(rank_col) <= k).select(
        *groups,
        F.col(query_col).alias("q"),
        F.col(rank_col).cast("long").alias("rk"),
        F.col(rel_col).cast("long").alias("rel"),
    )
    per_q = topk.groupBy(*groups, "q").agg(
        F.sum(F.expr(_weight_case(k, "rk")) * F.col("rel"))
        .cast("long").alias("dcg_micro"),
        F.least(F.sum("rel"), F.lit(k)).cast("long").alias("m"),
        F.min(F.when(F.col("rel") == 1, F.col("rk"))).alias("first_rel"),
    ).select(
        *groups,
        "dcg_micro",
        F.expr(_idcg_case(k, "m")).cast("long").alias("idcg_micro"),
        F.coalesce(
            F.expr(f"{PPM} div first_rel"), F.lit(0)
        ).cast("long").alias("rr_micro"),
        (F.col("first_rel") == 1).cast("long").alias("hit1"),
    )
    agg_target = per_q.groupBy(*groups) if groups else per_q
    return agg_target.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.sum((F.col("idcg_micro") > 0).cast("long")).cast("long")
        .alias("n_with_rel"),
        F.coalesce(F.sum("hit1"), F.lit(0)).cast("long")
        .alias("hits_at_1"),
        F.expr(f"coalesce(sum(rr_micro), 0) div count(1)")
        .cast("long").alias("mrr_ppm"),
        F.expr(
            f"coalesce(sum(CASE WHEN idcg_micro > 0 THEN "
            f"dcg_micro * {PPM} div idcg_micro ELSE 0 END), 0) "
            f"div count(1)"
        ).cast("long").alias("mean_ndcg_ppm"),
    )


def ranking_metrics_sql(
    ranked_sql: str,
    query_col: str = "query_id",
    rank_col: str = "rk",
    rel_col: str = "rel",
    k: int = 10,
    group_cols: list[str] | None = None,
) -> str:
    """DuckDB twin of :func:`ranking_metrics` (identical literal
    discount tables; every SUM cast to BIGINT -- DuckDB SUM(BIGINT)
    promotes to HUGEINT, which the driver hash rejects)."""
    groups = list(group_cols or [])
    g = "".join(f"{c}, " for c in groups)
    final_group = f"GROUP BY {', '.join(groups)}" if groups else ""
    return f"""
        WITH topk AS (
            SELECT {g}{query_col} AS q,
                   CAST({rank_col} AS BIGINT) AS rk,
                   CAST({rel_col} AS BIGINT) AS rel
            FROM ({ranked_sql})
            WHERE {rank_col} <= {k}
        ), per_q AS (
            SELECT {g}q,
                   CAST(SUM({_weight_case(k, 'rk')} * rel) AS BIGINT)
                       AS dcg_micro,
                   CAST(LEAST(SUM(rel), {k}) AS BIGINT) AS m,
                   MIN(CASE WHEN rel = 1 THEN rk END) AS first_rel
            FROM topk GROUP BY {g}q
        ), scored AS (
            SELECT {g}dcg_micro,
                   CAST({_idcg_case(k, 'm')} AS BIGINT) AS idcg_micro,
                   CAST(COALESCE({PPM} // first_rel, 0) AS BIGINT)
                       AS rr_micro,
                   CASE WHEN first_rel = 1 THEN 1 ELSE 0 END AS hit1
            FROM per_q
        )
        SELECT {g}CAST(COUNT(*) AS BIGINT) AS n_queries,
               CAST(SUM(CASE WHEN idcg_micro > 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_with_rel,
               CAST(COALESCE(SUM(hit1), 0) AS BIGINT) AS hits_at_1,
               CAST(COALESCE(SUM(rr_micro), 0) AS BIGINT)
                   // COUNT(*) AS mrr_ppm,
               CAST(COALESCE(SUM(CASE WHEN idcg_micro > 0 THEN
                        dcg_micro * {PPM} // idcg_micro
                        ELSE 0 END), 0) AS BIGINT)
                   // COUNT(*) AS mean_ndcg_ppm
        FROM scored
        {final_group}
    """


# --- Wilson score intervals (rate + CI, engine-exact) ---------------------------
#
# The Wilson interval is the standard "is this rate real or noise"
# bound for segment metrics (conversion rates, defect rates, filter
# pass rates). It is also one of the few CI formulas an exactness
# discipline can ship bit-identically: every operation in it
# (+ - * / sqrt) is IEEE-755 correctly rounded, so with ONE fixed op
# order the doubles agree across engines before the final micro
# ROUND -- no libm residual at all (unlike normal-quantile or
# t-based intervals, which need erf/ln).


def wilson_bounds_sql(s_sql: str, n_sql: str, z: float = 1.959964) -> tuple[str, str]:
    """(lower, upper) Wilson-bound expressions in ppm BIGINTs --
    SHARED dialect (valid in Spark SQL and DuckDB verbatim), one
    fixed op order. ``s_sql``/``n_sql`` are integer success/total
    expressions; n must be > 0 where evaluated."""
    p = f"(CAST({s_sql} AS DOUBLE) / CAST({n_sql} AS DOUBLE))"
    nn = f"CAST({n_sql} AS DOUBLE)"
    z2 = repr(z * z)
    zl = repr(z)
    denom = f"(1.0 + {z2} / {nn})"
    center = f"(({p} + {z2} / (2.0 * {nn})) / {denom})"
    margin = (
        f"(({zl} / {denom}) * sqrt({p} * (1.0 - {p}) / {nn}"
        f" + {z2} / (4.0 * {nn} * {nn})))"
    )
    lo = f"CAST(ROUND(greatest(0.0, {center} - {margin}) * 1000000) AS BIGINT)"
    hi = f"CAST(ROUND(least(1.0, {center} + {margin}) * 1000000) AS BIGINT)"
    return lo, hi


def rate_with_wilson(
    df: DataFrame,
    success_col: str,
    group_cols: list[str],
    z: float = 1.959964,
) -> DataFrame:
    """Per-group success rate with its Wilson CI: ``n, successes,
    rate_ppm, ci_lo_ppm, ci_hi_ppm`` -- one map-combinable aggregate,
    then per-row arithmetic on the (bounded) group relation."""
    lo, hi = wilson_bounds_sql("successes", "n", z)
    return (
        df.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col(success_col).cast("long")).cast("long")
            .alias("successes"),
        )
        .select(
            *group_cols, "n", "successes",
            F.expr("successes * 1000000 div n").cast("long")
            .alias("rate_ppm"),
            F.expr(lo).alias("ci_lo_ppm"),
            F.expr(hi).alias("ci_hi_ppm"),
        )
    )


def rate_with_wilson_sql(
    table_sql: str,
    success_sql: str,
    group_cols: list[str],
    z: float = 1.959964,
) -> str:
    """DuckDB twin of :func:`rate_with_wilson` (the bound expressions
    are byte-shared with the Spark side)."""
    lo, hi = wilson_bounds_sql("successes", "n", z)
    g = ", ".join(group_cols)
    return f"""
        WITH counts AS (
            SELECT {g},
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST({success_sql} AS BIGINT)) AS BIGINT)
                       AS successes
            FROM ({table_sql}) GROUP BY {g}
        )
        SELECT {g}, n, successes,
               successes * 1000000 // n AS rate_ppm,
               {lo} AS ci_lo_ppm,
               {hi} AS ci_hi_ppm
        FROM counts
    """


# --- two-sample Kolmogorov-Smirnov (exact, integer surface) ---------------------


def ks_two_sample(
    df: DataFrame,
    value_col: str,
    side_col: str,
    side_a,
    side_b,
    scale: int = 100,
) -> DataFrame:
    """Exact two-sample KS statistic between two slices of one
    relation: D = max over the pooled distinct values of
    |ECDF_a - ECDF_b| -- THE distribution-drift test between two
    sources/periods when a binned PSI/KL is too coarse.

    Exactness: values snap to ``scale``-scaled BIGINTs on entry, the
    per-value class counts come from ONE conditional aggregate, and
    the ECDFs are integer ppm (``cum * 1e6 div n``), so D and its
    arg-value are engine-exact. The only window runs over the
    DISTINCT-value relation (the binary_eval discipline: bounded by
    the value domain, not the row count).

    Output (one row): ``n_a, n_b, ks_ppm, at_value_scaled`` (the
    smallest snapped value attaining the max -- deterministic
    tie-break).
    """
    v = F.round(F.col(value_col) * scale).cast("long").alias("v")
    is_a = (F.col(side_col) == side_a).cast("long")
    is_b = (F.col(side_col) == side_b).cast("long")
    per_v = (
        df.select(v, is_a.alias("a"), is_b.alias("b"))
        .filter((F.col("a") + F.col("b")) > 0)
        .groupBy("v")
        .agg(F.sum("a").alias("ca"), F.sum("b").alias("cb"))
    )
    return ks_from_counts(per_v)


def ks_from_counts(per_v: DataFrame) -> DataFrame:
    """The KS report from a (v, ca, cb) per-value count relation --
    the statistic's MERGEABLE sufficient form (counts sum per value),
    which is what lets :func:`ks_between_versions` compare two store
    snapshots without any raw rows."""
    totals = per_v.agg(
        F.sum("ca").cast("long").alias("n_a"),
        F.sum("cb").cast("long").alias("n_b"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    ecdf = (
        per_v.crossJoin(F.broadcast(totals))
        .select(
            "v", "n_a", "n_b",
            F.sum("ca").over(w).alias("cum_a"),
            F.sum("cb").over(w).alias("cum_b"),
        )
        .select(
            "v", "n_a", "n_b",
            # guard BEFORE the division: under ANSI mode an empty
            # side would otherwise surface as a generic
            # DIVIDE_BY_ZERO; with ANSI off, as a silent NULL report
            F.when(
                (F.col("n_a") > 0) & (F.col("n_b") > 0),
                F.abs(
                    F.expr("cum_a * 1000000 div n_a")
                    - F.expr("cum_b * 1000000 div n_b")
                ),
            ).otherwise(
                F.expr(
                    "raise_error('ks_from_counts: empty sample side"
                    " (n_a or n_b = 0) -- KS distance is undefined')"
                ).cast("long")
            ).cast("long").alias("d_ppm"),
        )
    )
    report = (
        ecdf
        .withColumn(
            "mx",
            F.max("d_ppm").over(
                Window.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ),
        )
        .agg(
            F.min("n_a").cast("long").alias("n_a"),
            F.min("n_b").cast("long").alias("n_b"),
            F.max("d_ppm").cast("long").alias("ks_ppm"),
            F.min(F.when(F.col("d_ppm") == F.col("mx"), F.col("v")))
            .cast("long").alias("at_value_scaled"),
        )
    )
    # Degenerate input fails LOUDLY (r6 advice): an empty side makes
    # every cum/total division NULL, which would silently report NULL
    # ks_ppm as if it were a finding. n_a IS NULL covers the
    # both-sides-empty relation (agg over zero rows).
    ok = (
        F.col("n_a").isNotNull() & (F.col("n_a") > 0)
        & F.col("n_b").isNotNull() & (F.col("n_b") > 0)
    )
    err = F.expr(
        "raise_error('ks_from_counts: empty sample side"
        " (n_a or n_b = 0) -- KS distance is undefined')"
    ).cast("long")
    return report.select(
        "n_a", "n_b",
        F.when(ok, F.col("ks_ppm")).otherwise(err).alias("ks_ppm"),
        "at_value_scaled",
    )


def ks_two_sample_sql(
    table_sql: str,
    value_col: str,
    side_col: str,
    side_a,
    side_b,
    scale: int = 100,
) -> str:
    """DuckDB twin of :func:`ks_two_sample`."""
    qa = f"'{side_a}'" if isinstance(side_a, str) else repr(side_a)
    qb = f"'{side_b}'" if isinstance(side_b, str) else repr(side_b)
    return f"""
        WITH per_v AS (
            SELECT CAST(ROUND({value_col} * {scale}) AS BIGINT) AS v,
                   CAST(SUM(CASE WHEN {side_col} = {qa}
                            THEN 1 ELSE 0 END) AS BIGINT) AS ca,
                   CAST(SUM(CASE WHEN {side_col} = {qb}
                            THEN 1 ELSE 0 END) AS BIGINT) AS cb
            FROM ({table_sql})
            WHERE {side_col} IN ({qa}, {qb})
            GROUP BY 1
        ), totals AS (
            SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
                   CAST(SUM(cb) AS BIGINT) AS n_b
            FROM per_v
        ), ecdf AS (
            SELECT v, n_a, n_b,
                   abs(CAST(SUM(ca) OVER (ORDER BY v
                           ROWS UNBOUNDED PRECEDING) AS BIGINT)
                       * 1000000 // n_a
                     - CAST(SUM(cb) OVER (ORDER BY v
                           ROWS UNBOUNDED PRECEDING) AS BIGINT)
                       * 1000000 // n_b) AS d_ppm
            FROM per_v CROSS JOIN totals
        )
        SELECT CAST(MIN(n_a) AS BIGINT) AS n_a,
               CAST(MIN(n_b) AS BIGINT) AS n_b,
               CAST(MAX(d_ppm) AS BIGINT) AS ks_ppm,
               CAST(MIN(CASE WHEN d_ppm = (SELECT MAX(d_ppm) FROM ecdf)
                        THEN v END) AS BIGINT) AS at_value_scaled
        FROM ecdf
    """


def ks_store_ingest(
    spark,
    df: DataFrame,
    store_path: str,
    batch_id: str,
    value_col: str,
    scale: int = 100,
    keep_versions: int | None = None,
) -> DataFrame:
    """Fold one batch's snapped-value counts into a persistent
    distribution store (the rollup store keyed on the scaled value)
    -- per-value counts are KS's mergeable sufficient statistic, so
    distribution monitoring joins the store family: exactly-once
    replay ledger, vacuum, time travel."""
    from .rollup_store import incremental_rollup

    batch = df.select(
        F.round(F.col(value_col) * scale).cast("long").alias("v"),
        F.lit(1).alias("__one"),
    )
    return incremental_rollup(
        spark, batch, store_path, batch_id,
        key_cols=["v"], value_col="__one", value_scale=1,
        keep_versions=keep_versions,
    )


def ks_between_versions(
    spark,
    store_path: str,
    version_a: int,
    version_b: int | None = None,
) -> DataFrame:
    """Exact KS distance between the distribution AS OF ``version_a``
    and as of ``version_b`` (default: current) -- "has the corpus's
    value distribution drifted since snapshot N", computed entirely
    from the store's per-value counts (no ingested batch is ever
    rescanned). Output matches :func:`ks_two_sample`:
    ``n_a, n_b, ks_ppm, at_value_scaled``."""
    from .rollup_store import read_rollup

    agg_a, _, _ = read_rollup(spark, store_path, version=version_a)
    agg_b, _, _ = read_rollup(spark, store_path, version=version_b)
    if agg_a is None or agg_b is None:
        raise ValueError(f"no committed version at {store_path}")
    a = agg_a.select("v", F.col("n_rows").alias("ca"))
    b = agg_b.select("v", F.col("n_rows").alias("cb"))
    per_v = (
        a.join(b, "v", "full_outer")
        .select(
            "v",
            F.coalesce("ca", F.lit(0)).cast("long").alias("ca"),
            F.coalesce("cb", F.lit(0)).cast("long").alias("cb"),
        )
    )
    return ks_from_counts(per_v)


# Cumulative Poisson(1) thresholds, ppm-scaled plan constants: a
# uniform md5 draw u in [0, 1e6) maps to the bootstrap weight k via
# the inverse CDF. Shared literals in both dialects -- nothing to
# disagree on.
_POIS1_CUM_PPM: tuple[int, ...] = (
    367879, 735759, 919699, 981012, 996340, 999406, 999917,
)


def _poisson_weight_case(u_sql: str) -> str:
    whens = " ".join(
        f"WHEN {u_sql} < {t} THEN {k}"
        for k, t in enumerate(_POIS1_CUM_PPM)
    )
    return f"(CASE {whens} ELSE {len(_POIS1_CUM_PPM)} END)"


def bootstrap_mean_ci(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    id_col: str,
    n_boot: int = 200,
    scale: int = 100,
    lo_q: float = 0.025,
    hi_q: float = 0.975,
    salt: str = "boot",
) -> DataFrame:
    """Per-group mean with a percentile-bootstrap CI -- error bars for
    any sliced metric, fully deterministic and engine-portable.

    Classic bootstrap resampling-with-replacement cannot be expressed
    as a row-local operation; the distributed-standard substitute is
    the POISSON bootstrap (each row enters resample b with weight ~
    Poisson(1)). Weights here are exact integers: u = md5-bucket of
    (id, b) in [0, 1e6) -> inverse-CDF CASE over ppm-scaled Poisson(1)
    cumulative constants. Per (group, resample): mean_scaled =
    sum(w * v_c) * scale div sum(w) -- integer div, no IEEE anywhere.
    The CI is the exact [lo_q, hi_q] ORDER STATISTIC over the n_boot
    resample means (ranks ceil(q * B) on the ascending sort, computed
    over non-degenerate resamples only; a resample with total weight
    0 is dropped -- probability e^-n per group, real only for tiny
    groups).

    Scale: the explode(sequence(0, B-1)) is compute-only fan-out --
    map-side partial aggregation collapses it to |groups| x B cells
    before the exchange, and the final per-group array holds B longs.

    Output: (group..., n_rows, mean_e, ci_lo_e, ci_hi_e, n_boot_used)
    where *_e are value * scale^2 integers (v_c carries one factor of
    ``scale``, the mean div another).
    """
    keys = list(group_cols)
    v_c = F.round(F.col(value_col) * scale).cast("long")
    b_df = df.select(
        *keys,
        F.col(id_col).cast("string").alias("_id"),
        v_c.alias("v_c"),
    ).select(
        *keys, "_id", "v_c",
        F.explode(F.sequence(F.lit(0), F.lit(n_boot - 1))).alias("b"),
    )
    u = F.expr(
        "CAST(conv(substring(md5(concat(_id, '#', CAST(b AS STRING),"
        f" '{salt}')), 1, 8), 16, 10) AS BIGINT) % 1000000"
    )
    w = F.expr(_poisson_weight_case("_u"))
    cells = (
        b_df.withColumn("_u", u)
        .withColumn("w", w)
        .groupBy(*keys, "b")
        .agg(
            F.sum("w").cast("long").alias("n_eff"),
            F.sum(F.col("w") * F.col("v_c")).cast("long").alias("s"),
        )
        .filter(F.col("n_eff") > 0)
        .select(
            *keys,
            F.expr(f"s * {scale} div n_eff").cast("long").alias("m"),
        )
    )
    point = df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.expr(
            f"CAST(sum(CAST(ROUND({value_col} * {scale}) AS BIGINT))"
            f" * {scale} div count(1) AS BIGINT)"
        ).alias("mean_e"),
    )
    ci = cells.groupBy(*keys).agg(
        F.sort_array(F.collect_list("m")).alias("arr"),
    ).select(
        *keys,
        F.element_at(
            "arr",
            F.expr(f"CAST(ceil({lo_q} * size(arr)) AS INT)"),
        ).cast("long").alias("ci_lo_e"),
        F.element_at(
            "arr",
            F.expr(f"CAST(ceil({hi_q} * size(arr)) AS INT)"),
        ).cast("long").alias("ci_hi_e"),
        F.size("arr").cast("long").alias("n_boot_used"),
    )
    return point.join(ci, keys).select(
        *keys, "n_rows", "mean_e", "ci_lo_e", "ci_hi_e", "n_boot_used"
    )


def bootstrap_mean_ci_sql(
    table_sql: str,
    group_cols: list[str],
    value_col: str,
    id_col: str,
    n_boot: int = 200,
    scale: int = 100,
    lo_q: float = 0.025,
    hi_q: float = 0.975,
    salt: str = "boot",
) -> str:
    """DuckDB twin of :func:`bootstrap_mean_ci` (same md5 draw, same
    ppm thresholds, same order-statistic ranks)."""
    keys = ", ".join(group_cols)
    u = (
        "CAST(('0x' || substr(md5(CAST(_id AS VARCHAR) || '#' ||"
        f" CAST(b AS VARCHAR) || '{salt}'), 1, 8)) AS UBIGINT)"
        " % 1000000"
    )
    wcase = _poisson_weight_case("_u")
    return f"""
        WITH base AS (
            SELECT {keys}, CAST({id_col} AS VARCHAR) AS _id,
                   CAST(ROUND({value_col} * {scale}) AS BIGINT) AS v_c
            FROM ({table_sql})
        ), fan AS (
            SELECT base.*, t.b, {u} AS _u
            FROM base CROSS JOIN (
                SELECT unnest(range(0, {n_boot})) AS b) t
        ), cells AS (
            SELECT {keys}, b,
                   CAST(SUM({wcase}) AS BIGINT) AS n_eff,
                   CAST(SUM({wcase} * v_c) AS BIGINT) AS s
            FROM fan GROUP BY {keys}, b
        ), means AS (
            SELECT {keys}, s * {scale} // n_eff AS m
            FROM cells WHERE n_eff > 0
        ), ci AS (
            SELECT {keys},
                   (list_sort(list(m)))[
                       CAST(ceil({lo_q} * COUNT(*)) AS INT)]
                       AS ci_lo_e,
                   (list_sort(list(m)))[
                       CAST(ceil({hi_q} * COUNT(*)) AS INT)]
                       AS ci_hi_e,
                   CAST(COUNT(*) AS BIGINT) AS n_boot_used
            FROM means GROUP BY {keys}
        ), point AS (
            SELECT {keys},
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM(CAST(ROUND({value_col} * {scale}) AS BIGINT))
                        * {scale} // COUNT(*) AS BIGINT) AS mean_e
            FROM ({table_sql}) GROUP BY {keys}
        )
        SELECT p.*, c.ci_lo_e, c.ci_hi_e, c.n_boot_used
        FROM point p JOIN ci c USING ({keys})
    """


# --- isotonic calibration (pool adjacent violators) ------------------------------


def isotonic_fit(
    bins: DataFrame,
    n_bins: int,
    bin_col: str = "bin",
    n_col: str = "n_rows",
    pos_col: str = "n_pos",
) -> DataFrame:
    """Isotonic (monotone non-decreasing) calibration of binned
    positive rates by pool-adjacent-violators (PAV -- Ayer et al.
    1955; the fit behind sklearn's IsotonicRegression and the
    standard probability-calibration step after Platt scaling fell
    out of favor). Consumes :func:`calibration_bins` output.

    Exact-integer discipline: pools carry (n, s) count sums and the
    violation test compares pool MEANS by cross-multiplication
    (``s_top * n_prev < s_prev * n_top``) -- no division until the
    final ppm rate, so the merge sequence is bit-identical in both
    engines. Equal means do NOT merge (the fitted step function is
    identical either way; keeping the boundary makes the pool list
    deterministic).

    Output: one row per pool -- ``pool`` (1-based index),
    ``bin_lo``/``bin_hi`` (inclusive bin range), ``n_rows``,
    ``n_pos``, ``iso_ppm`` (the calibrated monotone rate). Empty
    input bins simply don't exist (absent bins are not zero-rate
    evidence).

    Scale shape: the data-grain work already happened in
    calibration_bins (one map-side aggregate); PAV itself folds
    |bins| structs IN-ROW with an inner bounded cascade (sequence of
    ``n_bins`` no-op-or-merge steps -- total work O(n_bins^2), and
    n_bins is a compile-time constant). Nothing leaves the row, no
    driver loop, no UDF.
    """
    pool_t = "array<struct<lo:bigint,hi:bigint,n:bigint,s:bigint>>"
    top = "element_at(st2, size(st2))"
    prev = "element_at(st2, size(st2) - 1)"
    merged = (
        f"array_append(slice(st2, 1, size(st2) - 2), named_struct("
        f"'lo', {prev}.lo, 'hi', {top}.hi, "
        f"'n', {prev}.n + {top}.n, 's', {prev}.s + {top}.s))"
    )
    fold = f"""
        aggregate(
            bs,
            cast(array() as {pool_t}),
            (st, e) -> aggregate(
                sequence(1, {n_bins}),
                array_append(st, named_struct(
                    'lo', e.bin, 'hi', e.bin, 'n', e.n, 's', e.s)),
                (st2, i) -> case
                    when size(st2) >= 2
                     and {top}.s * {prev}.n < {prev}.s * {top}.n
                    then {merged}
                    else st2 end))
    """
    one = bins.agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(bin_col).cast("long").alias("bin"),
                    F.col(n_col).cast("long").alias("n"),
                    F.col(pos_col).cast("long").alias("s"),
                )
            )
        ).alias("bs")
    )
    out = one.select(
        F.posexplode(F.expr(fold)).alias("pool0", "p")
    )
    return out.select(
        (F.col("pool0") + 1).cast("long").alias("pool"),
        F.col("p.lo").alias("bin_lo"),
        F.col("p.hi").alias("bin_hi"),
        F.col("p.n").alias("n_rows"),
        F.col("p.s").alias("n_pos"),
        F.expr("p.s * 1000000 div p.n").alias("iso_ppm"),
    )


def isotonic_fit_sql(
    bins_sql: str,
    n_bins: int,
    bin_col: str = "bin",
    n_col: str = "n_rows",
    pos_col: str = "n_pos",
) -> str:
    """DuckDB twin of :func:`isotonic_fit`: a recursive CTE walks the
    bins in order carrying the pool stack as a LIST column; the
    per-bin merge cascade is the same bounded ``n_bins``-step fold
    (list_reduce with the prepend-init trick)."""
    top = "st2[len(st2)]"
    prev = "st2[len(st2) - 1]"
    merged = (
        f"list_append(st2[1:len(st2) - 2], "
        f"{{'lo': {prev}.lo, 'hi': {top}.hi, "
        f"'n': {prev}.n + {top}.n, 's': {prev}.s + {top}.s}})"
    )
    cascade = f"""
        list_reduce(
            list_prepend(l.ap,
                list_transform(range(1, {n_bins} + 1), i -> l.ap)),
            (st2, xx) -> CASE
                WHEN len(st2) >= 2
                 AND {top}.s * {prev}.n < {prev}.s * {top}.n
                THEN {merged}
                ELSE st2 END)
    """
    new_pool = (
        "{'lo': b.bin, 'hi': b.bin, 'n': b.n, 's': b.s}"
    )
    return f"""
        WITH RECURSIVE binsrc AS (
            SELECT CAST({bin_col} AS BIGINT) AS bin,
                   CAST({n_col} AS BIGINT) AS n,
                   CAST({pos_col} AS BIGINT) AS s,
                   ROW_NUMBER() OVER (ORDER BY {bin_col}) AS rn
            FROM ({bins_sql})
        ), pav AS (
            SELECT rn,
                   [{{'lo': bin, 'hi': bin, 'n': n, 's': s}}] AS st
            FROM binsrc WHERE rn = 1
            UNION ALL
            SELECT b.rn, {cascade}
            FROM pav p
            JOIN binsrc b ON b.rn = p.rn + 1
            CROSS JOIN LATERAL (
                SELECT list_append(p.st, {new_pool}) AS ap
            ) l
        ), final AS (
            SELECT st FROM pav ORDER BY rn DESC LIMIT 1
        )
        SELECT CAST(r AS BIGINT) AS pool,
               st[r].lo AS bin_lo, st[r].hi AS bin_hi,
               st[r].n AS n_rows, st[r].s AS n_pos,
               st[r].s * 1000000 // st[r].n AS iso_ppm
        FROM final, UNNEST(range(1, len(st) + 1)) u(r)
    """


# --- inter-annotator agreement (Cohen's kappa) -------------------------------------


def cohens_kappa(
    df: DataFrame,
    rater_a: str,
    rater_b: str,
) -> DataFrame:
    """Chance-corrected agreement between two categorical labelers
    (Cohen 1960): the statistic a labeling pipeline reports when two
    annotators -- or a heuristic and a gold column -- label the same
    rows. Raw accuracy flatters skewed label distributions; kappa
    subtracts the agreement two independent raters with the same
    marginals would reach by chance:

        kappa = (p_o - p_e) / (1 - p_e)
              = (N * agree - sum_k row_k * col_k)
                / (N^2 - sum_k row_k * col_k)

    Exact-integer discipline: numerator and denominator are plain
    BIGINTs of counts, so both engines compute the identical
    fraction; ``kappa_ppm`` is emitted via sign-split division
    (quotient on |num|, re-signed). Spark ``div`` and DuckDB ``//``
    BOTH truncate toward zero (measured), so a plain signed division
    would also agree -- the sign-split makes the toward-zero
    semantics explicit in the expression itself instead of leaning
    on each engine's operator definition (kappa < 0 is legal, and
    "integer division of a negative" is exactly where readers and
    engines are most often assumed to floor).

    Output (one row): n, n_agree, po_ppm, pe_ppm, kappa_ppm.

    Scale shape: one groupBy((a, b)) map-side-combinable aggregate to
    the |categories|^2 confusion relation, then marginals and the
    one-row fold on that tiny relation. Rows where either label is
    NULL are excluded (both raters must have voted).
    """
    a, b = F.col(rater_a), F.col(rater_b)
    conf = (
        df.filter(a.isNotNull() & b.isNotNull())
        .groupBy(a.alias("la"), b.alias("lb"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    rows = conf.groupBy("la").agg(F.sum("c").alias("row_n"))
    cols = conf.groupBy("lb").agg(F.sum("c").alias("col_n"))
    chance = (
        rows.join(cols, rows.la == cols.lb)
        .agg(
            F.coalesce(
                F.sum(F.col("row_n") * F.col("col_n")), F.lit(0)
            ).cast("long").alias("chance_num")
        )
    )
    totals = conf.agg(
        F.sum("c").cast("long").alias("n"),
        F.coalesce(
            F.sum(F.when(F.col("la") == F.col("lb"), F.col("c"))),
            F.lit(0),
        ).cast("long").alias("n_agree"),
    )
    return (
        totals.crossJoin(F.broadcast(chance))
        .select(
            "n", "n_agree",
            F.expr(f"n_agree * {PPM} div n").alias("po_ppm"),
            F.expr(f"chance_num * {PPM} div (n * n)").alias("pe_ppm"),
            F.expr(f"""
                CASE WHEN n * n = chance_num THEN NULL
                     ELSE sign(n * n_agree - chance_num)
                          * (abs(n * n_agree - chance_num) * {PPM}
                             div (n * n - chance_num))
                END
            """).cast("long").alias("kappa_ppm"),
        )
    )


def cohens_kappa_sql(
    table_sql: str,
    rater_a: str,
    rater_b: str,
) -> str:
    """DuckDB twin of :func:`cohens_kappa` -- identical integer
    confusion counts and the same sign-split truncating division."""
    return f"""
        WITH conf AS (
            SELECT {rater_a} AS la, {rater_b} AS lb,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM ({table_sql})
            WHERE {rater_a} IS NOT NULL AND {rater_b} IS NOT NULL
            GROUP BY 1, 2
        ), marg AS (
            SELECT CAST(COALESCE(SUM(row_n * col_n), 0) AS BIGINT)
                       AS chance_num
            FROM (SELECT la, SUM(c) AS row_n FROM conf GROUP BY la) r
            JOIN (SELECT lb, SUM(c) AS col_n FROM conf GROUP BY lb) co
              ON r.la = co.lb
        ), tot AS (
            SELECT CAST(SUM(c) AS BIGINT) AS n,
                   CAST(COALESCE(SUM(CASE WHEN la = lb THEN c END), 0)
                        AS BIGINT) AS n_agree
            FROM conf
        )
        SELECT n, n_agree,
               n_agree * {PPM} // n AS po_ppm,
               chance_num * {PPM} // (n * n) AS pe_ppm,
               CAST(CASE WHEN n * n = chance_num THEN NULL
                    ELSE CAST(sign(n * n_agree - chance_num) AS BIGINT)
                         * (abs(n * n_agree - chance_num) * {PPM}
                            // (n * n - chance_num))
               END AS BIGINT) AS kappa_ppm
        FROM tot, marg
    """


# --- split-conformal calibration -----------------------------------------------


def conformal_threshold(
    df: DataFrame,
    score_col: str,
    id_col: str,
    alpha_ppm: int = 100_000,
    cal_frac_ppm: int = 500_000,
    salt: str = "conformal",
) -> DataFrame:
    """Split-conformal one-sided threshold + held-out coverage (Vovk
    et al.; Angelopoulos & Bates 2023 tutorial form): calibrate a
    nonconformity threshold ``q_hat`` on a deterministic md5 split,
    then measure empirical coverage on the complement. The marginal
    guarantee P(score <= q_hat) >= 1 - alpha needs q_hat = the
    ceil((n_cal + 1) * (1 - alpha))-th smallest calibration score --
    an exact order statistic, NOT a quantile estimate.

    Exact-integer discipline: the rank k = ceil((n_cal + 1) *
    (1 - alpha)) is computed as (n_cal + 1) * (1e6 - alpha_ppm)
    ceil-divided by 1e6 in BIGINTs; the order statistic is row_number
    over (score, id) -- the id tiebreak makes the statistic
    deterministic under ties; coverage is a ppm ratio of counts. If
    k > n_cal (alpha too small for the calibration size) the
    guarantee is vacuous: q_hat = +infinity is represented by NULL
    and coverage_ppm = 1e6 by construction -- callers see it, loudly.

    Output (one row): n_cal, n_eval, k_rank, q_hat,
    coverage_ppm, target_ppm.

    Scale shape: the split is a stateless md5 filter (no shuffle);
    the order statistic needs the k-th smallest of the calibration
    set -- computed with ONE unpartitioned window over the
    calibration rows. At 100 TB, replace with the two-pass
    bounded-memory selection (histogram sketch to bracket, exact
    scan within bracket); at driver scales the window is the exact,
    attestable form.
    """
    from .sample import hash_bucket

    s, i = F.col(score_col).cast("long"), F.col(id_col)
    base = df.select(
        s.alias("score"), i.alias("id"),
        (hash_bucket(i, salt=salt) < F.lit(cal_frac_ppm)).alias(
            "is_cal"
        ),
    )
    cal = base.filter("is_cal")
    ev = base.filter(~F.col("is_cal"))
    w = Window.orderBy("score", "id")
    ranked = cal.select(
        "score", F.row_number().over(w).alias("rn")
    )
    # ceil division via the all-POSITIVE idiom (num + den - 1) div
    # den: Spark `div` and DuckDB `//` both truncate toward zero, so
    # the negate-and-divide ceil trick (which assumes floor
    # semantics) silently yields floor here -- one rank too low,
    # breaking the >= 1 - alpha guarantee
    n_cal = cal.agg(F.count(F.lit(1)).cast("long").alias("n_cal"))
    k = n_cal.select(
        "n_cal",
        F.expr(
            f"cast(((n_cal + 1) * ({PPM} - {alpha_ppm})"
            f" + {PPM} - 1) div {PPM} as bigint)"
        ).alias("k_rank"),
    )
    qhat = (
        k.join(ranked, ranked.rn == k.k_rank, "left")
        .select(
            "n_cal", "k_rank", F.col("score").alias("q_hat")
        )
    )
    # aggregate the eval side ALONE (a global agg always yields one
    # row, even over an empty eval partition) and attach the one-row
    # qhat by cross join -- aggregating the crossJoin instead would
    # null out n_cal/k_rank via first() when every id lands in
    # calibration
    ev_agg = (
        ev.crossJoin(F.broadcast(qhat.select("q_hat")))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_eval"),
            F.sum(
                (F.col("score") <= F.col("q_hat")).cast("long")
            ).alias("cov_n"),
        )
    )
    return qhat.crossJoin(F.broadcast(ev_agg)).select(
        "n_cal",
        "n_eval",
        "k_rank",
        "q_hat",
        F.expr(f"""
            case when n_eval = 0 or cov_n is null then {PPM}
                 else cov_n * {PPM} div n_eval end
        """).cast("long").alias("coverage_ppm"),
        F.lit(PPM - alpha_ppm).cast("long").alias("target_ppm"),
    )


def conformal_threshold_sql(
    table_sql: str,
    score_col: str,
    id_col: str,
    alpha_ppm: int = 100_000,
    cal_frac_ppm: int = 500_000,
    salt: str = "conformal",
) -> str:
    """DuckDB twin of :func:`conformal_threshold` (same md5 split,
    same ceil-division rank, same (score, id) tiebreak)."""
    from .sample import hash_bucket_sql

    bucket = hash_bucket_sql(id_col, salt=salt)
    return f"""
        WITH base AS (
            SELECT CAST({score_col} AS BIGINT) AS score,
                   {id_col} AS id,
                   {bucket} < {cal_frac_ppm} AS is_cal
            FROM ({table_sql})
        ), cal AS (
            SELECT score,
                   ROW_NUMBER() OVER (ORDER BY score, id) AS rn
            FROM base WHERE is_cal
        ), k AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_cal,
                   CAST(((COUNT(*) + 1) * ({PPM} - {alpha_ppm})
                        + {PPM} - 1) // {PPM} AS BIGINT) AS k_rank
            FROM base WHERE is_cal
        ), q AS (
            SELECT n_cal, k_rank, cal.score AS q_hat
            FROM k LEFT JOIN cal ON cal.rn = k.k_rank
        ), ev AS (
            -- global aggregate: one row even when every id landed in
            -- calibration (a GROUP BY over the empty eval relation
            -- would emit ZERO rows while the engine emits one)
            SELECT CAST(COUNT(*) AS BIGINT) AS n_eval,
                   SUM(CAST(score <= (SELECT q_hat FROM q) AS BIGINT))
                       AS cov_n
            FROM base WHERE NOT is_cal
        )
        SELECT q.n_cal AS n_cal,
               ev.n_eval AS n_eval,
               q.k_rank AS k_rank,
               q.q_hat AS q_hat,
               CAST(CASE WHEN ev.n_eval = 0 OR ev.cov_n IS NULL
                    THEN {PPM}
                    ELSE ev.cov_n * {PPM} // ev.n_eval END
                    AS BIGINT) AS coverage_ppm,
               CAST({PPM - alpha_ppm} AS BIGINT) AS target_ppm
        FROM q, ev
    """


# --- Murphy decomposition of the Brier score ---------------------------------------


def brier_decomposition(
    scored: DataFrame,
    lo: int,
    hi: int,
    n_bins: int = 10,
    label_col: str = "y",
    score_col: str = "score",
) -> DataFrame:
    """Reliability / resolution / uncertainty decomposition of the
    Brier score (Murphy 1973) over the SAME fixed-width integer bins
    as :func:`calibration_bins` -- the one-row summary of what the
    reliability diagram shows: REL (how far bin forecasts sit from
    bin outcomes -- lower is better-calibrated), RES (how far bin
    outcomes spread from the base rate -- higher is more
    discriminative), UNC (base-rate variance, the no-skill floor).

    Exact-integer discipline: per bin, forecast_ppm = the bin's mean
    score mapped linearly from [lo, hi) to [0, 1e6] and outcome_ppm =
    positives ppm, both by truncating division; REL = sum_k n_k *
    (f_k - o_k)^2 div N and RES = sum_k n_k * (o_k - base)^2 div N in
    ppm^2 units; UNC = base * (1e6 - base), also ppm^2. Each output
    is independently deterministic in both engines (the classical
    identity Brier = REL - RES + UNC holds only up to the truncation
    remainders, so it is NOT hashed). Overflow: n_k * (1e6)^2 needs
    n_k < ~9.2e6 per bin at BIGINT -- far above driver scales; at
    100 TB pre-aggregate per stratum.

    Scale shape: the data-grain work is calibration_bins' ONE
    aggregation pass; everything here folds the |bins| relation.
    """
    bins = calibration_bins(
        scored, lo, hi, n_bins=n_bins,
        label_col=label_col, score_col=score_col,
    )
    span = hi - lo
    per = bins.select(
        "n_rows", "n_pos",
        F.expr(
            f"least({PPM}, greatest(0,"
            f" ((score_sum div n_rows) - {lo}) * {PPM} div {span}))"
        ).alias("f_ppm"),
        F.col("pos_rate_ppm").alias("o_ppm"),
    )
    return (
        per.agg(
            F.sum("n_rows").cast("long").alias("n"),
            F.sum("n_pos").cast("long").alias("n_pos"),
            F.sum(
                F.col("n_rows")
                * (F.col("f_ppm") - F.col("o_ppm"))
                * (F.col("f_ppm") - F.col("o_ppm"))
            ).alias("_rel_num"),
            F.collect_list(
                F.struct("n_rows", "o_ppm")
            ).alias("_bins"),
        )
        .select(
            "n", "n_pos",
            F.expr(f"n_pos * {PPM} div n").alias("base_ppm"),
            F.expr("_rel_num div n").cast("long").alias("rel_ppm2"),
            F.expr(f"""
                aggregate(
                    _bins, cast(0 as bigint),
                    (acc, b) -> acc + b.n_rows
                        * (b.o_ppm - n_pos * {PPM} div n)
                        * (b.o_ppm - n_pos * {PPM} div n)
                ) div n
            """).cast("long").alias("res_ppm2"),
            F.expr(
                f"(n_pos * {PPM} div n)"
                f" * ({PPM} - n_pos * {PPM} div n)"
            ).cast("long").alias("unc_ppm2"),
        )
    )


def brier_decomposition_sql(
    scored_sql: str,
    lo: int,
    hi: int,
    n_bins: int = 10,
    label_col: str = "y",
    score_col: str = "score",
) -> str:
    """DuckDB twin of :func:`brier_decomposition` (same bins, same
    truncating-division ppm forecasts, same ppm^2 sums)."""
    bins = calibration_bins_sql(
        scored_sql, lo, hi, n_bins=n_bins,
        label_col=label_col, score_col=score_col,
    )
    span = hi - lo
    return f"""
        WITH bins AS ({bins}),
        per AS (
            SELECT n_rows, n_pos,
                   LEAST({PPM}, GREATEST(0,
                       ((score_sum // n_rows) - {lo}) * {PPM} // {span}
                   )) AS f_ppm,
                   pos_rate_ppm AS o_ppm
            FROM bins
        ), tot AS (
            SELECT CAST(SUM(n_rows) AS BIGINT) AS n,
                   CAST(SUM(n_pos) AS BIGINT) AS n_pos
            FROM per
        )
        SELECT t.n AS n, t.n_pos AS n_pos,
               t.n_pos * {PPM} // t.n AS base_ppm,
               CAST(SUM(p.n_rows * (p.f_ppm - p.o_ppm)
                        * (p.f_ppm - p.o_ppm)) // t.n AS BIGINT)
                   AS rel_ppm2,
               CAST(SUM(p.n_rows
                    * (p.o_ppm - t.n_pos * {PPM} // t.n)
                    * (p.o_ppm - t.n_pos * {PPM} // t.n)) // t.n
                    AS BIGINT) AS res_ppm2,
               CAST((t.n_pos * {PPM} // t.n)
                    * ({PPM} - t.n_pos * {PPM} // t.n) AS BIGINT)
                   AS unc_ppm2
        FROM per p, tot t
        GROUP BY t.n, t.n_pos
    """


# --- decile lift / gains table ------------------------------------------------------


def decile_lift(
    scored: DataFrame,
    label_col: str = "y",
    score_col: str = "score",
    id_col: str = "id",
    n_tiles: int = 10,
) -> DataFrame:
    """Gains table: rank rows by score (ties broken by id so the
    tiling is a deterministic total order), split into ``n_tiles``
    equal-count tiles, and report per tile the exact positive counts
    plus cumulative lift -- the marketing/eval-standard "how much
    better than random is the top k%".

    lift_ppm(tile t) = (cum_pos_t * N * 1e6) div (cum_n_t * P):
    pure BIGINT cross-multiplication, one truncating division.
    NTILE semantics (equal row counts, earlier tiles get the
    remainder) are identical in Spark and DuckDB given the same
    total order.

    Scale shape: the tiling is ONE unpartitioned NTILE window -- the
    exact, attestable form at driver scales; at 100 TB derive tile
    boundaries from the score value-count relation (the exact-AUC /
    borda_fuse trick) and assign by range join instead.
    """
    w = Window.orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    tiled = scored.select(
        F.col(label_col).cast("long").alias("y"),
        F.ntile(n_tiles).over(w).alias("tile"),
    )
    per = tiled.groupBy("tile").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("y").cast("long").alias("n_pos"),
    )
    cum = Window.orderBy("tile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        per.select(
            "tile", "n_rows", "n_pos",
            F.sum("n_rows").over(cum).cast("long").alias("cum_n"),
            F.sum("n_pos").over(cum).cast("long").alias("cum_pos"),
        )
        .crossJoin(
            F.broadcast(
                per.agg(
                    F.sum("n_rows").cast("long").alias("n_total"),
                    F.sum("n_pos").cast("long").alias("pos_total"),
                )
            )
        )
        .select(
            "tile", "n_rows", "n_pos", "cum_n", "cum_pos",
            F.expr(
                f"cum_pos * n_total * {PPM} div (cum_n * pos_total)"
            ).cast("long").alias("cum_lift_ppm"),
        )
        .orderBy("tile")
    )


def decile_lift_sql(
    scored_sql: str,
    label_col: str = "y",
    score_col: str = "score",
    id_col: str = "id",
    n_tiles: int = 10,
) -> str:
    """DuckDB twin of :func:`decile_lift` (same NTILE total order,
    same cross-multiplied lift)."""
    return f"""
        WITH tiled AS (
            SELECT CAST({label_col} AS BIGINT) AS y,
                   NTILE({n_tiles}) OVER (
                       ORDER BY {score_col} DESC, {id_col} ASC
                   ) AS tile
            FROM ({scored_sql})
        ), per AS (
            SELECT tile,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM(y) AS BIGINT) AS n_pos
            FROM tiled GROUP BY tile
        ), cum AS (
            SELECT tile, n_rows, n_pos,
                   CAST(SUM(n_rows) OVER (ORDER BY tile) AS BIGINT)
                       AS cum_n,
                   CAST(SUM(n_pos) OVER (ORDER BY tile) AS BIGINT)
                       AS cum_pos
            FROM per
        ), tot AS (
            SELECT CAST(SUM(n_rows) AS BIGINT) AS n_total,
                   CAST(SUM(n_pos) AS BIGINT) AS pos_total
            FROM per
        )
        SELECT tile, n_rows, n_pos, cum_n, cum_pos,
               cum_pos * n_total * {PPM} // (cum_n * pos_total)
                   AS cum_lift_ppm
        FROM cum, tot
        ORDER BY tile
    """
