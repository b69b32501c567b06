"""Deterministic, engine-portable sampling and dataset splitting.

Training-data pipelines need samples and train/test splits that are
(a) reproducible across runs, retries, and partitionings, (b) portable
across engines (the same row lands in the same split everywhere), and
(c) computable without a shuffle. Spark's `df.sample`/`randomSplit`
give none of these: they seed per-partition RNGs, so results change
with partitioning and cannot be reproduced by another engine.

The standard fix is HASH sampling: bucket = md5(key) mod B, keep rows
whose bucket falls under the fraction. Pure projection (no shuffle, no
state), stable under retries/AQE, and expressible identically in any
engine with md5 -- which is exactly what the DuckDB oracles do.

Scale: md5 over a short key per row, whole-stage codegen, zero
shuffle. Skew-free by construction (md5 is uniform). At 100 TB this
is the only sampling discipline that survives speculative execution
and partial recomputation without double-sampling rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# fraction resolution: 1e-6
HASH_BUCKETS = 1_000_000


def hash_bucket(
    key: Column | str, buckets: int = HASH_BUCKETS, salt: str = ""
) -> Column:
    """Deterministic bucket in [0, buckets) from md5 of the key.

    Uses the first 8 hex digits (32 bits -- uniform, and small enough
    that every engine parses it exactly). ``salt`` decorrelates
    independent samples drawn from the same key.
    """
    key_col = F.col(key) if isinstance(key, str) else key
    keyed = F.concat(key_col.cast("string"), F.lit(salt))
    return (
        F.conv(F.substring(F.md5(keyed), 1, 8), 16, 10)
        .cast("long") % buckets
    )


def hash_bucket_sql(key: str, buckets: int = HASH_BUCKETS,
                    salt: str = "") -> str:
    """DuckDB twin of hash_bucket (same md5 prefix, same modulus)."""
    keyed = f"CAST({key} AS VARCHAR) || '{salt}'" if salt else \
        f"CAST({key} AS VARCHAR)"
    return (
        f"CAST(('0x' || substr(md5({keyed}), 1, 8)) AS UBIGINT)"
        f" % {buckets}"
    )


def hash_sample(
    df: DataFrame,
    key: str,
    fraction: float,
    salt: str = "",
) -> DataFrame:
    """Keep a deterministic ~``fraction`` of rows, keyed on ``key``.

    Rows with equal keys are kept or dropped together (dedup-friendly:
    sample by document id and all its chunks follow).
    """
    cutoff = int(round(fraction * HASH_BUCKETS))
    return df.filter(hash_bucket(key, salt=salt) < cutoff)


def train_test_split(
    df: DataFrame,
    key: str,
    test_fraction: float = 0.1,
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Label every row 'train' or 'test', deterministically by key.

    The same key lands in the same split in every engine and run --
    the property that keeps eval sets leak-free when upstream data is
    reprocessed.
    """
    cutoff = int(round(test_fraction * HASH_BUCKETS))
    return df.withColumn(
        split_col,
        F.when(hash_bucket(key, salt=salt) < cutoff, F.lit("test"))
        .otherwise(F.lit("train")),
    )


def stratified_hash_sample(
    df: DataFrame,
    key: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling (sampleBy, made portable).

    ``fractions`` maps stratum value -> keep fraction; strata not
    listed fall back to ``default_fraction``. The per-stratum cutoff
    is a CASE chain -- still a pure projection.
    """
    cutoff = F.lit(int(round(default_fraction * HASH_BUCKETS)))
    expr = None
    for value, frac in fractions.items():
        cond = F.col(strata_col) == value
        branch = F.lit(int(round(frac * HASH_BUCKETS)))
        expr = F.when(cond, branch) if expr is None else \
            expr.when(cond, branch)
    cutoff = expr.otherwise(cutoff) if expr is not None else cutoff
    return df.filter(hash_bucket(key, salt=salt) < cutoff)


def cap_per_key(
    df: DataFrame,
    key_col: str,
    id_col: str,
    cap: int,
    salt: str = "cap",
) -> DataFrame:
    """Keep at most ``cap`` rows per ``key_col`` -- domain balancing
    (the curation step that stops one crawl domain / source from
    dominating the training mix; cf. the per-domain caps in
    RefinedWeb/Dolma-class pipelines).

    WHICH rows survive is deterministic and engine-portable: rows are
    ranked inside each key by (md5-hash-bucket of id, id) -- a seeded
    uniform draw, not "first cap by arrival order", so the survivors
    are an unbiased sample of the domain and identical across engines,
    retries, and partitionings.

    Scale shape: row_number <= cap compiles to WindowGroupLimit
    (plan-asserted in tests/test_scale_patterns.py), so every map task
    pre-trims to its local top-``cap`` per key BEFORE the shuffle --
    the exchange carries at most cap * n_tasks rows per key, not the
    domain's full row count. Skewed mega-domains therefore cost
    O(cap) per upstream task, not O(domain size), and no precut /
    sampling pre-pass is needed.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(
        hash_bucket(F.col(id_col), salt=salt), F.col(id_col)
    )
    return (
        df.withColumn("_cap_rk", F.row_number().over(w))
        .filter(F.col("_cap_rk") <= cap)
        .drop("_cap_rk")
    )


def cap_per_key_sql(
    table_sql: str,
    key_col: str,
    id_col: str,
    cap: int,
    salt: str = "cap",
    select: str = "*",
) -> str:
    """DuckDB twin (same md5 bucket, same tiebreak)."""
    bucket = hash_bucket_sql(id_col, salt=salt)
    return f"""
        SELECT {select} FROM ({table_sql})
        QUALIFY row_number() OVER (
            PARTITION BY {key_col} ORDER BY {bucket}, {id_col}
        ) <= {cap}
    """


def mix_corpus(
    df: DataFrame,
    weights: dict[str, float],
    token_budget: int,
    strata_col: str = "source",
    key_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "mix",
) -> DataFrame:
    """Deterministic corpus mixing: downsample each stratum (source /
    domain / dataset) so the kept corpus approximates ``weights``'
    share of a ``token_budget`` -- the mixture step every pretraining
    recipe publishes (Pile/Dolma/Llama-style sampling proportions).

    Per stratum s with target weight w_s and available tokens T_s, the
    keep fraction is f_s = min(1, token_budget * w_s / T_s); docs are
    kept whole (a doc's tokens travel together) via the engine-portable
    md5 bucket on ``key_col``. Strata not in ``weights`` get f = 0.
    Hitting the budget exactly would need a per-stratum running-token
    cut (a global sort per stratum); fraction-based mixing is the
    scalable form -- achieved share converges to target by LLN at any
    real corpus size, and the whole operator is one small aggregate +
    one broadcast join + a stateless filter.

    Exactness discipline: f_s comes from data, so the cutoff must
    derive identically in engine and oracle -- floor((budget * w / T)
    * buckets) with the same op order (floor, not round: round-half
    rules differ across engines). Weight literals embed verbatim in
    the SQL twin.

    Returns the kept rows with the stratum cutoff fraction attached
    (``mix_keep_frac``) for auditability.
    """
    from .text import token_count

    w_expr = None
    for s, w in weights.items():
        cond = F.col(strata_col) == s
        w_expr = F.when(cond, F.lit(float(w))) if w_expr is None \
            else w_expr.when(cond, F.lit(float(w)))
    w_expr = w_expr.otherwise(F.lit(0.0)) if w_expr is not None \
        else F.lit(0.0)

    totals = (
        df.groupBy(strata_col)
        .agg(F.sum(token_count(text_col)).alias("_mix_tokens"))
        .select(
            strata_col,
            F.least(
                F.lit(1.0),
                F.lit(float(token_budget)) * w_expr / F.col("_mix_tokens"),
            ).alias("mix_keep_frac"),
        )
    )
    cutoff = F.floor(F.col("mix_keep_frac") * HASH_BUCKETS)
    return (
        df.join(F.broadcast(totals), strata_col)
        .filter(hash_bucket(F.col(key_col), salt=salt) < cutoff)
    )


def mix_corpus_sql(
    table: str,
    weights: dict[str, float],
    token_budget: int,
    strata_col: str = "source",
    key_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "mix",
    select: str = "*",
) -> str:
    """DuckDB twin of mix_corpus (same weight CASE, same floor'd
    cutoff, same md5 bucket)."""
    cases = " ".join(
        "WHEN '{}' THEN {!r}".format(s.replace("'", "''"), float(w))
        for s, w in weights.items()
    )
    w_sql = f"(CASE {strata_col} {cases} ELSE 0.0 END)"
    toks = f"len(regexp_split_to_array({text_col}, ' +'))"
    bucket = hash_bucket_sql(key_col, salt=salt)
    return f"""
        WITH totals AS (
            SELECT {strata_col},
                   LEAST(1.0, {float(token_budget)!r} * {w_sql}
                         / SUM({toks})) AS mix_keep_frac
            FROM {table} GROUP BY {strata_col}
        )
        SELECT {select} FROM {table} JOIN totals USING ({strata_col})
        WHERE {bucket} < floor(mix_keep_frac * {HASH_BUCKETS})
    """


def weighted_sample(
    df: DataFrame,
    weight: Column | str,
    n: int,
    key_col: str,
    salt: str = "wsample",
    es_col: str = "es_key",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis-Spirakis A-ES, public): every row draws a uniform
    u in (0,1) from its md5 bucket ((bucket + 0.5) / B -- engine-
    portable, seeded by ``salt``), ranks by ln(u)/w (the log form of
    the ES key u^(1/w); larger wins), and the global top-``n`` is the
    sample. Inclusion probability is proportional to weight, which is
    what "sample training docs by quality score" actually needs --
    mix_corpus handles per-stratum PROPORTIONS, this handles per-ROW
    weights.

    Rows with weight <= 0 or null are excluded (ES is undefined
    there; a zero-weight row must never be sampled anyway).

    Determinism across engines: the ES key is ROUNDED to 9 decimals
    before ranking with the row key as tie-break -- ln() may differ
    in the last ulp between engines, and an unrounded orderBy could
    flip two near-equal keys at the cut; after rounding, anything
    closer than 1e-9 resolves by key identically everywhere.

    Scale: global top-n compiles to TakeOrderedAndProject (per-task
    partial top-n, no global sort -- plan-asserted), so the exchange
    carries at most n rows per task.
    """
    w = F.col(weight) if isinstance(weight, str) else weight
    u = (hash_bucket(F.col(key_col), salt=salt) + 0.5) / HASH_BUCKETS
    es = F.round(F.ln(u) / w, 9)
    return (
        df.filter(w.isNotNull() & (w > 0))
        .withColumn(es_col, es)
        .orderBy(F.col(es_col).desc(), F.col(key_col).asc())
        .limit(n)
    )


def weighted_sample_sql(
    table_sql: str,
    weight_sql: str,
    n: int,
    key_col: str,
    salt: str = "wsample",
    select: str = "*",
    es_col: str = "es_key",
) -> str:
    """DuckDB twin (same md5 uniform, same rounded ES key, same
    tie-break)."""
    bucket = hash_bucket_sql(key_col, salt=salt)
    es = f"ROUND(ln(({bucket} + 0.5) / {HASH_BUCKETS}) / ({weight_sql}), 9)"
    return f"""
        SELECT {select}, {es} AS {es_col}
        FROM ({table_sql})
        WHERE ({weight_sql}) IS NOT NULL AND ({weight_sql}) > 0
        ORDER BY {es} DESC, {key_col} ASC
        LIMIT {n}
    """


def contrastive_triplets(
    df: DataFrame,
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Deterministic (anchor, positive, negative) triplets for
    contrastive training: positive = next same-label item in md5
    order (wrapping), negative = the rank-aligned item of the NEXT
    label (cyclic). Every item of a label with >= 2 members anchors
    exactly one triplet -- epoch-stable, engine/retry-invariant
    (md5 order, no RNG), and re-runs identically on any cluster.
    Requires >= 2 distinct labels: with a single label the cyclic
    next-label map would wrap to the label itself, so such inputs
    yield zero triplets rather than degenerate same-class negatives.

    Plan: two label-partitioned windows + one equi-join on
    (label, rank) against the broadcast-sized label-size table; no
    shuffle wider than (id, label, rank).
    """
    w = Window.partitionBy(label_col).orderBy(F.md5(F.col(id_col).cast("string")))
    ranked = df.select(
        F.col(id_col).alias("anchor_id"),
        F.col(label_col).alias("label"),
        F.row_number().over(w).alias("rn"),
        F.coalesce(
            F.lead(id_col).over(w), F.first(id_col).over(
                Window.partitionBy(label_col).orderBy(
                    F.md5(F.col(id_col).cast("string"))
                ).rowsBetween(Window.unboundedPreceding,
                              Window.unboundedFollowing)
            )
        ).alias("positive_id"),
    )
    sizes = df.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("n")
    )
    # cyclic next-label map (works for arbitrary label values, not
    # just dense ints): lead over the sorted label list, wrapping
    lw = Window.orderBy("label").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    label_map = sizes.select(
        "label", "n",
        F.coalesce(
            F.lead("label").over(Window.orderBy("label")),
            F.first("label").over(lw),
        ).alias("neg_label"),
        F.coalesce(
            F.lead("n").over(Window.orderBy("label")),
            F.first("n").over(lw),
        ).alias("neg_n"),
    )
    neg_side = ranked.select(
        F.col("label").alias("neg_label"),
        F.col("rn").alias("neg_rn"),
        F.col("anchor_id").alias("negative_id"),
    )
    anchors = (
        ranked.join(F.broadcast(label_map), "label")
        .filter(F.col("n") >= 2)
        # single-distinct-label input: the cyclic map wraps to the
        # label itself and the "negative" would come from the
        # anchor's own class -- emit no triplet instead (r4 advice)
        .filter(F.col("neg_label") != F.col("label"))
        .withColumn("neg_rn", (F.col("rn") - 1) % F.col("neg_n") + 1)
    )
    return anchors.join(neg_side, ["neg_label", "neg_rn"]).select(
        "anchor_id", "label", "positive_id", "negative_id",
        F.col("neg_label").alias("negative_label"),
    )


def contrastive_triplets_sql(
    table: str,
    id_col: str = "vec_id",
    label_col: str = "label",
) -> str:
    """DuckDB twin of :func:`contrastive_triplets`."""
    return f"""
        WITH ranked AS (
            SELECT {id_col} AS anchor_id, {label_col} AS label,
                   ROW_NUMBER() OVER w AS rn,
                   COALESCE(
                       LEAD({id_col}) OVER w,
                       FIRST_VALUE({id_col}) OVER (
                           PARTITION BY {label_col}
                           ORDER BY md5(CAST({id_col} AS VARCHAR))
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND UNBOUNDED FOLLOWING)
                   ) AS positive_id
            FROM {table}
            WINDOW w AS (PARTITION BY {label_col}
                         ORDER BY md5(CAST({id_col} AS VARCHAR)))
        ), sizes AS (
            SELECT {label_col} AS label, COUNT(*) AS n FROM {table}
            GROUP BY {label_col}
        ), label_map AS (
            SELECT label, n,
                   COALESCE(LEAD(label) OVER (ORDER BY label),
                            FIRST_VALUE(label) OVER (
                                ORDER BY label ROWS BETWEEN UNBOUNDED
                                PRECEDING AND UNBOUNDED FOLLOWING))
                       AS neg_label,
                   COALESCE(LEAD(n) OVER (ORDER BY label),
                            FIRST_VALUE(n) OVER (
                                ORDER BY label ROWS BETWEEN UNBOUNDED
                                PRECEDING AND UNBOUNDED FOLLOWING))
                       AS neg_n
            FROM sizes
        )
        SELECT a.anchor_id, a.label, a.positive_id,
               neg.anchor_id AS negative_id,
               a.neg_label AS negative_label
        FROM (
            SELECT r.anchor_id, r.label, r.positive_id, m.neg_label,
                   (r.rn - 1) % m.neg_n + 1 AS neg_rn
            FROM ranked r
            JOIN label_map m ON r.label = m.label AND m.n >= 2
                            AND m.neg_label != r.label
        ) a
        JOIN ranked neg
          ON neg.label = a.neg_label AND neg.rn = a.neg_rn
    """


def group_safe_split(
    df: DataFrame,
    id_col: str,
    groups: DataFrame,
    test_fraction: float = 0.2,
    salt: str = "split",
) -> DataFrame:
    """Train/test split that can never leak near-duplicate content
    across the boundary: every row is assigned by the hash of its
    GROUP representative (``groups`` = (id, component) from
    dedup_components, or any id->group frame), so all members of a
    duplicate cluster land in the same split. Rows absent from
    ``groups`` are their own singleton group.

    This closes the classic eval-contamination hole: a per-id split
    puts a document in train and its near-clone in test, and the
    model is graded on memorization. Adds ``group`` and ``split``.

    Scale: one left equi-join on id (the groups frame is
    |clustered ids|-sized, usually a small fraction of the corpus)
    plus a pure projection -- no extra shuffle beyond the join.
    """
    g = groups.select(
        F.col(groups.columns[0]).alias("__gid"),
        F.col(groups.columns[1]).alias("__grp"),
    )
    grouped = (
        df.join(g, df[id_col] == g["__gid"], "left")
        .drop("__gid")
        .withColumn("group", F.coalesce(F.col("__grp"), F.col(id_col)))
        .drop("__grp")
    )
    return train_test_split(grouped, "group", test_fraction, salt=salt)


def group_kfold(
    df: DataFrame,
    id_col: str,
    groups: DataFrame,
    k: int = 5,
    salt: str = "fold",
) -> DataFrame:
    """K-fold assignment that keeps duplicate clusters intact: fold =
    md5-bucket of the GROUP representative mod k (the cross-validation
    face of :func:`group_safe_split` -- every member of a near-dup
    cluster shares a fold, so no fold's holdout ever contains a clone
    of another fold's training data). Adds ``group`` and ``fold``.
    """
    g = groups.select(
        F.col(groups.columns[0]).alias("__gid"),
        F.col(groups.columns[1]).alias("__grp"),
    )
    return (
        df.join(g, df[id_col] == g["__gid"], "left")
        .drop("__gid")
        .withColumn("group", F.coalesce(F.col("__grp"), F.col(id_col)))
        .drop("__grp")
        .withColumn(
            "fold",
            (hash_bucket(F.col("group"), salt=salt) % k).cast("int"),
        )
    )


# --- temperature-based mixture (multilingual/source sampling) ------------------


def _temp_score(n: Column, alpha: float) -> Column:
    """Unnormalized temperature score n^alpha, snapped to micro-units
    per STRATUM (the per-term snap that makes the later integer
    normalization engine-exact). alpha = 0.5 routes through sqrt,
    which IEEE 754 requires to be correctly rounded -- bit-identical
    across engines, no libm residual at all; other alphas use
    exp(alpha * ln n) in one fixed op order (the documented
    residual-libm class, micro-snapped immediately)."""
    nd = n.cast("double")
    if alpha == 0.5:
        raw = F.sqrt(nd)
    else:
        raw = F.exp(F.lit(float(alpha)) * F.log(nd))
    return F.round(raw * 1_000_000).cast("long")


def _temp_score_sql(n_sql: str, alpha: float) -> str:
    nd = f"CAST({n_sql} AS DOUBLE)"
    raw = f"sqrt({nd})" if alpha == 0.5 else f"exp({alpha!r} * ln({nd}))"
    return f"CAST(ROUND({raw} * 1000000) AS BIGINT)"


def temperature_mixture_plan(
    df: DataFrame,
    strata_col: str = "source",
    key_col: str = "doc_id",
    budget_docs: int = 1000,
    temperature: float = 2.0,
    salt: str = "temp",
) -> DataFrame:
    """Temperature-based sampling plan (the mT5/multilingual recipe):
    stratum s is sampled proportionally to n_s^(1/T) -- T=1 is
    natural proportions, T->inf is uniform across strata -- so
    low-resource strata are upsampled RELATIVE to their share without
    ever exceeding their actual mass (keep fraction caps at 1).

    Output per stratum: ``n_docs``, ``score_micro`` (snapped n^alpha),
    ``weight_ppm`` (integer-normalized share of the budget),
    ``keep_frac_ppm`` (min(1, budget * w / n)), and ``n_kept`` -- the
    ACTUAL md5-bucket selection count, so the hash attests the
    concrete doc selection, not just the plan arithmetic.

    Everything after the per-stratum snap is integer: the
    normalization sum is a BIGINT sum (associative -- Spark partials
    and a sequential oracle cannot disagree), ratios are integer
    ``div``. One aggregate over |strata| rows + one broadcast join
    back for the selection filter.
    """
    alpha = 1.0 / temperature
    strata = df.groupBy(strata_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    ).select(
        strata_col, "n_docs",
        _temp_score(F.col("n_docs"), alpha).alias("score_micro"),
    )
    total = strata.agg(
        F.sum("score_micro").cast("long").alias("score_total")
    )
    plan = (
        strata.crossJoin(F.broadcast(total))
        .select(
            strata_col, "n_docs", "score_micro",
            F.expr("score_micro * 1000000 div score_total")
            .cast("long").alias("weight_ppm"),
        )
        .select(
            strata_col, "n_docs", "score_micro", "weight_ppm",
            F.least(
                F.lit(1_000_000).cast("long"),
                F.expr(f"({budget_docs} * weight_ppm div 1000000)"
                       " * 1000000 div n_docs").cast("long"),
            ).alias("keep_frac_ppm"),
        )
    )
    kept = (
        df.select(F.col(strata_col), F.col(key_col).alias("_k"))
        .join(F.broadcast(plan.select(strata_col, "keep_frac_ppm")),
              strata_col)
        .filter(hash_bucket(F.col("_k"), salt=salt)
                < F.col("keep_frac_ppm"))
        .groupBy(strata_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_kept"))
    )
    return (
        # both sides are |strata|-sized post-aggregates; Catalyst has
        # no size stats for them, so hint the broadcast explicitly
        plan.join(F.broadcast(kept), strata_col, "left")
        .select(
            strata_col, "n_docs", "score_micro", "weight_ppm",
            "keep_frac_ppm",
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        )
        .orderBy(strata_col)
    )


def temperature_mixture_plan_sql(
    table: str = "documents",
    strata_col: str = "source",
    key_col: str = "doc_id",
    budget_docs: int = 1000,
    temperature: float = 2.0,
    salt: str = "temp",
) -> str:
    """DuckDB twin of :func:`temperature_mixture_plan`."""
    alpha = 1.0 / temperature
    bucket = hash_bucket_sql(key_col, salt=salt)
    return f"""
        WITH strata AS (
            SELECT {strata_col},
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   {_temp_score_sql('COUNT(*)', alpha)} AS score_micro
            FROM {table} GROUP BY {strata_col}
        ), total AS (
            SELECT CAST(SUM(score_micro) AS BIGINT) AS score_total
            FROM strata
        ), plan AS (
            SELECT {strata_col}, n_docs, score_micro,
                   score_micro * 1000000 // score_total AS weight_ppm
            FROM strata CROSS JOIN total
        ), plan2 AS (
            SELECT *,
                   LEAST(1000000,
                         ({budget_docs} * weight_ppm // 1000000)
                         * 1000000 // n_docs) AS keep_frac_ppm
            FROM plan
        ), kept AS (
            SELECT t.{strata_col},
                   CAST(COUNT(*) AS BIGINT) AS n_kept
            FROM {table} t
            JOIN plan2 p ON t.{strata_col} = p.{strata_col}
            WHERE CAST({bucket} AS BIGINT) < p.keep_frac_ppm
            GROUP BY t.{strata_col}
        )
        SELECT p.{strata_col}, n_docs, score_micro, weight_ppm,
               keep_frac_ppm,
               CAST(COALESCE(n_kept, 0) AS BIGINT) AS n_kept
        FROM plan2 p LEFT JOIN kept k
          ON p.{strata_col} = k.{strata_col}
        ORDER BY p.{strata_col}
    """


def quota_waterfill(strata: DataFrame, budget: int) -> DataFrame:
    """Water-filling quota allocation: split an integer ``budget``
    across strata proportionally to ``weight``, capping every stratum
    at its availability ``n_avail`` and redistributing the excess to
    the uncapped strata -- the allocation every mixture sampler needs
    once naive proportional shares start exceeding what small strata
    actually have.

    Input columns: (stratum, n_avail, weight), both numbers long.
    The exact solution is a_s = min(n_avail_s, floor(lambda *
    weight_s)) with the water level lambda solving sum(a_s) <=
    budget; the capped set is a PREFIX of strata sorted by
    n_avail/weight ascending (classical water-filling). All decisions
    are exact-integer: the per-row cap test cross-multiplies instead
    of dividing (n_i * W_rem <= B_rem * w_i), so Spark and a
    sequential SQL oracle cannot disagree on a boundary.

    Output per stratum: (stratum, n_avail, weight, capped,
    alloc) -- capped strata get all their rows; uncapped get
    floor(B' * w / W') of the post-cap budget B' over the post-cap
    weight mass W'. Floor remainders (< #uncapped strata rows) stay
    unassigned by contract; the caller reads them off
    budget - sum(alloc).

    Scale: |strata| rows end-to-end -- one sort + three window sums
    + one broadcastable one-row total; never touches corpus grain.
    """
    cum = Window.orderBy("nw_key", "stratum").rowsBetween(
        Window.unboundedPreceding, -1
    )
    tot = strata.agg(
        F.sum("n_avail").cast("long").alias("n_total"),
        F.sum("weight").cast("long").alias("w_total"),
    )
    # Fail-loud guard (r7 advice, same discipline as ks_from_counts):
    # weight <= 0 makes the n/w ordering key a silent NULL under
    # Spark's non-ANSI integer div while DuckDB's // errors -- the
    # engines would diverge on degenerate input instead of both
    # refusing it.
    nw_key = F.when(
        F.col("weight") > 0,
        F.expr("n_avail * 1000000 div weight"),
    ).otherwise(
        F.expr(
            "raise_error('quota_waterfill: stratum weight must be"
            " > 0 -- proportional allocation is undefined')"
        ).cast("long")
    )
    marked = (
        strata.select(
            "stratum",
            F.col("n_avail").cast("long").alias("n_avail"),
            F.col("weight").cast("long").alias("weight"),
        )
        .withColumn("nw_key", nw_key)
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "cum_n", F.coalesce(F.sum("n_avail").over(cum), F.lit(0))
        )
        .withColumn(
            "cum_w", F.coalesce(F.sum("weight").over(cum), F.lit(0))
        )
        # exact-integer cap test for row i given all earlier rows
        # (in n/w order) capped: n_i * W_rem <= B_rem * w_i
        .withColumn(
            "test_ok",
            (
                F.col("n_avail") * (F.col("w_total") - F.col("cum_w"))
                <= (F.lit(budget) - F.col("cum_n")) * F.col("weight")
            ).cast("long"),
        )
        # capped = every row up to and including this one passes
        .withColumn(
            "capped",
            (
                F.sum(F.lit(1) - F.col("test_ok")).over(
                    Window.orderBy("nw_key", "stratum").rowsBetween(
                        Window.unboundedPreceding, 0
                    )
                )
                == 0
            ).cast("long"),
        )
    )
    post = marked.agg(
        F.sum(F.when(F.col("capped") == 1, F.col("n_avail")))
        .cast("long").alias("capped_n"),
        F.sum(F.when(F.col("capped") == 1, F.col("weight")))
        .cast("long").alias("capped_w"),
    ).select(
        F.coalesce("capped_n", F.lit(0)).alias("capped_n"),
        F.coalesce("capped_w", F.lit(0)).alias("capped_w"),
    )
    return (
        marked.crossJoin(F.broadcast(post))
        .select(
            "stratum", "n_avail", "weight", "capped",
            F.when(F.col("capped") == 1, F.col("n_avail"))
            .otherwise(
                F.expr(
                    f"({budget} - capped_n) * weight"
                    " div (w_total - capped_w)"
                )
            ).cast("long").alias("alloc"),
        )
        .orderBy("stratum")
    )


def quota_waterfill_sql(strata_sql: str, budget: int) -> str:
    """DuckDB twin of :func:`quota_waterfill` (same integer
    cross-multiplied cap test, same n/w prefix order)."""
    return f"""
        WITH strata AS (
            {strata_sql}
        ), tot AS (
            SELECT CAST(SUM(n_avail) AS BIGINT) AS n_total,
                   CAST(SUM(weight) AS BIGINT) AS w_total
            FROM strata
        ), keyed AS (
            -- fail-loud weight guard, mirroring the Spark raise_error
            SELECT *,
                   CASE WHEN weight <= 0 THEN CAST(error(
                            'quota_waterfill: stratum weight must be'
                            || ' > 0') AS BIGINT)
                        ELSE n_avail * 1000000 // weight
                   END AS nw_key
            FROM strata
        ), marked AS (
            SELECT s.stratum, s.n_avail, s.weight, s.nw_key,
                   t.w_total,
                   COALESCE(SUM(s.n_avail) OVER w_prev, 0) AS cum_n,
                   COALESCE(SUM(s.weight) OVER w_prev, 0) AS cum_w
            FROM keyed s CROSS JOIN tot t
            WINDOW w_prev AS (
                ORDER BY s.nw_key, s.stratum
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        ), tested AS (
            SELECT *,
                   CASE WHEN n_avail * (w_total - cum_w)
                             <= ({budget} - cum_n) * weight
                        THEN 1 ELSE 0 END AS test_ok
            FROM marked
        ), flagged AS (
            SELECT *,
                   CASE WHEN SUM(1 - test_ok) OVER (
                            ORDER BY nw_key, stratum
                            ROWS UNBOUNDED PRECEDING) = 0
                        THEN 1 ELSE 0 END AS capped
            FROM tested
        ), post AS (
            SELECT CAST(COALESCE(SUM(CASE WHEN capped = 1
                                          THEN n_avail END), 0)
                        AS BIGINT) AS capped_n,
                   CAST(COALESCE(SUM(CASE WHEN capped = 1
                                          THEN weight END), 0)
                        AS BIGINT) AS capped_w
            FROM flagged
        )
        SELECT f.stratum,
               CAST(f.n_avail AS BIGINT) AS n_avail,
               CAST(f.weight AS BIGINT) AS weight,
               CAST(f.capped AS BIGINT) AS capped,
               CAST(CASE WHEN f.capped = 1 THEN f.n_avail
                         ELSE ({budget} - p.capped_n) * f.weight
                              // (f.w_total - p.capped_w)
                    END AS BIGINT) AS alloc
        FROM flagged f CROSS JOIN post p
        ORDER BY f.stratum
    """


def curriculum_interleave(
    df: DataFrame,
    score_col: str,
    id_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Deterministic curriculum ordering: bucket rows into
    ``n_buckets`` difficulty tiers by ``score_col`` quantile, then
    emit a GLOBAL training position that round-robins across tiers --
    every consecutive run of ``n_buckets`` positions sees one row
    from each difficulty level (the standard mixed-curriculum
    ordering; a plain sort by difficulty would feed epochs all-easy
    then all-hard).

    Bucketing is exact and engine-portable WITHOUT a global
    row-number: cumulative counts over the DISTINCT score relation
    (domain-bounded, the same discipline as the AUC operator) give
    every distinct score a bucket = cum_before * B div total; ties
    share a bucket by construction. Within a bucket, rank is a
    row_number partitioned BY the bucket (parallel); the global
    position (rank-1) * B + bucket is collision-free because (rank,
    bucket) is unique.

    Output: (id, score, bucket, pos). Scale: one groupBy(score) +
    one window over |distinct scores| + one broadcast join back +
    one per-bucket window -- no single-partition global window at
    row grain.
    """
    per_score = df.groupBy(F.col(score_col).alias("s")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, 0)
    tot = per_score.agg(F.sum("n").cast("long").alias("n_total"))
    buckets = (
        per_score.withColumn("cum", F.sum("n").over(w))
        .crossJoin(F.broadcast(tot))
        .select(
            "s",
            F.expr(f"(cum - n) * {n_buckets} div n_total")
            .cast("long").alias("bucket"),
        )
    )
    wb = Window.partitionBy("bucket").orderBy("s", id_col)
    return (
        df.select(F.col(id_col), F.col(score_col).alias("s"))
        .join(F.broadcast(buckets), "s")
        .withColumn("rk", F.row_number().over(wb))
        .select(
            F.col(id_col),
            F.col("s").alias(score_col),
            "bucket",
            ((F.col("rk") - 1) * n_buckets + F.col("bucket"))
            .cast("long").alias("pos"),
        )
    )


def curriculum_interleave_sql(
    table_sql: str,
    score_col: str,
    id_col: str,
    n_buckets: int = 10,
) -> str:
    """DuckDB twin of :func:`curriculum_interleave`."""
    return f"""
        WITH base AS (
            {table_sql}
        ), per_score AS (
            SELECT {score_col} AS s,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM base GROUP BY {score_col}
        ), tot AS (
            SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM per_score
        ), buckets AS (
            SELECT s,
                   (SUM(n) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING)
                    - n) * {n_buckets} // n_total AS bucket
            FROM per_score CROSS JOIN tot
        ), ranked AS (
            SELECT b.{id_col}, b.{score_col}, k.bucket,
                   ROW_NUMBER() OVER (PARTITION BY k.bucket
                       ORDER BY b.{score_col}, b.{id_col}) AS rk
            FROM base b JOIN buckets k ON b.{score_col} = k.s
        )
        SELECT {id_col},
               CAST({score_col} AS BIGINT) AS {score_col},
               CAST(bucket AS BIGINT) AS bucket,
               CAST((rk - 1) * {n_buckets} + bucket AS BIGINT) AS pos
        FROM ranked
    """


def quota_waterfill_select(
    df: DataFrame,
    plan: DataFrame,
    strata_col: str,
    key_col: str,
    salt: str = "qw",
) -> DataFrame:
    """Materialize a :func:`quota_waterfill` plan: select EXACTLY
    ``alloc`` rows per stratum, deterministically.

    Keep-fraction sampling (temperature_mixture_plan) hits a TARGET
    count in expectation; budget-exact pipelines (eval sets, fixed
    token budgets) need the exact count. Rows rank inside each
    stratum by (md5 bucket of key, key) -- a seeded uniform draw, so
    the selection is an unbiased within-stratum sample, identical
    across engines/retries/partitionings -- and the top ``alloc``
    survive.

    Scale: one broadcast of the |strata|-row plan + one per-stratum
    window sort at row grain. Unlike cap_per_key's literal cap, a
    column-valued cutoff cannot compile to WindowGroupLimit, so the
    exchange carries full strata; when one stratum dominates the
    corpus AND its alloc is tiny, pre-trim with
    ``cap_per_key(df, strata_col, key_col, max_alloc)`` first (the
    composition keeps determinism: both rank by the same md5 order).
    """
    w = Window.partitionBy(strata_col).orderBy(
        hash_bucket(F.col(key_col), salt=salt), F.col(key_col)
    )
    return (
        df.join(
            F.broadcast(plan.select(
                F.col("stratum").alias(strata_col), "alloc"
            )),
            strata_col,
        )
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= F.col("alloc"))
        .drop("_rk", "alloc")
    )


def quota_waterfill_select_sql(
    table_sql: str,
    plan_sql: str,
    strata_col: str,
    key_col: str,
    salt: str = "qw",
    select: str = "*",
) -> str:
    """DuckDB twin of :func:`quota_waterfill_select`."""
    bucket = hash_bucket_sql(key_col, salt=salt)
    return f"""
        SELECT {select} FROM (
            SELECT t.*, p.alloc,
                   ROW_NUMBER() OVER (
                       PARTITION BY t.{strata_col}
                       ORDER BY {bucket}, t.{key_col}) AS _rk
            FROM ({table_sql}) t
            JOIN ({plan_sql}) p ON t.{strata_col} = p.stratum
        ) WHERE _rk <= alloc
    """


def balanced_shard_assignment(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    n_shards: int,
    salt: str = "shard",
) -> DataFrame:
    """Assign rows to ``n_shards`` so EVERY shard carries the global
    stratum mixture (per-stratum round-robin): within each stratum,
    rows rank by (md5 bucket of key, key) and shard = (rank-1) mod
    n_shards -- so any two shards' counts for a stratum differ by at
    most 1, and a training job reading any subset of shards sees the
    corpus mixture, not whichever sources its files happened to hold.

    Deterministic and engine-portable (the shared md5 rank);
    per-stratum window sort is the cost, same shape as cap_per_key.
    Adds ``shard``.
    """
    w = Window.partitionBy(strata_col).orderBy(
        hash_bucket(F.col(key_col), salt=salt), F.col(key_col)
    )
    return df.withColumn(
        "shard",
        ((F.row_number().over(w) - 1) % n_shards).cast("long"),
    )


def balanced_shard_assignment_sql(
    table_sql: str,
    strata_col: str,
    key_col: str,
    n_shards: int,
    salt: str = "shard",
    select: str = "*",
) -> str:
    """DuckDB twin of :func:`balanced_shard_assignment`."""
    bucket = hash_bucket_sql(key_col, salt=salt)
    return f"""
        SELECT {select},
               (ROW_NUMBER() OVER (
                    PARTITION BY {strata_col}
                    ORDER BY {bucket}, {key_col}) - 1)
                   % {n_shards} AS shard
        FROM ({table_sql})
    """


def epoch_shuffle_manifest(
    df: DataFrame,
    id_col: str,
    epochs: int = 2,
    n_buckets: int = 64,
    salt: str = "epoch",
) -> DataFrame:
    """Deterministic per-epoch training shuffle, attested as a
    manifest: for each epoch, every row gets the shuffle key
    md5(id || ':' || epoch) and a bucket; the manifest row per
    (epoch, bucket) carries the row count and an order-sensitive md5
    of the id sequence in shuffle order. Two runs (or two engines)
    that produce the same manifest feed byte-identical epoch streams;
    different epochs get decorrelated orders from the same ids with
    no RNG state to checkpoint.

    Scale: the global epoch order is (bucket, key) -- a data loader
    reads buckets in order, so no global sort ever materializes; the
    per-bucket ordered fingerprint is the same bounded sort+concat
    argument as shard_manifest (rows per bucket ~= N/n_buckets;
    n_buckets is the shard-size dial, scale it ~N/1e6 like
    rows_per_shard). The epoch fan-out is explode(sequence(0, E-1)):
    E is 1..a few, map-side only.
    """
    key = F.md5(
        F.concat(
            F.col("i").cast("string"), F.lit(":"),
            F.col("epoch").cast("string"), F.lit(salt),
        )
    )
    fanned = df.select(F.col(id_col).alias("i")).select(
        "i",
        F.explode(
            F.sequence(F.lit(0), F.lit(int(epochs) - 1))
        ).alias("epoch"),
    ).select(
        "epoch", "i", key.alias("k"),
        (
            F.conv(F.substring(key, 1, 8), 16, 10).cast("long")
            % n_buckets
        ).alias("bucket"),
    )
    return (
        fanned.groupBy("epoch", "bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("k", "i"))),
                        lambda s: s["i"].cast("string"),
                    ),
                )
            ).alias("order_md5"),
        )
        .withColumn("epoch", F.col("epoch").cast("long"))
        .withColumn("bucket", F.col("bucket").cast("long"))
    )


def epoch_shuffle_manifest_sql(
    table_sql: str,
    id_col: str,
    epochs: int = 2,
    n_buckets: int = 64,
    salt: str = "epoch",
) -> str:
    """DuckDB twin of :func:`epoch_shuffle_manifest`."""
    key = (
        f"md5(CAST(i AS VARCHAR) || ':' || CAST(epoch AS VARCHAR)"
        f" || '{salt}')"
    )
    return f"""
        WITH fanned AS (
            SELECT t.{id_col} AS i, e.epoch
            FROM ({table_sql}) t
            CROSS JOIN (
                SELECT unnest(range({int(epochs)})) AS epoch
            ) e
        ), keyed AS (
            SELECT epoch, i, {key} AS k,
                   CAST(('0x' || substr({key}, 1, 8)) AS UBIGINT)
                       % {n_buckets} AS bucket
            FROM fanned
        )
        SELECT CAST(epoch AS BIGINT) AS epoch,
               CAST(bucket AS BIGINT) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               md5(string_agg(CAST(i AS VARCHAR), ','
                              ORDER BY k, i)) AS order_md5
        FROM keyed
        GROUP BY epoch, bucket
    """


def mixture_epoch_plan(
    strata: DataFrame,
    token_budget: int,
    max_epochs_ppm: int = 4_000_000,
) -> DataFrame:
    """Token-budget mixture planning with EPOCHING: given per-domain
    availability and target mixture weights, decide how many epochs
    (repeats, in ppm -- 1e6 = exactly once) of each domain a training
    run uses.

    Input columns: (stratum, n_tokens, target_ppm) -- availability and
    the desired share of the ``token_budget`` (ppm of budget; shares
    need not sum to 1e6). A domain whose share exceeds its
    availability is UPSAMPLED (epochs_ppm > 1e6) up to the
    ``max_epochs_ppm`` repetition cap -- the standard "small
    high-quality domain repeats ~4 epochs" recipe; beyond the cap the
    plan honestly reports the shortfall instead of silently repeating
    further (repetition beyond a few epochs measurably degrades
    models, hence the dial). Oversupplied domains are downsampled
    (epochs_ppm < 1e6).

    All integer arithmetic: wanted = budget * target_ppm div 1e6;
    epochs_ppm = min(cap, wanted * 1e6 div n_tokens); planned =
    n_tokens * epochs_ppm div 1e6. Output adds shortfall_tokens
    (wanted - planned, > 0 only when the cap binds) and the capped
    flag.

    Scale: |domains| rows end to end -- pure per-row expressions over
    an already-aggregated relation; the row-grain materialization of
    the plan is the existing samplers' job (temperature_mixture /
    quota_waterfill_select feed on exactly this shape).

    Fail-loud: n_tokens <= 0 with a positive target is refused in
    both engines (same discipline as quota_waterfill), and so is a
    NULL target_ppm (round-8 advice): a NULL target makes ``wanted``
    NULL, and since least() SKIPS NULLs in BOTH engines, epochs_ppm
    would silently become the repetition cap with capped=1 -- parity
    would hold, so the oracle could never catch it.
    """
    wanted = F.expr(f"{int(token_budget)} * target_ppm div 1000000")
    bad = (F.col("n_tokens") <= 0) & (F.col("target_ppm") > 0)
    epochs = F.when(
        F.col("target_ppm").isNull(),
        F.expr(
            "raise_error('mixture_epoch_plan: NULL target_ppm --"
            " least() skips NULLs, the plan would silently repeat"
            " to the cap')"
        ).cast("long"),
    ).when(
        bad,
        F.expr(
            "raise_error('mixture_epoch_plan: stratum with target > 0"
            " has no tokens')"
        ).cast("long"),
    ).when(
        # zero tokens AND zero target: 0 div 0 is NULL in both
        # engines and least() SKIPS nulls -- without this branch an
        # empty no-target stratum would silently report the cap
        F.col("n_tokens") <= 0,
        F.lit(0).cast("long"),
    ).otherwise(
        F.least(
            F.lit(int(max_epochs_ppm)).cast("long"),
            F.expr("wanted * 1000000 div n_tokens"),
        )
    )
    return (
        strata.select(
            "stratum",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("target_ppm").cast("long").alias("target_ppm"),
        )
        .withColumn("wanted", wanted.cast("long"))
        .withColumn("epochs_ppm", epochs)
        .withColumn(
            "planned_tokens",
            F.expr("n_tokens * epochs_ppm div 1000000"),
        )
        .select(
            "stratum", "n_tokens", "target_ppm", "wanted",
            "epochs_ppm",
            "planned_tokens",
            (F.col("wanted") - F.col("planned_tokens")).cast("long")
            .alias("shortfall_tokens"),
            (F.col("epochs_ppm") == max_epochs_ppm).cast("long")
            .alias("capped"),
        )
    )


def mixture_epoch_plan_sql(
    strata_sql: str,
    token_budget: int,
    max_epochs_ppm: int = 4_000_000,
) -> str:
    """DuckDB twin of :func:`mixture_epoch_plan`."""
    return f"""
        WITH s AS (
            SELECT stratum,
                   CAST(n_tokens AS BIGINT) AS n_tokens,
                   CAST(target_ppm AS BIGINT) AS target_ppm,
                   {int(token_budget)} * CAST(target_ppm AS BIGINT)
                       // 1000000 AS wanted
            FROM ({strata_sql})
        ), e AS (
            SELECT *,
                   CASE WHEN target_ppm IS NULL
                        THEN CAST(error('mixture_epoch_plan: NULL'
                             || ' target_ppm') AS BIGINT)
                        WHEN n_tokens <= 0 AND target_ppm > 0
                        THEN CAST(error('mixture_epoch_plan: stratum'
                             || ' with target > 0 has no tokens')
                             AS BIGINT)
                        WHEN n_tokens <= 0 THEN 0
                        ELSE LEAST({int(max_epochs_ppm)},
                                   wanted * 1000000 // n_tokens)
                   END AS epochs_ppm
            FROM s
        )
        SELECT stratum, n_tokens, target_ppm, wanted, epochs_ppm,
               n_tokens * epochs_ppm // 1000000 AS planned_tokens,
               wanted - (n_tokens * epochs_ppm // 1000000)
                   AS shortfall_tokens,
               CAST(epochs_ppm = {int(max_epochs_ppm)} AS BIGINT)
                   AS capped
        FROM e
    """


# --- Neyman (variance-optimal) stratified allocation ----------------------------


def neyman_weights(
    df: DataFrame,
    stratum_col: str,
    metric_col: str,
) -> DataFrame:
    """Per-stratum Neyman allocation weights: ``weight_h`` =
    ``floor(N_h * sigma_h)`` -- the optimal sampling weight that
    minimizes the variance of the stratified mean estimator under a
    fixed budget (Neyman 1934). Feed the output straight into
    :func:`quota_waterfill` (same (stratum, n_avail, weight) shape)
    to get the exact capped integer allocation, then
    :func:`quota_waterfill_select` to draw it.

    Exact-integer discipline: with the population variance
    ``sigma_h^2 = (N*sum(x^2) - sum(x)^2) / N^2``, the product
    ``N_h * sigma_h`` collapses to ``sqrt(var_num_h)`` where
    ``var_num_h = N_h*sum(x^2) - sum(x)^2`` is a plain BIGINT of
    integer inputs -- so the only float op is one IEEE-754 sqrt of
    the SAME integer in both engines (correctly rounded by hardware,
    bit-identical), floored back to BIGINT. A fail-loud guard
    refuses inputs where ``var_num`` reaches 2^52: beyond that the
    double no longer represents every integer gap the sqrt needs, so
    ``floor(sqrt(double(n)))`` can exceed ``isqrt(n)`` (first
    counterexample family: n = k^2 - 1 with k > 2^26, e.g.
    67108865^2 - 1 <= 2^53 rounds UP to 67108865.0 exactly and
    floors to k instead of k-1). Below 2^52 the relative rounding
    error of the cast (<= 2^-53) cannot move sqrt(n) across an
    integer boundary because adjacent squares are > 2*sqrt(n) apart
    and sqrt(n) <= 2^26. At larger scale pre-aggregate to DECIMAL
    upstream. The same guard is mirrored in
    :func:`neyman_weights_sql` so both engines fail identically.

    ``metric_col`` must be integral (lengths, token counts, cents).
    Zero-variance strata get weight 0 -- textbook Neyman samples
    them zero times (their mean is already exact); callers who must
    visit every stratum union them back with a floor allocation.

    Scale: one map-side-combinable aggregate to |strata| rows.
    """
    x = F.col(metric_col).cast("long")
    agg = df.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count(F.lit(1)).cast("long").alias("n_avail"),
        F.sum(x).cast("long").alias("s1"),
        F.sum(x * x).cast("long").alias("s2"),
    )
    var_num = F.col("n_avail") * F.col("s2") - F.col("s1") * F.col("s1")
    guarded = F.when(
        var_num < F.lit(2**52),
        var_num,
    ).otherwise(
        F.expr(
            "raise_error('neyman_weights: variance numerator"
            " N*sum(x^2) - sum(x)^2 reaches 2^52 -- floor of the"
            " double sqrt can diverge from isqrt; pre-aggregate to"
            " DECIMAL')"
        ).cast("long")
    )
    return agg.select(
        "stratum",
        "n_avail",
        F.floor(F.sqrt(guarded)).cast("long").alias("weight"),
    )


def neyman_weights_sql(
    table_sql: str,
    stratum_col: str,
    metric_col: str,
) -> str:
    """DuckDB twin of :func:`neyman_weights` (same integer variance
    numerator, same single IEEE sqrt, same < 2^52 fail-loud guard --
    the floor-of-double-sqrt == isqrt bound documented there)."""
    return f"""
        SELECT stratum, n_avail,
               CAST(FLOOR(SQRT(CASE
                   WHEN CAST(n_avail * s2 - s1 * s1 AS BIGINT)
                        < CAST(4503599627370496 AS BIGINT)
                   THEN CAST(n_avail * s2 - s1 * s1 AS BIGINT)
                   ELSE CAST(error('neyman_weights_sql: variance'
                        ' numerator reaches 2^52 -- floor of the'
                        ' double sqrt can diverge from isqrt')
                        AS BIGINT)
               END)) AS BIGINT) AS weight
        FROM (
            SELECT {stratum_col} AS stratum,
                   CAST(COUNT(*) AS BIGINT) AS n_avail,
                   CAST(SUM(CAST({metric_col} AS BIGINT)) AS BIGINT)
                       AS s1,
                   CAST(SUM(CAST({metric_col} AS BIGINT)
                            * CAST({metric_col} AS BIGINT)) AS BIGINT)
                       AS s2
            FROM ({table_sql}) GROUP BY 1
        )
    """
