"""Sparse retrieval scoring over a documents table: BM25 top-k.

The retrieval counterpart of the dense (embedding) ANN tier
(north-star par.2b): given a bag of query terms, score every document
with Okapi BM25 and return the top-k. The reference has no retrieval
surface at all; this is the standard lexical baseline every
training-data / RAG pipeline keeps next to its ANN index.

Scale shape (the only acceptable one at 100 TB):
- per-doc term frequencies are in-row array expressions
  (``size(filter(tokens, t == term))``) -- zero shuffle, stays in
  whole-stage codegen; the query's terms are plan constants.
- corpus statistics (N, avgdl, per-term document frequencies) are ONE
  map-side-combinable aggregate collapsing to a single row that is
  broadcast-cross-joined back -- the scalar-subquery shape used by
  tfidf/median; no driver-side ``.count()``.
- the final top-k is ``ORDER BY ... LIMIT k`` which Spark executes as
  TakeOrderedAndProject (per-partition heaps + driver merge of k rows,
  never a global sort).

Engine-invariance: the only transcendental is ``ln`` inside idf, which
is snapped to integer micro-nats (round(ln(x)*1e6)) before any further
arithmetic, so a last-ulp difference between Spark's and DuckDB's libm
cannot propagate; everything else is IEEE-exact integer/double ops
performed in the same textual order in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens

BM25_K1 = 1.2
BM25_B = 0.75


def _safe_term(term: str) -> str:
    if "'" in term or "\\" in term:
        raise ValueError(f"unsupported characters in query term {term!r}")
    return term


def _require_terms(query_terms: list[str]) -> None:
    # both halves of the attested pair must fail the same way: with no
    # terms the Spark side would return empty while the generated SQL
    # would be a parse error (dangling commas, empty WHERE)
    if not query_terms:
        raise ValueError("bm25 requires at least one query term")


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Okapi BM25 top-k documents for a bag of query terms.

    Returns (id, n_tokens, score) -- score rounded to 6 dp, ties broken
    by id ascending, docs matching no term excluded before the top-k.
    """
    _require_terms(query_terms)
    toks = tokens(text_col)

    def _tf(term: str):
        # closure factory: a two-arg lambda would be read by F.filter
        # as its (element, index) form
        return F.size(F.filter(toks, lambda t: t == F.lit(term)))

    tf_cols = [
        _tf(term).alias(f"tf_{i}") for i, term in enumerate(query_terms)
    ]
    base = df.select(
        F.col(id_col).alias("id"),
        F.size(toks).alias("dl"),
        *tf_cols,
    )
    stats = base.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(query_terms))
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    score = F.lit(0.0)
    for i in range(len(query_terms)):
        dfreq = F.col(f"df_{i}").cast("double")
        idf_micro = F.round(
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - dfreq + 0.5) / (dfreq + 0.5)
            )
            * 1e6
        ).cast("long")
        tf = F.col(f"tf_{i}").cast("double")
        sat = (tf * (k1 + 1.0)) / (
            tf + k1 * (1.0 - b + b * F.col("dl") / avgdl)
        )
        score = score + (idf_micro.cast("double") / 1e6) * sat
    matched = F.lit(False)
    for i in range(len(query_terms)):
        matched = matched | (F.col(f"tf_{i}") > 0)
    return (
        scored.filter(matched)
        .select(
            "id",
            F.col("dl").alias("n_tokens"),
            F.round(score, 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("id"))
        .limit(k)
    )


def bm25_topk_sql(
    table: str,
    query_terms: list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> str:
    """DuckDB twin of bm25_topk (identical micro-nat idf snap, term
    order, rounding, and tie-break)."""
    _require_terms(query_terms)
    tf_exprs = []
    df_exprs = []
    for i, term in enumerate(query_terms):
        t = _safe_term(term)
        tf_exprs.append(
            f"len(list_filter(regexp_split_to_array({text_col}, ' +'),"
            f" t -> t = '{t}')) AS tf_{i}"
        )
        df_exprs.append(
            f"SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        )
    score_terms = []
    for i in range(len(query_terms)):
        idf_micro = (
            f"CAST(ROUND(ln(1.0 + (n_docs - CAST(df_{i} AS DOUBLE)"
            f" + 0.5) / (CAST(df_{i} AS DOUBLE) + 0.5)) * 1e6)"
            f" AS BIGINT)"
        )
        sat = (
            f"(CAST(tf_{i} AS DOUBLE) * ({k1!r} + 1.0))"
            f" / (CAST(tf_{i} AS DOUBLE) + {k1!r} * (1.0 - {b!r}"
            f" + {b!r} * dl / (CAST(sum_dl AS DOUBLE) / n_docs)))"
        )
        score_terms.append(
            f"(CAST({idf_micro} AS DOUBLE) / 1e6) * {sat}"
        )
    score_sql = " + ".join(f"({s})" for s in score_terms)
    any_match = " OR ".join(
        f"tf_{i} > 0" for i in range(len(query_terms))
    )
    return f"""
        WITH base AS (
            SELECT {id_col} AS id,
                   len(regexp_split_to_array({text_col}, ' +')) AS dl,
                   {", ".join(tf_exprs)}
            FROM {table}
        ),
        stats AS (
            SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl,
                   {", ".join(df_exprs)}
            FROM base
        )
        SELECT id, dl AS n_tokens,
               ROUND(0.0 + {score_sql}, 6) AS score
        FROM base CROSS JOIN stats
        WHERE {any_match}
        ORDER BY score DESC, id
        LIMIT {k}
    """


# --- hybrid retrieval: reciprocal-rank fusion --------------------------------

def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    k0: int = 60,
    k: int = 10,
    id_col: str = "id",
    rank_col: str = "rk",
) -> DataFrame:
    """Fuse two ranked candidate lists with reciprocal-rank fusion
    (the standard lexical+dense hybrid of a RAG stack): fused(id) =
    sum over lists of 1/(k0 + rank), missing entries contribute 0.

    Rank-based, so no score calibration between BM25 and cosine is
    needed; contributions are snapped to micro units
    (round(1e6/(k0+rank))) and summed as exact BIGINTs, making the
    fusion engine/partition-invariant. Output: (id, rrf_micro,
    fused_rank), top-``k`` by fused score, ties by id.

    Scale: two small candidate lists (top-N each) -- the fuse is a
    full outer join on id plus one TakeOrderedAndProject; the heavy
    lifting happened upstream in the retrievers.
    """
    def _contrib(df: DataFrame, name: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias("id"),
            F.round(1e6 / (F.lit(k0) + F.col(rank_col)))
            .cast("long").alias(name),
        )

    a = _contrib(ranked_a, "c_a")
    b = _contrib(ranked_b, "c_b")
    fused = (
        a.join(b, "id", "full_outer")
        .select(
            "id",
            (
                F.coalesce("c_a", F.lit(0).cast("long"))
                + F.coalesce("c_b", F.lit(0).cast("long"))
            ).alias("rrf_micro"),
        )
        .orderBy(F.col("rrf_micro").desc(), F.col("id"))
        .limit(k)
    )
    w = Window.orderBy(F.col("rrf_micro").desc(), F.col("id"))
    return fused.withColumn(
        "fused_rank", F.row_number().over(w).cast("int")
    )


def rrf_fuse_sql(
    ranked_a_sql: str,
    ranked_b_sql: str,
    k0: int = 60,
    k: int = 10,
    id_col: str = "id",
    rank_col: str = "rk",
) -> str:
    """DuckDB twin of rrf_fuse; the inputs are subqueries yielding
    (id_col, rank_col)."""
    return f"""
        WITH ra AS (
            SELECT {id_col} AS id,
                   CAST(ROUND(1e6 / ({k0} + {rank_col})) AS BIGINT)
                       AS c_a
            FROM ({ranked_a_sql})
        ), rb AS (
            SELECT {id_col} AS id,
                   CAST(ROUND(1e6 / ({k0} + {rank_col})) AS BIGINT)
                       AS c_b
            FROM ({ranked_b_sql})
        ), fused AS (
            SELECT COALESCE(ra.id, rb.id) AS id,
                   COALESCE(c_a, 0) + COALESCE(c_b, 0) AS rrf_micro
            FROM ra FULL OUTER JOIN rb ON ra.id = rb.id
            ORDER BY rrf_micro DESC, id
            LIMIT {k}
        )
        SELECT id, rrf_micro,
               CAST(ROW_NUMBER() OVER (ORDER BY rrf_micro DESC, id)
                    AS INTEGER) AS fused_rank
        FROM fused
    """


def sample_negatives(
    queries: DataFrame,
    pool: DataFrame,
    query_id: str = "query_id",
    positive_id: str = "positive_id",
    pool_id: str = "doc_id",
    k: int = 4,
    n_buckets: int = 64,
    salt: str = "neg",
) -> DataFrame:
    """Deterministic uniform negative sampling for retrieval /
    contrastive training: for each (query, positive) pair, draw ``k``
    negatives from the candidate pool -- engine-portable, no RNG
    state, and NEVER a query x pool cross join.

    Shape: the pool is bucketed once by md5 (B buckets) and trimmed to
    the k+1 smallest-by-hash docs per bucket (row_number <= k+1
    compiles to WindowGroupLimit: map-side trim, the exchange carries
    O((k+1) x buckets) rows however big the pool is). Each query joins
    exactly ONE bucket -- chosen by md5(query) -- so candidates arrive
    through an equi-join whose build side is the tiny trimmed pool.
    The query's own positive is then excluded and the first k of the
    remainder kept per (query, positive) pair; trimming to k+1
    guarantees k survivors even when the positive lands in the chosen
    bucket.

    Honest contract on diversity: only the REACHABLE set -- the
    (k+1) x n_buckets hash-minimal pool docs -- can ever appear as
    negatives, and all pairs hashing to one bucket share a negative
    set. ``n_buckets`` is therefore the diversity dial and must scale
    with the query count (the same sizing rule as rows_per_shard:
    pick B ~ |queries|, so expected pairs-per-bucket ~ 1 and the
    reachable set ~ k x |queries| docs). Which docs are reachable is
    a uniform md5 draw from the pool, and everything is
    engine/retry/partitioning-invariant -- a training run is exactly
    reproducible from the corpus alone. Callers needing
    similarity-HARD negatives compose the ANN tier instead
    (cosine_topk / label_prototype_margins); this operator is the
    uniform-random baseline every contrastive recipe starts from.

    Output: (query_id, positive_id, neg_id, neg_rank) with
    neg_rank in [1, k].
    """
    from .sample import hash_bucket

    trimmed = (
        pool.select(
            F.col(pool_id).alias("neg_id"),
            hash_bucket(F.col(pool_id), buckets=n_buckets, salt=salt)
            .alias("b"),
            F.md5(
                F.concat(F.col(pool_id).cast("string"),
                         F.lit(salt))
            ).alias("h"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("b").orderBy("h", "neg_id")
            ),
        )
        .filter(F.col("rn") <= k + 1)
    )
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(positive_id).alias("positive_id"),
        hash_bucket(F.col(query_id), buckets=n_buckets, salt=salt)
        .alias("b"),
    )
    return (
        q.join(F.broadcast(trimmed), "b")
        .filter(F.col("neg_id") != F.col("positive_id"))
        .withColumn(
            # per (query, positive) PAIR: a query with several
            # positives gets k negatives for each pair, and the rank
            # order is total (rn ties cannot occur within one pair --
            # each rn value appears once per bucket)
            "neg_rank",
            F.row_number().over(
                Window.partitionBy("query_id", "positive_id")
                .orderBy("rn")
            ),
        )
        .filter(F.col("neg_rank") <= k)
        .select("query_id", "positive_id", "neg_id",
                F.col("neg_rank").cast("long").alias("neg_rank"))
    )


def sample_negatives_sql(
    queries_sql: str,
    pool_sql: str,
    query_id: str = "query_id",
    positive_id: str = "positive_id",
    pool_id: str = "doc_id",
    k: int = 4,
    n_buckets: int = 64,
    salt: str = "neg",
) -> str:
    """DuckDB twin of :func:`sample_negatives`."""
    from .sample import hash_bucket_sql

    pool_bucket = hash_bucket_sql(pool_id, buckets=n_buckets,
                                  salt=salt)
    q_bucket = hash_bucket_sql(query_id, buckets=n_buckets, salt=salt)
    return f"""
        WITH trimmed AS (
            SELECT neg_id, b, rn FROM (
                SELECT {pool_id} AS neg_id,
                       {pool_bucket} AS b,
                       md5(CAST({pool_id} AS VARCHAR) || '{salt}')
                           AS h,
                       ROW_NUMBER() OVER (
                           PARTITION BY {pool_bucket}
                           ORDER BY md5(CAST({pool_id} AS VARCHAR)
                                        || '{salt}'), {pool_id})
                           AS rn
                FROM ({pool_sql})
            ) WHERE rn <= {k + 1}
        ), q AS (
            SELECT {query_id} AS query_id,
                   {positive_id} AS positive_id,
                   {q_bucket} AS b
            FROM ({queries_sql})
        )
        SELECT query_id, positive_id, neg_id,
               CAST(neg_rank AS BIGINT) AS neg_rank
        FROM (
            SELECT q.query_id, q.positive_id, t.neg_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.query_id, q.positive_id
                       ORDER BY t.rn)
                       AS neg_rank
            FROM q JOIN trimmed t USING (b)
            WHERE t.neg_id != q.positive_id
        ) WHERE neg_rank <= {k}
    """


# --- Borda-count rank aggregation ---------------------------------------------------

def borda_fuse(
    df: DataFrame,
    id_col: str,
    signals: dict[str, str],
    k: int = 20,
) -> DataFrame:
    """Fuse several quality signals by Borda count (de Borda 1781;
    the rank-aggregation baseline of ensemble curation): each signal
    ranks every row (competition rank, best = 1, ties share a rank),
    each row earns ``N - rank`` points per signal, and the fused
    score is the point sum -- scale-free, so kilobyte lengths and
    0/1 flags vote with equal weight.

    ``signals`` maps an integer column to ``"desc"`` (bigger is
    better) or ``"asc"``. Output: top-``k`` rows by (borda DESC, id)
    with the fused score and each signal's rank.

    Exactness: ranks and points are BIGINTs; competition rank depends
    only on VALUES (ties share a rank), never on physical row order,
    so both engines agree without a tiebreak column. Signal values
    must be NON-NULL: NULL has no defined rank (Spark's equi-join
    would silently drop it while SQL RANK() would seat it last), so
    the engine fails loud instead of letting the two disagree --
    impute or filter upstream.

    Scale shape: the naive form (the DuckDB oracle) is one global
    RANK() window per signal -- a full sort of the corpus each. The
    engine instead derives each rank from the signal's VALUE-COUNT
    relation: groupBy(value) count (map-side combinable), ONE window
    cumulative sum over the |distinct values| relation (bounded by
    the value domain, not the corpus -- same trick as the exact-AUC
    fold in operators/evaluate.py), then a broadcastable join back.
    Data-grain work is shuffle-only; no corpus-wide sort.
    """
    n_total = df.count()  # one job; |signals| plans reuse it as a literal
    non_null = None
    for sig in signals:
        c = F.col(sig).isNotNull()
        non_null = c if non_null is None else non_null & c
    fused = df.select(
        F.col(id_col).alias("id"), *signals.keys()
    ).filter(
        # fail-loud NULL guard in a FILTER predicate (projected
        # raise_error columns get pruned -- the cooccurrence lesson)
        F.when(non_null, F.lit(True)).otherwise(
            F.expr(
                "raise_error('borda_fuse: NULL signal value -- NULL"
                " has no defined rank (the engine join would drop"
                " it, SQL RANK() would seat it); impute or filter"
                " upstream')"
            ).cast("boolean")
        )
    )
    for sig, direction in signals.items():
        desc = direction == "desc"
        vc = (
            df.groupBy(F.col(sig).alias("v"))
            .agg(F.count(F.lit(1)).alias("c"))
        )
        order = F.col("v").desc() if desc else F.col("v").asc()
        w = Window.orderBy(order).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        ranks = vc.select(
            "v",
            (F.sum("c").over(w) - F.col("c") + 1).alias(f"rk_{sig}"),
        )
        fused = (
            fused.join(
                F.broadcast(ranks), fused[sig] == ranks.v, "left"
            )
            .drop("v")
        )
    borda = sum(
        (F.lit(n_total) - F.col(f"rk_{s}")) for s in signals
    ).cast("long")
    out = fused.select(
        "id",
        borda.alias("borda"),
        *[F.col(f"rk_{s}").cast("long").alias(f"rk_{s}")
          for s in signals],
    )
    return (
        out.orderBy(F.col("borda").desc(), F.col("id")).limit(k)
    )


def borda_fuse_sql(
    table_sql: str,
    id_col: str,
    signals: dict[str, str],
    k: int = 20,
) -> str:
    """DuckDB twin of :func:`borda_fuse` in the naive global-window
    form (one RANK() per signal) -- the shape the engine's
    value-count rewrite avoids; equal answers attest the rewrite."""
    rank_exprs = ", ".join(
        f"RANK() OVER (ORDER BY {s}"
        f" {'DESC' if d == 'desc' else 'ASC'}) AS rk_{s}"
        for s, d in signals.items()
    )
    borda = " + ".join(f"(n_total - rk_{s})" for s in signals)
    rk_cols = ", ".join(f"CAST(rk_{s} AS BIGINT) AS rk_{s}"
                        for s in signals)
    return f"""
        WITH ranked AS (
            SELECT {id_col} AS id, {rank_exprs},
                   COUNT(*) OVER () AS n_total
            FROM ({table_sql})
        )
        SELECT id, CAST({borda} AS BIGINT) AS borda, {rk_cols}
        FROM ranked
        ORDER BY borda DESC, id
        LIMIT {k}
    """
