"""Model-scoring-as-expression: linear text classifiers that run
entirely inside whole-stage codegen (north-star par.2b quality
classification, the fastText-style gate real pipelines put in front of
pretraining data).

Two shapes, both zero-shuffle (per-row array folds, no explode, no
Python):

- ``hashed_linear_score``: the hashing trick. Each token maps to one of
  D feature buckets via a portable hash; the "model" is a deterministic
  weight per bucket. No vocabulary ships with the plan, so D can be
  millions at no plan-size cost -- this is the shape for a wide model.
- ``vocab_linear_score``: an explicit (term -> weight) vocabulary folded
  into the plan as a literal CASE lookup -- the shape for a small
  distilled model whose weights are real learned values. The weight
  table is a plan constant, i.e. broadcast to every executor for free.

Engine-invariance: weights are integer MILLI-units and the per-doc
accumulation is an exact BIGINT fold in token order, so Spark and the
DuckDB oracle agree bit-for-bit; the only float op is one final IEEE
division of exact operands. The decision threshold is applied to the
exact integer sum, never to a float.

The hash/weight derivation uses only portable primitives (ascii,
length, multiply, mod) -- same trick as text.rolling_fingerprint.
Weights here are a deterministic stand-in for trained parameters; a
real model drops in by replacing the weight function, the execution
shape is the product.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens

# Knuth multiplicative constant + LCG increment: spreads the small
# portable token values over the bucket space. All intermediates stay
# far below 2^63 (token value < 2^16, D <= 2^20).
_MULT = 2654435761
_INC = 1013904223
HASH_DIM = 1024


def _token_value(t: Column) -> Column:
    """Portable per-token integer (first-char code * 256 + length)."""
    return F.ascii(F.substring(t, 1, 1)).cast("long") * 256 + F.length(t)


def _bucket(t: Column, dim: int) -> Column:
    return (_token_value(t) * _MULT + _INC) % dim


def _bucket_weight_milli(bucket: Column) -> Column:
    """Deterministic pseudo-trained weight in [-1000, 1000] milli."""
    return (bucket * _MULT + _INC) % 2001 - 1000


def hashed_linear_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = HASH_DIM,
    threshold_milli: int = 0,
) -> DataFrame:
    """Hashing-trick linear classifier over the token stream.

    Returns (id, n_tokens, logit_milli, logit, label):
    ``logit_milli`` = exact integer sum of per-token bucket weights,
    ``logit`` = mean per-token weight in units (one exact IEEE
    division of exact operands -- bit-identical across engines, which
    a ROUND would not be: HALF_UP on the shortest decimal string vs
    on the binary value diverge at boundaries),
    ``label`` = 1 iff the exact mean exceeds ``threshold_milli``
    milli-units per token.
    """
    toks = tokens(text_col)
    acc = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda a, t: a + _bucket_weight_milli(_bucket(t, dim)),
    )
    n = F.size(toks)
    return df.select(
        F.col(id_col).alias("id"),
        n.alias("n_tokens"),
        acc.alias("logit_milli"),
    ).select(
        "id",
        "n_tokens",
        "logit_milli",
        (
            F.col("logit_milli").cast("double")
            / (1000.0 * F.col("n_tokens"))
        ).alias("logit"),
        (
            F.col("logit_milli")
            > F.lit(threshold_milli) * F.col("n_tokens")
        ).cast("int").alias("label"),
    )


def hashed_linear_score_sql(
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = HASH_DIM,
    threshold_milli: int = 0,
) -> str:
    """DuckDB twin (identical hash, weights, and fold order)."""
    arr = f"regexp_split_to_array({text_col}, ' +')"
    tok_val = "(ascii(t[1]) * 256 + length(t))"
    bucket = f"(({tok_val} * {_MULT} + {_INC}) % {dim})"
    w = f"(({bucket} * {_MULT} + {_INC}) % 2001 - 1000)"
    acc = (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform({arr}, t -> CAST({w} AS BIGINT))), "
        f"(a, v) -> a + v)"
    )
    return f"""
        SELECT id, n_tokens, logit_milli,
               CAST(logit_milli AS DOUBLE)
                   / (1000.0 * n_tokens) AS logit,
               CAST(logit_milli > {threshold_milli} * n_tokens
                    AS INTEGER) AS label
        FROM (
            SELECT {id_col} AS id,
                   len({arr}) AS n_tokens,
                   {acc} AS logit_milli
            FROM {table}
        )
    """


def vocab_linear_score(
    df: DataFrame,
    weights_milli: dict[str, int],
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold_milli: int = 0,
) -> DataFrame:
    """Linear classifier with an explicit vocabulary folded into the
    plan (out-of-vocabulary tokens weigh 0).

    ``weights_milli`` maps term -> integer milli-weight; suitable for
    small distilled models (the lookup is a plan-constant decision
    chain, broadcast for free). Output schema matches
    hashed_linear_score.
    """
    terms = sorted(weights_milli)

    def lookup(t: Column) -> Column:
        expr = F.lit(0).cast("long")
        for term in terms:
            expr = F.when(
                t == F.lit(term), F.lit(weights_milli[term]).cast("long")
            ).otherwise(expr)
        return expr

    toks = tokens(text_col)
    acc = F.aggregate(
        toks, F.lit(0).cast("long"), lambda a, t: a + lookup(t)
    )
    n = F.size(toks)
    return df.select(
        F.col(id_col).alias("id"),
        n.alias("n_tokens"),
        acc.alias("logit_milli"),
    ).select(
        "id",
        "n_tokens",
        "logit_milli",
        (
            F.col("logit_milli").cast("double")
            / (1000.0 * F.col("n_tokens"))
        ).alias("logit"),
        (
            F.col("logit_milli")
            > F.lit(threshold_milli) * F.col("n_tokens")
        ).cast("int").alias("label"),
    )


def vocab_linear_score_sql(
    table: str,
    weights_milli: dict[str, int],
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold_milli: int = 0,
) -> str:
    """DuckDB twin of vocab_linear_score."""
    terms = sorted(weights_milli)
    for term in terms:
        if "'" in term or "\\" in term:
            raise ValueError(f"unsupported characters in term {term!r}")
    arr = f"regexp_split_to_array({text_col}, ' +')"
    w = "CAST(0 AS BIGINT)"
    for term in terms:
        w = (
            f"CASE WHEN t = '{term}' THEN "
            f"CAST({weights_milli[term]} AS BIGINT) ELSE {w} END"
        )
    acc = (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform({arr}, t -> {w})), (a, v) -> a + v)"
    )
    return f"""
        SELECT id, n_tokens, logit_milli,
               CAST(logit_milli AS DOUBLE)
                   / (1000.0 * n_tokens) AS logit,
               CAST(logit_milli > {threshold_milli} * n_tokens
                    AS INTEGER) AS label
        FROM (
            SELECT {id_col} AS id,
                   len({arr}) AS n_tokens,
                   {acc} AS logit_milli
            FROM {table}
        )
    """


# --- in-engine training: full-batch logistic regression -----------------------

GRAD_SCALE = 10**6


def train_hashed_logreg(
    df: DataFrame,
    label: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 16,
    iters: int = 3,
    lr_num: int = 1,
    lr_den: int = 2,
) -> tuple[list[int], DataFrame]:
    """Train the hashing-trick linear model INSIDE the engine:
    full-batch gradient descent on logistic loss over hashed
    bag-of-token counts.

    Fixed-point discipline (the k-means/BPE coordination pattern):
    - features are exact integer counts per (doc, bucket), built once
      and persisted (one shuffle for the whole training run);
    - the margin is an exact BIGINT dot product (micro-unit weights x
      integer counts);
    - each row's gradient contribution (p_i - y_i) * x_id is rounded
      to micro-units BEFORE the sum, so the parallel gradient
      aggregate is exact and partitioning-invariant (the sigmoid's
      last-ulp libm wiggle is absorbed by the rounding, same as
      BM25's idf snap);
    - the weight update w -= lr * grad / n runs in integer floor
      division on the driver over D collected scalars per round --
      O(dim * iters) driver coordination, like MLlib's collectAsMap.

    Returns (final_weights_micro, scored) where ``scored`` is the
    final per-doc (id, y, margin_micro, pred) frame.
    """
    from .caching import persisted

    feats = persisted(
        df.select(
            F.col(id_col).alias("id"),
            label.cast("int").alias("y"),
            F.explode(tokens(text_col)).alias("t"),
        )
        .select("id", "y", _bucket(F.col("t"), dim).alias("b"))
        .groupBy("id", "y", "b")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    n_docs = feats.select("id").distinct().count()
    w = [0] * dim
    if n_docs == 0:
        # nothing to fit: zero weights, empty scored frame (instead of
        # a ZeroDivisionError in the update divisor)
        return w, feats.select(
            "id", "y",
            F.lit(0).cast("long").alias("m_micro"),
            F.lit(0).cast("int").alias("pred"),
        )

    def margins(weights: list[int]) -> DataFrame:
        w_arr = F.array(*[F.lit(int(v)).cast("long") for v in weights])
        return (
            feats.select(
                "id", "y",
                (F.element_at(w_arr, F.col("b").cast("int") + 1)
                 * F.col("x")).alias("wx"),
            )
            .groupBy("id", "y")
            .agg(F.sum("wx").alias("m_micro"))
        )

    for _ in range(iters):
        m = margins(w)
        p = 1.0 / (1.0 + F.exp(-(F.col("m_micro").cast("double") / 1e6)))
        contrib = (
            feats.join(m.select("id", "m_micro"), "id")
            .select(
                "b",
                F.round(
                    (p - F.col("y").cast("double"))
                    * F.col("x").cast("double") * GRAD_SCALE
                ).cast("long").alias("g"),
            )
            .groupBy("b")
            .agg(F.sum("g").alias("grad"))
        )
        grads = {r["b"]: r["grad"] for r in contrib.collect()}
        for d in range(dim):
            g = int(grads.get(d, 0))
            # exact integer update in micro-weights. Division must
            # TRUNCATE TOWARD ZERO, not floor: DuckDB's `//` truncates
            # (-7 // 2 = -3) while Python's floors (-4) -- a floored
            # update would diverge from the oracle by 1 micro on every
            # negative gradient that doesn't divide evenly, and the
            # gap compounds through later sigmoids.
            num, den = lr_num * g, lr_den * n_docs
            delta = abs(num) // den
            w[d] = w[d] - (delta if num >= 0 else -delta)

    scored = margins(w).select(
        "id", "y", "m_micro",
        (F.col("m_micro") > 0).cast("int").alias("pred"),
    )
    return w, scored


def train_hashed_logreg_sql(
    table: str,
    label_sql: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 16,
    iters: int = 3,
    lr_num: int = 1,
    lr_den: int = 2,
) -> str:
    """DuckDB twin: the same training loop unrolled as CTEs. Returns
    SQL producing the final (dim, w_micro) weight table."""
    tok_val = "(ascii(t[1]) * 256 + length(t))"
    bucket = f"(({tok_val} * {_MULT} + {_INC}) % {dim})"
    pre = f"""
        WITH feats AS (
            SELECT id, y, b, CAST(COUNT(*) AS BIGINT) AS x
            FROM (
                SELECT id, y, {bucket} AS b
                FROM (
                    SELECT {id_col} AS id, CAST({label_sql} AS INT) AS y,
                           unnest(regexp_split_to_array({text_col},
                                                        ' +')) AS t
                    FROM {table}
                ) raw
            ) bt GROUP BY id, y, b
        ),
        n AS (SELECT COUNT(DISTINCT id) AS n_docs FROM feats),
        dims AS (SELECT unnest(range(0, {dim})) AS b),
        w0 AS (SELECT b, CAST(0 AS BIGINT) AS w FROM dims)"""
    prev = "w0"
    for r in range(1, iters + 1):
        pre += f""",
        m{r} AS (
            SELECT id, y, SUM(w * x) AS m_micro
            FROM feats JOIN {prev} USING (b)
            GROUP BY id, y
        ),
        g{r} AS (
            SELECT b, SUM(CAST(ROUND(
                (1.0 / (1.0 + exp(-(CAST(m_micro AS DOUBLE) / 1e6)))
                 - CAST(y AS DOUBLE)) * CAST(x AS DOUBLE)
                * {GRAD_SCALE}) AS BIGINT)) AS grad
            FROM feats JOIN (SELECT id, m_micro FROM m{r}) mm
                 USING (id)
            GROUP BY b
        ),
        w{r} AS (
            SELECT d.b,
                   CAST(p.w - ({lr_num} * COALESCE(g.grad, 0))
                        // ({lr_den} * (SELECT n_docs FROM n))
                        AS BIGINT) AS w
            FROM dims d
            JOIN {prev} p USING (b)
            LEFT JOIN g{r} g USING (b)
        )"""
        prev = f"w{r}"
    return pre + f"""
        SELECT b AS dim, w AS w_micro FROM {prev} ORDER BY b
    """
