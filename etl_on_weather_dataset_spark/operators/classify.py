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
