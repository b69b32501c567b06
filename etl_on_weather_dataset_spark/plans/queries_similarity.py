"""Similarity-search + embedding + multimodal queries (par.2b)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import decode_binary_metadata, with_binary_payload
from ..operators.similarity import (
    cosine_topk,
    cosine_topk_sql,
    dot,
    embedding_near_dup_sql,
    ivf_topk_sql,
    lsh_hyperplanes,
    lsh_topk,
    lsh_topk_sql,
)
from ..schemas import load_table
from .registry import QuerySpec, register

_K = 5
_N_QUERIES = 20  # queries = vec_id < 20; corpus = everything


def _brute_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return cosine_topk(queries, emb, k=_K)


register(QuerySpec(
    name="cosine_topk_bruteforce",
    spark_fn=_brute_topk,
    oracle=cosine_topk_sql(k=_K, query_filter=f"id < {_N_QUERIES}"),
    covers=("similarity-bruteforce", "array-fns"),
    bench=True,
))


def _brute_topk_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import cosine_topk_pandas

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return cosine_topk_pandas(queries, emb, k=_K)


register(QuerySpec(
    name="cosine_topk_pandas_udf",
    spark_fn=_brute_topk_pandas,
    # identical semantics + rounding -> shares the brute-force oracle
    oracle=cosine_topk_sql(k=_K, query_filter=f"id < {_N_QUERIES}"),
    covers=("pandas-udf-vectorized", "similarity"),
    extended=True,  # bit-identical to cosine_topk_bruteforce (driver-
    # attested); the Arrow/pandas_udf surface is driver-attested via
    # multimodal_binary_metadata + normalize_per_user
))


def _ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(emb, k=_K)


register(QuerySpec(
    name="cosine_topk_ivf",
    spark_fn=_ivf_topk,
    oracle=ivf_topk_sql(k=_K),
    covers=("similarity-ivf", "ann"),
    extended=True,  # ANN scale path driver-attested by cosine_topk_lsh
))


_PLANES = lsh_hyperplanes(dim=64, n_planes=8, seed=42)


def _lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return lsh_topk(emb, k=_K, n_planes=8, dim=64, seed=42)


register(QuerySpec(
    name="cosine_topk_lsh",
    spark_fn=_lsh_topk,
    oracle=lsh_topk_sql(_PLANES, k=_K),
    covers=("similarity-lsh", "ann"),
))


# --- ANN recall measurement (LSH top-k vs exact top-k, both oracle'd) --------
#
# The number every ANN deployment watches: recall@k of the bucketed
# path against brute force. Both sides are exactly SQL-expressible
# (the oracle shares the seeded plane literals), so the measured
# recall itself is hash-checked -- not a hand-waved bound.
#
# Expectation setting: the synthetic embeddings are i.i.d. word-soup
# vectors with NO cluster structure, the known worst case for bucketed
# ANN -- a random query's true top-k are spread uniformly over
# buckets, so single-table recall ~ bucket_size/N (measured 0.019 at
# 8 planes; the hash check pins that exact value). This is the
# measurement tool doing its job, not the operator failing: on
# clustered real embeddings recall climbs with structure, and the
# HIGH-similarity regime the LSH actually serves (near-dup at
# cos >= threshold) is separately driver-attested at full recall by
# dedup_embedding_cosine's multi-table OR-amplified variant.

_RECALL_QUERIES = 200  # query set: vec_id < 200


def _ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _RECALL_QUERIES)
    exact = cosine_topk(queries, emb, k=_K).select(
        "query_id", "neighbor_id"
    )
    ann = (
        lsh_topk(emb, k=_K, n_planes=8, dim=64, seed=42)
        .filter(F.col("query_id") < _RECALL_QUERIES)
        .select("query_id", "neighbor_id")
    )
    hits = exact.join(ann, ["query_id", "neighbor_id"], "left_semi")
    return (
        exact.agg(F.count(F.lit(1)).alias("n_exact"))
        .crossJoin(hits.agg(F.count(F.lit(1)).alias("n_hits")))
        .select(
            "n_exact",
            "n_hits",
            F.round(F.col("n_hits") / F.col("n_exact"), 6).alias(
                "recall_at_k"
            ),
        )
    )


def _ann_recall_oracle() -> str:
    exact = cosine_topk_sql(
        k=_K, query_filter=f"id < {_RECALL_QUERIES}"
    )
    ann = lsh_topk_sql(_PLANES, k=_K)
    return f"""
        WITH exact AS ({exact}),
        ann AS ({ann}),
        hits AS (
            SELECT COUNT(*) AS c
            FROM exact e JOIN ann a
              ON e.query_id = a.query_id
             AND e.neighbor_id = a.neighbor_id
            WHERE a.query_id < {_RECALL_QUERIES}
        )
        SELECT (SELECT COUNT(*) FROM exact) AS n_exact,
               (SELECT c FROM hits) AS n_hits,
               ROUND((SELECT c FROM hits) * 1.0 /
                     (SELECT COUNT(*) FROM exact), 6) AS recall_at_k
    """


register(QuerySpec(
    name="ann_recall_at_k",
    spark_fn=_ann_recall,
    oracle=_ann_recall_oracle,
    covers=("ann-recall", "similarity-eval"),
    extended=True,
))


# --- embedding-cosine near-dup pairs (dedup by embedding similarity) --------

_NEAR_DUP_SIM = 0.35  # p99.9 of the word-soup cosine distribution


def _embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed candidates + exact cosine rescore -- the operator
    is sub-quadratic (equi-join on (table, bucket), never an all-pairs
    crossJoin); the oracle shares the seeded plane literals so the
    candidate set is hash-matched, not just the survivors."""
    from ..operators.similarity import embedding_near_dup_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(emb, threshold=_NEAR_DUP_SIM)


register(QuerySpec(
    name="dedup_embedding_cosine",
    spark_fn=_embedding_near_dup,
    oracle=embedding_near_dup_sql(_NEAR_DUP_SIM),
    covers=("dedup-embedding-cosine", "ann-lsh"),
))


# --- per-label embedding stats (F.aggregate / zip_with surface) -------------

def _label_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    sqnorm = F.round(dot(v, v), 6)
    # exact integer-scaled mean of the (rounded) per-row squared norms
    return (
        emb.select("label", sqnorm.alias("sqn"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            (
                F.sum(F.round(F.col("sqn") * 1e6).cast("long")) / 1e6
                / F.count(F.lit(1))
            ).alias("avg_sq_norm"),
        )
    )


register(QuerySpec(
    name="embedding_label_stats",
    spark_fn=_label_stats,
    oracle="""
        WITH per_vec AS (
            SELECT label,
                   ROUND(list_dot_product(CAST(embedding AS DOUBLE[]),
                                          CAST(embedding AS DOUBLE[])), 6)
                       AS sqn
            FROM embeddings
        )
        SELECT label, COUNT(*) AS n_vecs,
               SUM(CAST(ROUND(sqn * 1000000.0) AS BIGINT)) / 1000000.0
                   / COUNT(*) AS avg_sq_norm
        FROM per_vec
        GROUP BY label
    """,
    covers=("embedding-stats",),
))


# --- multimodal: opaque binary payload + metadata plumbing -------------------

def _multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    payloads = with_binary_payload(docs, "text", "payload")
    return decode_binary_metadata(payloads, "payload", id_col="doc_id")


register(QuerySpec(
    name="multimodal_binary_metadata",
    spark_fn=_multimodal,
    # first_byte is the first byte of the UTF-8 payload. DuckDB can't
    # index into a BLOB as an integer, but the leading UTF-8 byte is a
    # pure function of the first character's code point -- computed
    # byte-faithfully below (1/2/3/4-byte sequence prefixes), so parity
    # holds for non-ASCII corpora too.
    oracle="""
        SELECT doc_id,
               octet_length(encode(text)) AS n_bytes,
               CASE WHEN length(text) = 0 THEN NULL
                    WHEN unicode(text) < 128 THEN unicode(text)
                    WHEN unicode(text) < 2048
                        THEN 192 + unicode(text) // 64
                    WHEN unicode(text) < 65536
                        THEN 224 + unicode(text) // 4096
                    ELSE 240 + unicode(text) // 262144
               END AS first_byte,
               md5(text) AS content_md5
        FROM documents
    """,
    covers=("multimodal-binary", "pandas-udf"),
))
