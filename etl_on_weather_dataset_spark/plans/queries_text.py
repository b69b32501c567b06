"""Text-analysis + dedup queries over the `documents` table
(north-star par.2b operators as first-class registry entries)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import text as T
from ..operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    ngram_jaccard_pairs_sql,
    simhash_band_pairs,
)
from ..schemas import load_table
from .registry import QuerySpec, register


# --- exact dedup -------------------------------------------------------------

def _exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The synthetic corpus is dup-free; union a deterministic mutated
    # copy (docs with even id re-appear under a new id) so the operator
    # has real work to do.
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dups = docs.filter(F.col("doc_id") % 2 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    return exact_dedup(docs.unionAll(dups))


register(QuerySpec(
    name="dedup_exact_text",
    spark_fn=_exact_dedup,
    oracle=f"""
        WITH corpus AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 1000000 AS doc_id, text
            FROM documents WHERE doc_id % 2 = 0
        )
        SELECT {T.fingerprint_sql('text')} AS fp,
               MIN(doc_id) AS keep_id,
               COUNT(*) AS n_dups
        FROM corpus
        GROUP BY 1
    """,
    covers=("dedup-exact",),
    bench=True,
))


# --- n-gram Jaccard near-dup ---------------------------------------------------

_JACCARD_N = 3
_JACCARD_T = 0.2


def _jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(
        docs, "text", "doc_id", n=_JACCARD_N, threshold=_JACCARD_T
    ).select("id_a", "id_b", "inter", F.round("jaccard", 6).alias("jaccard"))


register(QuerySpec(
    name="dedup_ngram_jaccard",
    spark_fn=_jaccard_pairs,
    oracle=f"""
        SELECT id_a, id_b, inter, ROUND(jaccard, 6) AS jaccard FROM (
            {ngram_jaccard_pairs_sql('documents', 'text', 'doc_id',
                                     _JACCARD_N, _JACCARD_T)}
        )
    """,
    covers=("dedup-near", "inverted-index-join"),
    bench=True,
))


# --- SimHash (rows-only: xxhash64 has no DuckDB twin) -------------------------

def _simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return simhash_band_pairs(docs, "text", "doc_id", n_bands=4)


register(QuerySpec(
    name="dedup_simhash_bands",
    spark_fn=_simhash_pairs,
    oracle=None,  # xxhash64-based; no SQL twin -- rows-only check
    covers=("dedup-simhash",),
))


# --- MinHash LSH (rows-only: MLlib, not SQL-expressible) ----------------------

def _minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Uncapped: minhash over 3-word SHINGLES (not unigrams) keeps the
    # banded candidate set sub-quadratic even on this tiny-vocabulary
    # corpus (see operator docstring). distance 0.8 = shingle-Jaccard
    # >= 0.2, the same near-dup bar as dedup_ngram_jaccard -- the two
    # tiers are directly comparable: this one trades exactness for a
    # minhash signature pass that never materializes the shingle sets
    # into the join.
    docs = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs, "text", "doc_id", max_distance=0.8)


register(QuerySpec(
    name="dedup_minhash_lsh",
    spark_fn=_minhash_pairs,
    oracle=None,
    covers=("dedup-minhash-lsh",),
    bench=True,
))


# --- text statistics / quality scoring ----------------------------------------

def _text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "lang",
        F.length("text").alias("len"),
        T.token_count("text").alias("n_tokens"),
        T.distinct_token_count("text").alias("n_distinct"),
        T.stopword_ratio("text").alias("sw_ratio"),
        (F.length("text") == F.col("n_chars")).cast("int").alias("len_ok"),
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.avg("n_tokens"), 6).alias("avg_tokens"),
        F.round(F.avg(F.col("n_distinct") / F.col("n_tokens")), 6).alias(
            "avg_ttr"
        ),
        F.round(F.avg("sw_ratio"), 6).alias("avg_sw_ratio"),
        F.sum("len_ok").alias("n_len_ok"),
    )


register(QuerySpec(
    name="text_quality_stats",
    spark_fn=_text_stats,
    oracle=f"""
        WITH per_doc AS (
            SELECT lang,
                   length(text) AS len,
                   len(regexp_split_to_array(text, ' +')) AS n_tokens,
                   len(list_distinct(regexp_split_to_array(text, ' +')))
                       AS n_distinct,
                   {T.stopword_ratio_sql('text')} AS sw_ratio,
                   CASE WHEN length(text) = n_chars THEN 1 ELSE 0 END
                       AS len_ok
            FROM documents
        )
        SELECT lang,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               ROUND(AVG(n_tokens), 6) AS avg_tokens,
               ROUND(AVG(n_distinct * 1.0 / n_tokens), 6) AS avg_ttr,
               ROUND(AVG(sw_ratio), 6) AS avg_sw_ratio,
               CAST(SUM(len_ok) AS BIGINT) AS n_len_ok
        FROM per_doc
        GROUP BY lang
    """,
    covers=("text-quality", "token-count"),
    bench=True,
))


# --- language-ID heuristic ------------------------------------------------------

def _lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("lang", T.lang_id("text").alias("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


register(QuerySpec(
    name="lang_id_confusion",
    spark_fn=_lang_id,
    oracle=f"""
        SELECT lang, {T.lang_id_sql('text')} AS lang_pred,
               COUNT(*) AS n_docs
        FROM documents
        GROUP BY 1, 2
    """,
    covers=("lang-id",),
))


# --- document fingerprinting -----------------------------------------------------

def _fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.fingerprint("text").alias("fp"),
        T.shingle_fingerprint("text").alias("bag_fp"),
        T.rolling_fingerprint("text").alias("rolling_fp"),
        T.bpe_token_count("text").alias("n_bpe_tokens"),
    )


register(QuerySpec(
    name="doc_fingerprints",
    spark_fn=_fingerprints,
    oracle=f"""
        SELECT doc_id,
               {T.fingerprint_sql('text')} AS fp,
               {T.shingle_fingerprint_sql('text')} AS bag_fp,
               {T.rolling_fingerprint_sql('text')} AS rolling_fp,
               CAST({T.bpe_token_count_sql('text')} AS INTEGER)
                   AS n_bpe_tokens
        FROM documents
    """,
    covers=("fingerprint", "rolling-hash", "bpe-tokens"),
))


# --- token chunking (LLM training-data chunker) --------------------------------

_CHUNK_SIZE, _CHUNK_STRIDE = 50, 40


def _chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    c = F.explode(
        T.token_chunks("text", _CHUNK_SIZE, _CHUNK_STRIDE)
    ).alias("c")
    return docs.select("doc_id", c).select(
        "doc_id",
        F.col("c.chunk_id").alias("chunk_id"),
        F.size(F.split("c.chunk", " ")).alias("n_chunk_tokens"),
        F.md5(F.col("c.chunk")).alias("chunk_md5"),
    )


register(QuerySpec(
    name="chunk_documents",
    spark_fn=_chunks,
    oracle=f"""
        SELECT doc_id,
               c.chunk_id AS chunk_id,
               CAST(len(string_split(c.chunk, ' ')) AS INTEGER)
                   AS n_chunk_tokens,
               md5(c.chunk) AS chunk_md5
        FROM (
            SELECT doc_id,
                   unnest({T.token_chunks_sql('text', _CHUNK_SIZE,
                                              _CHUNK_STRIDE)}) AS c
            FROM documents
        )
    """,
    covers=("chunking", "udtf-like-explode"),
    bench=True,
))


# --- token histogram (explode + groupBy: the classic corpus wordcount) ----------

def _token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(T.tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )


register(QuerySpec(
    name="token_histogram",
    spark_fn=_token_histogram,
    oracle="""
        SELECT token, COUNT(*) AS n FROM (
            SELECT unnest(regexp_split_to_array(text, ' +')) AS token
            FROM documents
        )
        GROUP BY token
    """,
    covers=("tokenize", "explode"),
))
