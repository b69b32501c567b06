"""The embedding-side curation pipeline: third flagship composition
(the documents curation pipeline's twin for the `embeddings` domain).

    raw vectors
      -> validation            (non-null, right dimension, nonzero norm)
      -> semantic dedup        (SemDeDup: Voronoi cells -> within-cell
                                cosine edges -> components -> keep the
                                least-centroid-like member)
      -> k-means partition     (MLlib-free Lloyd; the trained cells a
                                downstream IVF index would search)

The audit trail is a tiny (stage, n_rows) table hash-checked against
ONE composed DuckDB oracle assembled from the same per-operator SQL
builders the individual queries use (semdedup_sql nested as a derived
CTE body, kmeans_ctes spliced into the same WITH clause).

Scale: validation is per-row codegen; SemDeDup's quadratic is
contained per cell (equi-join on cell id); Lloyd rounds shuffle
constant-width (cluster, dim) keys with map-side combine and collect
exactly k x dim integers per round. Nothing here joins unblocked
pairs. The stats fuse the same way curation.py's do: one aggregate per
scan-able boundary, cross-joined and unpivoted -- four actions total
(the valid/input pair shares one scan; semdedup survivors and the
cluster stats each need their own materialized boundary).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.cluster import kmeans_assignments, kmeans_ctes
from ..operators.similarity import dot, dot_sql, semdedup, semdedup_sql

EMB_DIM = 64
SEM_THRESHOLD = 0.9
SEM_CELLS = 32
KMEANS_K = 8
KMEANS_ITERS = 2


@dataclass
class EmbedCurationResult:
    clean: DataFrame        # surviving vectors: vec_id, embedding
    assignments: DataFrame  # vec_id, cluster under trained centroids
    stats: DataFrame        # (stage, n_rows) audit trail


def embed_curate(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> EmbedCurationResult:
    from ..operators.caching import persisted

    base = df.select(F.col(id_col).alias("vec_id"),
                     F.col(vec_col).alias("embedding"))
    v = F.col("embedding")
    is_valid = (
        v.isNotNull()
        & (F.size(v) == EMB_DIM)
        & (dot(v.cast("array<double>"), v.cast("array<double>")) > 0)
    )
    valid = base.filter(is_valid)

    sem = semdedup(valid, SEM_THRESHOLD, n_cells=SEM_CELLS,
                   id_col="vec_id", vec_col="embedding", dim=EMB_DIM)
    survivors = persisted(
        valid.join(
            sem.filter(F.col("keep")).select(
                F.col("id").alias("vec_id")
            ),
            "vec_id",
            "left_semi",
        )
    )
    assignments = persisted(
        kmeans_assignments(
            survivors, k=KMEANS_K, iters=KMEANS_ITERS,
            id_col="vec_id", vec_col="embedding", dim=EMB_DIM,
        ).select(F.col("id").alias("vec_id"), "cluster")
    )

    base_stats = base.agg(
        F.count(F.lit(1)).alias("_input"),
        F.coalesce(
            F.sum(is_valid.cast("long")), F.lit(0).cast("long")
        ).alias("_valid"),
    )
    sem_stats = survivors.agg(F.count(F.lit(1)).alias("_sem"))
    cl_counts = assignments.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    cl_stats = cl_counts.agg(
        F.count(F.lit(1)).alias("_nonempty"),
        F.coalesce(F.max("cnt"), F.lit(0).cast("long")).alias("_largest"),
    )

    def row(stage: str, col: str) -> F.Column:
        return F.struct(
            F.lit(stage).alias("stage"), F.col(col).alias("n_rows")
        )

    stats = (
        base_stats.crossJoin(sem_stats)
        .crossJoin(cl_stats)
        .select(
            F.explode(
                F.array(
                    row("input", "_input"),
                    row("valid", "_valid"),
                    row("sem_unique", "_sem"),
                    row("clusters_nonempty", "_nonempty"),
                    row("largest_cluster", "_largest"),
                )
            ).alias("s")
        )
        .select("s.stage", "s.n_rows")
    )
    return EmbedCurationResult(
        clean=survivors, assignments=assignments, stats=stats
    )


def embed_curation_stats_sql(table: str = "embeddings") -> str:
    """One composed DuckDB oracle for the audit trail. semdedup's
    own WITH RECURSIVE chain nests as the body of the `sem` CTE;
    the unrolled k-means chain splices into the outer WITH."""
    sem_inner = semdedup_sql(
        SEM_THRESHOLD, n_cells=SEM_CELLS, table="valid",
        id_col="vec_id", vec_col="embedding", dim=EMB_DIM,
    )
    km = kmeans_ctes(
        k=KMEANS_K, iters=KMEANS_ITERS, table="survivors",
        id_col="vec_id", vec_col="embedding", dim=EMB_DIM,
    )
    return f"""
        WITH valid AS (
            SELECT vec_id, embedding FROM {table}
            WHERE embedding IS NOT NULL
              AND len(embedding) = {EMB_DIM}
              AND {dot_sql('(CAST(embedding AS DOUBLE[]))',
                           '(CAST(embedding AS DOUBLE[]))')} > 0
        ), sem AS (
            {sem_inner}
        ), survivors AS (
            SELECT v.vec_id, v.embedding
            FROM valid v JOIN sem s ON v.vec_id = s.id
            WHERE s.keep
        ), {km},
        cl AS (
            SELECT cluster, COUNT(*) AS cnt FROM afinal GROUP BY cluster
        )
        SELECT 'input' AS stage, COUNT(*) AS n_rows FROM {table}
        UNION ALL
        SELECT 'valid', COUNT(*) FROM valid
        UNION ALL
        SELECT 'sem_unique', COUNT(*) FROM survivors
        UNION ALL
        SELECT 'clusters_nonempty', COUNT(*) FROM cl
        UNION ALL
        SELECT 'largest_cluster', COALESCE(MAX(cnt), 0) FROM cl
    """
