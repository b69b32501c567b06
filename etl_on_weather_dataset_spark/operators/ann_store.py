"""Persistent IVF index store: build -> append -> probe.

The production maintenance cycle of a serving ANN index: train the
coarse quantizer ONCE on a build corpus, then keep ingesting new
vector batches WITHOUT retraining (faiss's ``add`` on a trained
index), and serve top-k queries from the committed index. At 100 TB
this is the only viable shape -- re-running Lloyd over the full
corpus per ingestion batch is a full-scan job, while appending is one
assignment pass over just the batch (broadcast centroid literals, no
shuffle wider than (id, cluster, v)).

Storage follows the repo's versioned-store discipline
(operators/versioned.py -- same layout, markers, replay ledger and
keep-last-N vacuum as the rollup store):

    store_path/
      v1/centroids.parquet   v1/cells.parquet   v1/batches.parquet
      v1/_COMMITTED
      v2/...

``centroids.parquet`` freezes the trained centroids (cluster id +
exact double components -- parquet round-trips IEEE doubles, so
appends assign against bit-identical literals to the build).
``cells.parquet`` is the inverted file: (id, cluster, v) -- the cells
carry the vectors, so serving never touches the source table.
``batches.parquet`` is the applied-batch replay ledger: re-appending
a recorded batch id returns the store untouched (exactly-once
appends on at-least-once drivers, the foreachBatch contract).

Drift honesty: appended vectors are quantized by the BUILD-time
partition. As the ingested distribution drifts, cell balance and
probe recall degrade -- monitor cell sizes (one groupBy on the cells
table) and rebuild when skew crosses a threshold; the versioned
layout makes the rebuild a new store published atomically.

Exactness: assignment uses the SAME micro-snapped argmin as
operators/cluster.py `_assign` (ROUND(d * 1e6) BIGINT before the
argmin; unrolled-fold dot products in the oracle), so every cell
assignment, probe list, and top-k row is reproducible bit-for-bit
against the DuckDB twin (plans/queries_similarity.py
``ivf_store_scenario``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .cluster import MICRO, kmeans_fit
from .similarity import SIM_DECIMALS, _as_double, _with_constant_row, dot
from .versioned import commit, current_version, vacuum


def _snapped_dists(cents_col):
    """Array of micro-snapped shifted L2 distances ||c||^2 - 2<v,c>
    against the ``v`` column -- identical to cluster._assign."""
    return F.transform(
        cents_col,
        lambda c: F.round(
            (dot(c, c) - 2 * dot(F.col("v"), c)) * MICRO
        ).cast("long"),
    )


def _assign_frozen(
    vecs: DataFrame, cents: list[list[float]], n_probe: int = 1
) -> DataFrame:
    """(id, v, cluster[, probe_rank]) against FROZEN centroid
    literals. ``n_probe=1`` is the ingest path (one row per vector,
    first-min tie-break); ``n_probe>1`` is the query path (the
    n_probe nearest cells per vector, ranked)."""
    spark = vecs.sparkSession
    cent_df = spark.createDataFrame(
        [(cents, 0)], "cents array<array<double>>, __k long"
    )
    joined = _with_constant_row(vecs, cent_df, "id").withColumn(
        "__d", _snapped_dists(F.col("cents"))
    )
    if n_probe == 1:
        return (
            joined.withColumn(
                "cluster",
                (
                    F.array_position(F.col("__d"), F.array_min("__d")) - 1
                ).cast("int"),
            )
            .drop("cents", "__d")
        )
    w = Window.partitionBy("id").orderBy(
        F.col("dm").asc(), F.col("cluster").asc()
    )
    return (
        joined.select(
            "id", "v",
            F.posexplode("__d").alias("pos", "dm"),
        )
        .withColumn("cluster", F.col("pos").cast("int"))
        .withColumn("probe_rank", F.row_number().over(w))
        .filter(F.col("probe_rank") <= n_probe)
        .select("id", "v", "cluster", "probe_rank")
    )


def _read_version(
    spark: SparkSession, store_path: str
) -> tuple[DataFrame | None, DataFrame | None, DataFrame | None, int]:
    """(centroids, cells, batches, version) of the newest committed
    version; (None, None, None, 0) for an empty store."""
    v = current_version(spark, store_path)
    if v == 0:
        return None, None, None, 0
    base = f"{store_path}/v{v}"
    return (
        spark.read.parquet(f"{base}/centroids.parquet"),
        spark.read.parquet(f"{base}/cells.parquet"),
        spark.read.parquet(f"{base}/batches.parquet"),
        v,
    )


def _write_version(
    spark: SparkSession,
    store_path: str,
    version: int,
    centroids: DataFrame,
    cells: DataFrame,
    batches: DataFrame,
    keep_versions: int | None,
) -> None:
    base = f"{store_path}/v{version}"
    centroids.write.mode("overwrite").parquet(f"{base}/centroids.parquet")
    cells.write.mode("overwrite").parquet(f"{base}/cells.parquet")
    batches.write.mode("overwrite").parquet(f"{base}/batches.parquet")
    commit(spark, base)
    if keep_versions is not None:
        vacuum(spark, store_path, keep_last=keep_versions)


def ivf_index_build(
    spark: SparkSession,
    vecs: DataFrame,
    store_path: str,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    seed: int = 7,
    keep_versions: int | None = None,
) -> int:
    """Train the coarse quantizer on ``vecs`` (engine-exact Lloyd,
    operators/cluster.py), assign the build corpus, and publish v1
    (or v{current+1} -- a REBUILD on a drifted store). Returns the
    published version number.

    A rebuild RESETS the replay ledger (the new version's corpus is
    exactly ``vecs``; prior batch ids refer to state that no longer
    exists). Streaming ingesters must therefore restart from a fresh
    checkpoint after a rebuild -- re-using the old checkpoint would
    let a re-delivered batch that is already inside ``vecs`` be
    appended twice."""
    prepped = vecs.select(
        F.col(id_col).alias("id"), _as_double(vec_col).alias("v")
    )
    cents = kmeans_fit(vecs, k=k, iters=iters, id_col=id_col,
                       vec_col=vec_col, dim=dim, seed=seed)
    cent_df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)],
        "cluster int, cent array<double>",
    )
    cells = _assign_frozen(prepped, cents)
    batches = spark.createDataFrame([("__build__",)], "batch_id string")
    new_v = current_version(spark, store_path) + 1
    _write_version(spark, store_path, new_v, cent_df, cells, batches,
                   keep_versions)
    return new_v


def ivf_index_append(
    spark: SparkSession,
    new_vecs: DataFrame,
    store_path: str,
    batch_id: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_versions: int | None = None,
) -> int:
    """Append one ingestion batch to the committed index WITHOUT
    retraining: assign the batch against the frozen centroids and
    publish cells' = cells + batch as the next version. Replaying a
    recorded ``batch_id`` is a no-op (returns the current version).
    """
    cent_df, cells, batches, version = _read_version(spark, store_path)
    if cent_df is None:
        raise ValueError(
            f"no committed index at {store_path}; run ivf_index_build"
        )
    if batch_id in {r.batch_id for r in
                    batches.select("batch_id").collect()}:
        return version  # replay: batch already in the index
    cents = [
        list(r.cent)
        for r in sorted(cent_df.collect(), key=lambda r: r.cluster)
    ]
    prepped = new_vecs.select(
        F.col(id_col).alias("id"), _as_double(vec_col).alias("v")
    )
    appended = cells.unionByName(
        _assign_frozen(prepped, cents).select("id", "v", "cluster")
    )
    new_batches = batches.select("batch_id").unionAll(
        spark.createDataFrame([(batch_id,)], "batch_id string")
    )
    _write_version(spark, store_path, version + 1, cent_df, appended,
                   new_batches, keep_versions)
    return version + 1


def ivf_index_query(
    spark: SparkSession,
    queries: DataFrame,
    store_path: str,
    k: int = 5,
    n_probe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k cosine neighbors per query from the committed index:
    probe the ``n_probe`` nearest cells (same snapped-L2 rule the
    cells were built with), score only their members, exact-rescore
    with the house rounding + tie-break. Returns
    (query_id, neighbor_id, sim, rk)."""
    cent_df, cells, _, version = _read_version(spark, store_path)
    if cent_df is None:
        raise ValueError(
            f"no committed index at {store_path}; run ivf_index_build"
        )
    cents = [
        list(r.cent)
        for r in sorted(cent_df.collect(), key=lambda r: r.cluster)
    ]
    qv = queries.select(
        F.col(id_col).alias("id"), _as_double(vec_col).alias("v")
    )
    probes = _assign_frozen(qv, cents, n_probe=n_probe).select(
        F.col("id").alias("query_id"), F.col("v").alias("qv"), "cluster"
    ).withColumn("qn", F.sqrt(dot(F.col("qv"), F.col("qv"))))
    members = cells.select(
        F.col("id").alias("neighbor_id"), F.col("v").alias("cv"),
        "cluster",
    ).withColumn("cn", F.sqrt(dot(F.col("cv"), F.col("cv"))))
    sim = F.round(
        dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")),
        SIM_DECIMALS,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        probes.join(members, "cluster")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("sim"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "sim", "rk")
    )
