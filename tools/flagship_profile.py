"""Stage-level wall profile of the two composed flagships (round-9
verdict item 6): where do embedding_pipeline_stats and
curation_pipeline_stats actually spend their seconds at sf0.1?

Each flagship is re-run with explicit barriers after each macro-stage
(count() on the stage boundary), so the per-stage walls decompose the
bench entry's single-action total into validate / dedup / cluster /
audit legs. Numbers are diagnostic (one warm-up + one timed pass,
idle-box protocol) -- the per-round trend stays in bench.py.

Usage: python tools/flagship_profile.py [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from etl_on_weather_dataset_spark.operators.caching import release_all
    from etl_on_weather_dataset_spark.plans.registry import bench_queries
    from etl_on_weather_dataset_spark.schemas import load_table
    from etl_on_weather_dataset_spark.session import get_spark

    spark = get_spark()

    def timed(label: str, fn) -> None:
        t = time.time()
        out = fn()
        print(f"  {label:<28} {time.time() - t:7.2f}s  -> {out}")

    # --- whole-query baselines (warm-up + timed), the bench numbers ---
    for name in ("embedding_pipeline_stats", "curation_pipeline_stats"):
        q = bench_queries()[name]
        q(spark, args.sf).collect()
        release_all()
        t = time.time()
        q(spark, args.sf).collect()
        print(f"{name}: whole-query {time.time() - t:.2f}s")
        release_all()

    # --- embedding pipeline, stage-barriered ---
    print("embed_curate stages:")
    from etl_on_weather_dataset_spark.plans.embedding_pipeline import (
        EMB_DIM,
        KMEANS_ITERS,
        KMEANS_K,
        SEM_CELLS,
        SEM_THRESHOLD,
    )
    from etl_on_weather_dataset_spark.operators.cluster import (
        kmeans_assignments,
    )
    from etl_on_weather_dataset_spark.operators.similarity import (
        dot,
        semdedup,
    )

    emb = load_table(spark, args.sf, "embeddings")
    v = F.col("embedding")
    valid = emb.filter(
        v.isNotNull() & (F.size(v) == EMB_DIM)
        & (dot(v.cast("array<double>"), v.cast("array<double>")) > 0)
    ).select("vec_id", "embedding")
    timed("validate+count", lambda: valid.count())
    sem = semdedup(valid, SEM_THRESHOLD, n_cells=SEM_CELLS,
                   id_col="vec_id", vec_col="embedding", dim=EMB_DIM)
    timed("semdedup", lambda: sem.filter(F.col("keep")).count())
    surv = valid.join(
        sem.filter(F.col("keep")).select(F.col("id").alias("vec_id")),
        "vec_id", "left_semi",
    )
    timed("kmeans(2 iters)+assign", lambda: kmeans_assignments(
        surv, k=KMEANS_K, iters=KMEANS_ITERS,
        id_col="vec_id", vec_col="embedding", dim=EMB_DIM,
    ).count())
    release_all()

    # --- curation pipeline, stage-barriered ---
    print("curate stages:")
    from etl_on_weather_dataset_spark.operators import text as T
    from etl_on_weather_dataset_spark.operators.dedup import (
        dedup_components,
        ngram_jaccard_pairs,
    )
    from etl_on_weather_dataset_spark.plans.curation import (
        JACCARD_N,
        JACCARD_T,
        QUALITY_STAGE,
    )

    docs = load_table(spark, args.sf, "documents").select(
        "doc_id", "text"
    )
    passed = docs.filter(T.quality_flags("text")[QUALITY_STAGE] == 1)
    red = passed.select("doc_id", T.redact_pii("text").alias("text"))
    timed("quality+redact", lambda: red.count())
    fp = red.withColumn("fp", T.fingerprint("text"))
    keep = fp.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    exact = fp.join(keep, ["fp", "doc_id"], "left_semi").drop("fp")
    timed("exact_dedup", lambda: exact.count())
    pairs = ngram_jaccard_pairs(
        exact, "text", "doc_id", n=JACCARD_N, threshold=JACCARD_T
    )
    timed("jaccard_pairs", lambda: pairs.count())
    timed("components", lambda: dedup_components(pairs).count())
    release_all()
    spark.stop()


if __name__ == "__main__":
    main()
