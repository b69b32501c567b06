"""One-shot parity check for the round-13 batched PQ codebook
training: the fused one-aggregate-per-round pq_trained_codebooks must
reproduce, float-for-float, the books the previous shape (one
sequential cluster._lloyd run per subspace) computed.

Usage: python tools/pq_trained_parity.py [--sf /root/testdata/sf0.001]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--m-sub", type=int, default=8)
    ap.add_argument("--k-codes", type=int, default=16)
    ap.add_argument("--iters", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from etl_on_weather_dataset_spark.operators.caching import persisted
    from etl_on_weather_dataset_spark.operators.cluster import _lloyd
    from etl_on_weather_dataset_spark.operators.similarity import (
        _as_double,
        _centroid_argmax,
        _with_constant_row,
        lsh_hyperplanes,
        pq_trained_codebooks,
    )
    from etl_on_weather_dataset_spark.schemas import load_table
    from etl_on_weather_dataset_spark.session import get_spark

    spark = get_spark(app_name="pq_trained_parity")
    spark.sparkContext.setLogLevel("ERROR")
    df = load_table(spark, args.sf, "embeddings")
    dim, n_cells, seed = 64, 16, 7
    d_sub = dim // args.m_sub

    # --- the OLD shape: one sequential Lloyd per subspace ---
    centroids = lsh_hyperplanes(dim, n_cells, seed)
    const_df = spark.createDataFrame(
        [(centroids, 0)], "cents array<array<double>>, __k long"
    )
    vecs = _with_constant_row(
        df.select(F.col("vec_id").alias("id"),
                  _as_double("embedding").alias("v")),
        const_df,
        "id",
    ).withColumn("cell", _centroid_argmax(F.col("v"), F.col("cents")))
    rv = persisted(
        vecs.select(
            "id",
            F.zip_with(
                F.col("v"),
                F.element_at(F.col("cents"), F.col("cell") + 1),
                lambda x, y: x - y,
            ).alias("rv"),
        )
    )
    old_books = []
    for m in range(args.m_sub):
        sub = rv.select(
            "id", F.slice(F.col("rv"), m * d_sub + 1, d_sub).alias("v")
        )
        old_books.append(
            _lloyd(sub, args.k_codes, args.iters, d_sub,
                   seed + 101 * (m + 1))
        )

    # --- the NEW shape: one aggregate per round ---
    new_books = pq_trained_codebooks(
        df, m_sub=args.m_sub, k_codes=args.k_codes,
        train_iters=args.iters,
    )

    ok = old_books == new_books
    print(f"books equal (exact ==): {ok}")
    if not ok:
        for m, (o, n) in enumerate(zip(old_books, new_books)):
            if o != n:
                print(f"  subspace {m} differs")
                print(f"    old[0][:4]={o[0][:4]}")
                print(f"    new[0][:4]={n[0][:4]}")
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
