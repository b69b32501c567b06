#!/usr/bin/env python
"""One-time sf1 bench (round-7 verdict item 8): run the headline
bench queries at a locally-generated sf1 (10x sf0.1) DATABASE --
all ten tables, not just documents -- and record per-query
sf0.1 -> sf1 wall ratios next to the synthetic 10x smoke.

Generation: each sf0.1 table is replicated 10x with deterministic key
remapping so every replica is a DISJOINT sub-database (all join keys
offset together; spec-bounded dims region/nation are kept single-copy
and referenced unchanged). Content columns are decorrelated per
replica where identity would distort an operator's workload:

- documents.text: every token gets a replica suffix (w -> w<r>), so
  the vocabulary grows 10x and cross-replica shingle/minhash
  collisions vanish -- within-replica planted near-dups survive
  intact, and the dedup tiers see 10x corpus at the SAME per-replica
  structure (replicating text verbatim would instead plant 10-cliques
  of exact dups everywhere, a different workload);
- embeddings.embedding: component j of replica r is shifted by a
  deterministic r-dependent offset, decorrelating replicas while
  keeping within-replica clone pairs at cosine ~0.999.

Timing protocol: one warm-up + one timed run per query (this is a
one-time curvature check, not a trend line -- the per-round n=5
median protocol stays in bench.py). Ratios compare against the same
protocol run at sf0.1 in the SAME session, so the cold-start constant
cancels.

Usage: python tools/sf1_bench.py [--dir /tmp/spark_graft_sf1_db]
                                  [--only substr]
Prints one row per bench query; paste the table into SF1.md.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

BASE = "/root/testdata/sf0.1"
REPLICAS = 10
OFF = 100_000_000  # key offset per replica; far above any sf0.1 key

# table -> columns to offset by replica * OFF (disjoint sub-databases)
KEY_COLS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SINGLE_COPY = ("region", "nation")


def generate(spark, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for t in SINGLE_COPY:
        dst = os.path.join(out_dir, f"{t}.parquet")
        if not os.path.exists(dst):
            spark.read.parquet(
                os.path.join(BASE, f"{t}.parquet")
            ).write.mode("overwrite").parquet(dst)
    for t, keys in KEY_COLS.items():
        dst = os.path.join(out_dir, f"{t}.parquet")
        if os.path.exists(dst):
            continue
        src = spark.read.parquet(os.path.join(BASE, f"{t}.parquet"))
        rep = src.crossJoin(
            spark.range(REPLICAS).select(F.col("id").alias("_r"))
        )
        for k in keys:
            rep = rep.withColumn(
                k, (F.col(k) + F.col("_r") * OFF).cast("long")
            )
        if t == "documents":
            # replica-suffixed vocabulary: decorrelates shingle space
            rep = rep.withColumn(
                "text",
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda w: F.concat(
                            w, F.col("_r").cast("string")
                        ),
                    ),
                    " ",
                ),
            ).withColumn("n_chars", F.length("text"))
        if t == "embeddings":
            rep = rep.withColumn(
                "embedding",
                F.transform(
                    F.col("embedding"),
                    lambda x, j: (
                        x
                        + (
                            F.pmod(
                                F.col("_r") * 31 + j, F.lit(7)
                            ).cast("float")
                            - F.lit(3.0)
                        )
                        * F.lit(0.05)
                    ).cast("float"),
                ),
            )
        rep.drop("_r").repartition(64).write.mode(
            "overwrite"
        ).parquet(dst)
        print(f"generated {t}", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/spark_graft_sf1_db")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    from etl_on_weather_dataset_spark.operators.caching import (
        release_all,
    )
    from etl_on_weather_dataset_spark.plans.registry import (
        bench_queries,
    )
    from etl_on_weather_dataset_spark.session import get_spark

    spark = get_spark(app_name="sf1-bench")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    generate(spark, args.dir)
    print(f"sf1 database ready in {time.time() - t0:.1f}s", flush=True)

    qs = bench_queries()
    if args.only:
        qs = {n: f for n, f in qs.items() if args.only in n}
        if not qs:
            # curvature checks on non-bench registry queries (the
            # SF1.md discipline covers every super-unit 10x smoke,
            # bench entry or not)
            from etl_on_weather_dataset_spark.plans.registry import (
                all_queries,
            )

            qs = {
                n: f for n, f in all_queries().items() if args.only in n
            }
    print(f"{'query':<32} {'sf0.1':>8} {'sf1':>8} {'ratio':>6}",
          flush=True)
    for name, fn in sorted(qs.items()):
        try:
            fn(spark, BASE).count()  # warm-up
            t0 = time.time()
            fn(spark, BASE).count()
            t_small = time.time() - t0
            release_all()
            fn(spark, args.dir).count()  # warm-up
            t0 = time.time()
            fn(spark, args.dir).count()
            t_big = time.time() - t0
            release_all()
            print(
                f"{name:<32} {t_small:>7.1f}s {t_big:>7.1f}s "
                f"{t_big / t_small:>5.1f}x",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001 -- report, keep going
            print(f"{name:<32} ERROR {type(e).__name__}: {e}",
                  flush=True)
            release_all()
    spark.stop()


if __name__ == "__main__":
    main()
