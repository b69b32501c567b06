"""Action-level wall profile of the component-store day-2 merge (the
round-13 top bench row): which scheduled action owns the seconds?

Replays _component_store_bench's exact sequence with a timer around
every scheduled action inside merge_component_batch + the summary
collect. Diagnostic (idle-box, warm-up + N reps); the trend number
stays in bench.py.

Usage: python tools/cstore_profile.py [--sf /root/testdata/sf0.1] [-n 5]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("-n", type=int, default=5)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from etl_on_weather_dataset_spark.operators.caching import (
        persisted,
        release_all,
        untrack,
    )
    from etl_on_weather_dataset_spark.operators.component_store import (
        _bucket,
        component_store_summary,
        merge_component_batch,
        read_component_store,
    )
    from etl_on_weather_dataset_spark.operators.dedup import dedup_components
    from etl_on_weather_dataset_spark.operators.versioned import fs_for
    from etl_on_weather_dataset_spark.plans.queries_pipeline import (
        _cs_day1_edges,
        _cs_day2_edges,
    )
    from etl_on_weather_dataset_spark.schemas import load_table
    from etl_on_weather_dataset_spark.session import get_spark

    spark = get_spark(app_name="cstore_profile", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    orders = load_table(spark, args.sf, "orders")

    base = tempfile.mkdtemp(prefix="cstore_prof_")
    pristine = f"{base}/day1"
    merge_component_batch(spark, _cs_day1_edges(orders), pristine)

    def one_rep(tag: str) -> dict[str, float]:
        t: dict[str, float] = {}
        store_path = f"{base}/run"
        shutil.rmtree(store_path, ignore_errors=True)
        shutil.copytree(pristine, store_path)
        pairs = _cs_day2_edges(orders).select(
            F.col("id_a"), F.col("id_b")
        )
        t0 = time.perf_counter()
        store = read_component_store(spark, store_path)
        endpoints = (
            pairs.select(F.col("id_a").alias("id"))
            .unionAll(pairs.select(F.col("id_b").alias("id")))
            .distinct()
        )
        touched = persisted(
            store.join(endpoints, "id", "left_semi")
            .select("component")
            .distinct()
        )
        members = store.join(touched, "component", "left_semi")
        graph = members.select(
            F.col("id").alias("id_a"), F.col("component").alias("id_b")
        ).unionAll(pairs)
        t["setup(lazy)"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        labels = dedup_components(
            graph, skip_empty_check=True, check_every=4
        )
        t["propagation+count"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        labels = labels.localCheckpoint(eager=True)
        t["localCheckpoint"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        new_rows = labels.withColumn("bucket", _bucket("component"))
        affected_buckets = (
            touched.select(_bucket("component").alias("bucket"))
            .unionAll(new_rows.select("bucket"))
            .distinct()
        )
        bucks = [b for (b,) in affected_buckets.collect()]
        t["buckets_collect"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        carried = (
            store.withColumn("bucket", _bucket("component"))
            .join(affected_buckets, "bucket", "left_semi")
            .join(touched, "component", "left_anti")
            .select("id", "component", "bucket")
        )
        fs, _, jvm = fs_for(spark, store_path)
        stage = f"{store_path}/_staged_rewrite"
        (
            new_rows.select("id", "component", "bucket")
            .unionByName(carried)
            .repartition("bucket")
            .write.partitionBy("bucket")
            .mode("overwrite")
            .parquet(stage)
        )
        t["staged_write"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        hpath = jvm.org.apache.hadoop.fs.Path
        for b in bucks:
            fs.delete(hpath(f"{store_path}/bucket={b}"), True)
            staged_bucket = hpath(f"{stage}/bucket={b}")
            if fs.exists(staged_bucket):
                fs.rename(
                    staged_bucket, hpath(f"{store_path}/bucket={b}")
                )
        fs.delete(hpath(stage), True)
        touched.unpersist()
        untrack(touched)
        t["fs_swap"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        [row] = component_store_summary(spark, store_path).collect()
        t["summary_collect"] = time.perf_counter() - t0
        t["TOTAL"] = sum(v for k, v in t.items() if k != "TOTAL")
        release_all()
        return t

    one_rep("warmup")
    keys = None
    acc: dict[str, list[float]] = {}
    for i in range(args.n):
        t = one_rep(f"rep{i}")
        for k, v in t.items():
            acc.setdefault(k, []).append(v)
    import statistics
    print(f"{'step':<20} {'med':>7} {'min':>7}")
    for k, vs in acc.items():
        print(f"{k:<20} {statistics.median(vs):7.3f} {min(vs):7.3f}")
    shutil.rmtree(base, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
