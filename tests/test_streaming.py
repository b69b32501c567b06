"""Streaming analogue tests: the tumbling rollup over a file-source
stream with Trigger.AvailableNow must equal the batch rollup over the
same data (batch/stream operator parity), and the batch sessionizer
must produce gap-consistent sessions.
"""

from __future__ import annotations

from etl_on_weather_dataset_spark.schemas import load_table
from etl_on_weather_dataset_spark.streaming.windows import (
    read_events_stream,
    run_available_now,
    sessionize_batch,
    windowed_rollup,
)

SF = "/root/testdata/sf0.001"


def test_stream_rollup_equals_batch(spark, tmp_path):
    events = load_table(spark, SF, "events")
    # land the (nanos-converted) events as a proper parquet directory
    landed = str(tmp_path / "landed")
    events.write.parquet(landed)

    batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["avg_value"])
        for r in windowed_rollup(
            spark.read.parquet(landed), extra_keys=["event_type"]
        ).collect()
    }

    stream_df = read_events_stream(
        spark, landed, spark.read.parquet(landed).schema
    )
    rollup = windowed_rollup(stream_df, extra_keys=["event_type"])
    q = run_available_now(
        rollup, str(tmp_path / "ckpt"), query_name="t_rollup"
    )
    assert q.lastProgress is not None
    streamed = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["avg_value"])
        for r in spark.sql("SELECT * FROM t_rollup").collect()
    }
    assert streamed == batch
    assert len(streamed) > 0


def test_watermark_drops_late_data(spark, tmp_path):
    """Late-data semantics: rows older than the watermark at batch
    start are dropped; rows late-but-within-watermark are admitted.
    Three AvailableNow runs share a checkpoint (watermark persists)."""
    import datetime as dt

    from pyspark.sql import functions as F

    land = tmp_path / "land"
    land.mkdir()
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    schema = "ts timestamp, value double"
    base = dt.datetime(2024, 1, 1, 0, 0, 0)

    def write_batch(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(land / name))

    def run_once():
        stream = spark.readStream.schema(schema).option(
            "pathGlobFilter", "*.parquet"
        ).parquet(str(land) + "/*")
        agg = (
            stream.withWatermark("ts", "30 minutes")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("ws"), "n")
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    h = dt.timedelta
    # run 1: two on-time rows in hour 0 -> watermark ends at 00:30
    write_batch("b1", [(base + h(minutes=10), 1.0), (base + h(hours=1), 1.0)])
    run_once()
    # run 2: on-time row at 03:00 + late row 00:20 (window [00:00,01:00)
    # not yet finalized at watermark 00:30 -> ADMITTED)
    write_batch("b2", [(base + h(hours=3), 1.0), (base + h(minutes=20), 1.0)])
    run_once()
    # run 3: on-time 05:00 + very-late 00:25 (watermark now 02:30 >
    # window end 01:00 -> DROPPED)
    write_batch("b3", [(base + h(hours=5), 1.0), (base + h(minutes=25), 1.0)])
    run_once()

    got = {
        r["ws"]: r["n"] for r in spark.read.parquet(sink).collect()
    }
    # hour-0 window: 1 on-time (run1) + 1 late-admitted (run2), the
    # run-3 very-late row must NOT appear
    assert got[base] == 2


def test_stream_dedup_within_watermark(spark, tmp_path):
    """Duplicate event_ids arriving in a later file (within the
    watermark) are dropped by the streaming dedup; distinct ids pass."""
    import datetime as dt

    from etl_on_weather_dataset_spark.streaming.windows import stream_dedup

    land = tmp_path / "land"
    land.mkdir()
    schema = "event_id long, ts timestamp, value double"
    base = dt.datetime(2024, 1, 1, 8, 0, 0)
    spark.createDataFrame(
        [(1, base, 1.0), (2, base + dt.timedelta(minutes=1), 2.0)], schema
    ).coalesce(1).write.parquet(str(land / "b1"))
    spark.createDataFrame(
        [(2, base + dt.timedelta(minutes=2), 99.0),  # dup id within wm
         (3, base + dt.timedelta(minutes=3), 3.0)], schema
    ).coalesce(1).write.parquet(str(land / "b2"))

    stream = spark.readStream.schema(schema).option(
        "pathGlobFilter", "*.parquet"
    ).option("maxFilesPerTrigger", "1").parquet(str(land) + "/*")
    deduped = stream_dedup(stream, ["event_id"], watermark="1 hour")
    q = (
        deduped.writeStream.format("parquet")
        .option("path", str(tmp_path / "sink"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = {
        r["event_id"]: r["value"]
        for r in spark.read.parquet(str(tmp_path / "sink")).collect()
    }
    assert set(rows) == {1, 2, 3}
    assert rows[2] == 2.0  # the FIRST arrival won; the dup was dropped

    # batch twin: same call degrades to plain dropDuplicates
    batch = spark.createDataFrame(
        [(1, base, 1.0), (1, base, 1.0)], schema
    )
    assert stream_dedup(batch, ["event_id"]).count() == 1


def test_sessionize_stateful_streaming(spark, tmp_path):
    """applyInPandasWithState sessionization: events accumulate into
    per-user state; after the processing-time timeout elapses (second
    checkpointed run, no new events for the user), the CLOSED session
    is emitted."""
    import datetime as dt
    import time

    from etl_on_weather_dataset_spark.streaming.windows import sessionize

    land = tmp_path / "land"
    land.mkdir()
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    schema = "ts timestamp, user_id long, value double"
    base = dt.datetime(2024, 1, 1, 9, 0, 0)

    # seed file so the source directory exists before the query starts
    spark.createDataFrame(
        [(base, 1, 10.0), (base + dt.timedelta(seconds=30), 1, 5.0)], schema
    ).coalesce(1).write.parquet(str(land / "b1"))

    stream = spark.readStream.schema(schema).option(
        "pathGlobFilter", "*.parquet"
    ).parquet(str(land) + "/*")
    out = sessionize(stream, gap_seconds=1)
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    # NOTE: do not use q.processAllAvailable() here -- with
    # ProcessingTimeTimeout the trigger stays active running state-
    # cleanup microbatches and the call never returns. Poll instead:
    # the timeout fires on its own once 1s of processing time passes.
    closed = {}
    try:
        for _ in range(90):  # bounded wait for the timeout microbatch
            try:
                closed = {
                    r["user_id"]: r
                    for r in spark.read.parquet(sink).collect()
                }
            except Exception:
                closed = {}
            if 1 in closed:
                break
            time.sleep(1)
    finally:
        q.stop()
    assert 1 in closed
    assert closed[1]["n_events"] == 2
    assert closed[1]["total_value"] == 15.0


def test_sessionize_batch_gap_semantics(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # user 1: two sessions (gap of 2h between event 2 and 3)
        (1, base, 10.0),
        (1, base + dt.timedelta(minutes=10), 5.0),
        (1, base + dt.timedelta(hours=2, minutes=10), 1.0),
        # user 2: one session
        (2, base, 2.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = sessionize_batch(df, gap_seconds=1800).collect()
    by_user: dict[int, list] = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    assert len(by_user[1]) == 2
    assert len(by_user[2]) == 1
    first = min(by_user[1], key=lambda r: r["session_start"])
    assert first["n_events"] == 2 and first["total_value"] == 15.0


def test_foreachbatch_parquet_sink(spark, tmp_path):
    """foreachBatch: the escape hatch for sinks Structured Streaming
    lacks natively -- each microbatch is a normal DataFrame the
    callback writes with full batch-sink control (here: parquet with
    target file count). Exactly-once comes from the checkpoint +
    idempotent-per-batch writes."""
    from pyspark.sql import functions as F

    from etl_on_weather_dataset_spark.sources.io import write_parquet

    events = load_table(spark, SF, "events")
    landed = str(tmp_path / "landed_fb")
    events.limit(500).write.parquet(landed)

    out_dir = str(tmp_path / "fb_out")
    seen_batches = []

    def sink(batch_df, batch_id):
        seen_batches.append(batch_id)
        write_parquet(
            batch_df, f"{out_dir}/batch={batch_id}", target_files=1
        )

    stream = read_events_stream(
        spark, landed, spark.read.parquet(landed).schema
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt_fb"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert seen_batches, "foreachBatch callback never ran"
    back = spark.read.parquet(f"{out_dir}/batch={seen_batches[0]}")
    assert back.count() == 500
    import glob

    files = glob.glob(f"{out_dir}/batch={seen_batches[0]}/part-*.parquet")
    assert len(files) == 1  # target_files honored per microbatch


def test_streaming_count_min_merge(spark, tmp_path):
    """Streaming frequency sketching: each microbatch builds its own
    count-min sketch and foreachBatch merges it into a persistent
    counter store by cell re-sum -- the same merge law the batch
    operator pins (merge == one-shot). After draining, estimates from
    the merged store must dominate the true counts (one-sided CMS
    guarantee) and EQUAL the one-shot sketch of the full corpus,
    because cell-wise sums are associative across microbatches."""
    from pyspark.sql import functions as F

    from etl_on_weather_dataset_spark.operators import text as T
    from etl_on_weather_dataset_spark.operators.bloom import (
        build_count_min,
        cms_estimates,
    )

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    landed = str(tmp_path / "docs_in")
    docs.limit(200).repartition(4).write.parquet(landed)

    store = str(tmp_path / "cms_store")
    seen_batches = []

    def sink(batch_df, batch_id):
        # per-batch_id overwrite path = idempotent under foreachBatch
        # replay (same discipline as test_foreachbatch_parquet_sink):
        # a replayed microbatch rewrites its own sketch instead of
        # appending a double-count
        seen_batches.append(batch_id)
        toks = batch_df.select(F.explode(T.tokens("text")).alias("token"))
        sketch = build_count_min(toks, "token", width=16, depth=4)
        sketch.write.mode("overwrite").parquet(
            f"{store}/batch={batch_id}"
        )

    schema = spark.read.parquet(landed).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)  # force >= 2 microbatches
        .parquet(landed)
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "cms_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(seen_batches) >= 2, seen_batches

    merged = (
        spark.read.parquet(store)
        .groupBy("row", "cell")
        .agg(F.sum("cnt").alias("cnt"))
    )
    all_toks = spark.read.parquet(landed).select(
        F.explode(T.tokens("text")).alias("token")
    )
    one_shot = build_count_min(all_toks, "token", width=16, depth=4)
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, one_shot.collect()))

    true = {r["token"]: r["n"] for r in all_toks.groupBy("token")
            .agg(F.count(F.lit(1)).alias("n")).collect()}
    keys = all_toks.distinct()
    est = {r["token"]: r["est"] for r in cms_estimates(
        merged, keys, "token", width=16, depth=4).collect()}
    for k, t in true.items():
        assert est[k] >= t, (k, est[k], t)


def test_stream_incremental_dedup_across_microbatches(spark, tmp_path):
    """File-stream ingestion through the persistent fingerprint store:
    content arriving again in a LATER microbatch must not land twice."""
    from etl_on_weather_dataset_spark.streaming.windows import (
        stream_incremental_dedup,
    )

    src = tmp_path / "src"
    src.mkdir()
    w1 = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta"), (3, "alpha beta")],
        "doc_id long, text string",
    )
    w1.coalesce(1).write.parquet(str(src / "wave1"))
    w2 = spark.createDataFrame(
        [(10, "alpha beta"),          # content dup of wave 1 -> drop
         (11, "epsilon zeta")],       # new -> lands
        "doc_id long, text string",
    )
    w2.coalesce(1).write.parquet(str(src / "wave2"))

    # the file source lists one FILE per trigger; each wave dir holds
    # one part file, so the two waves arrive as separate microbatches
    # (plus empty/metadata triggers the source may add)
    batches = stream_incremental_dedup(
        spark,
        f"{src}/*",
        w1.schema,
        str(tmp_path / "store"),
        str(tmp_path / "landed"),
        str(tmp_path / "ckpt"),
    )
    assert len(batches) >= 2
    landed = spark.read.parquet(str(tmp_path / "landed"))
    texts = sorted(r["text"] for r in landed.collect())
    # within-batch dup (id 3) and cross-batch dup (id 10) both dropped
    assert texts == ["alpha beta", "epsilon zeta", "gamma delta"]
    store = spark.read.parquet(str(tmp_path / "store"))
    assert store.count() == 3


def test_stream_zscore_equals_batch_across_microbatches(spark, tmp_path):
    """Stateful streaming z-score: the trailing window crosses
    micro-batch boundaries, so the streamed flags/z must be
    BIT-identical to the batch rolling_zscore over the concatenated
    history. Three time-ordered waves, one file per trigger."""
    import datetime as dt

    from etl_on_weather_dataset_spark.operators.timeseries import (
        rolling_zscore,
    )
    from etl_on_weather_dataset_spark.streaming.windows import stream_zscore

    base = dt.datetime(2024, 1, 1)
    schema = "event_id long, ts timestamp, user_id long, value double"

    def rows(lo, hi):
        out = []
        for i in range(lo, hi):
            for u in (1, 2):
                # noisy series with a planted spike at i == 30
                v = 1000.0 if (i == 30 and u == 1) else 10.0 + (i % 5) * u
                out.append(
                    (i * 10 + u, base + dt.timedelta(minutes=i), u, v)
                )
        return out

    land = tmp_path / "land"
    land.mkdir()
    for w, (lo, hi) in enumerate([(0, 15), (15, 28), (28, 40)]):
        spark.createDataFrame(rows(lo, hi), schema).coalesce(
            1
        ).write.parquet(str(land / f"wave{w}"))

    all_rows = spark.createDataFrame(rows(0, 40), schema)
    batch = {
        r.event_id: (r.z, r.is_anomaly)
        for r in rolling_zscore(
            all_rows, "user_id", "ts", "event_id", "value",
            window_rows=20, threshold=3.0,
        ).collect()
    }

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(str(land) + "/*")
    )
    out = stream_zscore(stream, window_rows=20, threshold=3.0)
    q = (
        out.writeStream.format("memory")
        .queryName("t_zscore")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        r.event_id: (r.z, r.is_anomaly)
        for r in spark.sql("SELECT * FROM t_zscore").collect()
    }
    assert len(streamed) == len(batch) == 80
    assert streamed == batch  # bit-identical z incl. None warm-ups
    # the planted spike is flagged, and judged rows exist in wave 3
    assert streamed[301] == batch[301]
    assert batch[301][1] is True


def test_stream_incremental_rollup_equals_batch(spark, tmp_path):
    """File-stream ingestion through the versioned rollup store: the
    final store contents must equal a one-shot aggregate over all
    waves, and re-running the drained stream (same checkpoint, no new
    files) must change nothing."""
    import datetime as dt

    from etl_on_weather_dataset_spark.operators.rollup_store import (
        read_rollup,
    )
    from etl_on_weather_dataset_spark.streaming.windows import (
        stream_incremental_rollup,
    )

    base = dt.datetime(2024, 3, 1)
    schema = "event_type string, day date, value double"
    src = tmp_path / "src"
    src.mkdir()
    waves = [
        [("a", base.date(), 1.00), ("b", base.date(), 2.00)],
        [("a", base.date(), 4.00)],
        [("b", base.date(), 8.00), ("a", base.date(), 16.00)],
    ]
    for i, rows in enumerate(waves):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(src / f"wave{i}")
        )

    store = str(tmp_path / "store")
    seen = stream_incremental_rollup(
        spark, f"{src}/*", spark.createDataFrame([], schema).schema,
        store, str(tmp_path / "ckpt"), ("event_type", "day"), "value",
    )
    assert len(seen) >= 3
    agg, _, v1 = read_rollup(spark, store)
    got = {r.event_type: (r.n_rows, r.sum_c) for r in agg.collect()}
    assert got == {"a": (3, 2100), "b": (2, 1000)}

    # drained re-run: no new files -> no new store version
    stream_incremental_rollup(
        spark, f"{src}/*", spark.createDataFrame([], schema).schema,
        store, str(tmp_path / "ckpt"), ("event_type", "day"), "value",
    )
    agg2, _, v2 = read_rollup(spark, store)
    assert v2 == v1
    assert {r.event_type: (r.n_rows, r.sum_c)
            for r in agg2.collect()} == got

    # a SECOND query (fresh checkpoint, new source) into the SAME
    # store restarts batch ids at 0 -- the query-id namespace keeps
    # its sb0/sb1 from colliding with the first query's ledger keys,
    # so the new batches must apply instead of being dropped as
    # 'replays' (r4 advice)
    src2 = tmp_path / "src2"
    src2.mkdir()
    spark.createDataFrame(
        [("a", base.date(), 32.00)], schema
    ).coalesce(1).write.parquet(str(src2 / "wave0"))
    stream_incremental_rollup(
        spark, f"{src2}/*", spark.createDataFrame([], schema).schema,
        store, str(tmp_path / "ckpt2"), ("event_type", "day"), "value",
    )
    agg3, _, v3 = read_rollup(spark, store)
    assert v3 > v2
    assert {r.event_type: (r.n_rows, r.sum_c)
            for r in agg3.collect()} == {"a": (4, 5300), "b": (2, 1000)}


def test_stream_ivf_ingest_appends_without_retrain(spark, tmp_path):
    """File-stream vector ingestion into the IVF store: after the
    build + streamed appends, the index serves every streamed vector,
    the centroids are unchanged from the build, and a drained re-run
    (same checkpoint) adds no version."""
    from etl_on_weather_dataset_spark.operators.ann_store import (
        _read_version,
        ivf_index_build,
        ivf_index_query,
    )
    from etl_on_weather_dataset_spark.operators.similarity import (
        lsh_hyperplanes,
    )
    from etl_on_weather_dataset_spark.streaming.windows import (
        stream_ivf_ingest,
    )

    dim = 8
    build_vecs = lsh_hyperplanes(dim, 30, seed=5)
    build = spark.createDataFrame(
        [(i, v) for i, v in enumerate(build_vecs)],
        "vec_id long, embedding array<double>",
    )
    store = str(tmp_path / "ivf")
    ivf_index_build(spark, build, store, k=4, iters=1, dim=dim)
    cents_before = sorted(
        map(tuple, (r.cent for r in
                    _read_version(spark, store)[0].collect()))
    )

    src = tmp_path / "src"
    src.mkdir()
    waves = [lsh_hyperplanes(dim, 5, seed=50 + w) for w in range(2)]
    for w, vecs in enumerate(waves):
        spark.createDataFrame(
            [(1000 + 100 * w + i, v) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<double>",
        ).coalesce(1).write.parquet(str(src / f"wave{w}"))

    schema = spark.createDataFrame(
        [], "vec_id long, embedding array<double>"
    ).schema
    seen = stream_ivf_ingest(
        spark, f"{src}/*", schema, store, str(tmp_path / "ckpt"),
    )
    assert len(seen) >= 2
    cents, cells, _, v = _read_version(spark, store)
    assert cells.count() == 40
    assert sorted(
        map(tuple, (r.cent for r in cents.collect()))
    ) == cents_before  # frozen quantizer

    # streamed vectors are served
    q = spark.createDataFrame(
        [(1100, waves[1][0])], "vec_id long, embedding array<double>"
    )
    out = ivf_index_query(spark, q, store, k=1, n_probe=4).collect()
    assert out and out[0].neighbor_id != 1100

    # drained re-run: no new version
    stream_ivf_ingest(
        spark, f"{src}/*", schema, store, str(tmp_path / "ckpt"),
    )
    assert _read_version(spark, store)[3] == v


def test_streaming_hll_merge(spark, tmp_path):
    """Streaming distinct sketching: each microbatch writes its own
    HLL registers (per-batch-id overwrite = replay-idempotent) and
    the drained store, max-merged per bucket, must EQUAL the one-shot
    sketch of the full corpus -- max is associative and idempotent
    across microbatches, which is exactly what makes HLL the
    cross-batch distinct store."""
    from pyspark.sql import functions as F

    from etl_on_weather_dataset_spark.operators.bloom import (
        hll_estimate,
        hll_registers,
    )

    ev = load_table(spark, SF, "events").select("event_id", "user_id")
    landed = str(tmp_path / "ev_in")
    ev.limit(2000).repartition(4).write.parquet(landed)

    store = str(tmp_path / "hll_store")
    seen = []

    def sink(batch_df, batch_id):
        seen.append(batch_id)
        hll_registers(batch_df, "user_id", m=64).write.mode(
            "overwrite"
        ).parquet(f"{store}/batch={batch_id}")

    schema = spark.read.parquet(landed).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(landed)
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(seen) >= 2, seen

    merged = (
        spark.read.parquet(store)
        .groupBy("bucket")
        .agg(F.max("register").alias("register"))
    )
    one_shot = hll_registers(
        spark.read.parquet(landed), "user_id", m=64
    )
    assert sorted(map(tuple, merged.select("bucket", "register").collect())) \
        == sorted(map(tuple, one_shot.collect()))
    est = hll_estimate(merged, m=64).collect()[0]
    n_true = spark.read.parquet(landed).select("user_id").distinct().count()
    assert abs(est.est_distinct - n_true) * 2 <= n_true  # within 50%


def test_streaming_histogram_sketch_merge(spark, tmp_path):
    """Streaming quantile sketching: each microbatch writes its own
    histogram sketch (per-batch-id overwrite = replay-idempotent);
    the drained store, count-summed per bin, must EQUAL the one-shot
    sketch of the full corpus -- summation is associative and
    commutative across microbatches, which is what makes the
    fixed-grid histogram the cross-batch quantile store (the HLL
    stream's twin for percentiles)."""
    from pyspark.sql import functions as F

    from etl_on_weather_dataset_spark.operators.histogram import (
        histogram_quantiles,
        histogram_sketch,
    )

    LO, HI, BINS = 0, 500_000_000, 128  # events.value in [0, 500)
    ev = load_table(spark, SF, "events").select("event_id", "value")
    landed = str(tmp_path / "ev_in")
    ev.limit(2000).repartition(4).write.parquet(landed)

    store = str(tmp_path / "hist_store")
    seen = []

    def sink(batch_df, batch_id):
        seen.append(batch_id)
        histogram_sketch(batch_df, "value", LO, HI, BINS).write.mode(
            "overwrite"
        ).parquet(f"{store}/batch={batch_id}")

    schema = spark.read.parquet(landed).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(landed)
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(seen) >= 2, seen

    merged = (
        spark.read.parquet(store)
        .groupBy("bin")
        .agg(F.sum("cnt").alias("cnt"))
    )
    one_shot = histogram_sketch(
        spark.read.parquet(landed), "value", LO, HI, BINS
    )
    assert sorted(map(tuple, merged.select("bin", "cnt").collect())) \
        == sorted(map(tuple, one_shot.collect()))
    # quantiles off the merged store are exact to one grid cell
    est = {
        r.q_ppm: r.est_micro
        for r in histogram_quantiles(
            merged, [500_000], LO, HI, BINS
        ).collect()
    }
    vals = sorted(
        r.value for r in spark.read.parquet(landed).collect()
    )
    exact = vals[(len(vals) + 1) // 2 - 1] * 1e6
    assert abs(est[500_000] - exact) <= (HI - LO) // BINS


def test_stream_ivf_auto_compaction(spark, tmp_path):
    """A long-running ingestion stream must not grow the manifest
    without bound: with max_segments=2 the sink compacts before
    appending once two segments are live, the index still serves
    every ingested vector, and replay semantics survive (restart of
    the drained stream appends nothing)."""
    from etl_on_weather_dataset_spark.operators.ann_store import (
        _manifest_names,
        _read_version,
        ivf_index_build,
    )
    from etl_on_weather_dataset_spark.operators.similarity import (
        lsh_hyperplanes,
    )
    from etl_on_weather_dataset_spark.streaming.windows import (
        stream_ivf_ingest,
    )

    dim = 8
    vecs = lsh_hyperplanes(dim, 60, seed=99)
    mk = lambda lo, hi: spark.createDataFrame(  # noqa: E731
        [(i, vecs[i]) for i in range(lo, hi)],
        "vec_id long, embedding array<double>",
    )
    store = str(tmp_path / "ivf")
    ivf_index_build(spark, mk(0, 20), store, k=4, iters=1, dim=dim)

    src = str(tmp_path / "src")
    for j, (lo, hi) in enumerate([(20, 30), (30, 40), (40, 50)]):
        mk(lo, hi).coalesce(1).write.parquet(f"{src}/b{j}")

    seen = stream_ivf_ingest(
        spark, f"{src}/*",
        schema=mk(0, 1).schema,
        store_path=store,
        checkpoint=str(tmp_path / "ckpt"),
        max_segments=2,
    )
    assert len(seen) == 3
    _, cells, _, v = _read_version(spark, store)
    assert cells.count() == 50  # build 20 + 3 x 10, nothing dropped
    # compaction kept the live-segment count bounded by
    # max_segments + 1 (threshold check runs before each append)
    assert len(_manifest_names(spark, store, v)) <= 3
    # drained stream restarted: every batch replays as a no-op
    stream_ivf_ingest(
        spark, f"{src}/*",
        schema=mk(0, 1).schema,
        store_path=store,
        checkpoint=str(tmp_path / "ckpt"),
        max_segments=2,
    )
    assert _read_version(spark, store)[1].count() == 50


def test_ivf_store_stats_monitor(spark, tmp_path):
    from etl_on_weather_dataset_spark.operators.ann_store import (
        ivf_index_append,
        ivf_index_build,
        ivf_store_stats,
    )
    from etl_on_weather_dataset_spark.operators.similarity import (
        lsh_hyperplanes,
    )

    vecs = lsh_hyperplanes(8, 40, seed=5)
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    store = str(tmp_path / "ivf")
    ivf_index_build(spark, df.filter("vec_id < 30"), store,
                    k=4, iters=1, dim=8)
    ivf_index_append(
        spark, df.filter("vec_id >= 30"), store, "b1",
    )
    row = ivf_store_stats(spark, store).collect()[0]
    assert row.version == 2 and row.n_segments == 2
    assert row.n_vectors == 40 and 1 <= row.n_cells <= 4
    assert row.max_cell_rows >= row.n_vectors // 4
    assert row.cell_skew_ppm == row.max_cell_rows * 1_000_000 // 40


def test_stream_contract_monitor(spark, tmp_path):
    """Per-micro-batch violation counts ride the stream's own pass
    (observe -> progress observedMetrics): the dirty batch reports
    its violations, the clean one reports zero, totals match a batch
    contract over the union."""
    from etl_on_weather_dataset_spark.operators.validate import (
        at_least,
        not_null,
    )
    from etl_on_weather_dataset_spark.streaming.windows import (
        stream_contract_monitor,
    )

    clean = spark.createDataFrame(
        [(1, 5.0), (2, 6.0)], "k long, v double"
    )
    dirty = spark.createDataFrame(
        [(None, 2.0), (4, -9.0), (5, 1.0)], "k long, v double"
    )
    src = str(tmp_path / "src")
    clean.coalesce(1).write.parquet(f"{src}/b0")
    dirty.coalesce(1).write.parquet(f"{src}/b1")

    exps = [not_null(["k"]), at_least("v", 0)]
    batches = stream_contract_monitor(
        spark, f"{src}/*", clean.schema, exps,
        checkpoint=str(tmp_path / "ckpt"),
    )
    assert len(batches) == 2, batches
    nn = sorted(b["not_null:k"] for b in batches)
    al = sorted(b["at_least:v"] for b in batches)
    assert nn == [0, 1] and al == [0, 1]


def test_stream_ingest_pipeline_three_products(spark, tmp_path):
    """One stream, three exactly-once products: after draining two
    micro-batches (plus a full replay), the rollup store equals the
    one-shot aggregate, the quantile store's estimates equal the
    one-shot sketch's, and the contract log carries one report per
    expectation per batch."""
    from pyspark.sql import functions as F

    from etl_on_weather_dataset_spark.operators.histogram import (
        histogram_quantiles,
        histogram_sketch,
        histogram_store_quantiles,
    )
    from etl_on_weather_dataset_spark.operators.rollup_store import (
        read_rollup,
    )
    from etl_on_weather_dataset_spark.operators.validate import (
        at_least,
        not_null,
    )
    from etl_on_weather_dataset_spark.streaming.windows import (
        stream_ingest_pipeline,
    )

    LO, HI, BINS = 0, 100_000_000, 64
    schema = "k string, v double"
    b1 = spark.createDataFrame(
        [("a", 10.0), ("a", 20.0), ("b", 30.0)], schema
    )
    b2 = spark.createDataFrame(
        [("a", 40.0), ("b", None)], schema
    )
    src = str(tmp_path / "src")
    b1.coalesce(1).write.parquet(f"{src}/b0")
    b2.coalesce(1).write.parquet(f"{src}/b1")

    kw = dict(
        schema=b1.schema,
        checkpoint=str(tmp_path / "ckpt"),
        rollup_store=str(tmp_path / "roll"),
        histogram_store=str(tmp_path / "hist"),
        expectations=[not_null(["v"]), at_least("v", 0)],
        contract_log=str(tmp_path / "contracts"),
        key_cols=("k",),
        value_col="v",
        hist_lo=LO, hist_hi=HI, hist_bins=BINS,
    )
    seen = stream_ingest_pipeline(spark, f"{src}/*", **kw)
    assert len(seen) == 2
    # full replay (fresh checkpoint, same stores): ledgers no-op it
    stream_ingest_pipeline(
        spark, f"{src}/*",
        **{**kw, "checkpoint": str(tmp_path / "ckpt")},
    )

    union = b1.unionByName(b2)
    # 1. rollup store == one-shot aggregate
    agg, _, _ = read_rollup(spark, str(tmp_path / "roll"))
    got = {r.k: (r.n_rows, r.sum_c) for r in agg.collect()}
    want = {
        r.k: (r.n, r.s)
        for r in union.filter("v IS NOT NULL").groupBy("k").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.expr("CAST(ROUND(v * 100) AS BIGINT)")).alias("s"),
        ).collect()
    }
    # exact scaled sums match per key (the rollup's n_rows counts the
    # null row too, so compare the sum surface)
    assert got["a"][1] == want["a"][1] and got["b"][1] == want["b"][1]
    # 2. quantile store == one-shot sketch
    store_q = {
        r.q_ppm: r.est_micro
        for r in histogram_store_quantiles(
            spark, str(tmp_path / "hist"), [500_000], LO, HI, BINS
        ).collect()
    }
    shot_q = {
        r.q_ppm: r.est_micro
        for r in histogram_quantiles(
            histogram_sketch(union, "v", LO, HI, BINS),
            [500_000], LO, HI, BINS,
        ).collect()
    }
    assert store_q == shot_q
    # 3. contract log: per batch, per expectation; the null-v batch
    # flags not_null:v exactly once
    log = spark.read.parquet(str(tmp_path / "contracts") + "/*")
    assert log.count() == 4  # 2 batches x 2 expectations
    viol = {
        (r.batch_id.split("-")[-1], r.expectation): r.n_violations
        for r in log.collect()
    }
    assert sum(v for (b, e), v in viol.items()
               if e == "not_null:v") == 1


def test_stream_eval_ingest_dashboard_equals_batch(spark, tmp_path):
    """Scored (label, score) waves streamed into the eval store: the
    report read off the store must equal one-shot binary_eval over
    all waves, and a drained re-run must change nothing -- the
    always-current model dashboard with exactly-once folding."""
    from etl_on_weather_dataset_spark.operators.evaluate import (
        binary_eval,
        eval_store_report,
    )
    from etl_on_weather_dataset_spark.streaming.windows import (
        stream_eval_ingest,
    )

    schema = "y int, score long"
    rows = [(i % 5 % 2, ((i * 13 + 7) % 31) - 15) for i in range(90)]
    src = tmp_path / "src"
    src.mkdir()
    for i in range(3):
        spark.createDataFrame(
            rows[i * 30:(i + 1) * 30], schema
        ).coalesce(1).write.parquet(str(src / f"wave{i}"))

    store = str(tmp_path / "evalstore")
    seen = stream_eval_ingest(
        spark, f"{src}/*", spark.createDataFrame([], schema).schema,
        store, str(tmp_path / "ckpt"),
    )
    assert len(seen) >= 3
    got = eval_store_report(spark, store).collect()[0]
    want = binary_eval(
        spark.createDataFrame(rows, schema)
    ).collect()[0]
    assert got.asDict() == want.asDict()

    # drained re-run: nothing new, report unchanged
    stream_eval_ingest(
        spark, f"{src}/*", spark.createDataFrame([], schema).schema,
        store, str(tmp_path / "ckpt"),
    )
    again = eval_store_report(spark, store).collect()[0]
    assert again.asDict() == got.asDict()


def test_stream_vocab_ingest_model_equals_batch(spark, tmp_path):
    """Streamed document waves must produce the same stored unigram
    model as one batch ingest, and a drained re-run must be a no-op
    (exactly-once over at-least-once delivery)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from etl_on_weather_dataset_spark.operators.corpus import (
        vocab_store_ingest,
    )
    from etl_on_weather_dataset_spark.operators.rollup_store import (
        read_rollup,
    )
    from etl_on_weather_dataset_spark.streaming.windows import (
        stream_vocab_ingest,
    )

    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
    ])
    src = tmp_path / "docs_src"
    src.mkdir()
    docs = spark.createDataFrame(
        [(i, "alpha beta " + "gamma " * (1 + i % 4)) for i in range(80)],
        schema,
    )
    for w, flt in (("w1", "doc_id < 40"), ("w2", "doc_id >= 40")):
        docs.filter(flt).coalesce(1).write.parquet(str(src / w))
    store = str(tmp_path / "stream_vocab")
    ck = str(tmp_path / "ck")
    seen = stream_vocab_ingest(spark, str(src) + "/*", schema, store, ck)
    assert seen

    one_shot = str(tmp_path / "oneshot_vocab")
    vocab_store_ingest(spark, docs, one_shot, "all")
    got, _, _ = read_rollup(spark, store)
    want, _, _ = read_rollup(spark, one_shot)
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))

    # drained re-run: no new batches fold, store version unchanged
    _, _, v_before = read_rollup(spark, store)
    stream_vocab_ingest(spark, str(src) + "/*", schema, store, ck)
    _, _, v_after = read_rollup(spark, store)
    assert v_after == v_before


def test_stream_ordered_fold_equals_batch(spark, tmp_path):
    """Streaming EWMA (stream_ordered_fold): the O(1) per-key carry
    crosses micro-batch boundaries, so the latest emitted row per key
    must equal the batch ordered_fold_stream over the concatenated
    history. Three time-ordered waves, one file per trigger."""
    import datetime as dt

    from etl_on_weather_dataset_spark.operators.fold import (
        ordered_fold_stream,
    )
    from etl_on_weather_dataset_spark.streaming.windows import (
        stream_ordered_fold,
    )

    base = dt.datetime(2024, 3, 1)
    schema = "event_id long, ts timestamp, user_id long, value double"

    def rows(lo, hi):
        return [
            (i * 10 + u, base + dt.timedelta(minutes=i), u,
             ((i * 37 + u * 11) % 500) / 7.0)
            for i in range(lo, hi) for u in (1, 2, 3)
        ]

    land = tmp_path / "land"
    land.mkdir()
    for w, (lo, hi) in enumerate([(0, 12), (12, 25), (25, 40)]):
        spark.createDataFrame(rows(lo, hi), schema).coalesce(
            1
        ).write.parquet(str(land / f"wave{w}"))

    all_rows = spark.createDataFrame(rows(0, 40), schema).selectExpr(
        "user_id", "ts", "event_id",
        "CAST(ROUND(value * 1000000) AS BIGINT) AS vm",
    )
    batch = {
        r.user_id: (r.n_events, r.ewma_micro)
        for r in ordered_fold_stream(
            all_rows, ["user_id"], ["ts", "event_id"], "vm",
            fold=lambda acc, v: (v + acc) // 2,
            out_col="ewma_micro",
        ).collect()
    }

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(str(land) + "/*")
    )
    q = (
        stream_ordered_fold(stream)
        .writeStream.format("memory")
        .queryName("t_fold")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = spark.sql("SELECT * FROM t_fold").collect()
    # one running row per key per batch; the LATEST (max n) per key
    # is the full-history fold
    final = {}
    for r in emitted:
        if r.user_id not in final or r.n_events > final[r.user_id][0]:
            final[r.user_id] = (r.n_events, r.ewma_micro)
    assert len(emitted) == 9  # 3 keys x 3 micro-batches
    assert final == batch
    assert all(v[0] == 40 for v in final.values())


def test_streaming_day2_ingest_into_stores_with_replay(spark, tmp_path):
    """The day-2 wiring end to end: a document STREAM drives
    incremental_exact_dedup + incremental_rollup through foreachBatch
    (batch_id = the streaming microbatch id), and a REPLAYED batch --
    the at-least-once delivery case foreachBatch contractually has --
    lands nothing twice: the dedup markers short-circuit and the
    rollup batch ledger makes the merge a no-op."""
    from pyspark.sql import functions as F

    from etl_on_weather_dataset_spark.operators.dedup import (
        incremental_exact_dedup,
    )
    from etl_on_weather_dataset_spark.operators.rollup_store import (
        incremental_rollup,
        read_rollup,
    )
    from etl_on_weather_dataset_spark.schemas import load_table

    docs = load_table(spark, SF, "documents").select(
        "doc_id", "text", "source"
    )
    src = str(tmp_path / "stream_src")
    # plant cross-batch dups: every 4th doc re-submitted under id+1M
    docs.unionAll(
        docs.filter(F.col("doc_id") % 4 == 0).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            "text", "source",
        )
    ).write.parquet(src)

    fp_store = str(tmp_path / "fp_store")
    roll_store = str(tmp_path / "rollup")
    out_base = str(tmp_path / "landed")
    seen = []

    def sink(batch_df, batch_id):
        seen.append(batch_id)
        landed = incremental_exact_dedup(
            spark, batch_df, fp_store, f"{out_base}/b{batch_id}"
        )
        incremental_rollup(
            spark,
            landed.select("source", F.length("text").alias("v")),
            roll_store, batch_id=f"b{batch_id}",
            key_cols=["source"], value_col="v", value_scale=1,
        )

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt_day2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert seen, "stream never fired"

    # REPLAY batch 0 exactly as an at-least-once driver would
    first = spark.read.parquet(f"{out_base}/b{seen[0]}")
    n_landed_before = sum(
        spark.read.parquet(f"{out_base}/b{b}").count() for b in seen
    )
    store_before = spark.read.parquet(fp_store).select("fp").distinct()
    n_fp_before = store_before.count()
    _, _, v_before = read_rollup(spark, roll_store)
    replay_batch = spark.read.parquet(src).join(
        first.select("doc_id"), "doc_id", "left_semi"
    )
    replayed = incremental_exact_dedup(
        spark, replay_batch, fp_store, f"{out_base}/b{seen[0]}"
    )
    incremental_rollup(
        spark,
        replayed.select("source", F.length("text").alias("v")),
        roll_store, batch_id=f"b{seen[0]}",
        key_cols=["source"], value_col="v", value_scale=1,
    )
    assert replayed.count() == first.count()  # landing untouched
    assert (
        spark.read.parquet(fp_store).select("fp").distinct().count()
        == n_fp_before
    )
    _, _, v_after = read_rollup(spark, roll_store)
    assert v_after == v_before  # ledger: replay created no version

    # incremental across microbatches == one-shot over the whole stream
    n_oneshot = (
        spark.read.parquet(src)
        .select(
            F.md5(F.regexp_replace(F.lower(F.trim("text")),
                                   r"\s+", " ")).alias("fp")
        )
        .distinct()
        .count()
    )
    assert n_fp_before == n_oneshot
    assert n_landed_before == n_oneshot


def test_stream_heavy_hitters_guarantees_across_batches(
    spark, tmp_path
):
    """Streaming Misra-Gries (stream_heavy_hitters): after three
    micro-batches, the final per-shard sketch satisfies the mergeable-
    summaries inequalities against the EXACT counts of the full
    history -- est <= true <= est + err(shard) for every candidate,
    and every item whose true count exceeds its shard's deduction
    total is present. The per-shard row count n reconciles exactly."""
    from etl_on_weather_dataset_spark.streaming.windows import (
        stream_heavy_hitters,
    )
    from pyspark.sql import functions as F

    # skewed stream: 'whale' dominates, zipf-ish tail, three waves
    def wave(seed, lo, hi):
        out = []
        for i in range(lo, hi):
            out.append((i, "whale"))
            out.append((i, f"tail{(i * 7 + seed) % 23}"))
            if i % 3 == 0:
                out.append((i, "shark"))
        return out

    schema = "row_id long, item string"
    land = tmp_path / "land"
    land.mkdir()
    for w, (lo, hi) in enumerate([(0, 40), (40, 90), (90, 150)]):
        spark.createDataFrame(wave(w, lo, hi), schema).coalesce(
            1
        ).write.parquet(str(land / f"wave{w}"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(str(land) + "/*")
    )
    q = (
        stream_heavy_hitters(stream, "item", k=4, n_shards=4)
        .writeStream.format("memory")
        .queryName("t_hh")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_hh"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = spark.sql("SELECT * FROM t_hh").collect()
    # the final sketch per shard = rows with that shard's max n
    latest_n = {}
    for r in emitted:
        latest_n[r.shard] = max(latest_n.get(r.shard, 0), r.n)
    final = [
        r for r in emitted if r.n == latest_n[r.shard]
    ]

    all_rows = spark.createDataFrame(
        wave(0, 0, 40) + wave(1, 40, 90) + wave(2, 90, 150), schema
    )
    truth = {
        r.item: (r.c, r.shard)
        for r in all_rows.select(
            "item",
            F.pmod(F.xxhash64(F.col("item").cast("string")), F.lit(4))
            .cast("int").alias("shard"),
        )
        .groupBy("item", "shard")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    shard_n = {}
    shard_err = {}
    for r in final:
        shard_n[r.shard] = r.n
        shard_err[r.shard] = r.err
    # per-shard row totals reconcile exactly
    for s, n in shard_n.items():
        want = sum(c for c, sh in truth.values() if sh == s)
        assert n == want, (s, n, want)
    # candidate inequalities
    cand = {r.item: r for r in final}
    for item, r in cand.items():
        true_c = truth[item][0]
        assert r.est <= true_c <= r.est + r.err, (item, r, true_c)
    # completeness: true > err(shard) -> present
    for item, (true_c, s) in truth.items():
        if s in shard_err and true_c > shard_err[s]:
            assert item in cand, (item, true_c, shard_err[s])
    # the whale is always caught with a dominant estimate
    assert "whale" in cand and cand["whale"].est >= 150 - cand["whale"].err


def test_stream_time_to_convert_equals_batch(spark, tmp_path):
    """Streaming conversion-latency monitor (stream_time_to_convert):
    with per-user event-time-ordered arrival across three
    micro-batches, feeding the emitted (user, delta_s) rows through
    the batch operator's bucketed value-count quantile yields the
    batch time_to_convert row on the drained history BIT-FOR-BIT,
    and every user emits at most once."""
    from datetime import datetime, timedelta

    from etl_on_weather_dataset_spark.operators.funnel import (
        time_to_convert,
    )
    from etl_on_weather_dataset_spark.streaming.windows import (
        stream_time_to_convert,
    )

    base = datetime(2024, 3, 1)
    # users 0..9: view in wave 0; purchases split across waves 1-2;
    # user 7 purchases BEFORE viewing (ineligible purchase first);
    # user 8 never purchases; user 9 purchases twice (first wins)
    events = []
    eid = 0

    def ev(u, mins, kind):
        nonlocal eid
        eid += 1
        return (eid, base + timedelta(minutes=mins), u, kind)

    waves = [[], [], []]
    for u in range(9):
        waves[0].append(ev(u, u, "view"))
    waves[0].append(ev(7, 2, "purchase"))  # before u7's view? u7 views at min 7
    for u in range(5):
        waves[1].append(ev(u, 60 + 3 * u, "purchase"))
    for u in range(5, 8):
        waves[2].append(ev(u, 240 + 10 * u, "purchase"))
    waves[2].append(ev(9, 500, "view"))
    waves[2].append(ev(9, 510, "purchase"))
    waves[2].append(ev(9, 520, "purchase"))

    schema = "event_id long, ts timestamp, user_id long, event_type string"
    land = tmp_path / "land"
    land.mkdir()
    for w, rows in enumerate(waves):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(land / f"wave{w}")
        )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(str(land) + "/*")
    )
    q = (
        stream_time_to_convert(stream)
        .writeStream.format("memory")
        .queryName("t_ttc")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ttc"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = spark.sql("SELECT * FROM t_ttc").collect()

    # emit-once per user
    users = [r.user_id for r in emitted]
    assert len(users) == len(set(users))

    # batch twin over the full drained history
    all_rows = spark.createDataFrame(
        [r for w in waves for r in w], schema
    )
    [batch] = time_to_convert(all_rows).collect()

    # wave0's early purchase for user 7 precedes their first view ->
    # must NOT convert them; their wave-2 purchase does
    assert 7 in set(users)
    # user 8 never purchases, never emits
    assert 8 not in set(users)

    # same per-user deltas as the batch conv relation: recompute the
    # batch row from the STREAM's emitted deltas with the same
    # bucketed type-1 quantile (bucket = 60 s)
    import math

    deltas = sorted(r.delta_s for r in emitted)
    n = len(deltas)
    assert batch.n_converted == n
    ms = sorted(d // 60 for d in deltas)

    def q_at(p):
        for i, m in enumerate(ms, start=1):
            if 100 * i >= p * n:
                return m
        return None

    assert batch.p50_bucket == q_at(50)
    assert batch.p90_bucket == q_at(90)
    assert batch.mean_seconds == sum(deltas) // n


def test_stream_oov_monitor_exact_under_any_order(spark, tmp_path):
    """Streaming OOV monitor (stream_oov_monitor): summing each
    shard's LATEST cumulative row after three micro-batches equals
    the batch recount of the full drained history EXACTLY --
    counting is commutative, so the guarantee needs no arrival-order
    assumption (waves are deliberately fed newest-first)."""
    from etl_on_weather_dataset_spark.operators.text import tokens
    from etl_on_weather_dataset_spark.streaming.windows import (
        stream_oov_monitor,
    )
    from pyspark.sql import functions as F

    vocab = ["alpha", "beta", "gamma"]
    waves = [
        [(1, "alpha beta zeta"), (2, "beta beta")],
        [(3, "eta alpha"), (4, "theta theta gamma")],
        [(5, "alpha"), (6, "iota beta gamma zeta")],
    ]
    schema = "doc_id long, text string"
    land = tmp_path / "land"
    land.mkdir()
    # newest-first on disk: arrival order deliberately != event order
    for w, rows in enumerate(reversed(waves)):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(land / f"wave{w}")
        )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(str(land) + "/*")
    )
    q = (
        stream_oov_monitor(stream, vocab, n_shards=4)
        .writeStream.format("memory")
        .queryName("t_oov")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_oov"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = spark.sql("SELECT * FROM t_oov").collect()

    # latest row per shard = the one with that shard's max total
    latest = {}
    for r in emitted:
        if r.shard not in latest or r.total > latest[r.shard].total:
            latest[r.shard] = r
    got_total = sum(r.total for r in latest.values())
    got_covered = sum(r.covered for r in latest.values())

    all_rows = spark.createDataFrame(
        [r for w in waves for r in w], schema
    )
    toks = all_rows.select(F.explode(tokens("text")).alias("tok"))
    want_total = toks.count()
    want_covered = toks.filter(F.col("tok").isin(vocab)).count()
    assert (got_covered, got_total) == (want_covered, want_total)
    # per-shard cumulative rows grow STRICTLY in emission order (the
    # memory sink appends rows in batch-commit order; a shard only
    # emits on batches that routed it >=1 token). A lost-state reset
    # or reordered emission would break this. (Round-11 ADVICE: the
    # previous form sorted ts first, making the check tautological.)
    for s in latest:
        ts = [r.total for r in emitted if r.shard == s]
        assert ts and all(a < b for a, b in zip(ts, ts[1:]))
    # oov_ppm on the latest rows is the exact trunc-div rate
    for r in latest.values():
        assert r.oov_ppm == (r.total - r.covered) * 10**6 // r.total


def test_stream_session_rollup_equals_batch(spark, tmp_path):
    """Native merging session windows on a stream: append-mode rows
    (flushed by a far-future sentinel wave that drives the watermark
    past every real session) are BIT-equal to the batch
    session_rollup over the concatenated real waves -- including a
    session that MERGES across micro-batch boundaries."""
    import datetime as dt

    from etl_on_weather_dataset_spark.streaming.windows import (
        session_rollup,
    )

    base = dt.datetime(2024, 1, 1)
    schema = "event_id long, ts timestamp, user_id long, value double"

    def ev(i, minutes, user, value):
        return (i, base + dt.timedelta(minutes=minutes), user, value)

    # Waves are time-ordered ACROSS users (each wave's min event
    # time >= the prior wave's max): the watermark from wave N must
    # not mark wave N+1's rows late, or the stream legitimately
    # drops what the batch recompute counts. user 1: one session
    # spanning wave0/wave1 (gap 30m; 25m apart), then a separate
    # session 2h later; user 2: three single-event sessions
    waves = [
        [ev(1, 0, 1, 1.25), ev(2, 10, 1, 2.0), ev(3, 0, 2, 5.0)],
        [ev(4, 35, 1, 0.5), ev(5, 40, 2, -1.0)],
        [ev(6, 180, 1, 4.0), ev(7, 185, 1, 0.25), ev(8, 240, 2, 7.5)],
    ]
    land = tmp_path / "land"
    land.mkdir()
    for w, rows in enumerate(waves):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(land / f"wave{w}")
        )
    # two sentinel waves: the first's arrival advances max event time,
    # the second's TRIGGER then runs with a watermark past every real
    # session end (watermark is computed from PRIOR batches), flushing
    # the appends; the sentinel user is excluded from the comparison
    far = 100 * 24 * 60
    for w, rows in enumerate(
        [[ev(900, far, -1, 0.0)], [ev(901, far + 120, -1, 0.0)]]
    ):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(land / f"sentinel{w}")
        )

    real = spark.createDataFrame(
        [e for w in waves for e in w], schema
    )
    batch = {
        (r.user_id, r.session_start, r.session_end):
            (r.n_events, r.total_value)
        for r in session_rollup(real).collect()
    }
    # the cross-wave merge actually exists in the planted data
    assert (1, base, base + dt.timedelta(minutes=65)) in batch
    assert batch[(1, base, base + dt.timedelta(minutes=65))] == (3, 3.75)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(str(land) + "/*")
    )
    q = (
        session_rollup(stream)
        .writeStream.format("memory")
        .queryName("t_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        (r.user_id, r.session_start, r.session_end):
            (r.n_events, r.total_value)
        for r in spark.sql(
            "SELECT * FROM t_sessions WHERE user_id >= 0"
        ).collect()
    }
    assert streamed == batch


def test_stream_digit_monitor_equals_batch_any_order(spark, tmp_path):
    """Benford digit counts on a stream: latest row per digit after
    draining equals the batch audit's counts -- and because counting
    is commutative, the waves are fed NEWEST-FIRST to prove the
    guarantee is order-independent (no event-time contract)."""
    from etl_on_weather_dataset_spark.operators.profile import (
        benford_digit_audit,
    )
    from etl_on_weather_dataset_spark.streaming.windows import (
        stream_digit_monitor,
    )

    schema = "event_id long, value double"
    waves = [
        [(1, 1.00), (2, 19.99), (3, 0.004)],   # digits 1, 1 (0.004 excluded)
        [(4, 2.50), (5, 999.49), (6, None)],   # digits 2, 9
        [(7, 1.23), (8, 5.00), (9, -3.0)],     # digits 1, 5 (-3 excluded)
    ]
    land = tmp_path / "land"
    land.mkdir()
    # newest wave lands FIRST: arrival order is the reverse of id
    # order, and the totals must not care
    for w, rows in enumerate(reversed(waves)):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(land / f"wave{w}")
        )

    all_rows = spark.createDataFrame(
        [r for wv in waves for r in wv], schema
    )
    batch = {
        r.digit: r.n_values
        for r in benford_digit_audit(all_rows, "value").collect()
        if r.n_values > 0
    }
    assert batch == {1: 3, 2: 1, 5: 1, 9: 1}

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(str(land) + "/*")
    )
    q = (
        stream_digit_monitor(stream, "value")
        .writeStream.format("memory")
        .queryName("t_digits")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = spark.sql("SELECT * FROM t_digits").collect()
    latest = {}
    for r in emitted:  # update mode: max cumulative count per digit
        if r.digit not in latest or r.n_values > latest[r.digit]:
            latest[r.digit] = r.n_values
    assert latest == batch
    # per-digit cumulative counts are strictly increasing in
    # emission order (memory sink appends in batch-commit order)
    for d in latest:
        seq = [r.n_values for r in emitted if r.digit == d]
        assert seq and all(a < b for a, b in zip(seq, seq[1:]))
