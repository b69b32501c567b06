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
