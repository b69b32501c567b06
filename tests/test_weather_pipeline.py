"""End-to-end weather pipeline test (SURVEY.md par.5.3): clean fixture
produces daily/monthly outputs matching a DuckDB-computed golden;
dirty fixture fails validation before load.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from etl_on_weather_dataset_spark.operators.validate import ValidationError
from etl_on_weather_dataset_spark.plans import pipeline

from etl_on_weather_dataset_spark.fixtures import write_fixture


@pytest.fixture(scope="module")
def fixture_paths(tmp_path_factory):
    d = tmp_path_factory.mktemp("weather")
    clean = write_fixture(d / "clean.csv", dirty=False)
    dirty = write_fixture(d / "dirty.csv", dirty=True)
    return str(clean), str(dirty)


def test_clean_pipeline_runs_and_validates(spark, fixture_paths, tmp_path):
    clean, _ = fixture_paths
    out_dir = str(tmp_path / "out")
    res = pipeline.run(spark, clean, output_dir=out_dir)
    assert all(v == 0 for v in res.validation.values())
    daily = spark.read.parquet(f"{out_dir}/daily_weather")
    monthly = spark.read.parquet(f"{out_dir}/monthly_weather")
    assert daily.count() > 0
    assert monthly.count() == 4  # months 4,5,6 (+March: UTC shift of +0200 offsets)
    assert set(monthly.columns) == set(pipeline.MONTHLY_SINK_COLS)
    # partitioned by month for pruning
    assert daily.select("month").distinct().count() == 4


def test_dirty_pipeline_fails_before_load(spark, fixture_paths, tmp_path):
    _, dirty = fixture_paths
    out_dir = str(tmp_path / "never_written")
    with pytest.raises(ValidationError) as ei:
        pipeline.run(spark, dirty, output_dir=out_dir)
    # the sink must not exist (validation gates the load)
    import os

    assert not os.path.exists(out_dir)
    assert ei.value.failures  # named violation counts present


def test_monthly_golden_against_duckdb(spark, fixture_paths):
    """Monthly means + deterministic precip mode vs a DuckDB oracle
    computing the same semantics from the raw CSV."""
    clean, _ = fixture_paths
    res = pipeline.run(spark, clean, output_dir=None, fail_fast=False)
    got = {
        r["month"]: r.asDict() for r in res.monthly.collect()
    }

    con = duckdb.connect()
    oracle = con.sql(f"""
        WITH raw AS (
            SELECT try_strptime("Formatted Date",
                                '%Y-%m-%d %H:%M:%S.%g %z') AT TIME ZONE 'UTC'
                       AS ts, *
            FROM read_csv('{clean}', header=true, all_varchar=false)
        ), dedup AS (
            SELECT DISTINCT * FROM raw
        ), med AS (
            SELECT median("Temperature (C)") AS mt, median("Humidity") AS mh,
                   median("Wind Speed (km/h)") AS mw,
                   median("Visibility (km)") AS mv,
                   median("Pressure (millibars)") AS mp
            FROM dedup
        ), filled AS (
            SELECT month(ts) AS month,
                   COALESCE("Temperature (C)", (SELECT mt FROM med)) AS temp,
                   COALESCE("Humidity", (SELECT mh FROM med)) AS hum,
                   COALESCE("Visibility (km)", (SELECT mv FROM med)) AS vis,
                   COALESCE("Pressure (millibars)", (SELECT mp FROM med)) AS pres,
                   "Precip Type" AS precip
            FROM dedup WHERE ts IS NOT NULL
        ), means AS (
            SELECT month, AVG(temp) a_t, AVG(hum) a_h, AVG(vis) a_v,
                   AVG(pres) a_p
            FROM filled GROUP BY month
        ), modes AS (
            SELECT month, precip FROM (
                SELECT month, precip,
                       ROW_NUMBER() OVER (PARTITION BY month
                           ORDER BY COUNT(*) DESC, precip ASC) rn
                FROM filled WHERE precip IS NOT NULL
                GROUP BY month, precip
            ) WHERE rn = 1
        )
        SELECT means.month, a_t, a_h, a_v, a_p, modes.precip
        FROM means LEFT JOIN modes ON means.month = modes.month
    """).fetchall()
    con.close()

    assert len(oracle) == len(got)
    for month, a_t, a_h, a_v, a_p, precip in oracle:
        row = got[month]
        assert math.isclose(row["avg_temperature_c"], a_t, rel_tol=1e-9)
        assert math.isclose(row["avg_humidity"], a_h, rel_tol=1e-9)
        assert math.isclose(row["avg_visibilty_km"], a_v, rel_tol=1e-9)
        assert math.isclose(row["avg_pressure_millibars"], a_p, rel_tol=1e-9)
        assert row["mode_precip_type"] == precip
