"""The weather ETL pipeline: the reference DAG re-expressed as one lazy
Spark plan.

Reference mapping (SURVEY.md par.3):
- Airflow DAG extract >> transform >> validate >> load (ETL.py:288)
  becomes function composition over DataFrames; XCom file-path handoffs
  and CSV round-trips between tasks (ETL.py:126-129,147-148,209-210)
  disappear -- Catalyst carries lineage.
- validate raising aborts before load (trigger_rule='all_success',
  ETL.py:283) becomes a fail-fast `check()` between transform and the
  sink writes.
- The shared cleaned fact table feeds three branches (daily agg,
  monthly agg, wind-strength details); in eager pandas that reuse is
  free, in lazy Spark we `cache()` it for the duration of the run
  (SURVEY.md par.4 "common subplan reuse").

Scale notes: outputs partitioned by month; validation is ONE aggregate
pass; the only Python anywhere is the driver-side composition -- every
expression is codegen'd.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.agg import grouped_mode, mean_rollup
from ..operators.clean import coerce_timestamp, dedup_exact, impute_median
from ..operators.derive import with_date_parts, with_wind_strength
from ..operators.joins import fanout_join_daily
from ..operators.validate import (
    Expectation,
    at_least,
    check,
    in_range,
    not_null,
)
from ..schemas import WEATHER_CRITICAL_COLS, WEATHER_RAW_SCHEMA
from ..sources.io import read_csv, write_parquet

# Validation bounds (ETL.py:151-153) and outlier thresholds (ETL.py:184).
TEMP_RANGE = (-50.0, 50.0)
HUMIDITY_RANGE = (0.0, 1.0)
WIND_MIN = 0.0
OUTLIER_TEMP_RANGE = (-30.0, 40.0)

# Sink column renames (ETL.py:214-233). 'avg_visibilty_km' [sic]
# preserves the reference's canonical output spelling.
DAILY_SINK_RENAMES = {
    "date": "formatted_date",
    "avg_temperature_c": "temperature_c",
    "avg_humidity": "humidity",
    "avg_wind_speed_kmh": "wind_speed_kmh",
}
MONTHLY_SINK_COLS = [
    "month",
    "avg_temperature_c",
    "avg_humidity",
    "avg_visibilty_km",
    "avg_pressure_millibars",
    "mode_precip_type",
]


@dataclass
class WeatherPipelineResult:
    daily: DataFrame
    monthly: DataFrame
    validation: dict[str, int] = field(default_factory=dict)
    # the cached cleaned fact table (unpersisted by run() after sinks)
    _cached: DataFrame | None = None


def extract(spark: SparkSession, csv_path: str) -> DataFrame:
    """S3: schema-pinned CSV scan of the landed weather file
    (ETL.py:54; Kaggle download/unzip is an out-of-engine landing
    step, ETL.py:29-43)."""
    return read_csv(spark, csv_path, WEATHER_RAW_SCHEMA)


def transform(df: DataFrame) -> WeatherPipelineResult:
    """The reference transform (ETL.py:52-133) as one lazy plan."""
    # P1: parse timestamps, null on error (real format has a tz offset)
    df = coerce_timestamp(
        df, "Formatted Date", fmt="yyyy-MM-dd HH:mm:ss.SSS xx"
    )
    # D1: full-row dedup (ETL.py:58)
    df = dedup_exact(df)
    # I1: median-impute the 5 critical columns (ETL.py:61-62 intent).
    # Medians are computed BEFORE dropping unparseable-timestamp rows,
    # matching the reference's statement order (parse:57 -> dedup:58 ->
    # fillna:61; NaT rows only vanish at groupby, which drops null keys)
    df = impute_median(df, WEATHER_CRITICAL_COLS)
    # pandas groupby drops null keys; Spark keeps them -> filter here
    df = df.filter(F.col("Formatted Date").isNotNull())
    # P2/P3: derive date + month (ETL.py:65-66)
    df = with_date_parts(df, "Formatted Date")
    # U1: Beaufort bucketing (ETL.py:80-107)
    df = with_wind_strength(df, "Wind Speed (km/h)")
    # Shared fact table feeds 3 branches -> cache once (SURVEY par.4)
    df = df.cache()

    # A1: daily means (ETL.py:69-73). scale=1000: inputs are 2-dp and
    # the imputed median is at most 3-dp (midpoint of two 2-dp values),
    # so scaled-integer sums make the means exact + engine-portable.
    daily_agg = mean_rollup(
        df,
        ["date"],
        {
            "Temperature (C)": "avg_temperature_c",
            "Humidity": "avg_humidity",
            "Wind Speed (km/h)": "avg_wind_speed_kmh",
        },
        scale=1000,
    )
    # J1: fan daily means back out to distinct (date, ts, strength)
    # triples (ETL.py:109-113)
    daily = fanout_join_daily(
        daily_agg, df, "date", ["Formatted Date", "wind_strength"]
    )

    # A3 (+A2 folded in, ETL.py:116-123): monthly means + precip mode
    monthly_means = mean_rollup(
        df,
        ["month"],
        {
            "Temperature (C)": "avg_temperature_c",
            "Humidity": "avg_humidity",
            "Visibility (km)": "avg_visibilty_km",  # sic, ETL.py:229
            "Pressure (millibars)": "avg_pressure_millibars",
        },
        scale=1000,
    )
    monthly_mode = grouped_mode(df, ["month"], "Precip Type", "mode_precip_type")
    monthly = monthly_means.join(monthly_mode, "month", "left")

    return WeatherPipelineResult(daily=daily, monthly=monthly, _cached=df)


def daily_expectations() -> list[Expectation]:
    """F1-F3 on the daily output (ETL.py:151-167)."""
    return [
        not_null(["formatted_date", "temperature_c", "humidity",
                  "wind_speed_kmh"]),
        in_range("temperature_c", *TEMP_RANGE),
        in_range("humidity", *HUMIDITY_RANGE),
        at_least("wind_speed_kmh", WIND_MIN),
    ]


def monthly_expectations() -> list[Expectation]:
    """F1-F3 on the monthly output (ETL.py:171-180)."""
    return [
        not_null(["month", "avg_temperature_c", "avg_humidity"]),
        in_range("avg_temperature_c", *TEMP_RANGE),
        in_range("avg_humidity", *HUMIDITY_RANGE),
    ]


def reshape_daily(daily: DataFrame) -> DataFrame:
    """P5/P6: drop helper cols, rename to sink schema (ETL.py:213-221)."""
    out = daily.withColumnsRenamed(
        {
            "avg_temperature_c": "temperature_c",
            "avg_humidity": "humidity",
            "avg_wind_speed_kmh": "wind_speed_kmh",
        }
    )
    return out.select(
        F.col("Formatted Date").alias("formatted_date"),
        "temperature_c", "humidity", "wind_speed_kmh", "wind_strength",
    ).withColumn("month", F.month("formatted_date"))


def reshape_monthly(monthly: DataFrame) -> DataFrame:
    """P5/P6 monthly variant (ETL.py:223-233)."""
    return monthly.select(*MONTHLY_SINK_COLS)


def run(
    spark: SparkSession,
    csv_path: str,
    output_dir: str | None = None,
    fail_fast: bool = True,
) -> WeatherPipelineResult:
    """extract -> transform -> validate -> load.

    Validation failure raises ValidationError BEFORE any sink write
    (the reference's all_success trigger rule). With ``output_dir``
    set, writes daily_weather/monthly_weather parquet (partitioned by
    month -- the 100 TB pruning key); otherwise returns the DataFrames.
    """
    raw = extract(spark, csv_path)
    result = transform(raw)
    daily_out = reshape_daily(result.daily)
    monthly_out = reshape_monthly(result.monthly)

    validation: dict[str, int] = {}
    if fail_fast:
        validation.update(check(daily_out, daily_expectations()))
        validation.update(check(monthly_out, monthly_expectations()))

    if output_dir is not None:
        write_parquet(
            daily_out, f"{output_dir}/daily_weather", partition_by=["month"]
        )
        write_parquet(monthly_out, f"{output_dir}/monthly_weather")
        # sinks are materialized -- release the cached fact table so a
        # long-lived session doesn't accumulate block-manager memory
        if result._cached is not None:
            result._cached.unpersist()

    return WeatherPipelineResult(
        daily=daily_out, monthly=monthly_out, validation=validation
    )
