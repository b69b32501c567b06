"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query (daily rollup over events at
  sf0.001) -- smoke check.
- ``queries()``: every implemented operator/query from SURVEY.md par.2,
  served from the engine's central registry
  (etl_on_weather_dataset_spark/plans/registry.py).
- ``oracle_sql()``: matching DuckDB SQL per query (omitted only for
  genuinely non-SQL-expressible ops -> rows-only check).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# Make the repo importable regardless of the driver's CWD.
_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from etl_on_weather_dataset_spark.plans import registry as _registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    q = _registry.queries()["daily_value_rollup"]
    return q(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    return _registry.oracle_sql()
