"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference ETL (RimmiBhadani/ETL-on-Weather-dataset,
/root/reference/ETL.py), re-expressed Spark-first.

The public API is the PySpark DataFrame API plus composable
DataFrame -> DataFrame operators:

- ``session``    -- SparkSession factory (UTC tz, AQE, Arrow).
- ``sources``    -- schema-pinned readers and sinks (Parquet/CSV/JDBC).
- ``operators``  -- clean / derive / agg / joins / validate / dedup /
                    similarity / text / json_ops / multimodal.
- ``streaming``  -- Structured Streaming analogues (tumbling windows,
                    watermarks, Trigger.AvailableNow batch cadence).
- ``plans``      -- staged pipeline composition (extract -> transform ->
                    validate -> load), replacing the reference's Airflow
                    DAG (ETL.py:16-21,288).

Everything is built from public PySpark APIs only; no custom Catalyst
rules are needed (SURVEY.md par.4).
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: E402,F401

