"""Explicit schemas for every source table.

The reference infers all schemas from CSV headers (ETL.py:54); at
100 TB an inference pass is a full extra scan and a type-drift hazard,
so every production read here is schema-pinned (SURVEY.md par.1.3).

Two schema families:
- the driver synthetic tables (/root/testdata/sf*/...parquet), and
- the weather fixture mirroring the reference's real input
  (Kaggle muthuj7/weather-dataset, ETL.py:25,32; columns per
  FIXTURES.md par.B).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_I = T.IntegerType()
_L = T.LongType()
_D = T.DoubleType()
_S = T.StringType()
_TS = T.TimestampType()


def _st(*fields: tuple) -> T.StructType:
    return T.StructType([T.StructField(n, t, True) for n, t in fields])


TESTDATA_SCHEMAS: dict[str, T.StructType] = {
    "region": _st(("r_regionkey", _I), ("r_name", _S)),
    "nation": _st(("n_nationkey", _I), ("n_name", _S), ("n_regionkey", _I)),
    "customer": _st(
        ("c_custkey", _L), ("c_name", _S), ("c_nationkey", _I),
        ("c_acctbal", _D), ("c_mktsegment", _S),
    ),
    "supplier": _st(
        ("s_suppkey", _L), ("s_name", _S), ("s_nationkey", _I), ("s_acctbal", _D),
    ),
    "part": _st(
        ("p_partkey", _L), ("p_name", _S), ("p_brand", _S),
        ("p_type", _S), ("p_size", _I), ("p_retailprice", _D),
    ),
    "orders": _st(
        ("o_orderkey", _L), ("o_custkey", _L), ("o_orderstatus", _S),
        ("o_totalprice", _D), ("o_orderdate", _TS), ("o_orderpriority", _S),
    ),
    "lineitem": _st(
        ("l_orderkey", _L), ("l_partkey", _L), ("l_suppkey", _L),
        ("l_linenumber", _I), ("l_quantity", _D), ("l_extendedprice", _D),
        ("l_discount", _D), ("l_tax", _D), ("l_returnflag", _S),
        ("l_linestatus", _S), ("l_shipdate", _TS),
    ),
    "events": _st(
        ("event_id", _L), ("ts", _TS), ("user_id", _L),
        ("event_type", _S), ("value", _D), ("props", _S),
    ),
    "documents": _st(
        ("doc_id", _L), ("text", _S), ("lang", _S),
        ("source", _S), ("n_chars", _L),
    ),
    "embeddings": _st(
        ("vec_id", _L), ("embedding", T.ArrayType(T.FloatType(), True)),
        ("label", _I),
    ),
}

# Weather fixture: the reference's input table, one row per hourly
# observation (columns evidenced at ETL.py:57,61,76 + standard dataset
# columns implied by the sink DDL ETL.py:241-270).
WEATHER_RAW_SCHEMA = _st(
    ("Formatted Date", _S),
    ("Summary", _S),
    ("Precip Type", _S),
    ("Temperature (C)", _D),
    ("Apparent Temperature (C)", _D),
    ("Humidity", _D),
    ("Wind Speed (km/h)", _D),
    ("Wind Bearing (degrees)", _D),
    ("Visibility (km)", _D),
    ("Loud Cover", _D),
    ("Pressure (millibars)", _D),
    ("Daily Summary", _S),
)

# The 5 "critical" numeric columns the reference median-imputes
# (ETL.py:61-62).
WEATHER_CRITICAL_COLS = [
    "Temperature (C)",
    "Humidity",
    "Wind Speed (km/h)",
    "Visibility (km)",
    "Pressure (millibars)",
]


# Timestamp columns whose PHYSICAL parquet type has varied across
# driver testdata generations: TIMESTAMP(NANOS) in rounds 1-2 (Spark
# cannot read natively -> legacy nanos-as-long conf + DIV 1000),
# timestamp[us] (read as TIMESTAMP_NTZ) in round 3. load_table adapts
# to whatever the file actually stores instead of pinning one
# generation's encoding.
_TS_COLS: dict[str, list[str]] = {"events": ["ts"]}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver synthetic table, schema-pinned.

    Parquet carries its own schema, so here the pin is an assertion:
    we select the declared columns (column pruning + order) rather than
    trusting whatever the file grew.
    """
    schema = TESTDATA_SCHEMAS[name]
    # Pin the session timezone: the caller may hand us a session built
    # without get_spark() (e.g. the verification driver), and date /
    # month derivations under a non-UTC tz would shift relative to the
    # UTC-naive DuckDB oracle.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ts_cols = _TS_COLS.get(name, [])
    if ts_cols:
        # allows TIMESTAMP(NANOS) files to load at all; harmless for
        # micros files
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    actual = {f.name: f.dataType for f in df.schema.fields}
    for c in ts_cols:
        if isinstance(actual.get(c), T.LongType):
            # nanos-as-long: integer DIV (float division would lose
            # precision on ~1e18 nanos). DuckDB truncates nanos->micros
            # the same way, so the oracle agrees.
            df = df.withColumn(
                c,
                F.expr(f"timestamp_micros(CAST(`{c}` DIV 1000 AS BIGINT))"),
            )
        elif not isinstance(actual.get(c), T.TimestampType):
            # TIMESTAMP_NTZ (tz-less micros): reinterpret as UTC wall
            # clock -- the session tz is pinned UTC above, so the cast
            # preserves the instant and matches the UTC-naive oracle.
            df = df.withColumn(c, F.col(c).cast(_TS))
    return df.select(*[f.name for f in schema.fields])
