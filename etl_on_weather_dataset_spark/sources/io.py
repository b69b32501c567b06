"""Sources / sinks (SURVEY.md par.2a S1-S6).

- S3 CSV scan (`pd.read_csv`, ETL.py:54) -> schema-pinned header CSV
  read. Never `inferSchema` in a production path: at 100 TB that is a
  full extra pass over the data.
- S4 CSV sink (ETL.py:128-129) -> header CSV write; engine default is
  Parquet (columnar, splittable, predicate-pushdown-able), optionally
  partitioned by a date/month column so downstream reads prune.
- S5/S6 RDBMS DDL + append (ETL.py:241-275) -> JDBC append sink with
  per-partition connections (or `saveAsTable` into the catalog).

Ingestion (S1 Kaggle download, S2 unzip -- ETL.py:29-43) is an
out-of-engine landing step; the engine reads landed files.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType
from pyspark.sql import functions as F


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    **options: str,
) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .options(**options)
        .csv(path)
    )


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
    target_files: int | None = None,
) -> None:
    """Engine-default sink. ``partition_by`` a low-cardinality time
    column (month/date) so a 100 TB table prunes on time predicates.

    ``target_files`` controls output file count: small-file storms
    (one file per task x partition) are the classic large-cluster sink
    pathology; coalesce merges without a shuffle. Size so each file
    lands ~128MB-1GB."""
    if target_files is not None:
        df = df.coalesce(target_files)
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", "true").csv(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    **options: str,
) -> DataFrame:
    """JSON-lines scan, schema-pinned (schema inference on JSON is a
    full extra pass AND type-unstable -- never in a production path).
    Corrupt lines land in a `_corrupt_record` column if the schema
    declares one, rather than failing the scan (PERMISSIVE default)."""
    return spark.read.schema(schema).options(**options).json(path)


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str | None = "gzip",
) -> None:
    """JSON-lines sink -- the interchange format of most LLM-data
    tooling. Compressed by default: JSONL is ~5-10x parquet's size
    uncompressed and the sink is usually an export boundary."""
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
) -> None:
    """ORC sink: same columnar/pushdown properties as parquet; exists
    so warehouses standardized on ORC can consume engine output
    directly."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batch_size: int = 10_000,
    num_partitions: int | None = None,
    **properties: str,
) -> None:
    """S6 append sink. One JDBC connection per partition; cap
    ``num_partitions`` so a wide cluster doesn't open thousands of
    connections against one database (coalesce, no shuffle)."""
    if num_partitions is not None:
        df = df.coalesce(num_partitions)
    (
        df.write.mode(mode)
        .format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .options(**properties)
        .save()
    )


def read_parquet_evolving(
    spark: SparkSession,
    paths: list[str] | str,
    target_schema: StructType,
) -> DataFrame:
    """Read parquet written across SCHEMA GENERATIONS into one frame
    with the caller's target schema -- the lakehouse reality at
    100 TB, where years-old files lack columns added last quarter:

    - missing columns come back as typed NULLs (never a read error),
    - present columns CAST to the target type (widenings like
      int->bigint, float->double -- parquet footers stay authoritative
      for what was written, the target for what downstream sees),
    - extra columns in old files are dropped (column pruning still
      pushes down: the scan reads only the target's columns that
      exist in each file).

    Each path is one schema GENERATION (internally consistent --
    typically a partition/era directory). Spark's ``mergeSchema``
    cannot widen types across files (int-vs-long parquet footers fail
    CANNOT_MERGE_SCHEMAS), so each generation is read with its own
    footer schema, projected to the target, and union-by-name'd --
    a driver loop over GENERATIONS (a handful), never over files;
    within each branch Catalyst keeps pushdown and pruning, and the
    union is a no-shuffle bag concat."""
    from functools import reduce

    def _project(df: DataFrame) -> DataFrame:
        return df.select(*[
            (F.col(f.name).cast(f.dataType) if f.name in df.columns
             else F.lit(None).cast(f.dataType)).alias(f.name)
            for f in target_schema.fields
        ])

    path_list = paths if isinstance(paths, list) else [paths]
    return reduce(
        lambda a, b: a.unionByName(b),
        (_project(spark.read.parquet(p)) for p in path_list),
    )
