"""Ingestion utility (S1/S2) + sink tests."""

from __future__ import annotations

import zipfile

import pytest

from etl_on_weather_dataset_spark.sources.ingest import land_zip
from etl_on_weather_dataset_spark.sources.io import write_parquet


def test_land_zip_extracts(tmp_path):
    src = tmp_path / "data.zip"
    with zipfile.ZipFile(src, "w") as zf:
        zf.writestr("weatherHistory.csv", "a,b\n1,2\n")
        zf.writestr("readme.txt", "hi")
    out = land_zip(src, tmp_path / "landed")
    assert sorted(p.name for p in out) == ["readme.txt", "weatherHistory.csv"]
    assert (tmp_path / "landed" / "weatherHistory.csv").read_text().startswith(
        "a,b"
    )


def test_land_zip_rejects_non_zip(tmp_path):
    bad = tmp_path / "not_a.zip"
    bad.write_text("plain text")
    with pytest.raises(ValueError, match="not a valid zip"):
        land_zip(bad, tmp_path / "landed")


def test_land_zip_rejects_path_traversal(tmp_path):
    src = tmp_path / "evil.zip"
    with zipfile.ZipFile(src, "w") as zf:
        zf.writestr("../escape.txt", "boom")
    with pytest.raises(ValueError, match="escapes dest"):
        land_zip(src, tmp_path / "landed")


def test_land_zip_rejects_sibling_prefix_escape(tmp_path):
    """'../land_evil/f' resolves to a SIBLING dir sharing the dest's
    name prefix -- a str.startswith guard would wave it through."""
    src = tmp_path / "evil2.zip"
    with zipfile.ZipFile(src, "w") as zf:
        zf.writestr("../land_evil/f.txt", "boom")
    with pytest.raises(ValueError, match="escapes dest"):
        land_zip(src, tmp_path / "land")
    assert not (tmp_path / "land_evil").exists()


def test_land_zip_rejects_symlink_member(tmp_path):
    src = tmp_path / "evil3.zip"
    with zipfile.ZipFile(src, "w") as zf:
        info = zipfile.ZipInfo("link")
        info.external_attr = (0o120777 << 16)  # S_IFLNK | 0777
        zf.writestr(info, "/etc/passwd")
    with pytest.raises(ValueError, match="symlink"):
        land_zip(src, tmp_path / "landed")


def test_jdbc_append_sink_roundtrip(spark, tmp_path):
    """S5/S6 (ETL.py:241-275): append-mode RDBMS sink via JDBC, using
    Spark's bundled Derby as the embedded database. Appending twice
    doubles the rows (if_exists='append' semantics)."""
    from etl_on_weather_dataset_spark.sources.io import write_jdbc

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id long, name string, val double"
    )
    url = f"jdbc:derby:{tmp_path}/db;create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    write_jdbc(df, url, "t1", mode="append", num_partitions=1, driver=driver)
    write_jdbc(df, url, "t1", mode="append", num_partitions=1, driver=driver)
    back = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "t1")
        .option("driver", driver)
        .load()
    )
    assert back.count() == 4
    assert set(back.columns) == {"id", "name", "val"}


def test_partitioned_parquet_sink_prunes(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 2), (3, "c", 2)], "id long, v string, m int"
    )
    out = str(tmp_path / "t")
    write_parquet(df, out, partition_by=["m"])
    back = spark.read.parquet(out)
    assert back.count() == 3
    # partition pruning: only one directory scanned for m=2
    plan = back.filter("m = 2")._jdf.queryExecution().executedPlan().toString()
    assert back.filter("m = 2").count() == 2


def test_jsonl_roundtrip_and_corrupt_tolerance(spark, tmp_path):
    """JSONL source/sink: values survive the round trip; a corrupt
    line lands in _corrupt_record instead of failing the scan."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from etl_on_weather_dataset_spark.sources.io import (
        read_jsonl,
        write_jsonl,
    )

    df = spark.range(0, 100).select(
        F.col("id"), (F.col("id") * 2).cast("double").alias("v")
    )
    out = str(tmp_path / "out_jsonl")
    write_jsonl(df, out, compression=None)
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.DoubleType())]
    )
    back = read_jsonl(spark, out, schema)
    assert sorted((r["id"], r["v"]) for r in back.collect()) == sorted(
        (i, float(i * 2)) for i in range(100)
    )

    # corrupt line tolerance
    bad_dir = tmp_path / "bad"
    bad_dir.mkdir()
    (bad_dir / "part.json").write_text(
        '{"id": 1, "v": 2.0}\nnot json at all\n{"id": 3, "v": 6.0}\n'
    )
    schema_c = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("v", T.DoubleType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    got = read_jsonl(spark, str(bad_dir), schema_c).cache()
    try:
        assert got.filter("_corrupt_record IS NOT NULL").count() == 1
        assert got.filter("id IS NOT NULL").count() == 2
    finally:
        got.unpersist()


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    from pyspark.sql import functions as F

    from etl_on_weather_dataset_spark.sources.io import read_orc, write_orc

    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 10).alias("bucket")
    )
    out = str(tmp_path / "out_orc")
    write_orc(df, out, partition_by=["bucket"])
    back = read_orc(spark, out).filter(F.col("bucket") == 3)
    assert back.count() == 100
    # partition pruning reaches the scan
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "bucket" in plan


def test_read_parquet_evolving_across_schema_generations(spark, tmp_path):
    """Old files lacking new columns read as typed NULLs; present
    columns cast to the target; stale extra columns are dropped."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from etl_on_weather_dataset_spark.sources.io import (
        read_parquet_evolving,
    )

    gen1 = str(tmp_path / "gen1")  # old: int id, no score, legacy col
    spark.createDataFrame(
        [(1, "a", "junk"), (2, "b", "junk")],
        "id int, name string, legacy string",
    ).write.parquet(gen1)
    gen2 = str(tmp_path / "gen2")  # new: long id, score added
    spark.createDataFrame(
        [(3, "c", 0.5)], "id long, name string, score double"
    ).write.parquet(gen2)

    target = StructType([
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("score", DoubleType()),
    ])
    out = read_parquet_evolving(spark, [gen1, gen2], target)
    assert out.schema == target
    rows = {r.id: (r.name, r.score) for r in out.collect()}
    assert rows == {1: ("a", None), 2: ("b", None), 3: ("c", 0.5)}
    # pushdown survives the projection: filtering on id prunes at scan
    plan = out.filter(F.col("id") == 3)._jdf.queryExecution() \
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
    assert "PushedFilters: [" in plan
