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
