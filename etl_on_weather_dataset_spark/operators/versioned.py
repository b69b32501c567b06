"""Generic versioned-directory store discipline (shared mechanics).

The repo keeps three kinds of persistent state between runs -- the
incremental rollup store, the dedup fingerprint stores, and the IVF
index store -- and they all want the same crash-safe layout:

    store_path/
      v1/<payload parquet files>   v1/_COMMITTED
      v2/...                       v2/_COMMITTED

- A writer never mutates an existing version: it writes v{k+1}
  completely and drops the ``_COMMITTED`` marker LAST, so readers and
  the next writer only ever see fully-written versions (a crash
  mid-write leaves marker-less garbage that GC removes).
- Retention (:func:`vacuum`) deletes versions strictly below
  ``current - keep_last + 1``, dropping each version's marker FIRST:
  a concurrent version scan can never select a half-deleted version
  because a version is only selectable while its marker exists.

Markers use the Hadoop FS API (HDFS/S3A/local all work) rather than
Spark's ``_SUCCESS``, which disappears under
``mapreduce.fileoutputcommitter.marksuccessfuljobs=false`` -- the
standard object-store setting.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession

COMMITTED = "_COMMITTED"


def fs_for(spark: SparkSession, path: str):
    """(hadoop FileSystem, hadoop Path, jvm) for ``path``."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath, jvm


def committed_versions(spark: SparkSession, store_path: str) -> list[int]:
    """All committed version numbers, ascending ([] if none)."""
    fs, jpath, jvm = fs_for(spark, store_path)
    if not fs.exists(jpath):
        return []
    found: list[int] = []
    for status in fs.listStatus(jpath):
        name = status.getPath().getName()
        m = re.fullmatch(r"v(\d+)", name)
        if m and fs.exists(
            jvm.org.apache.hadoop.fs.Path(status.getPath(), COMMITTED)
        ):
            found.append(int(m.group(1)))
    return sorted(found)


def current_version(spark: SparkSession, store_path: str) -> int:
    """Highest committed version number, or 0 if none."""
    versions = committed_versions(spark, store_path)
    return versions[-1] if versions else 0


def commit(spark: SparkSession, version_base: str) -> None:
    """Publish a fully-written version directory (marker LAST)."""
    fs, _, jvm = fs_for(spark, version_base)
    fs.create(
        jvm.org.apache.hadoop.fs.Path(version_base + "/" + COMMITTED),
        True,
    ).close()


def vacuum(
    spark: SparkSession, store_path: str, keep_last: int = 2
) -> list[int]:
    """Delete versions older than the newest ``keep_last`` committed
    ones (marker-first; see module docstring); returns the deleted
    version numbers. Marker-less directories below the cutoff are
    crash garbage (writers only ever write ``current + 1``, which is
    above any cutoff) and are removed too."""
    fs, jpath, jvm = fs_for(spark, store_path)
    if not fs.exists(jpath):
        return []
    cutoff = current_version(spark, store_path) - keep_last + 1
    deleted: list[int] = []
    for status in fs.listStatus(jpath):
        name = status.getPath().getName()
        m = re.fullmatch(r"v(\d+)", name)
        if not m or int(m.group(1)) >= cutoff:
            continue
        marker = jvm.org.apache.hadoop.fs.Path(status.getPath(), COMMITTED)
        if fs.exists(marker):
            fs.delete(marker, False)  # de-list before removing files
        fs.delete(status.getPath(), True)
        deleted.append(int(m.group(1)))
    return sorted(deleted)
