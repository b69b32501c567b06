"""Z-order layout: key properties + measured pruning effectiveness."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_on_weather_dataset_spark.operators.layout import (
    file_span_stats,
    morton_key,
    write_zordered,
)


def _grid_df(spark, n=32):
    # n x n integer grid -> every (x, y) cell occupied
    rows = [(x, y, x * n + y) for x in range(n) for y in range(n)]
    return spark.createDataFrame(rows, "x int, y int, payload long")


def test_morton_key_orders_by_interleaved_bits(spark):
    df = _grid_df(spark, 4)
    out = df.withColumn("zkey", morton_key(df, ["x", "y"], bits=2)).collect()
    by_xy = {(r.x, r.y): r.zkey for r in out}
    # hand-computed Morton codes on a 4x4 grid (x bit i -> pos 2i,
    # y bit i -> pos 2i+1)
    assert by_xy[(0, 0)] == 0
    assert by_xy[(1, 0)] == 1
    assert by_xy[(0, 1)] == 2
    assert by_xy[(1, 1)] == 3
    assert by_xy[(2, 2)] == 12
    assert by_xy[(3, 3)] == 15


def test_morton_key_width_guard(spark):
    df = _grid_df(spark, 2)
    with pytest.raises(ValueError):
        morton_key(df, ["x", "y"], bits=32)


def test_zorder_layout_prunes_on_both_dims(spark, tmp_path):
    """The measurable claim: after Z-order clustering, every file's
    min/max span is a small fraction of the global range on BOTH
    dimensions -- vs a 1-D sort, which leaves the other dimension's
    span at ~1.0 (no pruning)."""
    df = _grid_df(spark, 64)  # 4096 rows over a 64x64 grid

    z_path = str(tmp_path / "zorder")
    write_zordered(df, z_path, ["x", "y"], n_files=16, bits=6)
    z_spans = file_span_stats(z_path, ["x", "y"])
    assert len(z_spans) >= 8

    lin_path = str(tmp_path / "linear")
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite").parquet(lin_path)
    )
    lin_spans = file_span_stats(lin_path, ["x", "y"])

    def avg(spans, c):
        return sum(s[c] for s in spans) / len(spans)

    # 16 files tiling a square: Z-order gives ~1/4 x 1/4 tiles
    assert avg(z_spans, "x") < 0.5
    assert avg(z_spans, "y") < 0.5
    # the 1-D sort can't prune y at all
    assert avg(lin_spans, "y") > 0.9
    # and Z-order's x-span is worse than a pure x-sort (the tradeoff)
    assert avg(lin_spans, "x") < avg(z_spans, "x")

    # round-trip: clustering must not change the data
    back = spark.read.parquet(z_path)
    assert back.count() == 4096
    assert back.agg(F.sum("payload")).first()[0] == sum(range(4096))


def test_zorder_handles_strings_and_constant_columns(spark, tmp_path):
    rows = [(f"u{i % 7}", 5.0, i) for i in range(100)]
    df = spark.createDataFrame(rows, "user string, v double, id long")
    # v is constant (degenerate range) and user is a string: both must
    # still produce a valid layout
    write_zordered(df, str(tmp_path / "s"), ["user", "v"], n_files=4)
    back = spark.read.parquet(str(tmp_path / "s"))
    assert back.count() == 100
    # span stats over a mixed (string, numeric) key: the string
    # column's str/bytes footer stats must be skipped, not float()'d
    # into a ValueError (r4 advice); only numeric columns report
    spans = file_span_stats(str(tmp_path / "s"), ["user", "id"])
    assert spans, "numeric column should still report spans"
    for f in spans:
        assert "user" not in f
        assert set(f) == {"id"}


def test_compact_files_reduces_count_and_preserves_rows(spark, tmp_path):
    from etl_on_weather_dataset_spark.operators.layout import compact_files

    src = str(tmp_path / "small")
    rows = spark.range(10_000).select(
        F.col("id"), (F.col("id") % 97).alias("k")
    )
    rows.repartition(64).write.parquet(src)  # 64 tiny files
    import glob

    assert len(glob.glob(src + "/*.parquet")) == 64

    dst = str(tmp_path / "compact")
    n_out = compact_files(spark, src, dst, target_mb=128, sort_col="id")
    assert n_out <= 4  # ~100 KB of data -> a handful of files
    back = spark.read.parquet(dst)
    assert back.count() == 10_000
    assert back.agg(F.sum("id")).first()[0] == sum(range(10_000))


def test_export_training_shards_order_and_pruning(spark, tmp_path):
    """export_training_shards: the re-read stream in shard order IS
    the exact global order (manifest fingerprints match per shard),
    and a shard filter prunes at the DIRECTORY level (PartitionFilters
    in the scan, no data files of other shards read)."""
    from pyspark.sql import functions as F

    from etl_on_weather_dataset_spark.operators.layout import (
        export_training_shards,
        shard_manifest,
    )

    df = spark.createDataFrame(
        [(i, f"doc{i * 7 % 97}x{i}") for i in range(300)],
        "pos long, doc_id string",
    )
    path = str(tmp_path / "shards")
    n = export_training_shards(df, path, "pos", rows_per_shard=100)
    assert n == 3

    want = {
        r.shard: (r.n_rows, r.order_md5)
        for r in shard_manifest(
            df, "doc_id", "pos", rows_per_shard=100
        ).collect()
    }
    # Fingerprint the PHYSICAL row stream per shard directory (pyarrow,
    # file order, NO re-sort): the on-disk order contract itself is what
    # a data loader consumes, so the test must not launder an unordered
    # file through array_sort before hashing (r7 advice).
    import glob
    import hashlib
    import os

    import pyarrow.parquet as pq

    got = {}
    for shard_dir in sorted(glob.glob(os.path.join(path, "shard=*"))):
        shard = int(shard_dir.rsplit("=", 1)[1])
        ids = []
        for f in sorted(
            glob.glob(os.path.join(shard_dir, "*.parquet"))
        ):
            ids.extend(pq.read_table(f, columns=["doc_id"])
                       .column("doc_id").to_pylist())
        got[shard] = (
            len(ids), hashlib.md5(",".join(ids).encode()).hexdigest()
        )
    assert got == want
    back = spark.read.parquet(path)
    plan = (
        back.where(F.col("shard") == 2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters: [isnotnull(shard" in plan


class TestZorderPruningQuery:
    """The attested z-order data-skipping physics: z-order bounds BOTH
    single-dimension probes while linear clustering prunes only its
    own dimension."""

    def test_pruning_physics_invariants(self, spark):
        from etl_on_weather_dataset_spark.plans.registry import (
            all_queries,
        )

        rows = {
            r.layout: r
            for r in all_queries()["zorder_layout_pruning"](
                spark, "/root/testdata/sf0.001"
            ).collect()
        }
        lin, z = rows["linear"], rows["z"]
        # linear-on-partkey: partkey probe prunes hard, suppkey probe
        # touches every file (suppkey is uncorrelated with the order)
        assert lin.part_probe_files < lin.n_files // 2
        assert lin.supp_probe_files == lin.n_files
        # z-order: BOTH single-dim probes prune below all-files, and
        # the 2-d box prunes at least as hard as either dimension
        assert z.part_probe_files < z.n_files
        assert z.supp_probe_files < z.n_files
        assert z.box_probe_files <= min(
            z.part_probe_files, z.supp_probe_files
        )
        # the trade: z gives up some single-dim sharpness vs the
        # layout clustered ON that dimension...
        assert z.part_probe_files >= lin.part_probe_files
        # ...and wins everywhere the linear layout cannot prune
        assert z.supp_probe_files < lin.supp_probe_files

    def test_interleave_spellings_agree_across_engines(self, spark):
        """The Spark arm uses shiftleft()/shiftright() (the `<<`/`>>`
        operators only parse on Spark >= 4.0, below the declared
        pyspark>=3.5 floor); the DuckDB arm uses the operators.
        Both spell the same interleave."""
        import duckdb
        import pytest

        from etl_on_weather_dataset_spark.operators.layout import (
            interleave_bits_expr,
        )

        vals = [(0, 0), (1, 0), (0, 1), (5, 3), (255, 170)]
        fn = interleave_bits_expr(["a", "b"], 8, shift="fn")
        op = interleave_bits_expr(["a", "b"], 8, shift="op")
        got_spark = [
            r.z
            for r in spark.createDataFrame(vals, "a long, b long")
            .selectExpr("a", "b", f"{fn} AS z")
            .orderBy("a", "b")
            .collect()
        ]
        con = duckdb.connect()
        rows = ", ".join(f"({a}, {b})" for a, b in vals)
        got_duck = [
            r[0]
            for r in con.execute(
                f"SELECT {op} AS z FROM (VALUES {rows}) v(a, b) "
                "ORDER BY a, b"
            ).fetchall()
        ]
        assert got_spark == got_duck
        # reference value: interleave(5=101b, 3=011b), bit i of dim d
        # at position i*2+d: a=5 lands 1<<0 + 0<<2 + 1<<4 = 17,
        # b=3 lands 1<<1 + 1<<3 + 0<<5 = 10 -> 27 = 0b11011
        one = spark.sql(
            "SELECT " + interleave_bits_expr(["5", "3"], 3) + " AS z"
        ).collect()[0].z
        assert one == 0b11011
        with pytest.raises(ValueError, match="shift"):
            interleave_bits_expr(["a"], 2, shift="nope")

    def test_morton_grid_expr_is_integer_exact(self, spark):
        from etl_on_weather_dataset_spark.operators.layout import (
            morton_grid_expr,
        )

        df = spark.createDataFrame(
            [(0,), (50,), (100,)], "x long"
        ).selectExpr(
            "x",
            morton_grid_expr("x", "0", "100", 4, div="div") + " AS g",
        )
        got = {r.x: r.g for r in df.collect()}
        # (x - 0) * 15 div 100
        assert got == {0: 0, 50: 7, 100: 15}
