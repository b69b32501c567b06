"""Data-layout optimization: Z-order (Morton) clustered parquet.

At 100 TB the cheapest scan is the one you skip: parquet keeps min/max
stats per file and per row-group, and engines prune against pushed
filters. A table sorted by ONE column prunes only on that column;
interleaving the bits of SEVERAL columns (the Z-order / Morton curve,
what Delta Lake's OPTIMIZE ZORDER BY does) makes every file cover a
small hyper-rectangle, so filters on ANY of the clustered columns
skip most files.

All codegen: the Morton key is ~bits*dims bitwise expressions, the
layout is repartitionByRange + sortWithinPartitions on that key --
a single range shuffle, no UDFs, no global sort bottleneck (range
partitioning samples boundaries, then partitions sort independently).

Numeric columns are min-max scaled onto the bit grid (two-scalar agg,
collected once -- same documented driver-coordination budget as the
PageRank node count); string columns are xxhash64-bucketed (no
locality to preserve, but they join the key so equality filters still
prune).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


_NUMERIC = ("tinyint", "smallint", "int", "bigint", "float", "double",
            "date", "timestamp", "timestamp_ntz")


def _ordered_col(df: DataFrame, col: str) -> Column | None:
    """Order-preserving numeric view of a column, or None if the
    column can only be hash-bucketed."""
    dtype = dict(df.dtypes)[col]
    if dtype not in _NUMERIC:
        return None
    c = F.col(col)
    if dtype in ("date", "timestamp", "timestamp_ntz"):
        c = F.unix_timestamp(c)
    return c


def _to_grid(
    c: Column | None, col: str, bits: int,
    bounds: tuple[float, float] | None,
) -> Column:
    """Map a column onto [0, 2^bits) preserving order (numeric, with
    precomputed bounds) or via hash bucketing (string/other)."""
    cells = (1 << bits) - 1
    if c is not None:
        lo, hi = bounds
        if lo is None or hi is None or float(hi) == float(lo):
            return F.lit(0).cast("long")
        lo_f, hi_f = float(lo), float(hi)
        scaled = (c.cast("double") - lo_f) / (hi_f - lo_f) * cells
        return F.least(F.lit(cells).cast("long"),
                       F.greatest(F.lit(0).cast("long"),
                                  F.round(scaled).cast("long")))
    return F.pmod(F.xxhash64(F.col(col)), F.lit(1 << bits)).cast("long")


def morton_key(df: DataFrame, cols: list[str], bits: int = 12) -> Column:
    """Interleaved-bit (Z-order) key over ``cols``.

    ``bits`` per dimension; total key width bits*len(cols) must fit a
    long (<= 63). Bit i of dimension d lands at position
    ``i*len(cols) + d``, so sorting by the key visits the Morton
    curve.
    """
    dims = len(cols)
    if bits * dims > 63:
        raise ValueError(f"{bits} bits x {dims} dims exceeds a long")
    # ONE combined min/max aggregate for every numeric dimension --
    # not one scan per column
    ordered = {c: _ordered_col(df, c) for c in cols}
    numeric = [c for c in cols if ordered[c] is not None]
    bounds: dict[str, tuple[float, float]] = {}
    if numeric:
        aggs = []
        for c in numeric:
            aggs.append(F.min(ordered[c]).alias(f"lo_{c}"))
            aggs.append(F.max(ordered[c]).alias(f"hi_{c}"))
        row = df.agg(*aggs).first()
        for c in numeric:
            bounds[c] = (row[f"lo_{c}"], row[f"hi_{c}"])
    grids = [
        _to_grid(ordered[c], c, bits, bounds.get(c)) for c in cols
    ]
    terms = [
        F.shiftleft(F.shiftright(g, i).bitwiseAND(F.lit(1)), i * dims + d)
        for d, g in enumerate(grids)
        for i in range(bits)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), terms).alias("zkey")


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 8,
    bits: int = 12,
) -> None:
    """Write ``df`` as parquet clustered on the Z-order of ``cols``.

    repartitionByRange on the Morton key (one sampled range shuffle)
    + sortWithinPartitions keeps row-groups tight WITHIN files too.
    The key itself is dropped before writing -- it's layout, not data.
    """
    keyed = df.withColumn("_zkey", morton_key(df, cols, bits))
    (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_span_stats(
    spark_files_path: str, cols: list[str]
) -> list[dict[str, float]]:
    """Read back per-file min/max spans of ``cols`` from parquet
    footers (pyarrow): the pruning-effectiveness measurement. Returns
    one dict per file with ``{col: normalized_span}`` where span is
    (file_max - file_min) / (global_max - global_min).

    A random layout gives spans ~1.0 (every file covers the whole
    range, nothing prunes); a good multi-dim clustering gives spans
    well below 1 on EVERY clustered column simultaneously.
    """
    import glob
    import os

    import pyarrow.parquet as pq

    paths = sorted(glob.glob(os.path.join(spark_files_path, "*.parquet")))
    per_file: list[dict[str, tuple[float, float]]] = []
    for p in paths:
        md = pq.ParquetFile(p).metadata
        mins: dict[str, float] = {}
        maxs: dict[str, float] = {}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                name = c.path_in_schema
                if name not in cols or c.statistics is None:
                    continue
                # Z-order keys may include string columns (hash-
                # bucketed into the Morton key); their footer stats
                # are str/bytes with no numeric span -- skip them
                # instead of raising (r4 advice), and only report
                # spans for ordered numeric columns.
                if not isinstance(c.statistics.min, (int, float)) or \
                        isinstance(c.statistics.min, bool):
                    continue
                mins[name] = min(mins.get(name, float("inf")),
                                 float(c.statistics.min))
                maxs[name] = max(maxs.get(name, float("-inf")),
                                 float(c.statistics.max))
        if mins:
            per_file.append({c: (mins[c], maxs[c]) for c in mins})
    out: list[dict[str, float]] = []
    for f in per_file:
        spans = {}
        for c, (lo, hi) in f.items():
            glo = min(x[c][0] for x in per_file)
            ghi = max(x[c][1] for x in per_file)
            spans[c] = (hi - lo) / (ghi - glo) if ghi > glo else 0.0
        out.append(spans)
    return out


def compact_files(
    spark,
    src_path: str,
    dst_path: str,
    target_mb: int = 128,
    sort_col: str | None = None,
) -> int:
    """Rewrite a many-small-files parquet dataset into ~target_mb
    files; returns the output file count.

    The small-files problem is the quiet killer of 100 TB scans: a
    1-row-group 1 MB file costs a task schedule + footer parse + seek,
    so a million of them dominates wall-clock before a byte of real
    IO. Compaction = one read + one write with the file count derived
    from the ACTUAL byte size (filesystem listing, not a row-count
    guess), optionally re-sorting to restore clustering (pass the
    Z-order/cluster column).

    Scale notes: repartition(n) is a full shuffle -- that's the point
    (it rebalances skewed small files); with ``sort_col`` we use
    repartitionByRange+sort so the rewrite also restores locality.
    Run per-partition-directory at scale, not over the whole table.
    """
    fs_path = spark._jvm.org.apache.hadoop.fs.Path(src_path)
    fs = fs_path.getFileSystem(spark._jsc.hadoopConfiguration())
    total_bytes = fs.getContentSummary(fs_path).getLength()
    # nearest int, not floor: 255 MB at target 128 must give 2 files
    n = max(1, round(total_bytes / (target_mb * 1024 * 1024)))
    df = spark.read.parquet(src_path)
    if sort_col is not None:
        df = df.repartitionByRange(n, sort_col).sortWithinPartitions(sort_col)
    else:
        df = df.repartition(n)
    df.write.mode("overwrite").parquet(dst_path)
    out = spark._jvm.org.apache.hadoop.fs.Path(dst_path)
    return sum(
        1
        for s in fs.listStatus(out)
        if s.getPath().getName().endswith(".parquet")
    )


def export_training_shards(
    df,
    path: str,
    pos_col: str = "pos",
    rows_per_shard: int = 1_000_000,
):
    """Materialize a training order (e.g. curriculum_interleave's
    ``pos``) as directory-partitioned parquet shards a data loader
    can stream IN ORDER without a global sort at read time.

    shard = pos div rows_per_shard -- an explicit value, not a range
    sample, so the file layout is deterministic (repartitionByRange's
    sampled bounds are not); rows are sorted by pos WITHIN each shard
    dir, so a loader reads shard=0,1,2,... sequentially and gets the
    exact global order. Readers filtering on shard prune at the
    DIRECTORY level (partition pruning, no footer reads at all).

    Returns the shard count. The attestable manifest (per-shard row
    counts, pos ranges, an order-sensitive fingerprint) is computed
    by :func:`shard_manifest` from the same frame -- pure SQL, so a
    DuckDB twin can pin it.
    """
    from pyspark.sql import functions as F

    # exact integer division (`div`), not double-divide + truncating
    # cast: bit-identical to the SQL twin's `//` at any pos magnitude
    sharded = df.withColumn(
        "shard",
        F.expr(f"CAST(`{pos_col}` AS BIGINT) div {int(rows_per_shard)}"),
    )
    # Sort by (shard, pos): the dynamic-partition write REQUIRES its
    # rows clustered by the partition column, and a sort by pos alone
    # would make Spark insert its own Sort(shard) above ours --
    # within-shard pos order would then survive only via
    # non-contractual sort stability. Sorting by (shard, pos) already
    # satisfies the write's required ordering, so no extra sort is
    # inserted and the on-disk row order IS pos order per shard.
    (
        sharded.repartition("shard")
        .sortWithinPartitions("shard", pos_col)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    return sharded.select("shard").distinct().count()


def shard_manifest(
    df,
    id_col: str,
    pos_col: str = "pos",
    rows_per_shard: int = 1_000_000,
):
    """Per-shard manifest of a training order: (shard, n_rows,
    min_pos, max_pos, order_md5) where order_md5 fingerprints the ID
    SEQUENCE in pos order -- two exports with the same manifest feed
    byte-identical training streams.

    The ordered fingerprint needs an ordered aggregation; per-shard
    row count is bounded by ``rows_per_shard``, so the sort+concat is
    bounded-memory by construction (the same argument as context
    windows' session arrays).
    """
    from pyspark.sql import functions as F

    return (
        df.select(
            F.expr(
                f"CAST(`{pos_col}` AS BIGINT) div {int(rows_per_shard)}"
            ).alias("shard"),
            F.col(pos_col).alias("p"),
            F.col(id_col).cast("string").alias("i"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("p").cast("long").alias("min_pos"),
            F.max("p").cast("long").alias("max_pos"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("p", "i"))
                        ),
                        lambda s: s["i"],
                    ),
                )
            ).alias("order_md5"),
        )
        .orderBy("shard")
    )


def shard_manifest_sql(
    ordered_sql: str,
    id_col: str,
    pos_col: str = "pos",
    rows_per_shard: int = 1_000_000,
) -> str:
    """DuckDB twin of :func:`shard_manifest`."""
    return f"""
        SELECT {pos_col} // {rows_per_shard} AS shard,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(MIN({pos_col}) AS BIGINT) AS min_pos,
               CAST(MAX({pos_col}) AS BIGINT) AS max_pos,
               md5(string_agg(CAST({id_col} AS VARCHAR), ','
                              ORDER BY {pos_col})) AS order_md5
        FROM ({ordered_sql})
        GROUP BY shard ORDER BY shard
    """


# --- integer-exact Z-order (attestable twin of morton_key) ------------------------


def morton_grid_expr(
    c: str, lo: str, hi: str, bits: int, div: str = "div"
) -> str:
    """Order-preserving integer grid cell in [0, 2^bits) as a SQL
    expression: ``(c - lo) * (2^bits - 1) div (hi - lo)`` -- pure
    BIGINT arithmetic (no doubles, no rounding), exact in any engine.
    ``div`` is the integer-division spelling (Spark ``div``, DuckDB
    ``//`` -- both truncate toward zero, and the operand here is
    non-negative anyway). Degenerate ranges collapse to cell 0."""
    cells = (1 << bits) - 1
    return (
        f"(CASE WHEN ({hi}) = ({lo}) THEN 0 "
        f"ELSE (({c}) - ({lo})) * {cells} {div} (({hi}) - ({lo})) "
        f"END)"
    )


def interleave_bits_expr(
    g_cols: list[str], bits: int, shift: str = "fn"
) -> str:
    """SQL expression interleaving the bit patterns of pre-computed
    grid columns (bit i of dimension d lands at i*dims + d).

    ``shift`` picks the bit-shift spelling, mirroring
    :func:`morton_grid_expr`'s ``div`` parameter: ``"fn"`` emits
    ``shiftleft()``/``shiftright()`` (the Spark arm -- the `<<`/`>>`
    operators only parse on Spark >= 4.0, below the declared
    pyspark>=3.5 floor, while the functions exist since 1.5);
    ``"op"`` emits `<<`/`>>` (the DuckDB arm, which has the
    operators but not the functions)."""
    dims = len(g_cols)
    if shift == "fn":
        terms = [
            f"shiftleft(shiftright({g}, {i}) & 1, {i * dims + d})"
            for d, g in enumerate(g_cols)
            for i in range(bits)
        ]
    elif shift == "op":
        terms = [
            f"((({g} >> {i}) & 1) << {i * dims + d})"
            for d, g in enumerate(g_cols)
            for i in range(bits)
        ]
    else:
        raise ValueError(f"shift must be 'fn' or 'op', got {shift!r}")
    return "(" + " | ".join(terms) + ")"
