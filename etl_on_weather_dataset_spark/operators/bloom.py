"""Distributed Bloom filter in pure DataFrame expressions.

PySpark exposes no bloom_filter_agg/might_contain SQL surface, and a
driver-side sketch object would not scale anyway: a filter sized for
10^10 keys is tens of GB -- nothing any single node should hold. This
implementation keeps the filter DISTRIBUTED end to end:

- build: each key sets k bit positions (seeded xxhash64 % m); the
  bitmap lives as (word_idx, bits) rows -- a bit_or aggregation over
  64-bit words, sized m/64 rows, shuffled once on word_idx;
- probe: each probe key explodes to its k positions, equi-joins the
  bitmap on word_idx, and is a member iff ALL k bits are set
  (bool_and after the join). The bitmap side is tiny relative to the
  probe side and broadcasts under AQE.

Deterministic: same seeds -> same bits on build and probe, so members
can never miss (the Bloom no-false-negative guarantee holds exactly),
and retries/partitionings cannot perturb the filter.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key: Column, m_bits: int, k: int) -> Column:
    """Array of k bit positions for a key (seeded xxhash64 % m)."""
    return F.array(*[
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits))
        for i in range(k)
    ])


def build_bloom(
    df: DataFrame, key: str, m_bits: int, k: int = 8
) -> DataFrame:
    """Aggregate a Bloom bitmap over ``df[key]`` -> (word_idx, bits).

    m_bits should be ~16x the expected distinct keys for k=8
    (false-positive rate ~5e-4); both are explicit because sizing is a
    capacity decision, not something to infer per-run.
    """
    pos = _positions(F.col(key), m_bits, k)
    # shiftleft's shift amount must be a column here -> expr form
    exploded = df.select(F.explode(pos).alias("p")).select(
        (F.col("p") / 64).cast("long").alias("word_idx"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))")
        .alias("bit"),
    )
    return exploded.groupBy("word_idx").agg(
        F.bit_or("bit").alias("bits")
    )


def probe_bloom(
    bloom: DataFrame,
    probes: DataFrame,
    key: str,
    m_bits: int,
    k: int = 8,
) -> DataFrame:
    """Add a boolean ``bloom_hit`` per probe row: True iff every one
    of the key's k bits is set (possible member); False otherwise
    (definitely absent)."""
    pos = _positions(F.col(key), m_bits, k)
    probe_bits = probes.select(
        key, F.explode(pos).alias("p")
    ).select(
        key,
        (F.col("p") / 64).cast("long").alias("word_idx"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))")
        .alias("bit"),
    )
    hits = (
        probe_bits.join(bloom, "word_idx", "left")
        .withColumn(
            "hit_i",
            (F.coalesce(F.col("bits"), F.lit(0))
             .bitwiseAND(F.col("bit")) != 0),
        )
        .groupBy(key)
        .agg(F.min("hit_i").alias("bloom_hit"))
    )
    return probes.join(hits, key, "left").na.fill({"bloom_hit": False})


# --- count-min sketch + heavy hitters ----------------------------------------

def _cms_cells(key: Column, width: int, depth: int) -> Column:
    """array<struct<row int, cell long>>: one md5-bucket cell per
    sketch row, salted by the row index (operators/sample.py
    hash_bucket -- engine-portable, so the oracle rebuilds the same
    sketch cell-for-cell)."""
    from .sample import hash_bucket

    return F.array(*[
        F.struct(
            F.lit(r).alias("row"),
            hash_bucket(key, buckets=width, salt=f"cms{r}").alias("cell"),
        )
        for r in range(depth)
    ])


def build_count_min(
    df: DataFrame,
    key: str,
    width: int,
    depth: int = 4,
) -> DataFrame:
    """Distributed count-min sketch over ``df[key]`` -> (row, cell,
    cnt): depth x width counter rows, never a driver-side object (a
    sketch for a 10^10-key stream is GBs of counters; it stays a
    DataFrame, and two sketches merge by unioning and re-summing
    cells -- the multi-batch story). Build is one explode (depth rows
    per input row) + one (row, cell)-keyed sum: constant-width
    shuffle keys, map-side combine.

    NULL keys are EXCLUDED on build and probe (a NULL hashes to a
    NULL cell no probe's null-unequal equi-join could ever reach, so
    counting them would silently break est >= true); the one-sided
    guarantee therefore reads "for every non-null key".
    """
    return (
        df.filter(F.col(key).isNotNull())
        .select(
            F.explode(_cms_cells(F.col(key), width, depth)).alias("rc")
        )
        .select("rc.row", "rc.cell")
        .groupBy("row", "cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimates(
    sketch: DataFrame,
    keys: DataFrame,
    key: str,
    width: int,
    depth: int = 4,
) -> DataFrame:
    """Point estimates for ``keys[key]``: est = min over sketch rows
    of the key's cell counter -- the count-min guarantee is one-sided
    (est >= true count for every NON-NULL key, always; collisions
    only inflate -- NULL keys are excluded on build and probe, see
    build_count_min). The probe side explodes to depth rows and
    equi-joins the sketch on (row, cell); a missing cell counts 0.

    Returns (key, est).
    """
    keys = keys.filter(F.col(key).isNotNull())
    probes = keys.select(
        F.col(key).alias("k"),
        F.explode(_cms_cells(F.col(key), width, depth)).alias("rc"),
    ).select("k", "rc.row", "rc.cell")
    return (
        probes.join(sketch, ["row", "cell"], "left")
        .na.fill({"cnt": 0})
        .groupBy("k")
        .agg(F.min("cnt").alias("est"))
        .select(F.col("k").alias(key), "est")
    )


def cms_sql(
    table_sql: str,
    key: str,
    width: int,
    depth: int = 4,
) -> str:
    """DuckDB CTEs rebuilding the same sketch: yields ``cms(row,
    cell, cnt)`` over a (k) subquery -- splice into a WITH chain."""
    from .sample import hash_bucket_sql

    arms = " UNION ALL ".join(
        f"SELECT {r} AS row, "
        f"{hash_bucket_sql('k', buckets=width, salt=f'cms{r}')} AS cell "
        f"FROM src"
        for r in range(depth)
    )
    return f"""src AS ({table_sql}),
        cms AS (
            SELECT row, cell, COUNT(*) AS cnt
            FROM ({arms}) GROUP BY row, cell
        )"""


def cms_estimates_sql(
    keys_sql: str,
    key: str,
    width: int,
    depth: int = 4,
) -> str:
    """DuckDB estimates CTE over ``cms`` (from cms_sql) and a keys
    subquery: yields ``est(k, est)``."""
    from .sample import hash_bucket_sql

    arms = " UNION ALL ".join(
        f"SELECT k, {r} AS row, "
        f"{hash_bucket_sql('k', buckets=width, salt=f'cms{r}')} AS cell "
        f"FROM keys"
        for r in range(depth)
    )
    return f"""keys AS ({keys_sql}),
        est AS (
            SELECT k, MIN(COALESCE(c.cnt, 0)) AS est
            FROM ({arms}) p LEFT JOIN cms c USING (row, cell)
            GROUP BY k
        )"""


# --- mergeable HyperLogLog (persistent distinct-count sketch) ----------------

HLL_SCALE = 53  # sum(2^-reg) carried as exact 2^(HLL_SCALE-reg) BIGINTs


def _hll_alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_registers(
    df: DataFrame,
    key: str,
    m: int = 256,
    salt: str = "hll",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Distributed HyperLogLog registers over ``df[key]`` ->
    (bucket, register): the MERGEABLE, PERSISTENT distinct-count
    sketch Spark's ``approx_count_distinct`` cannot give you (its HLL
    lives inside one aggregation -- you cannot store it, union it
    with next week's, or ship it between jobs). These registers are a
    plain m-row DataFrame: persist them, union+max them across
    batches (:func:`hll_merge` -- HLL's merge IS max-per-bucket), and
    estimate whenever needed.

    Engine-exact by construction (the CMS stance): bucket and the
    rank source come from md5 windows (operators/sample.py
    hash_bucket -- portable), rho is derived from the BINARY STRING
    LENGTH of the 52-bit window (pure integer/string ops, no
    floating log), so the oracle rebuilds the registers cell-for-cell
    and the driver hash pins the sketch itself, not just its
    estimate. NULL keys are excluded (same contract as the CMS).

    Build cost: one narrow projection + an m-bucket max aggregate --
    map-side combine, constant-width shuffle keys, O(m) output rows
    regardless of corpus size.

    ``group_cols`` builds ONE SKETCH PER GROUP (e.g. per day: the
    incrementally-maintainable "distinct users per day" a COUNT
    DISTINCT rollup store cannot give you, because distinct is not
    re-aggregable but registers are): output gains the group columns
    and merge becomes max per (group..., bucket).
    """
    from .sample import hash_bucket

    groups = [F.col(c) for c in (group_cols or [])]
    keyed = F.concat(F.col(key).cast("string"), F.lit(salt + "r"))
    w = F.conv(F.substring(F.md5(keyed), 1, 13), 16, 10).cast("long")
    rho = F.when(
        w > 0, F.lit(HLL_SCALE) - F.length(F.conv(w, 10, 2))
    ).otherwise(F.lit(HLL_SCALE)).cast("int")
    return (
        df.filter(F.col(key).isNotNull())
        .select(
            *groups,
            hash_bucket(F.col(key), buckets=m, salt=salt + "b")
            .alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy(*(group_cols or []), "bucket")
        .agg(F.max("rho").alias("register"))
    )


def hll_merge(
    *register_sets: DataFrame,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Union registers from independently-built sketches (same m and
    salt) into one: max per bucket. Associative and idempotent, so
    batches merge in any order and replays are harmless.

    ``group_cols`` must match the builder's: grouped register sets
    (from ``hll_registers(group_cols=...)``) merge per
    (group..., bucket) -- omitting it would silently FUSE the groups
    into one sketch (max over all days' registers estimates the
    union, not per-day distincts)."""
    out = register_sets[0]
    for r in register_sets[1:]:
        out = out.unionByName(r)
    return out.groupBy(*(group_cols or []), "bucket").agg(
        F.max("register").alias("register")
    )


def hll_estimate(registers: DataFrame, m: int = 256) -> DataFrame:
    """One-row estimate from a register set: (nz_buckets,
    zero_buckets, sum_pow, est_distinct).

    Integer-first compare surface: ``sum_pow`` = exact BIGINT
    sum of 2^(HLL_SCALE - register) over all m buckets (empty
    buckets contribute 2^HLL_SCALE), and ``est_distinct`` =
    FLOOR of the estimator -- the raw HLL formula is one literal/
    integer division (bit-exact), and the small-range linear-counting
    branch (raw <= 2.5m with empty buckets) looks ``ln(m/V)`` up in a
    PYTHON-PRECOMPUTED literal table indexed by the integer V, so no
    engine libm ever runs and FLOOR of the identical double is
    identical. Relative error ~1.04/sqrt(m)."""
    a_num = _hll_alpha(m) * m * m * float(1 << HLL_SCALE)
    ln_table = F.array(*[
        F.lit(math.log(m / v)) for v in range(1, m + 1)
    ])
    agg = registers.agg(
        F.count(F.lit(1)).alias("nz_buckets"),
        F.coalesce(
            # shiftleft's python wrapper only takes a literal shift;
            # the SQL function shifts by a column expression fine
            F.sum(F.expr(
                f"shiftleft(CAST(1 AS BIGINT), {HLL_SCALE} - register)"
            )),
            F.lit(0).cast("long"),
        ).alias("nz_pow"),
    )
    zeros = F.lit(m) - F.col("nz_buckets")
    sum_pow = (
        F.col("nz_pow")
        + zeros.cast("long") * F.lit(1 << HLL_SCALE).cast("long")
    )
    raw = F.lit(a_num) / sum_pow.cast("double")
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.element_at(ln_table, zeros.cast("int")),
    ).otherwise(raw)
    return agg.select(
        F.col("nz_buckets").cast("long").alias("nz_buckets"),
        zeros.cast("long").alias("zero_buckets"),
        sum_pow.alias("sum_pow"),
        F.floor(est).cast("long").alias("est_distinct"),
    )


def hll_estimate_grouped(
    registers: DataFrame, group_cols: list[str], m: int = 256
) -> DataFrame:
    """Per-group estimates from grouped registers: (group...,
    nz_buckets, zero_buckets, sum_pow, est_distinct) -- same
    integer-first surface and literal ln table as hll_estimate."""
    a_num = _hll_alpha(m) * m * m * float(1 << HLL_SCALE)
    ln_table = F.array(*[
        F.lit(math.log(m / v)) for v in range(1, m + 1)
    ])
    agg = registers.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("nz_buckets"),
        F.sum(F.expr(
            f"shiftleft(CAST(1 AS BIGINT), {HLL_SCALE} - register)"
        )).alias("nz_pow"),
    )
    zeros = F.lit(m) - F.col("nz_buckets")
    sum_pow = (
        F.col("nz_pow")
        + zeros.cast("long") * F.lit(1 << HLL_SCALE).cast("long")
    )
    raw = F.lit(a_num) / sum_pow.cast("double")
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(float(m)) * F.element_at(ln_table, zeros.cast("int")),
    ).otherwise(raw)
    return agg.select(
        *group_cols,
        F.col("nz_buckets").cast("long").alias("nz_buckets"),
        zeros.cast("long").alias("zero_buckets"),
        sum_pow.alias("sum_pow"),
        F.floor(est).cast("long").alias("est_distinct"),
    )


def hll_registers_sql(
    table_sql: str, key: str, m: int = 256, salt: str = "hll"
) -> str:
    """DuckDB CTE rebuilding the registers cell-for-cell: yields
    ``hll_regs(bucket, register)`` over a subquery exposing ``{key}``.
    """
    from .sample import hash_bucket_sql

    keyed = f"CAST({key} AS VARCHAR) || '{salt}r'"
    w = f"CAST(CAST(('0x' || substr(md5({keyed}), 1, 13)) AS UBIGINT) AS BIGINT)"
    return f"""hll_src AS ({table_sql}),
        hll_regs AS (
            SELECT {hash_bucket_sql(key, buckets=m, salt=salt + 'b')}
                       AS bucket,
                   MAX(CASE WHEN {w} > 0
                        THEN {HLL_SCALE} - length(bin({w}))
                        ELSE {HLL_SCALE} END) AS register
            FROM hll_src
            WHERE {key} IS NOT NULL
            GROUP BY 1
        )"""


def hll_estimate_sql(m: int = 256) -> str:
    """DuckDB estimate select over ``hll_regs`` (from
    hll_registers_sql): same integer sum, same literal ln table."""
    a_num = _hll_alpha(m) * m * m * float(1 << HLL_SCALE)
    ln_lits = ", ".join(repr(math.log(m / v)) for v in range(1, m + 1))
    return f"""
        SELECT CAST(nz_buckets AS BIGINT) AS nz_buckets,
               CAST({m} - nz_buckets AS BIGINT) AS zero_buckets,
               CAST(sum_pow AS BIGINT) AS sum_pow,
               CAST(FLOOR(
                   CASE WHEN ({a_num!r} / CAST(sum_pow AS DOUBLE))
                             <= {2.5 * m!r}
                             AND {m} - nz_buckets > 0
                        THEN {float(m)!r} *
                             ([{ln_lits}])[{m} - nz_buckets]
                        ELSE {a_num!r} / CAST(sum_pow AS DOUBLE)
                   END) AS BIGINT) AS est_distinct
        FROM (
            SELECT COUNT(*) AS nz_buckets,
                   COALESCE(SUM((CAST(1 AS BIGINT)
                                 << ({HLL_SCALE} - register))), 0)
                   + (CAST({m} AS BIGINT) - COUNT(*))
                     * (CAST(1 AS BIGINT) << {HLL_SCALE}) AS sum_pow
            FROM hll_regs
        )
    """


def cms_join_size_estimate(
    cms_a: DataFrame, cms_b: DataFrame, depth: int = 4
) -> DataFrame:
    """Equi-join cardinality estimate from two count-min sketches over
    the join keys -- the optimizer-style estimate |A JOIN B on k| =
    inner product of the key-frequency vectors, approximated per
    sketch row as sum_cells cnt_a * cnt_b and taken as the MIN over
    rows (AMS/CMS inner-product estimator). Hash collisions only ADD
    mass, so the estimate is ONE-SIDED: est >= true join size for
    sketches built with the same (width, depth, salt) -- the same
    guarantee contract as the CMS point queries.

    This is how an engine sizes a join without touching the data:
    two sketch scans (O(depth x width) rows each, already built
    incrementally across batches) replace a full join. Products
    accumulate in DECIMAL(38,0): at 10^12-row tables a cell holds
    ~10^9 and a product ~10^18 -- one int64 term, but the cell SUM
    overflows int64 immediately.
    """
    a = cms_a.select(
        "row", "cell", F.col("cnt").alias("cnt_a")
    )
    b = cms_b.select(
        "row", "cell", F.col("cnt").alias("cnt_b")
    )
    per_row = (
        a.join(b, ["row", "cell"])
        .groupBy("row")
        .agg(
            F.sum(
                (F.col("cnt_a") * F.col("cnt_b")).cast("decimal(38,0)")
            ).alias("ip")
        )
    )
    return per_row.agg(
        F.min("ip").cast("long").alias("est_join_size")
    )


def cms_join_size_sql(depth: int = 4) -> str:
    """DuckDB twin over two CTEs ``cms_a``/``cms_b`` (each from
    cms_sql with its cms CTE renamed): yields the one-row estimate."""
    return """
        SELECT CAST(MIN(ip) AS BIGINT) AS est_join_size
        FROM (
            SELECT a.row, SUM(a.cnt * b.cnt) AS ip
            FROM cms_a a JOIN cms_b b USING (row, cell)
            GROUP BY a.row
        )
    """
