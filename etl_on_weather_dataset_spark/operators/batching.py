"""Length-bucketed inference batching with a padding-waste audit.

Batch inference (embedding a corpus, scoring it with a reward model,
LLM-judging samples) pads every sequence in a batch to the batch max,
so batch composition directly prices the GPU bill: batching by
arrival order pads short docs against the longest one in every batch,
while grouping docs of similar length first makes padding vanish.
This module builds DETERMINISTIC length-bucketed batches and
measures exactly how many padded token-slots the bucketing saves over
naive arrival-order batching -- the number that justifies the sort.

Design for 100 TB:

- Batches form inside (shard, bucket) groups: ``shard`` is an
  md5 hash of the id (``sample.hash_bucket`` -- engine/retry/
  partitioning-invariant), ``bucket`` is ``n_tokens div
  bucket_width``. Each window partition therefore holds ~N/(shards x
  buckets) rows -- embarrassingly parallel, no global sort. The cost
  is at most one partial batch per (shard, bucket) instead of one
  per bucket; ``shards`` is pinned per dataset exactly like the
  sampling modulus, so assignments are reproducible anywhere.
- Ordering inside a group is (md5(id), id): deterministic, uniform,
  and portable -- two engines (or two retries) produce bit-identical
  batch assignments.
- Everything is integer arithmetic on token counts; the audit's
  ppm ratios are integer ``div``.

No reference counterpart; mandated by the BASELINE.json LLM-pipeline
extension surface (the serving-side sibling of
``corpus.pack_sequences``, which solves the TRAINING-side version by
concatenation instead of padding).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .sample import hash_bucket, hash_bucket_sql

PPM = 1_000_000


def length_bucketed_batches(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    batch_size: int = 8,
    bucket_width: int = 16,
    shards: int = 4,
) -> DataFrame:
    """Assign every doc to a deterministic inference batch.

    Output: one row per doc with ``(id, n_tokens, shard, bucket,
    batch_idx, batch_max, pad)`` where ``pad = batch_max - n_tokens``
    is the padded token-slots this doc costs in its batch.
    ``bucket_width = 0`` disables length bucketing (single bucket --
    the naive arrival-order arm the audit compares against).
    """
    from .text import token_count

    bucket = (
        F.lit(0) if bucket_width == 0
        else F.expr(f"n_tokens div {bucket_width}")
    )
    base = df.select(
        F.col(id_col).alias("id"),
        token_count(text_col).cast("long").alias("n_tokens"),
    ).select(
        "id", "n_tokens",
        hash_bucket("id", shards).alias("shard"),
        bucket.cast("long").alias("bucket"),
    )
    w = Window.partitionBy("shard", "bucket").orderBy(
        F.md5(F.col("id").cast("string")), F.col("id")
    )
    assigned = base.withColumn("rn", F.row_number().over(w)).select(
        "id", "n_tokens", "shard", "bucket",
        F.expr(f"(rn - 1) div {batch_size}").cast("long")
        .alias("batch_idx"),
    )
    wb = Window.partitionBy("shard", "bucket", "batch_idx")
    return assigned.select(
        "id", "n_tokens", "shard", "bucket", "batch_idx",
        F.max("n_tokens").over(wb).cast("long").alias("batch_max"),
    ).withColumn(
        "pad", (F.col("batch_max") - F.col("n_tokens")).cast("long")
    )


def batching_waste_audit(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    batch_size: int = 8,
    bucket_width: int = 16,
    shards: int = 4,
) -> DataFrame:
    """One-row audit: bucketed vs naive batching, exact padded-slot
    counts and the ppm saving that justifies the length sort.

    ``waste_*_ppm`` is padded slots over total slots (real + padded)
    of that arm; ``pad_saving_ppm`` is the relative reduction of
    padded slots from naive to bucketed.
    """
    def arm(width: int, prefix: str) -> DataFrame:
        b = length_bucketed_batches(
            df, id_col=id_col, text_col=text_col,
            batch_size=batch_size, bucket_width=width, shards=shards,
        )
        return b.agg(
            F.count(F.lit(1)).cast("long").alias(f"{prefix}_rows"),
            F.countDistinct("shard", "bucket", "batch_idx")
            .cast("long").alias(f"n_batches_{prefix}"),
            F.sum("n_tokens").cast("long").alias(f"{prefix}_real"),
            F.sum("pad").cast("long").alias(f"pad_{prefix}"),
        )
    bucketed = arm(bucket_width, "bucketed")
    naive = arm(0, "naive")
    joined = bucketed.crossJoin(F.broadcast(naive))
    return joined.select(
        F.col("bucketed_rows").alias("n_docs"),
        F.col("bucketed_real").alias("real_tokens"),
        "n_batches_bucketed", "pad_bucketed",
        "n_batches_naive", "pad_naive",
        F.expr(f"pad_bucketed * {PPM} div "
               f"(bucketed_real + pad_bucketed)").cast("long")
        .alias("waste_bucketed_ppm"),
        F.expr(f"pad_naive * {PPM} div (naive_real + pad_naive)")
        .cast("long").alias("waste_naive_ppm"),
        F.expr(f"CASE WHEN pad_naive = 0 THEN 0 ELSE "
               f"(pad_naive - pad_bucketed) * {PPM} div pad_naive END")
        .cast("long").alias("pad_saving_ppm"),
    )


def _arm_sql(
    table: str, id_col: str, text_col: str,
    batch_size: int, bucket_width: int, shards: int,
) -> str:
    """Per-doc batch assignment as a DuckDB relation (twin of
    :func:`length_bucketed_batches`)."""
    bucket = "0" if bucket_width == 0 else f"n_tokens // {bucket_width}"
    return f"""
        SELECT id, n_tokens, shard, bucket, batch_idx,
               CAST(MAX(n_tokens) OVER (
                   PARTITION BY shard, bucket, batch_idx) AS BIGINT)
                   AS batch_max,
               CAST(MAX(n_tokens) OVER (
                   PARTITION BY shard, bucket, batch_idx)
                   - n_tokens AS BIGINT) AS pad
        FROM (
            SELECT id, n_tokens, shard, bucket,
                   CAST((ROW_NUMBER() OVER (
                       PARTITION BY shard, bucket
                       ORDER BY md5(CAST(id AS VARCHAR)), id) - 1)
                       // {batch_size} AS BIGINT) AS batch_idx
            FROM (
                SELECT {id_col} AS id,
                       CAST(len(regexp_split_to_array(
                           {text_col}, ' +')) AS BIGINT) AS n_tokens,
                       CAST({hash_bucket_sql(id_col, shards)} AS BIGINT)
                           AS shard,
                       CAST({bucket} AS BIGINT) AS bucket
                FROM {table}
            )
        )
    """


def batching_waste_audit_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    batch_size: int = 8,
    bucket_width: int = 16,
    shards: int = 4,
) -> str:
    """DuckDB twin of :func:`batching_waste_audit`."""
    def arm(width: int, prefix: str) -> str:
        inner = _arm_sql(table, id_col, text_col,
                         batch_size, width, shards)
        return f"""
            SELECT CAST(COUNT(*) AS BIGINT) AS {prefix}_rows,
                   CAST(COUNT(DISTINCT (shard, bucket, batch_idx))
                        AS BIGINT) AS n_batches_{prefix},
                   CAST(SUM(n_tokens) AS BIGINT) AS {prefix}_real,
                   CAST(SUM(pad) AS BIGINT) AS pad_{prefix}
            FROM ({inner})
        """
    return f"""
        WITH bucketed AS ({arm(bucket_width, 'bucketed')}),
             naive AS ({arm(0, 'naive')})
        SELECT bucketed_rows AS n_docs,
               bucketed_real AS real_tokens,
               n_batches_bucketed, pad_bucketed,
               n_batches_naive, pad_naive,
               pad_bucketed * {PPM}
                   // (bucketed_real + pad_bucketed)
                   AS waste_bucketed_ppm,
               pad_naive * {PPM} // (naive_real + pad_naive)
                   AS waste_naive_ppm,
               CASE WHEN pad_naive = 0 THEN 0 ELSE
                   (pad_naive - pad_bucketed) * {PPM} // pad_naive END
                   AS pad_saving_ppm
        FROM bucketed CROSS JOIN naive
    """
