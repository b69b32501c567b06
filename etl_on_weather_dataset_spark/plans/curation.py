"""The LLM-training-data curation pipeline: the engine's second
flagship composition (the weather ETL re-imagined for the documents
domain).

    raw docs
      -> quality gates        (Gopher-style flags; drop failures)
      -> PII redaction        (typed placeholder scrub)
      -> exact dedup          (md5 fingerprint, keep min doc_id)
      -> near-dup dedup       (n-gram Jaccard pairs -> connected
                               components -> keep each group's min id)
      -> train/test split     (deterministic hash split)
      -> chunking             (size/stride token windows)

Everything up to near-dup is ONE lazy plan of codegen expressions; the
near-dup stage adds the inverted-index self-join and the O(diameter)
component rounds. Stage-by-stage row counts are the pipeline's audit
trail -- `curation_stats` returns them as a tiny table, and the
registry query hash-checks that table against a single composed DuckDB
oracle built from the same per-operator SQL builders.

Scale: the only operator that touches pairs of documents is the
near-dup stage, and it is the blocked/inverted-index form; every other
stage is embarrassingly parallel per document.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import text as T
from ..operators.dedup import (
    dedup_components,
    dedup_components_ctes,
    ngram_jaccard_pairs,
    ngram_jaccard_pairs_sql,
)
from ..operators.sample import HASH_BUCKETS, hash_bucket_sql, train_test_split

QUALITY_STAGE = "quality_pass"
JACCARD_N, JACCARD_T = 3, 0.2
CHUNK_SIZE, CHUNK_STRIDE = 50, 40
TEST_FRACTION = 0.1


@dataclass
class CurationResult:
    clean: DataFrame      # surviving docs: doc_id, text (redacted), split
    chunks: DataFrame     # doc_id, chunk_id, chunk
    stats: DataFrame      # (stage, n_rows) audit trail


def curate(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> CurationResult:
    base = docs.select(F.col(id_col).alias("doc_id"),
                       F.col(text_col).alias("text"))

    passed = base.filter(
        T.quality_flags("text")[QUALITY_STAGE] == 1
    )
    redacted = passed.select(
        "doc_id", T.redact_pii("text").alias("text")
    )
    # exact dedup: keep the smallest doc_id per content fingerprint
    fp = redacted.withColumn("fp", T.fingerprint("text"))
    keep_exact = fp.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    # persisted (caching ledger): this macro-stage boundary is scanned
    # by the near-dup pair builder, the survivor anti-join, AND the
    # audit-trail aggregates -- without it the quality->redact->md5
    # chain re-executes once per consumer (measured ~2x on the bench
    # entry). The 100 TB shape is the same: materialize between
    # macro-stages, don't re-run the corpus scrub per downstream read.
    from ..operators.caching import persisted

    exact = persisted(
        fp.join(keep_exact, ["fp", "doc_id"], "left_semi").drop("fp")
    )

    # near-dup dedup: components over jaccard pairs; drop every doc
    # whose component label is not itself (min-id keep policy)
    pairs = ngram_jaccard_pairs(
        exact, "text", "doc_id", n=JACCARD_N, threshold=JACCARD_T
    )
    comps = dedup_components(pairs)
    losers = comps.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias("doc_id")
    )
    unique = exact.join(losers, "doc_id", "left_anti")

    # persisted for the same reason: consumed by chunking, the split
    # stat, and the returned `clean` frame
    split = persisted(
        train_test_split(unique, key="doc_id",
                         test_fraction=TEST_FRACTION)
    )
    chunks = split.select(
        "doc_id",
        F.explode(
            T.token_chunks("text", CHUNK_SIZE, CHUNK_STRIDE)
        ).alias("c"),
    ).select("doc_id", F.col("c.chunk_id").alias("chunk_id"),
             F.col("c.chunk").alias("chunk"))

    # Audit trail, FUSED: the six stage counts collapse into three
    # single-row aggregates (one per scan-able boundary) cross-joined
    # and unpivoted -- ONE action end-to-end instead of six count jobs
    # (the jobs, not the data, dominated the bench entry; measured on
    # this pipeline's sf0.001 run taking ~11 s of pure scheduling).
    #   - input + quality_passed share one scan of the raw docs (the
    #     flag is summed in the same pass that counts rows);
    #   - exact_unique is a count over the persisted exact boundary;
    #   - near_dup_unique + test_split + chunks share one scan of the
    #     persisted split boundary: the chunk count is
    #     sum(size(token_chunks(...))) -- the cardinality of the
    #     explode WITHOUT materializing any chunk string.
    base_stats = base.agg(
        F.count(F.lit(1)).alias("_input"),
        F.coalesce(
            F.sum(T.quality_flags("text")[QUALITY_STAGE].cast("long")),
            F.lit(0).cast("long"),
        ).alias("_quality"),
    )
    exact_stats = exact.agg(F.count(F.lit(1)).alias("_exact"))
    split_stats = split.agg(
        F.count(F.lit(1)).alias("_unique"),
        F.coalesce(
            F.sum((F.col("split") == "test").cast("long")),
            F.lit(0).cast("long"),
        ).alias("_test"),
        F.coalesce(
            F.sum(
                F.size(
                    T.token_chunks("text", CHUNK_SIZE, CHUNK_STRIDE)
                ).cast("long")
            ),
            F.lit(0).cast("long"),
        ).alias("_chunks"),
    )

    def row(stage: str, col: str) -> F.Column:
        return F.struct(
            F.lit(stage).alias("stage"), F.col(col).alias("n_rows")
        )

    stats = (
        base_stats.crossJoin(exact_stats)
        .crossJoin(split_stats)
        .select(
            F.explode(
                F.array(
                    row("input", "_input"),
                    row("quality_passed", "_quality"),
                    row("exact_unique", "_exact"),
                    row("near_dup_unique", "_unique"),
                    row("test_split", "_test"),
                    row("chunks", "_chunks"),
                )
            ).alias("s")
        )
        .select("s.stage", "s.n_rows")
    )
    return CurationResult(clean=split, chunks=chunks, stats=stats)


def curation_stats_sql(table: str = "documents") -> str:
    """One composed DuckDB oracle for the whole pipeline's audit
    trail, assembled from the same per-operator SQL builders the
    individual queries use."""
    q = T.quality_flags_sql("text")[QUALITY_STAGE]
    red = T.redact_pii_sql("text")
    fp = T.fingerprint_sql("text")
    pairs_sql = ngram_jaccard_pairs_sql(
        "exact_unique", "text", "doc_id", JACCARD_N, JACCARD_T
    )
    # dedup_components_ctes yields the pairs/edges/nodes/reach/
    # components chain; the upstream stages are plain CTEs in the same
    # WITH RECURSIVE clause.
    return f"""
        WITH RECURSIVE base AS (
            SELECT doc_id, text FROM {table}
        ), quality_passed AS (
            SELECT doc_id, text FROM base WHERE {q} = 1
        ), redacted AS (
            SELECT doc_id, {red} AS text FROM quality_passed
        ), fp AS (
            SELECT doc_id, text, {fp} AS f FROM redacted
        ), exact_unique AS (
            SELECT fp.doc_id, fp.text FROM fp
            JOIN (SELECT f, MIN(doc_id) AS keep_id FROM fp GROUP BY f) k
              ON fp.f = k.f AND fp.doc_id = k.keep_id
        ), {dedup_components_ctes(pairs_sql)}, near_dup_unique AS (
            SELECT e.doc_id, e.text FROM exact_unique e
            WHERE NOT EXISTS (
                SELECT 1 FROM components c
                WHERE c.id = e.doc_id AND c.id != c.component
            )
        ), chunks AS (
            SELECT doc_id,
                   unnest({T.token_chunks_sql('text', CHUNK_SIZE,
                                              CHUNK_STRIDE)}) AS c
            FROM near_dup_unique
        )
        SELECT 'input' AS stage, COUNT(*) AS n_rows FROM base
        UNION ALL
        SELECT 'quality_passed', COUNT(*) FROM quality_passed
        UNION ALL
        SELECT 'exact_unique', COUNT(*) FROM exact_unique
        UNION ALL
        SELECT 'near_dup_unique', COUNT(*) FROM near_dup_unique
        UNION ALL
        SELECT 'test_split', COUNT(*) FROM near_dup_unique
        WHERE {hash_bucket_sql('doc_id', salt='split')}
              < {int(TEST_FRACTION * HASH_BUCKETS)}
        UNION ALL
        SELECT 'chunks', COUNT(*) FROM chunks
    """
