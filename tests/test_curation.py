"""End-to-end curation pipeline invariants (parity with the composed
DuckDB oracle is covered by test_oracle_parity via the registry)."""

from __future__ import annotations

from etl_on_weather_dataset_spark.plans.curation import curate
from etl_on_weather_dataset_spark.schemas import load_table

SF = "/root/testdata/sf0.001"


def test_stage_counts_monotone_and_consistent(spark):
    res = curate(load_table(spark, SF, "documents"))
    stats = {r["stage"]: r["n_rows"] for r in res.stats.collect()}
    assert (
        stats["input"]
        >= stats["quality_passed"]
        >= stats["exact_unique"]
        >= stats["near_dup_unique"]
    )
    assert 0 < stats["near_dup_unique"]
    assert stats["test_split"] <= stats["near_dup_unique"]
    assert stats["chunks"] >= stats["near_dup_unique"]  # >=1 chunk/doc

    # clean output matches the audit trail and carries the split label
    clean = res.clean.cache()
    try:
        assert clean.count() == stats["near_dup_unique"]
        assert clean.filter("split = 'test'").count() == stats["test_split"]
    finally:
        clean.unpersist()


def test_chunks_come_only_from_survivors(spark):
    res = curate(load_table(spark, SF, "documents"))
    survivors = {r["doc_id"] for r in res.clean.select("doc_id").collect()}
    chunk_docs = {
        r["doc_id"] for r in res.chunks.select("doc_id").distinct().collect()
    }
    assert chunk_docs == survivors


def test_redaction_applied_before_dedup(spark):
    """Docs differing only in PII must collapse in exact dedup: feed a
    tiny corpus where two docs share text except for emails."""
    docs = spark.createDataFrame(
        [
            (1, "the a quick fox " * 15 + "mail me at a@x.com"),
            (2, "the a quick fox " * 15 + "mail me at b@y.org"),
            (3, "the a totally different document body " * 12),
        ],
        "doc_id long, text string",
    )
    res = curate(docs)
    stats = {r["stage"]: r["n_rows"] for r in res.stats.collect()}
    assert stats["input"] == 3
    # 1 and 2 redact to identical text -> exact dedup keeps doc 1
    assert stats["exact_unique"] == 2
    survivors = {r["doc_id"] for r in res.clean.collect()}
    assert 1 in survivors and 2 not in survivors


class TestEmbeddingPipeline:
    def test_stage_drops(self, spark):
        from etl_on_weather_dataset_spark.operators.caching import (
            release_all,
        )
        from etl_on_weather_dataset_spark.plans.embedding_pipeline import (
            EMB_DIM,
            embed_curate,
        )

        good = [float((i * 7 + j) % 13) - 6.0 for j in range(EMB_DIM)
                for i in (1,)]
        vecs = [
            (0, [float((j % 7) - 3) for j in range(EMB_DIM)]),   # ok
            (1, [float((j % 7) - 3) for j in range(EMB_DIM)]),   # dup of 0
            (2, [float((j % 5) - 2) for j in range(EMB_DIM)]),   # ok
            (3, None),                                           # invalid
            (4, [1.0, 2.0]),                                     # wrong dim
            (5, [0.0] * EMB_DIM),                                # zero norm
        ]
        df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
        try:
            res = embed_curate(df)
            stats = dict(map(tuple, res.stats.collect()))
            assert stats["input"] == 6
            assert stats["valid"] == 3
            # identical vectors are semantic dups (cos=1 >= 0.9):
            # exactly one of {0,1} survives
            assert stats["sem_unique"] == 2
            surv = sorted(r["vec_id"] for r in res.clean.collect())
            assert 2 in surv and len(surv) == 2
            # every survivor gets a cluster
            assert res.assignments.count() == 2
        finally:
            release_all()
