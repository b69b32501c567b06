"""Unit tests for the round-8 training-run data-plane operators.

Oracle parity (tests/test_oracle_parity.py) already pins every
registered query against DuckDB on driver data; the tests here pin
the SEMANTICS on handmade rows -- tie-breaks, cap boundaries, mask
offsets, fail-loud guards -- where driver data might not exercise the
edge.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


class TestPreferencePairs:
    def test_chosen_rejected_and_tiebreaks(self, spark):
        from etl_on_weather_dataset_spark.operators.preference import (
            preference_pairs,
        )

        df = spark.createDataFrame(
            [
                # group g1: clear margin
                ("g1", 1, 1.0), ("g1", 2, 5.0), ("g1", 3, 3.0),
                # group g2: all-equal scores -> chosen=min id,
                # rejected=max id, margin 0
                ("g2", 10, 2.0), ("g2", 11, 2.0), ("g2", 12, 2.0),
                # group g3: single candidate -> no pair
                ("g3", 20, 9.0),
                # group g4: tie at the top -> chosen is min id of the
                # tied best
                ("g4", 31, 7.0), ("g4", 30, 7.0), ("g4", 32, 1.0),
            ],
            "g string, id long, score double",
        )
        got = {
            r.g: (r.chosen_id, r.rejected_id, r.margin_scaled,
                  r.n_candidates)
            for r in preference_pairs(
                df, ["g"], "id", "score", scale=1000
            ).collect()
        }
        assert got == {
            "g1": (2, 1, 4000, 3),
            "g2": (10, 12, 0, 3),
            "g4": (30, 32, 6000, 3),
        }

    def test_min_margin_drops_weak_pairs(self, spark):
        from etl_on_weather_dataset_spark.operators.preference import (
            preference_pairs,
        )

        df = spark.createDataFrame(
            [("a", 1, 1.0), ("a", 2, 1.4), ("b", 3, 1.0), ("b", 4, 3.0)],
            "g string, id long, score double",
        )
        got = [
            r.g
            for r in preference_pairs(
                df, ["g"], "id", "score", scale=1000,
                min_margin_scaled=500,
            ).collect()
        ]
        assert got == ["b"]  # a's margin is 400 < 500


class TestEpochShuffleManifest:
    def test_epochs_decorrelated_and_complete(self, spark):
        from etl_on_weather_dataset_spark.operators.sample import (
            epoch_shuffle_manifest,
        )

        df = spark.range(500).select(F.col("id").alias("doc_id"))
        m = epoch_shuffle_manifest(
            df, "doc_id", epochs=2, n_buckets=8
        ).collect()
        by_epoch = {}
        for r in m:
            by_epoch.setdefault(r.epoch, []).append(r)
        assert set(by_epoch) == {0, 1}
        for rows in by_epoch.values():
            assert sum(r.n_rows for r in rows) == 500
        # different epochs shuffle differently: the per-bucket
        # fingerprints must not all coincide
        f0 = {(r.bucket, r.order_md5) for r in by_epoch[0]}
        f1 = {(r.bucket, r.order_md5) for r in by_epoch[1]}
        assert f0 != f1

    def test_deterministic_across_partitionings(self, spark):
        from etl_on_weather_dataset_spark.operators.sample import (
            epoch_shuffle_manifest,
        )

        df = spark.range(300).select(F.col("id").alias("doc_id"))
        a = sorted(
            map(tuple, epoch_shuffle_manifest(
                df, "doc_id", epochs=1, n_buckets=4
            ).collect())
        )
        b = sorted(
            map(tuple, epoch_shuffle_manifest(
                df.repartition(13), "doc_id", epochs=1, n_buckets=4
            ).collect())
        )
        assert a == b


class TestMixtureEpochPlan:
    def test_upsample_cap_and_downsample(self, spark):
        from etl_on_weather_dataset_spark.operators.sample import (
            mixture_epoch_plan,
        )

        strata = spark.createDataFrame(
            [
                # wants 50k of 100k budget, has 200k -> downsample
                ("big", 200_000, 500_000),
                # wants 30k, has 10k -> 3 epochs (< 4e6 cap)
                ("small", 10_000, 300_000),
                # wants 20k, has 1k -> capped at 4 epochs, shortfall
                ("tiny", 1_000, 200_000),
            ],
            "stratum string, n_tokens long, target_ppm long",
        )
        got = {
            r.stratum: (r.epochs_ppm, r.planned_tokens,
                        r.shortfall_tokens, r.capped)
            for r in mixture_epoch_plan(
                strata, token_budget=100_000
            ).collect()
        }
        assert got["big"] == (250_000, 50_000, 0, 0)
        assert got["small"] == (3_000_000, 30_000, 0, 0)
        assert got["tiny"] == (4_000_000, 4_000, 16_000, 1)

    def test_zero_tokens_with_target_fails_loudly(self, spark):
        import duckdb

        from etl_on_weather_dataset_spark.operators.sample import (
            mixture_epoch_plan,
            mixture_epoch_plan_sql,
        )

        strata = spark.createDataFrame(
            [("empty", 0, 100_000)],
            "stratum string, n_tokens long, target_ppm long",
        )
        with pytest.raises(Exception, match="has no tokens"):
            mixture_epoch_plan(strata, token_budget=1000).collect()
        sql = mixture_epoch_plan_sql(
            "SELECT 'empty' AS stratum, 0 AS n_tokens,"
            " 100000 AS target_ppm",
            token_budget=1000,
        )
        with pytest.raises(Exception, match="has no tokens"):
            duckdb.sql(sql).fetchall()

    def test_null_target_ppm_fails_loudly(self, spark):
        """Round-8 advice: a NULL target_ppm made wanted NULL, and
        least() skips NULLs in BOTH engines, so epochs_ppm silently
        became the repetition cap with capped=1 -- parity held, so
        the oracle could never catch it. Both twins now refuse."""
        import duckdb

        from etl_on_weather_dataset_spark.operators.sample import (
            mixture_epoch_plan,
            mixture_epoch_plan_sql,
        )

        strata = spark.createDataFrame(
            [("web", 1000, None)],
            "stratum string, n_tokens long, target_ppm long",
        )
        with pytest.raises(Exception, match="NULL target_ppm"):
            mixture_epoch_plan(strata, token_budget=1000).collect()
        sql = mixture_epoch_plan_sql(
            "SELECT 'web' AS stratum, 1000 AS n_tokens,"
            " CAST(NULL AS BIGINT) AS target_ppm",
            token_budget=1000,
        )
        with pytest.raises(Exception, match="NULL target_ppm"):
            duckdb.sql(sql).fetchall()


class TestPackedAttentionSpans:
    def test_boundaries_and_cut_chunks(self, spark):
        from etl_on_weather_dataset_spark.operators.corpus import (
            pack_sequences,
            packed_attention_spans,
        )

        # one shard's worth of chunks: 60+60 tokens at capacity 100
        # -> chunk 2 is cut across the bin boundary
        chunks = spark.createDataFrame(
            [(1, 0, 60), (1, 1, 60), (2, 0, 30)],
            "doc_id long, chunk_id long, n_tokens int",
        )
        packed = pack_sequences(chunks, capacity=100, n_shards=1)
        got = {
            (r.shard, r.bin_id): (
                r.n_chunks, r.n_docs, r.fill_tokens, r.n_cut_chunks
            )
            for r in packed_attention_spans(
                packed, capacity=100
            ).collect()
        }
        # cum_before: 0, 60, 120 -> bins 0, 0, 1
        assert got[(0, 0)] == (2, 1, 120, 1)  # second chunk cut
        assert got[(0, 1)] == (1, 1, 30, 0)

    def test_boundary_md5_is_order_sensitive(self, spark):
        from etl_on_weather_dataset_spark.operators.corpus import (
            pack_sequences,
            packed_attention_spans,
        )

        chunks = spark.createDataFrame(
            [(1, 0, 10), (1, 1, 20), (2, 0, 30)],
            "doc_id long, chunk_id long, n_tokens int",
        )
        packed = pack_sequences(chunks, capacity=1000, n_shards=1)
        a = packed_attention_spans(packed, 1000).collect()
        b = packed_attention_spans(
            pack_sequences(
                chunks.repartition(7), capacity=1000, n_shards=1
            ),
            1000,
        ).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))


class TestChatTemplate:
    def test_roundtrip_and_mask_span(self, spark):
        from etl_on_weather_dataset_spark.operators.text import (
            parse_chat,
            render_chat,
        )

        df = spark.createDataFrame(
            [("what is spark", "a distributed engine")],
            "prompt string, response string",
        )
        row = (
            df.select(
                "prompt", "response",
                render_chat("prompt", "response").alias("r"),
            )
            .select("prompt", "response", "r",
                    parse_chat("r").alias("p"))
            .collect()[0]
        )
        assert row.p.prompt == row.prompt
        assert row.p.response == row.response
        # the mask span extracts exactly the response
        assert (
            row.r[row.p.mask_start - 1:
                  row.p.mask_start - 1 + row.p.mask_len]
            == row.response
        )

    def test_unparseable_counts_as_roundtrip_failure(self, spark):
        from etl_on_weather_dataset_spark.operators.text import (
            parse_chat,
        )

        df = spark.createDataFrame(
            [("no template here",)], "r string"
        )
        row = df.select(parse_chat("r").alias("p")).collect()[0]
        assert row.p.prompt == "" and row.p.response == ""


class TestSampleNegatives:
    def test_k_negatives_per_pair_and_no_positive(self, spark):
        from etl_on_weather_dataset_spark.operators.retrieval import (
            sample_negatives,
        )

        pool = spark.range(200).select(F.col("id").alias("doc_id"))
        # q1 carries TWO positives: each pair must get its own k
        # negatives (review fix: rank partitions by (query, positive))
        qs = spark.createDataFrame(
            [(1, 10), (1, 11), (2, 20)],
            "query_id long, positive_id long",
        )
        rows = sample_negatives(qs, pool, k=3, n_buckets=8).collect()
        by_pair = {}
        for r in rows:
            by_pair.setdefault((r.query_id, r.positive_id), []).append(r)
        assert set(by_pair) == {(1, 10), (1, 11), (2, 20)}
        for (q, p), rs in by_pair.items():
            assert len(rs) == 3
            assert sorted(r.neg_rank for r in rs) == [1, 2, 3]
            assert all(r.neg_id != p for r in rs)

    def test_deterministic_across_partitionings(self, spark):
        from etl_on_weather_dataset_spark.operators.retrieval import (
            sample_negatives,
        )

        pool = spark.range(500).select(F.col("id").alias("doc_id"))
        qs = spark.createDataFrame(
            [(i, i) for i in range(0, 100, 7)],
            "query_id long, positive_id long",
        )
        a = sorted(map(tuple, sample_negatives(qs, pool, k=4).collect()))
        b = sorted(map(tuple, sample_negatives(
            qs.repartition(9), pool.repartition(11), k=4
        ).collect()))
        assert a == b and len(a) > 0


class TestReviewRegressions:
    def test_mixture_plan_zero_tokens_zero_target_is_zero_epochs(
        self, spark
    ):
        """Review fix: 0 div 0 is NULL and least() skips nulls -- an
        empty no-target stratum must report 0 epochs, not the cap."""
        import duckdb

        from etl_on_weather_dataset_spark.operators.sample import (
            mixture_epoch_plan,
            mixture_epoch_plan_sql,
        )

        strata = spark.createDataFrame(
            [("empty", 0, 0), ("live", 1000, 1_000_000)],
            "stratum string, n_tokens long, target_ppm long",
        )
        got = {
            r.stratum: (r.epochs_ppm, r.capped)
            for r in mixture_epoch_plan(
                strata, token_budget=1000
            ).collect()
        }
        assert got["empty"] == (0, 0)
        sql = mixture_epoch_plan_sql(
            "SELECT * FROM (VALUES ('empty', 0, 0),"
            " ('live', 1000, 1000000))"
            " AS t(stratum, n_tokens, target_ppm)",
            token_budget=1000,
        )
        o = {r[0]: (r[4], r[7]) for r in duckdb.sql(sql).fetchall()}
        assert o["empty"] == (0, 0)
        assert o["live"] == got["live"]

    def test_chat_roundtrip_with_multiline_content(self, spark):
        """Review fix: '.' must match newlines (DOTALL) -- multi-line
        prompts/responses are the norm in SFT data."""
        from etl_on_weather_dataset_spark.operators.text import (
            parse_chat,
            render_chat,
        )

        df = spark.createDataFrame(
            [("line one\nline two", "ans A\nans B\nans C")],
            "prompt string, response string",
        )
        row = (
            df.select("prompt", "response",
                      render_chat("prompt", "response").alias("r"))
            .select("prompt", "response", "r",
                    parse_chat("r").alias("p"))
            .collect()[0]
        )
        assert row.p.prompt == row.prompt
        assert row.p.response == row.response
        assert (
            row.r[row.p.mask_start - 1:
                  row.p.mask_start - 1 + row.p.mask_len]
            == row.response
        )
