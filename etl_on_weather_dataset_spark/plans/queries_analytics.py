"""Round-6 analytics tier: mergeable quantile sketches, skew
diagnostics, bucketized range joins, corpus size histograms, and
ordered integer folds (EWMA).

Five first-class operator families a 100 TB pipeline leans on daily:

- ``quantile_sketch_price``: the histogram sketch (operators/
  histogram.py) built on two DISJOINT halves and MERGED -- the query
  itself attests that merge(batches) == rebuild, because the oracle
  builds from the whole table and the driver hash must still match.
- ``skew_diagnostics_events``: per-key heavy-hitter shares -- the
  number you read BEFORE choosing a join/agg strategy at scale (a
  top key owning 30% of rows means salting, not praying).
- ``shipping_window_weekly``: interval-overlap counting as a
  BUCKETIZED range join: explode each row to the (bounded) weeks its
  interval spans and equi-join/aggregate on the bucket -- the scale
  path Spark's BNLJ-backed range joins can't walk.
- ``tokens_log2_histogram``: corpus length distribution in log2
  buckets via an identical CASE chain in both engines (no libm).
- ``ewma_user_value``: per-user exponential moving average as an
  ORDERED integer left fold -- the operator class where parallel
  aggregation is wrong by construction (EWMA is not associative), so
  the fold runs inside a per-key sorted array, bit-identically in
  both engines (Spark ``aggregate`` vs DuckDB ``list_reduce``).

All integer-first: micro-scaled BIGINTs everywhere; Spark ``div``
and DuckDB ``//`` both truncate toward zero (verified on negative
operands -- cluster.label_prototypes relies on it), so integer
division is engine-exact for ANY sign; no float crosses an engine
boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import text as T
from ..operators.histogram import (
    histogram_merge,
    histogram_quantiles,
    histogram_quantiles_sql,
    histogram_sketch,
    histogram_sketch_sql,
)
from ..schemas import load_table
from .registry import QuerySpec, register

# --- mergeable quantile sketch ------------------------------------------------

_HS_LO = 0
_HS_HI = 110_000_000_000  # l_extendedprice <= ~105k -> 110k in micros
_HS_BINS = 256
_HS_QS = [500_000, 900_000, 990_000]  # p50 / p90 / p99 in ppm


def _quantile_sketch_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    halves = [
        histogram_sketch(
            li.filter(F.col("l_orderkey") % 2 == i),
            "l_extendedprice", _HS_LO, _HS_HI, _HS_BINS,
            group_cols=["l_returnflag"],
        )
        for i in (0, 1)
    ]
    merged = histogram_merge(*halves, group_cols=["l_returnflag"])
    return histogram_quantiles(
        merged, _HS_QS, _HS_LO, _HS_HI, _HS_BINS,
        group_cols=["l_returnflag"],
    ).orderBy("l_returnflag", "q_ppm")


_QUANTILE_SKETCH_ORACLE = histogram_quantiles_sql(
    histogram_sketch_sql(
        "SELECT * FROM lineitem", "l_extendedprice",
        _HS_LO, _HS_HI, _HS_BINS, group_cols=["l_returnflag"],
    ),
    _HS_QS, _HS_LO, _HS_HI, _HS_BINS, group_cols=["l_returnflag"],
) + " ORDER BY l_returnflag, q_ppm"

register(QuerySpec(
    name="quantile_sketch_price",
    spark_fn=_quantile_sketch_price,
    oracle=_QUANTILE_SKETCH_ORACLE,
    covers=("mergeable-quantile-sketch", "sketch-merge-equals-rebuild"),
    bench=True,
))


# --- skew diagnostics ---------------------------------------------------------

def _skew_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return (
        per_user.groupBy("event_type")
        .agg(
            F.sum("cnt").alias("n_rows"),
            F.count(F.lit(1)).alias("n_keys"),
            F.max("cnt").alias("max_key_rows"),
        )
        .withColumn(
            "top_share_ppm",
            F.expr("max_key_rows * 1000000 div n_rows"),
        )
        .orderBy("event_type")
    )


register(QuerySpec(
    name="skew_diagnostics_events",
    spark_fn=_skew_diagnostics,
    oracle="""
        WITH per_key AS (
            SELECT event_type, user_id, COUNT(*) AS cnt
            FROM events GROUP BY event_type, user_id
        )
        SELECT event_type,
               CAST(SUM(cnt) AS BIGINT) AS n_rows,
               COUNT(*) AS n_keys,
               CAST(MAX(cnt) AS BIGINT) AS max_key_rows,
               CAST(MAX(cnt) AS BIGINT) * 1000000
                   // CAST(SUM(cnt) AS BIGINT) AS top_share_ppm
        FROM per_key
        GROUP BY event_type
        ORDER BY event_type
    """,
    covers=("skew-diagnostics", "heavy-hitter-share"),
))


# --- bucketized range join ----------------------------------------------------

def _shipping_window_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # interval = [shipdate, shipdate + quantity days] (span <= 50 d);
    # week bucket = days-since-epoch div 7 (non-negative: dates 1995+)
    spans = li.select(
        F.expr(
            "datediff(to_date(l_shipdate), DATE '1970-01-01') div 7"
        ).alias("ws"),
        F.expr(
            "datediff(date_add(to_date(l_shipdate),"
            " CAST(l_quantity AS INT)), DATE '1970-01-01') div 7"
        ).alias("we"),
    )
    return (
        spans.select(
            "ws", F.explode(F.sequence("ws", "we")).alias("week_idx")
        )
        .groupBy("week_idx")
        .agg(
            F.count(F.lit(1)).alias("n_open"),
            F.sum(
                F.when(F.col("week_idx") == F.col("ws"), 1).otherwise(0)
            ).alias("n_started"),
        )
        .orderBy("week_idx")
    )


register(QuerySpec(
    name="shipping_window_weekly",
    spark_fn=_shipping_window_weekly,
    oracle="""
        WITH spans AS (
            SELECT date_diff('day', DATE '1970-01-01',
                             CAST(l_shipdate AS DATE)) // 7 AS ws,
                   date_diff('day', DATE '1970-01-01',
                             CAST(l_shipdate AS DATE)
                             + CAST(l_quantity AS INTEGER)) // 7 AS we
            FROM lineitem
        ),
        exploded AS (
            SELECT ws, UNNEST(generate_series(ws, we)) AS week_idx
            FROM spans
        )
        SELECT week_idx,
               COUNT(*) AS n_open,
               CAST(SUM(CASE WHEN week_idx = ws THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_started
        FROM exploded
        GROUP BY week_idx
        ORDER BY week_idx
    """,
    covers=("range-join-bucketized", "interval-overlap"),
    bench=True,
))


# --- corpus token-length histogram --------------------------------------------

# identical CASE chain in both engines: integer log2 bucket with zero
# libm (an exact-power input can flip FLOOR(LOG2(n)) between libms)
_LOG2_CASE = (
    "CASE "
    + " ".join(
        f"WHEN n_tokens < {1 << (b + 1)} THEN {b}" for b in range(15)
    )
    + " ELSE 15 END"
)


def _tokens_log2_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            T.token_count("text").cast("long").alias("n_tokens")
        )
        .select("n_tokens", F.expr(_LOG2_CASE).alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .orderBy("bucket")
    )


register(QuerySpec(
    name="tokens_log2_histogram",
    spark_fn=_tokens_log2_histogram,
    oracle=f"""
        WITH toks AS (
            SELECT CAST(len(regexp_split_to_array(text, ' +'))
                        AS BIGINT) AS n_tokens
            FROM documents
        )
        SELECT {_LOG2_CASE} AS bucket,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
        FROM toks
        GROUP BY bucket
        ORDER BY bucket
    """,
    covers=("token-count", "corpus-length-histogram"),
))


# --- ordered integer fold: per-user EWMA --------------------------------------

def _ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # EWMA with alpha=1/2 as the integer recurrence
    # e_1 = v_1; e_n = (v_n + e_{n-1}) div 2, over (ts, event_id)
    # order. Not associative -> MUST be an ordered fold, not an agg:
    # Spark `aggregate` over the per-user sorted array == DuckDB
    # `list_reduce` over list(vm ORDER BY ts, event_id) (both
    # seed the fold with the first element). Values >= 0, so Spark
    # div (truncate) == DuckDB // (floor).
    per_user = ev.select(
        "user_id",
        F.struct(
            F.col("ts"), F.col("event_id"),
            F.expr("CAST(ROUND(value * 1000000) AS BIGINT)").alias("vm"),
        ).alias("s"),
    ).groupBy("user_id").agg(
        F.sort_array(F.collect_list("s")).alias("arr")
    )
    return per_user.select(
        "user_id",
        F.size("arr").cast("long").alias("n_events"),
        F.expr(
            "aggregate(slice(arr, 2, greatest(size(arr) - 1, 0)),"
            " element_at(arr, 1).vm,"
            " (acc, x) -> (x.vm + acc) div 2)"
        ).alias("ewma_micro"),
    ).orderBy("user_id")


_EWMA_ORACLE = """
        SELECT user_id,
               COUNT(*) AS n_events,
               list_reduce(
                   list(CAST(ROUND(value * 1000000) AS BIGINT)
                        ORDER BY ts, event_id),
                   (acc, x) -> (x + acc) // 2
               ) AS ewma_micro
        FROM events
        GROUP BY user_id
        ORDER BY user_id
    """

register(QuerySpec(
    name="ewma_user_value",
    spark_fn=_ewma_user_value,
    oracle=_EWMA_ORACLE,
    covers=("ordered-fold", "ewma"),
    # oracle-exact small-scale form; the bounded-memory 100 TB path
    # is the chunked fold (whale-key proof in SCALE.md)
    scale_path="ewma_user_value_chunked",
))


def _ewma_user_value_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The bounded-memory scale path for the same fold (round-6 verdict
    # item 3): _ewma_user_value materializes each key's full history
    # as ONE in-task array (collect_list), which a whale key OOMs at
    # 100 TB; ordered_fold_stream folds the externally-SORTED stream
    # via mapInPandas with an O(1) per-key carry across Arrow batches,
    # so per-task memory is one Arrow batch regardless of key size.
    # Same DuckDB list_reduce twin, bit-equal (values >= 0, so Python
    # // == Spark div == DuckDB //). Whale-key proof:
    # tests/test_operators.py::test_ordered_fold_stream_whale_key.
    from ..operators.fold import ordered_fold_stream

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id",
        F.expr("CAST(ROUND(value * 1000000) AS BIGINT)").alias("vm"),
    )
    return ordered_fold_stream(
        ev,
        key_cols=["user_id"],
        order_cols=["ts", "event_id"],
        value_col="vm",
        fold=lambda acc, v: (v + acc) // 2,
        out_col="ewma_micro",
        count_col="n_events",
    ).orderBy("user_id")


register(QuerySpec(
    name="ewma_user_value_chunked",
    spark_fn=_ewma_user_value_chunked,
    oracle=_EWMA_ORACLE,
    covers=("ordered-fold", "ewma", "bounded-memory"),
    extended=True,  # round-8 rotation (named in registry.py)
))


# --- join-strategy advisor ----------------------------------------------------

_JA_W, _JA_D = 4096, 4
_JA_BCAST, _JA_SKEW = 1000, 200_000  # force a non-broadcast verdict


def _join_advice_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.advisor import join_advice

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return join_advice(
        orders, li, "o_orderkey", "l_orderkey",
        width=_JA_W, depth=_JA_D,
        broadcast_rows=_JA_BCAST, skew_ppm=_JA_SKEW,
    )


def _join_advice_oracle() -> str:
    from ..operators.advisor import join_advice_sql

    return join_advice_sql(
        "SELECT * FROM orders", "SELECT * FROM lineitem",
        "o_orderkey", "l_orderkey",
        width=_JA_W, depth=_JA_D,
        broadcast_rows=_JA_BCAST, skew_ppm=_JA_SKEW,
    )


register(QuerySpec(
    name="join_advice_orders",
    spark_fn=_join_advice_orders,
    oracle=_join_advice_oracle,
    covers=("join-strategy-advisor", "sketch-based-cost-estimation"),
    extended=True,  # round-7 rotation (registry.py)
))


# --- token-weighted length quantiles -------------------------------------------

_WQ_LO, _WQ_HI, _WQ_BINS = 0, 1_000_000_000, 200  # n_chars <= ~600
_WQ_QS = [250_000, 500_000, 900_000]


def _weighted_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.histogram import histogram_quantiles, histogram_sketch

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("n_chars").cast("double").alias("chars"),
        T.token_count("text").cast("long").alias("w"),
    )
    sk = histogram_sketch(
        docs, "chars", _WQ_LO, _WQ_HI, _WQ_BINS, weight_col="w"
    )
    return histogram_quantiles(
        sk, _WQ_QS, _WQ_LO, _WQ_HI, _WQ_BINS
    ).orderBy("q_ppm")


def _weighted_length_oracle() -> str:
    from ..operators.histogram import (
        histogram_quantiles_sql,
        histogram_sketch_sql,
    )

    inner = histogram_sketch_sql(
        "SELECT CAST(n_chars AS DOUBLE) AS chars,"
        " CAST(len(regexp_split_to_array(text, ' +')) AS BIGINT) AS w"
        " FROM documents",
        "chars", _WQ_LO, _WQ_HI, _WQ_BINS, weight_col="w",
    )
    return histogram_quantiles_sql(
        inner, _WQ_QS, _WQ_LO, _WQ_HI, _WQ_BINS
    ) + " ORDER BY q_ppm"


register(QuerySpec(
    name="weighted_length_quantiles",
    spark_fn=_weighted_length_quantiles,
    oracle=_weighted_length_oracle,
    covers=("weighted-quantiles", "token-weighted-corpus-stats"),
    extended=True,  # round-7 rotation (registry.py)
))


# --- corpus health dashboard ----------------------------------------------------

_CH_HI, _CH_BINS = 256_000_000, 256  # token counts 0..256, 1-token cells
_CH_N, _CH_T = 3, 0.2  # the dedup_ngram_jaccard tier's settings
_CH_M = 64  # HLL registers for source cardinality


def _corpus_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one row a curation team reads daily, composed from the
    engine's own tiers -- exact counts, the histogram sketch, the
    mergeable HLL, and the blocked n-gram near-dup join -- each of
    which carries its own exact DuckDB twin, so the WHOLE dashboard
    is hash-attestable end to end."""
    from ..operators.bloom import hll_estimate, hll_registers
    from ..operators.caching import release_all
    from ..operators.dedup import ngram_jaccard_pairs
    from ..operators.histogram import (
        histogram_quantiles,
        histogram_sketch,
    )

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", "text", "lang", "source",
        T.token_count("text").cast("long").alias("n_tokens"),
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )
    lang_row = (
        base.groupBy("lang").agg(F.count(F.lit(1)).alias("c"))
        .agg(F.max("c").alias("top_lang_docs"),
             F.sum("c").alias("__n"))
        .select(
            "top_lang_docs",
            F.expr("top_lang_docs * 1000000 div __n")
            .alias("top_lang_share_ppm"),
        )
    )
    tokq = histogram_quantiles(
        histogram_sketch(base, "n_tokens", 0, _CH_HI, _CH_BINS),
        [500_000, 900_000], 0, _CH_HI, _CH_BINS,
    ).agg(
        F.max(F.when(F.col("q_ppm") == 500_000, F.col("est_micro")))
        .alias("p50_tokens_micro"),
        F.max(F.when(F.col("q_ppm") == 900_000, F.col("est_micro")))
        .alias("p90_tokens_micro"),
    )
    sources = base.agg(
        F.countDistinct("source").alias("n_sources_exact")
    )
    hll_row = hll_estimate(
        hll_registers(base, "source", m=_CH_M), m=_CH_M
    ).select(F.col("est_distinct").alias("est_sources_hll"))
    try:
        pairs = ngram_jaccard_pairs(
            docs, "text", "doc_id", n=_CH_N, threshold=_CH_T
        ).agg(F.count(F.lit(1)).alias("near_dup_pairs"))
        out = (
            stats.crossJoin(F.broadcast(lang_row))
            .crossJoin(F.broadcast(tokq))
            .crossJoin(F.broadcast(sources))
            .crossJoin(F.broadcast(hll_row))
            .crossJoin(F.broadcast(pairs))
            .withColumn(
                "near_dup_pair_ppm",
                F.expr("near_dup_pairs * 1000000 div n_docs"),
            )
        )
        # Materialize executor-side BEFORE release_all() drops the
        # jaccard tier's pinned inverted index the plan depends on:
        # eager localCheckpoint stores the (one-row) result as RDD
        # blocks and truncates lineage -- no driver round-trip of
        # result rows (round-6 verdict item 6).
        out = out.localCheckpoint(eager=True)
    finally:
        release_all()  # the jaccard tier pins its inverted index
    return out


def _corpus_health_oracle() -> str:
    from ..operators.bloom import hll_estimate_sql, hll_registers_sql
    from ..operators.dedup import ngram_jaccard_pairs_sql
    from ..operators.histogram import (
        histogram_quantiles_sql,
        histogram_sketch_sql,
    )

    toks = ("SELECT doc_id, text, lang, source,"
            " CAST(len(regexp_split_to_array(text, ' +')) AS BIGINT)"
            " AS n_tokens FROM documents")
    tokq = histogram_quantiles_sql(
        histogram_sketch_sql(toks, "n_tokens", 0, _CH_HI, _CH_BINS),
        [500_000, 900_000], 0, _CH_HI, _CH_BINS,
    )
    hll = (f"WITH {hll_registers_sql(toks, 'source', m=_CH_M)}"
           f" {hll_estimate_sql(m=_CH_M)}")
    pairs = ngram_jaccard_pairs_sql(
        "documents", "text", "doc_id", n=_CH_N, threshold=_CH_T
    )
    return f"""
        WITH stats AS (
            SELECT COUNT(*) AS n_docs,
                   CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
            FROM ({toks})
        ),
        lang_row AS (
            SELECT CAST(MAX(c) AS BIGINT) AS top_lang_docs,
                   CAST(MAX(c) AS BIGINT) * 1000000
                       // CAST(SUM(c) AS BIGINT) AS top_lang_share_ppm
            FROM (SELECT COUNT(*) AS c FROM ({toks}) GROUP BY lang)
        ),
        tokq AS (
            SELECT MAX(CASE WHEN q_ppm = 500000 THEN est_micro END)
                       AS p50_tokens_micro,
                   MAX(CASE WHEN q_ppm = 900000 THEN est_micro END)
                       AS p90_tokens_micro
            FROM ({tokq})
        ),
        sources AS (
            SELECT COUNT(DISTINCT source) AS n_sources_exact
            FROM ({toks})
        ),
        hll_row AS (
            SELECT est_distinct AS est_sources_hll FROM ({hll})
        ),
        pairs AS (
            SELECT COUNT(*) AS near_dup_pairs FROM ({pairs})
        )
        SELECT n_docs, total_tokens, top_lang_docs,
               top_lang_share_ppm, p50_tokens_micro, p90_tokens_micro,
               n_sources_exact, est_sources_hll, near_dup_pairs,
               near_dup_pairs * 1000000 // n_docs AS near_dup_pair_ppm
        FROM stats CROSS JOIN lang_row CROSS JOIN tokq
             CROSS JOIN sources CROSS JOIN hll_row CROSS JOIN pairs
    """


register(QuerySpec(
    name="corpus_health_dashboard",
    spark_fn=_corpus_health,
    oracle=_corpus_health_oracle,
    covers=("composed-monitoring-dashboard", "sketch-trio-composition"),
    extended=True,  # round-7 rotation (registry.py)
))


# --- declarative data contract --------------------------------------------------

# (name, spark Expectation builder args, DuckDB boolean SQL) -- one
# row of the contract per tuple; the SQL string is the oracle twin of
# the Spark predicate, and both count a row as a violation when the
# predicate is NOT satisfied (nulls per each predicate's own policy).
_CONTRACT = [
    ("not_null:o_orderkey,o_custkey",
     "o_orderkey IS NOT NULL AND o_custkey IS NOT NULL"),
    ("in_range:o_totalprice",
     "o_totalprice IS NULL OR o_totalprice BETWEEN 0 AND 600000"),
    ("at_least:o_totalprice",
     "o_totalprice IS NULL OR o_totalprice >= 1"),
    ("domain:o_orderstatus",
     "o_orderstatus IN ('F', 'O', 'P')"),
    ("fresh:o_orderdate",
     "o_orderdate IS NULL OR o_orderdate >= TIMESTAMP '1990-01-01'"),
]


def _data_contract_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.validate import (
        Expectation,
        at_least,
        contract_report,
        in_range,
        not_null,
    )

    orders = load_table(spark, sf_dir, "orders")
    exps = [
        not_null(["o_orderkey", "o_custkey"]),
        in_range("o_totalprice", 0, 600_000),
        at_least("o_totalprice", 1),
        Expectation(
            "domain:o_orderstatus",
            F.col("o_orderstatus").isin("F", "O", "P"),
        ),
        Expectation(
            "fresh:o_orderdate",
            F.col("o_orderdate").isNull()
            | (F.col("o_orderdate") >= F.lit("1990-01-01").cast("timestamp")),
        ),
    ]
    from ..operators.validate import uniqueness_report

    report = contract_report(orders, exps).unionByName(
        uniqueness_report(orders, ["o_orderkey"])
    )
    return report.orderBy("expectation")


_CONTRACT_ORACLE = (
    "SELECT expectation, n_rows, n_violations,\n"
    "       CAST(n_violations = 0 AS INTEGER) AS passed\n"
    "FROM (\n"
    + "\nUNION ALL\n".join(
        f"""SELECT '{name}' AS expectation,
               COUNT(*) AS n_rows,
               CAST(COALESCE(SUM(CASE WHEN NOT COALESCE(({pred}), FALSE)
                        THEN 1 ELSE 0 END), 0) AS BIGINT)
                   AS n_violations
        FROM orders"""
        for name, pred in _CONTRACT
    )
    + """
UNION ALL
SELECT 'unique:o_orderkey' AS expectation,
       COUNT(*) AS n_rows,
       CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
           AS n_violations
FROM orders
) ORDER BY expectation"""
)

register(QuerySpec(
    name="data_contract_orders",
    spark_fn=_data_contract_orders,
    oracle=_CONTRACT_ORACLE,
    covers=("data-contract-report", "declarative-expectations"),
    extended=True,  # round-7 rotation (registry.py)
))


# --- quarantine / dead-letter routing (round-9) --------------------------------
#
# The production middle ground between fail-fast (check aborts the
# load) and monitoring (contract_report counts): a continuously-fed
# pipeline routes bad rows PLUS the reasons to a quarantine sink for
# replay after the upstream fix. The query injects deterministic dirt
# into orders (null custkey every 97th key, negative price every
# 89th, unknown status every 83rd -- coprime moduli so reason
# COMBINATIONS occur), splits with the same Expectation objects the
# contract tier uses, and returns the reason-set histogram plus the
# valid count -- the dashboard a quarantine sink feeds.

def _quarantine_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.validate import (
        Expectation,
        in_range,
        not_null,
        quarantine_split,
    )

    orders = load_table(spark, sf_dir, "orders")
    dirty = orders.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 97 == 0, F.lit(None))
        .otherwise(F.col("o_custkey")).alias("o_custkey"),
        F.when(F.col("o_orderkey") % 89 == 0, F.lit(-1.0))
        .otherwise(F.col("o_totalprice")).alias("o_totalprice"),
        F.when(F.col("o_orderkey") % 83 == 0, F.lit("X"))
        .otherwise(F.col("o_orderstatus")).alias("o_orderstatus"),
    )
    exps = [
        not_null(["o_custkey"]),
        in_range("o_totalprice", 0, 600_000),
        Expectation(
            "domain:o_orderstatus",
            F.col("o_orderstatus").isin("F", "O", "P"),
        ),
    ]
    valid, quarantined = quarantine_split(dirty, exps)
    hist = (
        quarantined
        .groupBy(
            F.array_join(F.array_sort("reasons"), "|").alias("reasons")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    )
    return hist.unionByName(
        valid.agg(
            F.lit("__valid__").alias("reasons"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
    ).orderBy("reasons")


_QUAR_REASONS = """list_sort(list_filter([
        CASE WHEN NOT COALESCE(o_custkey IS NOT NULL, FALSE)
             THEN 'not_null:o_custkey' END,
        CASE WHEN NOT COALESCE(o_totalprice IS NULL
                  OR o_totalprice BETWEEN 0 AND 600000, FALSE)
             THEN 'in_range:o_totalprice' END,
        CASE WHEN NOT COALESCE(o_orderstatus IN ('F','O','P'), FALSE)
             THEN 'domain:o_orderstatus' END
    ], x -> x IS NOT NULL))"""

register(QuerySpec(
    name="quarantine_split_orders",
    spark_fn=_quarantine_orders,
    oracle=f"""
        WITH dirty AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 97 = 0 THEN NULL
                        ELSE o_custkey END AS o_custkey,
                   CASE WHEN o_orderkey % 89 = 0 THEN -1.0
                        ELSE o_totalprice END AS o_totalprice,
                   CASE WHEN o_orderkey % 83 = 0 THEN 'X'
                        ELSE o_orderstatus END AS o_orderstatus
            FROM orders
        ), tagged AS (
            SELECT {_QUAR_REASONS} AS reasons FROM dirty
        )
        SELECT array_to_string(reasons, '|') AS reasons,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM tagged WHERE len(reasons) > 0
        GROUP BY 1
        UNION ALL
        SELECT '__valid__', CAST(COUNT(*) AS BIGINT)
        FROM tagged WHERE len(reasons) = 0
        ORDER BY reasons
    """,
    covers=("quarantine-split", "dead-letter-routing",
            "row-level-reasons"),
))


# --- image near-dup: the hash-a-guarantee contract ------------------------------

_IMG_P = 400  # docs sharing doc_id % _IMG_P get byte-identical BMPs


def _image_near_dup_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image leg of the dedup suite, driver-attestable via the
    simhash/bloom 'hash a guarantee' pattern: payloads are
    DETERMINISTIC 16x16 BMPs generated from ``doc_id % _IMG_P`` (md5
    pixel bytes), so docs sharing the residue are byte-identical
    images -- dHash finds every such pair at Hamming 0, a hard
    guarantee the oracle can state from doc_id arithmetic alone. The
    md5 patterns are pairwise far in dHash space (distinct residues
    measured > 8 bits apart on this corpus -- deterministic, fixed
    forever), so the contract also pins zero false pairs."""
    from ..operators.multimodal import image_dhash, image_near_dup_pairs

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    import pandas as pd
    from pyspark.sql import types as T_

    def _payloads(batches):
        import hashlib
        import struct

        def bmp(pid: int) -> bytes:
            w = h = 16
            stride = ((3 * w + 3) // 4) * 4
            body = bytearray()
            for y in range(h):
                row = bytearray()
                for x in range(0, w, 5):
                    # 15 md5 bytes paint 5 BGR pixels
                    row += hashlib.md5(
                        f"img-{pid}-{y}-{x}".encode()
                    ).digest()[:15]
                row = row[: 3 * w]
                body += row + b"\x00" * (stride - len(row))
            return (
                b"BM"
                + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
                + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                              len(body), 2835, 2835, 0, 0)
                + bytes(body)
            )

        cache: dict[int, bytes] = {}
        for pdf in batches:
            pids = [int(d) % _IMG_P for d in pdf["doc_id"]]
            for p in pids:
                if p not in cache:
                    cache[p] = bmp(p)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "payload": [bytearray(cache[p]) for p in pids],
            })

    payloads = docs.mapInPandas(
        _payloads,
        T_.StructType([
            T_.StructField("doc_id", T_.LongType()),
            T_.StructField("payload", T_.BinaryType()),
        ]),
    )
    hashes = image_dhash(payloads)
    pairs = image_near_dup_pairs(hashes, max_hamming=8)
    clone = (F.col("id_a") % _IMG_P == F.col("id_b") % _IMG_P).cast("int")
    found = pairs.agg(
        F.count(F.lit(1)).alias("n_found_pairs"),
        F.coalesce(F.sum(clone), F.lit(0)).cast("long")
        .alias("n_clone_found"),
    )
    base = docs.groupBy((F.col("doc_id") % _IMG_P).alias("pid")).agg(
        F.count(F.lit(1)).alias("c")
    ).agg(
        F.sum("c").cast("long").alias("n_images"),
        F.count(F.lit(1)).cast("long").alias("n_patterns"),
        F.sum(F.expr("c * (c - 1) div 2")).cast("long")
        .alias("n_clone_pairs"),
    )
    return base.crossJoin(F.broadcast(found)).select(
        "n_images", "n_patterns", "n_clone_pairs",
        "n_found_pairs", "n_clone_found",
        (F.col("n_clone_found") == F.col("n_clone_pairs")).cast("int")
        .alias("all_clones_found"),
        (F.col("n_found_pairs") == F.col("n_clone_found")).cast("int")
        .alias("no_false_pairs"),
    )


register(QuerySpec(
    name="image_near_dup_contract",
    spark_fn=_image_near_dup_contract,
    oracle=f"""
        WITH grp AS (
            SELECT doc_id % {_IMG_P} AS pid, COUNT(*) AS c
            FROM documents GROUP BY 1
        ),
        base AS (
            SELECT CAST(SUM(c) AS BIGINT) AS n_images,
                   COUNT(*) AS n_patterns,
                   CAST(SUM(c * (c - 1) // 2) AS BIGINT)
                       AS n_clone_pairs
            FROM grp
        )
        SELECT n_images, n_patterns, n_clone_pairs,
               n_clone_pairs AS n_found_pairs,
               n_clone_pairs AS n_clone_found,
               1 AS all_clones_found,
               1 AS no_false_pairs
        FROM base
    """,
    covers=("image-near-dup", "multimodal-dedup-contract"),
    extended=True,  # round-7 rotation (registry.py)
))


# --- audio near-dup: same guarantee contract, third modality --------------------

_AUD_P = 200  # docs sharing doc_id % _AUD_P get byte-identical WAVs


def _audio_near_dup_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio leg of the dedup suite under the same hash-a-guarantee
    contract as image_near_dup_contract: deterministic 16-bit PCM
    WAVs synthesized from ``doc_id % _AUD_P`` (md5-seeded sample
    words), byte-identical within a residue class -- the spectral
    fingerprint finds every clone pair at Hamming 0 and the md5
    signals are pairwise far, so the oracle pins full clone recall
    and zero false pairs from doc_id arithmetic alone."""
    from ..operators.multimodal import (
        audio_fingerprint,
        audio_near_dup_pairs,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    import pandas as pd
    from pyspark.sql import types as T_

    def _payloads(batches):
        import hashlib
        import io
        import struct
        import wave

        def wav(pid: int) -> bytes:
            # 1024 16-bit mono samples from md5 words: wideband
            # deterministic 'noise' -- rich spectrum, distinct per pid
            raw = b"".join(
                hashlib.md5(f"aud-{pid}-{i}".encode()).digest()
                for i in range(128)
            )[: 2 * 1024]
            buf = io.BytesIO()
            with wave.open(buf, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(8000)
                w.writeframes(raw)
            return buf.getvalue()

        cache: dict[int, bytes] = {}
        for pdf in batches:
            pids = [int(d) % _AUD_P for d in pdf["doc_id"]]
            for p in pids:
                if p not in cache:
                    cache[p] = wav(p)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "payload": [bytearray(cache[p]) for p in pids],
            })

    payloads = docs.mapInPandas(
        _payloads,
        T_.StructType([
            T_.StructField("doc_id", T_.LongType()),
            T_.StructField("payload", T_.BinaryType()),
        ]),
    )
    fps = audio_fingerprint(payloads)
    pairs = audio_near_dup_pairs(fps, max_hamming=6)
    clone = (F.col("id_a") % _AUD_P == F.col("id_b") % _AUD_P).cast("int")
    found = pairs.agg(
        F.count(F.lit(1)).alias("n_found_pairs"),
        F.coalesce(F.sum(clone), F.lit(0)).cast("long")
        .alias("n_clone_found"),
    )
    base = docs.groupBy((F.col("doc_id") % _AUD_P).alias("pid")).agg(
        F.count(F.lit(1)).alias("c")
    ).agg(
        F.sum("c").cast("long").alias("n_clips"),
        F.count(F.lit(1)).cast("long").alias("n_patterns"),
        F.sum(F.expr("c * (c - 1) div 2")).cast("long")
        .alias("n_clone_pairs"),
    )
    return base.crossJoin(F.broadcast(found)).select(
        "n_clips", "n_patterns", "n_clone_pairs",
        "n_found_pairs", "n_clone_found",
        (F.col("n_clone_found") == F.col("n_clone_pairs")).cast("int")
        .alias("all_clones_found"),
        (F.col("n_found_pairs") == F.col("n_clone_found")).cast("int")
        .alias("no_false_pairs"),
    )


register(QuerySpec(
    name="audio_near_dup_contract",
    spark_fn=_audio_near_dup_contract,
    oracle=f"""
        WITH grp AS (
            SELECT doc_id % {_AUD_P} AS pid, COUNT(*) AS c
            FROM documents GROUP BY 1
        ),
        base AS (
            SELECT CAST(SUM(c) AS BIGINT) AS n_clips,
                   COUNT(*) AS n_patterns,
                   CAST(SUM(c * (c - 1) // 2) AS BIGINT)
                       AS n_clone_pairs
            FROM grp
        )
        SELECT n_clips, n_patterns, n_clone_pairs,
               n_clone_pairs AS n_found_pairs,
               n_clone_pairs AS n_clone_found,
               1 AS all_clones_found,
               1 AS no_false_pairs
        FROM base
    """,
    covers=("audio-near-dup", "multimodal-dedup-contract"),
    extended=True,  # round-7 rotation (registry.py)
))


# --- exact classifier evaluation (ROC-AUC + confusion) ------------------------
#
# The eval leg of the classifier tier (operators/classify.py trains
# and scores; operators/evaluate.py measures). Task: predict
# lang = 'en' from the hashing-trick linear score — a real label the
# deterministic pseudo-weights have NO knowledge of, so the AUC is an
# honest near-chance measurement and every confusion cell is
# exercised. The whole report (Mann–Whitney two_u, auc_ppm,
# tp/fp/fn/tn, precision/recall/f1 ppm) is exact BIGINT end to end:
# one groupBy(score) shuffle + one distinct-score cumsum + one row.


def _classifier_eval_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.classify import hashed_linear_score
    from ..operators.evaluate import binary_eval

    docs = load_table(spark, sf_dir, "documents")
    scored = hashed_linear_score(docs).join(
        docs.select(
            F.col("doc_id").alias("id"),
            (F.col("lang") == "en").cast("int").alias("y"),
        ),
        "id",
    )
    return binary_eval(
        scored.select("y", F.col("logit_milli").alias("score"))
    )


def _classifier_eval_auc_oracle() -> str:
    from ..operators.classify import hashed_linear_score_sql
    from ..operators.evaluate import binary_eval_sql

    scored = f"""
        SELECT s.logit_milli AS score,
               CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
        FROM ({hashed_linear_score_sql('documents')}) s
        JOIN documents d ON s.id = d.doc_id
    """
    return binary_eval_sql(scored)


register(QuerySpec(
    name="classifier_eval_auc",
    spark_fn=_classifier_eval_auc,
    oracle=_classifier_eval_auc_oracle,
    covers=("roc-auc-exact", "classifier-eval"),
    bench=True,  # the eval tier's headline cost
    extended=True,  # round-7 rotation (registry.py)
))


# --- grouped (per-segment) classifier evaluation ------------------------------
#
# Per-source AUC: the segment-quality readout a model dashboard pages
# on ("the quality gate is near-chance on src7"). The grouped path is
# also the better plan at scale: the cumulative-sum window partitions
# by group, so NO single-partition window remains.


def _classifier_eval_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.classify import hashed_linear_score
    from ..operators.evaluate import binary_eval

    docs = load_table(spark, sf_dir, "documents")
    scored = hashed_linear_score(docs).join(
        docs.select(
            F.col("doc_id").alias("id"),
            F.col("source"),
            (F.col("lang") == "en").cast("int").alias("y"),
        ),
        "id",
    )
    return binary_eval(
        scored.select(
            "source", "y", F.col("logit_milli").alias("score")
        ),
        group_cols=["source"],
    ).orderBy("source")


def _classifier_eval_by_source_oracle() -> str:
    from ..operators.classify import hashed_linear_score_sql
    from ..operators.evaluate import binary_eval_sql

    scored = f"""
        SELECT d.source, s.logit_milli AS score,
               CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
        FROM ({hashed_linear_score_sql('documents')}) s
        JOIN documents d ON s.id = d.doc_id
    """
    return (
        binary_eval_sql(scored, group_cols=["source"])
        + " ORDER BY source"
    )


register(QuerySpec(
    name="classifier_eval_by_source",
    spark_fn=_classifier_eval_by_source,
    oracle=_classifier_eval_by_source_oracle,
    covers=("grouped-roc-auc", "per-segment-eval"),
    extended=True,  # round-7 rotation (registry.py)
))


# --- score calibration bins ---------------------------------------------------

_CAL_LO, _CAL_HI, _CAL_BINS = -10_000, 30_000, 10


def _score_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.classify import hashed_linear_score
    from ..operators.evaluate import calibration_bins

    docs = load_table(spark, sf_dir, "documents")
    scored = hashed_linear_score(docs).join(
        docs.select(
            F.col("doc_id").alias("id"),
            (F.col("lang") == "en").cast("int").alias("y"),
        ),
        "id",
    )
    return calibration_bins(
        scored.select("y", F.col("logit_milli").alias("score")),
        _CAL_LO, _CAL_HI, _CAL_BINS,
    )


def _score_calibration_bins_oracle() -> str:
    from ..operators.classify import hashed_linear_score_sql
    from ..operators.evaluate import calibration_bins_sql

    scored = f"""
        SELECT s.logit_milli AS score,
               CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
        FROM ({hashed_linear_score_sql('documents')}) s
        JOIN documents d ON s.id = d.doc_id
    """
    return calibration_bins_sql(scored, _CAL_LO, _CAL_HI, _CAL_BINS)


register(QuerySpec(
    name="score_calibration_bins",
    spark_fn=_score_calibration_bins,
    oracle=_score_calibration_bins_oracle,
    covers=("calibration-bins", "reliability-diagram"),
    extended=True,  # round-7 rotation (registry.py)
))


# --- video near-dup contract --------------------------------------------------

_VID_P = 400  # docs sharing doc_id % _VID_P get byte-identical MP4s


def video_payloads_fn(pid_mod: int):
    """mapInPandas generator synthesizing deterministic MP4 payloads
    from ``doc_id % pid_mod`` — shared by the contract query and the
    10x scale smoke so their corpora are the same object. Output
    schema: ``doc_id long, payload binary``."""
    import pandas as pd

    def _payloads(batches):
        import hashlib

        def box(btype: bytes, payload: bytes) -> bytes:
            return (8 + len(payload)).to_bytes(4, "big") + btype + payload

        def mp4(pid: int) -> bytes:
            frames = [
                hashlib.md5(f"vid-{pid}-{k}".encode()).digest() * 4
                for k in range(6)
            ]
            n = len(frames)
            stts = (
                bytes(4) + (1).to_bytes(4, "big")
                + n.to_bytes(4, "big") + (10).to_bytes(4, "big")
            )
            stsz = (
                bytes(4) + bytes(4) + n.to_bytes(4, "big")
                + b"".join(len(f).to_bytes(4, "big") for f in frames)
            )
            stsc = (
                bytes(4) + (1).to_bytes(4, "big")
                + (1).to_bytes(4, "big") + n.to_bytes(4, "big")
                + (1).to_bytes(4, "big")
            )
            mdhd = bytes(4) + bytes(8) + (90).to_bytes(4, "big") \
                + bytes(4) + bytes(4)
            hdlr = bytes(8) + b"vide" + bytes(12)
            mvhd = bytes(4) + bytes(8) + (100).to_bytes(4, "big") \
                + (n * 10).to_bytes(4, "big")

            def build(offset: int) -> bytes:
                stco = (
                    bytes(4) + (1).to_bytes(4, "big")
                    + offset.to_bytes(4, "big")
                )
                stbl = (
                    box(b"stts", stts) + box(b"stsz", stsz)
                    + box(b"stsc", stsc) + box(b"stco", stco)
                )
                mdia = (
                    box(b"mdhd", mdhd) + box(b"hdlr", hdlr)
                    + box(b"minf", box(b"stbl", stbl))
                )
                moov = box(b"mvhd", mvhd) + box(
                    b"trak", box(b"mdia", mdia)
                )
                return box(b"ftyp", b"isom\x00\x00\x02\x00isom") \
                    + box(b"moov", moov)

            head = build(0)
            head = build(len(head) + 8)
            return head + box(b"mdat", b"".join(frames))

        cache: dict[int, bytes] = {}
        for pdf in batches:
            pids = [int(d) % pid_mod for d in pdf["doc_id"]]
            for p in pids:
                if p not in cache:
                    cache[p] = mp4(p)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "payload": [bytearray(cache[p]) for p in pids],
            })

    return _payloads


def _video_near_dup_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video leg of the dedup suite under the hash-a-guarantee
    contract (text SimHash / audio fingerprint / image dHash / video
    frame hashes -- all four modalities carry oracle rows):
    deterministic MP4s synthesized from ``doc_id % _VID_P`` (six
    md5-derived encoded frames behind a real stts/stsz/stsc/stco
    sample table), byte-identical within a residue class. The
    frame-hash inverted index finds every clone pair at containment
    1e6 ppm, and distinct residues share no frame (md5 frames are
    pairwise distinct), so the oracle states full clone recall and
    zero false pairs from doc_id arithmetic alone."""
    from ..operators.multimodal import frame_hashes, video_near_dup_pairs

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    payloads = docs.mapInPandas(
        video_payloads_fn(_VID_P),
        "doc_id long, payload binary",
    )
    pairs = video_near_dup_pairs(
        frame_hashes(payloads), min_overlap_ppm=500_000
    )
    clone = (F.col("id_a") % _VID_P == F.col("id_b") % _VID_P).cast("int")
    found = pairs.agg(
        F.count(F.lit(1)).alias("n_found_pairs"),
        F.coalesce(F.sum(clone), F.lit(0)).cast("long")
        .alias("n_clone_found"),
    )
    base = docs.groupBy((F.col("doc_id") % _VID_P).alias("pid")).agg(
        F.count(F.lit(1)).alias("c")
    ).agg(
        F.sum("c").cast("long").alias("n_clips"),
        F.count(F.lit(1)).cast("long").alias("n_patterns"),
        F.sum(F.expr("c * (c - 1) div 2")).cast("long")
        .alias("n_clone_pairs"),
    )
    return base.crossJoin(found).select(
        "n_clips", "n_patterns", "n_clone_pairs",
        "n_found_pairs", "n_clone_found",
        (F.col("n_clone_found") == F.col("n_clone_pairs")).cast("int")
        .alias("all_clones_found"),
        (F.col("n_found_pairs") == F.col("n_clone_found")).cast("int")
        .alias("no_false_pairs"),
    )


register(QuerySpec(
    name="video_near_dup_contract",
    spark_fn=_video_near_dup_contract,
    oracle=f"""
        WITH grp AS (
            SELECT doc_id % {_VID_P} AS pid, COUNT(*) AS c
            FROM documents GROUP BY 1
        ),
        base AS (
            SELECT CAST(SUM(c) AS BIGINT) AS n_clips,
                   COUNT(*) AS n_patterns,
                   CAST(SUM(c * (c - 1) // 2) AS BIGINT)
                       AS n_clone_pairs
            FROM grp
        )
        SELECT n_clips, n_patterns, n_clone_pairs,
               n_clone_pairs AS n_found_pairs,
               n_clone_pairs AS n_clone_found,
               1 AS all_clones_found,
               1 AS no_false_pairs
        FROM base
    """,
    covers=("video-near-dup", "multimodal-dedup-contract"),
    extended=True,  # round-7 rotation (registry.py)
))


# --- privacy / disclosure audit (operators/privacy.py) ------------------------
#
# k-anonymity + l-diversity over generalized quasi-identifiers, plus
# the minimal-suppression release count -- the audit the reference
# pipeline (reference ETL.py: unconditional RDBMS export) never runs.
# Exactly two hash aggregates + a semi join; every output is BIGINT
# (ppm by integer division), so the DuckDB twin is bit-exact.

def _k_anonymity_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.privacy import k_anonymity_report, suppress_below_k

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_band"),
    )
    quasi = ["c_nationkey", "c_mktsegment", "bal_band"]
    report = k_anonymity_report(
        cust, quasi, k=5, sensitive_col="c_acctbal", l=3
    )
    released = suppress_below_k(cust, quasi, k=5).agg(
        F.count(F.lit(1)).cast("long").alias("n_released")
    )
    # two one-row relations -- constant-size broadcast cross join
    return report.crossJoin(released)


def _k_anonymity_oracle() -> str:
    from ..operators.privacy import k_anonymity_report_sql

    inner = """SELECT c_nationkey, c_mktsegment,
                      CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band,
                      c_acctbal
               FROM customer"""
    report = k_anonymity_report_sql(
        inner, ["c_nationkey", "c_mktsegment", "bal_band"],
        k=5, sensitive_col="c_acctbal", l=3,
    )
    # suppression deletes exactly the rows_below_k rows (same class
    # sizes relation), so the release count folds into the report
    return f"""
        SELECT *, CAST(n_rows - rows_below_k AS BIGINT) AS n_released
        FROM ({report})
    """


register(QuerySpec(
    name="k_anonymity_customers",
    spark_fn=_k_anonymity_customers,
    oracle=_k_anonymity_oracle,
    covers=("privacy-audit", "k-anonymity", "l-diversity",
            "suppression-release"),
    extended=True,  # round-7 rotation (registry.py)
))


# --- Markov transition matrix (operators/funnel.py) ---------------------------
#
# First-order next-event model over per-user event sequences: the
# behavioral fingerprint product analytics builds on top of
# sessionization (and the prior a next-event recommender cold-starts
# from). One window pass + a |states|^2-bounded aggregate.

def _session_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.funnel import transition_matrix

    ev = load_table(spark, sf_dir, "events")
    return transition_matrix(
        ev, key_col="user_id", ts_col="ts", state_col="event_type",
        tiebreak_col="event_id",
    ).orderBy("src", "dst")


def _session_transitions_oracle() -> str:
    from ..operators.funnel import transition_matrix_sql

    inner = transition_matrix_sql(
        "events", key_col="user_id", ts_col="ts",
        state_col="event_type", tiebreak_col="event_id",
    )
    return f"SELECT * FROM ({inner}) ORDER BY src, dst"


register(QuerySpec(
    name="session_transition_matrix",
    spark_fn=_session_transitions,
    oracle=_session_transitions_oracle,
    covers=("markov-transitions", "next-event-model",
            "sequence-analytics"),
    extended=True,  # round-7 rotation (registry.py)
))


# --- inference batch packing audit ----------------------------------------------
#
# The serving-side sibling of pack_sequences: deterministic
# length-bucketed inference batches vs naive arrival-order batching,
# with the exact padded-slot saving (operators/batching.py). The
# driver hash pins the full assignment indirectly: pad counts change
# if ANY doc lands in a different batch.


def _inference_batch_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.batching import batching_waste_audit

    docs = load_table(spark, sf_dir, "documents")
    return batching_waste_audit(
        docs, id_col="doc_id", text_col="text",
        batch_size=8, bucket_width=16, shards=4,
    )


def _inference_batch_audit_oracle() -> str:
    from ..operators.batching import batching_waste_audit_sql

    return batching_waste_audit_sql(
        "documents", id_col="doc_id", text_col="text",
        batch_size=8, bucket_width=16, shards=4,
    )


register(QuerySpec(
    name="inference_batch_packing",
    spark_fn=_inference_batch_audit,
    oracle=_inference_batch_audit_oracle,
    covers=("inference-batching", "padding-waste",
            "length-bucketing"),
    bench=True,  # window-assignment throughput headliner
    extended=True,  # round-7 rotation (registry.py)
))


# --- context-window assembly (session history -> training examples) -------------


def _context_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.funnel import assemble_context_windows

    ev = load_table(spark, sf_dir, "events")
    return assemble_context_windows(
        ev, key_col="user_id", ts_col="ts", event_col="event_type",
        tiebreak_col="event_id", gap_seconds=1800, max_turns=5,
    )


def _context_windows_oracle() -> str:
    from ..operators.funnel import assemble_context_windows_sql

    return assemble_context_windows_sql(
        "events", key_col="user_id", ts_col="ts",
        event_col="event_type", tiebreak_col="event_id",
        gap_seconds=1800, max_turns=5,
    )


register(QuerySpec(
    name="session_context_windows",
    spark_fn=_context_windows,
    oracle=_context_windows_oracle,
    covers=("context-assembly", "chat-history-prep",
            "session-training-examples"),
    extended=True,  # round-7 rotation (registry.py)
))


# --- vocabulary growth (Heaps' law) ---------------------------------------------


def _vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.corpus import vocab_growth_curve

    docs = load_table(spark, sf_dir, "documents")
    return vocab_growth_curve(docs, n_buckets=10)


def _vocab_growth_oracle() -> str:
    from ..operators.corpus import vocab_growth_curve_sql

    return vocab_growth_curve_sql("documents", n_buckets=10)


register(QuerySpec(
    name="vocab_growth_curve",
    spark_fn=_vocab_growth,
    oracle=_vocab_growth_oracle,
    covers=("heaps-law", "vocab-growth", "corpus-sizing"),
    extended=True,  # round-7 rotation (registry.py)
))


# --- temperature-based mixture plan ----------------------------------------------


def _temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sample import temperature_mixture_plan

    docs = load_table(spark, sf_dir, "documents")
    # T=2 -> alpha=0.5: the sqrt path, bit-exact across engines.
    # Stratify by lang (en holds ~41% of the corpus): temperature
    # sampling visibly compresses the en share toward the rest.
    return temperature_mixture_plan(
        docs, strata_col="lang", key_col="doc_id",
        budget_docs=200, temperature=2.0,
    )


def _temperature_mixture_oracle() -> str:
    from ..operators.sample import temperature_mixture_plan_sql

    return temperature_mixture_plan_sql(
        "documents", strata_col="lang", key_col="doc_id",
        budget_docs=200, temperature=2.0,
    )


register(QuerySpec(
    name="temperature_mixture_plan",
    spark_fn=_temperature_mixture,
    oracle=_temperature_mixture_oracle,
    covers=("temperature-sampling", "multilingual-mixture",
            "mt5-recipe"),
    extended=True,  # round-7 rotation (registry.py)
))


# --- VARIANT-typed semi-structured analytics -------------------------------------
#
# Spark 4's VARIANT type is the scan-efficient path for JSON columns
# (binary-encoded, shredded pushdown-friendly storage -- the modern
# replacement for from_json with a pinned schema when the shape
# drifts). This query runs the events props column through
# parse_json -> variant_get and aggregates; the existing
# `json_props_stats` family covers the schema-pinned from_json path,
# so together the two attest both JSON disciplines the engine offers.


def _variant_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # Integer-k contract, pinned (r6 advice item 5): k counts only
    # when the JSON token IS an integer -- schema_of_variant = BIGINT
    # here, json_type IN (BIGINT, UBIGINT) in the twin. Without the
    # gate the dialects diverge on doubles (DuckDB CAST rounds, Spark
    # variant_get truncates) and quoted numbers (DuckDB parses, Spark
    # 'long' coerces) -- parity would rest on fixture luck. JSON ints
    # beyond int64 are out of contract (DuckDB UBIGINT would overflow
    # the BIGINT cast loudly; Spark types them DECIMAL(20,0) and
    # excludes them at the gate).
    pj = F.parse_json("props")
    v = ev.select(
        "event_type",
        F.when(
            F.schema_of_variant(F.variant_get(pj, "$.k", "variant"))
            == "BIGINT",
            F.variant_get(pj, "$.k", "long"),
        ).alias("k"),
    )
    return (
        v.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.count("k").cast("long").alias("n_with_k"),
            F.coalesce(F.sum("k"), F.lit(0)).cast("long").alias("k_sum"),
            F.coalesce(F.min("k"), F.lit(0)).cast("long").alias("k_min"),
            F.coalesce(F.max("k"), F.lit(0)).cast("long").alias("k_max"),
        )
        .orderBy("event_type")
    )


register(QuerySpec(
    name="variant_props_stats",
    spark_fn=_variant_props_stats,
    oracle="""
        WITH v AS (
            SELECT event_type,
                   CASE WHEN json_type(props, '$.k')
                             IN ('BIGINT', 'UBIGINT')
                        THEN CAST(json_extract(props, '$.k') AS BIGINT)
                   END AS k
            FROM events
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(k) AS BIGINT) AS n_with_k,
               CAST(COALESCE(SUM(k), 0) AS BIGINT) AS k_sum,
               CAST(COALESCE(MIN(k), 0) AS BIGINT) AS k_min,
               CAST(COALESCE(MAX(k), 0) AS BIGINT) AS k_max
        FROM v
        GROUP BY event_type
        ORDER BY event_type
    """,
    covers=("variant-type", "semi-structured-json",
            "spark4-native"),
    extended=True,  # round-7 rotation (registry.py)
))


# --- per-segment rate with Wilson CI ---------------------------------------------


def _purchase_rate_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.evaluate import rate_with_wilson

    ev = load_table(spark, sf_dir, "events")
    flagged = ev.select(
        "event_type",
        (F.col("value") > 100).cast("int").alias("high_value"),
    )
    return rate_with_wilson(
        flagged, success_col="high_value", group_cols=["event_type"]
    ).orderBy("event_type")


def _purchase_rate_wilson_oracle() -> str:
    from ..operators.evaluate import rate_with_wilson_sql

    inner = rate_with_wilson_sql(
        """SELECT event_type,
                  CASE WHEN value > 100 THEN 1 ELSE 0 END AS high_value
           FROM events""",
        success_sql="high_value", group_cols=["event_type"],
    )
    return f"SELECT * FROM ({inner}) ORDER BY event_type"


register(QuerySpec(
    name="rate_wilson_ci_by_type",
    spark_fn=_purchase_rate_wilson,
    oracle=_purchase_rate_wilson_oracle,
    covers=("wilson-interval", "segment-rate-ci",
            "engine-exact-statistics"),
    extended=True,  # round-7 rotation (registry.py)
))


# --- two-sample KS drift test ------------------------------------------------------


def _ks_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.evaluate import ks_two_sample

    ev = load_table(spark, sf_dir, "events")
    return ks_two_sample(
        ev, value_col="value", side_col="event_type",
        side_a="purchase", side_b="error", scale=100,
    )


def _ks_value_drift_oracle() -> str:
    from ..operators.evaluate import ks_two_sample_sql

    return ks_two_sample_sql(
        "SELECT * FROM events", value_col="value",
        side_col="event_type", side_a="purchase", side_b="error",
        scale=100,
    )


register(QuerySpec(
    name="ks_value_drift",
    spark_fn=_ks_value_drift,
    oracle=_ks_value_drift_oracle,
    covers=("ks-two-sample", "distribution-drift-test"),
    extended=True,  # round-7 rotation (registry.py)
))


# --- point-in-time enrichment (the feature-store join) ---------------------------
#
# Training-serving skew usually enters through ONE join: enriching an
# event with dimension state that wasn't knowable at event time
# (joining the LATEST customer state onto last year's orders). The
# leak-free form is the point-in-time (as-of) join every feature
# store ships. This query attests the engine's asof_join operator
# (union-and-carry-forward, operators/joins.py) against an
# INDEPENDENT closed form: with the version dim synthesized as "the
# customer's cumulative order count as of each order date", the PIT
# enrichment of an order provably equals COUNT(*) OVER (PARTITION BY
# cust ORDER BY date RANGE UNBOUNDED PRECEDING) -- so the oracle
# never runs an as-of join at all, and a hash match proves the
# operator implements the semantics, not just that two copies of the
# same code agree. The naive (latest-state) arm is also measured:
# its disagreement rate with PIT is the leakage a feature store
# exists to prevent.


def _pit_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ..operators.joins import asof_join

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    # version dim: one row per (cust, date) with the cumulative order
    # count THROUGH that date -- unique ts per key by construction
    # (equal-ts versions would carry nondeterministically)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate") \
        .rangeBetween(Window.unboundedPreceding, 0)
    versions = (
        orders
        .withColumn("state", F.count(F.lit(1)).over(w).cast("long"))
        .groupBy(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderdate").alias("ts"),
        )
        .agg(F.max("state").alias("state"))
    )
    enriched = asof_join(
        orders.select(
            F.col("o_orderkey"),
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderdate").alias("ts"),
        ),
        versions,
        on="custkey", ts_col="ts",
        right_value_cols=["state"],
        left_id_col="o_orderkey",
    ).select("o_orderkey", "custkey", F.col("asof_state").alias("pit"))
    latest = versions.groupBy("custkey").agg(
        F.max("state").alias("naive")
    )
    both = enriched.join(latest, "custkey")
    return both.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("pit").cast("long").alias("pit_state_sum"),
        F.sum("naive").cast("long").alias("naive_state_sum"),
        F.sum((F.col("naive") != F.col("pit")).cast("long"))
        .cast("long").alias("n_leaky_rows"),
        F.expr("sum(CASE WHEN naive != pit THEN 1 ELSE 0 END) "
               "* 1000000 div count(1)").cast("long").alias("leak_ppm"),
    )


register(QuerySpec(
    name="point_in_time_enrichment",
    spark_fn=_pit_enrichment,
    oracle="""
        WITH pit AS (
            SELECT o_custkey,
                   CAST(COUNT(*) OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate
                        RANGE BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS BIGINT) AS pit,
                   CAST(COUNT(*) OVER (PARTITION BY o_custkey)
                        AS BIGINT) AS naive
            FROM orders
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(pit) AS BIGINT) AS pit_state_sum,
               CAST(SUM(naive) AS BIGINT) AS naive_state_sum,
               CAST(SUM(CASE WHEN naive != pit THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_leaky_rows,
               CAST(SUM(CASE WHEN naive != pit THEN 1 ELSE 0 END)
                    AS BIGINT) * 1000000 // COUNT(*) AS leak_ppm
        FROM pit
    """,
    covers=("point-in-time-join", "feature-store-semantics",
            "temporal-leakage-audit"),
    extended=True,  # round-7 rotation (registry.py)
))


# --- point-in-time enrichment over REAL stored versions ------------------------
#
# The query above attests asof_join against a synthesized cumulative
# dim (by-construction closed form). This one closes the round-6
# verdict's item 7: the version dimension is ACTUAL STORED STATE --
# three deterministic event batches folded into a rollup store
# (operators/rollup_store.py), each published version read back via
# time travel and tagged with its version number as the dim's ts.
# Facts observe every event_type at ts 1..3; the as-of join picks the
# newest store version <= the fact's ts. The oracle never touches the
# store: version v's state for a key is, by the batch slicing,
# exactly the aggregate over raw events with event_id % 3 < v -- so a
# hash match attests store versioning + time travel + as-of semantics
# end-to-end against raw data.


def _pit_store_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile
    from functools import reduce

    from ..operators.joins import asof_join
    from ..operators.rollup_store import incremental_rollup, read_rollup

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    tmp = tempfile.mkdtemp(prefix="spark_pit_store_")
    try:
        store = f"{tmp}/rollup"
        for i in range(3):
            incremental_rollup(
                spark, ev.filter(F.col("event_id") % 3 == i), store,
                f"b{i}", key_cols=("event_type",), value_col="value",
            )
        dim = reduce(
            lambda a, b: a.unionByName(b),
            [
                read_rollup(spark, store, version=v)[0].select(
                    "event_type",
                    F.lit(v).cast("long").alias("ts"),
                    "n_rows", "sum_c",
                )
                for v in (1, 2, 3)
            ],
        )
        facts = (
            ev.select("event_type").distinct()
            .crossJoin(
                spark.range(1, 4).select(F.col("id").alias("ts"))
            )
            .withColumn("fact_id", F.expr("event_type || '#' || ts"))
        )
        out = asof_join(
            facts, dim, on="event_type", ts_col="ts",
            right_value_cols=["n_rows", "sum_c"], left_id_col="fact_id",
        ).select(
            "event_type",
            F.col("ts").cast("long").alias("as_of_version"),
            F.coalesce("asof_n_rows", F.lit(0)).cast("long")
            .alias("pit_rows"),
            F.coalesce("asof_sum_c", F.lit(0)).cast("long")
            .alias("pit_sum_c"),
        ).orderBy("event_type", "as_of_version")
        # materialize executor-side before the temp store disappears
        out = out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


register(QuerySpec(
    name="point_in_time_store_enrichment",
    spark_fn=_pit_store_enrichment,
    oracle="""
        WITH types AS (SELECT DISTINCT event_type FROM events),
             vs AS (SELECT * FROM (VALUES (1), (2), (3)) t(v))
        SELECT t.event_type,
               CAST(v.v AS BIGINT) AS as_of_version,
               CAST(COUNT(e.event_id) AS BIGINT) AS pit_rows,
               CAST(COALESCE(SUM(CAST(ROUND(e.value * 100) AS BIGINT)),
                             0) AS BIGINT) AS pit_sum_c
        FROM types t
        CROSS JOIN vs v
        LEFT JOIN events e
          ON e.event_type = t.event_type AND e.event_id % 3 < v.v
        GROUP BY t.event_type, v.v
        ORDER BY t.event_type, as_of_version
    """,
    covers=("point-in-time-join", "feature-store-semantics",
            "store-time-travel", "versioned-dimension"),
    extended=True,  # round-8 rotation (registry.py)
))


# --- last-touch attribution (round-9) -------------------------------------------
#
# The missing member of the product-analytics family (funnel, cohort,
# sessionize, transition matrix): credit each conversion to the last
# qualifying touch strictly before it within a lookback window. The
# engine shape is ONE window pass partitioned by user (max(struct)
# over a RANGE frame); the oracle deliberately runs the naive
# touches x conversions join the window rewrite replaces -- equal
# answers attest the rewrite, and the tie rule (same-microsecond
# touches break to the lexicographically greatest channel) makes the
# result physical-order independent in both engines.

def _attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.funnel import last_touch_attribution

    events = load_table(spark, sf_dir, "events")
    return last_touch_attribution(events).orderBy("channel")


def _attribution_oracle() -> str:
    from ..operators.funnel import last_touch_attribution_sql

    return last_touch_attribution_sql() + " ORDER BY channel"


register(QuerySpec(
    name="attribution_last_touch",
    spark_fn=_attribution_last_touch,
    oracle=_attribution_oracle,
    covers=("last-touch-attribution", "window-over-join-rewrite"),
    bench=True,
))


# --- functional-dependency / candidate-key audit (round-9) ----------------------
#
# The profiler (column_profile_lineitem) answers "what's in each
# column"; this answers the next question a data engineer asks: "what
# IDENTIFIES a row, and which cross-column rules actually hold?" --
# candidate keys and functional dependencies with the classical g3
# error (minimum deletions to make the FD exact). Mixed on purpose:
# two hold (o_orderkey is a key and determines o_custkey) and three
# fail -- including (l_orderkey, l_linenumber), which TPC-H declares
# a primary key but this synthetic generator does not enforce (the
# audit catching a "documented key" that is not one is exactly its
# job) -- so the query attests both verdict directions and exact g3.

def _fd_audit_orders_lineitem(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.profile import fd_audit

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    audit_o = fd_audit(orders, [
        (("o_orderkey",), None),
        (("o_orderkey",), "o_custkey"),
        (("o_custkey",), "o_orderpriority"),
    ])
    audit_l = fd_audit(li, [
        (("l_orderkey", "l_linenumber"), None),
        (("l_partkey",), "l_suppkey"),
    ])
    return audit_o.unionByName(audit_l).orderBy("fd")


def _fd_audit_oracle() -> str:
    from ..operators.profile import fd_audit_sql

    o = fd_audit_sql("orders", [
        (("o_orderkey",), None),
        (("o_orderkey",), "o_custkey"),
        (("o_custkey",), "o_orderpriority"),
    ])
    li = fd_audit_sql("lineitem", [
        (("l_orderkey", "l_linenumber"), None),
        (("l_partkey",), "l_suppkey"),
    ])
    return f"{o} UNION ALL {li} ORDER BY fd"


register(QuerySpec(
    name="fd_audit_orders_lineitem",
    spark_fn=_fd_audit_orders_lineitem,
    oracle=_fd_audit_oracle,
    covers=("functional-dependency-audit", "candidate-key-audit",
            "g3-error"),
    bench=True,
))


# --- heavy hitters: the guarantee-flag contract (round-9) ------------------------
#
# Completes the sketch family (HLL "how many distinct", CMS "how
# often is X", histogram "how spread"): WHICH items dominate, from a
# mergeable Misra-Gries sketch whose estimates depend on batching but
# whose GUARANTEES do not. The contract reports, for every item whose
# exact count exceeds the worst-case bound N/(k+1) (an engine-
# invariant threshold, tested by integer cross-multiplication):
# the exact count plus three flags that must hold under ANY
# partitioning -- present among candidates, est <= exact, and
# exact - est within the sketch's accumulated error bound (itself
# <= N/(k+1)). The item column is a deterministic 75/25 head/tail
# mix so the head is heavy at every sf.

_HH_K = 64


def _hh_items(sf_dir_df: DataFrame) -> DataFrame:
    return sf_dir_df.select(
        F.when(
            F.col("event_id") % 4 < 3, F.col("event_type")
        ).otherwise(
            F.concat(F.lit("tail_"), F.col("event_id").cast("string"))
        ).alias("item")
    )


def _heavy_hitters_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.topk_sketch import heavy_hitters

    items = _hh_items(load_table(spark, sf_dir, "events"))
    hh = heavy_hitters(items, "item", _HH_K)
    exact = items.groupBy("item").agg(
        F.count(F.lit(1)).cast("long").alias("exact_n")
    )
    tot = exact.agg(
        F.sum("exact_n").cast("long").alias("n_total")
    )
    true_hh = (
        exact.crossJoin(F.broadcast(tot))
        # exact > N/(k+1), integer-exact via cross-multiplication
        .filter(F.col("exact_n") * (_HH_K + 1) > F.col("n_total"))
    )
    return (
        true_hh.join(hh, "item", "left")
        .select(
            "item",
            "exact_n",
            F.col("est_lo").isNotNull().alias("present"),
            F.coalesce(
                F.col("est_lo") <= F.col("exact_n"), F.lit(False)
            ).alias("est_le_exact"),
            F.coalesce(
                (F.col("exact_n") - F.col("est_lo"))
                <= F.col("err_bound"),
                F.lit(False),
            ).alias("within_bound"),
            # err_bound * (k+1) <= N: the worst-case bound holds
            F.coalesce(
                F.col("err_bound") * (_HH_K + 1) <= F.col("n_total"),
                F.lit(False),
            ).alias("bound_le_worstcase"),
        )
        .orderBy("item")
    )


register(QuerySpec(
    name="heavy_hitters_events",
    spark_fn=_heavy_hitters_events,
    oracle=f"""
        WITH items AS (
            SELECT CASE WHEN event_id % 4 < 3 THEN event_type
                        ELSE 'tail_' || CAST(event_id AS VARCHAR)
                   END AS item
            FROM events
        ), exact AS (
            SELECT item, CAST(COUNT(*) AS BIGINT) AS exact_n
            FROM items GROUP BY 1
        ), tot AS (
            SELECT CAST(SUM(exact_n) AS BIGINT) AS n_total FROM exact
        )
        SELECT item, exact_n,
               TRUE AS present, TRUE AS est_le_exact,
               TRUE AS within_bound, TRUE AS bound_le_worstcase
        FROM exact, tot
        WHERE exact_n * {_HH_K + 1} > n_total
        ORDER BY item
    """,
    covers=("heavy-hitters", "misra-gries", "mergeable-topk-sketch"),
    bench=True,
))


# --- CUSUM change-point localization (round-9) -----------------------------------
#
# The drift monitors (ks_value_drift, source_drift_kl,
# rolling_zscore_anomalies) answer "are these windows different";
# CUSUM answers the on-call question: WHEN did the level shift, and
# has it persisted? The query injects a deterministic +4000-cent
# shift from Jan 21 (both engines add the same integer after the
# cents rounding, so no float crosses the boundary) and attests the
# full alarm trajectory: quiet through the burn-in baseline, rising
# cusum_pos after the shift, alarm latched within days -- the exact
# integer recursion (Spark F.aggregate fold vs DuckDB recursive CTE)
# hashes identically.

_CUSUM_SHIFT_DAY = "2024-01-21"
_CUSUM_BOOST_CENTS = 4000
_CUSUM_SLACK_PPM = 100_000
_CUSUM_BURN_IN = 10


def _cusum_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import cusum_daily

    ev = load_table(spark, sf_dir, "events")
    shifted = ev.select(
        "ts",
        (
            F.round(F.col("value") * 100).cast("long")
            + F.when(
                F.col("ts").cast("date") >= F.lit(_CUSUM_SHIFT_DAY),
                F.lit(_CUSUM_BOOST_CENTS),
            ).otherwise(F.lit(0))
        ).alias("cents"),
    )
    return cusum_daily(
        shifted,
        burn_in_days=_CUSUM_BURN_IN,
        slack_ppm=_CUSUM_SLACK_PPM,
    )


def _cusum_events_oracle() -> str:
    from ..operators.timeseries import cusum_daily_sql

    inner = f"""
        SELECT ts,
               CAST(ROUND(value * 100) AS BIGINT)
               + CASE WHEN CAST(ts AS DATE) >= DATE '{_CUSUM_SHIFT_DAY}'
                      THEN {_CUSUM_BOOST_CENTS} ELSE 0 END AS cents
        FROM events
    """
    return cusum_daily_sql(
        inner,
        burn_in_days=_CUSUM_BURN_IN,
        slack_ppm=_CUSUM_SLACK_PPM,
    )


register(QuerySpec(
    name="cusum_changepoint_events",
    spark_fn=_cusum_events,
    oracle=_cusum_events_oracle,
    covers=("cusum-changepoint", "drift-localization",
            "ordered-integer-fold"),
    bench=True,
))


# --- CUSUM fed by the persistent rollup store (round-9) ---------------------------
#
# The day-2 twin of cusum_changepoint_events: daily batches land
# through the REAL versioned rollup store (incremental_rollup, exact
# scaled-integer sums, batch-id replay ledger), and the monitor reads
# the store -- never re-scanning event grain -- before running the
# same integer CUSUM recursion. The deterministic +4000-cent shift is
# applied to the STORED integer sums (sum_c + 4000*n_rows on
# post-cutoff days), so no rounding happens twice. The oracle is the
# SAME SQL as the batch query: the driver hash attests
# store-incremental == batch bit-for-bit, including the replayed
# batch being folded exactly once.

def _cusum_store_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import shutil
    import tempfile

    from ..operators.rollup_store import incremental_rollup
    from ..operators.timeseries import cusum_from_daily

    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.col("ts").cast("date")
    )
    halves = [
        ev.filter(F.col("day") <= F.lit("2024-01-15")),
        ev.filter(F.col("day") > F.lit("2024-01-15")),
    ]
    tmp = tempfile.mkdtemp(prefix="spark_cusum_store_")
    try:
        store = f"{tmp}/daily"
        for i, batch in enumerate(halves):
            incremental_rollup(
                spark, batch, store, batch_id=f"half{i}",
                key_cols=["day"], value_col="value",
            )
        # replay of the last batch: the ledger must fold it ONCE
        agg = incremental_rollup(
            spark, halves[1], store, batch_id="half1",
            key_cols=["day"], value_col="value",
        )
        daily = agg.select(
            "day",
            F.col("n_rows").alias("n"),
            (
                F.col("sum_c")
                + F.when(
                    F.col("day") >= F.lit(_CUSUM_SHIFT_DAY),
                    F.lit(_CUSUM_BOOST_CENTS) * F.col("n_rows"),
                ).otherwise(F.lit(0))
            ).cast("long").alias("s"),
        )
        return cusum_from_daily(
            daily, burn_in_days=_CUSUM_BURN_IN,
            slack_ppm=_CUSUM_SLACK_PPM,
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# Pristine half-0 rollup store for the bench_fn, keyed by sf_dir --
# same pattern as queries_pipeline._cs_pristine_store (round-9
# verdict item 2): the day-1 store build is fixture cost paid once
# per process; each timed run restores it by filesystem copy.
_CUSUM_BENCH_CACHE: dict[str, str] = {}


def _cusum_pristine_store(spark: SparkSession, sf_dir: str) -> str:
    import atexit
    import shutil
    import tempfile

    from ..operators.rollup_store import incremental_rollup

    if sf_dir not in _CUSUM_BENCH_CACHE:
        tmp = tempfile.mkdtemp(prefix="spark_cusum_bench_")
        atexit.register(shutil.rmtree, tmp, ignore_errors=True)
        ev = load_table(spark, sf_dir, "events").withColumn(
            "day", F.col("ts").cast("date")
        )
        incremental_rollup(
            spark, ev.filter(F.col("day") <= F.lit("2024-01-15")),
            f"{tmp}/daily", batch_id="half0",
            key_cols=["day"], value_col="value",
        )
        _CUSUM_BENCH_CACHE[sf_dir] = f"{tmp}/daily"
    return _CUSUM_BENCH_CACHE[sf_dir]


def _cusum_store_bench(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operator-cost bench form (round-9 verdict item 2): the day-2
    work the store-fed monitor pays daily -- ONE rollup-store merge
    of the new batch + the |days|-grain CUSUM read off the store --
    without the day-1 store build (restored from a per-process
    pristine copy) and without the exactly-once replay leg, which
    stays driver-attested via spark_fn."""
    import shutil
    import tempfile

    from ..operators.rollup_store import incremental_rollup
    from ..operators.timeseries import cusum_from_daily

    pristine = _cusum_pristine_store(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.col("ts").cast("date")
    )
    tmp = tempfile.mkdtemp(prefix="spark_cusum_bench_run_")
    try:
        store = f"{tmp}/daily"
        shutil.copytree(pristine, store)
        agg = incremental_rollup(
            spark, ev.filter(F.col("day") > F.lit("2024-01-15")),
            store, batch_id="half1",
            key_cols=["day"], value_col="value",
        )
        daily = agg.select(
            "day",
            F.col("n_rows").alias("n"),
            (
                F.col("sum_c")
                + F.when(
                    F.col("day") >= F.lit(_CUSUM_SHIFT_DAY),
                    F.lit(_CUSUM_BOOST_CENTS) * F.col("n_rows"),
                ).otherwise(F.lit(0))
            ).cast("long").alias("s"),
        )
        [row] = (
            cusum_from_daily(
                daily, burn_in_days=_CUSUM_BURN_IN,
                slack_ppm=_CUSUM_SLACK_PPM,
            )
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_days"),
                F.sum(F.col("alarm_pos").cast("long"))
                .cast("long").alias("n_alarm_pos"),
                F.sum(F.col("alarm_neg").cast("long"))
                .cast("long").alias("n_alarm_neg"),
            )
            .collect()
        )
        vals = tuple(row)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        [vals], "n_days long, n_alarm_pos long, n_alarm_neg long"
    )


def _cusum_store_plans(
    spark: SparkSession, sf_dir: str
) -> dict[str, DataFrame]:
    """Plan-audit provider: the store-merge shape (partial aggregate
    + full-outer fold into the stored agg) and the store-fed CUSUM."""
    from ..operators.rollup_store import rollup_merge_plan
    from ..operators.timeseries import cusum_from_daily

    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.col("ts").cast("date")
    )
    day1 = ev.filter(F.col("day") <= F.lit("2024-01-15"))
    fake_agg = day1.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum(F.col("value") * 100)).cast("long").alias("sum_c"),
        F.lit(0).cast("long").alias("sum2_c"),
    )
    merge = rollup_merge_plan(
        ev.filter(F.col("day") > F.lit("2024-01-15")),
        fake_agg, key_cols=["day"], value_col="value",
    )
    monitor = cusum_from_daily(
        fake_agg.select(
            "day", F.col("n_rows").alias("n"),
            F.col("sum_c").alias("s"),
        ),
        burn_in_days=_CUSUM_BURN_IN, slack_ppm=_CUSUM_SLACK_PPM,
    )
    return {"store_merge": merge, "monitor": monitor}


register(QuerySpec(
    name="cusum_store_incremental",
    spark_fn=_cusum_store_incremental,
    oracle=_cusum_events_oracle,
    covers=("day2-drift-monitor", "rollup-store-cusum",
            "exactly-once-replay"),
    bench=True,
    # bench times one store merge + the store-fed monitor against a
    # restored pristine store (r9 verdict item 2); the replay ledger
    # and full scenario stay driver-attested via spark_fn
    bench_fn=_cusum_store_bench,
    plan_fn=_cusum_store_plans,
))


# --- isotonic calibration of the classifier (round-9) -----------------------------
#
# score_calibration_bins draws the reliability diagram; this FITS it:
# pool-adjacent-violators over the same bins yields the monotone
# calibrated rate a production scorer actually serves (sklearn's
# IsotonicRegression, re-expressed as an exact-integer in-row fold --
# pool means compared by cross-multiplication, so the merge sequence
# is bit-identical between the Spark aggregate() fold and the DuckDB
# recursive CTE).

def _isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.classify import hashed_linear_score
    from ..operators.evaluate import calibration_bins, isotonic_fit

    docs = load_table(spark, sf_dir, "documents")
    scored = hashed_linear_score(docs).join(
        docs.select(
            F.col("doc_id").alias("id"),
            (F.col("lang") == "en").cast("int").alias("y"),
        ),
        "id",
    )
    bins = calibration_bins(
        scored.select("y", F.col("logit_milli").alias("score")),
        _CAL_LO, _CAL_HI, _CAL_BINS,
    )
    return isotonic_fit(bins, _CAL_BINS).orderBy("pool")


def _isotonic_calibration_oracle() -> str:
    from ..operators.classify import hashed_linear_score_sql
    from ..operators.evaluate import calibration_bins_sql, isotonic_fit_sql

    scored = f"""
        SELECT s.logit_milli AS score,
               CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
        FROM ({hashed_linear_score_sql('documents')}) s
        JOIN documents d ON s.id = d.doc_id
    """
    bins = calibration_bins_sql(scored, _CAL_LO, _CAL_HI, _CAL_BINS)
    return isotonic_fit_sql(bins, _CAL_BINS) + " ORDER BY pool"


register(QuerySpec(
    name="isotonic_calibration",
    spark_fn=_isotonic_calibration,
    oracle=_isotonic_calibration_oracle,
    covers=("isotonic-calibration", "pool-adjacent-violators",
            "monotone-fit"),
))


# --- Z-order layout pruning (round-9) ----------------------------------------------
#
# The layout tier (morton_key / write_zordered / file_span_stats) was
# pytest-only; this puts data-skipping on the driver-attested
# surface, fully in-engine and integer-exact: rows map to grid cells
# via cross-multiplied integer division (no doubles, no rounding),
# the Morton key interleaves grid bits with plain shift/and/or, and
# "files" are fixed-width KEY ranges (a pure projection -- the
# attestation arm needs no global sort; the write path's
# repartitionByRange is the scale twin). Per layout (z-order vs
# linear-on-partkey) and per probe (a partkey-only box, a
# suppkey-only box, and their 2-d intersection), the query reports
# how many files a min/max-pruning reader must touch. The expected
# physics falls out of the numbers: the linear layout prunes the
# partkey probe perfectly and the suppkey probe not at all; z-order
# prunes BOTH partially -- the whole reason lakehouses Z-order.

_ZO_BITS = 8
_ZO_FILES = 16


def _zorder_layout_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.layout import interleave_bits_expr, morton_grid_expr

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").cast("long").alias("p"),
        F.col("l_suppkey").cast("long").alias("s"),
    )
    b = li.agg(
        F.min("p").alias("plo"), F.max("p").alias("phi"),
        F.min("s").alias("slo"), F.max("s").alias("shi"),
    )
    rows = li.crossJoin(F.broadcast(b))
    gp = morton_grid_expr("p", "plo", "phi", _ZO_BITS, div="div")
    gs = morton_grid_expr("s", "slo", "shi", _ZO_BITS, div="div")
    zkey = interleave_bits_expr(["gp", "gs"], _ZO_BITS)
    max_z = (1 << (2 * _ZO_BITS)) - 1
    keyed = rows.selectExpr(
        "p", "s", "plo", "phi", "slo", "shi",
        f"{gp} AS gp", f"{gs} AS gs",
    ).selectExpr(
        "p", "s", "plo", "phi", "slo", "shi",
        f"CAST({zkey} * {_ZO_FILES} div {max_z + 1} AS BIGINT)"
        " AS file_z",
        f"CAST(gp * {_ZO_FILES} div {(1 << _ZO_BITS)} AS BIGINT)"
        " AS file_linear",
    )
    # probe boxes at fixed fractions of each range (integer-exact)
    probes = (
        "p_box", "plo + (phi - plo) * 2 div 5",
        "plo + (phi - plo) * 9 div 20",
        "s_box", "slo + (shi - slo) * 2 div 5",
        "slo + (shi - slo) * 9 div 20",
    )
    out = None
    for layout in ("z", "linear"):
        per_file = (
            keyed.groupBy(F.col(f"file_{layout}").alias("file"))
            .agg(
                F.min("p").alias("pmin"), F.max("p").alias("pmax"),
                F.min("s").alias("smin"), F.max("s").alias("smax"),
                F.first("plo").alias("plo"), F.first("phi").alias("phi"),
                F.first("slo").alias("slo"), F.first("shi").alias("shi"),
            )
            .selectExpr(
                "file", "pmin", "pmax", "smin", "smax",
                f"{probes[1]} AS pb_lo", f"{probes[2]} AS pb_hi",
                f"{probes[4]} AS sb_lo", f"{probes[5]} AS sb_hi",
            )
        )
        summary = per_file.agg(
            F.lit(layout).alias("layout"),
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum(
                ((F.col("pmin") <= F.col("pb_hi"))
                 & (F.col("pmax") >= F.col("pb_lo"))).cast("long")
            ).alias("part_probe_files"),
            F.sum(
                ((F.col("smin") <= F.col("sb_hi"))
                 & (F.col("smax") >= F.col("sb_lo"))).cast("long")
            ).alias("supp_probe_files"),
            F.sum(
                ((F.col("pmin") <= F.col("pb_hi"))
                 & (F.col("pmax") >= F.col("pb_lo"))
                 & (F.col("smin") <= F.col("sb_hi"))
                 & (F.col("smax") >= F.col("sb_lo"))).cast("long")
            ).alias("box_probe_files"),
        )
        out = summary if out is None else out.unionByName(summary)
    return out.orderBy("layout")


def _zorder_layout_pruning_oracle() -> str:
    from ..operators.layout import interleave_bits_expr, morton_grid_expr

    gp = morton_grid_expr("p", "plo", "phi", _ZO_BITS, div="//")
    gs = morton_grid_expr("s", "slo", "shi", _ZO_BITS, div="//")
    zkey = interleave_bits_expr(["gp", "gs"], _ZO_BITS, shift="op")
    max_z = (1 << (2 * _ZO_BITS)) - 1
    parts = []
    for layout, file_expr in (
        ("z", f"CAST({zkey} * {_ZO_FILES} // {max_z + 1} AS BIGINT)"),
        ("linear",
         f"CAST(gp * {_ZO_FILES} // {1 << _ZO_BITS} AS BIGINT)"),
    ):
        parts.append(f"""
            SELECT '{layout}' AS layout,
                   CAST(COUNT(*) AS BIGINT) AS n_files,
                   CAST(SUM(CASE WHEN pmin <= pb_hi AND pmax >= pb_lo
                            THEN 1 ELSE 0 END) AS BIGINT)
                       AS part_probe_files,
                   CAST(SUM(CASE WHEN smin <= sb_hi AND smax >= sb_lo
                            THEN 1 ELSE 0 END) AS BIGINT)
                       AS supp_probe_files,
                   CAST(SUM(CASE WHEN pmin <= pb_hi AND pmax >= pb_lo
                             AND smin <= sb_hi AND smax >= sb_lo
                            THEN 1 ELSE 0 END) AS BIGINT)
                       AS box_probe_files
            FROM (
                SELECT {file_expr} AS file,
                       MIN(p) AS pmin, MAX(p) AS pmax,
                       MIN(s) AS smin, MAX(s) AS smax,
                       MIN(plo + (phi - plo) * 2 // 5) AS pb_lo,
                       MIN(plo + (phi - plo) * 9 // 20) AS pb_hi,
                       MIN(slo + (shi - slo) * 2 // 5) AS sb_lo,
                       MIN(slo + (shi - slo) * 9 // 20) AS sb_hi
                FROM keyed GROUP BY 1
            )""")
    union = " UNION ALL ".join(parts)
    return f"""
        WITH base AS (
            SELECT CAST(l_partkey AS BIGINT) AS p,
                   CAST(l_suppkey AS BIGINT) AS s
            FROM lineitem
        ), bounds AS (
            SELECT MIN(p) AS plo, MAX(p) AS phi,
                   MIN(s) AS slo, MAX(s) AS shi
            FROM base
        ), keyed AS (
            SELECT p, s, plo, phi, slo, shi, {gp} AS gp, {gs} AS gs
            FROM base CROSS JOIN bounds
        )
        {union}
        ORDER BY layout
    """


register(QuerySpec(
    name="zorder_layout_pruning",
    spark_fn=_zorder_layout_pruning,
    oracle=_zorder_layout_pruning_oracle,
    covers=("zorder-clustering", "data-skipping", "min-max-pruning"),
))


# --- split-conformal calibration of event values (round-10) -----------------------
#
# The eval tier's distribution-free guarantee: calibrate the
# 90%-coverage one-sided threshold for event value cents on a
# deterministic md5 half-split, then attest the held-out coverage.
# The threshold is an exact order statistic (ceil((n+1)(1-alpha))-th
# smallest calibration score, (score, id) tiebreak), not a quantile
# estimate -- operators/evaluate.py conformal_threshold.

def _conformal_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.evaluate import conformal_threshold

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return conformal_threshold(ev, "cents", "event_id")


def _conformal_events_oracle() -> str:
    from ..operators.evaluate import conformal_threshold_sql

    return conformal_threshold_sql(
        "SELECT event_id, CAST(ROUND(value * 100) AS BIGINT) AS cents"
        " FROM events",
        "cents", "event_id",
    )


register(QuerySpec(
    name="conformal_coverage_events",
    spark_fn=_conformal_events,
    oracle=_conformal_events_oracle,
    covers=("split-conformal", "coverage-guarantee",
            "exact-order-statistic"),
))


# --- multi-touch time-decay attribution (round-10) ---------------------------------
#
# attribution_last_touch credits the single latest touch; this is the
# multi-touch complement: every in-window touch earns 2^-age_days
# credit, split exactly in integer ppm (operators/funnel.py
# time_decay_attribution). The engine runs |lookback_days| RANGE
# frames over ONE user-partitioned sort; the oracle deliberately runs
# the touches x conversions pair join the window shape avoids.

def _attribution_time_decay(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.funnel import time_decay_attribution

    ev = load_table(spark, sf_dir, "events")
    return time_decay_attribution(ev)


def _attribution_time_decay_oracle() -> str:
    from ..operators.funnel import time_decay_attribution_sql

    return time_decay_attribution_sql("events")


register(QuerySpec(
    name="attribution_time_decay",
    spark_fn=_attribution_time_decay,
    oracle=_attribution_time_decay_oracle,
    covers=("time-decay-attribution", "multi-touch-credit",
            "window-not-join"),
))


# --- Murphy decomposition + gains table (round-10, extended tier) ------------------
#
# score_calibration_bins draws the reliability diagram and
# isotonic_calibration fits it; brier_decomposition SUMMARIZES it
# (REL / RES / UNC in exact ppm^2), and decile_lift is the
# business-facing gains table over the same scored frame. Both run
# on the deterministic cents-vs-purchase fixture the classifier eval
# tier uses.

_BRIER_INNER_SQL = (
    "SELECT event_id, CAST(ROUND(value * 100) AS BIGINT) AS score,"
    " CAST(event_type = 'purchase' AS BIGINT) AS y FROM events"
)


def _brier_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("score"),
        (F.col("event_type") == "purchase").cast("long").alias("y"),
    )


def _brier_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.evaluate import brier_decomposition

    return brier_decomposition(_brier_scored(spark, sf_dir), 0, 10000)


def _brier_events_oracle() -> str:
    from ..operators.evaluate import brier_decomposition_sql

    return brier_decomposition_sql(_BRIER_INNER_SQL, 0, 10000)


register(QuerySpec(
    name="brier_decomposition_events",
    spark_fn=_brier_events,
    oracle=_brier_events_oracle,
    covers=("brier-murphy-decomposition", "reliability-resolution",
            "calibration-summary"),
    extended=True,  # r11 rotation candidate
))


def _decile_lift_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.evaluate import decile_lift

    return decile_lift(_brier_scored(spark, sf_dir), id_col="event_id")


def _decile_lift_oracle() -> str:
    from ..operators.evaluate import decile_lift_sql

    return decile_lift_sql(_BRIER_INNER_SQL, id_col="event_id")


register(QuerySpec(
    name="decile_lift_events",
    spark_fn=_decile_lift_events,
    oracle=_decile_lift_oracle,
    covers=("gains-table", "decile-lift", "deterministic-ntile"),
    extended=True,  # r11 rotation candidate
))


# --- per-key OLS trend slope (round-10, extended tier) -----------------------------

def _trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import trend_slope_by_key

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "ts",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return trend_slope_by_key(ev, "event_type")


def _trend_slope_oracle() -> str:
    from ..operators.timeseries import trend_slope_by_key_sql

    return trend_slope_by_key_sql(
        "SELECT event_type, ts,"
        " CAST(ROUND(value * 100) AS BIGINT) AS cents FROM events",
        "event_type",
    )


register(QuerySpec(
    name="trend_slope_by_type",
    spark_fn=_trend_slope,
    oracle=_trend_slope_oracle,
    covers=("ols-trend-slope", "exact-cross-moments",
            "drift-rate"),
    extended=True,  # r11 rotation candidate
))


# --- AR(1) persistence coefficient (round-11) ---------------------------------------
#
# The momentum dial completing the drift-monitoring family: CUSUM
# localizes WHEN a series shifted, trend_slope_by_type says how fast
# it drifts, phi says how strongly today echoes yesterday
# (operators/timeseries.py ar1_by_key -- lag-1 OLS over consecutive
# daily totals, exact BIGINT moments, dual fail-loud overflow guards).

def _ar1_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import ar1_by_key

    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "ts",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return ar1_by_key(ev, "event_type").orderBy("event_type")


def _ar1_by_type_oracle() -> str:
    from ..operators.timeseries import ar1_by_key_sql

    inner = ar1_by_key_sql(
        "SELECT event_type, ts,"
        " CAST(ROUND(value * 100) AS BIGINT) AS cents FROM events",
        "event_type",
    )
    return f"SELECT * FROM ({inner}) ORDER BY event_type"


register(QuerySpec(
    name="ar1_persistence_by_type",
    spark_fn=_ar1_by_type,
    oracle=_ar1_by_type_oracle,
    covers=("ar1-persistence", "lag-regression",
            "drift-monitoring"),
))


# --- image PERCEPTUAL near-dup: invariance contract (round-11) ----------------------
#
# image_near_dup_contract attests Hamming-0 clones of byte-identical
# BMPs; this round-10-verdict item closes the gap for RE-ENCODED and
# RESIZED clones. Each doc renders its md5 pattern (doc_id % _PH_P)
# through one of three PROVABLY dHash-invariant transforms chosen by
# (doc_id div _PH_P) % 3:
#
#   0: 18x16 bottom-up BMP (the base encoding);
#   1: +24 brightness, top-down row order -- the integer grayscale
#      (299r+587g+114b) div 1000 shifts by exactly 24 (no clamp:
#      base pixels live in [32, 215]), every strict thumbnail
#      gradient comparison is translation-invariant, and the decoder
#      normalizes row order;
#   2: 2x nearest-neighbor upscale to 36x32 -- with base dims
#      divisible by (grid, grid+1) = (8, 9), every thumbnail block
#      boundary i*dim div cells doubles exactly, so each block is a
#      pure 2x2 replication with an identical mean.
#
# So all clones of a pattern share ONE dHash (Hamming 0) while their
# payload BYTES differ across transforms -- a perceptual guarantee,
# not a byte-identity one. Distinct md5 patterns measure >= 15 bits
# apart (deterministic, fixed forever -- the image_near_dup_contract
# precedent), so max_hamming=8 pins zero false pairs.

_PH_P = 300  # docs sharing doc_id % _PH_P are perceptual clones


def _image_phash_invariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import image_dhash, image_near_dup_pairs

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    import pandas as pd
    from pyspark.sql import types as T_

    def _payloads(batches):
        import hashlib
        import struct

        import numpy as np

        W0, H0 = 18, 16

        def base_pixels(pid: int) -> "np.ndarray":
            px = np.zeros((H0, W0, 3), dtype=np.uint8)
            for y in range(H0):
                row = bytearray()
                for x0 in range(0, W0, 5):
                    row += hashlib.md5(
                        f"phash-{pid}-{y}-{x0}".encode()
                    ).digest()[:15]
                arr = np.frombuffer(
                    bytes(row[: 3 * W0]), dtype=np.uint8
                ).reshape(W0, 3)
                px[y] = 32 + (arr % 184)  # clamp-free brightness room
            return px

        def encode(px, topdown=False, bright=0):
            h, w, _ = px.shape
            px = (px.astype(np.int64) + bright).astype(np.uint8)
            stride = ((3 * w + 3) // 4) * 4
            rows = px if topdown else px[::-1]
            body = bytearray()
            for y in range(h):
                rb = rows[y].tobytes()
                body += rb + b"\x00" * (stride - len(rb))
            return (
                b"BM"
                + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
                + struct.pack(
                    "<IiiHHIIiiII", 40, w, -h if topdown else h, 1,
                    24, 0, len(body), 2835, 2835, 0, 0,
                )
                + bytes(body)
            )

        def bmp(pid: int, t: int) -> bytes:
            px = base_pixels(pid)
            if t == 1:
                return encode(px, topdown=True, bright=24)
            if t == 2:
                return encode(np.repeat(np.repeat(px, 2, 0), 2, 1))
            return encode(px)

        cache: dict[tuple[int, int], bytes] = {}
        for pdf in batches:
            keys = [
                (int(d) % _PH_P, (int(d) // _PH_P) % 3)
                for d in pdf["doc_id"]
            ]
            for kk in keys:
                if kk not in cache:
                    cache[kk] = bmp(*kk)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "payload": [bytearray(cache[kk]) for kk in keys],
            })

    payloads = docs.mapInPandas(
        _payloads,
        T_.StructType([
            T_.StructField("doc_id", T_.LongType()),
            T_.StructField("payload", T_.BinaryType()),
        ]),
    )
    pairs = image_near_dup_pairs(
        image_dhash(payloads), max_hamming=8
    )
    clone = (
        F.col("id_a") % _PH_P == F.col("id_b") % _PH_P
    ).cast("long")
    cross = (
        clone.cast("boolean")
        & (F.expr(f"(id_a DIV {_PH_P}) % 3")
           != F.expr(f"(id_b DIV {_PH_P}) % 3"))
    ).cast("long")
    found = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_found_pairs"),
        F.coalesce(F.sum(clone), F.lit(0)).cast("long")
        .alias("n_clone_found"),
        F.coalesce(F.sum(cross), F.lit(0)).cast("long")
        .alias("n_cross_found"),
    )
    gv = load_table(spark, sf_dir, "documents").select(
        (F.col("doc_id") % _PH_P).alias("pid"),
        F.expr(f"(doc_id DIV {_PH_P}) % 3").alias("t"),
    ).groupBy("pid", "t").agg(F.count(F.lit(1)).alias("ct"))
    base = gv.groupBy("pid").agg(
        F.sum("ct").alias("c"),
        F.sum(F.expr("ct * (ct - 1) div 2")).alias("same_var"),
    ).agg(
        F.sum("c").cast("long").alias("n_images"),
        F.count(F.lit(1)).cast("long").alias("n_patterns"),
        F.sum(F.expr("c * (c - 1) div 2")).cast("long")
        .alias("n_clone_pairs"),
        (F.sum(F.expr("c * (c - 1) div 2")) - F.sum("same_var"))
        .cast("long").alias("n_cross_variant_pairs"),
    )
    return base.crossJoin(F.broadcast(found)).select(
        "n_images", "n_patterns", "n_clone_pairs",
        "n_cross_variant_pairs",
        "n_found_pairs", "n_clone_found", "n_cross_found",
        (F.col("n_clone_found") == F.col("n_clone_pairs")).cast("int")
        .alias("all_clones_found"),
        (F.col("n_found_pairs") == F.col("n_clone_found")).cast("int")
        .alias("no_false_pairs"),
        (
            (F.col("n_cross_found") == F.col("n_cross_variant_pairs"))
            & (F.col("n_cross_variant_pairs") > 0)
        ).cast("int").alias("cross_variant_found"),
    )


register(QuerySpec(
    name="image_phash_near_dup",
    spark_fn=_image_phash_invariance,
    oracle=f"""
        WITH v AS (
            SELECT doc_id % {_PH_P} AS pid,
                   (doc_id // {_PH_P}) % 3 AS t
            FROM documents
        ),
        gv AS (
            SELECT pid, t, COUNT(*) AS ct FROM v GROUP BY 1, 2
        ),
        g AS (
            SELECT pid, CAST(SUM(ct) AS BIGINT) AS c,
                   CAST(SUM(ct * (ct - 1) // 2) AS BIGINT) AS same_var
            FROM gv GROUP BY pid
        ),
        base AS (
            SELECT CAST(SUM(c) AS BIGINT) AS n_images,
                   COUNT(*) AS n_patterns,
                   CAST(SUM(c * (c - 1) // 2) AS BIGINT)
                       AS n_clone_pairs,
                   CAST(SUM(c * (c - 1) // 2) - SUM(same_var)
                        AS BIGINT) AS n_cross_variant_pairs
            FROM g
        )
        SELECT n_images, n_patterns, n_clone_pairs,
               n_cross_variant_pairs,
               n_clone_pairs AS n_found_pairs,
               n_clone_pairs AS n_clone_found,
               n_cross_variant_pairs AS n_cross_found,
               1 AS all_clones_found,
               1 AS no_false_pairs,
               CAST(n_cross_variant_pairs > 0 AS INTEGER)
                   AS cross_variant_found
        FROM base
    """,
    covers=("image-perceptual-near-dup", "phash-invariance",
            "multimodal-dedup-contract"),
    scale_path="image_near_dup_contract",
))


# --- day-of-week seasonality (round-12) ----------------------------------------

def _weekday_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import weekday_seasonality

    ev = load_table(spark, sf_dir, "events")
    return weekday_seasonality(ev)


def _weekday_seasonality_oracle() -> str:
    from ..operators.timeseries import weekday_seasonality_sql

    return weekday_seasonality_sql("events")


register(QuerySpec(
    name="weekday_seasonality_events",
    spark_fn=_weekday_seasonality,
    oracle=_weekday_seasonality_oracle,
    covers=("dow-seasonality-baseline", "traffic-anomaly-baseline",
            "exact-micros-rollup"),
))


# --- Benford first-digit audit (round-12) --------------------------------------
#
# Forensic data-quality screen on the money column: leading-digit
# distribution vs Benford's law in exact ppm (pinned expected
# literals, fixed-point FLOOR snap -- operators/profile.py
# benford_digit_audit). Fabricated or unit-mangled feeds bend this
# curve before any range check fires.

def _benford_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import benford_digit_audit

    orders = load_table(spark, sf_dir, "orders")
    return benford_digit_audit(orders, "o_totalprice")


def _benford_orders_oracle() -> str:
    from ..operators.profile import benford_digit_audit_sql

    return benford_digit_audit_sql("orders", "o_totalprice")


register(QuerySpec(
    name="benford_digit_audit",
    spark_fn=_benford_orders,
    oracle=_benford_orders_oracle,
    covers=("benford-first-digit", "forensic-data-quality",
            "anomaly-screen"),
))
