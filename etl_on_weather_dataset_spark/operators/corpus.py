"""Corpus-level training-data operators: benchmark decontamination,
sequence packing, intra-document repetition stats.

These are the remaining standard steps of a pretraining-data pipeline
(north-star par.2b) not covered by dedup/quality/sampling:

- decontamination: drop/flag training docs that share an n-gram with an
  evaluation benchmark, so the model is not graded on memorized data.
  The industry shape (e.g. GPT-3 appendix C, PaLM, Llama) is exact
  n-gram collision against the benchmark's shingle set.
- sequence packing: concatenate-and-cut chunk streams into fixed
  token-capacity bins (what trainers feed as packed sequences). Packing
  is order-dependent, so determinism comes from an explicit total
  order; scale comes from packing per SHARD (hash of doc id), which is
  also how real pipelines shard their tokenized output.
- repetition stats: Gopher-style intra-doc duplicate n-gram fractions
  (a high duplicate-3-gram share marks boilerplate/spam).

All pure DataFrame expressions with exact DuckDB twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import word_shingles
from .text import tokens

PPM = 1_000_000


# --- intra-document repetition (Gopher repetition filters) --------------------

def _all_shingles(text_col: str, n: int) -> F.Column:
    """n-word shingles WITH multiplicity (word_shingles deduplicates;
    repetition measurement needs the raw count)."""
    toks = tokens(text_col)
    starts = F.sequence(F.lit(0), F.size(toks) - n)
    return F.when(
        F.size(toks) >= n,
        F.transform(
            starts,
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        ),
    ).otherwise(F.array(F.array_join(toks, " ")))


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ns: tuple[int, ...] = (2, 3),
    flag_n: int = 3,
    flag_threshold: float = 0.3,
) -> DataFrame:
    """Per-doc duplicate n-gram fractions (1 - distinct/total) for each
    n in ``ns``, plus a boilerplate flag when the ``flag_n`` fraction
    exceeds ``flag_threshold`` -- the Gopher-style repetition gate.

    Pure per-row array expressions: zero shuffle, embarrassingly
    parallel, which is the only acceptable shape for a per-doc quality
    signal at corpus scale.
    """
    cols = [F.col(id_col).alias("id")]
    for n in ns:
        sh = _all_shingles(text_col, n)
        total = F.size(sh)
        distinct = F.size(F.array_distinct(sh))
        frac = F.when(
            total > 0,
            F.round(1.0 - distinct.cast("double") / total, 6),
        ).otherwise(F.lit(0.0))
        cols.append(total.alias(f"n_shingles_{n}"))
        cols.append(frac.alias(f"dup_frac_{n}"))
    out = df.select(*cols)
    return out.withColumn(
        "repetitious",
        (F.col(f"dup_frac_{flag_n}") > flag_threshold).cast("int"),
    )


def repetition_stats_sql(
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    ns: tuple[int, ...] = (2, 3),
    flag_n: int = 3,
    flag_threshold: float = 0.3,
) -> str:
    """DuckDB twin (identical shingling and fraction arithmetic)."""
    per_n = []
    for n in ns:
        sh = f"""CASE WHEN len(t) >= {n} THEN
                list_transform(range(1, len(t) - {n} + 2),
                               i -> array_to_string(t[i:i+{n}-1], ' '))
            ELSE [array_to_string(t, ' ')] END"""
        per_n.append(
            f"CAST(len({sh}) AS INTEGER) AS n_shingles_{n},\n"
            f"               CASE WHEN len({sh}) > 0 THEN\n"
            f"                   ROUND(1.0 - CAST(len(list_distinct({sh}))"
            f" AS DOUBLE) / len({sh}), 6)\n"
            f"               ELSE 0.0 END AS dup_frac_{n}"
        )
    body = ",\n               ".join(per_n)
    return f"""
        SELECT id,
               {body},
               CAST(dup_frac_{flag_n} > {flag_threshold} AS INTEGER)
                   AS repetitious
        FROM (SELECT {id_col} AS id,
                     regexp_split_to_array({text_col}, ' +') AS t
              FROM {table})
    """


# --- unigram log-probability quality score ------------------------------------

def unigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc average unigram log-probability under the corpus's own
    unigram model -- the classic cheap fluency/outlier signal (very
    negative = rare-token soup; LM-based filters are this with a
    smarter model).

    Exactness discipline: log-probs are doubles and float summation is
    order-dependent, so a parallel engine could never match a
    sequential oracle bit-for-bit. Each token's log-prob is therefore
    SCALED TO MICRO-NATS AND ROUNDED TO A LONG before summing (the
    repo's exact-aggregation pattern, functions/exact.py) -- the
    per-doc sum is then partition/retry/engine-invariant.

    Plan: one explode -> token-frequency aggregate (shuffle on token,
    map-side combine) -> broadcast total -> join tokens to
    frequencies -> per-doc sum. The frequency table is vocabulary-
    sized, far smaller than the corpus.
    """
    from .caching import persisted

    # both the frequency aggregate and the score join scan the token
    # explode -- persist it so the corpus is tokenized once per action
    toks = persisted(df.select(
        F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("token")
    ))
    freqs = toks.groupBy("token").agg(F.count(F.lit(1)).alias("tok_n"))
    total = freqs.agg(F.sum("tok_n").cast("double").alias("total_n"))
    scored = (
        toks.join(freqs, "token")
        .crossJoin(F.broadcast(total))
        .select(
            "id",
            F.round(
                F.log(F.col("tok_n") / F.col("total_n")) * 1e6
            ).cast("long").alias("lp_micro"),
        )
    )
    return scored.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        (
            F.round(F.sum("lp_micro") / F.count(F.lit(1)))
            .cast("long")
        ).alias("avg_logprob_micro"),
    )


def unigram_logprob_sql(
    table: str, text_col: str = "text", id_col: str = "doc_id"
) -> str:
    """DuckDB twin (same micro-nat rounding before the sum)."""
    return f"""
        WITH toks AS (
            SELECT {id_col} AS id,
                   unnest(regexp_split_to_array({text_col}, ' +')) AS token
            FROM {table}
        ), freqs AS (
            SELECT token, COUNT(*) AS tok_n FROM toks GROUP BY token
        ), total AS (
            SELECT CAST(SUM(tok_n) AS DOUBLE) AS total_n FROM freqs
        )
        SELECT id,
               COUNT(*) AS n_tokens,
               CAST(ROUND(SUM(CAST(ROUND(
                   ln(tok_n / (SELECT total_n FROM total)) * 1000000)
                   AS BIGINT)) * 1.0 / COUNT(*)) AS BIGINT)
                   AS avg_logprob_micro
        FROM toks JOIN freqs USING (token)
        GROUP BY id
    """


# --- benchmark decontamination ------------------------------------------------

def contamination_flags(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """Per training doc: how many distinct n-gram shingles it shares
    with the benchmark corpus, and a contaminated flag (>= 1 hit).

    Plan: shingle both sides -> distinct benchmark shingle set ->
    inner join on shingle -> count hits per doc -> left join back so
    clean docs keep a 0. The benchmark side of the join is typically
    tiny relative to the corpus (eval sets are thousands of docs, the
    corpus billions), so the hit join broadcasts; the training side
    streams through map-side. Returns every input doc:
    (id, n_overlap_shingles, contaminated).
    """
    doc_sh = docs.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(text_col, n)).alias("shingle"),
    )
    bench_sh = (
        benchmark.select(
            F.explode(word_shingles(text_col, n)).alias("shingle")
        )
        .distinct()
    )
    hits = (
        doc_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_overlap_shingles"))
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(hits, "id", "left")
        .select(
            "id",
            F.coalesce("n_overlap_shingles", F.lit(0)).alias(
                "n_overlap_shingles"
            ),
            (F.coalesce("n_overlap_shingles", F.lit(0)) > 0)
            .cast("int")
            .alias("contaminated"),
        )
    )


def contamination_flags_sql(
    table: str,
    benchmark_predicate: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> str:
    """DuckDB twin; the benchmark is ``table`` rows satisfying
    ``benchmark_predicate`` (the driver tables carry no separate
    benchmark table, so queries derive one deterministically)."""
    shingles = f"""
            SELECT {id_col} AS id,
                   unnest(CASE WHEN len(t) >= {n} THEN
                       list_distinct(list_transform(
                           range(1, len(t) - {n} + 2),
                           i -> array_to_string(t[i:i+{n}-1], ' ')))
                   ELSE [array_to_string(t, ' ')] END) AS shingle
            FROM (SELECT {id_col},
                         regexp_split_to_array({text_col}, ' +') AS t
                  FROM {table})"""
    return f"""
        WITH doc_sh AS ({shingles}),
        bench_sh AS (
            SELECT DISTINCT shingle FROM doc_sh
            WHERE id IN (SELECT {id_col} FROM {table}
                         WHERE {benchmark_predicate})
        ),
        hits AS (
            SELECT id, COUNT(*) AS n_overlap_shingles
            FROM doc_sh JOIN bench_sh USING (shingle)
            GROUP BY id
        )
        SELECT d.{id_col} AS id,
               COALESCE(h.n_overlap_shingles, 0) AS n_overlap_shingles,
               CAST(COALESCE(h.n_overlap_shingles, 0) > 0 AS INTEGER)
                   AS contaminated
        FROM {table} d LEFT JOIN hits h ON d.{id_col} = h.id
    """


# --- sequence packing ---------------------------------------------------------

def pack_sequences(
    chunks: DataFrame,
    capacity: int,
    n_shards: int = 16,
    id_col: str = "doc_id",
    chunk_col: str = "chunk_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Assign every chunk to a fixed-capacity training bin:
    concatenate-and-cut packing (bin = cumulative tokens before this
    chunk, integer-divided by capacity) within deterministic shards.

    Order inside a shard is (doc_id, chunk_id) -- explicit and total,
    so the packing is retry/partitioning/engine-invariant. The shard is
    the repo's engine-portable md5 bucket (operators/sample.py), so the
    DuckDB twin reproduces the exact same assignment. Sharding keeps
    the cumulative-sum window PARALLEL: a single global ordering would
    serialize 100 TB of chunks through one task, while per-shard
    packing is exactly how tokenized corpora are written out in
    practice (one packed stream per output shard). Wasted tail
    capacity is one partial bin per shard, negligible for
    n_shards << n_bins; raise n_shards with cluster size.

    Returns (shard, bin_id, id, chunk_id, n_tokens, offset_in_bin)
    where offset_in_bin is the chunk's token start offset inside its
    bin (the concat-and-cut view may split a chunk across bins;
    offset_in_bin locates its first token).
    """
    from .sample import hash_bucket

    shard = hash_bucket(F.col(id_col), buckets=n_shards, salt="pack")
    w = (
        Window.partitionBy("shard")
        .orderBy("id", "chunk_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_shard = chunks.select(
        shard.alias("shard"),
        F.col(id_col).alias("id"),
        F.col(chunk_col).alias("chunk_id"),
        F.col(tokens_col).alias("n_tokens"),
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return with_shard.select(
        "shard",
        F.floor(cum_before / capacity).cast("long").alias("bin_id"),
        "id",
        "chunk_id",
        "n_tokens",
        F.pmod(cum_before, F.lit(capacity)).cast("long").alias(
            "offset_in_bin"
        ),
    )


def pack_sequences_sql(
    chunks_sql: str,
    capacity: int,
    n_shards: int = 16,
    id_col: str = "doc_id",
    chunk_col: str = "chunk_id",
    tokens_col: str = "n_tokens",
) -> str:
    """DuckDB twin over a chunks subquery carrying the same columns."""
    from .sample import hash_bucket_sql

    shard = hash_bucket_sql(id_col, buckets=n_shards, salt="pack")
    return f"""
        WITH chunks AS ({chunks_sql}),
        sharded AS (
            SELECT CAST({shard} AS BIGINT) AS shard,
                   {id_col} AS id, {chunk_col} AS chunk_id,
                   {tokens_col} AS n_tokens
            FROM chunks
        ),
        cum AS (
            SELECT shard, id, chunk_id, n_tokens,
                   COALESCE(SUM(n_tokens) OVER (
                       PARTITION BY shard ORDER BY id, chunk_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS cum_before
            FROM sharded
        )
        SELECT shard,
               CAST(floor(cum_before / {capacity}) AS BIGINT) AS bin_id,
               id, chunk_id, n_tokens,
               CAST(cum_before % {capacity} AS BIGINT) AS offset_in_bin
        FROM cum
    """


# --- boilerplate line removal (CCNet / RefinedWeb-style) ----------------------

def remove_boilerplate_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
    sep: str = "\n",
    hash_keys: bool = False,
    broadcast_common: bool = True,
) -> DataFrame:
    """Strip lines that repeat across >= ``min_docs`` distinct
    documents -- the CCNet/RefinedWeb boilerplate pass (nav bars,
    cookie banners, license headers repeat verbatim across a site's
    pages; body text does not).

    Semantics: a line is boilerplate iff its exact text occurs in at
    least ``min_docs`` distinct documents; every occurrence is removed
    (including from the doc that "legitimately" wrote it first --
    matching CCNet, which drops all copies). Surviving lines keep
    their original relative order. Docs whose every line is removed
    stay in the output with empty ``clean_text``.

    Plan shape (the 100 TB argument):
      1. posexplode lines, groupBy the line text with a distinct-doc
         count -- one shuffle, two-phase partial aggregation.
      2. The boilerplate set (lines above the threshold) is applied
         as a broadcast left_anti join, so the corpus is never
         shuffled to be cleaned. In practice the set is the number of
         distinct TEMPLATES (nav bars, banners) -- small. But its
         only hard bound is corpus_lines / min_docs, so on a
         duplicate-heavy corpus at a low min_docs the forced
         broadcast can exceed driver memory: pass
         ``broadcast_common=False`` there to let the optimizer pick
         the join side (AQE still broadcasts at runtime when the set
         turns out small).
      3. Per-doc rebuild sorts each doc's surviving lines by position
         inside a struct array -- per-row work after a groupBy on the
         doc id.
    At petabyte scale you would key step 1 on xxhash64(line) and drop
    the line text before the shuffle; the attested path groups on the
    line text itself so the DuckDB twin is exact (no collision
    caveat). ``hash_keys=True`` in pytest exercises the hashed
    variant and asserts it agrees.

    Returns (id, n_lines, n_lines_removed, clean_text).
    """
    import re as _re

    sep_re = _re.escape(sep)
    lines = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), sep_re, -1)).alias(
            "pos", "line"
        ),
    )
    # At scale, shuffle a fixed-width 64-bit hash instead of the line
    # text (collision odds ~n_lines^2 / 2^65 -- negligible, documented).
    line_key = F.xxhash64("line") if hash_keys else F.col("line")
    common = (
        lines.groupBy(line_key.alias("lk"))
        .agg(F.count_distinct("id").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("lk")
    )
    if broadcast_common:
        common = F.broadcast(common)
    kept = lines.join(common, line_key == F.col("lk"), "left_anti")
    rebuilt = kept.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            sep,
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    base = df.select(
        F.col(id_col).alias("id"),
        F.size(F.split(F.col(text_col), sep_re, -1))
        .cast("long")
        .alias("n_lines"),
    )
    return base.join(rebuilt, "id", "left").select(
        "id",
        "n_lines",
        (F.col("n_lines") - F.coalesce(F.col("n_kept"), F.lit(0)))
        .cast("long")
        .alias("n_lines_removed"),
        F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
    )


def remove_boilerplate_lines_sql(
    docs_sql: str,
    min_docs: int = 2,
    sep_sql: str = "chr(10)",
) -> str:
    """DuckDB twin over a (id, txt) subquery. DuckDB's lambda index is
    1-based vs posexplode's 0 -- harmless, pos only orders the rebuild
    and is dropped."""
    return f"""
        WITH docs AS ({docs_sql}),
        lines AS (
            SELECT id, unnest(list_transform(
                string_split(txt, {sep_sql}),
                (x, i) -> struct_pack(pos := i, line := x)),
                recursive := true)
            FROM docs
        ),
        common AS (
            SELECT line FROM lines
            GROUP BY line HAVING COUNT(DISTINCT id) >= {min_docs}
        ),
        kept AS (
            SELECT l.* FROM lines l ANTI JOIN common c USING (line)
        ),
        rebuilt AS (
            SELECT id,
                   string_agg(line, {sep_sql} ORDER BY pos)
                       AS clean_text,
                   COUNT(*) AS n_kept
            FROM kept GROUP BY id
        )
        SELECT d.id,
               CAST(len(string_split(d.txt, {sep_sql})) AS BIGINT)
                   AS n_lines,
               CAST(len(string_split(d.txt, {sep_sql}))
                    - COALESCE(r.n_kept, 0) AS BIGINT)
                   AS n_lines_removed,
               COALESCE(r.clean_text, '') AS clean_text
        FROM docs d LEFT JOIN rebuilt r USING (id)
    """


# --- DSIR-style importance resampling ----------------------------------------

def importance_logratio(
    df: DataFrame,
    target_pred: F.Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold_micro: int = 0,
) -> DataFrame:
    """Score every doc by how target-like its unigrams are -- the
    Data Selection via Importance Resampling signal (Xie et al. 2023,
    public): avg_w log(p_target(w) / p_background(w)) over the doc's
    tokens, with add-one smoothing on both models so unseen tokens are
    finite. ``target_pred`` marks the in-domain exemplar docs (e.g.
    lang == 'en'); the background model is the full corpus.
    ``selected`` keeps docs at least as target-like as the threshold
    (default 0 = "more target than background").

    Exactness: per-token log-ratios round to micro-nat longs before
    the per-doc sum (functions/exact.py pattern), so the parallel sum
    is partition/retry/engine-invariant and the DuckDB twin matches
    bit-for-bit.

    Plan: one explode of the corpus; token-level counts for background
    and target come out of ONE shuffle (conditional sum inside the
    same aggregate); totals + vocab size ride a one-row broadcast; the
    score join is token-keyed against a vocabulary-sized table.
    """
    from .caching import persisted

    # freqs aggregation and the score join both scan the explode
    toks = persisted(df.select(
        F.col(id_col).alias("id"),
        target_pred.alias("is_target"),
        F.explode(tokens(text_col)).alias("token"),
    ))
    freqs = toks.groupBy("token").agg(
        F.count(F.lit(1)).alias("n_bg"),
        F.sum(F.when(F.col("is_target"), 1).otherwise(0)).alias("n_tg"),
    )
    totals = freqs.agg(
        F.sum("n_bg").cast("double").alias("tot_bg"),
        F.sum("n_tg").cast("double").alias("tot_tg"),
        F.count(F.lit(1)).cast("double").alias("vocab"),
    )
    scored = (
        toks.join(freqs, "token")
        .crossJoin(F.broadcast(totals))
        .select(
            "id",
            F.round(
                (
                    F.log(
                        (F.col("n_tg") + 1)
                        / (F.col("tot_tg") + F.col("vocab"))
                    )
                    - F.log(
                        (F.col("n_bg") + 1)
                        / (F.col("tot_bg") + F.col("vocab"))
                    )
                )
                * 1e6
            )
            .cast("long")
            .alias("lr_micro"),
        )
    )
    per_doc = scored.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.sum("lr_micro") / F.count(F.lit(1)))
        .cast("long")
        .alias("avg_logratio_micro"),
    )
    return per_doc.select(
        "id",
        "n_tokens",
        "avg_logratio_micro",
        (F.col("avg_logratio_micro") >= threshold_micro).alias("selected"),
    )


def importance_logratio_sql(
    table: str,
    target_pred_sql: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold_micro: int = 0,
) -> str:
    """DuckDB twin (same smoothing, same micro-nat rounding)."""
    return f"""
        WITH toks AS (
            SELECT {id_col} AS id, ({target_pred_sql}) AS is_target,
                   unnest(regexp_split_to_array({text_col}, ' +'))
                       AS token
            FROM {table}
        ), freqs AS (
            SELECT token,
                   COUNT(*) AS n_bg,
                   SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS n_tg
            FROM toks GROUP BY token
        ), totals AS (
            SELECT CAST(SUM(n_bg) AS DOUBLE) AS tot_bg,
                   CAST(SUM(n_tg) AS DOUBLE) AS tot_tg,
                   CAST(COUNT(*) AS DOUBLE) AS vocab
            FROM freqs
        ), scored AS (
            SELECT id,
                   CAST(ROUND((
                       ln((n_tg + 1) / (tot_tg + vocab))
                       - ln((n_bg + 1) / (tot_bg + vocab))
                   ) * 1000000) AS BIGINT) AS lr_micro
            FROM toks JOIN freqs USING (token) CROSS JOIN totals
        ), per_doc AS (
            SELECT id, COUNT(*) AS n_tokens,
                   CAST(ROUND(SUM(lr_micro) * 1.0 / COUNT(*)) AS BIGINT)
                       AS avg_logratio_micro
            FROM scored GROUP BY id
        )
        SELECT id, n_tokens, avg_logratio_micro,
               avg_logratio_micro >= {threshold_micro} AS selected
        FROM per_doc
    """


# --- bigram-conditional log-probability quality score ------------------------

def bigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc average bigram log-probability ln P(t_i | t_{i-1})
    under the corpus's own MLE bigram model -- the next step up from
    ``unigram_logprob``: word salad with plausible unigrams but
    improbable transitions scores low here.

    Same exactness discipline as the unigram score: each transition's
    log-prob is snapped to micro-nat longs before the per-doc sum, so
    the parallel sum is engine/partition-invariant. MLE needs no
    smoothing for scoring the training corpus itself (every observed
    bigram has count >= 1).

    Plan: one bigram explode (persisted; scanned by both the count
    aggregate and the score join) -> bigram counts (shuffle on the
    pair, map-side combine) -> context counts derived from the
    BIGRAM-COUNT table (vocabulary-squared-bounded, far smaller than
    the corpus) -> two joins back -> per-doc sum. Docs with fewer than
    2 tokens have no transitions and are absent from the output.
    """
    from .caching import persisted

    toks = tokens(text_col)
    pairs = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("prev"),
                F.element_at(toks, i + 1).alias("cur"),
            ),
        ),
    ).otherwise(F.array())
    bi = persisted(
        df.select(
            F.col(id_col).alias("id"), F.explode(pairs).alias("p")
        ).select("id", "p.prev", "p.cur")
    )
    c2 = persisted(
        bi.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("bi_n"))
    )
    c1 = c2.groupBy("prev").agg(F.sum("bi_n").alias("ctx_n"))
    scored = (
        bi.join(c2, ["prev", "cur"])
        .join(c1, "prev")
        .select(
            "id",
            F.round(
                F.log(F.col("bi_n").cast("double") / F.col("ctx_n"))
                * 1e6
            ).cast("long").alias("lp_micro"),
        )
    )
    return scored.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (
            F.round(F.sum("lp_micro") / F.count(F.lit(1)))
            .cast("long")
        ).alias("avg_logprob_micro"),
    )


def bigram_logprob_sql(
    table: str, text_col: str = "text", id_col: str = "doc_id"
) -> str:
    """DuckDB twin (same micro-nat rounding before the sum)."""
    return f"""
        WITH t AS (
            SELECT {id_col} AS id,
                   regexp_split_to_array({text_col}, ' +') AS toks
            FROM {table}
        ), bi AS (
            SELECT id, u.prev AS prev, u.cur AS cur
            FROM (
                SELECT id,
                       unnest(CASE WHEN len(toks) >= 2 THEN
                           list_transform(range(1, len(toks)),
                               i -> {{'prev': toks[i],
                                     'cur': toks[i + 1]}})
                       ELSE [] END) AS u
                FROM t
            )
        ), c2 AS (
            SELECT prev, cur, COUNT(*) AS bi_n
            FROM bi GROUP BY prev, cur
        ), c1 AS (
            SELECT prev, SUM(bi_n) AS ctx_n FROM c2 GROUP BY prev
        )
        SELECT id,
               COUNT(*) AS n_bigrams,
               CAST(ROUND(SUM(CAST(ROUND(
                   ln(CAST(bi_n AS DOUBLE) / ctx_n) * 1000000)
                   AS BIGINT)) * 1.0 / COUNT(*)) AS BIGINT)
                   AS avg_logprob_micro
        FROM bi JOIN c2 USING (prev, cur) JOIN c1 USING (prev)
        GROUP BY id
    """


# --- per-source distribution drift (KL divergence) ----------------------------

def source_unigram_drift(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """KL(source || corpus) over unigram distributions -- the standard
    slice-drift monitor for a multi-source training mix (a source
    whose token distribution diverges from the pool is the first
    place to look for contamination, boilerplate floods, or language
    shift).

    Every source token appears in the global model by construction, so
    KL is finite. Per-term contributions p_st * ln(p_st / p_t) are
    rounded to MICRO-NAT LONGS before the sum (functions/exact.py
    discipline): the aggregate is exact, so Spark's partial sums and a
    sequential oracle agree bit-for-bit.

    Plan: one token explode -> (source, token) count shuffle with
    map-side combine; everything after runs on the vocabulary-sized
    grouped table (per-source totals, global counts, broadcast global
    total). Nothing corpus-sized is shuffled twice.
    """
    from .caching import persisted
    from .text import tokens

    toks = df.select(
        F.col(source_col).alias("source"),
        F.explode(tokens(text_col)).alias("token"),
    )
    st = persisted(
        toks.groupBy("source", "token").agg(F.count(F.lit(1)).alias("n_st"))
    )
    s_tot = st.groupBy("source").agg(F.sum("n_st").alias("n_s"))
    g_tok = st.groupBy("token").agg(F.sum("n_st").alias("n_t"))
    g_tot = g_tok.agg(F.sum("n_t").cast("double").alias("n_g"))
    p_st = F.col("n_st").cast("double") / F.col("n_s").cast("double")
    p_t = F.col("n_t").cast("double") / F.col("n_g")
    contrib = F.round(p_st * F.log(p_st / p_t) * 1e6).cast("long")
    return (
        st.join(g_tok, "token")
        .join(s_tot, "source")
        .crossJoin(F.broadcast(g_tot))
        .select("source", "n_s", contrib.alias("c_micro"))
        .groupBy("source")
        .agg(
            F.first("n_s").alias("n_tokens"),
            F.count(F.lit(1)).alias("vocab_size"),
            F.sum("c_micro").alias("kl_micro"),
            (F.sum("c_micro") / 1e6).alias("kl_nats"),
        )
    )


def source_unigram_drift_sql(
    table: str, text_col: str = "text", source_col: str = "source"
) -> str:
    """DuckDB twin (same micro-nat rounding before the sum)."""
    return f"""
        WITH toks AS (
            SELECT {source_col} AS source,
                   unnest(regexp_split_to_array({text_col}, ' +')) AS token
            FROM {table}
        ), st AS (
            SELECT source, token, COUNT(*) AS n_st
            FROM toks GROUP BY source, token
        ), s_tot AS (
            SELECT source, SUM(n_st) AS n_s FROM st GROUP BY source
        ), g_tok AS (
            SELECT token, SUM(n_st) AS n_t FROM st GROUP BY token
        ), g_tot AS (
            SELECT CAST(SUM(n_t) AS DOUBLE) AS n_g FROM g_tok
        )
        SELECT source,
               CAST(MIN(n_s) AS BIGINT) AS n_tokens,
               COUNT(*) AS vocab_size,
               CAST(SUM(c_micro) AS BIGINT) AS kl_micro,
               CAST(SUM(c_micro) AS BIGINT) / 1e6 AS kl_nats
        FROM (
            SELECT st.source, s_tot.n_s,
                   CAST(ROUND(
                       (CAST(n_st AS DOUBLE) / CAST(n_s AS DOUBLE))
                       * ln((CAST(n_st AS DOUBLE) / CAST(n_s AS DOUBLE))
                            / (CAST(n_t AS DOUBLE) / n_g))
                       * 1e6) AS BIGINT) AS c_micro
            FROM st
            JOIN g_tok USING (token)
            JOIN s_tot USING (source)
            CROSS JOIN g_tot
        ) terms
        GROUP BY source
    """


# --- BPE merge-rule learning (distributed tokenizer training) -----------------

def _merge_pair_expr(seq: Column, a: str, b: str) -> Column:
    """Greedy left-to-right merge of adjacent (a, b) -> a+b inside a
    token array, as one JVM-side fold (F.aggregate): the accumulator
    is the rebuilt array; a freshly-merged token can't re-merge with
    the next element (exactly BPE's leftmost-nonoverlapping rule --
    [a,a,a] with pair (a,a) becomes [aa,a], not [aa,aa])."""
    ab = a + b
    return F.aggregate(
        seq,
        F.expr("CAST(array() AS ARRAY<STRING>)"),
        lambda acc, t: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (t == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(ab))
            ),
        ).otherwise(F.concat(acc, F.array(t))),
    )


def learn_bpe_merges(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
    min_count: int = 2,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn BPE merge rules over a distributed corpus: repeatedly
    count adjacent token pairs and merge the most frequent one --
    HuggingFace-tokenizers' training loop with the pair counting
    distributed (shuffle on pair, map-side combine) instead of
    single-machine.

    Word-level variant (seeds are whitespace tokens, merges build
    multi-word units); the same operator trains character-level BPE
    if the caller pre-splits to chars. Deterministic: ties break on
    (count DESC, pair ASC), no RNG -- the learned rules are
    engine/partitioning-invariant because pair counts are exact
    integer aggregates.

    Coordination budget: ONE (pair, count) row collected per round --
    the same O(iters) driver-scalar discipline as k-means and the
    components loop. Each round rewrites sequences with a single
    array fold (JVM codegen, no UDF) and persists the result so round
    N+1 counts the post-merge corpus without replaying rounds 1..N.

    Returns (merges, final_sequences) where final_sequences has one
    ``seq ARRAY<STRING>`` column; callers apply the rules to new text
    with :func:`apply_bpe_merges`.
    """
    from .caching import persisted, untrack

    seqs = persisted(
        df.select(
            F.filter(
                F.split(F.col(text_col), " +"), lambda t: t != ""
            ).alias("seq")
        )
    )
    merges: list[tuple[str, str]] = []
    prev = seqs
    for _ in range(n_merges):
        pairs = prev.filter(F.size("seq") >= 2).select(
            F.explode(
                F.zip_with(
                    F.slice(F.col("seq"), 1, F.size("seq") - 1),
                    F.slice(F.col("seq"), 2, F.size("seq") - 1),
                    lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                )
            ).alias("p")
        )
        top = (
            pairs.groupBy("p")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.col("n").desc(), F.col("p.a"), F.col("p.b"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < min_count:
            break
        a, b = top[0]["p"]["a"], top[0]["p"]["b"]
        merges.append((a, b))
        nxt = persisted(
            prev.select(_merge_pair_expr(F.col("seq"), a, b).alias("seq"))
        )
        nxt.count()  # materialize before dropping the parent
        prev.unpersist()
        untrack(prev)
        prev = nxt
    return merges, prev


def apply_bpe_merges(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """Apply learned merge rules (in training order) to new text; adds
    ``bpe_tokens ARRAY<STRING>``. Pure chained array folds -- plan
    size is O(len(merges)), no shuffle at all."""
    seq = F.filter(F.split(F.col(text_col), " +"), lambda t: t != "")
    for a, b in merges:
        seq = _merge_pair_expr(seq, a, b)
    return df.withColumn("bpe_tokens", seq)


# --- vocabulary growth curve (Heaps' law) --------------------------------------


def vocab_growth_curve(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10,
) -> DataFrame:
    """Vocabulary-vs-corpus-size curve: split the corpus into
    ``n_buckets`` deterministic md5 shards (a partitioning-invariant
    proxy for "the first d/n of the corpus"), and for each prefix
    d report cumulative token occurrences, cumulative DISTINCT
    vocabulary (tokens whose FIRST shard is within the prefix), the
    new types the d-th shard contributed, and the type-token ratio.

    This is the Heaps'-law dial a corpus owner reads before paying
    for more data: a flattening ``new_types`` column says the next
    10% of the same source buys almost no new vocabulary (diminishing
    content), while a linear one says the source is far from
    exhausted. Same decision surface as the dedup tiers, one level
    up.

    Scale shape: two map-side-combinable token shuffles (per-bucket
    occurrence counts; per-token min-bucket, then the
    |vocabulary|-sized relation aggregates to ``n_buckets`` rows) and
    one cumulative window over the CONSTANT n_buckets-row relation --
    the binary_eval discipline: unpartitioned windows only ever see
    bounded relations. All integers.
    """
    from pyspark.sql.window import Window

    from .sample import hash_bucket
    from .text import tokens

    toks = df.select(
        hash_bucket(id_col, n_buckets).alias("bucket"),
        F.explode(tokens(text_col)).alias("token"),
    )
    per_bucket = toks.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens")
    )
    first_seen = (
        toks.groupBy("token")
        .agg(F.min("bucket").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("new_types"))
    )
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        per_bucket.join(first_seen, "bucket", "full_outer")
        .select(
            (F.col("bucket") + 1).cast("long").alias("prefix"),
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("new_types", F.lit(0)).alias("new_types"),
        )
        .select(
            "prefix", "new_types",
            F.sum("n_tokens").over(
                Window.orderBy("prefix").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            ).cast("long").alias("tokens_cum"),
            F.sum("new_types").over(
                Window.orderBy("prefix").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            ).cast("long").alias("vocab_cum"),
        )
        .select(
            "prefix", "tokens_cum", "vocab_cum", "new_types",
            F.expr("vocab_cum * 1000000 div tokens_cum")
            .cast("long").alias("ttr_ppm"),
        )
        .orderBy("prefix")
    )


def vocab_growth_curve_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10,
) -> str:
    """DuckDB twin of :func:`vocab_growth_curve`."""
    from .sample import hash_bucket_sql

    bucket = hash_bucket_sql(id_col, n_buckets)
    return f"""
        WITH toks AS (
            SELECT CAST({bucket} AS BIGINT) AS bucket,
                   unnest(regexp_split_to_array({text_col}, ' +'))
                       AS token
            FROM {table}
        ), per_bucket AS (
            SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_tokens
            FROM toks GROUP BY bucket
        ), first_seen AS (
            SELECT bucket, CAST(COUNT(*) AS BIGINT) AS new_types
            FROM (
                SELECT token, MIN(bucket) AS bucket
                FROM toks GROUP BY token
            ) GROUP BY bucket
        ), fused AS (
            SELECT COALESCE(p.bucket, f.bucket) + 1 AS prefix,
                   COALESCE(n_tokens, 0) AS n_tokens,
                   COALESCE(new_types, 0) AS new_types
            FROM per_bucket p FULL OUTER JOIN first_seen f
              ON p.bucket = f.bucket
        )
        SELECT prefix,
               CAST(SUM(n_tokens) OVER (ORDER BY prefix
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tokens_cum,
               CAST(SUM(new_types) OVER (ORDER BY prefix
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS vocab_cum,
               new_types,
               CAST(SUM(new_types) OVER (ORDER BY prefix
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) * 1000000
                   // CAST(SUM(n_tokens) OVER (ORDER BY prefix
                       ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS ttr_ppm
        FROM fused
        ORDER BY prefix
    """


# --- persistent vocabulary store (incremental unigram LM) ----------------------
#
# Token counts are a mergeable sufficient statistic (counts sum per
# token), so the corpus's unigram model joins the sketch/store family:
# batches fold into the versioned rollup store (exactly-once replay
# ledger, keep-last-N vacuum, time travel) and the model -- or a
# logprob scoring pass against it -- reads off the store without ever
# rescanning an ingested batch. This is what makes the fluency filter
# (unigram_logprob) and the drift monitor deployable on a GROWING
# corpus: the model updates per batch, O(batch) tokens folded into a
# vocabulary-sized table.


def vocab_store_ingest(
    spark,
    docs: DataFrame,
    store_path: str,
    batch_id: str,
    text_col: str = "text",
    keep_versions: int | None = None,
) -> DataFrame:
    """Fold one document batch's token counts into the persistent
    vocabulary store. Replayed ``batch_id``s are no-ops (the rollup
    store's ledger); per token, ``n_rows`` IS the occurrence count.
    Returns the new store contents."""
    from .rollup_store import incremental_rollup
    from .text import tokens

    toks = docs.select(
        F.explode(tokens(text_col)).alias("token"),
        F.lit(1).alias("__one"),
    )
    return incremental_rollup(
        spark, toks, store_path, batch_id,
        key_cols=["token"], value_col="__one", value_scale=1,
        keep_versions=keep_versions,
    )


def vocab_store_logprob(
    spark,
    df: DataFrame,
    store_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    version: int | None = None,
) -> DataFrame:
    """Score documents against the STORED unigram model -- the
    incremental twin of :func:`unigram_logprob`, which rebuilds its
    model from the scored corpus itself. Same micro-nat snapping,
    same per-doc exact integer sum; when every token is in the store
    (e.g. scoring the ingested corpus), the output is BIT-EQUAL to
    the one-shot operator (pytest-pinned).

    Out-of-vocabulary tokens (scoring NEW text against an older
    model) are floored at ln(1/total) -- the rarest-possible-token
    score -- and counted per doc in ``n_oov`` so a drifting corpus is
    visible, not silently absorbed. ``version`` pins a time-travel
    read ("score under the model as of batch N")."""
    from .caching import persisted
    from .rollup_store import read_rollup
    from .text import tokens

    agg, _, _ = read_rollup(spark, store_path, version=version)
    if agg is None:
        raise ValueError(f"no committed vocab store at {store_path}")
    freqs = agg.select("token", F.col("n_rows").alias("tok_n"))
    total = freqs.agg(F.sum("tok_n").cast("double").alias("total_n"))
    toks = persisted(df.select(
        F.col(id_col).alias("id"),
        F.explode(tokens(text_col)).alias("token"),
    ))
    lp_seen = F.log(F.col("tok_n") / F.col("total_n"))
    lp_oov = F.log(F.lit(1.0) / F.col("total_n"))
    scored = (
        toks.join(freqs, "token", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "id",
            F.col("tok_n").isNull().cast("long").alias("oov"),
            F.round(
                F.when(F.col("tok_n").isNull(), lp_oov)
                .otherwise(lp_seen) * 1e6
            ).cast("long").alias("lp_micro"),
        )
    )
    return scored.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("oov").cast("long").alias("n_oov"),
        F.round(F.sum("lp_micro") / F.count(F.lit(1)))
        .cast("long").alias("avg_logprob_micro"),
    )


def packed_attention_spans(
    packed: DataFrame,
    capacity: int,
) -> DataFrame:
    """Per-bin attention-boundary manifest over :func:`pack_sequences`
    output: the loader-facing record of where documents start inside
    each packed training sequence (cross-document attention masks
    reset at exactly these offsets).

    Output per (shard, bin_id): n_chunks, n_docs (distinct source
    docs), fill_tokens (tokens whose chunk STARTS in this bin),
    n_cut_chunks (chunks the concat-and-cut view splits across the
    bin boundary: offset_in_bin + n_tokens > capacity), and
    boundary_md5 -- an order-sensitive md5 over the
    (offset_in_bin:id:chunk_id) span list in offset order, the exact
    mask-reset sequence two engines/loaders must agree on.

    Scale: one groupBy over the packed relation; the per-bin ordered
    fingerprint sorts at most ``capacity`` spans (a bin holds >=
    capacity/chunk_len chunks but never more than capacity 1-token
    chunks), so the collect is bounded by the training sequence
    length by construction -- the same bounded-window argument as
    shard_manifest.
    """
    span = F.concat_ws(
        ":",
        F.col("offset_in_bin").cast("string"),
        F.col("id").cast("string"),
        F.col("chunk_id").cast("string"),
    )
    return (
        packed.groupBy("shard", "bin_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.countDistinct("id").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("fill_tokens"),
            F.sum(
                (
                    F.col("offset_in_bin") + F.col("n_tokens")
                    > capacity
                ).cast("long")
            ).cast("long").alias("n_cut_chunks"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct(
                                    F.col("offset_in_bin"),
                                    F.col("id"),
                                    F.col("chunk_id"),
                                    span.alias("s"),
                                )
                            )
                        ),
                        lambda x: x["s"],
                    ),
                )
            ).alias("boundary_md5"),
        )
    )


def packed_attention_spans_sql(
    packed_sql: str,
    capacity: int,
) -> str:
    """DuckDB twin of :func:`packed_attention_spans` over the
    pack_sequences_sql subquery."""
    return f"""
        SELECT shard, bin_id,
               CAST(COUNT(*) AS BIGINT) AS n_chunks,
               CAST(COUNT(DISTINCT id) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS fill_tokens,
               CAST(SUM(CASE WHEN offset_in_bin + n_tokens
                                  > {capacity}
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_cut_chunks,
               md5(string_agg(
                   CAST(offset_in_bin AS VARCHAR) || ':'
                   || CAST(id AS VARCHAR) || ':'
                   || CAST(chunk_id AS VARCHAR), ','
                   ORDER BY offset_in_bin, id, chunk_id))
                   AS boundary_md5
        FROM ({packed_sql})
        GROUP BY shard, bin_id
    """


# --- PMI phrase mining (word2phrase-style collocations) ----------------------------

def pmi_bigrams(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 50,
) -> DataFrame:
    """Top collocations by pointwise mutual information -- the
    word2phrase step (Mikolov et al. 2013) a tokenizer-prep pipeline
    runs to promote "new york"-style bigrams to single units before
    vocabulary induction:

        pmi(a, b) = ln( N * c_ab / (c_a * c_b) )

    with ``N`` total bigram occurrences, ``c_ab`` the bigram count
    and ``c_a``/``c_b`` the left-context / right-context unigram
    occurrence counts derived from the SAME bigram relation (so the
    marginals sum to N exactly). ``min_count`` suppresses the
    low-count noise PMI is notorious for.

    Exactness discipline: counts are BIGINTs; the single float op is
    one IEEE ln of the same integer ratio in both engines, snapped to
    micro-nats (same discipline as ``bigram_logprob``). Determinism:
    output ordered by (pmi_micro DESC, a, b) with row_number cutting
    exactly top_k.

    Scale shape: one bigram explode -> groupBy(pair) map-side
    combinable count; marginals derive from the pair-count relation
    (vocabulary-bounded, far smaller than the corpus); the final
    ordering runs on the min_count-filtered collocation relation.
    """
    toks = tokens(text_col)
    pairs = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("a"),
                F.element_at(toks, i + 1).alias("b"),
            ),
        ),
    ).otherwise(F.array())
    from .caching import persisted

    # persisted: the pair-count relation is scanned by BOTH marginals,
    # the total and the score join -- without it Catalyst inlines the
    # corpus-grain bigram explode into every branch (the
    # ngram_jaccard_pairs lesson: measured 6x on the same shape)
    from .skew import ensure_parallel_scan

    bi = persisted(
        ensure_parallel_scan(df, text_col)
        .select(F.explode(pairs).alias("p"))
        .select("p.a", "p.b")
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("c_ab"))
    )
    left = bi.groupBy("a").agg(F.sum("c_ab").alias("c_a"))
    right = bi.groupBy("b").agg(F.sum("c_ab").alias("c_b"))
    tot = bi.agg(F.sum("c_ab").cast("long").alias("n_total"))
    scored = (
        bi.filter(F.col("c_ab") >= min_count)
        .join(left, "a")
        .join(right, "b")
        .crossJoin(F.broadcast(tot))
        .select(
            "a", "b", "c_ab",
            F.round(
                F.log(
                    F.col("n_total").cast("double") * F.col("c_ab")
                    / (F.col("c_a") * F.col("c_b"))
                ) * 1e6
            ).cast("long").alias("pmi_micro"),
        )
    )
    w = Window.orderBy(
        F.col("pmi_micro").desc(), F.col("a"), F.col("b")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_k)
        .select("a", "b", "c_ab", "pmi_micro")
    )


def pmi_bigrams_sql(
    table: str,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 50,
) -> str:
    """DuckDB twin of :func:`pmi_bigrams` (same marginals from the
    same bigram relation, same micro-nat ln, same tiebreak)."""
    return f"""
        WITH t AS (
            SELECT regexp_split_to_array({text_col}, ' +') AS toks
            FROM {table}
        ), bi AS (
            SELECT u.a AS a, u.b AS b, COUNT(*) AS c_ab
            FROM (
                SELECT unnest(CASE WHEN len(toks) >= 2 THEN
                    list_transform(range(1, len(toks)),
                        i -> {{'a': toks[i], 'b': toks[i + 1]}})
                ELSE [] END) AS u
                FROM t
            )
            GROUP BY 1, 2
        ), l AS (SELECT a, SUM(c_ab) AS c_a FROM bi GROUP BY a),
        r AS (SELECT b, SUM(c_ab) AS c_b FROM bi GROUP BY b),
        tot AS (SELECT CAST(SUM(c_ab) AS BIGINT) AS n_total FROM bi),
        scored AS (
            SELECT a, b, CAST(c_ab AS BIGINT) AS c_ab,
                   CAST(ROUND(ln(CAST(n_total AS DOUBLE) * c_ab
                        / (c_a * c_b)) * 1000000) AS BIGINT)
                       AS pmi_micro
            FROM bi JOIN l USING (a) JOIN r USING (b), tot
            WHERE c_ab >= {min_count}
        )
        SELECT a, b, c_ab, pmi_micro FROM (
            SELECT *, ROW_NUMBER() OVER (
                ORDER BY pmi_micro DESC, a, b) AS rk
            FROM scored
        ) WHERE rk <= {top_k}
    """


# --- cross-source n-gram novelty ----------------------------------------------------

def ngram_novelty_by_source(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Per-source n-gram novelty: of a source's distinct word
    n-grams, what fraction appears in NO other source? The
    cross-source contamination dial a corpus-mixing pipeline reads
    before weighting sources -- near-zero novelty means the source
    re-serves text the mix already has (mirrors, scrapes of scrapes);
    benchmark-decontamination answers the same question against a
    fixed eval set, this answers it between training sources.

    Output per source: n_ngrams (distinct), n_exclusive (appearing
    in this source only), novelty_ppm = n_exclusive * 1e6 div
    n_ngrams -- all exact BIGINT counts.

    Scale shape: explode to (source, ngram) -> distinct (the ONE
    data-grain shuffle, map-side combinable); the per-ngram source
    count then runs on the |distinct ngrams| relation and joins back
    by ngram. Nothing pairs sources against each other -- cost is
    linear in corpus n-grams, not quadratic in sources.
    """
    from .caching import persisted

    # persisted: scanned by the per-gram source count AND the join
    # back -- unpersisted, the data-grain explode+distinct runs twice
    from .skew import ensure_parallel_scan

    pairs = persisted(
        ensure_parallel_scan(df, text_col)
        .select(
            F.col(source_col).alias("src"),
            F.explode(_all_shingles(text_col, n)).alias("g"),
        )
        .distinct()
    )
    per_gram = pairs.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_sources")
    )
    return (
        pairs.join(per_gram, "g")
        .groupBy(F.col("src").alias(source_col))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_ngrams"),
            F.sum(
                (F.col("n_sources") == 1).cast("long")
            ).cast("long").alias("n_exclusive"),
        )
        .select(
            source_col, "n_ngrams", "n_exclusive",
            F.expr(f"n_exclusive * {PPM} div n_ngrams")
            .alias("novelty_ppm"),
        )
    )


def ngram_novelty_by_source_sql(
    table: str,
    source_col: str = "source",
    text_col: str = "text",
    n: int = 3,
) -> str:
    """DuckDB twin of :func:`ngram_novelty_by_source` (same shingle
    construction incl. the short-doc whole-text fallback)."""
    return f"""
        WITH t AS (
            SELECT {source_col} AS src,
                   regexp_split_to_array({text_col}, ' +') AS toks
            FROM {table}
        ), pairs AS (
            SELECT DISTINCT src,
                   unnest(CASE WHEN len(toks) >= {n} THEN
                       list_transform(range(1, len(toks) - {n} + 2),
                           i -> array_to_string(toks[i:i+{n}-1], ' '))
                   ELSE [array_to_string(toks, ' ')] END) AS g
            FROM t
        ), per_gram AS (
            SELECT g, COUNT(*) AS n_sources FROM pairs GROUP BY g
        )
        SELECT src AS {source_col},
               CAST(COUNT(*) AS BIGINT) AS n_ngrams,
               CAST(SUM(CASE WHEN n_sources = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_exclusive,
               CAST(SUM(CASE WHEN n_sources = 1 THEN 1 ELSE 0 END)
                    * {PPM} // COUNT(*) AS BIGINT) AS novelty_ppm
        FROM pairs JOIN per_gram USING (g)
        GROUP BY src
    """


# --- windowed skip-gram co-occurrence (round-12) -------------------------------------

def skipgram_cooccurrence(
    df: DataFrame,
    text_col: str = "text",
    window: int = 4,
    min_count: int = 5,
    top_k: int = 50,
) -> DataFrame:
    """Top unordered word pairs by windowed co-occurrence count --
    the word2vec/GloVe co-occurrence-matrix build (Mikolov et al.
    2013; Pennington et al. 2014). pmi_bigrams scores ADJACENT pairs;
    this counts every pair within ``window`` tokens, which is what an
    embedding trainer actually consumes: a pair (i, j) with
    1 <= j - i <= window contributes one raw count and the GloVe
    distance weight 1/(j-i).

    Pairs are normalized unordered (a = min(w_i, w_j), b = max) so
    "new york" and "york ... new" accumulate into one cell, matching
    the symmetric-window convention. Exactness: counts are BIGINTs;
    the GloVe weight is summed in exact micro-units
    (``1_000_000 div d``, positive trunc-division -- identical in
    both engines). Determinism: total order (count DESC, a, b),
    cut by ``top_k``.

    Scale shape: ONE corpus-grain explode (|tokens| x window pairs)
    into a map-side-combinable groupBy(a, b) count -- the same single
    data-grain shuffle as pmi_bigrams, just window-x wider; no
    self-join builds the pairs (the naive positional self-join
    shuffles the corpus twice and is strictly worse). The top-k runs
    as orderBy().limit() (TakeOrderedAndProject) on the
    min_count-filtered pair relation -- no global sort materializes.
    """
    toks = tokens(text_col)
    n = F.size(toks)
    # i in 1..n-1, j in i+1..min(i+window, n): stop >= start always,
    # so F.sequence never flips into its descending mode.
    pairs = F.when(
        n >= 2,
        F.flatten(
            F.transform(
                F.sequence(F.lit(1), n - 1),
                lambda i: F.transform(
                    F.sequence(
                        i + 1, F.least(i + F.lit(window), n)
                    ),
                    lambda j: F.struct(
                        F.least(
                            F.element_at(toks, i),
                            F.element_at(toks, j),
                        ).alias("a"),
                        F.greatest(
                            F.element_at(toks, i),
                            F.element_at(toks, j),
                        ).alias("b"),
                        (j - i).alias("d"),
                    ),
                ),
            )
        ),
    ).otherwise(F.array())
    from .skew import ensure_parallel_scan

    # under-parallel guard: a single-file corpus scans as one split
    # and serializes the window-x explode (measured 44s -> ~5s at
    # sf0.1 on 32 cores); no-op when inputs carry >= cores splits
    src = ensure_parallel_scan(df, text_col)
    return (
        src.select(F.explode(pairs).alias("p"))
        .select("p.a", "p.b", "p.d")
        .groupBy("a", "b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cooc"),
            F.sum(F.expr(f"{PPM} div d"))
            .cast("long").alias("glove_w_micro"),
        )
        .filter(F.col("n_cooc") >= min_count)
        # fail-loud wrap guard from the always-safe count: the
        # micro-weight sum is <= n_cooc * 1e6, so it fits BIGINT iff
        # n_cooc <= 2^63/1e6 ~ 9.2e12 -- beyond that a non-ANSI
        # cluster would wrap the sum silently (ANSI raises; DuckDB's
        # HUGEINT sum errors at the BIGINT cast). One stop-pair at
        # ~1e13 occurrences means a corpus far past sharding anyway.
        .select(
            "a", "b", "n_cooc",
            F.expr(
                "CASE WHEN n_cooc > 9223372036854 THEN"
                " CAST(raise_error('skipgram_cooccurrence: pair count"
                " overflows the micro-weight sum -- shard the corpus')"
                " AS BIGINT) ELSE glove_w_micro END"
            ).alias("glove_w_micro"),
        )
        .orderBy(F.col("n_cooc").desc(), "a", "b")
        .limit(top_k)
    )


def skipgram_cooccurrence_sql(
    table: str,
    text_col: str = "text",
    window: int = 4,
    min_count: int = 5,
    top_k: int = 50,
) -> str:
    """DuckDB twin of :func:`skipgram_cooccurrence` (same unordered
    normalization, same micro-unit GloVe weight, same tiebreak).
    DuckDB ``range(lo, hi)`` is hi-exclusive and empty when
    hi <= lo, so the j-range mirrors Spark's inclusive sequence."""
    return f"""
        WITH t AS (
            SELECT regexp_split_to_array({text_col}, ' +') AS toks
            FROM {table}
        ), p AS (
            SELECT unnest(CASE WHEN len(toks) >= 2 THEN
                flatten(list_transform(range(1, len(toks)),
                    i -> list_transform(
                        range(i + 1,
                              least(i + {window}, len(toks)) + 1),
                        j -> {{'a': least(toks[i], toks[j]),
                               'b': greatest(toks[i], toks[j]),
                               'd': j - i}})))
            ELSE [] END) AS u
            FROM t
        )
        SELECT u.a AS a, u.b AS b,
               CAST(COUNT(*) AS BIGINT) AS n_cooc,
               CAST(SUM({PPM} // u.d) AS BIGINT) AS glove_w_micro
        FROM p
        GROUP BY 1, 2
        HAVING COUNT(*) >= {min_count}
        ORDER BY n_cooc DESC, a, b
        LIMIT {top_k}
    """


# --- per-source unigram entropy ------------------------------------------------------

def unigram_entropy_by_source(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source Shannon entropy of the unigram distribution, in
    micro-nats: H = -sum_w p_w ln p_w over each source's own token
    counts. The corpus-diversity dial next to Heaps' law
    (vocab_growth_curve) and the KL drift tier: a source whose
    entropy collapses is template spam regardless of volume.

    Exactness discipline: per (source, token), the log-probability is
    snapped to micro-nat longs (round(ln(cnt/total) * 1e6), one IEEE
    ln of the same integer ratio in both engines -- the
    bigram_logprob rule), weighted by the exact count, summed as
    BIGINTs and divided by the exact total: H_micro = -(sum cnt *
    lp_micro) div total, truncating division in both engines.

    Output per source: n_tokens, n_distinct, entropy_micro.

    Scale shape: one explode -> (source, token) count (map-side
    combinable, THE data-grain shuffle), then per-source totals
    derived from the count relation (vocabulary-bounded) and one
    join back at count grain.
    """
    from .caching import persisted

    # persisted: the token-count relation feeds the totals AND the
    # join back -- one materialization instead of two explode scans
    from .skew import ensure_parallel_scan

    tok = persisted(
        ensure_parallel_scan(df, text_col)
        .select(
            F.col(source_col).alias("src"),
            F.explode(tokens(text_col)).alias("w"),
        )
        .groupBy("src", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    totals = tok.groupBy("src").agg(
        F.sum("cnt").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
    )
    return (
        tok.join(totals, "src")
        .select(
            "src", "total", "n_distinct",
            (
                F.col("cnt")
                * F.round(
                    F.log(
                        F.col("cnt").cast("double") / F.col("total")
                    ) * 1e6
                ).cast("long")
            ).alias("term"),
        )
        .groupBy(F.col("src").alias(source_col))
        .agg(
            F.first("total").alias("n_tokens"),
            F.first("n_distinct").alias("n_distinct"),
            (-(F.sum("term"))).alias("_num"),
            F.first("total").alias("_den"),
        )
        .select(
            source_col, "n_tokens", "n_distinct",
            F.expr("_num div _den").cast("long")
            .alias("entropy_micro"),
        )
    )


def unigram_entropy_by_source_sql(
    table: str,
    source_col: str = "source",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`unigram_entropy_by_source` (same
    micro-nat snapping before the weighted sum)."""
    return f"""
        WITH tok AS (
            SELECT {source_col} AS src, u.w AS w,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM (
                SELECT {source_col},
                       unnest(regexp_split_to_array({text_col}, ' +'))
                           AS w
                FROM {table}
            ) u({source_col}, w)
            GROUP BY 1, 2
        ), totals AS (
            SELECT src, CAST(SUM(cnt) AS BIGINT) AS total,
                   CAST(COUNT(*) AS BIGINT) AS n_distinct
            FROM tok GROUP BY src
        )
        SELECT t.src AS {source_col},
               ANY_VALUE(o.total) AS n_tokens,
               ANY_VALUE(o.n_distinct) AS n_distinct,
               CAST(-SUM(t.cnt * CAST(ROUND(
                   ln(CAST(t.cnt AS DOUBLE) / o.total) * 1000000)
                   AS BIGINT)) // ANY_VALUE(o.total) AS BIGINT)
                   AS entropy_micro
        FROM tok t JOIN totals o USING (src)
        GROUP BY t.src
    """


# --- pairwise Jensen-Shannon drift matrix -------------------------------------------

def js_divergence_matrix(
    df: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between every two sources'
    unigram distributions -- the bounded (<= ln 2), SYMMETRIC
    complement of ``source_unigram_drift``'s KL-vs-pool: the drift
    MATRIX a mixing pipeline clusters sources by.

    Algebra that avoids per-pair full-outer joins: tokens exclusive
    to one side contribute exactly 0.5 * ln2 * p_w (the other side's
    probability is 0), so

        JSD(P, Q) = sum_shared 0.5*(p ln(2p/(p+q)) + q ln(2q/(p+q)))
                    + 0.5 * ln2 * (excl_mass_P + excl_mass_Q)

    and only SHARED tokens need the equi-join; exclusive mass falls
    out of per-pair shared-count sums vs the source totals. Shared
    terms are snapped to micro-nats before the sum (the KL/logprob
    discipline); the one closing term is a single rounded expression
    of the same integers in both engines.

    Output per (source_a < source_b): n_shared_tokens, js_micro.

    Scale shape: ONE (source, token) count shuffle at data grain;
    the pair join runs on the vocabulary-sized count relation keyed
    by token (|sources|^2 output rows, each a sum over its shared
    vocabulary -- never a corpus-grain pair join).
    """
    from .caching import persisted
    from .text import tokens

    st = persisted(
        df.select(
            F.col(source_col).alias("source"),
            F.explode(tokens(text_col)).alias("token"),
        )
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    tot = st.groupBy("source").agg(F.sum("n").cast("long").alias("t"))
    a = st.join(tot, "source").select(
        F.col("source").alias("sa"), "token",
        F.col("n").alias("na"), F.col("t").alias("ta"),
    )
    b = st.join(tot, "source").select(
        F.col("source").alias("sb"), "token",
        F.col("n").alias("nb"), F.col("t").alias("tb"),
    )
    p = F.col("na").cast("double") / F.col("ta").cast("double")
    q = F.col("nb").cast("double") / F.col("tb").cast("double")
    contrib = F.round(
        (
            p * F.log(2 * p / (p + q)) + q * F.log(2 * q / (p + q))
        ) * 0.5 * 1e6
    ).cast("long")
    shared = (
        a.join(b, "token")
        .filter(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shared_tokens"),
            F.sum(contrib).cast("long").alias("shared_micro"),
            F.sum("na").cast("long").alias("sh_a"),
            F.sum("nb").cast("long").alias("sh_b"),
        )
    )
    # the full pair universe from the |sources|-row totals relation:
    # FULLY-DISJOINT pairs share no token, never survive the inner
    # join above, and must still report js = ln 2 (all mass exclusive)
    pairs = (
        tot.select(
            F.col("source").alias("sa"), F.col("t").alias("ta")
        )
        .crossJoin(
            tot.select(
                F.col("source").alias("sb"), F.col("t").alias("tb")
            )
        )
        .filter(F.col("sa") < F.col("sb"))
    )
    full = pairs.join(shared, ["sa", "sb"], "left").select(
        "sa", "sb", "ta", "tb",
        F.coalesce("n_shared_tokens", F.lit(0).cast("long")).alias(
            "n_shared_tokens"
        ),
        F.coalesce("shared_micro", F.lit(0).cast("long")).alias(
            "shared_micro"
        ),
        F.coalesce("sh_a", F.lit(0).cast("long")).alias("sh_a"),
        F.coalesce("sh_b", F.lit(0).cast("long")).alias("sh_b"),
    )
    excl = (
        (F.col("ta") - F.col("sh_a")).cast("double") / F.col("ta")
        + (F.col("tb") - F.col("sh_b")).cast("double") / F.col("tb")
    )
    return full.select(
        F.col("sa").alias("source_a"),
        F.col("sb").alias("source_b"),
        "n_shared_tokens",
        (
            F.col("shared_micro")
            + F.round(F.log(F.lit(2.0)) * 0.5 * excl * 1e6)
            .cast("long")
        ).alias("js_micro"),
    )


def js_divergence_matrix_sql(
    table: str,
    text_col: str = "text",
    source_col: str = "source",
) -> str:
    """DuckDB twin of :func:`js_divergence_matrix` (same shared-token
    algebra, same micro-nat snapping, same closing exclusive term)."""
    return f"""
        WITH st AS (
            SELECT {source_col} AS source, u.token AS token,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM (
                SELECT {source_col},
                       unnest(regexp_split_to_array({text_col}, ' +'))
                           AS token
                FROM {table}
            ) u({source_col}, token)
            GROUP BY 1, 2
        ), tot AS (
            SELECT source, CAST(SUM(n) AS BIGINT) AS t
            FROM st GROUP BY source
        ), sides AS (
            SELECT st.source, st.token, st.n, tot.t
            FROM st JOIN tot USING (source)
        ), shared AS (
            SELECT a.source AS sa, b.source AS sb,
                   CAST(COUNT(*) AS BIGINT) AS n_shared_tokens,
                   CAST(SUM(CAST(ROUND((
                       (CAST(a.n AS DOUBLE) / a.t)
                         * ln(2 * (CAST(a.n AS DOUBLE) / a.t)
                              / ((CAST(a.n AS DOUBLE) / a.t)
                                 + (CAST(b.n AS DOUBLE) / b.t)))
                       + (CAST(b.n AS DOUBLE) / b.t)
                         * ln(2 * (CAST(b.n AS DOUBLE) / b.t)
                              / ((CAST(a.n AS DOUBLE) / a.t)
                                 + (CAST(b.n AS DOUBLE) / b.t)))
                   ) * 0.5 * 1000000) AS BIGINT)) AS BIGINT)
                       AS shared_micro,
                   CAST(SUM(a.n) AS BIGINT) AS sh_a,
                   CAST(SUM(b.n) AS BIGINT) AS sh_b
            FROM sides a JOIN sides b USING (token)
            WHERE a.source < b.source
            GROUP BY 1, 2
        ), pairs AS (
            SELECT a.source AS sa, a.t AS ta,
                   b.source AS sb, b.t AS tb
            FROM tot a, tot b WHERE a.source < b.source
        ), allpairs AS (
            SELECT p.sa, p.sb, p.ta, p.tb,
                   COALESCE(s.n_shared_tokens, 0) AS n_shared_tokens,
                   COALESCE(s.shared_micro, 0) AS shared_micro,
                   COALESCE(s.sh_a, 0) AS sh_a,
                   COALESCE(s.sh_b, 0) AS sh_b
            FROM pairs p LEFT JOIN shared s
              ON p.sa = s.sa AND p.sb = s.sb
        )
        SELECT sa AS source_a, sb AS source_b,
               CAST(n_shared_tokens AS BIGINT) AS n_shared_tokens,
               CAST(shared_micro + CAST(ROUND(ln(2.0) * 0.5
                    * ((CAST(ta - sh_a AS DOUBLE) / ta)
                       + (CAST(tb - sh_b AS DOUBLE) / tb))
                    * 1000000) AS BIGINT) AS BIGINT) AS js_micro
        FROM allpairs
    """


# --- token-budget concentration (Gini / Lorenz, round-11) ----------------------------

def gini_concentration(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    top_pct: int = 1,
) -> DataFrame:
    """Per-group Gini coefficient of the per-document token-count
    distribution, plus the token share of the top ``top_pct`` percent
    of documents -- the crawl-dominance dial of a curation pipeline.
    A source whose token budget concentrates in a few huge documents
    (Gini -> 1, top-1% share -> 1e6 ppm) is a different cleaning
    problem than one with many uniform pages, and per-domain
    concentration is the standard trigger for per-source caps
    (per_source_document_cap is the remedy; this is the meter).

    Exact-integer discipline (the exact-AUC / borda trick): ranks are
    derived from the VALUE-COUNT relation, never a corpus-wide
    row-grain sort. With value v, count c, F = docs with smaller
    value, n docs and T total tokens (all BIGINT):

        2 * sum_i rank_i * x_i = sum_v v * c * (2F + c + 1)
        gini_ppm  = 1e6 * (S2 - (n+1) * T) / (n * T)   [avg-rank ties]
        top share = sum over values DESC of min(c, remaining k) * v,
                    k = ceil(n * top_pct / 100)

    via truncating division of non-negative BIGINTs (identical in
    both engines) behind TWO fail-loud guards: the ``_PPM_SAFE``
    ratio guard (operators/text.py) on the ppm numerators, and an
    aggregate-grain n*T <= 2^61 refusal (below it every moment is
    bounded, s2 <= T*(2n+1) < 2^63; beyond it Spark would wrap the
    s2 sum silently where DuckDB errors). At that scale bucket token
    counts before ranking, or pre-aggregate per (group, shard)
    upstream.

    Scale shape: one scan to (group, n_tokens) value counts, then
    windows over the |groups x distinct-counts| relation only.
    """
    from .text import _ratio_ppm_expr, bpe_token_count

    # NULL text diverges between engines (Spark size() = -1, DuckDB
    # len() = NULL) -- drop it here and in the twin.
    per_doc = df.filter(F.col(text_col).isNotNull()).select(
        F.col(group_col).alias("grp"),
        bpe_token_count(text_col).cast("long").alias("v"),
    )
    vc = per_doc.groupBy("grp", "v").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    w_asc = (
        Window.partitionBy("grp").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = (
        Window.partitionBy("grp")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    # One sorted window pass yields both the rank prefix f and the
    # group total n -- so the top-percent take folds into the SAME
    # aggregate as the moments (single scan, no self-join).
    ranked = vc.select(
        "grp", "v", "c",
        F.coalesce(F.sum("c").over(w_asc), F.lit(0)).alias("f"),
        F.sum("c").over(w_all).alias("n"),
    )
    k = f"( (n * {top_pct} + 99) DIV 100 )"
    out = ranked.groupBy("grp").agg(
        F.max("n").cast("long").alias("n_docs"),
        F.sum(F.col("v") * F.col("c")).cast("long").alias("total_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_counts"),
        F.sum(
            F.col("v") * F.col("c")
            * (F.lit(2) * F.col("f") + F.col("c") + F.lit(1))
        ).cast("long").alias("s2"),
        F.sum(F.expr(
            f"v * LEAST(c, GREATEST({k} - (n - f - c),"
            " CAST(0 AS BIGINT)))"
        )).cast("long").alias("top_tokens"),
    )
    # Fail-loud aggregate guard (the ar1_by_key discipline): with
    # n*T <= 2^61, every moment is bounded -- s2 = sum v*c*(2F+c+1)
    # <= T*(2n+1) < 2^63 -- so below the guard neither engine can
    # overflow; beyond it Spark would WRAP s2's sum silently while
    # DuckDB errors on the HUGEINT cast. The guard reads only n and
    # T (always safe) and raises BEFORE any s2-derived value is
    # emitted, so both engines refuse loudly.
    nt_guard = (
        "CASE WHEN total_tokens > 0 AND n_docs >"
        " 2305843009213693952 DIV total_tokens"  # 2^61
        " THEN CAST(raise_error('gini_concentration: n_docs *"
        " total_tokens exceeds 2^61 -- bucket token counts or"
        " pre-aggregate per (group, shard) upstream') AS BIGINT)"
        " ELSE 1 END"
    )
    return out.select(
        F.col("grp").alias(group_col),
        "n_docs", "total_tokens", "n_distinct_counts",
        F.expr(_ratio_ppm_expr(
            f"{nt_guard} * (s2 - (n_docs + 1) * total_tokens)",
            "n_docs * total_tokens", "gini_concentration",
        )).cast("long").alias("gini_ppm"),
        "top_tokens",
        F.expr(_ratio_ppm_expr(
            "top_tokens", "total_tokens", "gini_concentration",
        )).cast("long").alias("top_share_ppm"),
    )


def gini_concentration_sql(
    table: str,
    group_col: str = "source",
    text_col: str = "text",
    top_pct: int = 1,
) -> str:
    """DuckDB twin of :func:`gini_concentration` (same value-count
    ranks, same guarded ppm divisions)."""
    from .text import _ratio_ppm_sql, bpe_token_count_sql

    k = f"((n_docs * {top_pct} + 99) // 100)"
    return f"""
        WITH per_doc AS (
            SELECT {group_col} AS grp,
                   CAST({bpe_token_count_sql(text_col)} AS BIGINT) AS v
            FROM {table}
            WHERE {text_col} IS NOT NULL
        ), vc AS (
            SELECT grp, v, CAST(COUNT(*) AS BIGINT) AS c
            FROM per_doc GROUP BY grp, v
        ), ranked AS (
            SELECT grp, v, c,
                   CAST(COALESCE(SUM(c) OVER (
                       PARTITION BY grp ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND 1 PRECEDING), 0) AS BIGINT) AS f,
                   CAST(SUM(c) OVER (PARTITION BY grp) AS BIGINT) AS n
            FROM vc
        ), agg AS (
            SELECT grp,
                   CAST(MAX(n) AS BIGINT) AS n_docs,
                   CAST(SUM(v * c) AS BIGINT) AS total_tokens,
                   CAST(COUNT(*) AS BIGINT) AS n_distinct_counts,
                   CAST(SUM(v * c * (2 * f + c + 1)) AS BIGINT) AS s2,
                   CAST(SUM(v * LEAST(c, GREATEST(
                       {k.replace("n_docs", "n")} - (n - f - c),
                       CAST(0 AS BIGINT)))) AS BIGINT) AS top_tokens
            FROM ranked GROUP BY grp
        )
        SELECT grp AS {group_col},
               n_docs, total_tokens, n_distinct_counts,
               {_ratio_ppm_sql(
                   "CASE WHEN total_tokens > 0 AND n_docs >"
                   " 2305843009213693952 // total_tokens"
                   " THEN CAST(error('gini_concentration: n_docs *"
                   " total_tokens exceeds 2^61 -- bucket token"
                   " counts or pre-aggregate upstream') AS BIGINT)"
                   " ELSE 1 END"
                   " * (s2 - (n_docs + 1) * total_tokens)",
                   "n_docs * total_tokens", "gini_concentration",
               )} AS gini_ppm,
               top_tokens,
               {_ratio_ppm_sql(
                   "top_tokens", "total_tokens",
                   "gini_concentration",
               )} AS top_share_ppm
        FROM agg
    """


# --- packing waste audit: concat-and-cut vs no-split packers (round-11) --------------

def packing_waste_audit(
    chunks: DataFrame,
    capacity: int,
    n_shards: int = 8,
    bucket_width: int = 8,
    id_col: str = "doc_id",
    chunk_col: str = "chunk_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """One-row audit that turns the packing choice into measured
    numbers: exact padded-slot counts for the three packers a
    training pipeline actually chooses between, within the same md5
    shards :func:`pack_sequences` uses.

    - **cut** (concat-and-cut, = pack_sequences): chunks may split
      across bin boundaries; waste is one partial bin per shard --
      the per-shard LOWER BOUND ceil(tokens/capacity) for any packer.
    - **shelf** (quantized shelves, SQL-exact): sizes rounded UP to
      ``bucket_width`` multiples; a bin holds ``capacity div b``
      same-bucket chunks (the training-side sibling of
      inference_batch_packing's length bucketing). No split, no
      sequential state -- computable by pure aggregation in BOTH
      engines, so its padded slots are oracle-exact.
    - **bfd** (best-fit decreasing, engine-side): the strongest
      classical no-split heuristic, per-shard applyInPandas (sort
      desc, place into the fullest bin that still fits). Its bin
      count is not SQL-expressible, so it is attested by guarantee
      flags: per-shard validity + accounting identity by
      construction, ``bfd >= cut`` bins (the lower-bound theorem),
      the any-fit half-full theorem (at most ONE bin per shard at
      most half full), and ``bfd <= shelf`` (not a theorem --
      measured on this corpus, deterministic given the md5 shards;
      it IS the audit's point: decreasing best-fit dominates
      quantized shelves here, and the flag turning 0 on some future
      corpus is exactly the signal to re-measure). The column is
      named ``bfd_le_shelf_measured`` -- the oracle pins it to the
      corpus-measured value, so a future mismatch self-explains as
      "re-measure the corpus", not an engine bug (round-11 ADVICE).

    Oversize chunks (> capacity) make no-split packing infeasible:
    fail-loud refusal in both engines, not a silent drop.

    Scale shape: the exact arms are one aggregate each over (shard)
    / (shard, bucket) grains; BFD is one applyInPandas over
    ``n_shards`` groups -- per-shard memory is the shard's chunk
    list (raise ``n_shards`` with corpus size; the shard count only
    changes waste by one partial bin per extra shard).
    """
    import pandas as pd
    from pyspark.sql import types as T_

    from .sample import hash_bucket
    from .text import _ratio_ppm_expr

    oversize = (
        f"CASE WHEN {tokens_col} > {capacity} OR {tokens_col} <= 0"
        f" THEN CAST(raise_error('packing_waste_audit: chunk size"
        f" outside (0, capacity] -- no-split packing infeasible')"
        f" AS BIGINT) ELSE CAST({tokens_col} AS BIGINT) END"
    )
    base = chunks.select(
        hash_bucket(F.col(id_col), buckets=n_shards, salt="pack")
        .alias("shard"),
        F.col(id_col).alias("id"),
        F.col(chunk_col).alias("chunk_id"),
        F.expr(oversize).alias("s"),
    )

    per_shard = base.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.sum("s").cast("long").alias("tok"),
    )
    cut = per_shard.agg(
        F.sum("n_chunks").cast("long").alias("n_chunks"),
        F.sum("tok").cast("long").alias("total_tokens"),
        F.sum(F.expr(f"(tok + {capacity} - 1) DIV {capacity}"))
        .cast("long").alias("cut_bins"),
    )

    # Bucket rounds UP to the next bucket_width multiple, clamped to
    # capacity (a chunk in (capacity - w, capacity] fills a bin alone;
    # without the clamp, capacity DIV b would be zero).
    shelf_grp = base.select(
        "shard", "s",
        F.expr(f"LEAST(((s + {bucket_width} - 1) DIV {bucket_width})"
               f" * {bucket_width}, {capacity})").alias("b"),
    ).groupBy("shard", "b").agg(
        F.count(F.lit(1)).cast("long").alias("c"),
    )
    shelf = shelf_grp.select(
        F.expr(
            f"(c + ({capacity} DIV b) - 1) DIV ({capacity} DIV b)"
        ).alias("bins"),
    ).agg(F.sum("bins").cast("long").alias("shelf_bins"))

    out_schema = T_.StructType([
        T_.StructField("bfd_bins", T_.LongType()),
        T_.StructField("bfd_padded", T_.LongType()),
        T_.StructField("n_half_light", T_.LongType()),
        T_.StructField("valid", T_.IntegerType()),
    ])

    def _bfd(pdf: pd.DataFrame) -> pd.DataFrame:
        import bisect

        sizes = pdf.sort_values(
            ["s", "id", "chunk_id"], ascending=[False, True, True]
        )["s"].tolist()
        fills: list[int] = []
        remaining: list[int] = []  # sorted ascending
        order: list[int] = []  # remaining -> original bin idx (parallel)
        for s in sizes:
            i = bisect.bisect_left(remaining, s)
            if i < len(remaining):
                # best fit: smallest remaining >= s
                r = remaining.pop(i)
                j = order.pop(i)
                fills[j] += s
                nr = r - s
                k = bisect.bisect_left(remaining, nr)
                remaining.insert(k, nr)
                order.insert(k, j)
            else:
                fills.append(s)
                k = bisect.bisect_left(remaining, capacity - s)
                remaining.insert(k, capacity - s)
                order.insert(k, len(fills) - 1)
        total = sum(fills)
        valid = int(
            all(0 < f <= capacity for f in fills)
            and total == int(pdf["s"].sum())
        )
        return pd.DataFrame({
            "bfd_bins": [len(fills)],
            "bfd_padded": [len(fills) * capacity - total],
            "n_half_light": [
                sum(1 for f in fills if 2 * f <= capacity)
            ],
            "valid": [valid],
        })

    bfd = base.groupBy("shard").applyInPandas(
        _bfd, out_schema
    ).agg(
        F.sum("bfd_bins").cast("long").alias("bfd_bins"),
        F.sum("bfd_padded").cast("long").alias("bfd_padded"),
        F.max("n_half_light").cast("long").alias("max_half_light"),
        F.min("valid").cast("int").alias("bfd_valid"),
    )

    row = (
        cut.crossJoin(F.broadcast(shelf)).crossJoin(F.broadcast(bfd))
    )
    return row.select(
        "n_chunks", "total_tokens",
        "cut_bins",
        F.expr(f"cut_bins * {capacity} - total_tokens").cast("long")
        .alias("cut_padded_slots"),
        "shelf_bins",
        F.expr(f"shelf_bins * {capacity} - total_tokens").cast("long")
        .alias("shelf_padded_slots"),
        F.expr(_ratio_ppm_expr(
            f"cut_bins * {capacity} - total_tokens",
            f"cut_bins * {capacity}", "packing_waste_audit",
        )).cast("long").alias("waste_cut_ppm"),
        F.expr(_ratio_ppm_expr(
            f"shelf_bins * {capacity} - total_tokens",
            f"shelf_bins * {capacity}", "packing_waste_audit",
        )).cast("long").alias("waste_shelf_ppm"),
        F.col("bfd_valid").cast("int").alias("bfd_valid"),
        (F.col("bfd_bins") >= F.col("cut_bins")).cast("int")
        .alias("bfd_ge_cut_bins"),
        (F.col("bfd_bins") <= F.col("shelf_bins")).cast("int")
        .alias("bfd_le_shelf_measured"),
        (F.col("max_half_light") <= F.lit(1)).cast("int")
        .alias("bfd_half_full_bound"),
        (F.col("bfd_padded")
         == F.col("bfd_bins") * capacity - F.col("total_tokens"))
        .cast("int").alias("bfd_accounting_ok"),
    )


def packing_waste_audit_sql(
    chunks_sql: str,
    capacity: int,
    n_shards: int = 8,
    bucket_width: int = 8,
    id_col: str = "doc_id",
    chunk_col: str = "chunk_id",
    tokens_col: str = "n_tokens",
) -> str:
    """DuckDB twin of :func:`packing_waste_audit`: the cut and shelf
    arms are recomputed exactly; the four BFD guarantee flags are
    stated as constants (they hold by construction / theorem /
    pinned measurement -- the heavy_hitters_events precedent)."""
    from .sample import hash_bucket_sql
    from .text import _ratio_ppm_sql

    shard = hash_bucket_sql(id_col, buckets=n_shards, salt="pack")
    return f"""
        WITH chunks AS ({chunks_sql}),
        base AS (
            SELECT CAST({shard} AS BIGINT) AS shard,
                   CASE WHEN {tokens_col} > {capacity}
                             OR {tokens_col} <= 0
                        THEN CAST(error('packing_waste_audit: chunk'
                             ' size outside (0, capacity] -- no-split'
                             ' packing infeasible') AS BIGINT)
                        ELSE CAST({tokens_col} AS BIGINT) END AS s
            FROM chunks
        ),
        per_shard AS (
            SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_chunks,
                   CAST(SUM(s) AS BIGINT) AS tok
            FROM base GROUP BY shard
        ),
        cut AS (
            SELECT CAST(SUM(n_chunks) AS BIGINT) AS n_chunks,
                   CAST(SUM(tok) AS BIGINT) AS total_tokens,
                   CAST(SUM((tok + {capacity} - 1) // {capacity})
                        AS BIGINT) AS cut_bins
            FROM per_shard
        ),
        shelf_grp AS (
            SELECT shard,
                   LEAST(((s + {bucket_width} - 1) // {bucket_width})
                       * {bucket_width}, {capacity}) AS b,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM base GROUP BY 1, 2
        ),
        shelf AS (
            SELECT CAST(SUM(
                (c + ({capacity} // b) - 1) // ({capacity} // b)
            ) AS BIGINT) AS shelf_bins
            FROM shelf_grp
        )
        SELECT n_chunks, total_tokens, cut_bins,
               CAST(cut_bins * {capacity} - total_tokens AS BIGINT)
                   AS cut_padded_slots,
               shelf_bins,
               CAST(shelf_bins * {capacity} - total_tokens AS BIGINT)
                   AS shelf_padded_slots,
               {_ratio_ppm_sql(
                   f"cut_bins * {capacity} - total_tokens",
                   f"cut_bins * {capacity}", "packing_waste_audit",
               )} AS waste_cut_ppm,
               {_ratio_ppm_sql(
                   f"shelf_bins * {capacity} - total_tokens",
                   f"shelf_bins * {capacity}", "packing_waste_audit",
               )} AS waste_shelf_ppm,
               1 AS bfd_valid,
               1 AS bfd_ge_cut_bins,
               1 AS bfd_le_shelf_measured,
               1 AS bfd_half_full_bound,
               1 AS bfd_accounting_ok
        FROM cut CROSS JOIN shelf
    """


# --- top-k vocabulary coverage (round-11) --------------------------------------------

def vocab_coverage_topk(
    df: DataFrame,
    ks: tuple[int, ...] = (100, 1_000, 8_000),
    text_col: str = "text",
    ngram: int = 1,
) -> DataFrame:
    """Token-mass coverage of the top-k vocabulary -- the
    vocab-truncation dial next to tokenizer fertility: what fraction
    of all running units would a k-entry vocabulary cover (the rest
    become OOV/byte-fallback)? With ``ngram=1`` the units are
    whitespace tokens ("is 8k vocab enough for this corpus"); with
    ``ngram=2`` they are adjacent token pairs and the same curve
    sizes a BPE MERGE table (what share of pair occurrences do the
    top-k candidate merges absorb -- the dial next to
    bpe_learned_merges and pmi_bigrams).

    Rank is deterministic: count DESC, unit ASC (the repo's
    tie-break discipline). Scale shape: totals are one aggregate of
    the VOCABULARY relation (|distinct units|, never corpus grain);
    the rank itself only matters for the top ``max(ks)`` units, so
    the engine takes them with a distributed ``orderBy().limit()``
    (TakeOrderedAndProject -- per-partition top-k then a k-row
    merge, NO single-partition sort of the vocabulary) and runs the
    row_number window over that parameter-bounded relation.
    Coverage is an exact-ppm guarded ratio.

    Output: one row per k: (k, vocab_size, total_tokens,
    covered_tokens, coverage_ppm).
    """
    from .text import _ratio_ppm_expr

    toks = tokens(text_col)
    if ngram == 1:
        units = toks
    elif ngram == 2:
        units = F.when(
            F.size(toks) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(toks, i), F.element_at(toks, i + 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
    else:
        raise ValueError("vocab_coverage_topk: ngram must be 1 or 2")
    # NULL text diverges between engines (Spark size() = -1, DuckDB
    # len() = NULL) -- drop it here and in the twin.
    from .skew import ensure_parallel_scan

    vocab = (
        ensure_parallel_scan(
            df.filter(F.col(text_col).isNotNull()), text_col
        )
        .select(F.explode(units).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    from .caching import persisted

    # persisted: the count relation feeds the totals aggregate AND
    # the top-k take -- one explode materialization instead of two
    vocab = persisted(vocab)
    totals = vocab.agg(
        F.count(F.lit(1)).cast("long").alias("vocab_size"),
        F.sum("cnt").cast("long").alias("total_tokens"),
    )
    mk = max(int(k) for k in ks)
    w_rank = Window.orderBy(F.col("cnt").desc(), F.col("w"))
    # TakeOrderedAndProject keeps the global sort bounded by the
    # PARAMETER max(ks); the row_number window then runs over <= mk
    # rows, never the vocabulary
    top = vocab.orderBy(F.col("cnt").desc(), F.col("w")).limit(mk)
    ranked = top.select(
        "cnt",
        F.row_number().over(w_rank).alias("r"),
    )
    # ONE aggregate computes every k's covered mass (a per-k union
    # would re-run the corpus explode and the rank once per arm --
    # Spark does no cross-branch CSE); the per-k rows come from a
    # stack() unpivot of that single row.
    one = ranked.agg(
        *[
            F.coalesce(
                F.sum(F.when(F.col("r") <= int(k), F.col("cnt"))),
                F.lit(0),
            ).cast("long").alias(f"cov_{i}")
            for i, k in enumerate(ks)
        ],
    ).crossJoin(F.broadcast(totals))
    stack = ", ".join(
        f"CAST({int(k)} AS BIGINT), cov_{i}" for i, k in enumerate(ks)
    )
    return one.select(
        F.expr(f"stack({len(ks)}, {stack}) AS (k, covered_tokens)"),
        "vocab_size", "total_tokens",
    ).select(
        "k", "vocab_size", "total_tokens", "covered_tokens",
        F.expr(_ratio_ppm_expr(
            "covered_tokens", "total_tokens",
            "vocab_coverage_topk",
        )).cast("long").alias("coverage_ppm"),
    )


def vocab_coverage_topk_sql(
    table: str,
    ks: tuple[int, ...] = (100, 1_000, 8_000),
    text_col: str = "text",
    ngram: int = 1,
) -> str:
    """DuckDB twin of :func:`vocab_coverage_topk` (same rank
    tie-break, same guarded ppm ratio)."""
    from .text import _ratio_ppm_sql

    mk = max(int(k) for k in ks)
    arms = "\nUNION ALL\n".join(
        f"""
        SELECT CAST({k} AS BIGINT) AS k,
               CAST((SELECT vsize FROM totals) AS BIGINT)
                   AS vocab_size,
               CAST((SELECT total FROM totals) AS BIGINT)
                   AS total_tokens,
               CAST(COALESCE(SUM(CASE WHEN r <= {k} THEN cnt END), 0)
                    AS BIGINT) AS covered_tokens,
               {_ratio_ppm_sql(
                   "CAST(COALESCE(SUM(CASE WHEN r <= " + str(k)
                   + " THEN cnt END), 0) AS BIGINT)",
                   "CAST((SELECT total FROM totals) AS BIGINT)",
                   "vocab_coverage_topk",
               )} AS coverage_ppm
        FROM ranked
        """
        for k in ks
    )
    if ngram == 1:
        unit_rel = f"""
                SELECT unnest(regexp_split_to_array({text_col}, ' +'))
                    AS w
                FROM {table}
                WHERE {text_col} IS NOT NULL
        """
    elif ngram == 2:
        unit_rel = f"""
                SELECT unnest(list_transform(
                    range(1, len(a)), i -> a[i] || ' ' || a[i + 1]
                )) AS w
                FROM (
                    SELECT regexp_split_to_array({text_col}, ' +') AS a
                    FROM {table}
                    WHERE {text_col} IS NOT NULL
                )
        """
    else:
        raise ValueError("vocab_coverage_topk_sql: ngram must be 1 or 2")
    return f"""
        WITH vocab AS (
            SELECT u.w AS w, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM (
                {unit_rel}
            ) u
            GROUP BY u.w
        ), totals AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS vsize,
                   CAST(SUM(cnt) AS BIGINT) AS total
            FROM vocab
        ), ranked AS (
            SELECT cnt, r FROM (
                SELECT cnt,
                       ROW_NUMBER() OVER (ORDER BY cnt DESC, w) AS r
                FROM vocab
            ) WHERE r <= {mk}
        )
        {arms}
    """
