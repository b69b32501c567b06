"""Deduplication operators for large text corpora (north-star par.2b).

Four tiers, cheapest first:

1. exact          -- hash-groupBy on a normalized-text fingerprint;
                     one shuffle on a 32-byte key, never on the text.
2. ngram_jaccard  -- exact n-gram-shingle Jaccard over candidate pairs
                     generated from a shared-shingle inverted index
                     (the classic blocking trick: only pairs that share
                     >= 1 shingle are scored, never the full n^2).
3. simhash        -- 64-bit SimHash per doc, JVM-side (xxhash64 +
                     bit-bucket aggregation); near-dups = equal or
                     low-Hamming fingerprints.
4. minhash_lsh    -- codegen minhash signatures (xxhash64+array_min)
                     -> banded bucket join -> exact rescore of
                     candidates; the 100 TB path (sub-quadratic,
                     tunable recall via num_hash_tables).

All four tiers are pure DataFrame expressions (round 2's MLlib
MinHashLSH variant was replaced by the codegen form: same banding
semantics, ~3.5x faster, exact rather than feature-hashed rescoring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import fingerprint, tokens


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One surviving row (min id) per normalized-text fingerprint.

    Returns (fp, keep_id, n_dups). Shuffles on the md5 fingerprint --
    constant-width key regardless of document size; map-side partial
    agg collapses local duplicates before the exchange.
    """
    return (
        df.select(fingerprint(text_col).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


# Operator-owned landing markers (Hadoop FS API: HDFS/S3A/local all
# work, and unlike Spark's _SUCCESS they do not depend on
# mapreduce.fileoutputcommitter.marksuccessfuljobs staying enabled).
# Two markers close the two crash windows of land-then-append:
#   _LANDING_COMPLETE  -- written right after the survivors land;
#   _STORE_APPENDED    -- written right after their fingerprints are
#                         appended to the store.
_MARK_LANDED = "_LANDING_COMPLETE"
_MARK_APPENDED = "_STORE_APPENDED"


def _marker_path(spark, out_path: str, name: str):
    jvm = spark._jvm
    return jvm.org.apache.hadoop.fs.Path(out_path + "/" + name)


def _marker_exists(spark, out_path: str, name: str) -> bool:
    path = _marker_path(spark, out_path, name)
    conf = spark._jsc.hadoopConfiguration()
    return path.getFileSystem(conf).exists(path)


def _write_marker(spark, out_path: str, name: str) -> None:
    path = _marker_path(spark, out_path, name)
    conf = spark._jsc.hadoopConfiguration()
    path.getFileSystem(conf).create(path, True).close()


def batch_dedup_plan(
    new_docs: DataFrame,
    store_fps: DataFrame | None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The UNEXECUTED survivor plan :func:`incremental_exact_dedup`
    lands: fingerprint the batch (null text -> sentinel), keep the
    min-id row per fingerprint within the batch, then anti-join the
    persistent store's fingerprints (``store_fps``, a ``fp`` column;
    None for the first batch). Exposed separately so the plan audit
    (tools/plan_audit.py) can explain the scenario queries' inner
    probe -- the shape that dominates at 100 TB -- instead of the
    one-row summary frame they return (round-8 verdict item 3).
    """
    fresh = new_docs.withColumn(
        "fp",
        F.coalesce(
            fingerprint(text_col), F.lit("__null_text_sentinel__")
        ),
    )
    keep = fresh.groupBy("fp").agg(F.min(id_col).alias(id_col))
    batch_unique = fresh.join(keep, ["fp", id_col], "left_semi")
    if store_fps is None:
        return batch_unique
    return batch_unique.join(store_fps.select("fp"), "fp", "left_anti")


def incremental_exact_dedup(
    spark,
    new_docs: DataFrame,
    store_path: str,
    out_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact dedup ACROSS ingestion batches: drop new docs whose
    content fingerprint already exists in a persistent parquet store,
    dedup the remainder within the batch (keep min id), LAND the
    survivors at ``out_path``, append their fingerprints to the store,
    and return the landed survivors.

    This is the batch-cadence twin of the streaming ``stream_dedup``
    (dropDuplicatesWithinWatermark): streaming state bounds memory by
    a watermark horizon, while the parquet store carries exact state
    across runs indefinitely -- the shape a continuously-ingested
    training corpus needs.

    Ordering matters and caching cannot save you: Spark re-lists a
    parquet directory per action, so any LAZY plan that anti-joins
    against the store and is evaluated after the append would see the
    batch's own just-written fingerprints and return nothing (and a
    persisted plan does not pin the listing either -- the cache key
    contains it). The fix is the production shape anyway: materialize
    the batch output FIRST (each ingestion batch lands as its own
    dataset), derive the fingerprint append from the LANDED files, and
    return a read of them.

    Scale: the store holds (fp, keep_id) -- 32-byte keys, never text.
    The membership probe is an equi-join on fp; at large scale write
    the store bucketed by fp so the probe co-locates without a
    shuffle, and compact it periodically.

    Null text: ``fingerprint`` of a null document is null, and null
    join keys match nothing -- without the sentinel below, null-text
    docs would silently vanish from the survivors (dropped by the
    keep-semi-join, never recorded). They are instead fingerprinted
    with a fixed sentinel, so all null-text docs dedup to one
    surviving row per corpus lifetime, visible in store and output.

    Crash/replay contract (at-least-once drivers, e.g. streaming
    foreachBatch). Two operator-owned markers in ``out_path`` close
    the two windows of land-then-append -- Spark's own _SUCCESS is
    deliberately NOT used (it disappears when
    mapreduce.fileoutputcommitter.marksuccessfuljobs is disabled, the
    standard object-store setting, which would silently disarm the
    guard):

    - _STORE_APPENDED present: the batch fully completed; a replay
      returns the landing untouched. Without this guard a replayed
      batch would probe a store that already holds its fingerprints,
      produce an EMPTY survivor set, and the overwrite would destroy
      the previously landed files -- silent data loss.
    - _LANDING_COMPLETE present (crash between landing and store
      append): the replay re-appends the landing's fingerprints and
      never re-probes. Duplicate store rows from repeated crashes
      only cost space until compaction (the probe is a semi/anti
      join), while a MISSING append would let later batches re-admit
      the content.
    - neither: a half-written landing; re-run from scratch (the
      overwrite replaces the partial files).
    """
    if _marker_exists(spark, out_path, _MARK_APPENDED):
        # full replay: landing AND store append both completed
        return spark.read.parquet(out_path).drop("fp")
    if _marker_exists(spark, out_path, _MARK_LANDED):
        # crash window replay: the landing completed but the store
        # append may not have -- re-append the landing's fingerprints
        # (duplicate store rows only cost space, see docstring) and
        # NEVER re-probe: probing a store that already holds these
        # fingerprints would overwrite the landing with nothing
        landed = spark.read.parquet(out_path)
        landed.select(
            "fp", F.col(id_col).alias("keep_id")
        ).write.mode("append").parquet(store_path)
        _write_marker(spark, out_path, _MARK_APPENDED)
        return landed.drop("fp")
    from pyspark.errors import AnalysisException

    try:
        store = spark.read.parquet(store_path).select("fp")
    except AnalysisException:  # first batch: no store yet
        store = None
    survivors = batch_dedup_plan(
        new_docs, store, text_col=text_col, id_col=id_col
    )
    survivors.write.mode("overwrite").parquet(out_path)
    _write_marker(spark, out_path, _MARK_LANDED)
    landed = spark.read.parquet(out_path)
    landed.select(
        "fp", F.col(id_col).alias("keep_id")
    ).write.mode("append").parquet(store_path)
    _write_marker(spark, out_path, _MARK_APPENDED)
    return landed.drop("fp")


def compact_fingerprint_store(
    spark,
    src_store: str,
    dst_store: str,
    dedup_cols: tuple[str, ...] = ("fp",),
) -> int:
    """Blue/green compaction for the append-only fingerprint stores
    (incremental exact dedup's (fp, keep_id), incremental simhash's
    simhash rows): rewrite the store with duplicate rows collapsed
    (min row per ``dedup_cols``, matching the probe's semi/anti-join
    semantics where duplicates only cost space) into ``dst_store``,
    then drop a ``_STORE_APPENDED`` marker so the caller's next batch
    can point at it with the usual replay contract. Returns the
    compacted row count.

    Why a NEW path instead of in-place: parquet directories have no
    atomic replace on object stores -- an in-place rewrite would have
    a crash window where the store is lost, which for a dedup store
    means silently re-admitting every historical duplicate. Blue/
    green keeps ``src_store`` intact until the caller has switched;
    a crash mid-compaction leaves an incomplete ``dst_store`` WITHOUT
    the marker, which the caller must treat as garbage (check
    ``_marker_exists(spark, dst_store, "_STORE_APPENDED")`` before
    switching). Run it between batches (one writer at a time, the
    same single-writer contract as the appends themselves).
    """
    store = spark.read.parquet(src_store)
    other = [c for c in store.columns if c not in dedup_cols]
    compacted = store.groupBy(*dedup_cols).agg(
        *[F.min(c).alias(c) for c in other]
    ) if other else store.select(*dedup_cols).distinct()
    compacted.write.mode("overwrite").parquet(dst_store)
    _write_marker(spark, dst_store, _MARK_APPENDED)
    return spark.read.parquet(dst_store).count()


def word_shingles(text_col: str, n: int = 3) -> F.Column:
    """Distinct n-word shingles of a document as an array column.

    Pure array expressions (split -> transform over a sequence of start
    offsets -> slice+join) -- stays in codegen, no explode until the
    caller chooses to build the inverted index.
    """
    toks = tokens(text_col)
    starts = F.sequence(F.lit(0), F.size(toks) - n)
    return F.array_distinct(
        F.when(
            F.size(toks) >= n,
            F.transform(
                starts,
                lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
            ),
        ).otherwise(F.array(F.array_join(toks, " ")))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: float | None = None,
) -> DataFrame:
    """All (id_a < id_b) pairs with shingle-Jaccard >= threshold.

    Plan: per-doc distinct shingle array -> explode into an inverted
    index (shingle -> doc) -> self-join on shingle to get candidate
    pairs with their intersection size in one aggregation -> Jaccard =
    inter / (|A| + |B| - inter), filter.

    Scale: the self-join is an equi-join on the shingle hash; hot
    shingles (stopword runs) are the skew risk. Two mitigations: AQE
    skew-join splits oversized partitions at runtime, and
    ``max_doc_freq`` drops STOP-SHINGLES up front -- any shingle
    appearing in more than ``max_doc_freq * n_docs`` documents is
    removed from every shingle set before the join (the standard
    hot-key guard at 100 TB: a shingle in 1% of 10^10 docs would alone
    contribute 10^16 candidate pairs). Jaccard is then computed over
    the REDUCED sets, identically in the SQL twin. Docs whose shingles
    are all stop-shingles drop out of the pair graph.

    The per-doc index tables are PERSISTED (memory-and-disk) via the
    caching ledger: without that, Catalyst inlines the shingle
    expression into both self-join sides and the whole index is
    recomputed per side -- measured 6x slower at sf0.1. Materializing
    the index before a self-join is also the production shape at 100 TB
    (write it once, scan it twice). Callers release via
    ``operators.caching.release_all()`` at their query boundary.
    """
    from .caching import persisted

    sh = persisted(
        df.select(
            F.col(id_col).alias("id"),
            word_shingles(text_col, n).alias("shingles"),
        )
    )
    if max_doc_freq is None:
        inv = sh.select(
            "id",
            F.size("shingles").alias("n_sh"),
            F.explode("shingles").alias("shingle"),
        )
    else:
        exploded = sh.select("id", F.explode("shingles").alias("shingle"))
        # shingle doc-frequency (shingles are distinct per doc, so a
        # plain count IS the doc freq); the cutoff is a fraction of the
        # corpus size, folded in lazily as a broadcast scalar
        n_docs = sh.agg(F.count(F.lit(1)).alias("n_docs"))
        hot = (
            exploded.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("doc_freq"))
            .crossJoin(F.broadcast(n_docs))
            .filter(F.col("doc_freq") > F.col("n_docs") * max_doc_freq)
            .select("shingle")
        )
        # the hot set is tiny by construction (top of a Zipf curve);
        # broadcast anti-join keeps the index scan shuffle-free
        kept = exploded.join(F.broadcast(hot), "shingle", "left_anti")
        n_sh = kept.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
        inv = persisted(kept.join(n_sh, "id"))
    a = inv.select(
        F.col("id").alias("id_a"),
        F.col("n_sh").alias("n_a"),
        "shingle",
    )
    b = inv.select(
        F.col("id").alias("id_b"),
        F.col("n_sh").alias("n_b"),
        "shingle",
    )
    pairs = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
    return (
        pairs.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "inter", "jaccard")
    )


def ngram_jaccard_pairs_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: float | None = None,
) -> str:
    """DuckDB oracle for ngram_jaccard_pairs (identical semantics,
    including the optional stop-shingle drop)."""
    if max_doc_freq is None:
        index_ctes = """inv AS (
            SELECT id, len(shingles) AS n_sh, unnest(shingles) AS shingle
            FROM sh
        )"""
    else:
        index_ctes = f"""exploded AS (
            SELECT id, unnest(shingles) AS shingle FROM sh
        ), kept AS (
            SELECT id, shingle FROM exploded
            WHERE shingle NOT IN (
                SELECT shingle FROM exploded
                GROUP BY shingle
                HAVING COUNT(*) > (SELECT COUNT(*) FROM sh)
                                      * {max_doc_freq}
            )
        ), inv AS (
            SELECT id, COUNT(*) OVER (PARTITION BY id) AS n_sh, shingle
            FROM kept
        )"""
    return f"""
        WITH toks AS (
            SELECT {id_col} AS id,
                   regexp_split_to_array({text_col}, ' +') AS t
            FROM {table}
        ), sh AS (
            SELECT id,
                   CASE WHEN len(t) >= {n} THEN
                       list_distinct(list_transform(
                           range(1, len(t) - {n} + 2),
                           i -> array_to_string(t[i:i+{n}-1], ' ')))
                   ELSE [array_to_string(t, ' ')] END AS shingles
            FROM toks
        ), {index_ctes}, pairs AS (
            SELECT a.id AS id_a, b.id AS id_b,
                   a.n_sh AS n_a, b.n_sh AS n_b,
                   COUNT(*) AS inter
            FROM inv a JOIN inv b ON a.shingle = b.shingle
            WHERE a.id < b.id
            GROUP BY 1, 2, 3, 4
        )
        SELECT id_a, id_b, inter,
               inter * 1.0 / (n_a + n_b - inter) AS jaccard
        FROM pairs
        WHERE inter * 1.0 / (n_a + n_b - inter) >= {threshold}
    """


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
) -> DataFrame:
    """64-bit SimHash per document, entirely JVM-side.

    Per doc: xxhash64 each distinct token; for each bit position, the
    fingerprint bit is 1 iff more token-hashes have that bit set than
    not. Implemented as array expressions over the token-hash array
    (aggregate per bit) -- no explode, no shuffle at all: embarrassingly
    parallel per row, which is exactly what you want at 100 TB.

    Near-dup detection then groups on the fingerprint (exact) or on
    banded substrings of it (Hamming-tolerant), both plain groupBys.

    Plan-size note: the obvious form -- one aggregate expression per
    bit, summed into the fingerprint -- builds 64 independent fold
    trees and costs ~2 s of analysis+codegen per QUERY regardless of
    data size (measured: sf0.001 and sf0.1 ran in the same wall
    time). This form folds over a 64-element MASK ARRAY instead
    (outer fold: bits; inner fold: token hashes), so the expression is
    two nested higher-order functions of constant size. Per-bit vote
    arithmetic and order are unchanged -- fingerprints are identical.
    """
    return df.select(
        F.col(id_col).alias("id"),
        simhash_col(text_col, bits).alias("simhash"),
    )


def simhash_col(text_col: str = "text", bits: int = 64) -> F.Column:
    """The SimHash fingerprint as a pure per-row COLUMN expression --
    no shuffle, usable via withColumn wherever the (id, simhash)
    projection of :func:`simhash` would force a join back."""
    toks = F.array_distinct(tokens(text_col))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    # bit value per position, as longs; the last is 1<<63 = Long.MIN
    # (the sign-bit pattern). Summing DISJOINT bit values equals
    # bitwise OR, and adding Long.MIN to a non-negative partial sum
    # stays in range, so ANSI mode never sees an overflow.
    masks = F.array(*[
        F.lit((1 << b) if b < 63 else -(1 << 63)).cast("long")
        for b in range(bits)
    ])
    # vote for mask m: sum over token hashes of +-1 on (h & m) != 0;
    # bit set in the fingerprint iff the vote is positive
    return F.aggregate(
        masks,
        F.lit(0).cast("long"),
        lambda acc, m: acc
        + F.when(
            F.aggregate(
                hashes,
                F.lit(0),
                lambda a, h: a
                + F.when(h.bitwiseAND(m) != 0, 1).otherwise(-1),
            )
            > 0,
            m,
        ).otherwise(F.lit(0).cast("long")),
    )


def simhash_band_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bands: int = 4,
    max_hamming: int | None = None,
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing any 16-bit band of their
    SimHash (Hamming-LSH banding). groupBy band value -> pairs.

    ``max_hamming`` verifies candidates against the FULL fingerprint
    (bit_count(sh_a XOR sh_b) <= max_hamming) -- the standard second
    stage of SimHash dedup, and the difference between a candidate
    generator and a usable near-dup detector. On a low-entropy corpus
    the 16-bit bands collide broadly (measured: 5,000 sf0.1 docs ->
    1.26M raw band-collision pairs, of which only the low-Hamming
    sliver are near-dups); the verify filter runs BEFORE the
    dropDuplicates exchange, so the junk never shuffles. Pigeonhole
    guarantee: any pair with Hamming <= n_bands - 1 shares at least
    one band, so recall at ``max_hamming <= n_bands - 1`` is total.

    The fingerprint table is persisted via the caching ledger: the
    64-bit-vote expression is the expensive part (64 aggregate passes
    over the token-hash array per doc) and BOTH self-join sides scan
    it -- without the persist Catalyst inlines it into each side and
    fingerprints the corpus twice.
    """
    from .caching import persisted

    fps = persisted(simhash(df, text_col, id_col))
    band_width = 64 // n_bands
    mask = (1 << band_width) - 1
    bands = fps.select(
        "id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftrightunsigned("simhash", i * band_width)
                    .bitwiseAND(F.lit(mask))
                    .alias("key"),
                )
                for i in range(n_bands)
            ])
        ).alias("bk"),
    ).select("id", "simhash", "bk.band", "bk.key")
    a = bands.select(
        F.col("id").alias("id_a"), F.col("simhash").alias("sh_a"),
        "band", "key",
    )
    b = bands.select(
        F.col("id").alias("id_b"), F.col("simhash").alias("sh_b"),
        "band", "key",
    )
    cand = a.join(b, ["band", "key"]).filter(F.col("id_a") < F.col("id_b"))
    if max_hamming is not None:
        hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
        cand = cand.filter(hamming <= max_hamming)
    return (
        cand.select("id_a", "id_b", "sh_a", "sh_b")
        .dropDuplicates(["id_a", "id_b"])
    )


def dedup_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
    check_every: int = 2,
    truncate_every: int = 8,
    skip_empty_check: bool = False,
) -> DataFrame:
    """Resolve near-dup PAIRS into duplicate GROUPS: connected
    components by iterative min-label propagation.

    Returns (id, component) for every id appearing in ``pairs``, where
    component = the smallest id reachable through the pair graph (so
    keep-the-min-id dedup policy falls out directly).

    Spark has no native connected components; the scalable
    re-expression is the classic label-propagation loop (the same
    shape GraphX/Pregel uses): each round every node adopts the
    minimum label among itself and its neighbors, converging in
    O(graph diameter) rounds. Near-dup graphs are shallow (dup
    clusters are cliques or short chains), so a handful of rounds
    suffice; ``max_iter`` caps adversarial chains.

    Scale per round: one equi-join edges->labels + one min-aggregate,
    both shuffling on node id -- no component ever needs to fit in one
    task, unlike collect-based union-find. Labels persist per round
    (released once a later round is materialized past them) so the
    lineage does not grow with iterations.

    The edge set carries an explicit SELF-LOOP per node so a round is
    ONE join + ONE aggregate with the label frame referenced exactly
    once: min over neighbors-including-self. Referencing labels twice
    per round (neighbor-min joined back to the previous labels, the
    naive formulation) doubles the logical plan every round --
    caching truncates EXECUTION but not the plan tree, so Catalyst
    analysis goes exponential in rounds (measured: round 6 of a
    469-edge graph took 126 s to plan vs 1.5 s for round 1). With
    self-loops the plan grows one fixed layer per round.

    Driver-side coordination is ONE scalar action per ``check_every``
    rounds (not per round): labels are monotone non-increasing, so "the
    newest round changed nothing vs the round before it" IS the
    fixpoint test, and rounds between checks simply ride along inside
    the next check's job (persist is lazy -- the check action
    materializes every intermediate round it computes through). The
    trade: up to ``check_every - 1`` extra propagation rounds after
    convergence, against ~1/check_every as many scheduled jobs -- on
    shallow near-dup graphs the job scheduling IS the dominant cost
    (measured on curation_pipeline_stats: small-job overhead, not
    data).

    The fixpoint test itself compares exact label-SUMS of the two
    newest rounds, not a row-level join (optimization round 13, guide
    par.2.4: the join form re-shuffled/broadcast both cached rounds
    per check -- measured ~2.5 s of the component-store merge's wall
    at sf0.1 -- where two map-combinable one-row aggregates in one
    union job cost one cached scan each, no exchange). Equivalence is
    airtight, not probabilistic: the self-loop makes every new label
    min(old label, neighbors), so labels are POINTWISE non-increasing;
    the node set is fixed per round (groupBy over the same edge set);
    sums are exact DECIMAL(38,0) integer arithmetic. Therefore
    sum(new) == sum(prev) iff no label changed.

    Raises RuntimeError if labels have not converged after
    ``max_iter`` rounds: a silently-returned partial labeling would
    split one true component into several (wrong answer), and near-dup
    graphs that deep signal a pathological corpus the caller must see.
    """
    from .caching import persisted, untrack

    if check_every < 1:
        raise ValueError(f"check_every must be >= 1, got {check_every}")
    # persist the pair set BEFORE the symmetrize union: both union
    # branches scan it during the edges fill, and the upstream pair
    # plan is typically an expensive join (inverted-index or banded) --
    # without this it executes twice in that one materialization
    pairs = persisted(pairs.select(id_a, id_b))
    # Empty-graph short-circuit: a clean corpus (or a no-edge
    # threshold) reaches here with ZERO pairs, and every propagation
    # round would be a scheduled no-op job -- measured 2.5-8 s of
    # pure fixed overhead inside semdedup on the sf0.1 embeddings
    # (round-10 flagship profile: keep == n, empty edge set). The
    # isEmpty() action materializes the persisted pair relation the
    # first round would have materialized anyway, so the check is
    # nearly free on non-empty graphs -- but it IS one scheduled
    # action, and a caller that already knows the graph is non-empty
    # (or whose empty case flows through harmlessly, like the
    # component store's contracted merge: an empty batch yields an
    # empty labeling either way) can opt out and save the job.
    if not skip_empty_check and pairs.isEmpty():
        return (
            pairs.select(F.col(id_a).alias("id"))
            .withColumn("component", F.col("id"))
        )
    sym = pairs.select(
        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
    ).unionAll(
        pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
    )
    nodes = sym.select(F.col("src").alias("id")).distinct()
    # self-loops: every node is its own neighbor, so one neighbor-min
    # aggregate IS the propagation step (no join-back to prior labels)
    edges = persisted(
        sym.unionAll(
            nodes.select(F.col("id").alias("src"), F.col("id").alias("dst"))
        )
    )
    labels = persisted(nodes.withColumn("label", F.col("id")))
    changed = -1
    behind: list[DataFrame] = []  # rounds before the last checked one
    for i in range(1, max_iter + 1):
        new_labels = persisted(
            edges.join(labels, edges.src == labels.id)
            .groupBy("dst")
            .agg(F.min("label").alias("label"))
            .select(F.col("dst").alias("id"), "label")
        )
        prev, labels = labels, new_labels
        behind.append(prev)
        if i % check_every == 0 or i == max_iter:
            # one union job, two cached-scan one-row aggregates; the
            # `w` tag makes the row->round mapping order-independent
            sums = {
                r["w"]: r["s"]
                for r in labels.select(
                    F.lit(0).alias("w"),
                    F.col("label").cast("decimal(38,0)").alias("l"),
                )
                .unionAll(
                    prev.select(
                        F.lit(1).alias("w"),
                        F.col("label").cast("decimal(38,0)").alias("l"),
                    )
                )
                .groupBy("w")
                .agg(F.sum("l").alias("s"))
                .collect()
            }
            changed = 0 if sums.get(0) == sums.get(1) else 1
            for df in behind:
                df.unpersist()
                untrack(df)
            behind = []
            if changed == 0:
                break
        if i % truncate_every == 0:
            # Deep graphs: even linear plan growth accumulates --
            # rounds of cached layers + codegen classes OOM the
            # driver past ~15 rounds. Truncate lineage to an RDD
            # scan (what GraphFrames' CC does, its
            # checkpointInterval). Deliberately OUTSIDE the
            # convergence-check branch: truncation must fire on its
            # own cadence or a check_every that does not divide
            # truncate_every would never truncate. When the session
            # has a checkpoint dir configured (a cluster should:
            # localCheckpoint data dies with an executor), the
            # RELIABLE .checkpoint() is chosen automatically;
            # otherwise localCheckpoint, which suits single-JVM runs.
            # (The truncated frame is RDD-backed, not
            # ledger-persisted; a later unpersist of it via `behind`
            # is a no-op. localCheckpoint blocks are reclaimed by the
            # ContextCleaner; reliable checkpoint FILES are deleted
            # on RDD GC only under
            # spark.cleaner.referenceTracking.cleanCheckpoints=true,
            # which session.get_spark sets -- sessions built without
            # it must clean their checkpoint dir themselves.)
            sc = labels.sparkSession.sparkContext
            reliable = sc.getCheckpointDir() is not None
            trunc = (
                labels.checkpoint() if reliable
                else labels.localCheckpoint()
            )
            labels.unpersist()
            untrack(labels)
            labels = trunc
    edges.unpersist()
    untrack(edges)
    if changed != 0:
        raise RuntimeError(
            f"connected components did not converge in {max_iter} "
            "rounds (label sums still decreasing); the pair graph "
            "has a chain deeper than max_iter -- raise max_iter"
        )
    return labels.select("id", F.col("label").alias("component"))


def dedup_components_ctes(pairs_sql: str, id_a: str = "id_a",
                          id_b: str = "id_b") -> str:
    """The recursive CTE chain computing components from a pairs
    subquery -- exposed separately so composed pipelines (e.g.
    plans/curation.py) can splice it into a larger WITH RECURSIVE
    clause. Yields CTEs: pairs, edges, nodes, reach, components."""
    return f"""pairs AS (
            {pairs_sql}
        ), edges AS (
            SELECT {id_a} AS s, {id_b} AS d FROM pairs
            UNION ALL
            SELECT {id_b} AS s, {id_a} AS d FROM pairs
        ), nodes AS (
            SELECT DISTINCT s AS id FROM edges
        ), reach AS (
            SELECT id, id AS label FROM nodes
            UNION
            SELECT e.d AS id, r.label
            FROM reach r JOIN edges e ON e.s = r.id
        ), components AS (
            SELECT id, MIN(label) AS component
            FROM reach GROUP BY id
        )"""


def dedup_components_sql(pairs_sql: str, id_a: str = "id_a",
                         id_b: str = "id_b") -> str:
    """DuckDB twin: min reachable id per node via a recursive CTE.

    The UNION (distinct) makes the recursion terminate; fine at oracle
    scale -- the Spark operator above is the one that has to scale.
    """
    return f"""
        WITH RECURSIVE {dedup_components_ctes(pairs_sql, id_a, id_b)}
        SELECT id, component FROM components
    """


def canonical_survivors(
    df: DataFrame,
    components: DataFrame,
    id_col: str,
    score_col: str,
) -> DataFrame:
    """Quality-aware dedup resolution: keep the BEST-scored row per
    duplicate component, not the min-id one.

    ``components`` is (id, component) from :func:`dedup_components`;
    rows of ``df`` absent from it are singletons and survive
    unconditionally. Within a component the survivor is the max
    ``score_col`` row, tie -> min id (deterministic). This is the
    standard corpus-curation ending (RefinedWeb/FineWeb keep the
    longest / highest-quality member of each near-dup cluster) that
    plain keep-min-id dedup gets wrong: min-id can keep the truncated
    clone and drop the full document.

    Scale: the component map is |clustered docs| rows -- far smaller
    than the corpus -- so both arms join the corpus against a small
    (usually broadcastable) side: singletons via left_anti, cluster
    winners via inner join + a WindowGroupLimit-able row_number whose
    partitions are single clusters (near-cliques, tiny). Singletons
    deliberately NEVER enter the window: a left join + one window
    with nulls grouped together would funnel the entire non-duplicate
    majority of the corpus into one window partition.
    """
    comp = components.select(
        F.col("id").alias(id_col), "component"
    )
    w = Window.partitionBy("component").orderBy(
        F.desc(score_col), F.asc(id_col)
    )
    winners = (
        df.join(comp, id_col, "inner")
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .drop("__rk", "component")
    )
    singletons = df.join(comp, id_col, "left_anti")
    return singletons.unionByName(winners)


def _minhash_shingles(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int,
    max_doc_freq: float | None,
) -> DataFrame:
    """Shared head of the minhash tier: (id, toks) with the optional
    stop-shingle drop applied, persisted (scanned by signatures AND
    the rescore join). Extracted so minhash_band_cost plans against
    the exact shingle sets minhash_lsh_pairs will hash."""
    from .caching import persisted

    docs = df.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("text")
    ).filter(F.length("text") > 0)
    # Under-parallel inputs (a small parquet scans as 1-2 splits)
    # serialize the shingle/minhash compute -- the flagship's
    # dominant stage at sf0.1 (round-10 verdict item 4: 9.2s -> 3.7s
    # measured). Shared guard: operators/skew.py ensure_parallel_scan
    # (inputFiles probe, hash repartition, no-op at real scale).
    from .skew import ensure_parallel_scan

    docs = ensure_parallel_scan(docs, "id")
    # NB: shingle the RENAMED "text" column -- docs no longer carries
    # the caller's text_col name (non-default callers would otherwise
    # hit an unresolved-column AnalysisException)
    shingled = docs.select(
        "id", word_shingles("text", shingle_n).alias("toks")
    )
    if max_doc_freq is not None:
        exploded = shingled.select(
            "id", F.explode("toks").alias("shingle")
        )
        n_docs = shingled.agg(F.count(F.lit(1)).alias("n_docs"))
        hot = (
            exploded.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("doc_freq"))
            .crossJoin(F.broadcast(n_docs))
            .filter(F.col("doc_freq") > F.col("n_docs") * max_doc_freq)
            .agg(F.collect_set("shingle").alias("hot_set"))
        )
        # fold the (tiny) hot set in as a broadcast scalar and strip it
        # with a pure array expression -- no explode/re-agg shuffle
        empty = F.array().cast("array<string>")
        shingled = shingled.crossJoin(F.broadcast(hot)).select(
            "id",
            F.array_except(
                "toks", F.coalesce(F.col("hot_set"), empty)
            ).alias("toks"),
        )
    # persisted: scanned once for signatures and twice by the rescore
    # join -- the materialize-the-index-once shape (see ngram tier)
    return persisted(shingled.filter(F.size("toks") > 0))


def _band_keys(
    num_hash_tables: int, rows_per_band: int, seed: int
) -> F.Column:
    """array of ``num_hash_tables`` band keys over the ``toks``
    column: each band keys on ``rows_per_band`` minhashes jointly."""
    def _minhash(table: int) -> F.Column:
        # per-table hash family: xxhash64(shingle, table, seed)
        return F.array_min(
            F.transform(
                "toks",
                lambda s: F.xxhash64(s, F.lit(table), F.lit(seed)),
            )
        )

    n_hashes = num_hash_tables * rows_per_band
    if rows_per_band == 1:
        return F.array(*[_minhash(t) for t in range(n_hashes)])
    # band b keys on its r minhashes JOINTLY: one 64-bit xxhash64
    # over the r-signature slice (deterministic fn of the slice)
    sig = F.array(*[_minhash(t) for t in range(n_hashes)])
    return F.array(*[
        F.xxhash64(
            *[
                F.element_at(sig, b * rows_per_band + r + 1)
                for r in range(rows_per_band)
            ],
            F.lit(b),
        )
        for b in range(num_hash_tables)
    ])


def minhash_band_cost(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hash_tables: int = 4,
    seed: int = 42,
    shingle_n: int = 3,
    max_doc_freq: float | None = None,
    rows_per_band_options: tuple[int, ...] = (1, 2),
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Pre-flight EXACT collision budget of the banded minhash join,
    per ``rows_per_band`` option, from bucket sizes alone: a
    (band, key) bucket holding c ids contributes c*(c-1)/2 same-bucket
    pairs, so summing that over buckets counts every (pair, band)
    collision the join would produce WITHOUT forming one. This is the
    advisor-pattern planner (operators/advisor.py) for THE minhash
    dial: SCALE.md's 10x smoke measured the r=1 background quadratic
    vs the r=2 AND-step crossover; this makes choosing r a measured
    decision instead of a guess -- at 100 TB you run the |options|
    bucket aggregates (shuffle of (band, key) ints at corpus grain,
    same width as the join's build side) before committing to the
    join whose bill is those collisions.

    Output: one row per option,
      (rows_per_band, n_buckets, n_collision_pairs)
    where n_collision_pairs EXACTLY equals the (pair, band) collision
    count of minhash_lsh_pairs' band join under the same corpus,
    hashes and stop-shingle drop (distinct candidate PAIRS after the
    join's dropDuplicates are <= this; the collision count is the
    shuffle bill, which is what you budget).
    """
    # ``shingles``: a caller that already materialized the
    # _minhash_shingles relation (same df/params) passes it in so the
    # planner aggregates run over the EXISTING persisted toks instead
    # of materializing a second identical cache (round-10 verdict
    # item 4: the flagship's planner leg shares the band join's
    # signature scan -- one persist boundary, measured 3.3s -> 0.7s).
    sh = shingles if shingles is not None else _minhash_shingles(
        df, text_col, id_col, shingle_n, max_doc_freq
    )
    out: DataFrame | None = None
    for r in rows_per_band_options:
        buckets = (
            sh.select(
                F.posexplode(
                    _band_keys(num_hash_tables, r, seed)
                ).alias("band", "key")
            )
            .groupBy("band", "key")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        row = buckets.agg(
            F.lit(int(r)).cast("long").alias("rows_per_band"),
            F.count(F.lit(1)).alias("n_buckets"),
            F.coalesce(
                F.sum(F.col("c") * (F.col("c") - 1) / 2), F.lit(0)
            ).cast("long").alias("n_collision_pairs"),
        )
        out = row if out is None else out.unionAll(row)
    return out


def choose_rows_per_band(
    df: DataFrame,
    budget_collisions: int,
    **kwargs,
) -> int:
    """Smallest rows_per_band whose exact collision budget fits
    ``budget_collisions``; the largest option if none does (the
    honest fallback: max suppression, caller sees the budget still
    exceeded in the returned plan if they re-run the cost). kwargs
    pass through to :func:`minhash_band_cost`."""
    rows = sorted(
        minhash_band_cost(df, **kwargs).collect(),
        key=lambda r: r.rows_per_band,
    )
    for r in rows:
        if r.n_collision_pairs <= budget_collisions:
            return int(r.rows_per_band)
    return int(rows[-1].rows_per_band)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hash_tables: int = 4,
    max_distance: float = 0.5,
    seed: int = 42,
    shingle_n: int = 3,
    max_doc_freq: float | None = None,
    rows_per_band: int | None = 1,
    collision_budget_per_doc: int = 50,
) -> DataFrame:
    """Near-dup pairs via MinHash LSH banding, entirely in codegen
    (the 100 TB scale path).

    ``rows_per_band=None`` auto-tunes: :func:`choose_rows_per_band`
    prices each option's exact (pair, band) collision count and the
    smallest r within ``collision_budget_per_doc * n_docs`` wins -- a
    LINEAR budget, so the corpus that stays sub-quadratic keeps r=1's
    maximum recall and the corpus whose background collisions go
    quadratic (SCALE.md's 10x smoke: 99x collision growth on the
    adversarial vocabulary) pays two planning aggregates instead of
    the join bill. Explicit r skips the planning jobs entirely.

    Per doc: n-word shingles -> ``num_hash_tables`` minhash values,
    each ``array_min(transform(shingles, s -> xxhash64(s, table_id))
    )`` -- a pure JVM array expression, no MLlib stage, no fit, no UDT
    (round 2 used MLlib MinHashLSH; its fit/transform/UDT overhead was
    38% of the bench at identical candidate quality -- measured 8.5 s
    vs 2.4 s for this form at sf0.1). Candidates = docs agreeing on
    any table's minhash (banded equi-join, OR-amplification: collision
    prob for Jaccard j is 1-(1-j)^k). Candidates are then RESCORED
    EXACTLY: join back to the persisted shingle table and compute true
    Jaccard via array_intersect -- so reported distances are exact,
    unlike MLlib's feature-hashed approximation, and every reported
    pair at distance <= max_distance is a true near-dup (the precision
    guarantee the driver row hashes). Deterministic: xxhash64 is a
    fixed function of (shingle, table_id, seed).

    Feature unit matters: minhashing raw UNIGRAMS degenerates on a
    small-vocabulary corpus (every doc shares most words, collision
    prob ~ Jaccard ~ 1, candidate set -> n^2 -- measured as a multi-GB
    shuffle at sf0.1 in round 1). N-word shingles (``shingle_n``) are
    the standard fix and the same blocking unit ngram_jaccard uses.

    ``max_doc_freq`` applies the same stop-shingle drop as
    ngram_jaccard_pairs (shingles in > max_doc_freq * n_docs documents
    are removed from every shingle set before hashing): the hot-key
    guard for the banded bucket join at corpus scale.

    ``rows_per_band`` (r) is the background-suppression dial -- the
    AND half of classic banded LSH. Each of the ``num_hash_tables``
    bands keys on r minhashes jointly (P(candidate | Jaccard j) =
    1 - (1 - j^r)^bands), so raising r crushes the low-similarity
    background QUADRATIC: at r=1 a random pair with background
    j ~ 0.01 is a candidate w.p. ~4 j = 4%, which is n^2/25 pairs on
    any corpus whose docs share a small vocabulary; at r=2 that drops
    to ~4 j^2 = 0.04%. True near-dups barely feel it (j >= 0.8 ->
    P >= 0.98 at r=2, b=4). The default stays r=1 (maximum recall;
    the attested contract) -- switch to r=2+ when the candidate count,
    not the signature scan, is the bill (the 10x scale smoke in
    SCALE.md measures exactly this crossover). Identical exact-dup
    recall floor at any r: identical docs have identical signatures.

    Scale: one scan computes signatures; the band join shuffles
    (table_id, minhash) keys only -- constant width per doc regardless
    of document size; the rescore join ships shingle arrays for
    CANDIDATE ids only. Hot buckets (boilerplate shingle sets) split
    under AQE skew-join like every other equi-join here.
    """
    from .caching import persisted

    sh = _minhash_shingles(df, text_col, id_col, shingle_n,
                           max_doc_freq)
    if rows_per_band is None:
        rows_per_band = choose_rows_per_band(
            df, collision_budget_per_doc * sh.count(),
            text_col=text_col, id_col=id_col,
            num_hash_tables=num_hash_tables, seed=seed,
            shingle_n=shingle_n, max_doc_freq=max_doc_freq,
        )
    # persisted (caching ledger): the banded self-join below scans
    # this relation on BOTH sides -- without the persist each side
    # re-runs the full signature computation (num_hash_tables x
    # rows_per_band minhash folds over every doc's shingle set), so
    # the dominant per-row hashing stage executed twice (optimization
    # round 12; same materialize-the-index-once shape as the shingle
    # table itself and the ngram tier's inverted index). The banded
    # rows are (id, band, key) -- constant width, tiny vs the corpus.
    #
    # Round-13 disposition (r12 verdict item 4 asked for cold
    # evidence): 10 alternating FRESH-PROCESS query-cold samples at
    # sf0.1 (JVM warmed on an unrelated query family first) read
    # persist med 8.6 s vs no-persist med 9.7 s with equal mins --
    # the r12 "persist 1.05-1.10x worse cold" concern did NOT
    # reproduce (the no-persist variant instead shows a heavy tail:
    # two JIT-compiled signature stages ramp twice). A size gate on
    # the optimizer estimate was implemented, measured, and REMOVED:
    # the persist stays unconditional on both the cold and the warm
    # (0.74x bench-warm, r12) evidence.
    bands = persisted(
        sh.select(
            "id",
            F.posexplode(
                _band_keys(num_hash_tables, rows_per_band, seed)
            ).alias("band", "key"),
        )
    )
    cand = (
        bands.alias("a")
        .join(bands.alias("b"), ["band", "key"])
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    # exact rescore: true shingle-Jaccard for candidate pairs only
    a = sh.select(F.col("id").alias("id_a"), F.col("toks").alias("t_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("toks").alias("t_b"))
    inter = F.size(F.array_intersect("t_a", "t_b")).cast("double")
    union = (F.size("t_a") + F.size("t_b") - inter).cast("double")
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a", "id_b", (1.0 - inter / union).alias("jaccard_dist")
        )
        .filter(F.col("jaccard_dist") <= max_distance)
    )


# --- tier 5: exact-substring span dedup (Lee et al. 2022 shape) --------------
#
# "Deduplicating Training Data Makes Language Models Better" removes
# VERBATIM repeated substrings (>= L tokens) rather than whole near-dup
# documents -- the suffix-array ExactSubstr dedup. A distributed
# suffix array is the wrong tool on Spark; the equivalent declarative
# shape is rolling token windows: a length-L token window that occurs
# >= min_count times anywhere in the corpus IS a duplicated substring
# occurrence, and the union of its [start, start+L) intervals is
# exactly the set of tokens inside duplicated substrings.
#
# Scale shape: never forms doc pairs. Total exploded rows = total
# token count (one row per window start), the shuffle key is a 32-byte
# md5 of the window -- constant width however long the documents are --
# and the global window count is a map-side-combinable agg. Join-back
# is an equi-join on the same key; pathological hot windows (the same
# L-gram everywhere) inflate only the count agg, not a pair join, and
# AQE splits the skewed partitions.

def _window_occurrences(
    df: DataFrame,
    text_col: str,
    id_col: str,
    window: int,
    min_count: int,
) -> tuple[DataFrame, DataFrame]:
    """Shared first half of the span-dedup tier: (base, dup_wins).

    ``base`` = (id, toks, n_tokens); ``dup_wins`` = one (id, pos) row
    per occurrence of a window whose corpus-wide count >= min_count.
    The exploded window table feeds BOTH the global count aggregate
    and the join-back, so it is persisted via the caching ledger --
    without it the corpus is tokenized and exploded twice per action
    (the dominant cost of the operator).
    """
    from .caching import persisted

    toks = tokens(text_col)
    base = df.select(
        F.col(id_col).alias("id"),
        toks.alias("toks"),
        F.size(toks).alias("n_tokens"),
    )
    starts = F.sequence(F.lit(0), F.col("n_tokens") - window)
    wins = persisted(
        base.filter(F.col("n_tokens") >= window).select(
            "id",
            F.posexplode(
                F.transform(
                    starts,
                    lambda i: F.md5(
                        F.array_join(F.slice("toks", i + 1, window), " ")
                    ),
                )
            ).alias("pos", "wh"),
        )
    )
    dup_keys = (
        wins.groupBy("wh")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= min_count)
        .select("wh")
    )
    dup_wins = wins.join(dup_keys, "wh").select("id", "pos")
    return base, dup_wins


def duplicated_span_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 6,
    min_count: int = 2,
    flag_threshold: float = 0.5,
) -> DataFrame:
    """Per-doc stats of verbatim duplicated token spans.

    A window = ``window`` consecutive tokens; a window string occurring
    >= ``min_count`` times corpus-wide (across OR within docs) marks
    every token it covers as duplicated. Overlapping/adjacent covered
    intervals merge into spans (gaps-and-islands over start offsets).

    Returns one row per input doc:
      (id, n_tokens, n_dup_windows, n_dup_spans, covered_tokens,
       dup_frac_ppm, flagged) -- the whole surface is INTEGER:
    ``dup_frac_ppm`` = (covered * 1e6) div n_tokens (integer parts-
    per-million; consumers derive the float fraction themselves) and
    ``flagged`` = covered * 1e6 > round(flag_threshold * 1e6) *
    n_tokens, all in exact BIGINT arithmetic. The r4 surface emitted
    ``dup_frac`` as ROUND(covered/n_tokens, 6) double, whose half-
    boundary quotients can round apart across engines (r4 verdict) --
    no float crosses the compare surface now.
    """
    from pyspark.sql import Window as W

    base, occ = _window_occurrences(df, text_col, id_col, window,
                                    min_count)
    dup_wins = occ.select(
        "id", "pos", (F.col("pos") + window - 1).alias("end")
    )
    w_ord = W.partitionBy("id").orderBy("pos")
    w_prev = w_ord.rowsBetween(W.unboundedPreceding, -1)
    spans = (
        dup_wins.withColumn("prev_end", F.max("end").over(w_prev))
        .withColumn(
            "new_span",
            F.when(
                F.col("prev_end").isNull()
                | (F.col("pos") > F.col("prev_end") + 1),
                1,
            ).otherwise(0),
        )
        .withColumn("span_id", F.sum("new_span").over(w_ord))
        .groupBy("id", "span_id")
        .agg(
            F.count("*").alias("n_wins"),
            (F.max("end") - F.min("pos") + 1).alias("covered"),
        )
        .groupBy("id")
        .agg(
            F.sum("n_wins").alias("n_dup_windows"),
            F.count("*").alias("n_dup_spans"),
            F.sum("covered").alias("covered_tokens"),
        )
    )
    out = (
        base.select("id", "n_tokens")
        .join(spans, "id", "left")
        .select(
            "id",
            "n_tokens",
            F.coalesce("n_dup_windows", F.lit(0)).alias("n_dup_windows"),
            F.coalesce("n_dup_spans", F.lit(0)).alias("n_dup_spans"),
            F.coalesce("covered_tokens", F.lit(0)).alias("covered_tokens"),
        )
        .withColumn(
            "dup_frac_ppm",
            F.expr(
                "CASE WHEN n_tokens = 0 THEN CAST(0 AS BIGINT) "
                "ELSE covered_tokens * CAST(1000000 AS BIGINT) "
                "div n_tokens END"
            ),
        )
        .withColumn(
            "flagged",
            (
                F.col("covered_tokens") * F.lit(1_000_000).cast("long")
                > F.lit(round(flag_threshold * 1_000_000))
                * F.col("n_tokens")
            ).cast("int"),
        )
    )
    return out


def duplicated_span_stats_sql(
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 6,
    min_count: int = 2,
    flag_threshold: float = 0.5,
) -> str:
    """DuckDB twin of duplicated_span_stats (identical windowing, md5
    keys, gaps-and-islands merge, and integer ppm arithmetic)."""
    thr_ppm = round(flag_threshold * 1_000_000)
    return f"""
        WITH base AS (
            SELECT {id_col} AS id,
                   regexp_split_to_array({text_col}, ' +') AS toks,
                   len(regexp_split_to_array({text_col}, ' +'))
                       AS n_tokens
            FROM {table}
        ),
        wins AS (
            SELECT id, u.pos AS pos, u.wh AS wh
            FROM (
                SELECT id,
                       unnest(list_transform(
                           range(1, n_tokens - {window} + 2),
                           i -> {{'pos': i - 1,
                                 'wh': md5(array_to_string(
                                     toks[i:i+{window}-1], ' '))}}
                       )) AS u
                FROM base
                WHERE n_tokens >= {window}
            )
        ),
        dup_keys AS (
            SELECT wh FROM wins GROUP BY wh
            HAVING COUNT(*) >= {min_count}
        ),
        dup_wins AS (
            SELECT w.id, w.pos, w.pos + {window} - 1 AS e
            FROM wins w JOIN dup_keys d USING (wh)
        ),
        marked AS (
            SELECT id, pos, e,
                   CASE WHEN max(e) OVER (
                            PARTITION BY id ORDER BY pos
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING) IS NULL
                         OR pos > max(e) OVER (
                            PARTITION BY id ORDER BY pos
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING) + 1
                        THEN 1 ELSE 0 END AS new_span
            FROM dup_wins
        ),
        islands AS (
            SELECT id, pos, e,
                   SUM(new_span) OVER (
                       PARTITION BY id ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS span_id
            FROM marked
        ),
        spans AS (
            SELECT id,
                   CAST(SUM(n_wins) AS BIGINT) AS n_dup_windows,
                   COUNT(*) AS n_dup_spans,
                   CAST(SUM(covered) AS BIGINT) AS covered_tokens
            FROM (
                SELECT id, span_id, COUNT(*) AS n_wins,
                       MAX(e) - MIN(pos) + 1 AS covered
                FROM islands GROUP BY id, span_id
            ) GROUP BY id
        )
        SELECT b.id,
               b.n_tokens,
               COALESCE(s.n_dup_windows, 0) AS n_dup_windows,
               COALESCE(s.n_dup_spans, 0) AS n_dup_spans,
               COALESCE(s.covered_tokens, 0) AS covered_tokens,
               CAST(CASE WHEN b.n_tokens = 0 THEN 0
                    ELSE COALESCE(s.covered_tokens, 0) * 1000000
                         // b.n_tokens END AS BIGINT) AS dup_frac_ppm,
               CAST(COALESCE(s.covered_tokens, 0) * 1000000
                    > {thr_ppm} * b.n_tokens AS INTEGER) AS flagged
        FROM base b LEFT JOIN spans s ON b.id = s.id
    """


def remove_duplicated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 6,
    min_count: int = 2,
) -> DataFrame:
    """Rebuild each doc with tokens inside duplicated spans removed
    (the destructive half of ExactSubstr dedup).

    Covered token positions come from the same global window-count
    pass as duplicated_span_stats; the rebuild is
    posexplode -> anti-join covered positions -> ordered re-aggregate.
    Docs shorter than ``window`` pass through verbatim.
    """
    base, occ = _window_occurrences(df, text_col, id_col, window,
                                    min_count)
    covered = (
        occ.select(
            "id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + window - 1)
            ).alias("pos"),
        )
        .distinct()
    )
    tok_rows = base.select(
        "id", F.posexplode("toks").alias("pos", "tok")
    )
    kept = tok_rows.join(covered, ["id", "pos"], "left_anti")
    rebuilt = kept.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
            " ",
        ).alias("clean_text")
    )
    return (
        base.select("id")
        .join(rebuilt, "id", "left")
        .select("id", F.coalesce("clean_text", F.lit("")).alias("clean_text"))
    )


def remove_duplicated_spans_sql(
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 6,
    min_count: int = 2,
) -> str:
    """DuckDB twin of remove_duplicated_spans."""
    return f"""
        WITH base AS (
            SELECT {id_col} AS id,
                   regexp_split_to_array({text_col}, ' +') AS toks,
                   len(regexp_split_to_array({text_col}, ' +'))
                       AS n_tokens
            FROM {table}
        ),
        wins AS (
            SELECT id, u.pos AS pos, u.wh AS wh
            FROM (
                SELECT id,
                       unnest(list_transform(
                           range(1, n_tokens - {window} + 2),
                           i -> {{'pos': i - 1,
                                 'wh': md5(array_to_string(
                                     toks[i:i+{window}-1], ' '))}}
                       )) AS u
                FROM base
                WHERE n_tokens >= {window}
            )
        ),
        dup_keys AS (
            SELECT wh FROM wins GROUP BY wh
            HAVING COUNT(*) >= {min_count}
        ),
        covered AS (
            SELECT DISTINCT w.id, p.p AS pos
            FROM wins w
            JOIN dup_keys d USING (wh),
                 LATERAL (SELECT unnest(range(w.pos,
                                              w.pos + {window})) AS p) p
        ),
        tok_rows AS (
            SELECT id, u.pos AS pos, u.tok AS tok
            FROM (
                SELECT id,
                       unnest(list_transform(
                           range(1, n_tokens + 1),
                           i -> {{'pos': i - 1, 'tok': toks[i]}}
                       )) AS u
                FROM base
            )
        ),
        kept AS (
            SELECT t.id, t.pos, t.tok
            FROM tok_rows t
            LEFT JOIN covered c ON t.id = c.id AND t.pos = c.pos
            WHERE c.id IS NULL
        ),
        rebuilt AS (
            SELECT id, string_agg(tok, ' ' ORDER BY pos) AS clean_text
            FROM kept GROUP BY id
        )
        SELECT b.id, COALESCE(r.clean_text, '') AS clean_text
        FROM base b LEFT JOIN rebuilt r ON b.id = r.id
    """


# --- incremental cross-batch NEAR-dup dedup (persistent simhash store) -------

def incremental_simhash_dedup(
    spark,
    new_docs: DataFrame,
    store_path: str,
    out_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup dedup ACROSS ingestion batches: drop new docs whose
    SimHash is within ``max_hamming`` bits of any fingerprint in a
    persistent parquet store, collapse exact-SimHash duplicates within
    the batch (keep min id), land the survivors, append their
    fingerprints, return the landed survivors.

    The near-dup twin of ``incremental_exact_dedup`` (same
    land-then-append ordering contract, same crash-recovery story --
    the store is derivable from the landed batch dirs -- and the same
    two-marker replay guard, so an at-least-once replay returns the
    completed landing or self-heals a missed append instead of
    overwriting the data). SimHash is the
    right fingerprint for INCREMENTAL near-dup: the store holds ONE
    64-bit value per kept doc (vs minhash's k-element signatures or
    jaccard's shingle sets), and the decision rule is exact and
    deterministic -- with ``max_hamming <= n_bands - 1`` the pigeonhole
    guarantee makes the banded probe's recall total, so the operator's
    semantics are simply "drop iff a stored neighbor is within
    max_hamming bits", no probabilistic rescore.

    Intra-batch NEAR-dups (0 < Hamming <= max_hamming within one
    batch) are deliberately out of scope -- resolving them needs the
    pair->component machinery (simhash_band_pairs + dedup_components);
    compose those upstream when a batch may near-duplicate itself.

    Scale: probe = two projections + an equi-join on (band, key) 16-bit
    keys + a bit_count verify before any exchange of results; store
    rows are constant width. Bucket the store by band key at real
    scale and compact periodically, as with the exact store.
    """
    if max_hamming > n_bands - 1:
        raise ValueError(
            f"max_hamming={max_hamming} breaks the pigeonhole recall "
            f"guarantee for n_bands={n_bands}; need <= {n_bands - 1}"
        )
    if _marker_exists(spark, out_path, _MARK_APPENDED):
        # full replay: see the exact twin's replay contract
        return spark.read.parquet(out_path).drop("simhash")
    if _marker_exists(spark, out_path, _MARK_LANDED):
        # crash-window replay: re-append fingerprints, never re-probe
        landed = spark.read.parquet(out_path)
        landed.select(
            "simhash", F.col(id_col).alias("keep_id")
        ).write.mode("append").parquet(store_path)
        _write_marker(spark, out_path, _MARK_APPENDED)
        return landed.drop("simhash")
    from pyspark.errors import AnalysisException

    # per-row column, not a self-join: the fingerprint is a pure
    # array expression, so attaching it must not cost an exchange
    fresh = new_docs.withColumn("simhash", simhash_col(text_col))
    keep = fresh.groupBy("simhash").agg(F.min(id_col).alias(id_col))
    batch_unique = fresh.join(keep, ["simhash", id_col], "left_semi")

    band_width = 64 // n_bands
    mask = (1 << band_width) - 1

    def _bands(df: DataFrame, sh: str, keep_cols: list[str]) -> DataFrame:
        return df.select(
            *keep_cols,
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(sh, i * band_width)
                        .bitwiseAND(F.lit(mask))
                        .alias("key"),
                    )
                    for i in range(n_bands)
                ])
            ).alias("bk"),
        ).select(*keep_cols, "bk.band", "bk.key")

    try:
        store = spark.read.parquet(store_path).select(
            F.col("simhash").alias("sh_stored")
        )
    except AnalysisException:  # first batch: no store yet
        store = None
    if store is None:
        survivors = batch_unique
    else:
        probe = _bands(
            batch_unique.select(id_col, "simhash"), "simhash",
            [id_col, "simhash"],
        )
        posting = _bands(store, "sh_stored", ["sh_stored"])
        hits = (
            probe.join(posting, ["band", "key"])
            .filter(
                F.bit_count(
                    F.col("simhash").bitwiseXOR(F.col("sh_stored"))
                )
                <= max_hamming
            )
            .select(id_col)
            .distinct()
        )
        survivors = batch_unique.join(hits, id_col, "left_anti")
    survivors.write.mode("overwrite").parquet(out_path)
    _write_marker(spark, out_path, _MARK_LANDED)
    landed = spark.read.parquet(out_path)
    landed.select(
        "simhash", F.col(id_col).alias("keep_id")
    ).write.mode("append").parquet(store_path)
    _write_marker(spark, out_path, _MARK_APPENDED)
    return landed.drop("simhash")


# --- jaccard threshold sweep (the dedup-aggressiveness dial) -------------------


def jaccard_threshold_sweep(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    floor_threshold: float = 0.2,
    max_doc_freq: float | None = 0.5,
) -> DataFrame:
    """Candidate-pair mass per Jaccard decile: run the inverted-index
    pair generation ONCE at a low floor and bin every candidate pair
    by similarity, with a descending cumulative column -- the table a
    corpus owner reads to pick the near-dup threshold (how many pairs
    does 0.8 kill vs 0.6?) without re-running the join per candidate
    threshold.

    Binning is PURE INTEGER: ``bin = least(9, inter * 10 div union)``
    over the exact intersection/union counts -- no float boundary can
    flip a decile (``floor(jaccard * 10)`` on a double can, when
    inter/union sits on a tenth).

    Output per decile: ``jac_floor_ppm`` (bin lower edge),
    ``n_pairs``, ``cum_pairs_geq`` (pairs at or above this decile --
    a window over the <= 10-row bin relation).
    """
    from pyspark.sql.window import Window

    pairs = _jaccard_pairs_with_sizes(
        df, text_col, id_col, n, floor_threshold, max_doc_freq
    )
    binned = (
        pairs.select(
            F.expr("least(9, inter * 10 div (n_a + n_b - inter))")
            .cast("long").alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )
    w = (
        Window.orderBy(F.col("bin").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return binned.select(
        (F.col("bin") * 100_000).cast("long").alias("jac_floor_ppm"),
        "n_pairs",
        F.sum("n_pairs").over(w).cast("long").alias("cum_pairs_geq"),
    ).orderBy(F.col("jac_floor_ppm").desc())


def _jaccard_pairs_with_sizes(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int,
    threshold: float,
    max_doc_freq: float | None,
) -> DataFrame:
    """ngram_jaccard_pairs keeping the exact (n_a, n_b) set sizes --
    shared pair generation for consumers that need integer union
    arithmetic downstream (the sweep's decile binning)."""
    from .caching import persisted

    sh = persisted(
        df.select(
            F.col(id_col).alias("id"),
            word_shingles(text_col, n).alias("shingles"),
        )
    )
    if max_doc_freq is None:
        inv = sh.select(
            "id", F.size("shingles").alias("n_sh"),
            F.explode("shingles").alias("shingle"),
        )
    else:
        exploded = sh.select("id", F.explode("shingles").alias("shingle"))
        n_docs = sh.agg(F.count(F.lit(1)).alias("n_docs"))
        hot = (
            exploded.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("doc_freq"))
            .crossJoin(F.broadcast(n_docs))
            .filter(F.col("doc_freq") > F.col("n_docs") * max_doc_freq)
            .select("shingle")
        )
        kept = exploded.join(F.broadcast(hot), "shingle", "left_anti")
        n_sh = kept.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
        inv = persisted(kept.join(n_sh, "id"))
    a = inv.select(F.col("id").alias("id_a"),
                   F.col("n_sh").alias("n_a"), "shingle")
    b = inv.select(F.col("id").alias("id_b"),
                   F.col("n_sh").alias("n_b"), "shingle")
    pairs = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
    return pairs.filter(jac >= threshold)


def jaccard_threshold_sweep_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    floor_threshold: float = 0.2,
    max_doc_freq: float | None = 0.5,
) -> str:
    """DuckDB twin of :func:`jaccard_threshold_sweep` (the pair CTEs
    come from ngram_jaccard_pairs_sql's builder shape, sizes kept)."""
    if max_doc_freq is None:
        index_ctes = """inv AS (
            SELECT id, len(shingles) AS n_sh, unnest(shingles) AS shingle
            FROM sh
        )"""
    else:
        index_ctes = f"""exploded AS (
            SELECT id, unnest(shingles) AS shingle FROM sh
        ), kept AS (
            SELECT id, shingle FROM exploded
            WHERE shingle NOT IN (
                SELECT shingle FROM exploded
                GROUP BY shingle
                HAVING COUNT(*) > (SELECT COUNT(*) FROM sh)
                                      * {max_doc_freq}
            )
        ), inv AS (
            SELECT id, COUNT(*) OVER (PARTITION BY id) AS n_sh, shingle
            FROM kept
        )"""
    return f"""
        WITH toks AS (
            SELECT {id_col} AS id,
                   regexp_split_to_array({text_col}, ' +') AS t
            FROM {table}
        ), sh AS (
            SELECT id,
                   CASE WHEN len(t) >= {n} THEN
                       list_distinct(list_transform(
                           range(1, len(t) - {n} + 2),
                           i -> array_to_string(t[i:i+{n}-1], ' ')))
                   ELSE [array_to_string(t, ' ')] END AS shingles
            FROM toks
        ), {index_ctes}, pairs AS (
            SELECT a.id AS id_a, b.id AS id_b,
                   a.n_sh AS n_a, b.n_sh AS n_b,
                   COUNT(*) AS inter
            FROM inv a JOIN inv b ON a.shingle = b.shingle
            WHERE a.id < b.id
            GROUP BY 1, 2, 3, 4
        ), floored AS (
            SELECT * FROM pairs
            WHERE inter * 1.0 / (n_a + n_b - inter)
                  >= {floor_threshold}
        ), binned AS (
            SELECT LEAST(9, inter * 10 // (n_a + n_b - inter)) AS bin,
                   CAST(COUNT(*) AS BIGINT) AS n_pairs
            FROM floored GROUP BY 1
        )
        SELECT CAST(bin * 100000 AS BIGINT) AS jac_floor_ppm,
               n_pairs,
               CAST(SUM(n_pairs) OVER (ORDER BY bin DESC
                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS cum_pairs_geq
        FROM binned
        ORDER BY jac_floor_ppm DESC
    """


def ngram_containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold_ppm: int = 800_000,
    max_doc_freq: float | None = None,
) -> DataFrame:
    """Directed near-dup pairs by shingle CONTAINMENT: emit
    (contained_id, container_id) when |A inter B| / |A| crosses the
    threshold -- the asymmetric measure that catches a SHORT document
    living inside a LONG one, which Jaccard structurally dilutes
    (a 50-shingle doc inside a 5000-shingle doc has containment 1.0
    but Jaccard ~0.01, invisible to every symmetric tier).

    Same inverted-index blocking as ngram_jaccard_pairs (equi-join on
    shared shingles only -- candidate pairs share >= 1 shingle, never
    all-pairs; ``max_doc_freq`` is the identical hot-shingle guard).
    The undirected candidate aggregate is computed ONCE and both
    directions are derived from it, so containment costs the same one
    join + one groupBy as Jaccard. Integer contract: containment_ppm
    = inter * 1e6 div n_contained -- exact in both engines.

    Output: (contained_id, container_id, inter, n_contained,
    containment_ppm), one row per qualifying DIRECTION (mutual
    near-dups yield two rows; the dedup policy usually drops the
    contained side, keeping the superset document).
    """
    from .caching import persisted

    sh = persisted(
        df.select(
            F.col(id_col).alias("id"),
            word_shingles(text_col, n).alias("shingles"),
        )
    )
    if max_doc_freq is None:
        inv = sh.select(
            "id",
            F.size("shingles").alias("n_sh"),
            F.explode("shingles").alias("shingle"),
        )
    else:
        exploded = sh.select("id", F.explode("shingles").alias("shingle"))
        n_docs = sh.agg(F.count(F.lit(1)).alias("n_docs"))
        hot = (
            exploded.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("doc_freq"))
            .crossJoin(F.broadcast(n_docs))
            .filter(F.col("doc_freq") > F.col("n_docs") * max_doc_freq)
            .select("shingle")
        )
        kept = exploded.join(F.broadcast(hot), "shingle", "left_anti")
        n_sh = kept.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
        inv = persisted(kept.join(n_sh, "id"))
    a = inv.select(
        F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"), "shingle"
    )
    b = inv.select(
        F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"), "shingle"
    )
    pairs = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).cast("long").alias("inter"))
    )
    # Prune BEFORE the direction explode: the smaller side has the
    # higher containment, so a pair where even inter/min(n_a,n_b)
    # misses the threshold can qualify in neither direction. Without
    # this the explode doubles the ENTIRE candidate-pair relation
    # (~10^8 rows on the 10x smoke corpus) to keep a few thousand --
    # measured 14.9x at 10x data vs jaccard's 3.5x on the identical
    # index; with the prune the explode sees only qualifying pairs.
    # Exact: the per-direction filter below is unchanged.
    pairs = pairs.filter(
        F.expr(
            f"inter * 1000000 div least(n_a, n_b)"
            f" >= {int(threshold_ppm)}"
        )
    )
    directed = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("id_a").alias("contained_id"),
                    F.col("id_b").alias("container_id"),
                    F.col("inter"),
                    F.col("n_a").cast("long").alias("n_contained"),
                ),
                F.struct(
                    F.col("id_b").alias("contained_id"),
                    F.col("id_a").alias("container_id"),
                    F.col("inter"),
                    F.col("n_b").cast("long").alias("n_contained"),
                ),
            )
        ).alias("d")
    ).select("d.*")
    return (
        directed.withColumn(
            "containment_ppm",
            F.expr("inter * 1000000 div n_contained").cast("long"),
        )
        .filter(F.col("containment_ppm") >= threshold_ppm)
    )


def ngram_containment_pairs_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold_ppm: int = 800_000,
    max_doc_freq: float | None = None,
) -> str:
    """DuckDB twin of :func:`ngram_containment_pairs`."""
    if max_doc_freq is None:
        index_ctes = """inv AS (
            SELECT id, len(shingles) AS n_sh, unnest(shingles) AS shingle
            FROM sh
        )"""
    else:
        index_ctes = f"""exploded AS (
            SELECT id, unnest(shingles) AS shingle FROM sh
        ), kept AS (
            SELECT id, shingle FROM exploded
            WHERE shingle NOT IN (
                SELECT shingle FROM exploded
                GROUP BY shingle
                HAVING COUNT(*) > (SELECT COUNT(*) FROM sh)
                                      * {max_doc_freq}
            )
        ), inv AS (
            SELECT id, COUNT(*) OVER (PARTITION BY id) AS n_sh, shingle
            FROM kept
        )"""
    return f"""
        WITH toks AS (
            SELECT {id_col} AS id,
                   regexp_split_to_array({text_col}, ' +') AS t
            FROM {table}
        ), sh AS (
            SELECT id,
                   CASE WHEN len(t) >= {n} THEN
                       list_distinct(list_transform(
                           range(1, len(t) - {n} + 2),
                           i -> array_to_string(t[i:i+{n}-1], ' ')))
                   ELSE [array_to_string(t, ' ')] END AS shingles
            FROM toks
        ), {index_ctes}, pairs AS (
            -- same pre-explode prune as the Spark plan: neither
            -- direction can qualify when even the smaller side misses
            SELECT * FROM (
                SELECT a.id AS id_a, b.id AS id_b,
                       a.n_sh AS n_a, b.n_sh AS n_b,
                       CAST(COUNT(*) AS BIGINT) AS inter
                FROM inv a JOIN inv b ON a.shingle = b.shingle
                WHERE a.id < b.id
                GROUP BY 1, 2, 3, 4
            ) WHERE inter * 1000000 // LEAST(n_a, n_b)
                    >= {threshold_ppm}
        ), directed AS (
            SELECT id_a AS contained_id, id_b AS container_id,
                   inter, CAST(n_a AS BIGINT) AS n_contained
            FROM pairs
            UNION ALL
            SELECT id_b AS contained_id, id_a AS container_id,
                   inter, CAST(n_b AS BIGINT) AS n_contained
            FROM pairs
        )
        SELECT contained_id, container_id, inter, n_contained,
               inter * 1000000 // n_contained AS containment_ppm
        FROM directed
        WHERE inter * 1000000 // n_contained >= {threshold_ppm}
    """


# --- pairwise quality of the dedup CLUSTERING --------------------------------------

def cluster_pairwise_eval(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    link_threshold: float = 0.5,
    gold_threshold: float = 0.2,
    max_doc_freq: float | None = None,
) -> DataFrame:
    """Pairwise precision/recall/F1 of the dedup CLUSTERING itself --
    the eval the dedup tiers never run on themselves: cluster at the
    strict ``link_threshold`` (edges -> connected components ->
    every intra-cluster pair is a predicted duplicate pair, the
    standard pairwise clustering metric), score against the exact
    Jaccard >= ``gold_threshold`` pair set.

    Both directions are informative: transitive closure PREDICTS
    pairs no edge supports (a-b and b-c linked, a-c maybe dissimilar
    -- precision names the chaining inflation), while clustering at
    the stricter threshold MISSES weak gold pairs unless transitivity
    re-covers them (recall names the cost of the strict link dial).

    Output (one row): n_gold_pairs, n_pred_pairs, n_common,
    precision_ppm, recall_ppm, f1_ppm (F1 = 2C * 1e6 div (G + P) --
    one truncating division, no float P/R composition).

    Scale shape: ONE inverted-index pair aggregate serves both the
    gold set (filter at gold_threshold) and the link edges (filter at
    link_threshold); components run on the edge relation; predicted
    pairs enumerate per-cluster C(size, 2) via an equi-self-join on
    the component label -- bounded by near-dup group sizes, never the
    corpus. The common count is an equi-join of two pair relations.
    """
    from .caching import persisted

    base = persisted(
        ngram_jaccard_pairs(
            df, text_col, id_col, n=n, threshold=gold_threshold,
            max_doc_freq=max_doc_freq,
        )
    )
    gold = base.select("id_a", "id_b")
    edges = base.filter(
        F.col("jaccard") >= link_threshold
    ).select("id_a", "id_b")
    comps = dedup_components(edges)
    pred = (
        comps.alias("x")
        .join(comps.alias("y"), "component")
        .filter(F.col("x.id") < F.col("y.id"))
        .select(
            F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b")
        )
    )
    n_gold = gold.count()
    n_pred = pred.count()
    n_common = gold.join(pred, ["id_a", "id_b"], "left_semi").count()
    ppm = 1_000_000
    rows = [(
        n_gold, n_pred, n_common,
        (n_common * ppm) // n_pred if n_pred else ppm,
        (n_common * ppm) // n_gold if n_gold else ppm,
        (2 * n_common * ppm) // (n_gold + n_pred)
        if (n_gold + n_pred) else ppm,
    )]
    return df.sparkSession.createDataFrame(
        rows,
        "n_gold_pairs long, n_pred_pairs long, n_common long, "
        "precision_ppm long, recall_ppm long, f1_ppm long",
    )


def cluster_pairwise_eval_sql(
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    link_threshold: float = 0.5,
    gold_threshold: float = 0.2,
    max_doc_freq: float | None = None,
) -> str:
    """DuckDB twin of :func:`cluster_pairwise_eval` (same shared pair
    relation, recursive-CTE components over the link edges)."""
    base = ngram_jaccard_pairs_sql(
        table, text_col, id_col, n, gold_threshold, max_doc_freq
    )
    edges = f"""
        SELECT id_a, id_b FROM base_pairs
        WHERE jaccard >= {link_threshold}
    """
    return f"""
        WITH RECURSIVE base_pairs AS (
            {base}
        ), {dedup_components_ctes(edges)},
        pred AS (
            SELECT x.id AS id_a, y.id AS id_b
            FROM components x JOIN components y USING (component)
            WHERE x.id < y.id
        ), counts AS (
            SELECT
                (SELECT CAST(COUNT(*) AS BIGINT) FROM base_pairs)
                    AS n_gold_pairs,
                (SELECT CAST(COUNT(*) AS BIGINT) FROM pred)
                    AS n_pred_pairs,
                (SELECT CAST(COUNT(*) AS BIGINT) FROM pred p
                 WHERE EXISTS (SELECT 1 FROM base_pairs g
                               WHERE g.id_a = p.id_a
                                 AND g.id_b = p.id_b)) AS n_common
        )
        SELECT n_gold_pairs, n_pred_pairs, n_common,
               CAST(CASE WHEN n_pred_pairs = 0 THEN 1000000
                    ELSE n_common * 1000000 // n_pred_pairs END
                    AS BIGINT) AS precision_ppm,
               CAST(CASE WHEN n_gold_pairs = 0 THEN 1000000
                    ELSE n_common * 1000000 // n_gold_pairs END
                    AS BIGINT) AS recall_ppm,
               CAST(CASE WHEN n_gold_pairs + n_pred_pairs = 0
                    THEN 1000000
                    ELSE 2 * n_common * 1000000
                         // (n_gold_pairs + n_pred_pairs) END
                    AS BIGINT) AS f1_ppm
        FROM counts
    """
