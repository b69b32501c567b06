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
4. minhash_lsh    -- MLlib HashingTF + MinHashLSH banding join; the
                     100 TB path (sub-quadratic, tunable recall).

All but (4) are pure DataFrame expressions; (4) uses Spark MLlib with a
fixed seed for determinism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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
) -> DataFrame:
    """All (id_a < id_b) pairs with shingle-Jaccard >= threshold.

    Plan: per-doc distinct shingle array -> explode into an inverted
    index (shingle -> doc) -> self-join on shingle to get candidate
    pairs with their intersection size in one aggregation -> Jaccard =
    inter / (|A| + |B| - inter), filter.

    Scale: the self-join is an equi-join on the shingle hash; hot
    shingles (stopword runs) are the skew risk -- AQE skew-join splits
    them, and callers can pre-drop top-frequency shingles the way
    near-dup pipelines drop stop-shingles.

    The per-doc shingle table is PERSISTED (memory-and-disk): without
    it, Catalyst inlines the shingle expression into both the size()
    and the explode(), and the whole index is recomputed once per
    self-join side -- measured 6x slower at sf0.1. Materializing the
    index before a self-join is also the production shape at 100 TB
    (write it once, scan it twice); Spark evicts the blocks LRU when
    the job moves on.
    """
    from pyspark.storagelevel import StorageLevel

    sh = df.select(
        F.col(id_col).alias("id"),
        word_shingles(text_col, n).alias("shingles"),
    ).withColumn("n_sh", F.size("shingles")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    inv = sh.select(
        "id", "n_sh", F.explode("shingles").alias("shingle")
    )
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
) -> str:
    """DuckDB oracle for ngram_jaccard_pairs (identical semantics)."""
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
        ), inv AS (
            SELECT id, len(shingles) AS n_sh, unnest(shingles) AS shingle
            FROM sh
        ), pairs AS (
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
    """
    toks = F.array_distinct(tokens(text_col))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    # bit b vote: sum over tokens of (+1 if bit set else -1) > 0.
    # Bit extraction via unsigned shift (1 << 63 would overflow a
    # signed long literal); the fingerprint is assembled by summing
    # disjoint bit values, which equals bitwise OR.
    def _vote_fn(b: int):
        # closure factory: a default arg would change the lambda's
        # arity and break F.aggregate's higher-order-function binding
        def _merge(acc, h):
            bit = F.shiftrightunsigned(h, b).bitwiseAND(F.lit(1))
            return acc + F.when(bit == 1, 1).otherwise(-1)

        return _merge

    bit_cols = []
    for b in range(bits):
        vote = F.aggregate(hashes, F.lit(0), _vote_fn(b))
        bit_cols.append(
            F.when(vote > 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(
                F.lit(0).cast("long")
            )
        )
    fp = bit_cols[0]
    for c in bit_cols[1:]:
        fp = fp + c
    return df.select(F.col(id_col).alias("id"), fp.alias("simhash"))


def simhash_band_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bands: int = 4,
) -> DataFrame:
    """Candidate near-dup pairs: docs sharing any 16-bit band of their
    SimHash (Hamming-LSH banding). groupBy band value -> pairs."""
    fps = simhash(df, text_col, id_col)
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
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .dropDuplicates(["id_a", "id_b"])
    )


def dedup_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
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
    (previous round unpersisted) so the lineage does not grow with
    iterations. The driver-side loop is coordination only: it looks at
    ONE count per round (did any label change).
    """
    from pyspark.storagelevel import StorageLevel

    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionAll(
            pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges.src == labels.id)
            .groupBy("dst")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr_min, labels.id == nbr_min.dst, "left")
            .select(
                "id",
                F.least(
                    F.col("label"),
                    F.coalesce(F.col("nbr_label"), F.col("label")),
                ).alias("label"),
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
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


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hash_tables: int = 4,
    num_features: int = 1 << 18,
    max_distance: float = 0.5,
    seed: int = 42,
    shingle_n: int = 3,
) -> DataFrame:
    """Near-dup pairs via MLlib MinHashLSH (the 100 TB scale path).

    shingle (n-word) -> HashingTF (sparse binary shingle vector) ->
    MinHashLSH.approxSimilarityJoin at Jaccard-distance threshold.
    Sub-quadratic: candidates come from banded minhash buckets.
    Deterministic for a fixed seed, but not SQL-expressible -- driver
    records the rows-only check.

    Feature unit matters: minhashing raw UNIGRAMS degenerates on a
    small-vocabulary corpus (every doc shares most words, collision
    prob ~ Jaccard ~ 1, candidate set -> n^2 -- measured as a multi-GB
    shuffle at sf0.1 in round 1). N-word shingles (``shingle_n``) are
    the standard fix and the same blocking unit ngram_jaccard uses:
    shingle-set overlap of unrelated docs is tiny, so each of the
    OR-amplified hash tables collides rarely and the candidate volume
    stays ~sim-proportional instead of quadratic.
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    docs = df.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("text")
    ).filter(F.length("text") > 0)
    shingled = docs.withColumn(
        "toks", word_shingles("text", shingle_n)
    )
    tf = HashingTF(
        inputCol="toks", outputCol="features",
        numFeatures=num_features, binary=True,
    )
    # persist: the feature table is scanned by BOTH sides of the
    # approxSimilarityJoin (and the shingle expression would otherwise
    # be re-inlined into the size() filter) -- same materialize-the-
    # index-once reasoning as ngram_jaccard_pairs.
    from pyspark.storagelevel import StorageLevel

    feats = tf.transform(shingled).filter(
        F.size("toks") > 0
    ).persist(StorageLevel.MEMORY_AND_DISK)
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes",
        numHashTables=num_hash_tables, seed=seed,
    )
    model = lsh.fit(feats)
    # transform ONCE and persist: approxSimilarityJoin reuses an
    # existing hashes column, so both join sides read the persisted
    # signatures instead of re-minhashing the corpus per side
    sigs = model.transform(feats).persist(StorageLevel.MEMORY_AND_DISK)
    joined = model.approxSimilarityJoin(
        sigs, sigs, max_distance, distCol="jaccard_dist"
    )
    return (
        joined.select(
            F.col("datasetA.id").alias("id_a"),
            F.col("datasetB.id").alias("id_b"),
            F.col("jaccard_dist"),
        )
        .filter(F.col("id_a") < F.col("id_b"))
    )
