"""Entity resolution / record linkage: q-gram blocking + edit-distance
verification (north-star par.2b -- the dedup problem for STRUCTURED
records rather than documents).

Pipeline shape (the only scalable one -- never all-pairs):

1. each record's name -> distinct character q-grams (in-row array
   expressions, no shuffle);
2. hot-gram guard: grams occurring in more than ``max_rel_freq`` of
   all records are dropped from the index (same role as
   ngram_jaccard's ``max_doc_freq`` stop-shingles -- a shared prefix
   like "Customer#" would otherwise put every record in one block);
   the total-record count is a one-row broadcast aggregate, never a
   driver-side ``.count()``;
3. blocking: equi-join the two sides' (id, gram) postings on gram ->
   distinct candidate id pairs (ids only; names join back afterwards
   so the gram exchange ships no strings);
4. verification: ``levenshtein(name_a, name_b) <= max_dist`` on
   candidates only.

Deletion-robustness: a single character edit destroys at most q grams
of its record, so any pair within edit distance d still shares grams
whenever the name has more than (d+1)*q grams -- blocking recall is
structural, not probabilistic, modulo the hot-gram drops (reported
honestly by the summary's recall column).

Both engines have identical ``levenshtein``; everything else is
integer counting, so the DuckDB twin is exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def char_qgrams(name: Column | str, q: int = 3) -> Column:
    """Distinct character q-grams; names shorter than q collapse to a
    single whole-string gram."""
    c = F.col(name) if isinstance(name, str) else name
    starts = F.sequence(F.lit(1), F.length(c) - q + 1)
    return F.array_distinct(
        F.when(
            F.length(c) >= q,
            F.transform(starts, lambda i: F.substring(c, i, q)),
        ).otherwise(F.array(c))
    )


def _char_qgrams_sql(name_sql: str, q: int = 3) -> str:
    return (
        f"list_distinct(CASE WHEN length({name_sql}) >= {q} THEN "
        f"list_transform(range(1, length({name_sql}) - {q} + 2), "
        f"i -> {name_sql}[i:i+{q}-1]) "
        f"ELSE [{name_sql}] END)"
    )


def qgram_candidate_pairs(
    clean: DataFrame,
    dirty: DataFrame,
    name_col: str = "name",
    id_col: str = "id",
    q: int = 3,
    max_rel_freq: float = 0.05,
    min_keep_count: int = 5,
    max_abs_count: int | None = None,
) -> DataFrame:
    """Blocking stage only: distinct candidate ``(id_a, id_b)`` pairs
    sharing >= 1 sufficiently-rare q-gram (steps 1-3 of the module
    pipeline, no verification). Exposed separately so blocking
    QUALITY can be audited against the same candidate set the
    verifier scores (:func:`blocking_quality`)."""
    from .caching import persisted
    from .skew import ensure_parallel_scan

    # under-parallel-input guard (optimization round 13, guide par.2 /
    # the round-11 flagship lesson): each side of a small benchmark
    # corpus is ONE sub-128MB parquet split, so the q-gram explode --
    # the heavy per-row stage -- ran as a single task however many
    # cores exist (measured: the grams+freq leg of
    # record_linkage_summary spent 3.2 s in one task at sf0.1, and the
    # row's 8-vs-32-core scaling ratio was 0.79, i.e. none). At real
    # scale inputs carry >> cores splits and this is a no-op.
    a = ensure_parallel_scan(
        clean.select(
            F.col(id_col).alias("id_a"), F.col(name_col).alias("name_a")
        ),
        "id_a",
    )
    b = ensure_parallel_scan(
        dirty.select(
            F.col(id_col).alias("id_b"), F.col(name_col).alias("name_b")
        ),
        "id_b",
    )
    ga = a.select(
        "id_a", F.explode(char_qgrams("name_a", q)).alias("gram")
    )
    gb = b.select(
        "id_b", F.explode(char_qgrams("name_b", q)).alias("gram")
    )
    # hot-gram guard: rel-freq over total records, computed as a
    # broadcast scalar (one aggregate row, no driver action)
    totals = (
        a.select(F.count("*").alias("na"))
        .crossJoin(b.select(F.count("*").alias("nb")))
        .select((F.col("na") + F.col("nb")).alias("n_records"))
    )
    gram_freq = (
        ga.select("gram").unionAll(gb.select("gram"))
        .groupBy("gram")
        .agg(F.count("*").alias("cnt"))
    )
    # persisted: the surviving-gram set feeds BOTH posting-list joins
    # below, and each broadcast build otherwise re-ran the full gram
    # explode + frequency aggregate -- the query's most expensive
    # subtree, observed twice in the executed plan (two identical
    # 11.5 MB shuffle stages at sf0.1; optimization round 13, guide
    # par.5 materialize-once)
    keep = persisted(
        gram_freq.crossJoin(F.broadcast(totals))
        .filter(
            F.col("cnt").cast("double")
            <= (
                F.greatest(
                    F.lit(max_rel_freq) * F.col("n_records"),
                    F.lit(float(min_keep_count)),
                )
                if max_abs_count is None
                else F.least(
                    F.greatest(
                        F.lit(max_rel_freq) * F.col("n_records"),
                        F.lit(float(min_keep_count)),
                    ),
                    F.lit(float(max_abs_count)),
                )
            )
        )
        .select("gram")
    )
    return (
        ga.join(keep, "gram")
        .join(gb.join(keep, "gram"), "gram")
        .select("id_a", "id_b")
        .distinct()
    )


def qgram_blocked_pairs(
    clean: DataFrame,
    dirty: DataFrame,
    name_col: str = "name",
    id_col: str = "id",
    q: int = 3,
    max_rel_freq: float = 0.05,
    max_dist: int = 2,
    min_keep_count: int = 5,
    max_abs_count: int | None = None,
) -> DataFrame:
    """Verified links (id_a, id_b, dist) between two record sets.

    ``id_a``/``name_a`` come from ``clean``, ``id_b``/``name_b`` from
    ``dirty``. Only pairs sharing >= 1 sufficiently-rare q-gram are
    ever scored (:func:`qgram_candidate_pairs`). The hot-gram cutoff
    is ``greatest(max_rel_freq * n_records, min_keep_count)`` -- the
    absolute floor keeps small corpora from dropping every gram
    (0.05 * 7 records would otherwise ban even singletons).

    ``max_abs_count`` additionally CAPS the cutoff with an absolute
    block-size bound. A relative cutoff alone lets block sizes (and
    so candidate pairs, quadratic per block) grow linearly with the
    corpus -- measured: the 10x scale smoke on a dense digit-name
    space went 179x in wall time before this cap existed. Real
    deployments always bound block size absolutely; recall then
    degrades gracefully on pathological key spaces instead of the job
    going quadratic.
    """
    a = clean.select(
        F.col(id_col).alias("id_a"), F.col(name_col).alias("name_a")
    )
    b = dirty.select(
        F.col(id_col).alias("id_b"), F.col(name_col).alias("name_b")
    )
    cand = qgram_candidate_pairs(
        clean, dirty, name_col, id_col, q, max_rel_freq,
        min_keep_count, max_abs_count,
    )
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        # levenshtein >= |len(a) - len(b)|: the length gate prunes
        # pairs before the O(len^2) distance computation ever runs
        .filter(
            F.abs(F.length("name_a") - F.length("name_b")) <= max_dist
        )
        .select(
            "id_a",
            "id_b",
            F.levenshtein("name_a", "name_b").alias("dist"),
        )
        .filter(F.col("dist") <= max_dist)
    )


def qgram_blocked_pairs_sql(
    clean_sql: str,
    dirty_sql: str,
    name_col: str = "name",
    id_col: str = "id",
    q: int = 3,
    max_rel_freq: float = 0.05,
    max_dist: int = 2,
    min_keep_count: int = 5,
    max_abs_count: int | None = None,
) -> str:
    """DuckDB twin of qgram_blocked_pairs. ``clean_sql``/``dirty_sql``
    are subqueries yielding (id, name) under the given column names."""
    ctes = _qgram_cand_ctes(
        clean_sql, dirty_sql, name_col, id_col, q, max_rel_freq,
        min_keep_count, max_abs_count,
    )
    return f"""
        WITH {ctes}
        SELECT id_a, id_b, levenshtein(name_a, name_b) AS dist
        FROM cand JOIN a USING (id_a) JOIN b USING (id_b)
        WHERE abs(length(name_a) - length(name_b)) <= {max_dist}
          AND levenshtein(name_a, name_b) <= {max_dist}
    """


def _qgram_cand_ctes(
    clean_sql: str,
    dirty_sql: str,
    name_col: str = "name",
    id_col: str = "id",
    q: int = 3,
    max_rel_freq: float = 0.05,
    min_keep_count: int = 5,
    max_abs_count: int | None = None,
) -> str:
    """Shared CTE body (a, b, ga, gb, totals, keep, cand) -- the
    DuckDB twin of :func:`qgram_candidate_pairs`, embedded by both
    the verified-pairs and blocking-quality builders."""
    cutoff = (
        f"greatest({max_rel_freq!r} * n_records,"
        f" {float(min_keep_count)!r})"
    )
    if max_abs_count is not None:
        cutoff = f"least({cutoff}, {float(max_abs_count)!r})"
    return f"""a AS (SELECT {id_col} AS id_a, {name_col} AS name_a
                   FROM ({clean_sql})),
        b AS (SELECT {id_col} AS id_b, {name_col} AS name_b
              FROM ({dirty_sql})),
        ga AS (SELECT id_a, unnest({_char_qgrams_sql('name_a', q)})
                   AS gram FROM a),
        gb AS (SELECT id_b, unnest({_char_qgrams_sql('name_b', q)})
                   AS gram FROM b),
        totals AS (
            SELECT (SELECT COUNT(*) FROM a)
                 + (SELECT COUNT(*) FROM b) AS n_records
        ),
        keep AS (
            SELECT gram FROM (
                SELECT gram, COUNT(*) AS cnt
                FROM (SELECT gram FROM ga
                      UNION ALL SELECT gram FROM gb)
                GROUP BY gram
            ) CROSS JOIN totals
            WHERE CAST(cnt AS DOUBLE) <= {cutoff}
        ),
        cand AS (
            SELECT DISTINCT id_a, id_b
            FROM (SELECT * FROM ga JOIN keep USING (gram)) x
            JOIN (SELECT * FROM gb JOIN keep USING (gram)) y
                USING (gram)
        )"""


def linkage_summary(
    clean: DataFrame,
    dirty: DataFrame,
    name_col: str = "name",
    id_col: str = "id",
    q: int = 3,
    max_rel_freq: float = 0.05,
    max_dist: int = 2,
    min_keep_count: int = 5,
    max_abs_count: int | None = None,
) -> DataFrame:
    """One-row audit of a linkage run: verified links, how many link a
    record to its own counterpart (id_a = id_b -- ground truth when
    ``dirty`` is a perturbed copy of ``clean``), and structural recall
    as integer parts-per-million: ``recall_ppm`` = (n_true_links *
    1e6) div n_records. The r4 surface emitted the raw IEEE ratio as
    a double; the driver's hash missed on it (r4 verdict) -- the
    compare surface is all-BIGINT now, and consumers derive the float
    ratio from n_true_links / n_records themselves."""
    pairs = qgram_blocked_pairs(
        clean, dirty, name_col, id_col, q, max_rel_freq, max_dist,
        min_keep_count, max_abs_count,
    )
    n_clean = clean.select(F.count("*").alias("n_records"))
    return (
        pairs.agg(
            F.count("*").alias("n_links"),
            F.coalesce(
                F.sum((F.col("id_a") == F.col("id_b")).cast("long")),
                F.lit(0),
            ).alias("n_true_links"),
        )
        .crossJoin(F.broadcast(n_clean))
        .select(
            "n_records",
            "n_links",
            "n_true_links",
            F.expr(
                "CASE WHEN n_records = 0 THEN CAST(0 AS BIGINT) "
                "ELSE n_true_links * CAST(1000000 AS BIGINT) "
                "div n_records END"
            ).alias("recall_ppm"),
        )
    )


def linkage_summary_sql(
    clean_sql: str,
    dirty_sql: str,
    name_col: str = "name",
    id_col: str = "id",
    q: int = 3,
    max_rel_freq: float = 0.05,
    max_dist: int = 2,
    min_keep_count: int = 5,
    max_abs_count: int | None = None,
) -> str:
    pairs = qgram_blocked_pairs_sql(
        clean_sql, dirty_sql, name_col, id_col, q, max_rel_freq,
        max_dist, min_keep_count, max_abs_count,
    )
    return f"""
        SELECT (SELECT COUNT(*) FROM ({clean_sql})) AS n_records,
               COUNT(*) AS n_links,
               CAST(COALESCE(SUM(CASE WHEN id_a = id_b
                                  THEN 1 ELSE 0 END),
                             0) AS BIGINT) AS n_true_links,
               CAST(CASE WHEN (SELECT COUNT(*) FROM ({clean_sql})) = 0
                    THEN 0
                    ELSE COALESCE(SUM(CASE WHEN id_a = id_b
                                      THEN 1 ELSE 0 END), 0) * 1000000
                         // (SELECT COUNT(*) FROM ({clean_sql}))
                    END AS BIGINT) AS recall_ppm
        FROM ({pairs})
    """


def golden_records(
    clean: DataFrame,
    dirty: DataFrame,
    name_col: str = "name",
    id_col: str = "id",
    q: int = 3,
    max_rel_freq: float = 0.05,
    max_dist: int = 2,
    min_keep_count: int = 5,
    max_abs_count: int | None = None,
) -> DataFrame:
    """Survivorship -- the third and final stage of entity
    resolution (blocking -> verification -> GOLDEN RECORD): for every
    ``clean`` entity, merge its verified ``dirty`` variants into one
    canonical row.

    Canonical value rule (deterministic, engine-invariant): the
    golden name is the MOST FREQUENT observation among the clean name
    plus every matched dirty name, ties broken (count DESC, value
    ASC) -- the repo's grouped-mode discipline, so no RNG and no
    first-seen order dependence. Output one row per clean id:
    (id, golden_name, n_variants, n_observations, changed) where
    ``changed`` flags entities whose golden name differs from the
    clean source (majority-of-variants outvoted it).

    Scale shape: the observation table is |clean| + |verified pairs|
    rows; survivorship is one (id, name) count + one min_by argmax --
    two map-side-combinable aggregates, nothing quadratic beyond the
    already-blocked pair generation. At scale, pick ``q`` to the
    keyspace density (distinct q-grams must grow with the corpus or
    blocks go quadratic: measured 21x at 10x with 3-grams over a
    16^3-gram hex namespace, 2.1x with q=5 + ``max_abs_count`` --
    SCALE.md round-5 lesson).
    """
    pairs = qgram_blocked_pairs(
        clean, dirty, name_col, id_col, q, max_rel_freq, max_dist,
        min_keep_count, max_abs_count,
    )
    c = clean.select(
        F.col(id_col).alias("id"), F.col(name_col).alias("obs")
    )
    d_obs = pairs.join(
        dirty.select(
            F.col(id_col).alias("id_b"), F.col(name_col).alias("obs")
        ),
        "id_b",
    ).select(F.col("id_a").alias("id"), "obs")
    obs = c.unionByName(d_obs)
    counts = obs.groupBy("id", "obs").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    golden = counts.groupBy("id").agg(
        F.min_by(
            "obs",
            F.struct((-F.col("cnt")).alias("nc"), F.col("obs")),
        ).alias("golden_name"),
        F.count(F.lit(1)).alias("n_variants"),
        F.sum("cnt").alias("n_observations"),
    )
    return (
        golden.join(
            c.withColumnRenamed("obs", "clean_name"), "id"
        )
        .select(
            "id", "golden_name", "n_variants", "n_observations",
            (F.col("golden_name") != F.col("clean_name"))
            .cast("int").alias("changed"),
        )
    )


def golden_records_sql(
    clean_sql: str,
    dirty_sql: str,
    name_col: str = "name",
    id_col: str = "id",
    q: int = 3,
    max_rel_freq: float = 0.05,
    max_dist: int = 2,
    min_keep_count: int = 5,
    max_abs_count: int | None = None,
) -> str:
    """DuckDB twin of :func:`golden_records` (same mode tie-break)."""
    pairs = qgram_blocked_pairs_sql(
        clean_sql, dirty_sql, name_col, id_col, q, max_rel_freq,
        max_dist, min_keep_count, max_abs_count,
    )
    return f"""
        WITH pairs AS ({pairs}),
        obs AS (
            SELECT {id_col} AS id, {name_col} AS obs
            FROM ({clean_sql})
            UNION ALL
            SELECT p.id_a AS id, d.{name_col} AS obs
            FROM pairs p JOIN ({dirty_sql}) d ON d.{id_col} = p.id_b
        ),
        counts AS (
            SELECT id, obs, COUNT(*) AS cnt FROM obs GROUP BY id, obs
        ),
        golden AS (
            -- deterministic mode: ROW_NUMBER over (cnt DESC, obs
            -- ASC), the oracle-side form of Spark's min_by struct
            -- key (DuckDB's min_by takes no composite ordering key)
            SELECT w.id, w.obs AS golden_name,
                   t.n_variants, t.n_observations
            FROM (
                SELECT id, obs,
                       ROW_NUMBER() OVER (
                           PARTITION BY id
                           ORDER BY cnt DESC, obs ASC
                       ) AS rn
                FROM counts
            ) w
            JOIN (
                SELECT id, COUNT(*) AS n_variants,
                       CAST(SUM(cnt) AS BIGINT) AS n_observations
                FROM counts GROUP BY id
            ) t ON t.id = w.id
            WHERE w.rn = 1
        )
        SELECT g.id, g.golden_name, g.n_variants, g.n_observations,
               CAST(g.golden_name != c.{name_col} AS INTEGER)
                   AS changed
        FROM golden g JOIN ({clean_sql}) c ON c.{id_col} = g.id
    """


# --- blocking-quality audit ------------------------------------------------------


def blocking_quality(
    clean: DataFrame,
    dirty: DataFrame,
    name_col: str = "name",
    id_col: str = "id",
    q: int = 3,
    max_rel_freq: float = 0.05,
    max_dist: int = 2,
    min_keep_count: int = 5,
    max_abs_count: int | None = None,
    panel_ppm: int = 40_000,
    salt: str = "bq",
) -> DataFrame:
    """One-row audit of the BLOCKING stage itself -- the two numbers
    every linkage deployment tunes on (Christen, "Data Matching",
    ch. 7): how much work blocking saved, and how many true matches
    it can still reach.

    - ``reduction_ppm`` = 1e6 - candidate_pairs*1e6 div (n_a*n_b):
      the fraction of the full cross product the verifier never sees.
    - ``completeness_ppm``: pairs completeness measured on a PANEL --
      an md5-chosen ~``panel_ppm``/1e6 fraction of ids selected with
      the SAME salt on both sides (so a record and its counterpart
      enter together). The panel's ground truth is computed
      EXHAUSTIVELY (length gate + levenshtein <= max_dist over
      panel_a x panel_b -- the one deliberate bounded brute-force
      arm, O((panel fraction)^2 * n_a*n_b), the standard estimator
      when the full cross product is unpayable); completeness = the
      share of true panel matches whose pair survives blocking.
      ``completeness_ppm`` is 1e6 when the panel holds no true match
      (vacuously complete; ``panel_true_matches`` disambiguates).

    Every output is BIGINT (counts and ppm by truncating division) --
    md5 selection, levenshtein and integer arithmetic are identical
    in both engines, so the DuckDB twin is exact.

    Scale: blocking cost is the candidate join (bounded by the
    hot-gram/abs-count guards); the audit adds one grams-free
    aggregate per side plus the panel brute arm, whose size the
    caller dials with ``panel_ppm`` independently of corpus growth.
    """
    from .sample import hash_bucket

    a = clean.select(
        F.col(id_col).alias("id_a"), F.col(name_col).alias("name_a")
    )
    b = dirty.select(
        F.col(id_col).alias("id_b"), F.col(name_col).alias("name_b")
    )
    cand = qgram_candidate_pairs(
        clean, dirty, name_col, id_col, q, max_rel_freq,
        min_keep_count, max_abs_count,
    )
    counts = (
        a.agg(F.count("*").cast("long").alias("n_a"))
        .crossJoin(b.agg(F.count("*").cast("long").alias("n_b")))
        .crossJoin(
            cand.agg(
                F.count("*").cast("long").alias("candidate_pairs")
            )
        )
    )
    pa = a.filter(hash_bucket("id_a", salt=salt) < panel_ppm)
    pb = b.filter(hash_bucket("id_b", salt=salt) < panel_ppm)
    truth = (
        pa.crossJoin(pb)
        .filter(
            F.abs(F.length("name_a") - F.length("name_b")) <= max_dist
        )
        .filter(F.levenshtein("name_a", "name_b") <= max_dist)
        .select("id_a", "id_b")
    )
    found = truth.join(cand, ["id_a", "id_b"], "left_semi")
    panel = (
        pa.agg(F.count("*").cast("long").alias("panel_a_n"))
        .crossJoin(pb.agg(F.count("*").cast("long").alias("panel_b_n")))
        .crossJoin(
            truth.agg(
                F.count("*").cast("long").alias("panel_true_matches")
            )
        )
        .crossJoin(
            found.agg(
                F.count("*").cast("long").alias("panel_found")
            )
        )
    )
    return counts.crossJoin(panel).select(
        "n_a", "n_b", "candidate_pairs",
        F.expr(
            "CASE WHEN n_a * n_b = 0 THEN CAST(0 AS BIGINT) "
            "ELSE CAST(1000000 AS BIGINT)"
            " - candidate_pairs * CAST(1000000 AS BIGINT)"
            " div (n_a * n_b) END"
        ).alias("reduction_ppm"),
        "panel_a_n", "panel_b_n", "panel_true_matches", "panel_found",
        F.expr(
            "CASE WHEN panel_true_matches = 0"
            " THEN CAST(1000000 AS BIGINT) "
            "ELSE panel_found * CAST(1000000 AS BIGINT)"
            " div panel_true_matches END"
        ).alias("completeness_ppm"),
    )


def blocking_quality_sql(
    clean_sql: str,
    dirty_sql: str,
    name_col: str = "name",
    id_col: str = "id",
    q: int = 3,
    max_rel_freq: float = 0.05,
    max_dist: int = 2,
    min_keep_count: int = 5,
    max_abs_count: int | None = None,
    panel_ppm: int = 40_000,
    salt: str = "bq",
) -> str:
    """DuckDB twin of :func:`blocking_quality`."""
    from .sample import hash_bucket_sql

    ctes = _qgram_cand_ctes(
        clean_sql, dirty_sql, name_col, id_col, q, max_rel_freq,
        min_keep_count, max_abs_count,
    )
    sel_a = hash_bucket_sql("id_a", salt=salt)
    sel_b = hash_bucket_sql("id_b", salt=salt)
    return f"""
        WITH {ctes},
        pa AS (SELECT * FROM a WHERE {sel_a} < {panel_ppm}),
        pb AS (SELECT * FROM b WHERE {sel_b} < {panel_ppm}),
        truth AS (
            SELECT id_a, id_b FROM pa CROSS JOIN pb
            WHERE abs(length(name_a) - length(name_b)) <= {max_dist}
              AND levenshtein(name_a, name_b) <= {max_dist}
        ),
        found AS (
            SELECT t.id_a, t.id_b FROM truth t
            WHERE EXISTS (SELECT 1 FROM cand c
                          WHERE c.id_a = t.id_a AND c.id_b = t.id_b)
        )
        SELECT
            (SELECT CAST(COUNT(*) AS BIGINT) FROM a) AS n_a,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM b) AS n_b,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM cand)
                AS candidate_pairs,
            CAST(CASE WHEN (SELECT COUNT(*) FROM a)
                          * (SELECT COUNT(*) FROM b) = 0 THEN 0
                 ELSE 1000000
                      - (SELECT COUNT(*) FROM cand) * 1000000
                        // ((SELECT COUNT(*) FROM a)
                            * (SELECT COUNT(*) FROM b))
                 END AS BIGINT) AS reduction_ppm,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM pa) AS panel_a_n,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM pb) AS panel_b_n,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM truth)
                AS panel_true_matches,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM found)
                AS panel_found,
            CAST(CASE WHEN (SELECT COUNT(*) FROM truth) = 0
                 THEN 1000000
                 ELSE (SELECT COUNT(*) FROM found) * 1000000
                      // (SELECT COUNT(*) FROM truth)
                 END AS BIGINT) AS completeness_ppm
    """
