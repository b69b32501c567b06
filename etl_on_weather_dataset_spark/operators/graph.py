"""Graph analytics over DataFrame edge lists.

The reference has no graph surface; this tier serves the curation /
analytics use-cases a 100 TB corpus pipeline actually hits: entity
graphs (degree profiles), community-ish structure (triangles /
clustering), and influence scores (PageRank) -- all as pure DataFrame
ops, no GraphX/GraphFrames dependency (GraphX is RDD-based and Scala
-only; GraphFrames is not in the container).

Engine-invariance: PageRank runs in FIXED-POINT INTEGER arithmetic
(scaled bigints, floor division) so every aggregation is an exact
integer sum -- the result is bit-identical under any partitioning,
retry, or engine (the DuckDB oracle unrolls the same integer
recurrence). Parallel double sums would drift in the last bits and
break hash comparison; integer fixed-point is also the 100 TB answer
to non-deterministic retries.

Scale notes:
- edge derivation from the fact table groups by a bounded key
  (order -> its <=7 suppliers) before pair expansion, so the pair
  fan-out per group is O(k^2) with tiny constant k -- never a
  self-join of the raw fact table;
- triangle counting orients edges by (degree, id) (the standard
  node-iterator bound): every wedge is generated at its LOWEST-degree
  vertex, bounding per-vertex expansion by O(sqrt(m)) even with hubs;
- PageRank shuffles (src -> dst) contributions with map-side partial
  sums over a persisted directed edge list; the rank lineage is a
  linear chain checkpointed every ``persist_every`` rounds, so plan
  depth is bounded for any iteration count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .caching import persisted, untrack

#: fixed-point scale for PageRank ranks (12 decimal digits).
PR_SCALE = 10**12


def cooccurrence_edges(
    items: DataFrame, group_col: str, item_col: str, max_group_size: int = 64
) -> DataFrame:
    """Undirected distinct edges between items sharing a group.

    ``(src, dst)`` with ``src < dst``, one row per pair. Groups larger
    than ``max_group_size`` distinct items are dropped (a whale group
    of size g contributes g^2/2 pairs; the cap keeps the expansion
    linear in input -- same hot-key philosophy as the dedup tiers'
    ``max_doc_freq``).
    """
    members = (
        items.select(
            F.col(group_col).alias("g"), F.col(item_col).alias("m")
        )
        .distinct()
        .groupBy("g")
        .agg(F.sort_array(F.collect_set("m")).alias("ms"))
        .filter(F.size("ms") <= max_group_size)
    )
    # pair expansion inside the row: bounded-k cartesian via 2 explodes
    return (
        members.select(
            F.explode("ms").alias("src"), F.col("ms")
        )
        .select("src", F.explode("ms").alias("dst"))
        .filter(F.col("src") < F.col("dst"))
        .distinct()
    )


def degrees(edges: DataFrame) -> DataFrame:
    """Per-node degree of an undirected ``(src < dst)`` edge list."""
    both = edges.select(F.col("src").alias("node")).unionAll(
        edges.select(F.col("dst").alias("node"))
    )
    return both.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))


def triangle_count(edges: DataFrame) -> DataFrame:
    """Global triangle count via degree-ordered node-iterator join.

    Orient each undirected edge from the (degree, id)-smaller endpoint
    to the larger; generate wedges at the smallest vertex of each
    triangle and close them against the oriented list. Each triangle
    is counted exactly once. Returns 1 row: ``n_triangles``.
    """
    deg = degrees(edges)
    d_src = deg.select(
        F.col("node").alias("src"), F.col("degree").alias("d_src")
    )
    d_dst = deg.select(
        F.col("node").alias("dst"), F.col("degree").alias("d_dst")
    )
    with_deg = edges.join(d_src, "src").join(d_dst, "dst")
    lower_first = (F.col("d_src") < F.col("d_dst")) | (
        (F.col("d_src") == F.col("d_dst")) & (F.col("src") < F.col("dst"))
    )
    oriented = with_deg.select(
        F.when(lower_first, F.col("src")).otherwise(F.col("dst")).alias("u"),
        F.when(lower_first, F.col("dst")).otherwise(F.col("src")).alias("v"),
    )
    e1 = oriented.alias("e1")
    e2 = oriented.alias("e2")
    # wedges (u -> v, u -> w), v != w, generated at min-degree vertex u
    wedges = e1.join(e2, F.col("e1.u") == F.col("e2.u")).filter(
        F.col("e1.v") < F.col("e2.v")
    ).select(F.col("e1.v").alias("a"), F.col("e2.v").alias("b"))
    # close the wedge: need a->b or b->a in the oriented list; since
    # orientation is a total order, exactly one direction can exist.
    closer = oriented.select(
        F.col("u").alias("a"), F.col("v").alias("b")
    ).unionAll(oriented.select(F.col("v").alias("a"), F.col("u").alias("b")))
    tri = wedges.join(closer, ["a", "b"], "left_semi")
    return tri.agg(F.count(F.lit(1)).alias("n_triangles"))


def pagerank_fixed_point(
    edges: DataFrame,
    iters: int = 3,
    damping_pct: int = 85,
    persist_every: int = 5,
) -> DataFrame:
    """PageRank on an undirected edge list, exact fixed-point integers.

    Recurrence (all integer, floor division; SCALE = 10^12):

        r0      = SCALE // n_nodes
        contrib = r // degree                 (per directed edge)
        r'      = ((100 - d)*SCALE//n_nodes + d*sum(contrib)) // 100

    Every engine computing this recurrence gets the SAME bigints --
    integer sums are associative, so Spark's partial aggregation and a
    sequential SQL engine agree exactly. Returns (node, rank_q BIGINT,
    rank DOUBLE = rank_q/SCALE).

    The symmetric directed expansion means no dangling nodes (every
    node in the edge list has >= 1 out-edge).

    ``persist_every``: the rank lineage is a LINEAR chain (each frame
    feeds only the next), so short runs need no materialization at
    all -- one lazy plan, one job. Persisting every round would add a
    count-job per iteration (measured 3x wall at sf0.1 for K=3).
    Lineage depth still can't run away: every ``persist_every``-th
    rank frame is persisted + materialized and its predecessor
    dropped, bounding plan depth at O(persist_every) joins for any K.
    """
    # directed is joined once per iteration: persist it so the edge
    # derivation (often a grouped pair expansion upstream) runs once,
    # not once per iteration (measured 2.7x wall at sf0.1, K=3)
    directed = persisted(edges.select("src", "dst").unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ))
    outdeg = directed.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    outdeg = persisted(outdeg)
    # one scalar; materializes both persists (outdeg scans directed)
    n_nodes = outdeg.count()
    if n_nodes == 0:
        return outdeg.select(
            F.col("src").alias("node"),
            F.lit(0).cast("long").alias("rank_q"),
            F.lit(0.0).alias("rank"),
        )

    ranks = outdeg.select(
        "src", F.lit(PR_SCALE // n_nodes).cast("long").alias("rank_q")
    )
    base_q = (100 - damping_pct) * PR_SCALE // n_nodes
    prev = None
    for it in range(iters):
        contribs = (
            directed.join(ranks, "src")
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("src"),
                # `div`, not `/`+cast: float division could round up at
                # a ulp boundary and break the exact integer recurrence
                F.expr("rank_q div outdeg").alias("c_q"),
            )
            .groupBy("src")
            .agg(F.sum("c_q").alias("sum_c"))
        )
        # every node has in-edges here (symmetric graph) but keep the
        # coalesce so the operator is safe on genuinely directed input
        ranks = outdeg.select("src").join(contribs, "src", "left").select(
            "src",
            F.expr(
                f"(CAST({base_q} AS BIGINT)"
                f" + {damping_pct} * COALESCE(sum_c, 0)) div 100"
            ).alias("rank_q"),
        )
        if (it + 1) % persist_every == 0 and it + 1 < iters:
            ranks = persisted(ranks)
            ranks.count()  # materialize before dropping the parent
            if prev is not None:
                prev.unpersist()
                untrack(prev)
            prev = ranks
    return ranks.select(
        F.col("src").alias("node"),
        "rank_q",
        (F.col("rank_q") / float(PR_SCALE)).alias("rank"),
    )


def pagerank_oracle_sql(
    edges_sql: str, iters: int = 3, damping_pct: int = 85
) -> tuple[str, str]:
    """DuckDB twin of :func:`pagerank_fixed_point`: the same integer
    recurrence unrolled as ``iters`` chained CTEs over ``edges_sql``
    (a query producing undirected (src, dst) with src < dst).

    Returns ``(cte_prefix, last_cte_name)`` -- the caller appends its
    own final SELECT over the last CTE (see queries_graph.py)."""
    pre = f"""
        WITH edges AS ({edges_sql}),
        directed AS (
            SELECT src, dst FROM edges
            UNION ALL SELECT dst AS src, src AS dst FROM edges
        ),
        outdeg AS (
            SELECT src, COUNT(*) AS outdeg FROM directed GROUP BY src
        ),
        n AS (SELECT COUNT(*) AS n_nodes FROM outdeg),
        r0 AS (
            SELECT src, CAST({PR_SCALE} // n_nodes AS BIGINT) AS rank_q
            FROM outdeg, n
        )"""
    prev = "r0"
    for i in range(1, iters + 1):
        pre += f""",
        c{i} AS (
            SELECT d.dst AS src,
                   SUM(CAST(r.rank_q // o.outdeg AS BIGINT)) AS sum_c
            FROM directed d
            JOIN {prev} r ON d.src = r.src
            JOIN outdeg o ON d.src = o.src
            GROUP BY d.dst
        ),
        r{i} AS (
            SELECT o.src,
                   CAST((({100 - damping_pct} * {PR_SCALE} // n_nodes)
                         + {damping_pct} * COALESCE(c.sum_c, 0)) // 100
                        AS BIGINT) AS rank_q
            FROM outdeg o CROSS JOIN n LEFT JOIN c{i} c ON o.src = c.src
        )"""
        prev = f"r{i}"
    return pre, prev
