"""Unit tests for the graph tier on hand-built edge lists."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_on_weather_dataset_spark.operators.graph import (
    PR_SCALE,
    cooccurrence_edges,
    degrees,
    pagerank_fixed_point,
    triangle_count,
)


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def test_cooccurrence_edges_pairs_and_cap(spark):
    rows = [
        # group 1: members 1,2,3 -> 3 edges; duplicate membership rows
        (1, 1), (1, 2), (1, 3), (1, 2),
        # group 2: members 3,4 -> 1 edge (3,4)
        (2, 3), (2, 4),
        # group 3: whale with 5 members, cap=4 -> dropped entirely
        (3, 10), (3, 11), (3, 12), (3, 13), (3, 14),
    ]
    df = spark.createDataFrame(rows, "g long, m long")
    got = {
        (r.src, r.dst)
        for r in cooccurrence_edges(df, "g", "m", max_group_size=4).collect()
    }
    assert got == {(1, 2), (1, 3), (2, 3), (3, 4)}


def test_degrees_and_triangles_known_graph(spark):
    # K4 on {1,2,3,4} (4 triangles) plus a pendant 4-5 (no new triangle)
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges = _edges_df(spark, k4 + [(4, 5)])
    deg = {r.node: r.degree for r in degrees(edges).collect()}
    assert deg == {1: 3, 2: 3, 3: 3, 4: 4, 5: 1}
    assert triangle_count(edges).collect()[0].n_triangles == 4


def test_triangle_count_no_triangles(spark):
    # a path graph has wedges but no triangles
    edges = _edges_df(spark, [(1, 2), (2, 3), (3, 4)])
    assert triangle_count(edges).collect()[0].n_triangles == 0


def test_pagerank_fixed_point_properties(spark):
    # star graph: center 0, leaves 1..4 -- center must outrank leaves,
    # all leaves tie exactly (integer arithmetic, no float jitter)
    edges = _edges_df(spark, [(0, i) for i in range(1, 5)])
    rows = pagerank_fixed_point(edges, iters=3).collect()
    ranks = {r.node: r.rank_q for r in rows}
    assert ranks[0] > ranks[1]
    assert len({ranks[i] for i in range(1, 5)}) == 1
    # total mass stays ~1 (floor division loses < 1 ulp-of-scale per
    # node per round: 3 rounds x 5 nodes x (1 contrib + 1 damp) floors)
    total = sum(ranks.values())
    assert abs(total - PR_SCALE) < 5 * 3 * 4
    # rank column is exactly rank_q / SCALE
    for r in rows:
        assert r.rank == r.rank_q / PR_SCALE


def test_pagerank_deterministic_across_partitionings(spark):
    # same graph, 1 vs 16 input partitions -> bit-identical rank_q
    pairs = [(a, b) for a in range(0, 20) for b in range(a + 1, 20)
             if (a * 7 + b * 3) % 5 == 0]
    e1 = _edges_df(spark, pairs).coalesce(1)
    e16 = _edges_df(spark, pairs).repartition(16)
    r1 = {r.node: r.rank_q for r in pagerank_fixed_point(e1).collect()}
    r16 = {r.node: r.rank_q for r in pagerank_fixed_point(e16).collect()}
    assert r1 == r16


def test_pagerank_empty_edges_returns_empty(spark):
    edges = spark.createDataFrame([], "src long, dst long")
    out = pagerank_fixed_point(edges, iters=2)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["node", "rank_q", "rank"]
