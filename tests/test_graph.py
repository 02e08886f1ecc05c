"""Scaled-integer PageRank (operators/graph.py): closed-form checks on
tiny graphs, mass conservation, dangling redistribution, partitioning
invariance."""

from __future__ import annotations

import pytest

from etl_s3_airflow_snowflake_powerbi_marketing_data_spark.operators import graph


def _ranks(df):
    return {r.node: r.rank_scaled for r in df.collect()}


def test_two_node_cycle_is_uniform(spark):
    edges = spark.createDataFrame([(1, 2, 1), (2, 1, 1)], ["src", "dst", "w"])
    r = _ranks(graph.pagerank(edges))
    # symmetric graph → equal ranks, each ~0.5 on the 1e12 grid
    assert r[1] == r[2]
    assert r[1] == pytest.approx(graph.RANK_SCALE // 2, rel=1e-9)


def test_mass_is_conserved_up_to_floor_losses(spark):
    edges = spark.createDataFrame(
        [(1, 2, 3), (2, 3, 1), (3, 1, 2), (1, 3, 1), (4, 1, 5)],
        ["src", "dst", "w"],
    )
    out = graph.pagerank(edges, iters=10)
    total = sum(_ranks(out).values())
    n_nodes, iters = 4, 10
    # each round loses < n_nodes from the floor in each of ~4 div sites
    assert graph.RANK_SCALE - total < n_nodes * iters * 8
    assert total <= graph.RANK_SCALE


def test_dangling_mass_redistributes(spark):
    # 1 -> 2, 2 dangling: without redistribution rank drains to the
    # teleport floor; with it, node 2 (fed by 1) outranks node 1
    edges = spark.createDataFrame([(1, 2, 1)], ["src", "dst", "w"])
    r = _ranks(graph.pagerank(edges))
    assert r[2] > r[1] > 0


def test_authority_hub_ordering(spark):
    # star into node 9: 9 must dominate every spoke
    edges = spark.createDataFrame(
        [(i, 9, 1) for i in range(1, 6)], ["src", "dst", "w"]
    )
    r = _ranks(graph.pagerank(edges))
    for i in range(1, 6):
        assert r[9] > r[i]
    assert len({r[i] for i in range(1, 6)}) == 1  # spokes identical


def test_partitioning_invariance_bit_for_bit(spark):
    rows = [(i % 23, (i * 7) % 23, 1 + i % 3) for i in range(200)]
    edges = spark.createDataFrame(rows, ["src", "dst", "w"])
    a = _ranks(graph.pagerank(edges, iters=8))
    b = _ranks(graph.pagerank(edges.repartition(13), iters=8))
    assert a == b


def test_weight_bias(spark):
    # from 1, edge to 2 has 9x the weight of the edge to 3
    edges = spark.createDataFrame(
        [(1, 2, 9), (1, 3, 1), (2, 1, 1), (3, 1, 1)], ["src", "dst", "w"]
    )
    r = _ranks(graph.pagerank(edges))
    assert r[2] > r[3]


def test_triangle_count_known_graphs(spark):
    # K4: 4 triangles, 6 edges, 12 wedges, coefficient 1.0
    k4 = spark.createDataFrame(
        [(a, b) for a in range(4) for b in range(4) if a < b],
        ["src", "dst"],
    )
    row = graph.triangle_count(k4).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_wedges, row.n_triangles) == (
        4, 6, 12, 4,
    )
    assert row.clustering_coeff == 1.0
    # a 5-cycle has wedges but no triangles
    c5 = spark.createDataFrame(
        [(i, (i + 1) % 5) for i in range(5)], ["src", "dst"]
    )
    row = graph.triangle_count(c5).collect()[0]
    assert row.n_triangles == 0
    assert row.clustering_coeff == 0.0
    assert row.n_wedges == 5


def test_triangle_count_collapses_direction_and_dups(spark):
    # both directions + duplicates + a self-loop of one triangle
    rows = [(1, 2), (2, 1), (2, 3), (2, 3), (3, 1), (1, 1)]
    row = graph.triangle_count(
        spark.createDataFrame(rows, ["src", "dst"])
    ).collect()[0]
    assert (row.n_edges, row.n_triangles) == (3, 1)


def test_triangle_count_matches_networkx_style_bruteforce(spark):
    import itertools

    rows = [(i % 17, (i * 5 + 3) % 17) for i in range(60)]
    edges = {(min(a, b), max(a, b)) for a, b in rows if a != b}
    brute = sum(
        1
        for x, y, z in itertools.combinations(sorted({n for e in edges for n in e}), 3)
        if (x, y) in edges and (y, z) in edges and (x, z) in edges
    )
    row = graph.triangle_count(
        spark.createDataFrame(rows, ["src", "dst"])
    ).collect()[0]
    assert row.n_triangles == brute


def test_validation(spark):
    edges = spark.createDataFrame([(1, 2, 1)], ["src", "dst", "w"])
    with pytest.raises(ValueError):
        graph.pagerank(edges, damping_pct=0)
    with pytest.raises(ValueError):
        graph.pagerank(edges, iters=0)


def test_hits_star_graph_identities(spark):
    # spokes -> hub node 9: node 9 is the sole authority, spokes are
    # the (equal) hubs
    edges = spark.createDataFrame(
        [(i, 9, 1) for i in range(1, 6)], ["src", "dst", "w"]
    )
    rows = {r.node: r for r in graph.hits(edges).collect()}
    assert rows[9].auth_scaled == graph.RANK_SCALE  # all authority mass
    assert rows[9].hub_scaled == 0
    spoke_hubs = {rows[i].hub_scaled for i in range(1, 6)}
    assert len(spoke_hubs) == 1
    assert rows[1].auth_scaled == 0


def test_hits_partitioning_invariance(spark):
    rows = [(i % 19, (i * 7 + 1) % 19) for i in range(150)]
    edges = spark.createDataFrame(rows, ["src", "dst"])
    a = [(r.node, r.hub_scaled, r.auth_scaled) for r in graph.hits(edges, iters=5).collect()]
    b = [
        (r.node, r.hub_scaled, r.auth_scaled)
        for r in graph.hits(edges.repartition(11), iters=5).collect()
    ]
    assert sorted(a) == sorted(b)


def test_hits_normalization_sums_to_scale(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (1, 3)], ["src", "dst"]
    )
    rows = graph.hits(edges, iters=4).collect()
    # each side normalizes to the grid total, up to per-node floor loss
    assert graph.RANK_SCALE - sum(r.hub_scaled for r in rows) < len(rows)
    assert graph.RANK_SCALE - sum(r.auth_scaled for r in rows) < len(rows)
