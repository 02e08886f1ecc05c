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


def test_validation(spark):
    edges = spark.createDataFrame([(1, 2, 1)], ["src", "dst", "w"])
    with pytest.raises(ValueError):
        graph.pagerank(edges, damping_pct=0)
    with pytest.raises(ValueError):
        graph.pagerank(edges, iters=0)
