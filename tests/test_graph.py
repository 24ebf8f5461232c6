"""PageRank operator contracts."""

from __future__ import annotations

import pytest

from pyarrow_ops_spark.functions.graph import pagerank


def test_pagerank_star_center_dominates(spark):
    # undirected star: center exchanges rank with every leaf
    edges = []
    for leaf in ["b", "c", "d", "e"]:
        edges += [("a", leaf), (leaf, "a")]
    df = spark.createDataFrame(edges, "src string, dst string")
    out = {r.node: r.rank for r in pagerank(df, iterations=10).collect()}
    assert out["a"] > out["b"] > 0
    leaf_ranks = {out[n] for n in ["b", "c", "d", "e"]}
    assert len(leaf_ranks) == 1  # symmetry
    # no sinks in an undirected graph: total mass conserved (ranks round
    # to 6 decimals on output, so 5 nodes can carry up to 2.5e-6 of
    # aggregate rounding)
    assert abs(sum(out.values()) - 1.0) < 3e-6


def test_pagerank_hand_computed_two_cycle(spark):
    # a <-> b: uniform is the fixed point; every iteration must keep 0.5
    df = spark.createDataFrame([("a", "b"), ("b", "a")], "src string, dst string")
    out = {r.node: r.rank for r in pagerank(df, iterations=5).collect()}
    assert abs(out["a"] - 0.5) < 1e-9
    assert abs(out["b"] - 0.5) < 1e-9


def test_pagerank_sink_leaks_mass(spark):
    # directed a -> b: b is a sink; documented simplification, sum < 1
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    out = {r.node: r.rank for r in pagerank(df, iterations=3).collect()}
    assert out["b"] > out["a"]
    assert sum(out.values()) < 1.0


def test_pagerank_validation(spark):
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError):
        pagerank(df, iterations=0)
    with pytest.raises(ValueError):
        pagerank(df, damping=1.5)
