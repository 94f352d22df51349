"""Connected components (operators/graph.py): correctness on known
topologies, convergence on chains (pointer-jumping), cluster rollup."""

from __future__ import annotations

import pytest

from scraper_db_refine_merge_spark.operators.graph import (
    connected_components,
    dup_clusters,
)


def _cc(spark, pairs, max_iter=25):
    edges = spark.createDataFrame(pairs, "a long, b long")
    got = connected_components(edges, "a", "b", max_iter=max_iter)
    return {r["node"]: r["component"] for r in got.collect()}


def test_two_components(spark):
    labels = _cc(spark, [(1, 2), (2, 3), (10, 11), (12, 11)])
    assert labels == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_long_chain_converges_logarithmically(spark):
    # a 64-node path has diameter 63; pointer jumping must close it well
    # within 25 rounds (min-propagation alone would need 63)
    labels = _cc(spark, [(i, i + 1) for i in range(64)])
    assert set(labels.values()) == {0}
    assert len(labels) == 65


def test_clique_and_singleton_edge(spark):
    pairs = [(a, b) for a in range(5) for b in range(a + 1, 5)] + [(100, 101)]
    labels = _cc(spark, pairs)
    assert all(labels[n] == 0 for n in range(5))
    assert labels[100] == labels[101] == 100


def test_empty_edges(spark):
    edges = spark.createDataFrame([], "a long, b long")
    assert connected_components(edges, "a", "b").count() == 0


def test_max_iter_guard(spark):
    edges = spark.createDataFrame([(i, i + 1) for i in range(64)], "a long, b long")
    with pytest.raises(RuntimeError, match="no convergence"):
        connected_components(edges, "a", "b", max_iter=1)


def test_dup_clusters_rollup(spark):
    pairs = spark.createDataFrame([(1, 2), (2, 3), (7, 8)], "a_id long, b_id long")
    rows = {r["doc_id"]: r for r in dup_clusters(pairs).collect()}
    assert rows[1]["cluster_id"] == rows[2]["cluster_id"] == rows[3]["cluster_id"] == 1
    assert rows[1]["cluster_size"] == 3
    assert rows[7]["cluster_size"] == 2
