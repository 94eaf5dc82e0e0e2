"""Connected components / cluster resolution (operators/graph.py)."""

from __future__ import annotations

import pytest

from autosinapi_spark.operators.graph import (
    connected_components,
    resolve_clusters,
)


def _cc(spark, vertex_ids, edge_pairs):
    verts = spark.createDataFrame([(v,) for v in vertex_ids], "id long")
    edges = spark.createDataFrame(
        [(a, b) for a, b in edge_pairs] or [(None, None)], "src long, dst long"
    )
    if not edge_pairs:
        edges = edges.where("src IS NOT NULL")
    rows = connected_components(verts, edges).collect()
    return {r["id"]: r["comp"] for r in rows}


def test_chain_merges_transitively(spark):
    # 1-2, 2-3, 3-4: one component even though 1 and 4 never share an edge
    got = _cc(spark, [1, 2, 3, 4], [(1, 2), (2, 3), (3, 4)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_cycle_terminates_and_merges(spark):
    got = _cc(spark, [5, 6, 7], [(5, 6), (6, 7), (7, 5)])
    assert got == {5: 5, 6: 5, 7: 5}


def test_isolated_vertices_are_singletons(spark):
    got = _cc(spark, [1, 2, 3, 9], [(1, 2)])
    assert got == {1: 1, 2: 1, 3: 3, 9: 9}


def test_direction_does_not_matter(spark):
    # min id arrives against the edge direction too
    got = _cc(spark, [10, 11, 12], [(12, 11), (11, 10)])
    assert got == {10: 10, 11: 10, 12: 10}


def test_two_components(spark):
    got = _cc(spark, [1, 2, 3, 4], [(1, 2), (3, 4)])
    assert got == {1: 1, 2: 1, 3: 3, 4: 3}


def test_max_iter_guard_raises(spark):
    verts = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components(verts, edges, max_iter=1)


def test_resolve_clusters_verdicts(spark):
    verts = spark.createDataFrame([(i,) for i in range(1, 6)], "id long")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "id_a long, id_b long"
    )
    rows = {
        r["id"]: (r["cluster_id"], r["cluster_size"], r["is_canonical"])
        for r in resolve_clusters(verts, pairs).collect()
    }
    assert rows == {
        1: (1, 3, 1),
        2: (1, 3, 0),
        3: (1, 3, 0),
        4: (4, 2, 1),
        5: (4, 2, 0),
    }
