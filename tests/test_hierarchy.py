"""Pointer-doubling transitive closure + subtree rollup invariants:
shapes the recursive-CTE oracle can't isolate (deep chains spanning
many doubling rounds, forests, DAG min-distance)."""

from __future__ import annotations

from spark_ml_showcase_spark.operators.hierarchy import (
    subtree_rollup,
    transitive_closure,
)


def _closure(spark, edges, **kw):
    df = spark.createDataFrame(edges, "child bigint, parent bigint")
    return {
        (r.node, r.anc): r.dist
        for r in transitive_closure(df, **kw).collect()
    }


def test_chain_depth_10_needs_multiple_doubling_rounds(spark):
    # 11-node chain: node i's parent is i-1; closure = all i > j pairs
    edges = [(i, i - 1) for i in range(1, 11)]
    got = _closure(spark, edges, max_depth=16)
    want = {(i, j): i - j for i in range(1, 11) for j in range(0, i)}
    assert got == want


def test_forest_stays_separate(spark):
    # two disjoint 3-node trees
    edges = [(2, 1), (3, 1), (20, 10), (30, 10)]
    got = _closure(spark, edges)
    assert got == {(2, 1): 1, (3, 1): 1, (20, 10): 1, (30, 10): 1}


def test_dag_takes_min_distance(spark):
    # diamond: 4 -> {2, 3} -> 1, plus a long detour 4 -> 5 -> 6 -> 1:
    # dist(4, 1) must be the MIN path length (2), not 3
    edges = [(4, 2), (4, 3), (2, 1), (3, 1), (4, 5), (5, 6), (6, 1)]
    got = _closure(spark, edges)
    assert got[(4, 1)] == 2
    assert got[(5, 1)] == 2
    assert got[(4, 6)] == 2


def test_max_depth_caps_cycles(spark):
    # 2-cycle would recurse forever in a CTE; the cap bounds it
    edges = [(1, 2), (2, 1)]
    got = _closure(spark, edges, max_depth=4)
    # every pair reachable within the cap, at its min distance
    assert got[(1, 2)] == 1 and got[(2, 1)] == 1
    assert got[(1, 1)] == 2 and got[(2, 2)] == 2


def test_subtree_rollup_counts_and_sums(spark):
    # balanced: 1 <- {2, 3}; 2 <- {4, 5}; values = node as money
    edges = [(2, 1), (3, 1), (4, 2), (5, 2)]
    closure = transitive_closure(
        spark.createDataFrame(edges, "child bigint, parent bigint")
    )
    nodes = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 6)], "id bigint, bal double"
    )
    got = {
        r.anc: (r.n_desc, r.total)
        for r in subtree_rollup(
            closure, nodes, node_col="id", value_col="bal"
        ).collect()
    }
    assert got == {1: (4, 14.0), 2: (2, 9.0)}


def test_unique_paths_frontier_equals_generic_on_forest(spark):
    """unique_paths=True (r15 frontier doubling) must return the exact
    row set of the generic min-dist path on any forest — same pairs,
    same distances. Mixed shapes: a deep 20-chain (multiple doubling
    rounds, ragged horizon), a binary tree, a star, and isolated
    roots."""
    edges = [(i, i - 1) for i in range(2, 22)]          # 20-deep chain
    edges += [(100 + i, 100 + i // 2) for i in range(2, 16)]  # binary tree
    edges += [(200 + i, 200) for i in range(1, 6)]      # star
    df = spark.createDataFrame(edges, "child bigint, parent bigint")
    key = lambda frame: sorted(
        (r.node, r.anc, r.dist) for r in frame.collect()
    )
    generic = transitive_closure(df, max_depth=64)
    frontier = transitive_closure(df, max_depth=64, unique_paths=True)
    assert key(frontier) == key(generic)


def test_unique_paths_respects_max_depth_cap(spark):
    # 10-deep chain, cap 4: only pairs at dist <= 4 appear (the cap
    # bounds the doubled horizon exactly like the generic path)
    edges = [(i, i - 1) for i in range(2, 12)]
    df = spark.createDataFrame(edges, "child bigint, parent bigint")
    got = transitive_closure(df, max_depth=4, unique_paths=True)
    gen = transitive_closure(df, max_depth=4)
    key = lambda frame: sorted(
        (r.node, r.anc, r.dist) for r in frame.collect()
    )
    assert key(got) == key(gen)
    assert max(r[2] for r in key(got)) == 4


def test_unique_paths_rejects_non_forest_edges(spark):
    """r15 ADVICE: the frontier path has no dedup, so the one-parent
    invariant is verified — a two-parent node and a duplicated edge row
    both raise instead of silently multiplying closure rows."""
    import pytest

    two_parents = spark.createDataFrame(
        [(2, 1), (3, 1), (4, 2), (4, 3)], "child bigint, parent bigint"
    )
    with pytest.raises(ValueError, match="unique_paths"):
        transitive_closure(two_parents, unique_paths=True)

    dup_edge = spark.createDataFrame(
        [(2, 1), (2, 1)], "child bigint, parent bigint"
    )
    with pytest.raises(ValueError, match="unique_paths"):
        transitive_closure(dup_edge, unique_paths=True)
