"""PageRank (operators/graph.py): known-graph semantics + invariants."""

from __future__ import annotations

import pytest

from spark_ml_showcase_spark.operators import graph


def _edges(spark, rows):
    return spark.createDataFrame(rows, "id_a long, id_b long")


def test_pagerank_star_center_dominates(spark):
    # undirected star 0-1, 0-2, 0-3: center must outrank the leaves,
    # leaves are symmetric, total mass ≈ 1
    e = _edges(spark, [(0, 1), (0, 2), (0, 3)])
    got = {r["id"]: r["rank"] for r in graph.pagerank(e, iterations=20).collect()}
    assert got[0] > got[1]
    assert got[1] == pytest.approx(got[2]) == pytest.approx(got[3])
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_symmetric_pair_uniform(spark):
    e = _edges(spark, [(1, 2)])
    got = {r["id"]: r["rank"] for r in graph.pagerank(e, iterations=5).collect()}
    assert got[1] == pytest.approx(0.5) and got[2] == pytest.approx(0.5)


def test_pagerank_zero_iterations_is_uniform(spark):
    e = _edges(spark, [(1, 2), (2, 3)])
    got = {r["id"]: r["rank"] for r in graph.pagerank(e, iterations=0).collect()}
    assert all(v == pytest.approx(1 / 3) for v in got.values())
    with pytest.raises(ValueError):
        graph.pagerank(e, iterations=-1)


def test_pagerank_directed_dangling_leaks_mass(spark):
    # 1 -> 2 directed: node 2 has no out-edges, so damped mass leaks
    # (documented simplified variant) — total < 1, and 2 outranks 1
    e = _edges(spark, [(1, 2)])
    got = {
        r["id"]: r["rank"]
        for r in graph.pagerank(e, iterations=10, directed=True).collect()
    }
    assert got[2] > got[1]
    assert sum(got.values()) < 1.0


def test_pagerank_empty_edges(spark):
    e = _edges(spark, [])
    assert graph.pagerank(e, iterations=3).count() == 0
