"""Hierarchy traversal: transitive closure of a parent-edge table by
POINTER DOUBLING, and subtree rollups on top of it.

Not in the reference (no recursive surface there); this is the
org-chart / bill-of-materials / category-tree workload a warehouse
answers with ``WITH RECURSIVE``. Spark has no recursive CTE, and the
naive translation — one self-join per LEVEL — costs ``depth`` shuffles
(a 2^20-node binary tree is 20 sequential joins). Pointer doubling
halves that exponent: after round k the closure holds every
(node, ancestor) pair at distance ≤ 2^k, so ``ceil(log2(depth))``
rounds cover any depth — 5 shuffled self-joins for depth 32. The same
trick as the star-contraction connected components in
``operators/dedup.py``.

Scale posture (billions of edges):

- Each round is ONE self-join of the current closure on
  ``anc == child`` plus a distinct; both shuffles key on node ids —
  high-cardinality, skew bounded by node fan-UP (always 1 in a tree /
  forest, so the join explodes pairs strictly by depth, never by
  fan-out).
- In a tree the (node, ancestor) path is unique, so the distinct
  dedups only pairs REDISCOVERED by later rounds (dist ≤ 2^(k-1)
  pairs recombining); output size is exactly ``Σ depth(v)``, the same
  rows a recursive CTE would emit.
- ``localCheckpoint`` per round cuts the doubling lineage (the plan
  would otherwise double in size per round too).

Closure columns: ``(node, anc, dist)`` — one row per proper ancestor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transitive_closure(
    edges: DataFrame,
    *,
    child_col: str = "child",
    parent_col: str = "parent",
    max_depth: int = 64,
) -> DataFrame:
    """All (node, ancestor, dist) pairs reachable by following parent
    edges, computed in ``ceil(log2(max_depth))`` doubling rounds.
    ``edges`` must be a forest or DAG of parent pointers (one row per
    child→parent edge); cycles would loop forever in a recursive CTE
    and are capped here by ``max_depth`` instead."""
    closure = edges.select(
        F.col(child_col).alias("node"),
        F.col(parent_col).alias("anc"),
        F.lit(1).cast("bigint").alias("dist"),
    ).localCheckpoint()
    reach = 1
    while reach < max_depth:
        hop = (
            closure.alias("a")
            .join(
                closure.alias("b"),
                F.col("a.anc") == F.col("b.node"),
            )
            .select(
                F.col("a.node").alias("node"),
                F.col("b.anc").alias("anc"),
                (F.col("a.dist") + F.col("b.dist")).alias("dist"),
            )
        )
        grown = (
            closure.unionByName(hop)
            .groupBy("node", "anc")
            .agg(F.min("dist").cast("bigint").alias("dist"))
            .localCheckpoint()
        )
        if grown.count() == closure.count():
            # fixpoint: no new (node, anc) pair appeared this round
            closure = grown
            break
        closure = grown
        reach *= 2
    return closure


def subtree_rollup(
    closure: DataFrame,
    nodes: DataFrame,
    *,
    node_col: str,
    value_col: str,
) -> DataFrame:
    """Per-ancestor rollup over its PROPER descendants: join the
    closure (node → every ancestor) with per-node values and aggregate
    by ancestor. One shuffle; the closure already encodes the
    recursion. Output: ``(anc, n_desc, total)`` with the value summed
    in the exact decimal domain (engine-portable)."""
    vals = nodes.select(
        F.col(node_col).alias("node"),
        F.col(value_col).cast("decimal(20,2)").alias("_v"),
    )
    return (
        closure.join(vals, "node")
        .groupBy(F.col("anc"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_desc"),
            F.sum("_v").cast("double").alias("total"),
        )
    )
