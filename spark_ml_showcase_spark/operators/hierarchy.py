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
    unique_paths: bool = False,
) -> DataFrame:
    """All (node, ancestor, dist) pairs reachable by following parent
    edges, computed in ``ceil(log2(max_depth))`` doubling rounds.
    ``edges`` must be a forest or DAG of parent pointers (one row per
    child→parent edge); cycles would loop forever in a recursive CTE
    and are capped here by ``max_depth`` instead.

    ``unique_paths=True`` (r15): the caller asserts every (node, anc)
    pair is connected by exactly ONE path — true for any forest, where
    each node has at most one parent (VERIFIED with one bounded agg on
    the checkpointed edge set; duplicate edge rows or a two-parent node
    raise instead of silently multiplying closure rows — r15 ADVICE).
    That licenses FRONTIER doubling:
    round k joins only the pairs at distance exactly 2^(k-1) against
    the closure (distance ≤ 2^(k-1)), so every new pair is produced by
    its unique split at position 2^(k-1) — exactly once, at its unique
    distance — and the per-round distinct/min-dist aggregation (one
    full-closure shuffle + hash agg per round) disappears; the closure
    is a plain union of per-round checkpointed hops. On a DAG with
    converging paths the same pair would be emitted at several
    distances, so the default keeps the min-dist aggregation."""
    closure = edges.select(
        F.col(child_col).alias("node"),
        F.col(parent_col).alias("anc"),
        F.lit(1).cast("bigint").alias("dist"),
    ).localCheckpoint()
    reach = 1
    if unique_paths:
        # the unique-split invariant is load-bearing (no dedup exists on
        # this path — r15 ADVICE): verify it instead of trusting the
        # caller. One bounded agg over the ALREADY-CHECKPOINTED closure
        # (max fan-up per node — catches both a node with two parents
        # and duplicate (child, parent) edge rows), no recompute of the
        # edge derivation.
        fan_up = (
            closure.groupBy("node")
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(F.max("c"))
            .first()[0]
        )
        if fan_up is not None and fan_up > 1:
            raise ValueError(
                "unique_paths=True requires a forest (one parent edge "
                f"per node); found a node with {fan_up} parent rows — "
                "use the default min-dist path for DAGs or duplicated "
                "edge tables"
            )
        frontier = closure  # pairs at dist == reach exactly
        while reach < max_depth:
            # explicit renames, not DataFrame aliases: on round 1 the
            # frontier IS the closure (identical expression ids), and
            # alias-qualified self-join resolution breaks under the
            # checkpointed-scan plan shape (key-not-found on analysis)
            f = frontier.select(
                F.col("node").alias("_fnode"),
                F.col("anc").alias("_fanc"),
                F.col("dist").alias("_fdist"),
            )
            hop = (
                f.join(closure, F.col("_fanc") == F.col("node"))
                .select(
                    F.col("_fnode").alias("node"),
                    F.col("anc"),
                    (F.col("_fdist") + F.col("dist")).alias("dist"),
                )
                .localCheckpoint()
            )
            # one bounded collect per round: new-pair count + how many
            # sit at the doubled horizon (the next frontier)
            n_new, n_horizon = hop.agg(
                F.count(F.lit(1)),
                F.count(F.when(F.col("dist") == 2 * reach, F.lit(1))),
            ).first()
            if n_new == 0:
                break
            closure = closure.unionByName(hop)
            reach *= 2
            if n_horizon == 0:
                # every chain ended before the horizon: closure complete
                break
            frontier = hop.filter(F.col("dist") == reach)
        return closure
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
