"""Hierarchy queries: transitive closure + subtree rollup
(``operators/hierarchy.py``) over a synthetic customer tree, both
checked against DuckDB ``WITH RECURSIVE`` oracles — the engine's
answer to the one classic warehouse shape Spark has no native syntax
for.

The tree is synthesized from the customer key with pure integer
arithmetic (``parent(c) = c // 2``, root 1 — a complete-ish binary
tree of depth ~log2 n at every SF), so both engines derive
bit-identical edges and the oracle can walk the chain arithmetically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_ml_showcase_spark.operators.hierarchy import (
    subtree_rollup,
    transitive_closure,
)
from spark_ml_showcase_spark.plans import query
from spark_ml_showcase_spark.sources.catalog import Catalog


def _customer_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = Catalog(spark, sf_dir).customer
    return cust.filter(F.col("c_custkey") >= 2).select(
        F.col("c_custkey").alias("child"),
        F.expr("c_custkey div 2").alias("parent"),
    )


# The closure itself: every (node, ancestor, dist) pair of the tree.
# Pointer doubling (ceil(log2 depth) self-joins) vs the oracle's
# row-at-a-time recursive CTE — same rows exactly.
@query(
    "customer_tree_closure",
    oracle="""
    WITH RECURSIVE up AS (
        SELECT c_custkey AS node, c_custkey // 2 AS anc,
               CAST(1 AS BIGINT) AS dist
        FROM customer WHERE c_custkey >= 2
        UNION ALL
        SELECT node, anc // 2, dist + 1 FROM up WHERE anc >= 2
    )
    SELECT node, anc, dist FROM up
    """,
)
def customer_tree_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    # unique_paths: parent(c) = c // 2 is a tree — frontier doubling
    # drops the per-round min-dist shuffle (operators/hierarchy.py r15)
    return transitive_closure(
        _customer_edges(spark, sf_dir), max_depth=64, unique_paths=True
    )


# Per-ancestor rollup over PROPER descendants: headcount + exact
# decimal balance total. The closure join replaces the recursion; the
# decimal route keeps the money sum engine-portable.
@query(
    "subtree_rollup_customers",
    oracle="""
    WITH RECURSIVE up AS (
        SELECT c_custkey AS node, c_custkey // 2 AS anc
        FROM customer WHERE c_custkey >= 2
        UNION ALL
        SELECT node, anc // 2 FROM up WHERE anc >= 2
    )
    SELECT up.anc, CAST(count(*) AS BIGINT) AS n_desc,
           CAST(sum(CAST(c.c_acctbal AS DECIMAL(20,2))) AS DOUBLE)
               AS total
    FROM up JOIN customer c ON c.c_custkey = up.node
    GROUP BY up.anc
    """,
)
def subtree_rollup_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    closure = transitive_closure(
        _customer_edges(spark, sf_dir), max_depth=64, unique_paths=True
    )
    cust = Catalog(spark, sf_dir).customer
    return subtree_rollup(
        closure, cust, node_col="c_custkey", value_col="c_acctbal"
    )
