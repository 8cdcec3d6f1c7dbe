"""Extension showcase — the incremental event-warehouse surface.

Not a reference task: this composes the round-8 warehouse operators
end-to-end the way an events team runs them per ingest drop —
continuous aggregate (with a KMV distinct state), SCD-2 dimension
maintenance, the fact-to-dimension temporal join, and the grid
interval-overlap join. Every stage is an oracle- or property-tested
library operator; this script is the runnable tour.

Run: python examples/t6_event_warehouse.py [sf_dir]
Defaults to /root/testdata/sf0.001. Writes its stores under
/tmp/smss_t6_warehouse and prints each artifact.
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_ml_showcase_spark.operators import hypertable, scd2
from spark_ml_showcase_spark.operators.intervals import interval_overlap_join
from spark_ml_showcase_spark.session import session_builder
from spark_ml_showcase_spark.sources.catalog import Catalog


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = session_builder("t6-event-warehouse").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    root = "/tmp/smss_t6_warehouse"
    shutil.rmtree(root, ignore_errors=True)
    rollup_dir = os.path.join(root, "hourly_rollup")
    dim_dir = os.path.join(root, "user_type_dim")

    ev = Catalog(spark, sf_dir).events

    # ── continuous aggregate: three interleaved drops (each one late
    # data for the buckets the previous drops built), KMV distinct state
    for m in (0, 1, 2):
        v = hypertable.rollup_refresh(
            spark,
            rollup_dir,
            ev.filter(F.col("event_id") % 3 == m),
            time_col="ts",
            value_col="value",
            keys=["event_type"],
            distinct_col="user_id",
            kmv_k=4096,
        )
        print(f"rollup refresh #{m + 1} -> store version {v}")
    print("hourly rollup (first 5 buckets):")
    hypertable.rollup_read(spark, rollup_dir, kmv_k=4096).orderBy(
        "bucket_sec", "event_type"
    ).show(5, truncate=False)

    # ── SCD-2 dimension: weekly "latest event type" per user
    ord_col = F.col("ts").cast("long") * F.lit(100000000) + F.col("event_id")
    weekly = ev.groupBy(
        "user_id", F.date_trunc("week", "ts").alias("_w")
    ).agg(
        F.max_by("event_type", ord_col).alias("event_type"),
        F.max_by(F.col("ts").cast("long"), ord_col).alias("eff"),
    )
    for w in sorted(r._w for r in weekly.select("_w").distinct().collect()):
        scd2.scd2_apply(
            spark,
            dim_dir,
            weekly.filter(F.col("_w") == w),
            key_col="user_id",
            attr_cols=["event_type"],
            effective_col="eff",
        )
    hist = scd2.scd2_history(spark, dim_dir)
    print(
        f"SCD-2 dim: {hist.count()} interval rows, "
        f"{hist.filter('is_current').count()} current"
    )

    # ── temporal join: each purchase against the dim row valid at its
    # own event time (user-keyed hash join, interval residual)
    h = hist.select(
        F.col("user_id").alias("_hu"),
        F.col("event_type").alias("type_at_purchase"),
        "valid_from",
        "valid_to",
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").cast("long").alias("sec")
    )
    asof = p.join(
        F.broadcast(h),
        (p.user_id == h._hu)
        & (h.valid_from <= p.sec)
        & (h.valid_to.isNull() | (p.sec < h.valid_to)),
    )
    print("purchases by the user's type-at-purchase:")
    asof.groupBy("type_at_purchase").count().orderBy("type_at_purchase").show()

    # ── interval-overlap join: view x purchase 30-min windows per user
    mk = lambda t, idc, lo: (  # noqa: E731
        ev.filter(F.col("event_type") == t).select(
            "user_id",
            F.col("event_id").alias(idc),
            F.col("ts").cast("long").alias(lo),
            (F.col("ts").cast("long") + 1800).alias(lo[0] + "hi"),
        )
    )
    pairs = interval_overlap_join(
        mk("view", "view_id", "vlo"),
        mk("purchase", "purchase_id", "plo"),
        "vlo",
        "vhi",
        "plo",
        "phi",
        bucket_width=1800,
        on=["user_id"],
    )
    print(f"overlapping view/purchase windows: {pairs.count()} pairs")
    # no spark.stop(): the other examples leave the session to process
    # exit too, and the smoke test shares the suite-wide session


if __name__ == "__main__":
    main()
