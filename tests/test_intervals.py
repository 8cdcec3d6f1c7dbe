"""Interval-overlap join semantics: half-open boundary rules, the
exactly-once reporting-cell guarantee across multi-cell spans, key
scoping, residual filters, and a seeded randomized cross-check against
the naive theta join."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from spark_ml_showcase_spark.operators.intervals import interval_overlap_join


def _pairs(out, lcol="lid", rcol="rid"):
    return {(r[lcol], r[rcol]) for r in out.collect()}


def test_basic_overlap_and_half_open_touch(spark):
    left = spark.createDataFrame(
        [(1, 0, 10), (2, 20, 30)], "lid int, lo int, hi int"
    ).select("lid", F.col("lo").alias("llo"), F.col("hi").alias("lhi"))
    right = spark.createDataFrame(
        [(10, 5, 15), (20, 10, 20), (30, 30, 40)],
        "rid int, lo int, hi int",
    ).select("rid", F.col("lo").alias("rlo"), F.col("hi").alias("rhi"))
    out = interval_overlap_join(
        left, right, "llo", "lhi", "rlo", "rhi", bucket_width=4
    )
    # [0,10)x[5,15) overlaps; [0,10)x[10,20) TOUCHES only (half-open: no);
    # [20,30)x[30,40) touches: no; [20,30)x[10,20) touches: no
    assert _pairs(out) == {(1, 10)}


def test_exactly_once_across_many_shared_cells(spark):
    # both intervals span many cells; the pair must appear ONCE
    left = spark.createDataFrame([(1, 0, 1000)], "lid int, llo int, lhi int")
    right = spark.createDataFrame([(9, 5, 995)], "rid int, rlo int, rhi int")
    out = interval_overlap_join(
        left, right, "llo", "lhi", "rlo", "rhi", bucket_width=10
    )
    assert out.count() == 1
    assert _pairs(out) == {(1, 9)}


def test_keys_scope_the_join(spark):
    left = spark.createDataFrame(
        [("a", 1, 0, 10), ("b", 2, 0, 10)], "k string, lid int, llo int, lhi int"
    )
    right = spark.createDataFrame(
        [("a", 10, 5, 15), ("b", 20, 50, 60)],
        "k string, rid int, rlo int, rhi int",
    )
    out = interval_overlap_join(
        left, right, "llo", "lhi", "rlo", "rhi", bucket_width=8, on=["k"]
    )
    rows = out.collect()
    assert {(r.k, r.lid, r.rid) for r in rows} == {("a", 1, 10)}
    # the key appears once, not twice
    assert out.columns.count("k") == 1


def test_residual_filter(spark):
    left = spark.createDataFrame(
        [(1, 0, 10, 5.0), (2, 0, 10, 50.0)], "lid int, llo int, lhi int, lv double"
    )
    right = spark.createDataFrame([(9, 5, 15)], "rid int, rlo int, rhi int")
    out = interval_overlap_join(
        left,
        right,
        "llo",
        "lhi",
        "rlo",
        "rhi",
        bucket_width=4,
        residual=F.col("lv") > 10.0,
    )
    assert _pairs(out) == {(2, 9)}


def test_randomized_matches_naive_theta_join(spark):
    rng = random.Random(8)
    lrows, rrows = [], []
    for i in range(120):
        lo = rng.randrange(0, 500)
        lrows.append((i, rng.choice("xy"), lo, lo + rng.randrange(1, 90)))
    for j in range(120):
        lo = rng.randrange(0, 500)
        rrows.append((j, rng.choice("xy"), lo, lo + rng.randrange(1, 90)))
    left = spark.createDataFrame(lrows, "lid int, k string, llo int, lhi int")
    right = spark.createDataFrame(rrows, "rid int, k string, rlo int, rhi int")
    got = _pairs(
        interval_overlap_join(
            left, right, "llo", "lhi", "rlo", "rhi", bucket_width=32, on=["k"]
        )
    )
    naive = left.join(
        right.withColumnRenamed("k", "k2"),
        (F.col("k") == F.col("k2"))
        & (F.col("llo") < F.col("rhi"))
        & (F.col("rlo") < F.col("lhi")),
    )
    want = {(r.lid, r.rid) for r in naive.collect()}
    assert got == want and len(want) > 100


def test_bucket_width_must_be_positive(spark):
    df = spark.createDataFrame([(1, 0, 1)], "a int, lo int, hi int")
    try:
        interval_overlap_join(df, df, "lo", "hi", "lo", "hi", bucket_width=0)
    except ValueError:
        pass
    else:  # pragma: no cover
        raise AssertionError("bucket_width=0 accepted")


def test_hot_cell_guard_drops_only_hot_reporting_cells(spark):
    # 50 left intervals crammed into cell 0 (the hot cell) + 1 in cell 5;
    # right side overlaps both regions
    lrows = [(i, "k", 1, 5) for i in range(50)] + [(99, "k", 20, 24)]
    rrows = [(1, "k", 2, 4), (2, "k", 21, 23)]
    left = spark.createDataFrame(lrows, "lid int, k string, llo int, lhi int")
    right = spark.createDataFrame(rrows, "rid int, k string, rlo int, rhi int")
    guarded = interval_overlap_join(
        left, right, "llo", "lhi", "rlo", "rhi",
        bucket_width=4, on=["k"], max_cell_rows=10,
    )
    # the 50 hot-cell pairs are excluded; the cool cell-5 pair survives
    assert _pairs(guarded) == {(99, 2)}
    unguarded = interval_overlap_join(
        left, right, "llo", "lhi", "rlo", "rhi", bucket_width=4, on=["k"]
    )
    assert len(_pairs(unguarded)) == 51
