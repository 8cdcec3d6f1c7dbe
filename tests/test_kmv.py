"""KMV sketch: exact-below-k regime, mergeability identity, seeded
estimation error bounds, and two-stage == direct-build equivalence.
All inputs are fixed ids and xxhash64 is deterministic, so every
"estimate" here is a reproducible number — the tolerances are not
flaky margins."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_ml_showcase_spark.functions import kmv


def _ids(spark, n, tag="g", start=0):
    return spark.range(start, start + n).select(
        F.lit(tag).alias("g"), F.col("id").alias("v")
    )


def test_exact_below_k(spark):
    df = _ids(spark, 100).union(_ids(spark, 100))  # duplicates collapse
    sk = kmv.kmv_sketch(df, ["g"], "v", k=256)
    row = sk.select(kmv.kmv_estimate("sketch", k=256).alias("d")).collect()[0]
    assert row.d == 100.0


def test_estimation_regime_error_bound(spark):
    n = 20_000
    sk = kmv.kmv_sketch(_ids(spark, n), ["g"], "v", k=256)
    est = sk.select(kmv.kmv_estimate("sketch", k=256).alias("d")).collect()[0].d
    assert abs(est - n) / n < 0.2, est  # ~1/sqrt(256) = 6.25% expected


def test_merge_equals_sketch_of_union(spark):
    a = _ids(spark, 5000, start=0)
    b = _ids(spark, 5000, start=3000)  # overlap 2000
    sa = kmv.kmv_sketch(a, ["g"], "v", k=128).select(
        F.col("sketch").alias("sa")
    )
    sb = kmv.kmv_sketch(b, ["g"], "v", k=128).select(
        F.col("sketch").alias("sb")
    )
    direct = kmv.kmv_sketch(a.union(b), ["g"], "v", k=128).collect()[0].sketch
    merged = (
        sa.crossJoin(sb)
        .select(kmv.kmv_merge("sa", "sb", k=128).alias("m"))
        .collect()[0]
        .m
    )
    assert merged == direct  # mergeability is an identity, not an estimate


def test_jaccard_and_intersection_estimates(spark):
    a = _ids(spark, 8000, start=0)
    b = _ids(spark, 8000, start=4000)  # |A∩B|=4000, |A∪B|=12000, J=1/3
    sa = kmv.kmv_sketch(a, ["g"], "v", k=512).select(F.col("sketch").alias("sa"))
    sb = kmv.kmv_sketch(b, ["g"], "v", k=512).select(F.col("sketch").alias("sb"))
    row = (
        sa.crossJoin(sb)
        .select(
            kmv.kmv_jaccard("sa", "sb", k=512).alias("j"),
            kmv.kmv_intersection("sa", "sb", k=512).alias("i"),
        )
        .collect()[0]
    )
    assert abs(row.j - 1 / 3) < 0.08, row.j
    assert abs(row.i - 4000) / 4000 < 0.2, row.i


def test_two_stage_equals_direct_kmin(spark):
    df = _ids(spark, 3000).repartition(16)
    sk = kmv.kmv_sketch(df, ["g"], "v", k=64).collect()[0].sketch
    # sketches hold raw signed 64-bit hashes; signed ascending order is
    # the unit-interval order, so the two-stage k-min must equal the
    # direct distinct-sort-limit over the bigint hash domain
    direct = (
        df.select(F.xxhash64("v").alias("h"))
        .distinct()
        .orderBy("h")
        .limit(64)
        .collect()
    )
    assert sk == [r.h for r in direct]


def test_k_validation(spark):
    df = _ids(spark, 10)
    try:
        kmv.kmv_sketch(df, ["g"], "v", k=1)
    except ValueError:
        pass
    else:  # pragma: no cover
        raise AssertionError("k=1 accepted")
