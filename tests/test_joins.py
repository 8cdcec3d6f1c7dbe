"""Join operator semantics (SURVEY.md §2.6 + engine extensions):
as-of tie/tolerance rules, bucketed range-join equivalence, semi/anti
null behavior, salted-join correctness."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_ml_showcase_spark.operators import joins


def _ts(spark, rows, schema):
    df = spark.createDataFrame(rows, schema)
    for c, t in df.dtypes:
        if c.endswith("_ts"):
            df = df.withColumn(c, F.timestamp_seconds(F.col(c)))
    return df


def test_as_of_join_basic_and_tie(spark):
    left = _ts(spark, [(1, 100), (1, 200), (2, 150)], "k bigint, l_ts bigint")
    right = _ts(
        spark,
        [(1, 90, 9.0), (1, 200, 20.0), (2, 160, 16.0)],
        "k bigint, r_ts bigint, v double",
    )
    out = {
        (r.k, r.l_ts.timestamp()): r.v
        for r in joins.as_of_join(
            left, right, on="k", left_time="l_ts", right_time="r_ts",
            right_cols=["v"],
        ).collect()
    }
    assert out[(1, 100.0)] == 9.0
    # tie: right row at exactly left_time IS visible (<= semantics)
    assert out[(1, 200.0)] == 20.0
    # no right row at or before 150 for k=2 → null
    assert out[(2, 150.0)] is None


def test_as_of_join_subsecond_tolerance(spark):
    left = spark.createDataFrame([(1, 100.8)], "k bigint, lt double").withColumn(
        "lt", F.timestamp_seconds("lt")
    )
    right = spark.createDataFrame(
        [(1, 100.0, 1.0), (1, 100.5, 2.0)], "k bigint, rt double, v double"
    ).withColumn("rt", F.timestamp_seconds("rt"))
    within = joins.as_of_join(
        left, right, on="k", left_time="lt", right_time="rt",
        right_cols=["v"], tolerance_seconds=0.4,
    ).first()
    assert within.v == 2.0  # 0.3s gap ≤ 0.4 tolerance
    beyond = joins.as_of_join(
        left, right, on="k", left_time="lt", right_time="rt",
        right_cols=["v"], tolerance_seconds=0.2,
    ).first()
    assert beyond.v is None  # 0.3s gap > 0.2 — sub-second must not truncate


def test_as_of_join_column_name_collision(spark):
    # inputs already using _t/_side must not break the internal columns
    left = spark.createDataFrame(
        [(1, 100, "x")], "k bigint, lt bigint, _t string"
    ).withColumn("lt", F.timestamp_seconds("lt"))
    right = spark.createDataFrame(
        [(1, 50, 5.0)], "k bigint, rt bigint, v double"
    ).withColumn("rt", F.timestamp_seconds("rt"))
    out = joins.as_of_join(
        left, right, on="k", left_time="lt", right_time="rt", right_cols=["v"]
    ).first()
    assert out.v == 5.0 and out._t == "x"


def test_range_join_bucketed_equals_naive(spark):
    pts = spark.createDataFrame(
        [(float(i),) for i in range(0, 100, 3)], "p double"
    )
    ivs = spark.createDataFrame(
        [("a", 0.0, 10.0), ("b", 9.0, 40.0), ("c", 55.0, 56.0), ("d", 90.0, 200.0)],
        "name string, lo double, hi double",
    )
    naive = joins.range_join(pts, ivs, "p", "lo", "hi")
    bucketed = joins.range_join(pts, ivs, "p", "lo", "hi", bucket_width=7.0)
    n = {(r.p, r.name) for r in naive.collect()}
    b = {(r.p, r.name) for r in bucketed.collect()}
    assert n == b and len(n) > 0
    # half-open: point exactly at hi excluded, at lo included
    assert (9.0, "a") in n and (9.0, "b") in n and (10.0, "a") not in n


def test_salted_join_matches_plain(spark):
    big = spark.createDataFrame(
        [(i % 3, i) for i in range(300)], "k bigint, payload bigint"
    )
    small = spark.createDataFrame([(0, "zero"), (1, "one")], "k bigint, name string")
    plain = joins.equi_join(big, small, "k").count()
    salted = joins.salted_join(big, small, "k", salt_buckets=8).count()
    assert plain == salted == 200


def test_semi_anti_join_complementary(spark):
    left = spark.createDataFrame([(i,) for i in range(10)], "k bigint")
    right = spark.createDataFrame([(i,) for i in range(0, 10, 2)], "k bigint")
    semi = joins.semi_join(left, right, "k").count()
    anti = joins.anti_join(left, right, "k").count()
    assert semi == 5 and anti == 5 and semi + anti == left.count()
