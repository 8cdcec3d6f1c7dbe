"""Unit tests for operators/aggregates.py (SURVEY §2.4, §2.9)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


from spark_ml_showcase_spark.operators import aggregates as A


@pytest.fixture(scope="module")
def sales(spark):
    return spark.createDataFrame(
        [("a", 1.0), ("a", None), ("b", 2.0), ("b", 3.0), ("b", 3.0)],
        "k string, v double",
    )


def test_count_star_vs_count_col_nulls(sales):
    """count(*) counts nulls; count(col) skips them — the trap the
    reference trips on with count('host') vs count('*')."""
    out = A.group_agg(
        sales, ["k"], n_star=F.count(F.lit(1)), n_v=F.count("v")
    ).collect()
    got = {r["k"]: (r["n_star"], r["n_v"]) for r in out}
    assert got["a"] == (2, 1)
    assert got["b"] == (3, 3)


def test_group_count_alias(sales):
    out = A.group_count(sales, "k", alias="cnt")
    assert out.columns == ["k", "cnt"]


def test_having(sales):
    grouped = A.group_agg(sales, ["k"], avg_v=F.avg("v"))
    assert [r["k"] for r in A.having(grouped, F.col("avg_v") >= 2).collect()] == ["b"]


def test_global_agg_single_row(sales):
    row = A.global_agg(sales, total=F.sum("v"), n=F.count(F.lit(1))).collect()
    assert len(row) == 1 and row[0]["total"] == 9.0 and row[0]["n"] == 5


def test_distinct_rows(sales):
    assert A.distinct_rows(sales, "k").count() == 2
    assert A.distinct_rows(sales).count() == 4  # (b, 3.0) dupe collapses


def test_count_distinct_exact_and_approx(sales):
    exact = A.count_distinct(sales, ["k"], "v", alias="d").collect()
    got = {r["k"]: r["d"] for r in exact}
    assert got == {"a": 1, "b": 2}  # countDistinct skips nulls
    approx = A.count_distinct(sales, ["k"], "v", approx=True, alias="d").collect()
    # HLL at this cardinality is exact
    assert {r["k"]: r["d"] for r in approx} == got


def test_pivot_pinned_values(spark):
    df = spark.createDataFrame(
        [("mon", 1), ("mon", 2), ("tue", 1)], "day string, hour int"
    )
    out = A.pivot_counts(df, "hour", "day", values=["mon", "tue"])
    assert set(out.columns) == {"hour", "mon", "tue"}
    row = {r["hour"]: (r["mon"], r["tue"]) for r in out.collect()}
    assert row[1] == (1, 1) and row[2] == (1, None)


def test_rollup_and_cube_row_counts(sales):
    # rollup(k): groups per k + grand total; cube(k) same for 1 key.
    assert A.rollup_agg(sales, ["k"], n=F.count(F.lit(1))).count() == 3
    assert A.cube_agg(sales, ["k"], n=F.count(F.lit(1))).count() == 3


def test_heavy_hitters_exact_sketch_verified(spark):
    from pyspark.sql import functions as F

    from spark_ml_showcase_spark.operators import aggregates

    # 100 rows: 'a' ×50, 'b' ×30, 'c' ×19, 'd' ×1
    rows = [("a",)] * 50 + [("b",)] * 30 + [("c",)] * 19 + [("d",)] * 1
    df = spark.createDataFrame(rows, "k string")
    got = {
        r["k"]: r["cnt"]
        for r in aggregates.heavy_hitters(df, "k", 0.2).collect()
    }
    assert got == {"a": 50, "b": 30}  # threshold = ceil(0.2*100) = 20

    # boundary: support exactly at an item's frequency keeps it
    got2 = {
        r["k"]: r["cnt"]
        for r in aggregates.heavy_hitters(df, "k", 0.19).collect()
    }
    assert got2 == {"a": 50, "b": 30, "c": 19}

    import pytest

    with pytest.raises(ValueError):
        aggregates.heavy_hitters(df, "k", 0.0)
