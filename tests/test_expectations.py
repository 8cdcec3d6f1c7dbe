"""Expectations engine: per-kind violation semantics (null handling,
duplicate counting, orphan detection), single-scan batching of
row-local checks, and caller-order output."""

from __future__ import annotations

import pytest

from spark_ml_showcase_spark.operators import expectations as X


@pytest.fixture(scope="module")
def child(spark):
    return spark.createDataFrame(
        [
            (1, 10.0, "A", 100),
            (2, -5.0, "B", 100),
            (3, None, "C", 200),
            (3, 50.0, "zz", None),
            (None, 200.0, "A", 999),
        ],
        "id bigint, v double, cat string, fk bigint",
    )


@pytest.fixture(scope="module")
def parent(spark):
    return spark.createDataFrame([(100,), (200,)], "pk bigint")


def test_all_kinds_and_order(spark, child, parent):
    out = X.validate(
        child,
        [
            X.not_null("id"),
            X.in_range("v", 0.0, 100.0),
            X.in_set("cat", ["A", "B", "C"]),
            X.unique("id"),
            X.referential("fk", parent, "pk"),
        ],
    ).collect()
    got = [(r.check, r.violations, r.total, r.passed) for r in out]
    assert got == [
        ("not_null(id)", 1, 5, False),
        ("in_range(v)", 2, 5, False),  # -5 and 200; NULL is not a violation
        ("in_set(cat)", 1, 5, False),  # 'zz'
        ("unique(id)", 1, 5, False),  # id=3 twice (nulls excluded)
        ("referential(fk)", 1, 5, False),  # 999; NULL fk not an orphan
    ]


def test_passing_checks(spark, child, parent):
    out = X.validate(
        child,
        [X.in_range("v", -100.0, 1000.0), X.unique("id", "cat")],
    ).collect()
    assert all(r.passed and r.violations == 0 for r in out)


def test_row_checks_share_one_scan(spark, child):
    df = X.validate(
        child,
        [X.not_null("id"), X.in_range("v", 0, 100), X.in_set("cat", ["A"])],
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    # a single aggregation over the table feeds all three rows: exactly
    # one scan of the source in the whole plan
    scans = sum(
        1 for ln in plan.splitlines()
        if "Scan ExistingRDD" in ln or "LocalTableScan" in ln
    )
    assert scans <= 1, plan


def test_regex_and_empty_checks(spark, child):
    out = X.validate(child, [X.matches_regex("cat", "^[A-C]$")]).collect()
    assert out[0].violations == 1  # 'zz'
    with pytest.raises(ValueError):
        X.validate(child, [])
