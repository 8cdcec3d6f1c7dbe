"""SCD-2 dimension maintenance: close-and-open on change, no-op on
unchanged, interval integrity under as-of reads, loud rejection of
out-of-order and duplicate-key batches."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F  # noqa: F401

from spark_ml_showcase_spark.operators import scd2
from spark_ml_showcase_spark.sources import versioned


def _batch(spark, rows):
    return spark.createDataFrame(rows, "k bigint, city string, eff bigint")


def _apply(spark, table, rows):
    return scd2.scd2_apply(
        spark,
        table,
        _batch(spark, rows),
        key_col="k",
        attr_cols=["city"],
        effective_col="eff",
    )


def test_insert_change_noop_and_history(spark, tmp_path):
    table = str(tmp_path / "dim")
    _apply(spark, table, [(1, "nyc", 100), (2, "sfo", 100)])
    _apply(spark, table, [(1, "nyc", 200), (2, "la", 200)])  # 1 unchanged
    _apply(spark, table, [(2, "sfo", 300), (3, "chi", 300)])  # 2 back, 3 new
    hist = {
        (r.k, r.city, r.valid_from, r.valid_to, r.is_current)
        for r in scd2.scd2_history(spark, table).collect()
    }
    assert hist == {
        (1, "nyc", 100, None, True),
        (2, "sfo", 100, 200, False),
        (2, "la", 200, 300, False),
        (2, "sfo", 300, None, True),
        (3, "chi", 300, None, True),
    }
    # unchanged key 1 produced no extra version-2 row; three applies =>
    # three time-travelable store versions
    assert len(versioned.snapshot_versions(table)) == 3


def test_as_of_and_current_reads(spark, tmp_path):
    table = str(tmp_path / "dim")
    _apply(spark, table, [(1, "nyc", 100)])
    _apply(spark, table, [(1, "sfo", 200)])
    at = lambda t: {  # noqa: E731
        (r.k, r.city) for r in scd2.scd2_as_of(spark, table, t).collect()
    }
    assert at(99) == set()
    assert at(100) == {(1, "nyc")}
    assert at(199) == {(1, "nyc")}
    assert at(200) == {(1, "sfo")}  # half-open: the new row owns its edge
    assert at(10_000) == {(1, "sfo")}
    cur = {(r.k, r.city) for r in scd2.scd2_current(spark, table).collect()}
    assert cur == {(1, "sfo")}


def test_out_of_order_apply_rejected(spark, tmp_path):
    table = str(tmp_path / "dim")
    _apply(spark, table, [(1, "nyc", 200)])
    with pytest.raises(ValueError, match="out-of-order"):
        _apply(spark, table, [(1, "sfo", 200)])  # not strictly after
    # the failed apply committed nothing
    assert len(versioned.snapshot_versions(table)) == 1


def test_duplicate_key_batch_rejected(spark, tmp_path):
    table = str(tmp_path / "dim")
    with pytest.raises(ValueError, match="duplicate"):
        _apply(spark, table, [(1, "nyc", 100), (1, "sfo", 100)])


def test_null_attr_change_detection(spark, tmp_path):
    table = str(tmp_path / "dim")
    spark_rows = [(1, None, 100)]
    _apply(spark, table, spark_rows)
    _apply(spark, table, [(1, None, 200)])  # null -> null: no-op
    _apply(spark, table, [(1, "nyc", 300)])  # null -> value: change
    hist = scd2.scd2_history(spark, table)
    assert hist.count() == 2
    assert hist.filter("is_current").collect()[0].city == "nyc"
