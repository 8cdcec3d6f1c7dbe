"""Continuous-aggregate rollup: incremental refresh equals a full
GROUP BY after any batch split (including late data), late batches
touch only their buckets, and finalize derives avg from the states."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_ml_showcase_spark.operators import hypertable
from spark_ml_showcase_spark.sources import versioned


def _events(spark, rows):
    df = spark.createDataFrame(
        rows, "event_id bigint, sec bigint, event_type string, value double"
    )
    return df.withColumn("ts", F.timestamp_seconds("sec")).drop("sec")


_H = 3600


def _full(df):
    return (
        df.groupBy(
            F.date_trunc("hour", "ts").cast("long").alias("bucket_sec"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)"))
            .cast("double")
            .alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


def _rows(df):
    cols = ["bucket_sec", "event_type", "n_events", "sum_value",
            "min_value", "max_value"]
    return {tuple(r[c] for c in cols) for r in df.collect()}


def test_incremental_equals_full_groupby_with_late_data(spark, tmp_path):
    table = str(tmp_path / "rollup")
    rows = [
        (i, _H * (i % 5) + 60 * i, "a" if i % 2 else "b", float(i) + 0.25)
        for i in range(60)
    ]
    df = _events(spark, rows)
    # three batches; batch 3 is LATE data for buckets batches 1-2 built
    for m in (0, 1, 2):
        hypertable.rollup_refresh(
            spark,
            table,
            df.filter(F.col("event_id") % 3 == m),
            time_col="ts",
            value_col="value",
            keys=["event_type"],
        )
    got = hypertable.rollup_read(spark, table).drop("avg_value")
    assert _rows(got) == _rows(_full(df))


def test_late_batch_touches_only_its_bucket(spark, tmp_path):
    table = str(tmp_path / "rollup")
    base = _events(
        spark,
        [(1, 100, "a", 1.0), (2, _H + 100, "a", 2.0), (3, 2 * _H + 100, "a", 3.0)],
    )
    hypertable.rollup_refresh(
        spark, table, base, time_col="ts", value_col="value", keys=["event_type"]
    )
    before = {
        r.bucket_sec: r
        for r in hypertable.rollup_read(spark, table, finalize=False).collect()
    }
    late = _events(spark, [(4, _H + 200, "a", 10.0)])
    hypertable.rollup_refresh(
        spark, table, late, time_col="ts", value_col="value", keys=["event_type"]
    )
    after = {
        r.bucket_sec: r
        for r in hypertable.rollup_read(spark, table, finalize=False).collect()
    }
    assert set(after) == set(before)
    # untouched buckets carry forward bit-identically
    for b in (0, 2 * _H):
        assert after[b] == before[b]
    assert after[_H].n_events == 2 and float(after[_H].sum_value) == 12.0
    # two refreshes => two committed versions (time travel over states)
    assert len(versioned.snapshot_versions(table)) == 2


def test_finalize_derives_avg_from_states(spark, tmp_path):
    table = str(tmp_path / "rollup")
    df = _events(spark, [(1, 10, "a", 1.0), (2, 20, "a", 2.0)])
    hypertable.rollup_refresh(
        spark, table, df, time_col="ts", value_col="value", keys=["event_type"]
    )
    row = hypertable.rollup_read(spark, table).collect()[0]
    assert row.n_events == 2
    assert row.avg_value == 1.5
    assert row.min_value == 1.0 and row.max_value == 2.0


def test_new_key_in_old_bucket_inserts(spark, tmp_path):
    table = str(tmp_path / "rollup")
    hypertable.rollup_refresh(
        spark,
        table,
        _events(spark, [(1, 50, "a", 1.0)]),
        time_col="ts",
        value_col="value",
        keys=["event_type"],
    )
    hypertable.rollup_refresh(
        spark,
        table,
        _events(spark, [(2, 60, "b", 5.0)]),
        time_col="ts",
        value_col="value",
        keys=["event_type"],
    )
    got = {
        (r.bucket_sec, r.event_type): r.n_events
        for r in hypertable.rollup_read(spark, table).collect()
    }
    assert got == {(0, "a"): 1, (0, "b"): 1}


def test_kmv_distinct_state_exact_and_mergeable(spark, tmp_path):
    table = str(tmp_path / "rollup_kmv")
    # user u appears in BOTH batches within bucket 0 — the merged
    # sketch must count it once (set semantics across refreshes)
    b1 = spark.createDataFrame(
        [(1, 10, "a", 1.0, 7), (2, 20, "a", 1.0, 8), (3, _H + 5, "a", 1.0, 7)],
        "event_id bigint, sec bigint, event_type string, value double, uid bigint",
    ).withColumn("ts", F.timestamp_seconds("sec")).drop("sec")
    b2 = spark.createDataFrame(
        [(4, 30, "a", 1.0, 7), (5, 40, "a", 1.0, 9)],
        "event_id bigint, sec bigint, event_type string, value double, uid bigint",
    ).withColumn("ts", F.timestamp_seconds("sec")).drop("sec")
    for b in (b1, b2):
        hypertable.rollup_refresh(
            spark, table, b,
            time_col="ts", value_col="value", keys=["event_type"],
            distinct_col="uid", kmv_k=64,
        )
    got = {
        r.bucket_sec: r.distinct_est
        for r in hypertable.rollup_read(spark, table, kmv_k=64).collect()
    }
    assert got == {0: 3.0, _H: 1.0}  # uids {7,8,9} and {7}: exact below k


def test_stream_rollup_matches_batch_across_drops(spark, tmp_path):
    """Streaming leg: two file drops drained by successive availableNow
    runs must leave the rollup equal to the one-shot GROUP BY over
    everything landed, and a third run with nothing new must be a
    no-op (no phantom versions)."""
    import os

    src = str(tmp_path / "src")
    table = str(tmp_path / "rollup")
    cp = str(tmp_path / "cp")
    os.makedirs(src)
    s = spark.newSession()

    def _drop(rows):
        # append new part files into the flat source dir (file-stream
        # sources do not recurse into subdirectories)
        _events(s, rows).coalesce(1).write.mode("append").parquet(src)

    def _run():
        stream = (
            s.readStream.schema(
                "event_id bigint, event_type string, value double, ts timestamp"
            ).parquet(src)
        )
        hypertable.stream_rollup_refresh(
            stream,
            table,
            checkpoint_dir=cp,
            time_col="ts",
            value_col="value",
            keys=["event_type"],
        )

    rows_a = [(i, _H * (i % 3) + i, "a" if i % 2 else "b", float(i)) for i in range(20)]
    rows_b = [(100 + i, _H * (i % 3) + 50 + i, "a", 2.5) for i in range(10)]
    _drop(rows_a)
    _run()
    _drop(rows_b)  # late data for every bucket drop A created
    _run()
    n_versions = len(versioned.snapshot_versions(table))
    _run()  # nothing new: no extra version
    assert len(versioned.snapshot_versions(table)) == n_versions
    got = hypertable.rollup_read(s, table).drop("avg_value")
    want = _full(s.read.parquet(src))
    assert _rows(got) == _rows(want)
