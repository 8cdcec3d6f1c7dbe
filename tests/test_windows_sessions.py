"""Pins Spark's session_window boundary semantics: sessions whose
[ts, ts+gap) windows TOUCH are merged — an event exactly `gap` after the
previous one stays in-session. The DuckDB oracle for session_windows_30m
must therefore split on strictly-greater gaps."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_session_window_exact_gap_merges(spark):
    df = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00"),
            (2, "2024-01-01 00:30:00"),  # exactly gap later → merges
            (3, "2024-01-01 01:00:01"),  # 1s past gap → new session
        ],
        "id bigint, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = (
        df.groupBy(F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert sorted(r.n for r in out) == [1, 2]


def test_tumbling_window_is_half_open(spark):
    df = spark.createDataFrame(
        [(1, "2024-01-01 00:59:59"), (2, "2024-01-01 01:00:00")],
        "id bigint, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = (
        df.groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    # boundary event belongs to the NEXT window: two windows of 1
    assert sorted(r.n for r in out) == [1, 1]
