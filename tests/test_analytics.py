"""Funnel + cohort retention (operators/analytics.py): semantics pinned
on hand-built event logs where the expected output is checkable by eye,
plus plan-shape guards (single user-shuffle funnel, no UDFs)."""

from __future__ import annotations

import datetime as dt

import pytest

from spark_ml_showcase_spark.operators import analytics


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (uid, dt.datetime(2024, 1, d, h, m), et)
            for (uid, d, h, m, et) in rows
        ],
        "user_id long, ts timestamp, event_type string",
    )


def test_funnel_strict_order(spark):
    rows = [
        # u1 completes the whole funnel in order
        (1, 1, 0, 0, "view"),
        (1, 1, 1, 0, "click"),
        (1, 1, 2, 0, "purchase"),
        # u2 clicks BEFORE viewing: click must not count
        (2, 1, 1, 0, "click"),
        (2, 1, 2, 0, "view"),
        # u3 views only
        (3, 1, 0, 0, "view"),
        # u4 never views: nothing counts, not even the purchase
        (4, 1, 0, 0, "purchase"),
    ]
    out = analytics.funnel(_ev(spark, rows), ["view", "click", "purchase"])
    got = {r["step"]: (r["users"], r["conversion"]) for r in out.collect()}
    assert got == {
        "view": (3, 1.0),
        "click": (1, pytest.approx(1 / 3, abs=1e-6)),
        "purchase": (1, pytest.approx(1 / 3, abs=1e-6)),
    }


def test_funnel_same_timestamp_not_counted(spark):
    # strict > : a click at the exact view instant does not advance
    rows = [(1, 1, 0, 0, "view"), (1, 1, 0, 0, "click")]
    out = analytics.funnel(_ev(spark, rows), ["view", "click"])
    got = {r["step"]: r["users"] for r in out.collect()}
    assert got == {"view": 1, "click": 0}


def test_funnel_greedy_is_exact_on_retry_path(spark):
    # u1: view@0, click@1, view@2, purchase@3 — greedy chains
    # view@0 → click@1 → purchase@3 and must count the purchase.
    rows = [
        (1, 1, 0, 0, "view"),
        (1, 1, 1, 0, "click"),
        (1, 2, 0, 0, "view"),
        (1, 3, 0, 0, "purchase"),
    ]
    out = analytics.funnel(_ev(spark, rows), ["view", "click", "purchase"])
    assert all(r["users"] == 1 for r in out.collect())


def test_funnel_empty_and_no_steps(spark):
    df = _ev(spark, [])
    out = analytics.funnel(df, ["view"])
    row = out.collect()[0]
    assert (row["users"], row["conversion"]) == (0, None)
    with pytest.raises(ValueError):
        analytics.funnel(df, [])


def test_funnel_single_exchange(spark):
    """The chained step windows all reuse the first user-hash exchange:
    exactly ONE Exchange before the per-user collapse (the 1-row global
    agg after it is free)."""
    rows = [(1, 1, 0, 0, "view"), (2, 1, 1, 0, "click")]
    plan = analytics.funnel(
        _ev(spark, rows), ["view", "click", "purchase"]
    )._jdf.queryExecution().executedPlan().toString()
    # hashpartitioning exchanges only; ignore the SinglePartition one
    # feeding the global count row.
    n_hash_exchanges = plan.count("hashpartitioning")
    assert n_hash_exchanges <= 1, plan


def test_cohort_retention_shape(spark):
    rows = [
        # cohort 2024-01-01: u1 (active d1, d2), u2 (active d1, d3)
        (1, 1, 0, 0, "view"),
        (1, 2, 0, 0, "view"),
        (2, 1, 5, 0, "click"),
        (2, 3, 0, 0, "view"),
        # cohort 2024-01-02: u3 active once
        (3, 2, 0, 0, "view"),
    ]
    out = analytics.cohort_retention(_ev(spark, rows))
    got = {
        (r["cohort_day"], r["day_offset"]): (r["users"], r["retention"])
        for r in out.collect()
    }
    assert got == {
        ("2024-01-01", 0): (2, 1.0),
        ("2024-01-01", 1): (1, 0.5),
        ("2024-01-01", 2): (1, 0.5),
        ("2024-01-02", 0): (1, 1.0),
    }


def test_cohort_max_offset(spark):
    rows = [(1, 1, 0, 0, "view"), (1, 20, 0, 0, "view")]
    out = analytics.cohort_retention(_ev(spark, rows), max_offset=7)
    assert [r["day_offset"] for r in out.collect()] == [0]


def test_cohort_multiple_events_same_day_count_once(spark):
    rows = [(1, 1, 0, 0, "view"), (1, 1, 5, 0, "click")]
    out = analytics.cohort_retention(_ev(spark, rows))
    rowz = out.collect()
    assert len(rowz) == 1 and rowz[0]["users"] == 1


def test_psi_drift_identical_zero_shifted_high(spark):
    """X88: an identical follow-up period scores PSI ≈ 0; a location-
    shifted one scores past the 0.25 retrain threshold; empty bins
    contribute through the eps clamp instead of vanishing."""
    from spark_ml_showcase_spark.operators.analytics import psi_drift

    base = [(float(i % 100), "s", 1) for i in range(1000)]
    same = [(float(i % 100), "s", 2) for i in range(1000)]
    shifted = [(float(i % 100) + 200.0, "s", 3) for i in range(1000)]
    df = spark.createDataFrame(
        base + same + shifted, "v double, seg string, per int"
    )
    got = {
        r.period: r.psi
        for r in psi_drift(
            df,
            value_col="v",
            segment_col="seg",
            period_col="per",
            base_period=1,
        ).collect()
    }
    assert got[2] == 0.0
    # every shifted row lands in the top bin: 9 empty bins each add
    # (0 - 0.1)·ln(eps/0.1) and the full bin adds (1 - 0.1)·ln(1/0.1)
    assert got[3] > 0.25
    import math

    expected = 9 * round(-0.1 * math.log(1e-6 / 0.1), 6) + round(
        0.9 * math.log(1.0 / 0.1), 6
    )
    assert abs(got[3] - expected) < 1e-9


def test_time_weighted_avg_locf_semantics(spark):
    """X95: TWAP weighs by holding duration (LOCF) — a burst of samples
    can't dominate; same-second runs leave only the last holding time;
    the final observation holds to the bucket end."""
    from spark_ml_showcase_spark.operators.hypertable import (
        time_weighted_avg,
    )

    rows = [
        # key a: v=10 held 0:00→12:00 (43200s), v=50 held 12:00→24:00
        ("a", "2024-01-01 00:00:00", 10.0, 1),
        ("a", "2024-01-01 12:00:00", 50.0, 2),
        # key b: burst of 3 same-second samples at 0:00 (w=0,0),
        # then v=100 from 0:00:01 to day end — twap ≈ 100, not the
        # plain AVG 28.75
        ("b", "2024-01-01 00:00:00", 1.0, 3),
        ("b", "2024-01-01 00:00:00", 2.0, 4),
        ("b", "2024-01-01 00:00:00", 12.0, 5),
        ("b", "2024-01-01 00:00:01", 100.0, 6),
    ]
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        rows, "k string, ts string, value double, event_id bigint"
    ).select(
        "k", F.to_timestamp("ts").alias("ts"), "value", "event_id"
    )
    got = {
        r.k: r
        for r in time_weighted_avg(
            df, key_col="k", time_col="ts", value_col="value",
            tiebreak_col="event_id",
        ).collect()
    }
    assert got["a"].twap == 30.0
    assert got["a"].span_sec == 86400
    # b: (12*1 + 100*86399) / 86400
    assert abs(got["b"].twap - (12 + 100 * 86399) / 86400) < 1e-6
    assert got["b"].n_obs == 4
