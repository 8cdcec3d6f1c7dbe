"""EWMA operator pinned against a hand-rolled recurrence (pandas' ewm
kernel is the implementation, so the reference here is an explicit
Python loop, not another ewm call)."""

from __future__ import annotations

import pytest

from spark_ml_showcase_spark.operators.windows import ewma_smooth


def _reference(ys, alpha):
    out, prev = [], None
    for y in ys:
        prev = y if prev is None else alpha * y + (1 - alpha) * prev
        out.append(round(prev, 6))
    return out


def test_ewma_matches_hand_recurrence(spark):
    ys = [10.0, 12.0, 9.0, 14.0, 14.0, 3.0, 8.5]
    rows = [("a", i, y) for i, y in enumerate(ys)]
    rows += [("b", i, 2.0 * y) for i, y in enumerate(ys)]
    df = spark.createDataFrame(rows, "k string, x bigint, y double")
    got = {
        (r.k, r.x): r.ewma
        for r in ewma_smooth(df, ["k"], "x", "y", alpha=0.3).collect()
    }
    for k, scale in (("a", 1.0), ("b", 2.0)):
        want = _reference([scale * y for y in ys], 0.3)
        for i in range(len(ys)):
            assert got[(k, i)] == pytest.approx(want[i], abs=1e-6), (k, i)


def test_ewma_unsorted_input_is_ordered_by_x(spark):
    rows = [("a", 2, 100.0), ("a", 0, 10.0), ("a", 1, 20.0)]
    df = spark.createDataFrame(rows, "k string, x bigint, y double")
    got = {
        r.x: r.ewma
        for r in ewma_smooth(df, ["k"], "x", "y", alpha=0.5).collect()
    }
    assert got[0] == 10.0 and got[1] == 15.0 and got[2] == 57.5
