"""Drift-gated ingest (X114) + the DuckDB-mirror round (r14).

The gate composes the X110 drift algebra with the versioned snapshot
store: in-distribution appends commit, a shifted batch is refused and
the store is untouched, a brand-new group (NULL shift) is admitted by
policy. ``round_like_duckdb`` is pinned against a live DuckDB on a
midpoint-rich battery — the structural divergence class the X114
oracle exposed (quantized mean of a decimal sum / even n lands exactly
on .5 midpoints, where F.round and DuckDB ROUND disagree)."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from spark_ml_showcase_spark.operators import drift
from spark_ml_showcase_spark.sources import versioned


def test_round_like_duckdb_matches_duckdb_on_midpoints(spark):
    """Character-for-character pin on the exact divergence class: k/n
    rationals at the 1e-6 grid (even n → exact .5 midpoints), plus the
    shortest-repr traps (0.0000015's double is BELOW the midpoint but
    its shortest repr IS "1.5e-6" — F.round says 2e-6, DuckDB 1e-6)."""
    rng = np.random.RandomState(11)
    cases = [1.4999999999999998e-6, 0.0000015, -0.0000015, 2.5e-6, -2.5e-6]
    for _ in range(2000):
        k = int(rng.randint(-2_000_000, 2_000_000))
        n = int(rng.choice([2, 4, 6, 8, 12, 24, 26]))
        cases.append(k / n / 1e6)
        cases.append(float(rng.uniform(-2, 2)))
    df = spark.createDataFrame([(x,) for x in cases], "x double")
    got = [
        r.m
        for r in df.select(drift.round_like_duckdb(F.col("x"), 6).alias("m"))
        .collect()
    ]
    con = duckdb.connect()
    want = [
        con.execute("SELECT ROUND(CAST(? AS DOUBLE), 6)", [x]).fetchone()[0]
        for x in cases
    ]
    assert all(
        g == w or (g == 0 and w == 0) for g, w in zip(got, want)
    )
    # and the motivating contrast: F.round genuinely differs here
    fr = df.select(F.round("x", 6).alias("m")).collect()
    assert any(a.m != b for a, b in zip(fr, want))


def test_round_like_duckdb_overflow_returns_input(spark):
    """DuckDB's overflow fallback (r14 ADVICE): when x·10^d overflows
    to ±inf, ROUND returns the INPUT unchanged — the guard must mirror
    that instead of emitting Infinity. NaN/±inf inputs pass through on
    both engines; values just below the overflow edge still round."""
    import duckdb

    cases = [
        1.8e307, -1.8e307, 1.7976931348623157e308,  # x·1e6 → ±inf
        -1.7976931348623157e308,
        1.0e300, -1.0e300,                          # huge but no overflow
        float("inf"), float("-inf"), float("nan"),
        123.4567891, -123.4567891,                  # sanity: normal path
    ]
    df = spark.createDataFrame([(x,) for x in cases], "x double")
    got = [
        r.m
        for r in df.select(drift.round_like_duckdb(F.col("x"), 6).alias("m"))
        .collect()
    ]
    con = duckdb.connect()
    want = [
        con.execute("SELECT ROUND(CAST(? AS DOUBLE), 6)", [x]).fetchone()[0]
        for x in cases
    ]
    import math

    for g, w in zip(got, want):
        if math.isnan(w):
            assert math.isnan(g)
        else:
            assert g == w
    # the overflow class specifically round-trips the input
    assert got[0] == 1.8e307 and got[2] == 1.7976931348623157e308


def test_round_like_duckdb_bounded_identical_on_bounded_domain(spark):
    """``bounded=True`` (r15) drops the overflow guard — legal only
    when |x|·10^d cannot overflow. On that domain (here: midpoint-rich
    ratios in [−2, 2], the shortest-repr traps, 0 and 1) the two forms
    must be BIT-identical, because bounded mode exists purely to stop
    the guard's CASE WHEN from multiplying expensive subexpressions
    through pushed-down threshold filters (set_similarity_join_docs
    read 12 array_intersect evaluations per candidate row guarded,
    4 bounded — 6.8 s → 4.8 s isolated)."""
    rng = np.random.RandomState(23)
    cases = [1.4999999999999998e-6, 0.0000015, 2.5e-6, 0.0, 1.0, 0.9]
    for _ in range(2000):
        k = int(rng.randint(0, 2_000_000))
        n = int(rng.choice([2, 4, 6, 8, 12, 24, 26]))
        cases.append(k / n / 1e6)
        cases.append(float(rng.uniform(0, 1)))
    df = spark.createDataFrame([(x,) for x in cases], "x double")
    out = df.select(
        drift.round_like_duckdb(F.col("x"), 6).alias("g"),
        drift.round_like_duckdb(F.col("x"), 6, bounded=True).alias("b"),
    ).collect()
    assert all(r.g == r.b for r in out)


def test_round_like_duckdb_negative_tiny_zero_sign(spark):
    """The documented −0.0 caveat, pinned (r14 verdict): a rounded
    negative tiny yields +0.0 on the Spark side (BigDecimal has no −0)
    but −0.0 in DuckDB — equal in value, DIFFERENT in hashed bytes.
    This test pins both facts so the usage rule (magnitudes / on-grid
    diffs only, or oracle adds `+ 0`) stays load-bearing."""
    import duckdb
    import math

    df = spark.createDataFrame([(-1e-9,), (-4.9e-7,)], "x double")
    got = [
        r.m
        for r in df.select(drift.round_like_duckdb(F.col("x"), 6).alias("m"))
        .collect()
    ]
    assert all(g == 0.0 and math.copysign(1.0, g) == 1.0 for g in got)
    con = duckdb.connect()
    for x in (-1e-9, -4.9e-7):
        w = con.execute(
            "SELECT ROUND(CAST(? AS DOUBLE), 6)", [x]
        ).fetchone()[0]
        assert w == 0.0 and math.copysign(1.0, w) == -1.0


def _vecs(spark, n, *, source="s1", id_base=0, shift=0.0, dim=8, seed=5):
    rng = np.random.RandomState(seed)
    rows = [
        (
            source,
            id_base + i,
            [float(x) + (shift if d == 0 else 0.0) for d, x in enumerate(rng.randn(dim))],
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "source string, vec_id bigint, v array<double>")


def test_drift_gate_admits_clean_refuses_shifted(spark, tmp_path):
    store = os.path.join(str(tmp_path), "gate_store")
    day0 = _vecs(spark, 120, seed=5)
    assert versioned.write_snapshot(day0, store) == 0

    clean = _vecs(spark, 120, id_base=1000, seed=6)  # same distribution
    v1, rep1 = drift.drift_gated_append(
        spark, store, clean, max_centroid_shift=1.0
    )
    assert v1 == 1
    r1 = {r.source: r for r in rep1.collect()}
    assert r1["s1"].admitted == 1 and r1["s1"].centroid_shift < 1.0
    assert versioned.read_snapshot(spark, store).count() == 240

    bad = _vecs(spark, 120, id_base=2000, seed=7, shift=3.0)
    v2, rep2 = drift.drift_gated_append(
        spark, store, bad, max_centroid_shift=1.0
    )
    assert v2 is None  # refused
    r2 = {r.source: r for r in rep2.collect()}
    assert r2["s1"].admitted == 0 and r2["s1"].centroid_shift > 1.0
    # the store is untouched by the refusal
    assert versioned.snapshot_versions(store) == [0, 1]
    assert versioned.read_snapshot(spark, store).count() == 240


def test_drift_gate_bootstrap_empty_store(spark, tmp_path):
    """First commit into an EMPTY store succeeds unconditionally (r14
    ADVICE): nothing exists to drift from, so the gate's NULL-shift
    policy extends to the bootstrap — and the returned report is an
    empty frame with the full report schema."""
    store = os.path.join(str(tmp_path), "gate_store0")
    batch = _vecs(spark, 80, seed=5)
    v, rep = drift.drift_gated_append(
        spark, store, batch, max_centroid_shift=0.5
    )
    assert v == 0
    assert rep.count() == 0
    assert rep.columns == [
        "source", "n_base", "n_cur", "centroid_shift",
        "mean_norm_base", "mean_norm_cur", "norm_shift", "admitted",
    ]
    assert versioned.read_snapshot(spark, store).count() == 80
    # and the store is now a working baseline for the NEXT append
    v2, rep2 = drift.drift_gated_append(
        spark, store, _vecs(spark, 80, id_base=500, seed=6),
        max_centroid_shift=1.0,
    )
    assert v2 == 1 and rep2.count() == 1


def test_drift_gate_null_shift_new_group_admitted(spark, tmp_path):
    """A group with no baseline (new source) has nothing to drift from
    — NULL shift does not block, by documented policy."""
    store = os.path.join(str(tmp_path), "gate_store2")
    versioned.write_snapshot(_vecs(spark, 60, source="s1", seed=5), store)
    newsrc = _vecs(spark, 60, source="s2", id_base=500, seed=8, shift=5.0)
    v, rep = drift.drift_gated_append(
        spark, store, newsrc, max_centroid_shift=0.5
    )
    assert v == 1
    r = {x.source: x for x in rep.collect()}
    assert r["s2"].centroid_shift is None and r["s2"].admitted == 1
    assert versioned.read_snapshot(spark, store).count() == 120


def test_drift_report_matches_numpy_on_planted_shift(spark):
    """The extracted drift_report reproduces the numpy centroid-L2 and
    mean-norm truth within the ROUND(6) quantization, with the planted
    +2.0 dim-0 drift recovered."""
    base = _vecs(spark, 200, seed=5)
    cur = _vecs(spark, 200, id_base=1000, seed=9, shift=2.0)
    tagged = base.select("source", F.lit("baseline").alias("w"), "v").unionByName(
        cur.select("source", F.lit("current").alias("w"), "v")
    )
    rep = drift.drift_report(tagged).collect()[0]
    rng = np.random.RandomState(5)
    B = np.vstack([rng.randn(8) for _ in range(200)])
    rng = np.random.RandomState(9)
    C = np.vstack([rng.randn(8) for _ in range(200)])
    C[:, 0] += 2.0
    want = float(np.linalg.norm(B.mean(0) - C.mean(0)))
    assert rep.centroid_shift == pytest.approx(want, abs=1e-4)
    assert rep.n_base == 200 and rep.n_cur == 200
    assert rep.mean_norm_base == pytest.approx(
        float(np.linalg.norm(B, axis=1).mean()), abs=1e-4
    )
