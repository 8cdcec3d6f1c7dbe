"""Operator-level invariants for the round-9 families: skyline
(Pareto frontier), grid radius join, linear interpolation, Markov
transition matrix, chi-square independence.

Each randomized test checks the DISTRIBUTED plan against a
brute-force in-memory reference on the same seeded data — the shape
the driver's DuckDB oracle can't probe (partition-boundary behavior,
duplicate coordinates, empty partitions)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from spark_ml_showcase_spark.operators.geo import grid_radius_join
from spark_ml_showcase_spark.operators.skyline import skyline
from spark_ml_showcase_spark.operators.analytics import (
    chi_square_independence,
    transition_matrix,
)
from spark_ml_showcase_spark.operators.windows import interpolate_linear


def _naive_skyline(rows: list[tuple]) -> set[tuple]:
    out = set()
    for c in rows:
        dominated = any(
            d[1] <= c[1] and d[2] >= c[2] and (d[1] < c[1] or d[2] > c[2])
            for d in rows
        )
        if not dominated:
            out.add(c)
    return out


def test_skyline_randomized_vs_naive(spark):
    rng = np.random.default_rng(7)
    rows = [
        (int(i), float(rng.integers(0, 40)), int(rng.integers(0, 40)))
        for i in range(300)
    ]
    df = spark.createDataFrame(
        rows, "id bigint, price double, size bigint"
    ).repartition(7)  # force cross-partition refine
    got = {
        (r.id, r.price, r.size)
        for r in skyline(df, minimize="price", maximize="size").collect()
    }
    assert got == _naive_skyline(rows)


def test_skyline_keeps_exact_duplicates(spark):
    # two points with identical (price, size) dominate neither; both stay
    rows = [
        (1, 5.0, 10), (2, 5.0, 10),  # frontier duplicates
        (3, 4.0, 8), (4, 6.0, 12),   # frontier corners
        (5, 6.0, 10),                # dominated by 1/2 (same size, pricier)
    ]
    df = spark.createDataFrame(rows, "id bigint, price double, size bigint")
    got = sorted(
        r.id for r in skyline(df, minimize="price", maximize="size").collect()
    )
    assert got == [1, 2, 3, 4]


def test_grid_radius_join_randomized_vs_bruteforce(spark):
    rng = np.random.default_rng(11)
    left = [(int(i), int(x), int(y)) for i, (x, y) in enumerate(
        rng.integers(0, 3000, size=(200, 2)))]
    right = [(int(i), int(x), int(y)) for i, (x, y) in enumerate(
        rng.integers(0, 3000, size=(150, 2)))]
    r = 500
    ldf = spark.createDataFrame(left, "lid bigint, lx bigint, ly bigint")
    rdf = spark.createDataFrame(right, "rid bigint, rx bigint, ry bigint")
    got = {
        (row.lid, row.rid, row.dist2)
        for row in grid_radius_join(
            ldf, rdf, left_xy=("lx", "ly"), right_xy=("rx", "ry"), radius=r
        ).select("lid", "rid", "dist2").collect()
    }
    want = {
        (li, ri, (lx - rx) ** 2 + (ly - ry) ** 2)
        for li, lx, ly in left
        for ri, rx, ry in right
        if (lx - rx) ** 2 + (ly - ry) ** 2 <= r * r
    }
    assert got == want
    assert len(want) > 50  # the probe actually exercises matches


def test_grid_radius_join_boundary_and_negative_coords(spark):
    # exactly-on-radius pair kept; negative coordinates grid correctly
    ldf = spark.createDataFrame(
        [(1, -10, 0), (2, 0, 0)], "lid bigint, lx bigint, ly bigint"
    )
    rdf = spark.createDataFrame(
        [(1, -10, 100), (2, 500, 0)], "rid bigint, rx bigint, ry bigint"
    )
    got = {
        (r.lid, r.rid)
        for r in grid_radius_join(
            ldf, rdf, left_xy=("lx", "ly"), right_xy=("rx", "ry"), radius=100
        ).collect()
    }
    # (1,1): dist² = 0 + 100² = r² exactly -> kept (<=)
    # (2,1): dist² = 10² + 100² = 10100 > r² -> dropped
    assert got == {(1, 1)}


def test_interpolate_linear_fills_gaps_and_edges(spark):
    rows = [
        ("a", 0, None), ("a", 10, 1.0), ("a", 20, None), ("a", 30, None),
        ("a", 40, 4.0), ("a", 50, None),
        ("b", 0, 2.0), ("b", 10, None),  # trailing edge for b
    ]
    df = spark.createDataFrame(rows, "k string, x bigint, y double")
    got = {
        (r.k, r.x): (r.y, r.src)
        for r in interpolate_linear(df, ["k"], "x", "y").collect()
    }
    assert got[("a", 0)] == (None, "edge")
    assert got[("a", 10)] == (1.0, "observed")
    assert got[("a", 20)] == (2.0, "interp")
    assert got[("a", 30)] == (3.0, "interp")
    assert got[("a", 40)] == (4.0, "observed")
    assert got[("a", 50)] == (None, "edge")
    assert got[("b", 10)] == (None, "edge")


def test_interpolate_linear_all_null_key(spark):
    df = spark.createDataFrame(
        [("z", 0, None), ("z", 10, None)], "k string, x bigint, y double"
    )
    out = interpolate_linear(df, ["k"], "x", "y").collect()
    assert all(r.y is None and r.src == "edge" for r in out)


def test_transition_matrix_tie_determinism(spark):
    # two events at the SAME ts: event_id breaks the tie -> a,b then c
    rows = [
        (1, 100, 0, "a"), (2, 100, 0, "b"), (3, 100, 5, "c"),
        (4, 200, 0, "a"), (5, 200, 1, "a"),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, t bigint, event_type string"
    ).withColumn("ts", F.timestamp_seconds("t"))
    got = {
        (r.prev_type, r.cur_type): (r.transitions, r.prob)
        for r in transition_matrix(df).collect()
    }
    assert got == {
        ("a", "b"): (1, 0.5),
        ("b", "c"): (1, 1.0),
        ("a", "a"): (1, 0.5),
    }


def test_chi2_independent_uniform_is_zero(spark):
    # perfectly balanced table -> observed == expected -> chi2 == 0
    rows = [(r, c) for r in ("x", "y") for c in (1, 2, 3) for _ in range(4)]
    df = spark.createDataFrame(rows, "r string, c bigint")
    out = chi_square_independence(df, F.col("r"), F.col("c")).collect()[0]
    assert out.n == 24
    assert out.dof == 2
    assert out.chi2 == 0.0
    assert out.cramers_v == 0.0


def test_chi2_matches_hand_computation(spark):
    # 2x2 table [[10, 20], [30, 40]]: chi2 = N(ad-bc)^2 / (r1 r2 c1 c2)
    rows = (
        [("x", 1)] * 10 + [("x", 2)] * 20 + [("y", 1)] * 30 + [("y", 2)] * 40
    )
    df = spark.createDataFrame(rows, "r string, c bigint")
    out = chi_square_independence(df, F.col("r"), F.col("c")).collect()[0]
    n, a, b, c, d = 100, 10, 20, 30, 40
    expect = n * (a * d - b * c) ** 2 / (30 * 70 * 40 * 60)
    assert out.n == n and out.dof == 1
    assert out.chi2 == pytest.approx(expect, abs=1e-6)
    assert out.cramers_v == pytest.approx(np.sqrt(expect / n), abs=1e-6)


def test_chi2_single_category_cramers_v_null(spark):
    # degenerate contract (ADVICE r9): one distinct row-category means
    # dof = 0 — cramers_v must be explicit NULL, not NaN/Infinity.
    rows = [("x", 1)] * 3 + [("x", 2)] * 5
    df = spark.createDataFrame(rows, "r string, c bigint")
    out = chi_square_independence(df, F.col("r"), F.col("c")).collect()[0]
    assert out.dof == 0
    assert out.cramers_v is None


def test_geo_knn_grid_parity_with_bruteforce_truth(spark):
    """X101: the grid-ladder KNN returns row-for-row the brute-force
    truth (same rounded distances, same ranks) at sf0.01 — the
    truth/scale-twin parity contract."""
    from spark_ml_showcase_spark.plans import spatial_queries as SQ

    sf = "/root/testdata/sf0.01"
    truth = {
        (r.c_custkey, r.rank): (r.s_suppkey, r.dist_m)
        for r in SQ.geo_knn_haversine(spark, sf).collect()
    }
    got = {
        (r.c_custkey, r.rank): (r.s_suppkey, r.dist_m)
        for r in SQ.geo_knn_grid(spark, sf).collect()
    }
    assert got == truth
    assert truth  # non-empty fixture


def test_grid_knn_sphere_randomized_parity_and_resolution(spark):
    """Randomized lat/lon clouds: the ladder's resolved top-k equals the
    exact KNN for every query, and with a DENSE candidate cloud ring 1
    resolves (the fallback residue is empty — checked by running the
    ladder with an empty-ring guard corpus where brute force would
    differ in cost, not in answer)."""
    import numpy as np

    from pyspark.sql import functions as F
    from spark_ml_showcase_spark.operators.geo import grid_knn_sphere

    rng = np.random.RandomState(11)
    n_c, n_q = 4000, 25
    # dense band: |lat| <= 55 keeps the lon-bound nondegenerate
    cl = rng.uniform(-55, 55, n_c)
    cn = rng.uniform(-180, 180, n_c)
    ql = rng.uniform(-50, 50, n_q)
    qn = rng.uniform(-180, 180, n_q)
    cands = spark.createDataFrame(
        [(i, float(cl[i]), float(cn[i])) for i in range(n_c)],
        "ckey bigint, lat double, lon double",
    )
    queries = spark.createDataFrame(
        [(i, float(ql[i]), float(qn[i])) for i in range(n_q)],
        "qkey bigint, lat double, lon double",
    )
    got = grid_knn_sphere(
        queries, cands, q_key="qkey", c_key="ckey", k=3
    ).collect()
    # exact truth via the same rounded-haversine + tie-break
    from spark_ml_showcase_spark.operators.geo import _hav_m
    from pyspark.sql.window import Window as W

    d = (
        cands.select("ckey", F.col("lat").alias("_clat"), F.col("lon").alias("_clon"))
        .crossJoin(
            F.broadcast(
                queries.select(
                    "qkey", F.col("lat").alias("_qlat"), F.col("lon").alias("_qlon")
                )
            )
        )
        .withColumn(
            "dist_m",
            F.round(
                _hav_m(
                    F.col("_qlat"), F.col("_qlon"), F.col("_clat"), F.col("_clon")
                ),
                3,
            ),
        )
    )
    w = W.partitionBy("qkey").orderBy(F.col("dist_m").asc(), F.col("ckey").asc())
    truth = (
        d.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("qkey", "ckey", "dist_m", "rank")
        .collect()
    )
    assert {tuple(r) for r in got} == {tuple(r) for r in truth}
    assert len(got) == n_q * 3


def test_grid_knn_sphere_polar_band_exact_via_fallback(spark):
    """r12 ADVICE (low): queries whose ring lat band touches a pole
    have a degenerate lon bound (cos(90°)=0) and can never resolve via
    the ring ladder — they must land in the exact brute-force fallback
    and still return the exact top-k (correctness never degrades at
    the poles, only the scale path does; documented in the operator
    docstring). Mid-lat queries in the same run still resolve against
    the tightened cell-band bound."""
    import numpy as np

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W
    from spark_ml_showcase_spark.operators.geo import _hav_m, grid_knn_sphere

    rng = np.random.RandomState(3)
    # polar cloud + a mid-lat cloud, queries in both bands
    n_polar, n_mid = 500, 2000
    cl = np.concatenate(
        [rng.uniform(80, 90, n_polar), rng.uniform(-50, 50, n_mid)]
    )
    cn = rng.uniform(-180, 180, n_polar + n_mid)
    ql = np.array([86.0, 89.5, -88.0, 10.0, -40.0])
    qn = np.array([0.0, 120.0, -60.0, 30.0, -100.0])
    cands = spark.createDataFrame(
        [(i, float(cl[i]), float(cn[i])) for i in range(len(cl))],
        "ckey bigint, lat double, lon double",
    )
    queries = spark.createDataFrame(
        [(i, float(ql[i]), float(qn[i])) for i in range(len(ql))],
        "qkey bigint, lat double, lon double",
    )
    got = grid_knn_sphere(
        queries, cands, q_key="qkey", c_key="ckey", k=3
    ).collect()
    d = (
        cands.select(
            "ckey", F.col("lat").alias("_clat"), F.col("lon").alias("_clon")
        )
        .crossJoin(
            F.broadcast(
                queries.select(
                    "qkey",
                    F.col("lat").alias("_qlat"),
                    F.col("lon").alias("_qlon"),
                )
            )
        )
        .withColumn(
            "dist_m",
            F.round(
                _hav_m(
                    F.col("_qlat"),
                    F.col("_qlon"),
                    F.col("_clat"),
                    F.col("_clon"),
                ),
                3,
            ),
        )
    )
    w = W.partitionBy("qkey").orderBy(
        F.col("dist_m").asc(), F.col("ckey").asc()
    )
    truth = (
        d.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("qkey", "ckey", "dist_m", "rank")
        .collect()
    )
    assert {tuple(r) for r in got} == {tuple(r) for r in truth}
    assert len(got) == len(ql) * 3
