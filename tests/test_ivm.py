"""Join-view IVM algebra invariants: dimension updates re-derive
exactly the touched keys' rows (old facts included), untouched rows
keep their attributes, and the fold always equals the one-shot join
against the final dimension state."""

from __future__ import annotations

from spark_ml_showcase_spark.operators.ivm import join_view_fold


def _facts(spark, rows):
    return spark.createDataFrame(rows, "fid bigint, k bigint, amt double")


def _dim(spark, rows):
    return spark.createDataFrame(rows, "k bigint, attr string")


def _keys(spark, ks):
    return spark.createDataFrame([(k,) for k in ks], "k bigint")


def test_dim_update_rederives_old_facts(spark):
    # step 1: facts 1,2 against v0; step 2: fact 3 arrives AND key 10's
    # attr changes -> fact 1 (old, key 10) must show the NEW attr
    f1 = _facts(spark, [(1, 10, 5.0), (2, 20, 7.0)])
    f2 = _facts(spark, [(3, 10, 9.0)])
    d0 = _dim(spark, [(10, "a"), (20, "b")])
    d1 = _dim(spark, [(10, "a2"), (20, "b")])
    view = join_view_fold(
        [(f1, d0, None), (f2, d1, _keys(spark, [10]))], key="k"
    )
    got = {(r.fid): (r.attr, r.amt) for r in view.collect()}
    assert got == {1: ("a2", 5.0), 2: ("b", 7.0), 3: ("a2", 9.0)}


def test_append_only_step_keeps_attrs(spark):
    # changed=None: pure fact append; existing rows untouched
    f1 = _facts(spark, [(1, 10, 1.0)])
    f2 = _facts(spark, [(2, 20, 2.0)])
    d = _dim(spark, [(10, "a"), (20, "b")])
    view = join_view_fold([(f1, d, None), (f2, d, None)], key="k")
    got = {r.fid: r.attr for r in view.collect()}
    assert got == {1: "a", 2: "b"}


def test_fold_equals_one_shot_join(spark):
    # three steps with interleaved updates == one-shot against final dim
    f = [
        _facts(spark, [(i, i % 3, float(i)) for i in range(0, 6)]),
        _facts(spark, [(i, i % 3, float(i)) for i in range(6, 12)]),
        _facts(spark, [(i, i % 3, float(i)) for i in range(12, 18)]),
    ]
    d0 = _dim(spark, [(0, "x"), (1, "y"), (2, "z")])
    d1 = _dim(spark, [(0, "x1"), (1, "y"), (2, "z")])
    d2 = _dim(spark, [(0, "x1"), (1, "y2"), (2, "z")])
    view = join_view_fold(
        [
            (f[0], d0, None),
            (f[1], d1, _keys(spark, [0])),
            (f[2], d2, _keys(spark, [1])),
        ],
        key="k",
    )
    want = {
        r.fid: r.attr
        for r in f[0].unionByName(f[1]).unionByName(f[2])
        .join(d2, "k")
        .collect()
    }
    got = {r.fid: r.attr for r in view.collect()}
    assert got == want and len(got) == 18
