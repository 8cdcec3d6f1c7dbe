"""Set-operator bag semantics (SURVEY §2.7 U2+): the ALL variants keep
multiplicity — distinct-form tests live with the registered queries'
oracles; these pin the multiset arithmetic on crafted duplicates."""

from __future__ import annotations


def test_except_all_and_intersect_all_multiplicity(spark):
    """Bag semantics: counts subtract / take the min, never dedup."""
    from spark_ml_showcase_spark.operators import setops

    a = spark.createDataFrame([("x",)] * 5 + [("y",)] * 2, "v string")
    b = spark.createDataFrame([("x",)] * 3 + [("z",)] * 4, "v string")
    ex = [r.v for r in setops.except_all(a, b).collect()]
    assert sorted(ex) == ["x", "x", "y", "y"]
    ix = [r.v for r in setops.intersect_all(a, b).collect()]
    assert ix == ["x", "x", "x"]
