"""Source/sink coverage (SURVEY.md §2.1): empty relation with copied
schema (S6), explicit-schema CSV reads, parquet round-trip fidelity."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from spark_ml_showcase_spark.sources import io


def test_empty_relation_with_copied_schema(spark):
    # S6 (Claims_Prediction.py:44-45): the stratified-split accumulator seed
    src = spark.createDataFrame([(1, "a", 2.0)], "k bigint, s string, v double")
    empty = spark.createDataFrame([], src.schema)
    assert empty.count() == 0
    assert empty.schema == src.schema
    assert empty.unionAll(src).count() == 1  # U1 positional union


def test_read_csv_explicit_schema_skips_inference(spark, tmp_path):
    p = str(tmp_path / "x.csv")
    with open(p, "w") as f:
        f.write("1,2.5\n2,3.5\n")
    df = io.read_csv(spark, p, schema="a int, b double")
    assert df.dtypes == [("a", "int"), ("b", "double")]
    assert df.agg(F.sum("b")).first()[0] == 6.0
    # no schema, no infer → all strings (the reference's read pattern)
    raw = io.read_csv(spark, p)
    assert all(t == "string" for _, t in raw.dtypes)


def test_write_report_txt_and_csv(spark, tmp_path):
    df = spark.createDataFrame(
        [("de", 10, 'quo"te'), ("ca", 2, "with,comma"), ("sg", 1, None)],
        "country string, n bigint, note string",
    ).orderBy("country")
    txt = io.write_report(df, str(tmp_path / "r.txt"), fmt="txt")
    lines = open(txt).read().splitlines()
    assert lines[0].split() == ["country", "n", "note"]
    assert lines[1].startswith("---")
    assert len(lines) == 5 and lines[2].split()[0] == "ca"

    csv = io.write_report(df, str(tmp_path / "r.csv"), fmt="csv")
    back = io.read_csv(
        spark, csv, header=True,
        schema="country string, n bigint, note string", escape='"',
    )
    assert {(r.country, r.n, r.note) for r in back.collect()} == {
        ("de", 10, 'quo"te'),
        ("ca", 2, "with,comma"),
        ("sg", 1, None),
    }

    import pytest as _pytest

    with _pytest.raises(ValueError):
        io.write_report(df, str(tmp_path / "r.json"), fmt="json")


def test_write_parquet_partition_by(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "x")], "k bigint, part string"
    )
    out = str(tmp_path / "pq")
    io.write_parquet(df, out, partition_by=["part"])
    # hive-style layout → downstream partition pruning
    assert sorted(
        d for d in os.listdir(out) if d.startswith("part=")
    ) == ["part=x", "part=y"]
    back = io.read_parquet(spark, out)
    assert back.count() == 3
    pruned = back.filter(F.col("part") == "x")
    assert pruned.count() == 2


def test_orc_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"s{i % 3}", float(i)) for i in range(100)],
        "k bigint, cat string, v double",
    )
    out = str(tmp_path / "orc")
    io.write_orc(df, out)
    back = io.read_orc(spark, out)
    assert back.count() == 100
    assert dict(back.dtypes) == dict(df.dtypes)
    # column-pruned read
    pruned = io.read_orc(spark, out, "k", "v")
    assert pruned.columns == ["k", "v"]
    assert back.agg(F.sum("v")).first()[0] == sum(range(100))
