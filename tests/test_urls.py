"""URL canonicalization (X113): canonical-form semantics, Spark↔DuckDB
equivalence on planted messy URLs, idempotence, host extraction."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from spark_ml_showcase_spark.functions import urls

# (messy, canonical) — each case exercises one rule plus interactions
CASES = [
    # case-variant scheme/host; PATH case preserved
    ("HTTPS://WWW.News.Example.COM/Docs/A", "https://www.news.example.com/Docs/A"),
    # fragment dropped
    ("https://a.com/p#frag?notaquery", "https://a.com/p"),
    # tracking params: leading, adjacent, trailing, value-embedded '='-free
    ("https://a.com/p?utm_source=x&utm_campaign=y&page=2", "https://a.com/p?page=2"),
    ("https://a.com/p?page=2&ref=tw", "https://a.com/p?page=2"),
    ("https://a.com/p?utm_medium=email", "https://a.com/p"),
    ("https://a.com/p?ref=", "https://a.com/p"),
    # 'href' must NOT be eaten by the 'ref' rule (substring trap)
    ("https://a.com/p?href=z&page=1", "https://a.com/p?href=z&page=1"),
    # default ports stripped scheme-aware; non-default kept
    ("http://a.com:80/p", "http://a.com/p"),
    ("https://a.com:443/p?q=1", "https://a.com/p?q=1"),
    ("http://a.com:443/p", "http://a.com:443/p"),
    ("https://a.com:8443/p", "https://a.com:8443/p"),
    ("HTTP://A.com:80", "http://a.com"),
    # trailing slashes: path, before-query, root
    ("https://a.com/p/", "https://a.com/p"),
    ("https://a.com/p/?page=3", "https://a.com/p?page=3"),
    ("https://a.com/", "https://a.com"),
    # whitespace trim
    ("  https://a.com/p \t", "https://a.com/p"),
    # U+000B vertical tab: in Java's \s but NOT RE2's — the r14 ADVICE
    # divergence; the spelled-out class must trim it on BOTH engines
    ("\x0b https://a.com/p\t\x0b", "https://a.com/p"),
    # everything at once
    (
        "HTTPS://WWW.A.com:443/d/5/?utm_source=n&utm_campaign=s&page=4#sec",
        "https://www.a.com/d/5?page=4",
    ),
]


def test_canonical_forms(spark):
    df = spark.createDataFrame([(m,) for m, _ in CASES], "url string")
    got = [
        r.c for r in df.select(urls.canonicalize_url("url").alias("c")).collect()
    ]
    assert got == [want for _, want in CASES]


def test_spark_duckdb_canonicalization_equivalence(spark):
    """The oracle-licensing pin: the Column chain and the generated
    DuckDB SQL twin must agree character for character on the planted
    set (same discipline as the unicode-canonical and regex-dialect
    pins)."""
    df = spark.createDataFrame([(m,) for m, _ in CASES], "url string")
    got = [
        r.c for r in df.select(urls.canonicalize_url("url").alias("c")).collect()
    ]
    con = duckdb.connect()
    # the generated fragment repeats its input expression, so feed it a
    # named column rather than a repeated '?' placeholder
    sql = urls.duckdb_canonicalize_sql("u")
    want = [
        con.execute(f"SELECT {sql} FROM (SELECT ? AS u)", [m]).fetchone()[0]
        for m, _ in CASES
    ]
    assert got == want
    # host twin agrees too
    got_h = [
        r.h
        for r in df.select(
            urls.url_host(urls.canonicalize_url("url")).alias("h")
        ).collect()
    ]
    hsql = urls.duckdb_host_sql(urls.duckdb_canonicalize_sql("u"))
    want_h = [
        con.execute(f"SELECT {hsql} FROM (SELECT ? AS u)", [m]).fetchone()[0]
        for m, _ in CASES
    ]
    assert got_h == want_h


def test_canonicalization_idempotent(spark):
    df = spark.createDataFrame([(m,) for m, _ in CASES], "url string")
    once = df.select(urls.canonicalize_url("url").alias("c"))
    twice = once.select(urls.canonicalize_url("c").alias("c2"), "c")
    assert twice.filter(F.col("c") != F.col("c2")).count() == 0


def test_url_host_strips_www_and_port(spark):
    rows = [
        ("https://www.news.example.com/d", "news.example.com"),
        ("https://a.com:8443/p", "a.com"),
        ("http://b.org", "b.org"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in rows], "url string")
    got = [r.h for r in df.select(urls.url_host("url").alias("h")).collect()]
    assert got == [want for _, want in rows]
