"""Language ID (X115, designed r15 for the r16 registration slot):
hashed char-n-gram Naive Bayes — precision floor on planted docs,
refit determinism, NULL/short-text fallback, and the full train+score
cross-engine pin against the GENERATED DuckDB twin (the SQL the r16
oracle will be built from)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from spark_ml_showcase_spark.ml import langid


def _planted(spark, n=400):
    ids = spark.range(n).select(F.col("id").alias("doc_id"))
    return ids.select(
        "doc_id",
        langid.plant_lang(F.col("doc_id")).alias("lang"),
        langid.planted_text(F.col("doc_id")).alias("text"),
    )


def _split(spark):
    # % 8, NOT parity: a % 2 split aliases with the % 4 language plant
    # and would train on only two of the four languages
    docs = _planted(spark)
    train = docs.filter(F.col("doc_id") % 8 < 4).select("lang", "text")
    test = docs.filter(F.col("doc_id") % 8 >= 4)
    return docs, train, test


def test_langid_precision_floor_on_planted(spark):
    """Per-language precision ≥ 0.95 on the held-out planted half (in
    practice 1.0 — the vocab trigram profiles are disjoint); every
    scored row keeps exactly one prediction."""
    _, train, test = _split(spark)
    ll, stats = langid.train_langid(train, label_col="lang")
    pred = langid.score_langid(ll, stats, test.select("doc_id", "text"))
    joined = pred.join(test.select("doc_id", "lang"), "doc_id")
    assert pred.count() == test.count()
    per = (
        joined.groupBy("lang_pred")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("lang_pred") == F.col("lang")).cast("int")).alias(
                "ok"
            ),
        )
        .collect()
    )
    assert {r.lang_pred for r in per} == {"de", "en", "es", "fr"}
    for r in per:
        assert r.ok / r.n >= 0.95, (r.lang_pred, r.ok, r.n)


def test_langid_refit_deterministic(spark):
    """No seed anywhere: two fits on the same frame must produce
    bit-identical models (quantized logs + exact counts)."""
    _, train, _ = _split(spark)
    ll1, st1 = langid.train_langid(train, label_col="lang")
    ll2, st2 = langid.train_langid(train, label_col="lang")
    k = lambda rows: sorted(tuple(r) for r in rows)
    assert k(ll1.collect()) == k(ll2.collect())
    assert k(st1.collect()) == k(st2.collect())


def test_langid_null_and_short_text_fall_back_to_prior(spark):
    """NULL / empty / shorter-than-n text: row preserved, n_grams = 0,
    score = prior only — on the balanced planted fixture the priors
    tie exactly (exact decimals), so the ASC label tie-break picks
    'de' deterministically."""
    _, train, _ = _split(spark)
    ll, stats = langid.train_langid(train, label_col="lang")
    odd = spark.createDataFrame(
        [(1, None), (2, ""), (3, "ab"), (4, " \t ")],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in langid.score_langid(ll, stats, odd).collect()}
    assert set(out) == {1, 2, 3, 4}
    for r in out.values():
        assert r.n_grams == 0
        assert r.lang_pred == "de"


def test_langid_matches_generated_duckdb_twin(spark):
    """The r16 oracle rehearsal: DuckDB rebuilds the SAME planted
    corpus from duckdb_planted_text_sql, trains and scores with the
    GENERATED duckdb_score_sql chain, and must agree with the Spark
    pipeline on every (doc_id, lang_pred, score, n_grams) — train and
    score replayed end-to-end, not just spot values."""
    docs, train, test = _split(spark)
    ll, stats = langid.train_langid(train, label_col="lang")
    got = {
        r.doc_id: (r.lang_pred, r.score, r.n_grams)
        for r in langid.score_langid(
            ll, stats, test.select("doc_id", "text")
        ).collect()
    }

    lang_sql, text_sql = langid.duckdb_planted_text_sql("doc_id")
    chain = langid.duckdb_score_sql("scoring", "labeled")
    sql = f"""
    WITH ids AS (SELECT unnest(generate_series(0, 399)) AS doc_id),
    docs0 AS (SELECT doc_id, {lang_sql} AS lang, {text_sql} AS text
              FROM ids),
    labeled AS (SELECT lang, text FROM docs0 WHERE doc_id % 8 < 4),
    scoring AS (SELECT doc_id, text FROM docs0 WHERE doc_id % 8 >= 4),
    {chain}
    SELECT doc_id, lang_pred, score, n_grams FROM langid_pred
    ORDER BY doc_id
    """
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in duckdb.connect().execute(sql).fetchall()
    }
    assert got == want
    # and the planted corpora themselves are identical cross-engine
    planted_want = duckdb.connect().execute(
        f"""WITH ids AS (SELECT unnest(generate_series(0, 399)) AS doc_id)
        SELECT doc_id, {lang_sql}, {text_sql} FROM ids ORDER BY doc_id"""
    ).fetchall()
    planted_got = [
        (r.doc_id, r.lang, r.text)
        for r in docs.orderBy("doc_id").collect()
    ]
    assert planted_got == [tuple(r) for r in planted_want]
