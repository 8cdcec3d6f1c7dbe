"""Boilerplate span detection + bigram-LM scoring properties
(SURVEY.md §2.12 X10/X11): cross-doc span flagging thresholds, per-doc
fractions, and exact hand-computed LM scores on a tiny corpus."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from spark_ml_showcase_spark.operators import boilerplate, lm_score

SHARED = "the quick brown fox jumps over the lazy dog today"  # 10 tokens


def _docs(spark):
    base = [
        (0, SHARED + " alpha beta gamma"),
        (1, SHARED + " delta epsilon zeta"),
        (2, SHARED + " eta theta iota"),
        (3, "one two three four five six seven eight nine ten"),
        (4, "tiny doc"),  # < n tokens: no spans to judge
    ]
    return spark.createDataFrame(base, "doc_id bigint, text string")


def test_boilerplate_flags_shared_spans_only(spark):
    out = boilerplate.boilerplate_fraction(_docs(spark), n=6, min_docs=3)
    rows = {r.doc_id: r for r in out.collect()}
    # docs 0-2 share the 10-token paragraph → its five 6-grams occur in
    # 3 docs; the tail-crossing spans are unique per doc
    assert set(rows) == {0, 1, 2, 3}  # doc 4 has no 6-gram spans
    for d in (0, 1, 2):
        assert rows[d].n_spans == 8  # 13 tokens → 8 distinct 6-grams
        assert rows[d].n_boiler_spans == 5
        assert rows[d].boiler_frac == pytest.approx(5 / 8, abs=1e-6)
    assert rows[3].n_boiler_spans == 0 and rows[3].boiler_frac == 0.0


def test_boilerplate_min_docs_threshold(spark):
    # min_docs=4: the paragraph occurs in only 3 docs → nothing flagged
    out = boilerplate.boilerplate_fraction(_docs(spark), n=6, min_docs=4)
    assert out.agg(F.sum("n_boiler_spans")).first()[0] == 0


def test_boilerplate_set_counts_distinct_docs_not_occurrences(spark):
    # a doc REPEATING a span internally must count once: shingles are
    # distinct per doc, so a 2-doc threshold needs 2 distinct docs
    docs = spark.createDataFrame(
        [
            (0, "a b c d e f a b c d e f"),  # span repeats inside ONE doc
            (1, "z y x w v u t s r q p o"),
        ],
        "doc_id bigint, text string",
    )
    assert (
        boilerplate.boilerplate_ngrams(docs, n=6, min_docs=2).count() == 0
    )


def _expected_lm_bits(texts: dict[int, str], k: float = 0.5):
    toks = {d: t.lower().split() for d, t in texts.items()}
    uc = Counter(w for ws in toks.values() for w in ws)
    bc = Counter(
        (ws[i], ws[i + 1]) for ws in toks.values() for i in range(len(ws) - 1)
    )
    v = len(uc)
    out = {}
    for d, ws in toks.items():
        bis = [(ws[i], ws[i + 1]) for i in range(len(ws) - 1)]
        if not bis:
            continue
        s = sum(math.log((bc[b] + k) / (uc[b[0]] + k * v)) for b in bis)
        out[d] = (len(bis), round(-s / (len(bis) * math.log(2)), 6))
    return out


def test_bigram_lm_scores_match_hand_computation(spark):
    texts = {
        0: "a b a b a b",
        1: "a b c d e f",
        2: "x x x x x x",
        3: "solo",  # no bigrams → no row
    }
    df = spark.createDataFrame(
        list(texts.items()), "doc_id bigint, text string"
    )
    got = {
        r.doc_id: (r.n_bigrams, r.avg_nll_bits)
        for r in lm_score.bigram_lm_scores(df).collect()
    }
    assert got == _expected_lm_bits(texts)


def test_bigram_lm_repetitive_doc_scores_lower_than_rare(spark):
    # a doc made of the corpus's dominant bigram is MORE likely (fewer
    # bits) than one of corpus-rare transitions
    rows = [(i, "common pair common pair common pair") for i in range(8)]
    rows += [(100, "rare1 rare2 rare3 rare4 rare5 rare6")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: r.avg_nll_bits for r in lm_score.bigram_lm_scores(df).collect()}
    assert got[0] < got[100]


def test_bigram_lm_scoring_other_corpus_uses_fallback(spark):
    train = spark.createDataFrame(
        [(0, "a b a b a b c")], "doc_id bigint, text string"
    )
    score = spark.createDataFrame(
        [(10, "a b unseen1 unseen2")], "doc_id bigint, text string"
    )
    out = lm_score.bigram_lm_scores(train, score).collect()
    assert len(out) == 1 and out[0].n_bigrams == 3
    # unseen transitions must yield a finite, positive bit cost
    assert out[0].avg_nll_bits > 0 and math.isfinite(out[0].avg_nll_bits)
