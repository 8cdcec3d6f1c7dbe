"""Corpus bigram language-model perplexity scoring (SURVEY.md §2.12
extension family, X11): train add-k-smoothed bigram statistics over a
corpus, then score every document by its average negative log-likelihood
in bits per transition — the classic KenLM-style fluency signal used by
CCNet (Wenzek et al. 2020) to rank web text, here self-trained so the
signal flags documents that are UNLIKE the corpus (gibberish, degenerate
repetition, wrong-register text).

Not in the reference. Model: P(w2 | w1) = (c(w1 w2) + k) / (c(w1) + k·V)
with V = corpus distinct-unigram count; doc score = −Σ ln P / (n·ln 2).

Scale posture: everything is counts + equi-joins on xxhash64 longs.
Training is two hash aggregations (bigram counts keyed by
xxhash64(w1, w2), unigram counts keyed by xxhash64(w1)) plus one join to
attach c(w1) to each distinct bigram — all keys fixed-width, no text
crosses an exchange after the initial tokenize projection. V is a
1-row broadcast. Scoring joins bigram INSTANCES (doc, key) to the model
(distinct bigrams — vastly smaller than instances) and sums per doc: one
shuffle on the model key, one on doc id, both map-side combined.
Collision caveat as in ``decontaminate.py``: two distinct bigrams
colliding at 64 bits (P ≈ B²/2⁶⁴ corpus-wide) merges their counts,
perturbing one logp — far below the 6-decimal output rounding.

Float determinism across engines: each ln() term differs between libm
implementations only in the last ulp; a doc sums ~10²–10⁴ such terms, so
the absolute error is ≤ ~1e-12 against a 6-decimal rounding — the same
argument the codebase's other transcendental outputs rely on.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_LN2 = math.log(2.0)


def _bigram_array_udf():
    """Arrow-batched text → bigram-string array ("w1 w2", multiplicity
    KEPT — the LM needs frequencies). Same measured rationale as
    ``text.shingle_array_udf``: the zip_with/slice HOF form runs in the
    interpreted lambda evaluator. Tokenization is ``text.py_tokens``
    (the engine's ASCII-\\s+ contract)."""
    from spark_ml_showcase_spark.functions.text import py_tokens

    def fn(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = py_tokens(t)
            out.append(
                [toks[i] + " " + toks[i + 1] for i in range(len(toks) - 1)]
            )
        return pd.Series(out)

    return F.pandas_udf(fn, "array<string>")


def _bigram_instances(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, bh, w1h): one row per bigram OCCURRENCE, hashed to longs
    inside the scan stage. ``bh`` keys the bigram string ("w1 w2" —
    tokens never contain spaces, so the encoding is injective); ``w1h``
    hashes the first token, matching the unigram-count key domain."""
    return df.select(
        F.col(id_col), F.explode(_bigram_array_udf()(F.col(text_col))).alias("_g")
    ).select(
        id_col,
        F.xxhash64("_g").alias("bh"),
        F.xxhash64(F.substring_index("_g", " ", 1)).alias("w1h"),
    )


def bigram_lm(
    train: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k: float = 0.5,
) -> tuple[DataFrame, DataFrame]:
    """Fit the smoothed bigram model. Returns ``(model, vocab_size)``:
    ``model`` = (bh, w1h, logp) for every distinct training bigram,
    ``vocab_size`` = 1-row (v bigint) for the unseen-bigram fallback
    (log(k / (c(w1) + k·V)), and log(k / (k·V)) for unseen w1)."""
    inst = _bigram_instances(train, id_col, text_col)
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
    uni = (
        train.select(F.explode(toks).alias("_w"))
        .select(F.xxhash64("_w").alias("w1h"))
        .groupBy("w1h")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    vocab = uni.agg(F.count(F.lit(1)).alias("v"))
    v = F.col("v")
    bc = inst.groupBy("bh").agg(
        F.count(F.lit(1)).alias("c2"), F.max("w1h").alias("w1h")
    )
    model = (
        bc.join(uni, "w1h")
        .crossJoin(F.broadcast(vocab))
        .select(
            "bh",
            "w1h",
            F.log(
                (F.col("c2") + F.lit(k)) / (F.col("c1") + F.lit(k) * v)
            ).alias("logp"),
        )
    )
    return model, vocab


def bigram_lm_scores(
    train: DataFrame,
    score: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k: float = 0.5,
) -> DataFrame:
    """Score ``score`` (default: the training corpus itself) against the
    ``train`` bigram LM: ``(id_col, n_bigrams, avg_nll_bits)`` per
    document with ≥ 1 bigram; ``avg_nll_bits`` = −Σ ln P / (n·ln2),
    rounded to 6 decimals. Unseen bigrams fall back to the smoothed
    floor through a left join + per-w1 unigram counts; when scoring the
    training corpus every bigram is in the model and the fallback path
    is never taken."""
    model, vocab = bigram_lm(train, id_col, text_col, k=k)
    if score is None:
        # scoring the training corpus: every bigram is in the model, so
        # the unseen fallback is provably dead — inner join, two fewer
        # joins in the plan
        inst = _bigram_instances(train, id_col, text_col)
        scored = inst.join(model.select("bh", "logp"), "bh").select(
            id_col, F.col("logp").alias("_lp")
        )
    else:
        inst = _bigram_instances(score, id_col, text_col)
        toks = F.filter(
            F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
        )
        uni = (
            train.select(F.explode(toks).alias("_w"))
            .select(F.xxhash64("_w").alias("w1h"))
            .groupBy("w1h")
            .agg(F.count(F.lit(1)).alias("c1"))
        )
        scored = (
            inst.join(model.select("bh", "logp"), "bh", "left")
            .join(uni.withColumnRenamed("c1", "_c1w"), "w1h", "left")
            .crossJoin(F.broadcast(vocab))
            .select(
                id_col,
                F.coalesce(
                    "logp",
                    F.log(
                        F.lit(k)
                        / (F.coalesce("_c1w", F.lit(0)) + F.lit(k) * F.col("v"))
                    ),
                ).alias("_lp"),
            )
        )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round((-F.sum("_lp")) / (F.count(F.lit(1)) * F.lit(_LN2)), 6).alias(
            "avg_nll_bits"
        ),
    )
