"""Gopher-style repetition/quality filtering for LLM training corpora
(SURVEY.md §2.12 extension family): per-document repetition metrics
(top-unigram / top-bigram mass fraction) plus mean-word-length bounds,
composed into a boolean keep flag.

Not in the reference; these are the repetition rules of Rae et al. 2021
(Gopher, §A.1.1: "fraction of characters in the most common n-gram") and
the C4 length heuristics, adapted to whitespace tokens.

Scale posture: ONE pass — unigrams and bigrams are tagged ("u…"/"b…"),
concatenated, and exploded together, so the corpus text is scanned once
and the plan is exactly two hash aggregations: (doc, gram) counts, then
per-doc conditional max/sum rollups. n_tokens and mean word length fall
out of the same unigram counts (Σc, Σ len·c), so there is no separate
base scan and NO join anywhere. Both aggregations get map-side partial
combine (a doc's grams are colocated in its input split), and only
counts — never text — cross the exchange. The alternative pure-column
formulation (``array_max(transform(distinct, g -> size(filter(...))))``)
would be O(len²) per row and re-inline nested HOF lambdas — rejected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_ml_showcase_spark.functions import text as TX


def repetition_metrics(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    max_unigram_frac: float = 0.20,
    max_bigram_frac: float = 0.18,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
) -> DataFrame:
    """One row per document: ``(id_col, n_tokens, mean_word_len,
    top_unigram_frac, top_bigram_frac, keep)``.

    - ``top_unigram_frac`` / ``top_bigram_frac``: mass fraction of the
      most frequent (lowercased) unigram / bigram — high values mean
      degenerate repetition (boilerplate, keyword stuffing).
    - ``mean_word_len``: mean token length in characters.
    - ``keep``: True iff every metric is inside its threshold. Documents
      with zero tokens produce no grams and are dropped; documents of
      exactly one token have no bigrams and get ``top_bigram_frac = 0``.

    Fractions are rounded to 6 decimals (cross-engine float hashing).
    """
    tag = lambda t, arr: F.transform(arr, lambda g: F.concat(F.lit(t), g))  # noqa: E731
    grams = F.concat(
        tag("u", TX.ngram_list(text_col, 1)), tag("b", TX.ngram_list(text_col, 2))
    )
    counts = (
        df.select(F.col(id_col), F.explode(grams).alias("_g"))
        .groupBy(id_col, "_g")
        .agg(F.count("*").alias("_c"))
    )
    is_uni = F.col("_g").startswith("u")
    c = F.col("_c")
    per_doc = counts.groupBy(id_col).agg(
        F.sum(F.when(is_uni, c)).alias("_nu"),
        F.max(F.when(is_uni, c)).alias("_mu"),
        # token chars = tagged length - 1 (the "u" prefix)
        F.sum(F.when(is_uni, (F.length("_g") - 1) * c)).alias("_chars"),
        F.sum(F.when(~is_uni, c)).alias("_nb"),
        F.max(F.when(~is_uni, c)).alias("_mb"),
    )
    mean_len = F.round(F.col("_chars").cast("double") / F.col("_nu"), 6)
    top_uni = F.round(F.col("_mu").cast("double") / F.col("_nu"), 6)
    top_bi = F.coalesce(
        F.round(F.col("_mb").cast("double") / F.col("_nb"), 6), F.lit(0.0)
    )
    return per_doc.select(
        id_col,
        F.col("_nu").cast("bigint").alias("n_tokens"),
        mean_len.alias("mean_word_len"),
        top_uni.alias("top_unigram_frac"),
        top_bi.alias("top_bigram_frac"),
        (
            (top_uni <= max_unigram_frac)
            & (top_bi <= max_bigram_frac)
            & (mean_len >= min_mean_word_len)
            & (mean_len <= max_mean_word_len)
        ).alias("keep"),
    )
