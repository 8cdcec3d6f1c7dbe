"""Model-based corpus quality filtering (weak supervision → classifier).

The heuristic quality gates (``functions.text.quality_score``, the
Gopher flags) are the first pass of a real pipeline; the second is a
LEARNED filter — CCNet's fasttext LM-vs-crawl classifier, LLaMA's
"references-Wikipedia" classifier — that generalizes beyond hand rules.
This module reproduces that shape on MLlib, keeping everything inside
the engine:

1. **Weak labels from the heuristic**: docs in the top tercile of
   ``quality_score`` are positives, bottom tercile negatives, the
   ambiguous middle is DROPPED from training (standard weak-supervision
   hygiene — don't train on labels you don't trust).
2. **Features**: the numeric text statistics (token count, mean word
   length, punctuation/stopword ratios — JVM expressions) plus a hashed
   lexical bag (RegexTokenizer → HashingTF → IDF), assembled into one
   vector.
3. **Seeded LogisticRegression** fit on the confident extremes, then
   scored over the FULL corpus — the filter's output is a calibrated
   ``quality_prob``, thresholded by the caller per use-case (pretrain
   vs fine-tune corpora want different purity).

Scale posture: labeling and featurization are narrow column work; the
LR fit is MLlib's distributed L-BFGS over the (subsampled) training
extremes; scoring is one model broadcast + a map — no shuffle beyond
the fit itself. At 100 TB you fit on a sample (set ``train_fraction``)
and score everything, exactly like the published pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_ml_showcase_spark.functions import text as TX

_NUMERIC_FEATS = ["n_tok", "mean_wlen", "punct_r", "stop_r"]


def _with_text_stats(docs: DataFrame, text_col: str) -> DataFrame:
    toks = TX.whitespace_token_count(text_col).cast("double")
    chars = F.length(F.col(text_col)).cast("double")
    return (
        docs.withColumn("n_tok", toks)
        .withColumn(
            "mean_wlen",
            F.when(toks > 0, chars / toks).otherwise(F.lit(0.0)),
        )
        .withColumn("punct_r", TX.punct_ratio(text_col))
        .withColumn("stop_r", TX.stopword_ratio(text_col))
    )


def train_quality_filter(
    docs: DataFrame,
    *,
    text_col: str = "text",
    seed: int = 40,
    train_fraction: float | None = None,
):
    """Fit the weak-supervision quality classifier; returns a
    PipelineModel whose ``transform`` adds ``probability``/``prediction``
    (use :func:`score_quality` for the tidy (doc_id, quality_prob)
    surface). ``train_fraction`` subsamples the labeled extremes before
    the fit — the 100 TB path."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import (
        IDF,
        HashingTF,
        RegexTokenizer,
        VectorAssembler,
    )

    stats = _with_text_stats(docs, text_col).withColumn(
        "_q", TX.quality_score(text_col)
    )
    lo, hi = stats.approxQuantile("_q", [1 / 3, 2 / 3], 0.001)
    labeled = stats.filter((F.col("_q") <= lo) | (F.col("_q") >= hi)).withColumn(
        "label", (F.col("_q") >= hi).cast("double")
    )
    if train_fraction is not None:
        labeled = labeled.sample(fraction=train_fraction, seed=seed)

    pipe = Pipeline(
        stages=[
            RegexTokenizer(inputCol=text_col, outputCol="_tok", pattern=r"\s+"),
            HashingTF(inputCol="_tok", outputCol="_tf", numFeatures=128),
            IDF(inputCol="_tf", outputCol="_tfidf"),
            VectorAssembler(
                inputCols=[*_NUMERIC_FEATS, "_tfidf"], outputCol="features"
            ),
            LogisticRegression(
                maxIter=25, regParam=0.01, standardization=True
            ),
        ]
    )
    return pipe.fit(labeled)


def score_quality(
    model,
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score the FULL corpus with a trained filter: (id_col,
    quality_prob) where quality_prob is P(high-quality)."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(_with_text_stats(docs, text_col))
    return scored.select(
        F.col(id_col),
        F.round(vector_to_array("probability")[1], 6).alias("quality_prob"),
    )
