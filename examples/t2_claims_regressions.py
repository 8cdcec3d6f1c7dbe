"""Reference task T2 — insurance-claims prediction
(`Insurance Claim Predictions/Claims_Prediction.py:24-151`), on the
engine: derived targets, single-pass stratified split (the reference's
O(strata) loop collapsed), the indexer→OHE→scaler→assembler pipeline,
all five regression models, and the Poisson regParam validation curve.
freMTPL2freq is private — the FIXTURES.md §A synthetic stand-in feeds
the identical flow.

Run: python examples/t2_claims_regressions.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_ml_showcase_spark.ml import evaluate, features, fixtures, regressions
from spark_ml_showcase_spark.operators import splits
from spark_ml_showcase_spark.session import session_builder


def main() -> None:
    spark = session_builder("t2-claims").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    data = regressions.derive_targets(fixtures.claims(spark, n=3000))
    train, test = splits.stratified_split(
        data, "PP_ClaimNb", regressions.NUMERIC_COLS, 0.7, seed=14
    )
    train, test = train.cache(), test.cache()
    stages = features.indexed_ohe_scaled_stages(
        regressions.CATEGORICAL_COLS, regressions.NUMERIC_COLS
    )

    # all five reference models (Claims_Prediction.py:80-118)
    for mtype, (label, metric) in regressions.MODEL_LABELS.items():
        fitted = features.pipeline(stages, regressions.model(mtype, 0.001)).fit(train)
        if metric == "rmse":
            score = evaluate.regression_metrics(
                fitted.transform(test), label_col=label, metrics=("rmse",)
            )["rmse"]
        else:
            score = evaluate.accuracy(fitted.transform(test), label_col=label)
        print(f"{mtype:22s} test {metric}: {score:.4f}")

    # Poisson regParam validation curve (Claims_Prediction.py:131-151)
    for reg in regressions.REG_PARAM_OPTIONS:
        fitted = features.pipeline(
            stages, regressions.model("glm_poisson", reg)
        ).fit(train)
        rmse = evaluate.regression_metrics(
            fitted.transform(test), label_col="PP_ClaimNb", metrics=("rmse",)
        )["rmse"]
        print(f"glm_poisson regParam={reg:<8} test rmse: {rmse:.4f}")


if __name__ == "__main__":
    main()
