"""Reference task T1 — Higgs ensemble classification
(`Higgs Ensemble Analysis/higgs_ensemble_analysis.py:62-146`), on the
engine. HIGGS.csv is private, so the FIXTURES.md §A synthetic stand-in
feeds the identical pipeline; pass a real 29-column CSV path to run on
actual data.

Run: python examples/t1_higgs_ensembles.py [higgs.csv]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_ml_showcase_spark.ml import ensembles, evaluate, features, fixtures
from spark_ml_showcase_spark.operators import splits
from spark_ml_showcase_spark.session import session_builder


def main() -> None:
    spark = session_builder("t1-higgs").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if len(sys.argv) > 1:
        from pyspark.sql import functions as F

        from spark_ml_showcase_spark.sources import io

        # the reference's schema-less read + cast loop
        # (higgs_ensemble_analysis.py:62-66)
        raw = io.read_csv(spark, sys.argv[1], header=False)
        cols = raw.columns
        data = raw.select(
            F.col(cols[0]).cast("double").alias("label"),
            *[
                F.col(c).cast("double").alias(f"f{i}")
                for i, c in enumerate(cols[1:], start=1)
            ],
        )
    else:
        data = fixtures.higgs(spark, n=2000)

    train, test = splits.random_split(data, [0.7, 0.3], seed=40)
    train = train.cache()

    # RF under a 3-fold CV grid (reference lines 73-90; swap in
    # ensembles.reference_rf_grid for the full 27-point grid)
    rf = ensembles.rf()
    rf_pipe = features.pipeline([features.assembler(fixtures.HIGGS_FEATURES)], rf)
    cv = ensembles.cross_validate(
        rf_pipe, ensembles.small_rf_grid(rf), num_folds=3, parallelism=8
    )
    fitted = cv.fit(train)
    pred = fitted.transform(test).select("prediction", "label")
    print("RF  accuracy:", round(evaluate.accuracy(pred), 4),
          "auc:", round(evaluate.binary_auc(pred), 4))

    # GBT (reference lines 117-146)
    gbt = ensembles.gbt(maxIter=8, maxDepth=5, subsamplingRate=0.8)
    gbt_pipe = features.pipeline([features.assembler(fixtures.HIGGS_FEATURES)], gbt)
    gpred = gbt_pipe.fit(train).transform(test).select("prediction", "label")
    print("GBT accuracy:", round(evaluate.accuracy(gpred), 4),
          "auc:", round(evaluate.binary_auc(gpred), 4))

    # DataFrame-native confusion matrix + P/R/F1 (replaces the RDD
    # MulticlassMetrics detour, reference lines 23-40)
    evaluate.confusion_matrix(fitted.transform(test)).show()
    evaluate.precision_recall_f1(pred).show()


if __name__ == "__main__":
    main()
