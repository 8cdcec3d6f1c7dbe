"""Opt-in reference-exact ML runs (set SPARK_ML_SHOWCASE_SLOW=1).

The registered `ml_*` queries use reduced grids for bounded smoke
runtime; this proves the reference-parity configuration path — the EXACT
27-point RF grid × 3-fold CV of higgs_ensemble_analysis.py:79-87 —
executes end-to-end, not just exists.
"""

from __future__ import annotations

import os

import pytest

slow = pytest.mark.skipif(
    os.environ.get("SPARK_ML_SHOWCASE_SLOW") != "1",
    reason="reference-exact grid is minutes-long; set SPARK_ML_SHOWCASE_SLOW=1",
)


@slow
def test_reference_exact_gbt_grid_cv(spark):
    from pyspark.ml.classification import GBTClassifier

    from spark_ml_showcase_spark.ml import ensembles, features, fixtures

    data = fixtures.higgs(spark, n=1000)
    model = ensembles.gbt()
    pipe = features.pipeline([features.assembler(fixtures.HIGGS_FEATURES)], model)
    grid = ensembles.reference_gbt_grid(model)
    assert len(grid) == 27  # 3 maxIter × 3 maxDepth × 3 subsampling
    cv = ensembles.cross_validate(pipe, grid, num_folds=3, parallelism=8)
    fitted = cv.fit(data)
    assert len(fitted.avgMetrics) == 27
    best = fitted.bestModel.stages[-1]
    assert best.getMaxIter() in (8, 11, 14) and best.getMaxDepth() in (5, 6, 7)
    assembled = features.assembler(fixtures.HIGGS_FEATURES).transform(data)
    full = ensembles.retrain_with_best(fitted, GBTClassifier, assembled)
    assert full.getMaxIter() == best.getMaxIter()


@slow
def test_reference_exact_rf_grid_cv(spark):
    from pyspark.ml.classification import RandomForestClassifier

    from spark_ml_showcase_spark.ml import ensembles, features, fixtures

    data = fixtures.higgs(spark, n=2000)
    model = ensembles.rf()
    pipe = features.pipeline([features.assembler(fixtures.HIGGS_FEATURES)], model)
    grid = ensembles.reference_rf_grid(model)
    assert len(grid) == 27  # 3 numTrees × 3 featureSubsetStrategy × 3 subsampling
    cv = ensembles.cross_validate(pipe, grid, num_folds=3, parallelism=8)
    fitted = cv.fit(data)
    assert len(fitted.avgMetrics) == 27
    best = fitted.bestModel.stages[-1]
    assert best.getNumTrees in (20, 25, 30)
    assert best.getFeatureSubsetStrategy() in ("log2", "auto", "all")
    assembled = features.assembler(fixtures.HIGGS_FEATURES).transform(data)
    full = ensembles.retrain_with_best(fitted, RandomForestClassifier, assembled)
    assert full.getNumTrees == best.getNumTrees
