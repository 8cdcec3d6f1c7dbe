"""Ensemble classifiers + cross-validated grid search (SURVEY.md §2.11
M6-M8), with the reference's EXACT grids and seeds exposed alongside
reduced grids for bounded-runtime smoke queries.

Reference: RF grid numTrees {20,25,30} × featureSubsetStrategy
{log2,auto,all} × subsamplingRate {0.5,0.75,1.0}
(``higgs_ensemble_analysis.py:79-83``); GBT grid maxIter {8,11,14} ×
maxDepth {5,6,7} × subsamplingRate {0.6,0.8,1.0}
(``higgs_ensemble_analysis.py:119-123``); CrossValidator numFolds=3,
seed=40, MulticlassClassificationEvaluator (default f1)
(``higgs_ensemble_analysis.py:77-87,125-129``).

Scale note: ``CrossValidator.fit`` is a driver-coordinated loop of
|grid|×numFolds JVM fits; each tree fit is level-wise histogram
aggregation over the cached training set. ``parallelism`` lets
independent grid points fit concurrently — set it to ~the executor
count on a real cluster (the reference leaves it at 1).
"""

from __future__ import annotations

from pyspark.ml import Pipeline
from pyspark.ml.classification import GBTClassifier, RandomForestClassifier
from pyspark.ml.evaluation import MulticlassClassificationEvaluator
from pyspark.ml.tuning import CrossValidator, ParamGridBuilder

SEED = 40


def rf(label_col: str = "label", features_col: str = "features", **params):
    """M6: RandomForestClassifier (higgs_ensemble_analysis.py:74)."""
    return RandomForestClassifier(
        labelCol=label_col, featuresCol=features_col, seed=SEED, **params
    )


def gbt(label_col: str = "label", features_col: str = "features", **params):
    """M7: GBTClassifier (higgs_ensemble_analysis.py:117)."""
    return GBTClassifier(
        labelCol=label_col, featuresCol=features_col, seed=SEED, **params
    )


def reference_rf_grid(model: RandomForestClassifier):
    """The reference's 27-point RF grid (higgs_ensemble_analysis.py:79-83)."""
    return (
        ParamGridBuilder()
        .addGrid(model.numTrees, [20, 25, 30])
        .addGrid(model.featureSubsetStrategy, ["log2", "auto", "all"])
        .addGrid(model.subsamplingRate, [0.5, 0.75, 1.0])
        .build()
    )


def reference_gbt_grid(model: GBTClassifier):
    """The reference's 27-point GBT grid (higgs_ensemble_analysis.py:119-123)."""
    return (
        ParamGridBuilder()
        .addGrid(model.maxIter, [8, 11, 14])
        .addGrid(model.maxDepth, [5, 6, 7])
        .addGrid(model.subsamplingRate, [0.6, 0.8, 1.0])
        .build()
    )


def small_rf_grid(model: RandomForestClassifier):
    """4-point grid for bounded-runtime smoke queries (same axes as the
    reference grid, fewer values)."""
    return (
        ParamGridBuilder()
        .addGrid(model.numTrees, [5, 10])
        .addGrid(model.subsamplingRate, [0.5, 1.0])
        .build()
    )


def retrain_with_best(cv_model, estimator_cls, train_df, *, label_col="label",
                      features_col="features"):
    """The reference's full-data retrain tail
    (higgs_ensemble_analysis.py:152-171): extract the CV winner's params
    and refit a fresh estimator on a (larger) training set. Returns the
    fitted model."""
    from pyspark.ml.classification import RandomForestClassificationModel

    best = cv_model.bestModel.stages[-1]
    # isinstance, NOT hasattr(getNumTrees): GBTClassificationModel inherits
    # _TreeEnsembleModel's getNumTrees too, which would route GBT winners
    # down the RF branch and crash on GBTClassifier(numTrees=...).
    if isinstance(best, RandomForestClassificationModel):
        params = dict(
            numTrees=best.getNumTrees,
            featureSubsetStrategy=best.getFeatureSubsetStrategy(),
            subsamplingRate=best.getSubsamplingRate(),
        )
    else:
        params = dict(
            maxIter=best.getMaxIter(),
            maxDepth=best.getMaxDepth(),
            subsamplingRate=best.getSubsamplingRate(),
        )
    model = estimator_cls(
        labelCol=label_col, featuresCol=features_col, seed=SEED, **params
    )
    return model.fit(train_df)


def cross_validate(
    estimator: Pipeline,
    grid,
    *,
    num_folds: int = 3,
    seed: int = SEED,
    parallelism: int = 1,
) -> CrossValidator:
    """M8: CrossValidator with the reference's defaults
    (higgs_ensemble_analysis.py:77-87: numFolds=3, seed=40,
    MulticlassClassificationEvaluator default f1)."""
    return CrossValidator(
        estimator=estimator,
        estimatorParamMaps=grid,
        evaluator=MulticlassClassificationEvaluator(),
        numFolds=num_folds,
        seed=seed,
        parallelism=parallelism,
    )
