"""Feature pipeline builders (SURVEY.md §2.11 M1-M5).

Re-expresses the reference's two feature flows:

- plain assembler over all-numeric columns
  (``higgs_ensemble_analysis.py:73``);
- the claims 5-stage flow StringIndexer → OneHotEncoder → numeric
  VectorAssembler → StandardScaler → final assembler
  (``Claims_Prediction.py:80-88``), returned as Pipeline *stages* so
  callers append an estimator and fit ONCE (each indexer/scaler fit is
  itself an aggregation job over the data — composing them into one
  Pipeline lets Spark share the cached input across stage fits).
"""

from __future__ import annotations

from pyspark.ml import Pipeline
from pyspark.ml.feature import (
    OneHotEncoder,
    StandardScaler,
    StringIndexer,
    VectorAssembler,
)


def assembler(input_cols: list[str], output_col: str = "features") -> VectorAssembler:
    """M1: VectorAssembler (higgs_ensemble_analysis.py:73)."""
    return VectorAssembler(inputCols=list(input_cols), outputCol=output_col)


def indexed_ohe_scaled_stages(
    categorical_cols: list[str],
    numeric_cols: list[str],
    *,
    output_col: str = "features",
) -> list:
    """M2+M3+M1+M4+M1: the claims feature stages
    (Claims_Prediction.py:80-88), multi-column indexer/OHE form.

    Returns the 5 stages [StringIndexer, OneHotEncoder, VectorAssembler,
    StandardScaler, VectorAssembler] for Pipeline composition.
    """
    idx_cols = [f"{c}_idx" for c in categorical_cols]
    ohe_cols = [f"{c}_ohe" for c in categorical_cols]
    return [
        StringIndexer(inputCols=list(categorical_cols), outputCols=idx_cols),
        OneHotEncoder(inputCols=idx_cols, outputCols=ohe_cols),
        VectorAssembler(inputCols=list(numeric_cols), outputCol="Num_Features"),
        StandardScaler(inputCol="Num_Features", outputCol="Scld_Num_Features"),
        VectorAssembler(
            inputCols=["Scld_Num_Features"] + ohe_cols, outputCol=output_col
        ),
    ]


def pipeline(stages: list, estimator=None) -> Pipeline:
    """M5: Pipeline chaining feature stages + optional estimator
    (higgs_ensemble_analysis.py:75, Claims_Prediction.py:92-94)."""
    all_stages = list(stages) + ([estimator] if estimator is not None else [])
    return Pipeline(stages=all_stages)
