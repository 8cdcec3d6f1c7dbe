"""Regression/classification models of the claims flow (SURVEY.md §2.11
M9-M11) with the reference's exact hyperparameters, plus its derived
targets and regParam validation sweep.

Reference: Poisson GLM maxIter=50, family='poisson', link='log'
(``Claims_Prediction.py:110``); LinearRegression L1/L2 via
elasticNetParam 1/0 (``:112-114``); LogisticRegression L1/L2 (``:116-118``);
targets NZClaim / PP_ClaimNb / LogClaimNb derived at ``:35-38``;
regParam sweep [0.001, 0.01, 0.1, 1, 10] (``:131``).
"""

from __future__ import annotations

from pyspark.ml.classification import LogisticRegression
from pyspark.ml.regression import GeneralizedLinearRegression, LinearRegression
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

REG_PARAM_OPTIONS = [0.001, 0.01, 0.1, 1, 10]  # Claims_Prediction.py:131

NUMERIC_COLS = ["Exposure", "VehPower", "VehAge", "DrivAge", "BonusMalus", "Density"]
CATEGORICAL_COLS = ["Area", "VehBrand", "VehGas", "Region"]


def derive_targets(df: DataFrame) -> DataFrame:
    """The claims target derivations (Claims_Prediction.py:35-38):
    NZClaim = 1[ClaimNb>0]; PP_ClaimNb = ClaimNb with 0→0.5;
    LogClaimNb = ln(PP_ClaimNb); raw ClaimNb dropped."""
    return (
        df.withColumn(
            "NZClaim", F.when(F.col("ClaimNb") > 0, 1.0).otherwise(0.0)
        )
        .withColumn(
            "PP_ClaimNb",
            F.when(F.col("ClaimNb") == 0, 0.5).otherwise(F.col("ClaimNb")).cast("double"),
        )
        .withColumn("LogClaimNb", F.log(F.col("PP_ClaimNb")))
        .drop("ClaimNb")
    )


def model(model_type: str, reg_param: float = 0.001):
    """The reference's model factory (Claims_Prediction.py:108-118),
    verbatim hyperparameters."""
    if model_type == "glm_poisson":
        return GeneralizedLinearRegression(
            featuresCol="features", labelCol="PP_ClaimNb", maxIter=50,
            regParam=reg_param, family="poisson", link="log",
        )
    if model_type == "linear_l1":
        return LinearRegression(
            featuresCol="features", labelCol="LogClaimNb", maxIter=50,
            regParam=reg_param, elasticNetParam=1,
        )
    if model_type == "linear_l2":
        return LinearRegression(
            featuresCol="features", labelCol="LogClaimNb", maxIter=50,
            regParam=reg_param, elasticNetParam=0,
        )
    if model_type == "logistic_l1":
        return LogisticRegression(
            featuresCol="features", labelCol="NZClaim", maxIter=50,
            regParam=reg_param, elasticNetParam=1,
        )
    if model_type == "logistic_l2":
        return LogisticRegression(
            featuresCol="features", labelCol="NZClaim", maxIter=50,
            regParam=reg_param, elasticNetParam=0,
        )
    raise ValueError(f"unknown model_type {model_type!r}")


MODEL_LABELS = {
    "glm_poisson": ("PP_ClaimNb", "rmse"),
    "linear_l1": ("LogClaimNb", "rmse"),
    "linear_l2": ("LogClaimNb", "rmse"),
    "logistic_l1": ("NZClaim", "accuracy"),
    "logistic_l2": ("NZClaim", "accuracy"),
}
