"""Scalar/array/vector function surface (SURVEY.md §2.3 + extensions)."""

from spark_ml_showcase_spark.functions import (  # noqa: F401
    similarity,
    strings,
    text,
    vectors,
)
