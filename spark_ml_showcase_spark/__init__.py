"""spark_ml_showcase_spark — a PySpark-native analytics engine.

Re-expresses every query/data-processing capability of the reference
(Vyshnav12/Spark-ML-Showcase, four standalone PySpark application scripts:
Higgs ensemble classification, insurance-claims regression, ALS collaborative
filtering + KMeans cluster profiling, NASA web-log mining) as a reusable,
tested, scale-aware engine API, plus large-scale training-data-pipeline
extensions (dedup, similarity search, text analysis, multimodal columns).

Design principles (see SURVEY.md):
- DataFrame/SQL first; Catalyst plans everything. No hand-scheduling.
- Built-in ``pyspark.sql.functions`` in the hot path; Pandas UDFs only where
  built-ins genuinely can't express the semantics (vector math fallback,
  multimodal decode).
- Broadcast small dimensions, pre-aggregate before joins, AQE on, top-k via
  ``TakeOrderedAndProject`` — every operator is written for a 1000-executor
  cluster even though tests run on local mode.
"""

from spark_ml_showcase_spark.session import get_session, session_builder

__all__ = ["get_session", "session_builder"]
