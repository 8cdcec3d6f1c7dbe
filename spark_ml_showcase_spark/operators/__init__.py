"""Relational/dataflow operators (SURVEY.md §2).

Every operator the reference exercises, re-expressed as composable
DataFrame transforms, plus the engine surface the reference lacks
(outer/semi/anti joins, window functions, rollup/cube, native pivot,
event-time windows).
"""

from spark_ml_showcase_spark.operators import (  # noqa: F401
    aggregates,
    dedup,
    joins,
    multimodal,
    relational,
    setops,
    splits,
    topk,
    windows,
)
