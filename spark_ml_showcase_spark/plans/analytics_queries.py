"""Event-sequence analytics queries: funnel conversion + cohort
retention (``operators/analytics.py``), both DuckDB-oracle-checked.

The reference stops at per-type event aggregation
(``Log Analysis/log_mining_analysis.py``); these close the two standard
product-analytics shapes over the same events table. Determinism rules
from ``plans/__init__``: derived ints are BIGINT both sides, ratios are
ROUND(x, 6) DOUBLE both sides, dates travel as ISO strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from spark_ml_showcase_spark.operators import analytics
from spark_ml_showcase_spark.plans import query
from spark_ml_showcase_spark.sources.catalog import Catalog

FUNNEL_STEPS = ["view", "click", "purchase"]


# Strict-order funnel view→click→purchase. The oracle replays the same
# greedy chaining as three grouped conditional mins (u1→u2→u3); greedy
# is exact for an unwindowed ordered funnel (earliest completion of step
# k maximizes the candidate set for step k+1), so both engines compute
# the identical per-user reach times and counts.
@query(
    "funnel_view_click_purchase",
    oracle="""
    WITH u1 AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'view' THEN ts END) AS s1
        FROM events GROUP BY user_id
    ),
    u2 AS (
        SELECT e.user_id, u1.s1,
               min(CASE WHEN e.event_type = 'click' AND e.ts > u1.s1
                        THEN e.ts END) AS s2
        FROM events e JOIN u1 ON e.user_id = u1.user_id
        GROUP BY e.user_id, u1.s1
    ),
    u3 AS (
        SELECT e.user_id, u2.s1, u2.s2,
               min(CASE WHEN e.event_type = 'purchase' AND e.ts > u2.s2
                        THEN e.ts END) AS s3
        FROM events e JOIN u2 ON e.user_id = u2.user_id
        GROUP BY e.user_id, u2.s1, u2.s2
    ),
    c AS (SELECT CAST(count(s1) AS BIGINT) AS c1,
                 CAST(count(s2) AS BIGINT) AS c2,
                 CAST(count(s3) AS BIGINT) AS c3
          FROM u3)
    SELECT CAST(1 AS BIGINT) AS step_idx, 'view' AS step, c1 AS users,
           ROUND(c1 / NULLIF(c1, 0), 6) AS conversion FROM c
    UNION ALL
    SELECT CAST(2 AS BIGINT), 'click', c2,
           ROUND(c2 / NULLIF(c1, 0), 6) FROM c
    UNION ALL
    SELECT CAST(3 AS BIGINT), 'purchase', c3,
           ROUND(c3 / NULLIF(c1, 0), 6) FROM c
    """,
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    return analytics.funnel(ev, FUNNEL_STEPS)


# Day-granularity cohort retention over the events month. Output is at
# most |days|² rows; the oracle replays first-day cohorting with the
# same window algebra. DuckDB DATE - DATE is already integer days.
@query(
    "cohort_retention_daily",
    oracle="""
    WITH a AS (
        SELECT user_id AS u, CAST(ts AS DATE) AS day,
               min(CAST(ts AS DATE)) OVER (PARTITION BY user_id) AS cohort
        FROM events
    ),
    c AS (
        SELECT strftime(cohort, '%Y-%m-%d') AS cohort_day,
               CAST(day - cohort AS BIGINT) AS day_offset,
               CAST(count(DISTINCT u) AS BIGINT) AS users
        FROM a GROUP BY 1, 2
    )
    SELECT cohort_day, day_offset, users,
           ROUND(users / max(CASE WHEN day_offset = 0 THEN users END)
                         OVER (PARTITION BY cohort_day), 6) AS retention
    FROM c
    """,
)
def cohort_retention_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    return analytics.cohort_retention(ev)
