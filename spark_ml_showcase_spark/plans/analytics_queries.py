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
from pyspark.sql import functions as F

from spark_ml_showcase_spark.operators import analytics
from spark_ml_showcase_spark.operators import windows as windows_ops
from spark_ml_showcase_spark.functions.rounding import round_like_duckdb
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


# First-order Markov transition matrix over per-user event sequences.
# The (ts, event_id) tiebreak makes the lag deterministic when two
# events share a timestamp — both engines compute identical pairs.
@query(
    "markov_event_transitions",
    oracle="""
    WITH p AS (
        SELECT event_type AS cur_type,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type
        FROM events
    ),
    c AS (
        SELECT prev_type, cur_type, CAST(count(*) AS BIGINT) AS transitions
        FROM p WHERE prev_type IS NOT NULL GROUP BY 1, 2
    )
    SELECT prev_type, cur_type, transitions,
           ROUND(transitions / sum(transitions)
                 OVER (PARTITION BY prev_type), 6) AS prob
    FROM c
    """,
)
def markov_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    return analytics.transition_matrix(ev)


# Pearson chi-square independence of event_type × ISO day-of-week,
# with Cramér's V. Expected counts and per-cell terms are
# deterministic double arithmetic ((o-e)*(o-e)/e — self-multiply, not
# pow); only the 35-term final sum is order-dependent, far inside the
# ROUND(.., 6) guard.
@query(
    "chi2_event_type_isodow",
    oracle="""
    WITH cells AS (
        SELECT event_type AS r, CAST(isodow(ts) AS BIGINT) AS c,
               CAST(count(*) AS DOUBLE) AS o
        FROM events GROUP BY 1, 2
    ),
    m AS (
        SELECT o,
               sum(o) OVER (PARTITION BY r) AS rt,
               sum(o) OVER (PARTITION BY c) AS ct,
               sum(o) OVER () AS n,
               r, c
        FROM cells
    ),
    t AS (
        SELECT r, c, n,
               (o - rt * ct / n) * (o - rt * ct / n) / (rt * ct / n)
                   AS term
        FROM m
    )
    SELECT CAST(max(n) AS BIGINT) AS n,
           CAST((count(DISTINCT r) - 1) * (count(DISTINCT c) - 1)
                AS BIGINT) AS dof,
           ROUND(sum(term), 6) AS chi2,
           ROUND(sqrt(sum(term) / (max(n) * least(count(DISTINCT r) - 1,
                                                  count(DISTINCT c) - 1))),
                 6) AS cramers_v
    FROM t
    """,
)
def chi2_event_type_isodow(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    # weekday() is 0=Monday; +1 matches DuckDB's isodow (1=Monday).
    return analytics.chi_square_independence(
        ev,
        F.col("event_type"),
        (F.expr("weekday(ts)") + F.lit(1)).cast("bigint"),
    )


# Hourly avg-value series per event type, gap-filled over a dense
# bucket spine and LINEARLY INTERPOLATED across missing buckets.
# Observed averages are rounded to 6 BEFORE interpolation so both
# engines interpolate from bit-identical inputs; the interpolation
# itself is per-row deterministic arithmetic (same expression tree
# both sides), rounded again on output.
@query(
    "gapfill_interpolate_hourly",
    oracle="""
    WITH e AS (
        SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS ep, value
        FROM events
    ),
    obs AS (
        -- exact-decimal average: a plain avg() of doubles is
        -- sum-order-dependent and can straddle the ROUND boundary
        -- (bit one bucket at sf0.1); per-row ROUND + DECIMAL sum is
        -- order-free, and the per-bucket sum's integer representation
        -- stays far below 2^53 so the double cast is exact.
        SELECT event_type, ep - ep % 3600 AS bucket_epoch,
               ROUND(CAST(sum(CAST(ROUND(value, 6) AS DECIMAL(20,6)))
                          AS DOUBLE) / count(value), 6) AS avg_value
        FROM e GROUP BY 1, 2
    ),
    span AS (SELECT min(bucket_epoch) AS lo, max(bucket_epoch) AS hi
             FROM obs),
    spine AS (
        SELECT CAST(unnest(generate_series(lo, hi, 3600)) AS BIGINT)
                   AS bucket_epoch
        FROM span
    ),
    grid AS (
        SELECT t.event_type, s.bucket_epoch
        FROM (SELECT DISTINCT event_type FROM obs) t CROSS JOIN spine s
    ),
    sparse AS (
        SELECT g.event_type, g.bucket_epoch, o.avg_value
        FROM grid g LEFT JOIN obs o USING (event_type, bucket_epoch)
    ),
    w AS (
        SELECT event_type, bucket_epoch, avg_value,
               last_value(CASE WHEN avg_value IS NOT NULL
                               THEN bucket_epoch END IGNORE NULLS)
                   OVER (PARTITION BY event_type ORDER BY bucket_epoch
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS px,
               last_value(CASE WHEN avg_value IS NOT NULL
                               THEN avg_value END IGNORE NULLS)
                   OVER (PARTITION BY event_type ORDER BY bucket_epoch
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS py,
               first_value(CASE WHEN avg_value IS NOT NULL
                                THEN bucket_epoch END IGNORE NULLS)
                   OVER (PARTITION BY event_type ORDER BY bucket_epoch
                         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS nx,
               first_value(CASE WHEN avg_value IS NOT NULL
                                THEN avg_value END IGNORE NULLS)
                   OVER (PARTITION BY event_type ORDER BY bucket_epoch
                         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS ny
        FROM sparse
    )
    SELECT event_type, bucket_epoch,
           ROUND(CASE WHEN avg_value IS NOT NULL THEN avg_value
                      WHEN px IS NOT NULL AND nx IS NOT NULL
                      THEN py + (ny - py) * (bucket_epoch - px) / (nx - px)
                 END, 6) AS avg_value,
           CASE WHEN avg_value IS NOT NULL THEN 'observed'
                WHEN px IS NOT NULL AND nx IS NOT NULL THEN 'interp'
                ELSE 'edge' END AS src
    FROM w
    """,
)
def gapfill_interpolate_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    epoch = F.col("ts").cast("long")
    obs = (
        ev.groupBy(
            "event_type",
            (epoch - epoch % 3600).alias("bucket_epoch"),
        )
        .agg(
            # order-free exact-decimal mean (see oracle note)
            round_like_duckdb(
                F.sum(
                    F.round(F.col("value"), 6).cast("decimal(20,6)")
                ).cast("double")
                / F.count(F.col("value")),
                6,
            ).alias("avg_value")
        )
        .localCheckpoint()  # reused 3×: span, key set, grid join
    )
    span = obs.agg(
        F.min("bucket_epoch").alias("_lo"), F.max("bucket_epoch").alias("_hi")
    )
    spine = span.select(
        F.explode(F.sequence("_lo", "_hi", F.lit(3600))).alias("bucket_epoch")
    )
    grid = obs.select("event_type").distinct().crossJoin(F.broadcast(spine))
    sparse = grid.join(obs, ["event_type", "bucket_epoch"], "left")
    return windows_ops.interpolate_linear(
        sparse, ["event_type"], "bucket_epoch", "avg_value"
    )


# Inactivity-gap sessionization (30 min) with explicit per-user
# session numbering — the session_window companion that actually
# ASSIGNS ids. All epoch-second BIGINT arithmetic; (ts, event_id)
# ordering pins same-timestamp events.
@query(
    "sessionize_events_30m",
    oracle="""
    WITH e AS (
        SELECT user_id, ts, event_id,
               CAST(floor(epoch(ts)) AS BIGINT) AS ep
        FROM events
    ),
    m AS (
        SELECT user_id, ts, event_id, ep,
               CASE WHEN lag(ep) OVER w IS NULL THEN 1
                    WHEN ep - lag(ep) OVER w > 1800 THEN 1
                    ELSE 0 END AS new_s
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    n AS (
        SELECT user_id, ep,
               CAST(sum(new_s) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS session_seq
        FROM m
    )
    SELECT user_id, session_seq,
           CAST(count(*) AS BIGINT) AS n_events,
           min(ep) AS start_epoch, max(ep) AS end_epoch,
           max(ep) - min(ep) AS duration_sec
    FROM n GROUP BY user_id, session_seq
    """,
)
def sessionize_events_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    return analytics.sessionize(ev, gap_seconds=1800)


# Top-20 three-step event paths (the path-analysis companion of the
# Markov matrix): consecutive per-user type triples via two lags in
# ONE window, count, deterministic (count desc, path asc) top-k.
@query(
    "top_event_paths_3step",
    oracle="""
    WITH p AS (
        SELECT user_id,
               lag(event_type, 2) OVER w AS t1,
               lag(event_type, 1) OVER w AS t2,
               event_type AS t3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS n
    FROM p WHERE t1 IS NOT NULL
    GROUP BY t1, t2, t3
    ORDER BY n DESC, t1, t2, t3
    LIMIT 20
    """,
)
def top_event_paths_3step(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = Catalog(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p = ev.select(
        F.lag("event_type", 2).over(w).alias("t1"),
        F.lag("event_type", 1).over(w).alias("t2"),
        F.col("event_type").alias("t3"),
    ).filter(F.col("t1").isNotNull())
    return (
        p.groupBy("t1", "t2", "t3")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.desc("n"), "t1", "t2", "t3")
        .limit(20)
    )


# Median imputation per group — the data-repair shape every training
# pipeline runs before featurization. The fixture has no nulls, so
# the query SYNTHESIZES them deterministically (value -> NULL when
# event_id % 7 == 0) and then repairs: per-type exact interpolated
# median of the surviving values (Spark percentile ≡ DuckDB
# percentile_cont on doubles, pinned), coalesce-filled. The audit row
# carries the decimal-domain total of the filled column, proving the
# fill actually landed in every hole.
@query(
    "impute_median_by_type",
    oracle="""
    WITH e AS (
        SELECT event_type,
               CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v
        FROM events
    ),
    med AS (
        SELECT event_type,
               percentile_cont(0.5) WITHIN GROUP (ORDER BY v) AS m
        FROM e GROUP BY event_type
    )
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN e.v IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_imputed,
           ROUND(max(med.m), 6) AS fill_value,
           ROUND(CAST(sum(CAST(ROUND(coalesce(e.v, med.m), 6)
                               AS DECIMAL(20,6))) AS DOUBLE)
                 / count(*), 6) AS mean_after
    FROM e JOIN med ON e.event_type = med.event_type
    GROUP BY e.event_type
    """,
)
def impute_median_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    e = ev.select(
        "event_type",
        F.when(F.col("event_id") % 7 == 0, F.lit(None)).otherwise(
            F.col("value")
        ).alias("v"),
    )
    med = e.groupBy("event_type").agg(
        F.percentile("v", F.lit(0.5)).alias("m")
    )
    j = e.join(F.broadcast(med), "event_type")
    filled = F.coalesce(F.col("v"), F.col("m"))
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("v").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_imputed"),
        F.round(F.max("m"), 6).alias("fill_value"),
        round_like_duckdb(
            F.sum(F.round(filled, 6).cast("decimal(20,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_after"),
    )


# Shannon entropies + mutual information of event_type × ISO weekday,
# from the same one-scan contingency cells as the chi-square. Every
# per-cell term is deterministic double arithmetic (libm log differs
# by ≤1 ulp across engines — orders of magnitude inside the ROUND(,6)
# guard, same precedent as BM25's idf).
@query(
    "mi_event_type_isodow",
    oracle="""
    WITH cells AS (
        SELECT event_type AS r, CAST(isodow(ts) AS BIGINT) AS c,
               CAST(count(*) AS DOUBLE) AS o
        FROM events GROUP BY 1, 2
    ),
    m AS (
        SELECT o, r, c,
               sum(o) OVER (PARTITION BY r) AS rt,
               sum(o) OVER (PARTITION BY c) AS ct,
               sum(o) OVER () AS n
        FROM cells
    ),
    t AS (
        SELECT (o / n) * ln((o / n) / ((rt / n) * (ct / n))) AS mi_term,
               CASE WHEN rn = 1 THEN (rt / n) * ln(rt / n) END AS hr_term,
               CASE WHEN cn = 1 THEN (ct / n) * ln(ct / n) END AS hc_term
        FROM (
            SELECT o, rt, ct, n,
                   row_number() OVER (PARTITION BY r ORDER BY c) AS rn,
                   row_number() OVER (PARTITION BY c ORDER BY r) AS cn
            FROM m
        )
    )
    SELECT ROUND(-sum(hr_term), 6) AS h_type,
           ROUND(-sum(hc_term), 6) AS h_dow,
           ROUND(sum(mi_term), 6) AS mi
    FROM t
    """,
)
def mi_event_type_isodow(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = Catalog(spark, sf_dir).events
    cells = (
        ev.select(
            F.col("event_type").alias("r"),
            (F.expr("weekday(ts)") + F.lit(1)).cast("bigint").alias("c"),
        )
        .groupBy("r", "c")
        .agg(F.count(F.lit(1)).cast("double").alias("o"))
    )
    wr, wc = Window.partitionBy("r"), Window.partitionBy("c")
    m = (
        cells.withColumn("rt", F.sum("o").over(wr))
        .withColumn("ct", F.sum("o").over(wc))
        .withColumn("n", F.sum("o").over(Window.partitionBy()))
        .withColumn("rn", F.row_number().over(wr.orderBy("c")))
        .withColumn("cn", F.row_number().over(wc.orderBy("r")))
    )
    o, rt, ct, n = F.col("o"), F.col("rt"), F.col("ct"), F.col("n")
    t = m.select(
        ((o / n) * F.log((o / n) / ((rt / n) * (ct / n)))).alias("mi_term"),
        F.when(F.col("rn") == 1, (rt / n) * F.log(rt / n)).alias("hr_term"),
        F.when(F.col("cn") == 1, (ct / n) * F.log(ct / n)).alias("hc_term"),
    )
    return t.agg(
        F.round(-F.sum("hr_term"), 6).alias("h_type"),
        F.round(-F.sum("hc_term"), 6).alias("h_dow"),
        F.round(F.sum("mi_term"), 6).alias("mi"),
    )


# Lagged cross-correlation of two hourly count series (view vs
# purchase) at lags -3..+3 hours. Counts are INTEGERS, so every power
# sum is exact and the Pearson formula runs on identical doubles both
# sides — the X38 exact-moment recipe applied to time series.
@query(
    "xcorr_view_purchase_lags",
    oracle="""
    WITH e AS (
        SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS ep
        FROM events WHERE event_type IN ('view', 'purchase')
    ),
    b AS (
        SELECT event_type, ep - ep % 3600 AS bk,
               CAST(count(*) AS BIGINT) AS cnt
        FROM e GROUP BY 1, 2
    ),
    v AS (SELECT bk, cnt AS x FROM b WHERE event_type = 'view'),
    p AS (SELECT bk, cnt AS y FROM b WHERE event_type = 'purchase'),
    lags AS (SELECT CAST(unnest(generate_series(-3, 3)) AS BIGINT) AS lag),
    j AS (
        SELECT l.lag, v.x, p.y
        FROM lags l
        JOIN v ON TRUE
        JOIN p ON p.bk = v.bk + l.lag * 3600
    ),
    s AS (
        SELECT lag, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
               CAST(sum(x * x) AS DOUBLE) AS sxx,
               CAST(sum(y * y) AS DOUBLE) AS syy,
               CAST(sum(x * y) AS DOUBLE) AS sxy
        FROM j GROUP BY lag
    )
    SELECT lag, n,
           ROUND((n * sxy - sx * sy)
                 / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
                 6) AS corr
    FROM s
    """,
)
def xcorr_view_purchase_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    epoch = F.col("ts").cast("long")
    b = (
        ev.filter(F.col("event_type").isin("view", "purchase"))
        .groupBy(
            "event_type", (epoch - epoch % 3600).alias("bk")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .localCheckpoint()  # consumed by both series legs
    )
    v = b.filter(F.col("event_type") == "view").select(
        "bk", F.col("cnt").alias("x")
    )
    p = b.filter(F.col("event_type") == "purchase").select(
        F.col("bk").alias("pbk"), F.col("cnt").alias("y")
    )
    lags = spark.range(-3, 4).select(F.col("id").alias("lag"))
    j = v.crossJoin(F.broadcast(lags)).join(
        p, F.col("pbk") == F.col("bk") + F.col("lag") * 3600
    )
    s = j.groupBy("lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return s.select(
        "lag",
        "n",
        F.round(
            (n * sxy - sx * sy)
            / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("corr"),
    )


# CUSUM changepoint per event type: on the dense hourly count series,
# S_t = prefix(x) - (t*total)/n peaks where the level shifts. Counts
# are integers so prefix and t*total are exact; the single division
# makes S_t identical doubles both sides, and the argmax orders by
# (|S| desc, bucket asc) - fully tie-deterministic.
@query(
    "cusum_changepoint_by_type",
    oracle="""
    WITH e AS (
        SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS ep
        FROM events
    ),
    o AS (
        SELECT event_type, ep - ep % 3600 AS bk,
               CAST(count(*) AS BIGINT) AS cnt
        FROM e GROUP BY 1, 2
    ),
    span AS (SELECT min(bk) AS lo, max(bk) AS hi FROM o),
    spine AS (
        SELECT CAST(unnest(generate_series(lo, hi, 3600)) AS BIGINT) AS bk
        FROM span
    ),
    g AS (
        SELECT t.event_type, s.bk, coalesce(o.cnt, 0) AS x
        FROM (SELECT DISTINCT event_type FROM o) t
        CROSS JOIN spine s
        LEFT JOIN o ON o.event_type = t.event_type AND o.bk = s.bk
    ),
    w AS (
        SELECT event_type, bk,
               sum(x) OVER (PARTITION BY event_type ORDER BY bk
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS pfx,
               row_number() OVER (PARTITION BY event_type ORDER BY bk)
                   AS t,
               sum(x) OVER (PARTITION BY event_type) AS total,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM g
    ),
    s AS (
        SELECT event_type, bk, n,
               pfx - (t * total) * 1.0 / n AS cusum
        FROM w
    ),
    r AS (
        SELECT event_type, bk, n, cusum,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY abs(cusum) DESC, bk) AS rk
        FROM s
    )
    SELECT event_type, bk AS cp_bucket, CAST(n AS BIGINT) AS n,
           ROUND(cusum, 6) AS cusum
    FROM r WHERE rk = 1
    """,
)
def cusum_changepoint_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = Catalog(spark, sf_dir).events
    epoch = F.col("ts").cast("long")
    o = ev.groupBy(
        "event_type", (epoch - epoch % 3600).alias("bk")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt")).localCheckpoint()
    span = o.agg(F.min("bk").alias("_lo"), F.max("bk").alias("_hi"))
    spine = span.select(
        F.explode(F.sequence("_lo", "_hi", F.lit(3600))).alias("bk")
    )
    g = (
        o.select("event_type").distinct()
        .crossJoin(F.broadcast(spine))
        .join(o, ["event_type", "bk"], "left")
        .select(
            "event_type", "bk",
            F.coalesce(F.col("cnt"), F.lit(0)).alias("x"),
        )
    )
    wo = Window.partitionBy("event_type").orderBy("bk")
    run = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.partitionBy("event_type")
    s = (
        g.withColumn("pfx", F.sum("x").over(run))
        .withColumn("t", F.row_number().over(wo))
        .withColumn("total", F.sum("x").over(wall))
        .withColumn("n", F.count(F.lit(1)).over(wall))
        .withColumn(
            "cusum",
            F.col("pfx") - (F.col("t") * F.col("total")) * F.lit(1.0) / F.col("n"),
        )
    )
    r = s.withColumn(
        "rk",
        F.row_number().over(wall.orderBy(F.abs("cusum").desc(), F.asc("bk"))),
    )
    return r.filter(F.col("rk") == 1).select(
        "event_type",
        F.col("bk").alias("cp_bucket"),
        F.col("n").cast("bigint").alias("n"),
        round_like_duckdb(F.col("cusum"), 6).alias("cusum"),
    )


# Two-proportion z-test (the A/B-test readout): purchase conversion of
# even- vs odd-user cohorts. Counts are exact integers; the pooled-
# variance z statistic is one deterministic double expression.
@query(
    "ab_test_purchase_conversion",
    oracle="""
    WITH u AS (
        SELECT user_id % 2 AS grp,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1
                             ELSE 0 END) AS BIGINT) AS conv
        FROM events GROUP BY 1
    ),
    w AS (
        SELECT max(CASE WHEN grp = 0 THEN n END) AS n0,
               max(CASE WHEN grp = 0 THEN conv END) AS c0,
               max(CASE WHEN grp = 1 THEN n END) AS n1,
               max(CASE WHEN grp = 1 THEN conv END) AS c1
        FROM u
    )
    SELECT n0, c0, n1, c1,
           ROUND(c0 * 1.0 / n0, 6) AS p0,
           ROUND(c1 * 1.0 / n1, 6) AS p1,
           ROUND((c0 * 1.0 / n0 - c1 * 1.0 / n1)
                 / sqrt((c0 + c1) * 1.0 / (n0 + n1)
                        * (1 - (c0 + c1) * 1.0 / (n0 + n1))
                        * (1.0 / n0 + 1.0 / n1)), 6) AS z
    FROM w
    """,
)
def ab_test_purchase_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    u = ev.groupBy((F.col("user_id") % 2).alias("grp")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("conv"),
    )
    w = u.agg(
        F.max(F.when(F.col("grp") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("grp") == 0, F.col("conv"))).alias("c0"),
        F.max(F.when(F.col("grp") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("grp") == 1, F.col("conv"))).alias("c1"),
    )
    n0, c0 = F.col("n0"), F.col("c0")
    n1, c1 = F.col("n1"), F.col("c1")
    pool = (c0 + c1) * F.lit(1.0) / (n0 + n1)
    z = (c0 * F.lit(1.0) / n0 - c1 * F.lit(1.0) / n1) / F.sqrt(
        pool * (F.lit(1) - pool) * (F.lit(1.0) / n0 + F.lit(1.0) / n1)
    )
    return w.select(
        "n0", "c0", "n1", "c1",
        round_like_duckdb(c0 * F.lit(1.0) / n0, 6).alias("p0"),
        round_like_duckdb(c1 * F.lit(1.0) / n1, 6).alias("p1"),
        F.round(z, 6).alias("z"),
    )


# Gini coefficient of per-user spend (inequality of purchase value):
# G = (2*Sigma(i*x_i) / (n*Sigma(x)) - (n+1)/n) over ascending-sorted
# x with a deterministic (spend, user) rank. Spend is summed in the
# exact decimal domain; the rank-weighted sum stays exact until the
# one final division.
@query(
    "gini_user_spend",
    oracle="""
    WITH s AS (
        SELECT user_id,
               sum(CAST(ROUND(value, 6) AS DECIMAL(20,6))) AS spend
        FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    r AS (
        SELECT spend,
               row_number() OVER (ORDER BY spend, user_id) AS i,
               count(*) OVER () AS n
        FROM s
    )
    SELECT CAST(max(n) AS BIGINT) AS n,
           ROUND(CAST(sum(spend) AS DOUBLE), 2) AS total_spend,
           ROUND(2.0 * CAST(sum(i * spend) AS DOUBLE)
                 / (max(n) * CAST(sum(spend) AS DOUBLE))
                 - (max(n) + 1.0) / max(n), 6) AS gini
    FROM r
    """,
)
def gini_user_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = Catalog(spark, sf_dir).events
    s = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.sum(
                F.round(F.col("value"), 6).cast("decimal(20,6)")
            ).alias("spend")
        )
    )
    w = Window.orderBy("spend", "user_id")
    r = s.select(
        "spend",
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    return r.agg(
        F.max("n").cast("bigint").alias("n"),
        F.round(F.sum("spend").cast("double"), 2).alias("total_spend"),
        round_like_duckdb(
            F.lit(2.0)
            * F.sum(F.col("i") * F.col("spend")).cast("double")
            / (F.max("n") * F.sum("spend").cast("double"))
            - (F.max("n") + F.lit(1.0)) / F.max("n"),
            6,
        ).alias("gini"),
    )


# Bayesian shrunken group score (the IMDB weighted-rating formula):
# score = (n*mean + C*mu) / (n + C) with prior strength C=50 and the
# global mean as prior. Everything derives from exact decimal sums;
# the one division per group runs on identical doubles.
@query(
    "shrunken_value_score_by_type",
    oracle="""
    WITH g AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(CAST(sum(CAST(ROUND(value, 6) AS DECIMAL(20,6)))
                         AS VARCHAR) AS DOUBLE) AS s
        FROM events GROUP BY event_type
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS tn,
                   CAST(sum(s) AS DOUBLE) AS ts FROM g)
    SELECT g.event_type, g.n,
           ROUND(g.s / g.n, 6) AS mean_value,
           ROUND((g.s + 50 * (tot.ts / tot.tn)) / (g.n + 50), 6)
               AS shrunken_score
    FROM g, tot
    """,
)
def shrunken_value_score_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.round(F.col("value"), 6).cast("decimal(20,6)"))
        .cast("double")
        .alias("s"),
    )
    tot = g.agg(
        F.sum("n").cast("bigint").alias("tn"),
        F.sum("s").cast("double").alias("ts"),
    )
    j = g.crossJoin(F.broadcast(tot))
    return j.select(
        "event_type",
        "n",
        round_like_duckdb(F.col("s") / F.col("n"), 6).alias("mean_value"),
        round_like_duckdb(
            (F.col("s") + F.lit(50) * (F.col("ts") / F.col("tn")))
            / (F.col("n") + F.lit(50)),
            6,
        ).alias("shrunken_score"),
    )


# X59: EWMA-smoothed hourly count series per type (rows-only — the
# geometric-prefix recurrence is not SQL-expressible; pinned against a
# hand-rolled Python recurrence in tests/test_windows_ewma.py).
# Deterministic: counts are integers, alpha fixed, per-series ordering
# total (bucket epochs unique within a type).
@query("ewma_hourly_counts_by_type")
def ewma_hourly_counts_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    epoch = F.col("ts").cast("long")
    counts = ev.groupBy(
        "event_type", (epoch - epoch % 3600).alias("bk")
    ).agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    sm = windows_ops.ewma_smooth(
        counts, ["event_type"], "bk", "cnt", alpha=0.3
    )
    # bounded summary: last smoothed level + max deviation per type
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy(F.desc("bk"))
    return (
        sm.withColumn("_rk", F.row_number().over(w))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_buckets"),
            F.max(F.when(F.col("_rk") == 1, F.col("ewma"))).alias(
                "last_ewma"
            ),
            F.round(
                F.max(F.abs(F.col("cnt") - F.col("ewma"))), 6
            ).alias("max_abs_dev"),
        )
    )


# X63: triangle count of the supplier co-part graph (suppliers linked
# when they supply the same part, parts sliced scale-relatively).
# The engine orients by degree (wedges bounded O(m^1.5) regardless of
# hubs); the oracle's id-ordered triple join counts each triangle
# exactly once too, and the total is orientation-invariant.
@query(
    "triangle_count_suppliers",
    oracle="""
    WITH ps AS (
        SELECT DISTINCT l_partkey, l_suppkey
        FROM lineitem WHERE l_partkey % 20 = 0
    ),
    e AS (
        SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
        FROM ps a JOIN ps b
          ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
    ),
    nodes AS (
        SELECT count(DISTINCT x) AS n FROM (
            SELECT u AS x FROM e UNION ALL SELECT v FROM e
        )
    )
    SELECT CAST(nodes.n AS BIGINT) AS n_nodes,
           CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
           CAST((SELECT count(*)
                 FROM e e1
                 JOIN e e2 ON e1.v = e2.u
                 JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
                AS BIGINT) AS n_triangles
    FROM nodes
    """,
)
def triangle_count_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_ml_showcase_spark.operators.graph import triangle_count

    li = Catalog(spark, sf_dir).lineitem
    ps = (
        li.filter(F.col("l_partkey") % 20 == 0)
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    a, b = ps.alias("a"), ps.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_partkey") == F.col("b.l_partkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .select(
            F.col("a.l_suppkey").alias("u"), F.col("b.l_suppkey").alias("v")
        )
        .distinct()
    )
    return triangle_count(edges)


# X64: winsorization — clip values at the per-group exact p01/p99
# before feature scaling (the standard heavy-tail guard in a training
# pipeline). The clipped-sum audit travels in the exact decimal
# domain; percentiles follow the pinned percentile ≡ percentile_cont
# equivalence.
@query(
    "winsorize_value_by_type",
    oracle="""
    WITH q AS (
        SELECT event_type,
               percentile_cont(0.01) WITHIN GROUP (ORDER BY value) AS p01,
               percentile_cont(0.99) WITHIN GROUP (ORDER BY value) AS p99
        FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN e.value < q.p01 OR e.value > q.p99
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
           ROUND(CAST(sum(CAST(ROUND(
                     CASE WHEN e.value < q.p01 THEN q.p01
                          WHEN e.value > q.p99 THEN q.p99
                          ELSE e.value END, 6) AS DECIMAL(20,6)))
                      AS DOUBLE) / count(*), 6) AS mean_winsorized
    FROM events e JOIN q ON e.event_type = q.event_type
    GROUP BY e.event_type
    """,
)
def winsorize_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    q = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.01)).alias("p01"),
        F.percentile("value", F.lit(0.99)).alias("p99"),
    )
    j = ev.join(F.broadcast(q), "event_type")
    clipped = (
        F.when(F.col("value") < F.col("p01"), F.col("p01"))
        .when(F.col("value") > F.col("p99"), F.col("p99"))
        .otherwise(F.col("value"))
    )
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(
            F.when(
                (F.col("value") < F.col("p01"))
                | (F.col("value") > F.col("p99")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_clipped"),
        round_like_duckdb(
            F.sum(F.round(clipped, 6).cast("decimal(20,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_winsorized"),
    )


# X65: robust z-score outliers (median/MAD) — the IQR fence's sibling
# for asymmetric tails: MAD = median(|x - median|), flag
# |x - median| > 3 * 1.4826 * MAD. Two exact interpolated medians
# (one over values, one over absolute deviations from the broadcast
# median), then a one-scan count.
@query(
    "robust_zscore_outliers_by_type",
    oracle="""
    WITH med AS (
        SELECT event_type,
               percentile_cont(0.5) WITHIN GROUP (ORDER BY value) AS m
        FROM events GROUP BY event_type
    ),
    mad AS (
        SELECT e.event_type,
               percentile_cont(0.5) WITHIN GROUP (
                   ORDER BY abs(e.value - med.m)) AS mad
        FROM events e JOIN med ON e.event_type = med.event_type
        GROUP BY e.event_type
    )
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n,
           ROUND(max(med.m), 6) AS median_value,
           ROUND(max(mad.mad), 6) AS mad,
           CAST(sum(CASE WHEN abs(e.value - med.m)
                              > 3 * 1.4826 * mad.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS outliers
    FROM events e
    JOIN med ON e.event_type = med.event_type
    JOIN mad ON e.event_type = mad.event_type
    GROUP BY e.event_type
    """,
)
def robust_zscore_outliers_by_type(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("m")
    )
    j1 = ev.join(F.broadcast(med), "event_type")
    mad = j1.groupBy("event_type").agg(
        F.percentile(F.abs(F.col("value") - F.col("m")), F.lit(0.5)).alias(
            "mad"
        )
    )
    j = j1.join(F.broadcast(mad), "event_type")
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.max("m"), 6).alias("median_value"),
        F.round(F.max("mad"), 6).alias("mad"),
        F.sum(
            F.when(
                F.abs(F.col("value") - F.col("m"))
                > F.lit(3) * F.lit(1.4826) * F.col("mad"),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("outliers"),
    )


# X76: k-core decomposition of the supplier co-supply graph — fixed
# 8-round peel (operators/graph.k_core) with k derived FROM the data
# (ceil of the average degree, exact integer arithmetic: (E + V − 1)
# div V — half the average degree) so the peel is meaningful — a real
# multi-round cascade, non-empty core — at every SF. The oracle UNROLLS the
# same 8 rounds as a generated CTE chain — iteration replayed verbatim,
# no recursion needed; tests pin that round 8 equals round 9 (fixpoint)
# on the fixtures.
def _kcore_oracle(rounds: int = 8) -> str:
    chain = ["""
    WITH ps AS (
        SELECT DISTINCT l_partkey, l_suppkey
        FROM lineitem WHERE l_partkey % 100 = 0
    ),
    e0 AS MATERIALIZED (
        SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
        FROM ps a JOIN ps b
          ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
    ),
    kv AS MATERIALIZED (
        SELECT ((SELECT count(*) FROM e0)
                + (SELECT count(DISTINCT x) FROM
                   (SELECT u AS x FROM e0 UNION ALL SELECT v FROM e0)) - 1)
               // (SELECT count(DISTINCT x) FROM
                   (SELECT u AS x FROM e0 UNION ALL SELECT v FROM e0))
               AS kk
    )"""]
    for r in range(rounds):
        chain.append(f""",
    d{r} AS MATERIALIZED (
        SELECT x, count(*) AS d FROM
            (SELECT u AS x FROM e{r} UNION ALL SELECT v FROM e{r})
        GROUP BY x
    ),
    keep{r} AS MATERIALIZED (SELECT x FROM d{r} WHERE d >= (SELECT kk FROM kv)),
    e{r + 1} AS MATERIALIZED (
        SELECT e.u, e.v FROM e{r} e
        JOIN keep{r} a ON e.u = a.x
        JOIN keep{r} b ON e.v = b.x
    )""")
    chain.append(f"""
    SELECT x AS id, CAST(count(*) AS BIGINT) AS degree FROM
        (SELECT u AS x FROM e{rounds} UNION ALL SELECT v FROM e{rounds})
    GROUP BY x ORDER BY id""")
    return "".join(chain)


@query("kcore_supplier_graph", oracle=_kcore_oracle(8))
def kcore_supplier_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_ml_showcase_spark.operators.graph import k_core

    li = Catalog(spark, sf_dir).lineitem
    ps = (
        li.filter(F.col("l_partkey") % 100 == 0)
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    a, b = ps.alias("a"), ps.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_partkey") == F.col("b.l_partkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .select(
            F.col("a.l_suppkey").alias("u"), F.col("b.l_suppkey").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=False)  # consumed by E/V counts + 8 peels
    )
    n_edges = edges.count()
    n_nodes = (
        edges.select(F.explode(F.array("u", "v")).alias("x"))
        .agg(F.count_distinct("x"))
        .collect()[0][0]
    )
    k = (n_edges + n_nodes - 1) // n_nodes
    return k_core(edges, k, rounds=8).orderBy("id")


# X77: seasonal-baseline anomaly detection on the event stream: the
# hour-of-day profile per type is the baseline (mean of EXACT integer
# hourly counts — one division, order-free); residual dispersion per
# type follows the round-9 convention (per-row ROUND(resid², 6) →
# exact DECIMAL sum → one division) so the z-scores are identical
# cross-engine. Emits hours where |z| > 2.
@query(
    "seasonal_hourly_anomalies",
    oracle="""
    WITH hourly AS (
        SELECT event_type, CAST(ts AS DATE) AS day, hour(ts) AS hod,
               count(*) AS n
        FROM events GROUP BY 1, 2, 3
    ),
    base AS (
        SELECT event_type, hod,
               CAST(SUM(n) AS DOUBLE) / COUNT(*) AS mu
        FROM hourly GROUP BY 1, 2
    ),
    resid AS (
        SELECT h.event_type, h.day, h.hod, h.n, b.mu,
               ROUND((h.n - b.mu) * (h.n - b.mu), 6) AS r2
        FROM hourly h JOIN base b USING (event_type, hod)
    ),
    disp AS (
        SELECT event_type,
               sqrt(CAST(SUM(CAST(r2 AS DECIMAL(20,6))) AS DOUBLE)
                    / COUNT(*)) AS sigma
        FROM resid GROUP BY 1
    )
    SELECT r.event_type AS event_type,
           CAST(r.day AS VARCHAR) AS day,
           CAST(r.hod AS BIGINT) AS hod,
           CAST(r.n AS BIGINT) AS n,
           ROUND(r.mu, 6) AS mu,
           ROUND((r.n - r.mu) / d.sigma, 6) AS z
    FROM resid r JOIN disp d USING (event_type)
    WHERE abs(ROUND((r.n - r.mu) / d.sigma, 6)) > 2
    ORDER BY event_type, day, hod
    """,
)
def seasonal_hourly_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    hourly = ev.groupBy(
        "event_type",
        F.to_date("ts").alias("day"),
        F.hour("ts").alias("hod"),
    ).agg(F.count(F.lit(1)).alias("n"))
    base = hourly.groupBy("event_type", "hod").agg(
        (F.sum("n").cast("double") / F.count(F.lit(1))).alias("mu")
    )
    resid = hourly.join(base, ["event_type", "hod"]).withColumn(
        "r2",
        round_like_duckdb(
            (F.col("n") - F.col("mu")) * (F.col("n") - F.col("mu")), 6
        ),
    )
    disp = resid.groupBy("event_type").agg(
        F.sqrt(
            F.sum(F.col("r2").cast("decimal(20,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("sigma")
    )
    z = F.round((F.col("n") - F.col("mu")) / F.col("sigma"), 6)
    return (
        resid.join(F.broadcast(disp), "event_type")
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) > 2)
        .select(
            "event_type",
            F.col("day").cast("string").alias("day"),
            F.col("hod").cast("bigint").alias("hod"),
            F.col("n").cast("bigint").alias("n"),
            round_like_duckdb(F.col("mu"), 6).alias("mu"),
            "z",
        )
        .orderBy("event_type", "day", "hod")
    )


# X78: first-touch attribution — for every purchase, the user's EARLIEST
# view in the trailing 7 days (RANGE window over event-time seconds; the
# frame spec is identical in Spark and DuckDB), rolled up to a per-day
# attribution-rate report. Exact counts + one division, ROUND(6).
@query(
    "first_touch_attribution",
    oracle="""
    WITH w AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               min(CASE WHEN event_type = 'view'
                        THEN floor(epoch(ts)) END)
                   OVER (PARTITION BY user_id ORDER BY floor(epoch(ts))
                         RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)
                   AS first_view_sec
        FROM events
    )
    SELECT CAST(day AS VARCHAR) AS day,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(count(first_view_sec) AS BIGINT) AS n_attributed,
           ROUND(count(first_view_sec)::DOUBLE / count(*), 6)
               AS attribution_rate
    FROM w WHERE event_type = 'purchase'
    GROUP BY day ORDER BY day
    """,
)
def first_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = Catalog(spark, sf_dir).events
    sec = F.floor(F.col("ts").cast("double")).cast("long")
    win = (
        W.partitionBy("user_id")
        .orderBy(sec)
        .rangeBetween(-7 * 86400, 0)
    )
    w = ev.select(
        "event_type",
        F.to_date("ts").alias("day"),
        F.min(F.when(F.col("event_type") == "view", sec)).over(win).alias(
            "first_view_sec"
        ),
    )
    return (
        w.filter(F.col("event_type") == "purchase")
        .groupBy(F.col("day").cast("string").alias("day"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
            F.count("first_view_sec").cast("bigint").alias("n_attributed"),
            round_like_duckdb(
                F.count("first_view_sec").cast("double") / F.count(F.lit(1)),
                6,
            ).alias("attribution_rate"),
        )
        .orderBy("day")
    )


# X79: market-basket co-purchase pairs — support and LIFT of part pairs
# within orders, top-20 by (support DESC, pair ASC). Pair generation is
# a per-order self-join bounded by the order's line count (≤ 7 in
# TPC-H-shaped data — never corpus-sized); lift = support·N /
# (c_a·c_b) on exact integers, one division, ROUND(6).
@query(
    "market_basket_pairs",
    oracle="""
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM op),
    pc AS (SELECT l_partkey, COUNT(*) AS c FROM op GROUP BY 1),
    pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               COUNT(*) AS support
        FROM op a JOIN op b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
    )
    SELECT part_a, part_b, CAST(support AS BIGINT) AS support,
           ROUND(support::DOUBLE * n.n_orders / (ca.c * cb.c), 6) AS lift
    FROM pairs
    JOIN pc ca ON ca.l_partkey = pairs.part_a
    JOIN pc cb ON cb.l_partkey = pairs.part_b
    CROSS JOIN n
    ORDER BY support DESC, part_a ASC, part_b ASC
    LIMIT 20
    """,
)
def market_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    # baskets, not a self-join (r15): ONE order-keyed exchange builds
    # the distinct part set per order (collect_set dedupes, replacing
    # the former distinct + re-keyed self-join pair of exchanges), and
    # the ordered pairs explode from the sorted array in-task — the
    # per-order fan-out is bounded by the basket size (≤7 lines in
    # TPC-H-shaped data), never corpus-sized. Same (a < b) pair
    # multiset, so support/lift are unchanged.
    baskets = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("_parts"))
        .select("_parts")
    )
    n_orders = baskets.agg(F.count(F.lit(1)).alias("n_orders"))
    part = F.explode("_parts").alias("l_partkey")
    pc = baskets.select(part).groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("c")
    )
    arr = F.col("_parts")
    pair_arr = F.flatten(
        F.transform(
            arr,
            lambda x, i: F.transform(
                F.slice(arr, i + 2, F.greatest(F.size(arr) - i - 1, F.lit(0))),
                lambda y: F.struct(x.alias("part_a"), y.alias("part_b")),
            ),
        )
    )
    pairs = (
        baskets.select(F.explode(pair_arr).alias("p"))
        .groupBy(
            F.col("p.part_a").alias("part_a"),
            F.col("p.part_b").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("support"))
    )
    return (
        pairs.join(
            F.broadcast(pc.select(F.col("l_partkey").alias("part_a"), F.col("c").alias("ca"))),
            "part_a",
        )
        .join(
            F.broadcast(pc.select(F.col("l_partkey").alias("part_b"), F.col("c").alias("cb"))),
            "part_b",
        )
        # single-row broadcast cross (tpch_q11 pattern, allowlisted)
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            F.col("support").cast("bigint").alias("support"),
            round_like_duckdb(
                F.col("support").cast("double")
                * F.col("n_orders")
                / (F.col("ca") * F.col("cb")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("support"), F.asc("part_a"), F.asc("part_b"))
        .limit(20)
    )


# X80: weekly retention cohort matrix — users grouped by first-activity
# week, the classic (cohort_week, week_offset) retention grid. The
# fixture's event stream is DENSE (every user active every week, which
# collapses the matrix to one cohort at 100% — degenerate), so activity
# is first thinned by a deterministic md5 1/16 event sample
# (portable_sample_by convention: engine-portable, partitioning-free)
# to ~4 events/user — a realistic sparse-activity grid with real decay.
# Weeks are Monday-truncated in both engines; offsets are exact integer
# day arithmetic / 7; rates one division on exact counts, ROUND(6).
@query(
    "retention_cohorts",
    oracle="""
    WITH uw AS (
        SELECT DISTINCT user_id,
               CAST(date_trunc('week', ts) AS DATE) AS week
        FROM events
        WHERE substr(md5(CAST(event_id AS VARCHAR)), 1, 1) = '0'
    ),
    cohort AS (SELECT user_id, MIN(week) AS cw FROM uw GROUP BY 1),
    sz AS (SELECT cw, COUNT(*) AS n_cohort FROM cohort GROUP BY 1),
    grid AS (
        SELECT c.cw, (u.week - c.cw) // 7 AS week_offset,
               COUNT(*) AS n_active
        FROM uw u JOIN cohort c USING (user_id)
        GROUP BY 1, 2
    )
    SELECT CAST(g.cw AS VARCHAR) AS cohort_week,
           CAST(g.week_offset AS BIGINT) AS week_offset,
           CAST(g.n_active AS BIGINT) AS n_active,
           CAST(s.n_cohort AS BIGINT) AS n_cohort,
           ROUND(g.n_active::DOUBLE / s.n_cohort, 6) AS retention
    FROM grid g JOIN sz s USING (cw)
    ORDER BY cohort_week, week_offset
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events.filter(
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 1) == "0"
    )
    uw = ev.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("week")
    ).distinct()
    cohort = uw.groupBy("user_id").agg(F.min("week").alias("cw"))
    sz = cohort.groupBy("cw").agg(F.count(F.lit(1)).alias("n_cohort"))
    grid = (
        uw.join(cohort, "user_id")
        .groupBy(
            "cw",
            (F.datediff(F.col("week"), F.col("cw")) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    return (
        grid.join(F.broadcast(sz), "cw")
        .select(
            F.col("cw").cast("string").alias("cohort_week"),
            F.col("week_offset").cast("bigint").alias("week_offset"),
            F.col("n_active").cast("bigint").alias("n_active"),
            F.col("n_cohort").cast("bigint").alias("n_cohort"),
            round_like_duckdb(
                F.col("n_active").cast("double") / F.col("n_cohort"), 6
            ).alias("retention"),
        )
        .orderBy("cohort_week", "week_offset")
    )


# X81: spend-concentration deciles (the Lorenz-curve companion of the
# r9 Gini query): users ntile(10)-bucketed by exact-decimal total spend
# with a user_id tie-break (fully deterministic ordering, and both
# engines give earlier buckets the remainder rows per the SQL standard);
# per-decile share + cumulative share, exact sums, ROUND(6).
@query(
    "spend_concentration_deciles",
    oracle="""
    WITH us AS (
        SELECT user_id,
               SUM(CAST(ROUND(value, 6) AS DECIMAL(20,6))) AS spend
        FROM events GROUP BY 1
    ),
    d AS (
        SELECT spend,
               ntile(10) OVER (ORDER BY spend ASC, user_id ASC) AS decile
        FROM us
    ),
    agg AS (
        SELECT decile, COUNT(*) AS n_users, SUM(spend) AS s
        FROM d GROUP BY 1
    ),
    tot AS (SELECT SUM(s) AS t FROM agg)
    SELECT CAST(decile AS BIGINT) AS decile,
           CAST(n_users AS BIGINT) AS n_users,
           CAST(s AS DOUBLE) AS decile_spend,
           ROUND(CAST(s AS DOUBLE) / CAST(t AS DOUBLE), 6) AS share,
           ROUND(CAST(SUM(s) OVER (ORDER BY decile) AS DOUBLE)
                 / CAST(t AS DOUBLE), 6) AS cum_share
    FROM agg CROSS JOIN tot
    ORDER BY decile
    """,
)
def spend_concentration_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = Catalog(spark, sf_dir).events
    us = ev.groupBy("user_id").agg(
        F.sum(F.round("value", 6).cast("decimal(20,6)")).alias("spend")
    )
    d = us.withColumn(
        "decile",
        F.ntile(10).over(
            W.orderBy(F.asc("spend"), F.asc("user_id"))
        ),
    )
    agg = d.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_users"), F.sum("spend").alias("s")
    )
    tot = agg.agg(F.sum("s").alias("t"))
    return (
        agg.crossJoin(F.broadcast(tot))
        .select(
            F.col("decile").cast("bigint").alias("decile"),
            F.col("n_users").cast("bigint").alias("n_users"),
            F.col("s").cast("double").alias("decile_spend"),
            round_like_duckdb(
                F.col("s").cast("double") / F.col("t").cast("double"), 6
            ).alias("share"),
            round_like_duckdb(
                F.sum("s").over(W.orderBy("decile")).cast("double")
                / F.col("t").cast("double"),
                6,
            ).alias("cum_share"),
        )
        .orderBy("decile")
    )


# X82: view→purchase conversion-lag quantiles — for each purchase, the
# gap to the user's MOST RECENT prior view (running max over a window,
# NULL-skipping), then exact interpolated quartiles of the lag per
# urgency band (the pinned percentile ≡ percentile_cont equivalence).
# Lags are exact integer seconds.
@query(
    "conversion_lag_quantiles",
    oracle="""
    WITH w AS (
        SELECT event_type,
               floor(epoch(ts)) AS sec,
               max(CASE WHEN event_type = 'view'
                        THEN floor(epoch(ts)) END)
                   OVER (PARTITION BY user_id
                         ORDER BY floor(epoch(ts)), event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS last_view_sec
        FROM events
    ),
    lags AS (
        SELECT sec - last_view_sec AS lag_sec FROM w
        WHERE event_type = 'purchase' AND last_view_sec IS NOT NULL
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_conversions,
           ROUND(percentile_cont(0.25) WITHIN GROUP (ORDER BY lag_sec), 6)
               AS p25_sec,
           ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY lag_sec), 6)
               AS p50_sec,
           ROUND(percentile_cont(0.9) WITHIN GROUP (ORDER BY lag_sec), 6)
               AS p90_sec
    FROM lags
    """,
)
def conversion_lag_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = Catalog(spark, sf_dir).events
    sec = F.floor(F.col("ts").cast("double")).cast("long")
    # (sec, event_id) ordering: ROWS frames are tie-order-dependent,
    # and same-second (view, purchase) pairs exist — the unique
    # event_id tiebreak makes the frame identical in both engines
    win = (
        W.partitionBy("user_id")
        .orderBy(sec, "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    w = ev.select(
        "event_type",
        sec.alias("sec"),
        F.max(F.when(F.col("event_type") == "view", sec)).over(win).alias(
            "last_view_sec"
        ),
    )
    lags = w.filter(
        (F.col("event_type") == "purchase")
        & F.col("last_view_sec").isNotNull()
    ).select((F.col("sec") - F.col("last_view_sec")).alias("lag_sec"))
    # ROUND(,6) DOUBLE, not a BIGINT cast: interpolated percentiles are
    # fractional, and DuckDB's double->BIGINT cast ROUNDS where Spark's
    # truncates (the pinned cross-engine hazard)
    return lags.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_conversions"),
        F.round(F.percentile("lag_sec", F.lit(0.25)), 6).alias("p25_sec"),
        F.round(F.percentile("lag_sec", F.lit(0.5)), 6).alias("p50_sec"),
        F.round(F.percentile("lag_sec", F.lit(0.9)), 6).alias("p90_sec"),
    )


# X88: PSI drift monitoring — the standard production check that a
# model-feeding feature's distribution still looks like training week.
# Bin edges are the base week's interpolated deciles per event_type
# (frozen — drift must be measured against a FIXED yardstick); empty
# bins still contribute via the eps clamp. The fixture events span 5
# ISO weeks (Jan 2024 starts on a Monday) at every SF. Per-bin terms
# are ROUNDed then DECIMAL-summed — a plain double SUM of ln terms is
# partition-order dependent (r9 gapfill lesson).
@query(
    "psi_value_drift_weekly",
    oracle="""
    WITH d AS (
        SELECT event_type AS seg, date_part('week', ts) AS per, value AS v
        FROM events WHERE value IS NOT NULL
    ),
    edges AS (
        SELECT seg,
               [quantile_cont(v, 0.1), quantile_cont(v, 0.2),
                quantile_cont(v, 0.3), quantile_cont(v, 0.4),
                quantile_cont(v, 0.5), quantile_cont(v, 0.6),
                quantile_cont(v, 0.7), quantile_cont(v, 0.8),
                quantile_cont(v, 0.9)] AS edges
        FROM d WHERE per = 1 GROUP BY seg
    ),
    binned AS (
        SELECT d.seg, d.per, len(list_filter(e.edges, x -> d.v > x)) AS bin
        FROM d JOIN edges e ON d.seg = e.seg
    ),
    counts AS (SELECT seg, per, bin, count(*) AS n
               FROM binned GROUP BY seg, per, bin),
    totals AS (SELECT seg, per, count(*) AS tot FROM binned GROUP BY seg, per),
    grid AS (SELECT seg, per, tot, unnest(generate_series(0, 9)) AS bin
             FROM totals),
    shares AS (
        SELECT g.seg, g.per, g.bin, g.tot,
               COALESCE(c.n, 0)::DOUBLE / g.tot AS p
        FROM grid g LEFT JOIN counts c
          ON g.seg = c.seg AND g.per = c.per AND g.bin = c.bin
    ),
    base AS (SELECT seg, bin, p AS pb FROM shares WHERE per = 1)
    SELECT cur.seg AS event_type,
           CAST(cur.per AS BIGINT) AS period,
           CAST(max(cur.tot) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND((cur.p - base.pb)
                               * ln(greatest(cur.p, 0.000001)
                                    / greatest(base.pb, 0.000001)), 6)
                         AS DECIMAL(20,6))) AS DOUBLE) AS psi
    FROM shares cur JOIN base
      ON cur.seg = base.seg AND cur.bin = base.bin
    WHERE cur.per <> 1
    GROUP BY cur.seg, cur.per
    ORDER BY event_type, period
    """,
)
def psi_value_drift_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    return analytics.psi_drift(
        ev,
        value_col="value",
        segment_col="event_type",
        period_col=F.weekofyear("ts").cast("bigint"),
        base_period=1,
        n_bins=10,
    )


# X95: time-weighted average per (event_type, day) — the LOCF
# time_weight every time-series store ships: a value holds from its
# timestamp to the next observation (bucket end for the last), so
# burst samples can't dominate the mean the way they do a plain AVG.
# Weights are exact epoch-second BIGINTs with an event_id tie-break
# (same-second runs give all-but-the-last weight 0 — LOCF); v·w terms
# are ROUND → DECIMAL-summed, the numerator's double cast routes
# through VARCHAR in DuckDB (its direct wide-decimal→double cast
# double-rounds once the 1e6-scaled sum passes 2^53 — the
# corr_qty_price_by_flag convention), and the final division uses the
# portable floor-round chain.
@query(
    "twap_value_daily",
    oracle="""
    WITH d AS (
        SELECT event_type AS k,
               CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS bs,
               CAST(floor(epoch(date_trunc('day', ts) + INTERVAL 1 DAY))
                    AS BIGINT) AS be,
               CAST(floor(epoch(ts)) AS BIGINT) AS e,
               value AS v, event_id
        FROM events
    ),
    w AS (
        SELECT *,
               COALESCE(lead(e) OVER (PARTITION BY k, bs
                                      ORDER BY e, event_id), be) - e AS wt
        FROM d
    ),
    agg AS (
        SELECT k, bs,
               CAST(count(*) AS BIGINT) AS n_obs,
               CAST(SUM(wt) AS BIGINT) AS span_sec,
               CAST(CAST(SUM(CAST(ROUND(v * wt, 6) AS DECIMAL(30,6)))
                         AS VARCHAR) AS DOUBLE) AS num
        FROM w GROUP BY k, bs
    )
    SELECT k AS event_type, bs AS bucket_start_sec, n_obs, span_sec,
           CASE WHEN span_sec > 0
                THEN floor(num / span_sec * 1000000 + 0.5) / 1000000
           END AS twap
    FROM agg ORDER BY event_type, bucket_start_sec
    """,
)
def twap_value_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_ml_showcase_spark.operators import hypertable

    ev = Catalog(spark, sf_dir).events
    return hypertable.time_weighted_avg(
        ev,
        key_col="event_type",
        time_col="ts",
        value_col="value",
        tiebreak_col="event_id",
        bucket="day",
    )


# X97: leave-one-out target encoding — the standard high-cardinality
# categorical feature for tree/linear models, with the self-row
# excluded so the encoding never leaks the row's own target:
# enc = (sum(target over category) − y) / (n − 1). Sum is exact
# DECIMAL (money), the division is one double op, final value through
# the portable floor-round chain; singleton categories emit NULL (no
# peers to encode from). Output restricted to a scale-relative order
# sample so rows stay bounded at every SF.
@query(
    "loo_target_encode_priority",
    oracle="""
    WITH s AS (
        SELECT o_orderkey, o_orderpriority,
               o_totalprice,
               SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                   OVER (PARTITION BY o_orderpriority) AS tot,
               COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
        FROM orders
    )
    SELECT o_orderkey, o_orderpriority,
           CAST(n AS BIGINT) AS n_category,
           CASE WHEN n > 1 THEN
               floor((CAST(tot - CAST(o_totalprice AS DECIMAL(18,2))
                           AS DOUBLE) / (n - 1)) * 100 + 0.5) / 100
           END AS loo_mean_price
    FROM s WHERE o_orderkey % 50 = 0
    ORDER BY o_orderkey
    """,
)
def loo_target_encode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    orders = Catalog(spark, sf_dir).orders
    wp = W.partitionBy("o_orderpriority")
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    s = orders.select(
        "o_orderkey",
        "o_orderpriority",
        dec.alias("_p"),
        F.sum(dec).over(wp).alias("_tot"),
        F.count(F.lit(1)).over(wp).alias("_n"),
    )
    q = (F.col("_tot") - F.col("_p")).cast("double") / (F.col("_n") - 1)
    return (
        s.filter(F.col("o_orderkey") % 50 == 0)
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.col("_n").cast("bigint").alias("n_category"),
            F.when(
                F.col("_n") > 1,
                F.floor(q * 100 + F.lit(0.5)) / 100,
            ).alias("loo_mean_price"),
        )
        .orderBy("o_orderkey")
    )


# X98: per-segment quantile normalization — percent_rank of value
# within its event_type, the rank-based feature transform that makes
# heavy-tailed features comparable across segments. percent_rank =
# (rank − 1)/(n − 1) with RANK ties (identical definition in both
# engines); the only float op is that division, pushed through the
# portable floor-round chain. Output on the md5 1/16 row sample
# (engine-portable), full window computed over ALL rows first.
@query(
    "quantile_normalize_values",
    oracle="""
    WITH r AS (
        SELECT event_id, event_type, value,
               percent_rank() OVER (PARTITION BY event_type
                                    ORDER BY value) AS pr
        FROM events
    )
    SELECT event_id, event_type,
           floor(pr * 1000000 + 0.5) / 1000000 AS value_qnorm
    FROM r
    WHERE substr(md5(CAST(event_id AS VARCHAR)), 1, 1) = '0'
    ORDER BY event_id
    """,
)
def quantile_normalize_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = Catalog(spark, sf_dir).events
    w = W.partitionBy("event_type").orderBy("value")
    return (
        ev.select(
            "event_id",
            "event_type",
            F.percent_rank().over(w).alias("_pr"),
        )
        .filter(F.substring(F.md5(F.col("event_id").cast("string")), 1, 1) == "0")
        .select(
            "event_id",
            "event_type",
            (F.floor(F.col("_pr") * 1000000 + F.lit(0.5)) / 1000000).alias(
                "value_qnorm"
            ),
        )
        .orderBy("event_id")
    )


# X102 (data-quality forensics): Benford first-digit conformance of
# order totals — the standard screen for fabricated/corrupted numeric
# feeds before they enter a training corpus. Per significant digit:
# observed count (exact BIGINT), observed share (one double division of
# exact integers), the Benford expectation log10(1+1/d) (single
# transcendental, ROUND 6 — the conditional_derive_log convention), and
# the signed deviation. The chi² statistic rides along as a constant
# column: each digit's term is rounded to 9dp and DECIMAL-summed so the
# 9-term sum is order-free and engine-identical (the exact-moment
# recipe, applied to a tiny sum). One scan + one 9-row agg — nothing
# here grows with SF beyond the first groupBy.
@query(
    "benford_order_totals",
    oracle="""
    WITH d AS (
        SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                                AS VARCHAR), 1, 1) AS BIGINT) AS digit
        FROM orders WHERE o_totalprice >= 1.0
    ),
    c AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY digit),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM c),
    terms AS (
        SELECT c.digit, c.n, t.tot,
               CAST(ROUND(
                   (n * 1.0 / tot - log10(1 + 1.0 / digit))
                   * (n * 1.0 / tot - log10(1 + 1.0 / digit))
                   / log10(1 + 1.0 / digit), 9) AS DECIMAL(20,9)) AS term
        FROM c, t
    ),
    chi AS (SELECT ROUND(CAST(CAST(SUM(term) AS VARCHAR) AS DOUBLE)
                         * MAX(tot), 4) AS chi2 FROM terms)
    SELECT digit, n,
           ROUND(n * 1.0 / tot, 6) AS share,
           ROUND(log10(1 + 1.0 / digit), 6) AS benford_p,
           ROUND(n * 1.0 / tot - log10(1 + 1.0 / digit), 6) AS deviation,
           chi2
    FROM terms, chi
    ORDER BY digit
    """,
)
def benford_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = Catalog(spark, sf_dir).orders
    digit = F.substring(
        F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
    ).cast("bigint")
    c = (
        orders.filter(F.col("o_totalprice") >= 1.0)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    t = c.agg(F.sum("n").cast("bigint").alias("tot"))
    share = F.col("n") * F.lit(1.0) / F.col("tot")
    p = F.log10(F.lit(1) + F.lit(1.0) / F.col("digit"))
    terms = c.crossJoin(F.broadcast(t)).withColumn(
        "term",
        F.round((share - p) * (share - p) / p, 9).cast("decimal(20,9)"),
    )
    chi = terms.agg(
        F.round(
            F.sum("term").cast("double") * F.max("tot"), 4
        ).alias("chi2")
    )
    return (
        terms.crossJoin(F.broadcast(chi))
        .select(
            "digit",
            "n",
            F.round(share, 6).alias("share"),
            F.round(p, 6).alias("benford_p"),
            F.round(share - p, 6).alias("deviation"),
            "chi2",
        )
        .orderBy("digit")
    )


# X103 (the 100 TB operational report): join-key skew diagnosis — the
# report a capacity planner reads BEFORE a big shuffle lands: top-10
# hottest keys with share and cumulative share, plus corpus-level
# concentration stats (HHI, max/mean imbalance). Everything derives
# from EXACT integer counts (sum of squared counts stays < 2^63 at any
# plausible SF) with one double division at the end, so the report
# hash-matches across engines with no float-sum ordering anywhere.
# Shape: one count agg on the key, one 10-row window — the report costs
# one shuffle on the key being diagnosed, which is the cheapest rehearsal
# of the join it de-risks. The engine's own skew countermeasures
# (salting, AQE skew split) are separate registered queries
# (salted_join_event_types, aqe probes); this is the detector.
@query(
    "key_skew_diagnosis",
    oracle="""
    WITH c AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY user_id
    ),
    s AS (
        SELECT CAST(SUM(n) AS BIGINT) AS tot,
               CAST(COUNT(*) AS BIGINT) AS n_keys,
               CAST(SUM(n * n) AS BIGINT) AS sum_n2,
               CAST(MAX(n) AS BIGINT) AS max_n
        FROM c
    ),
    top AS (
        SELECT user_id, n,
               row_number() OVER (ORDER BY n DESC, user_id ASC) AS rnk,
               SUM(n) OVER (ORDER BY n DESC, user_id ASC
                            ROWS UNBOUNDED PRECEDING) AS cum_n
        FROM c QUALIFY rnk <= 10
    )
    SELECT CAST(rnk AS BIGINT) AS rank, user_id, n,
           ROUND(n * 1.0 / tot, 6) AS share,
           ROUND(cum_n * 1.0 / tot, 6) AS cum_share,
           tot AS n_rows, n_keys,
           ROUND(sum_n2 * 1.0 / (tot * tot), 9) AS hhi,
           ROUND(max_n * 1.0 * n_keys / tot, 6) AS max_over_mean
    FROM top, s
    ORDER BY rank
    """,
)
def key_skew_diagnosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = Catalog(spark, sf_dir).events
    c = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    s = c.agg(
        F.sum("n").cast("bigint").alias("tot"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum(F.col("n") * F.col("n")).cast("bigint").alias("sum_n2"),
        F.max("n").cast("bigint").alias("max_n"),
    )
    # distributed top-k FIRST (TakeOrdered — per-partition heads, no
    # global window over n_keys rows), then rank/cumulate inside the
    # 10-row survivor frame where a single-partition window is free
    w = W.orderBy(F.col("n").desc(), F.col("user_id").asc())
    top = (
        c.orderBy(F.col("n").desc(), F.col("user_id").asc())
        .limit(10)
        .withColumn("rnk", F.row_number().over(w))
        .withColumn(
            "cum_n", F.sum("n").over(w.rowsBetween(W.unboundedPreceding, 0))
        )
    )
    return (
        top.crossJoin(F.broadcast(s))
        .select(
            F.col("rnk").cast("bigint").alias("rank"),
            "user_id",
            "n",
            round_like_duckdb(
                F.col("n") * F.lit(1.0) / F.col("tot"), 6
            ).alias("share"),
            round_like_duckdb(
                F.col("cum_n") * F.lit(1.0) / F.col("tot"), 6
            ).alias("cum_share"),
            F.col("tot").alias("n_rows"),
            "n_keys",
            round_like_duckdb(
                F.col("sum_n2") * F.lit(1.0) / (F.col("tot") * F.col("tot")),
                9,
            ).alias("hhi"),
            round_like_duckdb(
                F.col("max_n") * F.lit(1.0) * F.col("n_keys") / F.col("tot"),
                6,
            ).alias("max_over_mean"),
        )
        .orderBy("rank")
    )
