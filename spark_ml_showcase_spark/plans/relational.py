"""Relational query plans (SURVEY.md §2.2-§2.10) over the testdata star
schema — every ✓SQL operator gets a query + DuckDB oracle.

Each query documents which reference capability it re-expresses (file:line
into /root/reference) and the scale posture of its plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spark_ml_showcase_spark.operators import aggregates, relational, setops, topk, windows
from spark_ml_showcase_spark.functions.rounding import round_like_duckdb
from spark_ml_showcase_spark.plans import query
from spark_ml_showcase_spark.sources.catalog import Catalog


def dec_sum(col: Column | str, scale: int = 2, precision: int = 28) -> Column:
    """Order-independent (exact) sum of a fixed-point-valued double column:
    cast to decimal, sum exactly, return double. This is what makes float
    aggregates hash-match the oracle regardless of partitioning."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")


# ---------------------------------------------------------------------------
# Flagship: top customers by order count.
# Re-expresses the reference's "top-9 hosts" report
# (Log Analysis/log_mining_analysis.py:43-51: groupBy(host).agg(count)
#  .orderBy(desc(count), host).limit(9)) combined with its inner equi-join
# (Collaborative Filtering Analysis/als_clustering_analysis.py:129).
# Scale shape: aggregate the FACT table first (partial+final hash agg), join
# the tiny agg result to the dimension — never join first and aggregate the
# joined blow-up. Top-k plans as TakeOrderedAndProject (no global sort).
# ---------------------------------------------------------------------------
@query(
    "top_customers_by_orders",
    oracle="""
    SELECT c.c_name AS c_name, o.order_count AS order_count,
           o.total_spend AS total_spend
    FROM (
        SELECT o_custkey,
               COUNT(*) AS order_count,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS total_spend
        FROM orders GROUP BY o_custkey
    ) o JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY order_count DESC, c_name ASC LIMIT 9
    """,
)
def top_customers_by_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    per_cust = aggregates.group_agg(
        cat.orders,
        ["o_custkey"],
        order_count=F.count(F.lit(1)),
        total_spend=dec_sum("o_totalprice"),
    )
    joined = per_cust.join(cat.customer, per_cust.o_custkey == F.col("c_custkey"))
    return topk.top_k(
        joined.select("c_name", "order_count", "total_spend"),
        9,
        [("order_count", "desc"), ("c_name", "asc")],
    )


# P1-P5: projection + cast + rename (higgs_ensemble_analysis.py:62-66 casts
# all 29 CSV columns to double and renames _c0 → label; here the same
# single-Project shape over parquet, where column pruning reaches the scan).
@query(
    "project_cast_rename",
    oracle="""
    SELECT l_orderkey AS order_key, l_linenumber AS line_no,
           CAST(l_quantity AS BIGINT) AS qty_int,
           CAST(l_extendedprice AS DECIMAL(18,2))::DOUBLE AS price
    FROM lineitem WHERE l_quantity >= 30
    """,
)
def project_cast_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    pruned = relational.project(
        li.filter(F.col("l_quantity") >= 30),
        F.col("l_orderkey").alias("order_key"),
        F.col("l_linenumber").alias("line_no"),
        F.col("l_quantity").cast("bigint").alias("qty_int"),
        F.col("l_extendedprice").cast("decimal(18,2)").cast("double").alias("price"),
    )
    return pruned


# P6+P7: conditional derive + natural log — the claims derivation pattern
# (Insurance Claim Predictions/Claims_Prediction.py:35-38:
#  when(ClaimNb>0,1).otherwise(0); log(when(ClaimNb==0,0.5).otherwise(...))).
# DuckDB dialect trap: Spark F.log is ln; DuckDB log() is log10 — use ln().
@query(
    "conditional_derive_log",
    oracle="""
    SELECT o_orderkey AS order_key,
           CAST(CASE WHEN o_totalprice > 200000 THEN 1.0 ELSE 0.0 END
                AS DOUBLE) AS big_order,
           ROUND(LN(CASE WHEN o_totalprice = 0 THEN 0.5 ELSE o_totalprice END), 6)
               AS log_price
    FROM orders
    """,
)
def conditional_derive_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = Catalog(spark, sf_dir).orders
    return relational.project(
        orders,
        F.col("o_orderkey").alias("order_key"),
        F.when(F.col("o_totalprice") > 200000, 1.0).otherwise(0.0).alias("big_order"),
        F.round(relational.zero_guarded_log("o_totalprice"), 6).alias("log_price"),
    )


# P10: suffix-match filter (log_mining_analysis.py:32-34 host.endswith('.de')).
@query(
    "suffix_filter",
    oracle="""
    SELECT doc_id AS doc_id, source AS source FROM documents
    WHERE ends_with(source, '1') OR ends_with(source, '7')
    """,
)
def suffix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).documents
    return relational.filter_suffix(docs, "source", "1", "7").select("doc_id", "source")


# P8+A2+A4: group counts with percentage-of-total — the reference's
# percentage pie-chart prep (log_mining_analysis.py:92-104,
# Claims_Prediction.py:68-69). The total comes from an unpartitioned window
# over the ALREADY-AGGREGATED frame (5 rows), not a second scan.
@query(
    "event_type_share",
    oracle="""
    SELECT event_type AS event_type, COUNT(*) AS cnt,
           ROUND(COUNT(*) * 100.0 / (SELECT COUNT(*) FROM events), 6) AS percentage
    FROM events GROUP BY event_type
    """,
)
def event_type_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    counts = aggregates.group_count(ev, "event_type", alias="cnt")
    total = F.sum("cnt").over(Window.partitionBy())
    return counts.withColumn(
        "percentage", round_like_duckdb(F.col("cnt") * 100.0 / total, 6)
    )


# A3+P11: group-by avg with HAVING (als_clustering_analysis.py:130-132:
# avg(rating) per movie, filter avg >= 4). Decimal-exact avg = exact sum /
# exact count so the HAVING threshold can't flap between engines.
@query(
    "avg_price_having",
    oracle="""
    SELECT l_partkey AS part_key,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) / COUNT(*)
               AS avg_price,
           COUNT(*) AS n_lines
    FROM lineitem GROUP BY l_partkey
    HAVING CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) / COUNT(*)
           >= 35000
    """,
)
def avg_price_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    grouped = aggregates.group_agg(
        li,
        ["l_partkey"],
        avg_price=dec_sum("l_extendedprice") / F.count(F.lit(1)),
        n_lines=F.count(F.lit(1)),
    )
    return aggregates.having(grouped, F.col("avg_price") >= 35000).select(
        F.col("l_partkey").alias("part_key"), "avg_price", "n_lines"
    )


# A4: global aggregation — TPC-H Q1-style revenue (the reference's global
# sum at log_mining_analysis.py:98-100). Per-row double product is IEEE-
# deterministic; the SUM goes through decimal so partition order can't
# change the answer.
@query(
    "global_revenue",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                          AS DECIMAL(28,6))), 2) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    """,
)
def global_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    # ROUND in the decimal domain before the double cast: above ~9e15
    # in integer representation (value x 10^scale) DuckDB's
    # decimal->double cast double-rounds and can land one ulp off
    # Spark's (r8 tpch_q1 incident; scale 2 is exact for money sums)
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,6)")
    return aggregates.global_agg(
        li,
        revenue=F.round(F.sum(rev), 2).cast("double"),
        n_items=F.count(F.lit(1)),
    )


# A6: DISTINCT (als_clustering_analysis.py:127 select('id').distinct()).
@query(
    "distinct_flags",
    oracle="SELECT DISTINCT l_returnflag AS l_returnflag, l_linestatus AS l_linestatus FROM lineitem",
)
def distinct_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    return aggregates.distinct_rows(
        Catalog(spark, sf_dir).lineitem, "l_returnflag", "l_linestatus"
    )


# A7: exact per-group count-distinct (the composed unique-hosts count of
# log_mining_analysis.py:43,60-62, done as one operator).
@query(
    "suppliers_per_part",
    oracle="""
    SELECT l_partkey AS part_key, COUNT(DISTINCT l_suppkey) AS n_suppliers
    FROM lineitem GROUP BY l_partkey
    """,
)
def suppliers_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    return aggregates.count_distinct(
        li, ["l_partkey"], "l_suppkey", alias="n_suppliers"
    ).withColumnRenamed("l_partkey", "part_key")


# O1+O2: deterministic top-k with tie-break (log_mining_analysis.py:43-51,
# orderBy(desc(count), host).limit(9) → TakeOrderedAndProject).
@query(
    "topk_suppliers_by_qty",
    oracle="""
    SELECT l_suppkey AS supp_key,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS total_qty
    FROM lineitem GROUP BY l_suppkey
    ORDER BY total_qty DESC, supp_key ASC LIMIT 10
    """,
)
def topk_suppliers_by_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    per_supp = aggregates.group_agg(
        li, ["l_suppkey"], total_qty=dec_sum("l_quantity")
    ).withColumnRenamed("l_suppkey", "supp_key")
    return topk.top_k(per_supp, 10, [("total_qty", "desc"), ("supp_key", "asc")])


# U1: positional UNION ALL (Claims_Prediction.py:52-53 accumulator) — bag
# semantics, duplicates preserved.
@query(
    "union_all_orders",
    oracle="""
    SELECT o_orderkey AS order_key, o_orderstatus AS status,
           o_totalprice AS total_price
    FROM orders WHERE o_orderstatus = 'O'
    UNION ALL
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders WHERE o_totalprice > 300000
    """,
)
def union_all_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = Catalog(spark, sf_dir).orders.select(
        F.col("o_orderkey").alias("order_key"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("total_price"),
    )
    return setops.union_all(
        orders.filter(F.col("status") == "O"),
        orders.filter(F.col("total_price") > 300000),
    )


# U2: EXCEPT DISTINCT — Spark subtract() semantics
# (als_clustering_analysis.py:49), which dedups the left side.
@query(
    "except_nations",
    oracle="""
    SELECT c_nationkey AS nation_key FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
)
def except_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    return setops.subtract(
        cat.customer.select(F.col("c_nationkey").alias("nation_key")),
        cat.supplier.select(F.col("s_nationkey").alias("nation_key")),
    )


# U2+ (r11): the ALL variants — bag difference / bag intersection keep
# MULTIPLICITY (a priority appearing 40× left and 25× right survives
# EXCEPT ALL 15×), which the DISTINCT forms above erase; both engines
# implement the identical multiset semantics and the driver's
# sort-before-hash preserves duplicate rows, so the raw multiset output
# hash-matches. One query exercises both operators with a marker column.
@query(
    "setops_all_priorities",
    oracle="""
    SELECT 'except_all' AS op, p FROM (
        SELECT o_orderpriority AS p FROM orders WHERE o_orderkey % 3 = 0
        EXCEPT ALL
        SELECT o_orderpriority FROM orders WHERE o_orderkey % 3 = 1
    )
    UNION ALL
    SELECT 'intersect_all' AS op, p FROM (
        SELECT o_orderpriority AS p FROM orders WHERE o_orderkey % 3 = 0
        INTERSECT ALL
        SELECT o_orderpriority FROM orders WHERE o_orderkey % 3 = 1
    )
    ORDER BY op, p
    """,
)
def setops_all_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = Catalog(spark, sf_dir).orders
    left = orders.filter(F.col("o_orderkey") % 3 == 0).select(
        F.col("o_orderpriority").alias("p")
    )
    right = orders.filter(F.col("o_orderkey") % 3 == 1).select(
        F.col("o_orderpriority").alias("p")
    )
    ex = setops.except_all(left, right).select(
        F.lit("except_all").alias("op"), "p"
    )
    ix = setops.intersect_all(left, right).select(
        F.lit("intersect_all").alias("op"), "p"
    )
    return ex.unionByName(ix).orderBy("op", "p")


# INTERSECT (engine surface beyond the reference, SURVEY §2.7).
@query(
    "intersect_nations",
    oracle="""
    SELECT c_nationkey AS nation_key FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    return setops.intersect(
        cat.customer.select(F.col("c_nationkey").alias("nation_key")),
        cat.supplier.select(F.col("s_nationkey").alias("nation_key")),
    )


# Join surface beyond the reference: left-semi / left-anti (the scalable
# EXISTS / NOT EXISTS). Customers that placed no order.
@query(
    "customers_without_orders",
    oracle="""
    SELECT c_custkey AS cust_key, c_name AS c_name FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_ml_showcase_spark.operators.joins import anti_join

    cat = Catalog(spark, sf_dir)
    return anti_join(
        cat.customer, cat.orders, F.col("c_custkey") == F.col("o_custkey")
    ).select(F.col("c_custkey").alias("cust_key"), "c_name")


# Multi-way join with broadcast dimensions: order volume per region.
# Scale shape: lineitem→orders is the big join (AQE-planned); customer→
# nation→region are broadcast. Aggregate is pushed as partial before final.
@query(
    "revenue_by_region",
    oracle="""
    SELECT r.r_name AS region,
           CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                          AS DECIMAL(28,6))), 2) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    li, o, c = cat.lineitem, cat.orders, cat.customer
    n, r = cat.nation, cat.region
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,6)")
    return joined.groupBy(F.col("r_name").alias("region")).agg(
        F.round(F.sum(rev), 2).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


# V1: native pivot — replaces the reference's toPandas()+pd.pivot_table
# detour (log_mining_analysis.py:117-119). Pivot values are pinned so Spark
# skips the distinct-discovery job; counts are null-filled to 0 to match
# SQL FILTER semantics.
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "pivot_event_hours",
    oracle="""
    SELECT CAST(date_part('hour', ts) AS BIGINT) AS hour,
           COUNT(*) FILTER (WHERE event_type = 'click') AS click,
           COUNT(*) FILTER (WHERE event_type = 'error') AS error,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
           COUNT(*) FILTER (WHERE event_type = 'view') AS view
    FROM events GROUP BY 1
    """,
)
def pivot_event_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events.withColumn(
        "hour", F.hour("ts").cast("bigint")
    )
    pivoted = aggregates.pivot_counts(ev, "hour", "event_type", EVENT_TYPES)
    return pivoted.fillna(0, subset=EVENT_TYPES)


# Rollup / cube (engine surface, SURVEY §2.4 "not present in reference").
@query(
    "rollup_qty",
    oracle="""
    SELECT l_returnflag AS l_returnflag, l_linestatus AS l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    return aggregates.rollup_agg(
        li, ["l_returnflag", "l_linestatus"],
        sum_qty=dec_sum("l_quantity"), n=F.count(F.lit(1)),
    )


@query(
    "cube_qty",
    oracle="""
    SELECT l_returnflag AS l_returnflag, l_linestatus AS l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    return aggregates.cube_agg(
        li, ["l_returnflag", "l_linestatus"],
        sum_qty=dec_sum("l_quantity"), n=F.count(F.lit(1)),
    )


# ---------------------------------------------------------------------------
# Window functions (SURVEY §2.10 — engine surface the reference lacks).
# ---------------------------------------------------------------------------

# Top-k per group: the idiomatic replacement for the reference's
# collect-then-filter largest-cluster flow (als_clustering_analysis.py:123-126).
@query(
    "top3_suppliers_per_flag",
    oracle="""
    SELECT * FROM (
        SELECT l_returnflag AS flag, l_suppkey AS supp_key,
               CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS total_qty,
               ROW_NUMBER() OVER (
                   PARTITION BY l_returnflag
                   ORDER BY CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) DESC,
                            l_suppkey ASC
               ) AS rnk
        FROM lineitem GROUP BY l_returnflag, l_suppkey
    ) WHERE rnk <= 3
    """,
)
def top3_suppliers_per_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    per = aggregates.group_agg(
        li, ["l_returnflag", "l_suppkey"], total_qty=dec_sum("l_quantity")
    ).select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_suppkey").alias("supp_key"),
        "total_qty",
    )
    return topk.top_k_per_group(
        per, ["flag"], [("total_qty", "desc"), ("supp_key", "asc")], 3,
        keep_rank=True,
    ).withColumnRenamed("_rank", "rnk")


# lag/lead over event time per user (ordering tie-broken by event_id).
@query(
    "event_value_lag",
    oracle="""
    SELECT event_id AS event_id, user_id AS user_id, value AS value,
           lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
    FROM events
    """,
)
def event_value_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    w = windows.ordered_window(["user_id"], [("ts", "asc"), ("event_id", "asc")])
    return ev.select(
        "event_id", "user_id", "value", F.lag("value").over(w).alias("prev_value")
    )


# Running total per user. Decimal accumulation: DuckDB computes window
# aggregates over a segment tree (different add order than Spark's running
# accumulation) — float would drift in the last ulp, decimal cannot.
@query(
    "running_spend_per_user",
    oracle="""
    SELECT event_id AS event_id, user_id AS user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_value
    FROM events
    """,
)
def running_spend_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    w = (
        windows.ordered_window(["user_id"], [("ts", "asc"), ("event_id", "asc")])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double")
        .alias("running_value"),
    )


# ---------------------------------------------------------------------------
# Event-time windows (batch; streaming variants live in streaming/events.py).
# Epoch-aligned buckets so Spark's F.window (1970-origin) and epoch math in
# the oracle agree; output epochs as BIGINT.
# ---------------------------------------------------------------------------
@query(
    "tumbling_hourly_counts",
    oracle="""
    -- floor(epoch()): duckdb's CAST(double AS BIGINT) rounds; Spark's
    -- unix_timestamp truncates. floor makes both floor.
    SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS window_start_epoch,
           event_type AS event_type, COUNT(*) AS cnt,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def tumbling_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    out = windows.tumbling(
        ev, "ts", "1 hour", ["event_type"],
        cnt=F.count(F.lit(1)),
        total_value=F.sum(F.col("value").cast("decimal(18,2)")).cast("double"),
    )
    return out.select(
        F.unix_timestamp("window_start").alias("window_start_epoch"),
        "event_type", "cnt", "total_value",
    )


@query(
    "sliding_quarter_hour_counts",
    oracle="""
    WITH buckets AS (
        SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 900) * 900 AS b15 FROM events
    ), offsets AS (SELECT UNNEST([0, 1, 2, 3]) AS k)
    SELECT b15 - k * 900 AS window_start_epoch, COUNT(*) AS cnt
    FROM buckets CROSS JOIN offsets
    GROUP BY 1
    """,
)
def sliding_quarter_hour_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    out = windows.sliding(ev, "ts", "1 hour", "15 minutes", [], cnt=F.count(F.lit(1)))
    return out.select(
        F.unix_timestamp("window_start").alias("window_start_epoch"), "cnt"
    )


# Session windows (30-minute gap). The oracle is the classic gaps-and-
# islands rewrite — Spark's session_window must agree with it exactly.
@query(
    "session_windows_30m",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts,
               -- strictly > : Spark merges session windows that TOUCH —
               -- an event exactly `gap` after the previous one stays
               -- IN-session (verified empirically: events at 00:00 and
               -- 00:30 under a 30-min gap coalesce into one session;
               -- tests/test_windows_sessions.py pins this).
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS is_new
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
        SELECT user_id, ts,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    )
    SELECT user_id AS user_id,
           CAST(floor(epoch(MIN(ts))) AS BIGINT) AS session_start_epoch,
           COUNT(*) AS n_events
    FROM sessions GROUP BY user_id, sid
    """,
)
def session_windows_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    out = windows.session(ev, "ts", "30 minutes", ["user_id"], n_events=F.count(F.lit(1)))
    return out.select(
        "user_id",
        F.unix_timestamp("session_start").alias("session_start_epoch"),
        "n_events",
    )


# ---------------------------------------------------------------------------
# String / regex / array functions (SURVEY §2.3) + JSON access.
# ---------------------------------------------------------------------------

# F1/F2: capture-group extraction (log_mining_analysis.py:24-26). Pattern is
# kept in the Java∩RE2 common subset.
@query(
    "regex_extract_props",
    oracle="""
    SELECT event_id AS event_id,
           TRY_CAST(regexp_extract(props, '"k": *([0-9]+)', 1) AS BIGINT) AS k
    FROM events
    """,
)
def regex_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_ml_showcase_spark.functions.strings import regex_extract

    ev = Catalog(spark, sf_dir).events
    return ev.select(
        "event_id",
        regex_extract("props", '"k": *([0-9]+)', 1).cast("bigint").alias("k"),
    )


# JSON path access (get_json_object) — oracle checks value equivalence via
# the regex form, proving the JSON path yields the same field.
@query(
    "json_get_props",
    oracle="""
    SELECT event_id AS event_id,
           TRY_CAST(regexp_extract(props, '"k": *([0-9]+)', 1) AS BIGINT) AS k
    FROM events
    """,
)
def json_get_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_ml_showcase_spark.functions.strings import json_get

    ev = Catalog(spark, sf_dir).events
    return ev.select(
        "event_id", json_get("props", "$.k").cast("bigint").alias("k")
    )


# F3+F5: split + explode word count (als_clustering_analysis.py:138-139
# split(genres,'|') + explode), with deterministic top-20.
@query(
    "word_count_top20",
    oracle="""
    SELECT t.token AS token, COUNT(*) AS cnt
    FROM documents, UNNEST(string_split(text, ' ')) AS t(token)
    GROUP BY t.token ORDER BY cnt DESC, token ASC LIMIT 20
    """,
)
def word_count_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).documents
    tokens = docs.select(F.explode(F.split("text", " ")).alias("token"))
    counts = aggregates.group_count(tokens, "token", alias="cnt")
    return topk.top_k(counts, 20, [("cnt", "desc"), ("token", "asc")])


# F4: negative-index token access — element_at(arr, -1) replaces the
# reference's split+size+getItem double evaluation
# (log_mining_analysis.py:27-28).
@query(
    "last_token",
    oracle="""
    SELECT doc_id AS doc_id, string_split(text, ' ')[-1] AS last_tok
    FROM documents
    """,
)
def last_token(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spark_ml_showcase_spark.functions.strings import token_at

    docs = Catalog(spark, sf_dir).documents
    return docs.select("doc_id", token_at("text", -1, " ").alias("last_tok"))


# TIME-RANGE rolling window (RANGE frame over epoch seconds, not ROWS):
# trailing-hour spend per user at every event. Frame membership depends
# on the ORDER VALUE, so timestamp ties are all-in on both engines —
# deterministic without a tie-break. Decimal accumulation as everywhere.
@query(
    "rolling_hour_user_spend",
    oracle="""
    SELECT event_id AS event_id, user_id AS user_id,
           CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
               PARTITION BY user_id
               ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
               RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS rolling_value
    FROM events
    """,
)
def rolling_hour_user_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    out = windows.time_range_rolling(
        ev,
        "ts",
        F.col("value").cast("decimal(18,2)"),
        ["user_id"],
        3600,
        "rolling_value",
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("ts").cast("long").alias("ts_sec"),
        F.col("rolling_value").cast("double"),
    )


# Equal-frequency quartiles (exact QuantileDiscretizer shape): ntile(4)
# per event_type over (value, event_id) — the unique tie-break makes the
# assignment engine-deterministic — then per-bin count/min/max.
@query(
    "value_quartiles_by_type",
    oracle="""
    SELECT event_type AS event_type, bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(value) AS min_value, MAX(value) AS max_value
    FROM (
        SELECT event_type, value,
               CAST(ntile(4) OVER (
                   PARTITION BY event_type ORDER BY value, event_id
               ) AS BIGINT) AS bin
        FROM events
    )
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def value_quartiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    binned = windows.quantile_bins(
        ev, 4, [("value", "asc"), ("event_id", "asc")], ["event_type"]
    )
    return (
        binned.groupBy("event_type", "bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .orderBy("event_type", "bin")
    )


# EXACT heavy hitters via sketch-then-verify (freqItems candidates →
# exact recount of ≤ 2/support values): tokens covering ≥ 3% of the
# corpus. The sketch pass never shuffles the column; only candidate
# rows reach the verify agg — the high-cardinality-safe shape. The
# oracle replays the exact definition (the sketch only bounds the
# verify pass, so the output is sketch-free).
@query(
    "heavy_hitter_tokens",
    oracle="""
    WITH t AS (SELECT unnest(string_split(text, ' ')) AS token
               FROM documents),
         n AS (SELECT count(*) AS total FROM t)
    SELECT token, CAST(count(*) AS BIGINT) AS cnt
    FROM t GROUP BY token
    HAVING count(*) >= (SELECT CAST(ceil(0.03 * total) AS BIGINT) FROM n)
    ORDER BY token
    """,
)
def heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).documents
    tokens = docs.select(F.explode(F.split("text", " ")).alias("token"))
    return aggregates.heavy_hitters(tokens, "token", 0.03, alias="cnt").orderBy(
        "token"
    )


# Gap-FILLED hourly series per event type: every hour in the table's
# span appears for every type, empty hours at zero — the calendar-spine
# shape rolling/anomaly logic needs. Spine = sequence() off one
# aggregated row × the distinct key set (both tiny, spine broadcast);
# the events table is touched once. Oracle rebuilds the spine with
# generate_series.
@query(
    "dense_hourly_event_counts",
    oracle="""
    WITH b AS (
        SELECT event_type,
               (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS bucket,
               CAST(COUNT(*) AS BIGINT) AS cnt,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM events GROUP BY 1, 2
    ), span AS (
        SELECT min(bucket) AS lo, max(bucket) AS hi FROM b
    ), spine AS (
        SELECT unnest(generate_series(lo, hi, 3600)) AS bucket FROM span
    ), grid AS (
        SELECT t.event_type, s.bucket
        FROM (SELECT DISTINCT event_type FROM events) t, spine s
    )
    SELECT g.event_type AS event_type, g.bucket AS bucket_epoch,
           COALESCE(b.cnt, 0) AS cnt,
           COALESCE(b.total, 0.0) AS total
    FROM grid g LEFT JOIN b ON g.event_type = b.event_type
                           AND g.bucket = b.bucket
    ORDER BY 1, 2
    """,
)
def dense_hourly_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    out = windows.dense_time_buckets(
        ev,
        "ts",
        ["event_type"],
        3600,
        value_col=F.col("value").cast("decimal(18,2)"),
    )
    return out.select(
        "event_type",
        "bucket_epoch",
        "cnt",
        F.col("total").cast("double").alias("total"),
    ).orderBy("event_type", "bucket_epoch")
