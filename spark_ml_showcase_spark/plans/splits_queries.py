"""Split queries (SURVEY.md §2.8 R1-R3).

``temporal_split_train`` is deterministic (row_number with tie-break) and
oracle-checked; the random/stratified splits are seed-dependent, so their
queries return *invariant summaries* (sizes, disjointness, per-stratum
fractions) under rows-only checks, with the hard invariants asserted in
``tests/test_splits.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_ml_showcase_spark.operators import splits
from spark_ml_showcase_spark.functions.rounding import round_like_duckdb
from spark_ml_showcase_spark.plans import query
from spark_ml_showcase_spark.sources.catalog import Catalog


# R3: temporal prefix split (als_clustering_analysis.py:47-49), exact path
# with (ts, event_id) tie-break — deterministic, hence fully oracle-checked.
@query(
    "temporal_split_train",
    oracle="""
    SELECT event_id AS event_id, ts_sec AS ts_sec FROM (
        SELECT event_id,
               CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
               row_number() OVER (ORDER BY ts, event_id) AS rn,
               count(*) OVER () AS n
        FROM events
    ) WHERE rn <= floor(0.8 * n)
    """,
)
def temporal_split_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    train, _ = splits.temporal_split(ev, "ts", "event_id", 0.8, exact=True)
    return train.select(
        "event_id", F.col("ts").cast("long").alias("ts_sec")
    )


# R3 scale path: cutoff temporal split (approxQuantile on the time column
# + plain filter, splits.py exact=False) — the narrow plan to use at
# 100 TB; no global sort, no single-partition window. Boundary is
# approximate → rows-only invariant summary (per-side sizes and time
# ranges; tests assert train∪test partitions the input and
# max(train.ts) ≤ min(test.ts)).
@query("temporal_split_cutoff")
def temporal_split_cutoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Catalog(spark, sf_dir).events
    train, test = splits.temporal_split(ev, "ts", "event_id", 0.8, exact=False)

    def _side(df: DataFrame, name: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("n"),
            F.min(F.col("ts").cast("long")).alias("min_ts_sec"),
            F.max(F.col("ts").cast("long")).alias("max_ts_sec"),
        ).withColumn("split", F.lit(name))

    return (
        _side(train, "train")
        .unionByName(_side(test, "test"))
        .select("split", "n", "min_ts_sec", "max_ts_sec")
    )


# R1 family, oracle-converted in r11 (r10 judge item #7b): the split
# itself is the md5-threshold ``portable_split`` — membership depends
# only on md5(l_orderkey-l_linenumber), so DuckDB replays the exact
# SIZES instead of the old rows-only invariant over seeded randomSplit
# (whose per-partition RNG streams no other engine reproduces). The
# seeded reference surface stays: splits.random_split + the ml_* higgs
# queries still call df.randomSplit(…, seed) per the reference scripts,
# with invariants in tests/test_splits.py. 0.7·2³² = 0xb3333333.
@query(
    "random_split_sizes",
    oracle="""
    SELECT CASE WHEN substr(md5(concat(CAST(l_orderkey AS VARCHAR), '-',
                                       CAST(l_linenumber AS VARCHAR))),
                            1, 8) < 'b3333333'
                THEN 'train' ELSE 'test' END AS split,
           count(*) AS n
    FROM lineitem GROUP BY 1 ORDER BY 1
    """,
)
def random_split_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = Catalog(spark, sf_dir).lineitem
    train, test = splits.portable_split(
        li, ["l_orderkey", "l_linenumber"], 0.7
    )
    t = train.agg(F.count(F.lit(1)).alias("n")).withColumn("split", F.lit("train"))
    s = test.agg(F.count(F.lit(1)).alias("n")).withColumn("split", F.lit("test"))
    return t.unionByName(s).select("split", "n").orderBy("split")


# R2: stratified split, single-pass hash assignment (replaces the
# O(strata)-jobs loop of Claims_Prediction.py:43-54). Per-stratum summary:
# train/test counts and realized train fraction. Deterministic (xxhash64)
# but not SQL-expressible in DuckDB → rows-only.
@query("stratified_split_summary")
def stratified_split_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = Catalog(spark, sf_dir).orders
    train, test = splits.stratified_split(
        orders, "o_orderpriority", ["o_orderkey"], 0.7, seed=40
    )
    tr = train.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_train"))
    te = test.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_test"))
    return (
        tr.join(te, "o_orderpriority", "full_outer")
        .na.fill(0, ["n_train", "n_test"])
        .select(
            "o_orderpriority",
            "n_train",
            "n_test",
            round_like_duckdb(
                F.col("n_train") / (F.col("n_train") + F.col("n_test")), 3
            ).alias("train_frac"),
        )
        .orderBy("o_orderpriority")
    )


# Deterministic stratified downsample: EXACTLY k rows per stratum,
# chosen by md5 order (the engine-portable hash — xxhash64 differs
# across engines, md5 hex strings do not; same trick as domain_mix).
# The training-data-curation shape: cap every class at k with a
# seedless, reproducible, engine-independent pick.
@query(
    "stratified_k_per_type",
    oracle="""
    WITH r AS (
        SELECT event_id, event_type,
               row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY md5(CAST(event_id AS VARCHAR)), event_id
               ) AS rk
        FROM events
    )
    SELECT event_type, event_id FROM r WHERE rk <= 40
    """,
)
def stratified_k_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = Catalog(spark, sf_dir).events
    w = Window.partitionBy("event_type").orderBy(
        F.md5(F.col("event_id").cast("string")), "event_id"
    )
    return (
        ev.select("event_type", "event_id")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 40)
        .select("event_type", "event_id")
    )


# X94: corpus-mixture waterfilling — per-source sampling rates for a
# token budget under target weights, with saturated sources (target
# share > supply) redistributing their unserved budget. 3 unrolled
# rounds; every global sum is exact BIGINT (weights in basis points,
# budget = integer floor-division of the total), per-source demand is
# one multiply + one divide on exact ints, and the final fill ratio is
# rounded with the portable floor(q·1e6+0.5)/1e6 chain. src0/src1 carry
# 30%/20% targets against ~5% supply each, so the saturation +
# redistribution path is exercised at every SF.
@query(
    "mixture_waterfill_sources",
    oracle="""
    WITH sizes AS (
        SELECT source AS s, CAST(SUM(n_chars) AS BIGINT) AS t
        FROM documents GROUP BY source
    ),
    w AS (
        SELECT s, t,
               CAST(CASE WHEN s = 'src0' THEN 3000
                         WHEN s = 'src1' THEN 2000
                         ELSE 250 END AS BIGINT) AS w_bp
        FROM sizes
    ),
    tot AS (SELECT SUM(t) AS tot FROM w),
    r0 AS (SELECT w.*, (tot.tot * 6) // 10 AS B FROM w, tot),
    a1 AS (SELECT max(B) AS B1, SUM(w_bp) AS W1 FROM r0),
    r1 AS (
        SELECT r0.*,
               CAST(a1.B1 AS DOUBLE) * w_bp / a1.W1 AS d,
               (CAST(a1.B1 AS DOUBLE) * w_bp / a1.W1 >= CAST(t AS DOUBLE)
                AND w_bp > 0) AS sat1
        FROM r0, a1
    ),
    a2 AS (
        SELECT max(B) - COALESCE(SUM(CASE WHEN sat1 THEN t END), 0) AS B2,
               COALESCE(SUM(CASE WHEN NOT sat1 THEN w_bp END), 0) AS W2
        FROM r1
    ),
    r2 AS (
        SELECT r1.s, r1.t, r1.w_bp, r1.B, r1.sat1,
               CASE WHEN r1.sat1 THEN r1.d
                    ELSE CAST(a2.B2 AS DOUBLE) * r1.w_bp / a2.W2 END AS d,
               (NOT r1.sat1
                AND CAST(a2.B2 AS DOUBLE) * r1.w_bp / a2.W2
                    >= CAST(r1.t AS DOUBLE)
                AND r1.w_bp > 0) AS sat2
        FROM r1, a2
    ),
    a3 AS (
        SELECT max(B) - COALESCE(SUM(CASE WHEN sat1 OR sat2 THEN t END), 0)
                   AS B3,
               COALESCE(SUM(CASE WHEN NOT (sat1 OR sat2) THEN w_bp END), 0)
                   AS W3
        FROM r2
    ),
    r3 AS (
        SELECT r2.s, r2.t, r2.w_bp, r2.sat1, r2.sat2,
               CASE WHEN r2.sat1 OR r2.sat2 THEN r2.d
                    ELSE CAST(a3.B3 AS DOUBLE) * r2.w_bp / a3.W3 END AS d,
               (NOT (r2.sat1 OR r2.sat2)
                AND CAST(a3.B3 AS DOUBLE) * r2.w_bp / a3.W3
                    >= CAST(r2.t AS DOUBLE)
                AND r2.w_bp > 0) AS sat3
        FROM r2, a3
    )
    SELECT s AS source, t AS t_units, w_bp,
           CAST(CASE WHEN sat1 THEN 1 WHEN sat2 THEN 2
                     WHEN sat3 THEN 3 ELSE 0 END AS BIGINT)
               AS saturated_round,
           CASE WHEN sat1 OR sat2 OR sat3 THEN 1.0
                ELSE floor(d / t * 1000000 + 0.5) / 1000000 END AS fill_rate,
           CAST(CASE WHEN sat1 OR sat2 OR sat3 THEN t
                     ELSE LEAST(t, CAST(floor(d) AS BIGINT)) END AS BIGINT)
               AS alloc_units
    FROM r3 ORDER BY source
    """,
)
def mixture_waterfill_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = Catalog(spark, sf_dir).documents
    return splits.mixture_waterfill(
        docs,
        "source",
        "n_chars",
        {"src0": 3000, "src1": 2000},
        default_bp=250,
        budget_num=6,
        budget_den=10,
        rounds=3,
    )
