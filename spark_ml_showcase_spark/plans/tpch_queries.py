"""TPC-H query-shape coverage, part 2 (round 8): Q7/Q8/Q10/Q13/Q14/
Q15/Q17/Q22 adapted to the driver's TPC-H-ish testdata schema.

The testdata lacks ``partsupp``, ``l_shipmode``, ``l_commitdate``,
``c_phone``, ``o_comment`` and friends, so each query keeps its
CANONICAL PLAN SHAPE — the thing worth testing — with the filter
rewritten onto an available column (noted per query). Shapes covered
here and not elsewhere in the registry:

- Q7: one dimension in TWO ROLES (nation aliased for supplier and
  customer sides) under a symmetric OR predicate;
- Q8: conditional market-share ratio over a 7-table join tree;
- Q10: multi-fact join + agg + deterministic top-20;
- Q13: LEFT OUTER join with an ON-clause predicate, then a histogram
  of group sizes (double aggregation);
- Q14: conditional-numerator revenue ratio (CASE inside SUM);
- Q15: aggregate → scalar-max self-filter (the "view" query);
- Q17: per-group average threshold (decorrelated correlated subquery);
- Q22: global exact-arithmetic scalar threshold + anti-join.

Cross-engine determinism follows the repo rules (plans/__init__.py):
money sums via DECIMAL before SUM (exact, order-independent) and
DOUBLE after; products on narrow scales (12,2)×(8,6); ratios rounded
to 6dp AFTER a double division; derived ints BIGINT; every ORDER BY
carries a unique tie-break. Q22's threshold comparison is kept EXACT
by clearing the division: ``bal * n > total`` over decimals instead of
``bal > total/n`` — no float boundary to disagree on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_ml_showcase_spark.plans import query
from spark_ml_showcase_spark.sources.catalog import Catalog


def _dec_price(c: str) -> F.Column:
    return F.col(c).cast("decimal(12,2)")


def _dec_vol(price: str, disc: str) -> F.Column:
    # (12,2) × (8,6) → well inside 38 digits; the (20,8) result sums
    # exactly (see tpch_q1_pricing_summary for the overflow history)
    return _dec_price(price) * (F.lit(1) - F.col(disc)).cast("decimal(8,6)")


_SQL_VOL = (
    "CAST(l_extendedprice AS DECIMAL(12,2))"
    " * CAST(1 - l_discount AS DECIMAL(8,6))"
)


# Q7 volume shipping: which of two nations shipped how much to the
# other, per year. The nation dim joins TWICE (supplier role, customer
# role) — both broadcast — under the symmetric OR pair predicate.
# Adaptation: nations are NATION_0..24 here; the classic
# FRANCE/GERMANY pair becomes NATION_1/NATION_2.
@query(
    "tpch_q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(date_part('year', l.l_shipdate) AS BIGINT) AS l_year,
           CAST(ROUND(SUM({_SQL_VOL}), 2) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND CAST(l.l_shipdate AS DATE) >= DATE '1996-01-01'
      AND CAST(l.l_shipdate AS DATE) < DATE '1998-01-01'
    GROUP BY 1, 2, 3
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    li, s, o, c = cat.lineitem, cat.supplier, cat.orders, cat.customer
    n1 = cat.nation.select(
        F.col("n_nationkey").alias("_snk"), F.col("n_name").alias("supp_nation")
    )
    n2 = cat.nation.select(
        F.col("n_nationkey").alias("_cnk"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    j = (
        li.filter(
            (F.to_date("l_shipdate") >= F.lit("1996-01-01"))
            & (F.to_date("l_shipdate") < F.lit("1998-01-01"))
        )
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("_snk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("_cnk"))
        .filter(pair)
    )
    return (
        j.groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(
            # decimal-domain ROUND before the double cast (Q1 convention)
            F.round(F.sum(_dec_vol("l_extendedprice", "l_discount")), 2)
            .cast("double")
            .alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# Q8 national market share: NATION_1's share of AMERICA-market revenue
# for one part type, per order year. Adaptation: p_type = 'ECONOMY'
# stands in for the classic 'ECONOMY ANODIZED STEEL'. A year with no
# NATION_1 volume yields NULL share on both engines (SUM over no rows).
@query(
    "tpch_q8_market_share",
    oracle=f"""
    WITH vol AS (
        SELECT CAST(date_part('year', o.o_orderdate) AS BIGINT) AS o_year,
               {_SQL_VOL} AS volume,
               n2.n_name AS supp_nation
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'ECONOMY'
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
        JOIN region r ON n1.n_regionkey = r.r_regionkey
                     AND r.r_name = 'AMERICA'
        JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
    )
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_1'
                               THEN volume END) AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
    FROM vol GROUP BY o_year ORDER BY o_year
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    li, o, c = cat.lineitem, cat.orders, cat.customer
    p = cat.part.filter(F.col("p_type") == "ECONOMY")
    s = cat.supplier
    n1 = cat.nation.select(
        F.col("n_nationkey").alias("_cnk"), F.col("n_regionkey").alias("_rk")
    )
    n2 = cat.nation.select(
        F.col("n_nationkey").alias("_snk"), F.col("n_name").alias("supp_nation")
    )
    r = cat.region.filter(F.col("r_name") == "AMERICA").select("r_regionkey")
    vol = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("_cnk"))
        .join(F.broadcast(r), F.col("_rk") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("_snk"))
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            _dec_vol("l_extendedprice", "l_discount").alias("volume"),
            "supp_nation",
        )
    )
    return (
        vol.groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_1", F.col("volume"))
                ).cast("double")
                / F.sum("volume").cast("double"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# Q10 returned-item reporting: customers who returned goods, by lost
# revenue, one quarter, top 20 with a unique tie-break.
@query(
    "tpch_q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           CAST(ROUND(SUM({_SQL_VOL}), 2) AS DOUBLE) AS revenue,
           c.c_acctbal, n.n_name, c.c_mktsegment
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
                   AND l.l_returnflag = 'R'
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE CAST(o.o_orderdate AS DATE) >= DATE '1996-10-01'
      AND CAST(o.o_orderdate AS DATE) < DATE '1997-01-01'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name, c.c_mktsegment
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    c, o, n = cat.customer, cat.orders, cat.nation
    li = cat.lineitem.filter(F.col("l_returnflag") == "R")
    j = (
        c.join(
            o.filter(
                (F.to_date("o_orderdate") >= F.lit("1996-10-01"))
                & (F.to_date("o_orderdate") < F.lit("1997-01-01"))
            ),
            c.c_custkey == o.o_custkey,
        )
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    )
    return (
        j.groupBy("c_custkey", "c_name", "c_acctbal", "n_name", "c_mktsegment")
        .agg(
            F.round(F.sum(_dec_vol("l_extendedprice", "l_discount")), 2)
            .cast("double")
            .alias("revenue")
        )
        .select(
            "c_custkey", "c_name", "revenue", "c_acctbal", "n_name", "c_mktsegment"
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# Q13 customer order-count distribution: LEFT OUTER join with the
# filter in the ON clause (customers keep their row when every order is
# filtered away), then a histogram of per-customer counts. Adaptation:
# the classic o_comment NOT LIKE filter becomes "exclude 1-URGENT".
@query(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
        SELECT c.c_custkey,
               CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
        FROM customer c
        LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                          AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    c = cat.customer
    o = cat.orders.filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("bigint").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# Q14 promo effect: share of one month's revenue from PROMO-type parts
# — the CASE-inside-SUM conditional ratio, exact decimal sums, double
# division rounded last.
@query(
    "tpch_q14_promo_effect",
    oracle=f"""
    SELECT ROUND(
        CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN {_SQL_VOL} END)
             AS DOUBLE)
        / CAST(SUM({_SQL_VOL}) AS DOUBLE), 6) AS promo_revenue_share
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE CAST(l.l_shipdate AS DATE) >= DATE '1996-09-01'
      AND CAST(l.l_shipdate AS DATE) < DATE '1996-10-01'
    """,
)
def tpch_q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    li = cat.lineitem.filter(
        (F.to_date("l_shipdate") >= F.lit("1996-09-01"))
        & (F.to_date("l_shipdate") < F.lit("1996-10-01"))
    )
    p = cat.part
    vol = _dec_vol("l_extendedprice", "l_discount")
    return li.join(F.broadcast(p), li.l_partkey == p.p_partkey).agg(
        F.round(
            F.sum(F.when(F.col("p_type") == "PROMO", vol)).cast("double")
            / F.sum(vol).cast("double"),
            6,
        ).alias("promo_revenue_share")
    )


# Q15 top supplier: quarterly revenue per supplier, keep the maximum.
# The scalar-max self-filter runs on the EXACT decimal revenue (the
# double cast happens only on output), so the equality cannot straddle
# a float boundary. The aggregate frame is |suppliers| rows — the max
# join broadcasts.
@query(
    "tpch_q15_top_supplier",
    oracle=f"""
    WITH rev AS (
        SELECT l_suppkey AS supplier_no,
               SUM({_SQL_VOL}) AS total_rev
        FROM lineitem
        WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
          AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(ROUND(r.total_rev, 2) AS DOUBLE) AS total_revenue
    FROM supplier s
    JOIN rev r ON s.s_suppkey = r.supplier_no
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
    ORDER BY s.s_suppkey
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    rev = (
        cat.lineitem.filter(
            (F.to_date("l_shipdate") >= F.lit("1996-01-01"))
            & (F.to_date("l_shipdate") < F.lit("1996-04-01"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_dec_vol("l_extendedprice", "l_discount")).alias("total_rev"))
    )
    mx = rev.agg(F.max("total_rev").alias("_mx"))
    top = rev.join(F.broadcast(mx), rev.total_rev == mx._mx)
    s = cat.supplier
    return (
        s.join(F.broadcast(top), s.s_suppkey == top.supplier_no)
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_rev", 2).cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


# Q17 small-quantity-order revenue: average yearly revenue lost if
# small orders (below 20% of the part's average quantity) were not
# filled, for one brand. The correlated per-part AVG decorrelates into
# an aggregate + equi-join; quantities are integral doubles, so the
# average is exact and the 0.2× threshold is bit-identical on both
# engines. Adaptation: p_brand = 'Brand#2' (no p_container column).
@query(
    "tpch_q17_small_quantity",
    oracle="""
    WITH lim AS (
        SELECT l_partkey, 0.2 * AVG(l_quantity) AS qty_lim
        FROM lineitem GROUP BY l_partkey
    )
    SELECT ROUND(
        CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
        / 7.0, 6) AS avg_yearly
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey AND p.p_brand = 'Brand#2'
    JOIN lim ON l.l_partkey = lim.l_partkey
    WHERE l.l_quantity < lim.qty_lim
    """,
)
def tpch_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    li = cat.lineitem
    lim = li.groupBy(F.col("l_partkey").alias("_pk")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_lim")
    )
    p = cat.part.filter(F.col("p_brand") == "Brand#2").select("p_partkey")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(lim, li.l_partkey == lim._pk)
        .filter(F.col("l_quantity") < F.col("qty_lim"))
        .agg(
            F.round(
                F.sum(_dec_price("l_extendedprice")).cast("double") / F.lit(7.0),
                6,
            ).alias("avg_yearly")
        )
    )


# Q22 global-relationship opportunity: customers with above-average
# positive balance and NO urgent order, per market segment. The global
# threshold stays EXACT by clearing the division — bal·n > total over
# decimals — and the NO-orders test is a LEFT ANTI join. Adaptation:
# no c_phone country codes; segments group the output, and "never
# placed an order" becomes "never placed a 1-URGENT order" (every
# customer here has orders).
@query(
    "tpch_q22_global_sales_opportunity",
    oracle="""
    WITH pos AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_pos,
               SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS total_pos
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
               AS totacctbal
    FROM customer c, pos
    WHERE CAST(c.c_acctbal AS DECIMAL(12,2)) * pos.n_pos > pos.total_pos
      AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderpriority = '1-URGENT'
      )
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
)
def tpch_q22_global_sales_opportunity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    cat = Catalog(spark, sf_dir)
    c = cat.customer
    bal = F.col("c_acctbal").cast("decimal(12,2)")
    pos = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pos"),
        F.sum(bal).alias("total_pos"),
    )
    urgent = cat.orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_custkey"
    )
    rich = c.crossJoin(F.broadcast(pos)).filter(
        bal * F.col("n_pos") > F.col("total_pos")
    )
    return (
        rich.join(urgent, rich.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("numcust"),
            F.sum(bal).cast("double").alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )
