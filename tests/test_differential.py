"""Differential fuzzing: hypothesis-generated queries run on BOTH Spark
and DuckDB over the same parquet (SURVEY §5 strategy, generalized).

The 112 registered queries freeze one set of shapes; these properties
sample the predicate/aggregate space around them — random filters,
group-bys, and aggregates over `orders` — and require the two engines
to agree exactly. Counts and decimal-exact sums are order-independent,
so agreement is bit-for-bit, no rounding slop.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
_SETTINGS = dict(max_examples=8, deadline=None)

_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_STATUSES = ["F", "O", "P"]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{SF}/orders.parquet')"
    )
    return con


@pytest.fixture(scope="module")
def ddb_events():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    return con


@settings(**_SETTINGS)
@given(
    st.lists(st.sampled_from(_PRIORITIES), min_size=1, max_size=3, unique=True),
    st.sampled_from(_STATUSES + [None]),
    st.floats(min_value=0, max_value=400_000, allow_nan=False),
    st.sampled_from(["o_orderpriority", "o_orderstatus"]),
)
def test_filtered_grouped_aggregate_parity(spark, ddb, prios, status, price_lo, group_col):
    """Random conjunctive filters + group-by: per-group COUNT and
    decimal-exact SUM(o_totalprice) agree bit-for-bit."""
    df = spark.read.parquet(f"{SF}/orders.parquet").filter(
        F.col("o_orderpriority").isin(prios)
        & (F.col("o_totalprice") >= price_lo)
    )
    cond = (
        "o_orderpriority IN ("
        + ",".join(f"'{p}'" for p in prios)
        + f") AND o_totalprice >= {price_lo!r}"
    )
    if status is not None:
        df = df.filter(F.col("o_orderstatus") == status)
        cond += f" AND o_orderstatus = '{status}'"
    got = {
        (r.g, r.n, r.s)
        for r in df.groupBy(F.col(group_col).alias("g"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(28,6)"))
            .cast("double")
            .alias("s"),
        )
        .collect()
    }
    want = {
        (g, n, s)
        for g, n, s in ddb.execute(
            f"SELECT {group_col}, COUNT(*), "
            f"CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) "
            f"FROM orders WHERE {cond} GROUP BY 1"
        ).fetchall()
    }
    assert got == want


@settings(**_SETTINGS)
@given(
    st.integers(min_value=1, max_value=50),
    st.sampled_from(["ASC", "DESC"]),
)
def test_topk_parity(spark, ddb, k, direction):
    """Random top-k over a totally ordered key list: identical ordered
    prefix on both engines."""
    df = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    col = F.col("o_totalprice")
    ordered = df.orderBy(
        col.asc() if direction == "ASC" else col.desc(),
        F.col("o_orderkey").asc(),
    ).limit(k)
    got = [(r.o_orderkey, r.o_totalprice) for r in ordered.collect()]
    want = ddb.execute(
        f"SELECT o_orderkey, o_totalprice FROM orders "
        f"ORDER BY o_totalprice {direction}, o_orderkey ASC LIMIT {k}"
    ).fetchall()
    assert got == want


@settings(**_SETTINGS)
@given(
    st.integers(min_value=0, max_value=29),  # window start, days into fixture
    st.integers(min_value=1, max_value=10),  # window length, days
    st.lists(
        st.sampled_from(["click", "view", "purchase", "signup", "error"]),
        min_size=1,
        max_size=3,
        unique=True,
    ),
)
def test_events_time_range_parity(spark, ddb_events, day_off, n_days, types):
    """Random event-time ranges + type filters over the ts-normalized
    events table: per-type counts and decimal-exact value sums agree —
    the regression net for the timestamp-normalization path (the one
    surface that has actually broken across fixture generations)."""
    from spark_ml_showcase_spark.sources.catalog import Catalog

    base = 1704067200  # 2024-01-01 UTC, the fixture epoch
    lo = base + day_off * 86400
    hi = lo + n_days * 86400
    ev = Catalog(spark, SF).events
    got = {
        (r.t, r.n, r.s)
        for r in ev.filter(
            F.col("event_type").isin(types)
            & (F.col("ts").cast("long") >= lo)
            & (F.col("ts").cast("long") < hi)
        )
        .groupBy(F.col("event_type").alias("t"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(28,6)")).cast("double").alias("s"),
        )
        .collect()
    }
    tlist = ",".join(f"'{t}'" for t in types)
    want = {
        (t, n, s)
        for t, n, s in ddb_events.execute(
            f"SELECT event_type, COUNT(*), "
            f"CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) FROM events "
            f"WHERE event_type IN ({tlist}) "
            f"AND floor(epoch(ts)) >= {lo} AND floor(epoch(ts)) < {hi} "
            f"GROUP BY 1"
        ).fetchall()
    }
    assert got == want


@pytest.fixture(scope="module")
def ddb_docs():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    return con


@settings(**_SETTINGS)
@given(
    st.sampled_from(["en", "de", "fr", "es", None]),
    st.text(alphabet="abcdefghij", min_size=1, max_size=3),
    st.integers(min_value=0, max_value=200),
)
def test_documents_string_predicate_parity(spark, ddb_docs, lang, needle, min_chars):
    """Random language filters + substring predicates + length bounds
    over documents: counts and whitespace-token totals agree (generative
    net over the text-analysis expression surface)."""
    from spark_ml_showcase_spark.functions import text as T

    docs = spark.read.parquet(f"{SF}/documents.parquet").filter(
        F.col("text").contains(needle) & (F.col("n_chars") >= min_chars)
    )
    cond = (
        f"contains(text, '{needle}') AND n_chars >= {min_chars}"
    )
    if lang is not None:
        docs = docs.filter(F.col("lang") == lang)
        cond += f" AND lang = '{lang}'"
    got = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(T.whitespace_token_count("text").cast("bigint")), F.lit(0)
        ).alias("toks"),
    ).first()
    want = ddb_docs.execute(
        r"SELECT COUNT(*), COALESCE(SUM(len(list_filter("
        r"string_split_regex(text, '\s+'), x -> x <> ''))), 0) "
        f"FROM documents WHERE {cond}"
    ).fetchone()
    assert (got.n, got.toks) == want


@pytest.fixture(scope="module")
def ddb_join():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{SF}/orders.parquet')"
    )
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM read_parquet('{SF}/customer.parquet')"
    )
    return con


@settings(**_SETTINGS)
@given(
    st.sampled_from(["inner", "left", "left_semi", "left_anti"]),
    st.sampled_from(["MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE"]),
    st.sampled_from(_PRIORITIES),
)
def test_join_type_parity(spark, ddb_join, how, segment, prio):
    """Random join types with filters on both sides: row counts agree.
    Semi/anti are the subtle cases (existence semantics, null handling);
    left-outer checks preserved-row counting."""
    c = spark.read.parquet(f"{SF}/customer.parquet").filter(
        F.col("c_mktsegment") == segment
    )
    o = spark.read.parquet(f"{SF}/orders.parquet").filter(
        F.col("o_orderpriority") == prio
    )
    got = c.join(o, c.c_custkey == o.o_custkey, how).count()
    sql = {
        "inner": "SELECT COUNT(*) FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey AND o.o_orderpriority = '{p}' WHERE c.c_mktsegment = '{s}'",
        "left": "SELECT COUNT(*) FROM customer c LEFT JOIN (SELECT * FROM orders WHERE o_orderpriority = '{p}') o ON c.c_custkey = o.o_custkey WHERE c.c_mktsegment = '{s}'",
        "left_semi": "SELECT COUNT(*) FROM customer c WHERE c.c_mktsegment = '{s}' AND EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '{p}')",
        "left_anti": "SELECT COUNT(*) FROM customer c WHERE c.c_mktsegment = '{s}' AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '{p}')",
    }[how].format(p=prio, s=segment)
    (want,) = ddb_join.execute(sql).fetchone()
    assert got == want


@settings(**_SETTINGS)
@given(
    st.integers(min_value=1, max_value=5),
    st.sampled_from(["click", "purchase", "view"]),
)
def test_window_running_sum_parity(spark, ddb_events, nth, etype):
    """Analytic windows: the running decimal-exact value sum at every
    user's nth event (ordered by ts, event_id) agrees across engines."""
    from pyspark.sql.window import Window

    from spark_ml_showcase_spark.sources.catalog import Catalog

    ev = Catalog(spark, SF).events.filter(F.col("event_type") == etype)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    got = {
        (r.user_id, r.s)
        for r in ev.withColumn(
            "s",
            F.sum(F.col("value").cast("decimal(28,6)")).over(w).cast("double"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == nth)
        .select("user_id", "s")
        .collect()
    }
    want = {
        (u, s)
        for u, s in ddb_events.execute(
            f"""
            SELECT user_id, CAST(s AS DOUBLE) FROM (
              SELECT user_id,
                     SUM(CAST(value AS DECIMAL(28,6)))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS s,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS rn
              FROM events WHERE event_type = '{etype}'
            ) WHERE rn = {nth}
            """
        ).fetchall()
    }
    assert got == want


@settings(**_SETTINGS)
@given(
    st.sampled_from(_PRIORITIES),
    st.sampled_from(_PRIORITIES),
    st.sampled_from(["except", "intersect", "union"]),
)
def test_set_op_parity(spark, ddb, p1, p2, op):
    """Random EXCEPT/INTERSECT/UNION (distinct semantics) over filtered
    key sets: Spark's set operators match DuckDB's."""
    a = spark.read.parquet(f"{SF}/orders.parquet").filter(
        F.col("o_orderpriority") == p1
    ).select("o_custkey")
    b = spark.read.parquet(f"{SF}/orders.parquet").filter(
        F.col("o_orderpriority") == p2
    ).select("o_custkey")
    got = {
        "except": a.subtract(b),  # EXCEPT DISTINCT, matching SQL EXCEPT
        "intersect": a.intersect(b),
        "union": a.union(b).distinct(),
    }[op].count()
    sql_op = {"except": "EXCEPT", "intersect": "INTERSECT", "union": "UNION"}[op]
    (want,) = ddb.execute(
        f"SELECT COUNT(*) FROM ("
        f"SELECT o_custkey FROM orders WHERE o_orderpriority = '{p1}' "
        f"{sql_op} "
        f"SELECT o_custkey FROM orders WHERE o_orderpriority = '{p2}')"
    ).fetchone()
    assert got == want


@settings(**_SETTINGS)
@given(st.sampled_from(["ROLLUP", "CUBE"]), st.sampled_from(_STATUSES + [None]))
def test_rollup_cube_parity(spark, ddb, shape, status):
    """Random ROLLUP/CUBE over (priority, status): every grouping level's
    counts and decimal-exact sums agree, including the NULL supergroup
    markers."""
    df = spark.read.parquet(f"{SF}/orders.parquet")
    cond = "1=1"
    if status is not None:
        df = df.filter(F.col("o_orderstatus") == status)
        cond = f"o_orderstatus = '{status}'"
    grouped = (
        df.rollup("o_orderpriority", "o_orderstatus")
        if shape == "ROLLUP"
        else df.cube("o_orderpriority", "o_orderstatus")
    )
    got = {
        (r.p, r.s, r.n, r.t)
        for r in grouped.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(28,6)"))
            .cast("double")
            .alias("t"),
        )
        .select(
            F.col("o_orderpriority").alias("p"),
            F.col("o_orderstatus").alias("s"),
            "n",
            "t",
        )
        .collect()
    }
    want = {
        (p, s, n, t)
        for p, s, n, t in ddb.execute(
            f"SELECT o_orderpriority, o_orderstatus, COUNT(*), "
            f"CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) "
            f"FROM orders WHERE {cond} "
            f"GROUP BY {shape}(o_orderpriority, o_orderstatus)"
        ).fetchall()
    }
    assert got == want


@settings(**_SETTINGS)
@given(
    st.lists(st.sampled_from(_PRIORITIES), min_size=1, max_size=3, unique=True),
    st.floats(min_value=0, max_value=300_000, allow_nan=False),
)
def test_profile_table_parity(spark, ddb, prios, price_lo):
    """Differential family 9: the table PROFILER over randomly filtered
    orders slices agrees with DuckDB per column — n_rows, nulls, exact
    distinct, min/max, decimal-exact mean — bit-for-bit."""
    from spark_ml_showcase_spark.operators.profile import profile_table

    cond = (
        "o_orderpriority IN ("
        + ",".join(f"'{p}'" for p in prios)
        + f") AND o_totalprice >= {price_lo!r}"
    )
    df = spark.read.parquet(f"{SF}/orders.parquet").filter(
        F.col("o_orderpriority").isin(prios) & (F.col("o_totalprice") >= price_lo)
    )
    got = {
        (r.col_name, r.n_rows, r.n_nulls, r.n_distinct, r.min_num, r.max_num, r.mean)
        for r in profile_table(df, ["o_orderkey", "o_custkey", "o_totalprice"]).collect()
    }
    want = set()
    for c in ("o_orderkey", "o_custkey", "o_totalprice"):
        row = ddb.execute(
            f"SELECT COUNT(*), "
            f"CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT), "
            f"CAST(COUNT(DISTINCT {c}) AS BIGINT), "
            f"ROUND(CAST(MIN({c}) AS DOUBLE), 6), "
            f"ROUND(CAST(MAX({c}) AS DOUBLE), 6), "
            f"ROUND(CAST(SUM(CAST({c} AS DECIMAL(28,6))) / COUNT({c}) AS DOUBLE), 6) "
            f"FROM orders WHERE {cond}"
        ).fetchone()
        want.add((c, *row))
    assert got == want


_EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]


def _funnel_oracle_sql(steps: list[str]) -> str:
    """Chained conditional-min CTEs for an arbitrary step list — the
    generative twin of the frozen funnel_view_click_purchase oracle."""
    ctes = [
        "u0 AS (SELECT user_id, "
        f"min(CASE WHEN event_type = '{steps[0]}' THEN ts END) AS s0 "
        "FROM events GROUP BY user_id)"
    ]
    for i, step in enumerate(steps[1:], start=1):
        prev_cols = ", ".join(f"u{i-1}.s{j}" for j in range(i))
        ctes.append(
            f"u{i} AS (SELECT e.user_id, {prev_cols}, "
            f"min(CASE WHEN e.event_type = '{step}' AND e.ts > u{i-1}.s{i-1} "
            f"THEN e.ts END) AS s{i} "
            f"FROM events e JOIN u{i-1} ON e.user_id = u{i-1}.user_id "
            f"GROUP BY e.user_id, {prev_cols})"
        )
    last = len(steps) - 1
    counts = ", ".join(f"count(s{i}) AS c{i}" for i in range(len(steps)))
    return f"WITH {', '.join(ctes)} SELECT {counts} FROM u{last}"


@settings(**_SETTINGS)
@given(
    st.lists(
        st.sampled_from(_EVENT_TYPES), min_size=2, max_size=4, unique=True
    )
)
def test_funnel_parity(spark, ddb_events, steps):
    """Family 10: strict-order funnels over RANDOM step sequences must
    agree with the chained-CTE replay — counts are exact ints."""
    from spark_ml_showcase_spark.operators import analytics
    from spark_ml_showcase_spark.sources.catalog import Catalog

    ev = Catalog(spark, SF).events.select("user_id", "event_type", "ts")
    out = analytics.funnel(ev, steps)
    got = [r["users"] for r in out.orderBy("step_idx").collect()]
    want = list(ddb_events.execute(_funnel_oracle_sql(steps)).fetchone())
    assert got == want, (steps, got, want)


@settings(**_SETTINGS)
@given(st.integers(min_value=0, max_value=40))
def test_cohort_retention_parity(spark, ddb_events, max_off):
    """Family 10b: cohort retention under a random offset ceiling."""
    from spark_ml_showcase_spark.operators import analytics
    from spark_ml_showcase_spark.sources.catalog import Catalog

    ev = Catalog(spark, SF).events.select("user_id", "ts")
    got = {
        (r["cohort_day"], r["day_offset"]): r["users"]
        for r in analytics.cohort_retention(ev, max_offset=max_off).collect()
    }
    want = {
        (d, o): u
        for d, o, u in ddb_events.execute(
            f"""
            WITH a AS (
                SELECT user_id AS u, CAST(ts AS DATE) AS day,
                       min(CAST(ts AS DATE)) OVER (PARTITION BY user_id) AS cohort
                FROM events
            )
            SELECT strftime(cohort, '%Y-%m-%d'),
                   CAST(day - cohort AS BIGINT),
                   CAST(count(DISTINCT u) AS BIGINT)
            FROM a WHERE day - cohort <= {max_off} GROUP BY 1, 2
            """
        ).fetchall()
    }
    assert got == want


@settings(**_SETTINGS)
@given(st.sampled_from([0.02, 0.03, 0.05, 0.08, 0.12]))
def test_heavy_hitters_parity(spark, ddb_docs, support):
    """Family 11: sketch-then-verify heavy hitters equal the exact
    HAVING replay for random supports — the sketch must never lose a
    qualifying token."""
    from spark_ml_showcase_spark.operators import aggregates

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    tokens = docs.select(F.explode(F.split("text", " ")).alias("token"))
    got = {
        (r["token"], r["cnt"])
        for r in aggregates.heavy_hitters(tokens, "token", support).collect()
    }
    want = {
        (t, c)
        for t, c in ddb_docs.execute(
            f"""
            WITH t AS (SELECT unnest(string_split(text, ' ')) AS token
                       FROM documents),
                 n AS (SELECT count(*) AS total FROM t)
            SELECT token, CAST(count(*) AS BIGINT)
            FROM t GROUP BY token
            HAVING count(*) >= (SELECT CAST(ceil({support} * total) AS BIGINT)
                                FROM n)
            """
        ).fetchall()
    }
    assert got == want


@settings(**_SETTINGS)
@given(
    st.integers(min_value=0, max_value=30),
    st.integers(min_value=1, max_value=80),
)
def test_class_balance_cap_parity(spark, ddb_docs, cap, en_cap):
    """Family 11b: the md5-ordered per-class cap equals the QUALIFY
    replay for random caps and overrides."""
    from spark_ml_showcase_spark.operators import splits

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    kept = splits.class_balance_cap(docs, "lang", "doc_id", cap, caps={"en": en_cap})
    got = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    want = sorted(
        r[0]
        for r in ddb_docs.execute(
            f"""
            SELECT doc_id FROM (
                SELECT doc_id, lang,
                       row_number() OVER (
                           PARTITION BY lang
                           ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 16),
                                    doc_id) AS rn
                FROM documents
            ) WHERE rn <= CASE lang WHEN 'en' THEN {en_cap} ELSE {cap} END
            """
        ).fetchall()
    )
    assert got == want


@settings(**_SETTINGS)
@given(st.sampled_from([60, 300, 900, 3600, 7200, 86400]))
def test_time_range_rolling_parity(spark, ddb_events, lookback):
    """Family 12: RANGE-frame rolling sums for random lookbacks — the
    tie-inclusive frame must agree exactly (decimal accumulation)."""
    from spark_ml_showcase_spark.operators import windows as W
    from spark_ml_showcase_spark.sources.catalog import Catalog

    ev = Catalog(spark, SF).events
    out = W.time_range_rolling(
        ev, "ts", F.col("value").cast("decimal(18,2)"), ["user_id"],
        lookback, "roll",
    ).select(
        "event_id", F.col("roll").cast("double").alias("roll")
    )
    got = {(r["event_id"], r["roll"]) for r in out.collect()}
    want = set(
        ddb_events.execute(
            f"""
            SELECT event_id,
                   CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
                       PARTITION BY user_id
                       ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                       RANGE BETWEEN {lookback} PRECEDING AND CURRENT ROW
                   ) AS DOUBLE)
            FROM events
            """
        ).fetchall()
    )
    assert got == want


@pytest.fixture(scope="module")
def ddb_tpch():
    con = duckdb.connect()
    for t in ("lineitem", "part", "orders", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


@settings(**_SETTINGS)
@given(
    st.sampled_from(["PROMO", "ECONOMY", "STANDARD", "SMALL", "LARGE"]),
    st.integers(min_value=0, max_value=23),
)
def test_conditional_revenue_share_parity(spark, ddb_tpch, ptype, month_off):
    """Family 13: Q14-shape conditional revenue share for a RANDOM part
    type and month. Numerator and denominator are exact decimal sums of
    (12,2)×(8,6) products; the double division rounds to 6dp LAST, so
    the two engines' ratios are bit-comparable. A month with no matching
    lineitem yields no row on both sides; a month with volume but none
    of the chosen type yields NULL share on both."""
    from spark_ml_showcase_spark.sources.catalog import Catalog

    y, m = 1996 + month_off // 12, 1 + month_off % 12
    lo = f"{y}-{m:02d}-01"
    hi = f"{y + (m == 12)}-{(m % 12) + 1:02d}-01"
    cat = Catalog(spark, SF)
    li = cat.lineitem.filter(
        (F.to_date("l_shipdate") >= F.lit(lo))
        & (F.to_date("l_shipdate") < F.lit(hi))
    )
    p = cat.part
    vol = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(8,6)")
    got = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.sum(F.when(F.col("p_type") == ptype, vol)).cast("double")
                / F.sum(vol).cast("double"),
                6,
            ).alias("share"),
            F.count(F.lit(1)).alias("n"),
        )
        .filter(F.col("n") > 0)
        .select("share")
        .collect()
    )
    want = ddb_tpch.execute(
        f"""
        SELECT ROUND(
            CAST(SUM(CASE WHEN p.p_type = '{ptype}' THEN
                CAST(l_extendedprice AS DECIMAL(12,2))
                * CAST(1 - l_discount AS DECIMAL(8,6)) END) AS DOUBLE)
            / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * CAST(1 - l_discount AS DECIMAL(8,6))) AS DOUBLE), 6)
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE CAST(l_shipdate AS DATE) >= DATE '{lo}'
          AND CAST(l_shipdate AS DATE) < DATE '{hi}'
        HAVING COUNT(*) > 0
        """
    ).fetchall()
    assert [r["share"] for r in got] == [w[0] for w in want]


@settings(**_SETTINGS)
@given(
    st.sampled_from(_PRIORITIES),
    st.floats(min_value=-1000, max_value=5000, allow_nan=False),
)
def test_global_threshold_anti_join_parity(spark, ddb_tpch, prio, bal_lo):
    """Family 14: Q22-shape — customers above the average balance of
    the bal > bal_lo cohort with NO order of a RANDOM priority, counted
    per segment. The threshold comparison is division-free
    (bal·n > total over exact decimals), so the cohort boundary is
    bit-identical on both engines for ANY random cutoff."""
    from spark_ml_showcase_spark.sources.catalog import Catalog

    c = Catalog(spark, SF).customer
    o = Catalog(spark, SF).orders
    bal = F.col("c_acctbal").cast("decimal(12,2)")
    pos = c.filter(F.col("c_acctbal") > bal_lo).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(bal).alias("tot"),
    )
    got = {
        (r["c_mktsegment"], r["cnt"])
        for r in c.crossJoin(F.broadcast(pos))
        .filter(bal * F.col("n") > F.col("tot"))
        .join(
            o.filter(F.col("o_orderpriority") == prio).select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .collect()
    }
    want = set(
        ddb_tpch.execute(
            f"""
            WITH pos AS (
                SELECT CAST(COUNT(*) AS BIGINT) AS n,
                       SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS tot
                FROM customer WHERE c_acctbal > {bal_lo!r}
            )
            SELECT c.c_mktsegment, CAST(COUNT(*) AS BIGINT)
            FROM customer c, pos
            WHERE CAST(c.c_acctbal AS DECIMAL(12,2)) * pos.n > pos.tot
              AND NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_orderpriority = '{prio}')
            GROUP BY c.c_mktsegment
            """
        ).fetchall()
    )
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    st.sampled_from([300, 1800, 7200]),
    st.sampled_from([600, 1800, 3600]),
    st.sampled_from([600, 1800, 3600, 9000]),
)
def test_interval_overlap_parity(spark, ddb_events, span_l, span_r, width):
    """Family 15: the grid interval-overlap join for RANDOM interval
    spans and bucket widths must equal DuckDB's naive theta join — the
    bucket width is a physical knob, never a semantic one, and the
    reporting-cell dedup must hold for every span/width combination
    (spans below, equal to, and far above the cell size)."""
    from spark_ml_showcase_spark.operators.intervals import (
        interval_overlap_join,
    )
    from spark_ml_showcase_spark.sources.catalog import Catalog

    ev = Catalog(spark, SF).events
    mk = lambda t, span, idc, loc: (  # noqa: E731
        ev.filter(F.col("event_type") == t).select(
            "user_id",
            F.col("event_id").alias(idc),
            F.col("ts").cast("long").alias(loc),
            (F.col("ts").cast("long") + span).alias(loc[0] + "hi"),
        )
    )
    out = interval_overlap_join(
        mk("view", span_l, "lid", "llo"),
        mk("click", span_r, "rid", "rlo"),
        "llo",
        "lhi",
        "rlo",
        "rhi",
        bucket_width=width,
        on=["user_id"],
    ).select("lid", "rid")
    got = {(r.lid, r.rid) for r in out.collect()}
    want = set(
        ddb_events.execute(
            f"""
            WITH v AS (SELECT user_id, event_id,
                              CAST(floor(epoch(ts)) AS BIGINT) s
                       FROM events WHERE event_type = 'view'),
                 c AS (SELECT user_id, event_id,
                              CAST(floor(epoch(ts)) AS BIGINT) s
                       FROM events WHERE event_type = 'click')
            SELECT v.event_id, c.event_id
            FROM v JOIN c ON v.user_id = c.user_id
               AND v.s < c.s + {span_r} AND c.s < v.s + {span_l}
            """
        ).fetchall()
    )
    assert got == want and len(want) > 0


@settings(max_examples=4, deadline=None)
@given(
    st.integers(min_value=2, max_value=5),
    st.sampled_from(["hour", "day"]),
)
def test_hypertable_rollup_parity(spark, ddb_events, m, bucket):
    """Family 16: the continuous aggregate built from a RANDOM batch
    split at a RANDOM granularity — including the KMV distinct state in
    its exact regime — must equal the one-shot GROUP BY. Every batch
    after the first is late data for every bucket, so this fuzzes the
    partial-state merge path end to end."""
    import shutil
    import tempfile

    from spark_ml_showcase_spark.operators import hypertable
    from spark_ml_showcase_spark.sources.catalog import Catalog

    ev = Catalog(spark, SF).events
    tdir = tempfile.mkdtemp(prefix="smss_diff_rollup_")
    try:
        for i in range(m):
            hypertable.rollup_refresh(
                spark,
                tdir,
                ev.filter(F.col("event_id") % m == i),
                time_col="ts",
                value_col="value",
                keys=["event_type"],
                bucket=bucket,
                distinct_col="user_id",
                kmv_k=512,
            )
        out = hypertable.rollup_read(spark, tdir, kmv_k=512).select(
            "bucket_sec",
            "event_type",
            "n_events",
            "sum_value",
            F.col("distinct_est").cast("bigint").alias("du"),
        )
        got = {tuple(r) for r in out.collect()}
    finally:
        shutil.rmtree(tdir, ignore_errors=True)
    want = set(
        ddb_events.execute(
            f"""
            SELECT CAST(floor(epoch(date_trunc('{bucket}', ts))) AS BIGINT),
                   event_type,
                   CAST(COUNT(*) AS BIGINT),
                   CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE),
                   CAST(COUNT(DISTINCT user_id) AS BIGINT)
            FROM events GROUP BY 1, 2
            """
        ).fetchall()
    )
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    st.sampled_from(
        [("view", "click"), ("view", "purchase"), ("signup", "error"),
         ("click", "purchase")]
    ),
    st.integers(min_value=0, max_value=20),
)
def test_kmv_exact_regime_set_algebra_parity(spark, ddb_events, pair, day_lo):
    """Family 17: below k the KMV sketch IS the distinct set, so the
    union/Jaccard/intersection estimators must equal DuckDB's exact set
    arithmetic — not approximately, EXACTLY — for random type pairs and
    random day windows (including windows where one side is empty)."""
    from spark_ml_showcase_spark.functions import kmv
    from spark_ml_showcase_spark.sources.catalog import Catalog

    ta, tb = pair
    lo = 1704067200 + day_lo * 86400
    hi = lo + 7 * 86400
    ev = Catalog(spark, SF).events.filter(
        (F.col("ts").cast("long") >= lo) & (F.col("ts").cast("long") < hi)
    )
    k = 4096
    sk = kmv.kmv_sketch(ev, ["event_type"], "user_id", k=k)
    a = sk.filter(F.col("event_type") == ta).select(
        F.col("sketch").alias("sa")
    )
    b = sk.filter(F.col("event_type") == tb).select(
        F.col("sketch").alias("sb")
    )
    got = (
        a.crossJoin(b)
        .select(
            kmv.kmv_estimate(kmv.kmv_merge("sa", "sb", k=k), k=k).alias("u"),
            kmv.kmv_intersection("sa", "sb", k=k).alias("i"),
        )
        .collect()
    )
    want = ddb_events.execute(
        f"""
        WITH a AS (SELECT DISTINCT user_id FROM events
                   WHERE event_type = '{ta}'
                     AND CAST(floor(epoch(ts)) AS BIGINT) >= {lo}
                     AND CAST(floor(epoch(ts)) AS BIGINT) < {hi}),
             b AS (SELECT DISTINCT user_id FROM events
                   WHERE event_type = '{tb}'
                     AND CAST(floor(epoch(ts)) AS BIGINT) >= {lo}
                     AND CAST(floor(epoch(ts)) AS BIGINT) < {hi})
        SELECT (SELECT COUNT(*) FROM (SELECT * FROM a UNION SELECT * FROM b)),
               (SELECT COUNT(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b))
        """
    ).fetchall()[0]
    if not got:  # one side empty at this window: nothing to compare
        n_a = ddb_events.execute(
            f"SELECT COUNT(DISTINCT user_id) FROM events WHERE event_type = '{ta}'"
            f" AND CAST(floor(epoch(ts)) AS BIGINT) >= {lo}"
            f" AND CAST(floor(epoch(ts)) AS BIGINT) < {hi}"
        ).fetchone()[0]
        n_b = ddb_events.execute(
            f"SELECT COUNT(DISTINCT user_id) FROM events WHERE event_type = '{tb}'"
            f" AND CAST(floor(epoch(ts)) AS BIGINT) >= {lo}"
            f" AND CAST(floor(epoch(ts)) AS BIGINT) < {hi}"
        ).fetchone()[0]
        assert n_a == 0 or n_b == 0
        return
    assert got[0].u == float(want[0])
    assert got[0].i == float(want[1])


@settings(**_SETTINGS)
@given(
    st.sampled_from([600, 1800, 3600, 7200]),
    st.integers(min_value=2, max_value=7),
)
def test_sessionize_parity(spark, ddb_events, gap, mod):
    """Differential family 18: inactivity-gap sessionization over a
    random user slice at a random gap — session numbering, sizes and
    epoch bounds are all integers, so agreement is bit-for-bit."""
    from spark_ml_showcase_spark.operators.analytics import sessionize
    from spark_ml_showcase_spark.sources.catalog import Catalog

    # Catalog, not a raw read: the fixture's TIMESTAMP_NTZ needs the
    # same physical-type normalization the registered queries get
    df = Catalog(spark, SF).events.filter(F.col("user_id") % mod == 0)
    got = {
        (r.user_id, r.session_seq): (r.n_events, r.start_epoch, r.end_epoch)
        for r in sessionize(df, gap_seconds=gap).collect()
    }
    rows = ddb_events.execute(
        f"""
        WITH e AS (
            SELECT user_id, ts, event_id,
                   CAST(floor(epoch(ts)) AS BIGINT) AS ep
            FROM events WHERE user_id % {mod} = 0
        ),
        m AS (
            SELECT user_id, ts, event_id, ep,
                   CASE WHEN lag(ep) OVER w IS NULL THEN 1
                        WHEN ep - lag(ep) OVER w > {gap} THEN 1
                        ELSE 0 END AS ns
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        n AS (
            SELECT user_id, ep,
                   CAST(sum(ns) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS seq
            FROM m
        )
        SELECT user_id, seq, COUNT(*), MIN(ep), MAX(ep)
        FROM n GROUP BY 1, 2
        """
    ).fetchall()
    want = {(u, s): (c, lo, hi) for u, s, c, lo, hi in rows}
    assert got == want


@settings(**_SETTINGS)
@given(
    st.integers(min_value=1, max_value=10_000),
    st.integers(min_value=8, max_value=40),
)
def test_triangle_count_parity(spark, seed, n_nodes):
    """Differential family 19: exact triangle counting on a random
    graph — the degree-oriented wedge join vs DuckDB's id-ordered
    triple join (the count is orientation-invariant)."""
    import duckdb

    from spark_ml_showcase_spark.operators.graph import triangle_count

    rng = __import__("numpy").random.default_rng(seed)
    n_edges = min(n_nodes * 3, n_nodes * (n_nodes - 1) // 2)
    pairs = set()
    while len(pairs) < n_edges:
        a, b = rng.integers(0, n_nodes, size=2)
        if a != b:
            pairs.add((int(min(a, b)), int(max(a, b))))
    edges = sorted(pairs)
    got = triangle_count(
        spark.createDataFrame(edges, "u bigint, v bigint")
    ).collect()[0]
    con = duckdb.connect()
    con.execute("CREATE TABLE e (u BIGINT, v BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?)", edges)
    want = con.execute(
        """
        SELECT count(*) FROM e e1
        JOIN e e2 ON e1.v = e2.u
        JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
        """
    ).fetchone()[0]
    assert got.n_triangles == want
    assert got.n_edges == len(edges)
