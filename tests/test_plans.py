"""Plan-shape regression tests: pin the physical properties SCALE.md
claims — top-k without global sort, filters pushed to the scan, explicit
broadcasts, single-exchange dedup. These catch silent plan regressions
(a lost broadcast hint, a filter that stops pushing) that row-level
correctness checks cannot see."""

from __future__ import annotations

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_topk_plans_take_ordered(spark):
    qs = entry.queries()
    plan = _plan(qs["topk_suppliers_by_qty"](spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan.split("TakeOrderedAndProject")[0]


def test_project_cast_rename_pushes_filter_and_prunes(spark):
    qs = entry.queries()
    plan = _plan(qs["project_cast_rename"](spark, SF))
    assert "PushedFilters: [" in plan and "l_quantity" in plan
    # column pruning: the scan must NOT read the full 16-col lineitem
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_returnflag" not in read and "l_shipdate" not in read


def test_revenue_by_region_broadcasts_dims(spark):
    qs = entry.queries()
    plan = _plan(qs["revenue_by_region"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_exact_dedup_single_exchange(spark):
    qs = entry.queries()
    plan = _plan(qs["exact_dedup_docs"](spark, SF))
    # one hash-partitioning exchange on the fingerprint, nothing else
    assert plan.count("Exchange hashpartitioning") == 1


def test_cosine_topk_broadcasts_query_side(spark):
    qs = entry.queries()
    plan = _plan(qs["cosine_topk_bruteforce"](spark, SF))
    assert "BroadcastNestedLoopJoin" in plan  # candidates stream once


def test_winnow_no_cartesian_and_broadcast_guard(spark):
    qs = entry.queries()
    plan = _plan(qs["winnow_overlap_pairs"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the hot-fingerprint guard is a broadcast LEFT ANTI join
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_embedding_near_dup_no_cartesian_and_broadcast_guard(spark):
    qs = entry.queries()
    plan = _plan(qs["embedding_near_dup_survivors"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "LeftAnti" in plan  # hot-bucket guard + survivor anti-join


def test_orc_scan_pushes_filters(spark, tmp_path):
    from pyspark.sql import functions as F

    from spark_ml_showcase_spark.sources import io

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "k bigint, v double"
    )
    out = str(tmp_path / "orc_push")
    io.write_orc(df, out)
    back = io.read_orc(spark, out, "k").filter(F.col("k") > 50)
    plan = _plan(back)
    assert "PushedFilters: [" in plan and "k" in plan
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "v" not in read  # column pruning reaches the ORC reader


def test_dpp_prunes_fact_partitions(spark):
    from spark_ml_showcase_spark.plans import pruning_queries

    plan = _plan(pruning_queries.dpp_join(spark, SF))
    # the day-partitioned fact scan must carry a runtime pruning subquery
    # fed by the filtered dim, not a full scan of all 30 day partitions
    assert "dynamicpruning" in plan.lower()
    fact_scan = next(
        ln for ln in plan.splitlines() if "events_by_day" in ln and "FileScan" in ln
    )
    assert "day" in fact_scan


def test_decontaminate_broadcasts_benchmark_side(spark):
    qs = entry.queries()
    plan = _plan(qs["decontaminate_ngram"](spark, SF))
    # benchmark shingle set joins as a broadcast: the corpus side streams
    # with no shuffle of text; the only hash exchange keys the final
    # per-doc count (plus AQE's optional coalesce reads)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "SortMergeJoin" not in plan


def test_domain_mix_sample_is_narrow_filter(spark):
    qs = entry.queries()
    plan = _plan(qs["domain_mix_sample"](spark, SF))
    # pure filter + sort for output ordering: no join, no aggregation
    assert "Join" not in plan and "HashAggregate" not in plan
    # only the two output columns are read
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "text" not in read and "n_chars" not in read


def test_boilerplate_no_text_crosses_exchange(spark):
    """X10 scale claim: gram hashing happens inside the scan stage — the
    shuffles carry (id, long) and counts, never gram/text strings."""
    qs = entry.queries()
    df = qs["boilerplate_ngram_report"](spark, SF)
    plan = _plan(df)
    assert "CartesianProduct" not in plan
    for chunk in plan.split("Exchange")[1:]:
        header = chunk.splitlines()[0]
        assert "text" not in header and "_g" not in header, header
    # Python stays in the scan stage: exactly the gram-array evaluator,
    # nothing Python downstream of an exchange
    assert plan.count("ArrowEvalPython") == 2  # one per gram pass


def test_bigram_lm_broadcasts_vocab_scalar(spark):
    """X11: the 1-row vocab-size side is broadcast, never shuffled, and
    nothing in the plan is a cartesian product over instance rows."""
    qs = entry.queries()
    plan = _plan(qs["bigram_lm_scores"](spark, SF))
    assert "BroadcastNestedLoopJoin" in plan  # vocab scalar
    assert "CartesianProduct" not in plan


def test_gopher_zero_exchange_scan_to_project(spark):
    """X7 after the round-5 rewrite: per-doc metrics need NO shuffle —
    the only exchange tolerated is none at all (pure scan → Arrow UDF →
    project plan)."""
    qs = entry.queries()
    plan = _plan(qs["gopher_repetition_flags"](spark, SF))
    body = plan.split("AdaptiveSparkPlan")[-1]
    assert "Exchange hashpartitioning" not in body
    assert "ArrowEvalPython" in body


def test_shipping_priority_plan(spark):
    """TPC-H Q3 shape: top-10 via TakeOrderedAndProject (no global
    sort), date filters pushed to BOTH fact scans, segment-filtered
    customer broadcast, lineitem scan pruned to 3 columns."""
    qs = entry.queries()
    plan = _plan(qs["shipping_priority_top10"](spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan.split("TakeOrderedAndProject")[0]
    assert "LessThan(o_orderdate" in plan
    assert "GreaterThan(l_shipdate" in plan
    assert "BroadcastHashJoin" in plan
    # lineitem scan reads only join key + money columns (+ the filter col)
    li_read = [
        seg.split("ReadSchema:")[1].splitlines()[0]
        for seg in plan.split("FileScan parquet")
        if "lineitem.parquet" in seg
    ][0]
    assert "l_quantity" not in li_read and "l_returnflag" not in li_read


def test_local_supplier_volume_plan(spark):
    """TPC-H Q5 shape: the cycle-closing supplier join is a HASH join on
    the composite (l_suppkey, c_nationkey) key — never a cartesian — and
    the fixed-size dims broadcast."""
    qs = entry.queries()
    plan = _plan(qs["local_supplier_volume_asia"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 3
    # composite-key supplier join present: both key columns in one join
    assert "s_suppkey" in plan and "s_nationkey" in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_bucketed_sales_join_exchange_free(spark):
    """The materialized bucketed layout makes orders⋈lineitem a
    sort-merge join with NO Exchange on either input (bucket
    co-location); broadcast disabled so the SMJ is what we observe."""
    from spark_ml_showcase_spark.plans import pruning_queries as pq

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(pq.bucketed_sales_join(spark, SF))
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_explicit_broadcast_survives_disabled_auto_threshold(spark):
    """The engine's dimension broadcasts are EXPLICIT hints, not
    autoBroadcastJoinThreshold luck: with the threshold off entirely,
    revenue_by_region still broadcast-joins region/nation."""
    qs = entry.queries()
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(qs["revenue_by_region"](spark, SF))
        assert "BroadcastHashJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_correlated_scalar_subquery_is_decorrelated(spark):
    """Catalyst must rewrite the per-row scalar subquery into ONE
    aggregate + join — no repeated-scan subquery remains in the
    physical plan."""
    qs = entry.queries()
    plan = _plan(qs["above_priority_avg_orders"](spark, SF))
    assert "Subquery" not in plan or "SubqueryBroadcast" in plan, plan
    assert plan.count("HashAggregate") >= 2  # partial+final of the avg
    assert "Join" in plan


def test_exists_and_in_subqueries_plan_as_semi_joins(spark):
    qs = entry.queries()
    q4 = _plan(qs["tpch_q4_priority_check"](spark, SF))
    assert "LeftSemi" in q4, q4
    q18 = _plan(qs["tpch_q18_large_volume_orders"](spark, SF))
    assert "LeftSemi" in q18, q18


def test_tpch_part2_plan_shapes(spark):
    """Round-8 TPC-H additions: the canonical physical property of each
    shape — broadcast dims in the role-playing and share joins, an
    anti-join for Q22's NOT EXISTS, an outer join that SURVIVES into
    the Q13 physical plan (the ON-clause filter must not degrade it to
    inner), and no CartesianProduct anywhere."""
    qs = entry.queries()
    q7 = _plan(qs["tpch_q7_volume_shipping"](spark, SF))
    assert q7.count("BroadcastHashJoin") >= 3, q7  # s + two nation roles
    assert "CartesianProduct" not in q7
    q8 = _plan(qs["tpch_q8_market_share"](spark, SF))
    assert q8.count("BroadcastHashJoin") >= 4, q8
    assert "CartesianProduct" not in q8
    q13 = _plan(qs["tpch_q13_customer_distribution"](spark, SF))
    assert "LeftOuter" in q13, q13
    q22 = _plan(qs["tpch_q22_global_sales_opportunity"](spark, SF))
    assert "LeftAnti" in q22, q22
    q15 = _plan(qs["tpch_q15_top_supplier"](spark, SF))
    assert "BroadcastHashJoin" in q15, q15  # scalar-max frame broadcast
    q17 = _plan(qs["tpch_q17_small_quantity"](spark, SF))
    # the correlated AVG is a plain aggregate + join, not a re-scan
    assert "HashAggregate" in q17 and "Join" in q17


def test_tpch_part3_plan_shapes(spark):
    """The last eight TPC-H shapes (round 8). Pins: Q19's derivable
    single-side disjunctions reach the part scan as a PushedFilters Or
    (the mixed OR-of-ANDs cannot push on its own); Q16's NOT IN plans
    as a LeftAnti; Q2's correlated MAX decorrelates into a window (no
    re-scan, no cartesian); Q21's double self-correlation costs exactly
    ONE distinct-count aggregation over the order key, not three fact
    scans; Q11's global threshold is a broadcast single-row nested
    loop (the allowlisted Q22 shape)."""
    qs = entry.queries()
    q19 = _plan(qs["tpch_q19_disjunctive_revenue"](spark, SF))
    assert "PushedFilters: [Or(" in q19, q19  # brand/size residue on part scan
    assert "CartesianProduct" not in q19
    q16 = _plan(qs["tpch_q16_part_supplier_cnt"](spark, SF))
    assert "LeftAnti" in q16, q16
    q2 = _plan(qs["tpch_q2_min_cost_supplier"](spark, SF))
    assert "Window" in q2 and "CartesianProduct" not in q2, q2
    q21 = _plan(qs["tpch_q21_waiting_orders"](spark, SF))
    # lineitem is scanned for the base late rows and once more for the
    # per-order distinct counts — a THIRD fact scan means the
    # decorrelation regressed to the naive EXISTS/NOT-EXISTS form
    fact_scans = sum(
        1 for ln in q21.splitlines() if "FileScan" in ln and "lineitem" in ln
    )
    assert fact_scans <= 2, q21
    q11 = _plan(qs["tpch_q11_important_stock"](spark, SF))
    assert "BroadcastNestedLoopJoin" in q11, q11
    q9 = _plan(qs["tpch_q9_product_profit"](spark, SF))
    assert q9.count("BroadcastHashJoin") >= 3, q9  # p, s, n all broadcast


def test_triangle_count_wedge_broadcast_pinned(spark):
    """r14 verdict: one bench run saw AQE demote the CLOSING join's
    broadcast to a sort-merge under session heap pressure, shuffling
    the O(m^1.5) wedge set — 416 MB vs the normal 13.4 MB, a 30×
    amplification decided at runtime. The strategy is now explicit in
    triangle_count (measured edge count vs threshold → F.broadcast the
    oriented build side or merge-pinned shuffle, never AQE's call):
    the checkpointed oriented list is the plan's leaf; above it the
    closing join must carry the un-revokable broadcast hint and the
    wedge self-join the merge pin."""
    qs = entry.queries()
    plan = _plan(qs["triangle_count_suppliers"](spark, SF))
    assert "BroadcastHashJoin" in plan, plan   # closing join, pinned
    assert "SortMergeJoin" in plan, plan       # wedge join, merge-pinned


def test_interval_overlap_join_plan_is_hash_join_no_dedup(spark):
    """The grid interval join must plan as a hash equi-join on
    (user_id, cell) — never a cartesian/BNLJ theta join — and the
    reporting-cell trick must leave NO aggregate in the plan (a
    HashAggregate would mean a distinct crept back in)."""
    qs = entry.queries()
    plan = _plan(qs["interval_overlap_view_purchase"](spark, SF))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "HashAggregate" not in plan, plan
