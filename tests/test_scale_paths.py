"""Scale-path proofs (SCALE.md claims made checkable): bucketed tables
join without an exchange on the bucket key; full-data retrain extracts
the CV winner's params; broadcast hints land in the plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_ml_showcase_spark.operators import joins


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_is_exchange_free(spark, tmp_path):
    spark.sql("DROP TABLE IF EXISTS bt_left")
    spark.sql("DROP TABLE IF EXISTS bt_right")
    left = spark.createDataFrame(
        [(i, f"l{i}") for i in range(1000)], "k bigint, lv string"
    )
    right = spark.createDataFrame(
        [(i, f"r{i}") for i in range(1000)], "k bigint, rv string"
    )
    left.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("bt_left")
    right.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("bt_right")
    joined = spark.table("bt_left").join(spark.table("bt_right"), "k")
    # disable auto-broadcast so the co-located join is what we observe
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan  # bucket co-location
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bt_left")
        spark.sql("DROP TABLE IF EXISTS bt_right")


def test_broadcast_hint_in_plan(spark):
    big = spark.createDataFrame([(i % 5, i) for i in range(1000)], "k bigint, v bigint")
    small = spark.createDataFrame([(i, f"n{i}") for i in range(5)], "k bigint, name string")
    plan = _plan(joins.broadcast_join(big, small, "k"))
    assert "BroadcastHashJoin" in plan


def test_retrain_with_best_gbt_branch(spark):
    # GBTClassificationModel also inherits getNumTrees from
    # _TreeEnsembleModel, so a hasattr check would route GBT winners down
    # the RF branch and crash — this pins the isinstance dispatch.
    from pyspark.ml.classification import GBTClassifier
    from pyspark.ml.tuning import ParamGridBuilder

    from spark_ml_showcase_spark.ml import ensembles, features, fixtures

    data = fixtures.higgs(spark, n=300)
    model = ensembles.gbt(maxIter=3, maxDepth=2)
    pipe = features.pipeline([features.assembler(fixtures.HIGGS_FEATURES)], model)
    grid = (
        ParamGridBuilder()
        .addGrid(model.maxIter, [2, 3])
        .build()
    )
    cv = ensembles.cross_validate(pipe, grid, num_folds=2, parallelism=4)
    fitted_cv = cv.fit(data)
    assembled = features.assembler(fixtures.HIGGS_FEATURES).transform(data)
    full = ensembles.retrain_with_best(fitted_cv, GBTClassifier, assembled)
    best = fitted_cv.bestModel.stages[-1]
    assert full.getMaxIter() == best.getMaxIter()
    assert full.getMaxDepth() == best.getMaxDepth()
    assert full.transform(assembled).count() == 300


def test_retrain_with_best_extracts_cv_params(spark):
    from pyspark.ml.classification import RandomForestClassifier

    from spark_ml_showcase_spark.ml import ensembles, features, fixtures

    data = fixtures.higgs(spark, n=300)
    model = ensembles.rf()
    pipe = features.pipeline([features.assembler(fixtures.HIGGS_FEATURES)], model)
    cv = ensembles.cross_validate(
        pipe, ensembles.small_rf_grid(model), num_folds=2, parallelism=4
    )
    fitted_cv = cv.fit(data)
    assembled = features.assembler(fixtures.HIGGS_FEATURES).transform(data)
    full = ensembles.retrain_with_best(fitted_cv, RandomForestClassifier, assembled)
    best = fitted_cv.bestModel.stages[-1]
    assert full.getNumTrees == best.getNumTrees
    assert full.getSubsamplingRate() == best.getSubsamplingRate()
    assert full.transform(assembled).count() == 300


def test_aqe_skew_join_splits_partitions(spark):
    """AQE's runtime skew-join handling — the first line of defense
    SCALE.md prescribes before reaching for `salted_join` — actually
    fires: with the skew thresholds forced low, a join against a
    pathologically hot key finishes with the sort-merge join marked
    skew=true in the final adaptive plan (the hot partition was split)."""
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1KB",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        big = spark.range(0, 60_000).select(
            # 95% of rows share key 0; the rest spread over 1000 keys
            F.when(F.col("id") % 20 != 0, F.lit(0))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.concat(F.lit("payload_"), F.col("id")).alias("v"),
        )
        dim = spark.range(0, 1000).select(
            F.col("id").alias("k"), F.col("id").alias("d")
        )
        joined = big.join(dim, "k")
        # execute THIS DataFrame's own query execution (count() would plan
        # a different query and leave this one's adaptive plan unfinalized)
        assert len(joined.collect()) == 60_000
        final = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final, final[:2000]
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_runtime_bloom_filter_prunes_shuffle_join(spark, tmp_path):
    """Runtime row-level filtering: with the bloom-filter optimization
    on, a selective dim side injects a might_contain() pre-filter into
    the fact scan of a shuffle join — rows that cannot match are dropped
    BEFORE the exchange (the runtime complement of static pushdown and
    DPP)."""
    import os

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        d = str(tmp_path)
        spark.range(500_000).select(
            F.col("id").alias("k"), (F.col("id") % 97).alias("v")
        ).write.parquet(os.path.join(d, "fact"))
        spark.range(50_000).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("f")
        ).write.parquet(os.path.join(d, "dim"))
        fact = spark.read.parquet(os.path.join(d, "fact"))
        dim = spark.read.parquet(os.path.join(d, "dim")).filter(F.col("f") == 3)
        joined = fact.join(dim, "k")
        plan = _plan(joined)
        assert "might_contain" in plan and "bloom_filter_agg" in plan
        assert joined.count() == 50_000 // 7 + (1 if 3 < 50_000 % 7 else 0)
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_skew_and_zipf_use_distributed_topk_not_global_window(
    spark, monkeypatch
):
    """X103/X105 scale claim: the hot-key and vocabulary rankings take a
    distributed top-k (TakeOrderedAndProject — per-partition heads)
    FIRST and window only inside the tiny survivor frame; a global
    row_number over the whole key space would serialize the corpus
    through one partition. zipf's localCheckpoint would hide its subtree
    from the executed plan, so checkpointing is stubbed to identity here
    (plan-shape inspection only — values are the oracle's job)."""
    # Spark 4: sessions build pyspark.sql.classic.dataframe.DataFrame —
    # patching the pyspark.sql.DataFrame facade would not reach instances
    from pyspark.sql.classic.dataframe import DataFrame

    from spark_ml_showcase_spark.plans.analytics_queries import (
        key_skew_diagnosis,
    )
    from spark_ml_showcase_spark.plans.text_ir_queries import zipf_vocab_slope

    monkeypatch.setattr(
        DataFrame, "localCheckpoint", lambda self, eager=True: self
    )
    sf = "/root/testdata/sf0.001"
    for q in (key_skew_diagnosis, zipf_vocab_slope):
        plan = _plan(q(spark, sf))
        assert "TakeOrderedAndProject" in plan, q.__name__
