"""Query plans: the engine's headline queries + DuckDB oracle SQL.

Each query is registered with :func:`query` and exposed through
``registry()`` / ``oracles()``, which ``__spark_entry__.py`` re-exports to
the driver. Cross-engine determinism rules (why these queries hash-match
DuckDB bit-for-bit):

- **Money sums are decimal-exact**: doubles carrying 2-decimal values are
  cast to DECIMAL before SUM (exact, order-independent) and back to double
  after — a float sum's result depends on partition order, a decimal sum's
  doesn't.
- **Derived integers are BIGINT on both sides** (DuckDB's count/date_part
  default to int64).
- **Every ordering has a unique tie-break column** — LIMIT without a total
  order is nondeterministic under partitioning.
- **Transcendental outputs are rounded** (round 6) — ln/cosine differ in
  the last ulp between libm implementations.
- **Timestamps are compared as epoch seconds (BIGINT)** — both engines
  truncate the parquet ns values to µs, and epoch-int output dodges
  timestamp formatting/precision drift.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a (spark, sf_dir) -> DataFrame query; ``oracle`` is the
    equivalent DuckDB SQL (omit for non-SQL-expressible ops — the driver
    then records a rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


# The driver's correctness harness checks the FIRST 50 registry entries
# per round, so entries needing fresh driver evidence are pinned to the
# front explicitly (new queries, changed queries, fixed oracles, and the
# set whose latest driver record is oldest), followed by the rest in
# registration order. Rotate this list each round so no query goes more
# than ~2 rounds without a fresh CORRECTNESS record. Unknown names RAISE
# (a renamed/removed query must be removed from the pin list explicitly,
# not silently dropped — that's how rotation quietly decays).
_FRONT_R4 = [
    # new this round (oracle-carrying first)
    "clf_png_artifacts",
    "multimodal_features_decoded",
    "dpp_events_mondays",
    "stream_exact_dedup",
    "near_dup_components_star",
    "ann_recall_report",
    # oracle rewritten this round (series bound now derived, expect green)
    "chunk_documents_64_8",
    # new corpus-assembly operators (X6-X9), added later in round 4
    "decontaminate_ngram",
    "gopher_repetition_flags",
    "domain_mix_sample",
    "pack_sequences_256",
    # latest driver record is r2 (two rounds stale) — rotate back in
    "ann_topk_lsh",
    "approx_distinct_suppliers",
    "cached_two_branch_report",
    "clean_corpus_funnel",
    "clf_day_hour_counts",
    "frame_sample_stats",
    "grouping_sets_qty",
    "ivf_topk",
    "minhash_near_dup_pairs",
    "ml_als_default_vs_custom",
    "ml_als_metrics",
    "ml_claims_models",
    "ml_claims_regparam_curve",
    "ml_confusion_matrix_rf",
    "ml_feature_importances_rf",
    "ml_gbt_higgs",
    "ml_kmeans_cluster_genres",
    "ml_rf_cv_higgs",
    "multimodal_features",
    "orders_per_month",
    "outer_join_nation_customers",
    "parquet_sink_roundtrip",
    "price_stats_per_flag",
    "quantile_sketch_prices",
    "range_join_value_bands",
    "semi_join_urgent_customers",
    "simhash_near_dup_pairs",
    "sorted_prefix_orders",
    "sql_api_priority_revenue",
    "statuses_per_customer",
    "text_quality_lang",
    "text_stats",
    "tfidf_top_terms",
    "top1_order",
    "user_spend_percentiles",
]


def _ordered(d: dict) -> dict:
    unknown = [k for k in _FRONT_R4 if k not in d]
    if unknown:
        raise KeyError(
            f"front-pin list names unregistered queries {unknown}; "
            "update _FRONT_R4 alongside query renames/removals"
        )
    front = {k: d[k] for k in _FRONT_R4}
    return front | {k: v for k, v in d.items() if k not in front}


def registry() -> dict[str, QueryFn]:
    _load_all()
    return _ordered(_QUERIES)


def oracles() -> dict[str, str]:
    _load_all()
    return dict(_ORACLES)


def _load_all() -> None:
    # Import side-effect registration; deferred so `import plans` stays cheap.
    #
    # Module order backs the _FRONT_R3 pinning: round 3 front-loads the 29
    # queries that had no r2 driver record (splits, streaming, relational's
    # window/event-time tail); coverage/extensions/ml — all green or
    # rows-clean in r2 — take the tail and rotate back in next round.
    from spark_ml_showcase_spark.plans import (  # noqa: F401
        splits_queries,
        streaming_queries,
        relational,
        pruning_queries,
        logs_queries,
        coverage_queries,
        joins_queries,
        extensions,
        ml_queries,
    )
