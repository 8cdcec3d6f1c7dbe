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
# set with no prior-round record), followed by the rest in registration
# order. Rotate this list each round so no query goes more than ~2
# rounds without a fresh CORRECTNESS record.
_FRONT_R3 = [
    # new this round (oracle-carrying first)
    "stream_parquet_sink_hourly",
    "latest_event_per_user_type",
    "near_dup_components",
    "chunk_documents_64_8",
    "scrub_pii_docs",
    "orc_sink_roundtrip",
    "clf_report_txt_sink",
    "salted_join_event_types",
    "temporal_split_cutoff",
    "winnow_overlap_pairs",
    # oracle typing fixed this round (r2 hash-FAIL -> expect green)
    "csv_scan_header",
    "clf_country_report",
    "json_scan_agg",
    # implementation re-parameterized this round
    "embedding_near_dup_survivors",
]


def _ordered(d: dict) -> dict:
    front = {k: d[k] for k in _FRONT_R3 if k in d}
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
