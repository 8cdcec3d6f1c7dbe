"""Self-auditing driver-window rotation (judge verdict r4, next-round #2).

The driver's correctness harness checks only the first ``_WINDOW``
registry entries per round, so a query's freshness depends on the
registry ORDER. These tests pin the contract: the order is derived from
the committed CORRECTNESS_r*.json artifacts (oldest record first, new
queries in front), and every query needing fresh evidence fits inside
the window — the failure mode this replaces was a hand-maintained pin
list that silently missed 4 two-round-stale queries in round 4.

No SparkSession needed: these run on the registry/artifact metadata.
"""

from __future__ import annotations

from spark_ml_showcase_spark import plans


def _registry_names() -> list[str]:
    return list(plans.registry())


def test_every_stale_query_fits_in_window_or_defers_loudly():
    """Every registered query whose latest driver record is older than
    the newest round — plus every query with no record at all — should
    sit inside the first _WINDOW registry entries, i.e. get a fresh
    record next driver run. Once the registry exceeds 2×window, that is
    mathematically impossible (pigeonhole): the overflow is then allowed
    ONLY under the deliberate deferral contract — each deferred query is
    rows-only (never oracle-checked), already has a clean record at most
    one round older than the newest, and the overflow is small. The
    oracle-first subsort in ``plans.front_order`` is what steers the
    overflow onto rows-only queries."""
    names = _registry_names()
    latest = plans.latest_correctness_rounds()
    max_round = max(latest.values(), default=0)
    stale = [q for q in names if latest.get(q, 0) < max_round]
    window = set(names[: plans._WINDOW])
    missed = [q for q in stale if q not in window]
    capacity = 2 * plans._WINDOW
    if len(names) <= capacity:
        assert not missed, (
            f"{len(stale)} stale queries for {plans._WINDOW} window slots; "
            f"these would go another round without evidence: {missed}"
        )
        return
    oracles = set(plans.oracles())
    assert len(missed) <= len(names) - capacity + 2, (
        f"overflow {missed} larger than the registry growth explains"
    )
    for q in missed:
        assert q not in oracles, (
            f"oracle-checked query {q!r} deferred past the window — the "
            "overflow must land on rows-only queries"
        )
        assert latest.get(q, 0) >= max_round - 1, (
            f"deferred query {q!r} last recorded in round {latest.get(q, 0)} "
            f"(newest {max_round}) — would go >2 rounds without evidence"
        )


def test_order_is_new_first_then_oldest_record():
    names = _registry_names()
    latest = plans.latest_correctness_rounds()
    ranks = [latest.get(q, -1) for q in names]
    assert ranks == sorted(ranks), "registry not ordered by record age"
    # within an age group: oracle-checked first, then name => overflow
    # falls on rows-only queries, and the order is fully deterministic
    oracles = set(plans.oracles())
    keyed = [(latest.get(q, -1), 0 if q in oracles else 1, q) for q in names]
    assert keyed == sorted(keyed), "registry order not deterministic"


def test_artifacts_cover_only_known_or_renamed_queries():
    """Every registered query either has a driver record already or is
    new enough to be in the front window (sanity: artifact names and
    registry names stay in sync through renames)."""
    names = set(_registry_names())
    latest = plans.latest_correctness_rounds()
    recorded = set(latest)
    # records for queries no longer registered are tolerated (renames
    # leave history behind) but registered-and-never-recorded queries
    # must be inside the window or they will never gain evidence
    never = names - recorded
    window = set(_registry_names()[: plans._WINDOW])
    assert never <= window, f"unrecorded queries outside window: {never - window}"
