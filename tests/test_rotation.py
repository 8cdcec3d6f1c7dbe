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


def test_every_stale_query_fits_in_window():
    """Every registered query whose latest driver record is older than
    the newest round — plus every query with no record at all — must sit
    inside the first _WINDOW registry entries, i.e. it WILL get a fresh
    record next driver run. If this fails, the registry has outgrown the
    window: split queries across rounds deliberately (and loudly)."""
    names = _registry_names()
    latest = plans.latest_correctness_rounds()
    max_round = max(latest.values(), default=0)
    stale = [q for q in names if latest.get(q, 0) < max_round]
    window = set(names[: plans._WINDOW])
    missed = [q for q in stale if q not in window]
    assert not missed, (
        f"{len(stale)} stale queries for {plans._WINDOW} window slots; "
        f"these would go another round without evidence: {missed}"
    )


def test_order_is_new_first_then_oldest_record():
    names = _registry_names()
    latest = plans.latest_correctness_rounds()
    ranks = [latest.get(q, -1) for q in names]
    assert ranks == sorted(ranks), "registry not ordered by record age"
    # ties broken by name => fully deterministic order
    keyed = [(latest.get(q, -1), q) for q in names]
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
