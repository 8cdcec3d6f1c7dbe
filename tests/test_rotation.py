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
    mathematically impossible (pigeonhole): the worst-case refresh
    cadence becomes ceil(N / window) rounds, and the overflow is allowed
    ONLY under the deliberate deferral contract:

    - bounded: at most N − 2×window + a small slack of stale queries
      defer (i.e. exactly the amount the capacity shortfall forces);
    - fresh enough: no deferred query has aged past the steady-state
      cadence — its latest clean record is at most ceil(N/window) − 1
      driver runs old (for N ≤ 2×window this is the strict "at most one
      run older than the newest" bound; each window past 2× buys the
      tail one more run, exactly what round-robin over N queries with a
      fixed window mathematically forces);
    - rows-only pay first: within the age group the window boundary
      cuts, every rows-only query defers before any oracle-checked one
      does (the oracle-first subsort in ``plans.front_order``) — an
      oracle-checked query defers only when its whole age group no
      longer fits.
    """
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
    missed_set = set(missed)
    import math

    cadence = math.ceil(len(names) / plans._WINDOW)
    for q in missed:
        assert latest.get(q, 0) >= max_round - (cadence - 1), (
            f"deferred query {q!r} last recorded in round {latest.get(q, 0)} "
            f"(newest {max_round}) — would age past the ceil(N/window)="
            f"{cadence} cadence"
        )
        if q in oracles:
            # an oracle-checked deferral is legal only once every
            # rows-only query of the same age group is deferred too
            group_rows_only = [
                g
                for g in names
                if latest.get(g, -1) == latest.get(q, -1) and g not in oracles
            ]
            not_deferred = [g for g in group_rows_only if g not in missed_set]
            assert not not_deferred, (
                f"oracle-checked {q!r} deferred while rows-only peers "
                f"{not_deferred} kept window slots — rows-only must pay first"
            )


def test_order_is_new_first_then_oldest_record():
    """Registry order = effective-evidence age. For oracle-checked
    queries only oracle-compared records count (a rows-only→✓SQL
    conversion sorts with the unrecorded bucket until the driver has
    run its oracle once — r10 verdict: text_quality_lang)."""
    names = _registry_names()
    latest = plans.latest_correctness_rounds()
    latest_oracle = plans.latest_correctness_rounds(oracle_checked_only=True)
    oracles = set(plans.oracles())

    def rank(q):
        effective = latest_oracle if q in oracles else latest
        return (effective.get(q, -1), 0 if q in oracles else 1, q)

    keyed = [rank(q) for q in names]
    assert keyed == sorted(keyed), "registry not ordered by effective evidence age"


def test_oracle_conversion_sorts_to_front():
    """A query whose every green record is rows-only but which now has a
    registered oracle must sit inside the driver window — its strongest
    check has never been driver-recorded."""
    names = _registry_names()
    latest = plans.latest_correctness_rounds()
    latest_oracle = plans.latest_correctness_rounds(oracle_checked_only=True)
    oracles = set(plans.oracles())
    window = set(names[: plans._WINDOW])
    converted = [
        q for q in names
        if q in oracles and q in latest and q not in latest_oracle
    ]
    for q in converted:
        assert q in window, (
            f"rows-only→oracle conversion {q!r} outside the driver window"
        )


def test_red_record_is_not_evidence():
    """Round-5 incident: two hash-FAIL queries carried the NEWEST driver
    records and would have rotated to the back of the registry, staying
    red for two more rounds. A record counts as evidence only if green."""
    green = {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
    rows_only = {"rows_match": None, "schema_match": None, "hash_match": None,
                 "err": "no_oracle"}
    assert plans._record_green(green)
    assert plans._record_green(rows_only)
    assert not plans._record_green({**green, "hash_match": False})
    assert not plans._record_green({**green, "rows_match": False})
    assert not plans._record_green({**green, "err": "spark error"})
    assert not plans._record_green("not-a-dict")


def test_failed_latest_record_sorts_into_front_bucket():
    """Any query whose newest committed record is red must occupy the
    same front bucket as an unrecorded query (rank -1 in front_order)."""
    import json
    import re
    from pathlib import Path

    root = Path(plans.__file__).resolve().parents[2]
    newest: dict[str, tuple[int, dict]] = {}
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", p.name).group(1))
        for q, rec in json.loads(p.read_text()).items():
            if q not in newest or rnd > newest[q][0]:
                newest[q] = (rnd, rec)
    latest_green = plans.latest_correctness_rounds()
    names = _registry_names()
    window = set(names[: plans._WINDOW])
    for q, (_rnd, rec) in newest.items():
        if q in set(names) and not plans._record_green(rec):
            if latest_green.get(q) is None:
                assert q in window, f"red-latest query {q!r} outside the window"


def test_round_gap_does_not_fabricate_staleness(tmp_path):
    """Regression for the r07 red item: the driver skipped committing
    round-6 artifacts, so raw-round arithmetic made r5-latest queries
    look 2 rounds stale when they were 1 driver RUN stale. Staleness is
    now measured in artifact ordinals — position among the committed
    CORRECTNESS files — so a skipped round cannot widen any gap."""
    import json

    green = {"rows_match": True, "schema_match": True, "hash_match": True,
             "err": None}
    (tmp_path / "CORRECTNESS_r05.json").write_text(json.dumps({"a": green}))
    (tmp_path / "CORRECTNESS_r07.json").write_text(
        json.dumps({"a": green, "b": green})
    )
    latest = plans.latest_correctness_rounds(root=tmp_path)
    # r05 is ordinal 1, r07 ordinal 2: 'a' (last green in both) is at the
    # max ordinal; a query green only in r05 is exactly ONE run stale.
    assert latest == {"a": 2, "b": 2}
    (tmp_path / "CORRECTNESS_r09.json").write_text(json.dumps({"b": green}))
    latest = plans.latest_correctness_rounds(root=tmp_path)
    assert latest == {"a": 2, "b": 3}
    assert max(latest.values()) - latest["a"] == 1  # one RUN stale, gap or not


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
