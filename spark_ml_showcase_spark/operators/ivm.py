"""Incremental view maintenance (IVM) for a JOIN view: keep a
materialized ``fact ⋈ dim`` view current under BOTH fact appends and
dimension updates without ever re-joining the whole history.

Complements the hypertable operator (aggregate IVM,
``operators/hypertable.py``) with the other classic view shape. Per
refresh step the delta algebra is:

    V' =  (V  ⊖  rows whose dim key changed)        -- anti-join
        ∪ (F_seen ⋉ changed keys) ⋈ D'              -- re-derive touched
        ∪ ΔF ⋈ D'                                   -- join only the delta

so the re-join touches ``|ΔF| + |F_seen restricted to changed keys|``
rows — never ``|F_seen|``. With dimension churn c per step, a step
costs O(|ΔF| + c·fanout) instead of the O(|F|) full rebuild.

Scale posture: every join is keyed on the dim key (broadcast when the
dim fits, hash otherwise — Catalyst decides); the anti-join against
changed keys broadcasts the (small) changed-key set. ``localCheckpoint``
between steps keeps the fold's lineage flat, the same discipline as the
hierarchy closure. At production scale V and F_seen live in the
versioned snapshot store (the MERGE/append paths it already has);
the fold here is the same algebra applied to in-memory frames so the
algebra itself is oracle-checkable end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_view_fold(
    steps: list[tuple[DataFrame, DataFrame, DataFrame | None]],
    *,
    key: str,
) -> DataFrame:
    """Fold refresh steps into the materialized join view.

    Each step is ``(fact_delta, dim_current, dim_changed_keys)`` —
    the new fact rows, the FULL current dimension snapshot, and the
    (possibly empty / None) one-column frame of dim keys whose
    attributes changed since the previous step. Returns the view after
    the last step: fact columns joined with the dim's current
    attributes, exactly as a full re-join of everything would produce.
    """
    view: DataFrame | None = None
    facts_seen: DataFrame | None = None
    for fact_delta, dim_current, changed in steps:
        fresh = fact_delta.join(dim_current, key)
        if view is None:
            view = fresh.localCheckpoint()
            facts_seen = fact_delta.localCheckpoint()
            continue
        if changed is not None:
            ck = changed.select(F.col(key)).distinct()
            untouched = view.join(F.broadcast(ck), key, "left_anti")
            rederived = (
                facts_seen.join(F.broadcast(ck), key, "left_semi")
                .join(dim_current, key)
            )
            view = untouched.unionByName(rederived).unionByName(fresh)
        else:
            view = view.unionByName(fresh)
        view = view.localCheckpoint()
        facts_seen = facts_seen.unionByName(fact_delta).localCheckpoint()
    if view is None:
        raise ValueError("join_view_fold needs at least one step")
    return view
