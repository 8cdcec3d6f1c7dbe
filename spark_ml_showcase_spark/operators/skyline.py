"""Skyline (Pareto-frontier) operator: the rows not DOMINATED by any
other row — ``d`` dominates ``c`` when ``d`` is no worse on every
criterion and strictly better on at least one.

Not in the reference (its analyses stop at top-k orderings); the
skyline is the standard multi-criteria "best offers" query (cheapest
AND largest, fastest AND cheapest, ...) that no single ORDER BY can
express.

Distributed algorithm (the textbook two-phase skyline, e.g.
Börzsönyi et al., "The Skyline Operator", ICDE 2001, adapted to
Spark):

1. **Local prune** (`mapInPandas`): each partition computes its own
   skyline with an O(n log n) sort-sweep — a non-skyline point of the
   whole dataset is also non-skyline in any subset that contains its
   dominator... but crucially the converse holds too: a GLOBAL skyline
   point is a local skyline point of its partition (nothing anywhere
   dominates it), so the local prune NEVER drops a true answer. On
   random data the survivor set is tiny (O(log² n) per partition for
   2 independent criteria).
2. **Global refine**: the pruned candidate union is small, so a
   broadcast dominance ANTI-join removes cross-partition casualties
   exactly. The nested-loop join is bounded by |candidates|², not
   |input|² — that is the point of phase 1.

At 100 TB the scan + local prune is embarrassingly parallel and the
refine operates on kilobytes. Skew-free: no keyed shuffle at all.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _local_skyline(
    pdf: pd.DataFrame, min_col: str, max_col: str
) -> pd.DataFrame:
    """Exact skyline of one in-memory batch, fully vectorized: after
    sorting by (min_col asc, max_col desc), a point survives iff its
    max_col strictly exceeds the running max of everything sorted
    before it — plus the duplicate subtlety that exact (min, max) ties
    of a survivor also survive (neither strictly dominates the other).
    Identical pairs sort adjacent, so ties resolve per run: a run is
    kept iff its FIRST element beats the prefix cummax (within a run
    the cummax already includes the first element, so later elements
    can never be primary on their own)."""
    if pdf.empty:
        return pdf
    mins_all = pdf[min_col].to_numpy()
    maxs_all = pdf[max_col].to_numpy()
    order = np.lexsort((-maxs_all, mins_all))
    mn = mins_all[order]
    mx = maxs_all[order]
    cummax = np.maximum.accumulate(mx)
    primary = np.empty(len(mx), dtype=bool)
    primary[0] = True
    primary[1:] = mx[1:] > cummax[:-1]
    new_run = np.empty(len(mx), dtype=bool)
    new_run[0] = True
    new_run[1:] = (mn[1:] != mn[:-1]) | (mx[1:] != mx[:-1])
    run_id = np.cumsum(new_run) - 1
    run_kept = primary[new_run]  # one flag per run, in run order
    keep = run_kept[run_id]
    return pdf.iloc[order[keep]]


def skyline(df: DataFrame, *, minimize: str, maximize: str) -> DataFrame:
    """Two-criteria skyline: rows where no other row has
    ``minimize`` <= this AND ``maximize`` >= this with at least one
    strict. Two phases: per-partition sort-sweep prune, then an exact
    broadcast anti-join over the (small) candidate union."""

    schema = df.schema

    def prune(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _local_skyline(pdf, minimize, maximize)

    cand = df.mapInPandas(prune, schema=schema)
    c = cand.alias("c")
    d = cand.alias("d")
    cm, cx = F.col(f"c.{minimize}"), F.col(f"c.{maximize}")
    dm, dx = F.col(f"d.{minimize}"), F.col(f"d.{maximize}")
    dominated = (
        (dm <= cm) & (dx >= cx) & ((dm < cm) | (dx > cx))
    )
    return c.join(F.broadcast(d), dominated, "left_anti").select("c.*")
