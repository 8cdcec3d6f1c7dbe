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

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _local_skyline(
    pdf: pd.DataFrame, min_col: str, max_col: str
) -> pd.DataFrame:
    """Exact skyline of one in-memory batch: sort by (min_col asc,
    max_col desc) and sweep. A point survives iff its max_col exceeds
    the best seen among strictly-better min_col points — with the one
    duplicate subtlety that an exact (min, max) tie with the last
    survivor also survives (neither strictly dominates the other)."""
    if pdf.empty:
        return pdf
    s = pdf.sort_values(
        [min_col, max_col], ascending=[True, False], kind="mergesort"
    )
    mins = s[min_col].to_numpy()
    maxs = s[max_col].to_numpy()
    keep = []
    best_max: float | None = None
    best_pair: tuple | None = None
    for i in range(len(s)):
        pair = (mins[i], maxs[i])
        if best_max is None or maxs[i] > best_max:
            keep.append(i)
            best_max = maxs[i]
            best_pair = pair
        elif pair == best_pair:
            keep.append(i)
    return s.iloc[keep]


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
