"""Interval-overlap join: all pairs of intervals that intersect.

Spark has no interval join; the naive form is a non-equi theta join
(``l.lo < r.hi AND r.lo < l.hi``) that plans as a broadcast-nested-loop
or cartesian — O(|L|·|R|) and a scale killer. This module implements
the standard GRID decomposition (DB2 "grid files" / Spatial-join
bucketing; the same shape Flink and KDB use for window joins): each
interval explodes onto the integer time cells it spans, the join
becomes a hash equi-join on (keys..., cell), and a residual predicate
keeps true overlaps.

The subtle part is DEDUP: an overlapping pair shares every cell of its
intersection and would surface once per shared cell. Instead of a
``distinct`` (a second full shuffle of the output), each pair is
emitted only from its REPORTING CELL — the cell containing
``greatest(l.lo, r.lo)``, the start of the intersection, which both
sides provably explode (it lies inside both intervals). One shuffle,
exactly-once output, no post-join dedup.

Reference parity: the reference engine's interval/window joins are
imperative two-pointer merges per key
(`Spark-ML-Showcase` has no batch interval join; this generalizes its
event-window semantics to arbitrary interval pairs at shuffle scale).

Choosing ``bucket_width``: fan-out per row is
``ceil(span / bucket_width) + 1`` copies, and cell population is what
the hash join shuffles — pick a width near the TYPICAL interval span
so fan-out stays O(1) while cells stay selective. At 100 TB the shuffle
key is (keys..., cell): hot cells shard further by the keys, and a
follow-up salting pass applies if a single (key, cell) is skewed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_overlap_join"]


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    *,
    bucket_width: float,
    on: list[str] | None = None,
    residual: Column | None = None,
    max_cell_rows: int | None = None,
) -> DataFrame:
    """All (left, right) pairs whose half-open intervals
    ``[left_lo, left_hi)`` and ``[right_lo, right_hi)`` intersect,
    optionally restricted to equal values on the ``on`` key columns
    (present in both sides; they appear once in the output).

    Bounds are numeric (cast timestamps to epoch first). Non-key
    column names must not collide between the two sides — alias before
    calling, as with any join. ``residual`` is an extra filter applied
    after the join (referencing columns from both sides).

    ``max_cell_rows`` is the hot-cell guard (same philosophy as the
    MinHash ``max_bucket`` and SemDeDup hot-cell guards): a (keys,
    cell) bucket's join cost is |left-in-cell| × |right-in-cell|, so
    one pathological cell — every interval covering midnight, one
    tenant's maintenance window — can dominate the whole job. With the
    guard set, cells whose LEFT-side population exceeds the bound are
    excluded from the join (a broadcast anti-join on the cell id; at
    most |hot cells| values), and the caller handles them explicitly —
    a narrower bucket_width, per-key salting, or a dedicated pass.
    Excluding by one side keeps the semantics simple: a pair is
    dropped iff its reporting cell is hot.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    w = F.lit(bucket_width)
    keys = list(on or [])

    def cells(lo: str, hi: str) -> Column:
        # [lo, hi) covers cells floor(lo/w) .. end_cell, where end_cell
        # steps BACK one cell when hi sits exactly on a cell boundary
        # (the half-open end excludes it). The boundary test is an exact
        # `hi % w == 0`, not an epsilon: an earlier absolute eps=1e-12
        # underflowed at epoch-second magnitudes (hi - 1e-12 == hi in
        # double for hi ~ 1.7e9), silently exploding boundary-ending
        # intervals into one extra cell each (advisor finding r8 —
        # results stayed correct via the overlap+reporting-cell filters,
        # but the fan-out and this invariant were off).
        hc = F.floor(F.col(hi) / w)
        end = F.when(F.col(hi) % w == 0, hc - F.lit(1)).otherwise(hc)
        return F.explode(F.sequence(F.floor(F.col(lo) / w), end))

    # Both sides often share lineage (two filters of one table); joining
    # same-named columns across a self-join is ambiguous, so the right
    # side's join columns get fresh internal names before the join.
    lb = left.withColumn("_cell", cells(left_lo, left_hi))
    if max_cell_rows is not None:
        # dropping the left copy of a hot cell kills exactly the pairs
        # whose REPORTING cell it is — other cells of the same interval
        # still join, so only hot-cell pairs are excluded
        hot = (
            lb.groupBy(*keys, "_cell")
            .count()
            .filter(F.col("count") > int(max_cell_rows))
            .select(*keys, "_cell")
        )
        lb = lb.join(F.broadcast(hot), on=[*keys, "_cell"], how="left_anti")
    rb = right.withColumn("_rcell", cells(right_lo, right_hi))
    rkey = {k: f"_rk_{k}" for k in keys}
    for k, rk in rkey.items():
        rb = rb.withColumnRenamed(k, rk)
    cond = F.col("_cell") == F.col("_rcell")
    for k, rk in rkey.items():
        cond = cond & (F.col(k) == F.col(rk))
    overlap = (F.col(left_lo) < F.col(right_hi)) & (
        F.col(right_lo) < F.col(left_hi)
    )
    # reporting cell: the intersection start lies inside BOTH intervals,
    # so both sides exploded its cell — emit the pair there and only there
    report = F.col("_cell") == F.floor(
        F.greatest(F.col(left_lo), F.col(right_lo)) / w
    )
    joined = lb.join(rb, cond & overlap & report)
    if residual is not None:
        joined = joined.filter(residual)
    drop = ["_cell", "_rcell", *rkey.values()]
    return joined.drop(*drop)
