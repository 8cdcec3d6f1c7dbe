"""Planar spatial radius join via grid bucketing.

Not in the reference (no spatial surface there); this is the standard
"all pairs within distance r" join — store-to-customer catchment,
sensor-to-asset proximity — expressed scale-first: a naive radius join
is a cross product with a distance predicate (Catalyst can only
nested-loop it); bucketing both sides into r-sized grid cells turns it
into an EQUI-join on the cell key plus an exact per-pair residual
filter, the same bucketed-candidate pattern the engine uses for LSH
and interval joins.

Geometry contract: integer planar coordinates (meters on a local
projection). All candidate math is 64-bit integer — cell ids, deltas
and the squared distance are exact, so results are bit-reproducible
across engines (no trig, no floating rounding at the boundary).

Scale posture (both sides huge):

- One side is exploded to its 3x3 cell neighborhood (x9 rows of 2
  longs + the payload key), the other keeps 1 row per point; the join
  shuffles BOTH sides on (cell_x, cell_y) — co-located, no broadcast
  needed, AQE handles moderate cell skew. With cell = r, any pair
  within r differs by at most 1 cell per axis, so the neighborhood
  join finds every candidate exactly once (the pair meets only in the
  probe point's own cell).
- Residual `dx² + dy² <= r²` runs inside codegen on the matched
  candidates only: cost is O(candidates), not O(n·m).
- Dense hot cells (urban cores) are the skew to watch: cell size
  tracks r, so candidates per probe ≈ 9 · density · r² — pick r-sized
  cells and let AQE split outliers, or pre-aggregate duplicate points.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_OFFSETS = [(i, j) for i in (-1, 0, 1) for j in (-1, 0, 1)]


def grid_radius_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_xy: tuple[str, str],
    right_xy: tuple[str, str],
    radius: int,
    dist2_name: str = "dist2",
) -> DataFrame:
    """All (left, right) pairs with squared planar distance
    <= radius² — exact, via an r-grid equi-join. Coordinates must be
    integral (cast upstream); the output carries every column of both
    inputs plus ``dist2_name`` (BIGINT squared distance)."""
    lx, ly = left_xy
    rx, ry = right_xy
    r = int(radius)

    def cell(col: str) -> Column:
        # floor-division grid id; F.floor handles negative coords too
        return F.floor(F.col(col).cast("bigint") / F.lit(r)).cast("bigint")

    probe = left.withColumn("_cx", cell(lx)).withColumn("_cy", cell(ly))
    offsets = F.array(
        *[
            F.struct(F.lit(i).alias("di"), F.lit(j).alias("dj"))
            for i, j in _OFFSETS
        ]
    )
    build = (
        right.withColumn("_o", F.explode(offsets))
        .withColumn("_cx", cell(rx) + F.col("_o.di"))
        .withColumn("_cy", cell(ry) + F.col("_o.dj"))
        .drop("_o")
    )
    dx = F.col(lx).cast("bigint") - F.col(rx).cast("bigint")
    dy = F.col(ly).cast("bigint") - F.col(ry).cast("bigint")
    dist2 = (dx * dx + dy * dy).alias(dist2_name)
    return (
        probe.join(build, ["_cx", "_cy"])
        .filter(dx * dx + dy * dy <= F.lit(r * r))
        .drop("_cx", "_cy")
        .withColumn(dist2_name, dist2)
    )
