"""Joins (SURVEY.md §2.6) — equi, semi/anti/outer, as-of, range.

Reference citations: J1 inner equi-join on differently-named keys
(``als_clustering_analysis.py:129``, ratings ⋈ cluster-users on
``userId == id``); J2 rename-to-disambiguate join
(``als_clustering_analysis.py:134-136``). Only inner equi-joins appear in
the reference; the rest of this module is engine surface it lacks.

Scale notes:
- ``broadcast_join`` pins the small side driver-side and ships it to every
  executor: no shuffle of the big side at all. Use for dimensions ≤ a few
  hundred MB. AQE also converts sort-merge → broadcast at runtime when the
  built side turns out small, but an explicit hint saves the sort.
- For repeated big-big joins on one key, bucket both sides on that key
  (``sources.io.write_parquet(bucket_by=...)``) — co-located join, zero
  exchange.
- Skewed keys: AQE skew-join splitting is on (session.py); for pathological
  skew use ``salted_join``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _fresh(base: str, taken: set[str]) -> str:
    """A helper-column name guaranteed not to collide with input columns."""
    name = base
    while name in taken:
        name += "_"
    taken.add(name)
    return name


def equi_join(left: DataFrame, right: DataFrame, on, how: str = "inner") -> DataFrame:
    """J1/J2. Prefer ``on="key"`` (same-name USING join — dedups the key
    column, no rename dance) over the reference's rename+drop pattern."""
    return left.join(right, on, how)


def broadcast_join(big: DataFrame, small: DataFrame, on, how: str = "inner") -> DataFrame:
    """Broadcast-hash join with an explicit hint."""
    return big.join(F.broadcast(small), on, how)


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """EXISTS — the idiomatic replacement for the reference's
    join-then-select-distinct membership checks."""
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """NOT EXISTS — also the scalable complement operator for splits
    (see splits.py): unlike ``subtract`` it neither dedups nor compares
    every column."""
    return left.join(right, on, "left_anti")


def salted_join(
    big: DataFrame, skewed_small: DataFrame, key: str, salt_buckets: int = 16
) -> DataFrame:
    """Inner equi-join with key salting for pathological skew.

    Explodes the small side ``salt_buckets``× and scatters the big side's
    hot keys across buckets, so no single task receives a whole hot key.
    Use only when AQE skew splitting isn't enough (e.g. one key is >50% of
    rows); the small side must tolerate replication.
    """
    salted_big = big.withColumn(
        "_salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    salted_small = skewed_small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return (
        salted_big.join(salted_small, [key, "_salt"], "inner").drop("_salt")
    )


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    *,
    right_cols: list[str] | None = None,
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_time <= left_time`` for the same ``on`` key.

    Spark has no built-in as-of join; this is the union+last-value-window
    composition (a single shuffle on ``on``, no range cross-product):
    tag both sides, union by name, and carry the most recent right-side
    values forward with ``last(ignorenulls=True)`` over an ordered window.
    """
    rcols = right_cols or [c for c in right.columns if c not in (on, right_time)]
    taken = set(left.columns) | set(right.columns)
    t_c, side_c, rt_c = (
        _fresh("_t", taken), _fresh("_side", taken), _fresh("_rt", taken)
    )
    l_tagged = left.withColumn(t_c, F.col(left_time)).withColumn(side_c, F.lit(1))
    r_select = [on, right_time] + [c for c in rcols if c not in (on, right_time)]
    r_tagged = (
        right.select(*r_select)
        .withColumn(t_c, F.col(right_time))
        .withColumn(side_c, F.lit(0))
    )
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    # side asc puts the right row first on exact-timestamp ties, so a right
    # row at t is visible to a left row at the same t (<= semantics).
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(t_c), F.col(side_c))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumns(
        {c: F.last(F.col(c), ignorenulls=True).over(w) for c in rcols}
    )
    if tolerance_seconds is not None:
        r_t = F.last(F.col(right_time), ignorenulls=True).over(w)
        carried = carried.withColumn(rt_c, r_t)
        # Cast to double seconds (µs precision), not unix_timestamp (whole
        # seconds) — sub-second tolerances must not truncate to 0.
        in_tol = (
            F.col(t_c).cast("double") - F.col(rt_c).cast("double")
            <= F.lit(float(tolerance_seconds))
        )
        carried = carried.withColumns(
            {c: F.when(in_tol, F.col(c)) for c in rcols}
        ).drop(rt_c)
    out = carried.filter(F.col(side_c) == 1).drop(t_c, side_c)
    if right_time not in left.columns and right_time not in rcols:
        # The union surfaced right_time as an all-null column on left rows;
        # it isn't carried (pass it via right_cols to keep the matched time).
        out = out.drop(right_time)
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str | Column,
    right_lo: str | Column,
    right_hi: str | Column,
    *,
    bucket_width: float | None = None,
    extra_on: Column | None = None,
) -> DataFrame:
    """Point-in-interval range join.

    Naive form is a broadcast-nested-loop / cartesian with a filter — fine
    when one side broadcasts. With ``bucket_width`` set, both sides are
    bucketed onto an integer grid (the interval side exploded across the
    buckets it spans) so the join becomes an equi-join on the bucket id plus
    a residual filter: a hash join instead of a cross-product, which is the
    scalable form.
    """
    lp = F.col(left_point) if isinstance(left_point, str) else left_point
    rlo = F.col(right_lo) if isinstance(right_lo, str) else right_lo
    rhi = F.col(right_hi) if isinstance(right_hi, str) else right_hi
    cond = (lp >= rlo) & (lp < rhi)
    if extra_on is not None:
        cond = cond & extra_on
    if bucket_width is None:
        return left.join(right, cond)
    lb = left.withColumn("_bucket", F.floor(lp / F.lit(bucket_width)))
    rb = right.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(rlo / F.lit(bucket_width)),
                F.floor((rhi - F.lit(1e-12)) / F.lit(bucket_width)),
            )
        ),
    )
    return lb.join(rb, (lb["_bucket"] == rb["_bucket"]) & cond).drop("_bucket")
