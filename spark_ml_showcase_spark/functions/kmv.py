"""KMV (k-minimum-values) distinct sketch with multiset operations.

The classic mergeable distinct-value synopsis (Bar-Yossef et al. 2002;
Beyer et al., SIGMOD 2007 "On synopses for distinct value estimation
under multiset operations"): hash every element to uniform [0, 1) and
keep the k SMALLEST hashes per group. The k-th smallest value of n
uniform draws concentrates at k/n, so ``(k-1) / h_(k)`` estimates the
distinct count with ~1/sqrt(k) relative error — and, unlike HLL
(which Spark already exposes as ``approx_count_distinct``, registry
query ``approx_distinct_suppliers``), KMV sketches support SET
ALGEBRA: the k-min of a union of sketches is the sketch of the union,
and the fraction of the merged sketch present in both inputs is an
unbiased Jaccard estimate, giving intersection sizes — the thing HLL
cannot do without inclusion-exclusion error blowup.

Two properties make it Spark-native here:

- **Exact-below-k regime**: while a group holds fewer than k distinct
  values the sketch IS the distinct set (estimator returns its size
  exactly) — so correctness is oracle-checkable against
  ``COUNT(DISTINCT ...)`` in that regime, and the estimation regime is
  covered by seeded error-bound tests.
- **All-JVM two-stage build**: stage 1 aggregates per (group,
  input-partition) — the map-side combine, bounding every state at k
  values — and stage 2 merges the ≤ k·P candidates per group. Both
  stages are built-in ``collect_set``/``array_sort``/``slice``
  expressions: no Python in the data path, and the second shuffle
  carries at most k doubles per (group, partition), not the data.

At 100 TB: sketches are per-segment rows of ≤ k doubles; rollups
across segments/days are ``kmv_merge`` folds over those rows — the raw
data is never revisited, the same pattern as the hypertable rollup's
partial states (operators/hypertable.py).

Hash collisions (xxhash64, 64-bit) perturb the exact regime with
probability ~d²/2⁶⁵ for d distinct values — negligible below ~10⁸
distinct per group, documented rather than defended. That bound only
holds because sketches store the RAW 64-bit hash (bigint): an earlier
revision stored ``hash/2⁶⁴`` doubles, which collapses the space to
~2⁵³ distinguishable values and degrades collisions ~2000× (at 10⁸
distinct, ~50% odds — advisor finding r8). The signed-long sort order
is the unit-interval order (``x ↦ x/2⁶⁴ + 0.5`` is monotone), so
k-min over bigints IS k-min over [0,1); the conversion happens once,
inside :func:`kmv_estimate`, where double rounding only perturbs the
estimate by ~2⁻⁵³ relative — harmless there.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "kmv_sketch",
    "kmv_estimate",
    "kmv_merge",
    "kmv_jaccard",
    "kmv_intersection",
]

_TWO64 = 2.0**64


def _hash64(col: str | Column) -> Column:
    """Raw xxhash64 (signed BIGINT). Sketch values stay in this domain;
    ascending signed order == ascending unit-interval order."""
    c = F.col(col) if isinstance(col, str) else col
    return F.xxhash64(c)


def _to_unit(c: Column) -> Column:
    """Signed 64-bit hash → uniform [0, 1), for the estimator only."""
    return (c.cast("double") / F.lit(_TWO64)) + F.lit(0.5)


def kmv_sketch(
    df: DataFrame, group_cols: list[str], value_col: str, *, k: int = 256
) -> DataFrame:
    """One row per group: ``group_cols..., sketch array<bigint>`` — the
    sorted k smallest 64-bit hashes of ``value_col``'s distinct values
    (signed order, which equals the unit-interval order)."""
    if k < 2:
        raise ValueError("k must be >= 2")
    kmin = lambda c: F.slice(F.array_sort(F.collect_set(c)), 1, k)  # noqa: E731
    part = df.select(
        *group_cols,
        _hash64(value_col).alias("_h"),
        F.spark_partition_id().alias("_pid"),
    )
    # stage 1: per-(group, partition) k-min — the map-side combine;
    # every aggregation state is capped at the partition's local
    # distincts and the output at k values
    s1 = part.groupBy(*group_cols, "_pid").agg(kmin("_h").alias("_cand"))
    # stage 2: merge ≤ k·P candidates per group (a tiny shuffle)
    return (
        s1.select(*group_cols, F.explode("_cand").alias("_h"))
        .groupBy(*group_cols)
        .agg(kmin("_h").alias("sketch"))
    )


def kmv_estimate(sketch: str | Column, *, k: int) -> Column:
    """Distinct-count estimate: exact size below k, else (k-1)/h_(k)."""
    s = F.col(sketch) if isinstance(sketch, str) else sketch
    return F.when(F.size(s) < k, F.size(s).cast("double")).otherwise(
        F.lit(float(k - 1)) / _to_unit(F.element_at(s, k))
    )


def kmv_merge(a: str | Column, b: str | Column, *, k: int) -> Column:
    """Sketch of the union: k smallest of the combined hash sets."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.slice(F.array_sort(F.array_union(ca, cb)), 1, k)


def kmv_jaccard(a: str | Column, b: str | Column, *, k: int) -> Column:
    """Jaccard similarity estimate |A∩B| / |A∪B|: the fraction of the
    merged sketch's values present in BOTH input sketches."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    merged = kmv_merge(ca, cb, k=k)
    both = F.size(F.array_intersect(F.array_intersect(merged, ca), cb))
    return both.cast("double") / F.size(merged)


def kmv_intersection(a: str | Column, b: str | Column, *, k: int) -> Column:
    """|A∩B| estimate: Jaccard × the union estimate off the merged
    sketch (Beyer et al. 2007's multiset-intersection estimator)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return kmv_jaccard(ca, cb, k=k) * kmv_estimate(
        kmv_merge(ca, cb, k=k), k=k
    )
