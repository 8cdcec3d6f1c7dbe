"""Aggregations, pivot, rollup/cube (SURVEY.md §2.4, §2.9).

Reference citations:
- A1 group-by count: ``Claims_Prediction.py:46``, ``log_mining_analysis.py:117``.
- A2 count w/ alias: ``log_mining_analysis.py:43``.
- A3 group-by avg + HAVING: ``als_clustering_analysis.py:130-132``.
- A4 global sum: ``log_mining_analysis.py:98-100``.
- A6 distinct: ``als_clustering_analysis.py:127``.
- V1 pivot (reference detours through pandas, ``log_mining_analysis.py:117-119``;
  the engine pivots natively).

Scale notes: every groupBy is planned as partial (map-side) + final hash
aggregation around one exchange — high-cardinality keys are fine because the
partial agg shrinks data before the shuffle. ``count_distinct`` is the
expensive one (no partial reduction across distinct values); prefer
``approx_count_distinct`` (HLL++, mergeable sketch, no extra shuffle) when
an exact answer isn't required — at 100 TB the exact form can be the single
largest shuffle in a workload.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, GroupedData
from pyspark.sql import functions as F


def group_count(df: DataFrame, *keys: str, alias: str = "count") -> DataFrame:
    """A1/A2: groupBy(...).count() with a stable output column name."""
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias(alias))


def group_agg(df: DataFrame, keys: list[str], **aggs: Column) -> DataFrame:
    """A2/A3: groupBy + named aggregates. Aliases are mandatory via kwargs so
    result schemas are stable (oracle comparisons sort columns by name)."""
    return df.groupBy(*keys).agg(*(expr.alias(name) for name, expr in aggs.items()))


def having(grouped: DataFrame, predicate: Column) -> DataFrame:
    """P11: post-aggregation filter (SQL HAVING) — just a filter above the
    aggregate; Catalyst keeps it there (it can't push below the agg)."""
    return grouped.filter(predicate)


def global_agg(df: DataFrame, **aggs: Column) -> DataFrame:
    """A4: no-group aggregation returning a single row."""
    return df.agg(*(expr.alias(name) for name, expr in aggs.items()))


def distinct_rows(df: DataFrame, *cols: str) -> DataFrame:
    """A6: SELECT DISTINCT (optionally over a projection)."""
    return (df.select(*cols) if cols else df).distinct()


def count_distinct(df: DataFrame, keys: list[str], col: str, *, approx: bool = False,
                   alias: str | None = None) -> DataFrame:
    """A7: per-group (exact or HLL-approximate) count-distinct."""
    fn = F.approx_count_distinct if approx else F.countDistinct
    name = alias or f"{'approx_' if approx else ''}distinct_{col}"
    return df.groupBy(*keys).agg(fn(col).alias(name))


def pivot_counts(df: DataFrame, index: str, pivot_col: str,
                 values: list | None = None) -> DataFrame:
    """V1: native pivot replacing the reference's
    ``groupBy().count().toPandas() → pd.pivot_table`` detour
    (``log_mining_analysis.py:117-119``).

    Pass ``values`` (the distinct pivot values) whenever known: it removes
    the extra distinct-collection job Spark otherwise runs, which at scale
    is a full shuffle just to discover column names.
    """
    grouped = df.groupBy(index)
    p = grouped.pivot(pivot_col, values) if values else grouped.pivot(pivot_col)
    return p.count()


def rollup_agg(df: DataFrame, keys: list[str], **aggs: Column) -> DataFrame:
    """Engine surface beyond the reference: ROLLUP (hierarchical subtotals).
    One pass, one shuffle — Spark expands grouping sets map-side."""
    return df.rollup(*keys).agg(*(e.alias(n) for n, e in aggs.items()))


def cube_agg(df: DataFrame, keys: list[str], **aggs: Column) -> DataFrame:
    """Engine surface beyond the reference: CUBE (all grouping combinations)."""
    return df.cube(*keys).agg(*(e.alias(n) for n, e in aggs.items()))


def heavy_hitters(
    df: DataFrame, col: str, support: float, *, alias: str = "cnt"
) -> DataFrame:
    """EXACT heavy hitters at scale via sketch-then-verify: items whose
    frequency is ≥ ``support`` of the rows.

    Pass 1 is ``df.stat.freqItems`` (Karp/Papadimitriou/Shenker lossy
    counting — single pass, per-partition summaries merged on the
    driver, NO shuffle of the column) which guarantees NO FALSE
    NEGATIVES above the support; pass 2 re-counts only the ≤ 1/support
    candidate items exactly (an `isin` narrow filter + tiny agg) and
    drops the sketch's false positives. Output is exact — the sketch
    only bounds the verify pass — so a DuckDB HAVING replays it.

    The two-pass shape is the 100 TB point: a full exact groupBy on a
    high-cardinality column shuffles every distinct value; this
    shuffles only rows matching the candidate set (≤ 1/support values).
    """
    import math

    if not 0.0 < support <= 1.0:
        raise ValueError(f"support must be in (0, 1], got {support}")
    # sketch at support/2: the no-false-negative guarantee is for items
    # STRICTLY above the sketch support, so halving it puts every
    # boundary item (cnt == ceil(support·total)) safely inside while the
    # candidate set stays ≤ 2/support values
    cands = df.stat.freqItems([col], max(support / 2, 1e-4)).first()[0]
    if not cands:
        empty = df.select(
            F.col(col), F.lit(0).cast("bigint").alias(alias)
        )
        return empty.filter(F.lit(False))
    threshold = math.ceil(support * df.count())
    return (
        df.filter(F.col(col).isin(list(cands)))
        .groupBy(col)
        .agg(F.count(F.lit(1)).cast("bigint").alias(alias))
        .filter(F.col(alias) >= F.lit(threshold))
    )
