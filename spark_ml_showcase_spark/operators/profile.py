"""Data profiling: one-pass per-column statistics over any DataFrame.

The deequ/TFDV-shaped observability step of a training-data pipeline —
before cleaning a 100 TB drop you profile it (null rates, cardinality,
ranges) and alert on drift vs the previous drop. Nothing like it exists
in the reference (its only data inspection is ``print``/``df.show()``,
e.g. ``Claims_Prediction.py:62-77``); this is engine surface the corpus
toolchain needs.

Output: ONE ROW PER COLUMN with
``(col_name, n_rows, n_nulls, n_distinct, min_num, max_num, mean,
min_str, max_str)`` — numeric columns fill the ``*_num``/``mean``
family, string/date/timestamp columns fill ``*_str`` (ISO-formatted),
each family NULL for the other kind. Deterministic and
dialect-portable, so the registered query is DuckDB-oracle-checked.

Scale posture: a single ``agg`` pass — every statistic is an
algebraic aggregate with map-side partials; the result is
O(columns), collected nowhere. ``exact_distinct=True`` uses
``count(DISTINCT col)`` which Spark plans as one expand + two-phase
aggregate per column (exact, oracle-checkable); at 100 TB set
``exact_distinct=False`` for HLL ``approx_count_distinct`` — identical
plan shape minus the expand, one pass total. Complex-typed columns
(array/map/struct/binary) are skipped: min/max ordering on them is not
dialect-portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_ml_showcase_spark.functions.rounding import round_like_duckdb
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)
_STRINGY = (T.StringType, T.DateType, T.TimestampType, T.TimestampNTZType)


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    *,
    exact_distinct: bool = True,
    round_to: int = 6,
) -> DataFrame:
    """Profile ``columns`` (default: every atomic-typed column) in one
    aggregation pass; see module docstring for the output contract."""
    fields = {f.name: f.dataType for f in df.schema.fields}
    if columns is None:
        columns = [
            c
            for c, t in fields.items()
            if isinstance(t, _NUMERIC + _STRINGY)
        ]
    for c in columns:
        if c not in fields:
            raise ValueError(f"no such column: {c}")
        if not isinstance(fields[c], _NUMERIC + _STRINGY):
            raise ValueError(
                f"column {c} has non-atomic type {fields[c]}; profile "
                "supports numeric/string/date/timestamp columns"
            )

    # THREE separate aggregation groups, cross-joined as single-row
    # broadcast frames. One combined agg would be planned as a single
    # SortAggregate over the count-distinct Expand (len(columns)× the
    # rows): min/max over STRING buffers disqualify HashAggregate, and
    # the distinct rewrite multiplies the input — measured 8.5 s vs
    # ~1.5 s split, sf0.1 orders. Split, the fixed-width statistics
    # hash-aggregate, the string min/max sort-aggregates over the
    # UN-expanded input, and the distinct Expand feeds a hash agg.
    fixed_aggs = [F.count(F.lit(1)).alias("n_rows")]
    str_aggs = []
    dist_aggs = []
    for c in columns:
        col = F.col(c)
        # coalesce: SUM over zero rows is NULL — an empty table should
        # profile as 0 nulls, not NULL nulls
        fixed_aggs.append(
            F.coalesce(
                F.sum(col.isNull().cast("bigint")), F.lit(0).cast("bigint")
            ).alias(f"_nn_{c}")
        )
        if exact_distinct:
            dist_aggs.append(F.count_distinct(col).alias(f"_nd_{c}"))
        else:
            fixed_aggs.append(F.approx_count_distinct(col).alias(f"_nd_{c}"))
        if isinstance(fields[c], _NUMERIC):
            d = col.cast("double")
            fixed_aggs.append(F.round(F.min(d), round_to).alias(f"_mn_{c}"))
            fixed_aggs.append(F.round(F.max(d), round_to).alias(f"_mx_{c}"))
            # decimal-exact mean: a float SUM is partition-order
            # dependent in its last ulps, which can flip the rounded
            # digit between engines — same rule as plans.dec_sum. The
            # divisor counts the DECIMAL cast, not the raw column:
            # |v| ≥ 1e22 overflows decimal(28,6) to NULL under non-ANSI
            # mode and is excluded from the sum, so counting the raw
            # column would silently skew the mean — this way the mean is
            # consistently "mean of decimal-representable values"
            # (min/max remain exact doubles and expose any outlier).
            dec = col.cast("decimal(28,6)")
            fixed_aggs.append(
                round_like_duckdb(
                    (F.sum(dec) / F.count(dec)).cast("double"), round_to
                ).alias(f"_av_{c}")
            )
        else:
            s = col.cast("string")
            str_aggs.append(F.min(s).alias(f"_mns_{c}"))
            str_aggs.append(F.max(s).alias(f"_mxs_{c}"))
    one = df.agg(*fixed_aggs)
    if str_aggs:
        one = one.crossJoin(F.broadcast(df.agg(*str_aggs)))
    if dist_aggs:
        one = one.crossJoin(F.broadcast(df.agg(*dist_aggs)))

    # unpivot the single row into one row per column — the frame is one
    # row wide, so the per-column structs are driver-free expressions
    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    structs = []
    for c in columns:
        numeric = isinstance(fields[c], _NUMERIC)
        structs.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("n_rows").alias("n_rows"),
                F.col(f"_nn_{c}").alias("n_nulls"),
                F.col(f"_nd_{c}").cast("bigint").alias("n_distinct"),
                (F.col(f"_mn_{c}") if numeric else null_d).alias("min_num"),
                (F.col(f"_mx_{c}") if numeric else null_d).alias("max_num"),
                (F.col(f"_av_{c}") if numeric else null_d).alias("mean"),
                (null_s if numeric else F.col(f"_mns_{c}")).alias("min_str"),
                (null_s if numeric else F.col(f"_mxs_{c}")).alias("max_str"),
            )
        )
    return (
        one.select(F.explode(F.array(*structs)).alias("_p"))
        .select("_p.*")
        .orderBy("col_name")
    )


def profile_drift(
    old: DataFrame,
    new: DataFrame,
    *,
    rel_tol: float = 0.1,
    round_to: int = 6,
) -> DataFrame:
    """Drift report between two :func:`profile_table` outputs (e.g. the
    previous corpus drop vs today's): per column —

    - ``null_rate_delta``: new null fraction minus old,
    - ``mean_rel_delta``: |mean_new − mean_old| / max(|mean_old|, 1e-12)
      (NULL for non-numeric columns),
    - ``distinct_ratio``: n_distinct_new / n_distinct_old (NULL when the
      old side had 0),
    - ``drift``: true iff any of the above exceeds ``rel_tol`` (for
      distinct_ratio: deviates from 1 by more than ``rel_tol``).

    The TFDV "validate today's stats against yesterday's" step. Columns
    present on only one side drift by definition (schema change).

    Scale posture: profiles are O(columns) rows — this is a full outer
    join of two tiny frames; the heavy lifting already happened inside
    profile_table's single pass over each corpus.
    """
    o = old.select(
        "col_name",
        (F.col("n_nulls") / F.greatest(F.col("n_rows"), F.lit(1))).alias("_nr_o"),
        F.col("mean").alias("_mean_o"),
        F.col("n_distinct").alias("_nd_o"),
    )
    n = new.select(
        "col_name",
        (F.col("n_nulls") / F.greatest(F.col("n_rows"), F.lit(1))).alias("_nr_n"),
        F.col("mean").alias("_mean_n"),
        F.col("n_distinct").alias("_nd_n"),
    )
    j = o.join(n, "col_name", "full_outer")
    null_rate_delta = F.round(F.col("_nr_n") - F.col("_nr_o"), round_to)
    mean_rel = F.when(
        F.col("_mean_o").isNotNull() & F.col("_mean_n").isNotNull(),
        round_like_duckdb(
            F.abs(F.col("_mean_n") - F.col("_mean_o"))
            / F.greatest(F.abs(F.col("_mean_o")), F.lit(1e-12)),
            round_to,
        ),
    )
    distinct_ratio = F.when(
        F.col("_nd_o") > 0,
        round_like_duckdb(F.col("_nd_n") / F.col("_nd_o"), round_to),
    )
    one_sided = F.col("_nr_o").isNull() | F.col("_nr_n").isNull()
    drift = one_sided | (
        (F.abs(F.coalesce(null_rate_delta, F.lit(0.0))) > rel_tol)
        | (F.coalesce(mean_rel, F.lit(0.0)) > rel_tol)
        | (F.abs(F.coalesce(distinct_ratio, F.lit(1.0)) - 1.0) > rel_tol)
    )
    return j.select(
        "col_name",
        null_rate_delta.alias("null_rate_delta"),
        mean_rel.alias("mean_rel_delta"),
        distinct_ratio.alias("distinct_ratio"),
        drift.alias("drift"),
    ).orderBy("col_name")
