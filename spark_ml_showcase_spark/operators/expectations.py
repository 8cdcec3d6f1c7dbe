"""Declarative data-quality expectations (the deequ / Great
Expectations primitive): a list of named constraints validated against
a DataFrame in as few passes as the constraint mix allows, returning
one row per check — ``(check, violations, total, passed)``.

Pass economics (the 100 TB concern):

- All ROW-LOCAL checks (not-null, range, set membership, regex) fold
  into ONE aggregation over the table — a single scan computing every
  violation count as a ``SUM(CASE ...)``, no matter how many checks.
- Each UNIQUE check is one distinct-count aggregation (duplicates =
  total − distinct over non-null keys; two extra aggregates, same
  scan via the grouped count).
- Each REFERENTIAL check is one anti-join against the (broadcast if
  small) parent key set — violations are orphaned child rows.

The result is a tiny |checks|-row frame; ``passed`` derives from
``violations == 0``. Complements ``operators/profile.py`` (describe
what IS) with assertions about what MUST BE — the gate a production
ingest runs before committing a drop to the versioned store.

Reference parity: the reference has no validation step (its scripts
trust their CSVs); this is north-star extension surface.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "Check",
    "not_null",
    "unique",
    "in_range",
    "in_set",
    "matches_regex",
    "referential",
    "validate",
]


@dataclass(frozen=True)
class Check:
    name: str
    kind: str  # row | unique | referential
    column: str | None = None
    columns: tuple[str, ...] = ()
    predicate: Column | None = field(default=None, compare=False)
    parent: DataFrame | None = field(default=None, compare=False)
    parent_col: str | None = None


def not_null(col: str, name: str | None = None) -> Check:
    return Check(
        name or f"not_null({col})", "row", col,
        predicate=F.col(col).isNotNull(),
    )


def in_range(col: str, lo, hi, name: str | None = None) -> Check:
    """Violation when the value is non-null and outside [lo, hi]
    (nulls are not range violations — add not_null separately)."""
    return Check(
        name or f"in_range({col})", "row", col,
        predicate=F.col(col).isNull()
        | ((F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi))),
    )


def in_set(col: str, values, name: str | None = None) -> Check:
    return Check(
        name or f"in_set({col})", "row", col,
        predicate=F.col(col).isNull() | F.col(col).isin(list(values)),
    )


def matches_regex(col: str, pattern: str, name: str | None = None) -> Check:
    return Check(
        name or f"matches_regex({col})", "row", col,
        predicate=F.col(col).isNull() | F.col(col).rlike(pattern),
    )


def unique(*cols: str, name: str | None = None) -> Check:
    return Check(
        name or f"unique({','.join(cols)})", "unique", columns=tuple(cols)
    )


def referential(
    col: str, parent: DataFrame, parent_col: str, name: str | None = None
) -> Check:
    """Violation = child rows whose non-null key has no parent row."""
    return Check(
        name or f"referential({col})", "referential", col,
        parent=parent, parent_col=parent_col,
    )


def validate(df: DataFrame, checks: list[Check]) -> DataFrame:
    """One row per check: ``check string, violations bigint,
    total bigint, passed boolean`` — row-local checks share a single
    scan; order of the output follows the order of ``checks``."""
    if not checks:
        raise ValueError("no checks given")
    names = [c.name for c in checks]
    dups = sorted({n for n in names if names.count(n) > 1})
    if dups:
        # Two same-named checks are easy to create accidentally (default
        # names omit parameters: two in_range on one column collide) and
        # would (a) hit Spark's DUPLICATED_MAP_KEY error in the ordering
        # map below and (b) make the result rows indistinguishable —
        # fail loudly with the fix spelled out (advisor finding r8).
        raise ValueError(
            f"duplicate check names {dups}: pass an explicit name= to "
            "disambiguate same-kind checks on the same column"
        )
    total_col = F.count(F.lit(1)).cast("bigint")
    results: list[DataFrame] = []

    row_checks = [c for c in checks if c.kind == "row"]
    if row_checks:
        aggs = [total_col.alias("_total")] + [
            F.sum(F.when(~c.predicate, 1).otherwise(0))
            .cast("bigint")
            .alias(f"_v{i}")
            for i, c in enumerate(row_checks)
        ]
        one = df.agg(*aggs)
        # ONE scan feeds every row-local check: the single agg row is
        # exploded into |checks| rows (N separate selects from the agg
        # would make Catalyst re-plan the scan N times — no CTE sharing)
        kv = F.array(
            *[
                F.struct(
                    F.lit(c.name).alias("check"),
                    F.col(f"_v{i}").alias("violations"),
                )
                for i, c in enumerate(row_checks)
            ]
        )
        results.append(
            one.select(F.explode(kv).alias("_kv"), F.col("_total")).select(
                F.col("_kv.check").alias("check"),
                F.col("_kv.violations").alias("violations"),
                F.col("_total").alias("total"),
            )
        )

    for c in checks:
        if c.kind == "unique":
            keys = [F.col(k) for k in c.columns]
            nn = df
            for k in c.columns:
                nn = nn.filter(F.col(k).isNotNull())
            agg = nn.agg(
                total_col.alias("_n"),
                F.count_distinct(*keys).cast("bigint").alias("_d"),
            )
            results.append(
                agg.crossJoin(df.agg(total_col.alias("_total"))).select(
                    F.lit(c.name).alias("check"),
                    (F.col("_n") - F.col("_d")).alias("violations"),
                    F.col("_total").alias("total"),
                )
            )
        elif c.kind == "referential":
            parent_keys = c.parent.select(
                F.col(c.parent_col).alias("_pk")
            ).distinct()
            orphans = (
                df.filter(F.col(c.column).isNotNull())
                .join(
                    F.broadcast(parent_keys),
                    F.col(c.column) == F.col("_pk"),
                    "left_anti",
                )
                .agg(total_col.alias("_v"))
            )
            results.append(
                orphans.crossJoin(df.agg(total_col.alias("_total"))).select(
                    F.lit(c.name).alias("check"),
                    F.col("_v").alias("violations"),
                    F.col("_total").alias("total"),
                )
            )

    # reassemble in caller order (row checks were batched first)
    order = [c.name for c in checks]
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    ordmap = F.create_map(
        *[x for i, n in enumerate(order) for x in (F.lit(n), F.lit(i))]
    )
    return (
        out.withColumn("passed", F.col("violations") == 0)
        .orderBy(ordmap[F.col("check")])
    )
