"""SCD Type-2 dimension maintenance on the versioned snapshot store.

The warehouse pattern the engine's SCD-1 operator
(``operators/dedup.py`` latest-per-key) deliberately loses: instead of
overwriting a changed attribute, the dimension keeps EVERY historical
value with its validity interval —

    key, attrs..., valid_from, valid_to (NULL = open), is_current

so facts can join the dimension AS OF their own event time (the
``scd2_as_of`` read composes directly with the engine's as-of and
interval joins). Each ``scd2_apply`` batch:

1. joins the incoming updates against the CURRENT slice only
   (|keys| rows, not |history|),
2. keeps rows that are genuinely new or changed (null-safe attr
   comparison — unchanged keys are a no-op, the SCD-2 contract),
3. closes the superseded current rows (valid_to = the update's
   effective time) and opens the new ones,
4. commits both through the store's keyed MERGE upsert on the
   surrogate (key, valid_from) — one anti-join shuffle, history rows
   untouched, and every apply is a time-travelable store version.

Late/out-of-order applies are rejected loudly (an update whose
effective time is not after the key's current ``valid_from`` would
corrupt interval ordering) — retroactive corrections are a history
REWRITE, which the store's time travel already provides, not an
incremental apply.

At 100 TB the dimension is |keys×changes| — always orders of magnitude
under the fact stream feeding it; the apply cost is one shuffle of the
update batch plus a dim-sized anti-join, never a history scan.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_ml_showcase_spark.sources import versioned

__all__ = ["scd2_apply", "scd2_history", "scd2_current", "scd2_as_of"]

_SK = "_sk"
_META = ("valid_from", "valid_to", "is_current")


def _surrogate(key_col: str) -> F.Column:
    return F.concat_ws(
        "\x1f", F.col(key_col).cast("string"), F.col("valid_from").cast("string")
    ).alias(_SK)


def scd2_apply(
    spark: SparkSession,
    table_dir: str,
    updates: DataFrame,
    *,
    key_col: str,
    attr_cols: list[str],
    effective_col: str,
) -> int:
    """Fold one update batch (one row per key; ``effective_col`` is an
    epoch-second BIGINT) into the dimension; returns the new store
    version. New keys insert, changed keys close-and-open, unchanged
    keys are a no-op."""
    cols = [key_col, *attr_cols]
    up = updates.select(
        *cols, F.col(effective_col).cast("long").alias("valid_from")
    )
    dup = up.groupBy(key_col).count().filter("count > 1").limit(1).collect()
    if dup:
        raise ValueError(
            f"update batch carries duplicate {key_col}={dup[0][0]!r}; "
            "reduce to one row per key (e.g. last-event-per-key) first"
        )

    if not versioned.snapshot_versions(table_dir):
        first = up.select(
            _surrogate(key_col),
            *cols,
            "valid_from",
            F.lit(None).cast("long").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
        return versioned.write_snapshot(first, table_dir)

    cur = versioned.read_snapshot(spark, table_dir).filter("is_current")
    cur_r = cur.select(
        F.col(key_col).alias("_ck"),
        F.col("valid_from").alias("_cfrom"),
        *[F.col(a).alias(f"_c_{a}") for a in attr_cols],
    )
    j = up.join(F.broadcast(cur_r), up[key_col] == F.col("_ck"), "left")
    differs = reduce(
        lambda a, b: a | b,
        [~F.col(a).eqNullSafe(F.col(f"_c_{a}")) for a in attr_cols],
    )
    changed = j.filter(F.col("_ck").isNull() | differs)
    bad = changed.filter(
        F.col("_cfrom").isNotNull() & (F.col("valid_from") <= F.col("_cfrom"))
    ).limit(1).collect()
    if bad:
        raise ValueError(
            f"out-of-order apply for {key_col}={bad[0][key_col]!r}: "
            f"effective {bad[0]['valid_from']} <= current valid_from "
            f"{bad[0]['_cfrom']}; rewrite history via time travel instead"
        )
    opened = changed.select(
        _surrogate(key_col),
        *cols,
        "valid_from",
        F.lit(None).cast("long").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    closing = changed.filter(F.col("_ck").isNotNull()).select(
        F.col("_ck").alias("_xk"), F.col("valid_from").alias("_close_at")
    )
    closed = (
        cur.join(F.broadcast(closing), cur[key_col] == F.col("_xk"))
        .select(
            F.col(_SK),
            *cols,
            "valid_from",
            F.col("_close_at").cast("long").alias("valid_to"),
            F.lit(False).alias("is_current"),
        )
    )
    return versioned.merge_keys(
        spark, table_dir, closed.unionByName(opened), _SK
    )


def scd2_history(spark: SparkSession, table_dir: str) -> DataFrame:
    return versioned.read_snapshot(spark, table_dir).drop(_SK)


def scd2_current(spark: SparkSession, table_dir: str) -> DataFrame:
    return scd2_history(spark, table_dir).filter("is_current").drop(
        "valid_to", "is_current"
    )


def scd2_as_of(spark: SparkSession, table_dir: str, ts: int) -> DataFrame:
    """The dimension as it was valid at epoch-second ``ts``:
    valid_from <= ts < valid_to (open intervals extend forever)."""
    h = scd2_history(spark, table_dir)
    return h.filter(
        (F.col("valid_from") <= F.lit(int(ts)))
        & (F.col("valid_to").isNull() | (F.col("valid_to") > F.lit(int(ts))))
    ).drop("is_current")
