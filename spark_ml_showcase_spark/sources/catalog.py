"""Testdata catalog: lazy handles to the driver-generated star schema.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings, one parquet file each under
``/root/testdata/sf{0.001,0.01,0.1}/``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import LongType, TimestampNTZType

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor (they grow
# sub-linearly or are fixed-size in TPC-H-style generators). `customer`/
# `part`/`supplier` grow linearly — broadcastability is decided by AQE at
# runtime, not assumed here.
ALWAYS_BROADCAST = frozenset({"region", "nation"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


class Catalog:
    """Lazy table loader over one scale-factor directory."""

    def __init__(self, spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR):
        self.spark = spark
        self.sf_dir = sf_dir.rstrip("/")

    def table(self, name: str) -> DataFrame:
        if name not in TESTDATA_TABLES:
            raise KeyError(f"unknown table {name!r}; have {TESTDATA_TABLES}")
        if name == "events":
            # The driver has shipped events.ts under two physical types
            # across fixture generations — TIMESTAMP(NANOS) (rounds 1–4)
            # and timestamp[us] isAdjustedToUTC=false (round 5+) — so the
            # read is TYPE-ADAPTIVE, keyed on the inferred schema, never
            # on which generation we "expect". Spark 4 refuses NANOS
            # unless read as a raw long; the config is runtime-settable,
            # so it works regardless of who built the session (ours or
            # the driver's plain one).
            self.spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            # NTZ→LTZ normalization below maps wall-clock at the session
            # time zone; pin UTC (runtime-settable) so the epoch numbers
            # match DuckDB's tz-naive epoch() on any host.
            self.spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = self.spark.read.parquet(f"{self.sf_dir}/{name}.parquet")
        if name == "events":
            ts_type = df.schema["ts"].dataType
            if isinstance(ts_type, LongType):
                # NANOS generation: ns epoch → µs timestamp. Integer DIV,
                # not float division: the ns value exceeds double's 53-bit
                # mantissa, so a float path rounds the microseconds and
                # hash-mismatches DuckDB (which floor-truncates ns→µs
                # when reading the same file).
                df = df.withColumn(
                    "ts", F.timestamp_micros(F.expr("ts div 1000"))
                )
            elif isinstance(ts_type, TimestampNTZType):
                # µs generation: naive wall-clock → instant as-if-UTC
                # (session tz pinned above), giving the same epoch values
                # DuckDB computes from the naive timestamp directly.
                df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df

    def __getattr__(self, name: str) -> DataFrame:
        if name in TESTDATA_TABLES:
            return self.table(name)
        raise AttributeError(name)

    def register_views(self) -> None:
        """Register every table as a temp view for the SQL surface."""
        for name in TESTDATA_TABLES:
            self.table(name).createOrReplaceTempView(name)
