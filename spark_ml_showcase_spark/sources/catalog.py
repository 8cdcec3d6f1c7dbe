"""Testdata catalog: lazy handles to the driver-generated star schema.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings, one parquet file each under
``/root/testdata/sf{0.001,0.01,0.1}/``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import LongType

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
            # events.ts is parquet TIMESTAMP(NANOS); Spark 4.x refuses it
            # (PARQUET_TYPE_ILLEGAL) unless read as a raw long. The config is
            # runtime-settable, so it works regardless of who built the
            # session (ours or the driver's).
            self.spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = self.spark.read.parquet(f"{self.sf_dir}/{name}.parquet")
        if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
            # ns epoch → µs timestamp. Integer DIV, not float division: the
            # ns value exceeds double's 53-bit mantissa, so a float path
            # rounds the microseconds and hash-mismatches DuckDB (which
            # floor-truncates ns→µs when reading the same file).
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df

    def __getattr__(self, name: str) -> DataFrame:
        if name in TESTDATA_TABLES:
            return self.table(name)
        raise AttributeError(name)

    def register_views(self) -> None:
        """Register every table as a temp view for the SQL surface."""
        for name in TESTDATA_TABLES:
            self.table(name).createOrReplaceTempView(name)
