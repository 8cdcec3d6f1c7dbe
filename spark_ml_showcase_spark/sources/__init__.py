"""Sources and sinks (SURVEY.md §2.1)."""

from spark_ml_showcase_spark.sources.io import (
    read_csv,
    read_json,
    read_orc,
    read_parquet,
    read_text,
    write_orc,
    write_parquet,
    write_report,
)
from spark_ml_showcase_spark.sources.catalog import Catalog, TESTDATA_TABLES

__all__ = [
    "Catalog",
    "TESTDATA_TABLES",
    "read_csv",
    "read_json",
    "read_orc",
    "read_parquet",
    "read_text",
    "write_orc",
    "write_parquet",
    "write_report",
]
