"""Web-log analytics (SURVEY.md M2): the log_mining_analysis.py pipeline
as a reusable module.

Re-expresses, with citations into the reference:

- CLF field extraction (``log_mining_analysis.py:24-28``) — same capture
  regexes, but named once here, with ``element_at(arr, -1)`` replacing
  the ``getItem(size(...) - k)`` negative-index emulation;
- real timestamps: ``to_timestamp('dd/MMM/yyyy:HH:mm:ss Z')`` +
  ``dayofmonth``/``hour`` replacing the string-slicing regexes of
  ``log_mining_analysis.py:114-115`` (kept available as
  ``day_hour_by_regex`` for capability parity);
- country-suffix reports, unique-host counts, deterministic top-k hosts
  (``log_mining_analysis.py:32-51``);
- the day×hour matrix natively in Spark — the reference pivots in pandas
  (``log_mining_analysis.py:117-119``); here ``groupBy('hour')
  .pivot('day', values)`` stays distributed and, with pinned values,
  skips the extra distinct-discovery job.

Scale note: a ``.gz`` text file is NOT splittable — one partition per
file. ``parse_clf(repartition=N)`` redistributes right after the scan so
the regex projection parallelizes (cheap narrow shuffle of raw lines,
once, vs a single-core regex pass over the whole log).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# The reference's capture patterns (log_mining_analysis.py:24-26).
HOST_RE = r"^(.*) - -.*"
TS_RE = r".* - - \[(.*)\].*"
REQUEST_RE = r'.*"(.*)".*'
CLF_TS_FORMAT = "dd/MMM/yyyy:HH:mm:ss Z"


def parse_clf(
    lines: DataFrame, value_col: str = "value", *, repartition: int | None = None
) -> DataFrame:
    """CLF lines → typed fields (log_mining_analysis.py:24-29).

    host/timestamp/request by capture-group regex; HTTP code and byte
    count as the last two space-split tokens via ``element_at`` negative
    indexing (the reference emulates this with getItem(size-k))."""
    if repartition:
        lines = lines.repartition(repartition)
    toks = F.split(F.col(value_col), " ")
    # try_cast, not cast: Spark 4 runs ANSI mode by default, where a
    # malformed log line would fail the whole job; the reference's Spark 3
    # cast semantics (malformed → null) are what a log parser wants.
    return lines.select(
        F.regexp_extract(value_col, HOST_RE, 1).alias("host"),
        F.regexp_extract(value_col, TS_RE, 1).alias("timestamp"),
        F.regexp_extract(value_col, REQUEST_RE, 1).alias("request"),
        F.element_at(toks, -2).try_cast("int").alias("HTTP_reply_code"),
        F.element_at(toks, -1).try_cast("int").alias("bytes_in_reply"),
    )


def with_event_time(parsed: DataFrame) -> DataFrame:
    """Idiomatic replacement for the reference's string-slicing regexes
    (log_mining_analysis.py:114-115): a real TimestampType column plus
    integer day/hour.

    ``event_time`` is the true zone-aware instant; ``day``/``hour`` come
    from the log's WALL-CLOCK portion (zone stripped before parsing) so
    the heatmap matches the reference's string-sliced report regardless
    of the session timezone."""
    instant = F.to_timestamp(F.col("timestamp"), CLF_TS_FORMAT)
    wall = F.to_timestamp(
        F.substring_index(F.col("timestamp"), " ", 1), "dd/MMM/yyyy:HH:mm:ss"
    )
    return (
        parsed.withColumn("event_time", instant)
        .withColumn("day", F.dayofmonth(wall))
        .withColumn("hour", F.hour(wall))
    )


def day_hour_by_regex(parsed: DataFrame) -> DataFrame:
    """Capability-parity path: day/hour carved from the timestamp STRING
    exactly as the reference does (log_mining_analysis.py:114-115)."""
    return parsed.withColumn(
        "day", F.regexp_extract("timestamp", r"^(\d{2})", 1)
    ).withColumn(
        "hour", F.regexp_extract("timestamp", r"^\d{2}/\w{3}/\d{4}:(\d{2})", 1)
    )


def country_filter(parsed: DataFrame, suffix: str) -> DataFrame:
    """Requests from a country TLD (log_mining_analysis.py:32-34)."""
    return parsed.filter(F.col("host").endswith(suffix))


def host_counts(df: DataFrame) -> DataFrame:
    """Per-host request counts, deterministically ordered
    (log_mining_analysis.py:43: desc count, asc host tie-break)."""
    return (
        df.select("host")
        .groupBy("host")
        .agg(F.count("host").alias("count"))
        .orderBy(F.desc("count"), F.asc("host"))
    )


def top_hosts(df: DataFrame, k: int = 9) -> DataFrame:
    """Top-k hosts (log_mining_analysis.py:48-51) — plans as
    TakeOrderedAndProject, no global sort."""
    return host_counts(df).limit(k)


def unique_host_count(df: DataFrame) -> int:
    """Unique hosts (log_mining_analysis.py:60-62 counts the groupBy
    result; countDistinct is the one-job idiom)."""
    return df.select(F.countDistinct("host").alias("n")).first()["n"]


def day_hour_matrix(parsed_times: DataFrame, host: str | None = None) -> DataFrame:
    """Long-form day×hour counts (log_mining_analysis.py:117)."""
    df = parsed_times if host is None else parsed_times.filter(F.col("host") == host)
    return df.groupBy("day", "hour").count()


def day_hour_pivot(
    parsed_times: DataFrame, *, days: list[int] | None = None
) -> DataFrame:
    """Native wide pivot hour×day — replaces the reference's
    toPandas + pd.pivot_table detour (log_mining_analysis.py:118-119).
    Pinning ``days`` skips Spark's distinct-discovery job."""
    days = days if days is not None else list(range(1, 29))
    return (
        parsed_times.groupBy("hour")
        .pivot("day", days)
        .count()
        .orderBy("hour")
    )
