"""Log-analytics module tests (SURVEY.md M2): CLF parsing semantics,
no-match behavior, event-time parity between the regex and timestamp
paths, pivot shape."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from spark_ml_showcase_spark import logs
from spark_ml_showcase_spark.sources import io

_GZ = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "spark_ml_showcase_spark",
    "data",
    "access_log_sample.gz",
)

_LINES = [
    'alpha.uni-k.de - - [03/Jul/1995:14:02:11 -0400] "GET /a.html HTTP/1.0" 200 1234',
    'beta.on.ca - - [15/Jul/1995:09:30:00 -0400] "GET /b.gif HTTP/1.0" 304 512',
    "malformed line without the pattern",
]


def _lines_df(spark):
    return spark.createDataFrame([(s,) for s in _LINES], "value string")


def test_parse_clf_fields(spark):
    rows = logs.parse_clf(_lines_df(spark)).collect()
    assert rows[0].host == "alpha.uni-k.de"
    assert rows[0].timestamp == "03/Jul/1995:14:02:11 -0400"
    assert rows[0].request == "GET /a.html HTTP/1.0"
    assert rows[0].HTTP_reply_code == 200 and rows[0].bytes_in_reply == 1234
    # regexp_extract no-match → '' (reference semantics); int cast → null
    assert rows[2].host == "" and rows[2].timestamp == ""
    assert rows[2].HTTP_reply_code is None


def test_event_time_paths_agree(spark):
    parsed = logs.parse_clf(_lines_df(spark)).filter(F.col("timestamp") != "")
    via_ts = logs.with_event_time(parsed).select("day", "hour").collect()
    via_re = logs.day_hour_by_regex(parsed).select("day", "hour").collect()
    assert [(r.day, r.hour) for r in via_ts] == [
        (int(r.day), int(r.hour)) for r in via_re
    ]
    assert via_ts[0].day == 3 and via_ts[0].hour == 14


def test_country_filter_and_top_hosts(spark):
    parsed = logs.parse_clf(io.read_text(spark, _GZ))
    de = logs.country_filter(parsed, ".de")
    assert de.count() > 0
    assert de.filter(~F.col("host").endswith(".de")).count() == 0
    top = logs.top_hosts(de, 9).collect()
    assert len(top) == 9
    counts = [r["count"] for r in top]
    assert counts == sorted(counts, reverse=True)
    # tie-break: equal counts sorted ascending by host
    for a, b in zip(top, top[1:]):
        if a["count"] == b["count"]:
            assert a.host < b.host
    assert logs.unique_host_count(de) == 12  # fixture has 12 .de hosts


def test_day_hour_pivot_shape(spark):
    parsed = logs.with_event_time(logs.parse_clf(io.read_text(spark, _GZ)))
    wide = logs.day_hour_pivot(parsed, days=list(range(1, 29)))
    assert wide.columns[0] == "hour" and len(wide.columns) == 29
    long = logs.day_hour_matrix(parsed)
    total_long = long.agg(F.sum("count")).first()[0]
    assert total_long == 600  # every fixture line lands in exactly one cell


def test_gzip_single_partition_and_repartition(spark):
    lines = io.read_text(spark, _GZ)
    assert lines.rdd.getNumPartitions() == 1  # gz not splittable
    re = logs.parse_clf(lines, repartition=8)
    assert re.rdd.getNumPartitions() == 8
