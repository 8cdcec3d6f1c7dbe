"""Reference task T4 — NASA web-log mining
(`Log Analysis/log_mining_analysis.py:21-133`), on the engine.

Run: python examples/t4_log_mining.py [access_log.gz]
Defaults to the bundled sample log. Produces the same observables as
the reference script — country reports, top-9 hosts, day×hour matrix —
plus the PNG artifacts the reference rendered with matplotlib, here
written by the stdlib PNG sink.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_ml_showcase_spark import logs
from spark_ml_showcase_spark.session import session_builder
from spark_ml_showcase_spark.sources import io, png


def main() -> None:
    log_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(__file__), "..",
        "spark_ml_showcase_spark", "data", "access_log_sample.gz",
    )
    spark = session_builder("t4-log-mining").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    parsed = logs.parse_clf(io.read_text(spark, log_path)).cache()

    # per-country unique hosts + top hosts (reference lines 41-60)
    for suffix in (".de", ".ca", ".sg"):
        country = logs.country_filter(parsed, suffix)
        print(f"{suffix}: {logs.unique_host_count(country)} unique hosts")
    logs.top_hosts(logs.country_filter(parsed, ".de"), 9).show(truncate=False)

    # day×hour traffic matrix (reference lines 110-125)
    times = logs.with_event_time(parsed)
    logs.day_hour_pivot(times).show()

    # rendered artifacts (reference's matplotlib pie/heatmap)
    out_dir = "/tmp/smss_t4_artifacts"
    os.makedirs(out_dir, exist_ok=True)
    png.write_heatmap_png(
        logs.day_hour_matrix(times), "hour", "day", "count",
        os.path.join(out_dir, "day_hour.png"),
    )
    png.write_pie_png(
        logs.top_hosts(parsed, 9), "host", "count",
        os.path.join(out_dir, "top_hosts.png"),
    )
    print(f"artifacts in {out_dir}")


if __name__ == "__main__":
    main()
