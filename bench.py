"""Benchmark harness: times every registered query and prints ONE JSON line.

Usage: python bench.py  (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS,
BENCH_REPEAT, BENCH_ONLY=comma,separated,names)

Each query is forced with a `noop` sink write (full pipeline execution on
executors, no driver-side materialization cost), after one warm-up action to
amortize JVM/codegen startup. Output format (driver contract):
{"metric": "suite_sec", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The printed line is kept SHORT (the driver captures it via `tail`, which
truncated round 2's 70-query map): `queries` holds only the slowest
TOP_N_PRINTED entries; the full per-query map goes to BENCH_LOCAL.json.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# Queries excluded from the bench (iterative ML fits — minutes, not seconds;
# they have their own rows-only correctness entries).
SLOW_PREFIXES = ("ml_",)

# The printed JSON line includes only the slowest N queries (full map in
# BENCH_LOCAL.json) so the line stays within the driver's tail capture.
TOP_N_PRINTED = 8


def _sf_of(path: str) -> float:
    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1)) if m else 0.0


def main() -> int:
    import __spark_entry__ as entrymod
    from spark_ml_showcase_spark.session import get_session

    spark = get_session("bench")
    qs = entrymod.queries()
    only = {s for s in os.environ.get("BENCH_ONLY", "").split(",") if s}
    # best-of-2 by default: the first run pays plan compilation + code
    # generation; the second measures steady-state execution
    repeat = int(os.environ.get("BENCH_REPEAT", "2"))

    # Warm-up: JVM JIT, parquet footer caches, codegen.
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()

    times: dict[str, float] = {}
    for name, fn in qs.items():
        if any(name.startswith(p) for p in SLOW_PREFIXES):
            continue
        if only and name not in only:
            continue
        best = None
        try:
            for _ in range(repeat):
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
        except Exception as e:  # noqa: BLE001 - one bad query must not kill the suite
            print(f"bench: {name} failed: {e}", file=sys.stderr)
            continue
        times[name] = round(best, 4)

    total = round(sum(times.values()), 4)
    sf = _sf_of(SF_DIR)
    detail = {
        "metric": "suite_sec",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "n_queries": len(times),
        "cpus": int(CPUS),
    }
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"
    )
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1, sort_keys=True)

    slowest = dict(
        sorted(times.items(), key=lambda kv: kv[1], reverse=True)[:TOP_N_PRINTED]
    )
    print(
        json.dumps(
            {
                "metric": "suite_sec",
                "value": total,
                "unit": "sec",
                "queries": slowest,
                "sf": sf,
                "n_queries": len(times),
                "detail": "BENCH_LOCAL.json",
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
