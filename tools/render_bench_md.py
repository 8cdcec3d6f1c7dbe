"""Render BENCH_LOCAL.md from BENCH_LOCAL.json (run after `python
bench.py`): suite headline, top-N table with plan telemetry, and the
full per-query listing. Keeps the committed markdown in lockstep with
the committed JSON artifact.

Usage: python tools/render_bench_md.py [round-label]
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    label = sys.argv[1] if len(sys.argv) > 1 else "current"
    d = json.load(open(os.path.join(REPO, "BENCH_LOCAL.json")))
    qs = sorted(d["queries"].items(), key=lambda kv: -kv[1])
    pm = d.get("plan_metrics", {})
    lines = [
        f"# BENCH_LOCAL — builder-measured sf{d['sf']} timings ({label})",
        "",
        f"`python bench.py` at `SPARK_GRAFT_SF_DIR=/root/testdata/sf{d['sf']}`,"
        f" local[{d.get('cpus', 32)}], noop sink (full executor-side execution),"
        " best-of-2 runs per query (first run pays plan compilation/codegen;"
        " second measures steady state). Machine-load variance between"
        " full-suite runs observed at up to ~20%.",
        "",
        f"- **suite total: {d['value']}s across {d['n_queries']} queries**"
        " (ml_* excluded — iterative fits)",
        "- per-query plan telemetry (stages, shuffle/input MB) in"
        " BENCH_LOCAL.json `plan_metrics` — shuffle bytes are deterministic"
        " per plan, the regression signal timing noise can't fake",
        "",
        "| query | sec | stages | shuffle W (MB) | input (MB) |",
        "|---|---|---|---|---|",
    ]
    for name, sec in qs:
        m = pm.get(name, {})
        lines.append(
            f"| {name} | {sec} | {m.get('n_stages', '')} | "
            f"{m.get('shuffle_write_mb', '')} | {m.get('input_mb', '')} |"
        )
    lines.append("")
    with open(os.path.join(REPO, "BENCH_LOCAL.md"), "w") as f:
        f.write("\n".join(lines))
    print(f"BENCH_LOCAL.md: {len(qs)} queries, suite {d['value']}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
