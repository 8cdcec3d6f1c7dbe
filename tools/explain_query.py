"""Dump `explain("formatted")` for named queries → plans/r16/<name>_<tag>.txt.

Optimization-round evidence helper (guide §1): the judge checks plan
claims (Exchange counts, join strategies, PushedFilters) against these
committed files, so every optimized query gets a _before and _after
capture at the bench scale factor.

Usage: python tools/explain_query.py <tag> <query> [query ...]
       (env: SPARK_GRAFT_SF_DIR, default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    import __spark_entry__ as entry
    from spark_ml_showcase_spark.session import get_session

    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("explain_query")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    out_dir = os.path.join(REPO, "plans", "r16")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(
                f"-- {name} @ {sf_dir} ({tag})\n"
                "-- NOTE: iterative operators (pointer-doubling closure,\n"
                "-- BPE learning, IVF upsert) run driver-side loops; this\n"
                "-- is the plan of the RETURNED frame only.\n\n"
            )
            f.write(plan)
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
