"""The t7 behavior-analytics example must run end to end at sf0.001 —
examples are documentation that executes; a drifted operator signature
should fail here, not in a user's hands."""

from __future__ import annotations

import runpy
import sys


def test_t7_behavior_analytics_runs(spark, capsys):
    argv = sys.argv
    sys.argv = ["t7_behavior_analytics.py", "/root/testdata/sf0.001"]
    try:
        runpy.run_path(
            "examples/t7_behavior_analytics.py", run_name="__main__"
        )
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    assert "== sessions (30 min inactivity gap) ==" in out
    assert "== Markov transition matrix ==" in out
    assert "== customer-tree subtree rollup (top 5 ancestors) ==" in out
    assert "== parts skyline: cheapest AND largest ==" in out
