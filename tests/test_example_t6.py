"""The t6 event-warehouse example must run end to end at sf0.001 —
examples are documentation that executes; a drifted operator signature
should fail here, not in a user's hands."""

from __future__ import annotations

import runpy
import sys


def test_t6_event_warehouse_runs(spark, capsys):
    argv = sys.argv
    sys.argv = ["t6_event_warehouse.py", "/root/testdata/sf0.001"]
    try:
        runpy.run_path("examples/t6_event_warehouse.py", run_name="__main__")
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    assert "rollup refresh #3 -> store version 2" in out
    assert "SCD-2 dim:" in out
    assert "overlapping view/purchase windows:" in out
