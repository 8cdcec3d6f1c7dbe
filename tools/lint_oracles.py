"""Oracle type lint — the fast half of the round-5 hash-drift fix.

Round-5 incident: two oracles contained uncast integer ``SUM``s, which
DuckDB returns as HUGEINT → the driver's Arrow fetch sees
``decimal128(38,0)`` and hashes it differently from Spark's BIGINT,
while values agree. This lint executes every ``oracle_sql()`` entry on
DuckDB alone (no Spark, ~seconds) and FAILS if any OUTPUT column has a
DECIMAL / HUGEINT / UHUGEINT type. Interior uses (a window ``sid`` that
only feeds GROUP BY, a ``SUM(n)`` that feeds a DOUBLE division) are
fine — only the output schema is hashed by the driver.

Oracles that cannot run standalone (sink round-trips whose SQL reads
artifacts the Spark query writes first) are reported as DEFERRED; the
full ``tools/check_oracle.py`` gate covers those in execution order.

Usage: python tools/lint_oracles.py [sf_dir]
Exit 1 on any flagged column.
"""

from __future__ import annotations

import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.check_oracle import TABLES, bad_type_cols  # noqa: E402


def lint_sql(con: "duckdb.DuckDBPyConnection", sql: str) -> list[str] | None:
    """Flagged ``col:type`` strings; None ONLY when the oracle reads a
    runtime artifact that doesn't exist standalone (sink round-trips →
    IOException). Genuinely broken SQL — parse errors, bad column
    references — RAISES so the fast gate can never green-light it as a
    deferral."""
    try:
        rel = con.sql(sql)
        return bad_type_cols(rel.columns, list(rel.types))
    except duckdb.IOException:  # missing sink artifact — check_oracle covers it
        return None


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import __spark_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_bad, n_deferred = 0, 0
    for name, sql in entrymod.oracle_sql().items():
        try:
            flagged = lint_sql(con, sql)
        except Exception as e:  # noqa: BLE001 — broken oracle SQL
            n_bad += 1
            print(f"FAIL  {name}: oracle does not run: {e}")
            continue
        if flagged is None:
            n_deferred += 1
            print(f"DEFER {name}: standalone exec failed (check_oracle covers it)")
        elif flagged:
            n_bad += 1
            print(f"FAIL  {name}: Decimal-class output {flagged} — CAST to BIGINT/DOUBLE")
        else:
            print(f"OK    {name}")
    print(f"\n{n_bad} flagged, {n_deferred} deferred")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
