"""Self-check harness mimicking the driver's correctness gate.

Runs every ``queries()`` entry on Spark and (when present) its
``oracle_sql()`` on DuckDB over the same parquet tables, then compares
row count, column names, and an order-insensitive value hash. Use while
iterating so mismatches surface before the round's CORRECTNESS run.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_cell(v) -> str:
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def frame_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "|".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    verbose = "--verbose" in sys.argv
    plain = "--plain" in sys.argv
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    sys.path.insert(0, REPO)
    import __spark_entry__ as entrymod

    if plain:
        # Mimic the DRIVER's session exactly: no engine configs, default
        # 200 shuffle partitions — catches queries that silently depend
        # on session.py's setup (the fixture-type incident of round 5
        # only reproduced on a plain session at first).
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[32]")
            .config("spark.ui.enabled", "false")
            .appName("check_oracle_plain")
            .getOrCreate()
        )
    else:
        from spark_ml_showcase_spark.session import get_session

        spark = get_session("check_oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows ({dt:.1f}s, no oracle)")
            continue
        try:
            rel = con.sql(oracles[name])
            drows = rel.fetchall()
            dcols = rel.columns
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        else:
            sh, dh = frame_hash(scols, [tuple(r) for r in srows]), frame_hash(dcols, drows)
            if sh != dh:
                problems.append(f"hash spark={sh} duck={dh}")
        if problems:
            n_fail += 1
            print(f"FAIL  {name}: {'; '.join(problems)}")
            if verbose or only:
                sidx = sorted(range(len(scols)), key=lambda i: scols[i])
                didx = sorted(range(len(dcols)), key=lambda i: dcols[i])
                sset = sorted("|".join(norm_cell(r[i]) for i in sidx) for r in map(tuple, srows))
                dset = sorted("|".join(norm_cell(r[i]) for i in didx) for r in drows)
                s_only = [x for x in sset if x not in set(dset)][:3]
                d_only = [x for x in dset if x not in set(sset)][:3]
                if s_only:
                    print(f"      spark-only: {s_only}")
                if d_only:
                    print(f"      duck-only:  {d_only}")
        else:
            print(f"OK    {name}: {len(srows)} rows ({dt:.1f}s)")
    print(f"\n{'ALL OK' if n_fail == 0 else f'{n_fail} FAILURES'}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
