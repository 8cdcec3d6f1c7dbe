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
    import decimal
    import math

    if v is None:
        return "NULL"
    if isinstance(v, decimal.Decimal):
        # The DRIVER's hash normalizes Decimal differently from Spark's
        # BIGINT/DOUBLE (round-5 incident: uncast integer SUM → DuckDB
        # HUGEINT → decimal128 → silent hash drift that str() masked
        # here). Never hash a Decimal locally — fail loudly instead so
        # the drift can't pass the local gate and fail at the driver.
        raise TypeError(
            f"decimal.Decimal reached the value hash ({v!r}): "
            "CAST the oracle expression to BIGINT or DOUBLE"
        )
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


# DuckDB output types the driver fetches as Decimal/unhashable-exotic —
# any oracle output column of these types is a correctness-gate bug even
# when values agree (see CORRECTNESS_r05 pyds_gen_docs_stats /
# token_budget_sample_docs).
BAD_DUCK_TYPES = ("DECIMAL", "HUGEINT", "UHUGEINT")


def bad_type_cols(cols: list[str], types) -> list[str]:
    out = []
    for c, t in zip(cols, types):
        tu = str(t).upper()
        if any(b in tu for b in BAD_DUCK_TYPES):
            out.append(f"{c}:{t}")
    return out


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
            dtypes = list(rel.types)
            drows = rel.fetchall()
            dcols = rel.columns
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = []
        bad = bad_type_cols(dcols, dtypes)
        if bad:
            problems.append(
                f"oracle type drift {bad}: driver fetches these as Decimal "
                "and hashes them differently from Spark — CAST to BIGINT/DOUBLE"
            )
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        elif not bad:
            try:
                sh, dh = frame_hash(scols, [tuple(r) for r in srows]), frame_hash(dcols, drows)
                if sh != dh:
                    problems.append(f"hash spark={sh} duck={dh}")
            except TypeError as e:
                problems.append(f"unhashable cell: {e}")
        if problems:
            n_fail += 1
            print(f"FAIL  {name}: {'; '.join(problems)}")
            if verbose or only:
                def safe_cell(v):
                    try:
                        return norm_cell(v)
                    except TypeError:
                        return f"DECIMAL({v})"

                sidx = sorted(range(len(scols)), key=lambda i: scols[i])
                didx = sorted(range(len(dcols)), key=lambda i: dcols[i])
                sset = sorted("|".join(safe_cell(r[i]) for i in sidx) for r in map(tuple, srows))
                dset = sorted("|".join(safe_cell(r[i]) for i in didx) for r in drows)
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
