"""Oracle type lint — pins the round-5 hash-drift fix (judge verdict r5 #2).

Round-5 incident: two oracles carried uncast integer ``SUM``s → DuckDB
HUGEINT → the driver's Arrow fetch hashed decimal128 differently from
Spark's BIGINT, while the local checker's str()-based normalization
masked it. These tests (no SparkSession — DuckDB only, seconds):

1. every registry oracle lints clean at sf0.001 (no Decimal-class
   output column),
2. the lint provably CATCHES the two pre-fix r5 oracles (their uncast
   SUM shapes reproduced verbatim),
3. ``norm_cell`` now fails loudly on ``decimal.Decimal`` instead of
   silently str()-ing it.
"""

from __future__ import annotations

import decimal
import os
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.check_oracle import TABLES, bad_type_cols, norm_cell  # noqa: E402
from tools.lint_oracles import lint_sql  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_LINT_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def test_all_registry_oracles_lint_clean(con):
    import __spark_entry__ as entrymod

    flagged = {}
    deferred = []
    for name, sql in entrymod.oracle_sql().items():
        res = lint_sql(con, sql)
        if res is None:
            deferred.append(name)  # sink round-trip; check_oracle covers it
        elif res:
            flagged[name] = res
    assert not flagged, f"Decimal-class oracle outputs: {flagged}"
    # Deferral is for sink round-trips only — a sudden jump means oracles
    # silently stopped being standalone-runnable.
    assert len(deferred) <= 8, deferred


# The two r5 red rows, pre-fix SUM shapes verbatim
# (plans/coverage_queries.py:393 and plans/extensions.py:900 before the
# round-6 CASTs). The lint must flag both.
PREFIX_R5_BAD = {
    "pyds_gen_docs_stats(pre-fix)": """
        SELECT 'src' || CAST(i % 8 AS VARCHAR) AS source,
               COUNT(*) AS n_docs,
               SUM(20 + (i * 37) % 200) AS sum_tokens
        FROM range(0, 1000) t(i) GROUP BY 1 ORDER BY 1
    """,
    "token_budget_sample_docs(pre-fix)": r"""
        WITH t AS (
            SELECT doc_id, source,
                   CAST(len(list_filter(string_split_regex(text, '\s+'),
                                        x -> x <> '')) AS BIGINT) AS n_tokens,
                   substr(md5(CAST(doc_id AS VARCHAR)), 1, 16) AS h
            FROM documents
        )
        SELECT doc_id, source, n_tokens,
               SUM(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
                                   ROWS UNBOUNDED PRECEDING) AS cum_tokens
        FROM t
    """,
}


@pytest.mark.parametrize("label", sorted(PREFIX_R5_BAD))
def test_lint_catches_prefix_r5_oracles(con, label):
    res = lint_sql(con, PREFIX_R5_BAD[label])
    assert res, f"lint failed to flag the pre-fix oracle {label}"
    assert any("HUGEINT" in f or "DECIMAL" in f for f in res), res


def test_bad_type_cols_flags_decimal_and_hugeint():
    assert bad_type_cols(["a", "b", "c"], ["BIGINT", "HUGEINT", "DECIMAL(38,0)"]) == [
        "b:HUGEINT",
        "c:DECIMAL(38,0)",
    ]
    assert bad_type_cols(["x"], ["DOUBLE"]) == []


def test_norm_cell_raises_on_decimal():
    with pytest.raises(TypeError, match="CAST the oracle"):
        norm_cell(decimal.Decimal("800"))
    # list elements too — nested Decimal must not slip through
    with pytest.raises(TypeError):
        norm_cell([decimal.Decimal("1")])
    # sane types still normalize
    assert norm_cell(None) == "NULL"
    assert norm_cell(800) == "800"


def test_lint_raises_on_broken_sql_instead_of_deferring(con):
    """A typo'd oracle must FAIL the fast gate, not slide through as a
    'sink artifact missing' deferral; only IOException defers."""
    with pytest.raises(Exception, match="(?i)referenced|not found|error"):
        lint_sql(con, "SELECT no_such_column FROM documents")
    # missing file → genuine deferral
    assert lint_sql(con, "SELECT * FROM read_parquet('/tmp/definitely_missing_xyz.parquet')") is None


def test_duckdb_wide_decimal_double_cast_hazard_and_remedy():
    """r8 tpch_q1 incident, pinned: DuckDB's wide-decimal → DOUBLE cast
    double-rounds (double(int128)/double(10^scale)), so values whose
    integer representation exceeds 2^53 can land one ulp off the
    correctly-rounded result Spark's BigDecimal cast produces. The repo
    convention — ROUND to scale 2 in the DECIMAL domain first — gives
    the correctly-rounded double. If the hazard assertion ever FAILS,
    DuckDB fixed its cast and the convention can be retired."""
    from decimal import Decimal

    import duckdb

    incident = "27793159.73917800000000"  # q1 charge sum at sf0.001
    correctly_rounded = float(Decimal(incident))
    raw = duckdb.sql(
        f"SELECT CAST(CAST('{incident}' AS DECIMAL(38,14)) AS DOUBLE)"
    ).fetchone()[0]
    assert raw != correctly_rounded, (
        "DuckDB now rounds wide decimal->double correctly — the "
        "ROUND-before-cast convention (plans/__init__.py) can be retired"
    )
    remedied = duckdb.sql(
        f"SELECT CAST(ROUND(CAST('{incident}' AS DECIMAL(38,14)), 2) AS DOUBLE)"
    ).fetchone()[0]
    assert remedied == float(Decimal(incident).quantize(Decimal("0.01")))
    # scale-6 money totals at sf0.1 magnitude sit over 2^53 too
    big = "37523391258.559740"
    raw6 = duckdb.sql(
        f"SELECT CAST(CAST('{big}' AS DECIMAL(38,6)) AS DOUBLE)"
    ).fetchone()[0]
    assert raw6 != float(Decimal(big))
    fixed6 = duckdb.sql(
        f"SELECT CAST(ROUND(CAST('{big}' AS DECIMAL(38,6)), 2) AS DOUBLE)"
    ).fetchone()[0]
    assert fixed6 == float(Decimal(big).quantize(Decimal("0.01")))
