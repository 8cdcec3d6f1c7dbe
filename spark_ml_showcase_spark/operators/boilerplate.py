"""Cross-document boilerplate span detection (SURVEY.md §2.12 extension
family, X10): word n-gram spans that recur across many *distinct*
documents — headers, footers, license blurbs, navigation chrome — and
the per-document fraction of content made of such spans.

Not in the reference. This is the span-level half of the CCNet /
RefinedWeb cleaning recipe (Wenzek et al. 2020; Penedo et al. 2023):
where paragraph-hash dedup drops whole repeated paragraphs, the n-gram
formulation also catches boilerplate embedded inside otherwise-unique
documents. The corpus here has no line structure (single-line synthetic
docs), so the span unit is a word n-gram shingle; on a corpus with
newlines the same operators apply verbatim to line hashes.

Scale posture (mirrors ``decontaminate.py``): per-doc shingles are
DISTINCT (set-built inside the gram UDF), so counting rows per shingle
counts distinct documents with no count-distinct pass. Grams are hashed
to 64-bit longs INSIDE the scan stage (Arrow-batched UDF — measured
choice, see ``_gram_hashes_fn``) — only (id, long) rows shuffle, never
text. The boilerplate set (grams in ≥ min_docs docs) is a hash-agg
output orders of magnitude smaller than the corpus; the per-doc scoring
join is a long-key equi-join against it (broadcast when small,
shuffle-join otherwise — Catalyst/AQE decides from its actual size;
gram rows are re-derived per branch, the decontaminate two-pass shape).
64-bit collision caveat: two distinct grams colliding merges their
doc-counts (P ≈ G²/2⁶⁴ for G distinct grams corpus-wide) — negligible
against min_docs thresholds ≥ 2.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_ml_showcase_spark.functions.rounding import round_like_duckdb


def _gram_hashes_fn(n: int):
    """Arrow-batched text → array of DISTINCT n-gram hashes (int64 via
    blake2b-8). The JVM alternative (``text.shingles`` = HOF transform
    over a token-index sequence + xxhash64) is interpreted per element
    and measured 5-10× slower on per-gram work (see
    ``operators/quality.py`` docstring for the family-wide numbers);
    the hash only needs to be engine-internal — the DuckDB oracle
    compares COUNTS derived from gram strings, never hash values."""
    from hashlib import blake2b

    from spark_ml_showcase_spark.functions.text import py_tokens

    def fn(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = py_tokens(t)
            grams = {
                " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
            }
            out.append(
                [
                    int.from_bytes(
                        blake2b(g.encode(), digest_size=8).digest(),
                        "big",
                        signed=True,
                    )
                    for g in grams
                ]
            )
        return pd.Series(out)

    return fn


def _doc_gram_hashes(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(id, gh): one row per DISTINCT n-gram per document, gram hashed
    to a fixed-width long inside the scan stage (Arrow batch; only
    (id, long) rows ever leave it)."""
    udf = F.pandas_udf(_gram_hashes_fn(n), "array<bigint>")
    return df.select(
        F.col(id_col), F.explode(udf(F.col(text_col))).alias("gh")
    )


def boilerplate_ngrams(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n: int = 6,
    min_docs: int = 2,
) -> DataFrame:
    """The boilerplate set: ``(gh, n_docs)`` for every n-gram hash that
    occurs in at least ``min_docs`` distinct documents. One shuffle on
    the 8-byte gram hash (rows are already distinct per doc, so
    ``count(*)`` IS the distinct-document count)."""
    return (
        _doc_gram_hashes(df, id_col, text_col, n)
        .groupBy("gh")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def boilerplate_fraction(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    n: int = 6,
    min_docs: int = 2,
) -> DataFrame:
    """Per-document boilerplate exposure: ``(id_col, n_spans,
    n_boiler_spans, boiler_frac)`` where ``boiler_frac`` is the fraction
    of the doc's distinct n-gram spans that are corpus-level
    boilerplate. Documents shorter than ``n`` tokens have no spans to
    judge and produce no row.

    Plan shape: the (id, gh) projection feeds BOTH the boilerplate-set
    aggregation and the scoring side of the join (two gram passes — the
    broadcast join leaves the probe side exchange-free, so ReuseExchange
    cannot collapse them; the pass itself is a cheap Arrow-batched
    projection). A left join against the (unique-keyed) boilerplate set
    then ONE per-doc aggregation counts total and flagged spans together
    — no separate totals branch, no third gram pass.
    """
    grams = _doc_gram_hashes(df, id_col, text_col, n)
    boiler = boilerplate_ngrams(df, id_col, text_col, n=n, min_docs=min_docs)
    return (
        grams.join(
            boiler.select("gh", F.lit(1).alias("_m")), "gh", "left"
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.count("_m").alias("n_boiler_spans"),
        )
        .select(
            id_col,
            "n_spans",
            "n_boiler_spans",
            round_like_duckdb(
                F.col("n_boiler_spans").cast("double") / F.col("n_spans"), 6
            ).alias("boiler_frac"),
        )
    )
